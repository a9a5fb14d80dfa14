"""Profiling / timing harness.

TPU-native replacement for ``D3DApp::CalculateFrameStats`` (fps and ms/frame
in the window title, ``d3dApp.cpp:598-628``) plus proper device-side
benchmarking: on remote-tunneled TPUs, per-dispatch latency and unreliable
``block_until_ready`` make naive host timing meaningless, so the measured
function is looped ON DEVICE in one ``lax.scan`` program with a
carry-dependent zero perturbation (defeats CSE/hoisting), bracketed by a
single host sync.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class TimingResult:
    ms_per_iter: float
    iters: int
    pixels: int | None = None

    @property
    def fps(self) -> float:
        return 1000.0 / self.ms_per_iter

    @property
    def pixels_per_s(self) -> float | None:
        if self.pixels is None:
            return None
        return self.pixels / (self.ms_per_iter / 1000.0)

    def __str__(self) -> str:
        s = f"{self.ms_per_iter:.2f} ms/iter ({self.fps:.1f} it/s)"
        if self.pixels is not None:
            s += f", {self.pixels_per_s / 1e6:.1f} Mpix/s"
        return s


def time_device_loop(
    fn: Callable[..., jnp.ndarray],
    *args,
    iters: int = 10,
    perturb: Callable | None = None,
    pixels: int | None = None,
) -> TimingResult:
    """Time ``fn(*args)`` with the device-side scan-loop methodology.

    ``fn`` must return an array; its first element feeds the carry chain.
    ``perturb(args, carry)`` may rebuild args with a carry-dependent
    zero-perturbation; default perturbs the first float-array leaf.
    """

    def default_perturb(a, c):
        leaves, treedef = jax.tree.flatten(a)
        done = False
        out = []
        for leaf in leaves:
            if (
                not done
                and hasattr(leaf, "dtype")
                and jnp.issubdtype(leaf.dtype, jnp.floating)
            ):
                out.append(leaf + c * 0.0)
                done = True
            else:
                out.append(leaf)
        return jax.tree.unflatten(treedef, out)

    perturb = perturb or default_perturb

    @jax.jit
    def loop(*a):
        def body(carry, _):
            a2 = perturb(a, carry)
            r = fn(*a2)
            return carry + jnp.ravel(r)[0].astype(jnp.float32) * 0.0 + 1e-12, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    float(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(*args))  # host roundtrip = sync
    dt = (time.perf_counter() - t0) / iters
    return TimingResult(ms_per_iter=dt * 1000.0, iters=iters, pixels=pixels)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pbr_trace"):
    """jax.profiler trace context (the debug-layer/PIX analog)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_summary() -> str:
    """Device/mesh topology dump — the ``D3DApp::LogAdapters`` analog
    (``d3dApp.cpp:630-703``)."""
    lines = [f"jax {jax.__version__}, backend={jax.default_backend()}"]
    for d in jax.devices():
        lines.append(
            f"  device {d.id}: {d.device_kind} (process {d.process_index}, "
            f"platform {d.platform})"
        )
    return "\n".join(lines)
