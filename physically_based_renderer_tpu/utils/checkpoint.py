"""Checkpoint / resume for optimisable scene pytrees.

The reference is stateless (SURVEY.md §5: camera pose rebuilt each run); our
differentiable-rendering loops optimise materials / lights / env maps /
geometry, so those pytrees need durable save/restore. Plain .npz with a
pytree-structure manifest — no service dependencies; orbax can layer on top
later if multi-host checkpointing is needed.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree) -> None:
    """Save any pytree of arrays (+ None leaves) to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {}
    kinds = []
    for i, leaf in enumerate(leaves):
        if leaf is None:
            kinds.append("none")
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
            kinds.append("array")
    manifest = json.dumps({"treedef": str(treedef), "kinds": kinds})
    np.savez(path, __manifest__=np.frombuffer(manifest.encode(), np.uint8), **arrays)


def load_pytree(path: str, like):
    """Restore a pytree saved by :func:`save_pytree`, using ``like`` for the
    tree structure (robust across code versions as long as the structure
    matches)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    out = []
    for i, leaf in enumerate(leaves):
        key = f"leaf_{i}"
        if key in data:
            arr = jnp.asarray(data[key])
            if leaf is not None and hasattr(leaf, "dtype"):
                arr = arr.astype(leaf.dtype)
            out.append(arr)
        else:
            out.append(leaf)
    return jax.tree.unflatten(treedef, out)


def save_scene_params(path: str, scene) -> None:
    """Save the optimisable parts of a scene (materials, lights, env/IBL)."""
    save_pytree(
        path,
        {
            "materials": scene.materials,
            "lights": scene.lights,
            "ambient": scene.ambient,
            "env_map": scene.env_map,
        },
    )


def load_scene_params(path: str, scene):
    import dataclasses

    like = {
        "materials": scene.materials,
        "lights": scene.lights,
        "ambient": scene.ambient,
        "env_map": scene.env_map,
    }
    loaded = load_pytree(path, like)
    return dataclasses.replace(
        scene,
        materials=loaded["materials"],
        lights=loaded["lights"],
        ambient=loaded["ambient"],
        env_map=loaded["env_map"],
    )
