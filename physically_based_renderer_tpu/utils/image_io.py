"""Image IO: LDR decode (PIL), Radiance RGBE .hdr decode (pure numpy), PNG out.

TPU-native replacement for the reference's texture-decode stack — WIC loader
(``DirectXTK12/WICTextureLoader.cpp``), DDS loader, and the vendored-but-
unused stb_image (``Source/3rdParty/stb/``; stb is the usual way to read the
.hdr IBL environments, so we provide our own RGBE reader). Decoded images
become numpy arrays that feed ``ops.texture.build_atlas``; the "swap-chain
present" becomes :func:`save_png`.
"""

from __future__ import annotations

import os

import numpy as np


def load_image(path: str) -> np.ndarray:
    """Decode PNG/JPG/etc. → (H, W, C) uint8 (C = 3 or 4)."""
    from PIL import Image

    with Image.open(path) as im:
        if im.mode not in ("RGB", "RGBA", "L"):
            im = im.convert("RGBA" if "A" in im.mode else "RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def load_hdr(path: str) -> np.ndarray:
    """Decode a Radiance RGBE (.hdr) file → (H, W, 3) float32 linear radiance.

    Pure-numpy implementation of the RGBE format (header + per-scanline
    adaptive RLE), the format of the ``*_Env.hdr`` sIBL assets."""
    with open(path, "rb") as f:
        data = f.read()

    # --- header ---
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    pos = 0
    exposure = 1.0
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line.startswith(b"EXPOSURE="):
            exposure *= float(line.split(b"=", 1)[1])
        if line == b"":
            break
    eol = data.index(b"\n", pos)
    dims = data[pos:eol].split()
    pos = eol + 1
    if dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {dims!r}")
    height, width = int(dims[1]), int(dims[3])

    buf = np.frombuffer(data, np.uint8, offset=pos)
    rgbe = np.zeros((height, width, 4), np.uint8)
    off = 0
    for y in range(height):
        if (
            width >= 8
            and width < 32768
            and off + 4 <= len(buf)
            and buf[off] == 2
            and buf[off + 1] == 2
            and ((int(buf[off + 2]) << 8) | int(buf[off + 3])) == width
        ):
            # adaptive RLE: 4 components stored separately
            off += 4
            for c in range(4):
                x = 0
                while x < width:
                    count = int(buf[off])
                    off += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = buf[off]
                        off += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x : x + count, c] = buf[off : off + count]
                        off += count
                        x += count
        else:
            # flat scanline (possibly old-style RLE, not emitted by modern tools)
            row = buf[off : off + width * 4].reshape(width, 4)
            # old-style RLE marker: a pixel with r==g==b==1 (repeat count)
            if ((row[:, 0] == 1) & (row[:, 1] == 1) & (row[:, 2] == 1)).any():
                raise NotImplementedError("old-style RLE HDR not supported")
            rgbe[y] = row
            off += width * 4

    mant = rgbe[..., :3].astype(np.float32)
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136)).astype(np.float32)
    out = mant * scale[..., None]
    # FreeImage writes a bogus EXPOSURE=0 header (Chelsea_Stairs_Env.hdr);
    # only meaningful positive exposures rescale.
    if exposure > 0.0 and exposure != 1.0:
        out /= exposure
    return out


def save_hdr(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3) float32 → Radiance RGBE (flat scanlines)."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    maxc = img.max(axis=-1)
    nz = maxc > 1e-32
    _, e = np.frexp(maxc[nz])  # maxc = f·2^e, f ∈ [0.5, 1)
    rgbe = np.zeros((h, w, 4), np.uint8)
    mant = np.clip(img[nz] * np.ldexp(1.0, 8 - e)[:, None], 0, 255)
    rgbe[nz, :3] = mant.astype(np.uint8)
    rgbe[nz, 3] = (e + 128).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def save_png(path: str, img: np.ndarray) -> None:
    """Write an image to PNG. Accepts float [0,1] (H,W,3|4) or uint8."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def find_asset_root() -> str | None:
    """Locate the reference asset tree if mounted (read-only)."""
    for cand in (
        os.environ.get("PBR_ASSETS", ""),
        "/root/reference/Assets",
        os.path.join(os.path.dirname(__file__), "..", "..", "Assets"),
    ):
        if cand and os.path.isdir(cand):
            return os.path.abspath(cand)
    return None
