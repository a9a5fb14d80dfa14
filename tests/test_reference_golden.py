"""Render-vs-reference goldens: compare OUR frames against the only ground
truth the reference ships — its sample screenshots
(``/root/reference/Samples/PBR.png`` / ``rusted_iron_pbr.png``,
``README.md:5-7``).

The screenshots came from an interactively-flown camera whose pose was
never recorded, so ``scripts/fit_golden_pose.py`` recovered it by
optimization against the images (provenance in ``docs/golden_pose_*.json``,
committed). These tests re-render at the fitted pose and demand SSIM
similarity; they SKIP when the reference assets or fitted poses are absent
(CI without the asset mount).

Known, accepted deltas bounded by the thresholds:
  * rusted_iron_pbr.png uses an sIBL backdrop that isn't in the shipped
    asset tree (snowy mountains) → foreground-masked SSIM only;
  * texture decode/resize differences (WIC vs PIL, our 512² atlas);
  * the pose fit itself is approximate.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from physically_based_renderer_tpu import Camera, scenes
from physically_based_renderer_tpu.renderer import render
from physically_based_renderer_tpu.utils.ssim import ssim

SAMPLES = "/root/reference/Samples"
POSES = os.path.join(os.path.dirname(__file__), "..", "docs")
# Client area of the 1202×832 window screenshots (1200×800 backbuffer,
# d3dApp.h:126-127) — crop the title bar / borders.
CLIENT = (slice(31, 831), slice(1, 1201))
W, H = 600, 400  # compare at half res (CPU render cost; SSIM is scale-robust)


def _load_target(name):
    from PIL import Image

    path = os.path.join(SAMPLES, name)
    if not os.path.exists(path):
        pytest.skip(f"reference sample {name} not mounted")
    img = np.asarray(Image.open(path), np.float32)[..., :3] / 255.0
    img = img[CLIENT]
    return img.reshape(H, 800 // H, W, 1200 // W, 3).mean((1, 3))


def _load_pose(which):
    path = os.path.join(POSES, f"golden_pose_{which}.json")
    if not os.path.exists(path):
        pytest.skip(f"no fitted pose ({path}); run scripts/fit_golden_pose.py")
    with open(path) as f:
        p = json.load(f)
    return Camera.create(
        position=p["position"], yaw=p["yaw"], pitch=p["pitch"], aspect=1200 / 800
    )


def test_pbr_scene_matches_reference_sample():
    if scenes.AssetCache().root is None:
        pytest.skip("reference assets not mounted")
    import dataclasses

    target = _load_target("PBR.png")
    cam = _load_pose("pbr")
    scene = scenes.pbr_scene(environment="subway_lights").with_combined_textures()
    img = np.asarray(render(scene, cam, width=W, height=H))[..., :3]
    s = ssim(img, target)
    # Same scene, same lighting model, fitted pose: demand clear structural
    # agreement (uncorrelated renders of this content score ≈ 0.1-0.3).
    assert s > 0.55, f"SSIM vs Samples/PBR.png = {s:.3f}"
    # Foreground-masked comparison: the screenshot's hi-res background
    # (20_Subway_Lights_8k.jpg) is a missing large blob in this checkout
    # (.MISSING_LARGE_BLOBS), so only the 59 spheres can match — mask them
    # via a sky-less clear-color probe. Measured 0.645 (round 4,
    # docs/golden_pbr_sidebyside.png holds the target|render|diff triptych);
    # gate at 0.60.
    probe_scene = dataclasses.replace(
        scene, sky_map=None, env_map=None,
        clear_color=jnp.asarray([-1.0, -1.0, -1.0]),
    )
    probe = np.asarray(render(probe_scene, cam, width=W, height=H))
    fg = probe[..., 0] >= 0.0
    assert 0.2 < fg.mean() < 0.95, fg.mean()
    sm = ssim(img, target, mask=fg)
    assert sm > 0.60, f"masked SSIM vs Samples/PBR.png = {sm:.3f}"


def test_rustediron_matches_reference_sample():
    if scenes.AssetCache().root is None:
        pytest.skip("reference assets not mounted")
    target = _load_target("rusted_iron_pbr.png")
    cam = _load_pose("rust")
    scene = scenes.rustediron_sphere_scene().with_combined_textures()
    img4 = np.asarray(render(scene, cam, width=W, height=H))
    img = img4[..., :3]
    # Foreground mask from our render (the reference's snowy backdrop isn't
    # a shipped asset): compare the sphere only.
    import dataclasses

    probe = np.asarray(
        render(
            dataclasses.replace(scene, clear_color=jnp.asarray([-1.0, -1.0, -1.0])),
            cam,
            width=W,
            height=H,
        )
    )
    fg = probe[..., 0] >= 0.0
    if fg.mean() < 0.2:
        pytest.skip("fitted pose puts too little sphere in frame")
    s = ssim(img, target, mask=fg)
    # Measured 0.542 with mip filtering on (0.516 at 1-mip parity, round 4);
    # gate just under the measured value.
    assert s > 0.52, f"masked SSIM vs Samples/rusted_iron_pbr.png = {s:.3f}"
