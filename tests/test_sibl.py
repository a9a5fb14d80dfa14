"""sIBL descriptor parsing (Assets/*/*.ibl) and light synthesis."""

import os

import numpy as np
import pytest

from physically_based_renderer_tpu.models.sibl import (
    find_ibl,
    parse_ibl,
    sibl_scene_lights,
)

REF_SET = "/root/reference/Assets/PaperMill_Ruins_E"

SYNTH = """[Header]
Name = "Test Set"
[Background]
BGfile = "bg_8k.jpg"
BGheight = 4096
[Enviroment]
EVfile = "env.hdr"
EVmulti = 2.500000
EVgamma = 2.200000
[Reflection]
REFfile = "ref_3k.hdr"
REFmulti = 0.500000
[Sun]
SUNcolor = 255,212,194
SUNmulti = 0.921501
SUNu = 0.838000
SUNv = 0.324000
[Light1]
LIGHTname = "Skylight"
LIGHTcolor = 166,186,255
LIGHTmulti = 0.800000
LIGHTu = 0.474000
LIGHTv = 0.004000
"""


def test_parse_synthetic(tmp_path):
    p = tmp_path / "test.ibl"
    p.write_text(SYNTH)
    s = parse_ibl(str(p))
    assert s.name == "Test Set"
    assert s.environment_file == "env.hdr"
    assert s.environment_multiplier == 2.5
    assert s.reflection_multiplier == 0.5
    assert s.background_file == "bg_8k.jpg"
    assert s.sun is not None and abs(s.sun.multiplier - 0.921501) < 1e-6
    assert len(s.lights) == 1
    assert s.lights[0].name == "Skylight"
    np.testing.assert_allclose(s.lights[0].color, (166 / 255, 186 / 255, 255 / 255))

    # Sun direction: unit vector, pointing downward-ish (v=0.324 is above
    # the horizon → light travels downward, negative y).
    d = s.sun.direction()
    assert abs(np.linalg.norm(d) - 1.0) < 1e-5
    assert d[1] < 0

    lights = sibl_scene_lights(s)
    assert lights.num_dir == 2
    np.testing.assert_allclose(
        np.asarray(lights.strength[0]),
        np.asarray(s.sun.strength),
        rtol=1e-6,
    )


def test_sun_uv_direction_roundtrip(tmp_path):
    """Light direction must invert the sky shader's WorldToSkyUV mapping."""
    from physically_based_renderer_tpu.ops.sky import world_to_sky_uv

    p = tmp_path / "t.ibl"
    p.write_text(SYNTH)
    s = parse_ibl(str(p))
    d = -s.sun.direction()  # direction TOWARD the sky point
    uv = np.asarray(world_to_sky_uv(d[None, :]))[0]
    assert abs(uv[0] % 1.0 - s.sun.u % 1.0) < 1e-3
    assert abs(uv[1] - s.sun.v) < 1e-3


@pytest.mark.skipif(not os.path.isdir(REF_SET), reason="reference assets absent")
def test_parse_reference_set():
    p = find_ibl(REF_SET)
    assert p is not None
    s = parse_ibl(p)
    assert s.environment_file and s.environment_file.endswith(".hdr")
    assert s.sun is not None
    assert s.environment_multiplier > 0
