"""Top-level differentiable render function.

TPU-native replacement for the whole reference frame path — ``PBRApp::Draw``'s
seven PSO layer passes (``PBRApp.cpp:245-352``) plus the ``Default.hlsl`` /
``Skybox.hlsl`` programs — collapsed into ONE pure jitted function:

    image = render(scene, camera, width=W, height=H)

Pipeline (all stages traced into a single XLA program):
  1. flatten_scene: instance-expand geometry to world space (MXU einsums) —
     the VS world-transform stage.
  2. clip transform posW @ ViewProj — the VS projection stage.
  3. rasterize: tile-based hard rasterizer → per-pixel triangle id.
  4. compute_barycentrics + interpolate: differentiable attribute fetch
     (the HW interpolator).
  5. shade: Cook-Torrance PBR with texture-mask material permutations —
     the PS stage, uniform over all material classes.
  6. sky: analytic equirect background (the Skybox pass).
  7. tonemap: Reinhard + gamma (Default.hlsl:152-155).

Gradients flow to: material scalars, texture texels, lights, ambient, env
map, world matrices and vertex positions (shading/interp gradients; soft-
visibility geometry gradients live in ops/raster_soft.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import math3d
from .camera import Camera
from .models.material import (
    MaterialBank,
    SLOT_DIFFUSE,
    SLOT_DISPLACEMENT,
    SLOT_METALLIC,
    SLOT_NORMAL,
    SLOT_OPACITY,
    SLOT_ROUGHNESS,
    SLOT_SPECULAR,
)
from .models.scene import (
    CornerGeometry,
    FlatGeometry,
    Scene,
    flatten_scene,
    flatten_scene_corners,
)
from .ops import (
    raster,
    raster_pallas,
    raster_soft,
    sky as sky_ops,
    tonemap as tonemap_ops,
)
from .ops.brdf import Lights, MaterialSample, compute_lighting, normal_sample_to_world_space
from .ops.fetch import fetch_columns
from .ops.ibl import IBLMaps, ambient_ibl
from .ops.texture import TextureAtlas, sample_atlas
from .ops.texture_combined import (
    CombinedAtlas,
    HalfCombinedAtlas,
    PackedCombinedAtlas,
    QuadCombinedAtlas,
    sample_combined,
    sample_combined_half,
    sample_combined_packed,
    sample_combined_quad,
)


def shade_pixels(
    *,
    pos_w: jnp.ndarray,  # (..., 3)
    normal_w: jnp.ndarray,  # (..., 3)
    tangent_w: jnp.ndarray,  # (..., 3)
    bitangent_w: jnp.ndarray,  # (..., 3)
    uv: jnp.ndarray,  # (..., 2)
    material_id: jnp.ndarray,  # (...,) int32
    materials: MaterialBank,
    atlas: TextureAtlas | None,
    lights: Lights,
    ambient: jnp.ndarray,  # (3,)
    eye: jnp.ndarray,  # (3,)
    ibl: IBLMaps | None = None,
    combined: CombinedAtlas | None = None,
    mip_lod: bool = False,
    ibl_split: bool = False,
    aniso_taps: int = 1,
) -> tuple[jnp.ndarray, ...]:
    """The PS stage (``Default.hlsl:47-161``) over arbitrary pixel batch dims.

    Returns (hdr_color (...,3), opacity (...,), keep (...,) bool or None).

    ``ibl_split=True`` (requires ``ibl.irradiance_sh9``): the env-GATHER half
    of the IBL ambient is deferred to the caller — returns THREE extra
    arrays (spec_f (...,3), rdir (...,3), rough (...,)) and ``hdr_color``
    holds only direct + SH9 diffuse; final hdr = hdr + spec_f ·
    prefiltered(rdir, rough). This is how the textured G-buffer path rides
    the same merged spec/sky gather as the fused-IBL kernel
    (``ops.ibl.sample_spec_sky_merged``).
    ``keep`` is the parallax UV clip (``Default.hlsl:65-68``): False where a
    displacement-mapped material's offset uv exited [0,1] (the fragment is
    discarded, like HLSL ``clip``); None when no displacement map is bound
    (the test compiles out). The reference's five shader permutations
    (OPAQUE/ASRND/AMRN/TEXTURELESS/ALPHA_TEST, ``PBRApp.cpp:713-774``) are
    realised as per-material presence masks so a single kernel covers every
    layer — uniform control flow for the VPU.
    """
    mid = material_id
    textured = combined is not None or atlas is not None
    keep = None

    # Renormalize interpolated normal (Default.hlsl:50); tangent frame is used
    # raw, as the reference does.
    n_geom = math3d.normalize(normal_w)
    v = math3d.normalize(eye - pos_w)

    # Constant (cbMaterial) properties: ONE consolidated per-pixel table fetch
    # (exact gather forward, one-hot MXU matmul backward — see ops/fetch.py;
    # the naive per-field gather's scatter-add pullback was ~17 ms/frame).
    m = materials.num_materials
    cols = [
        materials.diffuse,  # 0:3
        materials.metallic[:, None],  # 3
        materials.fresnel_r0,  # 4:7
        materials.roughness[:, None],  # 7
        materials.opacity[:, None],  # 8
    ]
    if textured:
        cols += [
            materials.height_scale[:, None],  # 9
            materials.uv_transform.reshape(m, 6),  # 10:16
            materials.has_tex,  # 16:28
        ]
    props = fetch_columns(jnp.concatenate(cols, axis=-1), mid)
    c_diffuse = props[..., 0:3]
    c_metallic = props[..., 3]
    c_f0 = props[..., 4:7]
    c_roughness = props[..., 7]
    c_opacity = props[..., 8]

    if textured:
        has = props[..., 16:28]  # (..., 12)

        # Material UV transform (g_MatTransform, Default.hlsl:42): [u,v,1] @ A.
        a = props[..., 10:16].reshape(*uv.shape[:-1], 3, 2)
        uv_t = (
            uv[..., 0:1] * a[..., 0, :] + uv[..., 1:2] * a[..., 1, :] + a[..., 2, :]
        )

        # Parallax offset mapping — the displacement path the reference left
        # commented out (Default.hlsl:55-69), completed here: offset the uv
        # by the tangent-space view direction scaled by sampled height.
        # Only active for materials binding a displacement map (mask), and
        # only available on the per-slot atlas (the combined bake has no
        # displacement channel; parallax-displaced uv would invalidate the
        # single-fetch assumption anyway).
        if atlas is not None and materials.any_displacement:  # static gate
            h_disp = has[..., SLOT_DISPLACEMENT]
            t_height = sample_atlas(
                atlas, materials.tex_index[mid][..., SLOT_DISPLACEMENT], uv_t
            )[..., 0]
            # V in tangent space: rows of TBN are T, B, N (row-vector mul)
            v_tan = jnp.stack(
                [
                    math3d.dot(v, math3d.normalize(tangent_w)),
                    math3d.dot(v, math3d.normalize(bitangent_w)),
                ],
                axis=-1,
            )
            h_scale = props[..., 9]
            uv_off = v_tan * (t_height * h_scale)[..., None]
            uv_t = uv_t - h_disp[..., None] * uv_off
            # Parallax UV clip (Default.hlsl:65-68): the reference kills
            # fragments whose displaced uv exits [0,1] (four clip() calls).
            # Only displacement-mapped materials test it.
            oob = (
                (uv_t[..., 0] < 0.0)
                | (uv_t[..., 1] < 0.0)
                | (uv_t[..., 0] > 1.0)
                | (uv_t[..., 1] > 1.0)
            )
            keep = ~((h_disp > 0.5) & oob)

        # (Round-5 negative result: collapsing untextured-material pixels'
        # uv to 0 so their gather rows coalesce changed pbr_textured_f32 by
        # <2% — the big-table gather is not working-set-bound at this
        # scene's footprint mix, so the extra masking was dropped.)

        # Screen-space mip LOD (default ON for textured scenes with a baked
        # pyramid): derivative-based level selection, the anti-aliasing the
        # reference's 1-mip textures can't do (WICTextureLoader.h:78 — pass
        # mip_lod=False for exact 1-mip reference parity). Needs a 2-D
        # (rows, W) pixel layout — flat pixel batches keep bilinear mip 0.
        # ``aniso_taps`` > 1 additionally spreads that many trilinear taps
        # along the major footprint axis (SamplerAnisotropicWrap parity,
        # Default.hlsl:80) — N× the gather cost, quality within a few % RMS
        # of a 16-tap oracle (tests/test_aniso_delta.py).
        lod = None
        aniso_axis = None
        if mip_lod and uv_t.ndim >= 3:
            from .ops.texture import screen_space_lod, screen_space_lod_aniso

            src_sz = None
            if combined is not None:
                if getattr(combined, "num_levels", 1) > 1 or (
                    isinstance(combined, CombinedAtlas)
                    and combined.mips is not None
                ):
                    src_sz = combined.size
            elif atlas is not None and atlas.num_levels > 1:
                src_sz = atlas.size
            if src_sz is not None:
                if aniso_taps > 1:
                    lod, aniso_axis = screen_space_lod_aniso(
                        uv_t, src_sz, aniso_taps
                    )
                else:
                    lod = screen_space_lod(uv_t, src_sz)

        def multi_tap(sample_fn):
            """Average ``aniso_taps`` samples along the major footprint axis
            (one plain sample when aniso is off)."""
            if aniso_axis is None:
                return sample_fn(uv_t)
            acc = None
            for k in range(aniso_taps):
                f = (k + 0.5) / aniso_taps - 0.5
                s_ = sample_fn(uv_t + aniso_axis * f)
                acc = s_ if acc is None else acc + s_
            return acc / aniso_taps

        if combined is not None:
            # One gather for every slot (see ops/texture_combined.py).
            if isinstance(combined, PackedCombinedAtlas):
                smp = multi_tap(
                    lambda u: sample_combined_packed(combined, mid, u, lod=lod)
                )
            elif isinstance(combined, QuadCombinedAtlas):
                smp = multi_tap(
                    lambda u: sample_combined_quad(combined, mid, u, lod=lod)
                )
            elif isinstance(combined, HalfCombinedAtlas):
                smp = multi_tap(
                    lambda u: sample_combined_half(combined, mid, u, lod=lod)
                )
            else:
                smp = multi_tap(
                    lambda u: sample_combined(combined, mid, u, lod=lod)
                )
            t_diffuse = smp[..., 0:3]
            t_specular = smp[..., 3:6]
            t_metallic = smp[..., 6:7]
            t_roughness = smp[..., 7:8]
            t_normal = smp[..., 8:11]
            t_opacity = smp[..., 11:12]
        else:
            pages = materials.tex_index[mid]  # (..., 12)

            def tex(slot):
                return multi_tap(
                    lambda u: sample_atlas(atlas, pages[..., slot], u, lod=lod)
                )

            t_diffuse = tex(SLOT_DIFFUSE)
            t_specular = tex(SLOT_SPECULAR)
            t_metallic = tex(SLOT_METALLIC)
            t_roughness = tex(SLOT_ROUGHNESS)
            t_normal = tex(SLOT_NORMAL)
            t_opacity = tex(SLOT_OPACITY)

        h = lambda s: has[..., s : s + 1]
        albedo = h(SLOT_DIFFUSE) * t_diffuse[..., :3] + (1.0 - h(SLOT_DIFFUSE)) * c_diffuse
        metallic = (
            has[..., SLOT_METALLIC] * t_metallic[..., 0]
            + (1.0 - has[..., SLOT_METALLIC]) * c_metallic
        )
        # No specular map → F0 = lerp(const F0, albedo, metallic)
        # (Default.hlsl:94-96); with map → raw map value (Default.hlsl:92).
        f0_const = math3d.lerp(c_f0, albedo, metallic[..., None])
        f0 = h(SLOT_SPECULAR) * t_specular[..., :3] + (1.0 - h(SLOT_SPECULAR)) * f0_const
        roughness = (
            has[..., SLOT_ROUGHNESS] * t_roughness[..., 0]
            + (1.0 - has[..., SLOT_ROUGHNESS]) * c_roughness
        )
        # Normal mapping (Default.hlsl:104-109) — result deliberately NOT
        # renormalised (parity with NormalSampleToWorldSpace).
        n_mapped = normal_sample_to_world_space(
            t_normal[..., :3], n_geom, tangent_w, bitangent_w
        )
        n = h(SLOT_NORMAL) * n_mapped + (1.0 - h(SLOT_NORMAL)) * n_geom
        # Alpha test (Default.hlsl:111-116): opacity from map where bound.
        opacity = (
            has[..., SLOT_OPACITY] * t_opacity[..., 0]
            + (1.0 - has[..., SLOT_OPACITY]) * c_opacity
        )
    else:
        albedo = c_diffuse
        metallic = c_metallic
        f0 = math3d.lerp(c_f0, albedo, metallic[..., None])
        roughness = c_roughness
        n = n_geom
        opacity = c_opacity

    mat = MaterialSample(
        diffuse_albedo=albedo, metallic=metallic, fresnel_r0=f0, roughness=roughness
    )
    direct = compute_lighting(lights, mat, pos_w, n, v)
    if ibl is not None and ibl_split:
        # In-shader half of the IBL ambient (ambient_ibl semantics, split
        # exactly like shade_core's ibl mode): kd·irr_SH9·albedo here, the
        # prefiltered-specular gather deferred to the caller's merged fetch.
        from .ops.ibl import env_brdf_approx, sh9_irradiance

        assert ibl.irradiance_sh9 is not None, "ibl_split needs SH9 irradiance"
        n_unit = math3d.normalize(n)
        ndotv = jnp.maximum(math3d.dot(n_unit, v), 0.0)
        ks = f0 + (1.0 - f0) * jnp.power(1.0 - ndotv, 5.0)[..., None]
        kd = (1.0 - ks) * (1.0 - metallic)[..., None]
        irr = sh9_irradiance(ibl.irradiance_sh9, n_unit)
        ab = env_brdf_approx(ndotv, roughness)
        spec_f = f0 * ab[..., 0:1] + ab[..., 1:2]
        rdir = math3d.normalize(2.0 * ndotv[..., None] * n_unit - v)
        lit = direct + kd * irr * albedo
        return lit, opacity, keep, spec_f, rdir, roughness
    if ibl is not None:
        # IBL ambient replaces the constant term — the path the reference
        # stubbed out (Default.hlsl:140-149) plus split-sum specular.
        n_unit = math3d.normalize(n)
        amb = ambient_ibl(ibl, n_unit, v, albedo, f0, metallic, roughness)
    else:
        amb = ambient * albedo  # g_AmbientLight·albedo (Default.hlsl:150)
    lit = amb + direct
    return lit, opacity, keep


@functools.partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "rows",
        "tile_h",
        "tile_w",
        "tri_block",
        "cull_backface",
        "apply_tonemap",
        "raster_backend",
        "gbuf_precision",
        "raster_pairs_cap",
        "mip_lod",
        "ibl_merged",
        "aniso_taps",
    ),
)
def render(
    scene: Scene,
    camera: Camera,
    *,
    width: int,
    height: int,
    rows: int | None = None,
    y_offset: jnp.ndarray | int = 0,
    tile_h: int | None = None,
    tile_w: int = 128,
    tri_block: int = 128,
    cull_backface: bool = True,
    apply_tonemap: bool = True,
    raster_backend: str = "auto",
    gbuf_precision: str = "highest",
    raster_pairs_cap: int | None = None,
    mip_lod: bool | None = None,
    ibl_merged: bool | None = None,
    aniso_taps: int = 1,
) -> jnp.ndarray:
    """Render the scene → (rows, W, 4) float32, display-encoded RGBA in [0,1].

    ``rows``/``y_offset`` select a horizontal band of the width×height
    viewport (defaults: the whole frame) — the unit of screen-tile sharding;
    ``y_offset`` may be a traced value (lax.axis_index in shard_map).

    ``raster_backend``: "auto" (Pallas kernel on TPU, jnp tiled elsewhere),
    "pallas", "pallas_interpret", "pallas_gbuf" / "pallas_gbuf_interpret"
    (fused raster+interpolation kernel), "jnp", or "brute" (O(H·W·T) oracle
    for tiny CPU reference renders).

    ``mip_lod``: None (default) resolves to True for textured scenes whose
    texture representation carries a mip pyramid — screen-space-derivative
    trilinear filtering, the minification anti-aliasing the reference's
    1-mip texture loads cannot do (``WICTextureLoader.h:78``). Pass False
    for exact 1-mip reference parity (the oracle-comparison mode)."""
    if rows is None:
        rows = height
    if mip_lod is None:
        # Default trilinear mip filtering ON for textured scenes whose
        # texture tables keep it affordable: 1080p row-gather cost scales
        # with TABLE footprint (≈7 ms/2M rows for ≤16 MB tables, 49-110 ms
        # at 126-503 MB — PERF.md round-4 gather law), and the stacked
        # trilinear pyramid doubles both the gather count and the table, so
        # for multi-megatexel atlases the default stays 1-mip (pass
        # mip_lod=True to force quality over speed).
        texels = 0
        src = scene.combined_atlas if scene.combined_atlas is not None else scene.atlas
        if src is not None:
            npages = getattr(src, "num_pages", None)
            if npages is None:
                npages = src.pages.shape[0] if hasattr(src, "pages") else 1
            texels = npages * src.size * src.size
        mip_lod = scene.atlas is not None and texels <= (1 << 20)
    # Corner-major geometry (models/scene.py CornerGeometry): the hot path
    # carries no vertex indices, so raster setup / binning / interpolation
    # run gather-free. Static channel specialisation (the shader-permutation
    # idea applied to the G-buffer): untextured scenes skip
    # tangent/bitangent/uv entirely.
    textured = scene.atlas is not None
    geom = flatten_scene_corners(scene, textured=textured)
    vp = camera.view_proj()
    clip = math3d.transform_points_h(geom.pos_w, vp)  # (T, 3, 4)
    packed = geom.attrs  # (T, 3, C) with C = 6 or 14
    # Adaptive binning span: small scenes tend to have LARGE on-screen
    # triangles; spans ≤ 64 emit densely and the few larger ones go jumbo.
    # Round-4 measurement kept this over the no-jumbo big2 class: with a
    # full-frame backdrop (mori_knob), the small shared jumbo run is CHEAPER
    # than distributing those pairs into every tile's own run (15.2 vs
    # 20.5 ms raster-only), and the kernel now keeps the jumbo run RESIDENT
    # in VMEM (one DMA for the whole frame instead of one per tile).
    num_tris = geom.pos_w.shape[0]
    span_wide = num_tris <= (1 << 15)
    # Resolution scaling: (tile, triangle) pair counts and on-screen spans
    # grow ~linearly with pixel count, so at super-1080p resolutions
    # (render_ssaa renders 4× pixels) the default pairs cap would silently
    # drop triangles and mid-size triangles would flood the jumbo class
    # (measured: 4K ssaa at the 1080p defaults ran 2.6 s/frame).
    res_scale = max(1, (width * height) // (1 << 21))
    if raster_pairs_cap is None and res_scale > 1:
        raster_pairs_cap = max(num_tris, 1 << 16) * (res_scale + 1)
    ms_scale = 2 if res_scale >= 2 else 1
    # At ≥2× the 1080p pixel count the big class floods its ranked cap and
    # spills to jumbo (a 4K run spilled ~126k pairs into the global run =
    # 2.6 s/frame); emit the whole class densely instead — the bigger sort
    # is linear, the jumbo rescan is ntiles×.
    bin_big_cap = num_tris if res_scale >= 2 else None

    sky_src0 = scene.sky_map if scene.sky_map is not None else scene.env_map
    ibl_fusable = (
        not textured
        and scene.ibl is not None
        and not scene.materials.any_alpha_test
        and scene.ibl.irradiance_sh9 is not None
        and scene.ibl.specular_stack_f16 is not None
    )
    backend = raster_backend
    if backend == "auto":
        if jax.default_backend() == "cpu":
            backend = "jnp"
        elif (
            not textured
            and scene.ibl is None
            and not scene.materials.any_alpha_test
        ):
            # Analytic-material scenes take the fully-fused raster+shade
            # kernel (no G-buffer HBM round trip, no XLA shade/tonemap tail)
            # in its round-5 ROW layout (ops/raster_row: eval cost scales
            # with pairs, not tiles — grid 1080p fwd 13.9 → 10.5 ms).
            backend = "pallas_shade_row"
        elif ibl_fusable:
            # Untextured + IBL (the north-star config): fused kernel computes
            # direct + SH9 diffuse + env-BRDF factor in-kernel; specular
            # prefilter and sky share ONE merged row gather outside. Row
            # layout: knob kernel path 23.4 → 12.2 ms (with the distributed
            # jumbo emission below).
            backend = "pallas_shade_ibl_row"
        else:
            backend = "pallas_gbuf"

    fused_gbuf = backend in (
        "pallas_gbuf", "pallas_gbuf_interpret", "pallas_gbuf_row"
    )
    fused_shade = backend in (
        "pallas_shade", "pallas_shade_interpret", "pallas_shade_row"
    )
    fused_ibl = backend in (
        "pallas_shade_ibl", "pallas_shade_ibl_interpret", "pallas_shade_ibl_row"
    )
    # Row-layout kernel (ops/raster_row): eval cost scales with pairs, not
    # tiles — the round-5 eval-floor fix. Same outputs and backward.
    row_layout = backend.endswith("_row")
    # With the row layout, distributing the ex-jumbo triangles densely into
    # per-tile runs WINS (knob kernel 13.3 → 12.2 ms): the extra 1-3 pairs
    # per covered tile are absorbed by the sparse sublane sub-chunks, while
    # a jumbo run costs every tile a full 128-wide eval. (The same
    # distribution LOST on the v1 kernels — round-4 negative result — so it
    # is gated on row_layout.) Spans beyond 4096 tiles still fall back to
    # the jumbo run (super-1080p safety).
    row_big2_span = 4096 if (row_layout and span_wide) else 0
    row_big2_cap = 256
    if fused_ibl:
        assert ibl_fusable, (
            "pallas_shade_ibl needs an untextured scene with IBLMaps carrying "
            "irradiance_sh9 + specular_stack_f16 and no alpha test"
        )
        materials = scene.materials
        mat_props = jnp.concatenate(
            [
                materials.diffuse,
                materials.metallic[:, None],
                materials.fresnel_r0,
                materials.roughness[:, None],
                materials.opacity[:, None],
            ],
            axis=-1,
        )  # (M, 9)
        lights = scene.lights
        chan, tri_id, _pix_mat = raster_pallas.raster_shade_ibl(
            clip,
            packed,
            geom.face_material,
            mat_props,
            lights.strength,
            lights.direction,
            lights.position,
            lights.spot_power,
            scene.ambient,
            camera.position,
            scene.ibl.irradiance_sh9,
            width=width,
            height=height,
            rows=rows,
            y_offset=y_offset,
            tile_h=tile_h if tile_h is not None else (8 if row_layout else 4),
            tile_w=tile_w,
            max_span=(64 if span_wide else 16) * ms_scale,
            big_cap=bin_big_cap,
            big2_span=row_big2_span,
            big2_cap=row_big2_cap,
            cull_backface=cull_backface,
            num_materials=materials.num_materials,
            num_dir=lights.num_dir,
            num_point=lights.num_point,
            num_spot=lights.num_spot,
            pairs_cap=raster_pairs_cap,
            interpret=(backend == "pallas_shade_ibl_interpret"),
            mm_precision=gbuf_precision,
            row_layout=row_layout,
        )
        hit = tri_id >= 0
        hdr_partial = chan[..., 0:3]
        spec_f = chan[..., 3:6]
        rdir = chan[..., 6:9]
        rough = chan[..., 9]
        opacity = chan[..., 10]

        from .ops.ibl import sample_spec_sky_merged, specular_levels_lerp
        from .ops.sky import world_to_sky_uv

        if sky_src0 is not None and sky_src0.dtype == jnp.uint32:
            # Quad-u8 LDR background: sky rows ride the SAME gather as the
            # specular prefilter (foreground/background rows are mutually
            # exclusive) — the whole ambient-environment tail is one gather.
            inv_vp = math3d.inverse(vp)
            dirs = sky_ops.camera_ray_directions(inv_vp, width, height, rows, y_offset)
            sky_uv = world_to_sky_uv(dirs)
            smp_all, sky_rgb = sample_spec_sky_merged(
                scene.ibl, rdir, hit, sky_src0, sky_uv
            )
            bg_rgb = tonemap_ops.tonemap(sky_rgb) if apply_tonemap else sky_rgb
        elif sky_src0 is not None:
            smp_all, _ = sample_spec_sky_merged(scene.ibl, rdir, hit, None, None)
            inv_vp = math3d.inverse(vp)
            dirs = sky_ops.camera_ray_directions(inv_vp, width, height, rows, y_offset)
            sky_rgb = sky_ops.sample_sky(sky_src0, dirs)
            bg_rgb = tonemap_ops.tonemap(sky_rgb) if apply_tonemap else sky_rgb
        else:
            smp_all, _ = sample_spec_sky_merged(scene.ibl, rdir, hit, None, None)
            bg_rgb = jnp.broadcast_to(scene.clear_color, (rows, width, 3))
        # Background rows of the merged gather hold sky words — their f16
        # reinterpretation can be inf/NaN, and 0·NaN would poison the
        # composite, so mask BEFORE any arithmetic.
        smp_all = jnp.where(hit[..., None], smp_all, 0.0)
        prefiltered = specular_levels_lerp(
            smp_all, rough, scene.ibl.num_specular_levels
        )
        hdr = hdr_partial + spec_f * prefiltered
        fg_rgb = tonemap_ops.tonemap(hdr) if apply_tonemap else hdr
        m = hit[..., None].astype(jnp.float32)
        rgb = m * fg_rgb + (1.0 - m) * bg_rgb
        alpha = m[..., 0] * opacity + (1.0 - m[..., 0]) * 1.0
        return jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    if fused_shade:
        assert not textured and scene.ibl is None, (
            "pallas_shade fuses the untextured constant-material shader only"
        )
        assert not scene.materials.any_alpha_test, (
            "pallas_shade has no depth-peel hook; use pallas_gbuf"
        )
        materials = scene.materials
        mat_props = jnp.concatenate(
            [
                materials.diffuse,
                materials.metallic[:, None],
                materials.fresnel_r0,
                materials.roughness[:, None],
                materials.opacity[:, None],
            ],
            axis=-1,
        )  # (M, 9)
        lights = scene.lights
        rgba_fg, tri_id, _pix_mat = raster_pallas.raster_shade(
            clip,
            packed,
            geom.face_material,
            mat_props,
            lights.strength,
            lights.direction,
            lights.position,
            lights.spot_power,
            scene.ambient,
            camera.position,
            width=width,
            height=height,
            rows=rows,
            y_offset=y_offset,
            tile_h=tile_h if tile_h is not None else (8 if row_layout else 4),
            tile_w=tile_w,
            max_span=(64 if span_wide else 16) * ms_scale,
            big_cap=bin_big_cap,
            big2_span=row_big2_span,
            big2_cap=row_big2_cap,
            cull_backface=cull_backface,
            num_materials=materials.num_materials,
            num_dir=lights.num_dir,
            num_point=lights.num_point,
            num_spot=lights.num_spot,
            apply_tonemap=apply_tonemap,
            pairs_cap=raster_pairs_cap,
            interpret=(backend == "pallas_shade_interpret"),
            mm_precision=gbuf_precision,
            row_layout=row_layout,
        )
        mask = tri_id >= 0
        fg_rgb = rgba_fg[..., :3]
        opacity = rgba_fg[..., 3]

        sky_src = scene.sky_map if scene.sky_map is not None else scene.env_map
        if sky_src is not None:
            inv_vp = math3d.inverse(vp)
            dirs = sky_ops.camera_ray_directions(inv_vp, width, height, rows, y_offset)
            sky_rgb = sky_ops.sample_sky(sky_src, dirs)
            bg_rgb = tonemap_ops.tonemap(sky_rgb) if apply_tonemap else sky_rgb
        else:
            bg_rgb = jnp.broadcast_to(scene.clear_color, (rows, width, 3))
        m = mask[..., None].astype(jnp.float32)
        rgb = m * fg_rgb + (1.0 - m) * bg_rgb
        alpha = m[..., 0] * opacity + (1.0 - m[..., 0]) * 1.0
        return jnp.concatenate([rgb, alpha[..., None]], axis=-1)

    # Merged spec/sky gather for the TEXTURED (G-buffer-path) IBL tail — the
    # same one-gather ambient-environment fetch the fused-IBL kernel uses
    # (``ops.ibl.sample_spec_sky_merged``), now serving textured scenes like
    # the reference's own rustediron+sIBL sample (Samples/rusted_iron_pbr.png,
    # BASELINE configs 3+5). Auto: ON for the TPU kernel backends when the
    # IBL maps carry SH9 + the f16 specular stack and no alpha test peels
    # (the gather needs one hit mask for the whole frame); the jnp/brute
    # oracle paths keep the reference ambient_ibl formulation.
    ibl_split_ok = (
        scene.ibl is not None
        and scene.ibl.irradiance_sh9 is not None
        and scene.ibl.specular_stack_f16 is not None
        and not scene.materials.any_alpha_test
        and not fused_shade
        and not fused_ibl
        and backend not in ("jnp", "brute")
    )
    if ibl_merged is None:
        use_ibl_split = ibl_split_ok
    else:
        use_ibl_split = ibl_merged and ibl_split_ok

    def raster_and_shade(z_floor):
        """One raster+shade layer → (hdr, opacity, mask, depth, pix_mat[,
        spec_f, rdir, rough when the merged-IBL split is active]).
        ``z_floor`` (rows, W) or None — the depth-peeling hook the alpha-test
        second pass uses. depth is +inf/garbage at background (masked)."""
        pix_mat_k = None
        depth = None
        if backend == "brute":
            assert rows == height, "brute rasterizer renders full frames only"
            assert z_floor is None, "brute backend has no depth peeling"
            tri_id = raster.rasterize_brute(
                clip, None, width=width, height=height, cull_backface=cull_backface
            )
        elif fused_gbuf:
            # Fused raster + G-buffer kernel: attrs come straight out of the
            # raster pass (plane-evaluated in VMEM), no per-pixel XLA gather.
            attrs, depth, tri_id, pix_mat_k = raster_pallas.raster_gbuffer(
                clip,
                packed,
                None,
                geom.face_material,
                width=width,
                height=height,
                rows=rows,
                y_offset=y_offset,
                tile_h=tile_h if tile_h is not None else (4 if row_layout else 16),
                tile_w=tile_w,
                max_span=(64 if span_wide else (16 if row_layout else 8))
                * ms_scale,
                big_cap=bin_big_cap,
                big2_span=row_big2_span,
                big2_cap=row_big2_cap,
                cull_backface=cull_backface,
                num_materials=scene.materials.num_materials,
                pairs_cap=raster_pairs_cap,
                interpret=(backend == "pallas_gbuf_interpret"),
                mm_precision=gbuf_precision,
                z_floor=z_floor,
                row_layout=row_layout,
            )
            mask = tri_id >= 0
        elif backend in ("pallas", "pallas_interpret"):
            out = raster_pallas.rasterize_binned(
                clip,
                None,
                width=width,
                height=height,
                rows=rows,
                y_offset=y_offset,
                tile_h=tile_h if tile_h is not None else 16,
                tile_w=tile_w,
                max_span=(64 if span_wide else 8) * ms_scale,
                big_cap=bin_big_cap,
                cull_backface=cull_backface,
                face_material=geom.face_material,
                num_materials=scene.materials.num_materials,
                pairs_cap=raster_pairs_cap,
                interpret=(backend == "pallas_interpret"),
                z_floor=z_floor,
                return_depth=z_floor is not None or scene.materials.any_alpha_test,
            )
            if len(out) == 3:
                tri_id, pix_mat_k, depth = out
            else:
                tri_id, pix_mat_k = out
        elif backend == "jnp":
            want_depth = z_floor is not None or scene.materials.any_alpha_test
            out = raster.rasterize(
                clip,
                None,
                width=width,
                height=height,
                rows=rows,
                y_offset=y_offset,
                tile_h=tile_h if tile_h is not None else 32,
                tile_w=tile_w,
                tri_block=tri_block,
                cull_backface=cull_backface,
                z_floor=z_floor,
                return_depth=want_depth,
            )
            tri_id, depth = out if want_depth else (out, None)
        else:
            raise ValueError(f"unknown raster_backend {raster_backend!r}")

        if not fused_gbuf:
            attrs, depth_i, mask = raster.interpolate_corners(
                packed, clip, tri_id, width=width, height=height, y_offset=y_offset
            )
            if depth is None:
                depth = depth_i
        pos_w = attrs[..., 0:3]
        normal_w = attrs[..., 3:6]
        if textured:
            tangent_w = attrs[..., 6:9]
            bitangent_w = attrs[..., 9:12]
            uv = attrs[..., 12:14]
        else:
            tangent_w = normal_w  # unused by the untextured shading path
            bitangent_w = normal_w
            uv = attrs[..., 0:2] * 0.0
        if pix_mat_k is not None:
            pix_mat = pix_mat_k  # resolved inside the raster kernel (free)
        else:
            pix_mat = geom.face_material[jnp.maximum(tri_id, 0)]

        out = shade_pixels(
            pos_w=pos_w,
            normal_w=normal_w,
            tangent_w=tangent_w,
            bitangent_w=bitangent_w,
            uv=uv,
            material_id=pix_mat,
            materials=scene.materials,
            atlas=scene.atlas,
            lights=scene.lights,
            ambient=scene.ambient,
            eye=camera.position,
            ibl=scene.ibl,
            combined=scene.combined_atlas,
            mip_lod=mip_lod,
            ibl_split=use_ibl_split,
            aniso_taps=aniso_taps,
        )
        hdr, opacity, keep = out[0], out[1], out[2]
        if keep is not None:
            # Parallax UV clip: discarded fragments fall through to the
            # background (render_layered peels to the next surface instead).
            mask = mask & keep
        return (hdr, opacity, mask, depth, pix_mat) + tuple(out[3:])

    shaded = raster_and_shade(None)
    hdr, opacity, mask, depth, pix_mat = shaded[:5]

    # Alpha test (clip(opacity − 0.1), Default.hlsl:111-116): statically
    # compiled in only when a material requests it. Fragments an alpha-tested
    # material kills reveal the next-nearest fragment — resolved by one depth
    # peel (the reference's depth buffer resolves all levels; one extra layer
    # covers its actual content; use render_layered for deeper stacks).
    if scene.materials.any_alpha_test and backend != "brute":
        at1 = scene.materials.alpha_test[pix_mat] > 0.5
        killed = mask & at1 & (opacity < 0.1)
        zf = jnp.where(mask, depth, -jnp.inf)
        hdr2, op2, mask2, _d2, pm2 = raster_and_shade(zf)
        at2 = scene.materials.alpha_test[pm2] > 0.5
        accept2 = mask2 & (~at2 | (op2 >= 0.1))
        hdr = jnp.where(killed[..., None], hdr2, hdr)
        opacity = jnp.where(killed, op2, opacity)
        mask = jnp.where(killed, accept2, mask)
    elif scene.materials.any_alpha_test:
        # brute oracle: single layer — killed pixels fall through to the sky.
        at1 = scene.materials.alpha_test[pix_mat] > 0.5
        mask = mask & ~(at1 & (opacity < 0.1))

    if use_ibl_split:
        # Complete the deferred IBL half with the ONE merged spec/sky
        # gather (identical structure to the fused-IBL kernel's epilogue).
        spec_f, rdir, rough = shaded[5], shaded[6], shaded[7]
        from .ops.ibl import sample_spec_sky_merged, specular_levels_lerp
        from .ops.sky import world_to_sky_uv

        if sky_src0 is not None and sky_src0.dtype == jnp.uint32:
            inv_vp = math3d.inverse(vp)
            dirs = sky_ops.camera_ray_directions(inv_vp, width, height, rows, y_offset)
            sky_uv = world_to_sky_uv(dirs)
            smp_all, sky_rgb = sample_spec_sky_merged(
                scene.ibl, rdir, mask, sky_src0, sky_uv
            )
            bg_rgb = tonemap_ops.tonemap(sky_rgb) if apply_tonemap else sky_rgb
        elif sky_src0 is not None:
            smp_all, _ = sample_spec_sky_merged(scene.ibl, rdir, mask, None, None)
            inv_vp = math3d.inverse(vp)
            dirs = sky_ops.camera_ray_directions(inv_vp, width, height, rows, y_offset)
            sky_rgb = sky_ops.sample_sky(sky_src0, dirs)
            bg_rgb = tonemap_ops.tonemap(sky_rgb) if apply_tonemap else sky_rgb
        else:
            smp_all, _ = sample_spec_sky_merged(scene.ibl, rdir, mask, None, None)
            bg_rgb = jnp.broadcast_to(scene.clear_color, (rows, width, 3))
        # Background rows of the merged gather may reinterpret sky words as
        # inf/NaN f16 — mask BEFORE arithmetic.
        smp_all = jnp.where(mask[..., None], smp_all, 0.0)
        prefiltered = specular_levels_lerp(
            smp_all, rough, scene.ibl.num_specular_levels
        )
        hdr = hdr + spec_f * prefiltered
        fg_rgb = tonemap_ops.tonemap(hdr) if apply_tonemap else hdr
        m = mask[..., None].astype(jnp.float32)
        rgb = m * fg_rgb + (1.0 - m) * bg_rgb
        alpha = m[..., 0] * opacity + (1.0 - m[..., 0]) * 1.0
        return jnp.concatenate([rgb, alpha[..., None]], axis=-1)

    if apply_tonemap:
        fg_rgb = tonemap_ops.tonemap(hdr)
    else:
        fg_rgb = hdr

    # Background: analytic skybox pass where nothing was rasterized
    # (equivalent to the reference's far-plane sky sphere, Skybox.hlsl), else
    # the 0.5-grey clear color (PBRApp.cpp:274) written raw to the backbuffer.
    # The visible sky samples sky_map (the sIBL LDR background, the
    # reference's g_SkyArray[0]) when present; IBL keeps the HDR env.
    sky_src = scene.sky_map if scene.sky_map is not None else scene.env_map
    if sky_src is not None:
        inv_vp = math3d.inverse(vp)
        dirs = sky_ops.camera_ray_directions(inv_vp, width, height, rows, y_offset)
        sky_rgb = sky_ops.sample_sky(sky_src, dirs)
        bg_rgb = tonemap_ops.tonemap(sky_rgb) if apply_tonemap else sky_rgb
    else:
        bg_rgb = jnp.broadcast_to(scene.clear_color, (rows, width, 3))

    m = mask[..., None].astype(jnp.float32)
    rgb = m * fg_rgb + (1.0 - m) * bg_rgb
    alpha = m[..., 0] * opacity + (1.0 - m[..., 0]) * 1.0
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def shade_compose_band(
    scene: Scene,
    camera: Camera,
    geom: "CornerGeometry",
    clip: jnp.ndarray,
    tri_id: jnp.ndarray,
    *,
    width: int,
    height: int,
    y_offset: jnp.ndarray | int = 0,
    apply_tonemap: bool = True,
) -> jnp.ndarray:
    """Shade + sky + tonemap + compose a band given resolved triangle ids.

    The deferred tail of :func:`render` as a standalone differentiable
    function over corner-major geometry: interpolate the G-buffer for
    ``tri_id`` (rows, W), run the PS stage, and composite over the sky /
    clear color. Used by the triangle-sharded multi-chip path
    (``parallel.sharded.render_tri_sharded``), whose raster+merge happens
    across chips but whose shading is exactly this, band-local — one
    implementation, no drift from ``render``.
    """
    attrs, _depth, mask = raster.interpolate_corners(
        geom.attrs, clip, tri_id, width=width, height=height, y_offset=y_offset
    )
    pix_mat = geom.face_material[jnp.maximum(tri_id, 0)]
    return shade_compose_band_attrs(
        scene, camera, attrs, mask, pix_mat,
        width=width, height=height, y_offset=y_offset,
        apply_tonemap=apply_tonemap,
    )


def shade_compose_band_attrs(
    scene: Scene,
    camera: Camera,
    attrs: jnp.ndarray,  # (rows, W, C) interpolated G-buffer attributes
    mask: jnp.ndarray,  # (rows, W) bool — foreground coverage
    pix_mat: jnp.ndarray,  # (rows, W) i32 material ids
    *,
    width: int,
    height: int,
    y_offset: jnp.ndarray | int = 0,
    apply_tonemap: bool = True,
) -> jnp.ndarray:
    """Shade + sky + tonemap + compose a band from PRE-INTERPOLATED
    attributes — the tail of :func:`shade_compose_band` once the G-buffer is
    assembled. Split out so the memory-sharded triangle path can build the
    band's attributes via its ring attribute exchange
    (``parallel.sharded.render_tri_sharded``) and still shade through the
    one shared implementation.

    On TPU, untextured constant-material scenes (no IBL, no alpha test)
    shade through the SAME fused Pallas kernels as the row-band fast path
    (``raster_pallas.shade_fused`` forward + ``shade_backward`` VJP); other
    scenes take the general XLA shader."""
    rows = mask.shape[0]
    textured = scene.atlas is not None
    fusable = (
        not textured
        and scene.ibl is None
        and not scene.materials.any_alpha_test
        and jax.default_backend() != "cpu"
    )
    if fusable:
        materials = scene.materials
        mat_props = jnp.concatenate(
            [
                materials.diffuse,
                materials.metallic[:, None],
                materials.fresnel_r0,
                materials.roughness[:, None],
                materials.opacity[:, None],
            ],
            axis=-1,
        )
        lights = scene.lights
        rgba_fg = raster_pallas.shade_fused(
            attrs[..., :6],
            pix_mat,
            mask,
            mat_props,
            lights.strength,
            lights.direction,
            lights.position,
            lights.spot_power,
            scene.ambient,
            camera.position,
            num_dir=lights.num_dir,
            num_point=lights.num_point,
            num_spot=lights.num_spot,
            apply_tonemap=apply_tonemap,
        )
        fg_rgb = rgba_fg[..., :3]
        opacity = rgba_fg[..., 3]
        sky_src = scene.sky_map if scene.sky_map is not None else scene.env_map
        if sky_src is not None:
            inv_vp = math3d.inverse(camera.view_proj())
            dirs = sky_ops.camera_ray_directions(inv_vp, width, height, rows, y_offset)
            sky_rgb = sky_ops.sample_sky(sky_src, dirs)
            bg_rgb = tonemap_ops.tonemap(sky_rgb) if apply_tonemap else sky_rgb
        else:
            bg_rgb = jnp.broadcast_to(scene.clear_color, (rows, width, 3))
        m = mask[..., None].astype(jnp.float32)
        rgb = m * fg_rgb + (1.0 - m) * bg_rgb
        alpha = m[..., 0] * opacity + (1.0 - m[..., 0]) * 1.0
        return jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    pos_w = attrs[..., 0:3]
    normal_w = attrs[..., 3:6]
    if textured:
        tangent_w = attrs[..., 6:9]
        bitangent_w = attrs[..., 9:12]
        uv = attrs[..., 12:14]
    else:
        tangent_w = normal_w
        bitangent_w = normal_w
        uv = attrs[..., 0:2] * 0.0
    hdr, opacity, keep = shade_pixels(
        pos_w=pos_w,
        normal_w=normal_w,
        tangent_w=tangent_w,
        bitangent_w=bitangent_w,
        uv=uv,
        material_id=pix_mat,
        materials=scene.materials,
        atlas=scene.atlas,
        lights=scene.lights,
        ambient=scene.ambient,
        eye=camera.position,
        ibl=scene.ibl,
        combined=scene.combined_atlas,
    )
    if keep is not None:
        mask = mask & keep
    fg_rgb = tonemap_ops.tonemap(hdr) if apply_tonemap else hdr

    sky_src = scene.sky_map if scene.sky_map is not None else scene.env_map
    if sky_src is not None:
        inv_vp = math3d.inverse(camera.view_proj())
        dirs = sky_ops.camera_ray_directions(inv_vp, width, height, rows, y_offset)
        sky_rgb = sky_ops.sample_sky(sky_src, dirs)
        bg_rgb = tonemap_ops.tonemap(sky_rgb) if apply_tonemap else sky_rgb
    else:
        bg_rgb = jnp.broadcast_to(scene.clear_color, (rows, width, 3))
    m = mask[..., None].astype(jnp.float32)
    rgb = m * fg_rgb + (1.0 - m) * bg_rgb
    alpha = m[..., 0] * opacity + (1.0 - m[..., 0]) * 1.0
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def check_raster_capacity(
    scene: Scene,
    camera: Camera,
    *,
    width: int,
    height: int,
    rows: int | None = None,
    y_offset: int = 0,
    tile_h: int | None = None,
    tile_w: int = 128,
    pairs_cap: int | None = None,
    headroom: float = 1.25,
) -> dict:
    """Host-side binning-capacity check — the loud overflow path for
    backends where in-jit ``jax.debug.print`` cannot run (the axon TPU
    tunnel; see ``raster_bin._backend_supports_callbacks``).

    Runs the same triangle binning the Pallas rasterizer uses and returns
    host scalars: ``{"num_pairs", "pairs_cap", "overflowed",
    "suggested_pairs_cap"}``. Call it once per (scene topology, resolution)
    — e.g. on the first frame, as :class:`app.RenderLoop` does — and pass
    ``suggested_pairs_cap`` back into ``render(raster_pairs_cap=...)`` if
    ``overflowed``. ``suggested_pairs_cap`` includes ``headroom`` so nearby
    camera poses stay in capacity."""
    from .ops.raster import setup_corners
    from .ops.raster_bin import bin_triangles

    textured = scene.atlas is not None
    geom = flatten_scene_corners(scene, textured=textured)
    clip = math3d.transform_points_h(geom.pos_w, camera.view_proj())
    st = setup_corners(clip, width, height, True, None)
    span_wide = geom.pos_w.shape[0] <= (1 << 15)
    if tile_h is None:
        # Mirror render()'s backend defaults: the fused shade/IBL kernels
        # bin at 4-row tiles with max_span 16, the G-buffer kernel at 16/8;
        # small scenes add the second dense class (spans ≤ 128) so nothing
        # goes jumbo (the adaptive rule in render).
        fused_shade = (
            not textured
            and scene.ibl is None
            and not scene.materials.any_alpha_test
        )
        fused_ibl = (
            not textured
            and scene.ibl is not None
            and not scene.materials.any_alpha_test
        )
        # Row-layout fused kernels (the TPU auto default) bin at 8-row tiles
        tile_h = 8 if (fused_shade or fused_ibl) else 16
        max_span = 64 if span_wide else (16 if (fused_shade or fused_ibl) else 8)
    else:
        max_span = 64 if span_wide else 8
    binned = bin_triangles(
        st,
        width=width,
        height=height,
        rows=rows,
        y_offset=y_offset,
        tile_h=tile_h,
        tile_w=tile_w,
        max_span=max_span,
        pairs_cap=pairs_cap,
    )
    num_pairs_total = int(binned.num_pairs) if not bool(binned.overflowed) else None
    # num_pairs is clipped at the cap; recompute the true total for sizing.
    cap = pairs_cap if pairs_cap is not None else max(geom.num_triangles, 1 << 16)
    if num_pairs_total is None:
        # Overflowed: re-bin with a cap high enough to count everything
        # (slots are bounded by 2T + max_span·big_cap + T).
        big = bin_triangles(
            st,
            width=width,
            height=height,
            rows=rows,
            y_offset=y_offset,
            tile_h=tile_h,
            tile_w=tile_w,
            max_span=max_span,
            pairs_cap=max(cap * 16, 1 << 22),
        )
        num_pairs_total = int(big.num_pairs)
    suggested = -(-int(num_pairs_total * headroom) // 128) * 128
    return {
        "num_pairs": num_pairs_total,
        "pairs_cap": cap,
        "overflowed": bool(binned.overflowed),
        "suggested_pairs_cap": max(suggested, 128),
    }


def render_checked(
    scene: Scene,
    camera: Camera,
    *,
    width: int,
    height: int,
    tile_h: int | None = None,
    tile_w: int = 128,
    raster_pairs_cap: int | None = None,
    **render_kw,
) -> jnp.ndarray:
    """Debug-mode render: validate the binning invariants ON DEVICE with
    ``jax.experimental.checkify`` (pair-cap occupancy, run bounds, pair
    payload — see ``raster_bin.check_binning_invariants``) and raise loudly
    on any violation, then render normally.

    The SURVEY §5 sanitizer plan made concrete: the validation pass re-runs
    the same triangle binning the Pallas kernels consume, as pure XLA, under
    the checkify transform (Pallas kernels themselves are opaque to
    checkify). Use for repro hunts alongside ``utils.config.debug_mode``
    (NaN checks) and the ``*_interpret`` backends."""
    from jax.experimental import checkify

    from .ops.raster import setup_corners
    from .ops.raster_bin import bin_triangles, check_binning_invariants

    textured = scene.atlas is not None
    geom = flatten_scene_corners(scene, textured=textured)
    num_tris = geom.pos_w.shape[0]
    span_wide = num_tris <= (1 << 15)

    @functools.partial(jax.jit, static_argnames=("th",))
    def _validate(scene_, camera_, th):
        def checked(s, c):
            clip = math3d.transform_points_h(geom.pos_w, c.view_proj())
            st = setup_corners(clip, width, height, True, None)
            binned = bin_triangles(
                st,
                width=width,
                height=height,
                tile_h=th,
                tile_w=tile_w,
                max_span=64 if span_wide else 16,
                pairs_cap=raster_pairs_cap,
            )
            check_binning_invariants(binned, num_tris)
            return binned.num_pairs

        err, _ = checkify.checkify(checked)(scene_, camera_)
        return err

    err = _validate(scene, camera, 4 if tile_h is None else tile_h)
    err.throw()  # raises with the failed invariant's message
    return render(
        scene,
        camera,
        width=width,
        height=height,
        tile_h=tile_h,
        tile_w=tile_w,
        raster_pairs_cap=raster_pairs_cap,
        **render_kw,
    )


@functools.partial(jax.jit, static_argnames=("width", "height", "factor", "apply_tonemap"))
def render_ssaa(
    scene: Scene,
    camera: Camera,
    *,
    width: int,
    height: int,
    factor: int = 2,
    apply_tonemap: bool = True,
) -> jnp.ndarray:
    """Anti-aliased render by ordered supersampling: render at factor× in
    each dimension and box-filter down — the TPU analog of the reference's
    4×MSAA toggle (F2, ``d3dApp.cpp:380-383``; factor=2 ≈ 4×MSAA)."""
    img = render(
        scene,
        camera,
        width=width * factor,
        height=height * factor,
        apply_tonemap=apply_tonemap,
    )
    return img.reshape(height, factor, width, factor, 4).mean(axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("width", "height", "thickness_px"))
def render_wireframe(
    scene: Scene,
    camera: Camera,
    *,
    width: int,
    height: int,
    thickness_px: float = 0.7,
    line_color=(0.05, 0.05, 0.05),
) -> jnp.ndarray:
    """Wireframe render — the F1 debug toggle (``d3dApp.cpp:376-379``,
    wireframe PSO at ``PBRApp.cpp:878-881``). Hard-rasterizes, then marks
    pixels within ``thickness_px`` of their triangle's boundary."""
    geom = flatten_scene_corners(scene, textured=False)
    vp = camera.view_proj()
    clip = math3d.transform_points_h(geom.pos_w, vp)
    tri_id = raster.rasterize(clip, None, width=width, height=height)
    sd = raster_soft.signed_distance_px(clip, None, tri_id, width=width, height=height)
    on_wire = (tri_id >= 0) & (sd < thickness_px)
    bg = jnp.broadcast_to(scene.clear_color, (height, width, 3))
    line = jnp.asarray(line_color, jnp.float32)
    rgb = jnp.where(on_wire[..., None], line, bg)
    return jnp.concatenate([rgb, jnp.ones((height, width, 1))], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "solid_layers", "transparent_layers", "apply_tonemap"),
)
def render_layered(
    scene: Scene,
    camera: Camera,
    *,
    width: int,
    height: int,
    solid_layers: int = 2,
    transparent_layers: int = 2,
    apply_tonemap: bool = True,
) -> jnp.ndarray:
    """Render with the full material-layer semantics of the reference's
    seven-pass draw (``PBRApp.cpp:292-320``): opaque + alpha-tested (clip at
    opacity<0.1, ``Default.hlsl:113``) resolved by depth peeling, then
    transparent materials blended SrcAlpha/InvSrcAlpha front-to-back with
    accumulated transmittance (``PBRApp.cpp:830-844``), then sky background.

    Use :func:`render` for opaque-only scenes (fewer passes)."""
    textured = scene.atlas is not None
    geom = flatten_scene_corners(scene, textured=textured)
    vp = camera.view_proj()
    clip = math3d.transform_points_h(geom.pos_w, vp)  # (T, 3, 4)

    face_transparent = scene.materials.transparent[geom.face_material] > 0.5
    solid_mask = ~face_transparent

    # Peels ride the binned Pallas kernel on TPU (z_floor + tri_mask are
    # first-class kernel features), the jnp rasterizer on CPU.
    use_pallas = jax.default_backend() != "cpu"

    def peel(tri_mask, z_floor, cull):
        if use_pallas:
            return raster_pallas.rasterize_binned(
                clip, None, width=width, height=height,
                tri_mask=tri_mask, cull_backface=cull,
                z_floor=z_floor, return_depth=True,
            )
        return raster.rasterize(
            clip, None, width=width, height=height,
            tri_mask=tri_mask, cull_backface=cull,
            z_floor=z_floor, return_depth=True,
        )

    def shade_at(tri_id):
        attrs, _, _ = raster.interpolate_corners(
            geom.attrs, clip, tri_id, width=width, height=height
        )
        if textured:
            tangent_w = attrs[..., 6:9]
            bitangent_w = attrs[..., 9:12]
            uv = attrs[..., 12:14]
        else:
            tangent_w = attrs[..., 3:6]
            bitangent_w = attrs[..., 3:6]
            uv = attrs[..., 0:2] * 0.0
        pix_mat = geom.face_material[jnp.maximum(tri_id, 0)]
        hdr, opacity, keep = shade_pixels(
            pos_w=attrs[..., 0:3],
            normal_w=attrs[..., 3:6],
            tangent_w=tangent_w,
            bitangent_w=bitangent_w,
            uv=uv,
            material_id=pix_mat,
            materials=scene.materials,
            atlas=scene.atlas,
            lights=scene.lights,
            ambient=scene.ambient,
            eye=camera.position,
            ibl=scene.ibl,
            combined=scene.combined_atlas,
        )
        color = tonemap_ops.tonemap(hdr) if apply_tonemap else hdr
        if keep is None:
            keep = jnp.ones(tri_id.shape, bool)
        return color, opacity, pix_mat, keep

    # --- solid resolve (opaque + alpha-tested) via depth peeling ----------
    z_floor = jnp.full((height, width), -jnp.inf, jnp.float32)
    solid_rgb = jnp.zeros((height, width, 3), jnp.float32)
    solid_z = jnp.full((height, width), 1.0, jnp.float32)  # far plane
    resolved = jnp.zeros((height, width), bool)
    for _ in range(solid_layers):
        tid, z = peel(solid_mask, z_floor, True)
        color, opacity, pix_mat, keep = shade_at(tid)
        at_flag = scene.materials.alpha_test[pix_mat] > 0.5
        hit = tid >= 0
        # clip(opacity − 0.1) for alpha-tested materials (Default.hlsl:113)
        # and the parallax uv clip (Default.hlsl:65-68) both peel through.
        accept = hit & (~at_flag | (opacity >= 0.1)) & keep
        take = accept & ~resolved
        solid_rgb = jnp.where(take[..., None], color, solid_rgb)
        solid_z = jnp.where(take, z, solid_z)
        resolved = resolved | take
        z_floor = jnp.where(hit, z, z_floor)

    # --- background -------------------------------------------------------
    sky_src = scene.sky_map if scene.sky_map is not None else scene.env_map
    if sky_src is not None:
        inv_vp = math3d.inverse(vp)
        dirs = sky_ops.camera_ray_directions(inv_vp, width, height)
        sky_rgb = sky_ops.sample_sky(sky_src, dirs)
        bg = tonemap_ops.tonemap(sky_rgb) if apply_tonemap else sky_rgb
    else:
        bg = jnp.broadcast_to(scene.clear_color, (height, width, 3))
    solid_rgb = jnp.where(resolved[..., None], solid_rgb, bg)

    # --- transparent blend (front-to-back with transmittance) -------------
    if transparent_layers > 0:
        trans_acc = jnp.zeros((height, width, 3), jnp.float32)
        transmit = jnp.ones((height, width, 1), jnp.float32)
        z_floor_t = jnp.full((height, width), -jnp.inf, jnp.float32)
        for _ in range(transparent_layers):
            # transparent PSO is CULL_NONE
            tid, z = peel(face_transparent, z_floor_t, False)
            color, opacity, _, keep = shade_at(tid)
            visible = (tid >= 0) & (z < solid_z) & keep  # depth test vs solids
            a = jnp.where(visible, opacity, 0.0)[..., None]
            trans_acc = trans_acc + transmit * a * color
            transmit = transmit * (1.0 - a)
            z_floor_t = jnp.where(tid >= 0, z, z_floor_t)
        rgb = trans_acc + transmit * solid_rgb
    else:
        rgb = solid_rgb

    alpha = jnp.ones((height, width, 1), jnp.float32)
    return jnp.concatenate([rgb, alpha], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "num_layers",
        "sigma",
        "gamma",
        "cull_backface",
        "apply_tonemap",
        "fused_shading",
    ),
)
def render_soft(
    scene: Scene,
    camera: Camera,
    *,
    width: int,
    height: int,
    num_layers: int = 3,
    sigma: float = 1.0,
    gamma: float = 1e-2,
    cull_backface: bool = True,
    apply_tonemap: bool = True,
    fused_shading: bool = True,
) -> jnp.ndarray:
    """Differentiable-visibility render → (H, W, 3) display-encoded RGB.

    Depth-peels ``num_layers`` nearest fragments per pixel, shades each with
    the full PBR shader, and blends with SoftRas sigmoid-coverage ×
    softmax-depth weights (see ops/raster_soft.py). Gradients flow to vertex
    positions / world matrices THROUGH silhouettes and occlusion order —
    the geometry-optimisation path. sigma→0, gamma→0 ≈ ``render``.

    Rides the corner-major fast path end-to-end (gather-free raster setup,
    one row gather per pixel per layer for attributes and one for the
    silhouette distance)."""
    textured = scene.atlas is not None
    geom = flatten_scene_corners(scene, textured=textured)
    vp = camera.view_proj()
    clip = math3d.transform_points_h(geom.pos_w, vp)  # (T, 3, 4)

    ids, zs = raster_soft.peel_layers(
        clip,
        None,  # corner-major
        width=width,
        height=height,
        num_layers=num_layers,
        cull_backface=cull_backface,
        edge_margin_px=3.0 * sigma,  # capture the sigmoid's support
    )

    # Untextured constant-material scenes shade every peel through the SAME
    # fused Pallas kernels as the hard path (shade_fused fwd +
    # shade_backward VJP) instead of K XLA shade passes — the round-5
    # backward story for the differentiable-visibility mode. Geometry
    # gradients are untouched: they flow through interpolate_corners /
    # signed_distance / the soft composite, with shade_fused pulling the
    # attribute cotangents back into that same interpolation.
    shade_fusable = (
        fused_shading
        and not textured
        and scene.ibl is None
        and not scene.materials.any_alpha_test
        and jax.default_backend() != "cpu"
    )
    if shade_fusable:
        _mats = scene.materials
        _mat_props = jnp.concatenate(
            [
                _mats.diffuse,
                _mats.metallic[:, None],
                _mats.fresnel_r0,
                _mats.roughness[:, None],
                _mats.opacity[:, None],
            ],
            axis=-1,
        )

    def shade_layer(tri_id):
        # clamp=True: dilated (near-miss) pixels sit slightly outside their
        # triangle; project barycentrics back to the face so attributes
        # don't extrapolate off the surface.
        attrs, depth, mask = raster.interpolate_corners(
            geom.attrs, clip, tri_id, width=width, height=height, clamp=True
        )
        pix_mat = geom.face_material[jnp.maximum(tri_id, 0)]
        if shade_fusable:
            L = scene.lights
            rgba = raster_pallas.shade_fused(
                attrs[..., :6],
                pix_mat,
                mask,
                _mat_props,
                L.strength,
                L.direction,
                L.position,
                L.spot_power,
                scene.ambient,
                camera.position,
                num_dir=L.num_dir,
                num_point=L.num_point,
                num_spot=L.num_spot,
                apply_tonemap=apply_tonemap,
            )
            color = rgba[..., :3]
            keep = None
        else:
            pos_w = attrs[..., 0:3]
            normal_w = attrs[..., 3:6]
            if textured:
                tangent_w = attrs[..., 6:9]
                bitangent_w = attrs[..., 9:12]
                uv = attrs[..., 12:14]
            else:
                tangent_w = normal_w
                bitangent_w = normal_w
                uv = attrs[..., 0:2] * 0.0
            hdr, _op, keep = shade_pixels(
                pos_w=pos_w,
                normal_w=normal_w,
                tangent_w=tangent_w,
                bitangent_w=bitangent_w,
                uv=uv,
                material_id=pix_mat,
                materials=scene.materials,
                atlas=scene.atlas,
                lights=scene.lights,
                ambient=scene.ambient,
                eye=camera.position,
                ibl=scene.ibl,
                combined=scene.combined_atlas,
            )
            color = tonemap_ops.tonemap(hdr) if apply_tonemap else hdr
        sd = raster_soft.signed_distance_px(
            clip, None, tri_id, width=width, height=height
        )
        if keep is not None:
            mask = mask & keep  # parallax uv clip discards the fragment
        # depth recomputed differentiably (zs from the raster pass is used
        # only for peeling structure)
        return color, depth, sd, mask

    colors, depths, sdists, valids = [], [], [], []
    for k in range(num_layers):
        c, d, s, m = shade_layer(ids[k])
        colors.append(c)
        depths.append(jnp.where(m, d, jnp.inf))
        sdists.append(s)
        valids.append(m)

    sky_src = scene.sky_map if scene.sky_map is not None else scene.env_map
    if sky_src is not None:
        inv_vp = math3d.inverse(vp)
        dirs = sky_ops.camera_ray_directions(inv_vp, width, height)
        sky_rgb = sky_ops.sample_sky(sky_src, dirs)
        bg = tonemap_ops.tonemap(sky_rgb) if apply_tonemap else sky_rgb
    else:
        bg = jnp.broadcast_to(scene.clear_color, (height, width, 3))

    return raster_soft.soft_composite(
        jnp.stack(colors),
        jnp.stack(depths),
        jnp.stack(sdists),
        jnp.stack(valids),
        bg,
        sigma=sigma,
        gamma=gamma,
    )
