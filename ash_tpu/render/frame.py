"""The frame program: one jitted function = one `render_frame`.

TPU re-design of the reference's command-buffer recording
(renderer.rs:1553-2041). Where Vulkan records shadow pass -> main pass ->
present with barriers and fences, here the whole frame is a single pure
function traced once per (resolution, scene-bucket, feature-set) and cached —
the jit cache is our pipeline cache (reference pipeline_cache.rs), and a
resize is just a different cache key (SURVEY §5.3's deferred-rebuild state
machine collapses into re-specialization).

Pass order inside the program (all fused/scheduled by XLA):
  1. vertex stage                (ops/geometry.transform_vertices — MXU)
  2. shadow raster, depth-only   (shared rasterizer, cull FRONT like the
                                  reference shadow pipeline, renderer.rs:660;
                                  1-4 CSM cascades; alpha-test discard)
  3. GPU-driven culling          (frustum + prev-frame Hi-Z, ops/occlusion)
  4. main raster                 (cull BACK, renderer.rs:599) -> visibility
                                  buffer (2 layers when alpha-testing)
  5. Forward+ light culling      (ops/light_cull over the depth buffer)
  6. G-buffer interpolation + PBR shade (ops/shade; motion vectors for TAA)
  7. post chain                  (TAA resolve -> bloom -> tonemap -> FXAA)
  8. SSAA resolve + pack to RGBA8
"""

from __future__ import annotations

import dataclasses
import functools
import os
import threading
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import binning, geometry, raster
from ..ops.bloom import bloom_pyramid
from ..ops.raster_pallas import rasterize_pallas
from ..ops.shade import ShadeUniforms, interpolate_gbuffer, shade_flat, shade_pbr
from ..ops.taa import TaaParams, taa_resolve
from ..ops.texture_sample import TexturePool
from ..ops.tonemap import tonemap_compose
from .scene import SceneBuffers


class FrameUniforms(NamedTuple):
    """Dynamic per-frame inputs (the reference's frame UBO, uniform.rs:11-22)."""

    view_proj: jnp.ndarray  # (4, 4)
    camera_pos: jnp.ndarray  # (3,)
    light_direction: jnp.ndarray  # (3,)
    light_color: jnp.ndarray  # (3,)
    ambient_color: jnp.ndarray  # (3,)
    light_space_matrix: jnp.ndarray  # (4, 4)
    models: jnp.ndarray  # (D, 4, 4) per-draw model matrices
    # view/projection individually (Forward+ culling needs them; the
    # reference's CullingCameraData, features/light_culling.rs:81-99).
    view: Optional[jnp.ndarray] = None  # (4, 4)
    projection: Optional[jnp.ndarray] = None  # (4, 4)
    # CSM (when FrameConfig.shadow_cascades > 1): per-cascade light matrices
    # and split far-distances (render/csm.py GpuCascadeData).
    cascade_matrices: Optional[jnp.ndarray] = None  # (C, 4, 4)
    cascade_splits: Optional[jnp.ndarray] = None  # (4,)
    # TAA motion vectors: LAST frame's (unjittered) camera + model matrices.
    prev_view_proj: Optional[jnp.ndarray] = None  # (4, 4)
    prev_models: Optional[jnp.ndarray] = None  # (D, 4, 4)


@dataclasses.dataclass(frozen=True)
class FrameConfig:
    """Static frame-function specialization key."""

    width: int
    height: int
    tile_h: int = 64
    tile_w: int = 128
    max_tris_per_tile: int = 256
    shadow_enabled: bool = True
    shadow_resolution: int = 2048
    # Shadow raster tile: shadow_tile is the WIDTH (lane dimension);
    # shadow_tile_h the row count (None = min(shadow_tile, 32)). Rectangular
    # rows x 128-lane tiles keep the per-candidate raster cost low — square
    # 128x128 tiles re-test 16k pixels per candidate triangle, which made
    # the shadow pass ~1000x the main pass on dense meshes.
    shadow_tile: int = 256
    shadow_tile_h: Optional[int] = None
    shadow_max_tris_per_tile: int = 256
    # Cascaded shadow maps: 1 = the reference's wired single-map path;
    # 2-4 renders one depth map per cascade and shading selects by view
    # distance (the CSM math of render/csm.py, which the reference shipped
    # without a render path).
    shadow_cascades: int = 1
    csm_blend_size: float = 0.0  # >0 enables cascade blending (CsmConfig)
    textured: bool = False
    # Anisotropic filtering taps (1 = trilinear only; the reference sampler
    # requests 16x hardware anisotropy, texture.rs:313-327 — here each tap
    # is a real trilinear fetch, so keep this modest).
    max_anisotropy: int = 1
    # BRDF/lighting arithmetic dtype: "f32" (default) or "bf16" (runs the
    # shade pass's material/TBN/BRDF/light-loop math in bfloat16; positions,
    # shadow lookups and the final composite stay f32 — ops/shade.py).
    shade_dtype: str = "f32"
    # Alpha-test (cutout) rendering: rasterize two depth layers and let
    # cut-out pixels fall through (ops/shade.resolve_alpha_test). The shadow
    # pass uses the reference's fixed 0.1 threshold (shadow.frag:17-23).
    alpha_test: bool = False
    # Alpha BLENDING (semi-transparent materials, base_color_factor.a < 1):
    # shade ALL depth-peeled layers and composite with the reference's
    # SRC_ALPHA blend (pipeline.rs:167-174). `transparency_layers` surfaces
    # deep (order-independent: the peel sorts per pixel, unlike the
    # reference's submission-order blending): K-1 transparent surfaces over
    # anything render exactly; deeper stacks approximate. Subsumes
    # alpha_test when both apply.
    alpha_blend: bool = False
    transparency_layers: int = 2  # K in [2, 8]; cost ~K shades + K peel bufs
    # Iterated depth peeling: each extra pass re-runs the raster with a
    # per-pixel depth floor at the previous pass's deepest kept layer,
    # capturing the NEXT K surfaces — exact transparency to
    # passes*K - 1 surfaces (coplanar surfaces at exactly the floor depth
    # drop, the classic peel tie limit). Cost: one extra raster + K more
    # shades per pass; alpha_blend only.
    transparency_passes: int = 1
    shading: str = "pbr"  # "pbr" | "flat"
    reinhard: bool = True  # in-shader tonemap (frag.frag:227); off for HDR post
    clear_color: tuple = (0.0, 0.0, 0.0)
    # The reference swapchain is BGRA8_SRGB (swapchain.rs:81-88): shaders
    # write linear, the display encodes. Our presented u8 applies the same
    # encode so readback matches what a user of the reference sees.
    srgb_output: bool = True
    # Rasterizer backend: the Pallas kernel (ops/raster_pallas.py) on TPU,
    # the jnp scan oracle elsewhere.
    use_pallas: bool = False
    # G-buffer attribute fetch: True bakes all per-triangle quantities into
    # one packed (T, R) record and does ONE wide per-pixel gather instead
    # of ~8 scattered ones (bit-identical results; trades a ~270 B/tri
    # transient — see interpolate_gbuffer). MEASURED on chip 2026-08-18
    # (interleaved in-process A/B, pixel-identical outputs): 1080p/1000-obj
    # 0.30 vs 0.30 ms, 1M-tri 0.41 vs 0.44 ms — a wash; XLA's in-context
    # gather lowering is already efficient (a standalone microbenchmark of
    # 8 scattered vs 1 packed gather shows 24x, but the frame never hits
    # that regime). Default stays False; the packed path remains as a
    # tested alternative fetch schedule.
    gbuffer_packed: bool = False
    # Binning strategy: None = auto (two-level coarse->fine when the scene's
    # padded triangle count exceeds 32768 — the dense (tiles x T) matrix
    # cliffs there); True/False force it. See ops/binning.py.
    two_level_binning: Optional[bool] = None
    # Per-coarse-tile candidate cap for the two-level binner (drops beyond
    # it are reported via overflow like fine-tile drops).
    binning_coarse_cap: int = 16384
    # What an overflowing tile drops: "draw_order" keeps the lowest draw
    # ids (GPU submission semantics); "nearest" keeps the nearest
    # triangles, so drops are (almost always occluded) back surfaces —
    # the right choice for extreme-density scenes (e.g. >8 tris/pixel).
    binning_policy: str = "draw_order"
    # HDR post chain (the reference's designed-but-unwired full frame:
    # SURVEY §3.2 "capability present, wiring absent" — wired here).
    # When enabled the main pass outputs linear HDR (reinhard is skipped),
    # TAA resolves pre-tonemap, bloom + tonemap + gamma produce the LDR
    # image; gamma encoding replaces the sRGB swapchain encode.
    post_enabled: bool = False
    bloom_enabled: bool = True
    bloom_mips: int = 5
    tonemap_operator: str = "aces"
    taa_enabled: bool = False
    fxaa_enabled: bool = False  # post-tonemap LDR pass (ops/fxaa.py)
    # TAA upsampling (TAAU perf preset): raster + shade at render_scale x
    # the presentation resolution (e.g. 0.75 -> 56% of the pixels), then
    # bilinear-upsample and let the jittered TAA history accumulate detail
    # back to full res. Requires post_enabled + taa_enabled; exclusive with
    # SSAA. Works under shard_map too: bands split the internal rows and
    # the upsample runs on the assembled sharded image (band_render_rows).
    render_scale: float = 1.0
    # Supersampling factors (MSAA equivalent: ordered-grid SSAA + box
    # resolve; reference msaa_targets.rs). Per-axis so sample counts match
    # the advertised MSAA presets exactly: x2 = (2,1) -> 2 samples,
    # x4 = (2,2) -> 4, x8 = (4,2) -> 8. (1,1) = off.
    ssaa_x: int = 1
    ssaa_y: int = 1
    # MSAA resolve strategy. "ssaa" shades every sample — an honest Nx
    # shading cost. "edge" reproduces the hardware MSAA cost profile
    # (msaa_targets.rs:24-120: multisample cost only at geometry edges):
    # pixels whose samples all see one triangle shade ONCE at the pixel
    # center, edge pixels stream-compact into a fixed worklist that shades
    # at full sample rate (ops/msaa_edge.py). Shading cost ~= 1x + N *
    # edge_fraction. Requires pbr shading; exclusive with alpha blending
    # (K-layer OIT already shades per layer).
    msaa_resolve: str = "ssaa"
    # Edge worklist capacity as a fraction of the band's presentation
    # pixels; overflow degrades those pixels to center shading and reports
    # via FrameOutputs.msaa_edge_overflow (never a silent cap).
    msaa_edge_capacity: float = 0.125
    # GPU-driven culling: per-draw frustum culling every frame; Hi-Z
    # occlusion against the PREVIOUS frame's depth pyramid (standard
    # two-phase temporal scheme — the reference's occlusion_cull.comp reads
    # a current-frame Hi-Z it never had wiring to produce).
    frustum_culling: bool = False
    occlusion_culling: bool = False
    # Forward+ point lights (tiled light culling + per-tile shading loop).
    lights_enabled: bool = False
    light_tile_size: int = 16  # reference TILE_SIZE, light_culling.rs:17-23
    max_lights_per_tile: int = 256  # reference MAX_LIGHTS_PER_TILE
    # Cap on the per-pixel shading loop (slots beyond this are dropped; the
    # culled list is ascending light id). The loop's runtime trip count is
    # the frame's actual worst-case tile count, so the full 256-slot
    # contract costs nothing on sparse scenes.
    shaded_lights_per_tile: int = 256
    # Image-based lighting: when the renderer holds an environment bundle
    # (ops/ibl.py), the split-sum IBL replaces the flat ambient term.
    ibl_enabled: bool = False
    # LOD: select each draw's packed detail level by screen coverage in-jit
    # (needs Mesh.add_lod chains; scene.tri_lod / lod_thresholds).
    lod_enabled: bool = False
    lod_cull_threshold: float = 0.001  # reference lod_system.rs:56
    # Diagnostics taint (overlay mode): when binning dropped triangles this
    # frame, paint an 8x8 corner block IN-JIT — magenta for main-pass drops,
    # cyan for shadow drops. Device-side visibility with ZERO readbacks (a
    # host readback of the overflow scalar would drop tunneled TPU backends
    # out of pipelined dispatch; the reference surfaces drops via validation
    # layers).
    overflow_taint: bool = False


class PostParams(NamedTuple):
    """Runtime post-processing knobs (no retrace on change; reference
    setters renderer.rs:2072-2131)."""

    exposure: jnp.ndarray  # () f32
    gamma: jnp.ndarray  # () f32
    bloom_intensity: jnp.ndarray  # () f32
    bloom_threshold: jnp.ndarray  # () f32
    bloom_soft_knee: jnp.ndarray  # () f32

    @staticmethod
    def default() -> "PostParams":
        import numpy as np

        return PostParams(
            exposure=np.float32(1.0),
            gamma=np.float32(2.2),
            bloom_intensity=np.float32(0.5),
            bloom_threshold=np.float32(0.8),
            bloom_soft_knee=np.float32(0.5),
        )


class FrameOutputs(NamedTuple):
    image: jnp.ndarray  # (H, W, 4) uint8
    color: jnp.ndarray  # (H, W, 3) float32 (post-tonemap or HDR)
    depth: jnp.ndarray  # (H, W) float32
    shadow_map: Optional[jnp.ndarray]  # (S, S) or None
    covered_pixels: jnp.ndarray  # () int32
    binning_overflow: jnp.ndarray  # () int32
    history: Optional[jnp.ndarray]  # (H, W, 3) TAA history out (if enabled)
    visible_draws: Optional[jnp.ndarray]  # () int32 after GPU-driven culling
    # Worst shadow-pass bin overflow (max across cascades); dropped shadow
    # triangles manifest as light leaks, so they must be as loud as main-pass
    # drops. None when shadows are disabled.
    shadow_overflow: Optional[jnp.ndarray] = None  # () int32
    # Edge pixels past msaa_edge_capacity (they keep center shading — a
    # quality, not correctness, loss). None unless msaa_resolve="edge".
    msaa_edge_overflow: Optional[jnp.ndarray] = None  # () int32


def _srgb_encode(c: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB (the swapchain's UNORM_SRGB store)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, c * 12.92, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055
    )


def internal_render_size(width: int, height: int, scale: float):
    """TAAU internal raster resolution (even-rounded; >= 16 px)."""
    if scale == 1.0:
        return width, height
    return (
        max(2 * int(round(width * scale / 2)), 16),
        max(2 * int(round(height * scale / 2)), 16),
    )


def _raster(cfg: "FrameConfig"):
    return rasterize_pallas if cfg.use_pallas else raster.rasterize


def _binner(cfg: "FrameConfig", num_tris: int):
    """Dense or two-level binning (static choice per scene bucket)."""
    use_two = (
        cfg.two_level_binning
        if cfg.two_level_binning is not None
        else num_tris > 32768
    )
    if not use_two:
        return binning.bin_triangles
    return functools.partial(
        binning.bin_triangles_two_level, coarse_cap=cfg.binning_coarse_cap
    )


def _keep_score(cfg: "FrameConfig", setup):
    """Overflow priority for the binner (None = draw order). "nearest"
    keeps the closest triangles when a tile exceeds its cap."""
    if cfg.binning_policy != "nearest":
        return None
    return -jnp.min(setup.z_clip, axis=-1)


class BandSpec(NamedTuple):
    """Screen-space sharding context: run the band pipeline inside a
    shard_map over `n` devices along mesh axis `axis` (parallel/sharded.py).
    None = single device, full frame."""

    axis: str
    n: int


def shadow_world4(scene: SceneBuffers, models: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous world positions for the shadow stage.

    Bit-identical to the world transform inside
    geometry.transform_vertices (same gathers, same einsum, same
    precision flags) so a shadow map rendered by the standalone shadow
    program matches one rendered inside the fused frame exactly —
    required for the renderer's shadow cache to be invisible."""
    m = models[scene.vert_draw]
    pos = scene.position[scene.vert_uid]
    world = (
        jnp.einsum("vij,vj->vi", m[:, :3, :3], pos,
                   precision="highest", preferred_element_type=jnp.float32)
        + m[:, :3, 3]
    )
    return jnp.concatenate([world, jnp.ones_like(world[:, :1])], -1)


def render_shadow(
    config: FrameConfig,
    scene: SceneBuffers,
    world4: jnp.ndarray,  # (Ve, 4) homogeneous world positions
    tri_valid: jnp.ndarray,  # (Te,) bool (padding + LOD mask)
    light_space_matrix: jnp.ndarray,  # (4, 4)
    cascade_matrices: Optional[jnp.ndarray] = None,  # (C, 4, 4)
    pool: Optional[TexturePool] = None,
    band: Optional["BandSpec"] = None,
):
    """The shadow pass: depth-only raster of the scene from the light
    (reference shadow pipeline, renderer.rs:660 + shadow.frag), single map
    or CSM cascades. Factored out of render_band so the renderer can run it
    as its OWN program and cache the resulting map across frames when
    (models, light matrix, scene) are unchanged — the TPU analog of simply
    not re-recording a shadow pass for a static scene.

    Returns (shadow_map, shadow_overflow)."""
    cfg = config
    s = cfg.shadow_resolution
    st_h = (
        cfg.shadow_tile_h
        if cfg.shadow_tile_h is not None
        else min(cfg.shadow_tile, 32)
    )
    if band is not None:
        if s % (band.n * st_h) != 0:
            raise ValueError(
                f"shadow_resolution {s} must divide into {band.n} bands"
                f" of {st_h}-row tiles"
            )
        s_band = s // band.n
        sy0 = jax.lax.axis_index(band.axis) * s_band
    else:
        s_band, sy0 = s, 0

    alpha_shadow = cfg.alpha_test and cfg.textured and pool is not None

    def depth_only(light_matrix):
        clip_l = jnp.einsum(
            "ij,vj->vi", light_matrix, world4,
            preferred_element_type=jnp.float32,
        )
        setup_s = geometry.triangle_setup(
            clip_l, scene.tri_v, tri_valid, s, s, cull_mode="front"
        )
        bins_s = _binner(cfg, scene.tri_v.shape[0])(
            setup_s.bbox, setup_s.valid, s_band, s,
            st_h, cfg.shadow_tile,
            cfg.shadow_max_tris_per_tile, y0=sy0,
            keep_score=_keep_score(cfg, setup_s),
        )
        vis_s = _raster(cfg)(
            setup_s, bins_s, s_band, s, st_h, cfg.shadow_tile,
            y0=sy0, layers=2 if alpha_shadow else 1,
        )
        if alpha_shadow:
            # Foliage alpha discard in the shadow pass
            # (shadow.frag:17-23: alpha < 0.1 casts no shadow).
            from ..ops.shade import resolve_alpha_test

            vis_s = resolve_alpha_test(
                vis_s, setup_s, scene.tri_v, scene.tri_draw,
                scene.materials, scene.uv, pool, cutoff_override=0.1,
                y0=sy0, vert_uid=scene.vert_uid,
            )
        return vis_s.depth, bins_s.overflow

    def gather_map(d, axis=0):
        if band is not None:
            # Every device needs the whole map for PCF -> one tiled
            # all_gather riding ICI per frame.
            d = jax.lax.all_gather(d, band.axis, axis=axis, tiled=True)
        return d

    if cfg.shadow_cascades > 1:
        # One vmapped trace over the cascade axis instead of a Python
        # unroll: C x smaller program (compile time) and XLA/Mosaic see
        # one batched raster (the pallas grid gains a cascade dim).
        ds, ofs = jax.vmap(depth_only)(
            cascade_matrices[: cfg.shadow_cascades]
        )
        return gather_map(ds, axis=1), jnp.max(ofs)  # (C, S, S)
    d, overflow = depth_only(light_space_matrix)
    return gather_map(d), overflow


def shadow_program(
    config: FrameConfig,
    scene: SceneBuffers,
    models: jnp.ndarray,  # (D, 4, 4)
    light_space_matrix: jnp.ndarray,  # (4, 4)
    cascade_matrices: Optional[jnp.ndarray] = None,
    pool: Optional[TexturePool] = None,
):
    """Standalone shadow pass (no LOD — callers with LOD chains render
    shadows inside the fused frame where the selection mask lives).
    The renderer caches this program's outputs keyed on (scene epoch,
    models epoch, light matrix bytes); a static scene then pays zero
    shadow cost per frame."""
    with jax.named_scope("pass_shadow"):
        world4 = shadow_world4(scene, models)
        return render_shadow(
            config, scene, world4, scene.tri_valid, light_space_matrix,
            cascade_matrices, pool,
        )


def _jit_opts(effort):
    """compiler_options for a cold-tier compile.

    `exec_time_optimization_effort` trades XLA optimization time for
    runtime (measured on the rich 1080p programs at -1.0: band compile
    12.8 -> 10.1 s, finalize 10.7 -> 8.4 s, frame runtime +~10%). The
    tiered pipeline uses it for the band+finalize programs that serve
    COLD frames only; full-effort programs compile in the background and
    take over via the measured race. The standalone shadow program stays
    at full effort: its 6.5 s compile runs in a parallel thread UNDER
    the band's 10.1 s cold wall, so reducing it buys no latency and
    would cost steady-state shadow speed."""
    if effort is None:
        return {}
    return {"compiler_options": {"exec_time_optimization_effort": effort}}


# Live frame programs, globally bounded. Each compiled frame program owns
# real process resources beyond host RAM: on the CPU backend every XLA
# executable holds its LLVM JIT code as separate anonymous mappings
# (~300 per post-enabled 1080p-class program), and Linux caps a process
# at vm.max_map_count (default 65530) mappings. With the previous
# unbounded per-function lru_caches a long-lived process that touches
# many FrameConfigs — a test suite, a multi-tenant render service, a
# resolution sweep — accumulated executables until mmap failed and XLA
# SEGFAULTED or deadlocked mid-compile (observed deterministically at
# ~65k mappings, test #310/343 of the suite). The registry keeps the
# most-recently-used programs alive and drops the rest; a dropped
# program that is re-requested simply retraces and recompiles (slow
# frame, correct image). A production loop uses ~10-15 programs per
# config, so the default cap of 64 holds ~4 concurrent configs.
_MAX_LIVE_PROGRAMS = max(int(os.environ.get(
    "ASH_MAX_LIVE_PROGRAMS", "64")), 8)
_live_programs: dict = {}  # insertion-ordered: (qualname, cfg, effort) -> jit
_live_programs_lock = threading.Lock()


def clear_program_caches() -> None:
    """Drop every cached frame program (and their executables/mappings).

    Renderers holding a jit reference keep it alive; the next
    compiled_*() fetch rebuilds. Used by tests between modules and
    available to apps that cycle through many configs."""
    with _live_programs_lock:
        _live_programs.clear()
    _merge_jit.cache_clear()
    _shadow_merge_jit.cache_clear()


def _effort_cached(factory):
    """Bounded cache over (config, effort) with the one-arg call
    normalized: `f(config)` and `f(config, None)` MUST return the same
    jit object — otherwise a default-arg call and an explicit-None call
    would create two separate jits of the same program (and the second
    one would re-trace and recompile synchronously in the frame loop).
    Entries live in the shared _live_programs LRU (see above)."""
    name = factory.__qualname__

    @functools.wraps(factory)
    def wrapper(config, effort=None):
        key = (name, config, effort)
        with _live_programs_lock:
            if key in _live_programs:
                val = _live_programs.pop(key)
                _live_programs[key] = val  # re-insert = most recent
                return val
        val = factory(config, effort)  # trace-free (jit() is lazy)
        with _live_programs_lock:
            if key in _live_programs:  # racing fetch built it first
                val = _live_programs.pop(key)
            _live_programs[key] = val
            while len(_live_programs) > _MAX_LIVE_PROGRAMS:
                # dict preserves insertion order; first key = LRU
                _live_programs.pop(next(iter(_live_programs)))
        return val

    def cache_clear():
        with _live_programs_lock:
            for k in [k for k in _live_programs if k[0] == name]:
                _live_programs.pop(k)

    wrapper.cache_clear = cache_clear
    return wrapper


@_effort_cached
def compiled_shadow(config: FrameConfig, effort: Optional[float] = None):
    """Jitted standalone shadow program for a config."""
    return jax.jit(functools.partial(shadow_program, config),
                   **_jit_opts(effort))


class BandOutputs(NamedTuple):
    """Everything the raster+shade stage produces for (a band of) the frame.

    In band mode, color/depth/velocity cover this device's rows while
    shadow_map and the scalars are already globalized (all_gather / psum /
    pmax), so `finalize_frame` sees the same thing either way."""

    color: jnp.ndarray  # (Hb, W, 3) resolved linear HDR (or Reinhard LDR)
    depth: jnp.ndarray  # (Hb, W)
    velocity: Optional[jnp.ndarray]  # (Hb, W, 2) or None
    shadow_map: Optional[jnp.ndarray]  # (S, S) / (C, S, S) or None
    covered: jnp.ndarray  # () int32
    overflow: jnp.ndarray  # () int32
    shadow_overflow: Optional[jnp.ndarray]  # () int32 or None
    visible_draws: Optional[jnp.ndarray]  # () int32 or None
    # Edge-adaptive MSAA worklist overflow (msaa_resolve="edge" only).
    msaa_edge_overflow: Optional[jnp.ndarray] = None  # () int32 or None


def _band_unit(cfg: "FrameConfig") -> int:
    """Smallest presentation-row granularity a band may start at: the band's
    RENDER rows (u * ssaa_y) must align to raster tiles and (when Forward+
    is on) to light-culling tiles, so per-band tile grids are disjoint."""
    import math

    sy = max(int(cfg.ssaa_y), 1)
    need = cfg.tile_h
    if cfg.lights_enabled:
        need = need * cfg.light_tile_size // math.gcd(
            need, cfg.light_tile_size
        )
    return need // math.gcd(need, sy)


def band_rows(cfg: "FrameConfig", n: int) -> int:
    """Presentation rows per device band (height padded up to divide)."""
    u = _band_unit(cfg)
    per = -(-cfg.height // (n * u)) * u
    return per


def band_render_rows(cfg: "FrameConfig", n: int) -> int:
    """Internal-resolution rows per device band when render_scale != 1
    (TAAU): devices split the scaled raster rows, padded up to divide and
    to align with the raster/light tile grid (ssaa is exclusive here, so
    the band unit IS the render unit)."""
    _, rh = internal_render_size(cfg.width, cfg.height, cfg.render_scale)
    u = _band_unit(cfg)
    return -(-rh // (n * u)) * u


def _concat_vis_layers(a, b):
    """Append b's peel layers after a's (b must be strictly deeper —
    produced with depth_floor at a's deepest layer)."""
    za = [a.layer(i)[0] for i in range(a.num_layers)]
    ta = [a.layer(i)[1] for i in range(a.num_layers)]
    zb = [b.layer(i)[0] for i in range(b.num_layers)]
    tb = [b.layer(i)[1] for i in range(b.num_layers)]
    zs, ts = za + zb, ta + tb
    from ..ops.raster import VisibilityBuffer

    return VisibilityBuffer(
        depth=zs[0], tri_id=ts[0], depth2=zs[1], tri_id2=ts[1],
        depth_rest=jnp.stack(zs[2:]) if len(zs) > 2 else None,
        tri_id_rest=jnp.stack(ts[2:]) if len(ts) > 2 else None,
    )


def render_band(
    config: FrameConfig,
    scene: SceneBuffers,
    uni: FrameUniforms,
    pool: Optional[TexturePool] = None,
    lights: Optional[jnp.ndarray] = None,  # (L, 16) packed GpuLight rows
    prev_depth: Optional[jnp.ndarray] = None,  # (H, W) last frame, resolved
    ibl=None,  # ops/ibl.EnvironmentIBL
    band: Optional[BandSpec] = None,
    ext_shadow: Optional[tuple] = None,  # (shadow_map, shadow_overflow)
) -> BandOutputs:
    """Vertex transform -> shadows -> culling -> raster -> shade -> SSAA
    resolve, for the full frame (band=None) or this device's band of rows.

    This is THE frame pipeline — the multi-chip path (parallel/sharded.py)
    shard_maps this very function, so every feature (Pallas raster,
    textures, Forward+, CSM, alpha, culling) works identically on 1 or N
    chips. Band mode differences are confined to: tile-grid row offsets
    (y0), the shadow-map all_gather, and psum/pmax of the scalars.
    """
    cfg = config
    if not (2 <= cfg.transparency_layers <= 8):
        raise ValueError(
            f"transparency_layers {cfg.transparency_layers} outside [2, 8] "
            "(each layer is a VMEM-resident depth+id buffer pair)"
        )
    if cfg.binning_policy not in ("draw_order", "nearest"):
        raise ValueError(f"unknown binning_policy {cfg.binning_policy!r}")
    sx, sy = max(int(cfg.ssaa_x), 1), max(int(cfg.ssaa_y), 1)
    if cfg.msaa_resolve not in ("ssaa", "edge"):
        raise ValueError(f"unknown msaa_resolve {cfg.msaa_resolve!r}")
    edge_msaa = cfg.msaa_resolve == "edge" and (sx > 1 or sy > 1)
    if edge_msaa:
        if cfg.shading != "pbr":
            raise ValueError("msaa_resolve='edge' requires pbr shading")
        if cfg.alpha_blend:
            raise ValueError(
                "msaa_resolve='edge' is exclusive with alpha blending "
                "(K-layer OIT already shades every peeled layer; use ssaa)"
            )
    scale = float(cfg.render_scale)
    if scale != 1.0:
        if sx != 1 or sy != 1:
            raise ValueError("render_scale is exclusive with SSAA")
        if not (0.25 <= scale <= 1.0):
            raise ValueError(f"render_scale {scale} outside [0.25, 1]")
        # Internal (TAAU) resolution, even-rounded for clean tiling.
        rw, rh = internal_render_size(cfg.width, cfg.height, scale)
    else:
        rw, rh = cfg.width * sx, cfg.height * sy

    if band is None:
        y0r = 0  # first render row of the band
        bhr = rh  # render rows in the band
        bhp = cfg.height if scale == 1.0 else rh  # presentation rows
    else:
        if scale == 1.0:
            bhp = band_rows(cfg, band.n)
            bhr = bhp * sy
        else:
            # TAAU band mode: devices split the INTERNAL rows (padded to
            # divide); the bilinear upsample to presentation resolution
            # runs in finalize_frame OUTSIDE the shard_map, where XLA's
            # SPMD partitioner inserts the resize halo exchanges.
            bhr = bhp = band_render_rows(cfg, band.n)
        idx = jax.lax.axis_index(band.axis)
        y0r = idx * bhr

    # jax.named_scope("pass_*") below: the scope path lands in every HLO
    # op's op_name metadata and survives XLA fusion into the profiler's
    # per-op device events — tools/pass_profile.py buckets real on-chip
    # time by these names (VERDICT r2 item 4; the TPU form of the
    # reference's in-frame timestamp scopes, gpu_profiler.rs:229-275).
    with jax.named_scope("pass_vertex"):
        tv = geometry.transform_vertices(
            uni.models,
            uni.view_proj,
            scene.position,
            scene.normal,
            scene.tangent,
            scene.vert_draw,
            vert_uid=scene.vert_uid,
        )

    # LOD selection (reference lod_system.rs:300-346, wired in-jit): the
    # per-draw screen coverage picks a level; triangles of other levels are
    # masked out of EVERY pass below — the TPU form of rebuilding the draw
    # list per frame (static shapes, dynamic selection).
    lod_tri_mask = None
    if cfg.lod_enabled:
        with jax.named_scope("pass_lod"):
            c4 = jnp.concatenate(
                [scene.draw_center, jnp.ones_like(scene.draw_center[:, :1])], -1
            )
            cw = jnp.einsum("dij,dj->di", uni.models, c4)  # (D, 4) world center
            clip_c = jnp.einsum("ij,dj->di", uni.view_proj, cw)
            wc = clip_c[:, 3]
            # World radius: local bound radius x the model's largest axis scale.
            axis_scale = jnp.max(
                jnp.linalg.norm(uni.models[:, :3, :3], axis=2), axis=-1
            )
            radius = jnp.linalg.norm(scene.draw_extents, axis=-1) * axis_scale
            px_r = radius / jnp.maximum(wc, 1e-8) * (
                0.5 * max(cfg.width, cfg.height)
            )
            coverage = jnp.minimum(
                jnp.pi * px_r * px_r / (cfg.width * cfg.height), 1.0
            )
            coverage = jnp.where(wc <= 0.0, 0.0, coverage)
            hit = coverage[:, None] >= scene.lod_thresholds  # (D, L)
            sel = jnp.argmax(hit, axis=1).astype(jnp.int32)  # first level that
            draw_live = coverage >= cfg.lod_cull_threshold  # holds; + size cull
            lod_tri_mask = (
                (scene.tri_lod == sel[scene.tri_draw])
                & draw_live[scene.tri_draw]
            )

    base_tri_valid = scene.tri_valid
    if lod_tri_mask is not None:
        base_tri_valid = base_tri_valid & lod_tri_mask

    shadow_map = None
    shadow_overflow = None
    if cfg.shadow_enabled:
        if ext_shadow is not None:
            # Shadow map rendered by the standalone shadow program (and
            # possibly cached from an earlier frame — see
            # Renderer._shadow_key). Zero shadow work in this program.
            shadow_map, shadow_overflow = ext_shadow
        else:
            with jax.named_scope("pass_shadow"):
                world4 = jnp.concatenate(
                    [tv.world, jnp.ones_like(tv.world[:, :1])], -1
                )
                shadow_map, shadow_overflow = render_shadow(
                    cfg, scene, world4, base_tri_valid,
                    uni.light_space_matrix, uni.cascade_matrices, pool,
                    band=band,
                )

    # GPU-driven per-draw culling: mask whole draws' triangles out before
    # binning (the TPU form of the indirect-draw compaction in
    # occlusion_cull.comp:224-232 — instead of rewriting draw commands, the
    # per-triangle validity mask shrinks the binned workload). Replicated
    # work in band mode (cheap, and every device needs the same mask).
    tri_valid = base_tri_valid
    visible_draws = None
    if cfg.frustum_culling or cfg.occlusion_culling:
        from ..ops import occlusion as occl
        from ..ops.hiz import build_hiz

        with jax.named_scope("pass_cull"):
            pyr = None
            if cfg.occlusion_culling and prev_depth is not None:
                pyr = build_hiz(prev_depth)
            # Note: prev_depth (and its Hi-Z pyramid) is the RESOLVED previous
            # frame, so screen-space tests run at presentation resolution even
            # when this frame supersamples.
            cull = occl.cull_objects(
                scene.draw_center, scene.draw_extents, uni.models,
                scene.draw_enabled, uni.view_proj, pyr, cfg.width, cfg.height,
            )
            visible = cull.visibility.astype(bool)
            tri_valid = tri_valid & visible[scene.tri_draw]
            visible_draws = cull.visible_count

    with jax.named_scope("pass_setup"):
        setup = geometry.triangle_setup(
            tv.clip, scene.tri_v, tri_valid, rw, rh, cull_mode="back"
        )
    with jax.named_scope("pass_binning"):
        bins = _binner(cfg, scene.tri_v.shape[0])(
            setup.bbox, setup.valid, bhr, rw,
            cfg.tile_h, cfg.tile_w, cfg.max_tris_per_tile, y0=y0r,
            keep_score=_keep_score(cfg, setup),
        )
    blend = cfg.alpha_blend and cfg.shading == "pbr"
    alpha_main = (
        cfg.alpha_test and cfg.textured and pool is not None and not blend
    )
    with jax.named_scope("pass_raster"):
        peel_layers = (
            max(2, cfg.transparency_layers) if blend
            else 2 if alpha_main else 1
        )
        vis = _raster(cfg)(
            setup, bins, bhr, rw, cfg.tile_h, cfg.tile_w, y0=y0r,
            layers=peel_layers,
        )
        if blend and cfg.transparency_passes > 1:
            # Iterated peel: pass p rasterizes only surfaces strictly
            # behind pass p-1's deepest kept layer; since every new layer
            # is deeper than ALL previously kept ones, plain concatenation
            # preserves the global nearest-first order.
            for _ in range(cfg.transparency_passes - 1):
                fl_z, _fl_t = vis.layer(vis.num_layers - 1)
                vis_next = _raster(cfg)(
                    setup, bins, bhr, rw, cfg.tile_h, cfg.tile_w, y0=y0r,
                    layers=peel_layers, depth_floor=fl_z,
                )
                vis = _concat_vis_layers(vis, vis_next)
        if alpha_main:
            from ..ops.shade import resolve_alpha_test

            vis = resolve_alpha_test(
                vis, setup, scene.tri_v, scene.tri_draw, scene.materials,
                scene.uv, pool, y0=y0r, vert_uid=scene.vert_uid,
            )

    with jax.named_scope("pass_gbuffer"):
        prev_clip = None
        if (
            cfg.taa_enabled
            and uni.prev_models is not None
            and uni.prev_view_proj is not None
        ):
            pm = uni.prev_models[scene.vert_draw]  # (Ve, 4, 4)
            pos_e = scene.position[scene.vert_uid]  # expand the unique pool
            prev_world = (
                jnp.einsum("vij,vj->vi", pm[:, :3, :3], pos_e)
                + pm[:, :3, 3]
            )
            pw4 = jnp.concatenate(
                [prev_world, jnp.ones_like(prev_world[:, :1])], -1
            )
            prev_clip = jnp.einsum("ij,vj->vi", uni.prev_view_proj, pw4)

        edge_plan = None
        if edge_msaa:
            # Edge-adaptive MSAA (ops/msaa_edge.py): classify pixels by
            # their sample-rate visibility, then build the CENTER gbuffer —
            # one shaded point per presentation pixel, derivatives stepping
            # one presentation pixel so mips match the 1x footprint.
            from ..ops import msaa_edge

            edge_plan = msaa_edge.classify(vis.tri_id, vis.depth, sy, sx)
            pxc, pyc = msaa_edge.center_pixel_xy(
                bhp, cfg.width, sy, sx, y0r
            )
            gbuf = interpolate_gbuffer(
                edge_plan.primary_tid, setup, scene.tri_v, scene.tri_draw,
                tv, scene.uv, scene.color, y0=y0r, prev_clip=prev_clip,
                fb_height=rh, fb_width=rw, vert_uid=scene.vert_uid,
                packed=cfg.gbuffer_packed, pixel_xy=(pxc, pyc),
                deriv_step=(float(sx), float(sy)),
            )
        else:
            gbuf = interpolate_gbuffer(
                vis.tri_id, setup, scene.tri_v, scene.tri_draw, tv,
                scene.uv, scene.color, y0=y0r, prev_clip=prev_clip,
                fb_height=rh, fb_width=rw, vert_uid=scene.vert_uid,
                packed=cfg.gbuffer_packed,
            )

    with jax.named_scope("pass_light_cull"):
        tile_light_indices = None
        tile_light_counts = None
        if cfg.lights_enabled and lights is not None:
            from ..ops.light_cull import cull_lights

            inv_projection = jnp.linalg.inv(uni.projection)
            tl = cull_lights(
                lights, uni.view, inv_projection, vis.depth, rw, rh,
                max_per_tile=cfg.max_lights_per_tile, tile=cfg.light_tile_size,
                tile_y0=y0r // cfg.light_tile_size,
            )
            tile_light_indices = tl.indices[:, :, : cfg.shaded_lights_per_tile]
            tile_light_counts = jnp.minimum(
                tl.counts, cfg.shaded_lights_per_tile
            )

    def run_shade(g, pixel_xy=None):
        return shade_pbr(
            g,
            scene.materials,
            ShadeUniforms(
                camera_pos=uni.camera_pos,
                light_direction=uni.light_direction,
                light_color=uni.light_color,
                ambient_color=uni.ambient_color,
                light_space_matrix=uni.light_space_matrix,
            ),
            shadow_map=shadow_map,
            pool=pool if cfg.textured else None,
            clear_color=cfg.clear_color,
            reinhard=cfg.reinhard and not cfg.post_enabled,
            lights=lights if cfg.lights_enabled else None,
            tile_light_indices=tile_light_indices,
            tile_light_counts=tile_light_counts,
            light_tile_size=cfg.light_tile_size,
            csm=(
                (uni.cascade_matrices, uni.cascade_splits, uni.view)
                if cfg.shadow_cascades > 1
                else None
            ),
            csm_blend_size=cfg.csm_blend_size,
            max_anisotropy=cfg.max_anisotropy,
            ibl=ibl if cfg.ibl_enabled else None,
            dtype=(
                jnp.bfloat16 if cfg.shade_dtype == "bf16" else jnp.float32
            ),
            pixel_xy=pixel_xy,
        )

    msaa_edge_overflow = None
    with jax.named_scope("pass_shade"):
        if edge_plan is not None:
            from ..ops import msaa_edge

            # Center shading (1x rate), then the compacted edge worklist
            # shades at full sample rate and box-resolves back — the
            # hardware-MSAA cost profile (msaa_targets.rs:24-120).
            color_c = run_shade(
                gbuf,
                pixel_xy=msaa_edge.center_tile_xy(bhp, cfg.width, sy, sx),
            )
            cap = msaa_edge.edge_capacity(
                bhp * cfg.width, cfg.msaa_edge_capacity, sx * sy
            )
            wl = msaa_edge.build_worklist(
                vis.tri_id, edge_plan, cap, sy, sx, y0r=y0r
            )
            gbuf_e = interpolate_gbuffer(
                wl.tid, setup, scene.tri_v, scene.tri_draw, tv,
                scene.uv, scene.color, fb_height=rh, fb_width=rw,
                vert_uid=scene.vert_uid, packed=cfg.gbuffer_packed,
                pixel_xy=(wl.px, wl.py),
            )
            color_e = run_shade(gbuf_e, pixel_xy=(wl.tile_px, wl.tile_py))
            color = msaa_edge.resolve(color_c, color_e, wl, sx * sy)
            msaa_edge_overflow = jnp.maximum(wl.n_edge - cap, 0)
        elif cfg.shading == "flat":
            color = shade_flat(gbuf, clear_color=cfg.clear_color)
        else:
            color = run_shade(gbuf)
            if blend:
                # Shade every depth-peeled layer and composite back-to-front
                # (ops/shade.composite_over; K-layer OIT — the peel sorts per
                # pixel so blend order is exact up to K surfaces deep).
                from ..ops.shade import composite_over, pixel_alpha

                tex_pool = pool if cfg.textured else None
                layers = [(color, pixel_alpha(gbuf, scene.materials, tex_pool))]
                for li in range(1, vis.num_layers):
                    _, tid_l = vis.layer(li)
                    gbuf_l = interpolate_gbuffer(
                        tid_l,
                        setup, scene.tri_v, scene.tri_draw, tv, scene.uv,
                        scene.color, y0=y0r, fb_height=rh, fb_width=rw,
                        vert_uid=scene.vert_uid,
                        packed=cfg.gbuffer_packed,
                    )
                    layers.append(
                        (run_shade(gbuf_l),
                         pixel_alpha(gbuf_l, scene.materials, tex_pool))
                    )
                clear = jnp.asarray(cfg.clear_color, jnp.float32)
                out = jnp.broadcast_to(clear, layers[0][0].shape)
                for color_l, a_l in reversed(layers):
                    out = composite_over(color_l, a_l, out)
                color = out

    with jax.named_scope("pass_resolve"):
        depth = vis.depth
        velocity = gbuf.velocity
        if edge_plan is not None:
            # Edge mode: color and velocity already live at presentation
            # resolution (center gbuffer); only depth needs the min-resolve.
            depth = depth.reshape(bhp, sy, cfg.width, sx).min((1, 3))
        elif sx > 1 or sy > 1:
            # SSAA resolve: box-average color, min-reduce depth (band-local).
            color = color.reshape(bhp, sy, cfg.width, sx, 3).mean((1, 3))
            depth = depth.reshape(bhp, sy, cfg.width, sx).min((1, 3))
            if velocity is not None:
                velocity = velocity.reshape(bhp, sy, cfg.width, sx, 2).mean(
                    (1, 3)
                )

    covered = jnp.sum((vis.tri_id >= 0).astype(jnp.int32))
    overflow = bins.overflow
    if band is not None:
        covered = jax.lax.psum(covered, band.axis)
        overflow = jax.lax.pmax(overflow, band.axis)
        if shadow_overflow is not None:
            shadow_overflow = jax.lax.pmax(shadow_overflow, band.axis)
        if msaa_edge_overflow is not None:
            msaa_edge_overflow = jax.lax.psum(msaa_edge_overflow, band.axis)

    return BandOutputs(
        color=color,
        depth=depth,
        velocity=velocity,
        shadow_map=shadow_map,
        covered=covered,
        overflow=overflow,
        shadow_overflow=shadow_overflow,
        visible_draws=visible_draws,
        msaa_edge_overflow=msaa_edge_overflow,
    )


def finalize_frame(
    config: FrameConfig,
    bo: BandOutputs,
    post: Optional[PostParams] = None,
    taa_params: Optional[TaaParams] = None,
    history: Optional[jnp.ndarray] = None,
) -> FrameOutputs:
    """Post chain (TAA -> bloom -> tonemap -> FXAA) + u8 pack over the FULL
    assembled frame. Runs outside shard_map in multi-chip mode — the post
    convolutions cross band boundaries, so XLA's SPMD partitioner handles
    their halos instead of hand-written collectives."""
    cfg = config
    color, velocity, depth = bo.color, bo.velocity, bo.depth
    if cfg.render_scale != 1.0 and color.shape[0] != cfg.height:
        # TAAU upsample: bilinear color/velocity to presentation res BEFORE
        # the TAA blend — the jittered projection makes successive internal
        # frames sample different sub-pixel positions, so the full-res
        # history integrates real detail, not just interpolation.
        with jax.named_scope("pass_taau"):
            color = jax.image.resize(
                color, (cfg.height, cfg.width, 3), "bilinear"
            )
            if velocity is not None:
                velocity = jax.image.resize(
                    velocity, (cfg.height, cfg.width, 2), "bilinear"
                )
            depth = jax.image.resize(
                depth, (cfg.height, cfg.width), "nearest"
            )
    new_history = None
    if cfg.post_enabled:
        # HDR post chain: TAA (pre-tonemap) -> bloom -> tonemap + gamma.
        if cfg.taa_enabled and taa_params is not None and history is not None:
            with jax.named_scope("pass_taa"):
                color = taa_resolve(color, history, taa_params, velocity=velocity)
                new_history = color
        p = post if post is not None else PostParams.default()
        bloom = None
        if cfg.bloom_enabled:
            with jax.named_scope("pass_bloom"):
                bloom = bloom_pyramid(
                    color,
                    threshold=p.bloom_threshold,
                    soft_knee=p.bloom_soft_knee,
                    mip_count=cfg.bloom_mips,
                )
        with jax.named_scope("pass_tonemap"):
            color = tonemap_compose(
                color, bloom, p.exposure, p.gamma, p.bloom_intensity,
                operator=cfg.tonemap_operator,
            )
        encoded = color  # gamma already applied by the tonemap pass
    else:
        encoded = _srgb_encode(color) if cfg.srgb_output else color

    if cfg.fxaa_enabled:
        from ..ops.fxaa import fxaa

        with jax.named_scope("pass_fxaa"):
            encoded = fxaa(encoded)

    with jax.named_scope("pass_pack"):
        rgb_u8 = jnp.clip(encoded * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
        alpha = jnp.full((cfg.height, cfg.width, 1), 255, jnp.uint8)
        image = jnp.concatenate([rgb_u8, alpha], axis=-1)

    if cfg.overflow_taint:
        # BOTTOM-right corner (the text overlay composites top-left).
        blk = max(min(8, cfg.height, cfg.width // 2), 1)
        h, w = cfg.height, cfg.width
        magenta = jnp.array([255, 0, 255], jnp.uint8)
        image = image.at[h - blk :, w - blk :, :3].set(
            jnp.where(
                bo.overflow > 0, magenta, image[h - blk :, w - blk :, :3]
            )
        )
        if bo.shadow_overflow is not None:
            cyan = jnp.array([0, 255, 255], jnp.uint8)
            image = image.at[h - blk :, w - 2 * blk : w - blk, :3].set(
                jnp.where(
                    bo.shadow_overflow > 0,
                    cyan,
                    image[h - blk :, w - 2 * blk : w - blk, :3],
                )
            )

    return FrameOutputs(
        image=image,
        color=color,
        depth=depth,
        shadow_map=bo.shadow_map,
        covered_pixels=bo.covered,
        binning_overflow=bo.overflow,
        history=new_history,
        visible_draws=bo.visible_draws,
        shadow_overflow=bo.shadow_overflow,
        msaa_edge_overflow=bo.msaa_edge_overflow,
    )


def render_frame_program(
    config: FrameConfig,
    scene: SceneBuffers,
    uni: FrameUniforms,
    pool: Optional[TexturePool],
    post: Optional[PostParams] = None,
    taa_params: Optional[TaaParams] = None,
    history: Optional[jnp.ndarray] = None,
    lights: Optional[jnp.ndarray] = None,  # (L, 16) packed GpuLight rows
    prev_depth: Optional[jnp.ndarray] = None,  # (H, W) last frame, resolved
    ibl=None,  # ops/ibl.EnvironmentIBL
    ext_shadow: Optional[tuple] = None,  # pre-rendered (map, overflow)
) -> FrameOutputs:
    """The pure frame function (trace-time `config`, runtime everything
    else): the single-device composition of render_band + finalize_frame.

    `ext_shadow` feeds a shadow map rendered by the standalone
    shadow_program (possibly cached from a previous frame); None renders
    shadows inside this program."""
    bo = render_band(
        config, scene, uni, pool, lights, prev_depth, ibl, band=None,
        ext_shadow=ext_shadow,
    )
    return finalize_frame(config, bo, post, taa_params, history)


@_effort_cached
def compiled_frame(config: FrameConfig, effort: Optional[float] = None):
    """Jitted frame program for a config (the "pipeline cache" entry).

    256 entries: eviction silently drops a compiled executable and forces a
    multi-second re-trace on the next frame with that config, so the bound
    sits far above any realistic config count (reference pipeline caches
    are unbounded, pipeline_cache.rs)."""
    fn = functools.partial(render_frame_program, config)
    return jax.jit(fn, **_jit_opts(effort))


# ---------------------------------------------------------------------------
# Packed per-frame constants — the frame UBO
# ---------------------------------------------------------------------------
#
# The reference writes every per-frame scalar/matrix uniform into one
# persistently mapped UBO (uniform.rs:11-22, 230-257). The TPU analog: the
# renderer packs view/projection matrices, lighting, cascade fits, post
# knobs and TAA params into ONE host f32 buffer, uploads it once, and the
# jitted programs slice the fields back out at trace time (static offsets —
# XLA constant-folds the unpack). Without this every FrameUniforms /
# PostParams / TaaParams leaf was its own per-frame host->device transfer:
# ~21 small device_puts per frame, each paying fixed dispatch cost — a
# measurable slice of the animated loop's host budget (VERDICT r3 weak #1).


@functools.lru_cache(maxsize=256)
def consts_layout(config: FrameConfig):
    """{field: (offset, shape)} + total length for a config's packed
    frame-constants buffer. Layout is config-static: TAA and CSM fields
    exist only when the config enables them, so the buffer (like the jit
    signature) is stable across frames of one config."""
    import math

    fields = [
        ("view_proj", (4, 4)),
        ("view", (4, 4)),
        ("projection", (4, 4)),
        ("light_space_matrix", (4, 4)),
        ("camera_pos", (3,)),
        ("light_direction", (3,)),
        ("light_color", (3,)),
        ("ambient_color", (3,)),
        ("post", (5,)),
    ]
    if config.taa_enabled and config.post_enabled:
        # taa_params is non-None exactly when post is enabled (the
        # renderer only drives TAA under HDR post); the packed layout
        # must be config-static, so gate on the config pair.
        fields.append(("taa", (7,)))
        fields.append(("prev_view_proj", (4, 4)))
    if config.shadow_cascades > 1:
        fields.append(("cascade_matrices", (config.shadow_cascades, 4, 4)))
        fields.append(("cascade_splits", (4,)))
    layout = {}
    off = 0
    for name, shape in fields:
        layout[name] = (off, shape)
        off += math.prod(shape)
    return layout, off


def pack_frame_consts(config, uni: FrameUniforms,
                      post: Optional[PostParams],
                      taa_params: Optional[TaaParams],
                      out=None):
    """Host-side: write the per-frame uniforms into one numpy f32 buffer
    (reused across frames via `out`). Returns the buffer."""
    import math

    import numpy as np

    layout, total = consts_layout(config)
    if out is None or out.shape != (total,):
        out = np.empty((total,), np.float32)

    def put(name, value):
        off, shape = layout[name]
        n = math.prod(shape)
        out[off:off + n] = np.asarray(value, np.float32).reshape(-1)

    put("view_proj", uni.view_proj)
    put("view", uni.view)
    put("projection", uni.projection)
    put("light_space_matrix", uni.light_space_matrix)
    put("camera_pos", uni.camera_pos)
    put("light_direction", uni.light_direction)
    put("light_color", uni.light_color)
    put("ambient_color", uni.ambient_color)
    if post is None:
        post = PostParams.default()
    put("post", [post.exposure, post.gamma, post.bloom_intensity,
                 post.bloom_threshold, post.bloom_soft_knee])
    if config.taa_enabled and config.post_enabled:
        t = taa_params
        put("taa", [t.blend_factor, t.color_clamp, t.velocity_rejection,
                    t.jitter[0], t.jitter[1], t.prev_jitter[0],
                    t.prev_jitter[1]])
        put("prev_view_proj", uni.prev_view_proj)
    if config.shadow_cascades > 1:
        put("cascade_matrices",
            uni.cascade_matrices[: config.shadow_cascades])
        put("cascade_splits", uni.cascade_splits)
    return out


def pack_frame_consts_dynamic(config, uni: FrameUniforms,
                              post: Optional[PostParams],
                              taa_params: Optional[TaaParams],
                              models):
    """pack_frame_consts with the per-draw model matrices appended: the
    WHOLE per-frame state of a dynamic scene in one f32 upload. The
    reference's animation path is per-draw push constants
    (model_renderer.rs:309-385) — zero per-frame buffer traffic; on TPU the
    equivalent is minimizing per-frame host->device transfers, and two
    device_puts (models + consts) measured ~2.5x the host cost of one
    (~0.19 ms vs ~0.06-0.08 ms each on the tunneled chip). A fresh buffer
    per frame — reusing one could race an in-flight transfer."""
    import numpy as np

    _, total = consts_layout(config)
    m = np.asarray(models, np.float32)
    out = np.empty((total + m.size,), np.float32)
    pack_frame_consts(config, uni, post, taa_params, out=out[:total])
    out[total:] = m.ravel()
    return out


def pack_frame_consts_trs(config, uni: FrameUniforms,
                          post: Optional[PostParams],
                          taa_params: Optional[TaaParams],
                          translations, rotations, scales):
    """pack_frame_consts with per-draw TRS components appended
    (t (N,3) | q (N,4) xyzw | s (N,3)): 10 floats/draw instead of 16 —
    the animated upload is tunnel-bandwidth-bound, so bytes are the cost
    (VERDICT r3 next-round #1: upload TRS, compose matrices in-jit)."""
    import numpy as np

    _, total = consts_layout(config)
    t = np.asarray(translations, np.float32)
    q = np.asarray(rotations, np.float32)
    s = np.asarray(scales, np.float32)
    n = t.shape[0]
    out = np.empty((total + 10 * n,), np.float32)
    pack_frame_consts(config, uni, post, taa_params, out=out[:total])
    out[total:total + 3 * n] = t.ravel()
    out[total + 3 * n:total + 7 * n] = q.ravel()
    out[total + 7 * n:] = s.ravel()
    return out


def models_from_trs(t, q, s):
    """In-jit TRS -> (N, 4, 4) model matrices: T * R(quat xyzw) * S
    (transform.rs:22-26). Op-for-op the same float sequence as the host
    compose (core/maths.mat4_trs_batch) so device-composed frames are
    pixel-identical to host-composed ones."""
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    r = jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], -1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], -1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], -1),
        ],
        -2,
    )  # (N, 3, 3), rows i, columns j
    r = r * s[:, None, :]  # scale column j by s_j (the * S compose)
    top = jnp.concatenate([r, t[:, :, None]], axis=2)  # (N, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], r.dtype), (t.shape[0], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=1)


def unpack_frame_consts(config, consts, models, prev_models):
    """Trace-time inverse of pack_frame_consts: static slices of the one
    uploaded buffer back into the FrameUniforms / PostParams / TaaParams
    pytrees the frame programs consume."""
    import math

    layout, _ = consts_layout(config)

    def take(name):
        off, shape = layout[name]
        return consts[off:off + math.prod(shape)].reshape(shape)

    uni = FrameUniforms(
        view_proj=take("view_proj"),
        camera_pos=take("camera_pos"),
        light_direction=take("light_direction"),
        light_color=take("light_color"),
        ambient_color=take("ambient_color"),
        light_space_matrix=take("light_space_matrix"),
        models=models,
        view=take("view"),
        projection=take("projection"),
        cascade_matrices=(
            take("cascade_matrices") if config.shadow_cascades > 1 else None
        ),
        cascade_splits=(
            take("cascade_splits") if config.shadow_cascades > 1 else None
        ),
        prev_view_proj=(
            take("prev_view_proj")
            if config.taa_enabled and config.post_enabled else None
        ),
        prev_models=(
            prev_models
            if config.taa_enabled and config.post_enabled else None
        ),
    )
    p = take("post")
    post = PostParams(
        exposure=p[0], gamma=p[1], bloom_intensity=p[2],
        bloom_threshold=p[3], bloom_soft_knee=p[4],
    )
    taa = None
    if config.taa_enabled and config.post_enabled:
        t = take("taa")
        taa = TaaParams(
            blend_factor=t[0], color_clamp=t[1], velocity_rejection=t[2],
            jitter=t[3:5], prev_jitter=t[5:7],
        )
    return uni, post, taa


@_effort_cached
def compiled_frame_packed(config: FrameConfig,
                          effort: Optional[float] = None):
    """Fused frame program taking the packed frame-constants buffer (the
    hot single-chip serving path; the unpacked compiled_frame remains for
    the chunked pipeline and direct/pytest use)."""

    def fn(scene, consts, models, prev_models, pool, history, lights,
           prev_depth, ibl, ext_shadow):
        uni, post, taa = unpack_frame_consts(
            config, consts, models, prev_models
        )
        return render_frame_program(
            config, scene, uni, pool, post, taa, history, lights,
            prev_depth, ibl, ext_shadow,
        )

    return jax.jit(fn, **_jit_opts(effort))


@_effort_cached
def compiled_band_packed(config: FrameConfig,
                         effort: Optional[float] = None):
    def fn(scene, consts, models, prev_models, pool, lights, prev_depth,
           ibl, ext_shadow):
        uni, _, _ = unpack_frame_consts(config, consts, models, prev_models)
        return render_band(
            config, scene, uni, pool, lights, prev_depth, ibl,
            band=None, ext_shadow=ext_shadow,
        )

    return jax.jit(fn, **_jit_opts(effort))


@_effort_cached
def compiled_finalize_packed(config: FrameConfig,
                             effort: Optional[float] = None):
    def fn(bo, consts, history):
        _, post, taa = unpack_frame_consts(config, consts, None, None)
        return finalize_frame(config, bo, post, taa, history)

    return jax.jit(fn, **_jit_opts(effort))


@_effort_cached
def compiled_shadow_packed(config: FrameConfig,
                           effort: Optional[float] = None):
    def fn(scene, models, consts, pool):
        layout, _ = consts_layout(config)
        import math

        def take(name):
            off, shape = layout[name]
            return consts[off:off + math.prod(shape)].reshape(shape)

        return shadow_program(
            config, scene, models, take("light_space_matrix"),
            (take("cascade_matrices")
             if config.shadow_cascades > 1 else None),
            pool,
        )

    return jax.jit(fn, **_jit_opts(effort))


@_effort_cached
def compiled_frame_dynamic(config: FrameConfig,
                           effort: Optional[float] = None):
    """Fused frame program for DYNAMIC scenes: the per-draw model matrices
    ride the TAIL of the packed constants buffer (pack_frame_consts_dynamic),
    so an animated frame costs ONE host->device upload and ONE dispatch.
    Shadows render inline — a moving scene invalidates the standalone shadow
    cache every frame anyway, so the split buys nothing and costs a second
    dispatch. Non-post configs only (TAA consumes prev_models, which the
    dynamic layout does not carry; the renderer materializes the standard
    device-models upload on post paths instead)."""
    if config.post_enabled:
        raise ValueError("compiled_frame_dynamic is a non-post program")

    def fn(scene, consts, pool, history, lights, prev_depth, ibl):
        _, total = consts_layout(config)
        d = scene.num_draws
        models = jax.lax.slice_in_dim(
            consts, total, total + 16 * d
        ).reshape(d, 4, 4)
        uni, post, taa = unpack_frame_consts(
            config, consts[:total], models, None
        )
        return render_frame_program(
            config, scene, uni, pool, post, taa, history, lights,
            prev_depth, ibl, None,
        )

    return jax.jit(fn, **_jit_opts(effort))


@_effort_cached
def compiled_frame_dynamic_trs(config: FrameConfig,
                               effort: Optional[float] = None):
    """compiled_frame_dynamic, but the consts tail carries TRS components
    (10 floats/draw) and the model matrices compose ON DEVICE
    (models_from_trs) — 37% less per-frame upload for rigid-body animation,
    where the tunneled transfer is bandwidth-bound (VERDICT r3 item 1)."""
    if config.post_enabled:
        raise ValueError("compiled_frame_dynamic_trs is a non-post program")

    def fn(scene, consts, pool, history, lights, prev_depth, ibl):
        _, total = consts_layout(config)
        d = scene.num_draws
        t = consts[total:total + 3 * d].reshape(d, 3)
        q = consts[total + 3 * d:total + 7 * d].reshape(d, 4)
        s = consts[total + 7 * d:total + 10 * d].reshape(d, 3)
        models = models_from_trs(t, q, s)
        uni, post, taa = unpack_frame_consts(
            config, consts[:total], models, None
        )
        return render_frame_program(
            config, scene, uni, pool, post, taa, history, lights,
            prev_depth, ibl, None,
        )

    return jax.jit(fn, **_jit_opts(effort))


# ---------------------------------------------------------------------------
# Chunked geometry (the 65k-instance contract at scales whose per-triangle
# raster transients would not fit HBM, instancing.rs:16)
# ---------------------------------------------------------------------------
#
# The vertex stage and triangle setup materialize ~56 B/expanded-vertex and
# ~124 B/triangle transiently inside one frame program; past roughly 10^8
# triangles that alone exceeds a 16 GB chip. The chunked path bounds the
# transient: the draw list splits into fixed-size groups, each group runs
# the SAME render_band program (one compile, G executions), and chunks merge
# by nearest depth — exact for opaque geometry, the same result the fused
# raster's depth test produces. Shadows render per chunk and min-merge
# (depth maps compose under min). Post/TAA run once on the merged frame.


def merge_band_outputs(a: BandOutputs, b: BandOutputs) -> BandOutputs:
    """Depth-test composite of two opaque chunk renders (b later in draw
    order: ties keep a, matching submission-order semantics)."""
    win_b = b.depth < a.depth
    color = jnp.where(win_b[..., None], b.color, a.color)
    depth = jnp.minimum(a.depth, b.depth)
    velocity = None
    if a.velocity is not None and b.velocity is not None:
        velocity = jnp.where(win_b[..., None], b.velocity, a.velocity)
    shadow_map = None
    if a.shadow_map is not None and b.shadow_map is not None:
        shadow_map = jnp.minimum(a.shadow_map, b.shadow_map)
    return BandOutputs(
        color=color,
        depth=depth,
        velocity=velocity,
        shadow_map=shadow_map,
        # Per-chunk covered counts sum (overlapping coverage counts once
        # per chunk — an upper bound; exact per-chunk values are what the
        # overflow diagnostics need anyway).
        covered=a.covered + b.covered,
        overflow=jnp.maximum(a.overflow, b.overflow),
        shadow_overflow=(
            jnp.maximum(a.shadow_overflow, b.shadow_overflow)
            if a.shadow_overflow is not None
            and b.shadow_overflow is not None
            else (a.shadow_overflow
                  if a.shadow_overflow is not None else b.shadow_overflow)
        ),
        visible_draws=(
            a.visible_draws + b.visible_draws
            if a.visible_draws is not None and b.visible_draws is not None
            else None
        ),
        # Per-chunk worklists are independent; total quality loss is the sum.
        msaa_edge_overflow=(
            a.msaa_edge_overflow + b.msaa_edge_overflow
            if a.msaa_edge_overflow is not None
            and b.msaa_edge_overflow is not None
            else None
        ),
    )


@_effort_cached
def compiled_band(config: FrameConfig, effort: Optional[float] = None):
    """Jitted raster+shade stage WITHOUT the post chain: the chunked path
    runs one per chunk, merges, then runs compiled_finalize once."""

    def fn(scene, uni, pool, lights, prev_depth, ibl, ext_shadow):
        return render_band(
            config, scene, uni, pool, lights, prev_depth, ibl,
            band=None, ext_shadow=ext_shadow,
        )

    return jax.jit(fn, **_jit_opts(effort))


@functools.lru_cache(maxsize=1)
def _merge_jit():
    return jax.jit(merge_band_outputs)


def compiled_merge(config: FrameConfig = None):
    """Config-independent (jit specializes on argument shapes, which carry
    everything the merge needs) — one cached jit serves every config,
    instead of re-tracing an identical program per FrameConfig."""
    return _merge_jit()


@_effort_cached
def compiled_finalize(config: FrameConfig, effort: Optional[float] = None):
    fn = functools.partial(finalize_frame, config)
    return jax.jit(fn, **_jit_opts(effort))


@functools.lru_cache(maxsize=1)
def _shadow_merge_jit():
    return jax.jit(
        lambda a, b: (jnp.minimum(a[0], b[0]), jnp.maximum(a[1], b[1]))
    )


def compiled_shadow_merge(config: FrameConfig = None):
    """min-merge of per-chunk shadow depth maps (+ max of overflows).
    Config-independent — see compiled_merge."""
    return _shadow_merge_jit()
