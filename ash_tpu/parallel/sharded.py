"""Screen-space SPMD rendering: shard the frame across a TPU mesh.

The reference is a single-GPU renderer (SURVEY.md §5.8: no multi-device path
exists); its internal parallelism is screen tiling. That tiling is exactly
what scales across chips on TPU: the frame pipeline already renders bands of
tile rows (render_band's `band` argument), so multi-chip rendering is
`shard_map` over a 1D device mesh where

- scene buffers + uniforms + texture pool are REPLICATED (the vertex stage
  is cheap: redundant compute beats communicating triangles),
- each device bins + rasters + shades its horizontal band of the framebuffer
  (tile-disjoint writes -> no cross-device raster communication at all),
- shadow maps (incl. every CSM cascade) are rendered band-wise and
  `all_gather`ed along the mesh (every device needs the whole map for PCF),
- per-frame scalars (covered pixels, bin overflows) reduce via psum/pmax,
- the band images assemble implicitly via the out_spec partitioning,
- the post chain (TAA/bloom/tonemap/FXAA) runs OUTSIDE the shard_map on the
  assembled (still device-sharded) image: its convolutions cross band
  boundaries, so XLA's SPMD partitioner inserts the halo exchanges.

Crucially there is ONE pipeline: the function shard_mapped here is the very
render_band the single-chip Renderer executes — Pallas raster, bindless
textures, Forward+ light culling, CSM, alpha test/blend, GPU-driven culling
and SSAA all behave identically on 1 or N chips (tests/test_parallel.py
asserts pixel equality).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..render.frame import (
    BandOutputs,
    BandSpec,
    FrameConfig,
    FrameOutputs,
    FrameUniforms,
    band_render_rows,
    band_rows,
    finalize_frame,
    internal_render_size,
    render_band,
)
from ..render.scene import SceneBuffers


def make_sharded_frame(config: FrameConfig, mesh: Mesh, axis: str = "sp"):
    """Build a jitted SPMD frame function over `mesh` (1D, axis `axis`).

    Returns fn(scene, uni, pool=None, post=None, taa_params=None,
    history=None, lights=None, prev_depth=None, ibl=None) -> FrameOutputs —
    the same surface as render_frame_program, every feature included. The
    framebuffer is padded so each device owns an equal band of tile rows;
    outputs are cropped back to (height, width).
    """
    n = mesh.shape[axis]
    cfg = config
    band = BandSpec(axis=axis, n=n)
    if cfg.render_scale != 1.0:
        # TAAU: bands split the INTERNAL rows; finalize_frame upsamples
        # the assembled (sharded) image to presentation resolution.
        per_dev = band_render_rows(cfg, n)
        total_rows = internal_render_size(
            cfg.width, cfg.height, cfg.render_scale
        )[1]
    else:
        per_dev = band_rows(cfg, n)  # presentation rows per device
        total_rows = cfg.height

    def device_fn(scene, uni, pool, lights, prev_depth, ibl):
        return render_band(
            cfg, scene, uni, pool, lights, prev_depth, ibl, band=band
        )

    banded = ("color", "depth", "velocity")

    @functools.lru_cache(maxsize=None)
    def _compiled(tree_key):
        del tree_key  # jit below retraces per input structure anyway

        def impl(scene, uni, pool, post, taa_params, history, lights,
                 prev_depth, ibl):
            # Out specs: banded leaves partition along the mesh axis; the
            # all-gathered shadow map and the reduced scalars replicate.
            struct = jax.eval_shape(
                functools.partial(render_band, cfg, band=None),
                scene, uni, pool, lights, prev_depth, ibl,
            )
            out_specs = BandOutputs(**{
                f: (None if getattr(struct, f) is None
                    else (P(axis) if f in banded else P()))
                for f in BandOutputs._fields
            })
            sharded = jax.shard_map(
                device_fn,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P()),  # replicated
                out_specs=out_specs,
                check_vma=False,
            )
            bo = sharded(scene, uni, pool, lights, prev_depth, ibl)
            if n * per_dev != total_rows:  # crop the band padding
                bo = bo._replace(
                    color=bo.color[:total_rows],
                    depth=bo.depth[:total_rows],
                    velocity=(
                        None if bo.velocity is None
                        else bo.velocity[:total_rows]
                    ),
                )
            return finalize_frame(cfg, bo, post, taa_params, history)

        return jax.jit(impl)

    def frame(
        scene: SceneBuffers,
        uni: FrameUniforms,
        pool=None,
        post=None,
        taa_params=None,
        history=None,
        lights=None,
        prev_depth=None,
        ibl=None,
    ) -> FrameOutputs:
        key = tuple(
            x is None
            for x in (pool, post, taa_params, history, lights, prev_depth,
                      ibl)
        )
        return _compiled(key)(
            scene, uni, pool, post, taa_params, history, lights, prev_depth,
            ibl,
        )

    return frame


def render_mesh(n_devices: Optional[int] = None, axis: str = "sp") -> Mesh:
    """1D screen-parallel device mesh over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(devices[:n], (axis,))
