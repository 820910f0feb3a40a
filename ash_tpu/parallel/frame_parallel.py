"""Frame-parallel SPMD rendering: each chip renders a DIFFERENT frame.

The second parallelism axis next to screen-space banding (sharded.py).
Band mode minimizes latency of ONE frame; frame mode maximizes THROUGHPUT
of many — the right axis for offline/animation rendering (e.g. dumping a
camera path through FileStreamSurface): scene buffers and the texture pool
are replicated once, per-frame uniforms are sharded along the mesh, and
every device runs the FULL single-chip frame program (render_frame_program
— raster, shade, post chain) on its own frame with ZERO cross-device
communication.

TAA is rejected here: its history is a sequential cross-frame dependency;
use band mode for temporal features, or chunk the sequence and carry
history between chunks host-side.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..render.frame import (
    FrameConfig,
    FrameOutputs,
    FrameUniforms,
    render_frame_program,
)
from ..render.scene import SceneBuffers


def make_frame_parallel(config: FrameConfig, mesh: Mesh, axis: str = "fp"):
    """Build a jitted frame-parallel renderer over a 1D `mesh`.

    Returns fn(scene, uni_batch, pool=None, post=None, lights=None,
    ibl=None) -> FrameOutputs where every leaf of `uni_batch` (and of
    `lights`, if given) carries a leading axis of n = mesh.shape[axis]
    frames, and every output leaf carries the same leading frame axis.
    """
    if config.taa_enabled:
        raise ValueError(
            "frame-parallel rendering cannot carry TAA history across "
            "frames; disable taa_enabled or use make_sharded_frame"
        )
    n = mesh.shape[axis]
    cfg = config

    def device_fn(scene, uni, pool, post, lights, ibl):
        # Local shard: leading frame axis of size 1 -> squeeze, render the
        # full single-chip program, re-expand.
        uni1 = jax.tree.map(lambda x: x[0], uni)
        lights1 = None if lights is None else lights[0]
        out = render_frame_program(
            cfg, scene, uni1, pool, post, None, None, lights1, None, ibl
        )
        return jax.tree.map(
            lambda x: x[None] if x is not None else None, out
        )

    @functools.lru_cache(maxsize=None)
    def _compiled(tree_key):
        del tree_key

        def impl(scene, uni, pool, post, lights, ibl):
            spec_uni = jax.tree.map(lambda _: P(axis), uni)
            spec_lights = None if lights is None else P(axis)
            out_specs = jax.tree.map(lambda _: P(axis), jax.eval_shape(
                device_fn, scene, uni, pool, post, lights, ibl
            ))
            return jax.shard_map(
                device_fn,
                mesh=mesh,
                in_specs=(P(), spec_uni, P(), P(), spec_lights, P()),
                out_specs=out_specs,
                check_vma=False,
            )(scene, uni, pool, post, lights, ibl)

        return jax.jit(impl)

    def frames(
        scene: SceneBuffers,
        uni_batch: FrameUniforms,
        pool=None,
        post=None,
        lights=None,
        ibl=None,
    ) -> FrameOutputs:
        lead = jax.tree.leaves(uni_batch)[0].shape[0]
        if lead != n:
            raise ValueError(
                f"uniform batch has {lead} frames, mesh has {n} devices"
            )
        uni_dev = jax.tree.map(jnp.asarray, uni_batch)
        key = tuple(x is None for x in (pool, post, lights, ibl))
        return _compiled(key)(scene, uni_dev, pool, post, lights, ibl)

    return frames


def batch_uniforms(unis: list) -> FrameUniforms:
    """Stack per-frame FrameUniforms into one leading-axis batch."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *unis)
