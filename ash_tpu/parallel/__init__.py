"""Multi-chip SPMD rendering over a jax.sharding.Mesh.

Two parallelism axes:
- make_sharded_frame: screen-space bands, one frame, minimum latency.
- make_frame_parallel: one frame per chip, maximum throughput (offline /
  animation rendering).
"""

from .frame_parallel import (
    batch_uniforms,
    make_frame_parallel,
    make_frame_parallel_banded,
)
from .sharded import make_sharded_frame, render_mesh

__all__ = [
    "batch_uniforms",
    "make_frame_parallel",
    "make_frame_parallel_banded",
    "make_sharded_frame",
    "render_mesh",
]
