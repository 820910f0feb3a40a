"""Multi-chip SPMD rendering over a jax.sharding.Mesh."""

from .sharded import make_sharded_frame, render_mesh

__all__ = ["make_sharded_frame", "render_mesh"]
