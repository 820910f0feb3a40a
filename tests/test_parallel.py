"""Multi-device SPMD rendering vs single-chip oracle (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ash_tpu.parallel import make_sharded_frame, render_mesh
from ash_tpu.render.frame import FrameConfig, render_frame_program


@pytest.fixture(scope="module")
def example():
    import __graft_entry__ as ge

    return ge._example_scene(n_cubes=6)


def _config(h=128, w=128, shadows=True):
    return FrameConfig(
        width=w, height=h, tile_h=8, tile_w=128, max_tris_per_tile=32,
        shadow_enabled=shadows, shadow_resolution=128, shadow_tile=16,
        shadow_max_tris_per_tile=32,
    )


def test_sharded_matches_single_device(example):
    scene, uni = example
    cfg = _config()
    uni = jax.tree.map(jnp.asarray, uni)

    single = render_frame_program(cfg, scene, uni, None)
    mesh = render_mesh(8)
    frame = make_sharded_frame(cfg, mesh)
    sharded = frame(scene, uni)

    np.testing.assert_array_equal(
        np.asarray(sharded), np.asarray(single.image)
    )


def test_sharded_no_shadows(example):
    scene, uni = example
    cfg = _config(shadows=False)
    uni = jax.tree.map(jnp.asarray, uni)
    single = render_frame_program(cfg, scene, uni, None)
    frame = make_sharded_frame(cfg, render_mesh(4))
    np.testing.assert_array_equal(
        np.asarray(frame(scene, uni)), np.asarray(single.image)
    )


def test_sharded_nondivisible_height(example):
    """Height not divisible by n*tile_h gets padded then cropped."""
    scene, uni = example
    cfg = _config(h=100, shadows=False)
    uni = jax.tree.map(jnp.asarray, uni)
    single = render_frame_program(cfg, scene, uni, None)
    frame = make_sharded_frame(cfg, render_mesh(8))
    got = frame(scene, uni)
    assert got.shape == (100, 128, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(single.image))
