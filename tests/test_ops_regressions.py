"""Regressions for core-op bugs found by the round-3 ops review.

Each test pins a failure that shipped silently: a non-conservative Hi-Z
pyramid (false occlusion culls), stream-compaction corruption at exactly
full capacity, and phantom binning overflow from padded off-grid tiles.
"""

import jax.numpy as jnp
import numpy as np


def test_hiz_odd_levels_keep_far_depths():
    """Odd-sized levels used to TRUNCATE their last row/col, so far
    depths at the screen edge vanished and the occlusion test falsely
    culled visible objects there (hiz_generate.comp is a conservative
    2x2 MAX chain)."""
    from ash_tpu.ops.hiz import build_hiz

    d = jnp.full((5, 4), 0.1).at[4, :].set(1.0)
    p = build_hiz(d)
    assert float(p.level(1).max()) == 1.0

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.random((135, 17)).astype(np.float32))
    p = build_hiz(d)
    gm = float(jnp.max(d))
    for i in range(p.levels):
        assert float(p.level(i).max()) == gm, (i, float(p.level(i).max()))


def test_hiz_per_region_conservative():
    """Every level-1 texel must be >= the max of its (edge-folded) source
    block — the property the occlusion test's `min_z > hiz` relies on."""
    from ash_tpu.ops.hiz import build_hiz

    rng = np.random.default_rng(1)
    src = rng.random((9, 7)).astype(np.float32)
    lvl1 = np.asarray(build_hiz(jnp.asarray(src)).level(1))
    for y in range(lvl1.shape[0]):
        for x in range(lvl1.shape[1]):
            y1 = src.shape[0] if y == lvl1.shape[0] - 1 else 2 * y + 2
            x1 = src.shape[1] if x == lvl1.shape[1] - 1 else 2 * x + 2
            assert lvl1[y, x] >= src[2 * y: y1, 2 * x: x1].max() - 1e-7


def test_prefix_sum_compact_exact_capacity():
    """count == capacity with unmasked elements present used to write -1
    into the last slot (unmasked ids all scattered to capacity-1, and
    duplicate-index scatter ordering is undefined in JAX)."""
    from ash_tpu.ops.compute_utils import prefix_sum_compact

    out, c = prefix_sum_compact(jnp.asarray([False, True, True]), 2)
    assert list(np.asarray(out)) == [1, 2] and int(c) == 2
    out, c = prefix_sum_compact(jnp.asarray([True, False, True, True]), 2)
    assert list(np.asarray(out)) == [0, 2] and int(c) == 2
    out, c = prefix_sum_compact(jnp.asarray([False] * 4), 3)
    assert list(np.asarray(out)) == [-1, -1, -1] and int(c) == 0
    out, c = prefix_sum_compact(jnp.asarray([True] * 3), 5)
    assert list(np.asarray(out)) == [0, 1, 2, -1, -1] and int(c) == 3


def test_two_level_binning_pad_tiles_do_not_overflow():
    """The fine grid pads to whole coarse tiles (off-screen); un-culled
    geometry past the screen edge bins ONLY into those pad tiles, which
    used to count toward `overflow` — phantom dropped-triangle reports
    (taint pixel, stats) for scenes whose real tiles were fine."""
    from ash_tpu.ops.binning import bin_triangles_two_level

    h, w, th, tw = 64, 96, 8, 32  # 8x3 fine grid; pads to 8x4 with (4,2)
    # One real on-screen triangle, plus 6 entirely past the right edge
    # (x0 >= w): they overlap only the pad column tiles. max_per_tile=4
    # would flag the pad tile's 6 as overflow even though every REAL
    # tile holds one triangle at most — and nothing visible was dropped.
    bbox = np.array(
        [(4.0, 4.0, 12.0, 12.0)]
        + [(w + 2.0 + i, 1.0, w + 20.0 + i, 6.0) for i in range(6)],
        np.float32,
    )
    bins = bin_triangles_two_level(
        jnp.asarray(bbox), jnp.ones(len(bbox), bool), h, w, th, tw,
        max_per_tile=4, coarse_tiles=(4, 2),
    )
    assert int(bins.overflow) == 0
    counts = np.asarray(bins.counts)
    assert counts.max() == 1


def test_straight_down_light_has_valid_shadow_matrix():
    """look_at_rh with up parallel to the view direction degenerates to a
    zero basis (glam does the same; the reference hardcodes up=[0,1,0]
    for its shadow view, so a noon sun breaks its shadows too — latent
    there, fixed here via maths.stable_up)."""
    import numpy as np

    from ash_tpu.render.shadow_map import directional_light_matrix

    m = directional_light_matrix([0.0, -1.0, 0.0], [0, 0, 0], 10.0)
    assert np.all(np.isfinite(m))
    # The view basis must be orthonormal: a point offset from the center
    # must land away from the origin in light space.
    p = m @ np.array([3.0, 0.0, 2.0, 1.0], np.float32)
    assert abs(p[0]) > 1e-3 or abs(p[1]) > 1e-3


def test_psnr_scale_inference():
    """psnr infers peak from dtype (u8 -> 255, float -> 1.0) and honors an
    explicit peak; the old value heuristic scored dark u8 frames as
    catastrophically bad and overrode explicit HDR peaks."""
    import numpy as np

    from ash_tpu.utils.image import psnr

    a = np.zeros((8, 8), np.uint8)
    b = a.copy()
    b[0, 0] = 1  # 1 LSB on a DARK u8 image
    assert psnr(a, b) > 45.0
    hdr_a = np.full((8, 8), 4.0, np.float32)
    hdr_b = hdr_a + 0.5
    assert abs(psnr(hdr_a, hdr_b, peak=8.0) - 10 * np.log10(64 / 0.25)) < 0.1
