"""Image-based lighting: env prefiltering, irradiance, split-sum ambient."""

import jax.numpy as jnp
import numpy as np

from ash_tpu.ops import ibl as ibl_ops


def _sky_ground_env(h=32, w=64):
    """Blue above the horizon, brown below."""
    env = np.zeros((h, w, 3), np.float32)
    env[: h // 2] = [0.2, 0.4, 1.0]
    env[h // 2 :] = [0.35, 0.25, 0.15]
    return env


def test_irradiance_direction_dependence():
    env = _sky_ground_env()
    irr = ibl_ops.irradiance_map(env, out_h=8)
    assert irr.shape == (8, 16, 3)
    up = irr[0, 0]  # +Y row
    down = irr[-1, 0]
    assert up[2] > down[2], "up-facing surfaces collect more sky blue"
    assert down[0] > down[2] * 0.8, "down-facing collect ground tones"
    # Energy sanity: irradiance bounded by max radiance.
    assert irr.max() <= env.max() + 1e-3


def test_prefilter_pyramid_shapes():
    env = _sky_ground_env()
    pyr = ibl_ops.prefilter_environment(env, mips=4)
    assert [p.shape[:2] for p in pyr] == [(32, 64), (16, 32), (8, 16), (4, 8)]
    # Energy preserved by box filtering.
    np.testing.assert_allclose(pyr[0].mean(), pyr[-1].mean(), rtol=1e-5)


def test_sample_radiance_directions():
    env = _sky_ground_env()
    bundle = ibl_ops.build_environment(env, mips=3, irradiance_size=8,
                                       lut_size=32)
    up = ibl_ops.sample_radiance(
        bundle, jnp.asarray([[0.0, 1.0, 0.0]]), jnp.asarray([0.0])
    )
    down = ibl_ops.sample_radiance(
        bundle, jnp.asarray([[0.0, -1.0, 0.0]]), jnp.asarray([0.0])
    )
    assert float(up[0, 2]) > float(down[0, 2]), "sky is blue upward"


def test_ambient_ibl_metal_vs_dielectric():
    env = _sky_ground_env()
    bundle = ibl_ops.build_environment(env, mips=3, irradiance_size=8,
                                       lut_size=32)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    v = jnp.asarray([[0.0, 1.0, 0.0]])
    base = jnp.asarray([[1.0, 1.0, 1.0]])
    rough = jnp.asarray([0.2])
    metal = ibl_ops.ambient_ibl(bundle, n, v, base, jnp.asarray([1.0]), rough)
    dielec = ibl_ops.ambient_ibl(bundle, n, v, base, jnp.asarray([0.0]), rough)
    # Both positive; dielectric keeps a diffuse term, metal is all specular.
    assert float(metal.sum()) > 0 and float(dielec.sum()) > 0


def test_e2e_environment_lighting():
    from ash_tpu import Material, Mesh
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=32,
                       shadows_enabled=False),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(1, 1, 1, 1), metallic=0.9, roughness=0.15))
    cam = Camera.new([0, 2.0, 4.5], [0, 0, 0], 1.0)
    flat = np.asarray(
        r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                       cam.position).color
    )
    r.set_environment_map(_sky_ground_env())
    lit = np.asarray(
        r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                       cam.position).color
    )
    # The top face reflects the blue sky: blue channel dominates vs the flat
    # grey ambient.
    top = lit[18, 32]
    top_flat = flat[18, 32]
    assert top[2] > top[0], f"sky reflection is blue: {top}"
    assert abs(float(top[2]) - float(top_flat[2])) > 0.01, "IBL changed output"
    # Disabling restores the flat path.
    r.clear_environment_map()
    back = np.asarray(
        r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                       cam.position).color
    )
    np.testing.assert_allclose(back, flat, atol=1e-6)


def test_ggx_prefilter_spreads_impulse():
    """A single bright texel: the GGX convolution spreads its energy over
    the lobe, so the peak direction dims much more than a box mip does,
    and total (solid-angle-weighted) energy stays the same order."""
    import numpy as np
    from ash_tpu.ops.ibl import (
        prefilter_environment,
        prefilter_environment_ggx,
    )

    env = np.zeros((32, 64, 3), np.float32)
    env[16, 16] = 100.0  # impulse near the equator
    box = prefilter_environment(env, mips=4)
    ggx = prefilter_environment_ggx(env, mips=4, samples=128)
    assert len(ggx) == 4 and ggx[0].shape == env.shape
    # Roughest mip: GGX peak is far below the box peak (energy spread).
    assert ggx[3].max() < box[3].max() * 0.8, (ggx[3].max(), box[3].max())
    # And energy did not vanish.
    assert ggx[3].sum() > 0.01


def test_ggx_prefilter_mip0_identity():
    import numpy as np
    from ash_tpu.ops.ibl import prefilter_environment_ggx

    rng = np.random.default_rng(2)
    env = rng.random((16, 32, 3)).astype(np.float32)
    pyr = prefilter_environment_ggx(env, mips=3, samples=32)
    assert np.allclose(pyr[0], env), "mip 0 is the unfiltered environment"
