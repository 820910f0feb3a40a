"""bf16 shading experiment (ROADMAP item 3, VERDICT r2 item 10).

`RendererConfig.shade_dtype="bf16"` runs the shade pass's BRDF/light-loop
arithmetic in bfloat16 (ops/shade.py): material factors, TBN, GGX/Smith/
Schlick, per-light accumulation. Positions, shadow lookups, attenuation
distances and the final composite stay f32. These tests pin the quality
bound: the bf16 image must stay within a PSNR budget of the f32 render on
a full-feature scene (textures + normal map + shadow + Forward+ lights),
so the flag can be offered as a perf knob without a visual-parity
asterisk. On-chip fps for both dtypes is recorded in ROADMAP.md.
"""

import numpy as np

from ash_tpu import Material, Mesh, TextureData
from ash_tpu.core.transform import Camera
from ash_tpu.render import (
    HeadlessSurface,
    RenderCommand,
    Renderer,
    RendererConfig,
)
from ash_tpu.utils.image import psnr


def _render(shade_dtype: str) -> np.ndarray:
    surface = HeadlessSurface(192, 128)
    r = Renderer(
        surface,
        RendererConfig(
            tile_h=8, tile_w=64, max_tris_per_tile=64,
            shadow_resolution=256, shadow_tile=64,
            shadow_max_tris_per_tile=64, use_pallas=False,
            shade_dtype=shade_dtype,
        ),
    )
    r.register_mesh_handle(0, Mesh.create_cube())
    sphere = Mesh.create_sphere("ball", segments=24, rings=12)
    sphere.texture_data = TextureData.checkerboard(size=64, cell=8)
    r.register_mesh_handle(1, sphere)
    rng = np.random.default_rng(11)
    cmds = []
    for i in range(9):
        y, x = divmod(i, 3)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] *= 0.6
        m[:3, 3] = [(x - 1) * 2.0, (y - 1) * 2.0, 0.0]
        r.register_material_handle(i + 1, Material(
            color=(*(0.3 + 0.7 * rng.random(3)), 1.0),
            metallic=float(rng.random()),
            roughness=float(0.2 + 0.8 * rng.random()),
        ))
        cmds.append(RenderCommand(mesh=i % 2, transform=m, material=i + 1))
    r.submit_render_commands(cmds)
    r.shadow_feature.set_scene_bounds([0, 0, 0], 6.0)
    r.add_point_light([0, 3, 3], color=(1, 0.9, 0.7), intensity=5, radius=14)
    r.add_spot_light([-3, 2, 2], direction=[1, -0.5, -0.5],
                     color=(0.4, 0.6, 1.0), intensity=6, radius=15,
                     inner_cone_angle=0.3, outer_cone_angle=0.6)
    cam = Camera.new([4.0, 3.0, 5.0], [0, 0, 0], 192 / 128)
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    return surface.read_back()


def test_bf16_shading_matches_f32():
    f32 = _render("f32").astype(np.float32)
    bf16 = _render("bf16").astype(np.float32)
    value = psnr(f32, bf16, peak=255.0)
    # bf16's 8-bit mantissa bounds per-op error at ~2^-9 of magnitude; on
    # LDR output that lands well above 40 dB. A regression below this bar
    # means f32-critical math (positions, attenuation) leaked into bf16.
    assert value >= 40.0, f"bf16 vs f32 PSNR {value:.1f} dB < 40 dB"
    # And it must actually differ (the flag is wired, not ignored).
    assert not np.array_equal(f32, bf16), "bf16 path identical to f32"
