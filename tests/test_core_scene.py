"""Scene API tests: mesh geometry, materials, textures, uniforms."""

import numpy as np

from ash_tpu.core.material import Material, MaterialProperties
from ash_tpu.core.mesh import Mesh, MeshDescriptor, VertexArrays
from ash_tpu.core.texture import TextureData, max_mip_levels, mip_chain
from ash_tpu.core.uniform import MATERIAL_RECORD_SIZE, MaterialUniform, MvpMatrices


def test_cube_matches_reference_geometry():
    """mesh.rs:149-373: 24 vertices, 36 indices, per-face colors/tangents."""
    cube = Mesh.create_cube()
    assert cube.name == "Cube"
    assert len(cube.vertices) == 24
    assert cube.indices.shape == (36,)
    v = cube.vertices
    # First vertex: front face corner.
    np.testing.assert_allclose(v.position[0], [-1, -1, 1])
    np.testing.assert_allclose(v.normal[0], [0, 0, 1])
    np.testing.assert_allclose(v.color[0], [1, 0, 0])
    np.testing.assert_allclose(v.tangent[0], [1, 0, 0, 1])
    # Back face is green with flipped tangent (mesh.rs:186-213).
    np.testing.assert_allclose(v.color[4], [0, 1, 0])
    np.testing.assert_allclose(v.tangent[4], [-1, 0, 0, 1])
    # Right face tangent points -Z (mesh.rs:273-300).
    np.testing.assert_allclose(v.tangent[16], [0, 0, -1, 1])
    # Index pattern 0,1,2,2,3,0 per face (mesh.rs:332-339).
    np.testing.assert_array_equal(cube.indices[:6], [0, 1, 2, 2, 3, 0])
    np.testing.assert_array_equal(cube.indices[30:36], [20, 21, 22, 22, 23, 20])
    # All positions on the unit cube surface.
    assert np.abs(v.position).max() == 1.0
    c, e = cube.bounds()
    np.testing.assert_allclose(c, [0, 0, 0])
    np.testing.assert_allclose(e, [1, 1, 1])


def test_cube_winding_consistent_outward():
    """Every triangle's geometric normal must agree with the face normal
    (the reference renders with back-face culling, renderer.rs PBR pipeline)."""
    cube = Mesh.create_cube()
    tris = cube.triangle_indices
    p = cube.vertices.position
    n = cube.vertices.normal
    for t in tris:
        a, b, c = p[t[0]], p[t[1]], p[t[2]]
        geo = np.cross(b - a, c - a)
        assert np.dot(geo, n[t[0]]) > 0, f"triangle {t} winds inward"


def test_sphere_plane_construction():
    s = Mesh.create_sphere(segments=8, rings=4)
    assert len(s.vertices) == (4 + 1) * (8 + 1)
    r = np.linalg.norm(s.vertices.position, axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=1e-5)
    p = Mesh.create_plane(size=2.0)
    assert p.num_triangles == 2
    np.testing.assert_allclose(p.vertices.normal, [[0, 1, 0]] * 4)


def test_mesh_from_descriptor():
    cube = Mesh.create_cube()
    desc = MeshDescriptor(key="k", vertices=cube.vertices, indices=cube.indices)
    m = Mesh.from_descriptor(desc)
    assert m.name == "k" and len(m.vertices) == 24


def test_material_defaults_match_reference():
    """material.rs:15-27."""
    m = Material()
    assert m.color == (1.0, 1.0, 1.0, 1.0)
    assert m.roughness == 0.5 and m.metallic == 0.0
    assert m.occlusion_strength == 1.0 and m.normal_scale == 1.0
    m2 = Material.with_color("red", [1, 0, 0, 1])
    assert m2.color == (1.0, 0.0, 0.0, 1.0) and m2.roughness == 0.5


def test_material_properties_from_material():
    props = MaterialProperties.from_material(Material(metallic=0.9, roughness=0.1))
    assert props.metallic_factor == 0.9
    assert props.roughness_factor == 0.1


def test_texture_solid_and_mips():
    t = TextureData.white()
    assert t.pixels.shape == (1, 1, 4)
    lin = t.to_linear_f32()
    np.testing.assert_allclose(lin, 1.0, atol=1e-6)

    cb = TextureData.checkerboard(size=16, cell=4)
    mips = mip_chain(None, cb.to_linear_f32())
    assert len(mips) == max_mip_levels(16, 16) == 5
    assert mips[-1].shape == (1, 1, 4)
    # Mip mean preserved by box filtering.
    np.testing.assert_allclose(mips[0].mean(), mips[-1].mean(), atol=1e-5)


def test_srgb_roundtrip():
    from ash_tpu.core.texture import linear_to_srgb, srgb_to_linear

    x = np.linspace(0, 1, 64, dtype=np.float32)
    np.testing.assert_allclose(linear_to_srgb(srgb_to_linear(x)), x, atol=1e-5)


def test_mvp_matrices_compute():
    from ash_tpu.core import maths

    model = maths.mat4_scale(2.0)
    view = maths.look_at_rh([0, 0, 5], [0, 0, 0], [0, 1, 0])
    proj = maths.perspective_rh(np.deg2rad(45), 1.0, 0.5, 100.0)
    mvp = MvpMatrices.compute(
        model, view, proj,
        camera_pos=[0, 0, 5],
        light_direction=[-0.35, -1.0, -0.25],
        light_color=[1.5, 1.5, 1.5],
        ambient_color=[0.35, 0.35, 0.35],
    )
    np.testing.assert_allclose(mvp.view_proj, proj @ view, atol=1e-6)
    np.testing.assert_allclose(mvp.normal_matrix[0, 0], 0.5, atol=1e-6)
    assert mvp.camera_pos.shape == (4,)


def test_material_uniform_pack():
    u = MaterialUniform.default()
    row = u.pack()
    assert row.shape == (MATERIAL_RECORD_SIZE,)
    assert row[12] == -1.0  # base_color_index: no texture
    np.testing.assert_allclose(row[8:12], [0.0, 0.5, 1.0, 1.0])
