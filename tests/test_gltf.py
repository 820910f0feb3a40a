"""GLB loader tests: container parsing, accessors, materials, textures,
end-to-end textured render (the 03_model_loading config)."""

import io
import json
import struct

import numpy as np
import pytest

from ash_tpu.core import gltf
from ash_tpu.core.mesh import Mesh
from ash_tpu.errors import InvalidOperation


def _align4(b: bytes, pad=b"\x00") -> bytes:
    return b + pad * (-len(b) % 4)


def build_quad_glb(with_texture=True) -> bytes:
    """Minimal GLB: a textured unit quad with a PBR material."""
    pos = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    nrm = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 2, 3, 0], np.uint16)

    if with_texture:
        from PIL import Image

        img = Image.new("RGBA", (8, 8), (255, 0, 0, 255))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        png = buf.getvalue()
    else:
        png = b""

    blobs = [pos.tobytes(), nrm.tobytes(), uv.tobytes(), idx.tobytes(), png]
    offsets, binary = [], b""
    for b in blobs:
        offsets.append(len(binary))
        binary = _align4(binary + b)

    buffer_views = [
        {"buffer": 0, "byteOffset": offsets[0], "byteLength": len(blobs[0])},
        {"buffer": 0, "byteOffset": offsets[1], "byteLength": len(blobs[1])},
        {"buffer": 0, "byteOffset": offsets[2], "byteLength": len(blobs[2])},
        {"buffer": 0, "byteOffset": offsets[3], "byteLength": len(blobs[3])},
    ]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
        {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
        {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
        {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
    ]
    material = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
            "metallicFactor": 0.2,
            "roughnessFactor": 0.7,
        },
        "emissiveFactor": [0.1, 0.0, 0.0],
    }
    doc = {
        "asset": {"version": "2.0"},
        "meshes": [{
            "name": "quad",
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
                "material": 0,
            }],
        }],
        "materials": [material],
        "buffers": [{"byteLength": len(binary)}],
        "bufferViews": buffer_views,
        "accessors": accessors,
    }
    if with_texture:
        doc["bufferViews"].append(
            {"buffer": 0, "byteOffset": offsets[4], "byteLength": len(blobs[4])}
        )
        doc["images"] = [{"bufferView": 4, "mimeType": "image/png"}]
        doc["samplers"] = [{}]
        doc["textures"] = [{"source": 0, "sampler": 0}]
        material["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}

    js = _align4(json.dumps(doc).encode(), b" ")
    out = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(binary))
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(binary), 0x004E4942) + binary
    return out


def test_parse_glb_container():
    data = build_quad_glb(with_texture=False)
    doc, binary = gltf.parse_glb(data)
    assert doc["asset"]["version"] == "2.0"
    assert len(binary) > 0


def test_bad_magic_rejected():
    with pytest.raises(InvalidOperation):
        gltf.parse_glb(b"NOPE" + b"\x00" * 20)


def test_load_glb_mesh_attributes():
    mesh = gltf.load_glb_mesh(build_quad_glb(with_texture=False))
    assert mesh.name == "quad"
    assert len(mesh.vertices) == 4
    np.testing.assert_array_equal(mesh.indices, [0, 1, 2, 2, 3, 0])
    np.testing.assert_allclose(mesh.vertices.normal, [[0, 0, 1]] * 4)
    # Missing COLOR_0 -> white; missing TANGENT -> zero xyz (safe fallback).
    np.testing.assert_allclose(mesh.vertices.color, 1.0)
    np.testing.assert_allclose(mesh.vertices.tangent[:, :3], 0.0)
    assert mesh.material_properties.metallic_factor == 0.2
    assert mesh.material_properties.roughness_factor == 0.7
    assert mesh.material_properties.emissive_factor[0] == 0.1


def test_load_glb_with_texture():
    mesh = gltf.load_glb_mesh(build_quad_glb(with_texture=True))
    assert mesh.texture_data is not None
    assert mesh.texture_data.width == 8
    assert mesh.texture_data.srgb
    # Red texture decoded.
    assert mesh.texture_data.pixels[0, 0, 0] == 255


def test_mesh_from_gltf_via_file(tmp_path):
    p = tmp_path / "quad.glb"
    p.write_bytes(build_quad_glb())
    mesh = Mesh.from_gltf(str(p))
    assert mesh.name == "quad"


def test_e2e_textured_gltf_render():
    """03_model_loading config: GLTF mesh + bindless texture table."""
    from ash_tpu.core.transform import Camera
    from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig

    mesh = gltf.load_glb_mesh(build_quad_glb(with_texture=True))
    surface = HeadlessSurface(64, 64)
    r = Renderer(
        surface,
        RendererConfig(tile_h=8, tile_w=32, max_tris_per_tile=16,
                       shadows_enabled=False),
    )
    r.set_mesh(mesh)
    cam = Camera.new([0, 0, 3], [0, 0, 0], 1.0)
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    img = surface.read_back()
    c = img[32, 32]
    # Red albedo texture under white-ish light -> red dominates.
    assert c[0] > 60 and c[0] > c[2] * 1.5, c
    # Bindless index was assigned.
    assert mesh.texture_index == 0
