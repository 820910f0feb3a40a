"""Core scene API: math, transforms, meshes, materials, textures, uniforms."""

from . import maths
from .material import Material, MaterialDescriptor, MaterialProperties
from .mesh import Mesh, MeshDescriptor, VertexArrays
from .texture import TextureData
from .transform import MVP, Camera, Transform
from .uniform import MaterialUniform, MvpMatrices

__all__ = [
    "maths",
    "Material",
    "MaterialDescriptor",
    "MaterialProperties",
    "Mesh",
    "MeshDescriptor",
    "VertexArrays",
    "TextureData",
    "MVP",
    "Camera",
    "Transform",
    "MaterialUniform",
    "MvpMatrices",
]
