"""High-level renderer: Renderer, surfaces, scene packing, frame programs."""

from .frame import FrameConfig, FrameOutputs, FrameUniforms
from .renderer import RenderCommand, Renderer, RendererConfig
from .scene import DrawItem, SceneBuffers, build_scene
from .surface import HeadlessSurface, SurfaceProvider

__all__ = [
    "FrameConfig",
    "FrameOutputs",
    "FrameUniforms",
    "RenderCommand",
    "Renderer",
    "RendererConfig",
    "DrawItem",
    "SceneBuffers",
    "build_scene",
    "HeadlessSurface",
    "SurfaceProvider",
]
