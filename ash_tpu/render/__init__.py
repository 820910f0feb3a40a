"""High-level renderer: Renderer, surfaces, scene packing, frame programs."""

from .csm import CascadedShadowMap, CsmConfig
from .frame import FrameConfig, FrameOutputs, FrameUniforms
from .renderer import MsaaPreset, RenderCommand, Renderer, RendererConfig
from .scene import DrawItem, SceneBuffers, build_scene
from .shadow_map import ShadowConfig
from .live_view import LiveViewSurface
from .surface import FileStreamSurface, HeadlessSurface, SurfaceProvider
from .terminal_surface import TerminalSurface
from .temporal_aa import TaaConfig, TemporalAA

__all__ = [
    "CascadedShadowMap",
    "CsmConfig",
    "FrameConfig",
    "FrameOutputs",
    "FrameUniforms",
    "MsaaPreset",
    "RenderCommand",
    "Renderer",
    "RendererConfig",
    "DrawItem",
    "SceneBuffers",
    "build_scene",
    "ShadowConfig",
    "FileStreamSurface",
    "HeadlessSurface",
    "LiveViewSurface",
    "TerminalSurface",
    "SurfaceProvider",
    "TaaConfig",
    "TemporalAA",
]
