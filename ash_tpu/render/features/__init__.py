"""Render feature plugin system.

Port of the reference's RenderFeature trait + FeatureManager
(src/renderer/features/feature_trait.rs:25-98): features hook into the frame
at on_added / before_frame / render / on_removed, are stored by type, and run
in insertion order. On TPU "render" hooks contribute configuration to the
frame program rather than recording commands.
"""

from .feature_trait import FeatureFrameContext, FeatureManager, RenderFeature
from .auto_rotate import AutoRotateFeature
from .shadows import ShadowFeature
from .lighting import (
    DirectionalLight,
    LightingConfig,
    LightingFeature,
    PointLight,
)
from .bloom import BloomConfig, BloomFeature
from .post_processing import PostProcessingConfig, PostProcessingFeature
from .tonemapping import TonemapOperator, TonemappingConfig, TonemappingFeature
from .light_culling import (
    MAX_LIGHTS,
    MAX_LIGHTS_PER_TILE,
    TILE_SIZE,
    GpuLight,
    LightCullingConfig,
    LightCullingPass,
)

__all__ = [
    "FeatureFrameContext",
    "FeatureManager",
    "RenderFeature",
    "AutoRotateFeature",
    "ShadowFeature",
    "DirectionalLight",
    "PointLight",
    "LightingConfig",
    "LightingFeature",
    "BloomConfig",
    "BloomFeature",
    "PostProcessingConfig",
    "PostProcessingFeature",
    "TonemapOperator",
    "TonemappingConfig",
    "TonemappingFeature",
    "MAX_LIGHTS",
    "MAX_LIGHTS_PER_TILE",
    "TILE_SIZE",
    "GpuLight",
    "LightCullingConfig",
    "LightCullingPass",
]
