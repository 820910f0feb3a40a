"""Shadow mapping feature (reference src/renderer/features/shadows.rs)."""

from __future__ import annotations

import numpy as np

from ..shadow_map import ShadowConfig, ShadowMapState
from .feature_trait import FeatureFrameContext, RenderFeature


class ShadowFeature(RenderFeature):
    """Owns the shadow map state + light direction.

    Defaults match shadows.rs:23-31: light dir normalize(-0.5, -1, -0.3),
    scene center origin, radius 20. before_frame refreshes the light matrix
    (shadows.rs:103-112).
    """

    def __init__(self, config: ShadowConfig | None = None):
        self.shadow_map = ShadowMapState(config)
        d = np.array([-0.5, -1.0, -0.3], np.float32)
        self.light_direction = d / np.linalg.norm(d)
        self.scene_center = np.zeros(3, np.float32)
        self.scene_radius = 20.0
        self._bounds_explicit = False

    @property
    def config(self) -> ShadowConfig:
        return self.shadow_map.config

    def set_light_direction(self, direction) -> None:
        d = np.asarray(direction, np.float32)
        self.light_direction = d / max(float(np.linalg.norm(d)), 1e-8)

    def set_scene_bounds(self, center, radius: float) -> None:
        self.scene_center = np.asarray(center, np.float32)
        self.scene_radius = float(radius)
        self._bounds_explicit = True

    @property
    def bounds_pinned(self) -> bool:
        """True once set_scene_bounds pinned the volume — auto_fit_bounds
        is a no-op from then on, so callers may skip computing the fit."""
        return self._bounds_explicit

    def auto_fit_bounds(self, center, radius: float) -> None:
        """Fit the light volume to the built scene unless the app pinned
        bounds via set_scene_bounds. The reference keeps a fixed r=20 volume
        (shadows.rs:23-31); auto-fitting instead keeps shadow-map texel
        density matched to the scene (a tiny mesh inside a huge volume
        lands every triangle in a few shadow tiles)."""
        if not self._bounds_explicit:
            self.scene_center = np.asarray(center, np.float32)
            self.scene_radius = max(float(radius), 1e-3)

    def light_space_matrix(self) -> np.ndarray:
        return self.shadow_map.light_space_matrix

    def before_frame(self, ctx: FeatureFrameContext) -> None:
        self.shadow_map.update_light_matrix(
            self.light_direction, self.scene_center, self.scene_radius
        )
