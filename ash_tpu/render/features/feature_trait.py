"""RenderFeature base + FeatureManager (reference feature_trait.rs)."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Type

import numpy as np


@dataclasses.dataclass
class FeatureFrameContext:
    """Mutable per-frame context handed to before_frame hooks
    (reference FeatureFrameContext: transform + timing + flags)."""

    delta_time: float = 0.0
    elapsed: float = 0.0
    auto_rotate: bool = False
    transform: Optional[object] = None  # core.transform.Transform
    scene_center: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )
    scene_radius: float = 20.0


class RenderFeature:
    """Plugin hooks (reference feature_trait.rs:25-34)."""

    def name(self) -> str:
        return type(self).__name__

    def on_added(self, renderer) -> None:  # noqa: ARG002
        pass

    def before_frame(self, ctx: FeatureFrameContext) -> None:  # noqa: ARG002
        pass

    def render(self, ctx) -> None:  # noqa: ARG002
        pass

    def on_removed(self, renderer) -> None:  # noqa: ARG002
        pass


class FeatureManager:
    """Type-keyed store with insertion-ordered execution
    (reference feature_trait.rs:36-98)."""

    def __init__(self):
        self._features: Dict[Type[RenderFeature], RenderFeature] = {}
        self._order: List[Type[RenderFeature]] = []

    def add(self, feature: RenderFeature, renderer=None) -> None:
        key = type(feature)
        if key in self._features:
            self.remove(key, renderer)
        self._features[key] = feature
        self._order.append(key)
        feature.on_added(renderer)

    def get(self, key: Type[RenderFeature]) -> Optional[RenderFeature]:
        return self._features.get(key)

    def remove(self, key: Type[RenderFeature], renderer=None) -> bool:
        feat = self._features.pop(key, None)
        if feat is None:
            return False
        self._order.remove(key)
        feat.on_removed(renderer)
        return True

    def __len__(self) -> int:
        return len(self._features)

    def before_frame(self, ctx: FeatureFrameContext) -> None:
        for key in self._order:
            self._features[key].before_frame(ctx)

    def render(self, ctx) -> None:
        for key in self._order:
            self._features[key].render(ctx)
