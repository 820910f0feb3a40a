"""Forward+ light culling — host state
(reference src/renderer/features/light_culling.rs).

Constants match the reference: MAX_LIGHTS 1024, MAX_LIGHTS_PER_TILE 256,
TILE_SIZE 16 px (light_culling.rs:17-23). The GpuLight packing mirrors
light_culling.rs:28-63. The culling kernel itself is ops/light_cull.py — a
vectorized reduction over (tiles x lights) instead of the reference's
shared-memory atomic compute shader.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from .lighting import DirectionalLight, PointLight

MAX_LIGHTS = 1024
MAX_LIGHTS_PER_TILE = 256
TILE_SIZE = 16


@dataclasses.dataclass
class GpuLight:
    """Packed light record, 4 x vec4 (light_culling.rs:28-37)."""

    position: np.ndarray  # xyz + radius
    color: np.ndarray  # rgb + intensity
    direction: np.ndarray  # xyz + type (0 point, 1 spot, 2 directional)
    params: np.ndarray  # inner cone, outer cone, falloff, enabled

    @staticmethod
    def from_point_light(light: PointLight) -> "GpuLight":
        return GpuLight(
            position=np.array([*light.position, light.radius], np.float32),
            color=np.array([*light.color, light.intensity], np.float32),
            direction=np.zeros(4, np.float32),
            params=np.array([0.0, 0.0, 1.0, 1.0], np.float32),
        )

    @staticmethod
    def from_spot_light(light) -> "GpuLight":
        """Spot light: type 1, cone angles in params.xy."""
        d = np.asarray(light.direction, np.float32)
        d = d / max(float(np.linalg.norm(d)), 1e-8)
        return GpuLight(
            position=np.array([*light.position, light.radius], np.float32),
            color=np.array([*light.color, light.intensity], np.float32),
            direction=np.array([*d, 1.0], np.float32),
            params=np.array(
                [light.inner_cone_angle, light.outer_cone_angle, 1.0, 1.0],
                np.float32,
            ),
        )

    @staticmethod
    def from_directional_light(light: DirectionalLight) -> "GpuLight":
        return GpuLight(
            position=np.array([0, 0, 0, np.finfo(np.float32).max], np.float32),
            color=np.array([*light.color, light.intensity], np.float32),
            direction=np.array([*light.direction, 2.0], np.float32),
            params=np.array([0.0, 0.0, 1.0, 1.0], np.float32),
        )

    def flat(self) -> np.ndarray:
        return np.concatenate(
            [self.position, self.color, self.direction, self.params]
        ).astype(np.float32)


@dataclasses.dataclass
class LightCullingConfig:
    """light_culling.rs:100-115."""

    enabled: bool = True
    debug_tiles: bool = False


def tile_counts(width: int, height: int) -> Tuple[int, int]:
    """ceil(screen / TILE_SIZE) — light_culling.rs:190-203
    (1920x1080 -> 120x68)."""
    return (-(-width // TILE_SIZE), -(-height // TILE_SIZE))


def tile_buffer_len(width: int, height: int) -> int:
    """tiles * (MAX_LIGHTS_PER_TILE + 1) u32 slots
    (light_culling.rs:234-238)."""
    tx, ty = tile_counts(width, height)
    return tx * ty * (MAX_LIGHTS_PER_TILE + 1)


class LightCullingPass:
    """Host-side state for the Forward+ pass."""

    def __init__(self, config: LightCullingConfig | None = None):
        self.config = config or LightCullingConfig()
        self.lights: List[GpuLight] = []
        self.tiles_x = 0
        self.tiles_y = 0
        self.last_screen_size = (0, 0)

    def update_screen_size(self, width: int, height: int) -> None:
        self.tiles_x, self.tiles_y = tile_counts(width, height)
        self.last_screen_size = (width, height)

    def set_lights(self, lights: List[GpuLight]) -> None:
        if len(lights) > MAX_LIGHTS:
            raise ValueError(f"max {MAX_LIGHTS} lights")
        self.lights = list(lights)

    def packed_lights(self, pad_to: int | None = None) -> np.ndarray:
        """(L_pad, 16) float32 light table (disabled-light rows zeroed)."""
        n = len(self.lights)
        pad = pad_to if pad_to is not None else max(n, 1)
        out = np.zeros((pad, 16), np.float32)
        for i, l in enumerate(self.lights[:pad]):
            out[i] = l.flat()
        return out
