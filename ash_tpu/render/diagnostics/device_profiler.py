"""Device (TPU) profiler — the GpuProfiler equivalent.

The reference uses double-buffered vkQueryPool timestamps with named scopes
and non-blocking readback of frame N-1 (gpu_profiler.rs:17-64, 229-275). On
TPU there are no device-side timestamp queries from Python; instead, scopes
time `block_until_ready` fences around the work they wrap. Because fencing
serializes the async dispatch stream (the same way timestamp queries perturb
GPU pipelining), sampling is throttled: scopes only measure every
`sample_interval` frames and otherwise report the cached last sample —
mirroring the reference's stale-cache fallback.

For deep kernel-level traces use `jax.profiler.trace` (exposed via
start_trace/stop_trace) — the TPU analog of RenderDoc/Nsight captures.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, Optional

# Named scopes (reference gpu_profiler.rs:25-64).
SCOPES = (
    "FrameStart",
    "ShadowEnd",
    "SceneEnd",
    "BloomThreshold",
    "BloomDownsample",
    "BloomUpsample",
    "PostProcessEnd",
    "UiEnd",
    "FrameEnd",
)


class ProfileScope:
    def __init__(self, profiler: "DeviceProfiler", name: str):
        self.profiler = profiler
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.profiler._sampling:
            import jax

            # Fence: attribute everything dispatched in this scope.
            jax.effects_barrier()
            self.profiler._samples[self.name] = (
                time.perf_counter() - self.t0
            ) * 1000.0
        return False


class DeviceProfiler:
    def __init__(self, sample_interval: int = 30, enabled: bool = False):
        self.enabled = enabled
        self.sample_interval = sample_interval
        self._frame = 0
        self._sampling = False
        self._samples: Dict[str, float] = {}
        self._trace_dir: Optional[str] = None

    def begin_frame(self) -> None:
        self._frame += 1
        self._sampling = (
            self.enabled and self._frame % self.sample_interval == 0
        )

    def scope(self, name: str) -> ProfileScope:
        return ProfileScope(self, name)

    @contextmanager
    def pass_scope(self, name: str, value):
        """Time a pass by blocking on its output array when sampling."""
        t0 = time.perf_counter()
        yield
        if self._sampling and value is not None:
            import jax

            jax.block_until_ready(value)
            self._samples[name] = (time.perf_counter() - t0) * 1000.0

    def timings_ms(self) -> Dict[str, float]:
        """Last known per-scope times (cached between samples, like the
        reference's previous-frame query readback)."""
        return dict(self._samples)

    # jax.profiler integration (deep traces).
    def start_trace(self, log_dir: str) -> None:
        import jax

        jax.profiler.start_trace(log_dir)
        self._trace_dir = log_dir

    def stop_trace(self) -> None:
        import jax

        jax.profiler.stop_trace()
        self._trace_dir = None
