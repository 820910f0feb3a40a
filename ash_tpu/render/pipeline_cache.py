"""Pipeline cache — jit-executable cache with stats + on-disk persistence.

TPU counterpart of reference src/renderer/pipeline_cache.rs (vkPipelineCache
wrapper with merge/get_data, pipeline_cache.rs:13-53). A "pipeline" here is a
compiled XLA executable keyed by FrameConfig; persistence uses JAX's
compilation cache directory, which serves the same warm-start purpose as
serializing vkPipelineCache blobs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Hashable


@dataclasses.dataclass
class PipelineCacheStats:
    hits: int = 0
    misses: int = 0

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0


class PipelineCache:
    def __init__(self, persist_dir: str | None = None):
        self._cache: Dict[Hashable, object] = {}
        self.stats = PipelineCacheStats()
        if persist_dir:
            self.enable_persistence(persist_dir)

    @staticmethod
    def enable_persistence(path: str) -> None:
        """Persist compiled executables across processes (the analog of
        vkPipelineCache get_data/from_data round-trips)."""
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    @staticmethod
    def disable_persistence() -> None:
        """Fully stop persistent-cache use for this process.

        Setting jax_compilation_cache_dir back to None is NOT enough:
        jax's compilation cache is a module global (_cache/_cache_used)
        that stays live once initialized, so every later compile keeps
        serializing executables into the old directory. That serialize
        (`executable.serialize()` inside put_executable_and_time) has
        been observed to SIGSEGV when it races concurrent
        backend_compile_and_load calls in other threads on the CPU
        backend — reset the module state as well."""
        import jax
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc,
        )

        jax.config.update("jax_compilation_cache_dir", None)
        _cc.reset_cache()

    def get_or_build(self, key: Hashable, build: Callable[[], object]):
        hit = key in self._cache
        if hit:
            self.stats.hits += 1
        else:
            self.stats.misses += 1
            self._cache[key] = build()
        return self._cache[key]

    def merge(self, other: "PipelineCache") -> None:
        """pipeline_cache.rs merge: absorb another cache's entries."""
        for k, v in other._cache.items():
            self._cache.setdefault(k, v)

    def __len__(self) -> int:
        return len(self._cache)

    def clear(self) -> None:
        self._cache.clear()
