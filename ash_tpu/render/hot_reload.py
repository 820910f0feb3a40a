"""Kernel hot reload — the dev-loop analog of shader hot reload.

The reference watches shader file mtimes and rebuilds the pipeline mid-loop
(src/vulkan/pipeline.rs:68-90 `detect_shader_changes` +
renderer.rs:1566-1585). Our "shaders" are the Python kernel modules under
ash_tpu/ops; this watcher polls their mtimes, reloads changed modules (then
the frame-program module, which closes over them) and clears the compiled
frame cache so the next render_frame re-traces with the new kernel code.

Enable with RendererConfig(watch_kernels=True) during kernel development.
"""

from __future__ import annotations

import importlib
import logging
import os
from typing import Dict, List

log = logging.getLogger("ash_tpu.hot_reload")

# Reload order matters: leaf kernel modules first, then the frame program.
_WATCHED_MODULES = [
    "ash_tpu.ops.geometry",
    "ash_tpu.ops.binning",
    "ash_tpu.ops.raster",
    "ash_tpu.ops.raster_pallas",
    "ash_tpu.ops.texture_sample",
    "ash_tpu.ops.shadow",
    "ash_tpu.ops.shade",
    "ash_tpu.ops.hiz",
    "ash_tpu.ops.light_cull",
    "ash_tpu.ops.occlusion",
    "ash_tpu.ops.bloom",
    "ash_tpu.ops.taa",
    "ash_tpu.ops.tonemap",
    "ash_tpu.render.frame",
]


class KernelWatcher:
    def __init__(self):
        self._mtimes: Dict[str, float] = {}
        self._prime()

    def _files(self) -> Dict[str, str]:
        import sys

        out = {}
        for name in _WATCHED_MODULES:
            mod = sys.modules.get(name)
            if mod is None:
                importlib.import_module(name)
                mod = sys.modules[name]
            out[name] = mod.__file__
        return out

    def _prime(self) -> None:
        for name, path in self._files().items():
            try:
                self._mtimes[name] = os.path.getmtime(path)
            except OSError:
                pass

    def detect_changes(self) -> List[str]:
        """Changed module names since the last poll
        (pipeline.rs:68-90 mtime check)."""
        changed = []
        for name, path in self._files().items():
            try:
                mtime = os.path.getmtime(path)
            except OSError:
                continue
            if mtime != self._mtimes.get(name):
                self._mtimes[name] = mtime
                changed.append(name)
        return changed

    def reload(self, changed: List[str]):
        """Reload changed kernels + the frame program; returns the fresh
        frame module (caller rebinds compiled_frame and clears its cache)."""
        import sys

        for name in _WATCHED_MODULES[:-1]:
            if name in changed:
                importlib.reload(sys.modules[name])
                log.info("hot-reloaded %s", name)
        frame_mod = importlib.reload(sys.modules[_WATCHED_MODULES[-1]])
        # No cache_clear needed: reload re-executes frame.py, so every
        # program factory is a FRESH wrapper with an empty lru cache. The
        # actual staleness handling is the caller's: the renderer rebinds
        # _compiled_frame and resets _split_warmed/_chunk_warmed/_fused_bg
        # so warm/tiered bookkeeping cannot reference pre-reload programs.
        return frame_mod
