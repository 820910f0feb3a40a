"""Deferred-destroy queue (reference src/vulkan/deletion_queue.rs).

Thread-safe LIFO of cleanup closures, flushed explicitly (end of frame /
resize) or on drop with a warning (deletion_queue.rs:102-114). On TPU the
deferred objects are typically device arrays whose HBM should be released
after the async dispatch stream no longer references them.
"""

from __future__ import annotations

import logging
import threading
from typing import Callable, List

log = logging.getLogger("ash_tpu.deletion_queue")


class DeletionQueue:
    def __init__(self, name: str = "deletion_queue"):
        self.name = name
        self._items: List[Callable[[], None]] = []
        self._lock = threading.Lock()

    def push(self, fn: Callable[[], None]) -> None:
        with self._lock:
            self._items.append(fn)

    def push_array(self, array) -> None:
        """Defer releasing a device array's HBM."""
        self.push(array.delete)

    def __len__(self) -> int:
        return len(self._items)

    def flush(self) -> int:
        """Run all deferred deletions in LIFO order
        (deletion_queue.rs LIFO contract)."""
        with self._lock:
            items, self._items = self._items, []
        count = 0
        for fn in reversed(items):
            try:
                fn()
            except Exception as exc:
                log.warning("%s: deferred delete failed: %s", self.name, exc)
            count += 1
        return count

    def __del__(self):
        if self._items:
            log.warning(
                "%s dropped with %d pending deletions; flushing",
                self.name,
                len(self._items),
            )
            self.flush()
