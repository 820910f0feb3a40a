"""Runtime infra tests: registry, deletion queue, pools, caches, frame graph.

Mirrors the reference's infra tests: DeletionQueue LIFO + threaded pushes
(deletion_queue.rs:116-188), ThreadSafeResourcePool hit/miss
(thread_safe_pool.rs), registry dependency rules (resource_registry.rs).
"""

import threading

import numpy as np
import pytest

from ash_tpu.render.deletion_queue import DeletionQueue
from ash_tpu.render.frame_graph import FrameGraph, PassDescription
from ash_tpu.render.pipeline_cache import PipelineCache
from ash_tpu.render.pools import (
    BufferPool,
    OptimizedBufferPool,
    ThreadSafeResourcePool,
)
from ash_tpu.render.resource_registry import (
    RegistryError,
    ResourceRegistry,
    ResourceType,
)
from ash_tpu.render.safe_resource import SafeResource


# ---------------------------------------------------------- deletion queue


def test_deletion_queue_lifo_order():
    """deletion_queue.rs LIFO contract."""
    order = []
    q = DeletionQueue()
    for i in range(5):
        q.push(lambda i=i: order.append(i))
    assert q.flush() == 5
    assert order == [4, 3, 2, 1, 0]
    assert len(q) == 0


def test_deletion_queue_threaded_push():
    """deletion_queue.rs:116-188: 10 threads push concurrently."""
    q = DeletionQueue()
    done = []

    def worker(i):
        for j in range(20):
            q.push(lambda: done.append(1))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert q.flush() == 200
    assert len(done) == 200


def test_deletion_queue_error_tolerant():
    q = DeletionQueue()
    ran = []
    q.push(lambda: ran.append(1))
    q.push(lambda: 1 / 0)
    assert q.flush() == 2
    assert ran == [1]


# ---------------------------------------------------------- registry


def test_registry_dependency_cleanup_order():
    reg = ResourceRegistry()
    order = []
    rp = reg.register_render_pass("rp", destroy=lambda: order.append("rp"))
    fb = reg.register_framebuffer(
        "fb", destroy=lambda: order.append("fb"), deps=[rp]
    )
    assert reg.cleanup() == 2
    assert order == ["fb", "rp"], "dependents destroyed first"
    assert reg.cleanup() == 0  # idempotent


def test_registry_remove_guard():
    reg = ResourceRegistry()
    rp = reg.register_render_pass("rp")
    reg.register_framebuffer("fb", deps=[rp])
    with pytest.raises(RegistryError):
        reg.remove(rp)
    assert len(reg) == 2
    reg.remove(rp, force=True)
    assert len(reg) == 1


def test_registry_unknown_dependency():
    import uuid

    reg = ResourceRegistry()
    with pytest.raises(RegistryError):
        reg.register(ResourceType.PIPELINE, "p", deps := None, [uuid.uuid4()])


def test_registry_poison_tolerant():
    reg = ResourceRegistry()
    ran = []
    reg.register_pipeline("bad", destroy=lambda: 1 / 0)
    reg.register_pipeline("good", destroy=lambda: ran.append(1))
    assert reg.cleanup() == 2
    assert ran == [1]


# ---------------------------------------------------------- pools


def test_buffer_pool_first_fit_and_stats():
    pool = BufferPool()
    a = pool.acquire(100)
    b = pool.acquire(500)
    assert pool.stats() == (0, 2, 600)
    pool.release(a)
    assert pool.stats() == (1, 1, 600)
    # 50-byte request reuses the released 100-byte buffer.
    c = pool.acquire(50)
    assert c is a
    assert pool.stats() == (0, 2, 600)


def test_optimized_pool_size_classes():
    assert OptimizedBufferPool.size_class(1) == 256
    assert OptimizedBufferPool.size_class(256) == 256
    assert OptimizedBufferPool.size_class(257) == 512
    assert OptimizedBufferPool.size_class(64 * 2**20) == 64 * 2**20
    with pytest.raises(ValueError):
        OptimizedBufferPool.size_class(65 * 2**20)

    pool = OptimizedBufferPool()
    x = pool.acquire(300)
    assert x.size == 512
    pool.release(x)
    y = pool.acquire(400)
    assert y is x, "same class reused"
    st = pool.stats[512]
    assert st.allocations == 1 and st.reuses == 1


def test_thread_safe_pool_hit_miss_and_guard():
    made = []
    pool = ThreadSafeResourcePool(lambda: made.append(1) or object())
    with pool.acquire() as r1:
        pass  # auto-returned
    with pool.acquire() as r2:
        assert r2 is r1, "returned resource reused"
    assert pool.stats.misses == 1 and pool.stats.hits == 1
    assert pool.stats.hit_rate == 0.5


# ---------------------------------------------------------- caches / graph


def test_live_program_registry_bounded(monkeypatch):
    """The frame-program registry is a global LRU: compiled programs own
    LLVM JIT code mappings on CPU (vm.max_map_count is a hard per-process
    cap), so live jits must be bounded and clearable. Fetches are lazy
    (jax.jit traces on first call), so this exercises the registry
    without compiling anything."""
    import dataclasses as dc

    from ash_tpu.render import frame as fr

    monkeypatch.setattr(fr, "_MAX_LIVE_PROGRAMS", 8)
    base = fr.FrameConfig(width=32, height=32)
    cfgs = [dc.replace(base, width=32 + 8 * i) for i in range(12)]
    jits = [fr.compiled_frame(c) for c in cfgs]
    with fr._live_programs_lock:
        n_frame = sum(1 for k in fr._live_programs
                      if k[0].startswith("compiled_frame"))
    assert n_frame <= 8
    # Most recent config: same object back (no retrace in the frame loop).
    assert fr.compiled_frame(cfgs[-1]) is jits[-1]
    # Oldest config was evicted: fetch rebuilds (a fresh wrapper).
    assert fr.compiled_frame(cfgs[0]) is not jits[0]
    # clear_program_caches drops everything.
    fr.clear_program_caches()
    with fr._live_programs_lock:
        assert not fr._live_programs


def test_pipeline_cache_hit_miss_merge():
    c = PipelineCache()
    v1 = c.get_or_build("a", lambda: 1)
    v2 = c.get_or_build("a", lambda: 2)
    assert v1 == v2 == 1
    assert c.stats.hits == 1 and c.stats.misses == 1
    other = PipelineCache()
    other.get_or_build("b", lambda: 3)
    c.merge(other)
    assert len(c) == 2


def test_frame_graph_execute():
    g = FrameGraph()
    g.add_pass(PassDescription(
        name="double", run=lambda ins: {"y": ins["x"] * 2}, reads=["x"],
        writes=["y"],
    ))
    g.add_pass(PassDescription(
        name="inc", run=lambda ins: {"z": ins["y"] + 1}, reads=["y"],
        writes=["z"],
    ))
    out = g.execute({"x": 10})
    assert out["z"] == 21
    g.get("inc").enabled = False
    out = g.execute({"x": 1})
    assert "z" not in out or out["z"] == 21  # pass skipped
    with pytest.raises(ValueError):
        g.add_pass(PassDescription(name="double", run=lambda i: {}))


def test_frame_graph_missing_input():
    g = FrameGraph()
    g.add_pass(PassDescription(name="p", run=lambda i: {}, reads=["nope"]))
    with pytest.raises(KeyError):
        g.execute({})


def test_safe_resource():
    cleaned = []
    with SafeResource(42, lambda v: cleaned.append(v)) as v:
        assert v == 42
    assert cleaned == [42]
    r = SafeResource("x", cleaned.append)
    assert r.release() == "x"
    r.close()
    assert cleaned == [42]  # cleanup skipped after release
