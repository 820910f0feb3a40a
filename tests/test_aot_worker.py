"""Out-of-process AOT compile worker (tiered mode's background compiles).

On the tunneled TPU plugin an in-process compile RPC permanently degrades
pipelined dispatch, so _start_full_compiles primes the persistent compile
cache via an aot_worker subprocess first. These tests force that path on
CPU (ASH_FORCE_AOT_SUBPROCESS) and check the whole chain: argspec
pickling, worker compile, cache hand-off, and tiered promotion landing.
"""

import os

import numpy as np
import pytest

from ash_tpu import Material, Mesh
from ash_tpu.core.transform import Camera
from ash_tpu.render import HeadlessSurface, Renderer, RendererConfig


@pytest.fixture
def cache_dir(tmp_path):
    from ash_tpu.render.pipeline_cache import PipelineCache

    d = str(tmp_path / "jitcache")
    os.makedirs(d, exist_ok=True)
    yield d
    # enable_persistence set process-global state: restore so later tests
    # don't persist into the stale tmp dir. Resetting only the config var
    # is insufficient — jax keeps a module-global cache object alive, so
    # every later compile in the suite still serialized executables into
    # this dir, and executable.serialize() racing concurrent compiles in
    # the tiered background threads SIGSEGVed the full suite (observed
    # r4: crash in put_executable_and_time at test ~313/343).
    PipelineCache.disable_persistence()


def test_aot_worker_subprocess_populates_cache(cache_dir, monkeypatch,
                                               capfd):
    monkeypatch.setenv("ASH_FORCE_AOT_SUBPROCESS", "1")
    surface = HeadlessSurface(96, 64)
    r = Renderer(
        surface,
        RendererConfig(
            tile_h=8, tile_w=32, max_tris_per_tile=32,
            shadow_resolution=64, shadow_tile=32,
            shadow_max_tris_per_tile=32,
            compilation_cache_dir=cache_dir,
        ),
    )
    r.set_mesh(Mesh.create_cube())
    r.set_material(Material(color=(0.9, 0.4, 0.2, 1.0)))
    r.initialize_hdr()  # post-enabled -> tiered background compiles
    cam = Camera.new([0, 1.5, 4], [0, 0, 0], 96 / 64)
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    assert r.wait_pipeline_optimization(timeout=600), (
        "background compile did not finish"
    )
    states = {ent["state"] for ent in r._fused_bg.values()}
    assert states == {"ready"}, states
    err = capfd.readouterr().err
    assert "aot_worker subprocess failed" not in err
    assert "aot_worker launch failed" not in err
    # The worker populated the shared persistent cache.
    entries = []
    for root, _dirs, files in os.walk(cache_dir):
        entries += [os.path.join(root, f) for f in files]
    assert entries, "persistent compile cache is empty"
    # The promoted pipeline serves frames.
    out = r.render_frame(cam.view_matrix(), cam.projection_matrix(),
                         cam.position)
    assert np.asarray(out.image).max() > 0


def test_prime_skipped_without_cache_dir(monkeypatch, capfd):
    """No persistent cache configured -> the worker cannot hand anything
    over, so priming must silently no-op (in-process compile still runs)."""
    import jax

    monkeypatch.setenv("ASH_FORCE_AOT_SUBPROCESS", "1")
    assert not jax.config.jax_compilation_cache_dir
    surface = HeadlessSurface(64, 48)
    r = Renderer(
        surface,
        RendererConfig(
            tile_h=8, tile_w=32, max_tris_per_tile=32,
            shadow_resolution=64, shadow_tile=32,
            shadow_max_tris_per_tile=32,
        ),
    )
    r.set_mesh(Mesh.create_cube())
    r.initialize_hdr()
    cam = Camera.new([0, 1.5, 4], [0, 0, 0], 64 / 48)
    r.render_frame(cam.view_matrix(), cam.projection_matrix(), cam.position)
    assert r.wait_pipeline_optimization(timeout=600)
    err = capfd.readouterr().err
    assert "aot_worker" not in err
