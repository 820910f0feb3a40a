"""Out-of-process AOT compile worker for the tiered pipeline.

Why a subprocess: on the axon-tunneled TPU plugin, a long compile RPC
issued from the frame-loop process flips the plugin out of pipelined
dispatch for the REST OF THE PROCESS (~3x steady-state, measured — see
PERF_BUDGET.json comment / ROADMAP "tunnel dispatch pathology"). The
tiered pipeline's background full-effort compiles are exactly such RPCs,
so they run here instead: this worker connects to the backend on its OWN
plugin instance, compiles the requested frame programs from
shape/dtype specs (no real buffers cross the process boundary), and
populates the SHARED persistent compilation cache. The parent then
`lower().compile()`s the same programs as cache hits — a local
deserialize, not a compile RPC — keeping its dispatch pipelined.

The reference's counterpart is threaded pipeline creation at startup
(one vkCreateGraphicsPipelines per pipeline, renderer.rs:593-676); a
driver-level analog of this split is a shader-cache daemon priming the
pipeline cache that the app then loads.

Job file (pickle): {
    "cache_dir": str,          # shared jax persistent compile cache
    "config": FrameConfig,
    "cold_effort": float|None, # also compile full-effort band+finalize
    "argspecs": 10-tuple of ShapeDtypeStruct pytrees (the frame args),
}
Exit 0 = every requested program compiled (cache now warm).
"""

from __future__ import annotations

import pickle
import sys


def main(path: str) -> int:
    with open(path, "rb") as f:
        job = pickle.load(f)

    import jax

    # Pin the PARENT's platform before any backend init: the ambient
    # environment (sitecustomize) may force a remote plugin whose config
    # overrides JAX_PLATFORMS — a CPU-parent worker would otherwise hang
    # trying to reach a TPU tunnel that the parent never used.
    if job.get("platforms"):
        jax.config.update("jax_platforms", job["platforms"])
    jax.config.update("jax_compilation_cache_dir", job["cache_dir"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from .frame import (
        compiled_band_packed,
        compiled_finalize_packed,
        compiled_frame_packed,
    )

    config = job["config"]
    (scene, consts, models, prev_models, pool, history, lights,
     prev_depth, ibl, ext_shadow) = job["argspecs"]

    lowered = []
    if job["cold_effort"] is not None:
        band_low = compiled_band_packed(config).lower(
            scene, consts, models, prev_models, pool, lights, prev_depth,
            ibl, ext_shadow
        )
        lowered.append(band_low)
        lowered.append(compiled_finalize_packed(config).lower(
            jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                band_low.out_info,
            ),
            consts, history,
        ))
    lowered.append(compiled_frame_packed(config).lower(
        scene, consts, models, prev_models, pool, history, lights,
        prev_depth, ibl, ext_shadow,
    ))

    import threading

    errs = []

    def compile_one(low):
        try:
            low.compile()
        except Exception as e:  # noqa: BLE001 — reported via exit code
            errs.append(e)

    threads = [
        threading.Thread(target=compile_one, args=(low,)) for low in lowered
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        print(f"aot_worker: compile failed: {errs[0]!r}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
