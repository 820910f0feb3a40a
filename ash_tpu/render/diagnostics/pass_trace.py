"""True per-pass attribution of the FUSED frame program (VERDICT r2 item 4).

The legacy pass_profiler times each stage in its own fenced program and
must normalize away a ~3-4x harness bias (stage programs lose cross-stage
fusion). This module instead runs the PRODUCTION executable under
`jax.profiler.trace` and buckets the chip's own per-op timeline by the
`pass_*` named scopes baked into frame.py — real device nanoseconds of the
exact program users run, summing (up to "other" residue: ops XLA hoisted
across scope boundaries, copies, infeed) to the independently measured
frame time. The TPU counterpart of the reference's in-frame timestamp
scopes (gpu_profiler.rs:229-275) — and richer: each op also carries static
`flops`/`bytes_accessed`, so every pass gets roofline numbers for free.

Readback-pathology note (ROADMAP "tunnel dispatch pathology"): collecting
the profile downloads trace buffers from the plugin, which can drop the
process out of pipelined dispatch — so profile AFTER all wall-clock
timing, or in a subprocess (bench.py does the former). The per-op device
durations themselves are measured by the chip and are valid either way.
"""

from __future__ import annotations

import glob
import os
import tempfile
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from .xplane import parse_planes


@dataclass
class PassCost:
    ms: float = 0.0  # device ms per frame
    gflop: float = 0.0  # compute per frame
    gbyte: float = 0.0  # HBM traffic per frame
    ops: int = 0  # fused-op executions per frame


@dataclass
class PassProfile:
    """Per-pass device cost of one traced program, per execution."""

    module_name: str
    executions: int
    total_ms: float  # from the XLA Modules line (ground truth)
    passes: Dict[str, PassCost] = field(default_factory=dict)

    def scaled_rows(self, frame_ms: float):
        """Per-pass (name, ms, fraction) scaled so the rows sum to the
        independently measured `frame_ms`.

        Why scale at all: on the axon-tunneled chip the plugin's device
        timeline uses a clock whose ps conversion is off by a large
        constant (measured ~600x: a 0.89 ms wall frame reports ~532 ms of
        "device time", while the traced loop itself runs at 1.4 ms/frame —
        so the absolute ps are impossible, but per-op proportions come
        from real chip counters and are self-consistent: bucket sums match
        the module total to <1%). Scaling the trustworthy fractions by the
        wall-measured frame time gives true per-pass ms of the production
        executable. On a directly attached TPU the scale is ~1 and this is
        a no-op correction."""
        total = sum(c.ms for c in self.passes.values())
        if total <= 0:
            return []
        rows = sorted(self.passes.items(), key=lambda kv: -kv[1].ms)
        return [
            (name, frame_ms * c.ms / total, c.ms / total) for name, c in rows
        ]

    def table(self) -> str:
        rows = sorted(self.passes.items(), key=lambda kv: -kv[1].ms)
        out = [
            f"{self.module_name}: {self.total_ms:.3f} ms/frame device time"
            f" ({self.executions} executions traced)"
        ]
        acc = sum(c.ms for c in self.passes.values())
        for name, c in rows:
            # gbyte is XLA's per-op operand+result bytes (fusion-level), an
            # upper bound on HBM traffic, not achieved bandwidth.
            out.append(
                f"  {name:<16} {c.ms:7.3f} ms  {100 * c.ms / max(self.total_ms, 1e-9):5.1f}%"
                f"  {c.gflop:8.2f} Gflop  {c.gbyte:7.3f} GB(op)"
            )
        out.append(f"  {'(sum)':<16} {acc:7.3f} ms")
        return "\n".join(out)


def _bucket(tf_op: Optional[object]) -> str:
    if not isinstance(tf_op, str):
        return "other"
    for seg in tf_op.split("/"):
        if seg.startswith("pass_"):
            return seg
    return "other"


def profile_passes(
    run_frame: Callable[[], None],
    iters: int = 20,
    warmup: int = 3,
    log_dir: Optional[str] = None,
) -> List[PassProfile]:
    """Trace `run_frame` (which must block on its result) `iters` times and
    return one PassProfile per XLA module seen on the device timeline,
    largest first."""
    import jax

    for _ in range(warmup):
        run_frame()
    if log_dir is None:
        log_dir = tempfile.mkdtemp(prefix="ash_pass_trace_")
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            run_frame()
    pbs = sorted(
        glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not pbs:
        raise RuntimeError(f"no xplane.pb produced under {log_dir}")
    return profiles_from_xplane(pbs[-1])


def calibration_program(size: int = 1024, loops: int = 16):
    """Fixed-work calibration kernel for the device-time perf guard.

    A chained f32 matmul loop (`loops` x `size`^2 @ `size`^2) whose
    device time is a hardware constant. Guarding the RATIO
    frame_device_ms / calib_device_ms from one trace session is immune
    to BOTH tunnel dispatch noise (wall fps swings 2-4x with time of
    day, PERF_BUDGET comment) and the tunnel trace clock's bogus
    absolute scale (~600x off, see PassProfile.scaled_rows — both
    programs share the clock, so the scale cancels). Returns
    (jitted_fn, input_array); the module traces under a name containing
    "ash_guard_calib".

    Each iteration is tanh(a @ x + eps*i): a PURE `a = a @ x` chain
    measured ~0 device time on the TPU backend (r5: wall flat at
    ~0.03 ms from 16 to 4096 loops AND the device timeline showed the
    module at ~1/2500 of a frame — XLA collapses the chained power);
    the per-iteration nonlinearity + index term leave it nothing to
    collapse, and tanh keeps the values bounded so no inf/NaN fast
    paths kick in."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def ash_guard_calib(x):
        def body(i, a):
            return jnp.tanh(a @ x + jnp.float32(1e-6) * i)

        return jax.lax.fori_loop(0, loops, body, x)

    return ash_guard_calib, jnp.full((size, size), 1e-3, jnp.float32)


def device_frame_ratio(
    run_frame: Callable[[], None],
    iters: int = 12,
    warmup: int = 2,
    calib=None,
):
    """Measure frame-device-time / calibration-device-time in ONE trace
    session. Returns (ratio, frame_ms_trace_units, calib_ms_trace_units,
    profiles); ratio is None if the trace lacked either side (profiles
    are still returned so callers can report per-pass rows). The frame
    side sums every non-calibration module (split pipelines run shadow +
    band + finalize as separate executables)."""
    fn, x = calib if calib is not None else calibration_program()
    fn(x).block_until_ready()  # compile + warm outside the trace

    def run_both():
        run_frame()
        fn(x).block_until_ready()

    profs = profile_passes(run_both, iters=iters, warmup=warmup)
    calib_ms = sum(
        p.total_ms for p in profs if "ash_guard_calib" in p.module_name
    )
    frame_ms = sum(
        p.total_ms * (p.executions / max(iters, 1))
        for p in profs
        if "ash_guard_calib" not in p.module_name
    )
    ratio = (
        frame_ms / calib_ms if calib_ms > 0 and frame_ms > 0 else None
    )
    return ratio, frame_ms, calib_ms, profs


def frame_totals(profs: List[PassProfile], iters: int):
    """Per-FRAME (device_ms_trace_units, gflop, gbyte) summed over every
    non-calibration module, weighted by executions/iters — split pipelines
    run several executables per frame, and the shadow program may execute
    less than once per frame when the renderer's shadow cache hits.

    The ms are in the trace clock's units (bogus absolute scale on the
    tunnel, see PassProfile.scaled_rows); gflop/gbyte come from XLA's
    static per-op cost analysis (flops / bytes_accessed stats) and are
    true per-execution values — bytes are fusion-level operand+result
    traffic, an upper bound on achieved HBM bytes."""
    ms = gf = gb = 0.0
    for p in profs:
        if "ash_guard_calib" in p.module_name:
            continue
        w = p.executions / max(iters, 1)
        ms += p.total_ms * w
        gf += sum(c.gflop for c in p.passes.values()) * w
        gb += sum(c.gbyte for c in p.passes.values()) * w
    return ms, gf, gb


def profiles_from_xplane(path: str) -> List[PassProfile]:
    planes = parse_planes(path)
    out: List[PassProfile] = []
    for plane in planes:
        if not plane.name.startswith("/device:"):
            continue
        # XLA Modules line: per-execution whole-program device durations,
        # metadata name "<module_name>(<program_id>)". Key by program_id:
        # distinct programs can share a module name (e.g. two different
        # "jit__unknown" traces), and keying by name would merge their
        # durations and mis-attribute totals.
        mods: Dict[str, List[int]] = {}
        prog_name: Dict[str, str] = {}
        for line in plane.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                md = plane.event_metadata.get(ev.metadata_id)
                if md is None:
                    continue
                name = md.name.split("(")[0]
                if "(" in md.name and md.name.endswith(")"):
                    pid = md.name[:-1].split("(", 1)[1]
                else:
                    pid = name
                mods.setdefault(pid, []).append(ev.duration_ps)
                prog_name[pid] = name
        # XLA Ops line: per-execution fused-op durations; bucket by the
        # pass_* segment of the op's jax name-stack path (tf_op).
        agg: Dict[str, Dict[str, PassCost]] = {}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata.get(ev.metadata_id)
                if md is None:
                    continue
                pid = md.stats.get("program_id")
                bucket = _bucket(md.stats.get("tf_op"))
                cost = agg.setdefault(str(pid), {}).setdefault(
                    bucket, PassCost()
                )
                cost.ms += ev.duration_ps / 1e9
                cost.gflop += float(md.stats.get("flops") or 0) / 1e9
                cost.gbyte += float(md.stats.get("bytes_accessed") or 0) / 1e9
                cost.ops += 1
        for pid, passes in agg.items():
            name = prog_name.get(pid, f"program_{pid}")
            durs = mods.get(pid, [])
            n = max(len(durs), 1)
            for c in passes.values():
                c.ms /= n
                c.gflop /= n
                c.gbyte /= n
                c.ops = c.ops // n
            out.append(
                PassProfile(
                    module_name=name,
                    executions=len(durs),
                    total_ms=sum(durs) / 1e9 / n,
                    passes=passes,
                )
            )
    out.sort(key=lambda p: -p.total_ms * p.executions)
    return out
