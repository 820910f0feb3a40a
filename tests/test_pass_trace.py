"""Per-pass device attribution (VERDICT r2 item 4).

tests/data/frame_trace.xplane.pb.gz is a real `jax.profiler.trace` capture
of the production frame program (plus its cached standalone shadow program)
running on the tunneled TPU chip — tools/pass_profile.py regenerates it.
These tests pin the hand-rolled XSpace wire parser (diagnostics/xplane.py)
and the pass aggregation (diagnostics/pass_trace.py) against that capture:
the same path bench.py's `--trace` mode runs on the chip.
"""

import gzip
import os

import pytest

from ash_tpu.render.diagnostics.pass_trace import profiles_from_xplane
from ash_tpu.render.diagnostics.xplane import parse_planes

FIXTURE = os.path.join(
    os.path.dirname(__file__), "data", "frame_trace.xplane.pb.gz"
)


@pytest.fixture(scope="module")
def xplane_path(tmp_path_factory):
    raw = gzip.open(FIXTURE, "rb").read()
    p = tmp_path_factory.mktemp("trace") / "frame.xplane.pb"
    p.write_bytes(raw)
    return str(p)


def test_parse_planes_finds_device_timeline(xplane_path):
    planes = parse_planes(xplane_path)
    assert planes, "no planes decoded"
    dev = [p for p in planes if p.name.startswith("/device:")]
    assert dev, f"no device plane in {[p.name for p in planes]}"
    ops = [ln for p in dev for ln in p.lines if ln.name == "XLA Ops"]
    assert ops and any(ln.events for ln in ops)
    # Event metadata must resolve and carry the tf_op scope path + the
    # static per-op cost stats the roofline columns are built from.
    plane = dev[0]
    ev = next(e for ln in ops for e in ln.events)
    md = plane.event_metadata[ev.metadata_id]
    assert md.name
    stats = set()
    for m in plane.event_metadata.values():
        stats |= set(m.stats)
    assert {"tf_op", "program_id"} <= stats


def test_profiles_bucket_by_pass_scopes(xplane_path):
    profs = profiles_from_xplane(xplane_path)
    assert profs, "no profiles"
    frame = profs[0]  # sorted largest total first -> the frame program
    # The frame program must attribute to the real pass scopes, and the
    # bucket sum must reproduce the module's own total duration: that is
    # the property that makes the attribution trustworthy (the normalized
    # legacy profiler could not offer it).
    expect = {"pass_vertex", "pass_raster", "pass_shade", "pass_binning"}
    assert expect <= set(frame.passes), sorted(frame.passes)
    ssum = sum(c.ms for c in frame.passes.values())
    assert frame.total_ms > 0
    assert abs(ssum - frame.total_ms) / frame.total_ms < 0.05
    # Program-id keyed module durations: the cached shadow program is a
    # DIFFERENT executable that shares the module name; its total must be
    # its own (small), not the frame program's.
    shadow = [p for p in profs[1:] if "pass_shadow" in p.passes]
    assert shadow and shadow[0].total_ms < 0.5 * frame.total_ms


def test_scaled_rows_sum_to_frame_time(xplane_path):
    frame = profiles_from_xplane(xplane_path)[0]
    rows = frame.scaled_rows(0.9)
    assert rows
    assert abs(sum(ms for _, ms, _ in rows) - 0.9) < 1e-9
    assert abs(sum(frac for _, _, frac in rows) - 1.0) < 1e-9
    # Sorted descending, fractions consistent with ms.
    ms_list = [ms for _, ms, _ in rows]
    assert ms_list == sorted(ms_list, reverse=True)


def test_table_renders(xplane_path):
    frame = profiles_from_xplane(xplane_path)[0]
    t = frame.table()
    assert "ms/frame device time" in t and "pass_shade" in t


def test_calibration_program_runs():
    from ash_tpu.render.diagnostics.pass_trace import calibration_program

    fn, x = calibration_program(size=64, loops=2)
    out = fn(x)
    assert out.shape == (64, 64)
    import numpy as np

    assert np.isfinite(np.asarray(out)).all()


def test_device_frame_ratio_math(monkeypatch):
    """Ratio = sum(per-frame device ms of non-calib modules) / calib ms —
    split pipelines (shadow executing every other frame, etc.) weight by
    executions/iters; the calibration module is excluded from the frame
    side by name."""
    from ash_tpu.render.diagnostics import pass_trace as pt

    profs = [
        pt.PassProfile(module_name="jit_frame", executions=12,
                       total_ms=2.0),
        pt.PassProfile(module_name="jit_shadow", executions=6,
                       total_ms=1.0),  # every other frame
        pt.PassProfile(module_name="jit_ash_guard_calib", executions=12,
                       total_ms=4.0),
    ]
    monkeypatch.setattr(
        pt, "profile_passes", lambda fn, iters=12, warmup=2: profs
    )
    calls = []

    def fake_calib():
        class _F:
            def __call__(self, x):
                class _R:
                    def block_until_ready(self):
                        calls.append(1)
                return _R()
        return _F(), None

    ratio, frame_ms, calib_ms, out_profs = pt.device_frame_ratio(
        lambda: None, iters=12, calib=fake_calib()
    )
    # frame side: 2.0 * 12/12 + 1.0 * 6/12 = 2.5; calib 4.0.
    assert abs(ratio - 2.5 / 4.0) < 1e-9
    assert abs(frame_ms - 2.5) < 1e-9
    assert abs(calib_ms - 4.0) < 1e-9
    assert out_profs is profs
    assert calls  # warmed the calibration program before tracing


def test_frame_totals_weights_and_excludes_calib():
    """frame_totals sums per-frame (trace-ms, gflop, gbyte) across the
    frame's executables with executions/iters weighting and drops the
    calibration module — the roofline numbers bench.py puts on every
    metric line (VERDICT r4 next #3)."""
    from ash_tpu.render.diagnostics import pass_trace as pt

    profs = [
        pt.PassProfile(
            module_name="jit_frame", executions=12, total_ms=2.0,
            passes={
                "pass_shade": pt.PassCost(ms=1.5, gflop=10.0, gbyte=0.5),
                "pass_raster": pt.PassCost(ms=0.5, gflop=2.0, gbyte=0.25),
            },
        ),
        pt.PassProfile(
            module_name="jit_shadow", executions=6, total_ms=1.0,
            passes={"pass_shadow": pt.PassCost(ms=1.0, gflop=4.0,
                                               gbyte=0.1)},
        ),
        pt.PassProfile(
            module_name="jit_ash_guard_calib", executions=12, total_ms=4.0,
            passes={"other": pt.PassCost(ms=4.0, gflop=100.0, gbyte=9.0)},
        ),
    ]
    ms, gf, gb = pt.frame_totals(profs, iters=12)
    assert abs(ms - (2.0 + 0.5)) < 1e-9
    assert abs(gf - (12.0 + 2.0)) < 1e-9  # 10+2 full + 4*0.5 shadow
    assert abs(gb - (0.75 + 0.05)) < 1e-9
