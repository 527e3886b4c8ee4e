"""Phase timers and profiler hooks (SURVEY §5: tracing added in the
rebuild — the reference has none in-repo)."""

import numpy as np

from gorder_tpu.input import Analysis, AnalysisType
from gorder_tpu.utils.timers import PhaseTimers, timers


def test_phase_timer_accumulates():
    t = PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    snap = t.snapshot()
    assert list(snap) == ["a", "b"]
    assert snap["a"] >= 0 and snap["b"] >= 0
    assert "a" in t.summary() and "b" in t.summary()
    t.reset()
    assert t.summary() == "no phases recorded"


def test_run_records_phases(fixtures):
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    assert np.isfinite(results.average_order.total.value)
    snap = timers.snapshot()
    for phase in ("total", "structure", "topology", "trajectory", "decode",
                  "compute", "convert"):
        assert phase in snap, f"missing phase '{phase}': {snap}"
    assert snap["total"] >= snap["trajectory"]


def test_profiler_trace_written(fixtures, tmp_path, monkeypatch):
    monkeypatch.setenv("GORDER_TPU_PROFILE", str(tmp_path / "prof"))
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True,
    )
    analysis.run()
    produced = list((tmp_path / "prof").rglob("*"))
    assert any(p.is_file() for p in produced), produced
