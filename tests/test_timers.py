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


def test_progress_printer_tty_and_pipe():
    """The trajectory progress line renders on a terminal and is a strict
    no-op on pipes (so logs and tests stay clean)."""
    import io

    from gorder_tpu.utils.progress import ProgressPrinter

    class Tty(io.StringIO):
        def isatty(self):
            return True

    s = Tty()
    p = ProgressPrinter(100, stream=s, min_interval=0.0)
    p.update(50)
    p.update(120)   # clamped to total
    p.finish()
    p.finish()      # idempotent
    out = s.getvalue()
    assert "ANALYZING" in out and "50" in out
    assert out.count("COMPLETED") == 1 and out.endswith("\n")

    piped = io.StringIO()
    p = ProgressPrinter(100, stream=piped, min_interval=0.0)
    p.update(50)
    p.finish()
    assert piped.getvalue() == ""
