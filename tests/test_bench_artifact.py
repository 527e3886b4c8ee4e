"""The benchmark harness's outage artifacts.

The driver records whatever single JSON line bench.py prints; a device
tunnel that dies MID-run (after a successful preflight) used to leave the
process blocked in a device call with no artifact at all. These tests pin
the two guarantees that protect the recorded figure from link weather:

- `_replay_artifact` relabels the persisted last-good capture (or emits an
  explicit zero record when none exists);
- the `_arm_watchdog` deadline thread prints that artifact and hard-exits
  even while the main thread is blocked, and stays silent on a normal run.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_replay_artifact_relabels_last_capture(tmp_path, monkeypatch):
    latest = tmp_path / "BENCH_LATEST.json"
    latest.write_text(json.dumps({
        "metric": "AA end-to-end", "value": 648.6, "unit": "frames/s",
        "vs_baseline": 0.1297, "captured_iso": "2026-08-19T04:46:41Z",
    }))
    monkeypatch.setattr(bench, "LATEST_PATH", str(latest))
    out = bench._replay_artifact("tunnel slump")
    assert out["value"] == 648.6
    assert out["replayed"] is True
    assert out["replay_reason"] == "tunnel slump"
    assert "REPLAYED from the last good capture at 2026-08-19" in out["metric"]
    assert "tunnel slump" in out["metric"]


def test_replay_artifact_without_capture_is_explicit(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "LATEST_PATH", str(tmp_path / "missing.json"))
    out = bench._replay_artifact("no capture ever")
    assert out["value"] == 0.0
    assert out["device_unreachable"] is True
    assert "NO CAPTURE" in out["metric"]


def _run_snippet(code, env_extra, timeout=60):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)


def test_watchdog_emits_artifact_while_main_thread_blocks(tmp_path):
    latest = tmp_path / "latest.json"
    latest.write_text(json.dumps({
        "metric": "AA end-to-end", "value": 500.0, "unit": "frames/s",
        "vs_baseline": 0.1, "captured_iso": "2026-08-18T00:00:00Z",
    }))
    code = (
        "import time, bench\n"
        f"bench.LATEST_PATH = {str(latest)!r}\n"
        "bench._arm_watchdog()\n"
        "time.sleep(300)\n"  # simulate a device call that never returns
    )
    out = _run_snippet(code, {"GORDER_BENCH_DEADLINE_S": "1"})
    assert out.returncode == 0
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["replayed"] is True
    assert payload["value"] == 500.0
    assert "watchdog" in out.stderr


def test_watchdog_prefers_partial_capture_of_this_run(tmp_path):
    code = (
        "import time, bench\n"
        "bench.LATEST_PATH = '/nonexistent/latest.json'\n"
        "bench._WD['partial'] = {'metric': 'AA end-to-end', 'value': 321.0,\n"
        "                        'unit': 'frames/s'}\n"
        "bench._arm_watchdog()\n"
        "time.sleep(300)\n"
    )
    out = _run_snippet(code, {"GORDER_BENCH_DEADLINE_S": "1"})
    assert out.returncode == 0
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["value"] == 321.0
    assert payload["partial_capture"] is True
    assert "PARTIAL" in payload["metric"]


def test_watchdog_silent_when_cancelled():
    code = (
        "import time, bench\n"
        "done = bench._arm_watchdog()\n"
        "done.set()\n"
        "time.sleep(2)\n"
        "print('NORMAL-EXIT')\n"
    )
    out = _run_snippet(code, {"GORDER_BENCH_DEADLINE_S": "1"})
    assert out.returncode == 0
    assert out.stdout.strip() == "NORMAL-EXIT"
    assert "watchdog" not in out.stderr


def test_watchdog_survives_corrupt_latest(tmp_path):
    """A truncated/corrupt BENCH_LATEST.json must not kill the watchdog
    thread silently — it falls back to the explicit zero record."""
    latest = tmp_path / "latest.json"
    latest.write_text('{"metric": "AA end-to-end", "valu')   # truncated
    code = (
        "import time, bench\n"
        f"bench.LATEST_PATH = {str(latest)!r}\n"
        "bench._arm_watchdog()\n"
        "time.sleep(300)\n"
    )
    out = _run_snippet(code, {"GORDER_BENCH_DEADLINE_S": "1"})
    assert out.returncode == 0
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["value"] == 0.0
    assert payload["device_unreachable"] is True
    assert "replay artifact unreadable" in out.stderr


def test_bench_modes_watchdog_prefers_partial_capture():
    code = (
        "import sys, time\n"
        "sys.path.insert(0, 'tools')\n"
        "import bench_modes\n"
        "bench_modes._WD['partial'] = {'metric': 'CG order', 'value': 77.0,\n"
        "                              'unit': 'frames/s'}\n"
        "bench_modes._arm_watchdog('cg')\n"
        "time.sleep(300)\n"
    )
    out = _run_snippet(code, {"GORDER_BENCH_DEADLINE_S": "1"})
    assert out.returncode == 0
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["value"] == 77.0
    assert payload["partial_capture"] is True
    assert "PARTIAL" in payload["metric"]


def test_bench_modes_watchdog_silent_when_cancelled():
    """bench_modes._arm_watchdog returns a cancellation Event symmetric
    with bench._arm_watchdog — a completed mode must not trigger a
    spurious zero artifact (or an os._exit) afterwards."""
    code = (
        "import sys, time\n"
        "sys.path.insert(0, 'tools')\n"
        "import bench_modes\n"
        "done = bench_modes._arm_watchdog('cg')\n"
        "done.set()\n"
        "time.sleep(2)\n"
        "print('NORMAL-EXIT')\n"
    )
    out = _run_snippet(code, {"GORDER_BENCH_DEADLINE_S": "1"})
    assert out.returncode == 0
    assert out.stdout.strip() == "NORMAL-EXIT"
    assert "watchdog" not in out.stderr


def _write_golden(tmp_path, name, text, monkeypatch):
    gdir = tmp_path / "golden"
    gdir.mkdir(exist_ok=True)
    (gdir / name).write_text(text)
    monkeypatch.setattr(bench, "GOLDEN_DIR", str(gdir))
    return gdir


_GOLDEN_YAML = (
    "# Order parameters\n"
    "POPC:\n"
    "  average order:\n"
    "    total: 0.1234\n"
    "  order parameters:\n"
    "    C22 (32):\n"
    "      total: -0.0456\n"
)


def test_validate_output_exact(tmp_path, monkeypatch):
    _write_golden(tmp_path, "aa_100.yaml", _GOLDEN_YAML, monkeypatch)
    out = tmp_path / "run.yaml"
    out.write_text(_GOLDEN_YAML.replace("# Order parameters",
                                        "# different header comment"))
    assert bench.validate_output(str(out), "aa", 100) == "exact"


def test_validate_output_tolerates_one_print_quantum(tmp_path, monkeypatch):
    _write_golden(tmp_path, "aa_100.yaml", _GOLDEN_YAML, monkeypatch)
    out = tmp_path / "run.yaml"
    out.write_text(_GOLDEN_YAML.replace("0.1234", "0.1235"))
    status = bench.validate_output(str(out), "aa", 100)
    assert status.startswith("quantum(1/")


def test_validate_output_fails_on_corrupted_values(tmp_path, monkeypatch):
    """The corrupted-kernel injection: a value off by more than one print
    quantum must fail the benchmark loudly, never post a number."""
    import pytest

    _write_golden(tmp_path, "aa_100.yaml", _GOLDEN_YAML, monkeypatch)
    out = tmp_path / "run.yaml"
    out.write_text(_GOLDEN_YAML.replace("0.1234", "0.2234"))
    with pytest.raises(bench.BenchValidationError, match="differs from"):
        bench.validate_output(str(out), "aa", 100)
    # structural corruption (missing line) fails too
    out.write_text("\n".join(_GOLDEN_YAML.splitlines()[:-1]) + "\n")
    with pytest.raises(bench.BenchValidationError, match="lines"):
        bench.validate_output(str(out), "aa", 100)
    # the loud artifact posts value 0.0 with an explicit flag
    art = bench.correctness_failure_artifact("AA end-to-end",
                                             "value mismatch")
    assert art["value"] == 0.0
    assert art["correctness_failed"] is True
    assert "CORRECTNESS FAILURE" in art["metric"]


def test_validate_output_none_without_golden(tmp_path, monkeypatch):
    _write_golden(tmp_path, "aa_100.yaml", _GOLDEN_YAML, monkeypatch)
    out = tmp_path / "run.yaml"
    out.write_text(_GOLDEN_YAML)
    assert bench.validate_output(str(out), "aa", 999) is None
