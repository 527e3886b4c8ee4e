"""CLI tests (the reference's tests_bin.rs tier)."""

import subprocess
import sys
import os

import pytest

from .golden import assert_eq_order
from .conftest import FIXTURES


def run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    return subprocess.run(
        [sys.executable, "-m", "gorder_tpu", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=400,
    )


@pytest.fixture()
def cg_config(tmp_path, fixtures):
    cfg = tmp_path / "analyze.yaml"
    cfg.write_text(f"""
structure: {fixtures}/cg.tpr
trajectory: {fixtures}/split/cg*.xtc
type: !CGOrder
  atoms: "@membrane"
output: order.yaml
output_csv: order.csv
""")
    return cfg


def test_cli_basic_run(cg_config, tmp_path, fixtures):
    proc = run_cli([str(cg_config), "--silent"], cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr
    assert proc.stdout.strip() == ""  # --silent
    assert_eq_order(str(tmp_path / "order.yaml"),
                    str(fixtures / "cg_order_basic.yaml"))
    assert_eq_order(str(tmp_path / "order.csv"),
                    str(fixtures / "cg_order_basic.csv"), skip=0, csv=True)


def test_cli_missing_yaml_output(tmp_path, fixtures):
    cfg = tmp_path / "bad.yaml"
    cfg.write_text(f"""
structure: {fixtures}/cg.tpr
trajectory: {fixtures}/split/cg3.xtc
type: !CGOrder
  atoms: "@membrane"
""")
    proc = run_cli([str(cfg)], cwd=tmp_path)
    assert proc.returncode == 1
    assert "no yaml output file specified" in proc.stderr.lower()


def test_cli_invalid_config(tmp_path):
    cfg = tmp_path / "invalid.yaml"
    cfg.write_text("structure: nothing.tpr\n")
    proc = run_cli([str(cfg)], cwd=tmp_path)
    assert proc.returncode == 1
    assert "error" in proc.stderr.lower()


def test_cli_export_config(cg_config, tmp_path):
    proc = run_cli(
        [str(cg_config), "--silent", "--export-config", "exported.yaml"],
        cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr
    from gorder_tpu.input import Analysis

    exported = Analysis.from_file(str(tmp_path / "exported.yaml"))
    assert exported.analysis_type.kind == "cg"
    assert exported.step == 1 and exported.n_threads == 1


def test_cli_export_config_roundtrip(tmp_path, fixtures):
    """test_bin_cg_order_maps_export_config (tests_bin.rs:165-212): delete
    all outputs and rerun from the exported config — same results."""
    cfg = tmp_path / "analyze.yaml"
    out_dir = tmp_path / "maps"
    cfg.write_text(f"""
structure: {fixtures}/cg.tpr
trajectory: {fixtures}/split/cg*.xtc
type: !CGOrder
  beads: "resname POPC and name C1B C2B C3B C4B"
output_yaml: order.yaml
ordermaps:
  output_directory: {out_dir}
  bin_size: [1.0, 1.0]
  min_samples: 10
""")
    proc = run_cli([str(cfg), "--silent", "--overwrite",
                    "--export-config", "exported.yaml"], cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr
    original = (tmp_path / "order.yaml").read_text()

    (tmp_path / "order.yaml").unlink()
    import shutil

    shutil.rmtree(out_dir)
    proc = run_cli(["exported.yaml", "--overwrite"], cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr
    rerun = (tmp_path / "order.yaml").read_text()
    assert rerun.splitlines()[1:] == original.splitlines()[1:]
    assert (out_dir / "POPC"
            / "ordermap_POPC-C1B-8--POPC-C2B-9_full.dat").is_file()


def test_cli_backup_and_overwrite(cg_config, tmp_path):
    (tmp_path / "order.yaml").write_text("previous content\n")
    proc = run_cli([str(cg_config), "--silent"], cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr
    backups = list(tmp_path.glob("#order.yaml*"))
    assert len(backups) == 1
    assert backups[0].read_text() == "previous content\n"


def test_cli_nonexistent_trajectory(tmp_path, fixtures):
    """Missing trajectory file → exit 1 with the error on stderr
    (tests_bin.rs test_bin_cg_leaflets_fail_nonexistent_traj)."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
structure: {fixtures}/cg.tpr
trajectory: {fixtures}/no_such_file.xtc
type: !CGOrder
  atoms: "@membrane"
output: order.yaml
""")
    proc = run_cli([str(cfg)], cwd=tmp_path)
    assert proc.returncode == 1
    assert "no_such_file" in proc.stderr
    assert not (tmp_path / "order.yaml").exists()


def test_cli_unwritable_output(tmp_path, fixtures):
    """Output path in a nonexistent directory → exit 1; missing parent
    directories are NOT auto-created (errors.rs CouldNotCreateFile,
    tests_bin.rs test_bin_aa_order_writing_fail)."""
    blocker = tmp_path / "blocker"
    blocker.write_text("")          # a file where a directory is expected
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
structure: {fixtures}/cg.tpr
trajectory: {fixtures}/split/cg3.xtc
type: !CGOrder
  atoms: "@membrane"
output: {blocker}/order.yaml
""")
    proc = run_cli([str(cfg)], cwd=tmp_path)
    assert proc.returncode == 1


def test_cli_export_config_write_failure_keeps_success(cg_config, tmp_path):
    """test_bin_output_config_writing_fails (tests_bin.rs:603-628): an
    unwritable --export-config path does not fail the run — the analysis
    results are written, exit code is 0, and stderr explains."""
    proc = run_cli(
        [str(cg_config), "--silent", "--overwrite", "--export-config",
         "this_directory_does_not_exist/analysis_out.yaml"],
        cwd=tmp_path)
    assert proc.returncode == 0, proc.stderr
    assert "Analysis completed successfully, but exporting" in proc.stderr
    assert "could not create file" in proc.stderr
    assert (tmp_path / "order.yaml").is_file()
    assert not (tmp_path / "this_directory_does_not_exist").exists()


def test_cli_missing_maps_output(tmp_path, fixtures):
    """CLI requires an ordermap output directory when maps are enabled
    (tests_bin.rs test_bin_missing_maps_output_fail;
    src/application/mod.rs:86)."""
    cfg = tmp_path / "maps.yaml"
    cfg.write_text(f"""
structure: {fixtures}/cg.tpr
trajectory: {fixtures}/split/cg3.xtc
type: !CGOrder
  atoms: "@membrane"
output: order.yaml
map: default
""")
    proc = run_cli([str(cfg)], cwd=tmp_path)
    assert proc.returncode == 1
    assert "ordermap" in proc.stderr.lower()
    assert not (tmp_path / "order.yaml").exists()
