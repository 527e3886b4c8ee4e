"""Sharded (multi-process / multi-host) map-reduce: partial states from
contiguous frame blocks merge into results byte-identical to a
single-process run — the scale-out analogue of the reference's
thread-count-invariance tests (tests_aa.rs:48-77; docs/SCALING.md)."""

import numpy as np
import pytest

from gorder_tpu.input import (
    Analysis,
    AnalysisType,
    Collect,
    EstimateError,
    Frequency,
    LeafletClassification,
    MembraneNormal,
    OrderMapParams,
)
from gorder_tpu.parallel.shard import load_partial, save_partial
from gorder_tpu.present import write_yaml


def cg(fixtures, **kw):
    return Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True, **kw)


def _assert_merge_identical(analysis, tmp_path, n_shards, tag,
                            roundtrip_disk=False):
    direct = analysis.run()
    direct_yaml = tmp_path / f"direct_{tag}.yaml"
    write_yaml(direct, str(direct_yaml))

    states = []
    for i in range(n_shards):
        state = analysis.run_partial(i, n_shards)
        if roundtrip_disk:
            path = str(tmp_path / f"part_{tag}_{i}.npz")
            save_partial(path, state)
            state = load_partial(path)
        states.append(state)
    merged = analysis.merge(states)
    merged_yaml = tmp_path / f"merged_{tag}.yaml"
    write_yaml(merged, str(merged_yaml))

    with open(direct_yaml) as fa, open(merged_yaml) as fb:
        assert fa.read() == fb.read(), tag
    return direct, merged


def test_shard_merge_basic(fixtures, tmp_path):
    _assert_merge_identical(cg(fixtures), tmp_path, 3, "basic",
                            roundtrip_disk=True)


def test_shard_merge_leaflets_every_collect(fixtures, tmp_path):
    leaflets = LeafletClassification.global_("@membrane", "name PO4")
    leaflets.with_frequency(Frequency.every(4))
    leaflets.with_collect(Collect(True, None))
    direct, merged = _assert_merge_identical(
        cg(fixtures, leaflets=leaflets), tmp_path, 3, "leaflets")
    a = direct.leaflets_for_molecule("POPC")
    b = merged.leaflets_for_molecule("POPC")
    np.testing.assert_array_equal(a, b)


def test_shard_merge_leaflets_once_clustering(fixtures, tmp_path):
    """Once-frequency clustering shards bootstrap from global frame 0."""
    leaflets = LeafletClassification.clustering("name PO4")
    leaflets.with_frequency(Frequency.once())
    leaflets.with_collect(Collect(True, None))
    direct, merged = _assert_merge_identical(
        cg(fixtures, leaflets=leaflets), tmp_path, 4, "clustering_once")
    np.testing.assert_array_equal(direct.leaflets_for_molecule("POPC"),
                                  merged.leaflets_for_molecule("POPC"))


def test_shard_merge_error_estimation(fixtures, tmp_path):
    """Timewise series reassemble in global frame order — errors and
    convergence match exactly (the reference's interleave-merge
    semantics, timewise.rs AddExtend)."""
    _assert_merge_identical(
        cg(fixtures, estimate_error=EstimateError()), tmp_path, 3,
        "errors")


def test_shard_merge_ordermaps(fixtures, tmp_path):
    analysis = cg(
        fixtures,
        map=OrderMapParams.parse({
            "bin_size": [1.0, 1.0],
            "output_directory": str(tmp_path / "maps"),
            "min_samples": 10,
        }))
    direct, merged = _assert_merge_identical(analysis, tmp_path, 3, "maps")
    for cls in direct.average_maps:
        np.testing.assert_array_equal(direct.average_maps[cls],
                                      merged.average_maps[cls])


def test_shard_merge_dynamic_normals(fixtures, tmp_path):
    analysis = cg(
        fixtures,
        membrane_normal=MembraneNormal.dynamic("name PO4", 2.0,
                                               Collect(True, None)))
    direct, merged = _assert_merge_identical(analysis, tmp_path, 2,
                                             "normals")
    np.testing.assert_array_equal(direct.normals_for_molecule("POPC"),
                                  merged.normals_for_molecule("POPC"))


def test_shard_merge_ua(fixtures, tmp_path):
    analysis = Analysis(
        structure=str(fixtures / "ua.tpr"),
        trajectory=str(fixtures / "ua.xtc"),
        analysis_type=AnalysisType.uaorder(
            saturated="(resname POPC and name r'^C' and not name C15 C34 "
                      "C24 C25) or (resname POPS and name r'^C' and not "
                      "name C6 C18 C39 C27 C28)",
            unsaturated="(resname POPC and name C24 C25) or "
                        "(resname POPS and name C27 C28)"),
        silent=True, overwrite=True)
    _assert_merge_identical(analysis, tmp_path, 3, "ua")


def test_merge_rejects_incomplete_coverage(fixtures):
    from gorder_tpu.errors import AnalysisError

    analysis = cg(fixtures)
    s0 = analysis.run_partial(0, 3)
    with pytest.raises(AnalysisError, match="missing or duplicated"):
        analysis.merge([s0])


def test_merge_rejects_mismatched_fingerprint(fixtures):
    from gorder_tpu.errors import AnalysisError

    analysis = cg(fixtures)
    states = [analysis.run_partial(i, 2) for i in range(2)]
    other = cg(fixtures, step=5)
    with pytest.raises(AnalysisError, match="does not match"):
        other.merge(states)


def test_shard_cli_roundtrip(fixtures, tmp_path):
    """CLI: N shard invocations + one merge reproduce the direct run."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
structure: {fixtures}/cg.tpr
trajectory: {fixtures}/split/cg*.xtc
type: !CGOrder
  atoms: "@membrane"
output: order.yaml
silent: true
overwrite: true
""")

    from .test_cli import run_cli as _run_cli

    def run_cli(extra, cwd):
        return _run_cli([str(cfg)] + extra, cwd)

    direct_dir = tmp_path / "direct"
    direct_dir.mkdir()
    proc = run_cli([], direct_dir)
    assert proc.returncode == 0, proc.stderr

    shard_dir = tmp_path / "sharded"
    shard_dir.mkdir()
    for i in range(2):
        proc = run_cli(["--frame-shard", f"{i}/2",
                        "--partial", str(shard_dir / f"part{i}.npz")],
                       shard_dir)
        assert proc.returncode == 0, proc.stderr
    proc = run_cli(["--merge", str(shard_dir / "part*.npz")], shard_dir)
    assert proc.returncode == 0, proc.stderr

    with open(direct_dir / "order.yaml") as fa, \
            open(shard_dir / "order.yaml") as fb:
        assert fa.read() == fb.read()
