"""Python API surface tests (the pygorder tier of the reference)."""

import numpy as np
import pytest

import gorder_tpu as gorder


def test_top_level_exports():
    for name in ("Analysis", "AnalysisType", "LeafletClassification",
                 "MembraneNormal", "OrderMapParams", "EstimateError",
                 "Geometry", "Frequency", "AnalysisResults", "GorderError"):
        assert hasattr(gorder, name), name


@pytest.fixture(scope="module")
def results(fixtures):
    analysis = gorder.Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=gorder.AnalysisType.cgorder("@membrane"),
        leaflets=gorder.LeafletClassification.global_("@membrane",
                                                      "name PO4"),
        map=gorder.OrderMapParams.parse({"bin_size": [1.0, 1.0]}),
        estimate_error=gorder.EstimateError(),
        silent=True, overwrite=True,
    )
    return analysis.run()


def test_results_accessors(results):
    assert results.n_analyzed_frames == 101
    assert results.molecule_names() == ["POPC", "POPE", "POPG"]
    popc = results.get_molecule("POPC")
    assert popc.name == "POPC"
    with pytest.raises(KeyError):
        results.get_molecule("NOPE")

    avg = results.average_order
    assert abs(avg.total.value - 0.2962) < 2e-3
    assert avg.upper is not None and avg.lower is not None
    assert avg.total.error is not None and avg.total.error > 0

    bond = popc.bonds[0]
    assert bond.atom1.name == "NC3" and bond.atom2.name == "PO4"
    assert abs(bond.order.total.value - (-0.1352)) < 1e-3


def test_results_numpy_maps(results):
    popc = results.get_molecule("POPC")
    bond = popc.bonds[0]
    assert isinstance(bond.maps["total"], np.ndarray)
    assert bond.maps["total"].ndim == 2
    assert isinstance(results.average_maps["upper"], np.ndarray)


def test_results_convergence(results):
    popc = results.get_molecule("POPC")
    conv = popc.convergence["total"]
    assert len(conv) == 101
    assert abs(conv[-1] - popc.average_order.total.value) < 1e-3


def test_run_from_yaml_string(fixtures, tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
structure: {fixtures}/cg.tpr
trajectory: {fixtures}/split/cg*.xtc
type: !CGOrder
  atoms: "@membrane"
output: {tmp_path}/o.yaml
silent: true
overwrite: true
""")
    results = gorder.Analysis.from_file(str(cfg)).run()
    results.write()
    assert (tmp_path / "o.yaml").is_file()


def test_exceptions_are_catchable(fixtures):
    with pytest.raises(gorder.GorderError):
        gorder.Analysis(
            structure=str(fixtures / "cg.tpr"),
            trajectory="/nonexistent.xtc",
            analysis_type=gorder.AnalysisType.cgorder("@membrane"),
            silent=True,
        ).run()
