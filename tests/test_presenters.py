"""Golden tests for TAB/CSV/XVG/convergence presenters + error estimation."""

import pytest

from gorder_tpu.input import Analysis, AnalysisType, EstimateError, LeafletClassification
from gorder_tpu.present.csv_out import write_csv
from gorder_tpu.present.tab_out import write_tab
from gorder_tpu.present.xvg_out import write_xvg

from .golden import assert_eq_order


@pytest.fixture(scope="module")
def cg_results(fixtures):
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True,
    )
    return analysis.run()


@pytest.fixture(scope="module")
def cg_leaflet_results(fixtures):
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        leaflets=LeafletClassification.global_("@membrane", "name PO4"),
        silent=True, overwrite=True,
    )
    return analysis.run()


@pytest.fixture(scope="module")
def aa_results(fixtures):
    analysis = Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=AnalysisType.aaorder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen",
        ),
        silent=True, overwrite=True,
    )
    return analysis.run()


def test_cg_tab(cg_results, fixtures, tmp_path):
    out = tmp_path / "order.tab"
    write_tab(cg_results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_basic.tab"))


def test_cg_csv(cg_results, fixtures, tmp_path):
    out = tmp_path / "order.csv"
    write_csv(cg_results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_basic.csv"),
                    skip=0, csv=True)


def test_cg_leaflets_tab_csv(cg_leaflet_results, fixtures, tmp_path):
    out = tmp_path / "order.tab"
    write_tab(cg_leaflet_results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_leaflets.tab"))
    out_csv = tmp_path / "order.csv"
    write_csv(cg_leaflet_results, str(out_csv))
    assert_eq_order(str(out_csv), str(fixtures / "cg_order_leaflets.csv"),
                    skip=0, csv=True)


def test_cg_leaflets_xvg(cg_leaflet_results, fixtures, tmp_path):
    pattern = tmp_path / "order.xvg"
    write_xvg(cg_leaflet_results, str(pattern))
    for mol in ("POPC", "POPE", "POPG"):
        assert_eq_order(str(tmp_path / f"order_{mol}.xvg"),
                        str(fixtures / f"cg_order_leaflets_{mol}.xvg"))


def test_cg_basic_xvg(cg_results, fixtures, tmp_path):
    pattern = tmp_path / "order.xvg"
    write_xvg(cg_results, str(pattern))
    for mol in ("POPC", "POPE", "POPG"):
        assert_eq_order(str(tmp_path / f"order_{mol}.xvg"),
                        str(fixtures / f"cg_order_basic_{mol}.xvg"))


def test_aa_tab_csv_xvg(aa_results, fixtures, tmp_path):
    out = tmp_path / "order.tab"
    write_tab(aa_results, str(out))
    assert_eq_order(str(out), str(fixtures / "aa_order_basic.tab"))
    out_csv = tmp_path / "order.csv"
    write_csv(aa_results, str(out_csv))
    assert_eq_order(str(out_csv), str(fixtures / "aa_order_basic.csv"),
                    skip=0, csv=True)
    write_xvg(aa_results, str(tmp_path / "order.xvg"))
    for mol in ("POPC", "POPE", "POPG"):
        assert_eq_order(str(tmp_path / f"order_{mol}.xvg"),
                        str(fixtures / f"aa_order_basic_{mol}.xvg"))


def test_cg_error_yaml_tab_csv(fixtures, tmp_path):
    from gorder_tpu.present import write_yaml
    from gorder_tpu.present.convergence_out import write_convergence

    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        estimate_error=EstimateError(),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_error.yaml"))
    out_tab = tmp_path / "order.tab"
    write_tab(results, str(out_tab))
    assert_eq_order(str(out_tab), str(fixtures / "cg_order_error.tab"))
    out_csv = tmp_path / "order.csv"
    write_csv(results, str(out_csv))
    assert_eq_order(str(out_csv), str(fixtures / "cg_order_error.csv"),
                    skip=0, csv=True)
    out_conv = tmp_path / "convergence.xvg"
    write_convergence(results, str(out_conv))
    assert_eq_order(str(out_conv), str(fixtures / "cg_order_convergence.xvg"))


def test_aa_error_leaflets_yaml(fixtures, tmp_path):
    from gorder_tpu.present import write_yaml

    analysis = Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=AnalysisType.aaorder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen",
        ),
        leaflets=LeafletClassification.global_("@membrane", "name P"),
        estimate_error=EstimateError(),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "aa_order_error_leaflets.yaml"))
    write_csv(results, str(tmp_path / "order.csv"))
    assert_eq_order(str(tmp_path / "order.csv"),
                    str(fixtures / "aa_order_error_leaflets.csv"),
                    skip=0, csv=True)
    write_tab(results, str(tmp_path / "order.tab"))
    assert_eq_order(str(tmp_path / "order.tab"),
                    str(fixtures / "aa_order_error_leaflets.tab"))


def test_xvg_weird_name_patterns():
    """tests_aa.rs:201 test_aa_order_basic_xvg_weird_names: per-molecule
    path derivation for dotted and extension-less patterns."""
    from gorder_tpu.present.xvg_out import xvg_path_for

    assert xvg_path_for("/d/order.xvg", "POPC") == "/d/order_POPC.xvg"
    assert (xvg_path_for("/d/.this.is.a.weird.name.xvg", "POPC")
            == "/d/.this.is.a.weird.name_POPC.xvg")
    assert xvg_path_for("/d/order", "POPC") == "/d/order_POPC"
