"""United-atom mode golden tests vs the reference outputs."""

import pytest

from gorder_tpu.input import (
    Analysis,
    AnalysisType,
    EstimateError,
    Frequency,
    LeafletClassification,
)
from gorder_tpu.present import write_yaml
from gorder_tpu.present.csv_out import write_csv
from gorder_tpu.present.tab_out import write_tab
from gorder_tpu.present.xvg_out import write_xvg

from .golden import assert_eq_order

SATURATED = ("(resname POPC and name r'^C' and not name C15 C34 C24 C25) or "
             "(resname POPS and name r'^C' and not name C6 C18 C39 C27 C28)")
UNSATURATED = ("(resname POPC and name C24 C25) or "
               "(resname POPS and name C27 C28)")


def ua_analysis(fixtures, **kwargs):
    return Analysis(
        structure=str(fixtures / "ua.tpr"),
        trajectory=str(fixtures / "ua.xtc"),
        analysis_type=AnalysisType.uaorder(
            saturated=SATURATED, unsaturated=UNSATURATED),
        silent=True, overwrite=True, **kwargs,
    )


def test_ua_order_basic(fixtures, tmp_path):
    results = ua_analysis(fixtures).run()
    assert results.molecule_names() == ["POPC", "POPS"]
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "ua_order_basic.yaml"),
                    exact=True)
    write_tab(results, str(tmp_path / "order.tab"))
    assert_eq_order(str(tmp_path / "order.tab"),
                    str(fixtures / "ua_order_basic.tab"), exact=True)
    write_csv(results, str(tmp_path / "order.csv"))
    assert_eq_order(str(tmp_path / "order.csv"),
                    str(fixtures / "ua_order_basic.csv"), skip=0, csv=True,
                    exact=True)
    write_xvg(results, str(tmp_path / "order.xvg"))
    for mol in ("POPC", "POPS"):
        assert_eq_order(str(tmp_path / f"order_{mol}.xvg"),
                        str(fixtures / f"ua_order_basic_{mol}.xvg"),
                        exact=True)


def test_ua_order_saturated_only(fixtures, tmp_path):
    analysis = Analysis(
        structure=str(fixtures / "ua.tpr"),
        trajectory=str(fixtures / "ua.xtc"),
        analysis_type=AnalysisType.uaorder(saturated=SATURATED),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "ua_order_basic_saturated.yaml"),
                    exact=True)


def test_ua_order_unsaturated_only(fixtures, tmp_path):
    analysis = Analysis(
        structure=str(fixtures / "ua.tpr"),
        trajectory=str(fixtures / "ua.xtc"),
        analysis_type=AnalysisType.uaorder(unsaturated=UNSATURATED),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out),
                    str(fixtures / "ua_order_basic_unsaturated.yaml"),
                    exact=True)


@pytest.mark.parametrize("method", ["global", "local", "individual"])
@pytest.mark.parametrize("freq", ["every1", "every5", "once"])
def test_ua_order_leaflets(fixtures, tmp_path, method, freq):
    if method == "global":
        leaflets = LeafletClassification.global_("@membrane", "name r'^P'")
    elif method == "local":
        leaflets = LeafletClassification.local("@membrane", "name r'^P'", 2.5)
    else:
        leaflets = LeafletClassification.individual(
            "name r'^P'",
            "(resname POPC and name CA2 C50) or (resname POPS and name C36 C55)",
        )
    frequency = {
        "every1": Frequency.every(1),
        "every5": Frequency.every(5),
        "once": Frequency.once(),
    }[freq]
    leaflets.with_frequency(frequency)
    results = ua_analysis(fixtures, leaflets=leaflets).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "ua_order_leaflets.yaml"))


def test_ua_order_leaflets_tab_csv(fixtures, tmp_path):
    leaflets = LeafletClassification.global_("@membrane", "name r'^P'")
    results = ua_analysis(fixtures, leaflets=leaflets).run()
    write_tab(results, str(tmp_path / "order.tab"))
    assert_eq_order(str(tmp_path / "order.tab"),
                    str(fixtures / "ua_order_leaflets.tab"))
    write_csv(results, str(tmp_path / "order.csv"))
    assert_eq_order(str(tmp_path / "order.csv"),
                    str(fixtures / "ua_order_leaflets.csv"), skip=0, csv=True)


def test_ua_order_error(fixtures, tmp_path):
    results = ua_analysis(fixtures, estimate_error=EstimateError()).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "ua_order_error.yaml"))
    write_tab(results, str(tmp_path / "order.tab"))
    assert_eq_order(str(tmp_path / "order.tab"),
                    str(fixtures / "ua_order_error.tab"))
    write_csv(results, str(tmp_path / "order.csv"))
    assert_eq_order(str(tmp_path / "order.csv"),
                    str(fixtures / "ua_order_error.csv"), skip=0, csv=True)


def test_ua_order_begin_end_step(fixtures, tmp_path):
    leaflets = LeafletClassification.global_("@membrane", "name r'^P'")
    results = ua_analysis(fixtures, begin=199200.0, end=199800.0,
                          step=3, leaflets=leaflets).run()
    assert results.n_analyzed_frames == 11
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "ua_order_begin_end_step.yaml"))


def test_ua_order_flipped_leaflets(fixtures, tmp_path):
    leaflets = LeafletClassification.global_("@membrane", "name r'^P'")
    leaflets.with_flip(True)
    results = ua_analysis(fixtures, leaflets=leaflets).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "ua_order_leaflets_flipped.yaml"))


def test_ua_order_leaflets_no_pbc(fixtures, tmp_path):
    """PBC fully ignored: pre-whole-molecule trajectory, boxless PDB
    structure, global leaflets with an explicit normal override
    (test_ua_order_leaflets_no_pbc, tests_ua.rs:687-714)."""
    leaflets = LeafletClassification.global_("@membrane", "name r'^P'")
    leaflets.with_membrane_normal("z")
    analysis = Analysis(
        structure=str(fixtures / "ua_nobox.pdb"),
        trajectory=str(fixtures / "ua_whole_nobox.xtc"),
        analysis_type=AnalysisType.uaorder(
            saturated=SATURATED, unsaturated=UNSATURATED),
        leaflets=leaflets,
        handle_pbc=False,
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "ua_order_leaflets_nopbc.yaml"))
