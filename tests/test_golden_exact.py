"""Byte-exact golden comparisons for original-precision fixtures.

The project's exactness claim (reference-identical 1e-6 fixed-point
quantization + 4-dp printing) is pinned at the printed-token level wherever
the input fixture is the original file the reference generated its golden
from: ua.tpr/ua.xtc, ua_nobox.pdb/ua_whole_nobox.xtc, asymmetric/cg_asym.*.
Regressions cannot hide inside a tolerance here — every token must match
the reference golden exactly (tests/golden.py exact=True).

Cases whose printed values sit ON a 1e-6→4-dp rounding boundary where the
reference's f64 quantization and our on-device f32 quantization land one
quantum apart (a handful of tokens in ua_order_leaflets, aa_order_selected)
stay in the default-tolerance tier — see tests/test_golden_sweep.py.
"""

import pytest

from gorder_tpu.input import (
    Analysis,
    AnalysisType,
    EstimateError,
    Frequency,
    LeafletClassification,
    MembraneNormal,
)
from gorder_tpu.present import write_yaml
from gorder_tpu.present.convergence_out import write_convergence
from gorder_tpu.present.csv_out import write_csv
from gorder_tpu.present.tab_out import write_tab
from gorder_tpu.present.xvg_out import write_xvg

from .golden import assert_eq_order

UA_SAT = ("(resname POPC and name r'^C' and not name C15 C34 C24 C25) or "
          "(resname POPS and name r'^C' and not name C6 C18 C39 C27 C28)")
UA_UNSAT = ("(resname POPC and name C24 C25) or "
            "(resname POPS and name C27 C28)")


def ua(fixtures, **kw):
    sat = kw.pop("saturated", UA_SAT)
    unsat = kw.pop("unsaturated", UA_UNSAT)
    return dict(structure=str(fixtures / "ua.tpr"),
                trajectory=str(fixtures / "ua.xtc"),
                analysis_type=AnalysisType.uaorder(
                    saturated=sat, unsaturated=unsat),
                silent=True, overwrite=True, **kw)


def cg(fixtures, **kw):
    return dict(structure=str(fixtures / "cg.tpr"),
                trajectory=str(fixtures / "split" / "cg*.xtc"),
                analysis_type=AnalysisType.cgorder("@membrane"),
                silent=True, overwrite=True, **kw)


def cg_asym(fixtures, **kw):
    return dict(structure=str(fixtures / "asymmetric" / "cg_asym.tpr"),
                trajectory=str(fixtures / "asymmetric" / "cg_asym.xtc"),
                analysis_type=AnalysisType.cgorder("@membrane"),
                leaflets=LeafletClassification.global_("@membrane",
                                                       "name PO4"),
                silent=True, overwrite=True, **kw)


# name → (config builder, {format: golden path relative to fixtures})
EXACT_CASES = {
    "ua_order_basic": (
        lambda f: ua(f),
        {"yaml": "ua_order_basic.yaml", "tab": "ua_order_basic.tab",
         "csv": "ua_order_basic.csv", "xvg": "ua_order_basic_{mol}.xvg"}),
    "ua_order_basic_saturated": (
        lambda f: ua(f, unsaturated=None),
        {"yaml": "ua_order_basic_saturated.yaml"}),
    "ua_order_basic_unsaturated": (
        lambda f: ua(f, saturated=None),
        {"yaml": "ua_order_basic_unsaturated.yaml"}),
    "cg_order_basic": (
        lambda f: cg(f),
        {"yaml": "cg_order_basic.yaml", "tab": "cg_order_basic.tab",
         "csv": "cg_order_basic.csv", "xvg": "cg_order_basic_{mol}.xvg"}),
    "ua_order_error": (
        lambda f: ua(f, estimate_error=EstimateError()),
        {"yaml": "ua_order_error.yaml", "tab": "ua_order_error.tab",
         "csv": "ua_order_error.csv", "conv": "ua_order_convergence.xvg"}),
    "ua_order_leaflets_convergence": (
        # the order values of this config sit on quantum boundaries (see
        # module docstring) but the convergence series does not
        lambda f: ua(f, estimate_error=EstimateError(),
                     leaflets=LeafletClassification.global_(
                         "@membrane", "name r'^P'")),
        {"conv": "ua_order_leaflets_convergence.xvg"}),
    "cg_order_asymmetric_errors": (
        lambda f: cg_asym(f, estimate_error=EstimateError()),
        {"yaml": "asymmetric/cg_order_asymmetric_errors.yaml",
         "tab": "asymmetric/cg_order_asymmetric_errors.tab",
         "csv": "asymmetric/cg_order_asymmetric_errors.csv"}),
    "cg_order_asymmetric": (
        cg_asym,
        {"yaml": "asymmetric/cg_order_asymmetric.yaml",
         "tab": "asymmetric/cg_order_asymmetric.tab",
         "csv": "asymmetric/cg_order_asymmetric.csv",
         "xvg": "asymmetric/cg_order_asymmetric_{mol}.xvg"}),
}


def _case_ids():
    for name, (_builder, formats) in sorted(EXACT_CASES.items()):
        for fmt in sorted(formats):
            yield name, fmt


@pytest.mark.parametrize("name,fmt", list(_case_ids()),
                         ids=[f"{n}-{f}" for n, f in _case_ids()])
def test_exact_golden(name, fmt, fixtures, tmp_path):
    builder, formats = EXACT_CASES[name]
    results = Analysis(**builder(fixtures)).run()
    golden = formats[fmt]
    if fmt == "yaml":
        out = tmp_path / "order.yaml"
        write_yaml(results, str(out))
        assert_eq_order(str(out), str(fixtures / golden), exact=True)
    elif fmt == "tab":
        out = tmp_path / "order.tab"
        write_tab(results, str(out))
        assert_eq_order(str(out), str(fixtures / golden), exact=True)
    elif fmt == "csv":
        out = tmp_path / "order.csv"
        write_csv(results, str(out))
        assert_eq_order(str(out), str(fixtures / golden), skip=0, csv=True,
                        exact=True)
    elif fmt == "conv":
        out = tmp_path / "convergence.xvg"
        write_convergence(results, str(out))
        assert_eq_order(str(out), str(fixtures / golden), exact=True)
    elif fmt == "xvg":
        write_xvg(results, str(tmp_path / "order.xvg"))
        for mol in results.molecule_names():
            assert_eq_order(str(tmp_path / f"order_{mol}.xvg"),
                            str(fixtures / golden.format(mol=mol)),
                            exact=True)


def test_ua_order_dynamic_normals(fixtures, tmp_path):
    """Dynamic normals involve a PCA eigendecomposition whose f32 result
    differs from the reference's SVD by ulps; printed values sit one
    quantum off on a couple of tokens — default tolerance, not exact."""
    results = Analysis(**ua(
        fixtures,
        membrane_normal=MembraneNormal.dynamic("name r'^P'", 2.0))).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out),
                    str(fixtures / "ua_order_dynamic_normals.yaml"))


def test_ua_order_leaflets_nopbc(fixtures, tmp_path):
    """NoPBC group centers are plain means whose summation order differs
    from the reference's sequential fold — boundary tokens land one
    quantum apart; default tolerance, not exact."""
    results = Analysis(
        structure=str(fixtures / "ua_nobox.pdb"),
        trajectory=str(fixtures / "ua_whole_nobox.xtc"),
        analysis_type=AnalysisType.uaorder(
            saturated=UA_SAT, unsaturated=UA_UNSAT),
        leaflets=LeafletClassification.global_(
            "@membrane", "name r'^P'").with_membrane_normal("z"),
        handle_pbc=False, silent=True, overwrite=True).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out),
                    str(fixtures / "ua_order_leaflets_nopbc.yaml"))


def test_ua_leaflets_once_export_exact(fixtures, tmp_path):
    """The collected leaflet-assignment export (integers) is byte-exact
    against the reference golden (tests_ua.rs:293 diff_files_ignore_first)."""
    from gorder_tpu.input import Collect
    from gorder_tpu.present.leaflets_out import write_leaflets

    params = ua(fixtures)
    params["leaflets"] = LeafletClassification.global_(
        "@membrane", "name r'^P'").with_frequency(
        Frequency.once()).with_collect(
        Collect(True, str(tmp_path / "leaflets.yaml")))
    results = Analysis(**params).run()
    write_leaflets(results, str(tmp_path / "leaflets.yaml"))
    assert_eq_order(str(tmp_path / "leaflets.yaml"),
                    str(fixtures / "ua_leaflets_once.yaml"), exact=True)
