"""Additional golden coverage: asymmetric membranes (original fixtures),
UA mode driven from an atomistic structure, min_samples limits, and
multi-residue molecule classification."""

import numpy as np
import pytest

from gorder_tpu.input import (
    Analysis,
    AnalysisType,
    EstimateError,
    LeafletClassification,
    OrderMapParams,
)
from gorder_tpu.present import write_yaml
from gorder_tpu.present.csv_out import write_csv
from gorder_tpu.present.tab_out import write_tab
from gorder_tpu.present.ordermaps_out import write_ordermaps

from .golden import assert_eq_order


def test_cg_asymmetric(fixtures, tmp_path):
    """Asymmetric membrane (different lipid counts per leaflet) — an
    original (non-re-encoded) fixture, strict comparison."""
    analysis = Analysis(
        structure=str(fixtures / "asymmetric" / "cg_asym.tpr"),
        trajectory=str(fixtures / "asymmetric" / "cg_asym.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        leaflets=LeafletClassification.global_("@membrane", "name PO4"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out),
                    str(fixtures / "asymmetric" / "cg_order_asymmetric.yaml"),
                    exact=True)
    write_tab(results, str(tmp_path / "order.tab"))
    assert_eq_order(str(tmp_path / "order.tab"),
                    str(fixtures / "asymmetric" / "cg_order_asymmetric.tab"),
                    exact=True)
    write_csv(results, str(tmp_path / "order.csv"))
    assert_eq_order(str(tmp_path / "order.csv"),
                    str(fixtures / "asymmetric" / "cg_order_asymmetric.csv"),
                    skip=0, csv=True, exact=True)


def test_cg_asymmetric_errors(fixtures, tmp_path):
    analysis = Analysis(
        structure=str(fixtures / "asymmetric" / "cg_asym.tpr"),
        trajectory=str(fixtures / "asymmetric" / "cg_asym.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        leaflets=LeafletClassification.global_("@membrane", "name PO4"),
        estimate_error=EstimateError(),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(
        str(out),
        str(fixtures / "asymmetric" / "cg_order_asymmetric_errors.yaml"))


def test_ua_from_aa_structure(fixtures, tmp_path):
    """United-atom analysis of an all-atom structure: real hydrogens are
    ignored and virtual ones predicted (test_ua_order_from_aa_ignore)."""
    analysis = Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=AnalysisType.uaorder(
            saturated=("@membrane and element name carbon and not name "
                       "C29 C210 C21 C31"),
            unsaturated="@membrane and name C29 C210",
            ignore="element name hydrogen",
        ),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "ua_order_from_aa.yaml"))


def test_aa_min_samples_limit(fixtures, tmp_path):
    analysis = Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=AnalysisType.aaorder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        min_samples=2000,
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "aa_order_limit.yaml"))


def test_multiple_resid_molecule_naming(fixtures, tmp_path):
    """Molecules made of several residues are named by joining residue names;
    distinct molecule types sharing a name get numeric suffixes
    (classify.rs solve_name_conflicts)."""
    out_dir = tmp_path / "maps"
    analysis = Analysis(
        structure=str(fixtures / "multiple_resid_same_name.tpr"),
        trajectory=str(fixtures / "multiple_resid_same_name.xtc"),
        analysis_type=AnalysisType.aaorder(
            "resname POPC POPE and name C1A C3A C1B C3B",
            "resname POPC POPE and name D2A C4A C2B C4B"),
        map=OrderMapParams.parse({
            "bin_size": [0.1, 4.0],
            "output_directory": str(out_dir),
            "min_samples": 1,
        }),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    names = results.molecule_names()
    assert "POPC-POPE1" in names and "POPC-POPE2" in names
    write_ordermaps(results, str(out_dir))
    for name in (
        "POPC-POPE1/ordermap_POPC-C1A-4--POPC-D2A-5_full.dat",
        "POPC-POPE1/ordermap_POPC-D2A-5--POPE-C3A-6_full.dat",
        "POPC-POPE1/ordermap_POPE-C3B-10--POPE-C4B-11_full.dat",
        "POPC-POPE1/ordermap_average_full.dat",
        "POPC-POPE2/ordermap_average_full.dat",
    ):
        assert (out_dir / name).is_file(), name


def test_cyclic_molecule_classification(fixtures):
    """Cyclic bond graphs must classify without infinite loops."""
    from gorder_tpu.io.tpr import read_tpr
    from gorder_tpu.select import select_mask
    from gorder_tpu.topology.classify import classify_molecules

    system = read_tpr(str(fixtures / "cyclic.tpr"))
    mask = select_mask(system, "resname POPC")
    kinds = classify_molecules(system, mask, mode="bonds")
    assert len(kinds) >= 1
    assert sum(k.n_molecules for k in kinds) == 3


def test_same_name_distinct_types(fixtures):
    """same_name.tpr: two topologically different molecules both named POPC
    get POPC1/POPC2 suffixes."""
    from gorder_tpu.io.tpr import read_tpr
    from gorder_tpu.select import select_mask
    from gorder_tpu.topology.classify import classify_molecules

    system = read_tpr(str(fixtures / "same_name.tpr"))
    mask = select_mask(system, "resname POPC")
    kinds = classify_molecules(system, mask, mode="bonds")
    if len(kinds) > 1:
        assert sorted(k.name for k in kinds) == ["POPC1", "POPC2"]


def test_cg_redefined_bonds(fixtures, tmp_path):
    """A bonds file replaces the TPR bond topology entirely
    (structure.rs:27-88)."""
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        bonds=str(fixtures / "cg_redefined.bnd"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_redefined_bonds.yaml"))


def test_membrane_normal_axis_config():
    from gorder_tpu.input import MembraneNormal
    from gorder_tpu.input.config import load_yaml

    for axis in ("x", "y", "z"):
        mn = MembraneNormal.parse(load_yaml(f"membrane_normal: {axis}")
                                  ["membrane_normal"])
        assert mn.kind == "static" and mn.axis == axis
    dyn = MembraneNormal.parse(load_yaml(
        "membrane_normal: !Dynamic {heads: 'name P', radius: 2.5}")
        ["membrane_normal"])
    assert dyn.kind == "dynamic" and dyn.radius == 2.5
