"""Golden sweep: reference integration tests not covered elsewhere
(geometry variants, step/window combinations, min-sample limits, block
counts). Parameters extracted from tests_aa.rs / tests_cg.rs /
tests_ua.rs; every case runs the full pipeline and compares against the
reference golden output."""

import pytest

from gorder_tpu.input import (
    Analysis,
    AnalysisType,
    EstimateError,
    Frequency,
    LeafletClassification,
)
from gorder_tpu.input.config import Geometry
from gorder_tpu.present import write_yaml

from .golden import assert_eq_order

INF = float("inf")

AA_HEAVY = "@membrane and element name carbon"
AA_H = "@membrane and element name hydrogen"
UA_SAT = ("(resname POPC and name r'^C' and not name C15 C34 C24 C25) or "
          "(resname POPS and name r'^C' and not name C6 C18 C39 C27 C28)")
UA_UNSAT = ("(resname POPC and name C24 C25) or "
            "(resname POPS and name C27 C28)")


def aa(fixtures, **kw):
    return dict(structure=str(fixtures / "pcpepg.tpr"),
                trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                            for i in range(1, 6)],
                analysis_type=AnalysisType.aaorder(
                    kw.pop("heavy", AA_HEAVY), kw.pop("hydrogens", AA_H)),
                silent=True, overwrite=True, **kw)


def cg(fixtures, **kw):
    return dict(structure=str(fixtures / "cg.tpr"),
                trajectory=str(fixtures / "split" / "cg*.xtc"),
                analysis_type=AnalysisType.cgorder(kw.pop("beads",
                                                          "@membrane")),
                silent=True, overwrite=True, **kw)


def ua(fixtures, **kw):
    return dict(structure=str(fixtures / "ua.tpr"),
                trajectory=str(fixtures / "ua.xtc"),
                analysis_type=AnalysisType.uaorder(
                    saturated=UA_SAT, unsaturated=UA_UNSAT),
                silent=True, overwrite=True, **kw)


def _global_p():
    return LeafletClassification.global_("@membrane", "name P")


CASES = {
    # --- time windows / strides (tests_aa.rs:1245-1345)
    "aa_order_begin_end": lambda f: aa(
        f, begin=450_200.0, end=450_400.0, leaflets=_global_p()),
    "aa_order_begin_end_step": lambda f: aa(
        f, begin=450_200.0, end=450_400.0, step=3, leaflets=_global_p()),
    "aa_order_step": lambda f: aa(f, step=5, leaflets=_global_p()),
    # --- error estimation variants (tests_aa.rs:2526-2552)
    "aa_order_error_blocks10": lambda f: aa(
        f, estimate_error=EstimateError(n_blocks=10)),
    "aa_order_error_limit": lambda f: aa(
        f, estimate_error=EstimateError(), min_samples=2000),
    "aa_order_leaflets_limit": lambda f: aa(
        f, min_samples=500, leaflets=_global_p()),
    # --- static geometry (tests_aa.rs:3040-3259)
    "aa_order_cuboid_square": lambda f: aa(
        f, heavy="resname POPC and name C22 C24 C218",
        geometry=Geometry("cuboid", reference=(8.0, 2.0, 0.0),
                          xdim=(-2.0, 4.0), ydim=(-4.0, 1.0))),
    "aa_order_cuboid_square_inverted": lambda f: aa(
        f, hydrogens="element name hydrogen",
        geometry=Geometry("cuboid", reference=(8.0, 2.0, 0.0),
                          xdim=(-2.0, 4.0), ydim=(-4.0, 1.0), invert=True)),
    "aa_order_cuboid_patch": lambda f: aa(
        f, geometry=Geometry("cuboid", xdim=(-1.0, 3.0))),
    "aa_order_cylinder_x": lambda f: aa(
        f, geometry=Geometry("cylinder", radius=3.0, span=(-1.0, 3.0),
                             orientation="x")),
    "aa_order_cylinder_z_inverted": lambda f: aa(
        f, geometry=Geometry("cylinder", radius=3.0, orientation="z",
                             invert=True)),
    "aa_order_sphere_static": lambda f: aa(
        f, geometry=Geometry("sphere", reference=(8.0, 2.0, 4.5),
                             radius=2.5)),
    "aa_order_sphere_center": lambda f: aa(
        f, geometry=Geometry("sphere", radius=2.5)),
    # --- per-frame selection-COG geometry (tests_aa.rs:3262-3360, 3588)
    "aa_order_cuboid_dynamic": lambda f: aa(
        f, geometry=Geometry("cuboid", reference="resid 1",
                             xdim=(-1.0, 3.0), ydim=(1.0, 4.0),
                             zdim=(-3.0, 3.0))),
    "aa_order_cylinder_dynamic": lambda f: aa(
        f, geometry=Geometry("cylinder", reference="resid 1", radius=2.1,
                             orientation="y")),
    "aa_order_sphere_dynamic": lambda f: aa(
        f, geometry=Geometry("sphere", reference="resid 1", radius=2.5)),
    "aa_order_sphere_dynamic_inverted": lambda f: aa(
        f, geometry=Geometry("sphere", reference="resid 1", radius=2.5,
                             invert=True)),
    # --- CG limits / errors (tests_cg.rs)
    "cg_order_limit": lambda f: cg(f, min_samples=5000),
    "cg_order_leaflets_limit": lambda f: cg(
        f, min_samples=2000,
        leaflets=LeafletClassification.global_("@membrane", "name PO4")),
    "cg_order_error_leaflets": lambda f: cg(
        f, estimate_error=EstimateError(),
        leaflets=LeafletClassification.global_("@membrane", "name PO4")),
    # --- membrane spanning only one leaflet (tests_cg.rs only_upper)
    "cg_order_leaflets_only_upper": lambda f: cg(
        f, beads="resid 1 to 254",
        leaflets=LeafletClassification.global_(
            "@membrane", "name PO4").with_frequency(Frequency.once())),
    # --- UA geometry (tests_ua.rs)
    "ua_order_cuboid_point": lambda f: ua(
        f, geometry=Geometry("cuboid", reference=(1.5, 2.5, 0.0),
                             xdim=(-1.0, 2.0), ydim=(0.0, 1.0))),
    "ua_order_cylinder_center": lambda f: ua(
        f, geometry=Geometry("cylinder", radius=2.5, orientation="z")),
    # --- UA leaflets + error/convergence (tests_ua.rs)
    "ua_order_leaflets_error": lambda f: ua(
        f, estimate_error=EstimateError(),
        leaflets=LeafletClassification.global_("@membrane", "name r'^P'")),
}


# The split pcpepg fixtures are precision-100 re-encodes of the original
# precision-1000 trajectory the goldens were generated from (±5 pm per
# coordinate). Analyses restricted by tight geometric regions are sensitive
# to boundary-membership flips of individual bonds, shifting printed values
# by up to ~7e-4; compare those with a documented absolute tolerance
# (ua.xtc is the original file — UA geometry cases stay strict).
LOOSE = {
    "aa_order_cuboid_square": 2e-3,
    # whole-membrane selection → every bond crosses the excluded patch's
    # boundary at some frames; max observed delta 7.8e-3. The invert logic
    # itself partitions space exactly (tests/test_geometry.py).
    "aa_order_cuboid_square_inverted": 1e-2,
    "aa_order_cylinder_x": 2e-3,
    "aa_order_sphere_dynamic": 2e-3,
}


@pytest.mark.parametrize("golden", sorted(CASES))
def test_golden(golden, fixtures, tmp_path):
    results = Analysis(**CASES[golden](fixtures)).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / f"{golden}.yaml"),
                    atol=LOOSE.get(golden))
