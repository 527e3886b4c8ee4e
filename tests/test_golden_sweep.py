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
    MembraneNormal,
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
    # --- membrane spanning only one leaflet: every automatic method must
    # agree (tests_cg.rs test_cg_order_leaflets_yaml_only_upper; the
    # clustering cloud spans the whole heads query, so the analyzed subset
    # maps onto the upper cluster)
    "cg_order_leaflets_only_upper": lambda f: cg(
        f, beads="resid 1 to 254",
        leaflets=LeafletClassification.global_(
            "@membrane", "name PO4").with_frequency(Frequency.once())),
    "cg_order_leaflets_only_upper_local": lambda f: cg(
        f, beads="resid 1 to 254",
        leaflets=LeafletClassification.local(
            "@membrane", "name PO4", 2.5).with_frequency(Frequency.once())),
    "cg_order_leaflets_only_upper_individual": lambda f: cg(
        f, beads="resid 1 to 254",
        leaflets=LeafletClassification.individual(
            "name PO4", "name C4A C4B").with_frequency(Frequency.once())),
    "cg_order_leaflets_only_upper_clustering": lambda f: cg(
        f, beads="resid 1 to 254",
        leaflets=LeafletClassification.clustering(
            "name PO4").with_frequency(Frequency.once())),
    # --- full-membrane leaflet-method equivalence: local/individual/
    # clustering all reproduce the same golden as global
    # (tests_aa.rs/tests_cg.rs method × frequency loops)
    "aa_order_leaflets_local": lambda f: aa(
        f, leaflets=LeafletClassification.local("@membrane", "name P", 2.5)),
    "aa_order_leaflets_individual": lambda f: aa(
        f, leaflets=LeafletClassification.individual(
            "name P", "name C218 C316")),
    "cg_order_leaflets_local": lambda f: cg(
        f, leaflets=LeafletClassification.local(
            "@membrane", "name PO4", 2.5)),
    "cg_order_leaflets_individual": lambda f: cg(
        f, leaflets=LeafletClassification.individual(
            "name PO4", "name C4A C4B")),
    "cg_order_leaflets_clustering": lambda f: cg(
        f, leaflets=LeafletClassification.clustering("name PO4")),
    # --- restricted-selection ordermap companions: the YAML of the
    # reference's ordermap tests (tests_aa.rs test_aa_order_maps_basic /
    # _maps_leaflets; ordermaps only add .dat outputs, the YAML depends
    # solely on the selection)
    "aa_order_small": lambda f: aa(
        f, heavy="resname POPC and name C22 C24 C218"),
    "aa_order_leaflets_small": lambda f: aa(
        f, heavy="resname POPC and name C22 C24 C218",
        leaflets=_global_p()),
    # --- cylinder with explicit static center + z-inverted CG variant
    # (tests_aa.rs test_aa_order_geometry_cylinder_static, tests_cg.rs
    # test_cg_order_geometry_cylinder_z_inverted)
    "aa_order_cylinder": lambda f: aa(
        f, heavy="resname POPC and name C22 C24 C218",
        geometry=Geometry("cylinder", reference=(8.0, 2.0, 0.0),
                          radius=2.5, orientation="z")),
    "cg_order_cylinder_z_inverted": lambda f: cg(
        f, geometry=Geometry("cylinder", reference=(3.0, 3.0, 3.0),
                             radius=4.0, orientation="z", invert=True)),
    # --- dynamic membrane normal + once-frequency individual leaflets
    # (tests_aa.rs test_aa_order_leaflets_dynamic_membrane_normal_yaml,
    # tests_cg.rs test_cg_order_leaflets_dynamic_membrane_normal_yaml)
    "aa_order_leaflets_dynamic": lambda f: aa(
        f, membrane_normal=MembraneNormal.dynamic("name P", 2.0),
        leaflets=LeafletClassification.individual(
            "name P", "name C218 C316").with_membrane_normal(
            "z").with_frequency(Frequency.once())),
    "cg_order_leaflets_dynamic": lambda f: cg(
        f, membrane_normal=MembraneNormal.dynamic("name PO4", 2.0),
        leaflets=LeafletClassification.individual(
            "name PO4", "name C4A C4B").with_membrane_normal(
            "z").with_frequency(Frequency.once())),
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


# cases whose golden file differs from the case key (method variants
# sharing one golden)
GOLDEN_ALIAS = {
    "aa_order_leaflets_local": "aa_order_leaflets",
    "aa_order_leaflets_individual": "aa_order_leaflets",
    "cg_order_leaflets_local": "cg_order_leaflets",
    "cg_order_leaflets_individual": "cg_order_leaflets",
    "cg_order_leaflets_clustering": "cg_order_leaflets",
    "cg_order_leaflets_only_upper_local": "cg_order_leaflets_only_upper",
    "cg_order_leaflets_only_upper_individual":
        "cg_order_leaflets_only_upper",
    "cg_order_leaflets_only_upper_clustering":
        "cg_order_leaflets_only_upper",
}


@pytest.mark.parametrize("golden", sorted(CASES))
def test_golden(golden, fixtures, tmp_path):
    results = Analysis(**CASES[golden](fixtures)).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    golden_file = GOLDEN_ALIAS.get(golden, golden)
    assert_eq_order(str(out), str(fixtures / f"{golden_file}.yaml"),
                    atol=LOOSE.get(golden))


# ---------------------------------------------------------------- formats
# Multi-format goldens: one run, compared in every format the reference
# stores (tab/csv/xvg/convergence), mirroring tests_aa.rs / tests_cg.rs /
# tests_ua.rs table/csv/xvg variants.

from gorder_tpu.present.convergence_out import write_convergence  # noqa: E402
from gorder_tpu.present.csv_out import write_csv                  # noqa: E402
from gorder_tpu.present.tab_out import write_tab                  # noqa: E402
from gorder_tpu.present.xvg_out import write_xvg                  # noqa: E402

FORMAT_CASES = {
    "aa_order_different_hydrogen_numbers": (
        lambda f: aa(f, heavy=("(resname POPC and name C29 C210) or "
                               "(resname POPE and element name carbon)"),
                     leaflets=_global_p()),
        {"tab": "aa_order_different_hydrogen_numbers.tab",
         "csv": "aa_order_different_hydrogen_numbers.csv"}),
    "aa_order_error": (
        lambda f: aa(f, estimate_error=EstimateError()),
        {"tab": "aa_order_error.tab", "csv": "aa_order_error.csv",
         "convergence": "aa_order_convergence.xvg"}),
    "aa_order_error_limit": (
        lambda f: aa(f, estimate_error=EstimateError(), min_samples=2000),
        {"tab": "aa_order_error_limit.tab",
         "csv": "aa_order_error_limit.csv"}),
    "aa_order_error_leaflets_limit": (
        lambda f: aa(f, estimate_error=EstimateError(), min_samples=500,
                     leaflets=_global_p()),
        {"tab": "aa_order_error_leaflets_limit.tab",
         "csv": "aa_order_error_leaflets_limit.csv"}),
    "aa_order_leaflets_limit_fmt": (
        lambda f: aa(f, min_samples=500, leaflets=_global_p()),
        {"tab": "aa_order_leaflets_limit.tab",
         "csv": "aa_order_leaflets_limit.csv"}),
    "aa_order_leaflets_fmt": (
        lambda f: aa(f, leaflets=_global_p()),
        {"tab": "aa_order_leaflets.tab", "csv": "aa_order_leaflets.csv",
         "xvg": "aa_order_leaflets_{mol}.xvg"}),
    "aa_order_leaflets_convergence": (
        lambda f: aa(f, leaflets=_global_p(),
                     estimate_error=EstimateError()),
        {"convergence": "aa_order_leaflets_convergence.xvg"}),
    "cg_order_leaflets_convergence": (
        lambda f: cg(f, estimate_error=EstimateError(),
                     leaflets=LeafletClassification.global_(
                         "@membrane", "name PO4")),
        {"xvg": "cg_order_leaflets_{mol}.xvg",
         "convergence": "cg_order_leaflets_convergence.xvg"}),
    "aa_order_convergence_s5": (
        lambda f: aa(f, estimate_error=EstimateError(), step=5),
        {"convergence": "aa_order_convergence_s5.xvg"}),
    "cg_order_convergence_s5": (
        lambda f: cg(f, estimate_error=EstimateError(), step=5),
        {"convergence": "cg_order_convergence_s5.xvg"}),
    "cg_order_error_limit": (
        lambda f: cg(f, estimate_error=EstimateError(), min_samples=5000),
        {"tab": "cg_order_error_limit.tab",
         "csv": "cg_order_error_limit.csv"}),
    "cg_order_error_leaflets_limit": (
        lambda f: cg(f, estimate_error=EstimateError(), min_samples=2000,
                     leaflets=LeafletClassification.global_(
                         "@membrane", "name PO4")),
        {"tab": "cg_order_error_leaflets_limit.tab",
         "csv": "cg_order_error_leaflets_limit.csv"}),
    "cg_order_error_leaflets_fmt": (
        lambda f: cg(f, estimate_error=EstimateError(),
                     leaflets=LeafletClassification.global_(
                         "@membrane", "name PO4")),
        {"tab": "cg_order_error_leaflets.tab",
         "csv": "cg_order_error_leaflets.csv"}),
    "cg_order_leaflets_limit_fmt": (
        lambda f: cg(f, min_samples=2000,
                     leaflets=LeafletClassification.global_(
                         "@membrane", "name PO4")),
        {"tab": "cg_order_leaflets_limit.tab",
         "csv": "cg_order_leaflets_limit.csv"}),
    "ua_order_basic_fmt": (
        lambda f: ua(f, estimate_error=EstimateError()),
        {"xvg": "ua_order_basic_{mol}.xvg",
         "convergence": "ua_order_convergence.xvg"}),
    "ua_order_leaflets_fmt": (
        lambda f: ua(f, estimate_error=EstimateError(),
                     leaflets=LeafletClassification.global_(
                         "@membrane", "name r'^P'")),
        {"tab": "ua_order_leaflets_error.tab",
         "csv": "ua_order_leaflets_error.csv",
         "xvg": "ua_order_leaflets_{mol}.xvg",
         "convergence": "ua_order_leaflets_convergence.xvg"}),
}


@pytest.mark.parametrize("case", sorted(FORMAT_CASES))
def test_format_golden(case, fixtures, tmp_path):
    build, formats = FORMAT_CASES[case]
    results = Analysis(**build(fixtures)).run()
    if "tab" in formats:
        write_tab(results, str(tmp_path / "order.tab"))
        assert_eq_order(str(tmp_path / "order.tab"),
                        str(fixtures / formats["tab"]))
    if "csv" in formats:
        write_csv(results, str(tmp_path / "order.csv"))
        assert_eq_order(str(tmp_path / "order.csv"),
                        str(fixtures / formats["csv"]), skip=0, csv=True)
    if "xvg" in formats:
        write_xvg(results, str(tmp_path / "order.xvg"))
        for mol in [m.name for m in results.molecules]:
            assert_eq_order(str(tmp_path / f"order_{mol}.xvg"),
                            str(fixtures / formats["xvg"].format(mol=mol)))
    if "convergence" in formats:
        write_convergence(results, str(tmp_path / "conv.xvg"))
        assert_eq_order(str(tmp_path / "conv.xvg"),
                        str(fixtures / formats["convergence"]))


# ------------------------------------------------------------ geometry maps
# Ordermaps restricted by a geometric region
# (tests_aa.rs geometry cuboid/cylinder map comparisons). Split-fixture
# precision tolerance as in tests/test_ordermaps.py.

GEOM_MAP_FILES = [
    "ordermap_POPC-C218-87--POPC-H18R-88_full.dat",
    "ordermap_POPC-C22-32--POPC-H2R-33_full.dat",
    "ordermap_POPC-C24-47_full.dat",
    "ordermap_average_full.dat",
]


@pytest.mark.parametrize("shape,min_samples,golden_dir", [
    ("cuboid", 5, "ordermaps_cuboid"),
    ("cylinder", 1, "ordermaps_cylinder"),
])
def test_geometry_ordermaps(shape, min_samples, golden_dir, fixtures,
                            tmp_path):
    from gorder_tpu.input import OrderMapParams
    from gorder_tpu.present.ordermaps_out import write_ordermaps

    from .test_ordermaps import assert_eq_maps

    if shape == "cuboid":
        geometry = Geometry("cuboid", reference=(8.0, 2.0, 0.0),
                            xdim=(-2.0, 4.0), ydim=(-4.0, 1.0))
    else:
        geometry = Geometry("cylinder", reference=(8.0, 2.0, 0.0),
                            radius=2.5, orientation="z")
    out_dir = tmp_path / "maps"
    params = aa(fixtures, heavy="resname POPC and name C22 C24 C218",
                geometry=geometry,
                map=OrderMapParams.parse({
                    "output_directory": str(out_dir),
                    "bin_size": [0.5, 0.5],
                    "min_samples": min_samples,
                }))
    results = Analysis(**params).run()
    write_ordermaps(results, str(out_dir))
    # The precision-100 re-encode moves a few samples across tile borders;
    # with a tight region each tile holds only a handful of samples, so
    # single-sample flips shift sparse tiles by up to ~0.13. Require the
    # bulk of tiles to agree tightly and bound the worst sparse tile.
    import numpy as np

    for name in GEOM_MAP_FILES:
        mine = _load_map(out_dir / "POPC" / name)
        ref = _load_map(fixtures / golden_dir / name)
        np.testing.assert_array_equal(mine[:, :2], ref[:, :2])
        va, vb = mine[:, 2], ref[:, 2]
        both = ~(np.isnan(va) | np.isnan(vb))
        assert (np.isnan(va) != np.isnan(vb)).sum() <= max(
            3, len(va) // 50), name
        diff = np.abs(va[both] - vb[both])
        assert np.median(diff) <= 5e-3, (name, np.median(diff))
        assert (diff > 0.05).mean() <= 0.10, (name, np.sort(diff)[-5:])
        assert diff.max() <= 0.2, (name, diff.max())


def _load_map(path):
    import numpy as np

    rows = [l.split() for l in open(path).read().splitlines()
            if l and not l.startswith(("#", "@", "$"))]
    return np.array([[float(v) for v in r] for r in rows])


def test_aa_order_selected(fixtures, tmp_path):
    """'Supershort' trajectory window (pcpepg_selected.xtc) with global
    leaflets (test_aa_order_leaflets_yaml_supershort)."""
    params = aa(fixtures, leaflets=_global_p())
    params["trajectory"] = str(fixtures / "pcpepg_selected.xtc")
    results = Analysis(**params).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "aa_order_selected.yaml"))


def test_ua_leaflet_export_once(fixtures, tmp_path):
    """UA leaflet collect export with Once frequency (tests_ua.rs,
    golden ua_leaflets_once.yaml)."""
    from gorder_tpu.present.leaflets_out import write_leaflets

    leaflets = LeafletClassification.global_("@membrane", "name r'^P'")
    leaflets.with_frequency(Frequency.once())
    leaflets.with_collect(str(tmp_path / "leaflets.yaml"))
    results = Analysis(**ua(fixtures, leaflets=leaflets)).run()
    write_leaflets(results, str(tmp_path / "leaflets.yaml"))
    assert_eq_order(str(tmp_path / "leaflets.yaml"),
                    str(fixtures / "ua_leaflets_once.yaml"))


def test_from_ndx_partial_selection_frequencies(fixtures, tmp_path):
    """Partial bead selection with FromNdx across frequencies; the ndx file
    count must match the assignment-frame count
    (test_cg_order_leaflets_from_ndx_partial)."""
    ndx = str(fixtures / "ndx" / "cg_leaflets.ndx")
    for freq, files in ((Frequency.once(), [ndx]),
                        (Frequency.every(1), [ndx] * 101),
                        (Frequency.every(20), [ndx] * 6)):
        leaflets = LeafletClassification.from_ndx(
            files, "name PO4", "Upper", "Lower")
        leaflets.with_frequency(freq)
        results = Analysis(**cg(
            fixtures, beads="resname POPC and name C1B C2B C3B C4B",
            leaflets=leaflets)).run()
        out = tmp_path / "order.yaml"
        write_yaml(results, str(out))
        assert_eq_order(str(out),
                        str(fixtures / "cg_order_leaflets_small.yaml"))


def test_ordermap_directory_backup(fixtures, tmp_path):
    """Without --overwrite, an existing ordermap directory is backed up
    whole, preserving its contents (test_cg_order_maps_basic_backup)."""
    from gorder_tpu.input import OrderMapParams
    from gorder_tpu.present.ordermaps_out import write_ordermaps

    out_dir = tmp_path / "maps"
    out_dir.mkdir()
    (out_dir / "to_backup.txt").write_text("This file will be backed up.")

    params = cg(fixtures, beads="resname POPC and name C1B C2B C3B C4B",
                map=OrderMapParams.parse({
                    "output_directory": str(out_dir),
                    "bin_size": [1.0, 1.0], "min_samples": 10}))
    params["overwrite"] = False
    results = Analysis(**params).run()
    write_ordermaps(results, str(out_dir))
    backup = tmp_path / "#maps.1#"
    assert backup.is_dir()
    assert (backup / "to_backup.txt").read_text() == \
        "This file will be backed up."
    assert (out_dir / "POPC" / "ordermap_average_full.dat").is_file()
    assert not (out_dir / "to_backup.txt").exists()


def test_aa_ordermaps_basic_and_leaflets(fixtures, tmp_path):
    """AA ordermaps vs the reference grids (tests_aa.rs
    test_aa_order_maps_basic / _leaflets). The split fixtures are
    precision-100 re-encodes, so sparse 0.1 nm bins use the bulk
    criterion (most tiles exact, outliers bounded)."""
    import numpy as np

    from gorder_tpu.input import OrderMapParams
    from gorder_tpu.present.ordermaps_out import write_ordermaps

    out_dir = tmp_path / "maps"
    params = aa(fixtures, heavy="resname POPC and name C22 C24 C218",
                leaflets=_global_p(),
                map=OrderMapParams.parse({
                    "output_directory": str(out_dir),
                    "bin_size": [0.1, 4.0], "min_samples": 5}))
    results = Analysis(**params).run()
    write_ordermaps(results, str(out_dir))
    # sweep EVERY golden grid the reference stores for this config — the
    # whole tests/files/ordermaps directory comes from this one run
    names = sorted(p.name for p in (fixtures / "ordermaps").glob("*.dat")
                   if p.name.startswith(("ordermap_POPC-",
                                         "ordermap_average_")))
    assert len(names) >= 30, names
    for name in names:
        mine = _load_map(out_dir / "POPC" / name)
        ref = _load_map(fixtures / "ordermaps" / name)
        np.testing.assert_array_equal(mine[:, :2], ref[:, :2])
        va, vb = mine[:, 2], ref[:, 2]
        both = ~(np.isnan(va) | np.isnan(vb))
        assert (np.isnan(va) != np.isnan(vb)).sum() <= max(
            3, len(va) // 25), name
        diff = np.abs(va[both] - vb[both])
        assert np.median(diff) <= 5e-3, (name, np.median(diff))
        assert (diff > 0.05).mean() <= 0.10, (name, np.sort(diff)[-5:])
        assert diff.max() <= 0.25, (name, diff.max())


@pytest.mark.parametrize("mode", ["aa", "cg"])
def test_ordermaps_leaflets_full_system_averages(mode, fixtures, tmp_path):
    """System-wide average ordermaps (full/upper/lower) for a
    whole-membrane leaflet-wise run vs the reference's ordermaps/full and
    ordermaps_cg/full goldens (tests_aa.rs test_aa_order_maps_leaflets_full,
    tests_cg.rs test_cg_order_maps_leaflets_full)."""
    import numpy as np

    from gorder_tpu.input import OrderMapParams
    from gorder_tpu.present.ordermaps_out import write_ordermaps

    out_dir = tmp_path / "maps"
    if mode == "aa":
        params = aa(fixtures, leaflets=_global_p(),
                    map=OrderMapParams.parse({
                        "output_directory": str(out_dir),
                        "bin_size": [0.1, 4.0], "min_samples": 5}))
        golden_dir = fixtures / "ordermaps" / "full"
    else:
        params = cg(fixtures,
                    leaflets=LeafletClassification.global_(
                        "@membrane", "name PO4"),
                    map=OrderMapParams.parse({
                        "output_directory": str(out_dir),
                        "bin_size": [1.0, 1.0], "min_samples": 10}))
        golden_dir = fixtures / "ordermaps_cg" / "full"
    results = Analysis(**params).run()
    write_ordermaps(results, str(out_dir))
    for name in ("ordermap_average_full.dat", "ordermap_average_upper.dat",
                 "ordermap_average_lower.dat"):
        mine = _load_map(out_dir / name)
        ref = _load_map(golden_dir / name)
        np.testing.assert_array_equal(mine[:, :2], ref[:, :2])
        va, vb = mine[:, 2], ref[:, 2]
        both = ~(np.isnan(va) | np.isnan(vb))
        assert (np.isnan(va) != np.isnan(vb)).sum() <= max(
            3, len(va) // 25), name
        diff = np.abs(va[both] - vb[both])
        assert np.median(diff) <= 5e-3, (name, np.median(diff))
        assert diff.max() <= 0.25, (name, diff.max())
