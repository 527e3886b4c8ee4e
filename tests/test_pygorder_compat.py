"""pygorder API compatibility: code written against the reference's Python
package (pygorder/python/gorder/*.pyi signatures) runs unchanged."""

import numpy as np
import pytest

import gorder_tpu as gorder

from .golden import assert_eq_order


def test_pygorder_style_full_analysis(fixtures, tmp_path):
    analysis = gorder.Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=gorder.analysis_types.CGOrder("@membrane"),
        leaflets=gorder.leaflets.GlobalClassification(
            "@membrane", "name PO4"),
        output_yaml=str(tmp_path / "order.yaml"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    results.write()
    assert_eq_order(str(tmp_path / "order.yaml"),
                    str(fixtures / "cg_order_leaflets.yaml"))


def test_pygorder_style_aa_with_everything(fixtures, tmp_path):
    analysis = gorder.Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=gorder.analysis_types.AAOrder(
            heavy_atoms="resname POPC and name C22 C24 C218",
            hydrogens="@membrane and element name hydrogen"),
        geometry=gorder.geometry.Cuboid(
            xdim=[-2.0, 4.0], ydim=[-4.0, 1.0], reference=[8.0, 2.0, 0.0]),
        ordermap=gorder.ordermap.OrderMap(
            output_directory=str(tmp_path / "maps"), bin_size=[0.5, 0.5],
            min_samples=5),
        estimate_error=gorder.estimate_error.EstimateError(n_blocks=5),
        membrane_normal="z",
        silent=True, overwrite=True,
    )
    results = analysis.run()
    assert np.isfinite(results.average_order.total.value)
    assert results.molecules[0].name == "POPC"


def test_pygorder_style_variants():
    lc = gorder.leaflets.LocalClassification(
        "@membrane", "name P", 2.5, frequency=gorder.Frequency.once(),
        flip=True)
    assert lc.kind == "local" and lc.radius == 2.5 and lc.flip
    lc = gorder.leaflets.IndividualClassification(
        "name P", "name C218 C316", membrane_normal="x")
    assert lc.kind == "individual" and lc.membrane_normal == "x"
    lc = gorder.leaflets.ClusteringClassification("name P")
    assert lc.kind == "clustering"
    lc = gorder.leaflets.SphericalClusteringClassification("name P")
    assert lc.kind == "spherical"
    lc = gorder.leaflets.ManualClassification(
        {"POPC": [[1, 0], [0, 1]]})
    assert lc.kind == "from_map"
    lc = gorder.leaflets.NdxClassification(
        ["a.ndx"], "name P", "Upper", "Lower")
    assert lc.kind == "from_ndx" and lc.ndx == ["a.ndx"]
    ua = gorder.analysis_types.UAOrder(saturated="name C1")
    assert ua.kind == "ua"
    g = gorder.geometry.Cylinder(3.0, "x", span=[-1.0, 3.0])
    assert g.kind == "cylinder" and g.orientation == "x"
    mn = gorder.membrane_normal.DynamicNormal("name P", 2.5)
    assert mn.kind == "dynamic" and mn.radius == 2.5
    with pytest.raises(gorder.exceptions.ConfigError):
        gorder.Analysis(structure="x.txt", trajectory="t.xtc",
                        analysis_type=gorder.analysis_types.CGOrder("all"))


def test_membrane_normal_string_and_map_coercion(fixtures):
    a = gorder.Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),
        analysis_type=gorder.analysis_types.CGOrder("@membrane"),
        membrane_normal="x", silent=True,
    )
    assert a.membrane_normal.kind == "static"
    assert a.membrane_normal.axis == "x"


def test_results_lookup_and_numpy_exports(fixtures):
    analysis = gorder.Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),
        analysis_type=gorder.analysis_types.CGOrder("@membrane"),
        leaflets=gorder.leaflets.GlobalClassification(
            "@membrane", "name PO4", collect=True),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    popc = results.get_molecule("POPC")
    bond = popc.get_bond(4, 5)        # C1A(4)-D2A(5)
    assert bond is popc.get_bond(5, 4)
    assert np.isfinite(bond.order.total.value)
    with pytest.raises(KeyError):
        popc.get_bond(4, 999)

    lf = results.leaflets_for_molecule("POPC")
    assert lf is not None and lf.dtype == np.uint8
    assert lf.shape[1] == 242 and set(np.unique(lf)) <= {0, 1}
    assert results.leaflets_for_molecule("NOPE") is None


def test_results_atom_lookup_aa(fixtures):
    analysis = gorder.Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=str(fixtures / "split" / "pcpepg1.xtc"),
        analysis_type=gorder.analysis_types.AAOrder(
            "resname POPC and name C22", "@membrane and element name hydrogen"),
        membrane_normal=gorder.membrane_normal.DynamicNormal(
            "name P", 2.5, collect=True),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    popc = results.get_molecule("POPC")
    atom = popc.get_atom(popc.atoms[0].atom.rel_index)
    bond = atom.get_bond(atom.bonds[0].atom2.rel_index)
    assert np.isfinite(bond.order.total.value)
    nrm = results.normals_for_molecule("POPC")
    assert nrm is not None and nrm.shape[2] == 3
    assert np.allclose(np.linalg.norm(nrm, axis=2), 1.0, atol=1e-5)


def test_all_outputs_write(fixtures, tmp_path):
    """pygorder test_run_write.py:189 test_all_outputs: all four formats
    through the drop-in namespace match the AA goldens."""
    import gorder_tpu.compat as gorder

    from .golden import assert_eq_order

    analysis = gorder.Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=gorder.analysis_types.AAOrder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        output_yaml=str(tmp_path / "order.yaml"),
        output_tab=str(tmp_path / "order.tab"),
        output_csv=str(tmp_path / "order.csv"),
        output_xvg=str(tmp_path / "order.xvg"),
        silent=True, overwrite=True)
    analysis.run().write()

    assert_eq_order(str(tmp_path / "order.yaml"),
                    str(fixtures / "aa_order_basic.yaml"))
    assert_eq_order(str(tmp_path / "order.tab"),
                    str(fixtures / "aa_order_basic.tab"))
    assert_eq_order(str(tmp_path / "order.csv"),
                    str(fixtures / "aa_order_basic.csv"), skip=0, csv=True)
    for mol in ("POPC", "POPE", "POPG"):
        assert_eq_order(str(tmp_path / f"order_{mol}.xvg"),
                        str(fixtures / f"aa_order_basic_{mol}.xvg"))


def test_ndx_group_selection_write(fixtures, tmp_path):
    """pygorder test_run_write.py:508 test_ndx: NDX group names act as
    selections."""
    import gorder_tpu.compat as gorder

    from .golden import assert_eq_order

    analysis = gorder.Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        index=str(fixtures / "cg.ndx"),
        analysis_type=gorder.analysis_types.CGOrder("Membrane"),
        output_yaml=str(tmp_path / "order.yaml"),
        silent=True, overwrite=True)
    analysis.run().write()
    assert_eq_order(str(tmp_path / "order.yaml"),
                    str(fixtures / "cg_order_basic.yaml"))


def test_gro_bonds_write(fixtures, tmp_path):
    """pygorder test_run_write.py:532 test_gro_bonds: GRO structure +
    external .bnd bonds reproduce the TPR-based results."""
    import gorder_tpu.compat as gorder

    from .golden import assert_eq_order

    analysis = gorder.Analysis(
        structure=str(fixtures / "pcpepg.gro"),
        bonds=str(fixtures / "pcpepg.bnd"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=gorder.analysis_types.AAOrder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        output_yaml=str(tmp_path / "order.yaml"),
        silent=True, overwrite=True)
    analysis.run().write()
    assert_eq_order(str(tmp_path / "order.yaml"),
                    str(fixtures / "aa_order_basic.yaml"))


def test_min_samples_write(fixtures, tmp_path):
    """pygorder test_run_write.py:725 test_min_samples."""
    import gorder_tpu.compat as gorder

    from .golden import assert_eq_order

    analysis = gorder.Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=gorder.analysis_types.AAOrder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        min_samples=2000,
        output_yaml=str(tmp_path / "order.yaml"),
        silent=True, overwrite=True)
    analysis.run().write()
    assert_eq_order(str(tmp_path / "order.yaml"),
                    str(fixtures / "aa_order_limit.yaml"))


def test_ua_order_from_aa_write(fixtures, tmp_path):
    """pygorder test_run_write.py:1185 test_ua_order_from_aa: UA analysis
    of an atomistic structure, ignoring real hydrogens."""
    import gorder_tpu.compat as gorder

    from .golden import assert_eq_order

    analysis = gorder.Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=gorder.analysis_types.UAOrder(
            saturated="@membrane and element name carbon and not name "
                      "C29 C210 C21 C31",
            unsaturated="@membrane and name C29 C210",
            ignore="element name hydrogen"),
        output_yaml=str(tmp_path / "order.yaml"),
        silent=True, overwrite=True)
    analysis.run().write()
    assert_eq_order(str(tmp_path / "order.yaml"),
                    str(fixtures / "ua_order_from_aa.yaml"))
