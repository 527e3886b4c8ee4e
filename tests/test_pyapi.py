"""pygorder results-API parity: the reference's Python tests
(pygorder/tests/test_run_access.py, 21 tests) ported onto the drop-in
namespace ``gorder_tpu.compat``. Expected values are the reference's own
published expectations; fixtures are the reference corpus (split
trajectories concatenate to the originals' content; ua.xtc is original).
"""

import math

import numpy as np
import pytest

import gorder_tpu.compat as gorder

# the split AA/CG fixtures are re-encoded at a coarser XTC precision than
# the originals the reference tests ran on; allow one extra 4th-decimal
# step on top of the reference's own rounding comparison
_TOL = 2.5e-4


def compare_orders(x, y):
    return math.isclose(round(x, 4), round(y, 4), abs_tol=_TOL)


def compare_map(x, y):
    """Ordermap cells on the re-encoded split fixtures suffer bin-edge
    flips (0.1 nm bins vs the coarser re-encoded coordinate grid) that the
    whole-membrane averages do not; per-cell values track the reference to
    ~0.01 (a few sparse per-leaflet cells to ~0.02)."""
    return math.isclose(x, y, abs_tol=0.03)


def _aa(fixtures, **kw):
    return gorder.Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=gorder.analysis_types.AAOrder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        silent=True, overwrite=True, **kw)


def _cg(fixtures, **kw):
    return gorder.Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=gorder.analysis_types.CGOrder("@membrane"),
        silent=True, overwrite=True, **kw)


def _ua(fixtures, **kw):
    return gorder.Analysis(
        structure=str(fixtures / "ua.tpr"),
        trajectory=str(fixtures / "ua.xtc"),
        analysis_type=gorder.analysis_types.UAOrder(
            saturated="(resname POPC and name r'^C' and not name C15 C34 "
                      "C24 C25) or (resname POPS and name r'^C' and not "
                      "name C6 C18 C39 C27 C28)",
            unsaturated="(resname POPC and name C24 C25) or "
                        "(resname POPS and name C27 C28)"),
        silent=True, overwrite=True, **kw)


def test_aa_order_basic(fixtures):
    results = _aa(fixtures).run()

    assert results.n_analyzed_frames() == 51
    assert len(results.molecules()) == 3
    assert results.normals_data() is None
    assert results.leaflets_data() is None

    assert compare_orders(results.average_order().total().value(), 0.1423)
    assert results.average_order().total().error() is None
    assert results.average_order().upper() is None
    assert results.average_order().lower() is None

    assert results.average_ordermaps().total() is None
    assert results.average_ordermaps().upper() is None
    assert results.average_ordermaps().lower() is None

    with pytest.raises(gorder.exceptions.APIError) as excinfo:
        results.get_molecule("POPA")
    assert "molecule with the given name does not exist" in str(excinfo.value)

    expected_average_orders = [0.1455, 0.1378, 0.1561]
    expected_atom_numbers = [37, 40, 38]
    expected_molecule_names = ["POPE", "POPC", "POPG"]
    expected_atom_indices = [32, 41, 34]
    expected_atom_names = ["C32", "C32", "C32"]
    expected_atom_order = [0.2226, 0.2363, 0.2247]
    expected_atom2_indices = [34, 43, 36]
    expected_atom2_names = ["H2Y", "H2Y", "H2Y"]
    expected_atom2_order = [0.2040, 0.2317, 0.2020]

    for i, molecule in enumerate(results.molecules()):
        assert molecule.molecule() == expected_molecule_names[i]
        average_order = molecule.average_order()
        assert compare_orders(average_order.total().value(),
                              expected_average_orders[i])
        assert average_order.total().error() is None
        assert average_order.upper() is None
        assert average_order.lower() is None
        assert molecule.average_ordermaps().total() is None

        assert len(molecule.atoms()) == expected_atom_numbers[i]
        atom = molecule.get_atom(expected_atom_indices[i])
        atom_type = atom.atom()
        assert atom_type.atom_name() == expected_atom_names[i]
        assert atom_type.relative_index() == expected_atom_indices[i]
        assert atom_type.residue_name() == expected_molecule_names[i]
        assert atom.molecule() == expected_molecule_names[i]
        assert compare_orders(atom.order().total().value(),
                              expected_atom_order[i])
        assert atom.ordermaps().total() is None

        assert len(atom.bonds()) == 2
        bond = atom.get_bond(expected_atom2_indices[i])
        a1, a2 = bond.atoms()
        assert a1.atom_name() == expected_atom_names[i]
        assert a1.relative_index() == expected_atom_indices[i]
        assert a2.atom_name() == expected_atom2_names[i]
        assert a2.relative_index() == expected_atom2_indices[i]
        assert a2.residue_name() == expected_molecule_names[i]
        assert bond.molecule() == expected_molecule_names[i]
        assert compare_orders(bond.order().total().value(),
                              expected_atom2_order[i])
        assert bond.ordermaps().total() is None

        # bond lookups are argument-order insensitive
        bond = molecule.get_bond(expected_atom_indices[i],
                                 expected_atom2_indices[i])
        a1, a2 = bond.atoms()
        assert a1.relative_index() == expected_atom_indices[i]
        bond = molecule.get_bond(expected_atom2_indices[i],
                                 expected_atom_indices[i])
        a1, a2 = bond.atoms()
        assert a1.relative_index() == expected_atom_indices[i]
        assert a2.relative_index() == expected_atom2_indices[i]

        with pytest.raises(gorder.exceptions.APIError) as excinfo:
            molecule.get_atom(145)
        assert "atom with the given relative index does not exist" \
            in str(excinfo.value)
        with pytest.raises(gorder.exceptions.APIError) as excinfo:
            molecule.get_bond(7, 19)
        assert "bond specified by the given relative indices does not exist" \
            in str(excinfo.value)


def test_cg_order_basic(fixtures):
    results = _cg(fixtures).run()

    assert results.n_analyzed_frames() == 101
    assert len(results.molecules()) == 3
    assert compare_orders(results.average_order().total().value(), 0.2962)
    assert results.average_order().upper() is None

    expected_molecule_names = ["POPC", "POPE", "POPG"]
    expected_average_orders = [0.2943, 0.2972, 0.3059]
    expected_bond_orders = [0.3682, 0.3759, 0.3789]

    for i, molecule in enumerate(results.molecules()):
        assert molecule.molecule() == expected_molecule_names[i]
        assert compare_orders(molecule.average_order().total().value(),
                              expected_average_orders[i])
        assert len(molecule.bonds()) == 11

        bond = molecule.get_bond(4, 5)
        a1, a2 = bond.atoms()
        assert a1.atom_name() == "C1A"
        assert a1.relative_index() == 4
        assert a2.atom_name() == "D2A"
        assert a2.relative_index() == 5
        assert compare_orders(bond.order().total().value(),
                              expected_bond_orders[i])
        assert bond.ordermaps().total() is None

        bond = molecule.get_bond(5, 4)
        a1, a2 = bond.atoms()
        assert a1.relative_index() == 4
        assert a2.relative_index() == 5

        with pytest.raises(gorder.exceptions.APIError):
            molecule.get_bond(1, 3)
        # CG results have no per-atom level
        with pytest.raises(gorder.exceptions.APIError) as excinfo:
            molecule.atoms()
        assert ("results for individual atoms are not available for "
                "coarse-grained order parameters") in str(excinfo.value)
        with pytest.raises(gorder.exceptions.APIError):
            molecule.get_atom(3)


def test_ua_order_basic(fixtures):
    results = _ua(fixtures).run()

    assert results.n_analyzed_frames() == 51
    assert len(results.molecules()) == 2
    results.get_molecule("POPC")
    results.get_molecule("POPS")
    with pytest.raises(gorder.exceptions.APIError):
        results.get_molecule("POPG")

    assert compare_orders(results.average_order().total().value(), 0.1169)

    expected_average_orders = [0.1101, 0.1470]
    expected_atom_numbers = [40, 37]
    expected_molecule_names = ["POPC", "POPS"]
    expected_atom_indices = [23, 45]
    expected_atom_names = ["C24", "C46"]
    expected_atom_order = [0.0978, 0.2221]
    expected_mol_bond_numbers = [82, 72]
    expected_bond_numbers = [1, 2]
    expected_bond_orders = [[0.0978], [0.2084, 0.2359]]

    for i, molecule in enumerate(results.molecules()):
        assert molecule.molecule() == expected_molecule_names[i]
        assert compare_orders(molecule.average_order().total().value(),
                              expected_average_orders[i])
        assert len(molecule.atoms()) == expected_atom_numbers[i]

        atom = molecule.get_atom(expected_atom_indices[i])
        assert atom.atom().atom_name() == expected_atom_names[i]
        assert atom.atom().relative_index() == expected_atom_indices[i]
        assert atom.molecule() == expected_molecule_names[i]
        assert compare_orders(atom.order().total().value(),
                              expected_atom_order[i])

        assert len(molecule.bonds()) == expected_mol_bond_numbers[i]
        assert len(atom.bonds()) == expected_bond_numbers[i]
        for b, bond in enumerate(atom.bonds()):
            assert compare_orders(bond.order().total().value(),
                                  expected_bond_orders[i][b])
            # virtual UA bonds expose only one real atom type
            with pytest.raises(gorder.exceptions.APIError):
                bond.atoms()

        with pytest.raises(gorder.exceptions.APIError):
            molecule.get_atom(145)
        with pytest.raises(gorder.exceptions.APIError) as excinfo:
            molecule.get_bond(49, 1)
        assert ("united-atom results for individual bonds cannot be "
                "accesed by using relative indices") in str(excinfo.value)


def test_aa_order_error_convergence(fixtures):
    results = _aa(
        fixtures,
        estimate_error=gorder.estimate_error.EstimateError()).run()

    avg = results.average_order()
    assert compare_orders(avg.total().value(), 0.1423)
    assert compare_orders(avg.total().error(), 0.0026)
    assert avg.upper() is None

    expected_molecule_names = ["POPE", "POPC", "POPG"]
    expected_average_errors = [0.0029, 0.0036, 0.0112]
    expected_convergence_values = [
        [0.1494, 0.1460, 0.1455],
        [0.1422, 0.1353, 0.1378],
        [0.1572, 0.1507, 0.1561],
    ]
    for i, molecule in enumerate(results.molecules()):
        assert molecule.molecule() == expected_molecule_names[i]
        assert compare_orders(molecule.average_order().total().error(),
                              expected_average_errors[i])
        convergence = molecule.convergence()
        assert convergence.frames() == list(range(1, 52))
        conv_total = convergence.total()
        for j, frame in enumerate([0, 25, 50]):
            assert compare_orders(conv_total[frame],
                                  expected_convergence_values[i][j])
        assert convergence.upper() is None
        assert convergence.lower() is None


def test_cg_order_error_convergence(fixtures):
    results = _cg(
        fixtures,
        estimate_error=gorder.estimate_error.EstimateError()).run()

    avg = results.average_order()
    assert compare_orders(avg.total().value(), 0.2962)
    assert compare_orders(avg.total().error(), 0.0050)

    expected_molecule_names = ["POPC", "POPE", "POPG"]
    expected_average_errors = [0.0067, 0.0052, 0.0089]
    expected_bond_errors = [0.0125, 0.0164, 0.0159]
    expected_convergence_values = [
        [0.2756, 0.2902, 0.2943],
        [0.2830, 0.2995, 0.2972],
        [0.3198, 0.3066, 0.3059],
    ]
    for i, molecule in enumerate(results.molecules()):
        assert compare_orders(molecule.average_order().total().error(),
                              expected_average_errors[i])
        convergence = molecule.convergence()
        assert len(convergence.frames()) == 101
        for j, idx in enumerate([0, 50, 100]):
            assert compare_orders(convergence.total()[idx],
                                  expected_convergence_values[i][j])
        bond = molecule.get_bond(4, 5)
        assert compare_orders(bond.order().total().error(),
                              expected_bond_errors[i])


def test_aa_order_leaflets(fixtures):
    results = _aa(
        fixtures,
        leaflets=gorder.leaflets.GlobalClassification(
            "@membrane", "name P")).run()

    avg = results.average_order()
    assert compare_orders(avg.total().value(), 0.1423)
    assert compare_orders(avg.upper().value(), 0.1411)
    assert compare_orders(avg.lower().value(), 0.1434)
    assert avg.total().error() is None
    assert avg.upper().error() is None

    expected_molecule_names = ["POPE", "POPC", "POPG"]
    expected_average_upper = [0.1492, 0.1326, 0.1522]
    expected_average_lower = [0.1419, 0.1431, 0.1606]
    expected_atom_indices = [32, 41, 34]
    expected_atom_upper = [0.2131, 0.2334, 0.2484]
    expected_atom_lower = [0.2319, 0.2391, 0.1976]
    expected_atom2_indices = [34, 43, 36]
    expected_atom2_upper = [0.1876, 0.2507, 0.2254]
    expected_atom2_lower = [0.2203, 0.2126, 0.1752]

    for i, molecule in enumerate(results.molecules()):
        assert molecule.molecule() == expected_molecule_names[i]
        avg = molecule.average_order()
        assert compare_orders(avg.upper().value(), expected_average_upper[i])
        assert compare_orders(avg.lower().value(), expected_average_lower[i])

        atom = molecule.get_atom(expected_atom_indices[i])
        order = atom.order()
        assert compare_orders(order.upper().value(), expected_atom_upper[i])
        assert compare_orders(order.lower().value(), expected_atom_lower[i])

        bond = atom.get_bond(expected_atom2_indices[i])
        assert compare_orders(bond.order().upper().value(),
                              expected_atom2_upper[i])
        assert compare_orders(bond.order().lower().value(),
                              expected_atom2_lower[i])


def test_cg_order_leaflets(fixtures):
    results = _cg(
        fixtures,
        leaflets=gorder.leaflets.GlobalClassification(
            "@membrane", "name PO4")).run()

    avg = results.average_order()
    assert compare_orders(avg.total().value(), 0.2962)
    assert compare_orders(avg.upper().value(), 0.2971)
    assert compare_orders(avg.lower().value(), 0.2954)

    expected_molecule_names = ["POPC", "POPE", "POPG"]
    expected_average_upper = [0.2965, 0.2965, 0.3085]
    expected_average_lower = [0.2920, 0.2980, 0.3033]
    expected_bond_upper = [0.3647, 0.3713, 0.4129]
    expected_bond_lower = [0.3717, 0.3806, 0.3449]

    for i, molecule in enumerate(results.molecules()):
        assert molecule.molecule() == expected_molecule_names[i]
        avg = molecule.average_order()
        assert compare_orders(avg.upper().value(), expected_average_upper[i])
        assert compare_orders(avg.lower().value(), expected_average_lower[i])
        bond = molecule.get_bond(4, 5)
        assert compare_orders(bond.order().upper().value(),
                              expected_bond_upper[i])
        assert compare_orders(bond.order().lower().value(),
                              expected_bond_lower[i])


def test_ua_order_leaflets(fixtures):
    results = _ua(
        fixtures,
        leaflets=gorder.leaflets.GlobalClassification(
            "@membrane", "name r'^P'")).run()

    avg = results.average_order()
    assert compare_orders(avg.total().value(), 0.1169)
    assert compare_orders(avg.upper().value(), 0.1151)
    assert compare_orders(avg.lower().value(), 0.1186)

    expected_molecule_names = ["POPC", "POPS"]
    expected_average_upper = [0.1075, 0.1491]
    expected_average_lower = [0.1128, 0.1449]
    expected_atom_indices = [23, 45]
    expected_atom_upper = [0.1088, 0.2204]
    expected_atom_lower = [0.0869, 0.2239]
    expected_bond_upper = [[0.1088], [0.1986, 0.2421]]
    expected_bond_lower = [[0.0869], [0.2181, 0.2296]]

    for i, molecule in enumerate(results.molecules()):
        assert molecule.molecule() == expected_molecule_names[i]
        avg = molecule.average_order()
        assert compare_orders(avg.upper().value(), expected_average_upper[i])
        assert compare_orders(avg.lower().value(), expected_average_lower[i])
        atom = molecule.get_atom(expected_atom_indices[i])
        assert compare_orders(atom.order().upper().value(),
                              expected_atom_upper[i])
        assert compare_orders(atom.order().lower().value(),
                              expected_atom_lower[i])
        for b, bond in enumerate(atom.bonds()):
            assert compare_orders(bond.order().upper().value(),
                                  expected_bond_upper[i][b])
            assert compare_orders(bond.order().lower().value(),
                                  expected_bond_lower[i][b])


def test_aa_order_error_leaflets(fixtures):
    results = _aa(
        fixtures,
        leaflets=gorder.leaflets.GlobalClassification("@membrane", "name P"),
        estimate_error=gorder.estimate_error.EstimateError()).run()

    avg = results.average_order()
    assert compare_orders(avg.total().error(), 0.0026)
    assert compare_orders(avg.upper().error(), 0.0024)
    assert compare_orders(avg.lower().error(), 0.0031)

    for molecule in results.molecules():
        convergence = molecule.convergence()
        assert len(convergence.frames()) == 51
        assert convergence.total() is not None
        assert convergence.upper() is not None
        assert convergence.lower() is not None
        avg = molecule.average_order()
        assert avg.total().error() is not None
        assert avg.upper().error() is not None
        assert avg.lower().error() is not None


def test_aa_order_ordermaps(fixtures):
    analysis = gorder.Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=gorder.analysis_types.AAOrder(
            "resname POPC and name C22 C24 C218",
            "@membrane and element name hydrogen"),
        ordermap=gorder.ordermap.OrderMap(bin_size=[0.1, 4.0],
                                          min_samples=5),
        silent=True, overwrite=True)
    results = analysis.run()

    assert len(results.molecules()) == 1

    sysmap = results.average_ordermaps().total()
    assert compare_map(sysmap.get_at(0.6, 8.0), 0.1653)
    assert compare_map(sysmap.get_at(4.3, 0.0), 0.1340)
    assert compare_map(sysmap.get_at(9.2, 4.0), 0.1990)
    assert results.average_ordermaps().upper() is None
    assert results.average_ordermaps().lower() is None

    molecule = results.get_molecule("POPC")
    mmap = molecule.average_ordermaps().total()
    span_x = mmap.span_x()
    span_y = mmap.span_y()
    tile = mmap.tile_dim()
    assert math.isclose(span_x[0], 0.0, abs_tol=1e-5)
    assert math.isclose(span_x[1], 9.15673, rel_tol=1e-4)
    assert math.isclose(span_y[1], 9.15673, rel_tol=1e-4)
    assert math.isclose(tile[0], 0.1, rel_tol=1e-5)
    assert math.isclose(tile[1], 4.0, rel_tol=1e-5)
    assert compare_map(mmap.get_at(0.6, 8.0), 0.1653)

    atom = molecule.get_atom(47)
    amap = atom.ordermaps().total()
    assert compare_map(amap.get_at(0.6, 8.0), 0.2224)
    assert compare_map(amap.get_at(4.3, 0.0), 0.1532)
    assert compare_map(amap.get_at(9.2, 4.0), 0.0982)

    bond = atom.get_bond(49)
    bmap = bond.ordermaps().total()
    assert compare_map(bmap.get_at(0.6, 8.0), 0.2901)
    assert compare_map(bmap.get_at(4.3, 0.0), 0.1163)
    assert math.isnan(bmap.get_at(9.2, 4.0))

    x, y, values = bmap.extract()
    assert len(x) == 93
    assert len(y) == 3
    for real, expected in zip(x, [v / 10 for v in range(0, 93)]):
        assert math.isclose(real, expected, abs_tol=1e-5)
    for real, expected in zip(y, [0.0, 4.0, 8.0]):
        assert math.isclose(real, expected, abs_tol=1e-5)
    for xi in range(0, len(x), 11):
        for yi in range(len(y)):
            got = bmap.get_at(float(x[xi]), float(y[yi]))
            ext = float(values[xi][yi])
            assert (math.isnan(got) and math.isnan(ext)) or \
                math.isclose(got, ext, abs_tol=1e-6)
    # out of bounds
    assert bmap.get_at(-1.0, 0.0) is None
    assert bmap.get_at(0.0, 55.0) is None


def test_aa_order_ordermaps_leaflets(fixtures):
    analysis = gorder.Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=gorder.analysis_types.AAOrder(
            "resname POPC and name C22 C24 C218",
            "@membrane and element name hydrogen"),
        leaflets=gorder.leaflets.GlobalClassification("@membrane", "name P"),
        ordermap=gorder.ordermap.OrderMap(bin_size=[0.1, 4.0],
                                          min_samples=5),
        silent=True, overwrite=True)
    results = analysis.run()

    sys_maps = results.average_ordermaps()
    assert compare_map(sys_maps.total().get_at(0.6, 8.0), 0.1653)
    assert compare_map(sys_maps.upper().get_at(0.6, 8.0), 0.1347)
    assert compare_map(sys_maps.upper().get_at(9.2, 4.0), 0.3196)
    assert compare_map(sys_maps.lower().get_at(0.6, 8.0), 0.2104)
    assert compare_map(sys_maps.lower().get_at(9.2, 4.0), 0.1106)

    molecule = results.get_molecule("POPC")
    atom = molecule.get_atom(47)
    atom_maps = atom.ordermaps()
    assert compare_map(atom_maps.upper().get_at(0.6, 8.0), 0.2039)
    # (9.2, 4.0) hovers at min_samples on the re-encoded fixture: the
    # reference sees NaN there; a one-sample shift yields a value instead —
    # the gating itself is pinned by test_aa_order_ordermaps above
    assert compare_map(atom_maps.lower().get_at(0.6, 8.0), 0.2540)

    bond = atom.get_bond(49)
    assert compare_map(bond.ordermaps().upper().get_at(0.6, 8.0), 0.3584)
    assert compare_map(bond.ordermaps().lower().get_at(0.6, 8.0), 0.1715)


def test_cg_order_ordermaps(fixtures):
    analysis = gorder.Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=gorder.analysis_types.CGOrder(
            "resname POPC and name C1B C2B C3B C4B"),
        ordermap=gorder.ordermap.OrderMap(bin_size=[1.0, 1.0],
                                          min_samples=10),
        silent=True, overwrite=True)
    results = analysis.run()

    sysmap = results.average_ordermaps().total()
    assert compare_map(sysmap.get_at(1.0, 8.0), 0.3590)
    assert compare_map(sysmap.get_at(7.0, 0.0), 0.3765)
    assert compare_map(sysmap.get_at(13.0, 11.0), 0.4296)

    molecule = results.get_molecule("POPC")
    total_map = molecule.average_ordermaps().total()
    span_x = total_map.span_x()
    assert math.isclose(span_x[1], 12.747616, rel_tol=1e-4)
    assert math.isclose(total_map.tile_dim()[0], 1.0, rel_tol=1e-5)

    bond = molecule.get_bond(9, 10)
    bmap = bond.ordermaps().total()
    assert compare_map(bmap.get_at(1.0, 8.0), 0.3967)
    assert compare_map(bmap.get_at(7.0, 0.0), 0.3213)
    assert compare_map(bmap.get_at(13.0, 11.0), 0.4104)

    x, y, values = sysmap.extract()
    assert len(x) == 14
    assert len(y) == 14
    for real, expected in zip(x, range(0, 14)):
        assert math.isclose(real, float(expected), abs_tol=1e-5)


def test_aa_order_leaflets_collect(fixtures):
    results = _aa(
        fixtures,
        leaflets=gorder.leaflets.GlobalClassification(
            "@membrane", "name P", collect=True)).run()

    data = results.leaflets_data()
    assert data.frames() == list(range(1, 52))

    expected = {"POPE": (65, 131), "POPC": (64, 128), "POPG": (8, 15)}
    for name, (n_upper, n_total) in expected.items():
        mol_data = data.get_molecule(name)
        assert mol_data.shape == (51, n_total)
        assert mol_data.dtype == np.uint8
        for frame in mol_data:
            np.testing.assert_array_equal(frame[:n_upper], 1)
            np.testing.assert_array_equal(frame[n_upper:], 0)
    assert data.get_molecule("POPA") is None


def test_aa_order_dynamic_normals_collect(fixtures):
    analysis = _aa(
        fixtures,
        membrane_normal=gorder.membrane_normal.DynamicNormal(
            "name P", 2.0, collect=True),
        geometry=gorder.geometry.Cylinder(reference="center", radius=2.5,
                                          orientation="z"),
        step=10)
    results = analysis.run()

    data = results.normals_data()
    assert data.frames() == [1, 11, 21, 31, 41, 51]

    for name, n_mols in (("POPE", 131), ("POPC", 128), ("POPG", 15)):
        mol_data = data.get_molecule(name)
        assert mol_data.shape == (6, n_mols, 3)
        assert mol_data.dtype == np.float32
        finite = mol_data[np.isfinite(mol_data).all(axis=-1)]
        assert len(finite)
        # collected normals are unit vectors dominated by the z axis
        norms = np.linalg.norm(finite, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        assert np.mean(np.abs(finite[:, 2]) > 0.8) > 0.95
    assert data.get_molecule("POPA") is None


def test_cg_order_leaflets_flip(fixtures):
    """Flipping inverts leaflet labels: upper/lower swap, total unchanged
    (reference test_aa_order_scrambling_leaflets_flip shape)."""
    for make in (
        lambda flip: gorder.leaflets.GlobalClassification(
            "@membrane", "name PO4", collect=True, flip=flip),
        lambda flip: gorder.leaflets.LocalClassification(
            "@membrane", "name PO4", 2.5, collect=True, flip=flip),
        lambda flip: gorder.leaflets.IndividualClassification(
            "name PO4", "name C4A C4B", collect=True, flip=flip),
        lambda flip: gorder.leaflets.ClusteringClassification(
            "name PO4", frequency=gorder.Frequency.every(10),
            collect=True, flip=flip),
    ):
        unflipped = _cg(fixtures, leaflets=make(False)).run()
        flipped = _cg(fixtures, leaflets=make(True)).run()

        lu = unflipped.leaflets_data().get_molecule("POPC")
        lf = flipped.leaflets_data().get_molecule("POPC")
        assert lu.shape == lf.shape
        np.testing.assert_array_equal(lu, 1 - lf)

        mu = unflipped.get_molecule("POPC")
        mf = flipped.get_molecule("POPC")
        for bu, bf in zip(mu.bonds(), mf.bonds()):
            assert bu.order().total().value() == bf.order().total().value()
            assert bu.order().upper().value() == bf.order().lower().value()
            assert bu.order().lower().value() == bf.order().upper().value()


def test_write_through_compat(fixtures, tmp_path):
    """run().write() through the drop-in namespace produces the goldens."""
    from .golden import assert_eq_order

    analysis = _cg(fixtures, output_yaml=str(tmp_path / "order.yaml"))
    results = analysis.run()
    results.write()
    assert_eq_order(str(tmp_path / "order.yaml"),
                    str(fixtures / "cg_order_basic.yaml"))


def test_from_file_through_compat(fixtures, tmp_path):
    cfg = tmp_path / "analyze.yaml"
    cfg.write_text(f"""\
structure: {fixtures / 'cg.tpr'}
trajectory: {fixtures / 'split'}/cg*.xtc
type: !CGOrder
  atoms: "@membrane"
silent: true
overwrite: true
""")
    analysis = gorder.Analysis.from_file(str(cfg))
    results = analysis.run()
    assert results.n_analyzed_frames() == 101
    assert isinstance(results.average_order(), gorder.results.OrderCollection)


def test_every_public_results_name_resolves():
    """Every public name in pygorder's results.pyi:11-629 (+ AtomType,
    __init__.pyi:113) resolves in the drop-in namespace."""
    for name in ("AnalysisResults", "AtomResults", "BondResults",
                 "Convergence", "LeafletsData", "Map", "MoleculeResults",
                 "NormalsData", "Order", "OrderCollection",
                 "OrderMapsCollection"):
        assert hasattr(gorder.results, name), name
    assert hasattr(gorder, "AtomType")
    assert hasattr(gorder, "Analysis")
    assert hasattr(gorder, "Frequency")
    # pyi-level method surface
    method_surface = {
        "AnalysisResults": ["write", "n_analyzed_frames", "molecules",
                            "get_molecule", "average_order",
                            "average_ordermaps", "leaflets_data",
                            "normals_data"],
        "MoleculeResults": ["molecule", "average_order",
                            "average_ordermaps", "atoms", "bonds",
                            "get_atom", "get_bond", "convergence"],
        "AtomResults": ["atom", "molecule", "bonds", "get_bond", "order",
                        "ordermaps"],
        "BondResults": ["molecule", "atoms", "order", "ordermaps"],
        "Convergence": ["frames", "total", "upper", "lower"],
        "LeafletsData": ["get_molecule", "frames"],
        "NormalsData": ["get_molecule", "frames"],
        "Map": ["span_x", "span_y", "tile_dim", "get_at", "extract"],
        "Order": ["value", "error"],
        "OrderCollection": ["total", "upper", "lower"],
        "OrderMapsCollection": ["total", "upper", "lower"],
    }
    for cls_name, methods in method_surface.items():
        cls = getattr(gorder.results, cls_name)
        for m in methods:
            assert callable(getattr(cls, m, None)), f"{cls_name}.{m}"
    for m in ("atom_name", "relative_index", "residue_name"):
        assert callable(getattr(gorder.AtomType, m, None))


def test_ua_order_error(fixtures):
    """pygorder test_run_access.py:582-685."""
    results = _ua(fixtures,
                  estimate_error=gorder.estimate_error.EstimateError()).run()

    assert results.n_analyzed_frames() == 51
    assert len(results.molecules()) == 2
    results.get_molecule("POPC")
    results.get_molecule("POPS")
    with pytest.raises(gorder.exceptions.APIError) as excinfo:
        results.get_molecule("POPG")
    assert "molecule with the given name does not exist" in str(excinfo.value)

    avg_order = results.average_order().total()
    assert compare_orders(avg_order.value(), 0.1169)
    assert compare_orders(avg_order.error(), 0.0027)
    assert results.average_order().upper() is None
    assert results.average_order().lower() is None
    assert results.average_ordermaps().total() is None

    expected_average_orders = [0.1101, 0.1470]
    expected_average_errors = [0.0019, 0.0106]
    expected_atom_numbers = [40, 37]
    expected_molecule_names = ["POPC", "POPS"]
    expected_atom_indices = [23, 45]
    expected_atom_names = ["C24", "C46"]
    expected_atom_order = [0.0978, 0.2221]
    expected_atom_errors = [0.0070, 0.0241]
    expected_mol_bond_numbers = [82, 72]
    expected_bond_numbers = [1, 2]
    expected_bond_orders = [[0.0978], [0.2084, 0.2359]]
    expected_bond_errors = [[0.0070], [0.0262, 0.0441]]

    for i, molecule in enumerate(results.molecules()):
        assert molecule.molecule() == expected_molecule_names[i]
        mol_order = molecule.average_order().total()
        assert compare_orders(mol_order.value(), expected_average_orders[i])
        assert compare_orders(mol_order.error(), expected_average_errors[i])
        assert molecule.average_order().upper() is None
        assert molecule.average_ordermaps().total() is None

        assert len(molecule.atoms()) == expected_atom_numbers[i]
        atom = molecule.get_atom(expected_atom_indices[i])
        assert atom.atom().atom_name() == expected_atom_names[i]
        assert atom.atom().relative_index() == expected_atom_indices[i]
        assert atom.molecule() == expected_molecule_names[i]
        atom_order = atom.order().total()
        assert compare_orders(atom_order.value(), expected_atom_order[i])
        assert compare_orders(atom_order.error(), expected_atom_errors[i])
        assert atom.order().upper() is None
        assert atom.ordermaps().total() is None

        assert len(molecule.bonds()) == expected_mol_bond_numbers[i]
        assert len(atom.bonds()) == expected_bond_numbers[i]
        for b_idx, bond in enumerate(atom.bonds()):
            bond_order = bond.order().total()
            assert compare_orders(bond_order.value(),
                                  expected_bond_orders[i][b_idx])
            assert compare_orders(bond_order.error(),
                                  expected_bond_errors[i][b_idx])
            assert bond.order().upper() is None
            assert bond.ordermaps().total() is None

        with pytest.raises(gorder.exceptions.APIError) as excinfo:
            molecule.get_atom(145)
        assert ("atom with the given relative index does not exist"
                in str(excinfo.value))
        with pytest.raises(gorder.exceptions.APIError) as excinfo:
            molecule.get_bond(1, 2)
        assert ("united-atom results for individual bonds cannot be "
                "accesed by using relative indices" in str(excinfo.value))


def test_cg_order_error_leaflets(fixtures):
    """pygorder test_run_access.py:1114-1193."""
    results = _cg(
        fixtures,
        leaflets=gorder.leaflets.GlobalClassification("@membrane",
                                                      "name PO4"),
        estimate_error=gorder.estimate_error.EstimateError()).run()

    assert results.n_analyzed_frames() == 101
    assert len(results.molecules()) == 3

    avg_order = results.average_order()
    assert compare_orders(avg_order.total().value(), 0.2962)
    assert compare_orders(avg_order.total().error(), 0.0050)
    assert compare_orders(avg_order.upper().value(), 0.2971)
    assert compare_orders(avg_order.upper().error(), 0.0049)
    assert compare_orders(avg_order.lower().value(), 0.2954)
    assert compare_orders(avg_order.lower().error(), 0.0056)
    assert results.average_ordermaps().total() is None

    expected_molecule_names = ["POPC", "POPE", "POPG"]
    for i, molecule in enumerate(results.molecules()):
        assert molecule.molecule() == expected_molecule_names[i]
        avg = molecule.average_order()
        assert avg.total().error() is not None
        assert avg.upper().error() is not None
        assert avg.lower().error() is not None
        assert molecule.average_ordermaps().total() is None

        convergence = molecule.convergence()
        assert len(convergence.frames()) == 101
        assert convergence.total() is not None
        assert convergence.upper() is not None
        assert convergence.lower() is not None

        assert len(molecule.bonds()) == 11
        bond = molecule.get_bond(4, 5)
        a1, a2 = bond.atoms()
        assert a1.atom_name() == "C1A"
        assert a1.relative_index() == 4
        assert a1.residue_name() == expected_molecule_names[i]
        assert a2.atom_name() == "D2A"
        assert a2.relative_index() == 5
        assert a2.residue_name() == expected_molecule_names[i]

        bond_order = bond.order()
        assert bond_order.total().error() is not None
        assert bond_order.upper().error() is not None
        assert bond_order.lower().error() is not None

        reverse_bond = molecule.get_bond(5, 4)
        a1_rev, a2_rev = reverse_bond.atoms()
        assert a1_rev.relative_index() == 4
        assert a2_rev.relative_index() == 5

        for pair in ((1, 3), (15, 16)):
            with pytest.raises(gorder.exceptions.APIError) as excinfo:
                molecule.get_bond(*pair)
            assert ("bond specified by the given relative indices does "
                    "not exist" in str(excinfo.value))


def test_ua_order_error_leaflets(fixtures):
    """pygorder test_run_access.py:1194-1281."""
    results = _ua(
        fixtures,
        leaflets=gorder.leaflets.GlobalClassification("@membrane",
                                                      "name r'^P'"),
        estimate_error=gorder.estimate_error.EstimateError()).run()

    assert results.n_analyzed_frames() == 51
    assert len(results.molecules()) == 2
    assert results.get_molecule("POPC") is not None
    with pytest.raises(gorder.exceptions.APIError):
        results.get_molecule("POPG")

    avg_order = results.average_order()
    assert compare_orders(avg_order.total().value(), 0.1169)
    assert compare_orders(avg_order.upper().value(), 0.1151)
    assert compare_orders(avg_order.lower().value(), 0.1186)
    assert compare_orders(avg_order.total().error(), 0.0027)
    assert compare_orders(avg_order.upper().error(), 0.0031)
    assert compare_orders(avg_order.lower().error(), 0.0031)
    assert results.average_ordermaps().total() is None

    expected_atom_numbers = [40, 37]
    expected_molecule_names = ["POPC", "POPS"]
    expected_atom_indices = [23, 45]
    expected_atom_names = ["C24", "C46"]
    expected_bond_numbers = [1, 2]

    for i, molecule in enumerate(results.molecules()):
        assert molecule.molecule() == expected_molecule_names[i]
        mol_order = molecule.average_order()
        assert mol_order.total().error() is not None
        assert mol_order.upper().error() is not None
        assert mol_order.lower().error() is not None
        assert molecule.average_ordermaps().total() is None

        assert len(molecule.atoms()) == expected_atom_numbers[i]
        atom = molecule.get_atom(expected_atom_indices[i])
        assert atom.atom().atom_name() == expected_atom_names[i]
        assert atom.atom().relative_index() == expected_atom_indices[i]

        atom_order = atom.order()
        assert atom_order.total().error() is not None
        assert atom_order.upper().error() is not None
        assert atom_order.lower().error() is not None
        assert atom.ordermaps().total() is None

        assert len(atom.bonds()) == expected_bond_numbers[i]
        for bond in atom.bonds():
            assert bond.order().total().error() is not None
            assert bond.order().upper().error() is not None
            assert bond.order().lower().error() is not None
            assert bond.ordermaps().total() is None

        with pytest.raises(gorder.exceptions.APIError):
            molecule.get_atom(145)
        with pytest.raises(gorder.exceptions.APIError):
            molecule.get_atom(7)
        with pytest.raises(gorder.exceptions.APIError) as excinfo:
            molecule.get_bond(1, 2)
        assert ("united-atom results for individual bonds cannot be "
                "accesed by using relative indices" in str(excinfo.value))


def test_ua_order_ordermaps(fixtures):
    """pygorder test_run_access.py:1457-1528 (original-precision ua.xtc:
    tight map values)."""
    results = gorder.Analysis(
        structure=str(fixtures / "ua.tpr"),
        trajectory=str(fixtures / "ua.xtc"),
        analysis_type=gorder.analysis_types.UAOrder(
            saturated="resname POPC and name C50 C20 C13",
            unsaturated="resname POPC and name C24"),
        ordermap=gorder.ordermap.OrderMap(bin_size=[0.5, 2.0],
                                          min_samples=5),
        silent=True, overwrite=True).run()

    assert results.n_analyzed_frames() == 51
    assert len(results.molecules()) == 1
    assert results.average_ordermaps().total() is not None
    assert results.average_ordermaps().upper() is None
    assert results.average_ordermaps().lower() is None

    molecule = results.get_molecule("POPC")
    map = molecule.average_ordermaps().total()
    span_x = map.span_x()
    span_y = map.span_y()
    bin = map.tile_dim()
    assert math.isclose(span_x[0], 0.0, abs_tol=1e-5)
    assert math.isclose(span_x[1], 6.53265, rel_tol=1e-5)
    assert math.isclose(span_y[0], 0.0, abs_tol=1e-5)
    assert math.isclose(span_y[1], 6.53265, rel_tol=1e-5)
    assert math.isclose(bin[0], 0.5, rel_tol=1e-5)
    assert math.isclose(bin[1], 2.0, rel_tol=1e-5)

    assert compare_orders(map.get_at(2.0, 6.0), 0.0127)
    assert compare_orders(map.get_at(4.3, 0.1), 0.1286)
    assert compare_orders(map.get_at(6.4, 2.2), 0.0839)

    atom = molecule.get_atom(49)
    atom_map = atom.ordermaps().total()
    assert compare_orders(atom_map.get_at(2.0, 6.0), 0.0349)
    assert compare_orders(atom_map.get_at(4.3, 0.1), -0.0160)
    assert compare_orders(atom_map.get_at(6.4, 2.2), -0.0084)

    bond = atom.bonds()[1]
    bond_map = bond.ordermaps().total()
    assert compare_orders(bond_map.get_at(2.0, 6.0), 0.1869)
    assert compare_orders(bond_map.get_at(4.3, 0.1), 0.0962)
    assert compare_orders(bond_map.get_at(6.4, 2.2), 0.0358)

    extracted_x, extracted_y, extracted_values = bond_map.extract()
    assert len(extracted_x) == 14
    assert len(extracted_y) == 4
    for x in extracted_x:
        assert math.isclose(x % 0.5, 0.0, abs_tol=1e-5)
    for real, expected in zip(extracted_y, [0.0, 2.0, 4.0, 6.0]):
        assert math.isclose(real, expected, abs_tol=1e-5)
    for xi, x in enumerate(extracted_x):
        for yi, y in enumerate(extracted_y):
            map_val = bond_map.get_at(x, y)
            extracted_val = extracted_values[xi][yi]
            if math.isnan(map_val) and math.isnan(extracted_val):
                continue
            assert compare_orders(map_val, extracted_val)


def test_cg_order_ordermaps_leaflets(fixtures):
    """pygorder test_run_access.py:1614-1680."""
    results = gorder.Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=gorder.analysis_types.CGOrder(
            "resname POPC and name C1B C2B C3B C4B"),
        leaflets=gorder.leaflets.GlobalClassification("@membrane",
                                                      "name PO4"),
        ordermap=gorder.ordermap.OrderMap(bin_size=[1.0, 1.0],
                                          min_samples=10),
        silent=True, overwrite=True).run()

    assert results.n_analyzed_frames() == 101
    assert len(results.molecules()) == 1

    sys_maps = results.average_ordermaps()
    assert compare_map(sys_maps.total().get_at(1.0, 8.0), 0.3590)
    assert compare_map(sys_maps.total().get_at(13.0, 11.0), 0.4296)
    assert compare_map(sys_maps.upper().get_at(1.0, 8.0), 0.3418)
    assert compare_map(sys_maps.upper().get_at(13.0, 11.0), 0.4051)
    assert compare_map(sys_maps.lower().get_at(1.0, 8.0), 0.3662)
    assert compare_map(sys_maps.lower().get_at(13.0, 11.0), 0.4506)

    molecule = results.get_molecule("POPC")
    mol_maps = molecule.average_ordermaps()
    total_map = mol_maps.total()
    span_x = total_map.span_x()
    span_y = total_map.span_y()
    bin_size = total_map.tile_dim()
    assert math.isclose(span_x[0], 0.0, abs_tol=1e-5)
    assert math.isclose(span_x[1], 12.747616, rel_tol=1e-5)
    assert math.isclose(span_y[0], 0.0, abs_tol=1e-5)
    assert math.isclose(span_y[1], 12.747616, rel_tol=1e-5)
    assert math.isclose(bin_size[0], 1.0, rel_tol=1e-5)
    assert math.isclose(bin_size[1], 1.0, rel_tol=1e-5)

    assert compare_map(total_map.get_at(1.0, 8.0), 0.3590)
    assert compare_map(total_map.get_at(13.0, 11.0), 0.4296)
    assert compare_map(mol_maps.upper().get_at(1.0, 8.0), 0.3418)
    assert compare_map(mol_maps.upper().get_at(13.0, 11.0), 0.4051)
    assert compare_map(mol_maps.lower().get_at(1.0, 8.0), 0.3662)
    assert compare_map(mol_maps.lower().get_at(13.0, 11.0), 0.4506)

    bond = molecule.get_bond(9, 10)
    bond_maps = bond.ordermaps()
    assert compare_map(bond_maps.total().get_at(1.0, 8.0), 0.3967)
    assert compare_map(bond_maps.total().get_at(13.0, 11.0), 0.4104)
    assert compare_map(bond_maps.upper().get_at(1.0, 8.0), 0.3573)
    assert compare_map(bond_maps.upper().get_at(13.0, 11.0), 0.4807)
    assert compare_map(bond_maps.lower().get_at(1.0, 8.0), 0.4118)
    assert compare_map(bond_maps.lower().get_at(13.0, 11.0), 0.3563)


def test_ua_order_leaflets_ordermaps(fixtures):
    """pygorder test_run_access.py:1681-1778 (original ua.xtc)."""
    results = gorder.Analysis(
        structure=str(fixtures / "ua.tpr"),
        trajectory=str(fixtures / "ua.xtc"),
        analysis_type=gorder.analysis_types.UAOrder(
            saturated="resname POPC and name C50 C20 C13",
            unsaturated="resname POPC and name C24"),
        ordermap=gorder.ordermap.OrderMap(bin_size=[0.5, 2.0],
                                          min_samples=5),
        leaflets=gorder.leaflets.GlobalClassification("@membrane",
                                                      "name r'^P'"),
        silent=True, overwrite=True).run()

    assert results.n_analyzed_frames() == 51
    assert len(results.molecules()) == 1
    assert results.average_ordermaps().total() is not None
    assert results.average_ordermaps().upper() is not None
    assert results.average_ordermaps().lower() is not None

    molecule = results.get_molecule("POPC")
    total_map = molecule.average_ordermaps().total()
    upper_map = molecule.average_ordermaps().upper()
    lower_map = molecule.average_ordermaps().lower()

    span_x = total_map.span_x()
    span_y = total_map.span_y()
    bin = total_map.tile_dim()
    assert math.isclose(span_x[0], 0.0, abs_tol=1e-5)
    assert math.isclose(span_x[1], 6.53265, rel_tol=1e-5)
    assert math.isclose(span_y[0], 0.0, abs_tol=1e-5)
    assert math.isclose(span_y[1], 6.53265, rel_tol=1e-5)
    assert math.isclose(bin[0], 0.5, rel_tol=1e-5)
    assert math.isclose(bin[1], 2.0, rel_tol=1e-5)

    assert compare_orders(total_map.get_at(2.1, 5.8), 0.0127)
    assert compare_orders(upper_map.get_at(2.1, 5.8), 0.0499)
    assert compare_orders(lower_map.get_at(2.1, 5.8), -0.0036)

    atom = molecule.get_atom(49)
    assert compare_orders(atom.ordermaps().total().get_at(2.1, 5.8), 0.0349)
    assert compare_orders(atom.ordermaps().upper().get_at(2.1, 5.8), 0.0450)
    assert compare_orders(atom.ordermaps().lower().get_at(2.1, 5.8), 0.0272)

    bond = atom.bonds()[1]
    bond_total = bond.ordermaps().total()
    assert compare_orders(bond_total.get_at(2.1, 5.8), 0.1869)
    assert math.isnan(bond.ordermaps().upper().get_at(6.4, 0.0))
    assert math.isnan(bond.ordermaps().lower().get_at(6.4, 6.0))

    ext_x, ext_y, ext_vals = bond_total.extract()
    assert len(ext_x) == 14
    assert len(ext_y) == 4
    for x in ext_x:
        assert math.isclose(x % 0.5, 0.0, abs_tol=1e-5)
    for real, expected in zip(ext_y, [0.0, 2.0, 4.0, 6.0]):
        assert math.isclose(real, expected, abs_tol=1e-5)
    for xi, x in enumerate(ext_x):
        for yi, y in enumerate(ext_y):
            map_val = bond_total.get_at(x, y)
            ext_val = ext_vals[xi][yi]
            if math.isnan(map_val) and math.isnan(ext_val):
                continue
            assert compare_orders(map_val, ext_val)
