"""TPR parser tests: cross-validated against GRO/BND fixtures."""

import glob

import numpy as np
import pytest

from gorder_tpu.io import read_bnd, read_gro
from gorder_tpu.io.tpr import read_tpr, read_tpr_data


def test_cg_tpr_matches_gro_and_bnd(fixtures):
    tpr = read_tpr(str(fixtures / "cg.tpr"))
    gro = read_gro(str(fixtures / "cg.gro"))
    read_bnd(str(fixtures / "cg.bnd"), gro)
    assert tpr.n_atoms == gro.n_atoms == 16769
    assert np.array_equal(tpr.atom_names, gro.atom_names)
    assert np.array_equal(tpr.resids % 100000, gro.resids)
    assert np.array_equal(tpr.bonds, gro.bonds)
    assert tpr.positions is not None
    np.testing.assert_allclose(np.diag(tpr.box), np.diag(gro.box), atol=1e-5)
    # Martini beads carry no atomic numbers → no elements from TPR
    assert tpr.masses is not None and tpr.masses[0] == 72.0


def test_pcpepg_tpr_bonds_superset_of_bnd(fixtures):
    tpr = read_tpr(str(fixtures / "pcpepg.tpr"))
    gro = read_gro(str(fixtures / "pcpepg.gro"))
    read_bnd(str(fixtures / "pcpepg.bnd"), gro)
    assert np.array_equal(tpr.atom_names, gro.atom_names)
    tpr_bonds = set(map(tuple, tpr.bonds))
    bnd_bonds = set(map(tuple, gro.bonds))
    # .bnd omits water; TPR adds TIP3 SETTLE bonds on top
    assert bnd_bonds <= tpr_bonds
    extra = tpr_bonds - bnd_bonds
    water = gro.resnames == "TIP3"
    assert all(water[a] and water[b] for a, b in extra)


def test_tpr_elements_from_atomic_numbers(fixtures):
    tpr = read_tpr(str(fixtures / "pcpepg.tpr"))
    assert tpr.elements is not None
    carbon = tpr.elements[tpr.atom_names == "C12"]
    assert set(carbon) == {"carbon"}
    hydrogen = tpr.elements[tpr.atom_names == "H12A"]
    assert set(hydrogen) == {"hydrogen"}
    phosphorus = tpr.elements[tpr.atom_names == "P"]
    assert set(phosphorus) == {"phosphorus"}


def test_all_fixture_tprs_parse(fixtures):
    files = sorted(glob.glob(str(fixtures / "**" / "*.tpr"), recursive=True))
    assert len(files) >= 14
    for f in files:
        system = read_tpr(f)
        data = read_tpr_data(f)
        assert system.n_atoms > 0
        assert data.file_version >= 103
        assert system.bonds.shape[0] > 0


def test_old_tpx_version_103(fixtures):
    data = read_tpr_data(str(fixtures / "pepg_cg.tpr"))
    assert data.file_version == 103
    system = read_tpr(str(fixtures / "pepg_cg.tpr"))
    assert system.n_atoms == 8628
    assert set(system.resnames) == {"ION", "POPE", "POPG", "W"}


def test_tpx_v127(fixtures):
    system = read_tpr(str(fixtures / "cg_buckled.tpr"))
    assert system.n_atoms == 40816
    assert "POPC" in set(system.resnames)


def test_selection_on_tpr(fixtures):
    from gorder_tpu.select import select

    system = read_tpr(str(fixtures / "pcpepg.tpr"))
    carbons = select(system, "@membrane and element name carbon")
    assert len(carbons) > 0
    assert all(n.startswith("C") for n in set(system.atom_names[carbons]))
    hydrogens = select(system, "@membrane and element name hydrogen")
    assert all(n.startswith("H") for n in set(system.atom_names[hydrogens]))


def test_tpr_positions_match_gro(fixtures):
    """The coordinate snapshot parses correctly (the intermolecular
    exclusion group of tpx >= 120 sits between topology and state;
    pcpepg.gro stores the same snapshot at 3 decimals)."""
    import numpy as np

    from gorder_tpu.io.gro import read_gro
    from gorder_tpu.io.tpr import read_tpr

    t = read_tpr(str(fixtures / "pcpepg.tpr"))
    g = read_gro(str(fixtures / "pcpepg.gro"))
    assert t.positions.shape == g.positions.shape
    assert np.abs(t.positions - g.positions).max() < 6e-4
