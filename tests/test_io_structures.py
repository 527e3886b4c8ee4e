"""Structure/NDX/bonds parser tests against the reference fixture corpus."""

import numpy as np
import pytest

from gorder_tpu.io import read_bnd, read_gro, read_ndx, read_pdb, read_pqr
from gorder_tpu.errors import BondsError, NdxError


def test_read_gro_cg(fixtures):
    system = read_gro(str(fixtures / "cg.gro"))
    assert system.n_atoms == 16769
    assert system.atom_names[0] == "NC3"
    assert system.resnames[0] == "POPC"
    assert system.resids[0] == 1
    assert system.serials[0] == 1
    np.testing.assert_allclose(
        system.positions[0], [12.113, 6.915, 7.890], atol=1e-6
    )
    assert system.box is not None and system.box[0, 0] > 0


def test_read_gro_pcpepg(fixtures):
    system = read_gro(str(fixtures / "pcpepg.gro"))
    assert system.n_atoms == 68375
    assert set(np.unique(system.resnames)) == {
        "CLA", "POPC", "POPE", "POPG", "SOD", "TIP3",
    }


def test_read_pdb_cg_matches_gro(fixtures):
    pdb = read_pdb(str(fixtures / "cg.pdb"))
    gro = read_gro(str(fixtures / "cg.gro"))
    assert pdb.n_atoms == gro.n_atoms
    assert list(pdb.atom_names[:12]) == list(gro.atom_names[:12])
    np.testing.assert_allclose(pdb.positions[:100], gro.positions[:100], atol=5e-4)
    np.testing.assert_allclose(
        np.diag(pdb.box), np.diag(gro.box), atol=1e-3
    )
    # cg.pdb carries CONECT bonds
    assert pdb.bonds.shape[0] > 0


def test_read_pqr_cg_matches_gro(fixtures):
    pqr = read_pqr(str(fixtures / "cg.pqr"))
    gro = read_gro(str(fixtures / "cg.gro"))
    assert pqr.n_atoms == gro.n_atoms
    np.testing.assert_allclose(pqr.positions[:100], gro.positions[:100], atol=5e-4)


def test_read_bnd(fixtures):
    system = read_gro(str(fixtures / "cg.gro"))
    read_bnd(str(fixtures / "cg.bnd"), system)
    assert system.bonds.shape[0] > 0
    # POPC bead chain: atom 0 (NC3) bonded only to atom 1 (PO4)
    adj = system.adjacency()
    assert list(adj[0]) == [1]
    assert list(adj[2]) == [1, 3, 4]  # GL1 - PO4/GL2/C1A


def test_bnd_matches_pdb_conect(fixtures):
    gro = read_gro(str(fixtures / "cg.gro"))
    read_bnd(str(fixtures / "cg.bnd"), gro)
    pdb = read_pdb(str(fixtures / "cg.pdb"))
    assert np.array_equal(gro.bonds, pdb.bonds)


def test_bnd_self_bond_error(fixtures, tmp_path):
    system = read_gro(str(fixtures / "cg.gro"))
    bad = tmp_path / "bad.bnd"
    bad.write_text("5 5\n")
    with pytest.raises(BondsError):
        read_bnd(str(bad), system)


def test_bnd_out_of_range_error(fixtures, tmp_path):
    system = read_gro(str(fixtures / "cg.gro"))
    bad = tmp_path / "bad.bnd"
    bad.write_text("1 999999\n")
    with pytest.raises(BondsError):
        read_bnd(str(bad), system)


def test_read_ndx(fixtures):
    system = read_gro(str(fixtures / "cg.gro"))
    read_ndx(str(fixtures / "cg.ndx"), system)
    assert "Membrane" in system.groups
    membrane = system.groups["Membrane"]
    assert membrane[0] == 0  # serial 1 → index 0


def test_ndx_duplicate_names_warn_not_error(fixtures, caplog):
    system = read_gro(str(fixtures / "cg.gro"))
    read_ndx(str(fixtures / "cg_duplicate.ndx"), system)  # must not raise


def test_ndx_invalid_names_warn_not_error(fixtures):
    system = read_gro(str(fixtures / "cg.gro"))
    read_ndx(str(fixtures / "cg_invalid.ndx"), system)  # must not raise


def test_ndx_out_of_range(tmp_path, fixtures):
    system = read_gro(str(fixtures / "cg.gro"))
    bad = tmp_path / "bad.ndx"
    bad.write_text("[ G ]\n1 2 99999999\n")
    with pytest.raises(NdxError):
        read_ndx(str(bad), system)
