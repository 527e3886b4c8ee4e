"""Selection-language tests against the reference fixtures."""

import numpy as np
import pytest

from gorder_tpu.errors import SelectionError
from gorder_tpu.io import read_bnd, read_gro, read_ndx
from gorder_tpu.select import select, select_mask, query_uses_elements


@pytest.fixture(scope="module")
def cg(fixtures):
    system = read_gro(str(fixtures / "cg.gro"))
    read_bnd(str(fixtures / "cg.bnd"), system)
    read_ndx(str(fixtures / "cg.ndx"), system)
    return system


@pytest.fixture(scope="module")
def aa(fixtures):
    return read_gro(str(fixtures / "pcpepg.gro"))


def test_membrane_macro_cg(cg):
    idx = select(cg, "@membrane")
    # all POPC/POPE/POPG beads, no water, no ions
    resnames = set(cg.resnames[idx])
    assert resnames == {"POPC", "POPE", "POPG"}
    # macro must equal the curated Membrane ndx group
    assert np.array_equal(idx, cg.groups["Membrane"])


def test_water_ion_macros_cg(cg):
    water = select(cg, "@water")
    assert set(cg.resnames[water]) == {"W"}
    ion = select(cg, "@ion")
    assert set(cg.resnames[ion]) == {"ION"}


def test_membrane_macro_aa(aa):
    idx = select(aa, "@membrane")
    assert set(aa.resnames[idx]) == {"POPC", "POPE", "POPG"}


def test_name_multi(cg):
    idx = select(cg, "name PO4 NC3")
    assert set(cg.atom_names[idx]) == {"PO4", "NC3"}


def test_name_regex(aa):
    idx = select(aa, "name r'^P'")
    names = set(aa.atom_names[idx])
    assert "P" in names
    assert all(n.startswith("P") for n in names)


def test_resid_range(cg):
    idx = select(cg, "resid 1 to 254")
    assert set(cg.resids[idx]) == set(range(1, 255))
    idx2 = select(cg, "resid 1 - 254")
    assert np.array_equal(idx, idx2)


def test_serial_range(aa):
    idx = select(aa, "serial 876 to 1234")
    assert idx[0] == 875 and idx[-1] == 1233 and len(idx) == 1234 - 876 + 1


def test_boolean_ops(cg):
    a = select_mask(cg, "resname POPC and name PO4")
    b = select_mask(cg, "resname POPC") & select_mask(cg, "name PO4")
    assert np.array_equal(a, b)
    c = select_mask(cg, "resname POPC or resname POPE")
    d = select_mask(cg, "resname POPC") | select_mask(cg, "resname POPE")
    assert np.array_equal(c, d)
    e = select_mask(cg, "not resname W")
    assert np.array_equal(e, ~select_mask(cg, "resname W"))
    f = select_mask(cg, "(resname POPC or resname POPE) and name PO4")
    assert f.sum() == (select_mask(cg, "resname POPC POPE") & select_mask(cg, "name PO4")).sum()


def test_symbolic_operators(cg):
    a = select_mask(cg, "resname POPC && name PO4 || resname POPE && name PO4")
    b = select_mask(cg, "resname POPC POPE and name PO4")
    assert np.array_equal(a, b)
    c = select_mask(cg, "!resname W")
    assert np.array_equal(c, ~select_mask(cg, "resname W"))


def test_elements_aa(aa):
    carbons = select(aa, "@membrane and element name carbon")
    names = set(aa.atom_names[carbons])
    assert all(n.upper().startswith("C") for n in names)
    hydrogens = select(aa, "@membrane and element name hydrogen")
    assert all(n.upper().startswith("H") for n in set(aa.atom_names[hydrogens]))
    # ions must not be classified as carbon (CLA) even though they start with C
    all_carbons = select(aa, "element name carbon")
    assert "CLA" not in set(aa.atom_names[all_carbons])
    # element symbol query
    oxygens = select(aa, "@water and element symbol O")
    assert set(aa.atom_names[oxygens]) == {"OH2"}


def test_group_reference(cg):
    idx = select(cg, "Membrane")
    assert np.array_equal(idx, cg.groups["Membrane"])
    idx2 = select(cg, "group Membrane")
    assert np.array_equal(idx2, cg.groups["Membrane"])


def test_unknown_group_raises(cg):
    with pytest.raises(SelectionError):
        select(cg, "NoSuchGroup")


def test_molwith(cg):
    # molecules containing a PO4 bead = all lipids (every lipid has PO4 except
    # POPG which names it PO4 as well) — here check a single molecule expands
    idx = select(cg, "molwith resid 1 and name PO4")
    # molwith binds tighter than and: (molwith resid 1) and name PO4
    assert set(cg.atom_names[idx]) == {"PO4"}
    idx2 = select(cg, "molwith (resid 1 and name PO4)")
    assert set(cg.resids[idx2]) == {1}
    assert len(idx2) == 12  # whole POPC molecule


def test_all_keyword(cg):
    assert len(select(cg, "all")) == cg.n_atoms
    assert len(select(cg, "not all")) == 0


def test_complex_ua_query(fixtures):
    # the UA-mode saturated-carbons query from the reference corpus
    aa = read_gro(str(fixtures / "pcpepg.gro"))
    q = ("(resname POPC and name r'^C' and not name C15 C34 C24 C25) "
         "or (resname POPE and name C24 C25)")
    idx = select(aa, q)
    popc = idx[aa.resnames[idx] == "POPC"]
    assert all(n.startswith("C") for n in aa.atom_names[popc])
    assert not set(aa.atom_names[popc]) & {"C15", "C34", "C24", "C25"}


def test_query_uses_elements():
    assert query_uses_elements("@membrane and element name carbon")
    assert query_uses_elements("elname carbon")
    assert not query_uses_elements("name CA and resname POPC")
