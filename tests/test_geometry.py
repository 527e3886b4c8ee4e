"""Geometric region selection golden tests (cuboid / cylinder / sphere)."""

import pytest

from gorder_tpu.errors import ConfigError, GeometryError
from gorder_tpu.input import Analysis, AnalysisType, Geometry
from gorder_tpu.input.config import load_yaml
from gorder_tpu.present import write_yaml

from .golden import assert_eq_order


def cg_analysis(fixtures, geometry, **kwargs):
    return Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        geometry=geometry,
        silent=True, overwrite=True, **kwargs,
    )


def run_golden(fixtures, tmp_path, geometry, golden, atol=None, **kwargs):
    results = cg_analysis(fixtures, geometry, **kwargs).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / golden), atol=atol)


def test_cg_cuboid_square(fixtures, tmp_path):
    geometry = Geometry(
        "cuboid", reference=None,
        xdim=(-8.0, -2.0), ydim=(2.0, 8.0),
    )
    run_golden(fixtures, tmp_path, geometry, "cg_order_cuboid_square.yaml")


def test_cg_cylinder_static(fixtures, tmp_path):
    geometry = Geometry(
        "cylinder", reference=(2.0, 1.0, 0.0), radius=3.25,
        orientation="z",
    )
    run_golden(fixtures, tmp_path, geometry, "cg_order_cylinder.yaml")


def test_cg_sphere_dynamic(fixtures, tmp_path):
    # the split fixtures are re-encoded at XTC precision 100: bonds right at
    # the sphere boundary shift membership vs the original-precision golden,
    # and the per-filter sample counts are small → 2e-3 tolerance
    geometry = Geometry("sphere", reference="resid 1", radius=2.5)
    run_golden(fixtures, tmp_path, geometry, "cg_order_sphere.yaml",
               atol=2e-3)


def test_cg_geometry_nopbc_differs_and_is_sane(fixtures, tmp_path):
    geometry = Geometry(
        "cylinder", reference=(6.0, 6.0, 0.0), radius=3.25,
        orientation="z",
    )
    with_pbc = cg_analysis(fixtures, geometry).run()
    without = cg_analysis(fixtures, geometry, handle_pbc=False).run()
    # a centered cylinder away from boundaries: similar but not identical
    a = with_pbc.average_order.total.value
    b = without.average_order.total.value
    assert abs(a - b) < 0.05
    assert with_pbc.molecules[0].bonds[0].order.total.value is not None


def test_geometry_yaml_parsing():
    cfg = load_yaml("""
geometry: !Cylinder
  reference: "@protein and name BB"
  radius: 3.5
  span: [2.3, 5.1]
  orientation: z
""")
    geom = Geometry.parse(cfg["geometry"])
    assert geom.kind == "cylinder"
    assert geom.radius == 3.5
    assert geom.span == (2.3, 5.1)

    with pytest.raises(GeometryError):
        Geometry.parse(load_yaml(
            "geometry: !Cylinder {radius: -1.0}")["geometry"])
    with pytest.raises(GeometryError):
        Geometry.parse(load_yaml(
            "geometry: !Cuboid {xdim: [5, 2]}")["geometry"])


def test_invert_partitions_space_exactly():
    """invert must select exactly the complement: inside + inverted = 1 for
    every point, every shape, PBC on and off."""
    import jax.numpy as jnp
    import numpy as np

    from gorder_tpu.core.geometry import build_geometry_spec, inside_mask
    from gorder_tpu.input.config import Geometry

    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 18, (4, 500, 3)).astype(np.float32)
    box = np.full((4, 3), 13.0, np.float32)
    ref = np.tile(np.array([8.0, 2.0, 0.0], np.float32), (4, 1))
    shapes = [
        Geometry("cuboid", reference=(8, 2, 0), xdim=(-2.0, 4.0),
                 ydim=(-4.0, 1.0)),
        Geometry("cylinder", reference=(8, 2, 0), radius=3.0,
                 span=(-1.0, 3.0), orientation="x"),
        Geometry("sphere", reference=(8, 2, 0), radius=2.5),
    ]
    for geo in shapes:
        for pbc in (True, False):
            spec_in = build_geometry_spec(geo)
            spec_out = build_geometry_spec(
                Geometry(**{**geo.__dict__, "invert": True}))
            m_in = np.asarray(inside_mask(jnp.asarray(pts), jnp.asarray(ref),
                                          jnp.asarray(box), spec_in, pbc))
            m_out = np.asarray(inside_mask(jnp.asarray(pts), jnp.asarray(ref),
                                           jnp.asarray(box), spec_out, pbc))
            assert np.all(m_in ^ m_out), (geo.kind, pbc)


def _geometry_vs_leaflets(fixtures, mode, geometry):
    """Shared body: a z>=0 geometry restriction around the membrane COG
    must reproduce exactly the upper-leaflet values of an unrestricted
    leaflet-wise run, with the lower leaflet empty (NaN)."""
    import math

    from gorder_tpu.input import Analysis, AnalysisType, LeafletClassification

    if mode == "aa":
        atype = AnalysisType.aaorder(
            "@membrane and name C11 C12 C13 C14 C15 C1 C2 C3 C22 C32 "
            "C23 C33",
            "@membrane and element name hydrogen")
        leaflets = LeafletClassification.global_("@membrane", "name P")
        kwargs = dict(structure=str(fixtures / "pcpepg.tpr"),
                      trajectory=str(fixtures / "split" / "pcpepg*.xtc"))
    else:
        atype = AnalysisType.cgorder(
            "@membrane and name PO4 NC3 NH3 GL0 GL1 GL2 C1A C1B")
        leaflets = LeafletClassification.global_("@membrane", "name PO4")
        kwargs = dict(structure=str(fixtures / "cg.tpr"),
                      trajectory=str(fixtures / "split" / "cg*.xtc"))

    geo_results = Analysis(analysis_type=atype, geometry=geometry,
                           leaflets=leaflets, silent=True,
                           **kwargs).run()
    leaf_results = Analysis(analysis_type=atype, leaflets=leaflets,
                            silent=True, **kwargs).run()
    n_checked = 0
    def all_bonds(mol):
        return mol.bonds + [b for a in mol.atoms for b in a.bonds]

    for mol_g, mol_l in zip(geo_results.molecules, leaf_results.molecules):
        for bond_g, bond_l in zip(all_bonds(mol_g), all_bonds(mol_l)):
            assert bond_g.order.total.value == pytest.approx(
                bond_g.order.upper.value, abs=1e-9)
            assert bond_g.order.total.value == pytest.approx(
                bond_l.order.upper.value, abs=1e-9)
            assert math.isnan(bond_g.order.lower.value)
            n_checked += 1
    assert n_checked > 10


def test_aa_geometry_cuboid_z_equals_upper_leaflet(fixtures):
    """tests_aa.rs test_aa_order_geometry_cuboid_z."""
    _geometry_vs_leaflets(fixtures, "aa", Geometry(
        "cuboid", reference="@membrane", zdim=(0.0, 3.5)))


def test_aa_geometry_cylinder_z_equals_upper_leaflet(fixtures):
    """tests_aa.rs test_aa_order_geometry_cylinder_z."""
    _geometry_vs_leaflets(fixtures, "aa", Geometry(
        "cylinder", reference="@membrane", span=(0.0, 3.5),
        orientation="z"))


def test_cg_geometry_cuboid_z_equals_upper_leaflet(fixtures):
    """tests_cg.rs test_cg_order_geometry_cuboid_z."""
    _geometry_vs_leaflets(fixtures, "cg", Geometry(
        "cuboid", reference="@membrane", zdim=(0.0, 3.5)))


def test_cg_geometry_cylinder_z_equals_upper_leaflet(fixtures):
    """tests_cg.rs test_cg_order_geometry_cylinder_z."""
    _geometry_vs_leaflets(fixtures, "cg", Geometry(
        "cylinder", reference="@membrane", span=(0.0, 3.5),
        orientation="z"))
