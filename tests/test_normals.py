"""Dynamic and manual membrane normals."""

import numpy as np
import yaml
import pytest

from gorder_tpu.errors import ManualNormalError
from gorder_tpu.input import Analysis, AnalysisType, MembraneNormal
from gorder_tpu.present import write_yaml
from gorder_tpu.present.normals_out import write_normals

from .golden import assert_eq_order

SATURATED = ("(resname POPC and name r'^C' and not name C15 C34 C24 C25) or "
             "(resname POPS and name r'^C' and not name C6 C18 C39 C27 C28)")
UNSATURATED = ("(resname POPC and name C24 C25) or "
               "(resname POPS and name C27 C28)")


def ua_analysis(fixtures, **kwargs):
    return Analysis(
        structure=str(fixtures / "ua.tpr"),
        trajectory=str(fixtures / "ua.xtc"),
        analysis_type=AnalysisType.uaorder(
            saturated=SATURATED, unsaturated=UNSATURATED),
        silent=True, overwrite=True, **kwargs,
    )


def test_ua_dynamic_normals(fixtures, tmp_path):
    analysis = ua_analysis(
        fixtures,
        membrane_normal=MembraneNormal.dynamic("name r'^P'", 2.0),
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "ua_order_dynamic_normals.yaml"))


def test_ua_dynamic_normals_export(fixtures, tmp_path):
    analysis = ua_analysis(
        fixtures,
        membrane_normal=MembraneNormal.dynamic("name r'^P'", 2.0,
                                               collect=True),
    )
    results = analysis.run()
    out = tmp_path / "normals.yaml"
    write_normals(results, str(out))

    # compare against the reference export golden up to the PCA sign
    # ambiguity (the smallest principal direction is defined up to ±1;
    # the reference keeps whatever sign its SVD produced)
    def load(path):
        text = "\n".join(l for l in open(path).read().splitlines()
                         if not l.startswith("#"))
        return yaml.safe_load(text)

    mine = load(str(out))
    golden = load(str(fixtures / "ua_normals.yaml"))
    assert list(mine) == list(golden)
    for mol in golden:
        a = np.asarray(mine[mol], np.float64)
        b = np.asarray(golden[mol], np.float64)
        assert a.shape == b.shape
        direct = np.abs(a - b).max(axis=-1)
        flipped = np.abs(a + b).max(axis=-1)
        assert np.minimum(direct, flipped).max() < 5e-3


def test_manual_normals_from_map(fixtures, tmp_path):
    # constant +z normals for every frame/molecule == static z analysis
    static = ua_analysis(fixtures).run()
    n_frames = static.n_analyzed_frames
    mapping = {
        mol.name: [[[0.0, 0.0, 1.0]] * _n_mols(static, mol.name)
                   for _ in range(n_frames)]
        for mol in static.molecules
    }
    manual = ua_analysis(
        fixtures, membrane_normal=MembraneNormal.from_map(mapping)).run()
    for m_static, m_manual in zip(static.molecules, manual.molecules):
        assert abs(m_static.average_order.total.value
                   - m_manual.average_order.total.value) < 1e-6


def _n_mols(results, name):
    counts = {"POPC": 102, "POPS": 26}
    return counts[name]


def test_manual_normals_frame_count_mismatch(fixtures):
    mapping = {
        "POPC": [[[0.0, 0.0, 1.0]] * 102],
        "POPS": [[[0.0, 0.0, 1.0]] * 26],
    }
    analysis = ua_analysis(
        fixtures, membrane_normal=MembraneNormal.from_map(mapping))
    with pytest.raises(ManualNormalError):
        analysis.run()


def test_manual_normals_error_fixtures(fixtures):
    """Validation errors for the reference's malformed normals files
    (tests_cg.rs vesicle manual-normal failure tests, run against the
    table builder with matching synthetic molecule kinds)."""
    from dataclasses import dataclass

    import yaml

    from gorder_tpu.analysis import _manual_normals_table

    @dataclass
    class Kind:
        name: str
        n_molecules: int

    def load(name):
        with open(fixtures / name) as fh:
            return yaml.safe_load(fh)

    kinds = [Kind("POPE", 3), Kind("POPG", 3)]
    with pytest.raises(ManualNormalError) as e:
        _manual_normals_table(load("normals_empty.yaml"), kinds)
    assert "no membrane normals provided for molecule type" in str(e.value)

    with pytest.raises(ManualNormalError) as e:
        _manual_normals_table(load("normals_missing.yaml"), kinds)
    assert "not found in the manual normals structure" in str(e.value)

    with pytest.raises(ManualNormalError) as e:
        _manual_normals_table(load("normals_unmatching.yaml"),
                              [Kind("POPE", 5), Kind("POPG", 3)])
    assert "molecules" in str(e.value)


def _cloud_normal(points):
    """Normal of one point cloud via the production kernel: a single head
    with a radius covering every point (centering makes the head position
    irrelevant, normal.rs membrane_normal_from_cloud:421-458)."""
    from gorder_tpu.core.normals import make_dynamic_normals

    pts = np.asarray(points, np.float32)
    coords = pts[None]
    box = np.array([[1e6, 1e6, 1e6]], np.float32)
    compute = make_dynamic_normals([0], list(range(len(pts))), 1e5,
                                   handle_pbc=False)
    normals, counts = compute(coords, box)
    assert int(counts[0, 0]) == len(pts)
    return np.asarray(normals)[0, 0]


def test_cloud_normal_axis_hand_values():
    """normal.rs:560-645 test_static: axis-aligned planes → axis normals,
    diagonal plane → (±1/√2, ∓1/√2, 0)."""
    grid = [1.0, 2.0, 3.0]

    n = _cloud_normal([[x, y, 2.0] for x in grid for y in grid])
    np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-6)

    n = _cloud_normal([[2.0, y, z] for y in grid for z in grid])
    np.testing.assert_allclose(np.abs(n), [1, 0, 0], atol=1e-6)

    n = _cloud_normal([[x, -1.5, z] for x in grid for z in grid])
    np.testing.assert_allclose(np.abs(n), [0, 1, 0], atol=1e-6)

    s = 1 / np.sqrt(2)
    n = _cloud_normal([[xy, xy, z] for xy in [3.0, 4.0, 6.0]
                       for z in [-2.0, -1.0, 0.0]])
    np.testing.assert_allclose(np.abs(n), [s, s, 0], atol=1e-5)
    np.testing.assert_allclose(n[0] + n[1], 0, atol=1e-5)


def test_cloud_normal_slightly_irregular():
    """normal.rs:648 test_slightly_irregular: a wobbly near-flat patch
    still yields a z normal to 1e-2."""
    zs = iter([0.96, 0.98, 1.02, 1.03, 1.04, 1.06, 0.99, 0.98, 1.0])
    pts = [[x, y, next(zs)] for x in [0.9, 2.1, 3.4]
           for y in [0.3, 2.2, 3.7]]
    n = _cloud_normal(pts)
    np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-2)


def test_dynamic_normals_real_planar(fixtures):
    """normal.rs:664 test_real_planar: per-molecule dynamic normals on the
    pcpepg.tpr snapshot (heads "name P", radius 2.0) vs the reference's
    274 expected vectors, compared up to the PCA sign ambiguity."""
    import re

    from gorder_tpu.core.normals import make_dynamic_normals
    from gorder_tpu.io.tpr import read_tpr
    from gorder_tpu.select import select_mask

    from .conftest import REFERENCE

    src = (REFERENCE / "src" / "analysis" / "normal.rs").read_text()
    body = re.search(r"fn test_real_planar\(\)(.*?)\n    \}", src, re.S)
    expected = np.array(
        re.findall(r"Vector3D::new\(([^,]+),([^,]+),([^)]+)\)",
                   body.group(1)), np.float64)
    assert expected.shape == (274, 3)

    system = read_tpr(str(fixtures / "pcpepg.tpr"))
    heads = np.nonzero(select_mask(system, "name P"))[0]
    assert len(heads) == 274
    box = np.diag(system.box).astype(np.float32)
    compute = make_dynamic_normals(heads, heads, 2.0)
    normals, _counts = compute(system.positions[None], box[None])
    got = np.asarray(normals, np.float64)[0]

    # the reference TEST builds each cloud with filter_geometry over raw
    # absolute positions (no periodic images), while the production path
    # (and ours) uses whole min-image clouds (pbc.get_heads_cloud,
    # normal.rs:196 "this cloud must be whole"). Compare the molecules
    # whose cloud membership is identical either way — 104 of 274 on
    # this snapshot.
    pos = system.positions[heads].astype(np.float64)
    rel = pos[None, :, :] - pos[:, None, :]
    wrapped = rel - box * np.round(rel / box)
    same = ((wrapped ** 2).sum(-1) <= 4.0) == ((rel ** 2).sum(-1) <= 4.0)
    whole = same.all(axis=1)
    assert whole.sum() == 104

    direct = np.abs(got - expected).max(axis=-1)
    flipped = np.abs(got + expected).max(axis=-1)
    assert np.minimum(direct, flipped)[whole].max() < 5e-3


def test_manual_normals_unexpected_moltype(fixtures):
    """Extra molecule types in a manual normals map are rejected."""
    from gorder_tpu.input import Analysis, AnalysisType, MembraneNormal

    mapping = {"POPC": [[[0, 0, 1]] * 242], "POPE": [[[0, 0, 1]] * 242],
               "POPG": [[[0, 0, 1]] * 24], "WATER": [[[0, 0, 1]] * 3]}
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        membrane_normal=MembraneNormal.from_map(mapping),
        step=21, silent=True, overwrite=True)
    with pytest.raises(ManualNormalError, match="not found in the system"):
        analysis.run()


def test_normals_export_incomplete(fixtures, tmp_path):
    """Dynamic-normal export when geometry restriction leaves molecules
    without analyzed bonds in some frames: NaN rows must match the
    reference golden exactly, values up to the PCA sign ambiguity
    (tests_aa.rs test_aa_order_dynamic_normals_export_incomplete,
    normals_incomplete.yaml)."""
    from gorder_tpu.input.config import Geometry

    analysis = Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=AnalysisType.aaorder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        membrane_normal=MembraneNormal.dynamic("name P", 2.0, collect=True),
        geometry=Geometry("cylinder", radius=2.5, orientation="z"),
        step=10,
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "normals.yaml"
    write_normals(results, str(out))

    def load(path):
        text = "\n".join(l for l in open(path).read().splitlines()
                         if not l.startswith("#"))
        return yaml.safe_load(text)

    mine = load(str(out))
    golden = load(str(fixtures / "normals_incomplete.yaml"))
    assert list(mine) == list(golden)
    n_nan = n_val = 0
    for mol in golden:
        a = np.asarray(mine[mol], np.float64)
        b = np.asarray(golden[mol], np.float64)
        assert a.shape == b.shape
        nan_a, nan_b = np.isnan(a), np.isnan(b)
        # NaN pattern (which molecules missed the geometry in which
        # frames) matches up to re-encoded-fixture boundary flips
        assert (nan_a != nan_b).mean() <= 0.02, mol
        both = ~(nan_a.any(axis=-1) | nan_b.any(axis=-1))
        direct = np.abs(a[both] - b[both]).max(axis=-1)
        flipped = np.abs(a[both] + b[both]).max(axis=-1)
        assert np.minimum(direct, flipped).max() < 5e-3, mol
        n_nan += int(nan_b.any(axis=-1).sum())
        n_val += int(both.sum())
    assert n_nan > 0 and n_val > 0  # genuinely "incomplete"
