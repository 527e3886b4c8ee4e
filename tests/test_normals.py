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
