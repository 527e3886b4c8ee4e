"""Sweep every reference config fixture (tests/files/inputs/*.yaml) through
the YAML schema parser and assert the accept/reject outcome matches the
reference's (invalid fixtures are the ones its error tests feed to
`Analysis::from_file`; everything else must parse cleanly)."""

import glob
import os

import pytest

from gorder_tpu.errors import GorderError
from gorder_tpu.input import Analysis

from .conftest import FIXTURES

INPUTS = FIXTURES / "inputs"

# Fixtures the reference itself rejects at parse/validation time, with the
# substring our error message must contain.
EXPECTED_INVALID = {
    "begin_higher.yaml": "begin",
    "cuboid_invalid_dimension.yaml": "first value for dimension",
    "cylinder_invalid_span.yaml": "span",
    "cylinder_negative_radius.yaml": "radius",
    "estimate_error_invalid_n_blocks.yaml": "blocks",
    "estimate_error_unknown_keyword.yaml": "estimate_error",
    "incomplete.yaml": "required",
    "invalid_dynamic_normal_radius1.yaml": "radius",
    "invalid_dynamic_normal_radius2.yaml": "radius",
    "invalid_structure_format.yaml": "unknown, invalid, or unsupported format",
    "leaflets_zero_frequency.yaml": "frequency",
    "ordermap_invalid_bin_size_x.yaml": "bin size",
    "ordermap_invalid_bin_size_y.yaml": "bin size",
    "ordermap_invalid_dim_x.yaml": "span",
    "ordermap_invalid_dim_y.yaml": "span",
    "ordermap_unknown_keyword.yaml": "ordermap",
    "ordermap_zero_min_samples.yaml": "min_samples",
    "fail_ordermaps_working_dir.yaml": "current directory",
    "sphere_negative_radius.yaml": "radius",
    "ua_no_carbons.yaml": "united-atom order parameters",
    "zero_min_samples.yaml": "min_samples",
    "zero_n_threads.yaml": "n_threads",
    "zero_step.yaml": "step",
}


def _input_files():
    if not INPUTS.is_dir():
        return []
    return sorted(glob.glob(str(INPUTS / "*.yaml")))


@pytest.mark.parametrize(
    "path", _input_files(), ids=lambda p: os.path.basename(p))
def test_config_fixture(path):
    name = os.path.basename(path)
    if name in EXPECTED_INVALID:
        with pytest.raises(GorderError) as exc:
            Analysis.from_file(path)
        assert EXPECTED_INVALID[name] in str(exc.value), (
            f"{name}: rejected for the wrong reason: {exc.value}")
    else:
        Analysis.from_file(path)  # must parse without error


def test_fixture_corpus_present():
    if not INPUTS.is_dir():
        pytest.skip("reference fixture corpus not available")
    assert len(_input_files()) >= 60


def test_ordermap_cwd_rejected(tmp_path):
    """The ordermap output dir must never resolve to the cwd
    (ordermap.rs:196-214 — the writer clears the directory)."""
    from gorder_tpu.errors import OrderMapError
    from gorder_tpu.input import OrderMapParams

    for bad in (".", "tests/../gorder_tpu/.."):
        with pytest.raises(OrderMapError) as exc:
            OrderMapParams.parse({"output_directory": bad})
        assert "current directory" in str(exc.value)
    OrderMapParams.parse({"output_directory": str(tmp_path / "maps")})


def test_inverted_cuboid_fields():
    """`x`/`y` aliases and `invert` land in the Geometry config."""
    if not INPUTS.is_dir():
        pytest.skip("reference fixture corpus not available")
    a = Analysis.from_file(str(INPUTS / "inverted_cuboid.yaml"))
    g = a.geometry
    assert g.kind == "cuboid" and g.invert
    assert g.xdim == (-2.0, 4.0) and g.ydim == (-4.0, 1.0)


def test_scalar_fromfile_forms():
    """`!FromFile "path"` scalar forms for leaflets and membrane normals."""
    if not INPUTS.is_dir():
        pytest.skip("reference fixture corpus not available")
    a = Analysis.from_file(str(INPUTS / "leaflets_from_file.yaml"))
    assert a.leaflets.kind == "from_file" and a.leaflets.file.endswith(".yaml")
    b = Analysis.from_file(str(INPUTS / "membrane_normal_from_file.yaml"))
    assert b.membrane_normal.kind == "from_file"


def test_inline_tags():
    """`!Inline` maps to the from_map machinery for both subsystems."""
    if not INPUTS.is_dir():
        pytest.skip("reference fixture corpus not available")
    a = Analysis.from_file(str(INPUTS / "leaflets_from_map.yaml"))
    assert a.leaflets.kind == "from_map" and "POPE" in a.leaflets.assignment
    b = Analysis.from_file(str(INPUTS / "inline_manual_normals.yaml"))
    assert b.membrane_normal.kind == "from_map"
    assert all(isinstance(v, list)
               for v in b.membrane_normal.normals_map.values())


def test_repo_examples_parse():
    """Every YAML in examples/ must parse through the full config schema."""
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    files = sorted((repo / "examples").rglob("*.yaml"))
    assert len(files) >= 9
    for f in files:
        Analysis.from_file(str(f))
