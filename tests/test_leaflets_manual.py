"""Manual leaflet methods (from file / map / NDX) + leaflet export."""

import yaml
import numpy as np
import pytest

from gorder_tpu.errors import ManualLeafletError, NdxLeafletError
from gorder_tpu.input import Analysis, AnalysisType, Frequency, LeafletClassification
from gorder_tpu.present import write_yaml
from gorder_tpu.present.leaflets_out import write_leaflets

from .golden import assert_eq_order


def cg_analysis(fixtures, leaflets, **kwargs):
    return Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        leaflets=leaflets,
        silent=True, overwrite=True, **kwargs,
    )


def test_cg_leaflets_from_file_once(fixtures, tmp_path):
    leaflets = LeafletClassification.from_file(
        str(fixtures / "inputs" / "leaflets_files" / "cg_once.yaml"))
    leaflets.with_frequency(Frequency.once())
    results = cg_analysis(fixtures, leaflets).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_leaflets.yaml"))


def test_cg_leaflets_from_file_every(fixtures, tmp_path):
    leaflets = LeafletClassification.from_file(
        str(fixtures / "inputs" / "leaflets_files" / "cg_every.yaml"))
    results = cg_analysis(fixtures, leaflets).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_leaflets.yaml"))


def test_cg_leaflets_from_file_every20(fixtures, tmp_path):
    leaflets = LeafletClassification.from_file(
        str(fixtures / "inputs" / "leaflets_files" / "cg_every20.yaml"))
    leaflets.with_frequency(Frequency.every(20))
    results = cg_analysis(fixtures, leaflets).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_leaflets.yaml"))


def test_cg_leaflets_from_map_once(fixtures, tmp_path):
    assignment = yaml.safe_load(
        open(fixtures / "inputs" / "leaflets_files" / "cg_once.yaml"))
    leaflets = LeafletClassification.from_map(assignment)
    leaflets.with_frequency(Frequency.once())
    results = cg_analysis(fixtures, leaflets).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_leaflets.yaml"))


def test_cg_leaflets_from_ndx_once(fixtures, tmp_path):
    leaflets = LeafletClassification.from_ndx(
        [str(fixtures / "ndx" / "cg_leaflets.ndx")],
        "name PO4", "Upper", "Lower")
    leaflets.with_frequency(Frequency.once())
    results = cg_analysis(fixtures, leaflets).run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_leaflets.yaml"))


def test_from_ndx_glob_expansion(fixtures):
    """A string ndx value is a glob pattern, expanded sorted; an unmatched
    pattern is kept literally (leaflets.rs deserialize_string_or_vec)."""
    lc = LeafletClassification.from_ndx(
        str(fixtures / "ndx" / "glob" / "index*.ndx"),
        "name P", "Upper", "Lower")
    assert [p.rsplit("/", 1)[-1] for p in lc.ndx] == [
        "index1.ndx", "index2.ndx"]
    lit = LeafletClassification.from_ndx(
        "no/such/file*.ndx", "name P", "Upper", "Lower")
    assert lit.ndx == ["no/such/file*.ndx"]


def test_manual_frame_count_mismatch(fixtures):
    leaflets = LeafletClassification.from_file(
        str(fixtures / "inputs" / "leaflets_files" / "cg_once.yaml"))
    # every(1) over 101 frames needs 101 assignment frames, the file has 1
    with pytest.raises(ManualLeafletError):
        cg_analysis(fixtures, leaflets).run()


def test_manual_missing_moltype(fixtures):
    leaflets = LeafletClassification.from_map({"POPC": [[1] * 242]})
    leaflets.with_frequency(Frequency.once())
    with pytest.raises(ManualLeafletError):
        cg_analysis(fixtures, leaflets).run()


def test_ndx_missing_group(fixtures):
    leaflets = LeafletClassification.from_ndx(
        [str(fixtures / "ndx" / "cg_leaflets.ndx")],
        "name PO4", "NoSuchGroup", "Lower")
    leaflets.with_frequency(Frequency.once())
    with pytest.raises(NdxLeafletError):
        cg_analysis(fixtures, leaflets).run()


def test_aa_leaflet_export(fixtures, tmp_path):
    for freq, golden in ((Frequency.every(1), "aa_leaflets_every1.yaml"),
                         (Frequency.every(5), "aa_leaflets_every5.yaml"),
                         (Frequency.once(), "aa_leaflets_once.yaml")):
        leaflets = LeafletClassification.global_("@membrane", "name P")
        leaflets.with_frequency(freq)
        leaflets.with_collect(str(tmp_path / "leaflets.yaml"))
        analysis = Analysis(
            structure=str(fixtures / "pcpepg.tpr"),
            trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                        for i in range(1, 6)],
            analysis_type=AnalysisType.aaorder(
                "@membrane and element name carbon",
                "@membrane and element name hydrogen"),
            leaflets=leaflets,
            silent=True, overwrite=True,
        )
        results = analysis.run()
        write_leaflets(results, str(tmp_path / "leaflets.yaml"))
        # discrete 1/0 assignments are robust to the split fixtures'
        # re-encoding: byte-exact against the reference goldens
        assert_eq_order(str(tmp_path / "leaflets.yaml"),
                        str(fixtures / golden), exact=True)


def test_manual_unexpected_moltype(fixtures):
    """Extra molecule types in the assignment are an error
    (test_cg_order_leaflets_from_map_fail_unexpected_molecule_type)."""
    leaflets = LeafletClassification.from_map({
        "POPC": [[1] * 242], "POPE": [[1] * 242], "POPG": [[1] * 24],
        "WATER": [[1] * 3]})
    leaflets.with_frequency(Frequency.once())
    with pytest.raises(ManualLeafletError,
                       match="not found in the system"):
        cg_analysis(fixtures, leaflets).run()


def test_manual_empty_assignment(fixtures):
    """test_cg_order_leaflets_from_map_fail_empty_assignment."""
    leaflets = LeafletClassification.from_map({
        "POPC": [], "POPE": [[1] * 242], "POPG": [[1] * 24]})
    leaflets.with_frequency(Frequency.once())
    with pytest.raises(ManualLeafletError,
                       match="no leaflet assignment data provided"):
        cg_analysis(fixtures, leaflets).run()


def test_manual_file_nonexistent_and_invalid(fixtures, tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("not: [valid\n")
    for path, match in (("/no/such/file.yaml", "could not open"),
                        (str(bad), "could not understand")):
        leaflets = LeafletClassification.from_file(path)
        with pytest.raises(ManualLeafletError, match=match):
            cg_analysis(fixtures, leaflets).run()


def test_manual_invalid_molecule_count(fixtures):
    """Per-frame assignment lists whose molecule count does not match the
    system fail (tests_aa.rs/tests_cg.rs
    *_from_file/_from_map_fail_invalid_number_of_molecules)."""
    # cg fixture has 242 POPC molecules; supply 241
    leaflets = LeafletClassification.from_map({"POPC": [[1] * 241]})
    leaflets.with_frequency(Frequency.once())
    with pytest.raises(ManualLeafletError):
        cg_analysis(fixtures, leaflets).run()


def test_ndx_wrong_file_count(fixtures):
    """from_ndx needs exactly one NDX file per assignment frame — too few
    and too many both fail (tests_aa.rs
    test_aa_order_leaflets_from_ndx_fail_missing_ndx / _too_many_ndx)."""
    one = str(fixtures / "ndx" / "cg_leaflets.ndx")
    # every(10) over 101 frames needs 11 assignment frames; 5 files fail
    leaflets = LeafletClassification.from_ndx(
        [one] * 5, "name PO4", "Upper", "Lower")
    leaflets.with_frequency(Frequency.every(10))
    with pytest.raises(NdxLeafletError):
        cg_analysis(fixtures, leaflets).run()
    # 101 files for frequency once (needs exactly 1) fail too
    leaflets = LeafletClassification.from_ndx(
        [one] * 101, "name PO4", "Upper", "Lower")
    leaflets.with_frequency(Frequency.once())
    with pytest.raises(NdxLeafletError):
        cg_analysis(fixtures, leaflets).run()
