"""Runtime failure behaviors mirrored from the reference's *_fail_* tests
(tests_cg.rs:4005-4090, tests_aa.rs:4610): dynamic-normal constraints and
no-PBC geometry restrictions must be rejected with named errors."""

import pytest

from gorder_tpu.errors import (
    ConfigError,
    GorderError,
    OrderMapError,
    TopologyError,
)
from gorder_tpu.input import (
    Analysis,
    AnalysisType,
    LeafletClassification,
    MembraneNormal,
    OrderMapParams,
)
from gorder_tpu.input.config import Geometry


def cg(fixtures, **kw):
    return Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True, **kw)


def test_dynamic_normal_requires_explicit_map_plane(fixtures, tmp_path):
    """test_cg_order_fail_dynamic_undefined_ordermap_plane"""
    with pytest.raises(OrderMapError, match="plane"):
        cg(fixtures,
           membrane_normal=MembraneNormal.dynamic("name PO4", 2.0),
           map=OrderMapParams.parse({
               "output_directory": str(tmp_path / "m"),
               "bin_size": [1, 1]}))


def test_dynamic_normal_requires_leaflet_axis(fixtures):
    """test_cg_order_fail_dynamic_undefined_leaflet_normal"""
    with pytest.raises(ConfigError, match="membrane_normal"):
        cg(fixtures,
           membrane_normal=MembraneNormal.dynamic("name PO4", 2.0),
           leaflets=LeafletClassification.individual(
               "name PO4", "name C4A C4B")).run()


def test_dynamic_normal_multiple_heads(fixtures):
    """test_cg_order_fail_dynamic_multiple_heads"""
    with pytest.raises(TopologyError, match="multiple head group atoms"):
        cg(fixtures,
           membrane_normal=MembraneNormal.dynamic("name PO4 NC3", 2.0)).run()


def test_dynamic_normal_no_head(fixtures):
    """test_cg_order_fail_dynamic_no_head"""
    with pytest.raises(TopologyError, match="no head group atom"):
        cg(fixtures,
           membrane_normal=MembraneNormal.dynamic("name W", 2.0)).run()


def test_nopbc_rejects_box_center_reference(fixtures):
    """test_aa_order_geometry_no_pbc_fail_box_center"""
    with pytest.raises(GorderError, match="center of simulation box"):
        cg(fixtures, handle_pbc=False,
           geometry=Geometry("sphere", radius=2.5)).run()


def test_nothing_to_analyze_writes_no_output(fixtures, tmp_path):
    """Selections that match atoms but yield no analyzable molecules finish
    successfully with empty results and write NO files
    (test_cg_order_no_molecules, test_ua_order_nothing_to_analyze)."""
    out = tmp_path / "should_not_exist.yaml"
    results = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),
        analysis_type=AnalysisType.cgorder("@ion"),
        output_yaml=str(out), silent=True, overwrite=True).run()
    results.write()
    assert results.molecules == [] and results.n_analyzed_frames == 0
    assert not out.exists()

    out2 = tmp_path / "ua_should_not_exist.yaml"
    results = Analysis(
        structure=str(fixtures / "ua.tpr"),
        trajectory=str(fixtures / "ua.xtc"),
        analysis_type=AnalysisType.uaorder(saturated="@water",
                                           unsaturated="name Cs"),
        output_yaml=str(out2), silent=True, overwrite=True).run()
    results.write()
    assert results.molecules == []
    assert not out2.exists()


def test_heavy_hydrogen_overlap_fails(fixtures):
    """Overlapping heavy/hydrogen selections are rejected
    (common.rs check_groups_overlap, tests_aa.rs
    test_aa_order_basic_fail_overlap)."""
    import pytest

    from gorder_tpu.errors import TopologyError as TErr
    from gorder_tpu.input import Analysis, AnalysisType

    analysis = Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=str(fixtures / "split" / "pcpepg1.xtc"),
        analysis_type=AnalysisType.aaorder(
            "@membrane and element name carbon",
            "@membrane and (element name hydrogen or name C22)"),
        silent=True, overwrite=True)
    with pytest.raises(TErr, match="are part of both"):
        analysis.run()


def test_error_estimation_more_blocks_than_frames(fixtures):
    """n_blocks beyond the analyzed frame count errors like the reference
    (errors.rs NotEnoughData, tests_aa.rs
    test_aa_order_error_blocks_too_many)."""
    import pytest

    from gorder_tpu.errors import ErrorEstimationError
    from gorder_tpu.input import Analysis, AnalysisType, EstimateError

    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),  # 21 frames
        analysis_type=AnalysisType.cgorder("@membrane"),
        estimate_error=EstimateError(n_blocks=500),
        silent=True, overwrite=True)
    with pytest.raises(ErrorEstimationError,
                       match="fewer than the number of blocks"):
        analysis.run()


def test_clustering_needs_two_heads(fixtures):
    """Clustering with a single head atom errors
    (leaflets.rs NotEnoughAtomsToCluster, tests_cg.rs
    test_cg_order_leaflets_clustering_fail_not_enough_atoms)."""
    import pytest

    from gorder_tpu.errors import TopologyError
    from gorder_tpu.input import Analysis, AnalysisType, LeafletClassification

    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),
        analysis_type=AnalysisType.cgorder("resid 1"),
        leaflets=LeafletClassification.clustering("resid 1 and name PO4"),
        silent=True, overwrite=True)
    with pytest.raises(TopologyError, match="need at least '2' atoms"):
        analysis.run()
