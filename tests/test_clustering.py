"""Clustering leaflet classification: spectral (flat bilayer golden) and
spherical GMM (synthetic vesicle)."""

import numpy as np
import pytest

from gorder_tpu.input import Analysis, AnalysisType, Frequency, LeafletClassification
from gorder_tpu.present import write_yaml

from .golden import assert_eq_order


def test_aa_clustering_matches_golden(fixtures, tmp_path):
    """Spectral clustering on a flat bilayer reproduces the global-method
    golden (the reference's test_aa_order_leaflets_yaml clustering case)."""
    analysis = Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=[str(fixtures / "split" / f"pcpepg{i}.xtc")
                    for i in range(1, 6)],
        analysis_type=AnalysisType.aaorder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        leaflets=LeafletClassification.clustering("name P"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "aa_order_leaflets.yaml"))


def test_cg_clustering_every4(fixtures, tmp_path):
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        leaflets=LeafletClassification.clustering("name PO4").with_frequency(
            Frequency.every(4)),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_leaflets.yaml"))


def test_spherical_gmm_vesicle():
    """Synthetic two-shell vesicle: the GMM must put the outer shell in the
    upper leaflet for every frame."""
    from gorder_tpu.core.clustering import make_spherical_classifier

    rng = np.random.default_rng(3)
    n_outer, n_inner = 160, 90
    box = np.array([30.0, 30.0, 30.0], np.float32)
    center = box / 2

    def shell(n, radius):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        r = radius + rng.normal(0, 0.15, (n, 1))
        return center + v * r

    frames = []
    for _ in range(3):
        pts = np.concatenate([shell(n_outer, 8.0), shell(n_inner, 5.5)])
        frames.append(pts)
    coords = np.asarray(frames, np.float32)
    boxes = np.tile(box, (3, 1))

    classify = make_spherical_classifier(np.arange(n_outer + n_inner))
    classes = np.asarray(classify(coords, boxes))
    assert (classes[:, :n_outer] == 0).all()   # outer = upper
    assert (classes[:, n_outer:] == 1).all()   # inner = lower


def test_spectral_orienter_scrambling():
    """Membership matching keeps leaflet identity stable when cluster labels
    flip between frames, and errors when no match exists."""
    from gorder_tpu.core.clustering import SpectralOrienter
    from gorder_tpu.errors import ClusterError

    orienter = SpectralOrienter(np.arange(10))
    frame0 = np.array([0] * 6 + [1] * 4)
    classes0 = orienter.orient(frame0)
    assert (classes0 == np.array([0] * 6 + [1] * 4)).all()

    # identical clustering but labels swapped → same leaflets
    classes1 = orienter.orient(1 - frame0)
    assert (classes1 == classes0).all()

    # one molecule flips leaflet → still matched
    frame2 = frame0.copy()
    frame2[5] = 1
    classes2 = orienter.orient(frame2)
    assert (classes2[:5] == 0).all() and (classes2[5:] == 1).all()

    # total scramble → no ≥80% match → error
    with pytest.raises(ClusterError):
        orienter.orient(np.array([0, 1] * 5))


def _two_shell_heads(n_outer, n_inner, r_outer, r_inner, box, seed=3,
                     jitter=0.02):
    """Vesicle-like head cloud: two concentric spherical shells,
    interleaved in index order like nothing in particular (outer block
    first)."""
    rng = np.random.default_rng(seed)

    def shell(n, radius):
        i = np.arange(n, dtype=np.float64)
        golden = np.pi * (3.0 - np.sqrt(5.0))
        z = 1.0 - 2.0 * (i + 0.5) / n
        r = np.sqrt(1.0 - z * z)
        theta = golden * i
        pts = np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=1)
        return box / 2 + radius * pts

    heads = np.concatenate([shell(n_outer, r_outer),
                            shell(n_inner, r_inner)])
    heads += rng.normal(0, jitter, heads.shape)
    return heads.astype(np.float32)


def test_spectral_nystrom_50k_vesicle():
    """Past the dense threshold the Nyström landmark path classifies a
    50k-head synthetic vesicle correctly in bounded memory, and is
    deterministic across runs (VERDICT r1 #5; replaces the reference's
    randomized sparse-Lanczos 'sloppy' regime, clustering.rs:163-246)."""
    import numpy as np

    from gorder_tpu.core.clustering import (
        DENSE_CLUSTER_HEADS,
        make_spectral_labels,
    )

    n_outer, n_inner = 30_200, 19_800
    assert n_outer + n_inner > DENSE_CLUSTER_HEADS
    box = np.array([44.0, 44.0, 44.0], np.float32)
    heads = _two_shell_heads(n_outer, n_inner, 18.5, 15.0, box)

    coords = heads[None]                         # one frame, heads only
    fn = make_spectral_labels(
        np.arange(len(heads), dtype=np.int32))
    labels = np.asarray(fn(coords, box[None, :3] * np.ones((1, 3),
                                                           np.float32)))
    l = labels[0]
    outer = l[:n_outer]
    inner = l[n_outer:]
    # clean separation: each shell in one cluster, clusters distinct
    assert len(np.unique(outer)) == 1, np.bincount(outer)
    assert len(np.unique(inner)) == 1, np.bincount(inner)
    assert outer[0] != inner[0]

    labels2 = np.asarray(fn(coords, box[None, :3] * np.ones((1, 3),
                                                            np.float32)))
    np.testing.assert_array_equal(labels, labels2)  # deterministic


def test_spectral_nystrom_matches_dense():
    """On a mid-size system the landmark path agrees with the dense path
    (same bipartition, modulo label permutation)."""
    import numpy as np

    from gorder_tpu.core import clustering as cl

    n_outer, n_inner = 700, 300
    box = np.array([20.0, 20.0, 20.0], np.float32)
    heads = _two_shell_heads(n_outer, n_inner, 7.8, 4.2, box)
    coords = heads[None]
    box_diag = box[None, :]

    idx = np.arange(len(heads), dtype=np.int32)
    dense = np.asarray(cl.make_spectral_labels(idx)(coords, box_diag))[0]

    # force the Nyström path on the same input
    orig = cl.DENSE_CLUSTER_HEADS
    try:
        cl.DENSE_CLUSTER_HEADS = 10
        nystrom = np.asarray(
            cl.make_spectral_labels(idx)(coords, box_diag))[0]
    finally:
        cl.DENSE_CLUSTER_HEADS = orig

    same = (dense == nystrom).mean()
    assert same > 0.999 or same < 0.001, same  # identical up to label swap


def _orient_sets(orienter, heads, cluster1):
    labels = np.array([0 if h in cluster1 else 1 for h in heads], np.int32)
    classes = orienter.orient(labels)
    upper = {h for h, c in zip(heads, classes) if c == 0}
    lower = {h for h, c in zip(heads, classes) if c == 1}
    return upper, lower


def test_orienter_ab_initio_and_matching_hand_cases():
    """Cluster→leaflet identity decisions from clustering.rs:819-930
    (classify_ab_initio / classify_by_match, adapted to disjoint
    clusters): larger population wins ab initio, ties go to the cluster
    holding the lowest head index, later frames follow the previous
    assignment by ≥80% overlap, and an unmatched split is an error."""
    from gorder_tpu.core.clustering import SpectralOrienter
    from gorder_tpu.errors import ClusterError

    c1 = {13, 18, 24, 27, 29, 33, 156, 17, 14}
    c2 = {1, 4, 8, 146, 158, 123, 1453, 19}

    # unequal populations: the bigger cluster (c1, 9 vs 8) is upper
    heads = sorted(c1 | c2)
    orienter = SpectralOrienter(heads)
    upper, lower = _orient_sets(orienter, heads, c1)
    assert upper == c1 and lower == c2

    # equal populations: the cluster holding the minimum head index (1)
    c2_eq = c2 | {20}
    heads = sorted(c1 | c2_eq)
    orienter = SpectralOrienter(heads)
    upper, lower = _orient_sets(orienter, heads, c1)
    assert upper == c2_eq and lower == c1

    # perfect match: identical clusters keep their identity
    upper, lower = _orient_sets(orienter, heads, c1)
    assert upper == c2_eq and lower == c1

    # small mismatch: one head (1) migrates; the smaller cluster still
    # matches the previous upper and keeps the identity
    c1_new = c1 | {1}
    c2_new = c2_eq - {1}
    upper, lower = _orient_sets(orienter, heads, c1_new)
    assert upper == c2_new and lower == c1_new

    # ... and the result is invariant to the raw label order
    orienter.prev_upper = np.isin(heads, sorted(c2_eq))
    upper, lower = _orient_sets(orienter, heads, c2_new)
    assert upper == c2_new and lower == c1_new

    # large mismatch: about half of each cluster swapped — neither
    # cluster reaches the 80% overlap limit
    orienter.prev_upper = np.isin(heads, sorted(c2_eq))
    c1_bad = {13, 18, 24, 27, 17, 14, 1, 19}
    with pytest.raises(ClusterError, match="80"):
        _orient_sets(orienter, heads, c1_bad)

