"""Fused Pallas P2 kernel (interpret mode on CPU) vs the XLA einsum path.

The Pallas path must produce identical sample counts and per-type sums
within one 1e-6 quantum per sample (XLA FMA-contracts its |d|² reduce;
see gorder_tpu/ops/pallas_p2.py docstring), and the end-to-end analysis
driven through it must match the reference goldens."""

import numpy as np
import pytest

from gorder_tpu.core.order import make_order_step


def _decode(out):
    """(B,4,T) [l2, l1, l0, count] → (sum_int, count) per type."""
    from gorder_tpu.core.order import recombine_limbs

    sums, counts = recombine_limbs(np.asarray(out))
    return sums.sum(0), counts.sum(0)


def _random_problem(seed=0, B=16, A=64, N=700, T=5):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0, 10, (B, A, 3)).astype(np.float32)
    box = np.full((B, 3), 10.0, np.float32)
    atom_a = rng.integers(0, A, N).astype(np.int32)
    atom_b = rng.integers(0, A, N).astype(np.int32)
    btype = rng.integers(0, T, N).astype(np.int32)
    bmol = np.zeros(N, np.int32)
    mask = np.ones(B, bool)
    mask[-3:] = False
    return coords, box, atom_a, atom_b, btype, bmol, mask, T


@pytest.mark.parametrize("handle_pbc", [True, False])
def test_pallas_matches_einsum_path(monkeypatch, handle_pbc):
    coords, box, atom_a, atom_b, btype, bmol, mask, T = _random_problem()
    normal = np.array([0, 0, 1], np.float32)

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_order_step(atom_a, atom_b, btype, bmol, T, 1,
                           handle_pbc=handle_pbc)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_order_step(atom_a, atom_b, btype, bmol, T, 1,
                          handle_pbc=handle_pbc)

    out_f, _ = fast(coords, box, normal, mask)
    out_r, _ = ref(coords, box, normal, mask)
    sum_f, ct_f = _decode(np.asarray(out_f["total"]))
    sum_r, ct_r = _decode(np.asarray(out_r["total"]))
    np.testing.assert_array_equal(ct_f, ct_r)
    assert (np.abs(sum_f - sum_r) <= ct_r).all(), (sum_f, sum_r, ct_r)


def test_pallas_quantized_path(monkeypatch):
    coords, box, atom_a, atom_b, btype, bmol, mask, T = _random_problem(1)
    normal = np.array([1, 0, 0], np.float32)
    prec = 100.0
    qcoords = np.round(coords * prec).astype(np.int16)
    inv = np.full(len(coords), 1.0 / prec, np.float32)

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_order_step(atom_a, atom_b, btype, bmol, T, 1)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_order_step(atom_a, atom_b, btype, bmol, T, 1)

    out_f, _ = fast(qcoords, box, normal, mask, inv_scale=inv)
    out_r, _ = ref(qcoords, box, normal, mask, inv_scale=inv)
    sum_f, ct_f = _decode(np.asarray(out_f["total"]))
    sum_r, ct_r = _decode(np.asarray(out_r["total"]))
    np.testing.assert_array_equal(ct_f, ct_r)
    assert (np.abs(sum_f - sum_r) <= ct_r).all()


def test_pallas_batch_invariance(monkeypatch):
    """Two half-batches must sum to the full batch exactly (the kernel's
    reductions are integer-exact)."""
    coords, box, atom_a, atom_b, btype, bmol, mask, T = _random_problem()
    normal = np.array([0, 0, 1], np.float32)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    step = make_order_step(atom_a, atom_b, btype, bmol, T, 1)

    full, _ = step(coords, box, normal, mask)
    h1, _ = step(coords[:8], box[:8], normal, mask[:8])
    h2, _ = step(coords[8:], box[8:], normal, mask[8:])
    s_full, c_full = _decode(np.asarray(full["total"]))
    s1, c1 = _decode(np.asarray(h1["total"]))
    s2, c2 = _decode(np.asarray(h2["total"]))
    np.testing.assert_array_equal(s_full, s1 + s2)
    np.testing.assert_array_equal(c_full, c1 + c2)


def test_pallas_end_to_end_golden(monkeypatch, fixtures, tmp_path):
    """Full CG analysis through the Pallas path reproduces the golden."""
    from gorder_tpu.input import Analysis, AnalysisType
    from gorder_tpu.present import write_yaml

    from .golden import assert_eq_order

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_basic.yaml"))


def test_pallas_leaflet_variant_matches_einsum(monkeypatch):
    """The leaflet-masked fused kernel reproduces the einsum path's
    total/upper/lower sums and counts."""
    rng = np.random.default_rng(7)
    B, A, N, T, M = 16, 64, 700, 5, 10
    coords = rng.uniform(0, 10, (B, A, 3)).astype(np.float32)
    box = np.full((B, 3), 10.0, np.float32)
    atom_a = rng.integers(0, A, N).astype(np.int32)
    atom_b = rng.integers(0, A, N).astype(np.int32)
    btype = rng.integers(0, T, N).astype(np.int32)
    bmol = rng.integers(0, M, N).astype(np.int32)
    mask = np.ones(B, bool)
    mask[-2:] = False
    classes = rng.integers(0, 2, (B, M)).astype(np.int32)
    normal = np.array([0, 0, 1], np.float32)

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_order_step(atom_a, atom_b, btype, bmol, T, M,
                           with_leaflets=True)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_order_step(atom_a, atom_b, btype, bmol, T, M,
                          with_leaflets=True)

    out_f, _ = fast(coords, box, normal, mask, classes)
    out_r, _ = ref(coords, box, normal, mask, classes)
    for cls in ("total", "upper", "lower"):
        sum_f, ct_f = _decode(np.asarray(out_f[cls]))
        sum_r, ct_r = _decode(np.asarray(out_r[cls]))
        np.testing.assert_array_equal(ct_f, ct_r)
        assert (np.abs(sum_f - sum_r) <= ct_r).all(), cls
    # leaflet masks partition the totals exactly
    sum_t, ct_t = _decode(np.asarray(out_f["total"]))
    sum_u, ct_u = _decode(np.asarray(out_f["upper"]))
    sum_l, ct_l = _decode(np.asarray(out_f["lower"]))
    np.testing.assert_array_equal(ct_t, ct_u + ct_l)
    np.testing.assert_array_equal(sum_t, sum_u + sum_l)


def test_pallas_end_to_end_leaflets_golden(monkeypatch, fixtures, tmp_path):
    """Full CG leaflet-wise analysis through the fused leaflet kernel
    reproduces the golden."""
    from gorder_tpu.input import Analysis, AnalysisType, LeafletClassification
    from gorder_tpu.present import write_yaml

    from .golden import assert_eq_order

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        leaflets=LeafletClassification.global_("@membrane", "name PO4"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_leaflets.yaml"))


def test_pallas_unsupported_configs_fall_back(monkeypatch):
    """Map/geometry/dynamic-normal configs must not use the fused
    kernel; leaflet-wise static-normal configs now do."""
    from gorder_tpu.ops.pallas_p2 import pallas_supported

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    base = dict(with_leaflets=False, normal_mode="static", map_spec=None,
                geom_spec=None, n_types=4)
    assert pallas_supported(**base)
    assert pallas_supported(**{**base, "with_leaflets": True})
    assert not pallas_supported(**{**base, "normal_mode": "per_molecule"})
    assert not pallas_supported(**{**base, "map_spec": object()})
    assert not pallas_supported(**{**base, "geom_spec": object()})
    assert not pallas_supported(**{**base, "n_types": 1000})
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    assert not pallas_supported(**base)
