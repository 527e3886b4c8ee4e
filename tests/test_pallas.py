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
    monkeypatch.setenv("GORDER_TPU_MESH", "0")
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
    monkeypatch.setenv("GORDER_TPU_MESH", "0")
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


def test_pallas_supported_gates(monkeypatch):
    """Leaflet-wise, per-molecule-normal, ordermap (hybrid) and geometry
    (midpoint-mask plane) configs all use the fused kernel; only the
    map+geometry combination stays fully on the XLA path."""
    from gorder_tpu.ops.pallas_p2 import pallas_supported

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    base = dict(with_leaflets=False, normal_mode="static", map_spec=None,
                geom_spec=None, n_types=4)
    assert pallas_supported(**base)
    assert pallas_supported(**{**base, "with_leaflets": True})
    assert pallas_supported(**{**base, "normal_mode": "per_molecule"})
    assert pallas_supported(**{**base, "map_spec": object()})
    assert pallas_supported(**{**base, "geom_spec": object()})
    assert not pallas_supported(**{**base, "geom_spec": object(),
                                   "map_spec": object()})
    assert not pallas_supported(**{**base, "n_types": 1000})
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    assert not pallas_supported(**base)


def test_pallas_per_molecule_normal_matches_einsum(monkeypatch):
    """Per-bond-normal fused kernel (vesicle / dynamic / manual normals,
    normal.rs:179-199) reproduces the einsum path's sums and counts."""
    rng = np.random.default_rng(11)
    B, A, N, T, M = 16, 64, 700, 5, 10
    coords = rng.uniform(0, 10, (B, A, 3)).astype(np.float32)
    box = np.full((B, 3), 10.0, np.float32)
    atom_a = rng.integers(0, A, N).astype(np.int32)
    atom_b = rng.integers(0, A, N).astype(np.int32)
    btype = rng.integers(0, T, N).astype(np.int32)
    bmol = rng.integers(0, M, N).astype(np.int32)
    mask = np.ones(B, bool)
    mask[-2:] = False
    # un-normalized per-molecule normals: the kernel must divide by |n|²
    normals = rng.normal(0, 1, (B, M, 3)).astype(np.float32) * 2.5

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_order_step(atom_a, atom_b, btype, bmol, T, M,
                           normal_mode="per_molecule")
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_order_step(atom_a, atom_b, btype, bmol, T, M,
                          normal_mode="per_molecule")

    out_f, _ = fast(coords, box, normals, mask)
    out_r, _ = ref(coords, box, normals, mask)
    sum_f, ct_f = _decode(np.asarray(out_f["total"]))
    sum_r, ct_r = _decode(np.asarray(out_r["total"]))
    np.testing.assert_array_equal(ct_f, ct_r)
    assert (np.abs(sum_f - sum_r) <= ct_r).all(), (sum_f, sum_r, ct_r)


def test_pallas_ordermap_hybrid_matches_einsum(monkeypatch):
    """Ordermap configs: the fused kernel's type reduction + the XLA
    map-only companion must together reproduce the pure-XLA path's
    order sums AND map tile state bit for bit (the tile scatter is the
    same quantized segment_sum in both)."""
    import jax.tree_util as jtu

    from gorder_tpu.core.ordermap import MapSpec, init_map_state

    coords, box, atom_a, atom_b, btype, bmol, mask, T = _random_problem(3)
    normal = np.array([0, 0, 1], np.float32)
    spec = MapSpec(ax0=0, ax1=1, start0=0.0, start1=0.0,
                   bin0=1.0, bin1=1.0, n0=11, n1=11, end0=10.0, end1=10.0)

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_order_step(atom_a, atom_b, btype, bmol, T, 1, map_spec=spec)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_order_step(atom_a, atom_b, btype, bmol, T, 1, map_spec=spec)

    st_f = init_map_state(("total",), T, spec)
    st_r = init_map_state(("total",), T, spec)
    out_f, st_f = fast(coords, box, normal, mask, map_state=st_f)
    out_r, st_r = ref(coords, box, normal, mask, map_state=st_r)
    sum_f, ct_f = _decode(np.asarray(out_f["total"]))
    sum_r, ct_r = _decode(np.asarray(out_r["total"]))
    np.testing.assert_array_equal(ct_f, ct_r)
    assert (np.abs(sum_f - sum_r) <= ct_r).all()
    for a, b in zip(jtu.tree_leaves(st_f), jtu.tree_leaves(st_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_diff_input_matches_einsum(monkeypatch):
    """b7 wire path: the kernel consumes the (B, N, 3) bond-vector array
    directly (no position gather). Quantized integer diffs like the b7
    reconstruction produces, routed via step.impl(use_pallas=True), must
    match the einsum diff path within one quantum per sample."""
    coords, box, atom_a, atom_b, btype, bmol, mask, T = _random_problem(5)
    normal = np.array([0, 0, 1], np.float32)
    prec = 100.0
    q = np.round(coords * prec)
    d = (q[:, atom_b, :] - q[:, atom_a, :]).astype(np.float32)
    inv = np.full(len(coords), 1.0 / prec, np.float32)

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_order_step(atom_a, atom_b, btype, bmol, T, 1)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_order_step(atom_a, atom_b, btype, bmol, T, 1)

    out_f, _ = fast.impl(d, box, normal, mask, inv_scale=inv,
                         diff_input=True, use_pallas=True)
    out_r, _ = ref.impl(d, box, normal, mask, inv_scale=inv,
                        diff_input=True)
    sum_f, ct_f = _decode(np.asarray(out_f["total"]))
    sum_r, ct_r = _decode(np.asarray(out_r["total"]))
    np.testing.assert_array_equal(ct_f, ct_r)
    assert (np.abs(sum_f - sum_r) <= ct_r).all(), (sum_f, sum_r, ct_r)


def test_pallas_resid_input_matches_diff_path(monkeypatch):
    """b7 resid path: the kernel consumes the wire's (int16 residuals,
    int32 per-slot base) pair and reconstructs d = f32(base + r)·scale in
    VMEM (ops/pallas_p2.py resid_input). Must match the XLA fallback
    (which reconstructs the diffs bit-identically to _b7_impl and takes
    the diff path) within one quantum per sample, with equal counts."""
    coords, box, atom_a, atom_b, btype, bmol, mask, T = _random_problem(7)
    normal = np.array([0, 0, 1], np.float32)
    prec = 100.0
    q = np.round(coords * prec)
    d = (q[:, atom_b, :] - q[:, atom_a, :]).astype(np.int32)
    B, N = d.shape[:2]
    flat = d.reshape(B, 3 * N)
    base = flat[0].astype(np.int32)            # any exact-int base works
    r = (flat - base[None, :]).astype(np.int16)
    np.testing.assert_array_equal(r.astype(np.int32) + base[None, :], flat)
    inv = np.full(B, 1.0 / prec, np.float32)

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_order_step(atom_a, atom_b, btype, bmol, T, 1)
    assert fast.pallas_resid_ok()
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_order_step(atom_a, atom_b, btype, bmol, T, 1)
    assert not ref.pallas_resid_ok()

    out_f, _ = fast.impl((r, base), box, normal, mask, inv_scale=inv,
                         resid_input=True, use_pallas=True)
    out_r, _ = ref.impl((r, base), box, normal, mask, inv_scale=inv,
                        resid_input=True)
    sum_f, ct_f = _decode(np.asarray(out_f["total"]))
    sum_r, ct_r = _decode(np.asarray(out_r["total"]))
    np.testing.assert_array_equal(ct_f, ct_r)
    assert (np.abs(sum_f - sum_r) <= ct_r).all(), (sum_f, sum_r, ct_r)


def test_disable_pallas_reroutes_to_xla(monkeypatch):
    """step.disable_pallas() — the production fallback for backends whose
    Mosaic compiler rejects the fused kernel — must reroute through the
    XLA path with identical output."""
    coords, box, atom_a, atom_b, btype, bmol, mask, T = _random_problem(7)
    normal = np.array([0, 0, 1], np.float32)

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    step = make_order_step(atom_a, atom_b, btype, bmol, T, 1)
    assert step.pallas_active()
    out_p, _ = step(coords, box, normal, mask)
    step.disable_pallas()
    assert not step.pallas_active()
    out_x, _ = step(coords, box, normal, mask)
    sum_p, ct_p = _decode(np.asarray(out_p["total"]))
    sum_x, ct_x = _decode(np.asarray(out_x["total"]))
    np.testing.assert_array_equal(ct_p, ct_x)
    assert (np.abs(sum_p - sum_x) <= ct_x).all()


def test_pipeline_survives_pallas_compile_failure(monkeypatch, fixtures,
                                                  tmp_path):
    """A Mosaic compile failure at the first fused dispatch must fall back
    to the XLA path mid-run and still produce the golden output
    (analysis.py _pallas_fallback)."""
    import gorder_tpu.ops.pallas_p2 as pallas_p2
    from gorder_tpu.input import Analysis, AnalysisType
    from gorder_tpu.present import write_yaml

    from .golden import assert_eq_order

    calls = {"n": 0}

    def exploding(*args, **kwargs):
        calls["n"] += 1
        raise RuntimeError("INTERNAL: Mosaic failed to compile TPU kernel: "
                           "Bad lhs type (simulated)")

    monkeypatch.setattr(pallas_p2, "_pallas_order_step_impl", exploding)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    monkeypatch.setenv("GORDER_TPU_MESH", "0")
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    assert calls["n"] >= 1, "the Pallas path was never attempted"
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_basic.yaml"))


def test_pallas_under_frames_mesh_exact(monkeypatch):
    """The fused kernel runs under shard_map over the frames mesh
    (ops/pallas_p2.py): with a per-device batch that tiles the frame
    dimension, the mesh run is BITWISE identical to the single-device
    run — plain and leaflet-wise. (Round-3 gap: the fast path was
    silently disabled whenever a mesh was active, so Pallas x sharding
    was exercised nowhere.)"""
    import jax

    from gorder_tpu.core.order import recombine_limbs
    from gorder_tpu.parallel import context
    from gorder_tpu.parallel.context import put_const, put_frames

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    B, A = 8 * n_dev, 64
    rng = np.random.default_rng(3)
    atom_a = np.arange(0, 60, 2, np.int32)
    atom_b = atom_a + 1
    btype = (np.arange(30) % 5).astype(np.int32)
    bmol = (np.arange(30) // 3).astype(np.int32)
    coords = rng.uniform(0, 5, (B, A, 3)).astype(np.float32)
    box = np.full((B, 3), 5.0, np.float32)
    mask = np.ones(B, bool)
    classes = (rng.random((B, 10)) > 0.5).astype(np.int32)
    normal = np.array([0, 0, 1], np.float32)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")

    for with_leaflets in (False, True):
        single = make_order_step(atom_a, atom_b, btype, bmol, 5, 10,
                                 with_leaflets=with_leaflets)
        cl = jax.device_put(classes) if with_leaflets else None
        o1, _ = single(jax.device_put(coords), jax.device_put(box),
                       jax.device_put(normal), jax.device_put(mask),
                       leaflet_classes=cl)
        mesh = context.activate(B)
        try:
            assert mesh is not None and mesh.devices.size == n_dev
            meshed = make_order_step(atom_a, atom_b, btype, bmol, 5, 10,
                                     with_leaflets=with_leaflets)
            cl2 = put_frames(classes) if with_leaflets else None
            o2, _ = meshed(put_frames(coords), put_frames(box),
                           put_const(normal), put_frames(mask),
                           leaflet_classes=cl2)
        finally:
            context.deactivate()
        for c in o1:
            a = recombine_limbs(np.asarray(o1[c]))
            b = recombine_limbs(np.asarray(o2[c]))
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_array_equal(a[1], b[1])


def test_pallas_mesh_requires_per_device_tiling():
    """A batch whose per-device slice does not tile the kernel's frame
    dimension must refuse the fast path (fall back to XLA) instead of
    building an empty grid."""
    import jax

    from gorder_tpu.parallel import context

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    atom_a = np.arange(0, 10, 2, np.int32)
    atom_b = atom_a + 1
    btype = np.zeros(5, np.int32)
    bmol = np.zeros(5, np.int32)
    mesh = context.activate(4 * n_dev)
    try:
        step = make_order_step(atom_a, atom_b, btype, bmol, 1, 1)
        # per-device slice = 4 rows < the 8-row tile
        assert not step.pallas_ok(4 * n_dev, has_classes=False,
                                  has_geom=False)
        assert step.pallas_ok(8 * n_dev, has_classes=False, has_geom=False) \
            == step.pallas_active()
    finally:
        context.deactivate()


def test_pallas_geometry_mask(monkeypatch):
    """Geometry runs ride the fused kernel via a precomputed midpoint
    mask plane (with_geom): counts identical to the XLA geometry path,
    sums within one quantum per sample."""
    from gorder_tpu.core.geometry import build_geometry_spec
    from gorder_tpu.input.config import Geometry

    coords, box, atom_a, atom_b, btype, bmol, mask, T = _random_problem(7)
    normal = np.array([0, 0, 1], np.float32)
    spec = build_geometry_spec(Geometry("cylinder", reference=(5, 5, 5),
                                        radius=3.0, orientation="z"))
    geom_ref = np.tile(np.array([5, 5, 5], np.float32), (len(coords), 1))

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_order_step(atom_a, atom_b, btype, bmol, T, 1,
                           geom_spec=spec)
    assert fast.pallas_active()
    assert fast.pallas_ok(len(coords), has_classes=False, has_geom=True)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_order_step(atom_a, atom_b, btype, bmol, T, 1,
                          geom_spec=spec)

    import jax.numpy as jnp

    out_f, _ = fast.impl(jnp.asarray(coords), jnp.asarray(box),
                         jnp.asarray(normal), jnp.asarray(mask),
                         geom_ref=jnp.asarray(geom_ref), use_pallas=True)
    out_r, _ = ref.impl(jnp.asarray(coords), jnp.asarray(box),
                        jnp.asarray(normal), jnp.asarray(mask),
                        geom_ref=jnp.asarray(geom_ref), use_pallas=False)
    sum_f, ct_f = _decode(np.asarray(out_f["total"]))
    sum_r, ct_r = _decode(np.asarray(out_r["total"]))
    np.testing.assert_array_equal(ct_f, ct_r)
    assert ct_f.sum() > 0       # the cylinder keeps a real subset
    # and excludes a real subset (the mask is not a no-op)
    no_geom = make_order_step(atom_a, atom_b, btype, bmol, T, 1)
    out_n, _ = no_geom(coords, box, normal, mask)
    _, ct_n = _decode(np.asarray(out_n["total"]))
    assert ct_f.sum() < ct_n.sum()
    assert (np.abs(sum_f - sum_r) <= np.maximum(ct_r, 1)).all()


def test_pallas_geometry_quantized_and_leaflets(monkeypatch):
    """Quantized input + leaflet classes + geometry mask through the
    kernel, against the XLA path."""
    from gorder_tpu.core.geometry import build_geometry_spec
    from gorder_tpu.input.config import Geometry

    coords, box, atom_a, atom_b, btype, bmol, mask, T = _random_problem(8)
    normal = np.array([0, 0, 1], np.float32)
    spec = build_geometry_spec(Geometry("sphere", reference=(5, 5, 5),
                                        radius=4.0))
    geom_ref = np.tile(np.array([5, 5, 5], np.float32), (len(coords), 1))
    prec = 500.0
    q = np.round(coords * prec).astype(np.int16)
    inv = np.full(len(coords), 1.0 / prec, np.float32)
    classes = (np.random.default_rng(9).random((len(coords), 1))
               > 0.5).astype(np.int32)

    import jax.numpy as jnp

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_order_step(atom_a, atom_b, btype, bmol, T, 1,
                           with_leaflets=True, geom_spec=spec)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_order_step(atom_a, atom_b, btype, bmol, T, 1,
                          with_leaflets=True, geom_spec=spec)
    out_f, _ = fast.impl(jnp.asarray(q), jnp.asarray(box),
                         jnp.asarray(normal), jnp.asarray(mask),
                         leaflet_classes=jnp.asarray(classes),
                         inv_scale=jnp.asarray(inv),
                         geom_ref=jnp.asarray(geom_ref), use_pallas=True)
    out_r, _ = ref.impl(jnp.asarray(q), jnp.asarray(box),
                        jnp.asarray(normal), jnp.asarray(mask),
                        leaflet_classes=jnp.asarray(classes),
                        inv_scale=jnp.asarray(inv),
                        geom_ref=jnp.asarray(geom_ref), use_pallas=False)
    for cls in ("total", "upper", "lower"):
        sum_f, ct_f = _decode(np.asarray(out_f[cls]))
        sum_r, ct_r = _decode(np.asarray(out_r[cls]))
        np.testing.assert_array_equal(ct_f, ct_r)
        assert (np.abs(sum_f - sum_r) <= np.maximum(ct_r, 1)).all()


def test_pallas_end_to_end_geometry_golden(monkeypatch, fixtures, tmp_path):
    """Full AA analysis with a geometry restriction through the Pallas
    path (with_geom midpoint-mask plane) reproduces the reference golden
    (tests_cg.rs test_cg_order_geometry_cylinder)."""
    from gorder_tpu.input import Analysis, AnalysisType, Geometry
    from gorder_tpu.present import write_yaml

    from .golden import assert_eq_order

    def run(pallas):
        monkeypatch.setenv("GORDER_TPU_PALLAS", "1" if pallas else "0")
        analysis = Analysis(
            structure=str(fixtures / "cg.tpr"),
            trajectory=str(fixtures / "split" / "cg*.xtc"),
            analysis_type=AnalysisType.cgorder("@membrane"),
            geometry=Geometry("cylinder", reference=(2.0, 1.0, 0.0),
                              radius=3.25, orientation="z"),
            silent=True, overwrite=True,
        )
        results = analysis.run()
        out = tmp_path / f"order_{pallas}.yaml"
        write_yaml(results, str(out))
        return out

    out_p = run(True)
    assert_eq_order(str(out_p), str(fixtures / "cg_order_cylinder.yaml"))
    out_x = run(False)
    # kernel vs XLA: at most one 4-dp print quantum on any aggregate
    import re

    num = re.compile(r"-?\d+\.\d+")
    a = [float(x) for ln in out_p.read_text().splitlines()
         if not ln.startswith("#") for x in num.findall(ln)]
    b = [float(x) for ln in out_x.read_text().splitlines()
         if not ln.startswith("#") for x in num.findall(ln)]
    assert len(a) == len(b) > 10
    assert max(abs(x - y) for x, y in zip(a, b)) <= 1.001e-4
