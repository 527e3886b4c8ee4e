"""Fused Pallas UA kernel (interpret mode on CPU) vs the XLA planar path.

Same contract as the bond-based kernel (tests/test_pallas.py): sample
counts identical, per-type fixed-point sums within one 1e-6 quantum per
sample (ops/pallas_ua.py docstring), and the end-to-end UA analysis
driven through the kernel must stay golden-exact.
"""

import numpy as np
import pytest

from gorder_tpu.core.ua import make_ua_step


def _decode(out):
    from gorder_tpu.core.order import recombine_limbs

    sums, counts = recombine_limbs(np.asarray(out))
    return sums.sum(0), counts.sum(0)


def _ua_problem(seed=0, B=16, n_mols=12):
    """Synthetic UA categories over a chain of atoms per molecule:
    1 CH3 (2 helpers), 3 CH2, 1 CH1u, 1 CH1s (3 helpers) per molecule."""
    rng = np.random.default_rng(seed)
    per = 10
    A = n_mols * per
    coords = rng.uniform(0, 6, (B, A, 3)).astype(np.float32)
    box = np.full((B, 3), 6.0, np.float32)
    mask = np.ones(B, bool)
    mask[-2:] = False

    def atom(m, k):
        return m * per + k

    cats = {"ch3": {}, "ch2": {}, "ch1u": {}, "ch1s": {}}

    def add(cat, target, helpers, mol):
        d = cats[cat]
        d.setdefault("target", []).append(target)
        for i, h in enumerate(helpers, 1):
            d.setdefault(f"h{i}", []).append(h)
        d.setdefault("mol", []).append(mol)

    for m in range(n_mols):
        add("ch3", atom(m, 0), (atom(m, 1), atom(m, 2)), m)
        for k in (1, 2, 3):
            add("ch2", atom(m, k), (atom(m, k - 1 if k > 1 else 4),
                                    atom(m, k + 1)), m)
        add("ch1u", atom(m, 5), (atom(m, 4), atom(m, 6)), m)
        add("ch1s", atom(m, 7), (atom(m, 6), atom(m, 8), atom(m, 9)), m)

    categories = {c: {k: np.asarray(v, np.int32) for k, v in d.items()}
                  for c, d in cats.items()}
    # per-sample type/mol arrays in concatenated hydrogen-major layout
    n_h = {"ch3": 3, "ch2": 2, "ch1u": 1, "ch1s": 1}
    bond_type, bond_mol = [], []
    t = 0
    for cat in ("ch3", "ch2", "ch1u", "ch1s"):
        n = len(categories[cat]["target"])
        K = n_h[cat]
        for i in range(n):
            for k in range(K):
                bond_type.append((i * K + k) % 7)
                bond_mol.append(int(categories[cat]["mol"][i]))
        t += n * K
    T = 7
    return (coords, box, mask, categories,
            np.asarray(bond_type, np.int32), np.asarray(bond_mol, np.int32),
            T, n_mols)


@pytest.mark.parametrize("handle_pbc", [True, False])
def test_pallas_ua_matches_xla_path(monkeypatch, handle_pbc):
    coords, box, mask, cats, btype, bmol, T, n_mols = _ua_problem()
    normal = np.array([0, 0, 1], np.float32)

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_ua_step(cats, btype, bmol, T, handle_pbc=handle_pbc)
    assert fast.pallas_active()
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_ua_step(cats, btype, bmol, T, handle_pbc=handle_pbc)
    assert not ref.pallas_active()

    out_f, _ = fast(coords, box, normal, mask)
    out_r, _ = ref(coords, box, normal, mask)
    sum_f, ct_f = _decode(np.asarray(out_f["total"]))
    sum_r, ct_r = _decode(np.asarray(out_r["total"]))
    np.testing.assert_array_equal(ct_f, ct_r)
    assert (np.abs(sum_f - sum_r) <= ct_r).all(), (sum_f, sum_r, ct_r)


def test_pallas_ua_leaflets_and_quantized(monkeypatch):
    coords, box, mask, cats, btype, bmol, T, n_mols = _ua_problem(1)
    normal = np.array([0, 0, 1], np.float32)
    prec = 200.0
    qcoords = np.round(coords * prec).astype(np.int16)
    inv = np.full(len(coords), 1.0 / prec, np.float32)
    classes = (np.random.default_rng(2).random((len(coords), n_mols))
               > 0.5).astype(np.int32)

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_ua_step(cats, btype, bmol, T, with_leaflets=True)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_ua_step(cats, btype, bmol, T, with_leaflets=True)

    out_f, _ = fast(qcoords, box, normal, mask, leaflet_classes=classes,
                    inv_scale=inv)
    out_r, _ = ref(qcoords, box, normal, mask, leaflet_classes=classes,
                   inv_scale=inv)
    for cls in ("total", "upper", "lower"):
        sum_f, ct_f = _decode(np.asarray(out_f[cls]))
        sum_r, ct_r = _decode(np.asarray(out_r[cls]))
        np.testing.assert_array_equal(ct_f, ct_r)
        assert (np.abs(sum_f - sum_r) <= np.maximum(ct_r, 1)).all()


def test_pallas_ua_per_molecule_normal(monkeypatch):
    coords, box, mask, cats, btype, bmol, T, n_mols = _ua_problem(3)
    rng = np.random.default_rng(4)
    normals = rng.normal(0, 1, (len(coords), n_mols, 3)).astype(np.float32)

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    fast = make_ua_step(cats, btype, bmol, T, normal_mode="per_molecule")
    monkeypatch.setenv("GORDER_TPU_PALLAS", "0")
    ref = make_ua_step(cats, btype, bmol, T, normal_mode="per_molecule")

    out_f, _ = fast(coords, box, normals, mask)
    out_r, _ = ref(coords, box, normals, mask)
    sum_f, ct_f = _decode(np.asarray(out_f["total"]))
    sum_r, ct_r = _decode(np.asarray(out_r["total"]))
    np.testing.assert_array_equal(ct_f, ct_r)
    assert (np.abs(sum_f - sum_r) <= ct_r).all()


def test_pallas_ua_golden_exact_end_to_end(fixtures, tmp_path, monkeypatch):
    """The UA analysis driven through the fused kernel reproduces the
    reference golden byte-for-byte (ua.tpr/ua.xtc →
    ua_order_basic.yaml), like the XLA path does."""
    from gorder_tpu.input import Analysis, AnalysisType
    from gorder_tpu.present import write_yaml

    from .golden import assert_eq_order

    from .test_order_ua import SATURATED, UNSATURATED

    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")
    results = Analysis(
        structure=str(fixtures / "ua.tpr"),
        trajectory=str(fixtures / "ua.xtc"),
        analysis_type=AnalysisType.uaorder(
            saturated=SATURATED, unsaturated=UNSATURATED),
        silent=True, overwrite=True).run()
    out = tmp_path / "ua.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "ua_order_basic.yaml"),
                    exact=True)

def test_pallas_ua_under_frames_mesh_exact(monkeypatch):
    """The fused UA kernel runs under shard_map over the frames mesh
    (ops/pallas_ua.py shard_map route): with a per-device batch that
    tiles the frame dimension, the mesh run is BITWISE identical to the
    single-device run — plain and leaflet-wise. (Round-4 gap: the UA
    kernel's mesh route was implemented but exercised nowhere, the exact
    'fast path silently unexercised under a mesh' pattern round 3 flagged
    for the bond kernel.)"""
    import jax
    import pytest

    from gorder_tpu.parallel import context
    from gorder_tpu.parallel.context import put_const, put_frames

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    B = 8 * n_dev
    coords, box, mask, cats, btype, bmol, T, n_mols = _ua_problem(5, B=B)
    normal = np.array([0, 0, 1], np.float32)
    classes = (np.random.default_rng(6).random((B, n_mols))
               > 0.5).astype(np.int32)
    monkeypatch.setenv("GORDER_TPU_PALLAS", "1")

    for with_leaflets in (False, True):
        single = make_ua_step(cats, btype, bmol, T,
                              with_leaflets=with_leaflets)
        assert single.pallas_active()
        cl = jax.device_put(classes) if with_leaflets else None
        o1, _ = single(jax.device_put(coords), jax.device_put(box),
                       jax.device_put(normal), jax.device_put(mask),
                       leaflet_classes=cl)
        mesh = context.activate(B)
        try:
            assert mesh is not None and mesh.devices.size == n_dev
            meshed = make_ua_step(cats, btype, bmol, T,
                                  with_leaflets=with_leaflets)
            cl2 = put_frames(classes) if with_leaflets else None
            o2, _ = meshed(put_frames(coords), put_frames(box),
                           put_const(normal), put_frames(mask),
                           leaflet_classes=cl2)
        finally:
            context.deactivate()
        for c in o1:
            np.testing.assert_array_equal(np.asarray(o1[c]),
                                          np.asarray(o2[c]))
