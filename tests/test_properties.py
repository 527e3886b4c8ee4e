"""Property-based tests (hypothesis): XTC codec roundtrips and the
kernel's batch-size invariance hold for arbitrary inputs, not just the
fixture corpus."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gorder_tpu.core.order import make_order_step
from gorder_tpu.io import native


@settings(max_examples=25, deadline=None)
@given(
    n_atoms=st.integers(min_value=1, max_value=400),
    n_frames=st.integers(min_value=1, max_value=4),
    precision=st.sampled_from([10.0, 100.0, 1000.0]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_xtc_roundtrip_property(tmp_path_factory, n_atoms, n_frames,
                                precision, seed):
    """encode → decode reproduces every coordinate on the precision grid."""
    rng = np.random.default_rng(seed)
    coords = rng.uniform(0.0, 12.0, (n_frames, n_atoms, 3)).astype(np.float32)
    boxes = np.tile(np.eye(3, dtype=np.float32) * 13.0, (n_frames, 1, 1))
    times = np.arange(n_frames, dtype=np.float32) * 10.0
    steps = np.arange(n_frames, dtype=np.int32) * 100
    path = str(tmp_path_factory.mktemp("xtc") / "t.xtc")
    native.xtc_write(path, coords, boxes, times, steps, precision=precision)

    info = native.xtc_scan(path)
    offs = np.asarray(info["offsets"])
    assert len(offs) == n_frames
    dec, dboxes, dtimes, dsteps = native.xtc_decode(path, offs, n_atoms)
    if n_atoms <= 9:
        # plain (uncompressed) frames keep full f32 fidelity
        np.testing.assert_allclose(dec, coords, atol=1e-6)
    else:
        # XTC/GROMACS rounds half away from zero (xdr.cpp:737), unlike
        # numpy's banker's rounding — a hypothesis-found .5 boundary case
        scaled = coords * np.float32(precision)
        grid = np.trunc(scaled + np.copysign(np.float32(0.5), scaled))
        grid = grid / precision
        np.testing.assert_allclose(dec, grid, atol=0.51 / precision)
    np.testing.assert_array_equal(dsteps, steps)


@settings(max_examples=15, deadline=None)
@given(
    n_bonds=st.integers(min_value=1, max_value=300),
    n_types=st.integers(min_value=1, max_value=12),
    split=st.integers(min_value=8, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_batch_split_invariance_property(n_bonds, n_types, split, seed):
    """sum(kernel(batch)) is identical however the frames are split —
    the integer fixed-point reduction guarantees it exactly."""
    rng = np.random.default_rng(seed)
    split = (split // 8) * 8  # kernel batches are padded to 8 anyway
    B, A = 32, 64
    coords = rng.uniform(0, 10, (B, A, 3)).astype(np.float32)
    box = np.full((B, 3), 10.0, np.float32)
    atom_a = rng.integers(0, A, n_bonds).astype(np.int32)
    atom_b = rng.integers(0, A, n_bonds).astype(np.int32)
    btype = rng.integers(0, n_types, n_bonds).astype(np.int32)
    bmol = np.zeros(n_bonds, np.int32)
    normal = np.array([0, 0, 1], np.float32)
    step = make_order_step(atom_a, atom_b, btype, bmol, n_types, 1)

    def run(c, bx):
        mask = np.ones(len(c), bool)
        out, _ = step(c, bx, normal, mask)
        arr = np.asarray(out["total"])
        from gorder_tpu.core.order import recombine_limbs

        sums, counts = recombine_limbs(arr)
        return sums.sum(0), counts.sum(0)

    s_full, c_full = run(coords, box)
    k = max(8, min(split, B - 8))
    s1, c1 = run(coords[:k], box[:k])
    s2, c2 = run(coords[k:], box[k:])
    np.testing.assert_array_equal(s_full, s1 + s2)
    np.testing.assert_array_equal(c_full, c1 + c2)
