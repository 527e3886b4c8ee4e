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


def test_delta8_roundtrip_random_precisions(tmp_path):
    """Property: for random trajectories at random XTC precisions, the d8
    wire format either reconstructs the f32 decode bit-for-bit or reports
    unfit (never silently wrong)."""
    import numpy as np

    from gorder_tpu.analysis import _d8_to_f32
    from gorder_tpu.io import native
    from gorder_tpu.io.traj import Trajectory

    rng = np.random.default_rng(21)
    for case in range(6):
        precision = float(rng.choice([10.0, 100.0, 1000.0, 10000.0]))
        n_atoms = int(rng.integers(20, 400))
        n_frames = int(rng.integers(3, 30))
        box_l = float(rng.uniform(3.0, 25.0))
        scale = float(rng.uniform(0.002, 0.2))
        coords = np.empty((n_frames, n_atoms, 3), np.float32)
        cur = rng.random((n_atoms, 3)).astype(np.float32) * box_l
        for f in range(n_frames):
            cur = cur + rng.normal(0, scale, (n_atoms, 3)).astype(np.float32)
            if rng.random() < 0.2:
                cur[rng.integers(0, n_atoms)] += rng.uniform(-3, 3, 3)
            coords[f] = cur % box_l
        boxes = np.tile(np.diag([box_l] * 3).astype(np.float32),
                        (n_frames, 1, 1))
        path = str(tmp_path / f"p{case}.xtc")
        native.xtc_write(path, coords, boxes,
                         np.arange(n_frames, dtype=np.float32),
                         np.arange(n_frames, dtype=np.int32),
                         precision=precision)

        traj = Trajectory(path)
        idx = np.arange(n_frames)
        f32, *_ = traj.read_frames(idx, n_atoms)
        K = 64
        lo = np.zeros((n_frames, n_atoms, 3), np.int8)
        ci = np.zeros((n_frames, K), np.int32)
        ch = np.zeros((n_frames, K), np.int16)
        res, demand = traj.read_frames_delta8(idx, n_atoms, lo, ci, ch)
        if res is None:
            assert demand > K or precision >= 10000.0, (
                case, precision, demand)
            continue
        abs0, ip, bx, tm, st = res
        rec = np.asarray(_d8_to_f32(lo, ci, ch, abs0, ip))
        np.testing.assert_array_equal(rec, f32, err_msg=str((case,
                                                            precision)))


def test_delta8_mixed_precision_file_falls_back(tmp_path):
    """Frames with different compression precisions in one file break the
    integer delta chain: d8 must refuse (the runner then uses i16/f32)."""
    import numpy as np

    from gorder_tpu.io import native
    from gorder_tpu.io.traj import Trajectory

    rng = np.random.default_rng(5)
    coords = rng.random((4, 50, 3)).astype(np.float32) * 5
    boxes = np.tile(np.diag([5.0] * 3).astype(np.float32), (4, 1, 1))
    path = str(tmp_path / "mixed.xtc")
    native.xtc_write(path, coords[:2], boxes[:2],
                     np.arange(2, dtype=np.float32),
                     np.arange(2, dtype=np.int32), precision=100.0)
    native.xtc_write(path, coords[2:], boxes[2:],
                     np.arange(2, 4, dtype=np.float32),
                     np.arange(2, 4, dtype=np.int32), precision=1000.0,
                     append=True)

    traj = Trajectory(path)
    idx = np.arange(4)
    lo = np.zeros((4, 50, 3), np.int8)
    ci = np.zeros((4, 64), np.int32)
    ch = np.zeros((4, 64), np.int16)
    res, _ = traj.read_frames_delta8(idx, 50, lo, ci, ch)
    assert res is None
    # the tolerant formats still decode it
    assert traj.read_frames_quantized(idx, 50) is not None
    f32, *_ = traj.read_frames(idx, 50)
    assert np.isfinite(f32).all()
