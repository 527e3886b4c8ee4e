"""Trajectory codec + concatenation tests against the reference fixtures."""

import numpy as np
import pytest

from gorder_tpu.errors import TrajectoryError
from gorder_tpu.io import native
from gorder_tpu.io.traj import AtomSubset, Trajectory, check_box


def test_xtc_scan_decode(fixtures):
    path = str(fixtures / "split" / "cg1.xtc")
    info = native.xtc_scan(path)
    assert len(info["offsets"]) == 21
    assert info["natoms"][0] == 16769
    coords, boxes, times, steps = native.xtc_decode(
        path, info["offsets"], int(info["natoms"][0])
    )
    assert coords.shape == (21, 16769, 3)
    # coordinates wrapped inside the box
    assert coords[0].min() >= -0.01
    assert np.all(coords[0].max(axis=0) <= np.diag(boxes[0]) + 0.01)
    assert np.isfinite(coords).all()


def test_xtc_subset_decode_matches_prefix(fixtures):
    path = str(fixtures / "split" / "cg1.xtc")
    info = native.xtc_scan(path)
    full, *_ = native.xtc_decode(path, info["offsets"], 16769)
    part, *_ = native.xtc_decode(path, info["offsets"], 3042)
    np.testing.assert_array_equal(full[:, :3042], part)


def test_xtc_roundtrip(tmp_path):
    rng = np.random.default_rng(42)
    # realistic structure: clustered molecules so small-delta runs trigger
    centers = rng.random((400, 3), np.float32) * 10
    offsets = rng.normal(0, 0.05, (400, 12, 3)).astype(np.float32)
    coords = (centers[:, None, :] + offsets).reshape(1, -1, 3)
    coords = np.repeat(coords, 5, axis=0)
    coords += rng.normal(0, 0.02, coords.shape).astype(np.float32)
    coords = np.clip(coords, 0, 10.0)
    n = coords.shape[1]
    boxes = np.tile(np.diag([10.0, 10.0, 10.0]).astype(np.float32), (5, 1, 1))
    times = (np.arange(5) * 100.0).astype(np.float32)
    steps = (np.arange(5) * 1000).astype(np.int32)
    path = str(tmp_path / "rt.xtc")
    native.xtc_write(path, coords, boxes, times, steps, precision=1000.0)

    info = native.xtc_scan(path)
    assert len(info["offsets"]) == 5
    dec, db, dt, ds = native.xtc_decode(path, info["offsets"], n)
    assert np.abs(dec - coords).max() <= 0.00051 + 1e-5
    np.testing.assert_array_equal(dt, times)
    np.testing.assert_array_equal(ds, steps)
    np.testing.assert_allclose(db, boxes, atol=1e-6)


def test_trr_decode(fixtures):
    path = str(fixtures / "split" / "cg3.trr")
    info = native.trr_scan(path)
    assert len(info["offsets"]) == 1
    coords, boxes, times, steps = native.trr_decode(
        path, info["offsets"], int(info["natoms"][0])
    )
    assert np.isfinite(coords).all()
    assert boxes[0, 0, 0] > 10.0
    # TRR is uncompressed: coordinates at f32 precision inside the box
    assert coords[0].min() >= -0.01


def test_concatenation_dedup(fixtures):
    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"), expected_atoms=16769)
    # cg.xtc has 101 frames at 100-ps spacing (t = 350000..360000);
    # the split files overlap at boundaries and dedup must restore 101
    assert traj.n_frames == 101
    times = traj.times
    assert times[0] == 350000.0
    assert times[-1] == 360000.0
    assert np.all(np.diff(times) == 100.0)


def test_concatenation_aa(fixtures):
    traj = Trajectory(
        [str(fixtures / "split" / f"pcpepg{i}.xtc") for i in range(1, 6)],
        expected_atoms=68375,
    )
    assert np.all(np.diff(traj.times) > 0)
    assert traj.n_frames == 51  # pcpepg.xtc frame count


def test_frame_selection_begin_end_step(fixtures):
    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"))
    sel = traj.select_frames(None, None, 1)
    assert len(sel) == 101
    sel = traj.select_frames(355000.0, 358000.0, 1)
    assert traj.times[sel][0] == 355000.0
    assert traj.times[sel][-1] == 358000.0
    sel5 = traj.select_frames(None, None, 5)
    assert len(sel5) == 21
    np.testing.assert_array_equal(traj.times[sel5][:3], [350000.0, 350500.0, 351000.0])


def test_batched_reads_match_full(fixtures):
    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"))
    sel = traj.select_frames(None, None, 3)
    full, fb, ft, fs = traj.read_frames(sel, 500)
    got = []
    for coords, boxes, times, steps, analyzed in traj.iter_batches(sel, 500, 7):
        # buffer is reused and padded to the batch size: slice + copy
        got.append(coords[:len(analyzed)].copy())
    np.testing.assert_array_equal(np.concatenate(got), full)


def test_mismatched_atom_count(fixtures):
    with pytest.raises(TrajectoryError):
        Trajectory(str(fixtures / "split" / "cg1.xtc"), expected_atoms=123)


def test_check_box():
    check_box(np.diag([10.0, 10.0, 10.0]))
    with pytest.raises(Exception):
        check_box(np.zeros((3, 3)))
    bad = np.diag([10.0, 10.0, 10.0])
    bad[1, 0] = 1.0
    with pytest.raises(Exception):
        check_box(bad)


def test_packed12_bit_identical_to_i16(fixtures):
    """The 12-bit packed wire format reconstructs the exact XTC integers."""
    import numpy as np

    from gorder_tpu.io import native
    from gorder_tpu.io.traj import Trajectory

    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"))
    idx = traj.select_frames(None, None, 7)[:12]
    fn = 1000
    c16, inv16, b16, _, _ = traj.read_frames_quantized(idx, fn)
    p12, inv12, b12, _, _ = traj.read_frames_packed12(idx, fn)
    np.testing.assert_array_equal(inv16, inv12)
    np.testing.assert_array_equal(b16, b12)

    from gorder_tpu.analysis import _unpack12

    unpacked = np.asarray(_unpack12(p12, fn))
    np.testing.assert_array_equal(unpacked, c16)
    assert p12.nbytes * 4 == c16.nbytes * 3  # 25% fewer bytes


def test_packed12_out_of_range_falls_back():
    """Values beyond ±2047 make the packed decode return None."""
    import tempfile

    import numpy as np

    from gorder_tpu.io import native

    coords = np.zeros((1, 4, 3), np.float32)
    coords[0, 2, 1] = 30.0   # 30 nm * 100 = 3000 > 2047
    boxes = np.tile(np.eye(3, dtype=np.float32) * 40.0, (1, 1, 1))
    path = tempfile.mktemp(suffix=".xtc")
    native.xtc_write(path, coords, boxes, np.zeros(1, np.float32),
                     np.zeros(1, np.int32), precision=100.0)
    info = native.xtc_scan(path)
    offs = np.asarray(info["offsets"])
    assert native.xtc_decode_i12(path, offs, 4) is None
    assert native.xtc_decode_i16(path, offs, 4) is not None


def test_delta8_bit_identical_to_f32(fixtures):
    """The temporal-delta wire format reconstructs the exact f32 coords
    after the on-device scatter + cumsum (native/xdr.cpp xtc_decode_d8)."""
    from gorder_tpu.analysis import _d8_to_f32
    from gorder_tpu.io.traj import AtomSubset

    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"))
    idx = traj.select_frames(None, None, 2)
    sub = AtomSubset.prefix(1200)
    f32, fb, ft, fs = traj.read_frames(idx, sub)

    K = 256
    lo = np.zeros((len(idx), sub.n_out, 3), np.int8)
    ci = np.zeros((len(idx), K), np.int32)
    ch = np.zeros((len(idx), K), np.int16)
    res, worst = traj.read_frames_delta8(idx, sub, lo, ci, ch)
    assert res is not None, f"d8 unfit (demand {worst})"
    abs0, ip, bx, tm, st = res
    np.testing.assert_array_equal(bx, fb)
    rec = np.asarray(_d8_to_f32(lo, ci, ch, abs0, ip))
    np.testing.assert_array_equal(rec, f32)


def test_delta8_multi_file_chain(fixtures):
    """The delta chain continues across concatenated file boundaries."""
    from gorder_tpu.analysis import _d8_to_f32
    from gorder_tpu.io.traj import AtomSubset

    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"))
    # a window straddling several of the 5 split files
    idx = traj.select_frames(None, None, 1)[15:65]
    sub = AtomSubset.prefix(800)
    f32, *_ = traj.read_frames(idx, sub)
    K = 256
    lo = np.zeros((len(idx), sub.n_out, 3), np.int8)
    ci = np.zeros((len(idx), K), np.int32)
    ch = np.zeros((len(idx), K), np.int16)
    res, _ = traj.read_frames_delta8(idx, sub, lo, ci, ch)
    assert res is not None
    abs0, ip, bx, tm, st = res
    rec = np.asarray(_d8_to_f32(lo, ci, ch, abs0, ip))
    np.testing.assert_array_equal(rec, f32)


def test_delta8_correction_overflow_reports_demand(tmp_path):
    """Too-small correction capacity → payload None + true demand, so the
    runner can re-size and retry."""
    rng = np.random.default_rng(3)
    n = 64
    coords = np.zeros((4, n, 3), np.float32)
    coords[0] = rng.random((n, 3)).astype(np.float32) * 5
    for f in range(1, 4):
        coords[f] = coords[f - 1] + rng.normal(
            0, 0.01, (n, 3)).astype(np.float32)
    coords[2, :10] += 3.0  # 10 atoms jump 3 nm -> 30 corrections in frame 2
    boxes = np.tile(np.diag([6.0, 6.0, 6.0]).astype(np.float32), (4, 1, 1))
    path = str(tmp_path / "jump.xtc")
    native.xtc_write(path, coords, boxes, np.arange(4, dtype=np.float32),
                     np.arange(4, dtype=np.int32), precision=1000.0)
    traj = Trajectory(path)
    idx = np.arange(4)
    lo = np.zeros((4, 64, 3), np.int8)
    ci = np.zeros((4, 8), np.int32)
    ch = np.zeros((4, 8), np.int16)
    res, demand = traj.read_frames_delta8(idx, 64, lo, ci, ch)
    assert res is None
    assert demand >= 30
    ci = np.zeros((4, demand), np.int32)
    ch = np.zeros((4, demand), np.int16)
    res, _ = traj.read_frames_delta8(idx, 64, lo, ci, ch)
    assert res is not None


def test_subset_gather_all_formats(fixtures):
    """Sparse atom selections decode identically through every wire format."""
    from gorder_tpu.analysis import _d8_to_f32, _unpack12
    from gorder_tpu.io.traj import AtomSubset

    traj = Trajectory(str(fixtures / "split" / "cg1.xtc"))
    idx = np.arange(traj.n_frames)
    sel = np.unique(np.concatenate([
        np.arange(7, 900, 13), np.arange(1000, 1600, 3), [0, 16768]]))
    sub = AtomSubset.from_indices(sel)
    assert sub.slot_of is not None  # genuinely sparse
    full, *_ = traj.read_frames(idx, 16769)
    expected = full[:, sel]

    got_f32, *_ = traj.read_frames(idx, sub)
    np.testing.assert_array_equal(got_f32[:, :len(sel)], expected)

    c16, ip16, *_ = traj.read_frames_quantized(idx, sub)
    np.testing.assert_array_equal(
        c16[:, :len(sel)].astype(np.float32) * ip16[:, None, None], expected)

    p12, ip12, *_ = traj.read_frames_packed12(idx, sub)
    unpacked = np.asarray(_unpack12(p12, sub.n_out))[:, :len(sel)]
    np.testing.assert_array_equal(
        unpacked.astype(np.float32) * ip12[:, None, None], expected)

    K = 256
    lo = np.zeros((len(idx), sub.n_out, 3), np.int8)
    ci = np.zeros((len(idx), K), np.int32)
    ch = np.zeros((len(idx), K), np.int16)
    res, _ = traj.read_frames_delta8(idx, sub, lo, ci, ch)
    assert res is not None
    abs0, ip8, *_ = res
    rec = np.asarray(_d8_to_f32(lo, ci, ch, abs0, ip8))[:, :len(sel)]
    np.testing.assert_array_equal(rec, expected)


def test_pipeline_wire_equivalence(fixtures, tmp_path, monkeypatch):
    """The exactness contract behind every transfer optimization
    (round 4): every INTEGER wire (b7/s6/d8/i12/i16) yields
    BIT-IDENTICAL results — the kernel computes bond vectors as the
    single rounding of the exact integer difference on all of them
    (core/order.py quantized path; docs/PERFORMANCE.md). The f32 wire
    (no integers: TRR/GRO, or a debug force) keeps the position-pair
    difference, within float ulps of the integer formulation."""
    from gorder_tpu.input import Analysis, AnalysisType

    def run(wire):
        if wire:
            monkeypatch.setenv("GORDER_TPU_WIRE", wire)
        else:
            monkeypatch.delenv("GORDER_TPU_WIRE", raising=False)
        analysis = Analysis(
            structure=str(fixtures / "cg.tpr"),
            trajectory=str(fixtures / "split" / "cg1.xtc"),
            analysis_type=AnalysisType.cgorder("@membrane"),
            silent=True,
        )
        results = analysis.run()
        return [
            (bond.order.total.value, bond.order.total.error)
            for mol in results.molecules for bond in mol.bonds
        ]

    b7 = run("b7")
    for wire in ("i16", "s6"):
        assert run(wire) == b7, wire

    auto = run(None)   # the probe picks b7 for this pure bond-order run
    assert auto == b7
    f32 = run("f32")
    for (av, ae), (fv, fe) in zip(b7, f32):
        assert abs(av - fv) < 1e-7
        assert (ae is None) == (fe is None)
        if ae is not None:
            assert abs(ae - fe) < 1e-7


def test_decoder_thread_fanout_invariance(fixtures):
    """Every wire format decodes identically across decoder thread counts
    (the reference's thread-invariance model applied to the native codec's
    frame fan-out — including the d8 chunk-boundary base chaining)."""
    from gorder_tpu.io.traj import AtomSubset

    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"))
    idx = traj.select_frames(None, None, 1)[:40]
    sub = AtomSubset.prefix(2000)

    base_f32, *_ = traj.read_frames(idx, sub, n_threads=1)
    for nt in (2, 3, 8):
        c, *_ = traj.read_frames(idx, sub, n_threads=nt)
        np.testing.assert_array_equal(c, base_f32)

    base16 = traj.read_frames_quantized(idx, sub, n_threads=1)
    for nt in (2, 5):
        got = traj.read_frames_quantized(idx, sub, n_threads=nt)
        np.testing.assert_array_equal(got[0], base16[0])

    K = 256
    def d8(nt):
        lo = np.zeros((len(idx), sub.n_out, 3), np.int8)
        ci = np.zeros((len(idx), K), np.int32)
        ch = np.zeros((len(idx), K), np.int16)
        res, _ = traj.read_frames_delta8(idx, sub, lo, ci, ch, n_threads=nt)
        assert res is not None
        return lo.copy(), ci.copy(), ch.copy(), res[0].copy()

    ref = d8(1)
    for nt in (2, 4, 7):
        got = d8(nt)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)


def _s6_buffers(n, n_out, n_groups, esc_cap):
    return (np.zeros((n, native.s6_stride(n_out)), np.uint8),
            np.zeros((n, esc_cap), np.uint16),
            np.zeros((n, esc_cap), np.int16),
            np.zeros((n, (n_groups + 1) * 3), np.int16))


def _s6_vgidx(group_of, n_groups):
    n_out = len(group_of)
    g_rep = np.repeat(group_of, 3)
    k_rep = np.tile(np.arange(3), n_out)
    return np.where(g_rep >= 0, g_rep * 3 + k_rep,
                    n_groups * 3 + k_rep).astype(np.int32)


def test_pair_decode_invariance(fixtures, monkeypatch):
    """Interleaved frame decoding (native GORDER_XDR_PAIR: pairs by
    default, groups of four opt-in) is byte-identical to sequential
    decoding for every wire format — including non-multiple frame counts
    (tail frames: 41 = 4·10 + 1) and sparse slot subsets."""
    from gorder_tpu.io.traj import AtomSubset

    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"))
    idx = traj.select_frames(None, None, 1)[:41]  # odd: exercises the tail
    sel = np.unique(np.concatenate([
        np.arange(3, 900, 11), np.arange(1200, 1900, 7)]))
    sub = AtomSubset.from_indices(sel)

    def snap():
        f32, *_ = traj.read_frames(idx, sub)
        i16 = traj.read_frames_quantized(idx, sub)
        return f32.copy(), i16[0].copy()

    monkeypatch.setenv("GORDER_XDR_PAIR", "0")
    f32_s, i16_s = snap()
    for width in ("1", "4"):
        monkeypatch.setenv("GORDER_XDR_PAIR", width)
        f32_p, i16_p = snap()
        np.testing.assert_array_equal(f32_p, f32_s)
        np.testing.assert_array_equal(i16_p, i16_s)


def test_s6_bit_identical_sparse_subset(fixtures):
    """s6 wire (smoothed-base 6-bit residuals): device reconstruction is
    bit-identical to the f32 decode on a sparse subset with padding
    columns (native/xdr.cpp xtc_decode_s6; mirrors the reference's exact
    group XTC reads, src/analysis/common.rs:283-304)."""
    from gorder_tpu.analysis import _s6_to_f32
    from gorder_tpu.io.traj import AtomSubset

    traj = Trajectory(str(fixtures / "split" / "cg1.xtc"))
    idx = np.arange(traj.n_frames)
    sel = np.unique(np.concatenate([
        np.arange(7, 900, 13), np.arange(1000, 1600, 3), [0, 16768]]))
    sub = AtomSubset.from_indices(sel, n_out=len(sel) + 21)
    group_of = np.full(sub.n_out, -1, np.int32)
    group_of[:len(sel)] = np.arange(len(sel), dtype=np.int32) // 9
    n_groups = int(group_of.max()) + 1

    pk, eg, ev, gm = _s6_buffers(len(idx), sub.n_out, n_groups, 32768)
    res, nesc = traj.read_frames_s6(idx, sub, group_of, n_groups,
                                    pk, eg, ev, gm)
    assert res is not None, f"unfit, demand={nesc}"
    base, ip, boxes, times, steps = res

    rec = np.asarray(_s6_to_f32(pk, eg, ev, base, gm,
                                _s6_vgidx(group_of, n_groups), ip))
    full, fboxes, ftimes, fsteps = traj.read_frames(idx, sub)
    np.testing.assert_array_equal(rec[:, :len(sel)], full[:, :len(sel)])
    # padding columns decode to exact zeros (base median of zeros)
    np.testing.assert_array_equal(rec[:, len(sel):], 0.0)
    np.testing.assert_array_equal(boxes, fboxes)
    np.testing.assert_array_equal(steps, fsteps)


def test_s6_multi_file_base_chain(fixtures):
    """s6 across concatenated files: later segments reuse the first
    segment's base and stay bit-identical."""
    from gorder_tpu.analysis import _s6_to_f32
    from gorder_tpu.io.traj import AtomSubset

    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"))
    idx = traj.select_frames(None, None, 1)[:45]
    assert len(np.unique(traj.frame_file[idx])) > 1  # really crosses files
    sub = AtomSubset.prefix(2000)
    group_of = (np.arange(2000) // 12).astype(np.int32)
    n_groups = int(group_of.max()) + 1

    pk, eg, ev, gm = _s6_buffers(len(idx), sub.n_out, n_groups, 32768)
    res, nesc = traj.read_frames_s6(idx, sub, group_of, n_groups,
                                    pk, eg, ev, gm)
    assert res is not None, f"unfit, demand={nesc}"
    base, ip, *_ = res
    rec = np.asarray(_s6_to_f32(pk, eg, ev, base, gm,
                                _s6_vgidx(group_of, n_groups), ip))
    full, *_ = traj.read_frames(idx, sub)
    np.testing.assert_array_equal(rec, full)


def test_s6_thread_fanout_invariance(fixtures):
    """s6 buffers are byte-identical across decoder thread counts."""
    from gorder_tpu.io.traj import AtomSubset

    traj = Trajectory(str(fixtures / "split" / "cg1.xtc"))
    idx = np.arange(traj.n_frames)
    sub = AtomSubset.prefix(2000)
    group_of = (np.arange(2000) // 12).astype(np.int32)
    n_groups = int(group_of.max()) + 1

    def run(nt):
        pk, eg, ev, gm = _s6_buffers(len(idx), sub.n_out, n_groups, 32768)
        res, _ = traj.read_frames_s6(idx, sub, group_of, n_groups,
                                     pk, eg, ev, gm, n_threads=nt)
        assert res is not None
        return pk.copy(), eg.copy(), ev.copy(), gm.copy(), res[0].copy()

    ref = run(1)
    for nt in (2, 4, 7):
        got = run(nt)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)


def test_s6_pipeline_picked_and_equivalent(tmp_path, monkeypatch, caplog):
    """On a closely-spaced trajectory the probe picks s6, and the full
    pipeline result is bit-identical to a forced-f32 run."""
    import logging

    from gorder_tpu.input import Analysis, AnalysisType
    from gorder_tpu.io.gro import write_gro
    from gorder_tpu.system import System, canonical_bonds

    rng = np.random.default_rng(5)
    n_mol, per_mol, n_frames = 40, 30, 50
    n_atoms = n_mol * per_mol
    box = np.array([8.0, 8.0, 6.0], np.float32)
    base = np.empty((n_atoms, 3), np.float32)
    names, resids, resnames, bonds = [], [], [], []
    for m in range(n_mol):
        start = rng.random(3).astype(np.float32) * box
        for a in range(per_mol):
            i = m * per_mol + a
            base[i] = start + rng.normal(0, 0.12, 3).astype(np.float32)
            names.append(f"C{a + 1}" if a % 2 == 0 else f"H{a + 1}")
            resids.append(m + 1)
            resnames.append("MOLX")
            if a:
                bonds.append((i - 1, i))
    system = System(
        name="s6 synthetic", atom_names=np.array(names, dtype="U8"),
        resids=np.array(resids, np.int64),
        resnames=np.array(resnames, dtype="U8"),
        serials=np.arange(1, n_atoms + 1, dtype=np.int64),
        positions=base % box, box=np.diag(box).astype(np.float32))
    system.bonds = canonical_bonds(np.asarray(bonds, np.int64))
    gro = tmp_path / "s6.gro"
    bnd = tmp_path / "s6.bnd"
    write_gro(str(gro), system)
    bnd.write_text("".join(f"{a + 1} {b + 1}\n" for a, b in system.bonds))

    mol_of = np.repeat(np.arange(n_mol), per_mol)
    drift = np.zeros((n_mol, 3), np.float32)
    frames = np.empty((n_frames, n_atoms, 3), np.float32)
    for t in range(n_frames):
        drift += rng.normal(0, 0.012, (n_mol, 3)).astype(np.float32)
        jit = rng.normal(0, 0.01, (n_atoms, 3)).astype(np.float32)
        frames[t] = (base + drift[mol_of] + jit) % box
    xtc = tmp_path / "s6.xtc"
    native.xtc_write(str(xtc), frames,
                     np.tile(np.diag(box), (n_frames, 1, 1)),
                     np.arange(n_frames, dtype=np.float32) * 10,
                     np.arange(n_frames, dtype=np.int32), precision=1000.0)

    def run(wire):
        if wire:
            monkeypatch.setenv("GORDER_TPU_WIRE", wire)
        else:
            monkeypatch.delenv("GORDER_TPU_WIRE", raising=False)
        analysis = Analysis(
            structure=str(gro), bonds=str(bnd), trajectory=str(xtc),
            analysis_type=AnalysisType.aaorder(
                "name r'^C'", "name r'^H'"), silent=True)
        results = analysis.run()
        return [
            (bond.order.total.value, bond.order.total.error)
            for mol in results.molecules
            for bond in mol.bonds + [b for a in mol.atoms for b in a.bonds]
        ]

    with caplog.at_level(logging.INFO, logger="gorder"):
        auto = run(None)
    assert len(auto) > 10   # real values, not an empty comparison
    assert any("wire format: s6" in r.getMessage() for r in caplog.records), \
        "probe did not pick s6 on closely-spaced synthetic data"
    assert auto == run("s6")
    assert auto == run("i16")   # integer wires: bitwise identical
    # the f32 wire keeps the position-pair formulation — within ulps
    for (av, ae), (fv, fe) in zip(auto, run("f32")):
        assert abs(av - fv) < 1e-6
        assert (ae is None) == (fe is None)


def test_wire_fallback_on_midrun_precision_change(tmp_path, monkeypatch,
                                                  caplog):
    """A compression-precision change the probe windows never saw (last
    batch only) must not corrupt or abort the run: the affected batch
    falls back to int16 with a logged warning, every other batch stays on
    the compact wire, and results match the forced-f32 run (VERDICT r2
    'wire-probe blind spot')."""
    import logging

    from gorder_tpu.input import Analysis, AnalysisType
    from gorder_tpu.io.gro import write_gro
    from gorder_tpu.system import System, canonical_bonds

    rng = np.random.default_rng(17)
    n_mol, per_mol = 20, 24
    n_atoms = n_mol * per_mol
    box = np.array([7.0, 7.0, 5.0], np.float32)
    base = np.empty((n_atoms, 3), np.float32)
    names, resids, resnames, bonds = [], [], [], []
    for m in range(n_mol):
        start = rng.random(3).astype(np.float32) * box
        for a in range(per_mol):
            i = m * per_mol + a
            base[i] = start + rng.normal(0, 0.11, 3).astype(np.float32)
            names.append(f"C{a + 1}" if a % 2 == 0 else f"H{a + 1}")
            resids.append(m + 1)
            resnames.append("MOLX")
            if a:
                bonds.append((i - 1, i))
    system = System(
        name="midrun", atom_names=np.array(names, dtype="U8"),
        resids=np.array(resids, np.int64),
        resnames=np.array(resnames, dtype="U8"),
        serials=np.arange(1, n_atoms + 1, dtype=np.int64),
        positions=base % box, box=np.diag(box).astype(np.float32))
    system.bonds = canonical_bonds(np.asarray(bonds, np.int64))
    gro, bnd = tmp_path / "m.gro", tmp_path / "m.bnd"
    write_gro(str(gro), system)
    bnd.write_text("".join(f"{a + 1} {b + 1}\n" for a, b in system.bonds))

    n_frames = 48
    frames = np.empty((n_frames, n_atoms, 3), np.float32)
    pos = base.copy()
    for t in range(n_frames):
        pos = pos + rng.normal(0, 0.008, (n_atoms, 3)).astype(np.float32)
        frames[t] = pos % box
    xtc = str(tmp_path / "m.xtc")
    # probe windows (first 8, middle 8) never see the change; 36 is NOT a
    # batch boundary at batch_size=8 so batch [32, 40) straddles the
    # precision change (a boundary-aligned change decodes fine: the wire
    # scales are per-batch)
    split = 36
    boxes = np.tile(np.diag(box), (n_frames, 1, 1)).astype(np.float32)
    times = np.arange(n_frames, dtype=np.float32) * 10
    steps = np.arange(n_frames, dtype=np.int32)
    native.xtc_write(xtc, frames[:split], boxes[:split], times[:split],
                     steps[:split], precision=1000.0)
    native.xtc_write(xtc, frames[split:], boxes[split:], times[split:],
                     steps[split:], precision=100.0, append=True)

    monkeypatch.setenv("GORDER_TPU_BATCH_SIZE", "8")

    def run(wire):
        if wire:
            monkeypatch.setenv("GORDER_TPU_WIRE", wire)
        else:
            monkeypatch.delenv("GORDER_TPU_WIRE", raising=False)
        analysis = Analysis(
            structure=str(gro), bonds=str(bnd), trajectory=xtc,
            analysis_type=AnalysisType.aaorder(
                "name r'^C'", "name r'^H'"), silent=True)
        results = analysis.run()
        return [
            (bond.order.total.value, bond.order.total.error)
            for mol in results.molecules
            for bond in mol.bonds + [b for a in mol.atoms for b in a.bonds]
        ]

    f32 = run("f32")
    assert len(f32) > 10

    # s6 (integer wire): the straddling batch falls back to int16 —
    # still an integer wire, so the whole run stays on the
    # single-rounding formulation and remains within ulps of f32
    with caplog.at_level(logging.WARNING, logger="gorder"):
        s6 = run("s6")
    assert any("wire fallback" in r.getMessage() for r in caplog.records)
    for (sv, se), (fv, fe) in zip(s6, f32):
        assert abs(sv - fv) < 1e-6
        assert (se is None) == (fe is None)

    # b7 (bond-difference wire): fallback fires too; its int16 fallback
    # batches are bit-identical to the s6 run's (same formulation)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="gorder"):
        b7 = run("b7")
    assert any("wire fallback" in r.getMessage() for r in caplog.records)
    assert b7 == s6


def test_wire_rate_aware_selection(fixtures):
    """With a measured link rate, wire selection maximizes the modeled
    end-to-end rate min(host f/s, link/bytes): a fast link picks the
    host-cheapest format (i16 — no residual coding work), a slow link
    keeps a byte-light format, and no link measurement keeps the pure
    bytes-minimizing policy."""
    from gorder_tpu.analysis import _pick_wire_format

    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"))
    sel = traj.select_frames(None, None, 1)
    space = AtomSubset.prefix(2000)

    fast, _ = _pick_wire_format(traj, sel, space, 1, link_mbps=1e5)
    assert fast == "i16"
    slow, _ = _pick_wire_format(traj, sel, space, 1, link_mbps=0.5)
    assert slow in ("i12", "s6", "d8", "b7")
    auto, _ = _pick_wire_format(traj, sel, space, 1, link_mbps=None)
    assert auto == slow  # bytes policy == slow-link policy here


def test_wire_rate_aware_respects_forced(fixtures, monkeypatch):
    """GORDER_TPU_WIRE forcing bypasses the rate-aware model."""
    from gorder_tpu.analysis import _pick_wire_format

    traj = Trajectory(str(fixtures / "split" / "cg*.xtc"))
    sel = traj.select_frames(None, None, 1)
    space = AtomSubset.prefix(2000)
    monkeypatch.setenv("GORDER_TPU_WIRE", "f32")
    forced, _ = _pick_wire_format(traj, sel, space, 1, link_mbps=1e5)
    assert forced == "f32"
