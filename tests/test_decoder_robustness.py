"""Native-codec robustness: malformed, truncated and bit-flipped
trajectory files must produce clean TrajectoryErrors (or valid decodes of
damaged-but-parsable data) — never crashes, overruns, or silent garbage
acceptance of impossible headers. The decoder mirrors the reference's
defensive checks (xdr.cpp set_error paths: invalid ranges, smallidx,
payload overrun)."""

import numpy as np
import pytest

from gorder_tpu.errors import TrajectoryError
from gorder_tpu.io import native


def _read_fixture(fixtures):
    return (fixtures / "split" / "cg1.xtc").read_bytes()


def test_empty_file(tmp_path):
    p = tmp_path / "empty.xtc"
    p.write_bytes(b"")
    try:
        info = native.xtc_scan(str(p))
    except TrajectoryError:
        return
    # an empty file indexes to zero frames; the analysis layer rejects it
    assert len(info["offsets"]) == 0


def test_garbage_file(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "garbage.xtc"
    p.write_bytes(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes())
    with pytest.raises(TrajectoryError):
        native.xtc_scan(str(p))


def test_bad_magic(fixtures, tmp_path):
    data = bytearray(_read_fixture(fixtures))
    data[0:4] = b"\x00\x00\x00\x00"
    p = tmp_path / "badmagic.xtc"
    p.write_bytes(bytes(data))
    with pytest.raises(TrajectoryError):
        native.xtc_scan(str(p))


@pytest.mark.parametrize("keep", [0.25, 0.5, 0.9, 0.999])
def test_truncated_file(fixtures, tmp_path, keep):
    data = _read_fixture(fixtures)
    p = tmp_path / "trunc.xtc"
    p.write_bytes(data[: int(len(data) * keep)])
    try:
        info = native.xtc_scan(str(p))
    except TrajectoryError:
        return  # clean rejection at indexing time
    # indexable prefix: decoding every indexed frame must either work or
    # fail cleanly
    n = int(info["natoms"][0])
    try:
        coords, boxes, times, steps = native.xtc_decode(
            str(p), info["offsets"], n)
        assert np.isfinite(coords).all()
    except TrajectoryError:
        pass


def test_bitflip_fuzz(fixtures, tmp_path):
    """Flipping bytes all over the payload must never crash the decoder;
    every frame either decodes (to finite values) or raises cleanly."""
    data = _read_fixture(fixtures)
    rng = np.random.default_rng(7)
    for trial in range(20):
        corrupted = bytearray(data)
        for _ in range(rng.integers(1, 8)):
            pos = int(rng.integers(92, len(data)))  # spare the first header
            corrupted[pos] = int(rng.integers(0, 256))
        p = tmp_path / f"flip{trial}.xtc"
        p.write_bytes(bytes(corrupted))
        try:
            info = native.xtc_scan(str(p))
            n = int(info["natoms"][0])
            if n <= 0 or n > 10_000_000:
                continue
            coords, *_ = native.xtc_decode(str(p), info["offsets"], n)
            assert coords.shape[1] == n
        except TrajectoryError:
            continue


def test_truncated_trr(fixtures, tmp_path):
    data = (fixtures / "split" / "cg3.trr").read_bytes()
    p = tmp_path / "trunc.trr"
    p.write_bytes(data[: len(data) // 2])
    try:
        info = native.trr_scan(str(p))
        n = int(info["natoms"][0])
        native.trr_decode(str(p), info["offsets"], n)
    except TrajectoryError:
        pass


def test_natoms_header_lie(fixtures, tmp_path):
    """A header claiming an absurd atom count must not cause huge
    allocations or overruns."""
    data = bytearray(_read_fixture(fixtures))
    # XTC header: magic(4) natoms(4) — claim 2^30 atoms
    data[4:8] = (2 ** 30).to_bytes(4, "big")
    p = tmp_path / "hugeatoms.xtc"
    p.write_bytes(bytes(data))
    with pytest.raises(TrajectoryError):
        info = native.xtc_scan(str(p))
        native.xtc_decode(str(p), info["offsets"], int(info["natoms"][0]))
