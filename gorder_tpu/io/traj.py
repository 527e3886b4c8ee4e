"""Unified trajectory reading: XTC/TRR/GRO, multi-file concatenation,
time-window + stride selection, batched subset decode.

Behavioral reference: the reference's `read_trajectory` dispatch
(src/analysis/common.rs:239-342) and its trajectory-concatenation semantics
(CHANGELOG §1.1: duplicate frames at file boundaries are analyzed only once).

The reader is host-side; it produces NumPy frame batches `(B, first_n, 3)`
that the engine ships to the TPU. `first_n` is the number of leading atoms to
decode (the Master group is arranged to be a prefix permutation — atoms past
the highest selected index are never decompressed).
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..errors import AnalysisError, TrajectoryError
from . import native

_XTC_EXT = (".xtc",)
_TRR_EXT = (".trr",)
_GRO_EXT = (".gro",)


def expand_trajectory_paths(spec) -> List[str]:
    """Expand a path / glob / list-of-paths into an ordered file list."""
    if isinstance(spec, (list, tuple)):
        paths: List[str] = []
        for s in spec:
            paths.extend(expand_trajectory_paths(s))
        return paths
    if any(ch in spec for ch in "*?["):
        matched = sorted(_glob.glob(spec))
        if not matched:
            raise TrajectoryError(f"no trajectory files match '{spec}'")
        return matched
    return [spec]


@dataclass
class _FileIndex:
    path: str
    fmt: str                     # 'xtc' | 'trr' | 'gro'
    offsets: np.ndarray          # (n,) int64 (gro: frame ordinal)
    natoms: np.ndarray
    steps: np.ndarray
    times: np.ndarray
    # gro-only: preparsed coordinates/boxes
    gro_coords: Optional[np.ndarray] = None
    gro_boxes: Optional[np.ndarray] = None


def _index_file(path: str) -> _FileIndex:
    ext = os.path.splitext(path)[1].lower()
    if ext in _XTC_EXT:
        info = native.xtc_scan(path)
        return _FileIndex(path, "xtc", info["offsets"], info["natoms"],
                          info["steps"], info["times"])
    if ext in _TRR_EXT:
        info = native.trr_scan(path)
        keep = info["has_coords"]
        return _FileIndex(path, "trr", info["offsets"][keep],
                          info["natoms"][keep], info["steps"][keep],
                          info["times"][keep])
    if ext in _GRO_EXT:
        return _index_gro(path)
    raise TrajectoryError(
        f"'{path}' does not have a supported trajectory format "
        f"(supported: xtc, trr, gro)"
    )


def _index_gro(path: str) -> _FileIndex:
    """Multi-frame GRO trajectory: parse all frames up-front (small files)."""
    from .gro import _parse_gro_box

    with open(path, "r") as fh:
        lines = fh.read().splitlines()
    coords, boxes, times = [], [], []
    pos = 0
    frame = 0
    while pos + 2 <= len(lines):
        title = lines[pos]
        try:
            n = int(lines[pos + 1].strip())
        except ValueError:
            raise TrajectoryError(
                f"could not parse frame {frame} of gro trajectory '{path}'"
            ) from None
        if pos + 2 + n + 1 > len(lines):
            raise TrajectoryError(f"truncated gro trajectory '{path}'")
        xyz = np.empty((n, 3), np.float32)
        for i in range(n):
            values = lines[pos + 2 + i][20:].split()
            xyz[i] = [float(v) for v in values[0:3]]
        box = _parse_gro_box(lines[pos + 2 + n].split(), path)
        t = 0.0
        if "t=" in title:
            try:
                t = float(title.rsplit("t=", 1)[1].split()[0])
            except (ValueError, IndexError):
                t = float(frame)
        else:
            t = float(frame)
        coords.append(xyz)
        boxes.append(box)
        times.append(t)
        pos += 2 + n + 1
        frame += 1
        while pos < len(lines) and not lines[pos].strip():
            pos += 1
    n_frames = len(coords)
    natoms = coords[0].shape[0] if n_frames else 0
    return _FileIndex(
        path, "gro",
        offsets=np.arange(n_frames, dtype=np.int64),
        natoms=np.full(n_frames, natoms, np.int32),
        steps=np.arange(n_frames, dtype=np.int32),
        times=np.array(times, np.float32),
        gro_coords=np.stack(coords) if n_frames else None,
        gro_boxes=np.stack(boxes) if n_frames else None,
    )


class Trajectory:
    """Concatenated multi-file trajectory with a global frame table."""

    def __init__(self, paths, expected_atoms: Optional[int] = None):
        self.paths = expand_trajectory_paths(paths)
        if not self.paths:
            raise TrajectoryError("no trajectory files given")
        self.files = [_index_file(p) for p in self.paths]

        for f in self.files:
            if len(f.natoms) and expected_atoms is not None:
                if int(f.natoms[0]) != expected_atoms:
                    raise TrajectoryError(
                        f"number of atoms in trajectory '{f.path}' "
                        f"({int(f.natoms[0])}) does not match the structure "
                        f"({expected_atoms})"
                    )

        # global frame table with boundary dedup: when the first frame of the
        # next file has the same time as the last kept frame, skip it
        file_ids, local_idx = [], []
        last_time = None
        for fid, f in enumerate(self.files):
            start = 0
            if (
                last_time is not None
                and len(f.times)
                and np.float32(f.times[0]) == np.float32(last_time)
            ):
                start = 1
            count = len(f.times)
            for i in range(start, count):
                file_ids.append(fid)
                local_idx.append(i)
            if count:
                last_time = f.times[count - 1]
        self.frame_file = np.array(file_ids, np.int32)
        self.frame_local = np.array(local_idx, np.int64)
        self.times = np.array(
            [self.files[fid].times[li] for fid, li in zip(file_ids, local_idx)],
            np.float32,
        )
        self.steps = np.array(
            [self.files[fid].steps[li] for fid, li in zip(file_ids, local_idx)],
            np.int64,
        )

    @property
    def n_frames(self) -> int:
        return len(self.frame_file)

    # ------------------------------------------------------------- selection
    def select_frames(self, begin: Optional[float], end: Optional[float],
                      step: int) -> np.ndarray:
        """Global frame indices for the [begin, end] window with stride."""
        if step < 1:
            raise AnalysisError("step must be at least 1")
        mask = np.ones(self.n_frames, dtype=bool)
        if begin is not None:
            mask &= self.times >= np.float32(begin)
        if end is not None:
            mask &= self.times <= np.float32(end)
        idx = np.nonzero(mask)[0]
        return idx[::step]

    # --------------------------------------------------------------- reading
    def read_frames(self, frame_indices: Sequence[int], first_n: int,
                    n_threads: int = 1, out: Optional[np.ndarray] = None):
        """Decode the given global frames → (coords, boxes, times, steps).

        `out` may supply a reusable (≥n, first_n, 3) f32 buffer; page-faulting
        a fresh buffer per batch costs more than the decode itself.
        """
        frame_indices = np.asarray(frame_indices, np.int64)
        n = len(frame_indices)
        if out is not None and out.shape[0] >= n and out.shape[1] == first_n:
            coords = out[:n]
        else:
            coords = np.empty((n, first_n, 3), np.float32)
        boxes = np.empty((n, 3, 3), np.float32)
        times = np.empty(n, np.float32)
        steps = np.empty(n, np.int64)

        fids = self.frame_file[frame_indices]
        for fid in np.unique(fids):
            sel = np.nonzero(fids == fid)[0]
            f = self.files[fid]
            local = self.frame_local[frame_indices[sel]]
            if f.fmt == "xtc":
                c, b, t, s = native.xtc_decode(
                    f.path, f.offsets[local], first_n, n_threads
                )
            elif f.fmt == "trr":
                c, b, t, s = native.trr_decode(f.path, f.offsets[local], first_n)
            else:  # gro
                c = f.gro_coords[local, :first_n]
                b = f.gro_boxes[local]
                t = f.times[local]
                s = f.steps[local]
            coords[sel] = c
            boxes[sel] = b
            times[sel] = t
            steps[sel] = s
        return coords, boxes, times, steps

    def read_frames_quantized(self, frame_indices: Sequence[int],
                              first_n: int, n_threads: int = 1,
                              out: Optional[np.ndarray] = None):
        """Decode XTC frames as fixed-point int16 (halves the host→device
        transfer; `float(i16) * inv_precision` is bit-identical to the f32
        decode). Returns (coords_i16, inv_precision, boxes, times, steps) or
        None when unsupported (non-XTC files or coordinates out of range)."""
        frame_indices = np.asarray(frame_indices, np.int64)
        fids = self.frame_file[frame_indices]
        if len(frame_indices) == 0:
            return None
        unique = np.unique(fids)
        if any(self.files[f].fmt != "xtc" for f in unique):
            return None
        n = len(frame_indices)
        if out is not None and out.shape[0] >= n and out.shape[1] == first_n \
                and out.dtype == np.int16:
            coords = out[:n]
        else:
            coords = np.empty((n, first_n, 3), np.int16)
        inv_prec = np.empty(n, np.float32)
        boxes = np.empty((n, 3, 3), np.float32)
        times = np.empty(n, np.float32)
        steps = np.empty(n, np.int64)
        for fid in unique:
            sel = np.nonzero(fids == fid)[0]
            f = self.files[fid]
            local = self.frame_local[frame_indices[sel]]
            res = native.xtc_decode_i16(f.path, f.offsets[local], first_n,
                                        n_threads=n_threads)
            if res is None:
                return None
            c, ip, b, t, s = res
            coords[sel] = c
            inv_prec[sel] = ip
            boxes[sel] = b
            times[sel] = t
            steps[sel] = s
        return coords, inv_prec, boxes, times, steps

    def read_frames_packed12(self, frame_indices: Sequence[int],
                             first_n: int, n_threads: int = 1,
                             out: Optional[np.ndarray] = None):
        """Decode XTC frames as 12-bit packed fixed-point integers (25%
        fewer host→device bytes than int16; device unpack + dequantize is
        bit-identical to the f32 decode). Returns (packed_u8 (n, stride),
        inv_precision, boxes, times, steps) or None when unsupported."""
        frame_indices = np.asarray(frame_indices, np.int64)
        fids = self.frame_file[frame_indices]
        if len(frame_indices) == 0:
            return None
        unique = np.unique(fids)
        if any(self.files[f].fmt != "xtc" for f in unique):
            return None
        n = len(frame_indices)
        stride = native.i12_stride(first_n)
        if out is not None and out.shape[0] >= n and out.shape[1] == stride \
                and out.dtype == np.uint8:
            coords = out[:n]
        else:
            coords = np.empty((n, stride), np.uint8)
        inv_prec = np.empty(n, np.float32)
        boxes = np.empty((n, 3, 3), np.float32)
        times = np.empty(n, np.float32)
        steps = np.empty(n, np.int64)
        for fid in unique:
            sel = np.nonzero(fids == fid)[0]
            f = self.files[fid]
            local = self.frame_local[frame_indices[sel]]
            res = native.xtc_decode_i12(f.path, f.offsets[local], first_n,
                                        n_threads=n_threads)
            if res is None:
                return None
            c, ip, b, t, s = res
            coords[sel] = c
            inv_prec[sel] = ip
            boxes[sel] = b
            times[sel] = t
            steps[sel] = s
        return coords, inv_prec, boxes, times, steps

    def iter_batches(self, frame_indices: Sequence[int], first_n: int,
                     batch_size: int, n_threads: int = 1
                     ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray,
                                         np.ndarray, np.ndarray]]:
        """Yield (coords, boxes, times, steps, analyzed_frame_numbers).

        The coords array is a view into a persistent buffer that is
        overwritten by the next iteration — consumers must copy it to the
        device (jax.device_put does) before advancing.
        """
        frame_indices = np.asarray(frame_indices, np.int64)
        buffer = np.zeros((batch_size, first_n, 3), np.float32)  # pre-faulted
        for lo in range(0, len(frame_indices), batch_size):
            chunk = frame_indices[lo:lo + batch_size]
            coords, boxes, times, steps = self.read_frames(
                chunk, first_n, n_threads, out=buffer
            )
            analyzed = np.arange(lo, lo + len(chunk), dtype=np.int64)
            if len(chunk) < batch_size:
                # expose the full fixed-size buffer so callers always ship
                # one shape to the device; rows past len(analyzed) are
                # stale padding masked out by the frame mask
                coords = buffer
            yield coords, boxes, times, steps, analyzed


def check_box(box: np.ndarray, path_hint: str = "") -> None:
    """Validate an orthogonal, non-zero box (common.rs:186-198)."""
    box = np.asarray(box)
    off_diag = box.copy()
    off_diag[np.arange(3), np.arange(3)] = 0.0
    if np.any(off_diag != 0.0):
        raise AnalysisError(
            "the simulation box is not orthogonal; only orthogonal boxes are "
            "supported (use handle_pbc: false to ignore the box)"
        )
    if np.any(np.diag(box) <= 0.0):
        raise AnalysisError(
            "the simulation box is invalid (zero or negative dimension); "
            "use handle_pbc: false to ignore the box"
        )
