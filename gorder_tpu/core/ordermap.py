"""2-D ordermap accumulation.

Behavioral reference: src/analysis/ordermap.rs (Map = per-bond-type grids of
Σorder / n_samples over a plane; bond midpoint projected; nearest-tile
binning; out-of-range samples ignored) re-expressed as a device-side
segment-sum over flattened (bond type × tile) ids, with grids living in HBM
across the whole trajectory and fetched once at the end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

_PLANE_AXES = {"xy": (0, 1), "xz": (0, 2), "yz": (1, 2)}


@dataclass(frozen=True)
class MapSpec:
    """Static grid geometry (hashable → usable as a jit static argument)."""

    ax0: int
    ax1: int
    start0: float
    start1: float
    bin0: float
    bin1: float
    n0: int
    n1: int
    # requested span ends (before snapping to the bin grid) — surfaced by
    # the Python API's Map.span_x/span_y (pygorder results.pyi:333-350)
    end0: float = 0.0
    end1: float = 0.0

    @property
    def ncells(self) -> int:
        return self.n0 * self.n1

    def tick0(self) -> np.ndarray:
        return self.start0 + np.arange(self.n0) * self.bin0

    def tick1(self) -> np.ndarray:
        return self.start1 + np.arange(self.n1) * self.bin1


def build_map_spec(params, structure_box: Optional[np.ndarray]) -> MapSpec:
    """Resolve grid geometry from OrderMapParams + the structure's box
    (Auto spans = (0, box[axis]), ordermap.rs Map::new). Pass
    structure_box=None when PBC handling is disabled (the reference passes
    simbox: None there, ordermap.rs:55-64)."""
    from ..errors import OrderMapError, fnum

    ax0, ax1 = _PLANE_AXES[params.plane]
    spans = []
    for axis, gridspan in zip((ax0, ax1), params.dim):
        if gridspan.auto:
            if structure_box is None or structure_box[axis, axis] <= 0:
                # wording: src/errors.rs:399-401
                # (OrderMapConfigError::InvalidBoxAuto)
                raise OrderMapError(
                    "simulation box and periodic boundary conditions are "
                    "ignored => unable to automatically set ordermap "
                    "dimensions (hint: set ordermap dimensions manually)")
            spans.append((0.0, float(structure_box[axis, axis])))
        else:
            spans.append((gridspan.start, gridspan.end))
    (s0, e0), (s1, e1) = spans
    b0, b1 = params.bin_size
    if b0 > e0 - s0 or b1 > e1 - s1:
        # wording: src/errors.rs:390-397 (OrderMapConfigError::BinTooLarge);
        # reported spans are the grid maxima, like GridMap::new's check
        raise OrderMapError(
            f"invalid bin size of 'ordermap': bin size of "
            f"'{fnum(b0)}x{fnum(b1)}' is larger than grid span of "
            f"'{fnum(e0)}x{fnum(e1)}'")
    n0 = int(np.floor((e0 - s0) / b0 + 0.5)) + 1
    n1 = int(np.floor((e1 - s1) / b1 + 0.5)) + 1
    return MapSpec(ax0, ax1, s0, s1, b0, b1, n0, n1, e0, e1)


def map_cells(mid, spec: MapSpec, bond_type, n_types):
    """(B, N, 3) midpoints → flattened (type × tile) cell ids; invalid
    samples map to the trailing dump cell (index n_types*ncells)."""
    import jax.numpy as jnp

    p0 = mid[..., spec.ax0]
    p1 = mid[..., spec.ax1]
    i0 = jnp.floor((p0 - spec.start0) / spec.bin0 + 0.5).astype(jnp.int32)
    i1 = jnp.floor((p1 - spec.start1) / spec.bin1 + 0.5).astype(jnp.int32)
    in_range = (i0 >= 0) & (i0 < spec.n0) & (i1 >= 0) & (i1 < spec.n1)
    cell = bond_type[None, :] * (spec.n0 * spec.n1) + i0 * spec.n1 + i1
    dump = n_types * spec.n0 * spec.n1
    return jnp.where(in_range, cell, dump), in_range


def update_maps(state, sch, cells, masks):
    """Scatter per-sample order values into the per-class grids.

    state: {cls: (4, n_types*ncells + 1) f32 [l2, l1, l0, counts]};
    sch: (B, N) f32; cells: (B, N) int32; masks: {cls: (B, N) f32}.

    Samples are quantized to the same 1e-6 fixed point as the main order
    accumulation (core/order.py quantize_split: round half away from zero,
    three exact 7-bit f32 limbs), so tile sums are bit-identical regardless
    of batch size, device count, or GSPMD reduction order — the reference
    accumulates map tiles in its i64 `OrderValue` for the same reason
    (src/analysis/ordermap.rs). Limbs < 128 keep the per-batch per-tile
    f32 sums exact up to 2^24/128 ≈ 131k samples."""
    import jax
    import jax.numpy as jnp

    from .order import quantize_split

    n_seg = state[next(iter(state))].shape[1]
    flat_cells = cells.reshape(-1)
    l2, l1, l0 = quantize_split(sch)
    rows = (l2.reshape(-1), l1.reshape(-1), l0.reshape(-1))
    out = {}
    for cls, mask in masks.items():
        flat_mask = mask.reshape(-1)
        sums = [jax.ops.segment_sum(r * flat_mask, flat_cells,
                                    num_segments=n_seg) for r in rows]
        sums.append(jax.ops.segment_sum(flat_mask, flat_cells,
                                        num_segments=n_seg))
        out[cls] = state[cls] + jnp.stack(sums)
    return out


def init_map_state(classes, n_types: int, spec: MapSpec):
    import jax.numpy as jnp

    return {
        cls: jnp.zeros((4, n_types * spec.ncells + 1), jnp.float32)
        for cls in classes
    }


def finalize_maps(state_host, n_types: int, spec: MapSpec, min_samples: int,
                  sign: float):
    """Fetch → {cls: (T, n0, n1) value grids (NaN below min_samples)} plus
    raw (sums, counts) for aggregation."""
    grids = {}
    raw = {}
    for cls, arr in state_host.items():
        arr = np.asarray(arr)[:, :-1]  # drop the dump cell
        # exact int64 recombination of the 7-bit limbs, then back to the
        # 1e-6 scale (matches core/order.py recombine_limbs)
        l2 = arr[0].astype(np.int64)
        l1 = arr[1].astype(np.int64)
        l0 = arr[2].astype(np.int64)
        sums = ((l2 * 16384 + l1 * 128 + l0)
                .reshape(n_types, spec.n0, spec.n1)
                .astype(np.float64) * 1e-6)
        counts = arr[3].reshape(n_types, spec.n0, spec.n1).astype(np.float64)
        raw[cls] = (sums, counts)
        with np.errstate(invalid="ignore", divide="ignore"):
            values = sign * sums / counts
        grids[cls] = np.where(counts >= max(min_samples, 1), values, np.nan)
    return grids, raw


def aggregate_map(raw_cls, type_indices, spec: MapSpec, min_samples: int,
                  sign: float) -> np.ndarray:
    """Average grid over a set of bond types (atom / molecule / system)."""
    sums, counts = raw_cls
    s = sums[type_indices].sum(axis=0)
    c = counts[type_indices].sum(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        values = sign * s / c
    return np.where(c >= max(min_samples, 1), values, np.nan)
