"""Geometric region selection (device-side masks).

Behavioral reference: src/analysis/geometry.rs — cuboid / cylinder / sphere
shapes anchored at a reference point (fixed, box center, or per-frame COG of
a selection), with infinite default spans, optional inversion, and PBC-aware
or naive inside tests. Bonds whose midpoint falls outside contribute nothing.

The shape becomes a hashable spec (static jit argument); the per-frame
reference point is a (B, 3) array computed by the caller.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

_AXIS = {"x": 0, "y": 1, "z": 2}


@dataclass(frozen=True)
class GeometrySpec:
    kind: str                      # 'cuboid' | 'cylinder' | 'sphere'
    invert: bool = False
    # cuboid: spans relative to the reference
    xdim: Tuple[float, float] = (-np.inf, np.inf)
    ydim: Tuple[float, float] = (-np.inf, np.inf)
    zdim: Tuple[float, float] = (-np.inf, np.inf)
    # cylinder
    radius: float = np.inf
    span: Tuple[float, float] = (-np.inf, np.inf)
    orientation: int = 2


def build_geometry_spec(geometry) -> Optional[GeometrySpec]:
    if geometry is None:
        return None
    if geometry.kind == "cuboid":
        return GeometrySpec("cuboid", invert=getattr(geometry, "invert", False),
                            xdim=tuple(geometry.xdim),
                            ydim=tuple(geometry.ydim),
                            zdim=tuple(geometry.zdim))
    if geometry.kind == "cylinder":
        return GeometrySpec("cylinder",
                            invert=getattr(geometry, "invert", False),
                            radius=geometry.radius,
                            span=tuple(geometry.span),
                            orientation=_AXIS[geometry.orientation])
    return GeometrySpec("sphere", invert=getattr(geometry, "invert", False),
                        radius=geometry.radius)


def inside_mask(mid, ref, box_diag, spec: GeometrySpec, handle_pbc: bool):
    """(B, N, 3) midpoints, (B, 3) reference → (B, N) bool inside mask.

    PBC semantics mirror the reference's shape construction
    (geometry.rs construct_shape): each finite span moves the shape corner to
    reference + span_min with extent span_max − span_min; an infinite span
    covers the whole box (PBC) or everything (NoPBC). Inside tests use
    coordinates wrapped relative to the corner.
    """
    import jax.numpy as jnp

    rel = mid - ref[:, None, :]                       # (B, N, 3)
    box = box_diag[:, None, :]

    def axis_ok(delta, lo, hi, axis):
        if np.isinf(lo) and np.isinf(hi):
            return jnp.ones(delta.shape, bool)
        extent = hi - lo
        shifted = delta - lo                          # corner-relative
        if handle_pbc:
            length = box[..., axis]
            shifted = shifted - length * jnp.floor(shifted / length)
        return (shifted >= 0) & (shifted <= extent)

    if spec.kind == "cuboid":
        ok = (axis_ok(rel[..., 0], spec.xdim[0], spec.xdim[1], 0)
              & axis_ok(rel[..., 1], spec.ydim[0], spec.ydim[1], 1)
              & axis_ok(rel[..., 2], spec.zdim[0], spec.zdim[1], 2))
    elif spec.kind == "cylinder":
        plane = tuple(a for a in range(3) if a != spec.orientation)
        d0 = rel[..., plane[0]]
        d1 = rel[..., plane[1]]
        if handle_pbc:
            l0 = box[..., plane[0]]
            l1 = box[..., plane[1]]
            d0 = d0 - l0 * jnp.round(d0 / l0)
            d1 = d1 - l1 * jnp.round(d1 / l1)
        if np.isinf(spec.radius):
            radial_ok = jnp.ones(d0.shape, bool)
        else:
            radial_ok = d0 * d0 + d1 * d1 <= spec.radius * spec.radius
        ok = radial_ok & axis_ok(rel[..., spec.orientation],
                                 spec.span[0], spec.span[1],
                                 spec.orientation)
    else:  # sphere
        d = rel
        if handle_pbc:
            d = d - box * jnp.round(d / box)
        if np.isinf(spec.radius):
            ok = jnp.ones(d.shape[:-1], bool)
        else:
            ok = jnp.sum(d * d, axis=-1) <= spec.radius * spec.radius

    if spec.invert:
        ok = ~ok
    return ok
