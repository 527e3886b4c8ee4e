"""Periodic-boundary helpers (device-side, JAX).

Equivalent of the reference's PBCHandler (src/analysis/pbc.rs:21-480) for
orthogonal boxes, re-expressed as pure vectorized functions over frame
batches. `NoPBC` behavior = pass `None` boxes to the callers, which use the
naive versions.
"""

from __future__ import annotations

import jax.numpy as jnp


def min_image(d, box_diag):
    """Minimum-image displacement for orthogonal boxes.

    d: (..., 3) displacements; box_diag: broadcastable (..., 3) box lengths.
    """
    return d - box_diag * jnp.round(d / box_diag)


def wrap(x, box_diag):
    """Wrap coordinates into [0, L)."""
    return x - box_diag * jnp.floor(x / box_diag)


def circular_mean_cog(points, mask, box_diag):
    """Refined Bai–Breen center of geometry under PBC.

    points: (..., N, 3); mask: (..., N) bool/float weights;
    box_diag: (..., 3). Returns (..., 3) center inside the box.

    Same construction groan_rs ≥0.9 uses for group centers (gorder
    CHANGELOG §1.0.0 "Refined Bai-Breen algorithm"; SURVEY.md §2.1 "PBC
    handling"): the classic circular mean — each coordinate maps to an
    angle, the weighted mean angle maps back — gives an estimate that is
    exact only for tight clusters; the refinement step averages the
    min-image deviations of all points from that estimate, which removes
    the circular-projection bias whenever the group spans less than half
    the box around its center.
    """
    weights = mask.astype(points.dtype)[..., None]
    count = jnp.maximum(jnp.sum(weights, axis=-2), 1e-30)
    theta = points / box_diag[..., None, :] * (2.0 * jnp.pi)
    xi = jnp.sum(jnp.cos(theta) * weights, axis=-2)
    zeta = jnp.sum(jnp.sin(theta) * weights, axis=-2)
    mean_theta = jnp.arctan2(-zeta, -xi) + jnp.pi
    estimate = mean_theta / (2.0 * jnp.pi) * box_diag
    dev = min_image(points - estimate[..., None, :], box_diag[..., None, :])
    refined = estimate + jnp.sum(dev * weights, axis=-2) / count
    return wrap(refined, box_diag)


def naive_cog(points, mask):
    """Plain center of geometry (NoPBC)."""
    weights = mask.astype(points.dtype)[..., None]
    total = jnp.sum(points * weights, axis=-2)
    count = jnp.maximum(jnp.sum(weights, axis=-2), 1e-30)
    return total / count


def signed_axis_distance(a, b, box_diag):
    """Per-component a-b wrapped to [-L/2, L/2] (distance along axes)."""
    return min_image(a - b, box_diag)
