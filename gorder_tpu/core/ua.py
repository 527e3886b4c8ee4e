"""United-atom virtual-hydrogen kernel.

Behavioral reference: src/analysis/uaorder.rs — buildH-style hydrogen
reconstruction (constants :35-41, prediction :944-1106) and per-atom virtual
bond accumulation. Re-architected for TPU: atoms are grouped by kind
(CH3 / CH2 / CH1-unsaturated / CH1-saturated) into flat index arrays; each
kind's hydrogens are reconstructed for the whole frame batch with vectorized
Rodrigues rotations, then every virtual C-H sample flows through the same
quantize + one-hot-matmul reduction as real bonds (core/order.py).

Parity notes:
- the reference's bond position for geometry/ordermaps is
  `hydrogen + (hydrogen - target)/2` (uaorder.rs:386) — reproduced verbatim;
- rotations and normalizations in f32 like the reference (nalgebra f32).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.context import put_const

from .order import quantize_split
from .pbc import min_image, wrap

TETRAHEDRAL_ANGLE = np.float32(1.910633)
TETRAHEDRAL_ANGLE_HALF = np.float32(0.9553165)
BOND_LENGTH = np.float32(0.109)
CH3_ANGLE = np.float32(2.0943952)


def _normalize(v, eps=1e-30):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def _rodrigues(v, axis, angle):
    """Rotate v around unit axis by angle (broadcast over leading dims)."""
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    k_cross_v = jnp.cross(axis, v)
    k_dot_v = jnp.sum(axis * v, axis=-1, keepdims=True)
    return v * cos + k_cross_v * sin + axis * k_dot_v * (1.0 - cos)


def _gather(coords, idx):
    return jnp.take(coords, idx, axis=1)


def predict_ch3(t, h1, h2, box, handle_pbc):
    """(..., 3) target/helper positions → 3 hydrogen positions."""
    th1 = h1 - t
    th2 = h2 - t
    if handle_pbc:
        th1 = min_image(th1, box)
        th2 = min_image(th2, box)
    axis1 = _normalize(jnp.cross(th2, th1))
    hv1 = _rodrigues(th1, axis1, TETRAHEDRAL_ANGLE)
    hydrogen1 = t + _normalize(hv1) * BOND_LENGTH
    axis2 = _normalize(th1)
    hv2 = _rodrigues(hv1, axis2, CH3_ANGLE)
    hv3 = _rodrigues(hv1, axis2, -CH3_ANGLE)
    hydrogen2 = t + _normalize(hv2) * BOND_LENGTH
    hydrogen3 = t + _normalize(hv3) * BOND_LENGTH
    return [hydrogen1, hydrogen2, hydrogen3]


def predict_ch2(t, h1, h2, box, handle_pbc):
    th1 = h1 - t
    th2 = h2 - t
    if handle_pbc:
        th1 = min_image(th1, box)
        th2 = min_image(th2, box)
    u1 = _normalize(th1)
    u2 = _normalize(th2)
    plane_normal = jnp.cross(u2, u1)
    rot_axis = _normalize(u1 - u2)
    rot_vec = jnp.cross(plane_normal, rot_axis)
    hv1 = _rodrigues(rot_vec, rot_axis, TETRAHEDRAL_ANGLE_HALF)
    hv2 = _rodrigues(rot_vec, rot_axis, -TETRAHEDRAL_ANGLE_HALF)
    hydrogen1 = t + _normalize(hv1) * BOND_LENGTH
    hydrogen2 = t + _normalize(hv2) * BOND_LENGTH
    return [hydrogen1, hydrogen2]


def predict_ch1_unsaturated(t, h1, h2, box, handle_pbc):
    th1 = h1 - t
    th2 = h2 - t
    if handle_pbc:
        th1 = min_image(th1, box)
        th2 = min_image(th2, box)
    # gamma = angle between th1 and th2
    dot = jnp.sum(th1 * th2, axis=-1, keepdims=True)
    norms = jnp.sqrt(
        jnp.sum(th1 * th1, axis=-1, keepdims=True)
        * jnp.sum(th2 * th2, axis=-1, keepdims=True))
    gamma = jnp.arccos(jnp.clip(dot / jnp.maximum(norms, 1e-30), -1.0, 1.0))
    axis = _normalize(jnp.cross(th1, th2))
    hv = _rodrigues(th2, axis, jnp.pi - gamma / 2.0)
    return [t + _normalize(hv) * BOND_LENGTH]


def predict_ch1_saturated(t, h1, h2, h3, box, handle_pbc):
    th1 = h1 - t
    th2 = h2 - t
    th3 = h3 - t
    if handle_pbc:
        th1 = min_image(th1, box)
        th2 = min_image(th2, box)
        th3 = min_image(th3, box)
    hv = -(_normalize(th1) + _normalize(th2) + _normalize(th3))
    return [t + _normalize(hv) * BOND_LENGTH]


def _ua_step_impl(coords, box_diag, normal, frame_mask, indices, bond_mol,
                  onehot, leaflet_classes, inv_scale=None,
                  bond_type_ids=None, map_state=None, geom_ref=None, *,
                  handle_pbc, with_leaflets, normal_mode, layout,
                  quantized=False, map_spec=None, geom_spec=None):
    """layout: tuple of (category, n_atoms) pairs in concatenation order.

    `indices` is a dict of per-category index arrays; each category yields
    n_atoms * n_hydrogens virtual-bond samples, concatenated in layout order
    (hydrogen-major per atom: atom0-H0, atom0-H1, ..., atom1-H0, ...)."""
    from .geometry import inside_mask
    from .ordermap import map_cells, update_maps

    if quantized:
        coords = coords.astype(jnp.float32) * inv_scale[:, None, None]
    box3 = box_diag[:, None, :]

    with_pos = map_spec is not None or geom_spec is not None
    pos_parts = []
    sch_parts = []
    for category, _n in layout:
        ix = indices[category]
        t = _gather(coords, ix["target"])
        h1 = _gather(coords, ix["h1"])
        h2 = _gather(coords, ix["h2"]) if "h2" in ix else None
        if category == "ch3":
            hydrogens = predict_ch3(t, h1, h2, box3, handle_pbc)
        elif category == "ch2":
            hydrogens = predict_ch2(t, h1, h2, box3, handle_pbc)
        elif category == "ch1u":
            hydrogens = predict_ch1_unsaturated(t, h1, h2, box3, handle_pbc)
        else:  # ch1s
            h3 = _gather(coords, ix["h3"])
            hydrogens = predict_ch1_saturated(t, h1, h2, h3, box3, handle_pbc)

        per_atom = []
        per_atom_pos = []
        for hpos in hydrogens:
            if handle_pbc:
                hpos = wrap(hpos, box3)
            vec = hpos - t
            if handle_pbc:
                vec = min_image(vec, box3)
            if normal_mode == "static":
                proj = jnp.einsum("bnc,c->bn", vec, normal)
                n2 = jnp.float32(1.0)
            else:
                pb_normal = jnp.take(normal, ix["mol"], axis=1)
                proj = jnp.sum(vec * pb_normal, axis=-1)
                n2 = jnp.maximum(jnp.sum(pb_normal * pb_normal, axis=-1), 1e-18)
            d2 = jnp.maximum(jnp.sum(vec * vec, axis=-1), 1e-18)
            per_atom.append(1.5 * (proj * proj) / (d2 * n2) - 0.5)
            if with_pos:
                # the reference's bond position (uaorder.rs:386):
                # hydrogen + (hydrogen − target)/2
                per_atom_pos.append(hpos + vec * 0.5)
        # hydrogen-major per atom: (B, n, K) → (B, n*K)
        stacked = jnp.stack(per_atom, axis=-1)
        sch_parts.append(stacked.reshape(stacked.shape[0], -1))
        if with_pos:
            pstacked = jnp.stack(per_atom_pos, axis=-2)   # (B, n, K, 3)
            pos_parts.append(
                pstacked.reshape(pstacked.shape[0], -1, 3))

    sch = jnp.concatenate(sch_parts, axis=1)          # (B, Nv)

    l2, l1, l0 = quantize_split(sch)
    valid = frame_mask[:, None].astype(jnp.float32)
    ones = jnp.broadcast_to(valid, sch.shape)

    if with_pos:
        bond_pos = jnp.concatenate(pos_parts, axis=1)  # (B, Nv, 3)
    if geom_spec is not None:
        from .order import _geometry_reference

        ref = _geometry_reference(coords, box_diag, geom_ref, handle_pbc)
        geo = inside_mask(bond_pos, ref, box_diag, geom_spec, handle_pbc)
        ones = ones * geo

    def reduce(mask):
        # exact bf16 MXU path — same argument as core/order.py reduce:
        # limbs |v| < 128 and masks {0, 1} are bf16-exact, products are
        # exact, accumulation stays f32
        stacked = jnp.stack(
            [l2 * mask, l1 * mask, l0 * mask, mask],
            axis=1).astype(jnp.bfloat16)
        return jnp.einsum("bcn,nt->bct", stacked,
                          onehot.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    masks = {"total": ones}
    if with_leaflets:
        cls = jnp.take(leaflet_classes, bond_mol, axis=1)
        masks["upper"] = ones * (cls == 0)
        masks["lower"] = ones * (cls == 1)

    out = {c: reduce(m) for c, m in masks.items()}

    if map_spec is not None:
        n_types = onehot.shape[1]
        cells, _ = map_cells(bond_pos, map_spec, bond_type_ids, n_types)
        map_state = update_maps(map_state, sch, cells, masks)
    return out, map_state


_ua_step = jax.jit(
    _ua_step_impl,
    static_argnames=("handle_pbc", "with_leaflets", "normal_mode", "layout",
                     "quantized", "map_spec", "geom_spec"),
)


def make_ua_step(categories: Dict[str, Dict[str, np.ndarray]],
                 bond_type: np.ndarray, bond_mol: np.ndarray, n_types: int,
                 *, handle_pbc=True, with_leaflets=False,
                 normal_mode="static", map_spec=None, geom_spec=None):
    """categories: {'ch3': {'target','h1','h2','mol'}, 'ch2': ...,
    'ch1u': ..., 'ch1s': {..., 'h3'}}; bond_type/bond_mol are per
    virtual-bond-sample arrays in the concatenated layout order."""
    from .order import _one_hot

    layout = tuple(
        (cat, len(categories[cat]["target"]))
        for cat in ("ch3", "ch2", "ch1u", "ch1s") if cat in categories
    )
    indices = {
        cat: {k: put_const(np.asarray(v, np.int32))
              for k, v in categories[cat].items()}
        for cat, _ in layout
    }
    onehot_d = put_const(_one_hot(np.asarray(bond_type), n_types))
    bond_mol_d = put_const(np.asarray(bond_mol, np.int32))
    bond_type_d = put_const(np.asarray(bond_type, np.int32))
    dummy = put_const(np.zeros((1, 1), np.int32))

    def step(coords, box_diag, normal, frame_mask, leaflet_classes=None,
             inv_scale=None, map_state=None, geom_ref=None):
        return _ua_step(
            coords, box_diag, normal, frame_mask, indices, bond_mol_d,
            onehot_d,
            leaflet_classes if leaflet_classes is not None else dummy,
            inv_scale, bond_type_d, map_state, geom_ref,
            handle_pbc=handle_pbc, with_leaflets=with_leaflets,
            normal_mode=normal_mode, layout=layout,
            quantized=inv_scale is not None,
            map_spec=map_spec, geom_spec=geom_spec,
        )

    def impl(coords, box_diag, normal, frame_mask, leaflet_classes=None,
             inv_scale=None, map_state=None, geom_ref=None, *,
             use_pallas=False, diff_input=False):
        """Traceable (unjitted) body for fused per-batch programs
        (analysis.py _build_fused_steps): wire reconstruction and the UA
        kernel compile as ONE XLA program. No Pallas/diff variants — the
        virtual-H geometry needs absolute positions."""
        assert not use_pallas and not diff_input
        return _ua_step_impl(
            coords, box_diag, normal, frame_mask, indices, bond_mol_d,
            onehot_d,
            leaflet_classes if leaflet_classes is not None else dummy,
            inv_scale, bond_type_d, map_state, geom_ref,
            handle_pbc=handle_pbc, with_leaflets=with_leaflets,
            normal_mode=normal_mode, layout=layout,
            quantized=inv_scale is not None,
            map_spec=map_spec, geom_spec=geom_spec,
        )

    step.impl = impl
    return step
