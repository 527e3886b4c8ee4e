"""Fused Pallas TPU kernel for the united-atom hot path.

The UA mode was the last without a Pallas kernel (round-3 Weak #5): its
XLA path materializes every prediction intermediate — helper-difference
planes, rotation axes, reconstructed hydrogens, per-hydrogen sch planes,
the (B, 4, Nv) stacked reduction operand — in HBM between fusions. This
module fuses virtual-hydrogen reconstruction (core/ua.py planar
predictors), P2, reference-exact fixed-point quantization
(core/order.py quantize_split), frame/leaflet masking and the per-type
MXU reduction into ONE kernel per atom category: per grid step the
pre-gathered target/helper tiles are read from HBM once and everything
else lives in VMEM/registers.

The kernel body calls the SAME planar predictor functions as the XLA
path (predict_ch3_planar & co. are pure jnp on (Bt, Nt) tiles), so there
is exactly one numeric formulation of the buildH geometry
(src/analysis/uaorder.rs:944-1106). Like the bond-based kernel
(pallas_p2.py), the reductions are exact integer f32 matmuls; the
per-sample elementwise chain may differ from the XLA path by one 1e-6
quantum on a small fraction of samples (XLA FMA-contraction), so the two
paths agree per type to |Δsum| ≤ n_samples quanta — asserted by
tests/test_pallas_ua.py in interpret mode.

Scope: UA bond order with a static or per-molecule membrane normal,
with or without leaflet classification. Ordermaps / geometry selection
ride the XLA path (a one-sample-one-cell scatter is not a fusion/MXU
problem). Category kernels run separately (CH3 / CH2 / CH1u / CH1s have
different helper arity); their (B, TP) limb partials are summed outside
— exact, the per-type totals stay far below 2^24.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ua import (predict_ch1_saturated_planar,
                       predict_ch1_unsaturated_planar_nacos,
                       predict_ch2_planar, predict_ch3_planar, _pdot,
                       _pmin_image, _psub, _pwrap)

from .pallas_p2 import _BT, _NT, _TP, _accumulate

_N_HYDROGENS = {"ch3": 3, "ch2": 2, "ch1u": 1, "ch1s": 1}
_N_HELPERS = {"ch3": 2, "ch2": 2, "ch1u": 2, "ch1s": 3}


def pallas_ua_supported(*, with_leaflets, normal_mode, map_spec, geom_spec,
                        n_types: int) -> bool:
    """Whether the fused UA kernel covers this configuration."""
    flag = os.environ.get("GORDER_TPU_PALLAS")
    if flag == "0":
        return False
    if normal_mode not in ("static", "per_molecule"):
        return False
    if map_spec is not None or geom_spec is not None:
        return False
    if n_types > _TP:
        return False
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"


def _ua_kernel(*refs, category, handle_pbc, per_bond_normal, with_leaflets,
               n_onehot):
    """Grid-step body. Ref order:
    <normal refs> t_x t_y t_z h1_x.. h2_x.. [h3_x..] bx by bz mask [cls]
    onehot_0..onehot_{K-1} *outs — normal refs are one (1, 3) ref
    (static) or three (Bt, Nt) planes (per-atom, gathered outside);
    onehot_k holds the one-hot type rows of hydrogen k's samples."""
    nn = 3 if per_bond_normal else 1
    nrm_refs = refs[:nn]
    nh = _N_HELPERS[category]
    pos_refs = refs[nn:nn + 3 * (1 + nh)]
    rest = refs[nn + 3 * (1 + nh):]
    bx_ref, by_ref, bz_ref, mask_ref = rest[:4]
    rest = rest[4:]
    if with_leaflets:
        cls_ref = rest[0]
        rest = rest[1:]
    oh_refs = rest[:n_onehot]
    out_refs = rest[n_onehot:]

    t = (pos_refs[0][:], pos_refs[1][:], pos_refs[2][:])
    h1 = (pos_refs[3][:], pos_refs[4][:], pos_refs[5][:])
    h2 = (pos_refs[6][:], pos_refs[7][:], pos_refs[8][:]) if nh >= 2 \
        else None
    h3 = (pos_refs[9][:], pos_refs[10][:], pos_refs[11][:]) if nh >= 3 \
        else None
    boxp = (bx_ref[:], by_ref[:], bz_ref[:])               # (Bt, 1) columns

    if category == "ch3":
        hydrogens = predict_ch3_planar(t, h1, h2, boxp, handle_pbc)
    elif category == "ch2":
        hydrogens = predict_ch2_planar(t, h1, h2, boxp, handle_pbc)
    elif category == "ch1u":
        # acos-free variant: Mosaic has no acos lowering (core/ua.py
        # predict_ch1_unsaturated_planar_nacos docstring)
        hydrogens = predict_ch1_unsaturated_planar_nacos(t, h1, h2, boxp,
                                                         handle_pbc)
    else:  # ch1s
        hydrogens = predict_ch1_saturated_planar(t, h1, h2, h3, boxp,
                                                 handle_pbc)

    if per_bond_normal:
        nrm = (nrm_refs[0][:], nrm_refs[1][:], nrm_refs[2][:])
        n2 = jnp.maximum(_pdot(nrm, nrm), 1e-18)
    else:
        nx = nrm_refs[0][0, 0]
        ny = nrm_refs[0][0, 1]
        nz = nrm_refs[0][0, 2]
        n2 = jnp.float32(1.0)

    m = jnp.broadcast_to(mask_ref[:], t[0].shape)          # (Bt, Nt)
    if with_leaflets:
        cls = cls_ref[:]
        masks = (m, m * (cls == 0.0), m * (cls == 1.0))
    else:
        masks = (m,)

    from ..core.order import quantize_split

    n_cls = len(masks)
    parts = [None] * (n_cls * 4)
    for k, hpos in enumerate(hydrogens):
        if handle_pbc:
            hpos = _pwrap(hpos, boxp)
        vec = _psub(hpos, t)
        if handle_pbc:
            vec = _pmin_image(vec, boxp)
        if per_bond_normal:
            proj = _pdot(vec, nrm)
        else:
            proj = (vec[0] * nx + vec[1] * ny) + vec[2] * nz
        d2 = jnp.maximum(_pdot(vec, vec), 1e-18)
        sch = 1.5 * (proj * proj) / (d2 * n2) - 0.5
        l2, l1, l0 = quantize_split(sch)
        oh = oh_refs[k][:]                                 # (Nt, TP)
        for c, mk in enumerate(masks):
            for r, row in enumerate((l2, l1, l0, mk)):
                p = jnp.dot(row * mk if r < 3 else mk, oh,
                            preferred_element_type=jnp.float32)
                i = c * 4 + r
                parts[i] = p if parts[i] is None else parts[i] + p
    _accumulate(out_refs, parts)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def make_pallas_ua_step(categories, bond_type, bond_mol, n_types: int, *,
                        handle_pbc=True, with_leaflets=False,
                        normal_mode="static"):
    """Fused fast-path variant of core.ua.make_ua_step for the
    configurations it supports (same output layout: a dict of (B, 4, T)
    limb rows per class). `bond_type`/`bond_mol` are per-SAMPLE arrays in
    the concatenated hydrogen-major layout (core/ua.py), from which each
    category's per-hydrogen one-hot rows are sliced."""
    per_bond_normal = normal_mode == "per_molecule"
    layout = tuple(
        (cat, len(categories[cat]["target"]))
        for cat in ("ch3", "ch2", "ch1u", "ch1s") if cat in categories
    )
    bond_type = np.asarray(bond_type, np.int32)

    prepared = []
    offset = 0
    for cat, n in layout:
        K = _N_HYDROGENS[cat]
        nt = min(_NT, _round_up(n, 128))
        n_pad = _round_up(max(n, nt), nt)
        idx = {}
        for key in ("target", "h1", "h2", "h3", "mol"):
            if key in categories[cat]:
                a = np.zeros(n_pad, np.int32)
                a[:n] = categories[cat][key]
                idx[key] = jax.device_put(a)
        # this category's samples: offset .. offset + n*K, hydrogen-major
        onehots = []
        types = bond_type[offset:offset + n * K].reshape(n, K)
        for k in range(K):
            oh = np.zeros((n_pad, _TP), np.float32)
            oh[np.arange(n), types[:, k]] = 1.0   # padded rows stay 0
            onehots.append(jax.device_put(oh))
        offset += n * K
        prepared.append((cat, n_pad, nt, idx, onehots))
    interpret = jax.default_backend() != "tpu"

    def impl(coords, box_diag, normal, frame_mask, leaflet_classes=None,
             inv_scale=None):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..parallel.context import active_mesh

        if inv_scale is not None:
            coords = coords.astype(jnp.float32) * inv_scale[:, None, None]
        B = coords.shape[0]
        mesh = active_mesh()
        n_shards = int(mesh.devices.size) if mesh is not None else 1
        assert B % n_shards == 0, "pallas UA: batch not mesh-divisible"
        B_loc = B // n_shards
        bt = _BT if B_loc % _BT == 0 else 8
        cpl = tuple(coords[..., i] for i in range(3))
        bx = box_diag[:, 0:1]
        by = box_diag[:, 1:2]
        bz = box_diag[:, 2:3]
        mask = frame_mask.astype(jnp.float32)[:, None]
        mem = pltpu.VMEM if not interpret else None

        def vspec(shape, index_map):
            if interpret:
                return pl.BlockSpec(shape, index_map)
            return pl.BlockSpec(shape, index_map, memory_space=mem)

        n_cls = 3 if with_leaflets else 1
        n_out = 4 * n_cls
        total = None
        for cat, n_pad, nt, idx, onehots in prepared:
            K = _N_HYDROGENS[cat]
            nh = _N_HELPERS[cat]
            grid = (B_loc // bt, n_pad // nt)
            tile = lambda i, j: (i, j)      # noqa: E731
            col = lambda i, j: (i, 0)       # noqa: E731
            frames_axis = []
            in_specs = []
            operands = []
            if per_bond_normal:
                nrm = tuple(jnp.take(p, idx["mol"], axis=1)
                            for p in (normal[..., 0], normal[..., 1],
                                      normal[..., 2]))
                in_specs += [vspec((bt, nt), tile)] * 3
                operands += list(nrm)
                frames_axis += [True] * 3
            else:
                in_specs.append(vspec((1, 3), lambda i, j: (0, 0)))
                operands.append(normal[None, :])
                frames_axis.append(False)
            for key in ("target", "h1", "h2", "h3")[:1 + nh]:
                for p in cpl:
                    in_specs.append(vspec((bt, nt), tile))
                    operands.append(jnp.take(p, idx[key], axis=1))
                    frames_axis.append(True)
            in_specs += [vspec((bt, 1), col)] * 4
            operands += [bx, by, bz, mask]
            frames_axis += [True] * 4
            if with_leaflets:
                cls = jnp.take(leaflet_classes, idx["mol"],
                               axis=1).astype(jnp.float32)
                in_specs.append(vspec((bt, nt), tile))
                operands.append(cls)
                frames_axis.append(True)
            for oh in onehots:
                in_specs.append(vspec((nt, _TP), lambda i, j: (j, 0)))
                operands.append(oh)
                frames_axis.append(False)

            kernel = functools.partial(
                _ua_kernel, category=cat, handle_pbc=handle_pbc,
                per_bond_normal=per_bond_normal,
                with_leaflets=with_leaflets, n_onehot=K)
            out_spec = vspec((bt, _TP), col)
            call = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=[out_spec] * n_out,
                out_shape=[jax.ShapeDtypeStruct((B_loc, _TP), jnp.float32)
                           ] * n_out,
                interpret=interpret,
            )
            if n_shards > 1:
                from jax.sharding import PartitionSpec as P

                from .pallas_p2 import shard_map_compat

                pspecs = tuple(P("frames") if fa else P()
                               for fa in frames_axis)
                outs = shard_map_compat(
                    lambda *ops, c=call: tuple(c(*ops)), mesh, pspecs,
                    (P("frames"),) * n_out)(*operands)
            else:
                outs = call(*operands)
            total = list(outs) if total is None else [
                a + b for a, b in zip(total, outs)]

        def pack(rows):
            return jnp.stack([r[:, :n_types] for r in rows],
                             axis=1)                         # (B, 4, T)

        if with_leaflets:
            return {"total": pack(total[0:4]), "upper": pack(total[4:8]),
                    "lower": pack(total[8:12])}, None
        return {"total": pack(total)}, None

    return impl
