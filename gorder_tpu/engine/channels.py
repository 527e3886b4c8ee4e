"""Wire-channel planning: which decoder side channels a run rides.

A "channel class" is a run shape whose coordinate consumers can be fed by
decoder-computed side data instead of full per-frame coordinates, making
the run eligible for the compact b7 bond-vector wire while keeping output
BITWISE identical across every wire format:

- pure bond-order runs (no consumers at all)            -> b7
- every-frame global leaflets (decoder COG + heads)     -> b7g / *g kinds
- manual or frequency-gated leaflet classes (host data) -> b7m ("b7p"
  payloads: b7 + host class plane + sparse assignment-frame side-reads)
- individual leaflets / dynamic normals (small atom
  sets shipped as exact int32 aux positions)            -> b7x
- geometry restriction (decoder-evaluated per-bond
  inside-mask bitplane)                                 -> b7geo / *G kinds

Split out of the batch loop (engine/batches.py) in round 5. Reference
behavior: src/analysis/leaflets.rs (classification variants),
src/input/frequency.rs:13-55 (frequency gating), normal.rs:179-199
(heads cloud), geometry.rs (midpoint inside tests).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger("gorder")


@dataclass
class WirePlan:
    wire: str
    wire_cap: int
    corr_cap: int
    esc_cap: int
    n_bonds: int
    wire_bytes: int
    # every-frame global leaflets: decoder-COG channel
    chan_coords: Optional[tuple] = None
    channel_classify: Optional[object] = None
    ch_membrane: Optional[np.ndarray] = None
    ch_heads: Optional[np.ndarray] = None
    ch_axis: int = 2
    # manual / frequency-gated leaflet class plane
    plane_mode: bool = False
    plane_active: bool = False
    plane_sparse: bool = False
    assign_cap: int = 0
    # aux atom side channel (individual leaflets / dynamic normals)
    aux_mode: Optional[Tuple] = None
    aux_active: bool = False
    aux_wire_slots: Optional[np.ndarray] = None
    # decoder geometry mask bitplane
    geo_channel: bool = False


def plan_wire_channels(*, analysis, system, traj, frame_indices, space,
                       step, leaflets, normals, map_spec, geom_mode,
                       geom_spec, bond_slots, n_threads, batch_size,
                       n_out, n_molecules, group_of, n_groups) -> WirePlan:
    """Decide the run's channel class, pick the wire format, and size the
    per-frame payload. See the module docstring for the classes; every
    class is gated on `GORDER_TPU_B7_LEAFLETS` / `GORDER_TPU_GEO_CHANNEL`
    (default on) and falls back to plain coordinate wires when
    ineligible."""
    has_impl = getattr(step, "impl", None) is not None
    b7_env = os.environ.get("GORDER_TPU_B7_LEAFLETS", "1") != "0"

    # b7 (bond-vector differences) is eligible on the pure bond-order
    # path — and, via the decoder's side channels, on the channel classes
    # below; every other run shape consumes absolute coordinates
    pure_bond = (leaflets is None and normals is None and map_spec is None
                 and geom_mode is None and has_impl
                 and bond_slots is not None)

    # Decoder-COG channel class (global method, every-frame frequency,
    # PBC on, XTC input): leaflet classification consumes the decoder's
    # per-frame refined Bai-Breen membrane center on EVERY wire — the
    # b7g wire ships it as a side channel; coordinate wires run the
    # standalone xtc_cog_axis pass — so the printed output is bitwise
    # identical across wire formats. GORDER_TPU_B7_LEAFLETS=0 restores
    # the device-COG path for debugging.
    chan_coords = None          # (classify(coords, cog, box), (slots, axis))
    if (leaflets is not None and analysis.handle_pbc and b7_env
            and traj._all_xtc(frame_indices)):
        chan_coords = leaflets.channel_coords_info()
    leaf_channels = None
    if (not pure_bond and chan_coords is not None and normals is None
            and map_spec is None and geom_mode is None and has_impl
            and bond_slots is not None):
        leaf_channels = leaflets.fused_channel_impl()

    # Host-classes plane class (b7m wire): manual leaflet tables and
    # frequency-gated (`!once` / `!every N`) classification methods never
    # need device coordinates on non-assignment frames — manual classes
    # are pure host data, and frequency-gated classes are computed on
    # assignment frames only (1/N of frames, side-read sparsely) and
    # carried between them. These runs ride the b7 bond-vector wire and
    # ship a (B, M) int32 class plane per batch instead of coordinates.
    plane_mode = (
        leaflets is not None and normals is None and map_spec is None
        and geom_mode is None and leaf_channels is None and has_impl
        and bond_slots is not None and b7_env
        and leaflets.plane_eligible())

    # Aux-channel class (b7x wire): every coordinate consumer of this run
    # needs only a small atom set — individual leaflet classification
    # (heads + methyls) and/or dynamic membrane normals (the NormalHeads
    # cloud) at every-frame frequency with no collection. The decoder
    # ships those atoms' exact int32 positions as a side channel
    # (native/xdr.cpp emit_channels); dequantized f32(int)·inv_precision
    # they are bit-identical to a full-coordinate gather, so output
    # matches the coordinate wires byte-for-byte.
    aux_mode = None     # (aux_slots i32, aux_classify_impl, aux_normals_impl)
    if (map_spec is None and geom_mode is None and has_impl
            and bond_slots is not None and not pure_bond
            and leaf_channels is None and not plane_mode and b7_env):
        aux_atoms = []
        cl_rebuild = nr_rebuild = None
        eligible = True
        if leaflets is not None:
            info = (getattr(leaflets.classify, "aux_info", None)
                    if leaflets.fused_classify_impl(ignore_collect=True)
                    is not None
                    and leaflets.cloud_to_mol is None else None)
            if info is None:
                eligible = False
            else:
                aux_atoms.append(info["atoms"])
                cl_rebuild = info["rebuild"]
        if normals is not None:
            info = (getattr(normals.compute, "aux_info", None)
                    if normals.fused_impl(ignore_collect=True) is not None
                    else None)
            if info is None:
                eligible = False
            else:
                aux_atoms.append(info["atoms"])
                nr_rebuild = info["rebuild"]
        if eligible and aux_atoms:
            aux_union = np.unique(
                np.concatenate(aux_atoms)).astype(np.int64)
            _pos_lut = np.full(n_out, -1, np.int64)
            _pos_lut[aux_union] = np.arange(len(aux_union))

            def _aux_pos_of(idx):
                out = _pos_lut[np.asarray(idx, np.int64)]
                if (out < 0).any():  # pragma: no cover - internal invariant
                    raise AssertionError(
                        "internal error: aux consumer index outside the "
                        "aux atom union")
                return out.astype(np.int32)

            aux_classify_impl = aux_normals_impl = None
            if cl_rebuild is not None:
                aux_classify_impl = cl_rebuild(_aux_pos_of).impl
                if leaflets.flip:
                    _inner_aux = aux_classify_impl

                    def aux_classify_impl(aux_f, box):
                        return 1 - _inner_aux(aux_f, box)
            if nr_rebuild is not None:
                aux_normals_impl = nr_rebuild(_aux_pos_of).impl
            aux_mode = (aux_union.astype(np.int32), aux_classify_impl,
                        aux_normals_impl)

    # Decoder geometry channel class (b7geo / *G kinds): pure
    # geometry-restricted runs consume ONE decoder-evaluated per-bond
    # inside-mask bitplane on every wire (io/traj.py read_geo_mask) —
    # output is bitwise identical across wire formats, and the b7
    # bond-vector wire becomes geometry-eligible (the kernel needs only
    # bond vectors + the mask).
    geo_channel = (
        geom_mode is not None and geom_spec is not None
        and leaflets is None and normals is None and map_spec is None
        and has_impl and bond_slots is not None
        and os.environ.get("GORDER_TPU_GEO_CHANNEL", "1") != "0"
        and traj._all_xtc(frame_indices))

    # resolved through the facade so tests/harnesses can monkeypatch
    # gorder_tpu.analysis._pick_wire_format / _measure_link_mbps
    from .. import analysis as _facade

    wire, wire_cap = _facade._pick_wire_format(
        traj, frame_indices, space, n_threads,
        group_of, n_groups, batch_size,
        bond_slots=bond_slots
        if (pure_bond or leaf_channels is not None or plane_mode
            or aux_mode is not None or geo_channel) else None,
        link_mbps=_facade._measure_link_mbps())
    corr_cap = wire_cap if wire == "d8" else 0
    esc_cap = wire_cap if wire in ("s6", "b7") else 0
    n_bonds = len(bond_slots[0]) if bond_slots is not None else 0
    from ..io.native import b7_stride as _b7s
    from ..io.native import geo_stride as _geos
    from ..io.native import i12_stride as _i12s
    from ..io.native import s6_stride as _s6s

    plan = WirePlan(wire=wire, wire_cap=wire_cap, corr_cap=corr_cap,
                    esc_cap=esc_cap, n_bonds=n_bonds, wire_bytes=0,
                    chan_coords=chan_coords, plane_mode=plane_mode,
                    aux_mode=aux_mode, geo_channel=geo_channel)
    if wire == "b7" and leaf_channels is not None:
        plan.channel_classify, (plan.ch_membrane, plan.ch_heads,
                                plan.ch_axis) = leaf_channels
    # class-plane bookkeeping: sparse assignment-frame coordinate reads
    # are needed only for the frequency-gated classification methods
    # (manual tables are pure host data)
    plan.plane_active = plane_mode and wire == "b7"
    plan.plane_sparse = plan.plane_active and leaflets.manual_table is None
    if plan.plane_sparse:
        freq = leaflets.frequency
        plan.assign_cap = 1 if freq.kind == "once" \
            else batch_size // max(freq.n, 1) + 2
    plane_bytes = 0
    if plan.plane_active:
        plane_bytes = n_molecules * 4 \
            + (plan.assign_cap * n_out * 6) // max(batch_size, 1)
    plan.aux_active = aux_mode is not None and wire == "b7"
    plan.aux_wire_slots = aux_mode[0] if plan.aux_active else None

    geo_bytes = _geos(n_bonds) if geo_channel else 0
    plan.wire_bytes = geo_bytes + {
        "b7": _b7s(n_bonds) + esc_cap * 4
        + (len(plan.ch_heads) * 12 + 4 if plan.ch_heads is not None else 0)
        + (len(plan.aux_wire_slots) * 12
           if plan.aux_wire_slots is not None else 0)
        + plane_bytes,
        "s6": _s6s(n_out) + (n_groups + 1) * 6 + esc_cap * 4,
        "d8": n_out * 3 + corr_cap * 6,
        "i12": _i12s(n_out),
        "i16": n_out * 6,
        "f32": n_out * 12,
    }[wire]
    if wire == "b7":
        extra = ""
        if plan.ch_heads is not None:
            extra = f" + {len(plan.ch_heads)}-head leaflet channel"
        elif plan.aux_active:
            extra = f" + {len(plan.aux_wire_slots)}-atom aux channel"
        elif geo_channel:
            extra = " + decoder geometry mask bitplane"
        elif plan.plane_active:
            extra = (" + host leaflet-class plane"
                     + (f" (sparse coords on 1/{leaflets.frequency.n} "
                        f"assignment frames)" if plan.plane_sparse
                        and leaflets.frequency.kind == "every" else ""))
        log.info("wire format: b7 — %d bond vectors (of %d selected atoms)"
                 "%s, %.1f KB/frame", n_bonds, space.n_sel, extra,
                 plan.wire_bytes / 1024)
    else:
        log.info("wire format: %s — %d of %d atoms, %.1f KB/frame",
                 wire, space.n_sel, system.n_atoms,
                 plan.wire_bytes / 1024)
    return plan
