"""Per-mode drivers (AA/CG bond-based and UA) plus the sharded map-reduce
entry points (run_analysis_partial / merge_partial_states).

Split out of analysis.py (round 5); the equivalent of the reference's
Analysis::run() dispatch (src/analysis/mod.rs:31-49) and
traj_iter_map_reduce (SURVEY.md §2.7)."""

from __future__ import annotations

import logging
from typing import List

import numpy as np

from ..core.order import OrderAccumulator, make_order_step
from ..errors import AnalysisError
from ..input.config import Analysis
from ..io.traj import Trajectory
from ..results.model import AnalysisResults
from ..select import select_mask
from ..system import System
from ..topology.classify import MoleculeKind
from .batches import _effective_batch_size, _run_batches
from .convert import convert_results, convert_results_ua
from .leaflet_runtime import build_leaflet_runtime
from .normals_runtime import _build_normals, _make_molecule_inside
from .prepare import (
    _build_atom_space,
    _empty_results,
    _prepare_bond_kinds,
    _prepare_geometry,
    _prepare_ua_kinds,
    load_structure,
)

log = logging.getLogger("gorder")

def run_analysis(analysis: Analysis) -> AnalysisResults:
    from ..parallel import context as mesh_context
    from ..utils.timers import profiled_run, timers

    mesh = mesh_context.activate(_effective_batch_size())
    if mesh is not None:
        log.info("data-parallel over %d devices ('frames' mesh)",
                 mesh.devices.size)
    try:
        with profiled_run():
            if analysis.analysis_type.kind in ("cg", "aa"):
                results = _run_bond_based(analysis)
            else:
                results = _run_ua(analysis)
    finally:
        mesh_context.deactivate()
    log.info("phase times: %s", timers.summary())
    return results


def _run_bond_based(analysis: Analysis, shard=None, as_partial=False):
    from ..core.ordermap import build_map_spec
    from ..utils.timers import timers

    with timers.phase("structure"):
        system = load_structure(analysis)
    with timers.phase("topology"):
        kinds, compiled = _prepare_bond_kinds(system, analysis)
    if not kinds:
        return _empty_results(analysis, system)
    space, remap = _build_atom_space(system, analysis,
                                     [compiled.atom_a, compiled.atom_b])
    axis, normal_vec, normals_rt = _build_normals(system, analysis, kinds,
                                                  compiled.n_molecules,
                                                  remap)
    leaflets = build_leaflet_runtime(system, analysis, kinds,
                                     compiled.n_molecules, axis, remap)
    map_spec = (build_map_spec(analysis.map,
                            system.box if analysis.handle_pbc else None)
                if analysis.map is not None else None)
    geom_spec, geom_mode, geom_payload = _prepare_geometry(system, analysis)
    if geom_mode == "selection":
        geom_payload = remap(geom_payload)
    if (normals_rt is not None and normals_rt.collected is not None
            and geom_spec is not None):
        normals_rt.molecule_inside = _make_molecule_inside(
            remap(compiled.atom_a), remap(compiled.atom_b),
            compiled.molecule, compiled.n_molecules, geom_spec,
            analysis.handle_pbc)

    step = make_order_step(
        remap(compiled.atom_a), remap(compiled.atom_b), compiled.bond_type,
        compiled.molecule, compiled.n_types, compiled.n_molecules,
        handle_pbc=analysis.handle_pbc,
        with_leaflets=leaflets is not None,
        normal_mode="per_molecule" if normals_rt is not None else "static",
        map_spec=map_spec, geom_spec=geom_spec,
    )
    with timers.phase("trajectory"):
        accum, traj, frame_indices, map_state, shard_start = _run_batches(
            analysis, system, step,
            normal_vec if normal_vec is not None else np.zeros(3, np.float32),
            compiled.n_types, compiled.n_molecules, space, leaflets,
            map_spec, geom_mode, geom_payload, normals_rt, shard=shard,
            bond_slots=(remap(compiled.atom_a), remap(compiled.atom_b)),
            geom_spec=geom_spec)
    if as_partial:
        return _assemble_partial(analysis, kinds, compiled, accum,
                                 map_state, leaflets, normals_rt,
                                 shard_start, len(frame_indices))
    with timers.phase("convert"):
        results = convert_results(analysis, system, kinds, compiled, accum,
                                  traj, frame_indices, map_spec, map_state)
    _attach_leaflet_data(results, analysis, kinds, leaflets)
    _attach_normals_data(results, analysis, kinds, normals_rt)
    return results


def _attach_normals_data(results, analysis, kinds, normals_rt) -> None:
    if normals_rt is None or normals_rt.collected is None:
        return
    bounds = []
    offset = 0
    for kind in kinds:
        bounds.append((kind.name, offset, offset + kind.n_molecules))
        offset += kind.n_molecules
    results.normals_data = {
        "frames": np.concatenate(normals_rt.collected, axis=0),
        "kinds": bounds,
        "step": analysis.step,
    }


def _attach_leaflet_data(results, analysis, kinds, leaflets) -> None:
    if leaflets is None or leaflets.collect_frames is None:
        return
    bounds = []
    offset = 0
    for kind in kinds:
        bounds.append((kind.name, offset, offset + kind.n_molecules))
        offset += kind.n_molecules
    frames = leaflets.collect_frames
    if leaflets.manual_table is not None and not frames:
        frames = list(leaflets.manual_table)
    results.leaflets_data = {
        "frames": frames,
        "kinds": bounds,
        "step": analysis.step,
        "frequency_n": (leaflets.frequency.n
                        if leaflets.frequency.kind == "every" else 1),
    }
def _run_ua(analysis: Analysis, shard=None, as_partial=False):
    from ..core.ua import make_ua_step
    from ..utils.timers import timers

    with timers.phase("structure"):
        system = load_structure(analysis)
    kinds, compiled = _prepare_ua_kinds(system, analysis)
    if not kinds or compiled is None:
        return _empty_results(analysis, system)
    for k, kind in enumerate(kinds):
        log.info("molecule type %s: %d molecules, %d analyzable atoms",
                 kind.name, kind.n_molecules, len(compiled.atom_specs[k]))

    ua_atom_arrays = [d[k] for d in compiled.categories.values()
                      for k in ("target", "h1", "h2", "h3") if k in d]
    space, remap = _build_atom_space(system, analysis, ua_atom_arrays)
    axis, normal_vec, normals_rt = _build_normals(system, analysis, kinds,
                                                  compiled.n_molecules,
                                                  remap)
    leaflets = build_leaflet_runtime(system, analysis, kinds,
                                     compiled.n_molecules, axis, remap)
    from ..core.ordermap import build_map_spec

    map_spec = (build_map_spec(analysis.map,
                            system.box if analysis.handle_pbc else None)
                if analysis.map is not None else None)
    geom_spec, geom_mode, geom_payload = _prepare_geometry(system, analysis)
    if geom_mode == "selection":
        geom_payload = remap(geom_payload)
    categories = {
        cat: {k: (remap(v) if k in ("target", "h1", "h2", "h3") else v)
              for k, v in d.items()}
        for cat, d in compiled.categories.items()
    }
    step = make_ua_step(
        categories, compiled.bond_type, compiled.bond_mol,
        compiled.n_types,
        handle_pbc=analysis.handle_pbc,
        with_leaflets=leaflets is not None,
        normal_mode="per_molecule" if normals_rt is not None else "static",
        map_spec=map_spec, geom_spec=geom_spec,
    )
    with timers.phase("trajectory"):
        accum, traj, frame_indices, map_state, shard_start = _run_batches(
            analysis, system, step,
            normal_vec if normal_vec is not None else np.zeros(3, np.float32),
            compiled.n_types, compiled.n_molecules, space, leaflets,
            map_spec, geom_mode, geom_payload, normals_rt, shard=shard)
    if as_partial:
        return _assemble_partial(analysis, kinds, compiled, accum,
                                 map_state, leaflets, normals_rt,
                                 shard_start, len(frame_indices))
    with timers.phase("convert"):
        results = convert_results_ua(analysis, system, kinds, compiled,
                                     accum, traj, frame_indices, map_spec,
                                     map_state)
    _attach_leaflet_data(results, analysis, kinds, leaflets)
    _attach_normals_data(results, analysis, kinds, normals_rt)
    return results
def _fingerprint(analysis: Analysis, kinds, compiled, n_total: int) -> str:
    """Topology + request identity a partial state must share to merge."""
    import json

    return json.dumps({
        "mode": analysis.analysis_type.kind,
        "kinds": [(k.name, int(k.n_molecules)) for k in kinds],
        "n_types": int(compiled.n_types),
        "type_offsets": [int(v) for v in compiled.type_offsets],
        "n_total_frames": int(n_total),
        "step": int(analysis.step),
        "with_leaflets": analysis.leaflets is not None,
        "with_errors": analysis.estimate_error is not None,
        "with_map": analysis.map is not None,
    }, sort_keys=True)


def _assemble_partial(analysis, kinds, compiled, accum, map_state, leaflets,
                      normals_rt, shard_start: int, n_total: int) -> dict:
    """Raw shard state: exact int64 sums plus every per-frame series
    indexed by global analyzed-frame ordinals (docs/SCALING.md)."""
    state = {
        "fingerprint": _fingerprint(analysis, kinds, compiled, n_total),
        "shard_start": int(shard_start),
        "n_shard_frames": int(accum.n_frames),
        "classes": list(accum.classes),
    }
    for cls in accum.classes:
        state[f"sums_{cls}"] = accum.sums[cls]
        state[f"counts_{cls}"] = accum.counts[cls]
        if accum.keep_timewise and accum.n_frames:
            tw_sums, tw_counts = accum.timewise(cls)
            state[f"tw_sums_{cls}"] = tw_sums
            state[f"tw_counts_{cls}"] = tw_counts
    if map_state is not None:
        for cls, arr in map_state.items():
            state[f"map_{cls}"] = arr
    if leaflets is not None and leaflets.collect_frames is not None:
        frames = leaflets.collect_frames
        if leaflets.manual_table is not None and not frames \
                and shard_start == 0:
            frames = list(leaflets.manual_table)
        if frames:
            state["leaflet_rows"] = np.stack(
                [np.asarray(f) for f in frames])
    if normals_rt is not None and normals_rt.collected:
        state["normals_rows"] = np.concatenate(normals_rt.collected, axis=0)
    return state


def run_analysis_partial(analysis: Analysis, shard_index: int,
                         shard_count: int) -> dict:
    """Run shard `shard_index` of `shard_count` over a contiguous frame
    block and return its raw partial state (merge with
    `merge_partial_states`). The multi-host form of the reference's
    `traj_iter_map_reduce` (SURVEY.md §2.7): each host/process owns a
    frame block; states merge exactly."""
    from ..parallel import context as mesh_context
    from ..utils.timers import profiled_run, timers

    if not (0 <= shard_index < shard_count):
        raise AnalysisError(
            f"invalid shard {shard_index}/{shard_count}")
    mesh_context.activate(_effective_batch_size())
    try:
        with profiled_run():
            if analysis.analysis_type.kind in ("cg", "aa"):
                state = _run_bond_based(analysis,
                                        shard=(shard_index, shard_count),
                                        as_partial=True)
            else:
                state = _run_ua(analysis, shard=(shard_index, shard_count),
                                as_partial=True)
    finally:
        mesh_context.deactivate()
    log.info("phase times: %s", timers.summary())
    return state


def merge_partial_states(analysis: Analysis, states) -> AnalysisResults:
    """Merge shard states into full results — bit-identical to a
    single-process run (exact int64 sums; per-frame series reassembled in
    global frame order, the analogue of the reference's interleave merge,
    timewise.rs AddExtend)."""
    from ..core.ordermap import build_map_spec
    from ..utils.timers import timers

    with timers.phase("structure"):
        system = load_structure(analysis)
    if analysis.analysis_type.kind in ("cg", "aa"):
        with timers.phase("topology"):
            kinds, compiled = _prepare_bond_kinds(system, analysis)
        ua_mode = False
    else:
        kinds, compiled = _prepare_ua_kinds(system, analysis)
        ua_mode = True
    if not kinds or compiled is None:
        return _empty_results(analysis, system)

    traj = Trajectory(analysis.trajectory, expected_atoms=system.n_atoms)
    frame_indices = traj.select_frames(
        analysis.begin if np.isfinite(analysis.begin) else None,
        analysis.end if np.isfinite(analysis.end) else None,
        analysis.step,
    )
    expected_fp = _fingerprint(analysis, kinds, compiled,
                               len(frame_indices))
    states = sorted(states, key=lambda s: int(s["shard_start"]))
    for s in states:
        if str(s["fingerprint"]) != expected_fp:
            raise AnalysisError(
                "partial state does not match this analysis (different "
                "topology, trajectory window, or request)")
    total = sum(int(s["n_shard_frames"]) for s in states)
    if total != len(frame_indices):
        raise AnalysisError(
            f"partial states cover {total} frames but the analysis "
            f"visits {len(frame_indices)} — shards missing or duplicated")

    classes = tuple(states[0]["classes"])
    keep_tw = analysis.estimate_error is not None
    accum = OrderAccumulator(compiled.n_types, classes,
                             keep_timewise=keep_tw)
    accum.n_frames = total
    for s in states:
        for cls in classes:
            accum.sums[cls] += np.asarray(s[f"sums_{cls}"], np.int64)
            accum.counts[cls] += np.asarray(s[f"counts_{cls}"], np.int64)
            if keep_tw and f"tw_sums_{cls}" in s:
                accum.timewise_sums[cls].append(
                    np.asarray(s[f"tw_sums_{cls}"], np.int64))
                accum.timewise_counts[cls].append(
                    np.asarray(s[f"tw_counts_{cls}"], np.int64))

    map_spec = (build_map_spec(analysis.map,
                            system.box if analysis.handle_pbc else None)
                if analysis.map is not None else None)
    map_state = None
    if map_spec is not None:
        n_seg = compiled.n_types * map_spec.ncells + 1
        map_state = {cls: np.zeros((4, n_seg), np.int64) for cls in classes}
        for s in states:
            for cls in classes:
                if f"map_{cls}" in s:
                    map_state[cls] += np.asarray(s[f"map_{cls}"], np.int64)

    with timers.phase("convert"):
        if ua_mode:
            results = convert_results_ua(analysis, system, kinds, compiled,
                                         accum, traj, frame_indices,
                                         map_spec, map_state)
        else:
            results = convert_results(analysis, system, kinds, compiled,
                                      accum, traj, frame_indices, map_spec,
                                      map_state)

    bounds = []
    offset = 0
    for kind in kinds:
        bounds.append((kind.name, offset, offset + kind.n_molecules))
        offset += kind.n_molecules
    leaflet_rows = [row for s in states if "leaflet_rows" in s
                    for row in np.asarray(s["leaflet_rows"])]
    if leaflet_rows and analysis.leaflets is not None:
        results.leaflets_data = {
            "frames": leaflet_rows,
            "kinds": bounds,
            "step": analysis.step,
            "frequency_n": (analysis.leaflets.frequency.n
                            if analysis.leaflets.frequency.kind == "every"
                            else 1),
        }
    normals_rows = [np.asarray(s["normals_rows"]) for s in states
                    if "normals_rows" in s]
    if normals_rows:
        results.normals_data = {
            "frames": np.concatenate(normals_rows, axis=0),
            "kinds": bounds,
            "step": analysis.step,
        }
    return results
