"""Analysis orchestrator: the equivalent of the reference's
`Analysis::run()` + per-mode drivers (src/analysis/mod.rs:31-49,
aaorder.rs/cgorder.rs/uaorder.rs), re-architected for batched TPU execution:

structure+topology ingest → selections → molecule classification →
compiled index tensors → jitted frame-batch kernels → exact host
accumulation → results tree.
"""

from __future__ import annotations

import logging
import os
import sys
import time as _time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from .core.leaflets import (
    make_global_classifier,
    make_individual_classifier,
    make_local_classifier,
)
from .core.order import OrderAccumulator, make_order_step
from .errors import AnalysisError, ConfigError, SelectionError, TopologyError
from .input.config import Analysis, Frequency
from .io import read_bnd, read_gro, read_ndx, read_pdb, read_pqr
from .io.tpr import read_tpr
from .io.traj import AtomSubset, Trajectory, check_box_batch
from .results.model import (
    AnalysisResults,
    AtomDesc,
    AtomResults,
    BondResults,
    MoleculeResults,
    Order,
    OrderCollection,
)
from .select import ensure_elements, query_uses_elements, select_mask
from .system import System
from .topology.classify import (
    CompiledBonds,
    MoleculeKind,
    classify_molecules,
    compile_bonds,
)

log = logging.getLogger("gorder")

def _default_batch_size() -> int:
    """Frames per device execution. Accelerators amortize per-execution
    dispatch/link overhead with large batches; CPU (tests) keeps batches
    small so short fixture trajectories are not mostly padding."""
    env = os.environ.get("GORDER_TPU_BATCH_SIZE")
    if env:
        return int(env)
    import jax

    return 128 if jax.default_backend() == "cpu" else 512


DEFAULT_BATCH_SIZE = None  # resolved lazily (monkeypatchable in tests)


def _configure_jax() -> None:
    """Respect JAX_PLATFORMS even when a PJRT plugin overrode it at import
    time, and enable a per-platform persistent compilation cache so repeated
    runs (CLI invocations, tests, benchmarks) skip compilation.

    The cache is keyed by the effective platform string: executables compiled
    under different backends/flags must never be shared (mixing them produces
    machine-feature mismatches and subtly different float code)."""
    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS")
    try:
        if env_platforms and jax.config.jax_platforms != env_platforms:
            jax.config.update("jax_platforms", env_platforms)
        elif not env_platforms and jax.config.jax_platforms:
            # a preset platform list may name a PJRT plugin that is not
            # registered on this host (tunnel plugins rename between
            # deployments); fall back to auto-discovery instead of dying
            try:
                jax.local_devices()
            except RuntimeError:
                jax.config.update("jax_platforms", "")
    except Exception:
        pass

    key = (env_platforms or jax.config.jax_platforms or "default").replace(
        ",", "-")
    if "cpu" in key:
        # CPU executables are AOT-specialized to host ISA features; a cache
        # written on one sandbox host must not be loaded on another
        # (XLA logs machine-feature mismatches and may SIGILL)
        try:
            sig = []
            with open("/proc/cpuinfo") as f:
                for line in f:
                    # both matter: "flags" carries the ISA extensions and
                    # "model name" drives XLA tuning heuristics such as
                    # prefer-no-scatter/prefer-no-gather
                    if line.startswith(("flags", "model", "stepping",
                                        "cpu family", "vendor_id")):
                        sig.append(line)
                        if len(sig) == 6:
                            break
            if sig:
                import hashlib

                key += "-" + hashlib.sha1(
                    "".join(sorted(sig)).encode()).hexdigest()[:10]
        except OSError:
            pass
    cache_dir = os.environ.get(
        "GORDER_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "gorder_tpu",
                     f"xla-{key}"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:  # cache is an optimization only
        pass


_configure_jax()

_AXIS_INDEX = {"x": 0, "y": 1, "z": 2}
_SCALE = 1.0e6


# ---------------------------------------------------------------- preparation


def load_structure(analysis: Analysis) -> System:
    path = analysis.structure
    ext = os.path.splitext(path)[1].lower()
    if ext == ".tpr":
        system = read_tpr(path)
    elif ext == ".gro":
        system = read_gro(path)
    elif ext == ".pdb":
        system = read_pdb(path)
    elif ext == ".pqr":
        system = read_pqr(path)
    else:
        # wording: src/errors.rs:338-339 (ConfigError::InvalidStructureFormat)
        raise ConfigError(
            f"the provided structure file '{path}' has an unknown, "
            f"invalid, or unsupported format")

    if analysis.bonds is not None:
        read_bnd(analysis.bonds, system)
    elif not system.has_bonds() and ext not in (".tpr",):
        # wording: src/errors.rs:331-332 (ConfigError::NoTopology);
        # raised at structure load like structure.rs:54-88 — a PDB without
        # CONECT or a GRO/PQR without a bonds file has no topology
        raise ConfigError(
            f"the input structure file '{path}' does not contain topology "
            f"information (hint: provide a `bonds` file)")

    if analysis.index is not None:
        read_ndx(analysis.index, system)

    # element guessing only when a query requests it and the structure did
    # not provide elements (structure.rs:202-246)
    queries = [
        q for q in (
            analysis.analysis_type.heavy_atoms,
            analysis.analysis_type.hydrogens,
            analysis.analysis_type.beads,
            analysis.analysis_type.saturated,
            analysis.analysis_type.unsaturated,
            analysis.analysis_type.ignore,
            analysis.leaflets.membrane if analysis.leaflets else None,
            analysis.leaflets.heads if analysis.leaflets else None,
            analysis.leaflets.methyls if analysis.leaflets else None,
            analysis.membrane_normal.heads,
            analysis.geometry.reference
            if analysis.geometry is not None
            and isinstance(analysis.geometry.reference, str) else None,
        ) if q
    ]
    if any(query_uses_elements(q) for q in queries):
        ensure_elements(system)
    return system


@dataclass
class LeafletRuntime:
    """Per-batch leaflet assignment with frequency gating."""

    classify = None                  # device fn or None (manual table)
    frequency: Frequency = None
    manual_table: Optional[np.ndarray] = None   # (n_assignment_frames, M)
    manual_source: str = "manual"               # 'manual' | 'ndx'
    carried: Optional[np.ndarray] = None        # (M,) last assignment
    n_molecules: int = 0
    collect_frames: Optional[List[np.ndarray]] = None  # per assignment frame
    kinds: Optional[List[MoleculeKind]] = None
    flip: bool = False
    orienter = None   # SpectralOrienter: raw cluster labels → leaflets
    # clustering methods classify every atom matching the heads query (the
    # reference's ClusterHeads group spans the whole system, not just the
    # analyzed molecules); this maps cloud positions → analyzed molecules
    cloud_to_mol: Optional[np.ndarray] = None
    _logged_stats: bool = False

    def _log_first_stats(self, classes: np.ndarray) -> None:
        """First-assignment-frame leaflet populations
        (reference: topology/mod.rs:178-225)."""
        if self._logged_stats or self.kinds is None:
            return
        self._logged_stats = True
        offset = 0
        for kind in self.kinds:
            chunk = classes[offset:offset + kind.n_molecules]
            log.info(
                "leaflet assignment (first frame): %s: %d upper, %d lower",
                kind.name, int((chunk == 0).sum()), int((chunk == 1).sum()))
            offset += kind.n_molecules

    def assignment_source(self, analyzed_idx: np.ndarray) -> np.ndarray:
        if self.frequency.kind == "once":
            return np.zeros_like(analyzed_idx)
        n = self.frequency.n
        return (analyzed_idx // n) * n

    def validate(self, n_analyzed: int) -> None:
        """Manual assignments must cover every assignment frame
        (reference: validate_run, topology/mod.rs:148-155)."""
        if self.manual_table is None:
            return
        if self.frequency.kind == "once":
            expected = 1
        else:
            expected = (n_analyzed + self.frequency.n - 1) // self.frequency.n
        if len(self.manual_table) != expected:
            from .errors import ManualLeafletError, NdxLeafletError

            n = len(self.manual_table)
            freq = self.frequency.describe()
            if self.manual_source == "ndx":
                # wording: src/errors.rs:471-480
                # (NdxLeafletClassificationError::UnexpectedNumberOfNdxFiles)
                raise NdxLeafletError(
                    f"number of ndx files provided ('{n}') is not "
                    f"consistent with the number of analyzed frames "
                    f"('{n_analyzed}')\n(leaflet assignment was supposed to "
                    f"be performed {freq}, therefore there should be "
                    f"exactly '{expected}' ndx file(s) provided)")
            # wording: src/errors.rs:512-521
            # (ManualLeafletClassificationError::UnexpectedNumberOfFrames)
            raise ManualLeafletError(
                f"number of frames specified in the leaflet assignment "
                f"structure ('{n}') is not consistent with the number of "
                f"analyzed frames ('{n_analyzed}')\n(leaflet assignment was "
                f"supposed to be performed {freq}, therefore there should "
                f"be exactly '{expected}' frame(s) specified in the leaflet "
                f"assignment structure)")

    def fused_classify_impl(self):
        """Traceable per-batch classification for fused programs, or None
        when the batch path must stay host-visible: carried state
        (frequency > every-frame), manual lookup tables, sequential
        cluster matching (orienter), or collection buffers. Eligible
        methods (global / local / individual at every-frame frequency)
        are pure functions of the batch, so classes never leave the
        device."""
        impl = getattr(self.classify, "impl", None)
        if (impl is None or self.manual_table is not None
                or self.orienter is not None
                or self.collect_frames is not None
                or self.frequency.kind != "every" or self.frequency.n != 1):
            return None
        if self.cloud_to_mol is None and not self.flip:
            return impl
        import jax.numpy as jnp

        from .parallel.context import put_const

        cloud_d = (put_const(np.asarray(self.cloud_to_mol, np.int32))
                   if self.cloud_to_mol is not None else None)
        flip = self.flip

        def wrapped(coords, box_diag):
            classes = impl(coords, box_diag)
            if cloud_d is not None:
                classes = jnp.take(classes, cloud_d, axis=1)
            if flip:
                classes = 1 - classes
            return classes

        return wrapped

    def fused_channel_impl(self):
        """(traceable (heads, cog, box) -> classes, (membrane_slots,
        head_slots, axis)) when this classification can ride the b7
        wire's decoder side channels instead of reconstructed
        coordinates — global method, every-frame frequency, PBC on —
        else None. The channel classes match the coordinate path exactly
        except for the COG itself (host f64-accumulated vs the device's
        f32 sums — both within float noise of the reference's f64 Rust
        computation, and heads sit nm away from the center plane)."""
        if self.fused_classify_impl() is None:
            return None
        ch = getattr(self.classify, "channel_impl", None)
        info = getattr(self.classify, "channel_info", None)
        if ch is None or info is None:
            return None
        membrane, heads, axis, handle_pbc = info
        if not handle_pbc or self.cloud_to_mol is not None:
            return None
        if self.flip:
            inner = ch

            def ch(heads_f, cog, box):          # noqa: F811
                return 1 - inner(heads_f, cog, box)

        return ch, (np.asarray(membrane, np.int32),
                    np.asarray(heads, np.int32), int(axis))

    def channel_coords_info(self):
        """(flip-wrapped traceable (coords, cog, box) -> classes,
        (membrane_slots, axis)) when this run's classification is in the
        decoder-COG channel class — global method, every-frame frequency,
        PBC on — else None. Unlike fused_channel_impl, collection does
        NOT disqualify: collect runs classify through classes_for_batch
        but must compare against the same per-frame COG, or an export run
        could differ from its non-export twin within float noise."""
        if (self.manual_table is not None or self.orienter is not None
                or self.cloud_to_mol is not None
                or self.frequency.kind != "every" or self.frequency.n != 1):
            return None
        ch = getattr(self.classify, "channel_coords_impl", None)
        info = getattr(self.classify, "channel_info", None)
        if ch is None or info is None:
            return None
        membrane, heads, axis, handle_pbc = info
        if not handle_pbc:
            return None
        if self.flip:
            inner = ch

            def ch(coords, cog, box):           # noqa: F811
                return 1 - inner(coords, cog, box)

        return ch, (np.asarray(membrane, np.int32), int(axis))

    def _channel_classify_host(self, coords_dev, cog, box_dev):
        """Raw (unflipped) channel classification for the host-visible
        path (classes_for_batch applies flip/collect itself)."""
        if getattr(self, "_channel_jit", None) is None:
            import jax

            self._channel_jit = jax.jit(self.classify.channel_coords_impl)
        # the (B,) cog goes in as numpy: jit commits it; pre-sharding it
        # with put_frames would reject short batches (frame-0 stats) on a
        # device mesh
        return np.asarray(self._channel_jit(
            coords_dev, np.asarray(cog, np.float32), box_dev))

    def classes_for_batch(self, coords_dev, box_dev, analyzed_idx: np.ndarray,
                          channel_cog: Optional[np.ndarray] = None
                          ) -> np.ndarray:
        """(B, M) leaflet classes for the analyzed frames of the batch.

        With channel_cog (decoder-COG channel class, see
        channel_coords_info), classification compares against the
        decoder's per-frame Bai-Breen center instead of a device-computed
        one — keeping host-visible paths (collection) bitwise consistent
        with the fused channel paths."""
        src = self.assignment_source(analyzed_idx)
        is_assign = src == analyzed_idx
        if self.manual_table is not None:
            if self.frequency.kind == "once":
                table_idx = np.zeros_like(src)
            else:
                table_idx = src // self.frequency.n
            classes = self.manual_table[table_idx]
        else:
            batch_start = analyzed_idx[0]
            if channel_cog is not None:
                assigned = self._channel_classify_host(coords_dev,
                                                       channel_cog, box_dev)
            else:
                assigned = np.asarray(self.classify(coords_dev, box_dev))
            if self.orienter is not None:
                # cluster identities are resolved sequentially per
                # assignment frame (clustering.rs classify_by_match)
                assigned = assigned.copy()
                for i in np.nonzero(is_assign)[0]:
                    assigned[i] = self.orienter.orient(assigned[i])
            in_batch = src >= batch_start
            local = np.clip(src - batch_start, 0, len(analyzed_idx) - 1)
            classes = np.where(
                in_batch[:, None], assigned[local],
                (self.carried if self.carried is not None
                 else assigned[0])[None, :],
            )
            # update carried state with the last assignment frame <= batch end
            if is_assign.any():
                last = np.nonzero(is_assign)[0][-1]
                self.carried = assigned[last]
        if self.cloud_to_mol is not None:
            classes = classes[:, self.cloud_to_mol]
        if self.flip:
            classes = 1 - classes
        if self.collect_frames is not None:
            for i in np.nonzero(is_assign)[0]:
                self.collect_frames.append(classes[i].copy())
        if not self._logged_stats and len(classes):
            self._log_first_stats(np.asarray(classes[0]))
        return classes.astype(np.int32)


def _build_atom_space(system: System, analysis: Analysis, index_arrays):
    """Union of every atom the device pipeline gathers → compact wire
    subset + index remap.

    The TPU equivalent of the reference's Master group ("only the necessary
    atoms are read from XTC", src/analysis/common.rs:62-105, 283-304): the
    decoder ships exactly these atoms, in compact slot order, and every
    device-side index tensor is remapped into slot space."""
    n = system.n_atoms
    mask = np.zeros(n, bool)
    for arr in index_arrays:
        a = np.asarray(arr, np.int64).reshape(-1)
        if len(a):
            mask[a] = True
    queries = []
    lf = analysis.leaflets
    if lf is not None:
        if lf.kind in ("global", "local"):
            queries += [lf.membrane, lf.heads]
        elif lf.kind == "individual":
            queries += [lf.heads, lf.methyls]
        elif lf.kind in ("clustering", "spherical"):
            queries.append(lf.heads)
    mn = analysis.membrane_normal
    if mn.kind == "dynamic":
        queries.append(mn.heads)
    g = analysis.geometry
    if g is not None and isinstance(g.reference, str):
        queries.append(g.reference)
    for q in queries:
        if q:
            mask |= select_mask(system, q)
    sel = np.nonzero(mask)[0]
    # pad the wire width so near-identical configs share compiled shapes
    n_out = min(n, ((len(sel) + 255) // 256) * 256)
    subset = AtomSubset.from_indices(sel, n_out=max(n_out, len(sel)))
    slots = np.full(n, -1, np.int64)
    slots[sel] = np.arange(len(sel))

    def remap(idx):
        idx = np.asarray(idx)
        out = slots[idx.reshape(-1)].reshape(idx.shape)
        if (out < 0).any():  # pragma: no cover - internal invariant
            raise AssertionError(
                "internal error: device index outside the wire atom subset")
        return out.astype(np.int32)

    return subset, remap


# yaml field + section for each reference group name — common.rs:36-58
# get_hint; drives the EmptyGroup diagnostic below
_GROUP_HINTS = {
    "HeavyAtoms": ("heavy_atoms", "analysis_type"),
    "Hydrogens": ("hydrogens", "analysis_type"),
    "Beads": ("beads", "analysis_type"),
    "Membrane": ("membrane", "leaflets"),
    "Heads": ("heads", "leaflets"),
    "NormalHeads": ("heads", "membrane_normal"),
    "ClusterHeads": ("heads", "leaflets"),
    "Methyls": ("methyls", "leaflets"),
    "GeomReference": ("reference", "geometry"),
    "Saturated": ("saturated", "analysis_type"),
    "Unsaturated": ("unsaturated", "analysis_type"),
    "Ignore": ("ignore", "analysis_type"),
}


def _empty_group_error(group: str) -> TopologyError:
    """wording: src/errors.rs:65-66 (TopologyError::EmptyGroup) with the
    hint table of common.rs:36-58 get_hint."""
    if group in _GROUP_HINTS:
        yaml_name, yaml_type = _GROUP_HINTS[group]
        hint = (f"the query specified for '{yaml_name}' inside "
                f"'{yaml_type}' selects no atoms; is the query correct?")
    else:
        hint = "a query specifying the group selects no atoms"
    return TopologyError(f"group '{group}' is empty (hint: {hint})")


def _overlap_error(n: int, name1: str, query1: str, name2: str,
                   query2: str) -> TopologyError:
    """wording: src/errors.rs:68-76 (TopologyError::AtomsOverlap)."""
    return TopologyError(
        f"{n} atoms are part of both '{name1}' (query: '{query1}') and "
        f"'{name2}' (query: '{query2}')")


def _single_atom_per_molecule(system: System, kinds: List[MoleculeKind],
                              query: str, what: str) -> np.ndarray:
    """One atom index per molecule instance (e.g. leaflet head), ordered by
    global molecule id. Errors when a molecule has 0 or >1 matches."""
    mask = select_mask(system, query)
    heads = []
    for kind in kinds:
        rel = [r for r in range(kind.n_atoms_per_molecule)
               if mask[kind.min_indices[0] + r]]
        if len(rel) > 1:
            # wording: src/errors.rs:78-80 (TopologyError::MultipleHeads);
            # the index is the molecule's first atom (leaflets.rs
            # get_reference_head)
            raise TopologyError(
                f"molecule starting with atom index "
                f"'{kind.min_indices[0]}' contains multiple head group "
                f"atoms")
        if len(rel) == 0:
            # wording: src/errors.rs:82-84 (TopologyError::NoHead)
            raise TopologyError(
                f"molecule starting with atom index "
                f"'{kind.min_indices[0]}' contains no head group atom")
        heads.append(np.asarray(kind.min_indices, np.int64) + rel[0])
    return np.concatenate(heads) if heads else np.zeros(0, np.int64)


def _atoms_per_molecule(system: System, kinds: List[MoleculeKind],
                        query: str, what: str
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """(atom_indices, molecule_ids) for ≥1-per-molecule selections
    (e.g. methyls)."""
    mask = select_mask(system, query)
    atoms, mols = [], []
    mol_offset = 0
    for kind in kinds:
        rel = [r for r in range(kind.n_atoms_per_molecule)
               if mask[kind.min_indices[0] + r]]
        if len(rel) == 0:
            # wording: src/errors.rs:86-88 (TopologyError::NoMethyl)
            raise TopologyError(
                f"molecule starting with atom index "
                f"'{kind.min_indices[0]}' contains no methyl group atom")
        for m, min_idx in enumerate(kind.min_indices):
            for r in rel:
                atoms.append(min_idx + r)
                mols.append(mol_offset + m)
        mol_offset += kind.n_molecules
    return np.asarray(atoms, np.int64), np.asarray(mols, np.int64)


def _require_cluster_atoms(n_atoms: int) -> None:
    """Clustering needs at least two head atoms
    (leaflets.rs:103-113 NotEnoughAtomsToCluster)."""
    if n_atoms < 2:
        raise TopologyError(
            f"clustering leaflet classification has been requested but "
            f"only '{n_atoms}' headgroup atom has been provided; need at "
            f"least '2' atoms")


def _cluster_head_cloud(system: System, kinds: List[MoleculeKind],
                        query: str):
    """Clustering operates on EVERY atom matching the heads query — the
    reference's ClusterHeads group spans the whole system (clustering.rs
    create_similarity_matrix iterates the raw group) — while each analyzed
    molecule is assigned the cluster of its own head. Returns
    (cloud_atom_indices, position_of_each_analyzed_molecule's_head)."""
    cloud = np.nonzero(select_mask(system, query))[0].astype(np.int64)
    heads = _single_atom_per_molecule(system, kinds, query, "cluster heads")
    mol_pos = np.searchsorted(cloud, heads)
    if not np.array_equal(cloud[mol_pos], heads):  # pragma: no cover
        raise TopologyError(
            "internal error: analyzed molecule heads missing from the "
            "cluster head cloud")
    return cloud, mol_pos


def build_leaflet_runtime(system: System, analysis: Analysis,
                          kinds: List[MoleculeKind], n_molecules: int,
                          normal_axis: int,
                          remap=None) -> Optional[LeafletRuntime]:
    params = analysis.leaflets
    if params is None:
        return None
    if remap is None:
        remap = lambda idx: idx  # noqa: E731 - identity for direct tests
    axis = normal_axis
    if params.membrane_normal is not None:
        axis = _AXIS_INDEX[params.membrane_normal]

    runtime = LeafletRuntime()
    runtime.frequency = params.frequency
    runtime.n_molecules = n_molecules
    runtime.kinds = kinds
    runtime.flip = params.flip
    if params.collect.enabled:
        runtime.collect_frames = []

    if params.kind in ("global", "local"):
        membrane_mask = select_mask(system, params.membrane)
        if not membrane_mask.any():
            raise _empty_group_error("Membrane")
        membrane_idx = np.nonzero(membrane_mask)[0]
        heads = _single_atom_per_molecule(system, kinds, params.heads,
                                          "leaflet heads")
        if params.kind == "global":
            runtime.classify = make_global_classifier(
                remap(membrane_idx), remap(heads), axis, analysis.handle_pbc)
        else:
            runtime.classify = make_local_classifier(
                remap(membrane_idx), remap(heads), axis, params.radius,
                analysis.handle_pbc)
    elif params.kind == "individual":
        heads = _single_atom_per_molecule(system, kinds, params.heads,
                                          "leaflet heads")
        methyls, methyl_mols = _atoms_per_molecule(system, kinds,
                                                   params.methyls, "methyls")
        runtime.classify = make_individual_classifier(
            remap(heads), remap(methyls), methyl_mols, n_molecules, axis,
            analysis.handle_pbc)
    elif params.kind == "clustering":
        from .core.clustering import SpectralOrienter, make_spectral_labels

        cloud, mol_pos = _cluster_head_cloud(system, kinds, params.heads)
        _require_cluster_atoms(len(cloud))
        runtime.classify = make_spectral_labels(remap(cloud),
                                                analysis.handle_pbc)
        runtime.orienter = SpectralOrienter(cloud)
        runtime.cloud_to_mol = mol_pos
    elif params.kind == "spherical":
        from .core.clustering import make_spherical_classifier

        cloud, mol_pos = _cluster_head_cloud(system, kinds, params.heads)
        _require_cluster_atoms(len(cloud))
        runtime.classify = make_spherical_classifier(remap(cloud),
                                                     analysis.handle_pbc)
        runtime.cloud_to_mol = mol_pos
    elif params.kind in ("from_file", "from_map"):
        if params.kind == "from_file":
            import yaml as _yaml

            from .errors import ManualLeafletError

            try:
                with open(params.file) as fh:
                    assignment = _yaml.safe_load(fh)
            except OSError:
                # wording: src/errors.rs:486-487
                # (ManualLeafletClassificationError::FileNotFound)
                raise ManualLeafletError(
                    f"could not open the leaflet assignment file "
                    f"'{params.file}'") from None
            except _yaml.YAMLError as e:
                # wording: src/errors.rs:489-490
                # (ManualLeafletClassificationError::CouldNotParse)
                raise ManualLeafletError(
                    f"could not understand the contents of the leaflet "
                    f"assignment file '{params.file}' ({e})") from None
        else:
            assignment = params.assignment
        runtime.manual_table = _manual_leaflet_table(assignment, kinds)
    elif params.kind == "from_ndx":
        runtime.manual_table = _ndx_leaflet_table(system, kinds, params)
        runtime.manual_source = "ndx"
    else:
        raise AnalysisError(
            f"leaflet classification method '{params.kind}' is not yet "
            f"supported")
    return runtime


def _manual_leaflet_table(assignment, kinds: List[MoleculeKind]) -> np.ndarray:
    """{moltype: [per-assignment-frame [1/0 or Upper/Lower per molecule]]}
    → (n_assignment_frames, M) classes (0 = upper, 1 = lower)."""
    from .errors import ManualLeafletError

    if not isinstance(assignment, dict):
        raise ManualLeafletError(
            "manual leaflet assignment must map molecule types to per-frame "
            "assignments")

    def to_class(value):
        if value in (1, "1", "Upper", "upper"):
            return 0
        if value in (0, "0", "Lower", "lower"):
            return 1
        raise ManualLeafletError(
            f"invalid leaflet value '{value}' in the manual assignment")

    known = {kind.name for kind in kinds}
    extra = [name for name in assignment if name not in known]
    if extra:
        # wording: src/errors.rs:523-525
        # (ManualLeafletClassificationError::UnknownMoleculeType)
        detected = " ".join(kind.name for kind in kinds)
        raise ManualLeafletError(
            f"molecule type '{extra[0]}' specified in the leaflet "
            f"assignment structure not found in the system (detected "
            f"molecule types are: '{detected}')")

    n_frames = None
    per_kind = []
    for kind in kinds:
        if kind.name not in assignment:
            # wording: src/errors.rs:492-493
            # (ManualLeafletClassificationError::MoleculeTypeNotFound)
            raise ManualLeafletError(
                f"molecule type '{kind.name}' not found in the leaflet "
                f"assignment structure")
        frames = assignment[kind.name]
        if not frames:  # `NAME:` with no value parses as None
            # wording: src/errors.rs:509-510
            # (ManualLeafletClassificationError::EmptyAssignment)
            raise ManualLeafletError(
                f"no leaflet assignment data provided for molecule type "
                f"'{kind.name}'")
        if n_frames is None:
            n_frames = len(frames)
        elif len(frames) != n_frames:
            raise ManualLeafletError(
                "inconsistent number of assignment frames between molecule "
                "types in the manual leaflet assignment")
        rows = []
        for fidx, frame in enumerate(frames):
            if len(frame) != kind.n_molecules:
                # wording: src/errors.rs:500-507
                # (ManualLeafletClassificationError::
                #  InconsistentNumberOfMolecules)
                raise ManualLeafletError(
                    f"inconsistent number of molecules specified in the "
                    f"leaflet assignment: expected '{kind.n_molecules}' "
                    f"molecules of type '{kind.name}', got '{len(frame)}' "
                    f"molecules in assignment frame '{fidx}'")
            rows.append([to_class(v) for v in frame])
        per_kind.append(np.asarray(rows, np.int32))
    if n_frames is None or n_frames == 0:
        raise ManualLeafletError("the manual leaflet assignment is empty")
    return np.concatenate(per_kind, axis=1)


def _ndx_leaflet_table(system: System, kinds: List[MoleculeKind],
                       params) -> np.ndarray:
    """One NDX file per assignment frame; heads in the upper/lower groups
    decide each molecule's leaflet (leaflets.rs FromNdx)."""
    from .errors import NdxLeafletError
    from .io.ndx import parse_ndx

    heads = _single_atom_per_molecule(system, kinds, params.heads,
                                      "leaflet heads")
    rows = []
    for path in params.ndx:
        from .errors import NdxError

        try:
            with open(path) as fh:
                groups = parse_ndx(fh.read(), system.n_atoms, path,
                                   protected=(params.upper_leaflet,
                                              params.lower_leaflet))
        except OSError as e:
            raise NdxLeafletError(
                f"could not read leaflet ndx file '{path}': {e}") from None
        except NdxError as e:
            raise NdxLeafletError(str(e)) from None
        # wording: src/errors.rs:461-463
        # (NdxLeafletClassificationError::GroupNotFound)
        if params.upper_leaflet not in groups:
            raise NdxLeafletError(
                f"group '{params.upper_leaflet}' for selecting "
                f"upper-leaflet molecules was not found in the ndx file "
                f"'{path}'")
        if params.lower_leaflet not in groups:
            raise NdxLeafletError(
                f"group '{params.lower_leaflet}' for selecting "
                f"lower-leaflet molecules was not found in the ndx file "
                f"'{path}'")
        upper = set(groups[params.upper_leaflet].tolist())
        lower = set(groups[params.lower_leaflet].tolist())
        row = np.zeros(len(heads), np.int32)
        for m, head in enumerate(heads):
            # upper is checked first and wins on overlap
            # (leaflets.rs:1152-1170 assign_molecule)
            if int(head) in upper:
                row[m] = 0
            elif int(head) in lower:
                row[m] = 1
            else:
                # wording: src/errors.rs:465-469
                # (NdxLeafletClassificationError::AssignmentNotFound)
                raise NdxLeafletError(
                    f"could not find leaflet assignment for molecule index "
                    f"'{m}' (head index '{int(head)}')\n(hint: head "
                    f"identifier index '{int(head)}' is missing from both "
                    f"specified ndx groups)")
        rows.append(row)
    if not rows:
        raise NdxLeafletError("no ndx files given for leaflet assignment")
    return np.stack(rows)


# ------------------------------------------------------------------- run (CG/AA)


def run_analysis(analysis: Analysis) -> AnalysisResults:
    from .parallel import context as mesh_context
    from .utils.timers import profiled_run, timers

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


def _effective_batch_size() -> int:
    return DEFAULT_BATCH_SIZE if DEFAULT_BATCH_SIZE else _default_batch_size()


def _prepare_bond_kinds(system: System, analysis: Analysis
                        ) -> Tuple[List[MoleculeKind], CompiledBonds]:
    at = analysis.analysis_type
    if at.kind == "cg":
        beads = select_mask(system, at.beads)
        if not beads.any():
            raise _empty_group_error("Beads")
        kinds = classify_molecules(system, beads, mode="bonds")
    else:
        heavy = select_mask(system, at.heavy_atoms)
        hydrogens = select_mask(system, at.hydrogens)
        if not heavy.any():
            raise _empty_group_error("HeavyAtoms")
        if not hydrogens.any():
            raise _empty_group_error("Hydrogens")
        overlap = heavy & hydrogens
        if overlap.any():
            raise _overlap_error(int(overlap.sum()), "HeavyAtoms",
                                 at.heavy_atoms, "Hydrogens", at.hydrogens)
        kinds = classify_molecules(system, heavy, hydrogens, mode="bonds")

    for kind in kinds:
        log.info("molecule type %s: %d molecules, %d bond types",
                 kind.name, kind.n_molecules, kind.n_bond_types)
    return kinds, (compile_bonds(kinds) if kinds else None)


def _empty_results(analysis: Analysis, system: System) -> AnalysisResults:
    """Atoms matched but nothing is analyzable: the reference finishes
    successfully with empty results and writes no output files
    (tests_cg.rs test_cg_order_no_molecules,
    tests_ua.rs test_ua_order_nothing_to_analyze)."""
    log.warning("no molecules to analyze — writing no output")
    return AnalysisResults(
        mode=analysis.analysis_type.kind,
        average_order=OrderCollection(),
        molecules=[],
        n_analyzed_frames=0,
        structure_path=str(analysis.structure),
        trajectory_paths=[str(t) for t in analysis.trajectory],
        analysis=analysis,
    )


@dataclass
class NormalsRuntime:
    """Per-batch membrane normals (dynamic PCA or manual tables)."""

    mode: str                     # 'dynamic' | 'manual'
    compute = None                # device fn (dynamic)
    table: Optional[np.ndarray] = None    # (F, M, 3) manual normals
    collected: Optional[List[np.ndarray]] = None
    # geometry-restricted runs: (coords, box, geom_ref) → (B, M) bool,
    # True when ≥1 bond of the molecule lies inside the region. The
    # reference computes normals lazily per requesting bond
    # (normal.rs OnceCell), so molecules with no analyzed bond export NaN.
    molecule_inside = None

    def validate(self, n_analyzed: int) -> None:
        from .errors import ManualNormalError

        if self.mode == "manual" and len(self.table) != n_analyzed:
            # wording: src/errors.rs:226-228
            # (ManualNormalError::UnexpectedNumberOfFrames)
            raise ManualNormalError(
                f"number of frames specified in the normals structure "
                f"('{len(self.table)}') is not consistent with the number "
                f"of analyzed frames ('{n_analyzed}')")

    def _collect(self, values: np.ndarray, coords_f32, box_dev, geom_ref):
        if self.molecule_inside is not None and geom_ref is not None:
            keep = np.asarray(
                self.molecule_inside(coords_f32, box_dev, geom_ref)
            )[:len(values)]
            values = values.copy()
            values[~keep] = np.nan
        self.collected.append(values)

    def fused_impl(self):
        """Traceable per-batch normal computation for fused programs, or
        None when the batch path must stay host-visible (manual tables,
        collection buffers). The dynamic PCA is a pure function of the
        batch; the ≥3-points validation moves to a device-computed
        min-count guard checked when results drain (same error, possibly
        a few batches later)."""
        impl = getattr(self.compute, "impl", None)
        if impl is None or self.mode != "dynamic" or \
                self.collected is not None:
            return None
        return impl

    def normals_for_batch(self, coords_f32, box_dev,
                          analyzed_idx: np.ndarray, batch_size: int,
                          geom_ref=None):
        from .errors import DynamicNormalError

        if self.mode == "manual":
            n_valid = len(analyzed_idx)
            out = np.zeros((batch_size,) + self.table.shape[1:], np.float32)
            out[:n_valid] = self.table[analyzed_idx]
            normals = out
            if self.collected is not None:
                self._collect(np.array(self.table[analyzed_idx]),
                              coords_f32, box_dev, geom_ref)
            return normals
        normals, counts = self.compute(coords_f32, box_dev)
        n_valid = len(analyzed_idx)
        counts_host = np.asarray(counts[:n_valid])
        if (counts_host < 3).any():
            # wording: src/errors.rs:173-176
            # (DynamicNormalError::NotEnoughPoints)
            got = int(counts_host[counts_host < 3].min())
            raise DynamicNormalError(
                f"not enough points for dynamic local membrane normal "
                f"calculation: got '{got}', need at least '3' points \n"
                f"(hint: try increasing the 'radius' in the "
                f"'membrane_normal' section of your input configuration "
                f"file)")
        if self.collected is not None:
            self._collect(np.asarray(normals[:n_valid]), coords_f32,
                          box_dev, geom_ref)
        return normals


def _make_molecule_inside(atom_a, atom_b, bond_mol, n_molecules: int,
                          geom_spec, handle_pbc: bool):
    """(coords, box_diag, geom_ref) → (B, M) bool: molecule has ≥1 bond
    midpoint inside the geometry region (same midpoint/reference math as
    the order kernel, core/order.py _order_step)."""
    import jax
    import jax.numpy as jnp

    from .core.geometry import inside_mask
    from .core.order import _geometry_reference
    from .core.pbc import min_image

    aa_d = jax.device_put(np.asarray(atom_a, np.int32))
    ab_d = jax.device_put(np.asarray(atom_b, np.int32))
    mol_d = jax.device_put(np.asarray(bond_mol, np.int32))

    @jax.jit
    def fn(coords, box_diag, geom_ref):
        pa = jnp.take(coords, aa_d, axis=1)
        pb = jnp.take(coords, ab_d, axis=1)
        d = pb - pa
        if handle_pbc:
            d = min_image(d, box_diag[:, None, :])
        mid = pa + d * 0.5
        ref = _geometry_reference(coords, box_diag, geom_ref, handle_pbc)
        geo = inside_mask(mid, ref, box_diag, geom_spec,
                          handle_pbc).astype(jnp.float32)
        out = jnp.zeros((coords.shape[0], n_molecules), jnp.float32)
        out = out.at[:, mol_d].max(geo)
        return out > 0

    return fn


def _build_normals(system: System, analysis: Analysis,
                   kinds: List[MoleculeKind], n_molecules: int,
                   remap=None):
    """→ (leaflet_axis, static_vec or None, NormalsRuntime or None)."""
    from .errors import ManualNormalError

    if remap is None:
        remap = lambda idx: idx  # noqa: E731 - identity for direct tests
    mn = analysis.membrane_normal
    if mn.kind == "static":
        axis = _AXIS_INDEX[mn.axis]
        normal_vec = np.zeros(3, np.float32)
        normal_vec[axis] = 1.0
        return axis, normal_vec, None

    # non-static normals: leaflet methods need their own axis
    axis = 2
    if analysis.leaflets is not None and analysis.leaflets.kind in (
            "global", "local", "individual"):
        if analysis.leaflets.membrane_normal is None:
            # wording: src/errors.rs:353-356
            # (ConfigError::MissingMembraneNormal)
            raise ConfigError(
                "static global membrane normal is not used but leaflet "
                "classification requires it\n(hint: add 'membrane_normal' "
                "to the 'leaflets' section of your input configuration "
                "file or, if analyzing a vesicle, \n assign the lipids into "
                "leaflets using the clustering method or manually)")
        axis = _AXIS_INDEX[analysis.leaflets.membrane_normal]

    runtime = NormalsRuntime(mode="dynamic" if mn.kind == "dynamic"
                             else "manual")
    if mn.collect.enabled:
        runtime.collected = []

    if mn.kind == "dynamic":
        from .core.normals import make_dynamic_normals

        heads = _single_atom_per_molecule(system, kinds, mn.heads,
                                          "dynamic membrane normal heads")
        cloud_mask = select_mask(system, mn.heads)
        cloud = np.nonzero(cloud_mask)[0]
        runtime.compute = make_dynamic_normals(remap(heads), remap(cloud),
                                               mn.radius, analysis.handle_pbc)
        return axis, None, runtime

    # manual normals (from file or inline map)
    if mn.kind == "from_file":
        import yaml as _yaml

        try:
            with open(mn.file) as fh:
                mapping = _yaml.safe_load(fh)
        except OSError:
            # wording: src/errors.rs:201-202 (ManualNormalError::FileNotFound)
            raise ManualNormalError(
                f"could not open the normals file '{mn.file}'") from None
        except _yaml.YAMLError as e:
            # wording: src/errors.rs:204-205
            # (ManualNormalError::CouldNotParse)
            raise ManualNormalError(
                f"could not understand the contents of the normals file "
                f"'{mn.file}' ({e})") from None
    else:
        mapping = mn.normals_map
    runtime.table = _manual_normals_table(mapping, kinds)
    return axis, None, runtime


def _manual_normals_table(mapping, kinds: List[MoleculeKind]) -> np.ndarray:
    from .errors import ManualNormalError

    if not isinstance(mapping, dict):
        raise ManualNormalError(
            "manual membrane normals must map molecule types to per-frame "
            "per-molecule vectors")
    known = {kind.name for kind in kinds}
    extra = [name for name in mapping if name not in known]
    if extra:
        # wording: src/errors.rs:222-224
        # (ManualNormalError::UnknownMoleculeType)
        detected = " ".join(kind.name for kind in kinds)
        raise ManualNormalError(
            f"molecule type '{extra[0]}' specified in the normals "
            f"structure not found in the system (detected molecule types "
            f"are: '{detected}')")
    n_frames = None
    per_kind = []
    for kind in kinds:
        if kind.name not in mapping:
            # wording: src/errors.rs:207-208
            # (ManualNormalError::MoleculeTypeNotFound)
            raise ManualNormalError(
                f"molecule type '{kind.name}' not found in the manual "
                f"normals structure")
        frames = mapping[kind.name]
        if not frames:  # `NAME:` with no value parses as None
            # wording: src/errors.rs:210-211 (ManualNormalError::NoNormals)
            raise ManualNormalError(
                f"no membrane normals provided for molecule type "
                f"'{kind.name}'")
        if n_frames is None:
            n_frames = len(frames)
        elif len(frames) != n_frames:
            raise ManualNormalError(
                "inconsistent frame counts between molecule types in the "
                "manual membrane normals")
        rows = []
        for fidx, frame in enumerate(frames):
            if len(frame) != kind.n_molecules:
                # wording: src/errors.rs:213-220
                # (ManualNormalError::InconsistentNumberOfMolecules)
                raise ManualNormalError(
                    f"inconsistent number of molecules specified in the "
                    f"normals structure: expected '{kind.n_molecules}' "
                    f"molecules of type '{kind.name}', got '{len(frame)}' "
                    f"molecules in frame '{fidx}'")
            rows.append(np.asarray(frame, np.float32))
        per_kind.append(np.stack(rows))
    if not n_frames:
        raise ManualNormalError("the manual membrane normals are empty")
    return np.concatenate(per_kind, axis=1)


def _static_normal(analysis: Analysis):
    if analysis.membrane_normal.kind != "static":
        raise AnalysisError(
            "only static membrane normals are supported in this build")
    axis = _AXIS_INDEX[analysis.membrane_normal.axis]
    normal_vec = np.zeros(3, np.float32)
    normal_vec[axis] = 1.0
    return axis, normal_vec


import functools as _functools

# (format, bytes/frame) the most recent _run_batches shipped — benchmark
# observability only, set under the single pipeline-driver thread
_LAST_WIRE = None
# wire bytes the last run actually shipped (observability: paired with the
# timers' 'transfer' seconds this yields the in-trial transfer rate)
_LAST_XFER_BYTES = 0


def _unpack12_impl(p, n):
    """Plain (unjitted) i12 unpack — traceable inline inside a fused
    per-batch program (a nested-jit boundary would block XLA fusion and
    force canonical-layout materialization: measured 6x slower)."""
    import jax.numpy as jnp

    b0 = p[:, 0::3].astype(jnp.int32)
    b1 = p[:, 1::3].astype(jnp.int32)
    b2 = p[:, 2::3].astype(jnp.int32)
    v0 = (b0 | ((b1 & 0xF) << 8))
    v1 = ((b1 >> 4) | (b2 << 4))
    v0 = (v0 ^ 0x800) - 0x800   # sign-extend 12 -> 32 bits
    v1 = (v1 ^ 0x800) - 0x800
    vals = jnp.stack([v0, v1], axis=-1).reshape(p.shape[0], -1)
    return vals[:, :n * 3].reshape(p.shape[0], n, 3).astype(jnp.int16)


def _d8_ints_impl(lo, ci, ch, a0):
    """Temporal-delta wire → (B, n, 3) int32 absolute XTC integers."""
    import jax.numpy as jnp

    b, n, _ = lo.shape
    nv = n * 3
    delta = lo.astype(jnp.int32).reshape(b, nv)
    corr = jnp.zeros((b, nv + 1), jnp.int32)
    corr = corr.at[jnp.arange(b)[:, None], ci].add(
        ch.astype(jnp.int32) << 8, mode="drop")
    delta = delta + corr[:, :nv]
    absr = a0.reshape(1, nv).astype(jnp.int32) + jnp.cumsum(delta, axis=0)
    return absr.reshape(b, n, 3)


def _d8_impl(lo, ci, ch, a0, ip):
    import jax.numpy as jnp

    return _d8_ints_impl(lo, ci, ch, a0).astype(jnp.float32) \
        * ip[:, None, None]


def _s6_ints_impl(pk, gp, vl, bs, gm, vg):
    """Smoothed-base 6-bit wire → (B, n, 3) int32 absolute XTC integers."""
    import jax.numpy as jnp

    b = pk.shape[0]
    trip = pk.reshape(b, -1, 3).astype(jnp.uint32)
    u = trip[..., 0] | (trip[..., 1] << 8) | (trip[..., 2] << 16)
    codes = jnp.stack([u & 63, (u >> 6) & 63, (u >> 12) & 63,
                       (u >> 18) & 63], axis=-1).reshape(b, -1)
    codes = ((codes.astype(jnp.int32) + 32) & 63) - 32  # sign-extend
    nv = vg.shape[0]
    r = codes[:, :nv]
    pos = jnp.cumsum(gp.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(gp == 0, nv, pos)       # gap 0 = padding -> dropped
    r = r.at[jnp.arange(b)[:, None], pos].set(vl.astype(jnp.int32),
                                              mode="drop")
    gmv = jnp.take(gm.astype(jnp.int32), vg, axis=1)
    absr = bs.reshape(1, nv).astype(jnp.int32) + gmv + r
    return absr.reshape(b, nv // 3, 3)


def _s6_impl(pk, gp, vl, bs, gm, vg, ip):
    import jax.numpy as jnp

    return _s6_ints_impl(pk, gp, vl, bs, gm, vg).astype(jnp.float32) \
        * ip[:, None, None]


def _b7_residuals_impl(pk, gp, vl, nv: int):
    """Unpack the b7 wire's escape-applied residuals only: 7-bit codes
    (8 per 7 bytes) sign-extended + the sparse (gap u16, val i16) escape
    channel scattered in → (B, nv) int16 (codes are ±63 and escape values
    i16 by format construction, so int16 is exact). The Pallas resid path
    consumes this directly and adds the base in-kernel; _b7_impl layers
    the base on top for the XLA path."""
    import jax.numpy as jnp

    b = pk.shape[0]
    sep = pk.reshape(b, -1, 7).astype(jnp.uint32)
    lo = (sep[..., 0] | (sep[..., 1] << 8) | (sep[..., 2] << 16)
          | (sep[..., 3] << 24))
    hi = sep[..., 4] | (sep[..., 5] << 8) | (sep[..., 6] << 16)
    codes = jnp.stack([
        lo & 127, (lo >> 7) & 127, (lo >> 14) & 127, (lo >> 21) & 127,
        ((lo >> 28) | (hi << 4)) & 127,
        (hi >> 3) & 127, (hi >> 10) & 127, (hi >> 17) & 127,
    ], axis=-1).reshape(b, -1)
    codes = ((codes.astype(jnp.int16) + 64) & 127) - 64  # sign-extend
    r = codes[:, :nv]
    pos = jnp.cumsum(gp.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(gp == 0, nv, pos)       # gap 0 = padding -> dropped
    return r.at[jnp.arange(b)[:, None], pos].set(vl.astype(jnp.int16),
                                                 mode="drop")


def _b7_impl(pk, gp, vl, bs):
    """Unpack the b7 bond-difference wire (io/traj.py read_frames_b7):
    7-bit residual codes (8 per 7 bytes), sparse gap-coded escapes, plus
    the per-batch base → (B, n_bonds, 3) int32 bond integer differences.
    The caller dequantizes (f32(d) · inv_precision) inside the kernel."""
    import jax.numpy as jnp

    nv = bs.shape[0]
    r = _b7_residuals_impl(pk, gp, vl, nv).astype(jnp.int32)
    b = pk.shape[0]
    return (bs.reshape(1, nv).astype(jnp.int32) + r).reshape(b, nv // 3, 3)


def _dequant_impl(q, s):
    import jax.numpy as jnp

    return q.astype(jnp.float32) * s[:, None, None]


@_functools.lru_cache(maxsize=None)
def _device_codecs():
    """Jit the standalone wire decoders ONCE per process.

    These back the leaflets/normals path (which needs f32 coordinates on
    the device before classification); the hot no-classification path
    instead traces the plain *_impl functions inline into one fused
    per-batch program (see _build_fused_steps). Constructing the jitted
    closures per call would re-trace each time (tens of ms of single-core
    Python per batch — the driver shares that core with the decode
    thread)."""
    import jax

    return (jax.jit(_unpack12_impl, static_argnames=("n",)),
            jax.jit(_d8_impl), jax.jit(_s6_impl), jax.jit(_dequant_impl),
            jax.jit(_d8_ints_impl), jax.jit(_s6_ints_impl))


def _unpack12(packed_u8, first_n: int):
    """Device-side unpack of 12-bit packed XTC integers (io/native.py
    i12 layout: two two's-complement values per 3 bytes) → (B, first_n, 3)
    int16, bit-identical to the int16 decode path."""
    return _device_codecs()[0](packed_u8, first_n)


def _d8_to_f32(lo_i8, corr_idx, corr_hi, abs0, inv_prec):
    """Device-side reconstruction of the temporal-delta wire format
    (io/traj.py read_frames_delta8): scatter the sparse high-bit
    corrections, cumulative-sum the deltas over the batch axis on top of
    the absolute base frame, dequantize. Bit-identical to the host f32
    decode for any XTC integer below 2^24 (both sides perform the same
    f32(int) * inv_precision conversion)."""
    return _device_codecs()[1](lo_i8, corr_idx, corr_hi, abs0, inv_prec)


def _s6_to_f32(pack_u8, esc_gap, esc_val, base, gmean, vgidx, inv_prec):
    """Device-side reconstruction of the smoothed-base 6-bit wire format
    (io/traj.py read_frames_s6): unpack the 6-bit residual codes, scatter
    the sparse escape channel (gap-coded positions), add the per-batch
    base and the gathered per-frame per-group medians, dequantize. No
    cross-frame chain (unlike d8's cumsum), so frames are independent.
    Bit-identical to the host f32 decode."""
    return _device_codecs()[2](pack_u8, esc_gap, esc_val, base, gmean,
                               vgidx, inv_prec)


def _d8_to_int(lo_i8, corr_idx, corr_hi, abs0):
    """Device-side d8 reconstruction stopping at the int32 absolute XTC
    integers — the two-dispatch path keeps integers so the order kernel's
    quantized path takes the single-rounding integer-difference bond
    vectors (bit-identical to the b7 wire and the fused programs)."""
    return _device_codecs()[4](lo_i8, corr_idx, corr_hi, abs0)


def _s6_to_int(pack_u8, esc_gap, esc_val, base, gmean, vgidx):
    """Device-side s6 reconstruction stopping at the int32 absolute XTC
    integers (see _d8_to_int)."""
    return _device_codecs()[5](pack_u8, esc_gap, esc_val, base, gmean,
                               vgidx)


def _wire_groups(system: System, space: AtomSubset):
    """Per-slot residue-group ids for the s6 wire format (padding slots =
    -1 → decode to exact zeros) plus the per-value gather indices into the
    (n_groups+1)-wide gmean table (last group is the always-zero padding
    group)."""
    sel = space.sel if space.sel is not None \
        else np.arange(space.first_n, dtype=np.int64)
    res_ids = np.asarray(system.resids)[sel]
    _, ginv = np.unique(res_ids, return_inverse=True)
    group_of = np.full(space.n_out, -1, np.int32)
    group_of[:len(sel)] = ginv.astype(np.int32)
    n_groups = int(ginv.max()) + 1 if len(sel) else 0
    g_rep = np.repeat(group_of, 3)
    k_rep = np.tile(np.arange(3), space.n_out)
    vgidx = np.where(g_rep >= 0, g_rep * 3 + k_rep,
                     n_groups * 3 + k_rep).astype(np.int32)
    return group_of, n_groups, vgidx


def _dequantize(coords_i16, inv_prec):
    """int16 XTC integers → f32 nm, bit-identical to the host conversion."""
    return _device_codecs()[3](coords_i16, inv_prec)


def _pop_normal_guard(result) -> None:
    """Validate the fused dynamic-normal min-count guard (the ≥3-points
    check of NormalsRuntime.normals_for_batch, deferred to result-drain
    time; wording: src/errors.rs:173-176)."""
    guard = result.pop("_normal_guard", None)
    if guard is None:
        return
    got = float(np.asarray(guard))
    if got < 3:
        from .errors import DynamicNormalError

        raise DynamicNormalError(
            f"not enough points for dynamic local membrane normal "
            f"calculation: got '{int(got)}', need at least '3' points \n"
            f"(hint: try increasing the 'radius' in the "
            f"'membrane_normal' section of your input configuration "
            f"file)")


def _build_fused_steps(step, *, n_out, use_pallas, classify_impl=None,
                       normals_impl=None, channel_classify=None,
                       channel_coords_classify=None):
    """Fused per-batch programs: wire reconstruction traced inline into
    the order kernel, so XLA compiles ONE program per batch.

    The production loop previously dispatched the wire decoder
    (_s6_to_f32 / _d8_to_f32 / _unpack12) and the order step as two
    top-level jits; the boundary between them forces XLA to materialize
    the (B, A, 3) f32 coordinates in canonical layout — measured ~6x
    slower than the fused trace on TPU (14 ms vs 2.2 ms for the s6
    reconstruction at 512×34k).

    With classify_impl (LeafletRuntime.fused_classify_impl: every-frame
    global/local/individual leaflet classification), the classes are
    computed inside the same program and consumed directly by the
    kernel's upper/lower reductions — they never leave the device (the
    two-dispatch path fetches the (B, M) classes to the host and ships
    them back: two tunnel round-trips plus ~0.5 MB of traffic per batch).

    Returns get(kind) -> jitted fn(wire_devs, scale, box, normal, mask,
    map_state, geom_ref) -> (result, map_out), built lazily per payload
    kind (a mid-run wire fallback switches kinds, e.g. s6 -> i16), or
    None when `step` exposes no traceable impl.
    """
    impl = getattr(step, "impl", None)
    if impl is None:
        return None
    import jax
    import jax.numpy as jnp

    def run(coords, box, normal, mask, map_state, geom_ref, inv_scale=None,
            cog=None):
        """Shared tail: optional in-program classification / dynamic
        normals + the kernel. When either consumer is present,
        coordinates are dequantized once up front (the multiply is fused
        either way; traces identically to inv_scale). With `cog` (the
        decoder-COG channel class riding a coordinate wire),
        classification compares against the decoder's per-frame
        Bai-Breen center — the same number the b7g side channel ships —
        so output is bitwise identical across wire formats."""
        classes = guard = None
        cf = coords
        if (classify_impl is not None or normals_impl is not None
                or cog is not None) and inv_scale is not None:
            # f32 view for the coordinate consumers; the kernel keeps the
            # INTEGER coords + inv_scale so its bond vectors take the
            # single-rounding integer-difference path (core/order.py) —
            # XLA fuses the dequantization into each consumer
            cf = coords.astype(jnp.float32) * inv_scale[:, None, None]
        if cog is not None:
            classes = channel_coords_classify(cf, cog, box)
        elif classify_impl is not None:
            classes = classify_impl(cf, box)
        if normals_impl is not None:
            normal, counts = normals_impl(cf, box)
            # min cloud size over the valid frames — the ≥3-points
            # validation, checked host-side when the result drains
            guard = jnp.min(jnp.where(mask[:, None], counts,
                                      jnp.float32(1e9)))
        result, map_out = impl(
            coords, box, normal, mask, leaflet_classes=classes,
            inv_scale=inv_scale, map_state=map_state,
            geom_ref=geom_ref, use_pallas=use_pallas)
        if guard is not None:
            result["_normal_guard"] = guard
        return result, map_out

    def build(kind):
        if kind == "b7":
            assert classify_impl is None, \
                "b7 is gated to pure bond-order runs"
            if use_pallas and getattr(step, "pallas_resid_ok",
                                      lambda: False)():
                # fastest path: escape-applied int16 residuals go straight
                # into the Pallas kernel, which adds the base and
                # dequantizes in VMEM — the (B, N, 3) displacement array
                # never exists in HBM (ops/pallas_p2.py resid_input)
                def fused(w, scale, box, normal, mask, map_state, geom_ref):
                    pk, eg, ev, base = w
                    r = _b7_residuals_impl(pk, eg, ev, base.shape[0])
                    return impl((r, base), box, normal, mask,
                                inv_scale=scale, map_state=None,
                                geom_ref=None, resid_input=True,
                                use_pallas=True)
            else:
                def fused(w, scale, box, normal, mask, map_state, geom_ref):
                    pk, eg, ev, base = w
                    dq = _b7_impl(pk, eg, ev, base)
                    return impl(dq, box, normal, mask, inv_scale=scale,
                                map_state=None, geom_ref=None,
                                diff_input=True, use_pallas=use_pallas)
        elif kind == "b7g":
            assert channel_classify is not None, \
                "b7g requires a leaflet channel classifier"

            def fused(w, scale, box, normal, mask, map_state, geom_ref):
                pk, eg, ev, base, aux, cog = w
                dq = _b7_impl(pk, eg, ev, base)
                # heads dequantize exactly like the coordinate wires:
                # f32(int) * inv_precision — bit-identical gather
                heads = aux.astype(jnp.float32) * scale[:, None, None]
                classes = channel_classify(heads, cog, box)
                return impl(dq, box, normal, mask, leaflet_classes=classes,
                            inv_scale=scale, map_state=None, geom_ref=None,
                            diff_input=True, use_pallas=use_pallas)
        else:
            # coordinate wires, with or without the decoder-COG channel:
            # kinds 's6g'/'d8g'/'i12g'/'i16g'/'f32g' carry a trailing
            # per-frame (B,) f32 COG the channel classifier consumes
            chan = kind.endswith("g")
            base_kind = kind[:-1] if chan else kind
            if chan:
                assert channel_coords_classify is not None, \
                    f"{kind} requires a leaflet channel classifier"

            def recon(w, scale):
                """(coords-or-quant, inv_scale) for the base wire kind —
                integer wires stay INTEGER here so the kernel's quantized
                path takes exact integer bond differences (single
                rounding, bit-identical to b7)."""
                if base_kind == "s6":
                    pk, eg, ev, bs, gm, vg = w
                    return _s6_ints_impl(pk, eg, ev, bs, gm, vg), scale
                if base_kind == "d8":
                    lo, ci, ch, abs0 = w
                    return _d8_ints_impl(lo, ci, ch, abs0), scale
                if base_kind == "i12":
                    (packed,) = w
                    return _unpack12_impl(packed, n_out), scale
                if base_kind == "i16":
                    (quant,) = w
                    return quant, scale
                (coords,) = w                                # f32
                return coords, None

            def fused(w, scale, box, normal, mask, map_state, geom_ref):
                cog = None
                if chan:
                    *w, cog = w
                coords, inv = recon(w, scale)
                return run(coords, box, normal, mask, map_state, geom_ref,
                           inv_scale=inv, cog=cog)
        return jax.jit(fused)

    cache = {}

    def get(kind):
        if kind not in cache:
            cache[kind] = build(kind)
        return cache[kind]

    return get


def _prepare_geometry(system: System, analysis: Analysis):
    """(GeometrySpec, mode, payload) or (None, None, None).
    payload: (3,) point for 'point'/'center' handled per batch, or atom
    indices for per-frame selection COG."""
    from .core.geometry import build_geometry_spec

    spec = build_geometry_spec(analysis.geometry)
    if spec is None:
        return None, None, None
    ref = analysis.geometry.reference
    if ref is None:
        if not analysis.handle_pbc:
            # wording: src/errors.rs:42-43
            # (GeometryConfigError::InvalidBoxCenter)
            raise ConfigError(
                "cannot use dynamic center of simulation box as the "
                "reference position since periodic boundary conditions are "
                "ignored")
        return spec, "center", None
    if isinstance(ref, str):
        mask = select_mask(system, ref)
        if not mask.any():
            raise _empty_group_error("GeomReference")
        return spec, "selection", np.nonzero(mask)[0].astype(np.int32)
    return spec, "point", np.asarray(ref, np.float32)


def _probe_s6(traj, frame_indices, space, group_of, n_groups, n_threads,
              batch_size):
    """Probe the s6 wire format over one batch-sized window (escape demand
    grows with distance from the in-batch base window, so short probes
    under-estimate it). Returns a sized esc_cap or None when unfit."""
    from .io.native import s6_stride

    n = len(frame_indices)
    w = frame_indices[:min(batch_size, n)]
    esc_cap = 512
    for _attempt in range(2):
        pack = np.zeros((len(w), s6_stride(space.n_out)), np.uint8)
        gaps = np.zeros((len(w), esc_cap), np.uint16)
        vals = np.zeros((len(w), esc_cap), np.int16)
        gmean = np.zeros((len(w), (n_groups + 1) * 3), np.int16)
        res, nesc = traj.read_frames_s6(w, space, group_of, n_groups,
                                        pack, gaps, vals, gmean,
                                        n_threads=n_threads)
        if res is not None:
            # headroom for batches the probe did not see (a mid-run
            # overflow falls back to int16 for that batch, so the margin
            # trades certain bytes against a rare 2.4x batch)
            cap = int(nesc * 1.4) + 64
            return max(128, min(8192, (cap + 127) // 128 * 128))
        if nesc <= esc_cap or nesc > 8192:
            return None  # unfit for reasons other than capacity
        esc_cap = min(8192, ((int(nesc * 2) + 127) // 128) * 128)
    return None


def _probe_b7(traj, frame_indices, space, bond_a, bond_b, n_threads,
              batch_size):
    """Probe the b7 bond-difference wire format over one batch-sized
    window. Returns a sized esc_cap or None when unfit."""
    from .io.native import b7_stride

    n = len(frame_indices)
    w = frame_indices[:min(batch_size, n)]
    esc_cap = 512
    for _attempt in range(2):
        pack = np.zeros((len(w), b7_stride(len(bond_a))), np.uint8)
        gaps = np.zeros((len(w), esc_cap), np.uint16)
        vals = np.zeros((len(w), esc_cap), np.int16)
        res, nesc = traj.read_frames_b7(w, space, bond_a, bond_b,
                                        pack, gaps, vals,
                                        n_threads=n_threads)
        if res is not None:
            cap = int(nesc * 1.4) + 64
            return max(128, min(8192, (cap + 127) // 128 * 128))
        if nesc <= esc_cap or nesc > 8192:
            return None  # unfit for reasons other than capacity
        esc_cap = min(8192, ((int(nesc * 2) + 127) // 128) * 128)
    return None


def _measure_link_mbps(size_mb=6):
    """One-shot host→device transfer rate (MB/s) for wire-format selection.
    Costs a single `size_mb` device_put (~10 ms in good weather, ~1.2 s at
    a 5 MB/s slump) once per run. Returns None when it cannot be measured
    (e.g. the CPU backend, where device_put aliases host memory)."""
    import time as _time

    import jax

    try:
        if jax.default_backend() == "cpu":
            return None
        buf = np.random.default_rng(0).integers(
            0, 255, size=(size_mb << 20,), dtype=np.uint8)
        jax.block_until_ready(jax.device_put(buf[: 1 << 18]))  # warm path
        t0 = _time.perf_counter()
        jax.block_until_ready(jax.device_put(buf))
        return size_mb / (_time.perf_counter() - t0)
    except Exception:  # never let a probe failure kill the run
        return None


# Host-side decode+encode throughput of each wire format relative to the
# plain quantized-int16 decode (measured, tools/decode_bench.py on the
# headline AA system; the ratios are set by the residual-coding work on
# top of the shared 3dfc decode and are stable across systems).
_WIRE_HOST_FACTOR = {"b7": 0.80, "s6": 0.55, "d8": 0.75,
                     "i12": 0.90, "i16": 1.00, "f32": 0.85}


def _probe_d8(traj, windows, space, n_threads):
    """d8 eligibility probe: correction capacity (rounded up, with 2×
    headroom for unseen batches) or None when the windows do not fit."""
    corr_cap = 64
    for _attempt in range(2):
        demand = 0
        ok = True
        for w in windows:
            lo = np.zeros((len(w), space.n_out, 3), np.int8)
            ci = np.zeros((len(w), corr_cap), np.int32)
            ch = np.zeros((len(w), corr_cap), np.int16)
            res, ncorr = traj.read_frames_delta8(w, space, lo, ci, ch,
                                                 n_threads=n_threads)
            demand = max(demand, ncorr)
            if res is None:
                ok = False
        if ok:
            # headroom for batches the probe did not see (box wraps vary)
            corr_cap = max(64, min(4096, int(demand * 2) + 32))
            return ((corr_cap + 63) // 64) * 64
        if demand <= corr_cap or demand > 4096:
            return None  # unfit for reasons other than capacity
        corr_cap = min(4096, ((int(demand * 2) + 63) // 64) * 64)
    return None


def _pick_wire_by_rate(traj, frame_indices, space, n_threads, group_of,
                       n_groups, batch_size, bond_slots, link_mbps):
    """Rate-aware wire selection (see _pick_wire_format): maximize the
    modeled end-to-end rate min(host decode+encode f/s, link bytes/s ÷
    bytes/frame) over the eligible formats. Returns (format, cap) or None
    to defer to the bytes-minimizing policy (non-XTC input)."""
    import time as _time

    from .io.native import b7_stride, i12_stride, s6_stride

    n = len(frame_indices)
    anchor = frame_indices[:min(16, n)]
    t0 = _time.perf_counter()
    if traj.read_frames_quantized(anchor, space,
                                  n_threads=n_threads) is None:
        return None  # not uniform-precision XTC; bytes policy handles it
    host_i16 = len(anchor) / max(_time.perf_counter() - t0, 1e-9)

    n_out = space.n_out
    candidates = {"i16": (0, n_out * 6), "f32": (0, n_out * 12)}

    def rate(fmt, bpf):
        return min(host_i16 * _WIRE_HOST_FACTOR[fmt],
                   link_mbps * 1024 * 1024 / bpf)

    # fast-link short-circuit: when the link does not bind even for the
    # plain int16 wire, no compact format can model faster (all their
    # host factors are < 1) — skip their probe decodes entirely
    if rate("i16", candidates["i16"][1]) >= host_i16 * 0.999:
        log.info("wire: i16 (link %.0f MB/s does not bind; host decode "
                 "~%.0f frames/s is the wall)", link_mbps, host_i16)
        return "i16", 0

    nv = n_out * 3
    if bond_slots is not None:
        b7_cap = _probe_b7(traj, frame_indices, space, bond_slots[0],
                           bond_slots[1], n_threads, batch_size)
        if b7_cap is not None:
            nb = len(bond_slots[0])
            candidates["b7"] = (b7_cap, b7_stride(nb) + b7_cap * 4
                                + nb * 12 // max(batch_size, 1))
    if group_of is not None and n_groups > 0:
        esc_cap = _probe_s6(traj, frame_indices, space, group_of, n_groups,
                            n_threads, batch_size)
        if esc_cap is not None:
            candidates["s6"] = (esc_cap,
                                s6_stride(n_out) + (n_groups + 1) * 6
                                + esc_cap * 4 + nv * 4 // max(batch_size, 1))
    windows = [frame_indices[:min(8, n)]]
    if n > 16:
        mid = n // 2
        windows.append(frame_indices[mid:mid + 8])
    d8_cap = _probe_d8(traj, windows, space, n_threads)
    if d8_cap is not None:
        candidates["d8"] = (d8_cap, nv + d8_cap * 6)
    probe_idx = frame_indices[np.unique([0, n // 2, n - 1])]
    if traj.read_frames_packed12(probe_idx, space,
                                 n_threads=n_threads) is not None:
        candidates["i12"] = (0, i12_stride(n_out))

    best = max(candidates.items(),
               key=lambda kv: (rate(kv[0], kv[1][1]), -kv[1][1]))
    fmt, (cap, bpf) = best
    log.info("wire: %s (%.1f KB/frame; link %.0f MB/s -> ceiling %.0f "
             "frames/s, modeled host %.0f frames/s)", fmt, bpf / 1024,
             link_mbps, link_mbps * 1024 * 1024 / bpf,
             host_i16 * _WIRE_HOST_FACTOR[fmt])
    return fmt, cap


def _pick_wire_format(traj, frame_indices, space, n_threads, group_of=None,
                      n_groups=0, batch_size=512, bond_slots=None,
                      link_mbps=None):
    """Probe the most compact coordinate transfer the trajectory supports:
    7-bit bond-vector differences (pure bond-order runs only) → 6-bit
    smoothed-base residuals (~0.77 B/atom·axis) → 8-bit temporal
    deltas → 12-bit packed absolutes → int16 → f32. b7/s6/d8 are compared
    by measured bytes/frame. Returns ('b7', esc_cap) / ('s6', esc_cap) /
    ('d8', corr_cap) / ('i12', 0) / ('i16', 0) / ('f32', 0).

    With `link_mbps` (the measured host→device rate), selection maximizes
    the modeled end-to-end rate min(host_rate, link/bytes) instead of
    minimizing bytes alone: on a fast local link the host's residual
    coding becomes the wall before the wire does, and the plain int16
    decode (~1.25× the b7 decode+recode rate) wins even at 3.2× the
    bytes. On a slow link (< ~270 MB/s for the AA benchmark) bytes still
    dominate and the compact formats win as before. Every format is exact,
    so the choice never changes results (tests/test_io_traj.py)."""
    if link_mbps is not None and not os.environ.get("GORDER_TPU_WIRE"):
        picked = _pick_wire_by_rate(traj, frame_indices, space, n_threads,
                                    group_of, n_groups, batch_size,
                                    bond_slots, link_mbps)
        if picked is not None:
            return picked
    n = len(frame_indices)
    windows = [frame_indices[:min(8, n)]]
    if n > 16:
        mid = n // 2
        windows.append(frame_indices[mid:mid + 8])

    forced = os.environ.get("GORDER_TPU_WIRE", "")
    if bond_slots is not None and forced in ("", "b7"):
        b7_cap = _probe_b7(traj, frame_indices, space, bond_slots[0],
                           bond_slots[1], n_threads, batch_size)
        if b7_cap is not None:
            # b7 ships ~0.875 B per bond value vs s6's ~0.75 B per ATOM
            # value; bonds outnumber atoms only in pathological topologies
            # (every heavy atom bonded to >2 analyzed partners), so when
            # eligible and fit, b7 is the smallest wire — no byte
            # comparison needed beyond the stride check below
            from .io.native import b7_stride, s6_stride

            nb = len(bond_slots[0])
            b7_bytes = b7_stride(nb) + b7_cap * 4 \
                + nb * 12 // max(batch_size, 1)
            s6_bytes_min = s6_stride(space.n_out) + (n_groups + 1) * 6
            if forced == "b7" or b7_bytes < s6_bytes_min:
                return "b7", b7_cap
    if forced == "b7":
        log.warning("GORDER_TPU_WIRE=b7 requested but the run is not "
                    "eligible (non-XTC input, escape overflow, or a "
                    "subsystem needs absolute coordinates); probing the "
                    "coordinate formats instead")
    if forced in ("i12", "i16", "f32"):
        probe_idx = frame_indices[np.unique([0, n // 2, n - 1])]
        if forced == "i12" and traj.read_frames_packed12(
                probe_idx, space, n_threads=n_threads) is not None:
            return "i12", 0
        if forced != "f32" and traj.read_frames_quantized(
                probe_idx, space, n_threads=n_threads) is not None:
            return "i16", 0
        return "f32", 0

    nv = space.n_out * 3
    esc_cap = None
    if group_of is not None and n_groups > 0 and forced in ("", "s6"):
        esc_cap = _probe_s6(traj, frame_indices, space, group_of, n_groups,
                            n_threads, batch_size)
    if forced == "s6":
        if esc_cap is not None:
            return "s6", esc_cap

    d8_cap = None
    if forced in ("", "d8", "s6"):
        d8_cap = _probe_d8(traj, windows, space, n_threads)

    if esc_cap is not None or d8_cap is not None:
        from .io.native import s6_stride

        s6_bytes = (s6_stride(space.n_out) + (n_groups + 1) * 6
                    + esc_cap * 4 + nv * 4 // max(batch_size, 1)) \
            if esc_cap is not None else None
        d8_bytes = (nv + d8_cap * 6) if d8_cap is not None else None
        if s6_bytes is not None and (d8_bytes is None
                                     or s6_bytes < d8_bytes):
            return "s6", esc_cap
        if d8_bytes is not None:
            return "d8", d8_cap

    probe_idx = frame_indices[np.unique([0, n // 2, n - 1])]
    if traj.read_frames_packed12(probe_idx, space,
                                 n_threads=n_threads) is not None:
        return "i12", 0
    if traj.read_frames_quantized(probe_idx, space,
                                  n_threads=n_threads) is not None:
        return "i16", 0
    return "f32", 0


def _shard_block(n_frames: int, shard, align: int):
    """Contiguous frame-ordinal block for shard (i, n), with the block
    start aligned to the leaflet assignment frequency so every shard owns
    the assignment frames its block consumes."""
    i, n = shard
    base = -(-n_frames // n)                 # ceil
    base = -(-base // max(align, 1)) * max(align, 1)
    start = min(i * base, n_frames)
    end = min(start + base, n_frames)
    return start, end


def _run_batches(analysis: Analysis, system: System, step, normal_vec,
                 n_types: int, n_molecules: int, space: AtomSubset,
                 leaflets: Optional[LeafletRuntime], map_spec=None,
                 geom_mode=None, geom_payload=None,
                 normals: Optional[NormalsRuntime] = None,
                 shard=None, bond_slots=None):
    """Shared frame-batch loop: decode → device → kernel → accumulate.

    The decode of batch k+1 runs in a worker thread (the native codec
    releases the GIL) while batch k is transferred and dispatched —
    the TPU-era replacement for the reference's frame-threading. Only the
    atoms in `space` (the Master-group equivalent) are decoded and shipped,
    in the most compact exact wire format the data admits: 8-bit temporal
    deltas with sparse corrections (d8), 12-bit packed, int16, or f32 —
    all bit-identical to the f32 decode after device-side reconstruction.

    `shard=(i, n)` restricts the loop to shard i's contiguous frame block
    (docs/SCALING.md): per-frame state (timewise, collected leaflets and
    normals) is indexed by GLOBAL analyzed-frame ordinals, so partial
    results merge exactly.
    """
    classes = ("total", "upper", "lower") if leaflets else ("total",)
    accum = OrderAccumulator(
        n_types, classes,
        keep_timewise=analysis.estimate_error is not None,
    )

    n_out = space.n_out
    traj = Trajectory(analysis.trajectory, expected_atoms=system.n_atoms)
    frame_indices = traj.select_frames(
        analysis.begin if np.isfinite(analysis.begin) else None,
        analysis.end if np.isfinite(analysis.end) else None,
        analysis.step,
    )
    if len(frame_indices) == 0:
        raise AnalysisError(
            "no trajectory frames are within the specified time range")
    if leaflets is not None:
        leaflets.validate(len(frame_indices))
    if normals is not None:
        normals.validate(len(frame_indices))

    full_frame_indices = frame_indices
    shard_start = 0
    if shard is not None:
        align = 1
        if (leaflets is not None and leaflets.classify is not None
                and leaflets.frequency.kind == "every"):
            align = leaflets.frequency.n
        shard_start, shard_end = _shard_block(len(frame_indices), shard,
                                              align)
        frame_indices = frame_indices[shard_start:shard_end]
        log.info("shard %d/%d: frames %d..%d of %d", shard[0], shard[1],
                 shard_start, shard_end, len(full_frame_indices))
        if len(frame_indices) == 0:
            empty_map = None
            if map_spec is not None:
                n_seg = n_types * map_spec.ncells + 1
                empty_map = {cls: np.zeros((4, n_seg), np.int64)
                             for cls in classes}
            return accum, traj, full_frame_indices, empty_map, shard_start

    import concurrent.futures as cf

    import jax

    from .parallel.context import put_const, put_frames

    # fixed batch size (padded) so every run of a system shares one compile
    batch_size = _effective_batch_size()
    normal_dev = put_const(normal_vec)

    # n_threads maps to decoder threads (frames decode independently); the
    # reference's analysis threading is superseded by device parallelism
    n_threads = max(1, analysis.n_threads)

    if (shard_start > 0 and leaflets is not None
            and leaflets.classify is not None):
        # bootstrap from GLOBAL frame 0: Once-frequency shards inherit its
        # assignment through the carried state, and clustering shards
        # orient against its clusters — the reference's shared
        # reference-clusters design (clustering.rs:66-68) without locks
        c0, b0, _, _ = traj.read_frames(full_frame_indices[:1], space,
                                        n_threads=n_threads)
        box0 = b0[:, [0, 1, 2], [0, 1, 2]]
        assigned0 = np.asarray(leaflets.classify(c0, box0))[0]
        if leaflets.orienter is not None:
            assigned0 = leaflets.orienter.orient(assigned0)
        leaflets.carried = assigned0
        leaflets._logged_stats = True   # frame-0 stats belong to shard 0

    batch_size_probe = _effective_batch_size()
    group_of, n_groups, vgidx = _wire_groups(system, space)
    # b7 (bond-vector differences) is eligible on the pure bond-order
    # path — and, via the decoder's side channels (head positions +
    # per-frame Bai-Breen membrane center), on every-frame global
    # leaflet runs too; every other subsystem consumes absolute
    # coordinates
    pure_bond = (leaflets is None and normals is None and map_spec is None
                 and geom_mode is None
                 and getattr(step, "impl", None) is not None
                 and bond_slots is not None)
    # Decoder-COG channel class (global method, every-frame frequency,
    # PBC on, XTC input): leaflet classification consumes the decoder's
    # per-frame refined Bai-Breen membrane center on EVERY wire — the
    # b7g wire ships it as a side channel; coordinate wires run the
    # standalone xtc_cog_axis pass — so the printed output is bitwise
    # identical across wire formats (this resolved the round-3 carve-out
    # where the b7g host COG differed from the device COG within float
    # noise; the channel wire now defaults ON). GORDER_TPU_B7_LEAFLETS=0
    # restores the device-COG path for debugging.
    chan_coords = None          # (classify(coords, cog, box), (slots, axis))
    if (leaflets is not None and analysis.handle_pbc
            and os.environ.get("GORDER_TPU_B7_LEAFLETS", "1") != "0"
            and traj._all_xtc(frame_indices)):
        chan_coords = leaflets.channel_coords_info()
    leaf_channels = None
    if (not pure_bond and chan_coords is not None and normals is None
            and map_spec is None and geom_mode is None
            and getattr(step, "impl", None) is not None
            and bond_slots is not None):
        leaf_channels = leaflets.fused_channel_impl()
    wire, wire_cap = _pick_wire_format(traj, frame_indices, space, n_threads,
                                       group_of, n_groups, batch_size_probe,
                                       bond_slots=bond_slots
                                       if (pure_bond
                                           or leaf_channels is not None)
                                       else None,
                                       link_mbps=_measure_link_mbps())
    corr_cap = wire_cap if wire == "d8" else 0
    esc_cap = wire_cap if wire in ("s6", "b7") else 0
    n_bonds = len(bond_slots[0]) if bond_slots is not None else 0
    from .io.native import b7_stride as _b7s
    from .io.native import i12_stride as _i12s
    from .io.native import s6_stride as _s6s

    ch_heads = ch_membrane = None
    ch_axis = 2
    channel_classify = None
    if wire == "b7" and leaf_channels is not None:
        channel_classify, (ch_membrane, ch_heads, ch_axis) = leaf_channels
    wire_bytes = {
        "b7": _b7s(n_bonds) + esc_cap * 4
        + (len(ch_heads) * 12 + 4 if ch_heads is not None else 0),
        "s6": _s6s(n_out) + (n_groups + 1) * 6 + esc_cap * 4,
        "d8": n_out * 3 + corr_cap * 6,
        "i12": _i12s(n_out),
        "i16": n_out * 6,
        "f32": n_out * 12,
    }[wire]
    if wire == "b7":
        log.info("wire format: b7 — %d bond vectors (of %d selected atoms)"
                 "%s, %.1f KB/frame", n_bonds, space.n_sel,
                 (f" + {len(ch_heads)}-head leaflet channel"
                  if ch_heads is not None else ""), wire_bytes / 1024)
    else:
        log.info("wire format: %s — %d of %d atoms, %.1f KB/frame",
                 wire, space.n_sel, system.n_atoms, wire_bytes / 1024)
    # observability for harnesses (bench.py reads this after each run to
    # pair the trial's rate with the wire it actually rode)
    global _LAST_WIRE
    _LAST_WIRE = (wire, wire_bytes)

    # per-batch zero map state: batch tile sums are fetched and accumulated
    # in int64 on the host every batch (exact like the order sums; carrying
    # f32 state across the whole run would overflow the 2^24 exact range)
    map_zero = None
    map_accum = None
    if map_spec is not None:
        from .core.ordermap import init_map_state

        map_zero = init_map_state(classes, n_types, map_spec)
        n_seg = n_types * map_spec.ncells + 1
        map_accum = {cls: np.zeros((4, n_seg), np.int64)
                     for cls in classes}

    def drain_map_state(state_out):
        for cls, arr in state_out.items():
            map_accum[cls] += np.asarray(arr).astype(np.int64)

    geom_sel_dev = None
    geom_point = None
    if geom_mode == "selection":
        geom_sel_dev = put_const(np.asarray(geom_payload, np.int32))
    elif geom_mode == "point":
        geom_point = np.asarray(geom_payload, np.float32)

    n_batches = (len(frame_indices) + batch_size - 1) // batch_size
    from .io.native import i12_stride

    # Prefetch ring: the decode worker runs up to `prefetch` batches ahead
    # of the driver, so a transfer slump (tunnel/link weather) never stalls
    # decoding — when the link recovers, the queued batches ship
    # back-to-back and the run degrades by roughly the slump duration, not
    # by a serialized decode×transfer product.
    prefetch = max(2, int(os.environ.get("GORDER_TPU_PREFETCH", "4")))
    prefetch = min(prefetch, max(2, n_batches))
    if wire == "b7":
        from .io.native import b7_stride

        buffers = [
            (np.zeros((batch_size, b7_stride(n_bonds)), np.uint8),
             np.zeros((batch_size, esc_cap), np.uint16),
             np.zeros((batch_size, esc_cap), np.int16))
            + ((np.zeros((batch_size, len(ch_heads), 3), np.int32),
                np.zeros(batch_size, np.float32))
               if ch_heads is not None else ())
            for _ in range(prefetch)
        ]
    elif wire == "s6":
        from .io.native import s6_stride

        buffers = [
            (np.zeros((batch_size, s6_stride(n_out)), np.uint8),
             np.zeros((batch_size, esc_cap), np.uint16),
             np.zeros((batch_size, esc_cap), np.int16),
             np.zeros((batch_size, (n_groups + 1) * 3), np.int16))
            for _ in range(prefetch)
        ]
    elif wire == "d8":
        buffers = [
            (np.zeros((batch_size, n_out, 3), np.int8),
             np.zeros((batch_size, corr_cap), np.int32),
             np.zeros((batch_size, corr_cap), np.int16))
            for _ in range(prefetch)
        ]
    elif wire == "i12":
        buffers = [np.zeros((batch_size, i12_stride(n_out)), np.uint8)
                   for _ in range(prefetch)]
    elif wire == "i16":
        buffers = [np.zeros((batch_size, n_out, 3), np.int16)
                   for _ in range(prefetch)]
    else:
        buffers = [np.zeros((batch_size, n_out, 3), np.float32)
                   for _ in range(prefetch)]

    # decoder-COG ring for coordinate wires in the channel class (the b7g
    # wire computes it inline; fallback batches of a b7g run use this too)
    chan_membrane = chan_axis = None
    cog_bufs = None
    if chan_coords is not None:
        chan_membrane, chan_axis = chan_coords[1]
        cog_bufs = [np.zeros(batch_size, np.float32)
                    for _ in range(prefetch)]

    from .utils.timers import timers

    import threading

    # ring-slot gate: the decoder may only reuse buffer b % prefetch after
    # the driver finished shipping batch b - prefetch (put + block — the
    # device owns a copy by then)
    slots = threading.Semaphore(prefetch)

    # On a single-core host the decode thread (throughput work with ring
    # slack) time-slices against the driver thread (latency work: its
    # wakeups gate the link). A small nice on the decode thread lets the
    # driver preempt promptly — measured, this converts driver-wall
    # contention gaps into decode slack without costing decode throughput.
    # Default 5: measured A/B on the tunnel host (10k-frame AA benchmark,
    # same weather window) — in-trial transfer 36 MB/s un-niced vs
    # 42 MB/s niced, 553 vs 635 frames/s end-to-end. On multi-core hosts
    # the threads own separate cores and the nice is a no-op.
    decode_nice = int(os.environ.get("GORDER_TPU_DECODE_NICE", "5"))
    _niced = []

    # Same contention, Python side: the interpreter's GIL switch interval
    # (default 5 ms) bounds how fast the driver can take the GIL back from
    # the decode/dispatch threads' numpy slices between transfers.
    # Measured A/B at 1 ms on the tunnel host: no effect (the contended
    # slices are C extensions that hold the GIL regardless of the switch
    # interval), so the default is off; the knob remains for other hosts.
    switch_s = float(os.environ.get("GORDER_TPU_SWITCH_INTERVAL_MS", "0")) \
        * 1e-3
    prev_switch = sys.getswitchinterval()
    if switch_s > 0:
        sys.setswitchinterval(switch_s)

    def _nice_this_thread():
        if decode_nice <= 0 or _niced:
            return
        _niced.append(True)
        try:
            import ctypes

            libc = ctypes.CDLL("libc.so.6", use_errno=True)
            libc.setpriority(0, threading.get_native_id(), decode_nice)
        except Exception:  # non-Linux / sandboxed: scheduling hint only
            pass

    def decode_batch(b):
        _nice_this_thread()
        slots.acquire()
        t0 = _time.perf_counter()
        c0 = _time.thread_time()
        try:
            return _decode_batch(b)
        finally:
            # wall (includes contention with the driver on a shared core)
            # AND thread-CPU (the decode's intrinsic cost): their ratio is
            # the measured contention factor, and the CPU figure feeds the
            # single-core ceiling the bench publishes
            timers.add("decode", _time.perf_counter() - t0)
            timers.add("decode_cpu", _time.thread_time() - c0)

    def _chan_cog(chunk, b):
        """Per-frame decoder COG for channel-class batches riding a
        coordinate wire — the exact value the b7g side channel ships
        (native/xdr.cpp xtc_cog_axis); padding rows zeroed (masked)."""
        cb = cog_bufs[b % prefetch]
        if len(chunk) < batch_size:
            cb[len(chunk):] = 0
        traj.read_cog_axis(chunk, space, chan_membrane, chan_axis, cb,
                           n_threads=n_threads)
        return cb

    def _fallback_f32(chunk, b):
        """Mid-run fallback: decode as f32 into a fresh zero-padded
        batch-size buffer (jitted shapes never change mid-run)."""
        buf = np.zeros((batch_size, n_out, 3), np.float32)
        _, boxes, times, steps = traj.read_frames(chunk, space,
                                                  n_threads=n_threads,
                                                  out=buf)
        if chan_coords is not None:
            return ("f32g", buf, _chan_cog(chunk, b)), None, boxes, len(chunk)
        return ("f32", buf), None, boxes, len(chunk)

    def _decode_batch(b):
        chunk = frame_indices[b * batch_size:(b + 1) * batch_size]
        buf = buffers[b % prefetch]
        if wire == "b7":
            pk, eg, ev = buf[:3]
            aux = cog = None
            if ch_heads is not None:
                aux, cog = buf[3], buf[4]
            if len(chunk) < batch_size:
                # padding rows decode to the (masked) base differences
                pk[len(chunk):] = 0
                eg[len(chunk):] = 0
                ev[len(chunk):] = 0
                if aux is not None:
                    aux[len(chunk):] = 0
                    cog[len(chunk):] = 0
            res, _ = traj.read_frames_b7(chunk, space, bond_slots[0],
                                         bond_slots[1], pk, eg, ev,
                                         n_threads=n_threads,
                                         aux_slots=ch_heads, aux_out=aux,
                                         cog_slots=ch_membrane,
                                         cog_axis=ch_axis, cog_out=cog)
            if res is not None:
                base, inv_prec, boxes, times, steps = res
                if aux is not None:
                    return (("b7g", pk, eg, ev, base, aux, cog),
                            inv_prec, boxes, len(chunk))
                return ("b7", pk, eg, ev, base), inv_prec, boxes, len(chunk)
            log.warning(
                "wire fallback: batch %d exceeds the b7 format (escape "
                "demand or value range changed mid-run); shipping int16",
                b)
            res = traj.read_frames_quantized(chunk, space,
                                             n_threads=n_threads)
            if res is not None:
                coords, inv_prec, boxes, times, steps = res
                out = np.zeros((batch_size, n_out, 3), np.int16)
                out[:len(chunk)] = coords[:len(chunk)]
                if chan_coords is not None:
                    return ("i16g", out, _chan_cog(chunk, b)), inv_prec, \
                        boxes, len(chunk)
                return ("i16", out), inv_prec, boxes, len(chunk)
            return _fallback_f32(chunk, b)
        if wire == "s6":
            pk, eg, ev, gm = buf
            if len(chunk) < batch_size:
                # padding rows decode to the (masked) base frame
                pk[len(chunk):] = 0
                eg[len(chunk):] = 0
                ev[len(chunk):] = 0
                gm[len(chunk):] = 0
            res, _ = traj.read_frames_s6(chunk, space, group_of, n_groups,
                                         pk, eg, ev, gm,
                                         n_threads=n_threads)
            if res is not None:
                base, inv_prec, boxes, times, steps = res
                if chan_coords is not None:
                    return ("s6g", pk, eg, ev, gm, base,
                            _chan_cog(chunk, b)), inv_prec, boxes, len(chunk)
                return ("s6", pk, eg, ev, gm, base), inv_prec, boxes, \
                    len(chunk)
            log.warning(
                "wire fallback: batch %d exceeds the s6 format (escape "
                "demand or value range changed mid-run); shipping int16",
                b)
            res = traj.read_frames_quantized(chunk, space,
                                             n_threads=n_threads)
            if res is not None:
                coords, inv_prec, boxes, times, steps = res
                out = np.zeros((batch_size, n_out, 3), np.int16)
                out[:len(chunk)] = coords[:len(chunk)]
                if chan_coords is not None:
                    return ("i16g", out, _chan_cog(chunk, b)), inv_prec, \
                        boxes, len(chunk)
                return ("i16", out), inv_prec, boxes, len(chunk)
            return _fallback_f32(chunk, b)
        if wire == "d8":
            lo, ci, ch = buf
            if len(chunk) < batch_size:
                # zero padding rows: stale deltas would otherwise flow
                # through the on-device cumsum into (masked) frames
                lo[len(chunk):] = 0
            res, _ = traj.read_frames_delta8(chunk, space, lo, ci, ch,
                                             n_threads=n_threads)
            if res is not None:
                abs0, inv_prec, boxes, times, steps = res
                if chan_coords is not None:
                    return ("d8g", lo, ci, ch, abs0,
                            _chan_cog(chunk, b)), inv_prec, boxes, len(chunk)
                return ("d8", lo, ci, ch, abs0), inv_prec, boxes, len(chunk)
            log.warning(
                "wire fallback: batch %d exceeds the d8 format (correction "
                "demand or compression precision changed mid-run); shipping "
                "int16", b)
            res = traj.read_frames_quantized(chunk, space,
                                             n_threads=n_threads)
            if res is not None:
                coords, inv_prec, boxes, times, steps = res
                out = np.zeros((batch_size, n_out, 3), np.int16)
                out[:len(chunk)] = coords[:len(chunk)]
                if chan_coords is not None:
                    return ("i16g", out, _chan_cog(chunk, b)), inv_prec, \
                        boxes, len(chunk)
                return ("i16", out), inv_prec, boxes, len(chunk)
            return _fallback_f32(chunk, b)
        if wire == "i12":
            res = traj.read_frames_packed12(chunk, space, out=buf,
                                            n_threads=n_threads)
            if res is not None:
                coords, inv_prec, boxes, times, steps = res
                if chan_coords is not None:
                    return ("i12g", buf, _chan_cog(chunk, b)), inv_prec, \
                        boxes, len(chunk)
                return ("i12", buf), inv_prec, boxes, len(chunk)
            return _fallback_f32(chunk, b)
        if wire == "i16":
            res = traj.read_frames_quantized(chunk, space, out=buf,
                                             n_threads=n_threads)
            if res is not None:
                coords, inv_prec, boxes, times, steps = res
                if chan_coords is not None:
                    return ("i16g", buf, _chan_cog(chunk, b)), inv_prec, \
                        boxes, len(chunk)
                return ("i16", buf), inv_prec, boxes, len(chunk)
            return _fallback_f32(chunk, b)
        coords, boxes, times, steps = traj.read_frames(
            chunk, space, n_threads=n_threads, out=buf)
        if chan_coords is not None:
            return ("f32g", buf, _chan_cog(chunk, b)), None, boxes, \
                len(chunk)
        return ("f32", buf), None, boxes, len(chunk)

    from .utils.progress import ProgressPrinter

    executor = cf.ThreadPoolExecutor(max_workers=1)
    dispatch_pool = cf.ThreadPoolExecutor(max_workers=1)
    disp_slots = threading.Semaphore(8)
    progress = ProgressPrinter(len(frame_indices)) \
        if not analysis.silent else None
    in_flight = []  # (dispatch future, n_valid): drained after the loop
    # The CPU backend ALIASES numpy buffers in device_put (zero-copy, and
    # block_until_ready does not materialize them) — deferred execution
    # would read decode buffers after they were rewritten. Synchronous
    # per-batch fetches force consumption and cost nothing locally.
    # Accelerator backends perform real transfers, so fetches are deferred
    # and the device works on batch b while batch b+1 decodes.
    sync_fetch = jax.default_backend() == "cpu"

    # constant per-run device arrays, shipped once instead of per batch
    mask_full_dev = put_frames(np.ones(batch_size, bool))
    vgidx_dev = put_const(vgidx) if wire == "s6" else None

    # Fused per-batch programs: wire reconstruction (+ eligible leaflet
    # classification / dynamic normals) traced inline into the order
    # kernel — ONE XLA program per batch. Runtimes with carried or
    # collected host state keep the two-dispatch path.
    from .parallel.context import active_mesh

    fused_get = None
    # every-frame global/local/individual leaflet classification and
    # dynamic normals are pure functions of the batch: trace them into the
    # fused program so the (B, M) classes / (B, M, 3) normals never leave
    # the device (the two-dispatch path round-trips them through the host)
    fused_classify = (leaflets.fused_classify_impl()
                      if leaflets is not None else None)
    fused_normals = normals.fused_impl() if normals is not None else None
    if ((leaflets is None or fused_classify is not None)
            and (normals is None or fused_normals is not None)):
        # mesh-aware: pallas_ok itself checks per-device batch tiling —
        # the fused kernel runs under shard_map over the frames mesh
        # (ops/pallas_p2.py), so a device mesh no longer forces the XLA
        # einsum fallback
        pallas_ok = getattr(step, "pallas_ok", None)
        use_pallas = bool(
            pallas_ok is not None
            and pallas_ok(batch_size, has_classes=leaflets is not None,
                          has_geom=geom_mode is not None))
        fused_get = _build_fused_steps(step, n_out=n_out,
                                       use_pallas=use_pallas,
                                       classify_impl=fused_classify,
                                       normals_impl=fused_normals,
                                       channel_classify=channel_classify,
                                       channel_coords_classify=(
                                           chan_coords[0]
                                           if chan_coords is not None
                                           else None))
        if (fused_get is not None and leaflets is not None
                and not leaflets._logged_stats):
            # the fused path never materializes classes on the host;
            # reproduce the reference's first-frame population log
            # (topology/mod.rs:178-225) from one cheap frame-0 read —
            # classified against the decoder COG when this run is in the
            # channel class, so the logged populations match the run
            c0, b0, _, _ = traj.read_frames(frame_indices[:1], space,
                                            n_threads=n_threads)
            box0 = b0[:, [0, 1, 2], [0, 1, 2]]
            if chan_coords is not None:
                cog0 = np.zeros(1, np.float32)
                traj.read_cog_axis(frame_indices[:1], space, chan_membrane,
                                   chan_axis, cog0)
                cls0 = leaflets._channel_classify_host(c0, cog0, box0)[0]
            else:
                cls0 = np.asarray(leaflets.classify(c0, box0))[0]
            if leaflets.flip:
                cls0 = 1 - cls0
            leaflets._log_first_stats(cls0.astype(np.int32))
    def _pallas_fallback(exc):
        """A backend whose Mosaic compiler rejects the fused Pallas kernel
        (observed: 'Bad lhs type' from an older libtpu) must not kill the
        run — the XLA path computes identical output (tests/test_pallas.py).
        Returns True when the dispatch should be retried."""
        nonlocal fused_get
        disable = getattr(step, "disable_pallas", None)
        active = getattr(step, "pallas_active", None)
        if disable is None or active is None or not active():
            return False
        log.warning(
            "device kernel compilation failed (%s); retrying on the XLA "
            "path for the rest of this run",
            str(exc).splitlines()[0][:160] if str(exc) else type(exc).__name__)
        disable()
        if fused_get is not None:
            fused_get = _build_fused_steps(step, n_out=n_out,
                                           use_pallas=False,
                                           classify_impl=fused_classify,
                                           normals_impl=fused_normals,
                                           channel_classify=channel_classify,
                                           channel_coords_classify=(
                                               chan_coords[0]
                                               if chan_coords is not None
                                               else None))
        return True

    geom_point_dev = None
    if geom_mode == "point":
        geom_point_dev = put_frames(np.tile(geom_point, (batch_size, 1)))
    # numpy jit args are allowed when the fused program dispatches from
    # the worker thread on a single device: the worker's jit call absorbs
    # each small per-batch put's ~one-RTT tunnel latency that would
    # otherwise stall the driver between bulk transfers
    host_args_ok = (fused_get is not None and not sync_fetch
                    and active_mesh() is None)
    # per-batch device arrays that rarely change (NVT boxes, constant XTC
    # precision): reuse the previous device copy when the host values match
    last_box = last_box_dev = None
    last_geom_center_dev = None
    last_scale = last_scale_dev = None

    import collections as _collections

    batch_walls = _collections.deque(maxlen=15)
    slump_count = 0
    xfer_bytes = 0

    def ship(*arrays):
        """Put per-frame wire arrays and block: timed as 'transfer' and
        byte-counted, so the bench can report the transfer rate the
        pipeline actually achieved in-trial (not a separate probe's
        cold-window estimate)."""
        nonlocal xfer_bytes
        t0 = _time.perf_counter()
        devs = tuple(put_frames(a) for a in arrays)
        jax.block_until_ready(devs)
        timers.add("transfer", _time.perf_counter() - t0)
        xfer_bytes += sum(a.nbytes for a in arrays)
        return devs

    def dispatch(thunk):
        """Kernel dispatch (with Pallas->XLA fallback retry): timed so
        the client-side enqueue/RPC cost is visible separately from
        transfer and decode. Runs on the dispatch worker thread for
        accelerator backends, inline for the CPU backend."""
        t0 = _time.perf_counter()
        try:
            try:
                out = thunk()
            except Exception as exc:
                if not _pallas_fallback(exc):
                    raise
                out = thunk()
            if not sync_fetch:
                # start the tiny (4, T)-row D2H now, riding behind the
                # next batches' bulk H2D, so the end-of-run drain finds
                # host data instead of paying ~one RTT per batch
                for leaf in jax.tree_util.tree_leaves(out):
                    copy_async = getattr(leaf, "copy_to_host_async", None)
                    if copy_async is not None:
                        copy_async()
            return out
        finally:
            disp_slots.release()
            timers.add("dispatch", _time.perf_counter() - t0)

    try:
        futures = _collections.deque(
            executor.submit(decode_batch, b) for b in range(n_batches))
        for b in range(n_batches):
            t_iter = _time.perf_counter()
            with timers.phase("wait"):
                payload, inv_prec, boxes, n_valid = \
                    futures.popleft().result()
            c_iter = _time.thread_time()

            scale = None
            if inv_prec is not None:
                scale = np.ones(batch_size, np.float32)
                scale[:n_valid] = inv_prec
                if n_valid and n_valid < batch_size:
                    # padding rows reuse the last real scale so d8's cumsum
                    # tail dequantizes without overflow surprises
                    scale[n_valid:] = inv_prec[n_valid - 1]

            if scale is None:
                scale_dev = None
            elif last_scale is not None and np.array_equal(scale, last_scale):
                scale_dev = last_scale_dev
            else:
                scale_dev = put_frames(scale)
                last_scale, last_scale_dev = scale, scale_dev

            kind = payload[0]
            # channel-class coordinate wires carry a trailing per-frame
            # decoder COG: strip it here, re-append to the fused program's
            # operand tuple (or hand it to classes_for_batch) below
            chan_cog = None
            if kind in ("s6g", "d8g", "i12g", "i16g", "f32g"):
                chan_cog = payload[-1].copy()   # ring buffer: copy out
                payload = (kind[:-1],) + payload[1:-1]
                wire_kind = kind
                kind = kind[:-1]
            else:
                wire_kind = kind
            coords_dev = None      # f32 coords (or None until reconstructed)
            quant_dev = None       # int16 absolutes awaiting dequantization
            wire_devs = None       # raw wire arrays for the fused programs
            if kind == "b7":
                _, pk, eg, ev, base = payload
                pk_dev, eg_dev, ev_dev = ship(pk, eg, ev)
                base_dev = base if host_args_ok else put_const(base)
                wire_devs = (pk_dev, eg_dev, ev_dev, base_dev)
                assert fused_get is not None, \
                    "b7 wire requires the fused bond-order path"
            elif kind == "b7g":
                _, pk, eg, ev, base, aux, cog = payload
                pk_dev, eg_dev, ev_dev, aux_dev = ship(pk, eg, ev, aux)
                base_dev = base if host_args_ok else put_const(base)
                cog_dev = (cog.copy() if host_args_ok
                           else put_frames(cog.copy()))
                wire_devs = (pk_dev, eg_dev, ev_dev, base_dev, aux_dev,
                             cog_dev)
                assert fused_get is not None, \
                    "b7g wire requires the fused bond-order path"
            elif kind == "s6":
                _, pk, eg, ev, gm, base = payload
                pk_dev, eg_dev, ev_dev, gm_dev = ship(pk, eg, ev, gm)
                base_dev = base if host_args_ok else put_const(base)
                wire_devs = (pk_dev, eg_dev, ev_dev, base_dev, gm_dev,
                             vgidx_dev)
                if fused_get is None:
                    quant_dev = _s6_to_int(pk_dev, eg_dev, ev_dev, base_dev,
                                           gm_dev, vgidx_dev)
            elif kind == "d8":
                _, lo, ci, ch, abs0 = payload
                lo_dev, ci_dev, ch_dev = ship(lo, ci, ch)
                abs0_dev = abs0 if host_args_ok else put_const(abs0)
                wire_devs = (lo_dev, ci_dev, ch_dev, abs0_dev)
                if fused_get is None:
                    quant_dev = _d8_to_int(lo_dev, ci_dev, ch_dev, abs0_dev)
            elif kind == "i12":
                packed_dev, = ship(payload[1])
                wire_devs = (packed_dev,)
                if fused_get is None:
                    quant_dev = _unpack12(packed_dev, n_out)
            elif kind == "i16":
                quant_dev, = ship(payload[1])
                wire_devs = (quant_dev,)
            else:
                coords_dev, = ship(payload[1])
                wire_devs = (coords_dev,)
                scale_dev = None

            if analysis.handle_pbc:
                check_box_batch(boxes[:n_valid])
            box_arr = np.ones((batch_size, 3), np.float32)
            box_arr[:n_valid] = boxes[:n_valid, [0, 1, 2], [0, 1, 2]]
            if n_valid == batch_size:
                frame_mask_dev = mask_full_dev
            else:
                frame_mask = np.zeros(batch_size, bool)
                frame_mask[:n_valid] = True
                frame_mask_dev = put_frames(frame_mask)
            if last_box is not None and np.array_equal(box_arr, last_box):
                if last_box_dev is None:
                    # second consecutive batch with this box: pin it on
                    # the device once, then every later batch passes the
                    # device handle at zero per-batch cost (NVT boxes
                    # never change; the worker-thread put below still
                    # holds the GIL against the driver on 1-core hosts)
                    last_box_dev = put_frames(box_arr)
                    last_geom_center_dev = None
                box_dev = last_box_dev
            elif host_args_ok:
                # numpy arg: the jit call device_puts it on the DISPATCH
                # worker, so the ~one-RTT latency of this tiny per-batch
                # put rides behind the bulk transfer instead of stalling
                # the driver (measured ~150 ms/batch on the tunnel)
                box_dev = box_arr
                last_box, last_box_dev = box_arr, None
                last_geom_center_dev = None
            else:
                box_dev = put_frames(box_arr)
                last_box, last_box_dev = box_arr, box_dev
                last_geom_center_dev = None

            if geom_mode == "selection":
                geom_ref = geom_sel_dev
            elif geom_mode == "point":
                geom_ref = geom_point_dev
            elif geom_mode == "center":
                if last_box_dev is not None and box_dev is last_box_dev:
                    if last_geom_center_dev is None:
                        last_geom_center_dev = put_frames(box_arr * 0.5)
                    geom_ref = last_geom_center_dev
                elif host_args_ok:
                    geom_ref = box_arr * 0.5
                else:
                    geom_ref = put_frames(box_arr * 0.5)
            else:
                geom_ref = None

            analyzed = np.arange(shard_start + b * batch_size,
                                 shard_start + b * batch_size + n_valid,
                                 dtype=np.int64)
            if fused_get is not None:
                # single dispatch: decode + kernel in one compiled program;
                # the call runs on the dispatch worker so its client-side
                # RPC wait never serializes with the next batch's transfer
                if chan_cog is not None:
                    cog_dev = (chan_cog if host_args_ok
                               else put_frames(chan_cog))
                    wire_devs = wire_devs + (cog_dev,)

                def thunk(k=wire_kind, w=wire_devs, s=scale_dev, bx=box_dev,
                          fm=frame_mask_dev, gr=geom_ref):
                    return fused_get(k)(w, s, bx, normal_dev, fm,
                                        map_zero, gr)
            elif leaflets is not None or normals is not None:
                # these subsystems consume f32 coordinates, and their
                # carried/collected state needs host values per batch
                if coords_dev is not None:
                    coords_f32 = coords_dev
                else:
                    coords_f32 = _dequantize(quant_dev, scale_dev)
                if normals is not None:
                    normal_arg = normals.normals_for_batch(
                        coords_f32, box_dev, analyzed, batch_size,
                        geom_ref=geom_ref)
                    normal_arg = put_frames(np.asarray(normal_arg)
                                            if isinstance(normal_arg,
                                                          np.ndarray)
                                            else np.asarray(normal_arg))
                else:
                    normal_arg = normal_dev
                if leaflets is not None:
                    classes_arr = leaflets.classes_for_batch(
                        coords_f32, box_dev, analyzed,
                        channel_cog=chan_cog)
                    if classes_arr.shape[0] < batch_size:
                        classes_arr = np.concatenate([
                            classes_arr,
                            np.zeros((batch_size - classes_arr.shape[0],
                                      n_molecules), np.int32)])
                    classes_dev = put_frames(classes_arr)
                else:
                    classes_dev = None
                if quant_dev is not None:
                    # keep the kernel on the INTEGER coords so its bond
                    # vectors take the single-rounding integer-difference
                    # path (bit-identical to the fused programs / b7)
                    def thunk(q=quant_dev, bx=box_dev, na=normal_arg,
                              fm=frame_mask_dev, cl=classes_dev,
                              s=scale_dev, gr=geom_ref):
                        return step(q, bx, na, fm, cl, inv_scale=s,
                                    map_state=map_zero, geom_ref=gr)
                else:
                    def thunk(c=coords_f32, bx=box_dev, na=normal_arg,
                              fm=frame_mask_dev, cl=classes_dev,
                              gr=geom_ref):
                        return step(c, bx, na, fm, cl, map_state=map_zero,
                                    geom_ref=gr)
            elif coords_dev is not None:
                def thunk(c=coords_dev, bx=box_dev, fm=frame_mask_dev,
                          gr=geom_ref):
                    return step(c, bx, normal_dev, fm, map_state=map_zero,
                                geom_ref=gr)
            else:
                # dequantization fuses into the kernel
                def thunk(q=quant_dev, bx=box_dev, fm=frame_mask_dev,
                          s=scale_dev, gr=geom_ref):
                    return step(q, bx, normal_dev, fm, inv_scale=s,
                                map_state=map_zero, geom_ref=gr)
            if sync_fetch:
                result, map_out = dispatch(thunk)
                with timers.phase("compute"):
                    result = dict(result)
                    _pop_normal_guard(result)
                    accum.add_batch(
                        {k: np.asarray(v) for k, v in result.items()},
                        n_valid)
                    if map_out is not None:
                        drain_map_state(map_out)
            else:
                # async: the dispatch worker owns the (network-latent) jit
                # call; the driver proceeds straight to the next batch's
                # transfer. disp_slots bounds in-flight executions so HBM
                # holds at most a few batches of wire input
                disp_slots.acquire()
                in_flight.append(
                    (dispatch_pool.submit(dispatch, thunk), n_valid))
            # batch b has fully left its host buffers (put + block above, or
            # synchronous consumption): the decoder may reuse the ring slot
            slots.release()
            timers.add("driver_cpu", _time.thread_time() - c_iter)
            wall = _time.perf_counter() - t_iter
            if len(batch_walls) >= 5:
                med = sorted(batch_walls)[len(batch_walls) // 2]
                if wall > max(3.0 * med, 0.25):
                    slump_count += 1
                    log.warning(
                        "transfer slump: batch %d took %.2fs (rolling median "
                        "%.2fs); decode continues into the prefetch ring",
                        b, wall, med)
            batch_walls.append(wall)
            if progress is not None:
                progress.update(min((b + 1) * batch_size,
                                    len(frame_indices)))
            if b % 16 == 15:
                log.info("dispatched %d / %d frames",
                         min((b + 1) * batch_size, len(frame_indices)),
                         len(frame_indices))
    finally:
        # unblock a decode waiting on a ring slot before joining the worker
        # (exception paths would otherwise deadlock executor.shutdown)
        for _ in range(prefetch + 1):
            slots.release()
        for _ in range(16):
            disp_slots.release()
        executor.shutdown(wait=True, cancel_futures=True)
        dispatch_pool.shutdown(wait=True)
        if switch_s > 0:
            sys.setswitchinterval(prev_switch)
        if progress is not None:
            progress.finish()
    if slump_count:
        log.info("%d transfer slump(s) absorbed by the prefetch ring",
                 slump_count)

    with timers.phase("compute"):
        for fut, n_valid in in_flight:
            result, map_out = fut.result()
            result = dict(result)
            _pop_normal_guard(result)
            accum.add_batch({k: np.asarray(v) for k, v in result.items()},
                            n_valid)
            if map_out is not None:
                drain_map_state(map_out)

    global _LAST_XFER_BYTES
    _LAST_XFER_BYTES = xfer_bytes
    log.info("analyzed %d frames", accum.n_frames)
    return accum, traj, full_frame_indices, map_accum, shard_start


def _run_bond_based(analysis: Analysis, shard=None, as_partial=False):
    from .core.ordermap import build_map_spec
    from .utils.timers import timers

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
            bond_slots=(remap(compiled.atom_a), remap(compiled.atom_b)))
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


def _prepare_ua_kinds(system: System, analysis: Analysis):
    """→ (kinds, CompiledUA or None): selections + classification +
    virtual-bond compilation shared by the run and merge paths."""
    from .topology.ua import compile_ua
    from .utils.timers import timers

    at = analysis.analysis_type
    n = system.n_atoms
    sat = select_mask(system, at.saturated) if at.saturated \
        else np.zeros(n, bool)
    unsat = select_mask(system, at.unsaturated) if at.unsaturated \
        else np.zeros(n, bool)
    ignore = select_mask(system, at.ignore) if at.ignore \
        else np.zeros(n, bool)
    if at.saturated and not sat.any():
        raise _empty_group_error("Saturated")
    if at.unsaturated and not unsat.any():
        raise _empty_group_error("Unsaturated")
    if (sat & unsat).any():
        raise _overlap_error(int((sat & unsat).sum()), "Saturated",
                             at.saturated, "Unsaturated", at.unsaturated)
    if at.ignore:
        if (sat & ignore).any():
            raise _overlap_error(int((sat & ignore).sum()), "Saturated",
                                 at.saturated, "Ignore", at.ignore)
        if (unsat & ignore).any():
            raise _overlap_error(int((unsat & ignore).sum()), "Unsaturated",
                                 at.unsaturated, "Ignore", at.ignore)
    satunsat = (sat | unsat) & ~ignore
    if not satunsat.any():
        # wording: src/errors.rs:104-105 (TopologyError::NoUACarbons)
        raise TopologyError(
            "no carbons for the calculation of united-atom order "
            "parameters were specified")

    with timers.phase("topology"):
        kinds = classify_molecules(system, satunsat, mode="atoms")
        if not kinds:
            return [], None
        compiled = compile_ua(system, kinds, sat, unsat, ignore)
    return kinds, compiled


def _run_ua(analysis: Analysis, shard=None, as_partial=False):
    from .core.ua import make_ua_step
    from .utils.timers import timers

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
    from .core.ordermap import build_map_spec

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


# ------------------------------------------------------- sharded map-reduce


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
    from .parallel import context as mesh_context
    from .utils.timers import profiled_run, timers

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
    from .core.ordermap import build_map_spec
    from .utils.timers import timers

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


# ------------------------------------------------------------------ converter


def _fixed_order(sums: np.ndarray, counts: np.ndarray, min_samples: int,
                 sign: float) -> float:
    total_count = counts.sum()
    if total_count < max(min_samples, 1):
        return float("nan")
    return sign * float(sums.sum() / _SCALE / total_count)


class _Collector:
    """Shared results math: order collections with optional errors and
    convergence, over global bond-type slices."""

    def __init__(self, analysis: Analysis, accum: OrderAccumulator,
                 sign: float):
        from .core.timewise import estimate_error, prefix_average

        self._estimate_error = estimate_error
        self._prefix_average = prefix_average
        self.analysis = analysis
        self.accum = accum
        self.sign = sign
        self.min_samples = analysis.min_samples
        self.classes = accum.classes
        self.with_errors = analysis.estimate_error is not None
        self.n_blocks = (analysis.estimate_error.n_blocks
                         if self.with_errors else 0)
        self.timewise = {}
        if self.with_errors:
            if accum.n_frames < self.n_blocks:
                from .errors import ErrorEstimationError

                raise ErrorEstimationError(
                    f"read '{accum.n_frames}' trajectory frame(s) which is "
                    f"fewer than the number of blocks ('{self.n_blocks}')")
            for cls in self.classes:
                self.timewise[cls] = accum.timewise(cls)
            log.info(
                "error estimation: %d blocks of %d frames",
                self.n_blocks, accum.n_frames // max(self.n_blocks, 1))

    def collection(self, type_slice, *, for_average=False) -> OrderCollection:
        col = OrderCollection()
        ms = 1 if for_average else self.min_samples
        for cls in self.classes:
            value = _fixed_order(self.accum.sums[cls][type_slice],
                                 self.accum.counts[cls][type_slice],
                                 ms, self.sign)
            error = None
            if self.with_errors:
                if value != value:  # below min_samples → error is NaN too
                    error = float("nan")
                else:
                    fsums, fcounts = self.timewise[cls]
                    error = self._estimate_error(
                        fsums[:, type_slice].sum(axis=1),
                        fcounts[:, type_slice].sum(axis=1), self.n_blocks)
            setattr(col, cls, Order(value, error))
        return col

    def convergence(self, type_slice):
        if not self.with_errors:
            return None
        out = {}
        for cls in self.classes:
            fsums, fcounts = self.timewise[cls]
            out[cls] = self.sign * self._prefix_average(
                fsums[:, type_slice].sum(axis=1),
                fcounts[:, type_slice].sum(axis=1))
        return out


class _MapCollector:
    """Per-slice ordermap aggregation over the fetched device grids."""

    def __init__(self, analysis, map_spec, map_state, n_types, sign):
        from .core.ordermap import finalize_maps

        self.spec = map_spec
        self.enabled = map_spec is not None and map_state is not None
        if self.enabled:
            min_samples = analysis.map.min_samples
            self.min_samples = min_samples
            self.sign = sign
            self.grids, self.raw = finalize_maps(
                map_state, n_types, map_spec, min_samples, sign)

    def for_types(self, type_indices) -> Optional[Dict[str, np.ndarray]]:
        from .core.ordermap import aggregate_map

        if not self.enabled:
            return None
        idx = np.asarray(type_indices, np.int64).reshape(-1)
        return {
            cls: aggregate_map(self.raw[cls], idx, self.spec,
                               self.min_samples, self.sign)
            for cls in self.raw
        }


def convert_results(analysis: Analysis, system: System,
                    kinds: List[MoleculeKind], compiled: CompiledBonds,
                    accum: OrderAccumulator, traj: Trajectory,
                    frame_indices: np.ndarray, map_spec=None,
                    map_state=None) -> AnalysisResults:
    mode = analysis.analysis_type.kind
    sign = -1.0 if mode in ("aa", "ua") else 1.0
    collector = _Collector(analysis, accum, sign)
    collection = collector.collection
    with_errors = collector.with_errors
    maps = _MapCollector(analysis, map_spec, map_state, compiled.n_types,
                         sign)

    molecules: List[MoleculeResults] = []
    for k, kind in enumerate(kinds):
        t0 = int(compiled.type_offsets[k])
        t1 = int(compiled.type_offsets[k + 1])
        mol = MoleculeResults(
            name=kind.name,
            average_order=collection(slice(t0, t1), for_average=True),
        )
        if with_errors:
            mol.convergence = collector.convergence(slice(t0, t1))
        mol.average_maps = maps.for_types(np.arange(t0, t1))
        if mode == "cg":
            for t, bt in enumerate(kind.bond_types):
                bond = BondResults(
                    atom1=AtomDesc(bt.resname_a, bt.name_a, bt.rel_a),
                    atom2=AtomDesc(bt.resname_b, bt.name_b, bt.rel_b),
                    order=collection(slice(t0 + t, t0 + t + 1)),
                    maps=maps.for_types([t0 + t]),
                )
                mol.bonds.append(bond)
        else:  # aa: group bond types by heavy atom (rel_a)
            by_heavy: Dict[int, List[int]] = {}
            for t, bt in enumerate(kind.bond_types):
                by_heavy.setdefault(bt.rel_a, []).append(t)
            for rel_a in sorted(by_heavy):
                ts = by_heavy[rel_a]
                bt0 = kind.bond_types[ts[0]]
                atom = AtomResults(
                    atom=AtomDesc(bt0.resname_a, bt0.name_a, rel_a),
                    order=collection(
                        np.asarray([t0 + t for t in ts], np.int64)),
                    maps=maps.for_types([t0 + t for t in ts]),
                )
                for t in ts:
                    bt = kind.bond_types[t]
                    atom.bonds.append(BondResults(
                        atom1=AtomDesc(bt.resname_a, bt.name_a, bt.rel_a),
                        atom2=AtomDesc(bt.resname_b, bt.name_b, bt.rel_b),
                        order=collection(slice(t0 + t, t0 + t + 1)),
                        maps=maps.for_types([t0 + t]),
                    ))
                mol.atoms.append(atom)
        molecules.append(mol)

    results = AnalysisResults(
        mode=mode,
        average_order=OrderCollection(),
        molecules=molecules,
        n_analyzed_frames=accum.n_frames,
        structure_path=analysis.structure,
        trajectory_paths=list(analysis.trajectory),
        frame_numbers=frame_indices,
        analysis=analysis,
    )
    results.average_order = collection(slice(None), for_average=True)
    if maps.enabled:
        results.average_maps = maps.for_types(
            np.arange(compiled.n_types))
        results.map_params = (analysis.map, map_spec)
    return results


def convert_results_ua(analysis: Analysis, system: System,
                       kinds: List[MoleculeKind], compiled,
                       accum: OrderAccumulator, traj: Trajectory,
                       frame_indices: np.ndarray, map_spec=None,
                       map_state=None) -> AnalysisResults:
    collector = _Collector(analysis, accum, sign=-1.0)
    collection = collector.collection
    maps = _MapCollector(analysis, map_spec, map_state, compiled.n_types,
                         -1.0)

    molecules: List[MoleculeResults] = []
    for k, kind in enumerate(kinds):
        t0 = int(compiled.type_offsets[k])
        t1 = int(compiled.type_offsets[k + 1])
        mol = MoleculeResults(
            name=kind.name,
            average_order=collection(slice(t0, t1), for_average=True),
        )
        if collector.with_errors:
            mol.convergence = collector.convergence(slice(t0, t1))
        mol.average_maps = maps.for_types(np.arange(t0, t1))
        for spec, base in zip(compiled.atom_specs[k],
                              compiled.atom_type_base[k]):
            atom = AtomResults(
                atom=AtomDesc(spec.resname, spec.name, spec.rel_index),
                order=collection(slice(base, base + spec.n_hydrogens)),
                maps=maps.for_types(
                    np.arange(base, base + spec.n_hydrogens)),
            )
            for h in range(spec.n_hydrogens):
                atom.bonds.append(BondResults(
                    atom1=AtomDesc(spec.resname, spec.name, spec.rel_index),
                    atom2=None,
                    virtual_index=h,
                    order=collection(slice(base + h, base + h + 1)),
                    maps=maps.for_types([base + h]),
                ))
            mol.atoms.append(atom)
        molecules.append(mol)

    results = AnalysisResults(
        mode="ua",
        average_order=collection(slice(None), for_average=True),
        molecules=molecules,
        n_analyzed_frames=accum.n_frames,
        structure_path=analysis.structure,
        trajectory_paths=list(analysis.trajectory),
        frame_numbers=frame_indices,
        analysis=analysis,
    )
    if maps.enabled:
        results.average_maps = maps.for_types(np.arange(compiled.n_types))
        results.map_params = (analysis.map, map_spec)
    return results
