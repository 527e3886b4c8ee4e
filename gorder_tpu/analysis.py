"""Analysis orchestrator: the equivalent of the reference's
`Analysis::run()` + per-mode drivers (src/analysis/mod.rs:31-49,
aaorder.rs/cgorder.rs/uaorder.rs), re-architected for batched TPU execution:

structure+topology ingest → selections → molecule classification →
compiled index tensors → jitted frame-batch kernels → exact host
accumulation → results tree.

This module is the stable import surface; the implementation lives in
gorder_tpu/engine/ (prepare / leaflet_runtime / normals_runtime / wire /
fused / batches / drivers / convert), split from the original single-file
orchestrator in round 5 with zero behavior change.
"""

from __future__ import annotations

import logging
import os

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

from .engine.batches import (  # noqa: E402,F401
    _effective_batch_size,
    _run_batches,
    _shard_block,
)
from .engine.convert import (  # noqa: E402,F401
    _SCALE,
    _Collector,
    _fixed_order,
    _MapCollector,
    convert_results,
    convert_results_ua,
)
from .engine.drivers import (  # noqa: E402,F401
    _assemble_partial,
    _attach_leaflet_data,
    _attach_normals_data,
    _fingerprint,
    _run_bond_based,
    _run_ua,
    merge_partial_states,
    run_analysis,
    run_analysis_partial,
)
from .engine.fused import (  # noqa: E402,F401
    _build_fused_steps,
    _pop_normal_guard,
)
from .engine.leaflet_runtime import (  # noqa: E402,F401
    LeafletRuntime,
    _cluster_head_cloud,
    _manual_leaflet_table,
    _ndx_leaflet_table,
    _require_cluster_atoms,
    build_leaflet_runtime,
)
from .engine.normals_runtime import (  # noqa: E402,F401
    NormalsRuntime,
    _build_normals,
    _make_molecule_inside,
    _manual_normals_table,
    _static_normal,
)
from .engine.prepare import (  # noqa: E402,F401
    _AXIS_INDEX,
    _atoms_per_molecule,
    _build_atom_space,
    _empty_group_error,
    _empty_results,
    _overlap_error,
    _prepare_bond_kinds,
    _prepare_geometry,
    _prepare_ua_kinds,
    _single_atom_per_molecule,
    load_structure,
)
from .engine.wire import (  # noqa: E402,F401
    _b7_impl,
    _b7_residuals_impl,
    _d8_impl,
    _d8_ints_impl,
    _d8_to_f32,
    _d8_to_int,
    _dequant_impl,
    _dequantize,
    _device_codecs,
    _measure_link_mbps,
    _pick_wire_by_rate,
    _pick_wire_format,
    _probe_b7,
    _probe_d8,
    _probe_s6,
    _s6_impl,
    _s6_ints_impl,
    _s6_to_f32,
    _s6_to_int,
    _unpack12,
    _unpack12_impl,
    _wire_groups,
)


def __getattr__(name):
    # mutable observability globals live where they are written
    # (engine/batches.py); route reads through so harnesses that do
    # `getattr(analysis, "_LAST_WIRE")` keep seeing live values
    if name in ("_LAST_WIRE", "_LAST_XFER_BYTES"):
        from .engine import batches

        return getattr(batches, name)
    raise AttributeError(name)
