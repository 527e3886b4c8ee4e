"""Partial-state persistence for sharded (multi-process / multi-host)
runs.

`run_analysis_partial` (gorder_tpu/analysis.py) computes one contiguous
frame block; the state saved here is a handful of exact int64 arrays plus
the per-frame series indexed by global frame ordinals, so
`merge_partial_states` reproduces the single-process output
byte-for-byte. Typical deployment: one process per host (e.g. a SLURM
array), `gorder-tpu config.yaml --frame-shard I/N --partial part_I.npz`,
then `gorder-tpu config.yaml --merge 'part_*.npz'` anywhere.
"""

from __future__ import annotations

import glob as _glob
import json
from typing import List

import numpy as np


def save_partial(path: str, state: dict) -> None:
    arrays = {}
    meta = {}
    for key, value in state.items():
        if isinstance(value, np.ndarray):
            arrays[key] = value
        else:
            meta[key] = value
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_partial(path: str) -> dict:
    from ..errors import AnalysisError

    try:
        with np.load(path, allow_pickle=False) as data:
            state = dict(json.loads(str(data["__meta__"])))
            for key in data.files:
                if key != "__meta__":
                    state[key] = data[key]
    except (OSError, KeyError, ValueError) as e:
        raise AnalysisError(
            f"could not load partial state '{path}': {e}") from None
    return state


def expand_partial_paths(specs) -> List[str]:
    from ..errors import AnalysisError

    paths: List[str] = []
    for spec in specs:
        if any(ch in spec for ch in "*?["):
            matched = sorted(_glob.glob(spec))
            if not matched:
                raise AnalysisError(f"no partial states match '{spec}'")
            paths.extend(matched)
        else:
            paths.append(spec)
    return paths
