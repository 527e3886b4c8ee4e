"""Sharded multi-host analysis (docs/SCALING.md).

Each process analyzes one contiguous block of trajectory frames and
saves an exact partial state; merging reproduces the single-process
results byte for byte, so shards can run on different hosts (SLURM
array, mpirun, ...) and merge anywhere.

Equivalent CLI:
    gorder-tpu analyze.yaml --frame-shard 0/4 --partial part0.npz
    ...
    gorder-tpu analyze.yaml --merge 'part*.npz'
"""

import glob

import gorder_tpu as gorder
from gorder_tpu.parallel.shard import load_partial, save_partial

analysis = gorder.Analysis(
    structure="system.tpr",
    trajectory="traj.xtc",
    analysis_type=gorder.analysis_types.CGOrder(beads="@membrane"),
    output_yaml="order.yaml",
)

N_SHARDS = 4

# --- on each host i (only that host's block of frames is decoded):
for i in range(N_SHARDS):
    state = analysis.run_partial(i, N_SHARDS)
    save_partial(f"part{i}.npz", state)

# --- anywhere, afterwards:
states = [load_partial(p) for p in sorted(glob.glob("part*.npz"))]
results = analysis.merge(states)
results.write()
print("merged", results.n_analyzed_frames, "frames")
