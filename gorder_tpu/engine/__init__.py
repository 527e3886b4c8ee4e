"""Analysis engine internals, split from the original analysis.py
orchestrator (round 5). Import through gorder_tpu.analysis, which
re-exports the public and test-visible surface."""
