"""pygorder ``gorder.Analysis`` (pygorder __init__.pyi:20-111): the same
kwargs constructor as the native ``gorder_tpu.Analysis``, but ``run()``
returns the method-style results objects of the reference's Python API
(results/pyapi.py) instead of the native attribute-style tree."""

from __future__ import annotations

from ..input.config import Analysis as _NativeAnalysis
from ..results.pyapi import AnalysisResults


class Analysis:
    """Drop-in for pygorder's ``gorder.Analysis``."""

    def __init__(self, *args, **kwargs):
        if args and isinstance(args[0], _NativeAnalysis):
            self._inner = args[0]
        else:
            self._inner = _NativeAnalysis(*args, **kwargs)

    def run(self) -> AnalysisResults:
        return AnalysisResults(self._inner.run())

    @staticmethod
    def from_file(file: str) -> "Analysis":
        return Analysis(_NativeAnalysis.from_file(file))

    def run_partial(self, shard_index: int, shard_count: int) -> dict:
        """One contiguous frame shard's raw partial state
        (docs/SCALING.md)."""
        return self._inner.run_partial(shard_index, shard_count)

    def merge(self, states) -> AnalysisResults:
        """Merge partial states (dicts or .npz paths) into full
        method-style results."""
        return AnalysisResults(self._inner.merge(states))

    def __getattr__(self, name):
        # config fields (structure, trajectory, begin, ...) read through
        return getattr(self._inner, name)
