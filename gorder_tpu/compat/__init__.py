"""pygorder-compatible API namespaces.

The reference's Python package (pygorder/src/lib.rs:172-239) exposes
per-variant constructor classes grouped into submodules
(``gorder.analysis_types.AAOrder``, ``gorder.leaflets.Global
Classification``, …). This package mirrors those names 1:1 as thin
constructors over gorder_tpu's own config types, so code written against
pygorder runs unchanged::

    import gorder_tpu as gorder

    analysis = gorder.Analysis(
        structure="system.tpr",
        trajectory="md.xtc",
        analysis_type=gorder.analysis_types.AAOrder(
            heavy_atoms="@membrane and element name carbon",
            hydrogens="@membrane and element name hydrogen"),
        leaflets=gorder.leaflets.GlobalClassification(
            "@membrane", "name P"),
        ordermap=gorder.ordermap.OrderMap(output_directory="maps"),
    )
    results = analysis.run()

Signatures follow the published pygorder type stubs
(pygorder/python/gorder/*.pyi).
"""

from . import (  # noqa: F401
    analysis_types,
    estimate_error,
    exceptions,
    geometry,
    leaflets,
    membrane_normal,
    ordermap,
)

__all__ = ["analysis_types", "estimate_error", "exceptions", "geometry",
           "leaflets", "membrane_normal", "ordermap"]
