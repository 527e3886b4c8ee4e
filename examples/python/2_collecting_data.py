"""Programmatic access: leaflet assignment and dynamic normals as numpy."""

import gorder_tpu as gorder

analysis = gorder.Analysis(
    structure="system.tpr",
    trajectory="traj.xtc",
    analysis_type=gorder.analysis_types.CGOrder("@membrane"),
    leaflets=gorder.leaflets.GlobalClassification(
        "@membrane", "name PO4", collect=True),
    membrane_normal=gorder.membrane_normal.DynamicNormal(
        "name PO4", 2.5, collect=True),
)
results = analysis.run()

popc = results.get_molecule("POPC")
bond = popc.get_bond(4, 5)
print("one bond:", bond.order.total.value)

leaflets = results.leaflets_for_molecule("POPC")   # (frames, mols) uint8
normals = results.normals_for_molecule("POPC")     # (frames, mols, 3)
print("upper fraction:", leaflets.mean())
