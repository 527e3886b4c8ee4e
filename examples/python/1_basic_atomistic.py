"""Basic atomistic analysis through the Python API."""

import gorder_tpu as gorder

analysis = gorder.Analysis(
    structure="system.tpr",
    trajectory="traj.xtc",
    analysis_type=gorder.analysis_types.AAOrder(
        heavy_atoms="@membrane and element name carbon",
        hydrogens="@membrane and element name hydrogen",
    ),
    output_yaml="order.yaml",
)
results = analysis.run()
results.write()

print("average -S_CH:", results.average_order.total.value)
for mol in results.molecules:
    print(mol.name, mol.average_order.total.value)
