"""2D ordermaps with error estimation."""

import gorder_tpu as gorder

analysis = gorder.Analysis(
    structure="system.tpr",
    trajectory="traj.xtc",
    analysis_type=gorder.analysis_types.AAOrder(
        heavy_atoms="@membrane and element name carbon",
        hydrogens="@membrane and element name hydrogen",
    ),
    ordermap=gorder.ordermap.OrderMap(
        output_directory="ordermaps", bin_size=[0.1, 0.1], min_samples=50),
    estimate_error=gorder.estimate_error.EstimateError(n_blocks=5),
    output_yaml="order.yaml",
)
analysis.run().write()   # ordermaps/ also gets a ready-to-run plot.py
