"""gorder-tpu: TPU-native lipid order-parameter analysis.

A ground-up JAX/XLA re-architecture with the capability surface of the Rust
`gorder` package (see SURVEY.md): atomistic, coarse-grained and united-atom
order parameters from GROMACS trajectories with leaflet-wise analysis
(8 assignment methods), dynamic membrane normals, 2-D ordermaps, error
estimation, geometric region selection, trajectory concatenation and
YAML/TAB/CSV/XVG output.

Python API::

    import gorder_tpu as gorder

    analysis = gorder.Analysis(
        structure="system.tpr",
        trajectory="traj.xtc",
        analysis_type=gorder.AnalysisType.aaorder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        leaflets=gorder.LeafletClassification.global_("@membrane", "name P"),
        output_yaml="order.yaml",
    )
    results = analysis.run()
    results.write()
    for molecule in results.molecules:
        print(molecule.name, molecule.average_order.total.value)
"""

from .version import __version__  # noqa: F401
from .errors import (  # noqa: F401
    AnalysisError,
    ConfigError,
    GorderError,
    SelectionError,
    TopologyError,
    WriteError,
)
from .input.config import (  # noqa: F401
    Analysis,
    AnalysisType,
    Collect,
    EstimateError,
    Frequency,
    Geometry,
    GridSpan,
    LeafletClassification,
    MembraneNormal,
    OrderMapParams,
)
from .results.model import (  # noqa: F401
    AnalysisResults,
    AtomResults,
    BondResults,
    MoleculeResults,
    Order,
    OrderCollection,
)
