"""gorder-tpu: TPU-native lipid order-parameter analysis.

A ground-up JAX/XLA/Pallas re-architecture with the capability surface of the
Rust `gorder` package (see SURVEY.md): atomistic, coarse-grained and
united-atom order parameters from GROMACS trajectories with leaflet-wise
analysis, dynamic membrane normals, ordermaps, error estimation, geometry
selection and YAML/TAB/CSV/XVG output.
"""

from .version import __version__  # noqa: F401
