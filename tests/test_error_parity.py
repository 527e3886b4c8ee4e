"""Error-message parity sweep against the reference taxonomy.

One test per reference error enum (src/errors.rs:20-530), asserting the
EXACT post-"error: " wording (the reference renders `error:`/`hint:`/
`details:` labels in color; in plain text they are literal words, which is
what our exceptions carry and the CLI prints as `error: {e}`).

Variants that are structurally unreachable in this architecture are listed
at the bottom (`UNREACHABLE`) with the reason, so the ledger is exact.
"""

import os

import numpy as np
import pytest

from gorder_tpu.errors import (
    AnalysisError,
    BondsError,
    ClusterError,
    ConfigError,
    DynamicNormalError,
    ErrorEstimationError,
    FrequencyError,
    GeometryError,
    GorderError,
    ManualLeafletError,
    ManualNormalError,
    NdxLeafletError,
    OrderMapError,
    SelectionError,
    TopologyError,
    WriteError,
)
from gorder_tpu.input import (
    Analysis,
    AnalysisType,
    Frequency,
    LeafletClassification,
    MembraneNormal,
    OrderMapParams,
)
from gorder_tpu.input.config import EstimateError, Geometry, GridSpan

from .conftest import requires_fixtures


def msg(excinfo) -> str:
    return str(excinfo.value)


def cg(fixtures, **kw):
    return Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True, **kw)


# ------------------------------------------------- GridSpanError (errors.rs:20)


def test_grid_span_invalid():
    with pytest.raises(OrderMapError) as e:
        GridSpan.manual(20.0, 1.5)
    assert msg(e) == (
        "the first coordinate for the grid span ('20' nm) is higher than "
        "the second coordinate for the grid span ('1.5' nm)")


# ------------------------------------------ GeometryConfigError (errors.rs:28)


def test_geometry_invalid_dimension():
    with pytest.raises(GeometryError) as e:
        Geometry("cuboid", xdim=(5.0, 1.0))
    assert msg(e) == (
        "the first value for dimension ('5' nm) is higher than the second "
        "value for dimension ('1' nm)")


def test_geometry_invalid_radius():
    with pytest.raises(GeometryError) as e:
        Geometry("cylinder", radius=-1.5)
    assert msg(e) == (
        "the specified radius for the geometry selection is '-1.5' but it "
        "must be non-negative")


def test_geometry_invalid_span():
    with pytest.raises(GeometryError) as e:
        Geometry("cylinder", span=(4.0, 2.0))
    assert msg(e) == (
        "the first value for span ('4' nm) is higher than the second value "
        "for span ('2' nm)")


@requires_fixtures
def test_geometry_invalid_box_center(fixtures):
    with pytest.raises(ConfigError) as e:
        cg(fixtures, handle_pbc=False,
           geometry=Geometry("sphere", radius=2.5)).run()
    assert msg(e) == (
        "cannot use dynamic center of simulation box as the reference "
        "position since periodic boundary conditions are ignored")


# ------------------------------------------------ FrequencyError (errors.rs:48)


def test_frequency_every_zero():
    with pytest.raises(FrequencyError) as e:
        Frequency.every(0)
    assert msg(e) == (
        "action cannot be performed once every '0' frames (frequency has "
        "to be at least 1)")


# ------------------------------------------------- TopologyError (errors.rs:55)


def test_topology_invalid_query_group_hint():
    """InvalidQuery(GroupNotFound) carries the ndx hint (errors.rs:56-62)."""
    from gorder_tpu.select import select_mask
    from gorder_tpu.system import System

    system = System(
        name="t", atom_names=np.array(["A"], dtype="U8"),
        resids=np.array([1]), resnames=np.array(["X"], dtype="U8"),
        serials=np.array([1]), positions=np.zeros((1, 3), np.float32),
        box=np.eye(3, dtype=np.float32))
    with pytest.raises(SelectionError) as e:
        select_mask(system, "group NoSuchGroup")
    assert msg(e) == (
        "group 'NoSuchGroup' does not exist (hint: one of your atom "
        "selection queries uses a name for a group not defined in your "
        "system; maybe an ndx file is missing?)")


@requires_fixtures
def test_topology_empty_group(fixtures):
    with pytest.raises(TopologyError) as e:
        Analysis(
            structure=str(fixtures / "cg.tpr"),
            trajectory=str(fixtures / "split" / "cg1.xtc"),
            analysis_type=AnalysisType.cgorder("resname NOTHING"),
            silent=True, overwrite=True).run()
    assert msg(e) == (
        "group 'Beads' is empty (hint: the query specified for 'beads' "
        "inside 'analysis_type' selects no atoms; is the query correct?)")


@requires_fixtures
def test_topology_atoms_overlap(fixtures):
    q1 = "@membrane and element name carbon"
    q2 = "@membrane and (element name hydrogen or name C22)"
    with pytest.raises(TopologyError) as e:
        Analysis(
            structure=str(fixtures / "pcpepg.tpr"),
            trajectory=str(fixtures / "split" / "pcpepg1.xtc"),
            analysis_type=AnalysisType.aaorder(q1, q2),
            silent=True, overwrite=True).run()
    m = msg(e)
    assert m.endswith(
        f"atoms are part of both 'HeavyAtoms' (query: '{q1}') and "
        f"'Hydrogens' (query: '{q2}')") and m[0].isdigit()


@requires_fixtures
def test_topology_multiple_heads(fixtures):
    with pytest.raises(TopologyError) as e:
        cg(fixtures,
           leaflets=LeafletClassification.global_(
               "@membrane", "name PO4 NC3")).run()
    m = msg(e)
    assert m.startswith("molecule starting with atom index '")
    assert m.endswith("' contains multiple head group atoms")


@requires_fixtures
def test_topology_no_head(fixtures):
    with pytest.raises(TopologyError) as e:
        cg(fixtures,
           leaflets=LeafletClassification.global_("@membrane", "name W")).run()
    m = msg(e)
    assert m.startswith("molecule starting with atom index '")
    assert m.endswith("' contains no head group atom")


@requires_fixtures
def test_topology_no_methyl(fixtures):
    with pytest.raises(TopologyError) as e:
        cg(fixtures,
           leaflets=LeafletClassification.individual(
               "name PO4", "name NOTHING")).run()
    m = msg(e)
    assert m.startswith("molecule starting with atom index '")
    assert m.endswith("' contains no methyl group atom")


def test_topology_no_ua_carbons():
    with pytest.raises(ConfigError) as e:
        AnalysisType.uaorder()
    assert msg(e) == ("no carbons for the calculation of united-atom order "
                      "parameters were specified")


@requires_fixtures
def test_topology_not_enough_atoms_to_cluster(fixtures):
    a = cg(fixtures,
           leaflets=LeafletClassification.clustering("resid 1 and name PO4"))
    a.analysis_type = AnalysisType.cgorder("resid 1")
    with pytest.raises(TopologyError) as e:
        a.run()
    assert msg(e) == (
        "clustering leaflet classification has been requested but only '1' "
        "headgroup atom has been provided; need at least '2' atoms")


# ------------------------------------------------- AnalysisError (errors.rs:121)


PBC_HINT = ("(hint: consider setting 'handle_pbc' to false but make sure "
            "that your lipid molecules are whole)")


def test_analysis_box_errors():
    from gorder_tpu.io.traj import check_box

    with pytest.raises(AnalysisError) as e:
        check_box(np.full((3, 3), np.nan, np.float32))
    assert msg(e) == f"system has undefined simulation box {PBC_HINT}"

    tric = np.eye(3, dtype=np.float32)
    tric[1, 0] = 0.5
    with pytest.raises(AnalysisError) as e:
        check_box(tric)
    assert msg(e) == f"the simulation box is not orthogonal {PBC_HINT}"

    with pytest.raises(AnalysisError) as e:
        check_box(np.zeros((3, 3), np.float32))
    assert msg(e) == (
        f"all dimensions of the simulation box are zero {PBC_HINT}")


# -------------------------------------------- DynamicNormalError (errors.rs:172)


@requires_fixtures
def test_dynamic_normal_not_enough_points(fixtures):
    with pytest.raises(DynamicNormalError) as e:
        cg(fixtures,
           membrane_normal=MembraneNormal.dynamic("name PO4", 0.05)).run()
    m = msg(e)
    assert m.startswith(
        "not enough points for dynamic local membrane normal calculation: "
        "got '")
    assert m.endswith(
        "', need at least '3' points \n(hint: try increasing the 'radius' "
        "in the 'membrane_normal' section of your input configuration "
        "file)")


# --------------------------------------------- ManualNormalError (errors.rs:185)


@requires_fixtures
def test_manual_normal_file_not_found(fixtures):
    with pytest.raises(ManualNormalError) as e:
        cg(fixtures,
           membrane_normal=MembraneNormal.from_file("/no/normals.yaml")).run()
    assert msg(e) == "could not open the normals file '/no/normals.yaml'"


@requires_fixtures
def test_manual_normal_could_not_parse(fixtures, tmp_path):
    bad = tmp_path / "normals.yaml"
    bad.write_text("not: [valid\n")
    with pytest.raises(ManualNormalError) as e:
        cg(fixtures,
           membrane_normal=MembraneNormal.from_file(str(bad))).run()
    assert msg(e).startswith(
        f"could not understand the contents of the normals file '{bad}' (")


@requires_fixtures
def test_manual_normal_molecule_type_not_found(fixtures):
    with pytest.raises(ManualNormalError) as e:
        cg(fixtures, membrane_normal=MembraneNormal.from_map({})).run()
    assert msg(e) == ("molecule type 'POPC' not found in the manual normals "
                      "structure")


@requires_fixtures
def test_manual_normal_no_normals(fixtures):
    with pytest.raises(ManualNormalError) as e:
        cg(fixtures,
           membrane_normal=MembraneNormal.from_map({"POPC": []})).run()
    assert msg(e) == "no membrane normals provided for molecule type 'POPC'"


@requires_fixtures
def test_manual_normal_inconsistent_molecules(fixtures):
    with pytest.raises(ManualNormalError) as e:
        cg(fixtures, membrane_normal=MembraneNormal.from_map(
            {"POPC": [[[0.0, 0.0, 1.0]] * 3]})).run()
    assert msg(e) == (
        "inconsistent number of molecules specified in the normals "
        "structure: expected '242' molecules of type 'POPC', got '3' "
        "molecules in frame '0'")


@requires_fixtures
def test_manual_normal_unknown_molecule_type(fixtures):
    with pytest.raises(ManualNormalError) as e:
        cg(fixtures, membrane_normal=MembraneNormal.from_map(
            {"POPC": [[[0.0, 0.0, 1.0]] * 242], "DLPC": []})).run()
    assert msg(e) == (
        "molecule type 'DLPC' specified in the normals structure not found "
        "in the system (detected molecule types are: 'POPC POPE POPG')")


@requires_fixtures
def test_manual_normal_unexpected_number_of_frames(fixtures):
    with pytest.raises(ManualNormalError) as e:
        cg(fixtures, membrane_normal=MembraneNormal.from_map(
            {"POPC": [[[0.0, 0.0, 1.0]] * 242],
             "POPE": [[[0.0, 0.0, 1.0]] * 242],
             "POPG": [[[0.0, 0.0, 1.0]] * 24]})).run()
    m = msg(e)
    assert m.startswith(
        "number of frames specified in the normals structure ('1') is not "
        "consistent with the number of analyzed frames ('")


# ------------------------------------------------------ WriteError (errors.rs:236)


@requires_fixtures
def test_write_could_not_create_file(fixtures, tmp_path):
    out = tmp_path / "no" / "such" / "dir" / "order.yaml"
    results = cg(fixtures, output_yaml=str(out)).run()
    with pytest.raises(WriteError) as e:
        results.write()
    assert msg(e) == f"could not create file '{out}'"


# ---------------------------------------------- OrderMapWriteError (errors.rs:267)


@requires_fixtures
def test_ordermap_could_not_create_directory(fixtures, tmp_path):
    blocker = tmp_path / "blocker"
    blocker.write_text("a file, not a directory")
    out = blocker / "maps"
    results = cg(fixtures,
                 map=OrderMapParams.parse(
                     {"output_directory": str(out)})).run()
    with pytest.raises(OrderMapError) as e:
        results.write()
    assert msg(e) == f"could not create directory '{out}'"


# ------------------------------------------------------ ConfigError (errors.rs:288)


def test_config_could_not_open():
    with pytest.raises(ConfigError) as e:
        Analysis.from_file("/no/such/config.yaml")
    assert msg(e) == (
        "could not open the configuration file '/no/such/config.yaml'")


def test_config_could_not_parse(tmp_path):
    bad = tmp_path / "c.yaml"
    bad.write_text("structure: [unclosed\n")
    with pytest.raises(ConfigError) as e:
        Analysis.from_file(str(bad))
    assert msg(e).startswith(
        f"could not understand the contents of the configuration file "
        f"'{bad}' (")


def _minimal(**kw):
    defaults = dict(structure="s.tpr", trajectory="t.xtc",
                    analysis_type=AnalysisType.cgorder("@membrane"),
                    silent=True)
    defaults.update(kw)
    return Analysis(**defaults)


def test_config_invalid_step():
    with pytest.raises(ConfigError) as e:
        _minimal(step=0)
    assert msg(e) == (
        "the specified value of 'step' is invalid (must be positive)")


def test_config_invalid_min_samples():
    with pytest.raises(ConfigError) as e:
        _minimal(min_samples=0)
    assert msg(e) == (
        "the specified value of 'min_samples' is invalid (must be positive)")


def test_config_invalid_n_threads():
    with pytest.raises(ConfigError) as e:
        _minimal(n_threads=0)
    assert msg(e) == (
        "the specified value of 'n_threads' is invalid (must be positive)")


def test_config_invalid_begin_end():
    with pytest.raises(ConfigError) as e:
        _minimal(begin=100.0, end=50.0)
    assert msg(e) == (
        "invalid values of 'begin' and 'end' (begin is higher than end)")


@requires_fixtures
def test_config_no_topology(fixtures):
    with pytest.raises(ConfigError) as e:
        Analysis(
            structure=str(fixtures / "pcpepg.gro"),
            trajectory=str(fixtures / "split" / "pcpepg1.xtc"),
            analysis_type=AnalysisType.aaorder("name C1", "name H1"),
            silent=True).run()
    assert msg(e) == (
        f"the input structure file '{fixtures / 'pcpepg.gro'}' does not "
        f"contain topology information (hint: provide a `bonds` file)")


def test_config_invalid_pdb_topology(tmp_path):
    pdb = tmp_path / "dup.pdb"
    pdb.write_text(
        "ATOM      1  C1  LIP A   1       0.000   0.000   0.000\n"
        "ATOM      1  C2  LIP A   1       1.000   0.000   0.000\n"
        "CONECT    1    1\n"
        "END\n")
    from gorder_tpu.io import read_pdb

    with pytest.raises(ConfigError) as e:
        read_pdb(str(pdb))
    assert msg(e) == (
        f"cannot parse topology from the provided PDB file '{pdb}' - "
        f"non-unique atom numbers make the CONECT information ambiguous "
        f"(see: https://www.wwpdb.org/documentation/file-format-content/"
        f"format33/sect10.html)")


def test_config_invalid_structure_format():
    with pytest.raises(ConfigError) as e:
        _minimal(structure="structure.xyz")
    assert msg(e) == (
        "the provided structure file 'structure.xyz' has an unknown, "
        "invalid, or unsupported format")


def test_config_invalid_trajectory_format():
    from gorder_tpu.io.traj import validate_trajectory_formats

    with pytest.raises(ConfigError) as e:
        validate_trajectory_formats(["traj.xyz"])
    assert msg(e) == (
        "the provided trajectory file 'traj.xyz' has an unknown, invalid, "
        "or unsupported format")


def test_config_inconsistent_trajectory_format():
    from gorder_tpu.io.traj import validate_trajectory_formats

    with pytest.raises(ConfigError) as e:
        validate_trajectory_formats(["a.xtc", "b.trr"])
    assert msg(e) == ("the provided trajectory files 'b.trr' and 'a.xtc' "
                      "have inconsistent file format")


def test_config_trajcat_not_supported():
    from gorder_tpu.io.traj import validate_trajectory_formats

    with pytest.raises(ConfigError) as e:
        validate_trajectory_formats(["a.gro", "b.gro"])
    assert msg(e) == (
        "trajectory concatenation is only supported for XTC and TRR files; "
        "please provide only one trajectory file")


def test_config_no_trajectory_file():
    from gorder_tpu.io.traj import validate_trajectory_formats

    with pytest.raises(ConfigError) as e:
        validate_trajectory_formats([])
    assert msg(e) == "no trajectory file has been provided"


@requires_fixtures
def test_config_missing_membrane_normal(fixtures):
    with pytest.raises(ConfigError) as e:
        cg(fixtures,
           membrane_normal=MembraneNormal.dynamic("name PO4", 2.0),
           leaflets=LeafletClassification.individual(
               "name PO4", "name C4A C4B")).run()
    assert msg(e) == (
        "static global membrane normal is not used but leaflet "
        "classification requires it\n(hint: add 'membrane_normal' to the "
        "'leaflets' section of your input configuration file or, if "
        "analyzing a vesicle, \n assign the lipids into leaflets using the "
        "clustering method or manually)")


def test_config_invalid_dynamic_normal_radius():
    with pytest.raises(ConfigError) as e:
        MembraneNormal.dynamic("name P", -1.0)
    assert msg(e) == (
        "the specified radius for dynamic membrane normal calculation must "
        "be larger than 0, not '-1'\n(hint: the recommended value for "
        "'radius' is roughly half of the membrane thickness)")


# ------------------------------------------- OrderMapConfigError (errors.rs:371)


def test_ordermap_invalid_min_samples():
    with pytest.raises(OrderMapError) as e:
        OrderMapParams.parse({"min_samples": 0})
    assert msg(e) == (
        "the specified value of 'min_samples' inside 'ordermap' is invalid "
        "(must be positive)")


def test_ordermap_invalid_bin_size():
    with pytest.raises(OrderMapError) as e:
        OrderMapParams.parse({"bin_size": [0.1, -0.3]})
    assert msg(e) == (
        "invalid bin size of 'ordermap': value is '-0.3', must be positive")


def test_ordermap_bin_too_large():
    from gorder_tpu.core.ordermap import build_map_spec

    params = OrderMapParams.parse({"bin_size": [1.0, 5.0]})
    params.plane = "xy"
    box = np.diag([10.0, 3.0, 6.0]).astype(np.float32)
    with pytest.raises(OrderMapError) as e:
        build_map_spec(params, box)
    assert msg(e) == (
        "invalid bin size of 'ordermap': bin size of '1x5' is larger than "
        "grid span of '10x3'")


def test_ordermap_invalid_box_auto():
    from gorder_tpu.core.ordermap import build_map_spec

    params = OrderMapParams.parse({"bin_size": [0.1, 0.1]})
    params.plane = "xy"
    with pytest.raises(OrderMapError) as e:
        build_map_spec(params, None)
    assert msg(e) == (
        "simulation box and periodic boundary conditions are ignored => "
        "unable to automatically set ordermap dimensions (hint: set "
        "ordermap dimensions manually)")


@requires_fixtures
def test_ordermap_invalid_plane_auto(fixtures):
    with pytest.raises(OrderMapError) as e:
        cg(fixtures,
           membrane_normal=MembraneNormal.dynamic("name PO4", 2.0),
           map=OrderMapParams.parse({"bin_size": [1, 1]}))
    assert msg(e) == (
        "membrane normal is not a static global dimension => unable to "
        "automatically set ordermap plane (hint: set ordermap plane "
        "manually)")


def test_ordermap_invalid_output_directory():
    with pytest.raises(OrderMapError) as e:
        OrderMapParams.parse({"output_directory": "."})
    assert msg(e) == (
        "output directory specified for saving ordermaps cannot be the "
        "current directory (provided path: '.')")


# ------------------------------------------- ErrorEstimationError (errors.rs:413)


def test_error_estimation_not_enough_blocks():
    with pytest.raises(ErrorEstimationError) as e:
        EstimateError.parse({"n_blocks": 1})
    assert msg(e) == (
        "number of blocks for error estimation must be at least 2, not '1'")


@requires_fixtures
def test_error_estimation_not_enough_data(fixtures):
    with pytest.raises(ErrorEstimationError) as e:
        cg(fixtures, estimate_error=EstimateError(n_blocks=500)).run()
    m = msg(e)
    assert m.startswith("read '") and m.endswith(
        "' trajectory frame(s) which is fewer than the number of blocks "
        "('500')")


# -------------------------------------------------------- BondsError (errors.rs:426)


def test_bonds_file_not_found():
    from gorder_tpu.io.bnd import parse_bnd

    with pytest.raises(BondsError) as e:
        parse_bnd("/no/such/bonds.bnd", 10)
    assert msg(e) == "could not open the bonds file '/no/such/bonds.bnd'"


def test_bonds_could_not_parse(tmp_path):
    from gorder_tpu.io.bnd import parse_bnd

    bnd = tmp_path / "b.bnd"
    bnd.write_text("1 abc\n")
    with pytest.raises(BondsError) as e:
        parse_bnd(str(bnd), 10)
    # the reference's message reads "could read" (verbatim parity,
    # errors.rs:433)
    assert msg(e) == "could read 'abc' as an atom serial number"


def test_bonds_self_bonding(tmp_path):
    from gorder_tpu.io.bnd import parse_bnd

    bnd = tmp_path / "b.bnd"
    bnd.write_text("3 3\n")
    with pytest.raises(BondsError) as e:
        parse_bnd(str(bnd), 10)
    assert msg(e) == (
        "atom with serial number '3' claims to be bonded to itself which "
        "does not make sense")


def test_bonds_atom_not_found(tmp_path):
    from gorder_tpu.io.bnd import parse_bnd

    bnd = tmp_path / "b.bnd"
    bnd.write_text("1 99\n")
    with pytest.raises(BondsError) as e:
        parse_bnd(str(bnd), 10)
    assert msg(e) == (
        "atom with serial number '99' does not exist (the system only "
        "contains '10' atoms)")


# --------------------------------- NdxLeafletClassificationError (errors.rs:445)


def _ndx_leaflets(fixtures, tmp_path, content, n_files=1, frequency=None):
    paths = []
    for i in range(n_files):
        ndx = tmp_path / f"leaflets{i}.ndx"
        ndx.write_text(content)
        paths.append(str(ndx))
    leaflets = LeafletClassification.from_ndx(
        paths, "name PO4", "Upper", "Lower")
    if frequency is not None:
        leaflets.frequency = frequency
    return cg(fixtures, leaflets=leaflets)


UPPER_LOWER_ALL = None  # populated lazily: all PO4 serials


def _po4_serials(fixtures):
    global UPPER_LOWER_ALL
    if UPPER_LOWER_ALL is None:
        from gorder_tpu.analysis import load_structure
        from gorder_tpu.select import select_mask

        system = load_structure(cg(fixtures))
        serials = np.nonzero(select_mask(system, "name PO4"))[0] + 1
        UPPER_LOWER_ALL = serials
    return UPPER_LOWER_ALL


def _ndx_content(fixtures, upper_name="Upper", lower_name="Lower",
                 drop_first=False):
    serials = _po4_serials(fixtures)
    half = len(serials) // 2
    upper = serials[:half]
    lower = serials[half:]
    if drop_first:
        upper = upper[1:]
    fmt = lambda arr: "\n".join(  # noqa: E731
        " ".join(str(s) for s in arr[i:i + 12])
        for i in range(0, len(arr), 12))
    return (f"[ {upper_name} ]\n{fmt(upper)}\n"
            f"[ {lower_name} ]\n{fmt(lower)}\n")


@requires_fixtures
def test_ndx_leaflet_invalid_name(fixtures, tmp_path):
    content = _ndx_content(fixtures).replace("[ Upper ]", "[ Up&per ]")
    a = _ndx_leaflets(fixtures, tmp_path, content)
    a.leaflets.upper_leaflet = "Up&per"
    with pytest.raises(NdxLeafletError) as e:
        a.run()
    path = tmp_path / "leaflets0.ndx"
    assert msg(e) == (
        f"group name 'Up&per' specified in an ndx file '{path}' is invalid "
        f"and cannot be used (hint: following characters are not allowed "
        f"in group names: '\"&|!@()<>=)")


@requires_fixtures
def test_ndx_leaflet_duplicate_name(fixtures, tmp_path):
    content = _ndx_content(fixtures) + "[ Upper ]\n1\n"
    with pytest.raises(NdxLeafletError) as e:
        _ndx_leaflets(fixtures, tmp_path, content).run()
    path = tmp_path / "leaflets0.ndx"
    assert msg(e) == (
        f"group 'Upper' is defined multiple times in an ndx file '{path}'")


@requires_fixtures
def test_ndx_leaflet_group_not_found(fixtures, tmp_path):
    content = _ndx_content(fixtures, upper_name="NotUpper")
    with pytest.raises(NdxLeafletError) as e:
        _ndx_leaflets(fixtures, tmp_path, content).run()
    path = tmp_path / "leaflets0.ndx"
    assert msg(e) == (
        f"group 'Upper' for selecting upper-leaflet molecules was not "
        f"found in the ndx file '{path}'")


@requires_fixtures
def test_ndx_leaflet_assignment_not_found(fixtures, tmp_path):
    content = _ndx_content(fixtures, drop_first=True)
    with pytest.raises(NdxLeafletError) as e:
        _ndx_leaflets(fixtures, tmp_path, content).run()
    head = int(_po4_serials(fixtures)[0]) - 1
    assert msg(e) == (
        f"could not find leaflet assignment for molecule index '0' (head "
        f"index '{head}')\n(hint: head identifier index '{head}' is "
        f"missing from both specified ndx groups)")


@requires_fixtures
def test_ndx_leaflet_unexpected_number_of_files(fixtures, tmp_path):
    content = _ndx_content(fixtures)
    a = _ndx_leaflets(fixtures, tmp_path, content, n_files=3,
                      frequency=Frequency.once())
    with pytest.raises(NdxLeafletError) as e:
        a.run()
    m = msg(e)
    assert m.startswith(
        "number of ndx files provided ('3') is not consistent with the "
        "number of analyzed frames ('")
    assert m.endswith(
        "')\n(leaflet assignment was supposed to be performed once at the "
        "start of the analysis, therefore there should be exactly '1' ndx "
        "file(s) provided)")


# ------------------------------ ManualLeafletClassificationError (errors.rs:485)


@requires_fixtures
def test_manual_leaflet_file_not_found(fixtures):
    with pytest.raises(ManualLeafletError) as e:
        cg(fixtures,
           leaflets=LeafletClassification.from_file("/no/lf.yaml")).run()
    assert msg(e) == (
        "could not open the leaflet assignment file '/no/lf.yaml'")


@requires_fixtures
def test_manual_leaflet_could_not_parse(fixtures, tmp_path):
    bad = tmp_path / "lf.yaml"
    bad.write_text("x: [unclosed\n")
    with pytest.raises(ManualLeafletError) as e:
        cg(fixtures,
           leaflets=LeafletClassification.from_file(str(bad))).run()
    assert msg(e).startswith(
        f"could not understand the contents of the leaflet assignment "
        f"file '{bad}' (")


@requires_fixtures
def test_manual_leaflet_molecule_type_not_found(fixtures):
    with pytest.raises(ManualLeafletError) as e:
        cg(fixtures, leaflets=LeafletClassification.from_map({})).run()
    assert msg(e) == (
        "molecule type 'POPC' not found in the leaflet assignment "
        "structure")


@requires_fixtures
def test_manual_leaflet_inconsistent_molecules(fixtures):
    with pytest.raises(ManualLeafletError) as e:
        cg(fixtures, leaflets=LeafletClassification.from_map(
            {"POPC": [[1, 0, 1]]})).run()
    assert msg(e) == (
        "inconsistent number of molecules specified in the leaflet "
        "assignment: expected '242' molecules of type 'POPC', got '3' "
        "molecules in assignment frame '0'")


@requires_fixtures
def test_manual_leaflet_empty_assignment(fixtures):
    with pytest.raises(ManualLeafletError) as e:
        cg(fixtures, leaflets=LeafletClassification.from_map(
            {"POPC": []})).run()
    assert msg(e) == (
        "no leaflet assignment data provided for molecule type 'POPC'")


@requires_fixtures
def test_manual_leaflet_unexpected_number_of_frames(fixtures):
    with pytest.raises(ManualLeafletError) as e:
        cg(fixtures, leaflets=LeafletClassification.from_map(
            {"POPC": [[1] * 242], "POPE": [[1] * 242],
             "POPG": [[1] * 24]})).run()
    m = msg(e)
    assert m.startswith(
        "number of frames specified in the leaflet assignment structure "
        "('1') is not consistent with the number of analyzed frames ('")
    assert "(leaflet assignment was supposed to be performed every " \
        "analyzed frame, therefore there should be exactly '" in m


@requires_fixtures
def test_manual_leaflet_unknown_molecule_type(fixtures):
    with pytest.raises(ManualLeafletError) as e:
        cg(fixtures, leaflets=LeafletClassification.from_map(
            {"POPC": [[1] * 242], "DOPC": [[1]]})).run()
    assert msg(e) == (
        "molecule type 'DOPC' specified in the leaflet assignment "
        "structure not found in the system (detected molecule types are: "
        "'POPC POPE POPG')")


# -------------------------------------------------------- ClusterError (errors.rs:530)


def test_cluster_could_not_match_leaflets():
    from gorder_tpu.core.clustering import SpectralOrienter

    orienter = SpectralOrienter(np.arange(8))
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    orienter.orient(labels)
    # scramble: half of each previous cluster flips — no candidate reaches
    # the 80% overlap limit either way
    scrambled = np.array([0, 0, 1, 1, 0, 0, 1, 1])
    with pytest.raises(ClusterError) as e:
        orienter.orient(scrambled)
    assert msg(e) == (
        "clustering leaflet classification failed\ndetails: when comparing "
        "current frame to previous frame, the previously identified "
        "leaflets show >80% lipid composition change\nhint: this may be "
        "caused by either of several issues:\n  - leaflets identified "
        "incorrectly => consider manual leaflet assignment,\n  - too rapid "
        "flip-flop => increase classification frequency,\n  - frames too "
        "far apart => increase classification frequency")


# ----------------------------------------------------------------- ledger


UNREACHABLE = """Reference variants with no reachable counterpart here:
- TopologyError::InconsistentNumberOfMethyls — molecule-type classification
  guarantees identical relative methyl indices across instances.
- TopologyError::UndefinedBox/NotOrthogonalBox/ZeroBox — the same checks run
  per frame (AnalysisError wording, io/traj.py check_box) and at structure
  load; the topology-stage duplicates collapse into one site.
- AnalysisError::UndefinedPosition — GRO/XTC frames always carry positions.
- AnalysisError::InvalidGlobalMembraneCenter/InvalidLocalMembraneCenter —
  Bai–Breen circular means of non-empty masked sets are always finite.
- DynamicNormalError::SVDFailed — closed-form 3x3 eigh cannot fail to
  converge the way nalgebra's iterative SVD can.
- ManualNormalError::FrameNotFound / ManualLeafletClassificationError::
  FrameNotFound / NdxLeafletClassificationError::FrameNotFound — frame
  tables are validated up front (UnexpectedNumberOf*), never indexed past
  their end mid-run.
- WriteError::CouldNotWriteYaml/CouldNotExportAnalysis/CouldNotWriteResults/
  CouldNotWriteLine/CouldNotCreatePlotScript, OrderMapWriteError::
  CouldNotRemoveDirectory/CouldNotCreateFile/CouldNotWriteLine — host-OS
  failures mid-write (disk full, permissions yanked); the write layer
  surfaces the OS error with the file path, tested for CouldNotCreateFile
  and CouldNotCreateDirectory above.
- ConfigError::DeprecationError — the deprecated PDB/NC/DCD trajectory path
  has its own message (io/traj.py, tested in test_io_traj.py).
- ClusterError::SloppyFirstFrameFail — the nondeterministic sloppy path was
  redesigned away (deterministic Nystrom + precise clustering).
"""


def test_unreachable_ledger_is_documented():
    assert "InconsistentNumberOfMethyls" in UNREACHABLE
