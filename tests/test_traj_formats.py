"""Alternative structure/trajectory format paths through the full pipeline."""

import numpy as np
import pytest

from gorder_tpu.input import Analysis, AnalysisType
from gorder_tpu.present import write_yaml

from .golden import assert_eq_order


def test_pdb_structure_with_conect(fixtures, tmp_path):
    """PDB structure + CONECT bonds reproduces the TPR-based golden."""
    analysis = Analysis(
        structure=str(fixtures / "cg.pdb"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_basic.yaml"))


def test_pqr_structure_with_bnd(fixtures, tmp_path):
    analysis = Analysis(
        structure=str(fixtures / "cg.pqr"),
        bonds=str(fixtures / "cg.bnd"),
        trajectory=str(fixtures / "split" / "cg*.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out), str(fixtures / "cg_order_basic.yaml"))


def test_trr_trajectory(fixtures):
    """cg3.trr analyzed directly (the reference supports TRR input)."""
    analysis = Analysis(
        structure=str(fixtures / "cg.tpr"),
        trajectory=str(fixtures / "split" / "cg3.trr"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True,
    )
    results = analysis.run()
    assert results.n_analyzed_frames == 1
    assert np.isfinite(results.average_order.total.value)


def test_gro_trajectory(fixtures, tmp_path):
    """A multi-frame GRO file used as trajectory."""
    from gorder_tpu.io import native, read_gro
    from gorder_tpu.io.gro import write_gro

    # synthesize a 3-frame gro trajectory from decoded xtc frames
    system = read_gro(str(fixtures / "cg.gro"))
    info = native.xtc_scan(str(fixtures / "split" / "cg1.xtc"))
    coords, boxes, times, steps = native.xtc_decode(
        str(fixtures / "split" / "cg1.xtc"), info["offsets"][:3],
        system.n_atoms)
    path = tmp_path / "traj.gro"
    with open(path, "w") as out:
        pass
    for f in range(3):
        tmp = tmp_path / f"frame{f}.gro"
        write_gro(str(tmp), system, positions=coords[f], box=np.diag(
            boxes[f, [0, 1, 2], [0, 1, 2]]),
            comment=f"frame t= {times[f]:.1f}")
        with open(path, "a") as out:
            out.write(tmp.read_text())

    xtc_ref = Analysis(
        structure=str(fixtures / "cg.gro"),
        bonds=str(fixtures / "cg.bnd"),
        trajectory=str(fixtures / "split" / "cg1.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        end=float(times[2]),
        silent=True, overwrite=True,
    ).run()
    gro_run = Analysis(
        structure=str(fixtures / "cg.gro"),
        bonds=str(fixtures / "cg.bnd"),
        trajectory=str(path),
        analysis_type=AnalysisType.cgorder("@membrane"),
        silent=True, overwrite=True,
    ).run()
    assert gro_run.n_analyzed_frames == 3
    # gro stores 3 decimals (same as xtc precision 100 data here → tiny diff)
    assert abs(gro_run.average_order.total.value
               - xtc_ref.average_order.total.value) < 2e-3


def test_gro_concatenation_rejected(fixtures, tmp_path):
    """GRO trajectory concatenation is rejected
    (analysis.rs:352-356 TrajCatNotSupported)."""
    import shutil

    import pytest

    from gorder_tpu.errors import ConfigError
    from gorder_tpu.io.traj import Trajectory

    g1 = tmp_path / "a.gro"
    g2 = tmp_path / "b.gro"
    src = fixtures / "cg.gro" if (fixtures / "cg.gro").exists() else None
    for g in (g1, g2):
        if src:
            shutil.copy(src, g)
        else:
            g.write_text("t\n1\n    1W      W    1   0.0   0.0   0.0\n"
                         "10 10 10\n")
    with pytest.raises(ConfigError) as e:
        Trajectory([str(g1), str(g2)])
    assert "trajectory concatenation is only supported for XTC and TRR" \
        in str(e.value)


def test_mixed_trajectory_formats_rejected(fixtures):
    """Mixing XTC and TRR is rejected
    (analysis.rs:364-372 InconsistentTrajectoryFormat)."""
    import pytest

    from gorder_tpu.errors import ConfigError
    from gorder_tpu.io.traj import Trajectory

    with pytest.raises(ConfigError) as e:
        Trajectory([str(fixtures / "split" / "cg1.xtc"),
                    str(fixtures / "split" / "cg3.trr")])
    assert "inconsistent file format" in str(e.value)


def test_deprecated_trajectory_formats_rejected(tmp_path):
    """PDB/NC/DCD/LAMMPSTRJ trajectories get the v0.7 deprecation message
    (analysis.rs:358-360)."""
    import pytest

    from gorder_tpu.errors import ConfigError
    from gorder_tpu.io.traj import Trajectory

    for ext in (".pdb", ".nc", ".dcd", ".lammpstrj"):
        p = tmp_path / f"traj{ext}"
        p.write_text("")
        with pytest.raises(ConfigError) as e:
            Trajectory([str(p)])
        assert "since 'gorder' v0.7" in str(e.value)
        assert "switch to version 0.6" in str(e.value)


def test_unknown_trajectory_format_rejected(tmp_path):
    import pytest

    from gorder_tpu.errors import ConfigError
    from gorder_tpu.io.traj import Trajectory

    p = tmp_path / "traj.foo"
    p.write_text("")
    with pytest.raises(ConfigError) as e:
        Trajectory([str(p)])
    assert "unknown, invalid, or unsupported format" in str(e.value)
