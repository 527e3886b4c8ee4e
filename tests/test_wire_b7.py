"""The b7 bond-difference wire format (native/xdr.cpp xtc_decode_b7).

b7 ships only the per-bond integer coordinate DIFFERENCES (7-bit residuals
vs a per-batch median base + a sparse escape channel) — eligible on the
pure bond-order path where no subsystem needs absolute positions (mirrors
the reference's hot loop, src/analysis/topology/bond.rs:396-446, which
consumes only bond vectors). The integers are bit-exact; the f32 bond
vector is one rounding of the exact integer difference, which differs from
the position-pair formulation at the last-ulp level — the end-to-end
assertions below pin the output equality empirically on the
original-precision AA fixture.
"""

import logging

import numpy as np
import pytest

from gorder_tpu.io.native import b7_stride
from gorder_tpu.io.traj import Trajectory

from .conftest import requires_fixtures


def _aa_bond_slots(fixtures):
    """The production pipeline's compiled bond slot arrays for the AA
    pcpepg system (what _run_bond_based hands to _run_batches)."""
    from gorder_tpu.analysis import (_build_atom_space, _prepare_bond_kinds,
                                     load_structure)
    from gorder_tpu.input import Analysis, AnalysisType

    analysis = Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=str(fixtures / "pcpepg_selected.xtc"),
        analysis_type=AnalysisType.aaorder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        silent=True)
    system = load_structure(analysis)
    _, compiled = _prepare_bond_kinds(system, analysis)
    space, remap = _build_atom_space(system, analysis,
                                     [compiled.atom_a, compiled.atom_b])
    return space, remap(compiled.atom_a), remap(compiled.atom_b)


@requires_fixtures
def test_b7_roundtrip_integers(fixtures):
    """Reconstruction is bit-exact: base + 7-bit residuals + escapes give
    back exactly the int32 bond differences of the quantized absolutes."""
    import jax.numpy as jnp

    from gorder_tpu.analysis import _b7_impl

    space, bond_a, bond_b = _aa_bond_slots(fixtures)
    traj = Trajectory(str(fixtures / "pcpepg_selected.xtc"))
    idx = traj.select_frames(None, None, 1)

    c16, ip, boxes, times, steps = traj.read_frames_quantized(idx, space)
    q = c16.astype(np.int64)
    d_true = (q[:, bond_b] - q[:, bond_a]).astype(np.int32)

    esc_cap = 2048
    pk = np.zeros((len(idx), b7_stride(len(bond_a))), np.uint8)
    eg = np.zeros((len(idx), esc_cap), np.uint16)
    ev = np.zeros((len(idx), esc_cap), np.int16)
    res, nesc = traj.read_frames_b7(idx, space, bond_a, bond_b, pk, eg, ev)
    assert res is not None, f"escape demand {nesc} exceeded {esc_cap}"
    base, inv_prec, b_boxes, b_times, b_steps = res

    d_rec = np.asarray(_b7_impl(jnp.asarray(pk), jnp.asarray(eg),
                                jnp.asarray(ev), jnp.asarray(base)))
    np.testing.assert_array_equal(d_rec, d_true)
    np.testing.assert_array_equal(b_boxes, boxes)
    np.testing.assert_array_equal(b_steps, steps)


@requires_fixtures
def test_b7_thread_fanout_invariance(fixtures):
    """Identical packed stream, escapes, and base across decoder thread
    counts (the reference's thread-invariance model, tests_aa.rs:48-77,
    applied to the codec's frame fan-out)."""
    space, bond_a, bond_b = _aa_bond_slots(fixtures)
    traj = Trajectory(str(fixtures / "pcpepg_selected.xtc"))
    idx = traj.select_frames(None, None, 1)

    esc_cap = 2048
    ref = None
    for nt in (1, 2, 5):
        pk = np.zeros((len(idx), b7_stride(len(bond_a))), np.uint8)
        eg = np.zeros((len(idx), esc_cap), np.uint16)
        ev = np.zeros((len(idx), esc_cap), np.int16)
        res, _ = traj.read_frames_b7(idx, space, bond_a, bond_b, pk, eg, ev,
                                     n_threads=nt)
        assert res is not None
        if ref is None:
            ref = (pk, eg, ev, res[0])
        else:
            np.testing.assert_array_equal(pk, ref[0])
            np.testing.assert_array_equal(eg, ref[1])
            np.testing.assert_array_equal(ev, ref[2])
            np.testing.assert_array_equal(res[0], ref[3])


@requires_fixtures
def test_b7_escape_capacity_overflow(fixtures):
    """Undersized escape buffers report the true demand and a None payload
    (the pipeline then resizes via _probe_b7 or falls back per batch)."""
    space, bond_a, bond_b = _aa_bond_slots(fixtures)
    traj = Trajectory(str(fixtures / "pcpepg_selected.xtc"))
    idx = traj.select_frames(None, None, 1)

    big = np.zeros((len(idx), 2048), np.uint16)
    pk = np.zeros((len(idx), b7_stride(len(bond_a))), np.uint8)
    res, demand = traj.read_frames_b7(
        idx, space, bond_a, bond_b, pk, big,
        np.zeros((len(idx), 2048), np.int16))
    assert res is not None and demand > 0

    tiny = max(1, demand // 4)
    res2, demand2 = traj.read_frames_b7(
        idx, space, bond_a, bond_b, pk,
        np.zeros((len(idx), tiny), np.uint16),
        np.zeros((len(idx), tiny), np.int16))
    assert res2 is None
    assert demand2 == demand  # full demand reported, not clipped


def _run_aa(fixtures, tmp_path, monkeypatch, wire, write=False, **extra):
    from gorder_tpu.input import Analysis, AnalysisType
    from gorder_tpu.present import write_yaml

    if wire:
        monkeypatch.setenv("GORDER_TPU_WIRE", wire)
    else:
        monkeypatch.delenv("GORDER_TPU_WIRE", raising=False)
    analysis = Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=str(fixtures / "pcpepg_selected.xtc"),
        analysis_type=AnalysisType.aaorder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        silent=True, overwrite=True, **extra)
    results = analysis.run()
    if write:
        results.write()   # export (collect) files
    out = tmp_path / f"aa_{wire or 'auto'}.yaml"
    write_yaml(results, str(out))
    return out.read_bytes()


@requires_fixtures
def test_b7_pipeline_byte_identical(fixtures, tmp_path, monkeypatch):
    """End-to-end AA on the original-precision fixture: the b7 wire's
    output is byte-identical to the f32 wire's, and the auto probe picks
    b7 for this pure bond-order run (it is the smallest eligible wire)."""
    y_f32 = _run_aa(fixtures, tmp_path, monkeypatch, "f32")
    y_b7 = _run_aa(fixtures, tmp_path, monkeypatch, "b7")
    assert y_b7 == y_f32

    import gorder_tpu.analysis as mod

    picked = {}
    orig = mod._pick_wire_format

    def spy(*a, **kw):
        out = orig(*a, **kw)
        picked["wire"] = out[0]
        return out

    monkeypatch.setattr(mod, "_pick_wire_format", spy)
    # pin the bytes-minimizing policy: on a real accelerator tier the
    # measured link rate may legitimately select i16 instead (rate-aware
    # selection, tests/test_io_traj.py)
    monkeypatch.setattr(mod, "_measure_link_mbps", lambda *a, **kw: None)
    y_auto = _run_aa(fixtures, tmp_path, monkeypatch, None)
    assert picked["wire"] == "b7"
    assert y_auto == y_f32


@requires_fixtures
def test_b7_forced_but_ineligible_falls_back(fixtures, tmp_path,
                                             monkeypatch, caplog):
    """GORDER_TPU_WIRE=b7 on a run that needs absolute coordinates
    (local leaflet classification: cylinder-local membrane centers)
    warns and probes the coordinate formats — results still match the
    auto-picked integer wire exactly (same formulation)."""
    from gorder_tpu.input import LeafletClassification

    leaf = dict(leaflets=LeafletClassification.local(
        "@membrane", "name P", 2.5))
    y_auto = _run_aa(fixtures, tmp_path, monkeypatch, None, **leaf)
    with caplog.at_level(logging.WARNING, logger="gorder"):
        y_b7 = _run_aa(fixtures, tmp_path, monkeypatch, "b7", **leaf)
    assert y_b7 == y_auto
    assert any("not" in r.message and "eligible" in r.message
               for r in caplog.records)


def _yaml_values(data: bytes):
    vals = []
    for line in data.decode().splitlines():
        for tok in line.replace(":", " ").split():
            try:
                vals.append(float(tok))
            except ValueError:
                pass
    return np.asarray(vals)


def test_b7_global_leaflets_channel(fixtures, tmp_path, monkeypatch):
    """Global every-frame leaflet runs are BITWISE identical across every
    INTEGER wire format — the entire set the probe ever selects for XTC
    input: classification on every wire consumes the decoder's per-frame
    Bai-Breen COG (the b7g wire ships it as a side channel,
    native/xdr.cpp emit_channels; coordinate wires run the standalone
    xtc_cog_axis pass), the b7g aux-channel heads dequantize
    bit-identically to a coordinate gather, and every integer wire's
    bond vector is the single rounding of the exact integer difference
    (core/order.py quantized path). This upgraded the round-3 semantic
    4-dp contract to byte equality, which is what lets the channel wire
    default ON (GORDER_TPU_B7_LEAFLETS=0 restores the device-COG path).
    The f32 wire (TRR/GRO input, or a debug force on XTC) has no
    integers and keeps the position-pair difference — it may differ by
    one last-ulp rounding per sample (test_b7_formulation_bound), at
    most one 4-dp print quantum on any aggregate."""
    import numpy as np

    from gorder_tpu.input import LeafletClassification

    leaf = dict(leaflets=LeafletClassification.global_(
        "@membrane", "name P"))
    y_b7 = _run_aa(fixtures, tmp_path, monkeypatch, "b7", **leaf)
    y_s6 = _run_aa(fixtures, tmp_path, monkeypatch, "s6", **leaf)
    assert y_s6 == y_b7
    y_i16 = _run_aa(fixtures, tmp_path, monkeypatch, "i16", **leaf)
    assert y_i16 == y_b7
    y_auto = _run_aa(fixtures, tmp_path, monkeypatch, None, **leaf)
    assert y_auto == y_b7
    y_f32 = _run_aa(fixtures, tmp_path, monkeypatch, "f32", **leaf)
    a, b = _yaml_values(y_f32), _yaml_values(y_b7)
    assert len(a) == len(b)
    diff = np.abs(a - b)
    assert diff.max() <= 1.001e-4, f"max diff {diff.max()}"
    assert (diff == 0).mean() >= 0.999


def test_b7_global_leaflets_channel_flip(fixtures, tmp_path, monkeypatch):
    """The flip option inverts the channel-computed classes the same way
    it inverts the coordinate-path classes (leaflets.rs flip); same
    bitwise cross-wire contract as the unflipped case."""
    from gorder_tpu.input import LeafletClassification

    leaf = LeafletClassification.global_("@membrane", "name P")
    leaf.flip = True
    y_s6 = _run_aa(fixtures, tmp_path, monkeypatch, "s6", leaflets=leaf)
    y_b7 = _run_aa(fixtures, tmp_path, monkeypatch, "b7", leaflets=leaf)
    assert y_b7 == y_s6


def test_channel_cog_opt_out(fixtures, tmp_path, monkeypatch):
    """GORDER_TPU_B7_LEAFLETS=0 restores the round-3 device-COG path:
    coordinate wires classify against the device-computed membrane
    center and the b7g wire is not selected."""
    import gorder_tpu.analysis as mod
    from gorder_tpu.input import LeafletClassification

    monkeypatch.setenv("GORDER_TPU_B7_LEAFLETS", "0")
    leaf = dict(leaflets=LeafletClassification.global_(
        "@membrane", "name P"))
    y_off = _run_aa(fixtures, tmp_path, monkeypatch, None, **leaf)
    assert getattr(mod, "_LAST_WIRE")[0] != "b7"
    monkeypatch.delenv("GORDER_TPU_B7_LEAFLETS", raising=False)
    y_on = _run_aa(fixtures, tmp_path, monkeypatch, None, **leaf)
    # same physics either way: any difference is at most one 4-dp print
    # quantum from a float-noise COG difference
    a, b = _yaml_values(y_off), _yaml_values(y_on)
    assert len(a) == len(b)
    assert np.abs(a - b).max() <= 2.0e-4


@requires_fixtures
def test_b7_global_leaflets_channel_golden_exact(fixtures, tmp_path,
                                                 monkeypatch):
    """The b7g channel wire reproduces the reference's golden output
    byte-for-byte on the asymmetric CG global-leaflets fixture
    (tests/files/asymmetric/cg_order_asymmetric.yaml) — the carve-out in
    docs/PERFORMANCE.md is cross-WIRE bitwise equality, not golden
    parity: both COG computations sit within float noise of the
    reference's f64 one, and no head straddles the center plane here."""
    import gorder_tpu.analysis as mod
    from gorder_tpu.input import Analysis, AnalysisType, LeafletClassification
    from gorder_tpu.present import write_yaml

    from .golden import assert_eq_order

    monkeypatch.setenv("GORDER_TPU_B7_LEAFLETS", "1")
    monkeypatch.setenv("GORDER_TPU_WIRE", "b7")
    results = Analysis(
        structure=str(fixtures / "asymmetric" / "cg_asym.tpr"),
        trajectory=str(fixtures / "asymmetric" / "cg_asym.xtc"),
        analysis_type=AnalysisType.cgorder("@membrane"),
        leaflets=LeafletClassification.global_("@membrane", "name PO4"),
        silent=True, overwrite=True).run()
    wire = getattr(mod, "_LAST_WIRE", None)
    assert wire and wire[0] == "b7", f"channel wire not engaged: {wire}"
    out = tmp_path / "order.yaml"
    write_yaml(results, str(out))
    assert_eq_order(str(out),
                    str(fixtures / "asymmetric" / "cg_order_asymmetric.yaml"),
                    exact=True)


@requires_fixtures
def test_b7_formulation_bound(fixtures):
    """The single-rounding bond vector f32(d)·s differs from the
    position-pair formulation fl(fl(qb·s) − fl(qa·s)) by at most ~2 ulp of
    the box span — the documented numerical contract of the b7 wire
    (native/xdr.cpp xtc_decode_b7 commentary)."""
    space, bond_a, bond_b = _aa_bond_slots(fixtures)
    traj = Trajectory(str(fixtures / "pcpepg_selected.xtc"))
    idx = traj.select_frames(None, None, 1)

    c16, ip, boxes, *_ = traj.read_frames_quantized(idx, space)
    pos = c16.astype(np.float32) * ip[:, None, None]
    d_pair = pos[:, bond_b] - pos[:, bond_a]
    q = c16.astype(np.int64)
    d_single = ((q[:, bond_b] - q[:, bond_a]).astype(np.float32)
                * ip[:, None, None])

    span = float(boxes[:, [0, 1, 2], [0, 1, 2]].max())
    bound = 2.0 * np.spacing(np.float32(span))
    assert float(np.abs(d_pair - d_single).max()) <= bound


@requires_fixtures
def test_b7_plane_manual_from_map_byte_identical(fixtures, tmp_path,
                                                 monkeypatch):
    """Manual (!FromMap) leaflet classes are pure host data, so the run
    rides the b7 bond-vector wire with a host class plane (reference
    src/analysis/leaflets.rs manual variants) — output byte-identical to
    the int16 coordinate wire (both take the single-rounding integer
    bond-difference path), and the auto probe picks b7."""
    import gorder_tpu.analysis as mod
    from gorder_tpu.analysis import _prepare_bond_kinds, load_structure
    from gorder_tpu.input import Analysis, AnalysisType, LeafletClassification

    probe = Analysis(
        structure=str(fixtures / "pcpepg.tpr"),
        trajectory=str(fixtures / "pcpepg_selected.xtc"),
        analysis_type=AnalysisType.aaorder(
            "@membrane and element name carbon",
            "@membrane and element name hydrogen"),
        silent=True)
    kinds, _ = _prepare_bond_kinds(load_structure(probe), probe)
    rng = np.random.default_rng(7)
    assignment = {
        k.name: [rng.integers(0, 2, k.n_molecules).tolist()
                 for _ in range(4)]
        for k in kinds
    }

    def run(wire):
        leaflets = LeafletClassification.from_map(
            {k: [list(f) for f in v] for k, v in assignment.items()})
        return _run_aa(fixtures, tmp_path, monkeypatch, wire,
                       leaflets=leaflets)

    y_i16 = run("i16")
    assert getattr(mod, "_LAST_WIRE")[0] == "i16"
    y_auto = run(None)
    assert getattr(mod, "_LAST_WIRE")[0] == "b7", \
        f"manual leaflet run did not ride b7: {mod._LAST_WIRE}"
    assert y_auto == y_i16


@requires_fixtures
def test_b7_plane_frequency_global_byte_identical(fixtures, tmp_path,
                                                  monkeypatch):
    """Frequency-gated (!every 2) global leaflet classification re-runs on
    assignment frames only (src/input/frequency.rs:13-55): the run rides
    b7 + sparse assignment-frame coordinate side-reads, byte-identical to
    the int16 coordinate wire (both take the single-rounding integer
    bond-difference path) across multiple batches (carried state)."""
    import gorder_tpu.analysis as mod
    from gorder_tpu.input import (Analysis, AnalysisType, Frequency,
                                  LeafletClassification)

    # two frames per batch: exercises carried state between batches and
    # a sparse read in each
    monkeypatch.setenv("GORDER_TPU_BATCH_SIZE", "2")

    def run(wire):
        leaflets = LeafletClassification.global_(
            "@membrane", "name P").with_frequency(Frequency.every(2))
        return _run_aa(fixtures, tmp_path, monkeypatch, wire,
                       leaflets=leaflets)

    y_i16 = run("i16")
    assert getattr(mod, "_LAST_WIRE")[0] == "i16"
    y_b7 = run("b7")
    assert getattr(mod, "_LAST_WIRE")[0] == "b7", \
        f"frequency-gated run did not ride b7: {mod._LAST_WIRE}"  # forced: at batch 2 the per-batch base amortizes poorly and the bytes policy correctly prefers d8
    assert y_b7 == y_i16


@requires_fixtures
def test_b7_plane_frequency_once_byte_identical(fixtures, tmp_path,
                                                monkeypatch):
    """!once frequency: one classification at the start, carried for the
    whole run — rides b7 with no per-batch coordinate reads after the
    first, byte-identical to the int16 wire."""
    import gorder_tpu.analysis as mod
    from gorder_tpu.input import (Analysis, AnalysisType, Frequency,
                                  LeafletClassification)

    monkeypatch.setenv("GORDER_TPU_BATCH_SIZE", "2")

    def run(wire):
        leaflets = LeafletClassification.global_(
            "@membrane", "name P").with_frequency(Frequency.once())
        return _run_aa(fixtures, tmp_path, monkeypatch, wire,
                       leaflets=leaflets)

    y_i16 = run("i16")
    y_b7 = run("b7")
    assert getattr(mod, "_LAST_WIRE")[0] == "b7", \
        f"!once run did not ride b7: {mod._LAST_WIRE}"
    assert y_b7 == y_i16


@requires_fixtures
def test_b7_aux_individual_byte_identical(fixtures, tmp_path, monkeypatch):
    """Individual leaflet classification consumes only head + methyl
    positions (leaflets.rs Individual): the run rides b7 + a small aux
    atom channel (b7x), byte-identical to the int16 coordinate wire (the
    aux positions are the exact decode integers, dequantized identically
    to a coordinate gather)."""
    import gorder_tpu.analysis as mod
    from gorder_tpu.input import LeafletClassification

    def run(wire):
        leaflets = LeafletClassification.individual("name P",
                                                    "name C218 C316")
        return _run_aa(fixtures, tmp_path, monkeypatch, wire,
                       leaflets=leaflets)

    y_i16 = run("i16")
    assert getattr(mod, "_LAST_WIRE")[0] == "i16"
    y_auto = run(None)
    assert getattr(mod, "_LAST_WIRE")[0] == "b7", \
        f"individual-leaflet run did not ride b7x: {mod._LAST_WIRE}"
    assert y_auto == y_i16


@requires_fixtures
def test_b7_aux_dynamic_normals_byte_identical(fixtures, tmp_path,
                                               monkeypatch):
    """Dynamic membrane normals consume only the NormalHeads cloud
    (normal.rs:179-199): the run rides b7 + the cloud aux channel (b7x),
    byte-identical to the int16 coordinate wire."""
    import gorder_tpu.analysis as mod
    from gorder_tpu.input import MembraneNormal

    def run(wire):
        return _run_aa(fixtures, tmp_path, monkeypatch, wire,
                       membrane_normal=MembraneNormal.dynamic("name P", 2.0))

    y_i16 = run("i16")
    assert getattr(mod, "_LAST_WIRE")[0] == "i16"
    y_auto = run(None)
    assert getattr(mod, "_LAST_WIRE")[0] == "b7", \
        f"dynamic-normals run did not ride b7x: {mod._LAST_WIRE}"
    assert y_auto == y_i16


@requires_fixtures
def test_b7_aux_individual_plus_normals_byte_identical(fixtures, tmp_path,
                                                       monkeypatch):
    """Individual leaflets AND dynamic normals together: both consumers
    ride one union aux channel, byte-identical to the int16 wire."""
    import gorder_tpu.analysis as mod
    from gorder_tpu.input import LeafletClassification, MembraneNormal

    def run(wire):
        return _run_aa(
            fixtures, tmp_path, monkeypatch, wire,
            leaflets=LeafletClassification.individual(
                "name P", "name C218 C316").with_membrane_normal("z"),
            membrane_normal=MembraneNormal.dynamic("name P", 2.0))

    y_i16 = run("i16")
    y_auto = run(None)
    assert getattr(mod, "_LAST_WIRE")[0] == "b7", \
        f"combined aux run did not ride b7x: {mod._LAST_WIRE}"
    assert y_auto == y_i16


@requires_fixtures
def test_b7_geometry_channel_byte_identical(fixtures, tmp_path, monkeypatch):
    """Geometry-restricted runs ride b7 + the decoder inside-mask
    bitplane (native/xdr.cpp xtc_geo_mask): every wire consumes the same
    decoder-evaluated mask, so output is byte-identical across wires —
    including the selection-COG reference recomputed every frame
    (geometry.rs init_reference)."""
    import gorder_tpu.analysis as mod
    from gorder_tpu.input.config import Geometry

    for geom in (
        Geometry("cylinder", reference="@membrane", radius=3.25,
                 orientation="z"),
        Geometry("sphere", reference=None, radius=3.0),
        Geometry("cuboid", reference=(8.0, 2.0, 0.0), xdim=(-2.0, 4.0),
                 ydim=(-2.0, 2.0)),
    ):
        y_i16 = _run_aa(fixtures, tmp_path, monkeypatch, "i16",
                        geometry=geom)
        assert getattr(mod, "_LAST_WIRE")[0] == "i16"
        y_auto = _run_aa(fixtures, tmp_path, monkeypatch, None,
                         geometry=geom)
        assert getattr(mod, "_LAST_WIRE")[0] == "b7", \
            f"geometry run did not ride b7geo: {mod._LAST_WIRE}"
        assert y_auto == y_i16


@requires_fixtures
def test_b7_collect_export_byte_identical(fixtures, tmp_path, monkeypatch):
    """Collection (export) runs keep the fused b7 wires: the program
    returns the in-program classes / normals as extra outputs, drained
    host-side in frame order (engine/fused.py). Both the order output
    AND the exported assignment/normals files are byte-identical to the
    coordinate-wire host-visible twin."""
    import gorder_tpu.analysis as mod
    from gorder_tpu.input import LeafletClassification, MembraneNormal

    # global leaflets + export (b7g with _classes extra)
    def run_leaf(wire, disable_channel=False):
        if disable_channel:
            monkeypatch.setenv("GORDER_TPU_B7_LEAFLETS", "0")
        else:
            monkeypatch.delenv("GORDER_TPU_B7_LEAFLETS", raising=False)
        leaflets = LeafletClassification.global_(
            "@membrane", "name P").with_collect(
                str(tmp_path / f"leafs_{wire or 'auto'}.yaml"))
        out = _run_aa(fixtures, tmp_path, monkeypatch, wire,
                      leaflets=leaflets, write=True)
        exp = (tmp_path / f"leafs_{wire or 'auto'}.yaml").read_bytes()
        return out, exp

    o_i16, e_i16 = run_leaf("i16", disable_channel=True)
    o_b7, e_b7 = run_leaf(None)
    assert getattr(mod, "_LAST_WIRE")[0] == "b7", \
        f"leaflet-export run did not ride b7g: {mod._LAST_WIRE}"
    assert o_b7 == o_i16 and e_b7 == e_i16

    # dynamic normals + export (b7x with _normals extra)
    def run_norm(wire, disable_channel=False):
        if disable_channel:
            monkeypatch.setenv("GORDER_TPU_B7_LEAFLETS", "0")
        else:
            monkeypatch.delenv("GORDER_TPU_B7_LEAFLETS", raising=False)
        mn = MembraneNormal.dynamic(
            "name P", 2.0,
            collect=str(tmp_path / f"norms_{wire or 'auto'}.yaml"))
        out = _run_aa(fixtures, tmp_path, monkeypatch, wire,
                      membrane_normal=mn, write=True)
        exp = (tmp_path / f"norms_{wire or 'auto'}.yaml").read_bytes()
        return out, exp

    o_i16, e_i16 = run_norm("i16", disable_channel=True)
    o_b7, e_b7 = run_norm(None)
    assert getattr(mod, "_LAST_WIRE")[0] == "b7", \
        f"normals-export run did not ride b7x: {mod._LAST_WIRE}"
    assert o_b7 == o_i16 and e_b7 == e_i16
