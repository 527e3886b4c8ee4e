"""Single-frame per-bond-type order sums vs the reference's own unit-test
expectations (src/analysis/aaorder.rs:226-363 and cgorder.rs:188-238,
asserted by test_*_analyze_frame_basic/_leaflets at rel 1e-5).

The reference analyzes the pcpepg.tpr / cg.tpr coordinate snapshots
directly — no trajectory, no re-encoded fixtures — so this pins the whole
per-frame chain (selection → classification → min-image → P2 → 1e-6
quantization → per-type reduction → leaflet masking) at the tightest
reproducible level. Expected vectors are parsed out of the reference
source at test time."""

import re

import numpy as np
import pytest

from .conftest import REFERENCE


def _parse_expected(name: str, source: str = "aaorder.rs"):
    """Extract the three vec![...] float blocks of `fn {name}()` from
    the given reference driver source."""
    src = (REFERENCE / "src" / "analysis" / source).read_text()
    m = re.search(rf"fn {name}\(\) -> \[Vec<f32>; 3\] \{{(.*?)\n    \}}",
                  src, re.S)
    assert m, name
    blocks = re.findall(r"vec!\[(.*?)\]", m.group(1), re.S)
    assert len(blocks) == 3, name
    return [np.array([float(v) for v in re.findall(r"-?\d+\.\d+(?:e-?\d+)?",
                                                   b)], np.float64)
            for b in blocks]


@pytest.fixture(scope="module")
def frame_state(fixtures):
    """Compiled bonds + single-frame kernel inputs for the pcpepg.tpr
    snapshot."""
    from gorder_tpu.core.order import make_order_step
    from gorder_tpu.io.tpr import read_tpr
    from gorder_tpu.select import ensure_elements, select_mask
    from gorder_tpu.topology.classify import classify_molecules, compile_bonds

    system = read_tpr(str(fixtures / "pcpepg.tpr"))
    ensure_elements(system)
    heavy = select_mask(system, "@membrane and element name carbon")
    hyd = select_mask(system, "@membrane and element name hydrogen")
    kinds = classify_molecules(system, heavy, hyd, mode="bonds")
    compiled = compile_bonds(kinds)

    batch = 8
    coords = np.zeros((batch, system.n_atoms, 3), np.float32)
    coords[0] = system.positions
    box = np.tile(np.diag(system.box).astype(np.float32), (batch, 1))
    mask = np.zeros(batch, bool)
    mask[0] = True
    normal = np.array([0, 0, 1], np.float32)

    step = make_order_step(
        compiled.atom_a, compiled.atom_b, compiled.bond_type,
        compiled.molecule, compiled.n_types, compiled.n_molecules)
    return system, kinds, compiled, step, coords, box, mask, normal


def _check(kinds, compiled, result_rows, expected_by_kind,
           expected_samples):
    from gorder_tpu.core.order import recombine_limbs

    sums, counts = recombine_limbs(np.asarray(result_rows))
    sums = sums.sum(0)
    counts = counts.sum(0)
    for k, kind in enumerate(kinds):
        t0, t1 = int(compiled.type_offsets[k]), int(compiled.type_offsets[k + 1])
        got = -(sums[t0:t1] * 1e-6)
        expected = expected_by_kind[k]
        assert len(got) == len(expected), kind.name
        # the reference's expected values come from the identical
        # quantize-then-sum path; small f32 elementwise differences move
        # individual samples by one 1e-6 quantum
        np.testing.assert_allclose(got, expected, atol=5e-4, rtol=2e-5,
                                   err_msg=kind.name)
        np.testing.assert_array_equal(counts[t0:t1], expected_samples[k])


def test_frame_sums_total(frame_state):
    system, kinds, compiled, step, coords, box, mask, normal = frame_state
    out, _ = step(coords, box, normal, mask)
    expected = _parse_expected("expected_total_orders")
    n_instances = [kind.n_molecules for kind in kinds]
    _check(kinds, compiled, out["total"], expected, n_instances)


def test_frame_sums_leaflets(frame_state):
    from gorder_tpu.core.leaflets import make_global_classifier
    from gorder_tpu.core.order import make_order_step
    from gorder_tpu.select import select_mask

    system, kinds, compiled, _step, coords, box, mask, normal = frame_state
    membrane_idx = np.nonzero(select_mask(system, "@membrane"))[0]
    p_mask = select_mask(system, "name P")
    heads = []
    for kind in kinds:
        rel = [r for r in range(kind.n_atoms_per_molecule)
               if p_mask[kind.min_indices[0] + r]]
        heads.append(np.asarray(kind.min_indices, np.int64) + rel[0])
    heads = np.concatenate(heads)
    classify = make_global_classifier(membrane_idx, heads, 2)
    classes = np.asarray(classify(coords, box))

    step = make_order_step(
        compiled.atom_a, compiled.atom_b, compiled.bond_type,
        compiled.molecule, compiled.n_types, compiled.n_molecules,
        with_leaflets=True)
    out, _ = step(coords, box, normal, mask, classes)

    # reference expectations: aaorder.rs test_aaorder_analyze_frame_leaflets
    expected_samples = {"total": [131, 128, 15], "upper": [65, 64, 8],
                        "lower": [66, 64, 7]}
    for cls, fn_name in (("total", "expected_total_orders"),
                         ("upper", "expected_upper_orders"),
                         ("lower", "expected_lower_orders")):
        expected = _parse_expected(fn_name)
        _check(kinds, compiled, out[cls], expected, expected_samples[cls])


@pytest.fixture(scope="module")
def cg_frame_state(fixtures):
    """Compiled bonds + single-frame kernel inputs for the cg.tpr
    snapshot (cgorder.rs:130-186 prepare_data_for_tests)."""
    from gorder_tpu.core.order import make_order_step
    from gorder_tpu.io.tpr import read_tpr
    from gorder_tpu.select import select_mask
    from gorder_tpu.topology.classify import classify_molecules, compile_bonds

    system = read_tpr(str(fixtures / "cg.tpr"))
    beads = select_mask(system, "@membrane")
    kinds = classify_molecules(system, beads, mode="bonds")
    compiled = compile_bonds(kinds)

    batch = 8
    coords = np.zeros((batch, system.n_atoms, 3), np.float32)
    coords[0] = system.positions
    box = np.tile(np.diag(system.box).astype(np.float32), (batch, 1))
    mask = np.zeros(batch, bool)
    mask[0] = True
    normal = np.array([0, 0, 1], np.float32)

    step = make_order_step(
        compiled.atom_a, compiled.atom_b, compiled.bond_type,
        compiled.molecule, compiled.n_types, compiled.n_molecules)
    return system, kinds, compiled, step, coords, box, mask, normal


def test_cg_frame_sums_total(cg_frame_state):
    system, kinds, compiled, step, coords, box, mask, normal = cg_frame_state
    out, _ = step(coords, box, normal, mask)
    expected = _parse_expected("expected_total_orders", "cgorder.rs")
    # CG reports +P2 (no sign flip): negate our "-real" convention back
    expected = [-e for e in expected]
    n_instances = [kind.n_molecules for kind in kinds]
    _check(kinds, compiled, out["total"], expected, n_instances)


def test_cg_frame_sums_leaflets(cg_frame_state):
    from gorder_tpu.core.leaflets import make_global_classifier
    from gorder_tpu.core.order import make_order_step
    from gorder_tpu.select import select_mask

    system, kinds, compiled, _s, coords, box, mask, normal = cg_frame_state
    membrane_idx = np.nonzero(select_mask(system, "@membrane"))[0]
    head_mask = select_mask(system, "name PO4")
    heads = []
    for kind in kinds:
        rel = [r for r in range(kind.n_atoms_per_molecule)
               if head_mask[kind.min_indices[0] + r]]
        heads.append(np.asarray(kind.min_indices, np.int64) + rel[0])
    heads = np.concatenate(heads)
    classify = make_global_classifier(membrane_idx, heads, 2)
    classes = np.asarray(classify(coords, box))

    step = make_order_step(
        compiled.atom_a, compiled.atom_b, compiled.bond_type,
        compiled.molecule, compiled.n_types, compiled.n_molecules,
        with_leaflets=True)
    out, _ = step(coords, box, normal, mask, classes)

    expected_samples = {
        "total": [kind.n_molecules for kind in kinds],
        "upper": None, "lower": None,   # derived from totals below
    }
    for cls, fn_name in (("total", "expected_total_orders"),
                         ("upper", "expected_upper_orders"),
                         ("lower", "expected_lower_orders")):
        expected = [-e for e in _parse_expected(fn_name, "cgorder.rs")]
        from gorder_tpu.core.order import recombine_limbs

        sums, counts = recombine_limbs(np.asarray(out[cls]))
        sums = sums.sum(0)
        for k, kind in enumerate(kinds):
            t0 = int(compiled.type_offsets[k])
            t1 = int(compiled.type_offsets[k + 1])
            got = -(sums[t0:t1] * 1e-6)
            np.testing.assert_allclose(got, expected[k], atol=5e-4,
                                       rtol=2e-5, err_msg=f"{kind.name} {cls}")
