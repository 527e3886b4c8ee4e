"""Human-readable table presenter.

Format reference: src/presentation/tab_presenter.rs and goldens
tests/files/*_order_*.tab: per-molecule blocks with FULL/UPPER/LOWER columns
(CG) or TOTAL + H #k column groups (AA/UA), `value ± error` cells, AVERAGE
rows, and a closing "All molecule types" block.
"""

from __future__ import annotations

import math
from typing import List, Optional

from ..results.model import AnalysisResults, Order
from .common import prepare_output_path, results_header

_CLASS_HEADS = {"total": "FULL", "upper": "UPPER", "lower": "LOWER"}


def _cell(order: Optional[Order], with_errors: bool) -> str:
    if order is None or order.value is None:
        return ""
    if math.isnan(order.value):
        return "NaN"
    if with_errors:
        err = order.error
        if err is None or math.isnan(err):
            return f"{order.value:.4f}"
        return f"{order.value:.4f} ± {err:.4f}"
    return f"{order.value:.4f}"


def _classes(results: AnalysisResults) -> List[str]:
    classes = ["total"]
    for mol in results.molecules:
        probe = mol.average_order
        if probe.upper is not None:
            classes = ["total", "upper", "lower"]
        break
    return classes


def render_tab(results: AnalysisResults) -> str:
    with_errors = (
        results.analysis is not None
        and getattr(results.analysis, "estimate_error", None) is not None
    )
    classes = _classes(results)
    cell_width = 17 if with_errors else 8
    lines: List[str] = [results_header(results), ""]

    def row_cells(col) -> List[str]:
        return [_cell(getattr(col, c), with_errors) for c in classes]

    if results.mode == "cg":
        header_cells = " ".join(
            f"{_CLASS_HEADS[c]:^{cell_width + 1}}" for c in classes)
        for mol in results.molecules:
            label_width = max(
                [len(f"{b.atom1.name} - {b.atom2.name}") for b in mol.bonds]
                + [len("AVERAGE")]) + 2
            lines.append(f"Molecule type {mol.name}")
            lines.append(" " * label_width + header_cells + " |")
            for bond in mol.bonds:
                label = f"{bond.atom1.name} - {bond.atom2.name}"
                cells = " ".join(
                    f"{c:^{cell_width + 1}}" for c in row_cells(bond.order))
                lines.append(f"{label:<{label_width}}{cells} |")
            cells = " ".join(
                f"{c:^{cell_width + 1}}"
                for c in row_cells(mol.average_order))
            lines.append(f"{'AVERAGE':<{label_width}}{cells} |")
            lines.append("")
        # system-wide average
        lines.append("All molecule types")
        lines.append(" " * 10 + header_cells + " |")
        cells = " ".join(
            f"{c:^{cell_width + 1}}"
            for c in row_cells(results.average_order))
        lines.append(f"{'AVERAGE':<10}{cells} |")
    else:
        multi = len(classes) > 1
        group_width = (cell_width + 2) * len(classes) + len(classes) - 1
        for mol in results.molecules:
            # hydrogen columns are sized per molecule type
            # (tab_presenter.rs; golden aa_order_different_hydrogen_numbers)
            max_bonds = max((len(a.bonds) for a in mol.atoms), default=0)
            label_width = max(
                [len(a.atom.name) for a in mol.atoms] + [len("AVERAGE")]) + 2
            lines.append(f"Molecule type {mol.name}")
            groups = ["TOTAL"] + [f"HYDROGEN #{k + 1}" if multi or with_errors
                                  else f"H #{k + 1}"
                                  for k in range(max_bonds)]
            header1 = " ".join(f"{g:^{group_width}}|" for g in groups)
            lines.append(" " * label_width + header1)
            if multi:
                sub = " ".join(
                    f"{_CLASS_HEADS[c]:^{cell_width + 1}}" for c in classes)
                header2 = " ".join(f"{sub} |" for _ in groups)
                lines.append(" " * label_width + header2)
            for atom in mol.atoms:
                cells = []
                groups_data = [atom.order] + [b.order for b in atom.bonds]
                groups_data += [None] * (max_bonds + 1 - len(groups_data))
                for g in groups_data:
                    if g is None:
                        cells.append(" " * group_width + "|")
                    else:
                        sub = " ".join(
                            f"{c:^{cell_width + 1}}" for c in row_cells(g))
                        cells.append(f"{sub} |")
                lines.append(f"{atom.atom.name:<{label_width}}" + " ".join(cells))
            sub = " ".join(
                f"{c:^{cell_width + 1}}"
                for c in row_cells(mol.average_order))
            lines.append(f"{'AVERAGE':<{label_width}}{sub} |")
            lines.append("")
        lines.append("All molecule types")
        if multi:
            sub = " ".join(
                f"{_CLASS_HEADS[c]:^{cell_width + 1}}" for c in classes)
            lines.append(" " * 10 + f"{sub} |")
        else:
            lines.append(" " * 10 + f"{'TOTAL':^{cell_width + 1}} |")
        sub = " ".join(
            f"{c:^{cell_width + 1}}"
            for c in row_cells(results.average_order))
        lines.append(f"{'AVERAGE':<10}{sub} |")

    return "\n".join(lines) + "\n"


def write_tab(results: AnalysisResults, path: str) -> None:
    overwrite = bool(getattr(results.analysis, "overwrite", False))
    prepare_output_path(path, overwrite)
    with open(path, "w") as fh:
        fh.write(render_tab(results))
