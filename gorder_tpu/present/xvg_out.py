"""XVG (Grace) presenter: one file per molecule type.

Format reference: src/presentation/xvg_presenter.rs and goldens
(`order.xvg` → `order_POPC.xvg`): Grace headers with per-class legends,
`# Atom C12:` / `# Bond NC3 - PO4:` comments, 1-based x indices, 4-decimal
values. AA/UA plot per-atom totals (y label "-Sch"); CG plots per-bond
values (y label "S").
"""

from __future__ import annotations

import math
import os
from typing import List

from ..results.model import AnalysisResults
from .common import prepare_output_path, results_header

_TITLES = {
    "aa": "Atomistic order parameters",
    "cg": "Coarse-grained order parameters",
    "ua": "United-atom order parameters",
}
_YLABELS = {"aa": "-Sch", "cg": "S", "ua": "-Sch"}
_LEGENDS = {
    "total": "Full membrane",
    "upper": "Upper leaflet",
    "lower": "Lower leaflet",
}


def _num(value) -> str:
    if value is None or math.isnan(value):
        return "NaN"
    return f"{value:.4f}"


def xvg_path_for(pattern: str, molecule: str) -> str:
    root, ext = os.path.splitext(pattern)
    if not ext:
        ext = ".xvg"
    return f"{root}_{molecule}{ext}"


def render_xvg(results: AnalysisResults, molecule) -> str:
    classes = ["total"]
    if molecule.average_order.upper is not None:
        classes = ["total", "upper", "lower"]
    lines: List[str] = [results_header(results)]
    lines.append(
        f'@    title "{_TITLES[results.mode]} for molecule type '
        f'{molecule.name}"')
    lines.append(
        f'@    xaxis label "{"Bond" if results.mode == "cg" else "Atom"}"')
    lines.append(f'@    yaxis label "{_YLABELS[results.mode]}"')
    for i, c in enumerate(classes):
        lines.append(f'@    s{i} legend "{_LEGENDS[c]}"')
    lines.append("@TYPE xy")

    if results.mode == "cg":
        for i, bond in enumerate(molecule.bonds, start=1):
            lines.append(f"# Bond {bond.atom1.name} - {bond.atom2.name}:")
            values = "  ".join(
                _num(getattr(bond.order, c).value
                     if getattr(bond.order, c) else None)
                for c in classes)
            lines.append(f"{i:<5d} {values} ")
    else:
        for i, atom in enumerate(molecule.atoms, start=1):
            lines.append(f"# Atom {atom.atom.name}:")
            values = "  ".join(
                _num(getattr(atom.order, c).value
                     if getattr(atom.order, c) else None)
                for c in classes)
            lines.append(f"{i:<5d} {values} ")

    return "\n".join(lines) + "\n"


def write_xvg(results: AnalysisResults, pattern: str) -> None:
    overwrite = bool(getattr(results.analysis, "overwrite", False))
    for molecule in results.molecules:
        path = xvg_path_for(pattern, molecule.name)
        prepare_output_path(path, overwrite)
        with open(path, "w") as fh:
            fh.write(render_xvg(results, molecule))
