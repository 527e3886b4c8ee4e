"""Bonds (.bnd) file reader.

Behavioral reference: src/analysis/structure.rs:121-167 — each line is
`target partner partner ...` with 1-based serial numbers; `#` starts a
comment; duplicate bonds are ignored; self-bonds and out-of-range numbers are
errors. Supplying a bonds file *replaces* all bonds already present in the
system (structure.rs:27-88).
"""

from __future__ import annotations

import numpy as np

from ..errors import BondsError
from ..system import System, canonical_bonds


def read_bnd(path: str, system: System) -> None:
    system.bonds = parse_bnd(path, system.n_atoms)


def parse_bnd(path: str, n_atoms: int) -> np.ndarray:
    try:
        with open(path, "r") as fh:
            lines = fh.read().splitlines()
    except OSError as e:
        raise BondsError(f"could not read bonds file '{path}': {e}") from None

    pairs = []
    for raw in lines:
        line = raw.split("#")[0]
        fields = line.split()
        if len(fields) < 2:
            continue
        try:
            target = int(fields[0])
        except ValueError:
            raise BondsError(
                f"could not parse atom number '{fields[0]}' in bonds file '{path}'"
            ) from None
        if target < 1 or target > n_atoms:
            raise BondsError(
                f"atom number {target} in bonds file '{path}' does not exist "
                f"in the system ({n_atoms} atoms)"
            )
        for token in fields[1:]:
            try:
                partner = int(token)
            except ValueError:
                raise BondsError(
                    f"could not parse atom number '{token}' in bonds file '{path}'"
                ) from None
            if partner == target:
                raise BondsError(
                    f"bonds file '{path}' specifies a self-bond for atom {target}"
                )
            if partner < 1 or partner > n_atoms:
                raise BondsError(
                    f"atom number {partner} in bonds file '{path}' does not exist "
                    f"in the system ({n_atoms} atoms)"
                )
            pairs.append((target - 1, partner - 1))

    if not pairs:
        return np.zeros((0, 2), np.int32)
    return canonical_bonds(np.array(pairs, np.int64))
