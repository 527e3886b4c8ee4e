"""Synthetic membrane systems for the fixture classes whose reference
trajectories are absent from the checkout (vesicle, scrambling, buckled,
switched-axis — VERDICT round 1, Missing #6). Built with the in-repo
bit-identical XTC encoder so the full pipeline (structure → topology →
decode → device kernels → results) is exercised end-to-end.

All systems are CG-Martini-like: each lipid is a 4-bead chain
PO4–C1A–C2A–C3A with the head on the membrane surface and the tail
pointing inward.
"""

from __future__ import annotations

import numpy as np

from gorder_tpu.io import native
from gorder_tpu.io.gro import write_gro
from gorder_tpu.system import System, canonical_bonds

BEADS = ("PO4", "C1A", "C2A", "C3A")
BOND_STEP = 0.3  # nm between consecutive beads


def _build_system(positions, box, name):
    n_lipids = positions.shape[0] // len(BEADS)
    names = np.array(list(BEADS) * n_lipids, dtype="U8")
    resids = np.repeat(np.arange(1, n_lipids + 1), len(BEADS))
    resnames = np.full(len(names), "POPC", dtype="U8")
    bonds = []
    for m in range(n_lipids):
        base = m * len(BEADS)
        bonds += [(base + i, base + i + 1) for i in range(len(BEADS) - 1)]
    system = System(
        name=name,
        atom_names=names,
        resids=resids,
        resnames=resnames,
        serials=np.arange(1, len(names) + 1, dtype=np.int64),
        positions=positions.astype(np.float32),
        box=np.diag(box).astype(np.float32),
    )
    system.bonds = canonical_bonds(np.asarray(bonds, np.int64))
    return system


def _lipid(head, direction):
    """(4, 3) bead positions: head at `head`, tail along `direction`."""
    direction = direction / np.linalg.norm(direction)
    return head[None, :] + direction[None, :] * (
        BOND_STEP * np.arange(len(BEADS))[:, None])


def _fibonacci_sphere(n, radius, center):
    i = np.arange(n, dtype=np.float64)
    golden = np.pi * (3.0 - np.sqrt(5.0))
    z = 1.0 - 2.0 * (i + 0.5) / n
    r = np.sqrt(1.0 - z * z)
    theta = golden * i
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=1)
    return center[None, :] + radius * pts, pts  # positions, unit normals


def _write_structure(tmp_path, tag, system):
    """GRO + companion .bnd (GRO carries no bonds)."""
    gro = str(tmp_path / f"{tag}.gro")
    write_gro(gro, system)
    bnd = str(tmp_path / f"{tag}.bnd")
    with open(bnd, "w") as fh:
        for a, b in system.bonds:
            fh.write(f"{a + 1} {b + 1}\n")
    return gro, bnd


def _write_traj(tmp_path, tag, frames, box):
    xtc = str(tmp_path / f"{tag}.xtc")
    n = len(frames)
    boxes = np.tile(np.diag(box).astype(np.float32), (n, 1, 1))
    times = (np.arange(n) * 100.0).astype(np.float32)
    steps = (np.arange(n) * 1000).astype(np.int32)
    native.xtc_write(xtc, np.asarray(frames, np.float32), boxes, times,
                     steps, precision=1000.0)
    return xtc


def make_vesicle(tmp_path, n_outer=900, n_inner=140, r_outer=6.5,
                 r_inner=2.5, n_frames=12, seed=5):
    """Spherical vesicle: outer-leaflet heads at r_outer (tails inward),
    inner-leaflet heads at r_inner (tails outward). Geometry mirrors a
    real Martini vesicle: ~0.75 nm head spacing within a shell and ~4 nm
    head-to-head across the bilayer — spectral clustering requires the
    inter-shell similarity (exp(-gap²) ≈ 1e-7) to vanish against the
    shell's own algebraic connectivity. Returns
    (gro, bnd, xtc, n_outer, n_inner, center, radial_normals)."""
    rng = np.random.default_rng(seed)
    box_l = max(16.0, 2.0 * r_outer + 3.0)   # vesicle must fit the box
    box = np.array([box_l, box_l, box_l])
    center = box / 2

    heads_out, normals_out = _fibonacci_sphere(n_outer, r_outer, center)
    heads_in, normals_in = _fibonacci_sphere(n_inner, r_inner, center)

    lipids = []
    for head, nrm in zip(heads_out, normals_out):
        lipids.append(_lipid(head, -nrm))          # tails point inward
    for head, nrm in zip(heads_in, normals_in):
        lipids.append(_lipid(head, nrm))           # tails point outward
    base = np.concatenate(lipids, axis=0)

    frames = []
    for _f in range(n_frames):
        jitter = rng.normal(0, 0.01, base.shape)
        frames.append((base + jitter) % box)
    system = _build_system(base, box, "synthetic vesicle")
    gro, bnd = _write_structure(tmp_path, "vesicle", system)
    xtc = _write_traj(tmp_path, "vesicle", frames, box)
    radial = np.concatenate([normals_out, normals_in], axis=0)
    return gro, bnd, xtc, n_outer, n_inner, center, radial


def make_scrambling(tmp_path, n_per_leaflet=144, n_frames=10, flip_at=5,
                    n_flip=16, seed=6):
    """Flat bilayer where `n_flip` upper-leaflet lipids teleport to the
    lower leaflet at frame `flip_at` (the reference's scrambling
    trajectories, tests/files/scrambling/). Head packing (~0.8 nm) and
    static positional disorder mirror real Martini membranes — perfectly
    crystalline sheets make the spectral Laplacian's sheet modes
    degenerate, which no real system exhibits. Returns
    (gro, bnd, xtc, upper_ids_before, upper_ids_after, n_lipids)."""
    rng = np.random.default_rng(seed)
    box = np.array([10.0, 10.0, 9.0])
    grid = int(np.ceil(np.sqrt(n_per_leaflet)))
    spacing = box[0] / grid
    # per-site static disorder, shared by both leaflets' construction
    wobble = rng.uniform(-0.18, 0.18, (2, n_per_leaflet, 2))

    def leaflet_positions(z_head, direction, w):
        out = []
        for m in range(n_per_leaflet):
            gx, gy = m % grid, m // grid
            head = np.array([(gx + 0.5) * spacing + w[m, 0],
                             (gy + 0.5) * spacing + w[m, 1],
                             z_head + 0.1 * w[m, 0]])
            out.append(_lipid(head, direction))
        return out

    upper = leaflet_positions(6.5, np.array([0.0, 0.0, -1.0]), wobble[0])
    lower = leaflet_positions(2.5, np.array([0.0, 0.0, 1.0]), wobble[1])
    # interleave leaflets in molecule order like real membrane builders
    # (insane/CHARMM-GUI); spectral clustering's first-rows k-means init
    # depends on the first lipids spanning both leaflets, in the
    # reference exactly as here
    lipids = []
    for m in range(n_per_leaflet):
        lipids.append(upper[m])
        lipids.append(lower[m])
    base = np.concatenate(lipids, axis=0)
    n_lipids = 2 * n_per_leaflet
    nb = len(BEADS)

    # the first n_flip upper-leaflet lipids (even molecule ids) flip
    flip_ids = [2 * m for m in range(n_flip)]
    frames = []
    for f in range(n_frames):
        coords = base.copy()
        if f >= flip_at:
            for k, mol in enumerate(flip_ids):
                # teleport into the lower leaflet, offset to avoid overlap
                head = np.array([
                    (k % grid + 0.27) * spacing,
                    (k // grid + 0.27) * spacing, 2.5])
                coords[mol * nb:(mol + 1) * nb] = _lipid(
                    head, np.array([0.0, 0.0, 1.0]))
        coords = coords + rng.normal(0, 0.005, coords.shape)
        frames.append(coords % box)

    system = _build_system(base, box, "synthetic scrambling bilayer")
    gro, bnd = _write_structure(tmp_path, "scrambling", system)
    xtc = _write_traj(tmp_path, "scrambling", frames, box)
    upper_before = [2 * m for m in range(n_per_leaflet)]
    upper_after = [m for m in upper_before if m not in flip_ids]
    return gro, bnd, xtc, upper_before, upper_after, n_lipids


def make_buckled(tmp_path, nx=24, ny=8, amplitude=1.2, n_frames=8, seed=7):
    """Buckled bilayer: the mid-surface follows z = z0 + A·sin(2πx/Lx);
    every lipid stands along the local surface normal. Returns
    (gro, bnd, xtc, surface_normals (M, 3) in molecule order)."""
    rng = np.random.default_rng(seed)
    box = np.array([12.0, 4.0, 10.0])
    z0 = box[2] / 2
    two_pi_l = 2.0 * np.pi / box[0]

    lipids = []
    normals = []
    for side in (+1.0, -1.0):               # upper then lower leaflet
        for ix in range(nx):
            for iy in range(ny):
                x = (ix + 0.5) * box[0] / nx
                y = (iy + 0.5) * box[1] / ny
                z = z0 + amplitude * np.sin(two_pi_l * x)
                slope = amplitude * two_pi_l * np.cos(two_pi_l * x)
                nrm = np.array([-slope, 0.0, 1.0])
                nrm /= np.linalg.norm(nrm)
                head = np.array([x, y, z]) + side * 1.2 * nrm
                lipids.append(_lipid(head, -side * nrm))
                normals.append(nrm)
    base = np.concatenate(lipids, axis=0)

    frames = []
    for _f in range(n_frames):
        frames.append((base + rng.normal(0, 0.005, base.shape)) % box)
    system = _build_system(base, box, "synthetic buckled bilayer")
    gro, bnd = _write_structure(tmp_path, "buckled", system)
    xtc = _write_traj(tmp_path, "buckled", frames, box)
    return gro, bnd, xtc, np.asarray(normals, np.float64)


def make_flat_bilayer(tmp_path, tag="flat", axis=2, n_per_leaflet=36,
                      n_frames=10, seed=8, tilt=0.35):
    """Flat bilayer whose normal points along `axis` (0=x, 1=y, 2=z),
    constructed by building the z-normal system and PERMUTING coordinate
    axes (an exact f32 operation), so order parameters across axis
    variants must match token-for-token. Lipids are tilted in-plane so the
    order parameters are nontrivial. Returns (gro, bnd, xtc)."""
    rng = np.random.default_rng(seed)
    box_z = np.array([8.0, 8.0, 9.0])
    grid = int(np.ceil(np.sqrt(n_per_leaflet)))
    spacing = box_z[0] / grid

    lipids = []
    for side, z_head in ((-1.0, 6.4), (1.0, 2.6)):
        for m in range(n_per_leaflet):
            gx, gy = m % grid, m // grid
            head = np.array([(gx + 0.5) * spacing, (gy + 0.5) * spacing,
                             z_head])
            # deterministic per-lipid tilt: nontrivial P2 distribution
            ang = 2.0 * np.pi * (m / n_per_leaflet)
            direction = np.array([tilt * np.cos(ang), tilt * np.sin(ang),
                                  side])
            lipids.append(_lipid(head, direction))
    base = np.concatenate(lipids, axis=0)

    frames_z = []
    for _f in range(n_frames):
        frames_z.append((base + rng.normal(0, 0.008, base.shape)) % box_z)

    # permute axes so the membrane normal (old z) lands on `axis`:
    # new[:, k] = old[:, perm[k]]
    perm = list({2: (0, 1, 2), 0: (2, 0, 1), 1: (1, 2, 0)}[axis])
    box = box_z[perm]
    frames = [f[:, perm] for f in frames_z]

    system = _build_system(frames[0], box, f"synthetic flat bilayer {tag}")
    gro, bnd = _write_structure(tmp_path, tag, system)
    xtc = _write_traj(tmp_path, tag, frames, box)
    return gro, bnd, xtc
