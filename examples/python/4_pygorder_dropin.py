"""Drop-in usage of the pygorder API surface.

Code written against the reference's Python package runs unchanged after
swapping the import line (see docs/MIGRATION.md)."""

import gorder_tpu.compat as gorder   # was: import gorder

analysis = gorder.Analysis(
    structure="system.tpr",
    trajectory="md.xtc",
    analysis_type=gorder.analysis_types.AAOrder(
        heavy_atoms="@membrane and element name carbon",
        hydrogens="@membrane and element name hydrogen"),
    leaflets=gorder.leaflets.GlobalClassification("@membrane", "name P"),
    estimate_error=gorder.estimate_error.EstimateError(),
    silent=True,
)
results = analysis.run()

print("frames analyzed:", results.n_analyzed_frames())
avg = results.average_order()
print("average -S_CH:", round(avg.total().value(), 4),
      "+/-", round(avg.total().error(), 4))

for molecule in results.molecules():
    conv = molecule.convergence()
    print(molecule.molecule(),
          round(molecule.average_order().total().value(), 4),
          "converged to", round(conv.total()[-1], 4),
          "over", len(conv.frames()), "frames")

popc = results.get_molecule("POPC")
atom = popc.get_atom(41)
print(atom.atom().atom_name(), "order:",
      round(atom.order().total().value(), 4))
for bond in atom.bonds():
    a1, a2 = bond.atoms()
    print(f"  {a1.atom_name()}-{a2.atom_name()}:",
          round(bond.order().total().value(), 4))
