"""Manual classifications for reference tests whose coverage cannot be
matched mechanically by golden-file name (behavioral tests, failure paths,
API-access suites). Consumed by tools/gen_test_ledger.py.

Values: repo test reference (status 'covered'), or strings starting with
'redesigned:' / 'blocked:'.
"""

_PYAPI = ("native-API equivalent: tests/test_pyapi.py (full programmatic "
          "results-access suite: values, errors, leaflets, ordermaps, "
          "collect) + tests/test_python_api.py")

_XVG_AA = ("tests/test_presenters.py (aa_order_basic_{mol}.xvg exact) + "
           "tests/test_golden_exact.py xvg tier")
_XVG_AA_L = ("tests/test_golden_sweep.py FORMAT_CASES "
             "'aa_order_leaflets_fmt' (aa_order_leaflets_{mol}.xvg)")
_XVG_CG = ("tests/test_golden_exact.py (cg_order_basic_{mol}.xvg) + "
           "tests/test_presenters.py")
_XVG_CG_L = ("tests/test_presenters.py test_cg_leaflets_xvg "
             "(cg_order_leaflets_{mol}.xvg)")

MANUAL = {
    # ---- XVG presenter variants (error estimation never changes the XVG
    # payload, so the reference compares them to the basic/leaflets xvg)
    "test_aa_order_basic_xvg": _XVG_AA,
    "test_aa_order_basic_xvg_weird_names":
        "tests/test_presenters.py (weird-names xvg case, tests_aa.rs:201)",
    "test_aa_order_leaflets_xvg": _XVG_AA_L,
    "test_aa_order_error_xvg": _XVG_AA + " (error runs share the xvg)",
    "test_aa_order_error_leaflets_xvg": _XVG_AA_L,
    "test_cg_order_basic_xvg": _XVG_CG,
    "test_cg_order_leaflets_xvg": _XVG_CG_L,
    "test_cg_order_error_xvg": _XVG_CG + " (error runs share the xvg)",
    "test_cg_order_error_leaflets_xvg": _XVG_CG_L,

    # ---- Rust-API results-access tests → the Python API IS this
    # framework's native API; the pygorder-parity suite covers the same
    # access patterns
    "test_aa_order_basic_rust_api": _PYAPI,
    "test_aa_order_error_rust_api": _PYAPI,
    "test_aa_order_leaflets_rust_api": _PYAPI,
    "test_aa_order_error_leaflets_rust_api": _PYAPI,
    "test_aa_order_ordermaps_rust_api": _PYAPI,
    "test_aa_order_ordermaps_leaflets_rust_api": _PYAPI,
    "test_aa_order_leaflets_every1_collect_rust_api": _PYAPI,
    "test_cg_order_basic_rust_api": _PYAPI,
    "test_cg_order_error_rust_api": _PYAPI,
    "test_cg_order_leaflets_rust_api": _PYAPI,
    "test_cg_order_error_leaflets_rust_api": _PYAPI,
    "test_cg_order_ordermaps_rust_api": _PYAPI,
    "test_cg_order_ordermaps_leaflets_rust_api": _PYAPI,
    "test_ua_order_basic_rust_api": _PYAPI,
    "test_ua_order_error_rust_api": _PYAPI,
    "test_ua_order_leaflets_rust_api": _PYAPI,
    "test_ua_order_error_leaflets_rust_api": _PYAPI,
    "test_ua_order_ordermaps_rust_api": _PYAPI,
    "test_ua_order_leaflets_ordermaps_rust_api": _PYAPI,

    # ---- failure paths → tests/test_runtime_errors.py /
    # tests/test_leaflets_manual.py / tests/test_cli.py
    "test_aa_order_basic_fail_overlap":
        "tests/test_runtime_errors.py::test_heavy_hydrogen_overlap_fails",
    "test_aa_order_no_molecules":
        "tests/test_runtime_errors.py::"
        "test_nothing_to_analyze_writes_no_output",
    "test_aa_order_empty_molecules":
        "tests/test_runtime_errors.py::"
        "test_nothing_to_analyze_writes_no_output",
    "test_cg_order_no_molecules":
        "tests/test_runtime_errors.py::"
        "test_nothing_to_analyze_writes_no_output",
    "test_cg_order_empty_molecules":
        "tests/test_runtime_errors.py::"
        "test_nothing_to_analyze_writes_no_output",
    "test_ua_order_nothing_to_analyze":
        "tests/test_runtime_errors.py::"
        "test_nothing_to_analyze_writes_no_output",
    "test_aa_order_error_blocks_too_many":
        "tests/test_runtime_errors.py::"
        "test_error_estimation_more_blocks_than_frames",
    "test_cg_order_leaflets_clustering_fail_not_enough_atoms":
        "tests/test_runtime_errors.py::test_clustering_needs_two_heads",
    "test_aa_order_fail_dynamic_undefined_ordermap_plane":
        "tests/test_runtime_errors.py::"
        "test_dynamic_normal_requires_explicit_map_plane",
    "test_aa_order_fail_dynamic_undefined_leaflet_normal":
        "tests/test_runtime_errors.py::"
        "test_dynamic_normal_requires_leaflet_axis",
    "test_aa_order_fail_dynamic_multiple_heads":
        "tests/test_runtime_errors.py::test_dynamic_normal_multiple_heads",
    "test_aa_order_fail_dynamic_no_head":
        "tests/test_runtime_errors.py::test_dynamic_normal_no_head",
    "test_cg_order_fail_dynamic_undefined_ordermap_plane":
        "tests/test_runtime_errors.py::"
        "test_dynamic_normal_requires_explicit_map_plane",
    "test_cg_order_fail_dynamic_undefined_leaflet_normal":
        "tests/test_runtime_errors.py::"
        "test_dynamic_normal_requires_leaflet_axis",
    "test_cg_order_fail_dynamic_multiple_heads":
        "tests/test_runtime_errors.py::test_dynamic_normal_multiple_heads",
    "test_cg_order_fail_dynamic_no_head":
        "tests/test_runtime_errors.py::test_dynamic_normal_no_head",

    # manual (from-file / from-map / ndx) leaflet failure paths
    "test_aa_order_leaflets_from_file_fail_missing_molecule_type":
        "tests/test_leaflets_manual.py::test_manual_missing_moltype",
    "test_aa_order_leaflets_from_map_fail_missing_molecule_type":
        "tests/test_leaflets_manual.py::test_manual_missing_moltype",
    "test_aa_order_leaflets_from_file_fail_unexpected_molecule_type":
        "tests/test_leaflets_manual.py::test_manual_unexpected_moltype",
    "test_aa_order_leaflets_from_map_fail_unexpected_molecule_type":
        "tests/test_leaflets_manual.py::test_manual_unexpected_moltype",
    "test_aa_order_leaflets_from_file_fail_nonexistent":
        "tests/test_leaflets_manual.py::"
        "test_manual_file_nonexistent_and_invalid",
    "test_aa_order_leaflets_from_file_fail_invalid":
        "tests/test_leaflets_manual.py::"
        "test_manual_file_nonexistent_and_invalid",
    "test_aa_order_leaflets_from_file_fail_invalid_number_of_molecules":
        "tests/test_leaflets_manual.py::test_manual_invalid_molecule_count",
    "test_aa_order_leaflets_from_map_fail_invalid_number_of_molecules":
        "tests/test_leaflets_manual.py::test_manual_invalid_molecule_count",
    "test_aa_order_leaflets_from_file_fail_empty_assignment":
        "tests/test_leaflets_manual.py::test_manual_empty_assignment",
    "test_aa_order_leaflets_from_map_fail_empty_assignment":
        "tests/test_leaflets_manual.py::test_manual_empty_assignment",
    "test_aa_order_leaflets_from_file_too_many_frames":
        "tests/test_leaflets_manual.py::test_manual_frame_count_mismatch",
    "test_aa_order_leaflets_from_map_too_many_frames":
        "tests/test_leaflets_manual.py::test_manual_frame_count_mismatch",
    "test_aa_order_leaflets_from_file_not_enough_frames":
        "tests/test_leaflets_manual.py::test_manual_frame_count_mismatch",
    "test_aa_order_leaflets_from_map_not_enough_frames":
        "tests/test_leaflets_manual.py::test_manual_frame_count_mismatch",
    "test_cg_order_leaflets_from_file_fail_missing_molecule_type":
        "tests/test_leaflets_manual.py::test_manual_missing_moltype",
    "test_cg_order_leaflets_from_map_fail_unexpected_molecule_type":
        "tests/test_leaflets_manual.py::test_manual_unexpected_moltype",
    "test_cg_order_leaflets_from_file_fail_nonexistent":
        "tests/test_leaflets_manual.py::"
        "test_manual_file_nonexistent_and_invalid",
    "test_cg_order_leaflets_from_file_fail_invalid":
        "tests/test_leaflets_manual.py::"
        "test_manual_file_nonexistent_and_invalid",
    "test_cg_order_leaflets_from_map_fail_invalid_number_of_molecules":
        "tests/test_leaflets_manual.py::test_manual_invalid_molecule_count",
    "test_cg_order_leaflets_from_file_fail_empty_assignment":
        "tests/test_leaflets_manual.py::test_manual_empty_assignment",
    "test_aa_order_leaflets_from_ndx_fail_missing_ndx":
        "tests/test_leaflets_manual.py::test_ndx_wrong_file_count",
    "test_aa_order_leaflets_from_ndx_fail_too_many_ndx":
        "tests/test_leaflets_manual.py::test_ndx_wrong_file_count",

    # ---- geometry-vs-leaflet behavioral equivalences
    "test_aa_order_geometry_cuboid_z":
        "tests/test_geometry.py::"
        "test_aa_geometry_cuboid_z_equals_upper_leaflet",
    "test_aa_order_geometry_cylinder_z":
        "tests/test_geometry.py::"
        "test_aa_geometry_cylinder_z_equals_upper_leaflet",
    "test_cg_order_geometry_cuboid_z":
        "tests/test_geometry.py::"
        "test_cg_geometry_cuboid_z_equals_upper_leaflet",
    "test_cg_order_geometry_cylinder_z":
        "tests/test_geometry.py::"
        "test_cg_geometry_cylinder_z_equals_upper_leaflet",

    # ---- system-average ordermaps for full leaflet-wise runs
    "test_aa_order_maps_leaflets_full":
        "tests/test_golden_sweep.py::"
        "test_ordermaps_leaflets_full_system_averages[aa]",
    "test_cg_order_maps_leaflets_full":
        "tests/test_golden_sweep.py::"
        "test_ordermaps_leaflets_full_system_averages[cg]",
    "test_aa_order_maps_basic_weird_molecules":
        "tests/test_golden_extra.py (multiple_resid_same_name exact tier)",

    # ---- dynamic-normal export with frames lacking enough neighbours
    "test_aa_order_dynamic_normals_export_incomplete":
        "tests/test_normals.py::test_normals_export_incomplete",

    # ---- CLI failure paths (tests_bin.rs) → tests/test_cli.py
    "test_bin_cg_leaflets_fail_nonexistent_traj":
        "tests/test_cli.py::test_cli_nonexistent_trajectory",
    "test_bin_aa_leaflets_fail_no_ndx":
        "tests/test_leaflets_manual.py::test_ndx_wrong_file_count (CLI "
        "error surface: tests/test_cli.py::test_cli_invalid_config)",
    "test_bin_aa_order_writing_fail":
        "tests/test_cli.py::test_cli_unwritable_output",
    "test_bin_aa_order_fail":
        "tests/test_runtime_errors.py::test_heavy_hydrogen_overlap_fails "
        "(CLI surface: tests/test_cli.py)",
    "test_bin_missing_output_fail":
        "tests/test_cli.py::test_cli_missing_yaml_output",
    "test_bin_missing_maps_output_fail":
        "tests/test_cli.py::test_cli_missing_maps_output",

    # ---- goldens only consumable through absent fixtures
    "aa_order_buckled.yaml":
        "blocked: aa_buckled.tpr/.xtc absent (.MISSING_LARGE_BLOBS); "
        "physics cross-checked on generated buckled systems "
        "(tests/test_synthetic_systems.py, tests/test_brute_force.py)",
    "cg_order_vesicle.yaml":
        "blocked: vesicle.xtc absent (.MISSING_LARGE_BLOBS); physics "
        "cross-checked on generated vesicles "
        "(tests/test_synthetic_systems.py, tests/test_brute_force.py)",
    "aa_order_leaflets_lammps.yaml":
        "blocked: asserted only by a test block-commented since v0.7 "
        "(deprecated trajectory formats); the repo reproduces the "
        "deprecation rejection (tests/test_traj_formats.py)",
    "normals_incomplete.yaml":
        "tests/test_normals.py::test_normals_export_incomplete",
    "ordermap_atom_expected.dat":
        "unit-test fixture of the reference's in-file ordermap writer "
        "tests (src/analysis/ordermap.rs #[cfg(test)]); repo equivalent: "
        "tests/test_ordermaps.py writer-format unit tier",
    "ordermap_bonds_expected.dat":
        "unit-test fixture of the reference's in-file ordermap writer "
        "tests; repo equivalent: tests/test_ordermaps.py writer-format "
        "unit tier",
}
