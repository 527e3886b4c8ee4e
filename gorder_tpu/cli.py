"""Command-line application.

Behavioral reference: src/application/mod.rs:25-211 — `gorder CONFIG.yaml
[--silent] [--overwrite] [--export-config FILE]`, YAML output required in
CLI mode, banner + ✔/✖ footer, exit code 0/1.
"""

from __future__ import annotations

import argparse
import logging
import sys

from .errors import GorderError
from .input.config import Analysis
from .version import __version__


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="gorder-tpu",
        description=(
            "Calculate lipid order parameters from GROMACS trajectories "
            "(TPU-native rebuild of gorder)."
        ),
    )
    parser.add_argument("config", help="path to the YAML configuration file")
    parser.add_argument(
        "-s", "--silent", action="store_true",
        help="suppress standard output during the analysis")
    parser.add_argument(
        "-o", "--overwrite", action="store_true",
        help="overwrite output files without backups")
    parser.add_argument(
        "--export-config", metavar="FILE", default=None,
        help="export the analysis options (with defaults) to a YAML file")
    parser.add_argument(
        "--frame-shard", metavar="I/N", default=None,
        help="process only frame shard I of N (contiguous block); "
             "requires --partial (multi-host map-reduce, docs/SCALING.md)")
    parser.add_argument(
        "--partial", metavar="FILE.npz", default=None,
        help="write the shard's raw partial state instead of results")
    parser.add_argument(
        "--merge", metavar="FILE.npz", nargs="+", default=None,
        help="merge partial states (paths or globs) into the configured "
             "outputs — byte-identical to a single-process run")
    parser.add_argument(
        "--version", action="version", version=f"gorder-tpu {__version__}")
    return parser


def export_config(analysis: Analysis, path: str) -> None:
    from .input.export import analysis_to_yaml

    with open(path, "w") as fh:
        fh.write(analysis_to_yaml(analysis))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    try:
        analysis = Analysis.from_file(args.config)
    except GorderError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    if args.silent:
        analysis.silent = True
    if args.overwrite:
        analysis.overwrite = True

    logging.basicConfig(
        level=logging.ERROR if analysis.silent else logging.INFO,
        format="[*] %(message)s",
    )

    if not analysis.silent:
        print(f">>> GORDER-TPU v{__version__} <<<\n")

    if args.frame_shard is not None:
        if args.partial is None:
            print("error: --frame-shard requires --partial",
                  file=sys.stderr)
            return 1
        try:
            shard_index, shard_count = (int(v) for v in
                                        args.frame_shard.split("/"))
        except ValueError:
            print(f"error: invalid --frame-shard '{args.frame_shard}' "
                  f"(expected I/N)", file=sys.stderr)
            return 1
        from .parallel.shard import save_partial

        try:
            state = analysis.run_partial(shard_index, shard_count)
            save_partial(args.partial, state)
        except GorderError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        if not analysis.silent:
            print(f"\n✔ shard {shard_index}/{shard_count} state written "
                  f"to '{args.partial}'")
        return 0

    if analysis.output_yaml is None:
        print(
            "error: an output yaml file must be specified when running "
            "gorder-tpu from the command line", file=sys.stderr)
        return 1
    if analysis.map is not None and analysis.map.output_directory is None:
        print(
            "error: an ordermap output directory must be specified when "
            "running gorder-tpu from the command line", file=sys.stderr)
        return 1

    if args.merge is not None:
        from .parallel.shard import expand_partial_paths

        try:
            results = analysis.merge(expand_partial_paths(args.merge))
            results.write()
        except GorderError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        if not analysis.silent:
            print("\n✔ merged partial states; results written")
        return 0

    from .utils.timers import timers

    try:
        results = analysis.run()
        with timers.phase("write"):
            results.write()
        if args.export_config:
            export_config(analysis, args.export_config)
    except GorderError as e:
        if not analysis.silent:
            print(f"\n✖ error: {e}", file=sys.stderr)
        else:
            print(f"error: {e}", file=sys.stderr)
        return 1

    if not analysis.silent:
        print("\n✔ analysis completed successfully")
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
