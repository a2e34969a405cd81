"""Command-line interface.

Mirrors the reference binary's options (localhap.cpp:22-40):

    python -m ambigram_tpu.cli --op bfb --in_lh test.lh --lp_prefix test
    python -m ambigram_tpu.cli --op sc_bfb --in_lh a.lh,b.lh --lp_prefix t

Options: --op {bfb, sc_bfb}, --in_lh, --lp_prefix, --juncdb,
--junc_info, --reversed, --all, plus engine extras (--solver,
--no-ledgers).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ambigram_tpu", description="TPU-native local haplotype constructor"
    )
    p.add_argument("--op", required=True, choices=["bfb", "sc_bfb"], help="Operate: bfb")
    p.add_argument("--in_lh", required=True, help="Input .lh file (comma list for sc_bfb)")
    p.add_argument("--lp_prefix", default="sample", help="ILP output file prefix")
    p.add_argument(
        "--juncdb",
        default="",
        help="Input .juncs file with linkage information from linked/long reads",
    )
    p.add_argument(
        "--junc_info",
        default="false",
        help="Whether to use linked/long reads information in ILP (true/false)",
    )
    p.add_argument(
        "--reversed",
        dest="is_reversed",
        default="false",
        help="Find BFB paths starting from the negative strand (true/false)",
    )
    p.add_argument(
        "--all",
        dest="print_all",
        default="false",
        help="Print all possible BFB paths (true/false)",
    )
    p.add_argument(
        "--solver",
        default="exact",
        choices=["exact", "device", "auto"],
        help="ILP solver backend (default: exact, in-process)",
    )
    p.add_argument(
        "--no-ledgers",
        action="store_true",
        help="Skip appending simulation_sv.txt / time.csv",
    )
    return p


def _boolish(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "on")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.op == "bfb":
        from ambigram_tpu.engine.pipeline import run_bfb

        run_bfb(
            args.in_lh,
            juncs_path=args.juncdb,
            juncs_info=_boolish(args.junc_info),
            is_reversed=_boolish(args.is_reversed),
            print_all=_boolish(args.print_all),
            solver=args.solver,
            out=sys.stdout,
            ledger_dir=None if args.no_ledgers else ".",
            lp_prefix=args.lp_prefix,
        )
        return 0
    else:
        from ambigram_tpu.engine.sc import run_sc_bfb

        run_sc_bfb(
            args.in_lh,
            juncs_path=args.juncdb,
            juncs_info=_boolish(args.junc_info),
            is_reversed=_boolish(args.is_reversed),
            print_all=_boolish(args.print_all),
            solver=args.solver,
            out=sys.stdout,
            ledger_dir=None if args.no_ledgers else ".",
            lp_prefix=args.lp_prefix,
        )
        return 0


if __name__ == "__main__":
    sys.exit(main())
