#!/usr/bin/env python
"""Validate a SwiftMHC-format HDF5 file against the training/sampling
reader's schema (reference README.md:15-37 / diffusion/data.py:35-119).

Prints one line per problem and exits non-zero if any were found —
use before a long training run to fail fast on schema drift instead of
crashing mid-epoch.

Usage:
    python tools/validate_hdf5.py train.hdf5 [--max-entries N] [--strict]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hdf5", help="SwiftMHC-format HDF5 file")
    ap.add_argument("--max-entries", type=int, default=None,
                    help="check only the first N entries (default: all)")
    ap.add_argument("--strict", action="store_true",
                    help="also flag accepted-but-noncanonical dtypes "
                         "(e.g. float64 where float32 is canonical)")
    args = ap.parse_args()

    from pmhc_tpu.data.validate import validate_hdf5

    checked, problems = validate_hdf5(
        args.hdf5, max_entries=args.max_entries, strict=args.strict)
    for p in problems:
        print(p)
    print(f"{checked} entries checked, {len(problems)} problems")
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
