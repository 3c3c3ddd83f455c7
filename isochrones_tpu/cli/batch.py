"""``batch-starfit`` CLI: write + submit a SLURM batch script sharding a
folder list (reference scripts/batch_starfit)."""

from __future__ import annotations

import argparse
import subprocess
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="Fire up a batch starfit job")
    parser.add_argument("file", type=str)
    parser.add_argument("-n", "--nsplit", type=int, default=None)
    parser.add_argument("--ntasks_per_node", type=int, default=20)
    parser.add_argument("-t", "--time", type=float, default=5, help="minutes per fit")
    parser.add_argument("--no_submit", action="store_true", help="write the script but do not sbatch it")
    parser.add_argument("extra", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)

    from ..starfit import batch_starfit_script

    script = batch_starfit_script(
        args.file, nsplit=args.nsplit, ntasks_per_node=args.ntasks_per_node,
        minutes_per_fit=args.time, extra=args.extra,
    )
    print(f"Batch script written to {script}")
    if not args.no_submit:
        subprocess.call(f"sbatch {script}", shell=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
