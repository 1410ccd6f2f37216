#!/usr/bin/env python
"""Parameter-sweep evaluation — the reference's scripts/eval.sh + lib_eval.sh.

The reference sweeps levelParam in {2,1,0,-1,-2} x divRate in {2,4} over its
matrix set and greps stdout; here the swept axes are the TPU-relevant ones
(tier, ordering, supernode width cap) and every run emits one JSON line, so
the output is a JSONL table.

    python scripts/eval.py gen:laplace3d:16 gen:femgrid:24 --iters 3
    python scripts/eval.py matrices/*.mtx --baselines
"""
from __future__ import annotations

import argparse
import itertools
import json
import subprocess
import sys

SWEEP = {
    "tier": ["simplicial", "supernodal"],
    "ordering": ["amd", "nd"],
    "max_width": [64, 128],
}


def run(cmd: list[str]) -> None:
    r = subprocess.run([sys.executable, "-m", "parsy_bench_tpu.cli"] + cmd,
                       capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if line.startswith("{"):
            print(line, flush=True)
    if r.returncode != 0:
        print(json.dumps({"error": cmd, "stderr": r.stderr[-400:]}),
              flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("matrices", nargs="+")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--baselines", action="store_true",
                   help="also run the scipy library baselines (lib_eval.sh)")
    p.add_argument("--trisolve", action="store_true")
    args = p.parse_args()
    for mtx in args.matrices:
        for tier, ordering, w in itertools.product(
                SWEEP["tier"], SWEEP["ordering"], SWEEP["max_width"]):
            if tier == "simplicial" and w != SWEEP["max_width"][-1]:
                continue  # width cap only affects the supernodal tier
            if tier == "simplicial" and "randspd" in mtx:
                # near-dense factors (nd24k/nd12k class, dlMat.sh:20-21)
                # are a known boundary of the scalar level-scheduled
                # tier: its per-element plan explodes compile time.  The
                # blocked supernodal tier is the right executor there
                # (panel-chain roots handle density by construction) and
                # covers the class below.
                continue
            run(["cholesky", mtx, "--tier", tier, "--ordering", ordering,
                 "--max-width", str(w),
                 "--iters", str(args.iters), "--verify"])
        if args.trisolve:
            for tier in SWEEP["tier"]:
                run(["trisolve", mtx, "--tier", tier,
                     "--iters", str(args.iters)])
        if args.baselines:
            run(["baseline", mtx, "--iters", str(args.iters)])


if __name__ == "__main__":
    main()
