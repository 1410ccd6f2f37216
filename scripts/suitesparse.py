#!/usr/bin/env python
"""SC'18 SuiteSparse benchmark set — the reference's scripts/dlMat.sh:4-21.

Downloads are network-gated: in an air-gapped environment this script only
prints the download plan; run it on a connected machine (or point
``--from-dir`` at a local mirror) to materialize ``matrices/``.
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import tarfile
import urllib.request

#: (group, name) — scripts/dlMat.sh:4-21
MATRICES = [
    ("AMD", "G3_circuit"), ("McRae", "ecology2"), ("Schmid", "thermal2"),
    ("GHS_psdef", "apache2"), ("Janna", "StocF-1465"), ("Janna", "Hook_1498"),
    ("CEMW", "tmt_sym"), ("Janna", "PFlow_742"), ("Janna", "Flan_1565"),
    ("GHS_psdef", "audikw_1"), ("Oberwolfach", "bone010"),
    ("Botonakis", "thermomech_dM"), ("Janna", "Emilia_923"),
    ("Janna", "Fault_639"), ("GHS_psdef", "bmwcra_1"),
    ("ND", "nd24k"), ("ND", "nd12k"),
]
URL = "https://suitesparse-collection-website.herokuapp.com/MM/{g}/{m}.tar.gz"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dest", default="matrices")
    p.add_argument("--from-dir", default=None,
                   help="local mirror of <name>.tar.gz files (no network)")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()
    os.makedirs(args.dest, exist_ok=True)
    failures = 0
    for g, m in MATRICES:
        out = os.path.join(args.dest, f"{m}.mtx")
        if os.path.exists(out):
            print(f"have    {out}")
            continue
        tgz = (os.path.join(args.from_dir, f"{m}.tar.gz")
               if args.from_dir else None)
        if args.dry_run or (tgz is None and os.environ.get("NO_NETWORK")):
            print(f"plan    {URL.format(g=g, m=m)} -> {out}")
            continue
        try:
            if tgz is None:
                tgz = os.path.join(args.dest, f"{m}.tar.gz")
                urllib.request.urlretrieve(URL.format(g=g, m=m), tgz)
            with tarfile.open(tgz) as tf:
                member = next(x for x in tf.getmembers()
                              if x.name.endswith(f"{m}.mtx"))
                with tf.extractfile(member) as src, open(out, "wb") as dst:
                    shutil.copyfileobj(src, dst)
            print(f"fetched {out}")
        except Exception as e:  # zero-egress environments land here
            print(f"skip    {m}: {e}", file=sys.stderr)
            failures += 1
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
