"""Matrix / ordering file IO.

MatrixMarket coordinate IO with the same storage contract as the reference
(common/Util.h:77 ``readMatrix``: lower-half of a symmetric matrix), plus the
PaStiX-style ordering-file reader (common/Util.h:187 ``readOrdering``) that
makes the symbolic phase cacheable-by-contract, and schedule (de)serialization
— the new framework's checkpointable artifact (SURVEY §5.4).
"""
from __future__ import annotations

import io as _io
import json
import os
import pickle
from typing import Optional

import numpy as np
import scipy.io as sio
import scipy.sparse as sp

from parsy_bench_tpu.core.csc import CSC


def read_matrix_market(path: str, lower: bool = True) -> CSC:
    """Read a MatrixMarket file into CSC.

    ``lower=True`` keeps only the lower half (i >= j) — symmetric ``.mtx``
    files from SuiteSparse already store exactly that, and general files are
    projected, matching the reference driver input contract.
    """
    m = sio.mmread(path).tocsc()
    if lower:
        m = sp.tril(m, 0).tocsc()
    m.sum_duplicates()
    m.sort_indices()
    return CSC.from_scipy(m)


def write_matrix_market(path: str, a: CSC, symmetric: bool = True) -> None:
    """Write lower-half CSC as a symmetric MatrixMarket file (the inverse of
    ``read_matrix_market``; reference: MakingLowerHalf.cpp:9 emits the same
    format)."""
    sio.mmwrite(path, a.to_scipy(), symmetry="symmetric" if symmetric else "general")


def read_ordering(path: str, n: int) -> np.ndarray:
    """PaStiX-format ordering file: header line with n, then ``i perm[i]``
    pairs (reference: common/Util.h:187)."""
    with open(path) as f:
        first = f.readline().split()
        count = int(first[0])
        if count != n:
            raise ValueError(f"ordering file is for n={count}, matrix has n={n}")
        perm = np.empty(n, dtype=np.int32)
        for _ in range(n):
            i, p = f.readline().split()[:2]
            perm[int(i)] = int(p)
    return perm


def write_ordering(path: str, perm: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write(f"{len(perm)} 0\n")
        for i, p in enumerate(np.asarray(perm)):
            f.write(f"{i} {int(p)}\n")


# --------------------------------------------------------------------------
# Symbolic-artifact checkpointing: the inspector output (permutation,
# supernode partition, schedule index arrays) is the expensive, reusable part
# of a solve — serialize it once per sparsity pattern.
# --------------------------------------------------------------------------

def save_artifact(path: str, obj, meta: Optional[dict] = None) -> None:
    payload = {"meta": meta or {}, "obj": obj}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_artifact(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["obj"], payload["meta"]
