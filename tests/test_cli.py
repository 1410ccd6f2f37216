"""Driver-level tests: the reference exercises its code exclusively through
benchmark drivers (examples/, libExample/); these cover the same entry
points on tiny matrices."""
import json
import io as _stdio
import contextlib

import numpy as np
import scipy.io as sio
import scipy.sparse as sp

from parsy_bench_tpu.cli import main


def _run(argv) -> list[dict]:
    buf = _stdio.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    return [json.loads(s) for s in buf.getvalue().splitlines()
            if s.startswith("{")]


def test_baseline_driver():
    (out,) = _run(["baseline", "gen:laplace2d:8", "--iters", "1"])
    assert out["splu_residual"] < 1e-10
    assert out["trsv_verified"]


def test_lowerhalf_driver(tmp_path):
    full = tmp_path / "full.mtx"
    low = tmp_path / "low.mtx"
    a = sp.random(12, 12, density=0.3, random_state=0)
    a = (a + a.T + 12 * sp.eye(12)).tocoo()
    sio.mmwrite(str(full), a)
    (out,) = _run(["lowerhalf", str(full), str(low)])
    assert out["n"] == 12
    # the file must *store* only the lower half under a symmetric header
    # (mmread would expand it back to the full matrix, so inspect storage)
    assert sio.mminfo(str(low))[5] == "symmetric"
    stored = [ln.split() for ln in open(low)
              if not ln.startswith("%")][1:]   # skip header + size line
    assert all(int(r) >= int(c) for r, c, *_ in stored)
    # expanding the symmetric storage must reproduce the original matrix
    m = sio.mmread(str(low)).tocsc()
    assert abs(m - a.tocsc()).max() < 1e-12


def test_trisolve_lower_nonchordal(tmp_path):
    # general non-chordal lower-triangular L read directly (--lower):
    # reference triangularTest_DAG_nonChordal.cpp
    n = 40
    m = sp.random(n, n, density=0.08, random_state=1, format="csc")
    l = (sp.tril(m, -1) + sp.eye(n)).tocoo()
    path = tmp_path / "l.mtx"
    sio.mmwrite(str(path), l)
    (out,) = _run(["trisolve", str(path), "--lower", "--tier", "simplicial",
                   "--iters", "1"])
    assert out["verified"]


def test_ordering_file_roundtrip(tmp_path):
    from parsy_bench_tpu.core.io import read_ordering, write_ordering
    perm = np.random.default_rng(0).permutation(16)
    path = tmp_path / "perm.txt"
    write_ordering(str(path), perm)
    assert np.array_equal(read_ordering(str(path), 16), perm)
    (out,) = _run(["cholesky", "gen:laplace2d:4", "--tier", "simplicial",
                   "--ordering-file", str(path), "--iters", "1", "--verify"])
    assert out["factor_residual"] < 1e-3
