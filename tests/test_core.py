"""Core container / IO / generator tests."""
import numpy as np
import pytest
import scipy.sparse as sp

from parsy_bench_tpu.core import generate, io
from parsy_bench_tpu.core.csc import CSC, rhs_init_trisolve, check_triangular


@pytest.mark.parametrize("name", sorted(generate.SUITE))
def test_generators_spd_lower(name):
    a = generate.SUITE[name]()
    assert a.is_lower()
    full = a.symmetrize_from_lower().to_dense()
    assert np.allclose(full, full.T)
    # SPD: smallest eigenvalue positive (dense check on moderate sizes only)
    if a.n <= 2500:
        w = np.linalg.eigvalsh(full)
        assert w.min() > 0, f"{name}: min eig {w.min()}"


def test_permute_roundtrip():
    a = generate.laplace_2d(8)
    rng = np.random.default_rng(0)
    perm = rng.permutation(a.n)
    ap = a.permute(perm)
    assert ap.is_lower()
    full = a.symmetrize_from_lower().to_dense()
    fullp = ap.symmetrize_from_lower().to_dense()
    assert np.allclose(fullp, full[np.ix_(perm, perm)])


def test_lower_half_and_symmetrize():
    a = generate.random_spd(50, seed=3)
    full = a.symmetrize_from_lower()
    assert np.allclose(full.lower_half().to_dense(), a.to_dense())


def test_matrix_market_roundtrip(tmp_path):
    a = generate.random_spd(40, seed=4)
    path = str(tmp_path / "m.mtx")
    io.write_matrix_market(path, a)
    b = io.read_matrix_market(path)
    assert b.n == a.n
    assert np.allclose(b.to_dense(), a.to_dense())


def test_ordering_file_roundtrip(tmp_path):
    perm = np.random.default_rng(1).permutation(17).astype(np.int32)
    path = str(tmp_path / "ord.txt")
    io.write_ordering(path, perm)
    back = io.read_ordering(path, 17)
    assert np.array_equal(back, perm)


def test_rhs_init_and_check():
    a = generate.laplace_2d(6)
    lo = sp.tril(a.symmetrize_from_lower().to_scipy()).tocsc()
    l = CSC.from_scipy(lo)
    b = rhs_init_trisolve(l)
    x = sp.linalg.spsolve_triangular(lo.tocsr(), b, lower=True)
    assert check_triangular(x)
    assert not check_triangular(x + 0.01)
