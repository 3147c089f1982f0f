"""Low-rank (Woodbury) KKT machinery tests vs the dense reference path."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.solver import linalg, lowrank  # noqa: E402
from gelato_tpu.solver.ip import _lbfgs_matrix_device  # noqa: E402


def _random_pairs(n=30, mem=6, n_valid=4, seed=0):
    rng = np.random.default_rng(seed)
    S = np.zeros((mem, n))
    Y = np.zeros((mem, n))
    # build pairs with positive curvature from a reference SPD matrix
    A = rng.normal(size=(n, n))
    Href = A @ A.T / n + np.eye(n)
    for j in range(n_valid):
        s = rng.normal(size=n)
        S[j % mem] = s
        Y[j % mem] = Href @ s + 0.05 * rng.normal(size=n)
    return jnp.asarray(S), jnp.asarray(Y), n_valid


def test_factors_match_dense_lbfgs():
    """sigma I + V diag(c) Vᵀ equals the materialized damped-BFGS matrix."""
    S, Y, count = _random_pairs()
    B_dense = np.asarray(_lbfgs_matrix_device(S, Y, jnp.asarray(count)))
    sigma, V, c = lowrank.lbfgs_factors(S, Y, jnp.asarray(count))
    B_fact = float(sigma) * np.eye(S.shape[1]) + np.asarray(
        V @ (jnp.diag(c) @ V.T))
    # zero columns with c=1 contribute nothing; valid pairs must agree
    np.testing.assert_allclose(B_fact, B_dense, rtol=1e-10, atol=1e-10)


def test_woodbury_hinv():
    rng = np.random.default_rng(1)
    n, k = 40, 10
    Dd = 10.0 ** rng.uniform(-1, 3, size=n)
    V = rng.normal(size=(n, k))
    c = np.concatenate([np.full(k // 2, 1.0), np.full(k - k // 2, -0.1)])
    H = np.diag(Dd) + V @ np.diag(c) @ V.T
    # shift the diagonal so H is PD regardless of the random draw
    shift = max(0.0, 1.0 - np.linalg.eigvalsh(H).min())
    Dd = Dd + shift
    H = H + shift * np.eye(n)
    fact = lowrank.lowrank_factorize(jnp.asarray(Dd), jnp.asarray(V),
                                     jnp.asarray(c))
    x = rng.normal(size=n)
    got = np.asarray(lowrank.apply_hinv(fact, jnp.asarray(x)))
    np.testing.assert_allclose(H @ got, x, rtol=1e-9, atol=1e-9)
    # matrix right-hand sides too
    X = rng.normal(size=(n, 5))
    gotX = np.asarray(lowrank.apply_hinv(fact, jnp.asarray(X)))
    np.testing.assert_allclose(H @ gotX, X, rtol=1e-9, atol=1e-8)


def test_lowrank_kkt_matches_dense_chol():
    """Full condensed solve via Woodbury factors == dense chol path."""
    rng = np.random.default_rng(2)
    n, k, mE = 50, 8, 30
    Dd = 10.0 ** rng.uniform(-1, 2, size=n)
    V = rng.normal(size=(n, k)) * 0.5
    c = np.where(np.arange(k) % 2 == 0, 1.0, -0.05)
    H = np.diag(Dd) + V @ np.diag(c) @ V.T
    shift = max(0.0, 1.0 - np.linalg.eigvalsh(H).min())
    Dd = Dd + shift
    H = H + shift * np.eye(n)
    JE = rng.normal(size=(mE, n))
    r1 = rng.normal(size=n)
    r2 = rng.normal(size=mE)
    delta_c = 1e-8

    # dense reference
    fd = linalg.kkt_factorize(jnp.asarray(H), jnp.asarray(JE), delta_c,
                              "chol")
    dz_d, dy_d = linalg.kkt_solve("chol", fd, jnp.asarray(r1),
                                  jnp.asarray(r2), n_refine=1)

    # low-rank path
    fl = lowrank.lowrank_factorize(jnp.asarray(Dd), jnp.asarray(V),
                                   jnp.asarray(c))
    Ssys = lowrank.schur_dense(fl, jnp.asarray(JE), delta_c)
    Ls = jnp.linalg.cholesky(Ssys)
    dz_l, dy_l = lowrank.kkt_solve_lowrank(fl, Ls, jnp.asarray(JE), delta_c,
                                           jnp.asarray(r1), jnp.asarray(r2))

    np.testing.assert_allclose(np.asarray(dz_l), np.asarray(dz_d),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dy_l), np.asarray(dy_d),
                               rtol=1e-7, atol=1e-9)


def test_blocktridiag_cholesky_and_solve():
    """Scan-based block-tridiagonal Cholesky == dense reference."""
    rng = np.random.default_rng(5)
    S, b = 6, 7
    n = S * b
    # SPD block-tridiagonal matrix
    A = np.zeros((n, n))
    for i in range(S):
        Q = rng.normal(size=(b, b))
        A[i*b:(i+1)*b, i*b:(i+1)*b] = Q @ Q.T + 5.0 * np.eye(b)
    for i in range(S - 1):
        C = 0.5 * rng.normal(size=(b, b))
        A[(i+1)*b:(i+2)*b, i*b:(i+1)*b] = C
        A[i*b:(i+1)*b, (i+1)*b:(i+2)*b] = C.T
    assert np.linalg.eigvalsh(A).min() > 0

    Adiag = jnp.asarray(np.stack([A[i*b:(i+1)*b, i*b:(i+1)*b]
                                  for i in range(S)]))
    Alow = jnp.asarray(np.stack([A[(i+1)*b:(i+2)*b, i*b:(i+1)*b]
                                 for i in range(S - 1)]))
    Ld, Ll = lowrank.blocktridiag_cholesky(Adiag, Alow)

    # reconstruct the dense factor and check A = L L^T
    L = np.zeros((n, n))
    for i in range(S):
        L[i*b:(i+1)*b, i*b:(i+1)*b] = np.asarray(Ld[i])
    for i in range(S - 1):
        L[(i+1)*b:(i+2)*b, i*b:(i+1)*b] = np.asarray(Ll[i])
    np.testing.assert_allclose(L @ L.T, A, rtol=1e-10, atol=1e-10)

    rhs = rng.normal(size=(S, b))
    x = np.asarray(lowrank.blocktridiag_solve(Ld, Ll, jnp.asarray(rhs)))
    np.testing.assert_allclose(A @ x.ravel(), rhs.ravel(), rtol=1e-9,
                               atol=1e-9)


def test_blocktridiag_single_block():
    """Degenerate S=1 case: plain Cholesky solve."""
    rng = np.random.default_rng(6)
    b = 5
    Q = rng.normal(size=(b, b))
    A = Q @ Q.T + 3.0 * np.eye(b)
    Ld, Ll = lowrank.blocktridiag_cholesky(jnp.asarray(A[None]),
                                           jnp.zeros((0, b, b)))
    rhs = rng.normal(size=(1, b))
    x = np.asarray(lowrank.blocktridiag_solve(Ld, Ll, jnp.asarray(rhs)))
    np.testing.assert_allclose(A @ x[0], rhs[0], rtol=1e-10, atol=1e-10)
