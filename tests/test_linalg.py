"""KKT linear-algebra tests: condensed Cholesky vs dense LU ground truth."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.solver import linalg  # noqa: E402


def _kkt_system(n=120, m=80, cond=1e5, delta_c=0.0, seed=0):
    """Random PD-H saddle system with controlled conditioning."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    vals = np.logspace(0, -np.log10(cond), n)
    H = q @ np.diag(vals) @ q.T
    JE = rng.normal(size=(m, n))
    K = np.block([[H, JE.T], [JE, -delta_c * np.eye(m)]])
    sol_true = rng.normal(size=n + m)
    rhs = K @ sol_true
    return H, JE, rhs[:n], rhs[n:], sol_true


class TestCondensedChol:
    def test_matches_truth(self):
        H, JE, r1, r2, sol_true = _kkt_system()
        fact = linalg.kkt_factorize(jnp.asarray(H), jnp.asarray(JE), 0.0,
                                    "chol")
        dz, dy = linalg.kkt_solve("chol", fact, jnp.asarray(r1),
                                  jnp.asarray(r2), n_refine=1)
        np.testing.assert_allclose(np.concatenate([dz, dy]), sol_true,
                                   rtol=1e-8)

    def test_matches_lu(self):
        H, JE, r1, r2, _ = _kkt_system(cond=1e3, seed=3)
        fc = linalg.kkt_factorize(jnp.asarray(H), jnp.asarray(JE), 0.0, "chol")
        fl = linalg.kkt_factorize(jnp.asarray(H), jnp.asarray(JE), 0.0, "lu")
        dzc, dyc = linalg.kkt_solve("chol", fc, jnp.asarray(r1),
                                    jnp.asarray(r2))
        dzl, dyl = linalg.kkt_solve("lu", fl, jnp.asarray(r1),
                                    jnp.asarray(r2))
        np.testing.assert_allclose(np.asarray(dzc), np.asarray(dzl),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(dyc), np.asarray(dyl),
                                   rtol=1e-9, atol=1e-11)

    def test_dual_regularization(self):
        """delta_c > 0 (recovery mode) shifts the (2,2) block."""
        H, JE, r1, r2, sol_true = _kkt_system(delta_c=1e-4, seed=5)
        fact = linalg.kkt_factorize(jnp.asarray(H), jnp.asarray(JE), 1e-4,
                                    "chol")
        dz, dy = linalg.kkt_solve("chol", fact, jnp.asarray(r1),
                                  jnp.asarray(r2), n_refine=1)
        np.testing.assert_allclose(np.concatenate([dz, dy]), sol_true,
                                   rtol=1e-7)

    def test_barrier_ill_conditioning(self):
        """Huge barrier diagonal (near-active bounds at mu=1e-9) — the regime
        that sank the f32-LU path.  One fp64 refinement sweep must hold
        ~1e-8 relative accuracy despite the condensed form squaring cond(JE).
        """
        rng = np.random.default_rng(7)
        n, m = 150, 100
        sigma = 10.0 ** rng.uniform(-2, 8, size=n)  # barrier-like spread
        H = np.diag(sigma) + 1e-2 * np.eye(n)
        JE = rng.normal(size=(m, n))
        K = np.block([[H, JE.T], [JE, np.zeros((m, m))]])
        sol_true = rng.normal(size=n + m)
        rhs = K @ sol_true
        fact = linalg.kkt_factorize(jnp.asarray(H), jnp.asarray(JE), 0.0,
                                    "chol")
        dz, dy = linalg.kkt_solve("chol", fact, jnp.asarray(rhs[:n]),
                                  jnp.asarray(rhs[n:]), n_refine=2)
        got = np.concatenate([dz, dy])
        rel = np.linalg.norm(got - sol_true) / np.linalg.norm(sol_true)
        assert rel < 1e-7, rel

    def test_nonpd_h_yields_nan(self):
        """chol is the inertia oracle: indefinite H must signal via NaN."""
        rng = np.random.default_rng(9)
        n, m = 40, 20
        H = -np.eye(n)  # negative definite
        JE = rng.normal(size=(m, n))
        fact = linalg.kkt_factorize(jnp.asarray(H), jnp.asarray(JE), 0.0,
                                    "chol")
        dz, dy = linalg.kkt_solve("chol", fact, jnp.ones(n), jnp.ones(m),
                                  n_refine=0)
        assert not bool(jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(dy)))

    def test_no_equalities(self):
        """mE = 0 degenerates to a plain PD solve (Rosenbrock-style tests)."""
        H, _, r1, _, _ = _kkt_system(m=80, seed=11)
        JE = np.zeros((0, H.shape[0]))
        fact = linalg.kkt_factorize(jnp.asarray(H), jnp.asarray(JE), 0.0,
                                    "chol")
        dz, dy = linalg.kkt_solve("chol", fact, jnp.asarray(r1), jnp.zeros(0))
        np.testing.assert_allclose(np.asarray(H @ np.asarray(dz)), r1,
                                   rtol=1e-7, atol=1e-9)
        assert dy.shape == (0,)

    def test_refinement_guard_never_worse(self):
        """More sweeps must never yield a larger residual (guarded)."""
        H, JE, r1, r2, _ = _kkt_system(cond=3e7, seed=13)
        fact = linalg.kkt_factorize(jnp.asarray(H), jnp.asarray(JE), 0.0,
                                    "chol")
        K = np.block([[H, JE.T], [JE, np.zeros((JE.shape[0],) * 2)]])
        rhs = np.concatenate([r1, r2])

        def resid(k):
            dz, dy = linalg.kkt_solve("chol", fact, jnp.asarray(r1),
                                      jnp.asarray(r2), n_refine=k)
            return np.linalg.norm(K @ np.concatenate([dz, dy]) - rhs)

        # both residuals sit at machine precision; allow eps-level jitter
        # between jnp/np summation orders
        assert resid(8) <= max(resid(1) * 1.5, 1e-12)
