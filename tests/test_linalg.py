"""Mixed-precision KKT solve tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.solver import linalg  # noqa: E402


class TestMixedPrecisionSolve:
    def _system(self, n=200, cond=1e6, seed=0):
        rng = np.random.default_rng(seed)
        q, _ = np.linalg.qr(rng.normal(size=(n, n)))
        vals = np.logspace(0, -np.log10(cond), n)
        K = q @ np.diag(vals) @ q.T
        x_true = rng.normal(size=n)
        return jnp.asarray(K), jnp.asarray(K @ x_true), x_true

    def test_f64_direct(self):
        K, b, x_true = self._system()
        x = np.asarray(linalg.solve(linalg.factorize(K, use_f32=False), b))
        np.testing.assert_allclose(x, x_true, rtol=1e-8)

    def test_f32_refined_reaches_f64_accuracy(self):
        K, b, x_true = self._system(cond=1e6)
        x = np.asarray(linalg.solve(linalg.factorize(K, use_f32=True), b, 4))
        np.testing.assert_allclose(x, x_true, rtol=1e-8)

    def test_refinement_guard_never_worse_than_first_solve(self):
        """On a near-singular system extra sweeps must not blow up."""
        K, b, x_true = self._system(cond=3e7, seed=1)
        fact = linalg.factorize(K, use_f32=True)
        x4 = np.asarray(linalg.solve(fact, b, 4))
        x12 = np.asarray(linalg.solve(fact, b, 12))
        r4 = np.linalg.norm(np.asarray(K) @ x4 - np.asarray(b))
        r12 = np.linalg.norm(np.asarray(K) @ x12 - np.asarray(b))
        assert r12 <= r4 * 1.01  # guarded: more sweeps can't be worse

    def test_indefinite_kkt_like(self):
        """Saddle systems (KKT structure) also refine correctly."""
        rng = np.random.default_rng(2)
        n, m = 60, 40
        H = rng.normal(size=(n, n))
        H = H @ H.T + np.eye(n)
        A = rng.normal(size=(m, n))
        K = np.block([[H, A.T], [A, np.zeros((m, m))]])
        x_true = rng.normal(size=n + m)
        b = jnp.asarray(K @ x_true)
        x = np.asarray(linalg.solve(linalg.factorize(jnp.asarray(K), True), b, 4))
        np.testing.assert_allclose(x, x_true, rtol=1e-8)
