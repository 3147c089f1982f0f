"""Hybrid exact-Hessian endgame tests (host loop and fused device step)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.solver import solve, IPOptions  # noqa: E402
from gelato_tpu.solver.ip import make_fused_step  # noqa: E402


FUNCS = dict(
    obj=lambda z: (z[0] - 2.0) ** 2 + (z[1] - 1.0) ** 2 + z[0] * z[1] * 0.1,
    eq=lambda z: jnp.asarray([z[0] + z[1] - 2.0]),
    ineq=lambda z: jnp.asarray([z[0] - z[1]]),
)


def test_host_hybrid_converges():
    st, info = solve(FUNCS, np.array([0.5, 0.5]), np.zeros(2), np.full(2, 5.0),
                     IPOptions(hessian="hybrid", hybrid_mu_switch=1e-4,
                               hybrid_err_switch=1e-1))
    assert info["converged"]


def test_fused_hybrid_matches_lbfgs_solution():
    """The device hybrid branch reaches the same optimum as pure L-BFGS."""
    sols = {}
    for hess in ("lbfgs", "hybrid"):
        opts = IPOptions(hessian=hess, hybrid_mu_switch=1e-4,
                         hybrid_err_switch=1e-1)
        step, state0 = make_fused_step(FUNCS, np.zeros(2), np.full(2, 5.0),
                                       opts)
        fst = state0(jnp.asarray([0.5, 0.5]))
        jstep = jax.jit(step)
        for _ in range(60):
            fst = jstep(fst)
        assert bool(fst.ip.converged), hess
        sols[hess] = np.asarray(fst.ip.z)
    np.testing.assert_allclose(sols["hybrid"], sols["lbfgs"], atol=1e-5)


def test_fused_hybrid_nonconvex_inertia():
    """Exact endgame on a nonconvex problem: the chol-NaN inertia retry must
    keep accepting steps (concave objective, active bound solution)."""
    funcs = dict(
        obj=lambda z: -z[0] ** 2,
        eq=lambda z: jnp.zeros(0),
        ineq=lambda z: jnp.asarray([1.0 - z[0], 1.0 + z[0]]),
    )
    opts = IPOptions(hessian="hybrid", hybrid_mu_switch=1e-3,
                     hybrid_err_switch=10.0)
    step, state0 = make_fused_step(funcs, np.asarray([-5.0]),
                                   np.asarray([5.0]), opts)
    fst = state0(jnp.asarray([0.3]))
    jstep = jax.jit(step)
    for _ in range(80):
        fst = jstep(fst)
    assert bool(fst.ip.converged)
    np.testing.assert_allclose(abs(float(fst.ip.z[0])), 1.0, atol=1e-5)
