"""Independent local-optimality verification of the converged example solve.

A cold-start independent solve (scipy trust-constr) is computationally
infeasible on this 1-vCPU host (>3 h without completing), so the
ground-truth check (SURVEY.md §7 step 5, VERDICT #4) is done at the
solution instead, with two independent tests that share no code with
gelato_tpu.solver:

1. **KKT certificate**: with J's values from AD, solve the bound-constrained
   least-squares  min ||g - JE^T y - JI^T lam - zL + zU||  for (y, lam>=0,
   zL>=0 active-lower, zU>=0 active-upper) using scipy.optimize.lsq_linear.
   A tiny residual proves z* is first-order stationary under an independent
   multiplier estimate.
2. **Polish**: scipy trust-constr started AT z* must terminate without
   improving the payload (beyond tolerance noise).

Usage: python scripts/verify_optimum.py [state.npz]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.config import load_mission  # noqa: E402
from gelato_tpu.problem import Problem  # noqa: E402
from gelato_tpu.solver.warm_start import load_state  # noqa: E402


def main():
    state_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "tests", "data",
        "example_full_solved.npz")
    problem = Problem(load_mission(
        "/root/reference/example/example-settings.json"))
    warm = load_state(state_path)
    z = jnp.asarray(warm["z"])
    lb, ub = problem.bounds()
    m_unit = problem.units.mass
    payload = float(z[0]) * m_unit - problem.mission.m_init - 140.0

    ce = np.asarray(problem.eq_constraints(z))
    ci = np.asarray(problem.ineq_constraints(z))
    print(f"z*: payload={payload:.3f} kg  max|cE|={np.abs(ce).max():.2e}  "
          f"min cI={ci.min():.2e}")

    # --- 1. independent KKT certificate ---
    g = np.asarray(jax.grad(problem.objective)(z))
    JE = np.asarray(jax.jacfwd(problem.eq_constraints)(z))
    JI = np.asarray(jax.jacfwd(problem.ineq_constraints)(z))
    zv = np.asarray(z)
    tol_act = 1e-6
    act_I = np.where(ci < tol_act)[0]           # active inequalities
    act_L = np.where(zv - lb < tol_act * np.maximum(1, np.abs(lb)))[0]
    act_U = np.where(ub - zv < tol_act * np.maximum(1, np.abs(ub)))[0]
    # stationarity: g = JE^T y + JI_act^T lam + I_L zL - I_U zU, lam,zL,zU >= 0
    cols = [JE.T]
    lo = [-np.inf * np.ones(JE.shape[0])]
    if act_I.size:
        cols.append(JI[act_I].T)
        lo.append(np.zeros(act_I.size))
    for idx, sgn in ((act_L, 1.0), (act_U, -1.0)):
        if idx.size:
            M = np.zeros((zv.size, idx.size))
            M[idx, np.arange(idx.size)] = sgn
            cols.append(M)
            lo.append(np.zeros(idx.size))
    A = np.hstack(cols)
    from scipy.optimize import lsq_linear

    res = lsq_linear(A, g, bounds=(np.concatenate(lo), np.inf),
                     tol=1e-12, max_iter=500)
    stat = np.linalg.norm(A @ res.x - g, np.inf) / max(1.0,
                                                       np.abs(g).max())
    print(f"KKT certificate: independent stationarity residual (inf-norm, "
          f"relative) = {stat:.3e}  (active: {act_I.size} ineq, "
          f"{act_L.size} lower, {act_U.size} upper)")

    # --- 2. polish with an independent solver from z* ---
    from scipy.optimize import minimize, NonlinearConstraint, Bounds

    eqj = jax.jit(problem.eq_constraints)
    inj = jax.jit(problem.ineq_constraints)
    gobj = jax.jit(jax.grad(problem.objective))
    Je = jax.jit(jax.jacfwd(problem.eq_constraints))
    Ji = jax.jit(jax.jacfwd(problem.ineq_constraints))
    cons = [
        NonlinearConstraint(lambda x: np.asarray(eqj(jnp.asarray(x))), 0, 0,
                            jac=lambda x: np.asarray(Je(jnp.asarray(x)))),
        NonlinearConstraint(lambda x: np.asarray(inj(jnp.asarray(x))), 0,
                            np.inf,
                            jac=lambda x: np.asarray(Ji(jnp.asarray(x)))),
    ]
    r = minimize(lambda x: float(problem.objective(jnp.asarray(x))),
                 np.asarray(z),
                 jac=lambda x: np.asarray(gobj(jnp.asarray(x))),
                 bounds=Bounds(lb, ub), constraints=cons,
                 method="trust-constr",
                 options=dict(maxiter=120, gtol=1e-10, xtol=1e-14, verbose=0))
    payload2 = float(r.x[0]) * m_unit - problem.mission.m_init - 140.0
    ce2 = np.abs(np.asarray(problem.eq_constraints(jnp.asarray(r.x)))).max()
    print(f"trust-constr polish: status={r.status} nit={r.nit} "
          f"payload={payload2:.3f} kg (delta {payload2 - payload:+.4f})  "
          f"max|cE|={ce2:.2e}")
    print(f"VERDICT: payload {payload:.1f} kg is "
          f"{'CONFIRMED' if abs(payload2 - payload) < 0.01 * abs(payload) and stat < 1e-4 else 'NOT CONFIRMED'}"
          f" as a first-order optimum by independent tests")


if __name__ == "__main__":
    main()
