"""KKT linear algebra: condensed normal-equations Cholesky, TPU-first.

The interior-point KKT system per iteration is

    [ H   JEᵀ ] [dz ]   [ r1 ]
    [ JE  -δc ] [dyE] = [ r2 ]

with H positive definite on the solver's default (damped L-BFGS) path.  TPU
XLA provides **no fp64 LU** (only f32/c64), but Cholesky, triangular solve,
and matmul all run natively in emulated fp64 — and they are exactly the
pieces of the condensed solve:

    L  = chol(H)                      n×n
    B  = L⁻¹ JEᵀ                      one blocked triangular solve, n×mE
    S  = BᵀB + δc·I                   one MXU matmul, mE×mE
    Ls = chol(S)
    dyE = S⁻¹ (Bᵀ L⁻¹ r1 − r2),  dz = L⁻ᵀ (L⁻¹ r1 − B·dyE)

This replaces round 1's equilibrated-f32 LU + iterative refinement, whose
rounding noise cost ~9× the iteration count of the fp64 CPU path (PERF.md).
The condensed form squares the conditioning of JE, so an optional fp64
refinement sweep over the *full* KKT residual (cheap matmuls, reusing the
factors) guards the barrier-ill-conditioned tail.

A dense fp64 LU of the full KKT is kept as the ``lu`` method (CPU debugging,
and the exact-Hessian path where H may be indefinite).  Method selection is
static (baked at trace time).

Failure signaling: a non-PD H makes ``chol`` return NaNs, which the solver's
inertia-correction loop detects via isfinite and retries with a larger
primal regularization — chol-as-inertia-oracle, the same role the inertia
flag of MA57 plays inside IPOPT.
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def runs_on_cpu():
    """Best-effort check whether default computations land on a CPU device."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", None) == "cpu"
    return jax.default_backend() == "cpu"


def kkt_factorize(H, JE, delta_c, method="chol"):
    """Factor the KKT system.  Returns an arrays-only dict (jit-safe).

    ``method``: "chol" (condensed fp64 Cholesky — the TPU path and default)
    or "lu" (dense fp64 LU of the full system).
    """
    n = H.shape[0]
    mE = JE.shape[0]
    if method == "chol":
        L = jnp.linalg.cholesky(H)
        B = jsl.solve_triangular(L, JE.T, lower=True)  # n×mE
        S = B.T @ B + delta_c * jnp.eye(mE)
        Ls = jnp.linalg.cholesky(S)
        return dict(L=L, B=B, Ls=Ls, H=H, JE=JE, dc=jnp.asarray(delta_c))
    if method == "lu":
        K = jnp.zeros((n + mE, n + mE))
        K = K.at[:n, :n].set(H)
        K = K.at[:n, n:].set(JE.T)
        K = K.at[n:, :n].set(JE)
        K = K.at[n:, n:].set(-delta_c * jnp.eye(mE))
        lu, piv = jsl.lu_factor(K)
        return dict(lu=lu, piv=piv)
    raise ValueError(f"unknown KKT method {method!r}")


def _chol_apply(fact, r1, r2):
    """One condensed solve with existing factors → (dz, dyE)."""
    L, B, Ls = fact["L"], fact["B"], fact["Ls"]
    w = jsl.solve_triangular(L, r1, lower=True)
    rhs_y = B.T @ w - r2
    u = jsl.solve_triangular(Ls, rhs_y, lower=True)
    dyE = jsl.solve_triangular(Ls.T, u, lower=False)
    dz = jsl.solve_triangular(L.T, w - B @ dyE, lower=False)
    return dz, dyE


def kkt_solve(method, fact, r1, r2, n_refine=1):
    """Solve the factored KKT system for (dz, dyE).

    For "chol", ``n_refine`` fp64 refinement sweeps over the full KKT
    residual correct the condensed form's squared conditioning; the sweep
    with the smallest residual wins (self-guarding, like round 1's refined
    f32 path — refinement can amplify when conditioning is marginal).
    """
    if method == "lu":
        n = r1.shape[0]
        sol = jsl.lu_solve((fact["lu"], fact["piv"]),
                           jnp.concatenate([r1, r2]))
        return sol[:n], sol[n:]

    H, JE, dc = fact["H"], fact["JE"], fact["dc"]
    dz, dy = _chol_apply(fact, r1, r2)
    if n_refine <= 0:
        return dz, dy

    def resid(dz, dy):
        return (r1 - H @ dz - JE.T @ dy,
                r2 - JE @ dz + dc * dy)

    best = (dz, dy)
    best_rn = jnp.inf
    for _ in range(n_refine):
        rho1, rho2 = resid(dz, dy)
        rn = jnp.sqrt(rho1 @ rho1 + rho2 @ rho2)
        better = rn < best_rn
        best = (jnp.where(better, dz, best[0]), jnp.where(better, dy, best[1]))
        best_rn = jnp.where(better, rn, best_rn)
        ddz, ddy = _chol_apply(fact, rho1, rho2)
        dz = dz + ddz
        dy = dy + ddy
    rho1, rho2 = resid(dz, dy)
    rn = jnp.sqrt(rho1 @ rho1 + rho2 @ rho2)
    better = rn < best_rn
    return (jnp.where(better, dz, best[0]), jnp.where(better, dy, best[1]))


def spd_solve(A, b):
    """Solve a small SPD system by fp64 Cholesky (used for the least-squares
    multiplier initialization)."""
    c, low = jsl.cho_factor(A)
    return jsl.cho_solve((c, low), b)
