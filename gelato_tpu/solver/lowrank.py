"""Low-rank + diagonal KKT machinery ("Stage A" of the structured solver).

On the default L-BFGS path the condensed Hessian block is

    H = D + V diag(c) Vᵀ,   D = σI + Σ_z + δ_w,   rank(V) ≤ 2·mem + m_I

(the damped-BFGS pairs contribute ±rank-1 terms; the condensed inequality
block JIᵀΣ_s JI contributes m_I more columns).  This module provides the
factored form and a Woodbury solver so H never has to be materialized or
Cholesky-factored densely — the basis for removing the two dense fp64
chols from the TPU iteration (TODO-NEXT item 1) and the per-lane n²
matrices that block chip-scale dispersion batches.

The Woodbury core M = diag(1/c) + Vᵀ D⁻¹ V is symmetric indefinite and only
k×k (k ≈ 72); it is factored by QR, which XLA supports in fp64 on TPU
(unlike LU).  Invalid/unused BFGS slots are encoded as zero columns with
c = 1 so they drop out exactly.
"""

import jax
import jax.numpy as jnp


def lbfgs_factors(S, Y, count, sigma_floor=1e-4, sigma_cap=1e6):
    """Factored damped L-BFGS Hessian: (sigma, V [n, 2·mem], c [2·mem]).

    Produces exactly the same operator as ``ip._lbfgs_matrix_device`` —
    B = σI + Σ_j (v_j v_jᵀ − u_j u_jᵀ) with u_j = B_j s_j/√(sᵀB_j s),
    v_j = ỹ_j/√(sᵀỹ_j) and Powell-damped ỹ — but as factors instead of a
    dense matrix.  B_j·s is applied through the factors accumulated so far
    (O(mem²·n) total, no n² memory).
    """
    mem, n = S.shape
    last = (count - 1) % mem
    s_l, y_l = S[last], Y[last]
    sy_l = s_l @ y_l
    yy_l = y_l @ y_l
    sigma = jnp.where(
        (count > 0) & (sy_l > 1e-12 * jnp.sqrt(jnp.maximum(yy_l, 1e-30))
                       * jnp.linalg.norm(s_l)),
        jnp.clip(yy_l / jnp.where(sy_l != 0.0, sy_l, 1.0),
                 sigma_floor, sigma_cap),
        1.0)

    V0 = jnp.zeros((n, 2 * mem))
    c0 = jnp.ones(2 * mem)

    def apply_B(V, c, x):
        return sigma * x + V @ (c * (V.T @ x))

    def body(j, carry):
        V, c = carry
        k = count - mem + j
        idx = k % mem
        valid = k >= 0
        s = S[idx]
        y = Y[idx]
        Bs = apply_B(V, c, s)
        sBs = s @ Bs
        sy = s @ y
        theta = jnp.where(sy < 0.2 * sBs,
                          0.8 * sBs / jnp.maximum(sBs - sy, 1e-30), 1.0)
        y_d = theta * y + (1.0 - theta) * Bs
        sy_d = s @ y_d
        ok = valid & (sBs > 1e-16) & (sy_d > 1e-16)
        u = Bs / jnp.sqrt(jnp.maximum(sBs, 1e-30))
        v = y_d / jnp.sqrt(jnp.maximum(sy_d, 1e-30))
        V = V.at[:, 2 * j].set(jnp.where(ok, u, 0.0))
        V = V.at[:, 2 * j + 1].set(jnp.where(ok, v, 0.0))
        c = c.at[2 * j].set(jnp.where(ok, -1.0, 1.0))
        c = c.at[2 * j + 1].set(1.0)
        return (V, c)

    V, c = jax.lax.fori_loop(0, mem, body, (V0, c0))
    return sigma, V, c


def lowrank_factorize(Dd, V, c, delta_c_unused=None):
    """Prepare the Woodbury application of H⁻¹ for H = diag(Dd) + V diag(c) Vᵀ.

    Returns an arrays-only dict.  The k×k indefinite core is QR-factored
    (fp64-supported on TPU; LU is not).
    """
    Dinv = 1.0 / Dd
    W = Dinv[:, None] * V                       # D⁻¹ V   [n, k]
    M = jnp.diag(1.0 / c) + V.T @ W             # core    [k, k]
    q, r = jnp.linalg.qr(M)
    return dict(Dinv=Dinv, V=V, W=W, q=q, r=r)


def apply_hinv(fact, x):
    """H⁻¹ x via Woodbury: D⁻¹x − D⁻¹V M⁻¹ Vᵀ D⁻¹ x  (O(n·k))."""
    Dinv, V, W, q, r = (fact["Dinv"], fact["V"], fact["W"], fact["q"],
                        fact["r"])
    t = V.T @ (Dinv * x) if x.ndim == 1 else V.T @ (Dinv[:, None] * x)
    u = jax.scipy.linalg.solve_triangular(r, q.T @ t, lower=False)
    if x.ndim == 1:
        return Dinv * x - W @ u
    return Dinv[:, None] * x - W @ u


def schur_dense(fact, JE, delta_c):
    """Dense Schur complement S = JE H⁻¹ JEᵀ + δ_c I via the factors.

    One MXU matmul pair instead of chol(H)+triangular-solve; the follow-up
    ("Stage B") replaces the dense S by its block-tridiagonal structure.
    """
    HJt = apply_hinv(fact, JE.T)                # [n, mE]
    return JE @ HJt + delta_c * jnp.eye(JE.shape[0])


def kkt_solve_lowrank(fact, Ls, JE, delta_c_unused, r1, r2):
    """Solve the condensed KKT system with H in factored form and a
    Cholesky factor ``Ls`` of the Schur complement."""
    jsl = jax.scipy.linalg
    h_r1 = apply_hinv(fact, r1)
    rhs_y = JE @ h_r1 - r2
    u = jsl.solve_triangular(Ls, rhs_y, lower=True)
    dy = jsl.solve_triangular(Ls.T, u, lower=False)
    dz = apply_hinv(fact, r1 - JE.T @ dy)
    return dz, dy


# ---------------------------------------------------------------------------
# Stage B core: block-tridiagonal Cholesky (the Schur complement's structure
# when equality rows are grouped by section — dynamics/knot rows couple only
# adjacent sections)

def blocktridiag_cholesky(Adiag, Alow):
    """Blocked Cholesky of an SPD block-tridiagonal matrix.

    ``Adiag`` [S, b, b]: diagonal blocks; ``Alow`` [S-1, b, b]: sub-diagonal
    blocks (block row i+1, column i).  Returns (Ldiag, Llow) with
    A = L Lᵀ, L lower block-bidiagonal.  One ``lax.scan`` over sections —
    S tiny factorizations/updates instead of one (S·b)² dense chol; each
    step is a b×b chol + triangular solve + SPD downdate (MXU matmuls).
    """
    jsl = jax.scipy.linalg
    S = Adiag.shape[0]

    def step(carry, inputs):
        # carry: the SPD downdate from the previous section
        downdate = carry
        Ad, Al = inputs
        Ld = jnp.linalg.cholesky(Ad - downdate)
        # L_{i+1,i} = A_{i+1,i} L_i^{-T}
        Ll = jsl.solve_triangular(Ld, Al.T, lower=True).T
        return Ll @ Ll.T, (Ld, Ll)

    # pad Alow with a trailing zero block so the scan has S inputs
    Alow_pad = jnp.concatenate(
        [Alow, jnp.zeros_like(Alow[:1])], axis=0) if S > 1 else jnp.zeros(
            (1,) + Adiag.shape[1:])
    _, (Ldiag, Llow_shift) = jax.lax.scan(
        step, jnp.zeros_like(Adiag[0]), (Adiag, Alow_pad))
    return Ldiag, Llow_shift[:-1] if S > 1 else Llow_shift[:0]


def blocktridiag_solve(Ldiag, Llow, b_blocks):
    """Solve L Lᵀ x = b for a block-bidiagonal Cholesky factor.

    ``b_blocks`` [S, b]; forward then backward substitution, each a scan.
    """
    jsl = jax.scipy.linalg
    S = Ldiag.shape[0]
    Llow_pad = (jnp.concatenate([jnp.zeros_like(Llow[:1]), Llow], axis=0)
                if S > 1 else jnp.zeros((1,) + Ldiag.shape[1:]))

    def fwd(carry, inputs):
        y_prev = carry
        Ld, Ll, rhs = inputs
        y = jsl.solve_triangular(Ld, rhs - Ll @ y_prev, lower=True)
        return y, y

    _, ys = jax.lax.scan(fwd, jnp.zeros_like(b_blocks[0]),
                         (Ldiag, Llow_pad, b_blocks))

    Llow_bwd = (jnp.concatenate([Llow, jnp.zeros_like(Llow[:1])], axis=0)
                if S > 1 else jnp.zeros((1,) + Ldiag.shape[1:]))

    def bwd(carry, inputs):
        x_next = carry
        Ld, Ll_next, y = inputs
        x = jsl.solve_triangular(Ld.T, y - Ll_next.T @ x_next, lower=False)
        return x, x

    _, xs_rev = jax.lax.scan(bwd, jnp.zeros_like(b_blocks[0]),
                             (Ldiag[::-1], Llow_bwd[::-1], ys[::-1]))
    return xs_rev[::-1]
