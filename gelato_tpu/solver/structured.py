"""Structured condensed KKT: Woodbury H⁻¹ + bordered block-tridiagonal Schur.

This is the "Stage A+B wired together" solver (VERDICT r2 item 2) that
replaces the two dense fp64 Cholesky factorizations of
:mod:`gelato_tpu.solver.linalg` on the L-BFGS path.  The key structural
facts, which the reference hand-encodes in its ``wrt`` sparsity map
(/root/reference/Trajectory_Optimization.py:358-381):

* the condensed primal Hessian is **diagonal + low-rank**:
      H = D + Ṽ diag(c̃) Ṽᵀ,
      D  = σ·I + Σ_z + δ_w   (all positive),
      Ṽ  = [V_lbfgs | J_Iᵀ],  c̃ = [±1 … | σ_s]
  so H⁻¹ is a Woodbury application (O(n·k), k = 2·mem + m_I ≈ 10², no n²
  memory) with a k×k QR-factored core;
* the Schur complement  S = J_E H⁻¹ J_Eᵀ + δ_c I  splits as
      S = T − U M⁻¹ Uᵀ,   T = J_E D⁻¹ J_Eᵀ + δ_c I,   U = J_E D⁻¹ Ṽ,
  and **T is block-tridiagonal over sections plus a small border**:
  an equality row only touches variables of one section or two adjacent
  ones (collocation defects, knots, waypoints), except a handful of global
  rows (time-reference chains, stage-mass links) that form the border.
  T is factored by a ``lax.scan`` block Cholesky (S tiny b×b factors
  instead of one m_E² dense chol) with a dense border Schur complement,
  and the rank-k correction is folded back via a second
  Sherman-Morrison-Woodbury with a k×k QR-factored core.

Row grouping is **discovered, not hand-maintained**: the AD Jacobian is
probed at a couple of points (like solver/coloring.py), each row's variable
support is mapped to sections, and rows spanning more than two adjacent
sections fall into the border.  All grouping is static host-side NumPy;
the compiled program sees only fixed gathers.

Failure signaling matches the dense path: a singular/indefinite T makes the
scan Cholesky produce NaNs which propagate into the direction and trip the
solver's isfinite retry (chol-as-inertia-oracle).
"""

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


class StructMeta(NamedTuple):
    """Static row-grouping metadata (host-built, shapes fixed per problem).

    ``group_rows[s, i]`` is the equality-row index of slot ``i`` of section
    group ``s`` (0 for padding, masked by ``group_mask``); ``border_rows``
    holds the global rows.  ``n_border`` counts *real* border rows
    (``border_rows`` is padded to at least 1 with ``border_mask`` zeros).
    """

    group_rows: np.ndarray   # [S, b] int32
    group_mask: np.ndarray   # [S, b] float64 (1 real / 0 pad)
    border_rows: np.ndarray  # [mb] int32 (padded to >= 1)
    border_mask: np.ndarray  # [mb] float64
    n_border: int
    n_groups: int
    block: int
    m_eq: int


def build_struct_meta(pattern, var_sec):
    """Group equality rows by section from a boolean Jacobian ``pattern``
    [m_E, n] and a per-variable section map ``var_sec`` [n].

    A row whose variable support spans sections {a..b} with b − a ≤ 1 joins
    group a; anything wider (stage-mass links, long time-reference chains,
    arbitrary user constraints) goes to the border.  Always correct — the
    grouping only has to *cover* the true sparsity; unknown rows degrade to
    border (dense) handling, never to wrong structure.
    """
    pattern = np.asarray(pattern, dtype=bool)
    var_sec = np.asarray(var_sec)
    m_eq, n = pattern.shape
    S = int(var_sec.max()) + 1

    groups = [[] for _ in range(S)]
    border = []
    for r in range(m_eq):
        secs = var_sec[pattern[r]]
        if secs.size == 0:
            border.append(r)
            continue
        lo, hi = int(secs.min()), int(secs.max())
        if hi - lo <= 1:
            groups[lo].append(r)
        else:
            border.append(r)

    b = max(1, max(len(g) for g in groups))
    group_rows = np.zeros((S, b), dtype=np.int32)
    group_mask = np.zeros((S, b))
    for s, g in enumerate(groups):
        group_rows[s, : len(g)] = g
        group_mask[s, : len(g)] = 1.0
    mb = max(1, len(border))
    border_rows = np.zeros(mb, dtype=np.int32)
    border_mask = np.zeros(mb)
    border_rows[: len(border)] = border
    border_mask[: len(border)] = 1.0
    return StructMeta(
        group_rows=group_rows, group_mask=group_mask,
        border_rows=border_rows, border_mask=border_mask,
        n_border=len(border), n_groups=S, block=b, m_eq=m_eq,
    )


# ---------------------------------------------------------------------------
# block-tridiagonal + border linear algebra (all scans; multi-RHS capable)


def btd_cholesky(Adiag, Alow):
    """Blocked Cholesky of an SPD block-tridiagonal matrix (lax.scan).

    ``Adiag`` [S, b, b] diagonal blocks, ``Alow`` [S-1, b, b] sub-diagonal
    blocks (row s+1, col s).  Returns (Ldiag [S, b, b], Llow [S-1, b, b]).
    """
    S = Adiag.shape[0]
    Alow_pad = (jnp.concatenate([Alow, jnp.zeros_like(Alow[:1])], axis=0)
                if S > 1 else jnp.zeros((1,) + Adiag.shape[1:]))

    def step(downdate, inputs):
        Ad, Al = inputs
        Ld = jnp.linalg.cholesky(Ad - downdate)
        Ll = jsl.solve_triangular(Ld, Al.T, lower=True).T
        return Ll @ Ll.T, (Ld, Ll)

    _, (Ldiag, Llow_shift) = jax.lax.scan(
        step, jnp.zeros_like(Adiag[0]), (Adiag, Alow_pad))
    return Ldiag, Llow_shift[:-1] if S > 1 else Llow_shift[:0]


def btd_forward(Ldiag, Llow, rhs):
    """y = L⁻¹ rhs for the block-bidiagonal factor; rhs [S, b] or [S, b, r]."""
    S = Ldiag.shape[0]
    Llow_pad = (jnp.concatenate([jnp.zeros_like(Llow[:1]), Llow], axis=0)
                if S > 1 else jnp.zeros((1,) + Ldiag.shape[1:]))

    def fwd(y_prev, inputs):
        Ld, Ll, r = inputs
        y = jsl.solve_triangular(Ld, r - Ll @ y_prev, lower=True)
        return y, y

    _, ys = jax.lax.scan(fwd, jnp.zeros_like(rhs[0]), (Ldiag, Llow_pad, rhs))
    return ys


def btd_backward(Ldiag, Llow, ys):
    """x = L⁻ᵀ ys (block back-substitution); ys [S, b] or [S, b, r]."""
    S = Ldiag.shape[0]
    Llow_bwd = (jnp.concatenate([Llow, jnp.zeros_like(Llow[:1])], axis=0)
                if S > 1 else jnp.zeros((1,) + Ldiag.shape[1:]))

    def bwd(x_next, inputs):
        Ld, Ll_next, y = inputs
        x = jsl.solve_triangular(Ld.T, y - Ll_next.T @ x_next, lower=False)
        return x, x

    _, xs_rev = jax.lax.scan(bwd, jnp.zeros_like(ys[0]),
                             (Ldiag[::-1], Llow_bwd[::-1], ys[::-1]))
    return xs_rev[::-1]


def bordered_factorize(Td, Tl, Bstrip, Cbb):
    """Factor T = [[A, Bᵀ], [B, C]] with A block-tridiagonal SPD.

    ``Td``/``Tl``: A's blocks; ``Bstrip`` [S, mb, b]: border coupling rows
    per section; ``Cbb`` [mb, mb]: border diagonal.  Returns an arrays-only
    dict: A = L Lᵀ (scan), G = L⁻¹ Bᵀ, border Schur C − GᵀG = L_bb L_bbᵀ.
    """
    Ldiag, Llow = btd_cholesky(Td, Tl)
    G = btd_forward(Ldiag, Llow, jnp.swapaxes(Bstrip, 1, 2))  # [S, b, mb]
    Sbb = Cbb - jnp.einsum("sbm,sbk->mk", G, G)
    Lbb = jnp.linalg.cholesky(Sbb)
    return dict(Ldiag=Ldiag, Llow=Llow, G=G, Lbb=Lbb)


def bordered_solve(tf, rhs_g, rhs_b):
    """Solve T [x; x_b] = [rhs_g; rhs_b] using :func:`bordered_factorize`
    output.  ``rhs_g`` [S, b(, r)], ``rhs_b`` [mb(, r)]."""
    Ldiag, Llow, G, Lbb = tf["Ldiag"], tf["Llow"], tf["G"], tf["Lbb"]
    y = btd_forward(Ldiag, Llow, rhs_g)
    red = rhs_b - jnp.einsum("sbm,sb...->m...", G, y)
    yb = jsl.solve_triangular(Lbb, red, lower=True)
    xb = jsl.solve_triangular(Lbb.T, yb, lower=False)
    x = btd_backward(Ldiag, Llow, y - jnp.einsum("sbm,m...->sb...", G, xb))
    return x, xb


# ---------------------------------------------------------------------------
# the structured condensed-KKT factorization


def factorize(Dd, V, c, JE, delta_c, meta: StructMeta):
    """Factor the condensed KKT system with H = diag(Dd) + V diag(c) Vᵀ.

    Never materializes H (n²) or S (m_E²): the Woodbury core and the SMW
    correction core are k×k (QR-factored — fp64 LU does not exist on TPU,
    QR does), T is factored as bordered block-tridiagonal.  Returns an
    arrays-only dict (jit/vmap-safe).
    """
    gr = jnp.asarray(meta.group_rows)
    gm = jnp.asarray(meta.group_mask)
    br = jnp.asarray(meta.border_rows)
    bm = jnp.asarray(meta.border_mask)

    Dinv = 1.0 / Dd
    W = Dinv[:, None] * V                      # D⁻¹ Ṽ        [n, k]
    Mcore = jnp.diag(1.0 / c) + V.T @ W        # Woodbury core [k, k]
    qM, rM = jnp.linalg.qr(Mcore)

    # U = J_E D⁻¹ Ṽ  (the dense rank-k coupling; m_E × k)
    U = JE @ W

    # T's blocks from the grouped rows (padded rows are zeroed and get a
    # unit diagonal so the factorization stays SPD and they decouple)
    JEg = JE[gr] * gm[:, :, None]              # [S, b, n]
    JEb = JE[br] * bm[:, None]                 # [mb, n]
    Ag = JEg * Dinv[None, None, :]
    Td = jnp.einsum("sbn,scn->sbc", Ag, JEg)
    Tl = jnp.einsum("sbn,scn->sbc", Ag[1:], JEg[:-1])
    diag_fill = delta_c * gm + (1.0 - gm)      # δ_c on real rows, 1 on pads
    Td = Td + jax.vmap(jnp.diag)(diag_fill)
    Bstrip = jnp.einsum("mn,sbn->smb", JEb * Dinv[None, :], JEg)
    Cbb = ((JEb * Dinv[None, :]) @ JEb.T
           + jnp.diag(delta_c * bm + (1.0 - bm)))

    tf = bordered_factorize(Td, Tl, Bstrip, Cbb)

    # SMW correction core: C_s = M − Uᵀ T⁻¹ U  (k×k, indefinite → QR)
    Ug = U[gr] * gm[:, :, None]                # [S, b, k]
    Ub = U[br] * bm[:, None]                   # [mb, k]
    TiU_g, TiU_b = bordered_solve(tf, Ug, Ub)
    Cs = (Mcore - jnp.einsum("sbk,sbl->kl", Ug, TiU_g)
          - Ub.T @ TiU_b)
    qC, rC = jnp.linalg.qr(Cs)

    return dict(Dinv=Dinv, V=V, c=c, W=W, qM=qM, rM=rM, U=U,
                TiU_g=TiU_g, TiU_b=TiU_b, qC=qC, rC=rC, JE=JE, Dd=Dd,
                dc=jnp.asarray(delta_c), **tf)


def hmatvec(fact, x):
    """H x = D·x + Ṽ (c̃ ⊙ (Ṽᵀ x))  — no dense H."""
    V, c = fact["V"], fact["c"]
    if x.ndim == 1:
        return fact["Dd"] * x + V @ (c * (V.T @ x))
    return fact["Dd"][:, None] * x + V @ (c[:, None] * (V.T @ x))


def apply_hinv(fact, x):
    """H⁻¹ x via Woodbury (QR-factored core)."""
    Dinv, V, W, qM, rM = (fact["Dinv"], fact["V"], fact["W"], fact["qM"],
                          fact["rM"])
    t = V.T @ (Dinv * x) if x.ndim == 1 else V.T @ (Dinv[:, None] * x)
    u = jsl.solve_triangular(rM, qM.T @ t, lower=False)
    return (Dinv * x - W @ u) if x.ndim == 1 else (Dinv[:, None] * x - W @ u)


def _schur_solve(fact, meta: StructMeta, rhs):
    """S⁻¹ rhs with S = T − U M⁻¹ Uᵀ via SMW over the bordered-T factors."""
    gr = jnp.asarray(meta.group_rows)
    gm = jnp.asarray(meta.group_mask)
    br = jnp.asarray(meta.border_rows)
    bm = jnp.asarray(meta.border_mask)

    rg = rhs[gr] * gm
    rb = rhs[br] * bm
    t_g, t_b = bordered_solve(fact, rg, rb)
    # correction: + T⁻¹ U (M − Uᵀ T⁻¹ U)⁻¹ Uᵀ T⁻¹ rhs
    Ug = fact["U"][gr] * gm[:, :, None]
    Ub = fact["U"][br] * bm[:, None]
    w = jnp.einsum("sbk,sb->k", Ug, t_g) + Ub.T @ t_b
    u = jsl.solve_triangular(fact["rC"], fact["qC"].T @ w, lower=False)
    x_g = t_g + jnp.einsum("sbk,k->sb", fact["TiU_g"], u)
    x_b = t_b + fact["TiU_b"] @ u

    # scatter back to flat row order (pads write to row 0 then are fixed by
    # the real updates; mask-weighted adds keep pads from corrupting row 0)
    out = jnp.zeros(meta.m_eq, rhs.dtype)
    out = out.at[gr.ravel()].add((x_g * gm).ravel())
    out = out.at[br].add(x_b * bm)
    return out


def solve(fact, meta: StructMeta, r1, r2, n_refine=1):
    """Solve the condensed KKT system
        [ H   J_Eᵀ ] [dz ]   [ r1 ]
        [ J_E  -δ_c] [dyE] = [ r2 ]
    entirely through the structured factors.  Same refinement policy as
    linalg.kkt_solve: fp64 sweeps over the full KKT residual, best iterate
    wins (guards the condensed form's squared conditioning).
    """
    JE, dc = fact["JE"], fact["dc"]

    def one_solve(b1, b2):
        h_b1 = apply_hinv(fact, b1)
        rhs_y = JE @ h_b1 - b2
        dy = _schur_solve(fact, meta, rhs_y)
        dz = apply_hinv(fact, b1 - JE.T @ dy)
        return dz, dy

    dz, dy = one_solve(r1, r2)
    if n_refine <= 0:
        return dz, dy

    def resid(dz, dy):
        return (r1 - hmatvec(fact, dz) - JE.T @ dy,
                r2 - JE @ dz + dc * dy)

    best = (dz, dy)
    best_rn = jnp.inf
    for _ in range(n_refine):
        rho1, rho2 = resid(dz, dy)
        rn = jnp.sqrt(rho1 @ rho1 + rho2 @ rho2)
        better = rn < best_rn
        best = (jnp.where(better, dz, best[0]), jnp.where(better, dy, best[1]))
        best_rn = jnp.where(better, rn, best_rn)
        ddz, ddy = one_solve(rho1, rho2)
        dz = dz + ddz
        dy = dy + ddy
    rho1, rho2 = resid(dz, dy)
    rn = jnp.sqrt(rho1 @ rho1 + rho2 @ rho2)
    better = rn < best_rn
    return (jnp.where(better, dz, best[0]), jnp.where(better, dy, best[1]))
