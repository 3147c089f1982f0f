"""Structured condensed KKT: Woodbury H₀⁻¹ + bordered block-tridiagonal Schur.

This is the "Stage A+B wired together" solver (VERDICT r2 item 2) that
replaces the two dense fp64 Cholesky factorizations of
:mod:`gelato_tpu.solver.linalg` on the L-BFGS path.

Formulation (chosen for *stability parity* with the dense path, learned the
hard way — see the stability note below):

    [ H₀   J_Eᵀ   J_Iᵀ  ] [dz ]   [ r1 ]      H₀ = D + V diag(c) Vᵀ
    [ J_E  −δ_c I   0   ] [dy ] = [ r2 ]      D  = σ·I + Σ_z + δ_w > 0
    [ J_I    0    −Σ_s⁻¹ ] [ w ]   [ r3 ]      c  = ±1 (damped-BFGS pairs)

where Σ_s = diag(λ/s) and w = −dλ.  Eliminating w reproduces the dense
path's condensed system exactly (r1 = −r_d, r2 = −c_E, r3 = μ/λ − c_I), but
the factorization never forms H₀ + J_IᵀΣ_sJ_I: the Schur complement over
(dy, w) is

    Ŝ = Ĵ H₀⁻¹ Ĵᵀ + Ĝ,   Ĵ = [J_E; J_I],   Ĝ = diag([δ_c·1, s/λ])

* H₀⁻¹ is a Woodbury application over the 2·mem BFGS columns only —
  moderate scale by Powell damping, k×k QR core (fp64 LU does not exist on
  TPU; QR does);
* Ŝ = T̂ − U M⁻¹ Uᵀ with T̂ = Ĵ D⁻¹ Ĵᵀ + Ĝ **block-tridiagonal over
  sections plus a small border** (constraint rows touch one section or two
  adjacent ones; global rows — time-reference chains, stage-mass links —
  fall into the border), factored by a ``lax.scan`` block Cholesky with a
  dense border Schur complement, and the rank-k BFGS correction folded back
  via a second SMW with a k×k QR core.

**Stability note (why the inequality block is NOT condensed into H):** the
first implementation used H = D + [V|J_Iᵀ] diag([c, σ_s]) [..]ᵀ and applied
Woodbury over σ_s = λ/s columns.  Near-active inequalities drive σ_s to
1e16; computing (D + huge·PSD)⁻¹ as a *correction to D⁻¹* then cancels
catastrophically — measured KKT residuals of 1e18 exactly where the dense
path's chol signals NaN, and worse, *finite garbage* in the recovery regime
(δ_w ~ 1e12) so the solver wedged permanently.  In the augmented form the
extreme scales live on Ĝ's diagonal (s/λ → 0 additive, harmless) and every
term of T̂ is an SPD *addition*, matching dense-Cholesky's stability.

Row grouping is **discovered, not hand-maintained**: the AD Jacobians are
probed at a couple of points (like solver/coloring.py), each row's variable
support is mapped to sections, and rows spanning more than two adjacent
sections fall into the border.  All grouping is static host-side NumPy; the
compiled program sees only fixed gathers.

Failure signaling matches the dense path: a singular/indefinite T̂ makes the
scan Cholesky produce NaNs → the solver's isfinite/residual gate trips the
δ_w retry (chol-as-inertia-oracle).
"""

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


class StructMeta(NamedTuple):
    """Static row-grouping metadata over the STACKED [eq; ineq] rows
    (host-built, shapes fixed per problem).

    ``group_rows[s, i]`` is the stacked-row index of slot ``i`` of section
    group ``s`` (0 for padding, masked by ``group_mask``); ``border_rows``
    holds the global rows.  ``n_border`` counts *real* border rows
    (``border_rows`` is padded to at least 1 with ``border_mask`` zeros).
    ``m_eq``/``m_ineq`` record the split of the stacked row space.
    """

    group_rows: np.ndarray   # [S, b] int32
    group_mask: np.ndarray   # [S, b] float64 (1 real / 0 pad)
    border_rows: np.ndarray  # [mb] int32 (padded to >= 1)
    border_mask: np.ndarray  # [mb] float64
    n_border: int
    n_groups: int
    block: int
    m_eq: int
    m_ineq: int


def build_struct_meta(pattern_eq, pattern_ineq, var_sec):
    """Group stacked constraint rows by section from boolean Jacobian
    patterns and a per-variable section map ``var_sec`` [n].

    A row whose variable support spans sections {a..b} with b − a ≤ 1 joins
    group a; anything wider (stage-mass links, long time-reference chains,
    arbitrary user constraints) goes to the border.  Always correct — the
    grouping only has to *cover* the true sparsity; unknown rows degrade to
    border (dense) handling, never to wrong structure.
    """
    pattern = np.vstack([np.asarray(pattern_eq, dtype=bool),
                         np.asarray(pattern_ineq, dtype=bool)])
    var_sec = np.asarray(var_sec)
    m_all, n = pattern.shape
    S = int(var_sec.max()) + 1

    groups = [[] for _ in range(S)]
    border = []
    for r in range(m_all):
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
        n_border=len(border), n_groups=S, block=b, m_eq=pattern_eq.shape[0],
        m_ineq=pattern_ineq.shape[0],
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
# dense-Schur sweep (the lanes-batched MXU variant — VERDICT r4 next-step #3)


def _chol_solve(L, x):
    """(L Lᵀ)⁻¹ x with the triangular solves in L's dtype (the factor may be
    fp32 for the mixed-precision path) and the result cast back to x's."""
    y = jsl.solve_triangular(L, x.astype(L.dtype), lower=True)
    return jsl.solve_triangular(L.T, y, lower=False).astype(x.dtype)


def _chol_solve_eq(fact, x):
    """T̂⁻¹ x through the (possibly equilibrated) factor: with D_eq the
    symmetric Jacobi scaling stored at factorization, T̂ = D_eq⁻¹ L Lᵀ D_eq⁻¹
    so T̂⁻¹ x = D_eq (L Lᵀ)⁻¹ (D_eq x)."""
    deq = fact.get("deq")
    if deq is None:
        return _chol_solve(fact["L"], x)
    xs = deq * x if x.ndim == 1 else deq[:, None] * x
    y = _chol_solve(fact["L"], xs)
    return deq * y if y.ndim == 1 else deq[:, None] * y


def factorize_dense(Dd, V, c, JE, JI, gdiag, factor_dtype=None):
    """Dense-Schur variant of :func:`factorize`: identical math, but T̂ =
    Ĵ D⁻¹ Ĵᵀ + Ĝ is assembled as ONE dense [m̂, m̂] SPD matrix and factored
    by a single Cholesky instead of the scan-over-sections bordered sweep.

    Why it exists: the scan sweep is ~10 sequential passes of b×b
    triangular ops per direction — latency-bound on TPU, and ``vmap``
    multiplies the work but not the critical path (measured 2.5 s of the
    ~2.6 s batched step at B=8, PERF.md round-4 probe).  At this problem
    scale (m̂ ≈ 1e3) one batched dense Cholesky keeps the MXU busy across
    lanes instead: 96 ms fp64 / 30 ms fp32 measured single-case.  The scan
    sweep remains the right choice for single huge meshes (S·b ≫ 1e3)
    where dense m̂² does not fit; the dense sweep is the batch/dispersion
    configuration.

    ``factor_dtype`` (e.g. ``jnp.float32``) factors T̂ in reduced precision
    while every residual/refinement stays fp64 — the mixed-precision KKT of
    SURVEY §7 hard-part #3.  Callers should raise ``n_refine`` to ≥2; the
    measured relative-residual gate (ip.direction_struct's ``struct_rtol``)
    remains the accuracy oracle either way.

    Returns an arrays-only dict that :func:`solve`, :func:`h0matvec`,
    :func:`apply_h0inv` and :func:`kkt_residual` accept interchangeably
    with :func:`factorize`'s (dispatch is on the presence of ``"L"``).
    No :class:`StructMeta` is needed — there is no grouping.
    """
    J = jnp.concatenate([JE, JI], axis=0)
    Dinv = 1.0 / Dd
    W = Dinv[:, None] * V
    Mcore = jnp.diag(1.0 / c) + V.T @ W
    qM, rM = jnp.linalg.qr(Mcore)
    U = J @ W

    T = (J * Dinv[None, :]) @ J.T + jnp.diag(gdiag)
    fact = dict(Dinv=Dinv, V=V, c=c, W=W, qM=qM, rM=rM, U=U,
                J=J, Dd=Dd, gdiag=gdiag)
    if factor_dtype is not None:
        # symmetric Jacobi equilibration before the reduced-precision cast:
        # most of T̂'s conditioning is diagonal scale spread (Σ_z spans
        # ~1e10 across near-active bounds), which a unit-diagonal rescale
        # removes — the fp32 factor then only has to carry the structural
        # conditioning.  diag(T̂) > 0 always (D⁻¹ > 0, Ĝ ≥ 0).
        deq = 1.0 / jnp.sqrt(jnp.diagonal(T))
        T = T * (deq[:, None] * deq[None, :])
        fact["deq"] = deq
        T = T.astype(factor_dtype)
    fact["L"] = jnp.linalg.cholesky(T)

    TiU = _chol_solve_eq(fact, U)
    Cs = Mcore - U.T @ TiU
    qC, rC = jnp.linalg.qr(Cs)
    fact.update(TiU=TiU, qC=qC, rC=rC)
    return fact


def _schur_solve_dense(fact, rhs):
    """Ŝ⁻¹ rhs = (T̂ − U M⁻¹ Uᵀ)⁻¹ rhs via SMW over the dense T̂ factor."""
    t = _chol_solve_eq(fact, rhs)
    w = fact["U"].T @ t
    u = jsl.solve_triangular(fact["rC"], fact["qC"].T @ w, lower=False)
    return t + fact["TiU"] @ u


# ---------------------------------------------------------------------------
# the structured augmented-KKT factorization


def factorize(Dd, V, c, JE, JI, gdiag, meta: StructMeta):
    """Factor the augmented KKT system (module docstring) with
    H₀ = diag(Dd) + V diag(c) Vᵀ and Ĝ = diag(gdiag) over the stacked
    [J_E; J_I] rows.

    Never materializes H (n²) or Ŝ (m̂²): the Woodbury core and the SMW
    correction core are k×k (k = 2·mem, QR-factored), T̂ is factored as
    bordered block-tridiagonal.  Returns an arrays-only dict
    (jit/vmap-safe).
    """
    gr = jnp.asarray(meta.group_rows)
    gm = jnp.asarray(meta.group_mask)
    br = jnp.asarray(meta.border_rows)
    bm = jnp.asarray(meta.border_mask)

    J = jnp.concatenate([JE, JI], axis=0)      # stacked rows [m̂, n]
    Dinv = 1.0 / Dd
    W = Dinv[:, None] * V                      # D⁻¹ V        [n, k]
    Mcore = jnp.diag(1.0 / c) + V.T @ W        # Woodbury core [k, k]
    qM, rM = jnp.linalg.qr(Mcore)

    # U = Ĵ D⁻¹ V  (the dense rank-k coupling; m̂ × k)
    U = J @ W

    # T̂'s blocks from the grouped rows (padded rows are zeroed and get a
    # unit diagonal so the factorization stays SPD and they decouple)
    Jg = J[gr] * gm[:, :, None]                # [S, b, n]
    Jb = J[br] * bm[:, None]                   # [mb, n]
    Ag = Jg * Dinv[None, None, :]
    Td = jnp.einsum("sbn,scn->sbc", Ag, Jg)
    Tl = jnp.einsum("sbn,scn->sbc", Ag[1:], Jg[:-1])
    diag_fill = gdiag[gr] * gm + (1.0 - gm)    # Ĝ on real rows, 1 on pads
    Td = Td + jax.vmap(jnp.diag)(diag_fill)
    Bstrip = jnp.einsum("mn,sbn->smb", Jb * Dinv[None, :], Jg)
    Cbb = ((Jb * Dinv[None, :]) @ Jb.T
           + jnp.diag(gdiag[br] * bm + (1.0 - bm)))

    tf = bordered_factorize(Td, Tl, Bstrip, Cbb)

    # SMW correction core: C_s = M − Uᵀ T̂⁻¹ U  (k×k, indefinite → QR)
    Ug = U[gr] * gm[:, :, None]                # [S, b, k]
    Ub = U[br] * bm[:, None]                   # [mb, k]
    TiU_g, TiU_b = bordered_solve(tf, Ug, Ub)
    Cs = (Mcore - jnp.einsum("sbk,sbl->kl", Ug, TiU_g)
          - Ub.T @ TiU_b)
    qC, rC = jnp.linalg.qr(Cs)

    return dict(Dinv=Dinv, V=V, c=c, W=W, qM=qM, rM=rM, U=U,
                TiU_g=TiU_g, TiU_b=TiU_b, qC=qC, rC=rC, J=J, Dd=Dd,
                gdiag=gdiag, **tf)


def h0matvec(fact, x):
    """H₀ x = D·x + V (c ⊙ (Vᵀ x))  — no dense H."""
    V, c = fact["V"], fact["c"]
    if x.ndim == 1:
        return fact["Dd"] * x + V @ (c * (V.T @ x))
    return fact["Dd"][:, None] * x + V @ (c[:, None] * (V.T @ x))


def apply_h0inv(fact, x):
    """H₀⁻¹ x via Woodbury (QR-factored core; BFGS columns only, so the
    correction never dwarfs the base — see the module stability note)."""
    Dinv, V, W, qM, rM = (fact["Dinv"], fact["V"], fact["W"], fact["qM"],
                          fact["rM"])
    t = V.T @ (Dinv * x) if x.ndim == 1 else V.T @ (Dinv[:, None] * x)
    u = jsl.solve_triangular(rM, qM.T @ t, lower=False)
    return (Dinv * x - W @ u) if x.ndim == 1 else (Dinv[:, None] * x - W @ u)


def _schur_solve(fact, meta: StructMeta, rhs):
    """Ŝ⁻¹ rhs with Ŝ = T̂ − U M⁻¹ Uᵀ via SMW over the bordered-T̂ factors
    (or the dense T̂ factor — dispatch on the fact dict's contents)."""
    if "L" in fact:
        return _schur_solve_dense(fact, rhs)
    gr = jnp.asarray(meta.group_rows)
    gm = jnp.asarray(meta.group_mask)
    br = jnp.asarray(meta.border_rows)
    bm = jnp.asarray(meta.border_mask)

    rg = rhs[gr] * gm
    rb = rhs[br] * bm
    t_g, t_b = bordered_solve(fact, rg, rb)
    # correction: + T̂⁻¹ U (M − Uᵀ T̂⁻¹ U)⁻¹ Uᵀ T̂⁻¹ rhs
    Ug = fact["U"][gr] * gm[:, :, None]
    Ub = fact["U"][br] * bm[:, None]
    w = jnp.einsum("sbk,sb->k", Ug, t_g) + Ub.T @ t_b
    u = jsl.solve_triangular(fact["rC"], fact["qC"].T @ w, lower=False)
    x_g = t_g + jnp.einsum("sbk,k->sb", fact["TiU_g"], u)
    x_b = t_b + fact["TiU_b"] @ u

    # scatter back to flat stacked-row order (pad slots masked to zero)
    out = jnp.zeros(meta.m_eq + meta.m_ineq, rhs.dtype)
    out = out.at[gr.ravel()].add((x_g * gm).ravel())
    out = out.at[br].add(x_b * bm)
    return out


def solve(fact, meta, r1, r2, r3, n_refine=1):
    """Solve the augmented KKT system (module docstring) for
    (dz, dy, w).  ``r2`` spans the equality rows, ``r3`` the inequality
    rows.  Same refinement policy as linalg.kkt_solve: fp64 sweeps over the
    full residual, best iterate wins.  ``meta`` may be None with a
    dense-sweep fact (factorize_dense) — no grouping is consulted."""
    J, gdiag = fact["J"], fact["gdiag"]
    m_eq = r2.shape[0]
    r23 = jnp.concatenate([r2, r3])

    def one_solve(b1, b23):
        h_b1 = apply_h0inv(fact, b1)
        rhs_y = J @ h_b1 - b23
        dyw = _schur_solve(fact, meta, rhs_y)
        dz = apply_h0inv(fact, b1 - J.T @ dyw)
        return dz, dyw

    dz, dyw = one_solve(r1, r23)
    if n_refine <= 0:
        return dz, dyw[:m_eq], dyw[m_eq:]

    def resid(dz, dyw):
        return (r1 - h0matvec(fact, dz) - J.T @ dyw,
                r23 - J @ dz + gdiag * dyw)

    best = (dz, dyw)
    best_rn = jnp.inf
    for _ in range(n_refine):
        rho1, rho23 = resid(dz, dyw)
        rn = jnp.sqrt(rho1 @ rho1 + rho23 @ rho23)
        better = rn < best_rn
        best = (jnp.where(better, dz, best[0]),
                jnp.where(better, dyw, best[1]))
        best_rn = jnp.where(better, rn, best_rn)
        ddz, ddyw = one_solve(rho1, rho23)
        dz = dz + ddz
        dyw = dyw + ddyw
    rho1, rho23 = resid(dz, dyw)
    rn = jnp.sqrt(rho1 @ rho1 + rho23 @ rho23)
    better = rn < best_rn
    dz = jnp.where(better, dz, best[0])
    dyw = jnp.where(better, dyw, best[1])
    return dz, dyw[:m_eq], dyw[m_eq:]


def kkt_residual(fact, meta, dz, dyw, r1, r23):
    """Max-norm relative residual of an augmented-system solution (the
    struct path's inertia/breakdown oracle — see ip.direction_struct)."""
    rho1 = r1 - h0matvec(fact, dz) - fact["J"].T @ dyw
    rho23 = r23 - fact["J"] @ dz + fact["gdiag"] * dyw
    return jnp.maximum(
        jnp.max(jnp.abs(rho1), initial=0.0)
        / (jnp.max(jnp.abs(r1), initial=0.0) + 1e-12),
        jnp.max(jnp.abs(rho23), initial=0.0)
        / (jnp.max(jnp.abs(r23), initial=0.0) + 1e-12))
