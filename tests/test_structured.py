"""Structured condensed-KKT solver tests (solver/structured.py).

Validates, in increasing integration order:
  1. the bordered block-tridiagonal Cholesky against dense linalg;
  2. the discovered row grouping really is block-tridiagonal + border on
     the actual trajectory problem (the structural claim the whole design
     rests on — any row that violates adjacency must land in the border);
  3. the full structured KKT solve against the dense condensed-Cholesky
     path on the real problem's Jacobian (VERDICT r2 item 2's equivalence
     requirement);
  4. fused-step solves with kkt_method="struct" track the dense solver.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.solver import linalg, structured  # noqa: E402

SETTINGS = "/root/reference/example/example-settings.json"

# >30 s on the 1-vCPU host (measured: per-file timing, PERF.md round 4)
pytestmark = pytest.mark.slow
needs_ref = pytest.mark.skipif(not os.path.exists(SETTINGS),
                               reason="no reference data")


def _problem(nodes, dt):
    from gelato_tpu.config import load_mission
    from gelato_tpu.problem import Problem
    from gelato_tpu import initial_guess as ig

    mission = load_mission(SETTINGS)
    mission.events.num_nodes = np.full_like(mission.events.num_nodes, nodes)
    problem = Problem(mission)
    z0 = np.asarray(ig.initial_guess(problem, dt=dt))
    return problem, z0


def _random_btd(rng, S, b, mb):
    """Dense SPD matrix with block-tridiagonal + border structure, plus its
    block decomposition."""
    n = S * b + mb
    A = np.zeros((n, n))
    for s in range(S):
        blk = rng.normal(size=(b, b))
        A[s * b:(s + 1) * b, s * b:(s + 1) * b] = blk @ blk.T + 2.0 * np.eye(b)
        if s:
            off = 0.3 * rng.normal(size=(b, b))
            A[s * b:(s + 1) * b, (s - 1) * b:s * b] = off
            A[(s - 1) * b:s * b, s * b:(s + 1) * b] = off.T
    Bb = 0.3 * rng.normal(size=(mb, S * b))
    Cb = rng.normal(size=(mb, mb))
    A[S * b:, :S * b] = Bb
    A[:S * b, S * b:] = Bb.T
    A[S * b:, S * b:] = Cb @ Cb.T + 2.0 * np.eye(mb)
    # SPD-ness of the whole thing
    A = A + (max(0.0, 1e-6 - np.linalg.eigvalsh(A).min())) * np.eye(n)
    Td = np.stack([A[s * b:(s + 1) * b, s * b:(s + 1) * b] for s in range(S)])
    Tl = np.stack([A[(s + 1) * b:(s + 2) * b, s * b:(s + 1) * b]
                   for s in range(S - 1)])
    Bstrip = np.stack([A[S * b:, s * b:(s + 1) * b] for s in range(S)])
    Cbb = A[S * b:, S * b:]
    return A, Td, Tl, Bstrip, Cbb


def test_bordered_btd_solve_matches_dense():
    rng = np.random.default_rng(0)
    S, b, mb = 5, 7, 3
    A, Td, Tl, Bstrip, Cbb = _random_btd(rng, S, b, mb)
    rhs = rng.normal(size=S * b + mb)

    tf = structured.bordered_factorize(jnp.asarray(Td), jnp.asarray(Tl),
                                       jnp.asarray(Bstrip), jnp.asarray(Cbb))
    xg, xb = structured.bordered_solve(
        tf, jnp.asarray(rhs[:S * b].reshape(S, b)), jnp.asarray(rhs[S * b:]))
    x = np.concatenate([np.asarray(xg).ravel(), np.asarray(xb)])
    x_ref = np.linalg.solve(A, rhs)
    np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-10)

    # multi-RHS path
    R = rng.normal(size=(S * b + mb, 4))
    xg, xb = structured.bordered_solve(
        tf, jnp.asarray(R[:S * b].reshape(S, b, 4)), jnp.asarray(R[S * b:]))
    X = np.concatenate([np.asarray(xg).reshape(S * b, 4), np.asarray(xb)])
    np.testing.assert_allclose(X, np.linalg.solve(A, R), rtol=1e-9,
                               atol=1e-10)


def _jacobians(problem, funcs, z0):
    JE = np.asarray(jax.jacfwd(lambda z: funcs["eq"](z, ()))(jnp.asarray(z0)))
    JI = np.asarray(jax.jacfwd(
        lambda z: funcs["ineq"](z, ()))(jnp.asarray(z0)))
    return JE, JI


@needs_ref
def test_grouping_is_block_tridiagonal_on_real_problem():
    """The discovered grouping must make T̂ = Ĵ D⁻¹ Ĵᵀ (stacked [eq; ineq]
    rows) exactly block-tridiagonal outside the border — the load-bearing
    structure."""
    problem, z0 = _problem(3, 1.0)
    funcs = problem.solver_funcs(structured=True, z0=z0)
    meta = funcs["struct_meta"]
    assert meta.n_groups == problem.S
    # the border must stay small — it is factored densely
    assert meta.n_border <= 24, meta.n_border

    JE, JI = _jacobians(problem, funcs, z0)
    J = np.vstack([JE, JI])
    assert meta.m_eq == JE.shape[0] and meta.m_ineq == JI.shape[0]
    rng = np.random.default_rng(0)
    D = 0.5 + rng.random(J.shape[1])
    T = (J / D) @ J.T
    for i in range(meta.n_groups):
        for j in range(meta.n_groups):
            if abs(i - j) <= 1:
                continue
            ri = meta.group_rows[i][meta.group_mask[i] > 0]
            rj = meta.group_rows[j][meta.group_mask[j] > 0]
            if len(ri) and len(rj):
                assert np.abs(T[np.ix_(ri, rj)]).max() == 0.0, (i, j)


@needs_ref
def test_struct_kkt_solve_matches_dense_on_real_jacobian():
    """Equivalence on the real problem's Jacobians: the augmented
    structured solve must reproduce the dense condensed solve, including
    with extreme σ_s (the near-active-inequality regime that broke the
    condensed-Woodbury formulation)."""
    problem, z0 = _problem(3, 1.0)
    funcs = problem.solver_funcs(structured=True, z0=z0)
    meta = funcs["struct_meta"]
    JE, JI = _jacobians(problem, funcs, z0)
    mE, n = JE.shape
    mI = JI.shape[0]

    rng = np.random.default_rng(1)
    D = 0.5 + rng.random(n)
    k = 24
    V = 0.3 * rng.normal(size=(n, k))
    c = np.where(rng.random(k) > 0.3, 1.0, -0.2)
    H0 = np.diag(D) + V @ np.diag(c) @ V.T
    lo = np.linalg.eigvalsh(H0).min()
    if lo <= 1e-6:  # shift like the damped-BFGS positive-definiteness
        D = D + (1e-3 - lo)
        H0 = np.diag(D) + V @ np.diag(c) @ V.T

    # extreme inequality scaling: σ_s spans 1e-8 .. 1e12
    sigma_s = 10.0 ** rng.uniform(-8, 12, size=mI)
    H = H0 + JI.T @ (sigma_s[:, None] * JI)
    delta_c = 1e-8
    r1 = rng.normal(size=n)
    r2 = rng.normal(size=mE)
    r3 = rng.normal(size=mI)

    # dense condensed reference: H dz + JEᵀ dy = r1 + JIᵀ Σ r3 ; JE dz = r2
    fact_d = linalg.kkt_factorize(jnp.asarray(H), jnp.asarray(JE), delta_c,
                                  "chol")
    dz_d, dy_d = linalg.kkt_solve(
        "chol", fact_d, jnp.asarray(r1 + JI.T @ (sigma_s * r3)),
        jnp.asarray(r2), 1)

    gdiag = jnp.asarray(np.concatenate([np.full(mE, delta_c),
                                        1.0 / sigma_s]))
    fact_s = structured.factorize(jnp.asarray(D), jnp.asarray(V),
                                  jnp.asarray(c), jnp.asarray(JE),
                                  jnp.asarray(JI), gdiag, meta)
    dz_s, dy_s, w_s = structured.solve(fact_s, meta, jnp.asarray(r1),
                                       jnp.asarray(r2), jnp.asarray(r3), 1)
    scale_z = max(1.0, float(np.abs(np.asarray(dz_d)).max()))
    scale_y = max(1.0, float(np.abs(np.asarray(dy_d)).max()))
    np.testing.assert_allclose(np.asarray(dz_s) / scale_z,
                               np.asarray(dz_d) / scale_z, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dy_s) / scale_y,
                               np.asarray(dy_d) / scale_y, atol=1e-7)
    # eliminated block consistency: w = Σ (J_I dz − r3)
    np.testing.assert_allclose(
        np.asarray(w_s) / np.maximum(1.0, np.abs(sigma_s * (JI @ np.asarray(
            dz_s)) - sigma_s * r3)),
        (sigma_s * (JI @ np.asarray(dz_s) - r3)) / np.maximum(
            1.0, np.abs(sigma_s * (JI @ np.asarray(dz_s)) - sigma_s * r3)),
        atol=1e-6)

    # H₀ matvec and H₀⁻¹ consistency
    x = rng.normal(size=n)
    np.testing.assert_allclose(np.asarray(structured.h0matvec(fact_s, x)),
                               H0 @ x, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(structured.apply_h0inv(fact_s, jnp.asarray(x))),
        np.linalg.solve(H0, x), rtol=1e-7, atol=1e-9)


@needs_ref
def test_struct_fused_step_matches_dense():
    """The first fused iterations with kkt_method='struct' reproduce the
    dense solver's iterates to solver-rounding accuracy.  (Long trajectory
    comparisons are meaningless here: the filter/backtracking acceptance
    tests are binary decisions, so last-bit differences eventually pick
    different — equally valid — paths; basin equivalence is covered by
    test_struct_warm_convergence and the cold-solve comparison in PERF.md.)
    """
    from gelato_tpu.solver import solve_device, IPOptions

    problem, z0 = _problem(2, 2.0)
    lb, ub = problem.bounds()
    funcs_d = problem.solver_funcs()
    funcs_s = problem.solver_funcs(structured=True, z0=z0)

    st_d, _ = solve_device(funcs_d, z0, lb, ub,
                           IPOptions(max_iter=3, mu_init=1e-3), chunk=3)
    st_s, _ = solve_device(funcs_s, z0, lb, ub,
                           IPOptions(max_iter=3, mu_init=1e-3,
                                     kkt_method="struct"), chunk=3)
    np.testing.assert_allclose(np.asarray(st_s.z), np.asarray(st_d.z),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(st_s.yE), np.asarray(st_d.yE),
                               atol=1e-5)


@needs_ref
def test_struct_colored_combined_matches_dense():
    """The bench configuration combines colored Jacobians with the
    structured KKT; the first iterations must still match the plain dense
    path."""
    from gelato_tpu.solver import solve_device, IPOptions

    problem, z0 = _problem(2, 2.0)
    lb, ub = problem.bounds()
    funcs_d = problem.solver_funcs()
    funcs_c = problem.solver_funcs(colored=True, structured=True, z0=z0)

    st_d, _ = solve_device(funcs_d, z0, lb, ub,
                           IPOptions(max_iter=3, mu_init=1e-3), chunk=3)
    st_c, _ = solve_device(funcs_c, z0, lb, ub,
                           IPOptions(max_iter=3, mu_init=1e-3,
                                     kkt_method="struct"), chunk=3)
    np.testing.assert_allclose(np.asarray(st_c.z), np.asarray(st_d.z),
                               atol=1e-7)


@needs_ref
def test_struct_requires_meta():
    from gelato_tpu.solver import solve_device, IPOptions

    problem, z0 = _problem(2, 2.0)
    lb, ub = problem.bounds()
    with pytest.raises(ValueError, match="struct_meta"):
        solve_device(problem.solver_funcs(), z0, *problem.bounds(),
                     IPOptions(max_iter=2, kkt_method="struct"))


@needs_ref
def test_struct_warm_convergence():
    """Struct KKT re-converges the warm-started tiny case (full
    convergence through the structured path, not just progress)."""
    from gelato_tpu.solver import solve_device, IPOptions
    from gelato_tpu.solver.warm_start import load_state

    warm_path = os.path.join(os.path.dirname(__file__), "data",
                             "tiny2_warm.npz")
    if not os.path.exists(warm_path):
        pytest.skip("warm state not built")
    problem, z0 = _problem(2, 2.0)
    lb, ub = problem.bounds()
    funcs_s = problem.solver_funcs(structured=True, z0=z0)
    st, info = solve_device(funcs_s, z0, lb, ub,
                            IPOptions(max_iter=80, mu_init=1e-3,
                                      kkt_method="struct"),
                            chunk=20, warm=load_state(warm_path))
    assert info["converged"], info
    payload = (float(st.z[0]) * problem.units.mass
               - problem.mission.m_init - 140.0)
    assert abs(payload - 377.7) < 4.0, payload


def _synthetic_augmented(rng, n=48, mE=20, mI=14, k=8):
    """Random augmented KKT system in the module-docstring convention:
    K = [[H0, Jᵀ], [J, −diag(gdiag)]], H0 = diag(D) + V diag(c) Vᵀ SPD."""
    D = 0.5 + rng.random(n)
    V = 0.3 * rng.normal(size=(n, k))
    c = np.where(rng.random(k) > 0.3, 1.0, -0.2)
    H0 = np.diag(D) + V @ np.diag(c) @ V.T
    lo = np.linalg.eigvalsh(H0).min()
    if lo <= 1e-6:
        D = D + (1e-3 - lo)
        H0 = np.diag(D) + V @ np.diag(c) @ V.T
    JE = rng.normal(size=(mE, n))
    JI = rng.normal(size=(mI, n))
    sigma_s = 10.0 ** rng.uniform(-6, 8, size=mI)
    gdiag = np.concatenate([np.full(mE, 1e-8), 1.0 / sigma_s])
    J = np.vstack([JE, JI])
    K = np.block([[H0, J.T], [J, -np.diag(gdiag)]])
    return D, V, c, JE, JI, gdiag, K


def test_dense_sweep_matches_augmented_system():
    """factorize_dense must solve the same augmented system as the scan
    sweep — checked against a direct NumPy solve of the full K, including
    the extreme-σ_s regime (the batch/dispersion configuration's factor;
    VERDICT r4 next-step #3)."""
    rng = np.random.default_rng(7)
    D, V, c, JE, JI, gdiag, K = _synthetic_augmented(rng)
    n, mE, mI = D.shape[0], JE.shape[0], JI.shape[0]
    r1 = rng.normal(size=n)
    r2 = rng.normal(size=mE)
    r3 = rng.normal(size=mI)
    ref = np.linalg.solve(K, np.concatenate([r1, r2, r3]))

    fact = structured.factorize_dense(
        jnp.asarray(D), jnp.asarray(V), jnp.asarray(c), jnp.asarray(JE),
        jnp.asarray(JI), jnp.asarray(gdiag))
    dz, dy, w = structured.solve(fact, None, jnp.asarray(r1),
                                 jnp.asarray(r2), jnp.asarray(r3), 1)
    got = np.concatenate([np.asarray(dz), np.asarray(dy), np.asarray(w)])
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-8)

    # the residual oracle agrees it solved the system
    dyw = jnp.concatenate([jnp.asarray(dy), jnp.asarray(w)])
    rel = structured.kkt_residual(fact, None, jnp.asarray(dz), dyw,
                                  jnp.asarray(r1),
                                  jnp.asarray(np.concatenate([r2, r3])))
    assert float(rel) < 1e-8


def test_dense_sweep_f32_factor_refines_to_f64():
    """Mixed-precision path: fp32 T̂ factor + fp64 refinement sweeps must
    land within the struct_rtol gate (1e-4) and, with enough sweeps, far
    below it (SURVEY §7 hard-part #3)."""
    rng = np.random.default_rng(11)
    D, V, c, JE, JI, gdiag, K = _synthetic_augmented(rng)
    n, mE, mI = D.shape[0], JE.shape[0], JI.shape[0]
    r1 = rng.normal(size=n)
    r2 = rng.normal(size=mE)
    r3 = rng.normal(size=mI)
    ref = np.linalg.solve(K, np.concatenate([r1, r2, r3]))

    fact = structured.factorize_dense(
        jnp.asarray(D), jnp.asarray(V), jnp.asarray(c), jnp.asarray(JE),
        jnp.asarray(JI), jnp.asarray(gdiag), factor_dtype=jnp.float32)
    assert fact["L"].dtype == jnp.float32
    dz, dy, w = structured.solve(fact, None, jnp.asarray(r1),
                                 jnp.asarray(r2), jnp.asarray(r3), 3)
    got = np.concatenate([np.asarray(dz), np.asarray(dy), np.asarray(w)])
    assert got.dtype == np.float64
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-6)

    dyw = jnp.concatenate([jnp.asarray(dy), jnp.asarray(w)])
    rel = structured.kkt_residual(fact, None, jnp.asarray(dz), dyw,
                                  jnp.asarray(r1),
                                  jnp.asarray(np.concatenate([r2, r3])))
    assert float(rel) < 1e-6


@needs_ref
def test_dense_sweep_matches_scan_on_real_jacobian():
    """On the real problem's Jacobians the dense sweep and the scan sweep
    produce the same direction (they factor the same T̂)."""
    problem, z0 = _problem(3, 1.0)
    funcs = problem.solver_funcs(structured=True, z0=z0)
    meta = funcs["struct_meta"]
    JE, JI = _jacobians(problem, funcs, z0)
    mE, n = JE.shape
    mI = JI.shape[0]

    rng = np.random.default_rng(3)
    D = 0.5 + rng.random(n)
    k = 24
    V = 0.3 * rng.normal(size=(n, k))
    c = np.where(rng.random(k) > 0.3, 1.0, -0.2)
    H0 = np.diag(D) + V @ np.diag(c) @ V.T
    lo = np.linalg.eigvalsh(H0).min()
    if lo <= 1e-6:
        D = D + (1e-3 - lo)
    sigma_s = 10.0 ** rng.uniform(-8, 12, size=mI)
    gdiag = jnp.asarray(np.concatenate([np.full(mE, 1e-8), 1.0 / sigma_s]))
    r1 = rng.normal(size=n)
    r2 = rng.normal(size=mE)
    r3 = rng.normal(size=mI)

    args = (jnp.asarray(D), jnp.asarray(V), jnp.asarray(c), jnp.asarray(JE),
            jnp.asarray(JI), gdiag)
    f_scan = structured.factorize(*args, meta)
    f_dense = structured.factorize_dense(*args)
    out_scan = structured.solve(f_scan, meta, jnp.asarray(r1),
                                jnp.asarray(r2), jnp.asarray(r3), 1)
    out_dense = structured.solve(f_dense, None, jnp.asarray(r1),
                                 jnp.asarray(r2), jnp.asarray(r3), 1)
    for a, b in zip(out_scan, out_dense):
        sc = max(1.0, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                   atol=1e-7)
