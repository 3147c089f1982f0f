"""Tests for the LGR basis and section stacking."""

import numpy as np
from scipy import special

from gelato_tpu.transcription import lgr_nodes, lgr_weights, lgr_diff_matrix, SectionStack


class TestLGRBasis:
    def test_nodes_properties(self):
        for n in (2, 3, 5, 8, 16):
            tau = lgr_nodes(n)
            assert tau.shape == (n,)
            assert np.all(np.diff(tau) > 0)
            assert tau[-1] == 1.0  # flipped LGR includes +1
            assert tau[0] > -1.0  # excludes -1
            # flipped nodes are roots of P_{n-1}(-τ) + P_n(-τ)
            r = special.eval_legendre(n - 1, -tau) + special.eval_legendre(n, -tau)
            np.testing.assert_allclose(r, 0.0, atol=1e-10)

    def test_weights_quadrature(self):
        """LGR quadrature is exact for polynomials up to degree 2n-2."""
        for n in (2, 4, 6, 10):
            tau = lgr_nodes(n)
            w = lgr_weights(n)
            np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-13)
            for deg in range(2 * n - 1):
                exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)  # ∫_{-1}^{1} x^deg
                np.testing.assert_allclose(
                    (w * tau**deg).sum(), exact, atol=1e-12,
                    err_msg=f"n={n} deg={deg}",
                )

    def test_diff_matrix_polynomial_exactness(self):
        """D applied to polynomial samples gives exact derivatives at nodes."""
        for n in (2, 3, 5, 8, 16):
            tau = lgr_nodes(n)
            x_all = np.concatenate(([-1.0], tau))
            D = lgr_diff_matrix(n)
            assert D.shape == (n, n + 1)
            for deg in range(n + 1):
                p = x_all**deg
                dp = deg * tau ** max(deg - 1, 0) if deg > 0 else np.zeros(n)
                np.testing.assert_allclose(D @ p, dp, atol=1e-9, err_msg=f"n={n} deg={deg}")

    def test_diff_matrix_row_sum_zero(self):
        """Derivative of the constant is zero: rows sum to 0."""
        for n in (2, 5, 12):
            np.testing.assert_allclose(lgr_diff_matrix(n).sum(axis=1), 0.0, atol=1e-10)


class TestSectionStack:
    NODES = (5, 5, 16, 8, 2, 2, 5, 6, 8, 4, 3, 2)  # the example case

    def test_counts(self):
        ps = SectionStack.build(self.NODES)
        assert ps.S == 12
        assert ps.N == 66
        assert ps.M == 78
        assert ps.n_max == 16

    def test_reference_index_convention(self):
        ps = SectionStack.build(self.NODES)
        # reference get_index: ua cumulative, xa = ua + i
        ua = 0
        for i, n in enumerate(self.NODES):
            ua_i, ub_i, xa_i, xb_i, n_i = ps.get_index(i)
            assert (ua_i, ub_i, xa_i, xb_i, n_i) == (ua, ua + n, ua + i, ua + i + n + 1, n)
            ua += n

    def test_gather_consistency(self):
        ps = SectionStack.build(self.NODES)
        x = np.arange(ps.M, dtype=float)
        gx = ps.gather_x(x)
        assert gx.shape == (ps.S, ps.n_max + 1)
        for i in range(ps.S):
            _, _, xa, xb, n = ps.get_index(i)
            np.testing.assert_array_equal(gx[i, : n + 1], x[xa:xb])

    def test_padded_D_zero_rows(self):
        ps = SectionStack.build(self.NODES)
        for i, n in enumerate(self.NODES):
            assert np.all(ps.D[i, n:, :] == 0.0)
            assert not np.any(ps.node_mask[i, n:])

    def test_defect_on_exact_polynomial(self):
        """Collocation defect D·x − Δt/2·ẋ vanishes for polynomial dynamics."""
        ps = SectionStack.build((5, 8))
        t_knots = np.array([0.0, 10.0, 30.0])
        t_x = ps.time_nodes_x(t_knots)  # [S, n_max+1]
        x = t_x**3  # state trajectory x(t) = t³
        xdot = 3.0 * t_x[:, 1:] ** 2  # at collocation nodes
        half = (t_knots[1:] - t_knots[:-1])[:, None] / 2.0
        defect = np.einsum("sij,sj->si", ps.D, x) - half * xdot
        assert np.all(np.abs(defect[ps.node_mask]) < 1e-8)

    def test_time_nodes_match_reference_formula(self):
        ps = SectionStack.build((5, 3))
        t_knots = np.array([1.0, 4.0, 9.0])
        t_x = ps.time_nodes_x(t_knots)
        for i in range(2):
            n = ps.num_nodes[i]
            to, tf = t_knots[i], t_knots[i + 1]
            expect = lgr_nodes(n) * (tf - to) / 2 + (tf + to) / 2
            np.testing.assert_allclose(t_x[i, 1 : n + 1], expect)
            assert t_x[i, 0] == to


class TestLGLAndLGVariants:
    """LGL/LG basis machinery (reference lib/PSfunctions.py:91-146 — dead at
    its runtime, rebuilt here for inventory parity and method studies)."""

    def test_lgl_nodes_and_weights(self):
        from gelato_tpu.transcription import lgl_nodes, lgl_weights

        # classic n=3 closed-form check: nodes ±1, 0; weights 1/3, 4/3, 1/3
        np.testing.assert_allclose(lgl_nodes(3), [-1.0, 0.0, 1.0], atol=1e-14)
        np.testing.assert_allclose(lgl_weights(3), [1 / 3, 4 / 3, 1 / 3],
                                   rtol=1e-13)
        for n in (2, 4, 7, 12):
            x, w = lgl_nodes(n), lgl_weights(n)
            assert x.shape == w.shape == (n,)
            assert x[0] == -1.0 and x[-1] == 1.0
            assert np.all(np.diff(x) > 0)
            np.testing.assert_allclose(w.sum(), 2.0, rtol=1e-13)
            # LGL quadrature exact through degree 2n-3
            for deg in range(2 * n - 2):
                exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)
                np.testing.assert_allclose((w * x**deg).sum(), exact,
                                           atol=1e-12)

    def test_lg_nodes_and_weights(self):
        from gelato_tpu.transcription import lg_nodes, lg_weights

        for n in (1, 3, 6, 10):
            x, w = lg_nodes(n), lg_weights(n)
            assert x.shape == w.shape == (n,)
            assert np.all(np.abs(x) < 1.0)  # both endpoints excluded
            # roots of P_n
            np.testing.assert_allclose(special.eval_legendre(n, x), 0.0,
                                       atol=1e-12)
            # Gauss quadrature exact through degree 2n-1
            for deg in range(2 * n):
                exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)
                np.testing.assert_allclose((w * x**deg).sum(), exact,
                                           atol=1e-12)

    def test_lgl_diff_matrix_polynomial_exactness(self):
        from gelato_tpu.transcription import lgl_nodes, lgl_diff_matrix

        for n in (3, 5, 9):
            x = lgl_nodes(n)
            D = lgl_diff_matrix(n)
            assert D.shape == (n, n)
            np.testing.assert_allclose(D.sum(axis=1), 0.0, atol=1e-11)
            for deg in range(n):  # exact for polynomials of degree < n
                np.testing.assert_allclose(D @ x**deg,
                                           deg * x ** max(deg - 1, 0)
                                           if deg else np.zeros(n),
                                           atol=1e-9)

    def test_lg_diff_matrix_polynomial_exactness(self):
        from gelato_tpu.transcription import lg_nodes, lg_diff_matrix

        for n in (2, 4, 8):
            x = lg_nodes(n)
            D = lg_diff_matrix(n)
            assert D.shape == (n, n + 1)
            x_all = np.concatenate(([-1.0], x))
            np.testing.assert_allclose(D.sum(axis=1), 0.0, atol=1e-11)
            for deg in range(n + 1):  # support has n+1 points
                np.testing.assert_allclose(
                    D @ x_all**deg,
                    deg * x ** max(deg - 1, 0) if deg else np.zeros(n),
                    atol=1e-9)
