"""Tests for the C1 corner-smoothed table interpolation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.ops.interp import interp1d_c1  # noqa: E402


XP = np.array([0.0, 0.7, 1.0, 1.5, 4.0])
FP = np.array([0.3, 0.3, 0.65, 0.65, 0.3])


class TestInterpC1:
    def test_matches_linear_away_from_knots(self):
        # windows are min(gap)/4 wide; probe points well outside them
        for x in [0.2, 0.35, 1.25, 2.8, 3.9]:
            np.testing.assert_allclose(
                float(interp1d_c1(jnp.asarray(x), XP, FP)),
                np.interp(x, XP, FP), rtol=1e-14)

    def test_exact_at_outer_ends_and_extrapolation(self):
        np.testing.assert_allclose(float(interp1d_c1(jnp.asarray(-1.0), XP, FP)), 0.3)
        np.testing.assert_allclose(float(interp1d_c1(jnp.asarray(9.0), XP, FP)), 0.3)

    def test_bounded_deviation_at_knots(self):
        # deviation at knot k is dm*w/4
        gaps = np.diff(XP)
        slopes = np.diff(FP) / gaps
        for i, xk in enumerate(XP[1:-1]):
            w = min(gaps[i], gaps[i + 1]) / 4.0
            dm = slopes[i + 1] - slopes[i]
            dev = float(interp1d_c1(jnp.asarray(xk), XP, FP)) - np.interp(xk, XP, FP)
            np.testing.assert_allclose(dev, dm * w / 4.0, rtol=1e-12)

    def test_c1_continuity(self):
        """Derivative is continuous across the blend windows."""
        g = jax.grad(lambda x: interp1d_c1(x, XP, FP))
        for xk in XP[1:-1]:
            w = 1e-7
            left = float(g(jnp.asarray(xk - w)))
            right = float(g(jnp.asarray(xk + w)))
            np.testing.assert_allclose(left, right, atol=1e-4)

    def test_derivative_matches_slopes_outside_windows(self):
        g = jax.grad(lambda x: interp1d_c1(x, XP, FP))
        np.testing.assert_allclose(float(g(jnp.asarray(0.35))), 0.0, atol=1e-12)
        np.testing.assert_allclose(float(g(jnp.asarray(0.85))),
                                   (0.65 - 0.3) / 0.3, rtol=1e-10)

    def test_batched(self):
        x = jnp.linspace(-1.0, 5.0, 50)
        y = np.asarray(interp1d_c1(x, XP, FP))
        assert y.shape == (50,)
        assert np.all(np.isfinite(y))

    def test_two_point_table_falls_back_to_linear(self):
        xp = np.array([0.0, 1.0])
        fp = np.array([1.0, 3.0])
        np.testing.assert_allclose(float(interp1d_c1(jnp.asarray(0.25), xp, fp)), 1.5)
