"""Cross-validation: C++ host runtime vs JAX ops vs scalar oracle."""

import numpy as np
import pytest

from gelato_tpu import native

import reference_impl as ref

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C native)"
)


class TestNativeVsOracle:
    def test_atmosphere(self):
        alts = [0.0, 500.0, 11.5e3, 49e3, 88e3, 95e3, 150e3]
        T, P, rho, a = native.atmosphere(alts)
        for i, z in enumerate(alts):
            h = ref.geopotential_altitude(z)
            np.testing.assert_allclose(T[i], ref.temperature(h), rtol=1e-12)
            np.testing.assert_allclose(P[i], ref.pressure(h), rtol=1e-12)
            np.testing.assert_allclose(rho[i], ref.density(h), rtol=1e-12)

    def test_coordinates_roundtrip(self):
        ecef = native.geodetic2ecef(42.50587, 143.45659, 50.0)
        np.testing.assert_allclose(
            ecef, ref.geodetic2ecef(42.50587, 143.45659, 50.0), rtol=1e-12)
        llh = native.ecef2geodetic(ecef)
        np.testing.assert_allclose(llh, [42.50587, 143.45659, 50.0], atol=1e-6)

    def test_gravity(self):
        pos = ref.geodetic2ecef(42.5, 143.4, 100000.0)
        np.testing.assert_allclose(
            native.gravity_eci(pos), ref.gravity_egm96(pos), rtol=1e-12)

    def test_vincenty(self):
        got = native.distance_vincenty(42.5, 143.4, 34.0, 118.0)
        np.testing.assert_allclose(got, ref.vincenty(42.5, 143.4, 34.0, 118.0),
                                   rtol=1e-10)

    def test_iip(self):
        pos = ref.geodetic2ecef(42.5, 143.4, 100000.0)
        up = pos / np.linalg.norm(pos)
        east = np.cross([0.0, 0.0, 1.0], up)
        east /= np.linalg.norm(east)
        vel = 2000.0 * east + 1000.0 * up
        got = native.iip_faa(pos, vel)
        want = ref.iip_faa(pos, vel)
        np.testing.assert_allclose(got, want, rtol=1e-12)
        # orbital state: no solution both ways
        r = 6378137.0 + 400000.0
        v_orb = np.array([0.0, np.sqrt(ref.MU / r) - ref.OMEGA * r, 0.0])
        assert native.iip_faa(np.array([r, 0.0, 0.0]), v_orb) is None

    def test_iip_batch_matches_jax(self):
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        from gelato_tpu.ops.iip import posLLH_IIP_FAA

        rng = np.random.default_rng(3)
        pos = np.stack([ref.geodetic2ecef(42.5 + d, 143.4 + d, 80000.0)
                        for d in rng.uniform(-2, 2, 8)])
        up = pos / np.linalg.norm(pos, axis=1, keepdims=True)
        vel = 1800.0 * np.cross([0.0, 0.0, 1.0], up) + 900.0 * up
        got = native.iip_batch(pos, vel)
        want = np.asarray(posLLH_IIP_FAA(pos, vel, fill_na=False))[:, :2]
        np.testing.assert_allclose(got, want, rtol=1e-9)
