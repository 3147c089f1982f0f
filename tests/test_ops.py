"""Golden-value and property tests for the pure-JAX ops layer."""

import numpy as np
import pytest

import gelato_tpu.ops as ops
import reference_impl as ref

RNG = np.random.default_rng(0)


def rand_quat(n=None):
    q = RNG.normal(size=(4,) if n is None else (n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_quatmult_matches_scalar(self):
        q, p = rand_quat(), rand_quat()
        np.testing.assert_allclose(ops.quatmult(q, p), ref.quatmult(q, p), atol=1e-14)

    def test_quatrot_matches_scalar(self):
        for _ in range(5):
            q = rand_quat()
            v = RNG.normal(size=3) * 100.0
            np.testing.assert_allclose(ops.quatrot(q, v), ref.quatrot(q, v), atol=1e-10)

    def test_quatrot_batched(self):
        q = rand_quat(7)
        v = RNG.normal(size=(7, 3))
        out = np.asarray(ops.quatrot(q, v))
        for i in range(7):
            np.testing.assert_allclose(out[i], ref.quatrot(q[i], v[i]), atol=1e-10)

    def test_rot_roundtrip(self):
        q = rand_quat()
        v = RNG.normal(size=3)
        np.testing.assert_allclose(
            ops.quatrot_inv(q, ops.quatrot(q, v)), v, atol=1e-12
        )

    def test_dcm_consistency(self):
        q = rand_quat()
        v = RNG.normal(size=3)
        # frame transformation: C @ v == quatrot(q, v)
        np.testing.assert_allclose(
            np.asarray(ops.dcm_from_quat(q)) @ v, ops.quatrot(q, v), atol=1e-12
        )

    def test_dcm_quat_roundtrip(self):
        q = rand_quat()
        q = q * np.sign(q[0])  # canonical hemisphere
        q2 = ops.quat_from_dcm(ops.dcm_from_quat(q))
        np.testing.assert_allclose(q2, q, atol=1e-10)

    def test_euler_roundtrip(self):
        q = ops.quat_from_euler(87.0, 35.0, -4.0)
        az, el, ro = np.asarray(ops.euler_from_quat(q))
        np.testing.assert_allclose([az, el, ro], [87.0, 35.0, -4.0], atol=1e-9)


class TestEarth:
    def test_geodetic_roundtrip(self):
        lat, lon, alt = 42.50587, 143.45659, 50.0
        ecef = ops.geodetic2ecef(lat, lon, alt)
        np.testing.assert_allclose(ecef, ref.geodetic2ecef(lat, lon, alt), rtol=1e-12)
        llh = np.asarray(ops.ecef2geodetic(ecef))
        np.testing.assert_allclose(llh, [lat, lon, alt], atol=1e-6)

    def test_eci_ecef_roundtrip(self):
        v = RNG.normal(size=3) * 7e6
        t = 321.5
        np.testing.assert_allclose(ops.ecef2eci(v, t), ref.ecef2eci(v, t), rtol=1e-12)
        np.testing.assert_allclose(
            ops.eci2ecef(ops.ecef2eci(v, t), t), v, atol=1e-6
        )

    def test_velocity_transform(self):
        pos = ref.geodetic2ecef(42.5, 143.4, 1000.0)
        vel = np.array([100.0, -50.0, 30.0])
        t = 77.0
        np.testing.assert_allclose(
            ops.vel_ecef2eci(vel, pos, t), ref.vel_ecef2eci(vel, pos, t), rtol=1e-10
        )
        # roundtrip
        pos_eci = ref.ecef2eci(pos, t)
        v_eci = ref.vel_ecef2eci(vel, pos, t)
        np.testing.assert_allclose(
            ops.vel_eci2ecef(v_eci, pos_eci, t), vel, atol=1e-8
        )

    def test_ned_quat_points_down(self):
        """NED z-axis at the launch site must point along -ellipsoid normal."""
        pos = ref.geodetic2ecef(42.50587, 143.45659, 50.0)
        q = ops.quat_ecef2nedg(pos)
        # transform the geodetic up-vector (ECEF) into NED: expect [0,0,-1]
        lat, lon = np.radians(42.50587), np.radians(143.45659)
        up = np.array(
            [np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)]
        )
        ned = np.asarray(ops.quatrot(q, up))
        np.testing.assert_allclose(ned, [0.0, 0.0, -1.0], atol=1e-9)

    def test_quat_eci2nedg_consistency(self):
        pos_eci = ref.ecef2eci(ref.geodetic2ecef(42.5, 143.4, 100.0), 55.0)
        q = ops.quat_eci2nedg(pos_eci, 55.0)
        assert abs(np.linalg.norm(np.asarray(q)) - 1.0) < 1e-12

    def test_vincenty_against_scalar(self):
        cases = [
            (42.50587, 143.45659, 42.6, 145.0),
            (0.0, 0.0, 0.0, 90.0),
            (35.0, 139.0, 34.0, 118.0),
            (42.0, 143.0, 43.5, 143.0001),  # near-meridian
        ]
        for la1, lo1, la2, lo2 in cases:
            got = float(ops.distance_vincenty(la1, lo1, la2, lo2))
            want = ref.vincenty(la1, lo1, la2, lo2)
            np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_vincenty_equator_quarter(self):
        # quarter of the equatorial circumference
        got = float(ops.distance_vincenty(0.0, 0.0, 0.0, 90.0))
        np.testing.assert_allclose(got, np.pi / 2 * 6378137.0, rtol=1e-9)


class TestAtmosphere:
    ALTS = [0.0, 500.0, 5e3, 11.5e3, 25e3, 40e3, 49e3, 60e3, 80e3, 88e3, 95e3, 115e3, 150e3, 400e3]

    def test_temperature(self):
        for z in self.ALTS:
            h = ref.geopotential_altitude(z)
            np.testing.assert_allclose(
                float(ops.airtemperature_at(h)), ref.temperature(h), rtol=1e-12
            )

    def test_pressure_density_sound(self):
        for z in self.ALTS:
            h = ref.geopotential_altitude(z)
            np.testing.assert_allclose(
                float(ops.airpressure_at(h)), ref.pressure(h), rtol=1e-12
            )
            np.testing.assert_allclose(
                float(ops.airdensity_at(h)), ref.density(h), rtol=1e-12
            )
            np.testing.assert_allclose(
                float(ops.speed_of_sound(h)), ref.speed_of_sound(h), rtol=1e-12
            )

    def test_sea_level_values(self):
        np.testing.assert_allclose(float(ops.airtemperature_at(0.0)), 288.15)
        np.testing.assert_allclose(float(ops.airpressure_at(0.0)), 101325.0)
        np.testing.assert_allclose(float(ops.airdensity_at(0.0)), 1.225, rtol=1e-3)
        np.testing.assert_allclose(float(ops.speed_of_sound(0.0)), 340.29, rtol=1e-3)

    def test_vectorized(self):
        h = np.asarray(self.ALTS)
        batch = np.asarray(ops.airdensity_at(h))
        singles = [float(ops.airdensity_at(z)) for z in self.ALTS]
        np.testing.assert_allclose(batch, singles, rtol=1e-14)


class TestGravity:
    def test_egm96_matches_scalar(self):
        for _ in range(5):
            pos = RNG.normal(size=3)
            pos = pos / np.linalg.norm(pos) * RNG.uniform(6.4e6, 7.0e6)
            np.testing.assert_allclose(
                ops.gravityECI(pos), ref.gravity_egm96(pos), rtol=1e-12
            )

    def test_surface_magnitude(self):
        g = np.asarray(ops.gravityECI(np.array([6378137.0, 0.0, 0.0])))
        assert 9.7 < np.linalg.norm(g) < 9.9


class TestOrbital:
    def test_circular_orbit(self):
        r = np.array([6578137.0, 0.0, 0.0])
        v_circ = np.sqrt(ref.MU / 6578137.0)
        v = np.array([0.0, v_circ, 0.0])
        elem = np.asarray(ops.orbital_elements(r, v))
        np.testing.assert_allclose(elem[0], 6578137.0, rtol=1e-9)  # a
        np.testing.assert_allclose(elem[1], 0.0, atol=1e-9)  # e
        np.testing.assert_allclose(elem[2], 0.0, atol=1e-6)  # inc

    def test_energy_momentum_targets(self):
        # terminal-condition helpers agree with direct orbital state
        ha = hp = 200000.0
        r = 6378137.0 + 200000.0
        v = np.sqrt(ref.MU / r)
        c = float(ops.angular_momentum_from_altitude(ha, hp))
        e = float(ops.orbit_energy_from_altitude(ha, hp))
        np.testing.assert_allclose(c, r * v, rtol=1e-12)
        np.testing.assert_allclose(e, 0.5 * v * v - ref.MU / r, rtol=1e-12)

    def test_elliptic_orbit_elements(self):
        # perigee 200 km, apogee 500 km, inclined 45 deg
        rp, ra = 6378137.0 + 2e5, 6378137.0 + 5e5
        a = (rp + ra) / 2
        vp = np.sqrt(ref.MU * (2 / rp - 1 / a))
        r = np.array([rp, 0.0, 0.0])
        v = vp * np.array([0.0, np.cos(np.radians(45.0)), np.sin(np.radians(45.0))])
        elem = np.asarray(ops.orbital_elements(r, v))
        np.testing.assert_allclose(elem[0], a, rtol=1e-9)
        np.testing.assert_allclose(elem[1], (ra - rp) / (ra + rp), rtol=1e-9)
        np.testing.assert_allclose(elem[2], 45.0, rtol=1e-9)
        np.testing.assert_allclose(float(ops.inclination_rad(r, v)), np.radians(45.0))


class TestAero:
    WIND = np.array([[-1e8, 0.0, 0.0], [0.0, 0.0, 0.0], [5000.0, 10.0, -5.0], [20000.0, 30.0, 2.0]])

    def test_wind_interp(self):
        w = np.asarray(ops.wind_ned(2500.0, self.WIND))
        np.testing.assert_allclose(w, [5.0, -2.5, 0.0], rtol=1e-12)

    def test_aoa_zero_when_aligned(self):
        """Body x-axis along airspeed => AOA 0."""
        pos_ecef = ref.geodetic2ecef(42.5, 143.4, 10000.0)
        t = 0.0
        pos_eci = ref.ecef2eci(pos_ecef, t)
        vel_eci = ref.vel_ecef2eci(np.array([200.0, 0.0, 0.0]), pos_ecef, t)
        # construct quaternion with body-x along air velocity
        va = np.asarray(
            ops.vel_air_eci(pos_eci, vel_eci, t, np.zeros((2, 3)))[0]
        )
        xb = va / np.linalg.norm(va)
        # any frame with x-axis = xb: build via two cross products
        yb = np.cross([0.0, 0.0, 1.0], xb)
        yb /= np.linalg.norm(yb)
        zb = np.cross(xb, yb)
        C = np.stack([xb, yb, zb])
        q = np.asarray(ops.quat_from_dcm(C))
        aoa = float(
            ops.angle_of_attack_all_rad(pos_eci, vel_eci, q, t, np.zeros((2, 3)))
        )
        assert abs(aoa) < 1e-6

    def test_dynamic_pressure_manual(self):
        pos_ecef = ref.geodetic2ecef(42.5, 143.4, 0.0)
        t = 0.0
        pos_eci = ref.ecef2eci(pos_ecef, t)
        vel_eci = ref.vel_ecef2eci(np.array([100.0, 0.0, 0.0]), pos_ecef, t)
        q = float(
            ops.dynamic_pressure_pa(pos_eci, vel_eci, t, np.zeros((2, 3)))
        )
        h = ref.geopotential_altitude(ref.ecef2geodetic(*pos_ecef)[2])
        np.testing.assert_allclose(q, 0.5 * ref.density(h) * 100.0**2, rtol=1e-6)


class TestIIP:
    def _suborbital_state(self):
        pos_ecef = ref.geodetic2ecef(42.5, 143.4, 100000.0)
        up = pos_ecef / np.linalg.norm(pos_ecef)
        east = np.cross([0.0, 0.0, 1.0], up)
        east /= np.linalg.norm(east)
        vel_ecef = 2000.0 * east + 1000.0 * up
        return pos_ecef, vel_ecef

    def test_matches_scalar_reference(self):
        pos, vel = self._suborbital_state()
        want = ref.iip_faa(pos, vel)
        assert want is not None
        got = np.asarray(ops.posLLH_IIP_FAA(pos, vel))
        np.testing.assert_allclose(got[:2], want, rtol=1e-9)

    def test_no_solution_orbital(self):
        # circular orbital velocity -> perigee above surface -> no IIP
        r = 6378137.0 + 400000.0
        pos = np.array([r, 0.0, 0.0])
        v = np.sqrt(ref.MU / r) * 1.0
        # ECEF velocity that yields circular inertial velocity
        vel_ecef = np.array([0.0, v - ref.OMEGA * r, 0.0])
        assert ref.iip_faa(pos, vel_ecef) is None
        got = np.asarray(ops.posLLH_IIP_FAA(pos, vel_ecef, fill_na=False))
        assert np.isnan(got[0]) and np.isnan(got[1])
        got0 = np.asarray(ops.posLLH_IIP_FAA(pos, vel_ecef, fill_na=True))
        np.testing.assert_allclose(got0, 0.0)

    def test_batched(self):
        pos, vel = self._suborbital_state()
        P = np.stack([pos, pos])
        V = np.stack([vel, vel * 1.1])
        out = np.asarray(ops.posLLH_IIP_FAA(P, V))
        for i in range(2):
            want = ref.iip_faa(P[i], V[i])
            np.testing.assert_allclose(out[i, :2], want, rtol=1e-9)


class TestDifferentiability:
    def test_grads_finite(self):
        import jax

        pos_ecef = np.asarray(ref.geodetic2ecef(42.5, 143.4, 50000.0))
        t = 100.0
        pos_eci = np.asarray(ref.ecef2eci(pos_ecef, t))
        vel_eci = np.asarray(ref.vel_ecef2eci(np.array([1500.0, 0.0, 800.0]), pos_ecef, t))
        wind = np.array([[-1e8, 0.0, 0.0], [1e8, 0.0, 0.0]])

        g = jax.grad(lambda p: ops.dynamic_pressure_pa(p, vel_eci, t, wind))(pos_eci)
        assert np.all(np.isfinite(np.asarray(g)))

        g2 = jax.grad(
            lambda p: ops.posLLH_IIP_FAA(
                ops.eci2ecef(p, t), ops.vel_eci2ecef(vel_eci, p, t)
            )[0]
        )(pos_eci)
        assert np.all(np.isfinite(np.asarray(g2)))

        g3 = jax.grad(lambda la: ops.distance_vincenty(42.5, 143.4, la, 145.0))(43.0)
        assert np.isfinite(float(g3))
