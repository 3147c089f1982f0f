"""Independent scalar NumPy implementations of the physics formulas.

These serve as the test oracle for the vectorized JAX ops (the reference repo
ships Python mirrors of its C++ kernels for exactly this purpose — see
SURVEY.md §4).  Written directly from the underlying formulas (WGS84, US76,
FAA IIP, Vincenty), scalar and loop-based on purpose: slow but obviously
correct.
"""

import math

import numpy as np

A = 6378137.0
F = 1.0 / 298.257223563
B = A * (1.0 - F)
E2 = (A * A - B * B) / (A * A)
EP2 = (A * A - B * B) / (B * B)
OMEGA = 7.2921151467e-5
MU = 3.986004418e14


def quatmult(q, p):
    w = q[0] * p[0] - q[1] * p[1] - q[2] * p[2] - q[3] * p[3]
    x = q[1] * p[0] + q[0] * p[1] - q[3] * p[2] + q[2] * p[3]
    y = q[2] * p[0] + q[3] * p[1] + q[0] * p[2] - q[1] * p[3]
    z = q[3] * p[0] - q[2] * p[1] + q[1] * p[2] + q[0] * p[3]
    return np.array([w, x, y, z])


def conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def quatrot(q, v):
    vq = np.array([0.0, v[0], v[1], v[2]])
    rq = quatmult(conj(q), quatmult(vq, q))
    return rq[1:4]


def ecef2geodetic(x, y, z):
    p = math.sqrt(x * x + y * y)
    theta = math.atan2(z * A, p * B)
    lat = math.atan2(
        z + EP2 * B * math.sin(theta) ** 3, p - E2 * A * math.cos(theta) ** 3
    )
    lon = math.atan2(y, x)
    N = A / math.sqrt(1.0 - E2 * math.sin(lat) ** 2)
    alt = p / math.cos(lat) - N
    return np.array([math.degrees(lat), math.degrees(lon), alt])


def geodetic2ecef(lat, lon, alt):
    lat, lon = math.radians(lat), math.radians(lon)
    N = A / math.sqrt(1.0 - E2 * math.sin(lat) ** 2)
    return np.array(
        [
            (N + alt) * math.cos(lat) * math.cos(lon),
            (N + alt) * math.cos(lat) * math.sin(lon),
            (N * (1.0 - E2) + alt) * math.sin(lat),
        ]
    )


def ecef2eci(v, t):
    c, s = math.cos(OMEGA * t), math.sin(OMEGA * t)
    return np.array([v[0] * c - v[1] * s, v[0] * s + v[1] * c, v[2]])


def eci2ecef(v, t):
    c, s = math.cos(OMEGA * t), math.sin(OMEGA * t)
    return np.array([v[0] * c + v[1] * s, -v[0] * s + v[1] * c, v[2]])


def vel_ecef2eci(vel, pos, t):
    pos_eci = ecef2eci(pos, t)
    return ecef2eci(vel, t) + np.cross([0, 0, OMEGA], pos_eci)


def vel_eci2ecef(vel, pos, t):
    return eci2ecef(vel - np.cross([0, 0, OMEGA], pos), t)


# --- US Standard Atmosphere 1976 ---

HB = [0.0, 11000.0, 20000.0, 32000.0, 47000.0, 51000.0, 71000.0, 86000.0, 91000.0, 110000.0, 120000.0]
LMB = [-0.0065, 0.0, 0.001, 0.0028, 0.0, -0.0028, -0.002, 0.0, 0.0025, 0.012, 0.012]
TMB = [288.15, 216.65, 216.65, 228.65, 270.65, 270.65, 214.65, 186.8673, 186.8673, 240.0, 360.0]
PB = [101325.0, 22632.0, 5474.9, 868.02, 110.91, 66.939, 3.9564, 0.37338, 0.15381, 7.1042e-3, 2.5382e-3]
MB = [28.9644, 28.9644, 28.9644, 28.9644, 28.9644, 28.9644, 28.9644, 28.9522, 28.89, 27.27, 26.20]
RSTAR = 8314.32
G0 = 9.80665
R0 = 6356766.0


def geopotential_altitude(z):
    return R0 * z / (R0 + z) if z < 86000.0 else z


def _us76_layer(h):
    k = 0
    for i in range(len(HB)):
        if h >= HB[i]:
            k = i
    return k


def temperature(h):
    k = _us76_layer(h)
    if h <= 91000.0:
        return TMB[k] + LMB[k] * (h - HB[k])
    elif h <= 110000.0:
        return 263.1905 - 76.3232 * math.sqrt(1.0 - ((h - 91000.0) / -19942.9) ** 2)
    elif h <= 120000.0:
        return TMB[k] + LMB[k] * (h - HB[k])
    else:
        xi = (h - HB[k]) * (R0 + HB[k]) / (R0 + h)
        return 1000.0 - (1000.0 - TMB[k]) * math.exp(-0.01875e-3 * xi)


def pressure(h):
    k = _us76_layer(h)
    R = RSTAR / MB[k]
    if abs(LMB[k]) > 1.0e-6:
        return PB[k] * ((TMB[k] + LMB[k] * (h - HB[k])) / TMB[k]) ** (-G0 / LMB[k] / R)
    return PB[k] * math.exp(G0 / R * (HB[k] - h) / TMB[k])


def density(h):
    return pressure(h) / (RSTAR / MB[_us76_layer(h)]) / temperature(h)


def speed_of_sound(h):
    return math.sqrt(1.4 * (RSTAR / MB[_us76_layer(h)]) * temperature(h))


# --- gravity (EGM96 C20) ---


def gravity_egm96(pos):
    barC20 = -0.484165371736e-3
    x, y, z = pos
    r = math.sqrt(x * x + y * y + z * z)
    irx, iry, irz = (x / r, y / r, z / r) if r > 0 else (0, 0, 0)
    p20 = math.sqrt(5.0) * (3.0 * irz * irz - 1.0) * 0.5
    p20d = math.sqrt(5.0) * 3.0 * irz
    rc = max(r, B)
    g_ir = -MU / rc**2 * (1.0 + barC20 * (A / rc) ** 2 * (3.0 * p20 + irz * p20d))
    g_iz = MU / rc**2 * (A / rc) ** 2 * barC20 * p20d
    return np.array([g_ir * irx, g_ir * iry, g_ir * irz + g_iz])


# --- Vincenty (converged while-loop) ---


def vincenty(lat1, lon1, lat2, lon2):
    la1, lo1, la2, lo2 = map(math.radians, (lat1, lon1, lat2, lon2))
    if lo1 == lo2 and la1 == la2:
        return 0.0
    U1 = math.atan((1.0 - F) * math.tan(la1))
    U2 = math.atan((1.0 - F) * math.tan(la2))
    dlon = lo2 - lo1
    lam = dlon
    for _ in range(5000):
        ss = math.sqrt(
            (math.cos(U2) * math.sin(lam)) ** 2
            + (math.cos(U1) * math.sin(U2) - math.sin(U1) * math.cos(U2) * math.cos(lam)) ** 2
        )
        cs = math.sin(U1) * math.sin(U2) + math.cos(U1) * math.cos(U2) * math.cos(lam)
        sig = math.atan2(ss, cs)
        sa = math.cos(U1) * math.cos(U2) * math.sin(lam) / ss
        c2a = 1.0 - sa * sa
        # equatorial line: c2a == 0 -> cos(2*sigma_m) := 0
        c2sm = cs - 2.0 * math.sin(U1) * math.sin(U2) / c2a if c2a > 1e-30 else 0.0
        Cc = F / 16.0 * c2a * (4.0 + F * (4.0 - 3.0 * c2a))
        lam_prev = lam
        lam = dlon + (1.0 - Cc) * F * sa * (
            sig + Cc * ss * (c2sm + Cc * cs * (-1.0 + 2.0 * c2sm * c2sm))
        )
        if abs(lam - lam_prev) < 1e-14:
            break
    u2 = c2a * (A * A - B * B) / (B * B)
    Aa = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    Bb = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    dsig = Bb * ss * (
        c2sm
        + 0.25
        * Bb
        * (
            cs * (-1.0 + 2.0 * c2sm * c2sm)
            - Bb / 6.0 * c2sm * (-3.0 + 4.0 * ss * ss) * (-3.0 + 4.0 * c2sm * c2sm)
        )
    )
    return B * Aa * (sig - dsig)


# --- FAA IIP (scalar) ---


def iip_faa(pos_ecef, vel_ecef, n_iter=5):
    """Returns (lat_deg, lon_deg) or None when no impact point exists."""
    pos_eci = ecef2eci(pos_ecef, 0.0)
    vel_eci = vel_ecef2eci(vel_ecef, pos_ecef, 0.0)
    r0 = np.linalg.norm(pos_eci)
    if r0 < B:
        return None
    v0 = np.linalg.norm(vel_eci)
    eps_cos = r0 * v0 * v0 / MU - 1.0
    if eps_cos >= 1.0:
        return None
    a_t = r0 / (1.0 - eps_cos)
    eps_sin = float(pos_eci @ vel_eci) / math.sqrt(MU * a_t)
    eps2 = eps_cos**2 + eps_sin**2
    if math.sqrt(eps2) <= 1.0 and a_t * (1.0 - math.sqrt(eps2)) - A >= 0.0:
        return None
    r_k1 = B
    for _ in range(n_iter):
        eps_k_cos = (a_t - r_k1) / a_t
        disc = eps2 - eps_k_cos**2
        if disc < 0:
            return None
        eps_k_sin = -math.sqrt(disc)
        d_cos = (eps_k_cos * eps_cos + eps_k_sin * eps_sin) / eps2
        d_sin = (eps_k_sin * eps_cos - eps_k_cos * eps_sin) / eps2
        f2 = (d_cos - eps_cos) / (1.0 - eps_cos)
        g2 = (d_sin + eps_sin - eps_k_sin) * math.sqrt(a_t**3 / MU)
        Ek = f2 * pos_eci[0] + g2 * vel_eci[0]
        Fk = f2 * pos_eci[1] + g2 * vel_eci[1]
        Gk = f2 * pos_eci[2] + g2 * vel_eci[2]
        r_k2 = A / math.sqrt((E2 / (1.0 - E2)) * (Gk / r_k1) ** 2 + 1.0)
        r_prev = r_k1
        r_k1 = r_k2
    if abs(r_prev - r_k2) > 1.0:
        return None
    d_eps = math.atan2(d_sin, d_cos)
    t_sec = (d_eps + eps_sin - eps_k_sin) * math.sqrt(a_t**3 / MU)
    phi_gc = math.asin(Gk / r_k2)
    phi = math.atan2(math.tan(phi_gc), 1.0 - E2)
    lam = math.atan2(Fk, Ek) - OMEGA * t_sec
    return math.degrees(phi), math.degrees(lam)
