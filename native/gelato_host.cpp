// GELATO-TPU native host runtime: C-ABI kernels for the CPU-side paths.
//
// The reference implements its hot math twice (Python + C++/Eigen pybind11
// modules, /root/reference/src/).  In this rebuild the accelerator path is
// pure JAX; this library is the *host* twin: a dependency-free C++17
// implementation of the same physics used for (a) independent cross-checks
// of the JAX kernels in the test suite and (b) fast JAX-free
// post-processing (batch CSV scoring, IIP ground tracks).  Exposed through a
// plain C ABI for ctypes (no pybind11 in this environment).
//
// All formulas follow the public models (WGS84, US Standard Atmosphere 1976,
// FAA IIP methodology, Vincenty inverse); implementations are original.

#include <cmath>
#include <cstddef>
#include <cstdint>

namespace {

constexpr double kA = 6378137.0;                  // WGS84 semi-major axis
constexpr double kF = 1.0 / 298.257223563;        // flattening
constexpr double kB = kA * (1.0 - kF);            // semi-minor axis
constexpr double kE2 = (kA * kA - kB * kB) / (kA * kA);
constexpr double kEp2 = (kA * kA - kB * kB) / (kB * kB);
constexpr double kOmega = 7.2921151467e-5;        // Earth rotation [rad/s]
constexpr double kMu = 3.986004418e14;            // GM [m^3/s^2]
constexpr double kBarC20 = -0.484165371736e-3;    // EGM96 normalized C20

// --- US Standard Atmosphere 1976 tables ---
constexpr int kLayers = 11;
constexpr double kHb[kLayers] = {0.0, 11000.0, 20000.0, 32000.0, 47000.0,
                                 51000.0, 71000.0, 86000.0, 91000.0,
                                 110000.0, 120000.0};
constexpr double kLmb[kLayers] = {-0.0065, 0.0, 0.001, 0.0028, 0.0,
                                  -0.0028, -0.002, 0.0, 0.0025, 0.012, 0.012};
constexpr double kTmb[kLayers] = {288.15, 216.65, 216.65, 228.65, 270.65,
                                  270.65, 214.65, 186.8673, 186.8673,
                                  240.0, 360.0};
constexpr double kPb[kLayers] = {101325.0, 22632.0, 5474.9, 868.02, 110.91,
                                 66.939, 3.9564, 0.37338, 0.15381,
                                 7.1042e-3, 2.5382e-3};
constexpr double kMb[kLayers] = {28.9644, 28.9644, 28.9644, 28.9644, 28.9644,
                                 28.9644, 28.9644, 28.9522, 28.89, 27.27,
                                 26.20};
constexpr double kRstar = 8314.32;
constexpr double kG0 = 9.80665;
constexpr double kR0 = 6356766.0;

int us76_layer(double h) {
  int k = 0;
  for (int i = 0; i < kLayers; ++i)
    if (h >= kHb[i]) k = i;
  return k;
}

}  // namespace

extern "C" {

// ---------------- atmosphere ----------------

double gh_geopotential_altitude(double z) {
  return z < 86000.0 ? kR0 * z / (kR0 + z) : z;
}

double gh_temperature(double h) {
  const int k = us76_layer(h);
  if (h <= 91000.0) return kTmb[k] + kLmb[k] * (h - kHb[k]);
  if (h <= 110000.0) {
    const double x = (h - 91000.0) / -19942.9;
    return 263.1905 - 76.3232 * std::sqrt(1.0 - x * x);
  }
  if (h <= 120000.0) return kTmb[k] + kLmb[k] * (h - kHb[k]);
  const double xi = (h - kHb[k]) * (kR0 + kHb[k]) / (kR0 + h);
  return 1000.0 - (1000.0 - kTmb[k]) * std::exp(-0.01875e-3 * xi);
}

double gh_pressure(double h) {
  const int k = us76_layer(h);
  const double R = kRstar / kMb[k];
  if (std::abs(kLmb[k]) > 1.0e-6)
    return kPb[k] * std::pow((kTmb[k] + kLmb[k] * (h - kHb[k])) / kTmb[k],
                             -kG0 / kLmb[k] / R);
  return kPb[k] * std::exp(kG0 / R * (kHb[k] - h) / kTmb[k]);
}

double gh_density(double h) {
  return gh_pressure(h) / (kRstar / kMb[us76_layer(h)]) / gh_temperature(h);
}

double gh_speed_of_sound(double h) {
  return std::sqrt(1.4 * (kRstar / kMb[us76_layer(h)]) * gh_temperature(h));
}

void gh_atmosphere_batch(const double* alt_geom, double* t, double* p,
                         double* rho, double* a, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    const double h = gh_geopotential_altitude(alt_geom[i]);
    t[i] = gh_temperature(h);
    p[i] = gh_pressure(h);
    rho[i] = gh_density(h);
    a[i] = gh_speed_of_sound(h);
  }
}

// ---------------- coordinates ----------------

void gh_geodetic2ecef(double lat_deg, double lon_deg, double alt,
                      double* out3) {
  const double lat = lat_deg * M_PI / 180.0;
  const double lon = lon_deg * M_PI / 180.0;
  const double sl = std::sin(lat);
  const double N = kA / std::sqrt(1.0 - kE2 * sl * sl);
  out3[0] = (N + alt) * std::cos(lat) * std::cos(lon);
  out3[1] = (N + alt) * std::cos(lat) * std::sin(lon);
  out3[2] = (N * (1.0 - kE2) + alt) * sl;
}

void gh_ecef2geodetic(const double* p3, double* llh3) {
  const double x = p3[0], y = p3[1], z = p3[2];
  const double p = std::sqrt(x * x + y * y);
  const double th = std::atan2(z * kA, p * kB);
  const double st = std::sin(th), ct = std::cos(th);
  const double lat = std::atan2(z + kEp2 * kB * st * st * st,
                                p - kE2 * kA * ct * ct * ct);
  const double sl = std::sin(lat);
  const double N = kA / std::sqrt(1.0 - kE2 * sl * sl);
  llh3[0] = lat * 180.0 / M_PI;
  llh3[1] = std::atan2(y, x) * 180.0 / M_PI;
  llh3[2] = p / std::cos(lat) - N;
}

void gh_ecef2eci(const double* v3, double t, double* out3) {
  const double c = std::cos(kOmega * t), s = std::sin(kOmega * t);
  out3[0] = v3[0] * c - v3[1] * s;
  out3[1] = v3[0] * s + v3[1] * c;
  out3[2] = v3[2];
}

void gh_eci2ecef(const double* v3, double t, double* out3) {
  const double c = std::cos(kOmega * t), s = std::sin(kOmega * t);
  out3[0] = v3[0] * c + v3[1] * s;
  out3[1] = -v3[0] * s + v3[1] * c;
  out3[2] = v3[2];
}

void gh_gravity_eci(const double* p3, double* g3) {
  const double x = p3[0], y = p3[1], z = p3[2];
  double r = std::sqrt(x * x + y * y + z * z);
  double irx = 0.0, iry = 0.0, irz = 0.0;
  if (r > 0.0) { irx = x / r; iry = y / r; irz = z / r; }
  const double s5 = std::sqrt(5.0);
  const double p20 = s5 * (3.0 * irz * irz - 1.0) * 0.5;
  const double p20d = s5 * 3.0 * irz;
  if (r < kB) r = kB;
  const double ar2 = (kA / r) * (kA / r);
  const double gir =
      -kMu / (r * r) * (1.0 + kBarC20 * ar2 * (3.0 * p20 + irz * p20d));
  const double giz = kMu / (r * r) * ar2 * kBarC20 * p20d;
  g3[0] = gir * irx;
  g3[1] = gir * iry;
  g3[2] = gir * irz + giz;
}

// ---------------- Vincenty inverse distance ----------------

double gh_distance_vincenty(double lat1_deg, double lon1_deg, double lat2_deg,
                            double lon2_deg) {
  const double la1 = lat1_deg * M_PI / 180.0, lo1 = lon1_deg * M_PI / 180.0;
  const double la2 = lat2_deg * M_PI / 180.0, lo2 = lon2_deg * M_PI / 180.0;
  if (la1 == la2 && lo1 == lo2) return 0.0;
  const double U1 = std::atan((1.0 - kF) * std::tan(la1));
  const double U2 = std::atan((1.0 - kF) * std::tan(la2));
  const double dlon = lo2 - lo1;
  double lam = dlon, ss = 0, cs = 0, sig = 0, c2a = 1, c2sm = 0;
  for (int i = 0; i < 200; ++i) {
    const double sl = std::sin(lam), cl = std::cos(lam);
    const double t1 = std::cos(U2) * sl;
    const double t2 = std::cos(U1) * std::sin(U2)
                    - std::sin(U1) * std::cos(U2) * cl;
    ss = std::sqrt(t1 * t1 + t2 * t2);
    if (ss == 0.0) return 0.0;
    cs = std::sin(U1) * std::sin(U2) + std::cos(U1) * std::cos(U2) * cl;
    sig = std::atan2(ss, cs);
    const double sa = std::cos(U1) * std::cos(U2) * sl / ss;
    c2a = 1.0 - sa * sa;
    c2sm = (c2a > 1e-30)
               ? cs - 2.0 * std::sin(U1) * std::sin(U2) / c2a
               : 0.0;
    const double C = kF / 16.0 * c2a * (4.0 + kF * (4.0 - 3.0 * c2a));
    const double prev = lam;
    lam = dlon + (1.0 - C) * kF * sa *
                     (sig + C * ss * (c2sm + C * cs * (-1.0 + 2.0 * c2sm * c2sm)));
    if (std::abs(lam - prev) < 1e-14) break;
  }
  const double u2 = c2a * (kA * kA - kB * kB) / (kB * kB);
  const double Aa = 1.0 + u2 / 16384.0 *
                              (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)));
  const double Bb =
      u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)));
  const double ds =
      Bb * ss *
      (c2sm + 0.25 * Bb *
                  (cs * (-1.0 + 2.0 * c2sm * c2sm) -
                   Bb / 6.0 * c2sm * (-3.0 + 4.0 * ss * ss) *
                       (-3.0 + 4.0 * c2sm * c2sm)));
  return kB * Aa * (sig - ds);
}

// ---------------- FAA IIP ----------------

// Returns 1 on success (lat/lon deg in out2), 0 when no impact point exists.
int gh_iip_faa(const double* pos_ecef, const double* vel_ecef, double* out2) {
  double pos_eci[3], vel_g[3];
  gh_ecef2eci(pos_ecef, 0.0, pos_eci);
  gh_ecef2eci(vel_ecef, 0.0, vel_g);
  // add omega x r
  double vel_eci[3] = {vel_g[0] - kOmega * pos_eci[1],
                       vel_g[1] + kOmega * pos_eci[0], vel_g[2]};
  const double r0 = std::sqrt(pos_eci[0] * pos_eci[0] +
                              pos_eci[1] * pos_eci[1] +
                              pos_eci[2] * pos_eci[2]);
  if (r0 < kB) return 0;
  const double v0 = std::sqrt(vel_eci[0] * vel_eci[0] +
                              vel_eci[1] * vel_eci[1] +
                              vel_eci[2] * vel_eci[2]);
  const double eps_cos = r0 * v0 * v0 / kMu - 1.0;
  if (eps_cos >= 1.0) return 0;
  const double a_t = r0 / (1.0 - eps_cos);
  const double rv = pos_eci[0] * vel_eci[0] + pos_eci[1] * vel_eci[1] +
                    pos_eci[2] * vel_eci[2];
  const double eps_sin = rv / std::sqrt(kMu * a_t);
  const double eps2 = eps_cos * eps_cos + eps_sin * eps_sin;
  if (std::sqrt(eps2) <= 1.0 && a_t * (1.0 - std::sqrt(eps2)) - kA >= 0.0)
    return 0;

  double r_k1 = kB, r_prev = kB, d_cos = 0, d_sin = 0, eps_k_sin = 0;
  double Ek = 0, Fk = 0, Gk = 0;
  for (int i = 0; i < 5; ++i) {
    const double eps_k_cos = (a_t - r_k1) / a_t;
    const double disc = eps2 - eps_k_cos * eps_k_cos;
    if (disc < 0.0) return 0;
    eps_k_sin = -std::sqrt(disc);
    d_cos = (eps_k_cos * eps_cos + eps_k_sin * eps_sin) / eps2;
    d_sin = (eps_k_sin * eps_cos - eps_k_cos * eps_sin) / eps2;
    const double f2 = (d_cos - eps_cos) / (1.0 - eps_cos);
    const double g2 = (d_sin + eps_sin - eps_k_sin) *
                      std::sqrt(a_t * a_t * a_t / kMu);
    Ek = f2 * pos_eci[0] + g2 * vel_eci[0];
    Fk = f2 * pos_eci[1] + g2 * vel_eci[1];
    Gk = f2 * pos_eci[2] + g2 * vel_eci[2];
    const double r_k2 =
        kA / std::sqrt((kE2 / (1.0 - kE2)) * (Gk / r_k1) * (Gk / r_k1) + 1.0);
    r_prev = r_k1;
    r_k1 = r_k2;
  }
  if (std::abs(r_prev - r_k1) > 1.0) return 0;
  const double d_eps = std::atan2(d_sin, d_cos);
  const double t_sec =
      (d_eps + eps_sin - eps_k_sin) * std::sqrt(a_t * a_t * a_t / kMu);
  const double phi_gc = std::asin(Gk / r_k1);
  const double phi = std::atan2(std::tan(phi_gc), 1.0 - kE2);
  const double lam = std::atan2(Fk, Ek) - kOmega * t_sec;
  out2[0] = phi * 180.0 / M_PI;
  out2[1] = lam * 180.0 / M_PI;
  return 1;
}

void gh_iip_batch(const double* pos_ecef, const double* vel_ecef, double* out,
                  int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    double ll[2];
    if (gh_iip_faa(pos_ecef + 3 * i, vel_ecef + 3 * i, ll)) {
      out[2 * i] = ll[0];
      out[2 * i + 1] = ll[1];
    } else {
      out[2 * i] = NAN;
      out[2 * i + 1] = NAN;
    }
  }
}

}  // extern "C"
