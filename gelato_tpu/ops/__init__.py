"""Pure-JAX math kernels (TPU-native equivalents of the reference's C++ layer).

Each submodule replaces one of the five pybind11 modules of the reference
(`coordinate_c`, `USStandardAtmosphere_c`, `dynamics_c`, `utils_c`, `IIP_c`;
see /root/reference/CMakeLists.txt:60-64) with jittable, vmappable,
AD-compatible JAX functions.
"""

from .quaternion import (  # noqa: F401
    quatmult,
    quatconj,
    quatrot,
    quatrot_inv,
    normalize,
    dcm_from_quat,
    quat_from_dcm,
    quat_from_euler,
    euler_from_quat,
)
from .earth import (  # noqa: F401
    ecef2geodetic,
    geodetic2ecef,
    ecef2eci,
    eci2ecef,
    vel_ecef2eci,
    vel_eci2ecef,
    quat_eci2ecef,
    quat_ecef2eci,
    quat_ecef2nedg,
    quat_nedg2ecef,
    quat_eci2nedg,
    quat_nedg2eci,
    quat_nedg2body,
    eci2geodetic,
    distance_vincenty,
)
from .atmosphere import (  # noqa: F401
    geopotential_altitude,
    airtemperature_at,
    airpressure_at,
    airdensity_at,
    speed_of_sound,
)
from .gravity import gravityECI, gravity_j2  # noqa: F401
from .aero import (  # noqa: F401
    wind_ned,
    vel_air_eci,
    angle_of_attack_all_rad,
    angle_of_attack_ab_rad,
    dynamic_pressure_pa,
    q_alpha_pa_rad,
)
from .iip import posLLH_IIP_FAA  # noqa: F401
from .orbital import (  # noqa: F401
    orbital_elements,
    angular_momentum_vec,
    angular_momentum,
    inclination_cosine,
    inclination_rad,
    laplace_vector,
    orbit_energy,
    angular_momentum_from_altitude,
    orbit_energy_from_altitude,
)
