"""On-device NLP solvers."""

from .ip import (  # noqa: F401
    IPOptions,
    IPState,
    solve,
    make_pieces,
    init_state,
    ip_iterate,
    relaxed_bounds,
    make_fused_step,
    prebuild_device_loop,
    solve_device,
    FusedState,
)
