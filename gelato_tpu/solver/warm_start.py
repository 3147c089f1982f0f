"""Primal-dual warm start: save/load full IP state.

Replaces the reference's SNOPT pickled work arrays
(/root/reference/Trajectory_Optimization.py:428-452) with a portable .npz of
the complete primal-dual state, valid for any solver build of the same
problem dimensions (dimension mismatch falls back to cold start, matching the
reference's behaviour).
"""

import numpy as np

from .ip import IPState


def save_state(path, st: IPState):
    np.savez(
        path,
        z=np.asarray(st.z), s=np.asarray(st.s), yE=np.asarray(st.yE),
        lam=np.asarray(st.lam), zL=np.asarray(st.zL), zU=np.asarray(st.zU),
        mu=np.asarray(st.mu),
    )


def load_state(path):
    """Returns a dict for ``solve(..., warm=...)`` or None on failure."""
    try:
        d = np.load(path)
        return {k: d[k] for k in ("z", "s", "yE", "lam", "zL", "zU", "mu")}
    except Exception as e:  # noqa: BLE001 - any unreadable state = cold start
        print(f"WARNING: could not load warm-start state ({e}); cold start.")
        return None


def push_warm(warm, mu, s_min=1.0e-6, dual_box=(1.0e-8, 1.0e8)):
    """Warm-start hygiene for *perturbed* problems (IPOPT warm_start_*push).

    A converged state carries complementarity s·λ ≈ mu_old ≈ 1e-9; restarting
    it on dispersed physics at a working barrier (mu ~ 1e-5) makes the first
    Newton steps violently re-center those products.  Re-centering the duals
    host-side instead — s floored, λ = mu/s, bound duals clipped into a
    moderate box — measured 8/8 dispersion-lane re-convergence vs 6/8 for
    the raw overlay (round-3 dryrun diagnosis).  Use for warm starts onto
    *different* problem data; same-problem restarts keep the exact duals.

    Returns a new warm dict (including the re-centered ``mu``).
    """
    lo, hi = dual_box
    s = np.maximum(np.asarray(warm["s"]), s_min)
    return {
        "z": np.asarray(warm["z"]),
        "s": s,
        "yE": np.asarray(warm["yE"]),
        "lam": np.clip(mu / s, lo, hi),
        "zL": np.clip(np.asarray(warm["zL"]), lo, hi),
        "zU": np.clip(np.asarray(warm["zU"]), lo, hi),
        "mu": np.asarray(mu),
    }


def apply_warm(st: IPState, warm) -> IPState:
    """Overlay a saved state onto a freshly initialized one (with dim check)."""
    if warm is None:
        return st
    import jax.numpy as jnp

    if (warm["z"].shape != st.z.shape or warm["s"].shape != st.s.shape
            or warm["yE"].shape != st.yE.shape):
        print("WARNING: warm-start dimensions do not match; cold start.")
        return st
    return st._replace(
        z=jnp.asarray(warm["z"]), s=jnp.asarray(warm["s"]),
        yE=jnp.asarray(warm["yE"]), lam=jnp.asarray(warm["lam"]),
        zL=jnp.asarray(warm["zL"]), zU=jnp.asarray(warm["zU"]),
        mu=jnp.asarray(warm["mu"]),
    )
