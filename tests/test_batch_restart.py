"""Lane divergence-restart (gelato_tpu.batch.reset_diverged).

The batch-robustness twin of the reference's continue-on-failure batch loop
(/root/reference/run_batch.sh:75-79): instead of abandoning a wedged case,
its lane is rolled back to the start state between scan chunks to redo its
own mu-ladder while healthy lanes continue untouched.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gelato_tpu.batch import reset_diverged  # noqa: E402
from gelato_tpu.solver.ip import FusedState, IPState  # noqa: E402


def _states(err, z):
    B, n = z.shape
    zeros = jnp.zeros((B,))
    ip = IPState(
        z=jnp.asarray(z), s=jnp.ones((B, 3)), yE=jnp.zeros((B, 2)),
        lam=jnp.ones((B, 3)), zL=jnp.ones((B, n)), zU=jnp.ones((B, n)),
        mu=jnp.full((B,), 1e-3), delta_w=zeros, nu=zeros,
        err0=jnp.asarray(err), alpha=jnp.ones((B,)),
        it=jnp.zeros((B,), jnp.int64), converged=jnp.zeros((B,), bool))
    mem = 4
    return FusedState(
        ip=ip, S=jnp.zeros((B, mem, n)), Y=jnp.zeros((B, mem, n)),
        count=jnp.zeros((B,), jnp.int64), acc_run=jnp.zeros((B,), jnp.int64),
        filt_tb=jnp.full((B, 8), jnp.inf), filt_pb=jnp.full((B, 8), jnp.inf),
        filt_idx=jnp.zeros((B,), jnp.int64),
        theta_max=jnp.full((B,), 1e4), theta_min=jnp.full((B,), 1e-4))


def test_reset_diverged_rolls_back_only_bad_lanes():
    z_ref = np.zeros((4, 5))
    z_cur = np.arange(20.0).reshape(4, 5)
    ref = _states(np.full(4, 1.0), z_ref)
    cur = _states(np.array([1e-3, 5e3, np.nan, 2.0]), z_cur)
    err_ref = jnp.ones(4)

    out, bad = reset_diverged(cur, ref, err_ref, factor=100.0)
    np.testing.assert_array_equal(np.asarray(bad),
                                  [False, True, True, False])
    # bad lanes take the reference state wholesale
    np.testing.assert_array_equal(np.asarray(out.ip.z[1]), z_ref[1])
    np.testing.assert_array_equal(np.asarray(out.ip.z[2]), z_ref[2])
    assert float(out.ip.err0[1]) == 1.0
    # good lanes pass through untouched (including scalar leaves)
    np.testing.assert_array_equal(np.asarray(out.ip.z[0]), z_cur[0])
    np.testing.assert_array_equal(np.asarray(out.ip.z[3]), z_cur[3])
    assert float(out.ip.err0[3]) == 2.0


def test_reset_diverged_catches_wedged_lane():
    """A lane whose KKT error is bit-identical across a chunk and not
    converged is wedged (alpha=0 stall) and must restart; a converged lane
    with an unchanged error must NOT."""
    z_ref = np.zeros((3, 5))
    z_cur = np.arange(15.0).reshape(3, 5)
    ref = _states(np.full(3, 1.0), z_ref)
    cur = _states(np.array([0.902, 0.5, 1e-7]), z_cur)
    cur = cur._replace(ip=cur.ip._replace(
        converged=jnp.array([False, False, True])))
    err_prev = jnp.array([0.902, 0.7, 1e-7])  # lane 0 unchanged, lane 1 fell

    out, bad = reset_diverged(cur, ref, jnp.ones(3), factor=100.0,
                              err_prev=err_prev)
    np.testing.assert_array_equal(np.asarray(bad), [True, False, False])
    np.testing.assert_array_equal(np.asarray(out.ip.z[0]), z_ref[0])
    np.testing.assert_array_equal(np.asarray(out.ip.z[1]), z_cur[1])
    np.testing.assert_array_equal(np.asarray(out.ip.z[2]), z_cur[2])


def test_reset_diverged_noop_when_healthy():
    z = np.random.default_rng(0).normal(size=(3, 4))
    ref = _states(np.full(3, 1.0), np.zeros((3, 4)))
    cur = _states(np.array([1e-6, 3.0, 50.0]), z)
    out, bad = reset_diverged(cur, ref, jnp.ones(3), factor=100.0)
    assert not bool(np.asarray(bad).any())
    np.testing.assert_array_equal(np.asarray(out.ip.z), z)


def test_force_stalled_mu_per_lane_gates():
    """Per-lane μ watchdog: only a stalled + unconverged + grinding lane
    (err0 ≤ 1) above μ_min gets the forced rung + filter reset."""
    from gelato_tpu.batch import force_stalled_mu
    from gelato_tpu.solver import IPOptions

    opts = IPOptions(mu_force_after=50)
    # lanes: 0 stalled+grinding → force; 1 not stalled long enough;
    # 2 stalled but diverging (err 1e4) → blocked; 3 stalled but converged
    st = _states(np.array([1e-3, 1e-3, 1e4, 1e-7]), np.zeros((4, 5)))
    st = st._replace(
        ip=st.ip._replace(converged=jnp.array([False, False, False, True])),
        filt_idx=jnp.array([3, 3, 3, 3], jnp.int64),
        filt_tb=jnp.full((4, 8), 0.5))
    stall = jnp.array([80, 40, 80, 80], jnp.int32)

    out, forced = force_stalled_mu(st, stall, opts)
    np.testing.assert_array_equal(np.asarray(forced),
                                  [True, False, False, False])
    rung = max(opts.mu_min, min(opts.kappa_mu * 1e-3, 1e-3 ** opts.theta_mu))
    assert float(out.ip.mu[0]) == pytest.approx(rung)
    np.testing.assert_array_equal(np.asarray(out.ip.mu[1:]),
                                  np.full(3, 1e-3))
    # forced lane's filter is reset, the others' untouched
    assert np.isinf(np.asarray(out.filt_tb[0])).all()
    assert int(out.filt_idx[0]) == 0
    np.testing.assert_array_equal(np.asarray(out.filt_tb[1]),
                                  np.full(8, 0.5))
    assert int(out.filt_idx[1]) == 3


def test_force_stalled_mu_respects_mu_min():
    from gelato_tpu.batch import force_stalled_mu
    from gelato_tpu.solver import IPOptions

    opts = IPOptions(mu_force_after=50)
    st = _states(np.array([1e-3, 1e-3]), np.zeros((2, 5)))
    st = st._replace(ip=st.ip._replace(
        mu=jnp.array([opts.mu_min, 1e-3]),
        converged=jnp.array([False, False])))
    out, forced = force_stalled_mu(st, jnp.array([100, 100], jnp.int32),
                                   opts)
    np.testing.assert_array_equal(np.asarray(forced), [False, True])
    assert float(out.ip.mu[0]) == opts.mu_min
