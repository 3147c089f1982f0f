"""Batched dispersion studies: vmapped solves sharded over a device mesh.

TPU-native replacement for the reference's serial shell loop
(/root/reference/run_batch.sh:75-79): a stack of dispersed cases advances in
lock-step — every case runs the same compiled IP iteration under ``vmap``,
and the batch axis shards across chips with ``jax.sharding`` so dispersion
studies ride ICI instead of a job queue.

Cases vary **physics**, not just initial guesses: each lane carries its own
``case`` pytree (wind table, axial-force multiplier — see
``Problem.case_nominal``) threaded through every constraint evaluation via
the solver's ``aux`` channel.

Note the restriction inherited from XLA static shapes: all cases in one batch
share the mission structure (events, node counts, constraint layout); the
*data* (wind tables, aero dispersions, initial guesses) varies per case.  For
heterogeneous missions, run one batch per structure (or use batch_cli).
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from .problem import Problem
from .solver.ip import IPOptions, make_fused_step


def _log(msg):
    """Progress/heartbeat lines go to STDERR: bench.py's driver parses the
    last stdout line as JSON, and a mid-run kill must never leave a
    heartbeat as the literal last line of the artifact (ADVICE r4)."""
    print(msg, file=sys.stderr, flush=True)


def _case_funcs(problem: Problem, opts: IPOptions, z0_ref=None,
                colored=False):
    """Two-argument (z, case) problem functions for the aux channel.

    With ``opts.kkt_method == "struct"`` (or ``colored=True``) the dict
    carries the probed structure metadata / compressed Jacobians — the
    structured KKT is what removes the per-lane n² matrices that cap
    on-chip batch sizes (PERF.md round-2 HBM analysis).
    """
    structured = opts.kkt_method == "struct"
    if structured or colored:
        return problem.solver_funcs(colored=colored, structured=structured,
                                    z0=z0_ref)
    return {
        "obj": lambda z, c: problem.objective(z, c),
        "eq": lambda z, c: problem.eq_constraints(z, c),
        "ineq": lambda z, c: problem.ineq_constraints(z, c),
        "_aux": True,
    }


def make_batch_step(problem: Problem, opts: IPOptions = IPOptions(),
                    z0_ref=None, colored=False):
    """(step, state0): vmappable one-iteration step for this problem.

    ``step(fst, case)`` / ``state0(z0, case)`` — vmap over both to give every
    lane its own physics.  ``z0_ref`` (optional) is the reference point for
    gradient-based scaling, shared across all batch lanes (with the nominal
    case).
    """
    lb, ub = problem.bounds()
    return make_fused_step(_case_funcs(problem, opts, z0_ref, colored),
                           lb, ub, opts, z0_scale_ref=z0_ref,
                           aux_example=problem.case_nominal())


def broadcast_cases(problem: Problem, n_cases):
    """Stack the nominal case n_cases times (no dispersion)."""
    nom = problem.case_nominal()
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_cases,) + jnp.shape(x)), nom)


def solve_batch(problem: Problem, z0_batch, opts: IPOptions = IPOptions(),
                cases=None, mesh=None, max_outer=None, log_every=10,
                verbose=True):
    """Solve a batch of cases to convergence.

    ``z0_batch``: [B, n_z] initial guesses.  ``cases``: pytree with leading
    batch axis B (from :func:`dispersion_cases`); None broadcasts the
    nominal case.  When ``mesh`` (a 1-axis jax.sharding.Mesh) is given, the
    batch axis is sharded across its devices.  Runs jitted vmapped IP
    iterations until every lane converges or ``opts.max_iter`` is reached.
    """
    z0_batch = jnp.asarray(z0_batch)
    if cases is None:
        cases = broadcast_cases(problem, z0_batch.shape[0])
    step, state0 = make_batch_step(problem, opts)
    states = jax.vmap(state0)(z0_batch, cases)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def shard(x):
            spec = P(*((mesh.axis_names[0],) + (None,) * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        states = jax.tree.map(shard, states)
        cases = jax.tree.map(shard, cases)

    vstep = jax.jit(jax.vmap(step))

    max_outer = max_outer or opts.max_iter
    for k in range(max_outer):
        states = vstep(states, cases)
        if (k + 1) % log_every == 0:
            done = np.asarray(states.ip.converged)
            if verbose:
                err = np.asarray(states.ip.err0)
                _log(f"batch iter {k+1}: {done.sum()}/{done.size} converged, "
                     f"max err {np.nanmax(err):.3e}")
            if done.all():
                break
    return states


def overlay_warm_batch(problem, states, warm, cases):
    """Overlay one saved primal-dual state onto every lane of a batch
    (the batched twin of solver.warm_start.apply_warm), re-deriving the
    filter's θ caps from each lane's *warm* infeasibility — the cold-state
    caps are orders of magnitude too loose for a near-feasible start and
    admit feasibility-destroying excursions."""
    B = states.ip.z.shape[0]

    def tile(a):
        return jnp.tile(jnp.asarray(a)[None], (B,) + (1,) * np.ndim(a))

    states = states._replace(ip=states.ip._replace(
        z=tile(warm["z"]), s=tile(warm["s"]), yE=tile(warm["yE"]),
        lam=tile(warm["lam"]), zL=tile(warm["zL"]), zU=tile(warm["zU"]),
        # explicit dtype: a weak-typed fill would make the overlaid state's
        # avals differ from the scan carry's and re-lower the whole batched
        # program on the second dispatch (see ip.py state0's note)
        mu=jnp.full((B,), float(warm["mu"]), dtype=states.ip.mu.dtype)))

    @jax.jit
    @jax.vmap
    def lane_theta(z, s, case):
        return (jnp.sum(jnp.abs(problem.eq_constraints(z, case)))
                + jnp.sum(jnp.abs(problem.ineq_constraints(z, case) - s)))

    theta_w = jnp.maximum(1.0, lane_theta(states.ip.z, states.ip.s, cases))
    return states._replace(theta_max=1.0e4 * theta_w,
                           theta_min=1.0e-4 * theta_w)


def reset_diverged(states, states_ref, err_ref, factor=100.0, err_prev=None,
                   allow=None):
    """Lane-wise divergence restart (batch-robustness twin of
    run_batch.sh's continue-on-failure, run_batch.sh:75-79 — but instead of
    abandoning a failed case, the lane restarts its own μ-ladder).

    A lane counts as diverged when its KKT error is non-finite, or exceeds
    both ``factor * err_ref`` (``err_ref``: per-lane *initial* error scale)
    and an absolute floor of 100 — the floor keeps benign transient spikes
    (SOC/μ-drop excursions in the 1e-2..1e1 range) from triggering resets.
    Diverged lanes are rolled back to ``states_ref`` (their start state);
    every other lane passes through untouched.  Globalized IP lanes under
    dispersed physics are chaotic enough that an occasional lane wedges
    (round-3 dryrun diagnosis: the identical lane converges or diverges
    depending on compile-level rounding); a restart from the moderate-μ
    start state reliably re-converges it.

    ``err_prev`` (optional): each lane's KKT error at the PREVIOUS chunk
    boundary.  A lane whose error is bit-identical across a whole chunk and
    not converged is **wedged** (its line search returns α=0 every
    iteration — the deterministic stall signature, e.g. a failed δ_w
    escalation) and is restarted too: it would otherwise burn the remaining
    budget making zero progress (measured: a struct-KKT dispersion lane
    pinned at err=0.902 for 300+ iterations).

    ``allow`` (optional, (B,) bool): lanes eligible for a restart.  The
    escalation policy in :func:`solve_batch_scan` parks a lane after
    ``max_restarts`` — a chronically re-diverging lane otherwise thrashes
    the restart loop for the whole budget (measured: 7 lanes still
    restart-looping at the end of the round-5 B=32 run).

    Returns ``(states, bad_mask)``.
    """
    bad = (~jnp.isfinite(states.ip.err0)) | (
        (states.ip.err0 > factor * err_ref) & (states.ip.err0 > 100.0))
    if err_prev is not None:
        bad = bad | ((states.ip.err0 == err_prev) & ~states.ip.converged)
    if allow is not None:
        bad = bad & allow

    def pick(ref, cur):
        b = bad.reshape(bad.shape + (1,) * (cur.ndim - 1))
        return jnp.where(b, ref, cur)

    return jax.tree.map(pick, states_ref, states), bad


def force_stalled_mu(states, stall_its, opts):
    """Per-lane μ-stall watchdog (batched twin of ``solve_device``'s
    chunk-boundary watchdog, same gates).

    ``stall_its``: (B,) iterations each lane's barrier μ has been unchanged.
    Lanes stalled ≥ ``opts.mu_force_after`` iterations that are unconverged,
    *grinding* (scaled KKT error ≤ 1 — never force a diverging subproblem;
    see ip.py's watchdog notes) and above μ_min get one monotone rung drop
    plus a filter reset — exactly what the on-device drop does, applied
    host-side between dispatches so the compiled batch step's HLO (and its
    warm cache entry) is untouched.

    Returns ``(states, forced_mask)``.
    """
    mu = states.ip.mu
    force = ((stall_its >= opts.mu_force_after)
             & ~states.ip.converged
             & (states.ip.err0 <= 1.0)
             & (mu > opts.mu_min))
    rung = jnp.maximum(opts.mu_min,
                       jnp.minimum(opts.kappa_mu * mu, mu ** opts.theta_mu))
    fb = force[:, None]
    states = states._replace(
        ip=states.ip._replace(mu=jnp.where(force, rung, mu)),
        filt_tb=jnp.where(fb, jnp.inf, states.filt_tb),
        filt_pb=jnp.where(fb, jnp.inf, states.filt_pb),
        filt_idx=jnp.where(force, 0, states.filt_idx))
    return states, force


def prebuild_batch_loop(problem: Problem, opts: IPOptions = IPOptions(),
                        chunk=40, z0_ref=None, colored=False):
    """Build the jitted chunked batch loop once for repeated lane blocks.

    Returns ``(run_chunk, state0)`` for :func:`solve_batch_scan`'s
    ``prebuilt`` parameter — all blocks of a large chunked study then share
    one compiled executable (see PERF.md: a fresh trace costs minutes of
    executable load over the remote-TPU toolchain even on a cache hit).
    """
    step, state0 = make_batch_step(problem, opts, z0_ref=z0_ref,
                                   colored=colored)
    vstep = jax.vmap(step)

    @jax.jit
    def run_chunk(states, cases):
        def body(c, _):
            return vstep(c, cases), None
        return jax.lax.scan(body, states, None, length=chunk)[0]

    return run_chunk, state0


def solve_batch_scan(problem: Problem, z0_batch, opts: IPOptions = IPOptions(),
                     cases=None, mesh=None, chunk=40, callback=None,
                     restart_diverged=True, factor=10.0, warm=None,
                     warm_safe=None, prebuilt=None, verbose=True,
                     phase2_prebuilt=None, phase_switch_err=1.0):
    """Low-dispatch batched solve: ``chunk`` lock-step iterations per device
    round-trip (the batched twin of ``solve_device``).

    ``restart_diverged``: roll wedged lanes back to their start state
    between chunks (see :func:`reset_diverged`).  ``warm``: a (pushed)
    primal-dual state dict overlaid on every lane
    (:func:`overlay_warm_batch`); ``warm_safe``: a more conservative state
    (typically the same state pushed at μ=1e-3) used as the
    divergence-restart target — restarting a deterministic lane onto the
    state it just diverged from would diverge again.

    ``phase2_prebuilt`` enables TWO-PHASE MIXED PRECISION (round-5 B=32
    attribution: the fp64 dense KKT factor is ~85% of the batched step,
    bounded by fp64 *emulation*; the fp32 factor is ~19× but cannot close
    the endgame): run the transient descent on ``prebuilt`` (built with a
    cheap configuration, e.g. struct_factor_dtype="float32") and switch —
    at a chunk boundary, once every unconverged lane's KKT error is below
    ``phase_switch_err`` — to the accurate ``phase2_prebuilt`` loop.  The
    two compiled loops share the state pytree, so the swap is free; the
    switch is per-block (lanes run lock-step in one program).  Lanes keep
    their per-lane μ/filters across the swap."""
    z0_batch = jnp.asarray(z0_batch)
    if cases is None:
        cases = broadcast_cases(problem, z0_batch.shape[0])
    # prebuilt: share ONE jitted loop across repeated calls — every extra
    # trace of the fused step costs minutes of executable load on the
    # remote-TPU toolchain even when the persistent compile cache hits
    run_chunk, state0 = prebuilt if prebuilt is not None else \
        prebuild_batch_loop(problem, opts, chunk=chunk)
    phase = 1 if phase2_prebuilt is not None else 2
    states = jax.vmap(state0)(z0_batch, cases)
    states_safe = None
    if warm is not None:
        if warm_safe is not None:
            states_safe = overlay_warm_batch(problem, states, warm_safe,
                                             cases)
        states = overlay_warm_batch(problem, states, warm, cases)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def shard(x):
            spec = P(*((mesh.axis_names[0],) + (None,) * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        states = jax.tree.map(shard, states)
        if states_safe is not None:
            states_safe = jax.tree.map(shard, states_safe)
        cases = jax.tree.map(shard, cases)

    n_chunks = (opts.max_iter + chunk - 1) // chunk
    states_ref = states_safe if states_safe is not None else states
    # Restart escalation (round-5 B=32 finding: chronically re-diverging
    # lanes thrash the single-ladder restart for the whole budget).  First
    # restart → the conservative μ=1e-3 ladder (states_ref); second →
    # the same primal state with μ raised to 1e-2 and slacks/duals
    # re-centered (an even more cautious ladder); after ``max_restarts``
    # the lane is parked — no further resets, it keeps descending from
    # wherever it is.  All host-side between dispatches: the compiled
    # chunk program (and its committed cache entry) is untouched.
    max_restarts = 3
    n_restarts_lane = jnp.zeros(z0_batch.shape[0], jnp.int32)

    def _escalate(ss):
        ip = ss.ip
        mu2 = jnp.full_like(ip.mu, 1.0e-2)
        s2 = jnp.maximum(ip.s, 1.0e-4)
        lam2 = jnp.clip(mu2[:, None] / s2, 1.0e-8, 1.0e8)
        return ss._replace(ip=ip._replace(mu=mu2, s=s2, lam=lam2))

    states_ref2 = _escalate(states_ref)

    def _per_lane_ref(count):
        esc = count >= 1
        return jax.tree.map(
            lambda a, b: jnp.where(
                esc.reshape(esc.shape + (1,) * (a.ndim - 1)), b, a),
            states_ref, states_ref2)

    err_ref = None
    err_prev = None
    mu_prev = None
    stall_b = None
    for k in range(n_chunks):
        states = run_chunk(states, cases)
        if phase == 1:
            err_u = jnp.where(states.ip.converged, 0.0, states.ip.err0)
            if bool(jnp.all(jnp.isfinite(err_u) & (err_u < phase_switch_err))):
                run_chunk = phase2_prebuilt[0]
                phase = 2
                if verbose:
                    _log(f"batch: phase switch at chunk {k + 1} — all "
                         f"unconverged lanes below {phase_switch_err:g}, "
                         f"continuing on the accurate loop")
        if restart_diverged:
            if err_ref is None:
                # per-lane error scale: the first chunk's end state (by
                # then every lane has evaluated its true KKT error)
                err_ref = jnp.maximum(1.0, states.ip.err0)
            else:
                states, bad = reset_diverged(
                    states, _per_lane_ref(n_restarts_lane), err_ref,
                    factor=factor, err_prev=err_prev,
                    allow=n_restarts_lane < max_restarts)
                n_restarts_lane = n_restarts_lane + bad.astype(jnp.int32)
                if bool(bad.any()) and verbose:
                    _log(f"batch chunk {k}: restarted "
                         f"{int(bad.sum())} diverged/wedged lane(s) "
                         f"(counts {np.asarray(n_restarts_lane).tolist()})")
            err_prev = states.ip.err0
        if opts.mu_force_after > 0:
            # per-lane μ-stall watchdog (see force_stalled_mu); a restarted
            # lane's μ changes, so its stall counter resets naturally
            mu_now = states.ip.mu
            stall_b = (jnp.zeros(mu_now.shape, jnp.int32) if mu_prev is None
                       else jnp.where(mu_now == mu_prev, stall_b + chunk, 0))
            states, forced = force_stalled_mu(states, stall_b, opts)
            if bool(forced.any()) and verbose:
                _log(f"batch chunk {k}: forced a mu rung on "
                     f"{int(forced.sum())} stalled lane(s)")
                stall_b = jnp.where(forced, 0, stall_b)
            mu_prev = states.ip.mu
        if callback is not None:
            callback(k, states)
        # a block is done when every lane is converged OR parked (a
        # 3-restart chronic diverger): measured round-5 blocks ran all 44
        # chunks for the sake of 2-6 parked lanes that never converge —
        # ending the block early returns that wall-clock to the study
        done = bool(jnp.all(states.ip.converged
                            | (n_restarts_lane >= max_restarts)))
        if done and not bool(jnp.all(states.ip.converged)) and verbose:
            _log(f"batch: stopping at chunk {k + 1} — all unconverged "
                 f"lanes are parked chronic divergers")
        # per-chunk heartbeat (host-side print only — the compiled chunk
        # program is untouched): the remote-TPU tunnel can die mid-run with
        # the client RPC sleeping forever at 0 CPU, and a long batched run
        # is otherwise silent for its whole duration; a flushed line per
        # chunk lets an external supervisor distinguish "working" from
        # "hung" by log mtime (the convergence pull above already syncs, so
        # this costs nothing extra)
        if verbose:
            _log(f"batch heartbeat {k + 1}/{n_chunks}: "
                 f"{int(jnp.sum(states.ip.converged))}/"
                 f"{states.ip.z.shape[0]} converged, "
                 f"err max {float(jnp.max(states.ip.err0)):.2e}")
        if done:
            break
    return states


def solve_batch_chunked(problem: Problem, z0_batch,
                        opts: IPOptions = IPOptions(), cases=None, lanes=32,
                        chunk=40, verbose=True, warm=None, warm_safe=None,
                        z0_ref=None, colored=False, prebuilt=None,
                        partial_out=None):
    """Large dispersion batches as sequential on-chip blocks of ``lanes``
    cases each (all blocks reuse ONE compiled program since shapes match).

    This is how a 256-case study runs on one chip whose HBM bounds the
    simultaneous lane count (PERF.md round-2 analysis); with more chips the
    same lanes shard over a Mesh instead.  ``warm``/``warm_safe`` overlay a
    (pushed) nominal solution onto every lane (see
    :func:`solve_batch_scan`).  Returns a dict of stacked per-case results
    (z, converged, iterations, err).
    """
    import time

    z0_batch = np.asarray(z0_batch)
    B = z0_batch.shape[0]
    if cases is None:
        cases = broadcast_cases(problem, B)
    pad = (-B) % lanes
    if pad:  # pad the tail chunk so every chunk compiles to the same shapes
        z0_batch = np.concatenate([z0_batch, z0_batch[-1:].repeat(pad, 0)])
        cases = jax.tree.map(
            lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0), cases)

    if prebuilt is None:
        prebuilt = prebuild_batch_loop(problem, opts, chunk=chunk,
                                       z0_ref=z0_ref, colored=colored)
    # ``partial_out``: caller-owned accumulator filled after EVERY completed
    # block, so a killed long study (SIGTERM from an external timeout) can
    # still be reported from the blocks that finished — a 3-hour 256-case
    # run must degrade to an honest partial artifact, not silence
    out = (partial_out if partial_out is not None
           else {"z": [], "converged": [], "iterations": [], "err": []})
    for a in range(0, B + pad, lanes):
        sl = slice(a, a + lanes)
        sub = jax.tree.map(lambda x: x[sl], cases)
        t0 = time.time()
        states = solve_batch_scan(problem, z0_batch[sl], opts, cases=sub,
                                  chunk=chunk, warm=warm,
                                  warm_safe=warm_safe, prebuilt=prebuilt)
        ip = states.ip
        out["z"].append(np.asarray(ip.z))
        out["converged"].append(np.asarray(ip.converged))
        out["iterations"].append(np.asarray(ip.it))
        out["err"].append(np.asarray(ip.err0))
        if verbose:
            _log(f"batch chunk {a // lanes + 1}/{(B + pad) // lanes}: "
                 f"{out['converged'][-1].sum()}/{lanes} converged "
                 f"({time.time() - t0:.1f}s)")
    res = {k: np.concatenate(v)[:B] for k, v in out.items()}
    return res


def dispersion_cases(problem: Problem, n_cases, sigma_wind=5.0,
                     sigma_ca=0.05, seed=0):
    """Monte-Carlo dispersion: per-case wind tables and axial-force scales.

    Wind dispersion follows the standard per-altitude-band perturbation: each
    case draws independent N/E wind offsets per table row, smoothed over
    adjacent rows so profiles stay physical; the axial-force (CA) multiplier
    models aero uncertainty.  Returns a case pytree with leading axis B.
    """
    rng = np.random.default_rng(seed)
    wind0 = np.asarray(problem.wind)  # [Nw, 3] altitude, north, east
    nw = wind0.shape[0]
    dw = rng.normal(size=(n_cases, nw, 2)) * sigma_wind
    # 3-point smoothing along the altitude axis keeps profiles physical
    kernel = np.array([0.25, 0.5, 0.25])
    dw = np.apply_along_axis(
        lambda a: np.convolve(a, kernel, mode="same"), 1, dw)
    winds = np.tile(wind0, (n_cases, 1, 1))
    winds[:, :, 1:] += dw
    ca_scale = 1.0 + sigma_ca * rng.normal(size=n_cases)
    return {"wind": jnp.asarray(winds),
            "ca_scale": jnp.asarray(np.clip(ca_scale, 0.5, 1.5))}


def initial_guess_batch(problem: Problem, n_cases, sigma=1e-6, seed=0):
    """[B, n_z] initial guesses: nominal + tiny symmetric perturbations."""
    from . import initial_guess as ig

    z0 = np.asarray(ig.initial_guess(problem))
    rng = np.random.default_rng(seed)
    zb = np.tile(z0, (n_cases, 1))
    zb += sigma * rng.normal(size=zb.shape)
    return zb


def wind_dispersion_batch(problem: Problem, n_cases, sigma_speed=5.0, seed=0):
    """(z0_batch, cases) for an n-case wind/aero dispersion study."""
    zb = initial_guess_batch(problem, n_cases, seed=seed)
    cases = dispersion_cases(problem, n_cases, sigma_wind=sigma_speed,
                             seed=seed)
    return zb, cases
