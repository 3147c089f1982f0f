"""Colored (compressed) Jacobians for section-block-sparse constraint systems.

The trajectory NLP's constraint Jacobian is block-sparse: each row touches
only one section's variables (plus the global time block and a handful of
cross-section mass couplings).  A dense ``jacfwd`` pushes n tangents; after
**distance-2 column coloring** (columns sharing no row can share a seed)
only ~max-section-width tangents are needed — ~4× fewer on the example
mesh, ~15× on the 4× refined mesh, and the same factor in batched solves.

This replaces, the TPU-native way, the reference's hand-maintained sparsity
bookkeeping (the ``wrt`` map at /root/reference/Trajectory_Optimization.py:
358-381 and the per-block COO assembly in lib/con_*.py): the sparsity
pattern is *discovered* by probing the AD Jacobian at random points, colored
greedily on the host, and the compressed evaluation + scatter runs jitted.

Pattern safety: the structural pattern is the union over several probe
points (entries that are numerically zero at one point but structurally
nonzero are caught by the other probes); tests assert colored == dense at
independent points.  All masks/colors are static (host NumPy) — shapes and
compiled code do not depend on the values.
"""

import numpy as np

import jax
import jax.numpy as jnp


def jacobian_pattern(fn, z0, n_probes=3, seed=0, tol=0.0, aux=()):
    """Boolean [m, n] structural pattern of ``fn(z, aux)``'s Jacobian.

    Probes dense jacfwd at ``z0`` plus ``n_probes-1`` random perturbations
    and unions the supports (host-side, one-time cost).
    """
    z0 = np.asarray(z0, dtype=np.float64)
    rng = np.random.default_rng(seed)
    pattern = None
    jac = jax.jit(jax.jacfwd(lambda z: fn(z, aux)))
    for k in range(n_probes):
        z = z0 if k == 0 else z0 + rng.normal(size=z0.shape) * (
            1e-3 * np.maximum(1.0, np.abs(z0)))
        J = np.asarray(jac(jnp.asarray(z)))
        sup = np.abs(J) > tol
        pattern = sup if pattern is None else (pattern | sup)
    return pattern


def greedy_color(pattern):
    """Distance-2 greedy column coloring.

    Columns that co-occur in any row conflict.  Returns int [n] color ids.
    Classic Curtis-Powell-Reid compression (the standard FD/AD seed trick).
    """
    m, n = pattern.shape
    rows_of_col = [np.nonzero(pattern[:, j])[0] for j in range(n)]
    # process densest columns first (fewer colors in practice)
    order = np.argsort([-len(r) for r in rows_of_col])
    color = np.full(n, -1, dtype=np.int64)
    # row -> set of colors already present in that row
    row_colors = [set() for _ in range(m)]
    for j in order:
        used = set()
        for r in rows_of_col[j]:
            used |= row_colors[r]
        c = 0
        while c in used:
            c += 1
        color[j] = c
        for r in rows_of_col[j]:
            row_colors[r].add(c)
    return color


def make_colored_jacfwd(fn, pattern, color):
    """Compressed Jacobian function ``jac(z, aux) -> dense [m, n]``.

    Seeds one tangent per color; recovers the dense Jacobian by gathering
    each column's compressed row and masking with the static pattern.
    """
    m, n = pattern.shape
    k = int(color.max()) + 1
    seeds = np.zeros((k, n))
    seeds[color, np.arange(n)] = 1.0
    seeds = jnp.asarray(seeds)
    color_j = jnp.asarray(color)
    mask = jnp.asarray(pattern, dtype=jnp.float64)

    def jac(z, aux=()):
        def jvp_one(s):
            return jax.jvp(lambda w: fn(w, aux), (z,), (s,))[1]

        compressed = jax.vmap(jvp_one)(seeds)  # [k, m]
        # J[r, c] = compressed[color[c], r] where pattern[r, c]
        return compressed[color_j, :].T * mask

    return jac


def colored_jacobian(fn, z0, n_probes=3, seed=0, aux=()):
    """One-call helper: probe → color → compressed jacfwd.

    Returns (jac_fn, info) where info reports the compression.
    """
    pattern = jacobian_pattern(fn, z0, n_probes=n_probes, seed=seed, aux=aux)
    color = greedy_color(pattern)
    jac = make_colored_jacfwd(fn, pattern, color)
    info = dict(n_colors=int(color.max()) + 1, n=pattern.shape[1],
                m=pattern.shape[0],
                nnz=int(pattern.sum()),
                density=float(pattern.mean()))
    return jac, info
