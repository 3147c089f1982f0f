"""Legendre-Gauss-Radau (flipped) collocation basis.

Host-side NumPy/SciPy construction — node counts are static per problem, so
these run once at problem-build time and the results are baked into the
compiled program as constants.

The reference builds the same objects with nested Python loops over Lagrange
basis derivatives (/root/reference/lib/PSfunctions.py:149-208); here the
differentiation matrix comes from the standard barycentric formulation, which
is O(n²), numerically stable, and easier to test for polynomial exactness.
"""

import numpy as np
from scipy import special


def lgr_nodes(n, reverse=True):
    """Flipped LGR points: roots of P_{n-1} + P_n shifted to (-1, 1].

    ``reverse=True`` (the variant the reference uses at runtime,
    lib/PSfunctions.py:149-168) includes +1 and excludes -1.
    """
    if n < 2:
        raise ValueError("LGR requires n >= 2")
    roots, _ = special.roots_jacobi(n - 1, 0.0, 1.0)
    nodes = np.concatenate(([-1.0], roots))
    return np.sort(-nodes) if reverse else nodes


def lgr_weights(n):
    """LGR quadrature weights for the flipped nodes (Σw = 2).

    w_i = (1 - τ̃_i) / (n² P_{n-1}(τ̃_i)²) evaluated on the *unflipped*
    nodes τ̃ = -flip(τ) (parity: lib/PSfunctions.py:171-179).
    """
    nodes_std = -lgr_nodes(n)[::-1]  # standard (includes -1) ordering
    Pn1 = special.eval_legendre(n - 1, nodes_std)
    w_std = (1.0 - nodes_std) / (n * n * Pn1 * Pn1)
    return w_std[::-1].copy()


def _barycentric_weights(x):
    """Barycentric weights w_j = 1 / Π_{m≠j}(x_j - x_m)."""
    diff = x[:, None] - x[None, :]
    np.fill_diagonal(diff, 1.0)
    return 1.0 / diff.prod(axis=1)


def differentiation_matrix(x_all, x_eval_idx):
    """Rows of the Lagrange differentiation matrix at selected support points.

    Given support points ``x_all`` (n+1,), returns D with
    ``D[k, i] = L_i'(x_all[x_eval_idx[k]])`` using the barycentric identities
    ``L_i'(x_k) = (w_i / w_k) / (x_k - x_i)`` for i ≠ k and
    ``L_k'(x_k) = -Σ_{i≠k} L_i'(x_k)``.
    """
    x = np.asarray(x_all, dtype=float)
    w = _barycentric_weights(x)
    n1 = x.size
    dx = x[:, None] - x[None, :]
    np.fill_diagonal(dx, 1.0)
    Dfull = (w[None, :] / w[:, None]) / dx
    np.fill_diagonal(Dfull, 0.0)
    np.fill_diagonal(Dfull, -Dfull.sum(axis=1))
    return Dfull[np.asarray(x_eval_idx)]


def lgr_diff_matrix(n, reverse=True):
    """LGR differentiation matrix, shape (n, n+1).

    Support points are the n collocation nodes plus the non-collocated
    endpoint (−1 for reverse/flipped, +1 otherwise); rows evaluate the
    derivative at the collocation nodes (parity: lib/PSfunctions.py:182-208).
    """
    tau = lgr_nodes(n, reverse)
    if reverse:
        x_all = np.concatenate(([-1.0], tau))
        eval_idx = np.arange(1, n + 1)
    else:
        x_all = np.concatenate((tau, [1.0]))
        eval_idx = np.arange(n)
    return differentiation_matrix(x_all, eval_idx)


# --- LGL / LG basis variants -------------------------------------------
#
# The reference also ships Legendre-Gauss-Lobatto and Legendre-Gauss
# machinery (lib/PSfunctions.py:91-146); its runtime uses only the flipped
# LGR above, but the variants are part of the component surface and useful
# for method studies (LGL includes both endpoints; LG neither).


def lgl_nodes(n):
    """Legendre-Gauss-Lobatto points: ±1 plus the roots of P'_{n-1}.

    P'_{n-1} is proportional to the degree-(n-2) Jacobi(1,1) polynomial,
    so its roots come straight from the Golub-Welsch solver.
    """
    if n < 2:
        raise ValueError("LGL requires n >= 2")
    if n == 2:
        return np.array([-1.0, 1.0])
    interior, _ = special.roots_jacobi(n - 2, 1.0, 1.0)
    return np.concatenate(([-1.0], interior, [1.0]))


def lgl_weights(n):
    """LGL quadrature weights w_i = 2 / (n(n-1) P_{n-1}(x_i)²), Σw = 2."""
    x = lgl_nodes(n)
    Pn1 = special.eval_legendre(n - 1, x)
    return 2.0 / (n * (n - 1) * Pn1 * Pn1)


def lgl_diff_matrix(n):
    """LGL differentiation matrix, shape (n, n): all nodes collocated."""
    x = lgl_nodes(n)
    return differentiation_matrix(x, np.arange(n))


def lg_nodes(n):
    """Legendre-Gauss points: the n roots of P_n (both endpoints excluded)."""
    if n < 1:
        raise ValueError("LG requires n >= 1")
    nodes, _ = special.roots_legendre(n)
    return nodes


def lg_weights(n):
    """Gauss-Legendre quadrature weights (exact through degree 2n−1)."""
    _, w = special.roots_legendre(n)
    return w


def lg_diff_matrix(n):
    """LG differentiation matrix, shape (n, n+1).

    As with LGR, pseudospectral LG transcription carries the non-collocated
    initial point −1 in the state support; rows evaluate the derivative at
    the n interior Gauss nodes.
    """
    x_all = np.concatenate(([-1.0], lg_nodes(n)))
    return differentiation_matrix(x_all, np.arange(1, n + 1))
