"""Stacked, padded per-section transcription parameters.

The reference keeps per-section LGR data in Python lists and loops over
sections everywhere (/root/reference/lib/SectionParameters.py:30-114 and e.g.
lib/con_dynamics.py:46).  On TPU those loops become a single vmap over a
``[S, n_max, ...]`` stack with node masks; this module builds that stack once
per problem configuration (all shapes static).

Flat-variable index convention (identical to the reference so results map
one-to-one, SectionParameters.py:83-103):
  * controls u have N = Σ nᵢ rows; section i occupies u[ua:ub]
  * states x have M = N + S rows — each section has an extra non-collocated
    initial point; section i occupies x[xa:xb] with xa = ua + i.
"""

from dataclasses import dataclass, field

import numpy as np

from .lgr import lgr_nodes, lgr_weights, lgr_diff_matrix


@dataclass(frozen=True)
class SectionStack:
    """Padded per-section LGR data plus index maps (all NumPy, host-side)."""

    num_nodes: tuple  # (S,) per-section collocation node counts
    n_max: int
    S: int
    N: int  # total collocation nodes
    M: int  # total state nodes (= N + S)
    tau: np.ndarray  # [S, n_max] collocation nodes, padded with +1
    weights: np.ndarray  # [S, n_max] quadrature weights, padded with 0
    D: np.ndarray  # [S, n_max, n_max+1] differentiation matrices, 0-padded
    node_mask: np.ndarray  # [S, n_max] True for real collocation nodes
    x_index: np.ndarray  # [S, n_max+1] flat state-node index per section row
    u_index: np.ndarray  # [S, n_max] flat control-node index per section row
    x_section_starts: np.ndarray = field(default=None)  # [S] index of section-initial state

    @classmethod
    def build(cls, num_nodes):
        num_nodes = tuple(int(n) for n in num_nodes)
        S = len(num_nodes)
        N = sum(num_nodes)
        M = N + S
        n_max = max(num_nodes)

        tau = np.ones((S, n_max))
        weights = np.zeros((S, n_max))
        D = np.zeros((S, n_max, n_max + 1))
        node_mask = np.zeros((S, n_max), dtype=bool)
        x_index = np.zeros((S, n_max + 1), dtype=np.int32)
        u_index = np.zeros((S, n_max), dtype=np.int32)
        starts = np.zeros(S, dtype=np.int32)

        ua = 0
        for i, n in enumerate(num_nodes):
            tau[i, :n] = lgr_nodes(n)
            weights[i, :n] = lgr_weights(n)
            D[i, :n, : n + 1] = lgr_diff_matrix(n)
            node_mask[i, :n] = True
            xa = ua + i
            starts[i] = xa
            # padding repeats the last valid index; all its uses are masked
            x_idx = np.full(n_max + 1, xa + n, dtype=np.int32)
            x_idx[: n + 1] = np.arange(xa, xa + n + 1)
            x_index[i] = x_idx
            u_idx = np.full(n_max, ua + n - 1, dtype=np.int32)
            u_idx[:n] = np.arange(ua, ua + n)
            u_index[i] = u_idx
            ua += n

        return cls(
            num_nodes=num_nodes,
            n_max=n_max,
            S=S,
            N=N,
            M=M,
            tau=tau,
            weights=weights,
            D=D,
            node_mask=node_mask,
            x_index=x_index,
            u_index=u_index,
            x_section_starts=starts,
        )

    def get_index(self, i):
        """(ua, ub, xa, xb, n) for section ``i`` (reference-compatible)."""
        ua = int(sum(self.num_nodes[:i]))
        n = self.num_nodes[i]
        ub = ua + n
        xa = ua + i
        xb = xa + n + 1
        return ua, ub, xa, xb, n

    def time_nodes_x(self, t_knots):
        """State-node times [S, n_max+1]: knot time then affine-mapped τ.

        Works for NumPy or JAX ``t_knots`` of shape (S+1,)
        (parity: SectionParameters.py:77-81).
        """
        to = t_knots[:-1]
        tf = t_knots[1:]
        mid = (tf + to) * 0.5
        half = (tf - to) * 0.5
        t_col = self.tau * half[:, None] + mid[:, None]
        if hasattr(t_col, "at"):  # JAX array
            import jax.numpy as jnp

            return jnp.concatenate([to[:, None], t_col], axis=1)
        return np.concatenate([to[:, None], t_col], axis=1)

    def gather_x(self, flat, width=None):
        """Gather a flat state-node array [M, ...] into [S, n_max+1, ...]."""
        return flat[self.x_index]

    def gather_u(self, flat):
        """Gather a flat control array [N, ...] into [S, n_max, ...]."""
        return flat[self.u_index]

    def scatter_valid_rows(self):
        """Static (section, node) index pairs of all valid collocation rows.

        Used to compact masked per-section residuals [S, n_max, ...] into the
        exact N-row constraint vector in reference ordering.
        """
        sec, node = np.nonzero(self.node_mask)
        return sec.astype(np.int32), node.astype(np.int32)
