"""Pseudospectral transcription: LGR basis and stacked section parameters."""

from .lgr import lgr_nodes, lgr_weights, lgr_diff_matrix  # noqa: F401
from .sections import SectionStack  # noqa: F401
