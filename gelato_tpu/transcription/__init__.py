"""Pseudospectral transcription: LGR basis and stacked section parameters."""

from .lgr import lgr_nodes, lgr_weights, lgr_diff_matrix  # noqa: F401
from .lgr import lgl_nodes, lgl_weights, lgl_diff_matrix  # noqa: F401
from .lgr import lg_nodes, lg_weights, lg_diff_matrix  # noqa: F401
from .sections import SectionStack  # noqa: F401
