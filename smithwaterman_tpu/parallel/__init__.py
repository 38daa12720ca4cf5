"""Multi-chip / multi-host parallelism (SURVEY.md §2.5 greenfield)."""

from .data_parallel import DataParallel, make_mesh
from .multihost import initialize as initialize_multihost
from .seq_tiled import striped_fill

__all__ = ["DataParallel", "make_mesh", "initialize_multihost", "striped_fill"]
