"""Multi-chip / multi-host parallelism (SURVEY.md §2.5 greenfield)."""

from .data_parallel import DataParallel, make_mesh

__all__ = ["DataParallel", "make_mesh"]
