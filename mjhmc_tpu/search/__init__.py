"""Hyperparameter search (SURVEY.md §2.8): on-device grid sweep replacing
the reference's external Spearmint loop."""

from mjhmc_tpu.search.grid import grid_search, SearchResult

__all__ = ["grid_search", "SearchResult"]
