"""Hyperparameter search (SURVEY.md §2.8): on-device grid sweep plus an
in-process GP/expected-improvement loop — the two halves of what the
reference outsourced to Spearmint."""

from mjhmc_tpu.search.grid import grid_search, SearchResult
from mjhmc_tpu.search.bayes import bayes_search, bayes_minimize, BayesResult

__all__ = [
    "grid_search",
    "SearchResult",
    "bayes_search",
    "bayes_minimize",
    "BayesResult",
]
