"""VI and SMC heads over the shared log-density API (SURVEY.md §2.9)."""
