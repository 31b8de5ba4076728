"""Grid-search harness tests (SURVEY.md §2.8)."""

import numpy as np

from mjhmc_tpu.models import Gaussian
from mjhmc_tpu.search import grid_search


def test_grid_search_prefers_sane_epsilon():
    """Absurdly small ε must lose to a well-scaled one."""
    dist = Gaussian(ndims=4, log_conditioning=1.0)
    res = grid_search(
        dist,
        sampler="mjhmc",
        eps_grid=(0.001, 0.5),
        beta_grid=(0.2,),
        m_grid=(5,),
        num_steps=400,
        nbatch=128,
        nlags=80,
    )
    assert res.best["epsilon"] == 0.5
    by_eps = {r["epsilon"]: r["decay_evals"] for r in res.table}
    assert by_eps[0.5] < by_eps[0.001]


def test_grid_search_control_hmc():
    dist = Gaussian(ndims=2, log_conditioning=1.0)
    res = grid_search(
        dist,
        sampler="control",
        eps_grid=(0.3, 0.8),
        beta_grid=(0.3, 1.0),
        m_grid=(3, 5),
        num_steps=300,
        nbatch=64,
        nlags=60,
    )
    assert len(res.table) == 8
    assert np.isfinite(res.best["decay_evals"])
