"""Benchmark distributions / energy models (SURVEY.md §2.1-2.2)."""

from mjhmc_tpu.models.base import (
    Distribution,
    get_distribution,
    register,
    registry,
)
from mjhmc_tpu.models.gaussian import Gaussian
from mjhmc_tpu.models.rough_well import RoughWell
from mjhmc_tpu.models.product_of_t import ProductOfT
from mjhmc_tpu.models.sparse_coding import SparseCoding
from mjhmc_tpu.models.mog import GaussianMixture
from mjhmc_tpu.models.funnel import Funnel
from mjhmc_tpu.models.banana import Banana
from mjhmc_tpu.models.logreg import LogisticRegression
from mjhmc_tpu.models.eight_schools import EightSchools

__all__ = [
    "Distribution",
    "get_distribution",
    "register",
    "registry",
    "Gaussian",
    "RoughWell",
    "ProductOfT",
    "SparseCoding",
    "GaussianMixture",
    "Funnel",
    "Banana",
    "LogisticRegression",
    "EightSchools",
]
