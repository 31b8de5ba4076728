"""Distribution / energy-model base API.

TPU-native analogue of the reference's ``Distribution`` base class
(SURVEY.md §2.1: ``E(X)``, ``dEdX(X)``, ``init_X()``, eval counters over
``(ndims, nbatch)`` batches).

Differences from the reference, by design (SURVEY.md §5, §7):

- Energies are **pure batched functions** of an ``(ndims, nbatch)`` float32
  array; no object-held mutable counters. Gradient-evaluation counting — the
  paper's fairness currency — lives as traced integer accumulators in the
  sampler scan carry instead (see ``samplers.state``), reduced with ``psum``
  across shards when needed.
- Gradients come from one fused forward+VJP (``potential_and_grad``), which
  XLA compiles into a single fusion; concrete distributions override it with
  analytic fused forms where that is cheaper.
- Layout: chains ride the **last** axis so they occupy the 128-wide TPU
  vector lanes even for tiny ``ndims`` (the headline benchmark is 2-D).

``U`` below is the potential energy: target density ``p(x) ∝ exp(-U(x))``.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Distribution:
    """Base energy model.

    Subclasses must set ``ndims`` and implement ``potential``; everything
    else has fused defaults. All methods are pure and jit-safe.
    """

    #: dimensionality of a single chain state
    ndims: int = 0
    #: human-readable registry name
    name: str = "distribution"

    # ---------------------------------------------------------------- energy
    def potential(self, x: Array) -> Array:
        """U(x). ``x``: (..., ndims, nbatch) → (..., nbatch).

        Rank-polymorphic by contract: the state axis is second-to-last and
        the chain axis last, so leading batch axes (e.g. MJHMC's stacked
        forward/backward pair) broadcast through without disturbing the
        chain axis's mesh sharding.
        """
        raise NotImplementedError

    def grad_potential(self, x: Array) -> Array:
        """dU/dx. ``x``: (ndims, nbatch) → (ndims, nbatch)."""
        return self.potential_and_grad(x)[1]

    def potential_and_grad(self, x: Array) -> Tuple[Array, Array]:
        """Fused (U(x), dU/dx) — one forward + one VJP, fused by XLA.

        This is the single hot call of every sampler (SURVEY.md §3.1's inner
        loop); concrete distributions override with analytic versions when
        they beat the VJP.
        """
        u, vjp = jax.vjp(self.potential, x)
        (g,) = vjp(jnp.ones_like(u))
        return u, g

    def logdensity(self, x: Array) -> Array:
        """log p(x) up to a constant = -U(x). Shared API for VI/SMC heads."""
        return -self.potential(x)

    # ---- reference-API aliases (SURVEY.md §2.1 public surface) -----------
    def E(self, x: Array) -> Array:  # noqa: N802 — reference name
        """Alias of :meth:`potential` (the reference's ``E(X)``)."""
        return self.potential(x)

    def dEdX(self, x: Array) -> Array:  # noqa: N802 — reference name
        """Alias of :meth:`grad_potential` (the reference's ``dEdX(X)``)."""
        return self.grad_potential(x)

    def init_X(self, key: Array, nbatch: int) -> Array:  # noqa: N802
        """Alias of :meth:`init_x` (the reference's ``init_X()``)."""
        return self.init_x(key, nbatch)

    # ------------------------------------------------------------------ init
    def init_x(self, key: Array, nbatch: int) -> Array:
        """Draw initial chain states, shape (ndims, nbatch).

        Default: standard normal. Subclasses override with something closer
        to the target's scale. For *burned-in* shared inits (reference's
        ``gen_mj_init``, SURVEY.md §2.6) see ``utils.init_cache``.
        """
        return jax.random.normal(key, (self.ndims, nbatch), jnp.float32)

    # ------------------------------------------------------------- metadata
    def analytic_mean(self) -> Array | None:
        """Exact mean if known (test oracle), shape (ndims,)."""
        return None

    def analytic_var(self) -> Array | None:
        """Exact marginal variances if known (test oracle), shape (ndims,)."""
        return None

    # ---------------------------------------------------------------- hash
    def config_dict(self) -> dict:
        """JSON-serializable config, used for the stable hash."""
        if dataclasses.is_dataclass(self):
            d = {}
            for f in dataclasses.fields(self):
                v = getattr(self, f.name)
                if isinstance(v, (int, float, str, bool, type(None))):
                    d[f.name] = v
                elif isinstance(v, (tuple, list)):
                    d[f.name] = list(v)
            d["__class__"] = type(self).__name__
            return d
        return {"__class__": type(self).__name__, "ndims": self.ndims}

    def stable_hash(self) -> str:
        """Deterministic hash keying cached burn-in states (SURVEY.md §2.6)."""
        blob = json.dumps(self.config_dict(), sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------
_REGISTRY: dict[str, Callable[..., Distribution]] = {}


def register(name: str):
    """Class decorator adding a distribution to the registry."""

    def deco(cls):
        cls.name = name
        _REGISTRY[name] = cls
        return cls

    return deco


def get_distribution(name: str, **kwargs) -> Distribution:
    """Instantiate a registered distribution by name."""
    return _REGISTRY[name](**kwargs)


def registry() -> dict:
    return dict(_REGISTRY)
