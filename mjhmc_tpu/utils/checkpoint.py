"""Checkpoint / resume of full sampler state (SURVEY.md §5).

The reference only pickled burn-in init states; the build checkpoints the
*entire scan carry* — chain states, caches, counters, adaptation state,
RNG keys — for deterministic resume. Plain ``.npz`` keeps it dependency-
light and byte-stable; arrays are pulled to host once (checkpointing is
rare and off the hot path).

Pytrees are flattened with ``jax.tree_util``; the treedef is NOT serialized
— restore takes an example pytree of the same structure (the normal case:
you can always construct a fresh state) and refills its leaves.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

Array = jax.Array


def save_pytree(path: str, tree: Any) -> None:
    """Save all array leaves of a pytree to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {}
    for i, leaf in enumerate(leaves):
        # jax PRNG keys have an opaque dtype; serialize as raw key data
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
            getattr(leaf, "dtype", None), jax.dtypes.prng_key
        ):
            arrays[f"leaf_{i}__prngkey"] = np.asarray(jax.random.key_data(leaf))
        else:
            arrays[f"leaf_{i}"] = np.asarray(jax.device_get(leaf))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_pytree(path: str, example: Any) -> Any:
    """Load leaves saved by ``save_pytree`` into ``example``'s structure."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(example)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        if f"leaf_{i}__prngkey" in data:
            new_leaves.append(jax.random.wrap_key_data(data[f"leaf_{i}__prngkey"]))
        else:
            arr = data[f"leaf_{i}"]
            new_leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
