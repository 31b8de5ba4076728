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


# ---------------------------------------------------------------------------
# Multi-host-safe checkpointing (SURVEY.md §5 checkpoint row: "checkpoints
# of the full scan carry … deterministic resume" on the POD runtime).
#
# ``save_pytree`` pulls every leaf to one host — correct single-process, but
# on a pod slice the carry leaves are global arrays whose shards live on
# other hosts. Here each process writes exactly ITS addressable shards
# (with shard-index metadata), and resume reassembles global arrays from
# the per-process files via the example pytree's shardings. Shards are
# matched BY INDEX, not device id, so a restart that renumbers devices
# (same topology) still restores correctly.
# ---------------------------------------------------------------------------
def _index_matrix(index: tuple, shape: tuple) -> np.ndarray:
    """Serialize a shard index (tuple of slices) as [[start, stop], ...]."""
    out = np.zeros((len(shape), 2), np.int64)
    for d, (sl, dim) in enumerate(zip(index, shape)):
        out[d, 0] = 0 if sl.start is None else sl.start
        out[d, 1] = dim if sl.stop is None else sl.stop
    return out


def _shard_file(path_prefix: str) -> str:
    return (
        f"{path_prefix}.proc{jax.process_index()}"
        f"of{jax.process_count()}.npz"
    )


def save_sharded_pytree(path_prefix: str, tree: Any) -> str:
    """Per-process shard save; returns this process's file path.

    Each process writes ``<prefix>.proc<i>of<n>.npz`` holding only its
    addressable shards (deduplicated by shard index — replicated leaves
    store one copy per process). PRNG-key leaves are stored as raw key
    data and are assumed replicated (the framework keeps keys unsharded).
    Works unchanged in single-process runs (one file).
    """
    leaves = jax.tree_util.tree_leaves(tree)
    arrays: dict[str, np.ndarray] = {}
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
            getattr(leaf, "dtype", None), jax.dtypes.prng_key
        ):
            arrays[f"leaf_{i}__prngkey"] = np.asarray(
                jax.random.key_data(leaf)
            )
            continue
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            seen = set()
            k = 0
            for sh in leaf.addressable_shards:
                idx = _index_matrix(sh.index, leaf.shape)
                tag = idx.tobytes()
                if tag in seen:
                    continue  # replicated copy on another local device
                seen.add(tag)
                arrays[f"leaf_{i}__s{k}"] = np.asarray(sh.data)
                arrays[f"leaf_{i}__idx{k}"] = idx
                k += 1
        else:
            arr = np.asarray(leaf)
            arrays[f"leaf_{i}__s0"] = arr
            arrays[f"leaf_{i}__idx0"] = _index_matrix(
                tuple(slice(None) for _ in arr.shape), arr.shape
            )
    path = _shard_file(path_prefix)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)
    return path


def load_sharded_pytree(path_prefix: str, example: Any) -> Any:
    """Rebuild global arrays from this process's shard file.

    ``example`` supplies structure, shapes and SHARDINGS (the normal case:
    construct a fresh state under the same mesh). Every addressable
    device's block is looked up by its shard index in the file and placed
    with ``jax.make_array_from_single_device_arrays`` — no host ever
    materializes a non-addressable shard.
    """
    data = np.load(_shard_file(path_prefix))
    leaves, treedef = jax.tree_util.tree_flatten(example)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        if f"leaf_{i}__prngkey" in data:
            key = jax.random.wrap_key_data(data[f"leaf_{i}__prngkey"])
            new_leaves.append(key)
            continue
        blocks: dict[bytes, np.ndarray] = {}
        k = 0
        while f"leaf_{i}__s{k}" in data:
            blocks[data[f"leaf_{i}__idx{k}"].tobytes()] = data[f"leaf_{i}__s{k}"]
            k += 1
        if not isinstance(leaf, jax.Array) or not hasattr(leaf, "sharding"):
            new_leaves.append(jax.numpy.asarray(next(iter(blocks.values()))))
            continue
        sharding = leaf.sharding
        dmap = sharding.devices_indices_map(leaf.shape)
        bufs = []
        for dev in sharding.addressable_devices:
            idx = _index_matrix(dmap[dev], leaf.shape)
            blk = blocks.get(idx.tobytes())
            if blk is None:
                raise KeyError(
                    f"checkpoint {path_prefix!r} has no shard {idx.tolist()} "
                    f"for leaf {i} — saved under a different sharding?"
                )
            bufs.append(jax.device_put(blk, dev))
        new_leaves.append(
            jax.make_array_from_single_device_arrays(
                leaf.shape, sharding, bufs
            )
        )
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
