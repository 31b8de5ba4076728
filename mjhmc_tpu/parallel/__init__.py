"""Chain-sharded runtime: mesh construction, shardings, collectives."""

from mjhmc_tpu.parallel.mesh import make_chain_mesh, shard_chain_pytree, chain_sharding

__all__ = ["make_chain_mesh", "shard_chain_pytree", "chain_sharding"]
