"""Data-parallel block scheduling over TPU device meshes.

Blocks are independent (the reference's only parallelism axis,
src/libbz3.c:845-870); here they shard over chips via jax.sharding.
"""
