"""Batched hash-based initializers for the Pallas path.

The axon backend's compiler takes minutes to compile vmapped threefry (a bare
``vmap(jax.random.split)`` at 4096 chains exceeds 8 minutes), which made the
standard :mod:`mcqueens.core.init` path unusable for large pallas/bench runs.
This module produces the same *distributions* (uniform iid heights; identical
deterministic latin/klarner structure) from a murmur3-style integer mixer —
pure int32 elementwise ops that compile instantly at any batch size.

Used only by :mod:`mcqueens.kernels.metropolis_pallas`, whose RNG streams are
already a distinct (documented) family; the jnp kernels keep counter-based
threefry init for reference-comparable reproducibility.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from mcqueens.core.init import _klarner_core_m


def _mix(x):
    """murmur3 finalizer: a high-quality 32-bit integer hash (vectorized)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def uniform_ints(seeds, shape_per_seed, bound: int, salt: int = 0):
    """(C, *shape) integers uniform in [0, bound) from per-chain seeds."""
    seeds = jnp.asarray(seeds, jnp.uint32)
    n = 1
    for s in shape_per_seed:
        n *= s
    idx = jnp.arange(n, dtype=jnp.uint32)
    x = (
        seeds[:, None] * jnp.uint32(0x9E3779B9)
        + idx[None, :] * jnp.uint32(0x61C88647)
        + jnp.uint32(salt)
    )
    r = _mix(x)
    # modulo bias <= bound / 2^32 — negligible for bound <= N^3
    vals = (r % jnp.uint32(bound)).astype(jnp.int32)
    return vals.reshape((seeds.shape[0],) + tuple(shape_per_seed))


def board_init_batch(seeds, N: int, init_mode: str):
    """(C, N, N) int32 initial heights for a batch of chains."""
    C = jnp.asarray(seeds).shape[0]
    ii = jnp.arange(N, dtype=jnp.int32)
    i_g, j_g = jnp.meshgrid(ii, ii, indexing="ij")
    if init_mode == "random":
        return uniform_ints(seeds, (N, N), N)
    if init_mode == "latin":
        h = ((i_g + j_g) % N).astype(jnp.int32)
        return jnp.broadcast_to(h, (C, N, N))
    if init_mode == "klarner":
        if math.gcd(N, 210) == 1:
            h = ((3 * i_g + 5 * j_g) % N).astype(jnp.int32)
            return jnp.broadcast_to(h, (C, N, N))
        M = _klarner_core_m(N)
        core = ((3 * i_g + 5 * j_g) % M).astype(jnp.int32)
        rand = uniform_ints(seeds, (N, N), N, salt=1)
        in_core = (i_g < M) & (j_g < M)
        return jnp.where(in_core[None], core[None], rand)
    raise ValueError(f"Unknown init_mode: {init_mode}")
