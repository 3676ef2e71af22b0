"""Device-mesh plumbing: chain parallelism over ICI/DCN.

The reference's only parallelism is independent chains over OS processes with
pickle transport (``experiments.py:513-533``).  The TPU-native equivalent is
a 1-D ``chains`` mesh axis: thousands of vmapped chains per chip, sharded
across devices with ``NamedSharding`` so XLA partitions the (embarrassingly
parallel) scan with zero mid-run communication.  Cross-chip data appears only
at the statistics boundary — ``psum``/``pmean`` reductions of curve stats and
an argmin-gather of the global best board (SURVEY §5.8) — and rides ICI.

Multi-host pods: call :func:`init_distributed` first (wraps
``jax.distributed.initialize``); ``make_mesh`` then spans all global devices
and the same code scales out over DCN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAINS_AXIS = "chains"


def init_distributed(**kwargs):
    """Initialize multi-host JAX (no-op only if already initialized).

    Real failures (bad coordinator address, port in use, mismatched process
    counts, ...) propagate: a misconfigured pod run must abort loudly rather
    than silently continue single-host.  Exercised by the two-process DCN
    check (``tools/check_multihost.py`` / ``tests/test_multihost.py``).
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise


def make_mesh(devices=None, axis_name: str = CHAINS_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices, chains axis only.

    A single chain's state is O(N^2) ints — there is never a reason to shard
    *within* a chain (SURVEY §5.7), so the mesh is one replica axis.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def chain_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the chains axis) over the mesh."""
    return NamedSharding(mesh, P(CHAINS_AXIS))


def shard_chains(tree, mesh: Mesh):
    """Device_put every leaf with axis 0 sharded over the chains axis."""
    return jax.device_put(tree, chain_sharding(mesh))


def pad_chains(n_chains: int, mesh: Mesh | None) -> int:
    """Round the chain count up to a multiple of the mesh size."""
    if mesh is None:
        return n_chains
    d = mesh.devices.size
    return -(-n_chains // d) * d


def pad_seeds_to_blocks(seeds, mesh: Mesh, block_size_fn):
    """Pad a seed list so every device owns whole pallas VMEM blocks.

    The block is sized from ONE device's share (``block_size_fn(per_dev)``)
    and the total is rounded to ``n_dev * k * block`` with distinct
    follow-on seeds (padded lanes are discarded at slice time).  The single
    sizing rule shared by ``dist.runner`` and ``search.tempering``.

    Returns ``(padded_seeds, block)``.
    """
    seeds = np.asarray(seeds, dtype=np.uint32)
    n = seeds.shape[0]
    n_dev = int(mesh.devices.size)
    per_dev = -(-n // n_dev)
    block = block_size_fn(per_dev)
    per_dev = -(-per_dev // block) * block
    total = per_dev * n_dev
    if total > n:
        pad = seeds[-1] + 1 + np.arange(total - n, dtype=np.uint32)
        seeds = np.concatenate([seeds, pad])
    return seeds, block


def shard_segment_fn(fn, carry_type, mesh: Mesh, *, tempered: bool = False):
    """``jit(shard_map(...))`` of a kernel segment fn over the chains mesh.

    ``fn`` is ``(carry, start) -> (carry, ys)`` — or, with ``tempered=True``,
    ``(carry, beta_scale, start) -> (carry, ys)`` where the per-chain beta
    row is sharded alongside the carry.  Every carry leaf shards on axis 0;
    ``ys`` is ``(n_outer, C)`` with chains on axis 1.  Used via per-kernel
    ``functools.cache`` wrappers keyed on (spec, n_outer, mesh).
    """
    carry_specs = carry_type(*([P(CHAINS_AXIS)] * len(carry_type._fields)))
    in_specs = ((carry_specs, P(CHAINS_AXIS), P()) if tempered
                else (carry_specs, P()))
    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(carry_specs, P(None, CHAINS_AXIS)),
            check_vma=False,
        )
    )


def global_best_stats(best_energy, energies):
    """Device-side reduction of the only cross-chain quantities.

    Returns (global min best energy, argmin chain id, mean energy).  Runs
    under jit on sharded inputs; XLA lowers the reductions to ICI collectives.
    """
    best_energy = jnp.asarray(best_energy)
    gmin = jnp.min(best_energy)
    gargmin = jnp.argmin(best_energy)
    return gmin, gargmin, jnp.mean(jnp.asarray(energies).astype(jnp.float32))
