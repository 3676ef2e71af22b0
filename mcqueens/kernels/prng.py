"""Counter-based in-kernel PRNG for the Pallas samplers.

Round 1 used the hardware PRNG (``pltpu.prng_random_bits``).  Round 2 found
that the Pallas *interpret mode* stubs it to zeros — every CPU test of the
kernels' acceptance path was silently running an always-accept sampler (the
hardware path was fine).  The kernels now draw from a stateless counter-based
integer hash instead:

  * plain int32 vector ops — bitwise identical on TPU, CPU interpret mode,
    and at any block/mesh layout (the same property the threefry kernels get
    from ``fold_in``, SURVEY §5.2);
  * replayable: word = f(chain_id, step), no carried RNG state;
  * cheap in the chains-on-lanes layout (~0.2 VREG/chain/step).

The mixer is the "lowbias32" finalizer (Steele/skeeto family; ~0.17% max
avalanche bias), applied twice per output word.  Sampler quality is validated
behaviorally: the enumerable-state Boltzmann stationarity tests and the
acceptance-rate parity tests in ``tests/`` now exercise the *real* streams in
interpret mode.

int32 notes: multiplications wrap identically to uint32 (two's complement);
right shifts are arithmetic in jnp, so logical shifts are emulated with a
mask.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_M1 = np.int32(np.uint32(0x7FEB352D))
_M2 = np.int32(np.uint32(0x846CA68B))
_STEP_K = np.int32(np.uint32(0x9E3779B9))   # step stride (golden ratio)
_CHAIN_K = np.int32(np.uint32(0x85EBCA6B))  # chain-id stride
_W0_K = np.int32(np.uint32(0x68BC21EB))
_W1_K = np.int32(np.uint32(0x02E5BE93))


def _shr(z, k: int):
    """Logical right shift of int32 by a static amount."""
    return (z >> k) & jnp.int32((1 << (32 - k)) - 1)


def lowbias32(z):
    """Full-avalanche 32-bit integer hash (vector or scalar int32)."""
    z = z ^ _shr(z, 16)
    z = z * _M1
    z = z ^ _shr(z, 15)
    z = z * _M2
    return z ^ _shr(z, 16)


def chain_ids(block_seed, lane_iota):
    """Per-chain stream key from a scalar block seed and a lane iota array.

    Layout-DEPENDENT (the stream is tied to the chain's block/lane position):
    only for draws that are shared or block-keyed by design, e.g. the
    shared-site streams of :mod:`mcqueens.kernels.board_shared`.  Per-chain
    proposal/accept draws must use :func:`chain_streams` instead.
    """
    return block_seed * _CHAIN_K + lowbias32(lane_iota + block_seed)


def chain_streams(seeds):
    """Per-chain stream keys from the chains' own integer seeds.

    Independent of block size, mesh layout, and batch composition — the same
    contract the threefry kernels get from ``fold_in(seed)`` (SURVEY §5.2):
    a chain's trajectory is a function of its seed alone.
    """
    s = seeds.astype(jnp.int32)
    return s * _CHAIN_K + lowbias32(s)


def step_base(g, step):
    """Per-(chain, step) mixing base; feed to :func:`words_from_base`."""
    return lowbias32(g ^ (step * _STEP_K))


def words_from_base(base):
    """(w0, w1) from a step base: w0 masked non-negative, w1 full 32 bits."""
    w0 = lowbias32(base ^ _W0_K)
    w1 = lowbias32(base + _W1_K)
    return w0 & jnp.int32(0x7FFFFFFF), w1


def word_from_base(base, salt):
    """One extra 31-bit word per (base, salt) — e.g. rejection attempts."""
    return lowbias32(base + salt) & jnp.int32(0x7FFFFFFF)


def step_words(g, step):
    """Two independent 32-bit words for (chain stream g, step counter).

    Args:
        g: int32 array of per-chain stream keys (any shape).
        step: scalar int32 global step.

    Returns:
        (w0, w1): w0 is masked non-negative (31 bits), w1 full 32 bits.
    """
    return words_from_base(step_base(g, step))


def uniform01(w):
    """24-bit uniform float32 in [0, 1) from a 32-bit word."""
    return (_shr(w, 7) & jnp.int32(0xFFFFFF)).astype(jnp.float32) * (
        jnp.float32(1.0 / (1 << 24))
    )
