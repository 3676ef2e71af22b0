"""Pallas TPU kernel: the entire board-mode Metropolis segment in VMEM.

Why a kernel at all: measured on the target, an XLA ``lax.scan`` step pays
~4 us of loop overhead and rewrites its HBM-resident carry every step —
O(1 ms) per step for pod-scale chain counts.  This kernel moves the whole
sampling loop on-chip:

  * grid over blocks of chains; each block's state (heights, best board,
    energy/stat scalars, acceptance bins) lives in VMEM for the whole
    segment — HBM traffic is one load + one store per segment instead of
    per step;
  * delta-E is the gather-free disjointness identity
    (:mod:`mcqueens.kernels.delta_e`) evaluated as ~30 fused int32 vector
    passes over the (C_blk, N^2) board — Mosaic exposes no per-lane
    gather/scatter, so the count-table trick is XLA-side only;
  * proposals come from a counter-based integer-hash PRNG
    (:mod:`mcqueens.kernels.prng`) keyed by (chain seed, step) — a chain's
    stream is a function of its own seed, independent of block size and mesh
    layout (same contract as the threefry kernels' ``fold_in(seed)``) —
    same Metropolis distribution as the threefry-based jnp kernels,
    different stream (SURVEY §2.1: parity is distribution-level, and the
    chain invariants are retested against the oracle for this kernel).
    Streams are bitwise identical on TPU and in interpret mode (round 2
    finding: ``pltpu.prng_random_bits`` is stubbed to zeros when
    interpreted, which silently voided round-1's CPU acceptance coverage);
  * all state buffers are input/output-aliased, so segments chain in place.

Semantics match :mod:`mcqueens.chain.board` exactly (same proposal law,
acceptance rule, best tracking, patience early stop, bin accounting) — only
the RNG stream differs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcqueens.chain.spec import ChainSpec
from mcqueens.core import tables as tables_mod
from mcqueens.kernels import prng

# Chains per VMEM block.  1 MB of board state at N=16; bigger blocks
# amortize the per-step (C, 1) scalar ops.
DEFAULT_BLOCK = 1024
_SUBLANE = 8  # sublane tile granularity for chain counts


class PallasBoardCarry(NamedTuple):
    """Sampler state between kernel segments (chains padded to the block)."""

    block_seeds: jax.Array   # (n_blocks, 1) int32: per-block PRNG seed base
    chain_seeds: jax.Array   # (C, 1) int32: per-chain stream seeds
    heights: jax.Array       # (C, N*N) int32
    best_heights: jax.Array  # (C, N*N) int32
    energy: jax.Array        # (C, 1) int32
    best_energy: jax.Array   # (C, 1) int32
    best_step: jax.Array     # (C, 1) int32
    no_improve: jax.Array    # (C, 1) int32
    stop_step: jax.Array     # (C, 1) int32 (== n_steps when never stopped)
    accept_bins: jax.Array   # (C, n_bins) int32
    total_bins: jax.Array    # (C, n_bins) int32


def block_size(n_chains: int) -> int:
    if n_chains >= DEFAULT_BLOCK:
        return DEFAULT_BLOCK
    return -(-n_chains // _SUBLANE) * _SUBLANE


def padded_chains(n_chains: int) -> int:
    blk = block_size(n_chains)
    return -(-n_chains // blk) * blk


_UNROLL = 4  # sub-steps per fori iteration: amortizes the PRNG call (~+17%)


def _kernel(step0_ref, cs_ref, h_ref, bh_ref, e_ref, be_ref, bs_ref,
            ni_ref, st_ref, ab_ref, tb_ref,
            h_out, bh_out, e_out, be_out, bs_out, ni_out, st_out,
            ab_out, tb_out, *, spec: ChainSpec, n_inner: int):
    N = spec.N
    NN = N * N
    c_blk = h_ref.shape[0]

    # Counter-based streams (kernels/prng.py): one key per chain SEED (not
    # block/lane position), words drawn per step — bitwise identical on TPU
    # and in interpret mode, and independent of block size / mesh layout
    # (pltpu.prng_random_bits is stubbed to zeros when interpreted).
    g = prng.chain_streams(cs_ref[:])

    cell = lax.broadcasted_iota(jnp.int32, (c_blk, NN), 1)
    i_grid = cell // N
    j_grid = cell % N
    bin_lanes = lax.broadcasted_iota(jnp.int32, (1, spec.n_bins), 1)

    def one_step(gstep, carry):
        h, bh, e, be, bs, ni, st, ab, tb = carry

        w0, w1 = prng.step_words(g, gstep)
        i = w0 % N
        j = (w0 // N) % N
        kr = (w0 // (N * N)) % (N - 1)
        u = prng.uniform01(w1)

        fij = i * N + j
        sel = cell == fij  # (c_blk, NN) one-hot of the chosen column
        old_k = jnp.sum(
            jnp.where(sel, h, jnp.int32(0)), axis=1, keepdims=True,
            dtype=jnp.int32,
        )
        new_k = (old_k + 1 + kr) % N

        # Gather-free delta-E (see kernels/delta_e.py; verified vs tables).
        # All |d1|==|d2| tests use squared differences: absi/maxsi do not
        # legalize on this target and squares save the extra passes anyway.
        p = i_grid - i
        q = j_grid - j
        p2 = p * p
        q2 = q * q
        a = (p == 0).astype(jnp.int32)
        b = (q == 0).astype(jnp.int32)
        eq = (p2 == q2).astype(jnp.int32)
        s = a + b + eq
        ae = a + eq
        ro = h - old_k
        rn = h - new_k
        ro2 = ro * ro
        rn2 = rn * rn
        dz = (rn2 == 0).astype(jnp.int32) - (ro2 == 0).astype(jnp.int32)
        dt1 = (q2 == rn2).astype(jnp.int32) - (q2 == ro2).astype(jnp.int32)
        dt2 = (p2 == rn2).astype(jnp.int32) - (p2 == ro2).astype(jnp.int32)
        integrand = s * dz + b * dt2 + ae * dt1
        d_e = (
            jnp.sum(integrand, axis=1, keepdims=True, dtype=jnp.int32)
            + jnp.int32(6)
        )

        gstep_f = jnp.full((1, 1), 0, jnp.float32) + gstep.astype(jnp.float32)
        beta = spec.schedule(gstep_f)
        accept = u < jnp.exp(-beta * d_e.astype(jnp.float32))

        done = st < spec.n_steps
        active = jnp.logical_and(~done, gstep < spec.n_steps)
        upd = jnp.logical_and(accept, active)

        h = jnp.where(jnp.logical_and(sel, upd), new_k, h)
        e = e + jnp.where(upd, d_e, 0)

        improved = jnp.logical_and(upd, e < be)
        bh = jnp.where(improved, h, bh)
        be = jnp.where(improved, e, be)
        bs = jnp.where(improved, gstep + 1, bs)
        ni = jnp.where(active, jnp.where(improved, 0, ni + 1), ni)
        if spec.early_stop_patience is not None:
            newly = jnp.logical_and(active, ni >= spec.early_stop_patience)
            st = jnp.where(newly, gstep, st)

        # Acceptance bins: the bin index is one scalar for the whole step;
        # dynamic lane slicing must be 128-aligned, so accumulate through a
        # one-hot lane mask instead.
        bin_idx = jnp.minimum(
            gstep * spec.n_bins // spec.n_steps, spec.n_bins - 1
        )
        one_hot = (bin_lanes == bin_idx).astype(jnp.int32)
        inc = active.astype(jnp.int32)
        ab = ab + one_hot * (inc * accept.astype(jnp.int32))
        tb = tb + one_hot * inc

        return h, bh, e, be, bs, ni, st, ab, tb

    n_unrolled = n_inner // _UNROLL

    def body(t, carry):
        gstep0 = step0_ref[0, 0] + t * _UNROLL
        for k in range(_UNROLL):
            carry = one_step(gstep0 + k, carry)
        return carry

    carry = (h_ref[:], bh_ref[:], e_ref[:], be_ref[:], bs_ref[:], ni_ref[:],
             st_ref[:], ab_ref[:], tb_ref[:])
    carry = lax.fori_loop(0, n_unrolled, body, carry)
    # Remainder steps (n_inner not divisible by the unroll factor).
    for k in range(n_inner - n_unrolled * _UNROLL):
        gstep = step0_ref[0, 0] + n_unrolled * _UNROLL + k
        carry = one_step(gstep, carry)
    h, bh, e, be, bs, ni, st, ab, tb = carry
    h_out[:] = h
    bh_out[:] = bh
    e_out[:] = e
    be_out[:] = be
    bs_out[:] = bs
    ni_out[:] = ni
    st_out[:] = st
    ab_out[:] = ab
    tb_out[:] = tb


@functools.partial(jax.jit, static_argnames=("spec", "n_inner"))
def _run_block_segment(carry: PallasBoardCarry, step0, spec: ChainSpec,
                       n_inner: int) -> PallasBoardCarry:
    """One pallas_call advancing every block by n_inner steps."""
    C, NN = carry.heights.shape
    n_blocks = carry.block_seeds.shape[0]
    c_blk = C // n_blocks
    nb = spec.n_bins

    def chain_spec_(shape):
        return pl.BlockSpec(shape, lambda b: (b, 0), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),  # step0
        chain_spec_((c_blk, 1)),       # chain_seeds (read-only)
        chain_spec_((c_blk, NN)),      # heights
        chain_spec_((c_blk, NN)),      # best_heights
        chain_spec_((c_blk, 1)),       # energy
        chain_spec_((c_blk, 1)),       # best_energy
        chain_spec_((c_blk, 1)),       # best_step
        chain_spec_((c_blk, 1)),       # no_improve
        chain_spec_((c_blk, 1)),       # stop_step
        chain_spec_((c_blk, nb)),      # accept_bins
        chain_spec_((c_blk, nb)),      # total_bins
    ]
    out_specs = tuple(in_specs[2:])
    out_shapes = (
        jax.ShapeDtypeStruct((C, NN), jnp.int32),
        jax.ShapeDtypeStruct((C, NN), jnp.int32),
        jax.ShapeDtypeStruct((C, 1), jnp.int32),
        jax.ShapeDtypeStruct((C, 1), jnp.int32),
        jax.ShapeDtypeStruct((C, 1), jnp.int32),
        jax.ShapeDtypeStruct((C, 1), jnp.int32),
        jax.ShapeDtypeStruct((C, 1), jnp.int32),
        jax.ShapeDtypeStruct((C, nb), jnp.int32),
        jax.ShapeDtypeStruct((C, nb), jnp.int32),
    )
    step0_arr = (jnp.zeros((1, 1), jnp.int32) + step0).astype(jnp.int32)

    outs = pl.pallas_call(
        functools.partial(_kernel, spec=spec, n_inner=n_inner),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5, 8: 6,
                              9: 7, 10: 8},
        # (C_blk, 1) scalar columns tile-pad to 128 lanes, so the default
        # 16 MB scoped-vmem budget overflows at 1024-chain blocks; v5e has
        # 128 MB of VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(step0_arr, carry.chain_seeds, carry.heights, carry.best_heights,
      carry.energy, carry.best_energy, carry.best_step, carry.no_improve,
      carry.stop_step, carry.accept_bins, carry.total_bins)

    return PallasBoardCarry(carry.block_seeds, carry.chain_seeds, *outs)


@functools.partial(jax.jit, static_argnames=("spec", "block"))
def init_carry_batch(seeds, spec: ChainSpec,
                     block: int | None = None,
                     initial_states=None) -> PallasBoardCarry:
    """Carry from per-chain integer seeds (padded to a whole block count).

    Board initialization uses the batched hash initializers
    (:mod:`mcqueens.core.fastinit` — same distributions as the threefry path,
    compiles instantly); each chain's in-kernel PRNG stream is keyed by its
    own seed (``prng.chain_streams``), so trajectories are independent of the
    block size chosen here.  ``block`` overrides the VMEM block size (mesh
    runs pick one device's chain share so shards hold whole blocks).
    """
    seeds = jnp.asarray(seeds, jnp.uint32)
    C0 = seeds.shape[0]
    if block is None:
        block = block_size(C0)
    C = -(-C0 // block) * block
    if C > C0:
        seeds = jnp.concatenate(
            [seeds, seeds[-1] + 1 + jnp.arange(C - C0, dtype=jnp.uint32)]
        )
    n_blocks = C // block

    # Hash-based batched init: vmapped threefry takes minutes to compile on
    # this backend (see core/fastinit.py) — same distributions, instant compile.
    from mcqueens.core import fastinit

    if initial_states is not None:
        h2d = jnp.asarray(initial_states, jnp.int32)
        if C > h2d.shape[0]:  # padded lanes reuse the last warm start
            reps = jnp.repeat(h2d[-1:], C - h2d.shape[0], axis=0)
            h2d = jnp.concatenate([h2d, reps])
    else:
        h2d = fastinit.board_init_batch(seeds, spec.N, spec.init_mode)
    heights = h2d.reshape(C, spec.N * spec.N).astype(jnp.int32)
    tabs = jax.vmap(tables_mod.build_board_table)(h2d)
    e0 = jax.vmap(tables_mod.table_energy)(tabs)[:, None].astype(jnp.int32)
    block_seeds = (
        seeds[0].astype(jnp.int32)
        + 7919 * jnp.arange(n_blocks, dtype=jnp.int32)[:, None]
    )
    zeros = jnp.zeros((C, 1), jnp.int32)
    return PallasBoardCarry(
        block_seeds=block_seeds,
        chain_seeds=seeds.astype(jnp.int32)[:, None],
        heights=heights,
        best_heights=heights,
        energy=e0,
        best_energy=e0,
        best_step=zeros,
        no_improve=zeros,
        stop_step=zeros + spec.n_steps,
        accept_bins=jnp.zeros((C, spec.n_bins), jnp.int32),
        total_bins=jnp.zeros((C, spec.n_bins), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("spec", "n_outer"))
def run_segment(carry: PallasBoardCarry, start_outer, spec: ChainSpec,
                n_outer: int):
    """Segment API matching chain/board.py: n_outer chunks of stride steps."""
    stride = spec.history_stride

    def chunk(c, outer_idx):
        c = _run_block_segment(c, outer_idx * stride, spec, stride)
        return c, c.energy[:, 0]

    return lax.scan(chunk, carry, start_outer + jnp.arange(n_outer))


@functools.cache
def _sharded_segment_fn(spec: ChainSpec, n_outer: int, mesh):
    from jax.sharding import PartitionSpec as P

    from mcqueens.dist.mesh import CHAINS_AXIS

    carry_specs = PallasBoardCarry(*([P(CHAINS_AXIS)] * len(
        PallasBoardCarry._fields)))
    return jax.jit(
        jax.shard_map(
            lambda c, s: run_segment(c, s, spec, n_outer),
            mesh=mesh,
            in_specs=(carry_specs, P()),
            out_specs=(carry_specs, P(None, CHAINS_AXIS)),
            check_vma=False,
        )
    )


def run_segment_sharded(carry: PallasBoardCarry, start_outer, spec: ChainSpec,
                        n_outer: int, mesh):
    """run_segment over a chains mesh: each shard advances its whole blocks.

    Requires the carry to hold an equal number of blocks per device (the
    runner pads chain counts accordingly).
    """
    return _sharded_segment_fn(spec, n_outer, mesh)(carry, start_outer)
