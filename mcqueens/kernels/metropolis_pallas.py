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
    (:mod:`mcqueens.kernels.delta_e`) evaluated as fused int32 vector
    passes over the board — Mosaic exposes no per-lane gather/scatter, so
    the count-table trick is XLA-side only;
  * **chains live on the lane axis** (late round-2 transposition, same as
    :mod:`board_shared` / :mod:`full3d_pallas`): the board planes are
    (N², C) and all per-chain bookkeeping is (1, C) rows costing
    ~0.008 VREG/chain instead of the (C, 1) columns of the round-1 layout
    (which tile-pad to 128 lanes and made scalar bookkeeping ~25% of the
    step).  The per-chain PRNG word usage is unchanged, so trajectories
    are **bitwise identical** to the round-1 layout (golden-checked);
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
from mcqueens.kernels import prng, sizing

# Chains per VMEM block along the lane axis (board planes are (N^2, C)).
DEFAULT_BLOCK = 2048
_LANE = 128  # lane tile granularity

_UNROLL = 32  # sub-steps per fori iteration for production segment lengths
_UNROLL_SMALL = 8  # tiny segments (tests): 4x less straight-line code;
# results are unroll-invariant (the counter PRNG keys on the global step)

# Pad-row coordinate sentinels: pad sublanes beyond N^2 get (i, j) =
# (_SENT_I, _SENT_J).  For any site (i, j) in [0, N): p = _SENT_I - i > 0,
# q = _SENT_J - j > 2.9 p > 0, so a = b = 0 and p^2 != q^2 — pad rows
# contribute exactly 0 to the delta-E integrand whatever height they hold.
_SENT_I = 1 << 10
_SENT_J = 3 << 10


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


def block_size(n_chains: int, spec=None) -> int:
    """Chains per VMEM block; pass ``spec`` to cap the block by scoped VMEM
    (2 (NNS, block) i32 board layouts resident per block — fits the
    default block to N ~ 34)."""
    cap = DEFAULT_BLOCK
    if spec is not None:
        cap = sizing.block_cap(2 * _nns(spec.N), DEFAULT_BLOCK)
    return sizing.block_size(n_chains, cap)


def padded_chains(n_chains: int, spec=None) -> int:
    blk = block_size(n_chains, spec)
    return -(-n_chains // blk) * blk


def _nns(N: int) -> int:
    """N^2 padded up to a sublane-tile multiple."""
    return -(-(N * N) // 8) * 8


def _reduce_rows(x, S):
    """(S, C) -> (1, C) sum along sublanes via tile-friendly strided adds."""
    acc = x[0:8, :]
    for off in range(8, S, 8):
        acc = acc + x[off:off + 8, :]
    acc = acc[0:4, :] + acc[4:8, :]
    acc = acc[0:2, :] + acc[2:4, :]
    return acc[0:1, :] + acc[1:2, :]


def _internal_state(carry: PallasBoardCarry, N: int):
    """Chains-major carry -> (rows, C) transposed internal planes."""
    NN = N * N
    pad = _nns(N) - NN

    def plane(x):
        t = x.T.astype(jnp.int32)
        if pad:
            t = jnp.concatenate(
                [t, jnp.zeros((pad, t.shape[1]), jnp.int32)], axis=0
            )
        return t

    return (
        plane(carry.heights), plane(carry.best_heights),
        carry.energy.T, carry.best_energy.T, carry.best_step.T,
        carry.no_improve.T, carry.stop_step.T,
        carry.accept_bins.T, carry.total_bins.T,
        carry.chain_seeds.T.astype(jnp.int32),
    )


def _external_carry(block_seeds, st, N: int) -> PallasBoardCarry:
    NN = N * N
    h, bh, e, be, bs, ni, stp, ab, tb, cs = st
    return PallasBoardCarry(
        block_seeds=block_seeds,
        chain_seeds=cs.T,
        heights=h[:NN].T, best_heights=bh[:NN].T,
        energy=e.T, best_energy=be.T, best_step=bs.T,
        no_improve=ni.T, stop_step=stp.T,
        accept_bins=ab.T, total_bins=tb.T,
    )


def _kernel(step0_ref, cs_in, h_in, bh_in, e_in, be_in, bs_in,
            ni_in, st_in, ab_in, tb_in,
            h_o, bh_o, e_o, be_o, bs_o, ni_o, st_o, ab_o, tb_o,
            *, spec: ChainSpec, n_inner: int):
    N = spec.N
    NN = N * N
    NNS = h_in.shape[0]
    c_blk = h_in.shape[1]
    nb = spec.n_bins

    step0 = step0_ref[0, 0]
    # Counter-based streams (kernels/prng.py): one key per chain SEED (not
    # block/lane position), words drawn per step — bitwise identical on TPU
    # and in interpret mode, and independent of block size / mesh layout.
    g = prng.chain_streams(cs_in[:])

    h_o[:] = h_in[:]
    bh_o[:] = bh_in[:]

    cell = lax.broadcasted_iota(jnp.int32, (NNS, c_blk), 0)
    real = cell < NN
    i_grid = jnp.where(real, cell // N, jnp.int32(_SENT_I))
    j_grid = jnp.where(real, cell % N, jnp.int32(_SENT_J))
    bin_iota = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

    def bin_of(gstep):
        return jnp.minimum(gstep * nb // spec.n_steps, nb - 1)

    def one_step(gstep, carry):
        h = h_o[:]
        e, be, bs, ni, st, acc_a, acc_t = carry

        w0, w1 = prng.step_words(g, gstep)
        i = w0 % N
        j = (w0 // N) % N
        kr = (w0 // (N * N)) % (N - 1)
        u = prng.uniform01(w1)

        fij = i * N + j
        sel = cell == fij  # (NNS, C) one-hot of the chosen column
        old_k = _reduce_rows(jnp.where(sel, h, jnp.int32(0)), NNS)
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
        d_e = _reduce_rows(integrand, NNS) + jnp.int32(6)

        gstep_f = jnp.full((1, 1), 0, jnp.float32) + gstep.astype(jnp.float32)
        beta = spec.schedule(gstep_f)
        accept = u < jnp.exp(-beta * d_e.astype(jnp.float32))

        done = st < spec.n_steps
        active = jnp.logical_and(~done, gstep < spec.n_steps)
        upd = jnp.logical_and(accept, active)

        h_new = jnp.where(jnp.logical_and(sel, upd), new_k, h)
        h_o[:] = h_new
        e = e + jnp.where(upd, d_e, 0)

        improved = jnp.logical_and(upd, e < be)
        # Per-chain proposal sites make the board-shared group-revert trick
        # a loss here (each revert is a full-plane pass anyway), so the
        # best-board snapshot stays per-step (reusing the register value,
        # not re-reading the plane just written).
        bh_o[:] = jnp.where(improved, h_new, bh_o[:])
        be = jnp.where(improved, e, be)
        bs = jnp.where(improved, gstep + 1, bs)
        ni = jnp.where(active, jnp.where(improved, 0, ni + 1), ni)
        if spec.early_stop_patience is not None:
            newly = jnp.logical_and(active, ni >= spec.early_stop_patience)
            st = jnp.where(newly, gstep, st)

        inc = active.astype(jnp.int32)
        acc_a = acc_a + inc * accept.astype(jnp.int32)
        acc_t = acc_t + inc
        return e, be, bs, ni, st, acc_a, acc_t

    zrow = jnp.zeros((1, c_blk), jnp.int32)
    unroll = _UNROLL if n_inner >= 1024 else _UNROLL_SMALL
    n_groups = n_inner // unroll
    # Split bin accumulators assume a group spans <= 2 bins (bin width >=
    # the unroll factor); narrower toy configs take exact per-step one-hots.
    exact_bins = spec.n_steps // spec.n_bins < unroll

    def flush_bins(ab, tb, b0, b1, a0, a1, t0, t1):
        oh0 = (bin_iota == b0).astype(jnp.int32)
        oh1 = (bin_iota == b1).astype(jnp.int32)
        ab = ab + oh0 * a0 + oh1 * a1
        tb = tb + oh0 * t0 + oh1 * t1
        return ab, tb

    def body(t, carry):
        e, be, bs, ni, st, ab, tb = carry
        g0 = step0 + t * unroll
        b0 = bin_of(g0)
        b1 = bin_of(g0 + (unroll - 1))
        accs = (zrow, zrow, zrow, zrow)  # acc_a0, acc_a1, acc_t0, acc_t1
        inner = (e, be, bs, ni, st)
        for k in range(unroll):
            gstep = g0 + k
            second = bin_of(gstep) == b1  # scalar; routes counts to a bin
            e, be, bs, ni, st, da, dt = one_step(gstep, (*inner, zrow, zrow))
            inner = (e, be, bs, ni, st)
            if exact_bins:
                oh = (bin_iota == bin_of(gstep)).astype(jnp.int32)
                ab = ab + oh * da
                tb = tb + oh * dt
            else:
                a0, a1, t0, t1 = accs
                is2 = jnp.where(second, 1, 0)
                accs = (a0 + da * (1 - is2), a1 + da * is2,
                        t0 + dt * (1 - is2), t1 + dt * is2)
        if not exact_bins:
            a0, a1, t0, t1 = accs
            ab, tb = flush_bins(ab, tb, b0, b1, a0, a1, t0, t1)
        return (*inner, ab, tb)

    carry = (e_in[:], be_in[:], bs_in[:], ni_in[:], st_in[:],
             ab_in[:], tb_in[:])
    carry = lax.fori_loop(0, n_groups, body, carry)
    # Tail steps (n_inner not divisible by the unroll factor).
    e, be, bs, ni, st, ab, tb = carry
    for k in range(n_inner - n_groups * unroll):
        gstep = step0 + n_groups * unroll + k
        e, be, bs, ni, st, da, dt = one_step(
            gstep, (e, be, bs, ni, st, zrow, zrow))
        oh = (bin_iota == bin_of(gstep)).astype(jnp.int32)
        ab = ab + oh * da
        tb = tb + oh * dt
    e_o[:] = e
    be_o[:] = be
    bs_o[:] = bs
    ni_o[:] = ni
    st_o[:] = st
    ab_o[:] = ab
    tb_o[:] = tb


@functools.partial(jax.jit,
                   static_argnames=("spec", "n_inner", "n_blocks"))
def _run_block_segment_t(st, step0, spec: ChainSpec, n_inner: int,
                         n_blocks: int):
    """One pallas_call advancing every block by n_inner steps (internal)."""
    NNS, C = st[0].shape
    c_blk = C // n_blocks
    nb = spec.n_bins

    def chain_spec_(rows):
        return pl.BlockSpec((rows, c_blk), lambda b: (0, b),
                            memory_space=pltpu.VMEM)

    state_specs = ([chain_spec_(NNS)] * 2 + [chain_spec_(1)] * 5
                   + [chain_spec_(nb)] * 2)
    rows_of = [NNS] * 2 + [1] * 5 + [nb] * 2
    in_specs = [
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        chain_spec_(1),  # chain_seeds row (read-only)
    ] + state_specs
    out_shape = tuple(
        jax.ShapeDtypeStruct((r, C), jnp.int32) for r in rows_of
    )
    step0_arr = (jnp.zeros((1, 1), jnp.int32) + step0).astype(jnp.int32)

    outs = pl.pallas_call(
        functools.partial(_kernel, spec=spec, n_inner=n_inner),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(state_specs),
        out_shape=out_shape,
        input_output_aliases={i + 2: i for i in range(len(rows_of))},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(step0_arr, st[9], *st[:9])
    return tuple(outs) + (st[9],)


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
        block = block_size(C0, spec)
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
    e0 = tables_mod.batch_energies(
        h2d, lambda h: tables_mod.table_energy(
            tables_mod.build_board_table(h))
    )[:, None].astype(jnp.int32)
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
    """Segment API matching chain/board.py: n_outer chunks of stride steps.

    The external carry keeps the chains-major layout; the transposed planes
    are derived once per segment and persist across the chunk scan.
    """
    stride = spec.history_stride
    st = _internal_state(carry, spec.N)
    block_seeds = carry.block_seeds
    n_blocks = carry.block_seeds.shape[0]

    def chunk(s, outer_idx):
        s = _run_block_segment_t(s, outer_idx * stride, spec, stride,
                                 n_blocks)
        return s, s[2][0]  # energy row -> (C,)

    st, ys = lax.scan(chunk, st, start_outer + jnp.arange(n_outer))
    return _external_carry(block_seeds, st, spec.N), ys


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
