"""Pallas TPU kernel: full-3D Metropolis segments in VMEM.

Same architecture as :mod:`mcqueens.kernels.metropolis_pallas` (chain blocks
resident in VMEM for whole segments, hardware PRNG, in/out-aliased buffers),
adapted to the unconstrained chain (``experiments.py:199-279``): Q queens at
arbitrary distinct cells, proposals uniform over *unoccupied* cells.

Key representation choices under this target's Mosaic constraints (no
per-lane gather/scatter):

  * queen coordinates as three (C, Q) int32 planes; per-chain queen selection
    and updates via one-hot lane masks;
  * occupancy as a (C, N^3/32) int32 *bitfield* — membership tests and flips
    are a one-hot word select plus shift/mask ops, so the whole cube costs
    four 128-lane passes instead of a 4096-lane plane;
  * the reference's unbounded rejection loop for "unoccupied cell" becomes K
    unrolled attempts with first-success select, K sized so the probability
    of exhausting all attempts is < 1e-12 (then the step degenerates to a
    self-rejection); exactness loss is unmeasurable and documented;
  * delta-E by two one-vs-all evaluations against the Q queens using the
    disjoint-relation sum (all 7 relations are mutually exclusive on distinct
    cells — SURVEY §2.1), with the moving queen's lane masked out, matching
    ``mcmc.py:185-226``.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcqueens.chain.spec import ChainSpec
from mcqueens.core import tables as tables_mod

DEFAULT_BLOCK = 512
_SUBLANE = 8


class PallasFull3DCarry(NamedTuple):
    """Per-chain sampler state between kernel segments."""

    block_seeds: jax.Array  # (n_blocks, 1) int32
    qi: jax.Array           # (C, Q) int32
    qj: jax.Array           # (C, Q) int32
    qk: jax.Array           # (C, Q) int32
    occ: jax.Array          # (C, ceil(N^3/32)) int32 occupancy bitfield
    best_qi: jax.Array      # (C, Q) int32
    best_qj: jax.Array
    best_qk: jax.Array
    energy: jax.Array       # (C, 1) int32
    best_energy: jax.Array
    best_step: jax.Array
    no_improve: jax.Array
    stop_step: jax.Array
    accept_bins: jax.Array  # (C, n_bins) int32
    total_bins: jax.Array


def block_size(n_chains: int) -> int:
    if n_chains >= DEFAULT_BLOCK:
        return DEFAULT_BLOCK
    return -(-n_chains // _SUBLANE) * _SUBLANE


def _attempts(N: int, Q: int) -> int:
    """Attempts so that P(all occupied) = (Q/N^3)^K < 1e-12."""
    frac = Q / (N ** 3)
    if frac <= 0:
        return 1
    k = math.ceil(-12 / math.log10(frac))
    return max(4, min(k, 64))


def _occ_words(N: int) -> int:
    return -(-(N ** 3) // 32)


def _attack_sum(di0, dj0, dk0, di_eq_dj, di_eq_dk, dj_eq_dk):
    """Disjoint-relation attack count per queen lane (int32 0/1 inputs)."""
    same_ij = di0 * dj0
    same_ik = di0 * dk0
    same_jk = dj0 * dk0
    plane_k = dk0 * di_eq_dj
    plane_j = dj0 * di_eq_dk
    plane_i = di0 * dj_eq_dk
    space = di_eq_dj * dj_eq_dk
    return same_ij + same_ik + same_jk + plane_k + plane_j + plane_i + space


def _conflicts(qi, qj, qk, x, y, z, not_self):
    """One-vs-all conflicts of candidate (x, y, z), mover's lane masked.

    All relation indicators are built from *squared* differences (abs does
    not legalize on this target).
    """
    p = qi - x
    q = qj - y
    r = qk - z
    p2 = p * p
    q2 = q * q
    r2 = r * r
    di0 = (p2 == 0).astype(jnp.int32)
    dj0 = (q2 == 0).astype(jnp.int32)
    dk0 = (r2 == 0).astype(jnp.int32)
    att = _attack_sum(
        di0, dj0, dk0,
        (p2 == q2).astype(jnp.int32),
        (p2 == r2).astype(jnp.int32),
        (q2 == r2).astype(jnp.int32),
    )
    return jnp.sum(att * not_self, axis=1, keepdims=True, dtype=jnp.int32)


def _kernel(step0_ref, seed_ref, qi_ref, qj_ref, qk_ref, occ_ref,
            bqi_ref, bqj_ref, bqk_ref, e_ref, be_ref, bs_ref, ni_ref, st_ref,
            ab_ref, tb_ref,
            qi_out, qj_out, qk_out, occ_out, bqi_out, bqj_out, bqk_out,
            e_out, be_out, bs_out, ni_out, st_out, ab_out, tb_out,
            *, spec: ChainSpec, n_inner: int):
    N = spec.N
    Q = spec.q_eff
    N3 = N * N * N
    c_blk = qi_ref.shape[0]
    n_words = _occ_words(N)
    n_attempts = _attempts(N, Q)

    pltpu.prng_seed(seed_ref[pl.program_id(0), 0], step0_ref[0, 0])

    lane_q = lax.broadcasted_iota(jnp.int32, (c_blk, Q), 1)
    lane_w = lax.broadcasted_iota(jnp.int32, (c_blk, n_words), 1)
    bin_lanes = lax.broadcasted_iota(jnp.int32, (1, spec.n_bins), 1)

    def occ_test(occ, cell):
        """(C,1) int32 0/1: is cell occupied?"""
        word = cell // 32
        bit = cell % 32
        w = jnp.sum(
            jnp.where(lane_w == word, occ, 0), axis=1, keepdims=True,
            dtype=jnp.int32,
        )
        return (w >> bit) & 1

    words_per_step = 2 + n_attempts

    def one_step(gstep, r, off, carry):
        (qi, qj, qk, occ, bqi, bqj, bqk, e, be, bs, ni, st, ab, tb) = carry

        w_q = pltpu.bitcast(r[:, off:off + 1], jnp.int32) & jnp.int32(0x7FFFFFFF)
        w_u = pltpu.bitcast(r[:, off + 1:off + 2], jnp.int32)
        q_idx = w_q % Q
        u = ((w_u >> 7) & jnp.int32(0xFFFFFF)).astype(jnp.float32) * jnp.float32(
            1.0 / (1 << 24)
        )

        # Moving queen's position (one-hot extraction over Q lanes).
        sel_q = (lane_q == q_idx).astype(jnp.int32)
        not_self = 1 - sel_q
        ox = jnp.sum(sel_q * qi, axis=1, keepdims=True, dtype=jnp.int32)
        oy = jnp.sum(sel_q * qj, axis=1, keepdims=True, dtype=jnp.int32)
        oz = jnp.sum(sel_q * qk, axis=1, keepdims=True, dtype=jnp.int32)
        old_cell = (ox * N + oy) * N + oz

        # Uniform unoccupied cell: first success of n_attempts draws.
        new_cell = old_cell  # degenerate fallback: self-rejection, P < 1e-12
        found = jnp.zeros_like(old_cell)
        for a in range(n_attempts):
            w = pltpu.bitcast(
                r[:, off + 2 + a:off + 3 + a], jnp.int32
            ) & jnp.int32(0x7FFFFFFF)
            cand = w % N3
            free = 1 - occ_test(occ, cand)
            take = (1 - found) * free
            new_cell = jnp.where(take == 1, cand, new_cell)
            found = jnp.maximum(found, free)

        nx = new_cell // (N * N)
        ny = (new_cell // N) % N
        nz = new_cell % N

        old_conf = _conflicts(qi, qj, qk, ox, oy, oz, not_self)
        new_conf = _conflicts(qi, qj, qk, nx, ny, nz, not_self)
        d_e = new_conf - old_conf

        gstep_f = jnp.full((1, 1), 0, jnp.float32) + gstep.astype(jnp.float32)
        beta = spec.schedule(gstep_f)
        accept = u < jnp.exp(-beta * d_e.astype(jnp.float32))

        done = st < spec.n_steps
        active = jnp.logical_and(~done, gstep < spec.n_steps)
        upd = jnp.logical_and(
            jnp.logical_and(accept, active), (found == 1)
        )

        sel_upd = jnp.logical_and(sel_q == 1, upd)
        qi = jnp.where(sel_upd, nx, qi)
        qj = jnp.where(sel_upd, ny, qj)
        qk = jnp.where(sel_upd, nz, qk)

        # Occupancy bitfield flip: clear old bit, set new bit.
        updi = upd.astype(jnp.int32)
        old_mask = jnp.where(lane_w == old_cell // 32, updi << (old_cell % 32), 0)
        new_mask = jnp.where(lane_w == new_cell // 32, updi << (new_cell % 32), 0)
        occ = (occ & ~old_mask) | new_mask

        e = e + jnp.where(upd, d_e, 0)
        improved = jnp.logical_and(upd, e < be)
        bqi = jnp.where(improved, qi, bqi)
        bqj = jnp.where(improved, qj, bqj)
        bqk = jnp.where(improved, qk, bqk)
        be = jnp.where(improved, e, be)
        bs = jnp.where(improved, gstep + 1, bs)
        ni = jnp.where(active, jnp.where(improved, 0, ni + 1), ni)
        if spec.early_stop_patience is not None:
            newly = jnp.logical_and(active, ni >= spec.early_stop_patience)
            st = jnp.where(newly, gstep, st)

        bin_idx = jnp.minimum(gstep * spec.n_bins // spec.n_steps,
                              spec.n_bins - 1)
        one_hot = (bin_lanes == bin_idx).astype(jnp.int32)
        inc = active.astype(jnp.int32)
        ab = ab + one_hot * (inc * accept.astype(jnp.int32))
        tb = tb + one_hot * inc

        return (qi, qj, qk, occ, bqi, bqj, bqk, e, be, bs, ni, st, ab, tb)

    unroll = 4  # one PRNG draw feeds this many sequential proposals
    n_unrolled = n_inner // unroll

    def body(t, carry):
        r = pltpu.prng_random_bits((c_blk, unroll * words_per_step))
        gstep0 = step0_ref[0, 0] + t * unroll
        for k in range(unroll):
            carry = one_step(gstep0 + k, r, k * words_per_step, carry)
        return carry

    out = (qi_ref[:], qj_ref[:], qk_ref[:], occ_ref[:], bqi_ref[:],
           bqj_ref[:], bqk_ref[:], e_ref[:], be_ref[:], bs_ref[:], ni_ref[:],
           st_ref[:], ab_ref[:], tb_ref[:])
    out = lax.fori_loop(0, n_unrolled, body, out)
    for k in range(n_inner - n_unrolled * unroll):
        r = pltpu.prng_random_bits((c_blk, words_per_step))
        gstep = step0_ref[0, 0] + n_unrolled * unroll + k
        out = one_step(gstep, r, 0, out)
    for ref, val in zip(
        (qi_out, qj_out, qk_out, occ_out, bqi_out, bqj_out, bqk_out, e_out,
         be_out, bs_out, ni_out, st_out, ab_out, tb_out),
        out,
    ):
        ref[:] = val


@functools.partial(jax.jit, static_argnames=("spec", "n_inner"))
def _run_block_segment(carry: PallasFull3DCarry, step0, spec: ChainSpec,
                       n_inner: int) -> PallasFull3DCarry:
    C, Q = carry.qi.shape
    n_blocks = carry.block_seeds.shape[0]
    c_blk = C // n_blocks
    nb = spec.n_bins
    n_words = carry.occ.shape[1]

    def cs(shape):
        return pl.BlockSpec(shape, lambda b: (b, 0), memory_space=pltpu.VMEM)

    state_shapes = [
        ((c_blk, Q), jnp.int32),   # qi
        ((c_blk, Q), jnp.int32),   # qj
        ((c_blk, Q), jnp.int32),   # qk
        ((c_blk, n_words), jnp.int32),  # occ
        ((c_blk, Q), jnp.int32),   # best_qi
        ((c_blk, Q), jnp.int32),   # best_qj
        ((c_blk, Q), jnp.int32),   # best_qk
        ((c_blk, 1), jnp.int32),   # energy
        ((c_blk, 1), jnp.int32),   # best_energy
        ((c_blk, 1), jnp.int32),   # best_step
        ((c_blk, 1), jnp.int32),   # no_improve
        ((c_blk, 1), jnp.int32),   # stop_step
        ((c_blk, nb), jnp.int32),  # accept_bins
        ((c_blk, nb), jnp.int32),  # total_bins
    ]
    in_specs = [
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_blocks, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ] + [cs(shape) for shape, _ in state_shapes]
    out_specs = tuple(cs(shape) for shape, _ in state_shapes)
    out_shape = tuple(
        jax.ShapeDtypeStruct((C,) + shape[1:], dtype)
        for shape, dtype in state_shapes
    )
    step0_arr = (jnp.zeros((1, 1), jnp.int32) + step0).astype(jnp.int32)

    outs = pl.pallas_call(
        functools.partial(_kernel, spec=spec, n_inner=n_inner),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={i + 2: i for i in range(len(state_shapes))},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(step0_arr, carry.block_seeds, carry.qi, carry.qj, carry.qk, carry.occ,
      carry.best_qi, carry.best_qj, carry.best_qk, carry.energy,
      carry.best_energy, carry.best_step, carry.no_improve, carry.stop_step,
      carry.accept_bins, carry.total_bins)

    return PallasFull3DCarry(carry.block_seeds, *outs)


@functools.partial(jax.jit, static_argnames=("spec", "block"))
def init_carry_batch(seeds, spec: ChainSpec,
                     block: int | None = None,
                     initial_states=None) -> PallasFull3DCarry:
    """Carry from per-chain integer seeds (hash-based init, see fastinit)."""
    from mcqueens.core import fastinit

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
    N, Q = spec.N, spec.q_eff

    if initial_states is not None:
        queens = jnp.asarray(initial_states, jnp.int32)
        if C > queens.shape[0]:  # padded lanes reuse the last warm start
            reps = jnp.repeat(queens[-1:], C - queens.shape[0], axis=0)
            queens = jnp.concatenate([queens, reps])
    else:
        queens = fastinit.full3d_init_batch(seeds, N, spec.init_mode, Q)
    qi, qj, qk = queens[..., 0], queens[..., 1], queens[..., 2]
    cells = (qi * N + qj) * N + qk
    n_words = _occ_words(N)
    word = cells // 32
    bit = cells % 32
    lane_w = jnp.arange(n_words, dtype=jnp.int32)
    occ = jnp.sum(
        jnp.where(word[:, :, None] == lane_w[None, None, :],
                  jnp.left_shift(1, bit)[:, :, None], 0),
        axis=1, dtype=jnp.int32,
    )
    e0 = jax.vmap(
        lambda q: tables_mod.table_energy(tables_mod.build_full3d_table(q, N))
    )(queens)[:, None].astype(jnp.int32)

    block_seeds = (
        seeds[0].astype(jnp.int32)
        + 104729 * jnp.arange(n_blocks, dtype=jnp.int32)[:, None]
    )
    zeros = jnp.zeros((C, 1), jnp.int32)
    return PallasFull3DCarry(
        block_seeds=block_seeds,
        qi=qi, qj=qj, qk=qk, occ=occ,
        best_qi=qi, best_qj=qj, best_qk=qk,
        energy=e0, best_energy=e0,
        best_step=zeros, no_improve=zeros,
        stop_step=zeros + spec.n_steps,
        accept_bins=jnp.zeros((C, spec.n_bins), jnp.int32),
        total_bins=jnp.zeros((C, spec.n_bins), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("spec", "n_outer"))
def run_segment(carry: PallasFull3DCarry, start_outer, spec: ChainSpec,
                n_outer: int):
    stride = spec.history_stride

    def chunk(c, outer_idx):
        c = _run_block_segment(c, outer_idx * stride, spec, stride)
        return c, c.energy[:, 0]

    return lax.scan(chunk, carry, start_outer + jnp.arange(n_outer))


@functools.cache
def _sharded_segment_fn(spec: ChainSpec, n_outer: int, mesh):
    from jax.sharding import PartitionSpec as P

    from mcqueens.dist.mesh import CHAINS_AXIS

    carry_specs = PallasFull3DCarry(*([P(CHAINS_AXIS)] * len(
        PallasFull3DCarry._fields)))
    return jax.jit(
        jax.shard_map(
            lambda c, s: run_segment(c, s, spec, n_outer),
            mesh=mesh,
            in_specs=(carry_specs, P()),
            out_specs=(carry_specs, P(None, CHAINS_AXIS)),
            check_vma=False,
        )
    )


def run_segment_sharded(carry, start_outer, spec, n_outer, mesh):
    return _sharded_segment_fn(spec, n_outer, mesh)(carry, start_outer)
