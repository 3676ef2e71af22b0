"""Pallas TPU kernel: full-3D Metropolis segments in VMEM (transposed).

The unconstrained chain (``/root/reference/experiments.py:199-279``): Q queens
at arbitrary distinct cells, proposals uniform over *unoccupied* cells,
delta-E by two one-vs-all conflict evaluations against the queen list
(``mcmc.py:185-226``).

Round-2 redesign (shared with :mod:`mcqueens.kernels.board_shared`):

  * **chains on the lane axis** — queen-coordinate planes are (Q, C), the
    occupancy bitfield (ceil(N^3/32), C), and all per-chain bookkeeping
    lives in (1, C) rows costing ~0.008 VREG/chain instead of the (C, 1)
    columns of the round-1 layout (which tile-pad to 128 lanes and made
    scalar bookkeeping ~40% of the step);
  * **counter-based PRNG** (:mod:`mcqueens.kernels.prng`): words are hashed
    on demand per attempt instead of pre-drawing ``2 + K`` hardware words
    per step (round-1 drew all K rejection-attempt words even though the
    expected attempt count is ~N/(N-1)); streams are bitwise identical on
    TPU and in interpret mode;
  * the reference's unbounded rejection loop for "unoccupied cell" is
    EXACT here too: K unrolled attempts with first-success select (K sized
    so a whole block rarely misses, ``_attempts``) followed by a
    ``lax.while_loop`` that drains straggler lanes — same deterministic
    candidate word sequence either way, any occupancy < 1 supported.

Unlike the board, the full-3D delta-E has no sliceable locality for
PER-CHAIN proposal sites: a conflict test needs each queen's three
coordinates, and a per-chain line-count table cannot be maintained because
the mover's old-cell decrement is a per-lane scatter (unsupported on this
Mosaic target, ``tools/probe_gather.py``) — so the one-vs-all O(Q) pass
stays here.  Round 3 added the throughput tier on top of this kernel:
:mod:`mcqueens.kernels.full3d_shared` shares the (candidate, mover) per
block, which collapses the occupancy machinery and halves the pass count
(see its header and ``tools/probe_full3d_cap.py`` for the measured O(Q)
ceiling).  This per-chain kernel remains the independent-chains path.
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
from mcqueens.kernels import prng, sizing

# Chains per VMEM block along the lane axis.
DEFAULT_BLOCK = 2048
_LANE = 128
_UNROLL = 32  # production segment lengths; tiny segments use 8 (results
# are unroll-invariant: the counter PRNG keys on the global step)
_UNROLL_SMALL = 8

import numpy as np

_A_SALT = np.int32(0x3C6EF372)  # attempt-word stream offset


class PallasFull3DCarry(NamedTuple):
    """Per-chain sampler state between kernel segments (chains-major)."""

    block_seeds: jax.Array   # (n_blocks, 1) int32
    chain_seeds: jax.Array   # (C, 1) int32: per-chain stream seeds
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


def block_size(n_chains: int, spec=None) -> int:
    """Chains per VMEM block; pass ``spec`` to cap the block by scoped VMEM
    (6 (QS, block) coordinate layouts + the (N^3/32, block) occupancy
    bitmap resident per block)."""
    cap = DEFAULT_BLOCK
    if spec is not None:
        rows = 6 * (-(-spec.q_eff // 8) * 8) + _occ_words(spec.N)
        cap = sizing.block_cap(rows, DEFAULT_BLOCK)
    return sizing.block_size(n_chains, cap)


def padded_chains(n_chains: int, spec=None) -> int:
    blk = block_size(n_chains, spec)
    return -(-n_chains // blk) * blk


def _attempts(N: int, Q: int) -> int:
    """Static unrolled proposal attempts before the exact while_loop cleanup.

    Sized so a whole 2048-lane block rarely needs the loop:
    P(some lane misses all k static attempts) ~ BLOCK * (Q/N^3)^k <= ~3%.
    Correctness never depends on k — the while_loop drains stragglers
    exactly — k only balances straight-line work vs loop entries (measured
    on the target: more static attempts beyond this point cost more than
    the cold loop saves).
    """
    frac = Q / (N ** 3)
    if frac <= 0:
        return 1
    k = math.ceil(math.log(DEFAULT_BLOCK * 32) / max(1e-9, -math.log(frac)))
    return max(2, min(k, 16))


def _occ_words(N: int) -> int:
    return -(-(N ** 3) // 32)


def _attack_ind(p, q, r):
    """0/1 attack indicator from coordinate deltas (int32 arrays).

    Two distinct cells attack iff their delta is t*(u, v, w) with u, v, w in
    {-1, 0, 1}: every nonzero |delta| equals the common magnitude.  With
    squared deltas and m = max(p2, q2, r2) that is
    (p2 in {0, m}) and (q2 in {0, m}) and (r2 in {0, m}) — equivalent to the
    7-relation disjoint sum (``mcmc.py:144-169``) but 2 maxes + 6 compares +
    3 adds + 2 muls instead of 6 compares + 7 muls + 6 adds.  The two
    brackets of a term are exclusive unless m == 0 (only the self row),
    where the product is 8 — callers cancel the self row arithmetically.
    """
    p2 = p * p
    q2 = q * q
    r2 = r * r
    m = jnp.maximum(p2, jnp.maximum(q2, r2))
    bp = (p2 == 0).astype(jnp.int32) + (p2 == m).astype(jnp.int32)
    bq = (q2 == 0).astype(jnp.int32) + (q2 == m).astype(jnp.int32)
    br = (r2 == 0).astype(jnp.int32) + (r2 == m).astype(jnp.int32)
    return bp * bq * br


def _reduce_rows(x, S):
    """(S, C) -> (1, C) sum along sublanes via tile-friendly strided adds."""
    if S < 8 or S % 8:
        return jnp.sum(x, axis=0, keepdims=True).astype(jnp.int32)
    acc = x[0:8, :]
    for off in range(8, S, 8):
        acc = acc + x[off:off + 8, :]
    acc = acc[0:4, :] + acc[4:8, :]
    acc = acc[0:2, :] + acc[2:4, :]
    return acc[0:1, :] + acc[1:2, :]


def _kernel(step0_ref, cs_ref, qi_in, qj_in, qk_in, qc_in, occ_in, bqc_in,
            e_in, be_in, bs_in, ni_in, st_in, ab_in, tb_in,
            qi_o, qj_o, qk_o, qc_o, occ_o, bqc_o,
            e_o, be_o, bs_o, ni_o, st_o, ab_o, tb_o,
            *, spec: ChainSpec, n_inner: int):
    N = spec.N
    Q = spec.q_eff
    QS = qi_in.shape[0]  # Q padded to a sublane multiple
    N3 = N * N * N
    c_blk = qi_in.shape[1]
    n_words = occ_in.shape[0]
    n_attempts = _attempts(N, Q)
    nb = spec.n_bins

    step0 = step0_ref[0, 0]
    # Per-chain streams keyed by each chain's own seed — independent of
    # block size and mesh layout (prng.chain_streams).
    g = prng.chain_streams(cs_ref[:])

    qi_o[:] = qi_in[:]
    qj_o[:] = qj_in[:]
    qk_o[:] = qk_in[:]
    qc_o[:] = qc_in[:]
    occ_o[:] = occ_in[:]
    bqc_o[:] = bqc_in[:]

    iota_q = lax.broadcasted_iota(jnp.int32, (QS, c_blk), 0)
    iota_w = lax.broadcasted_iota(jnp.int32, (n_words, c_blk), 0)
    bin_iota = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

    def occupied(occ, cell):
        """(1, C) int32 0/1: is per-chain cell occupied in the bitfield?"""
        hit = jnp.where(iota_w == cell // 32, occ, 0)
        w = _reduce_rows(hit, n_words)
        return (w >> (cell % 32)) & 1

    def bin_of(gstep):
        return jnp.minimum(gstep * nb // spec.n_steps, nb - 1)

    def one_step(gstep, carry):
        qi, qj, qk, qc, occ = qi_o[:], qj_o[:], qk_o[:], qc_o[:], occ_o[:]
        e, be, bs, ni, st, acc_a, acc_t = carry

        base = prng.step_base(g, gstep)
        w_q, w_u = prng.words_from_base(base)
        q_idx = w_q % jnp.int32(Q)
        u = prng.uniform01(w_u)

        # Extract the mover's cell through the packed plane: one masked
        # reduce instead of three (pad rows can't be selected: q_idx < Q).
        sel = iota_q == q_idx
        old_cell = _reduce_rows(sel.astype(jnp.int32) * qc, QS)
        ox = old_cell // (N * N)
        oy = (old_cell // N) % N
        oz = old_cell % N

        # Uniform unoccupied cell, EXACT rejection sampling: a few unrolled
        # attempts cover almost every lane (P(miss) = occupancy^k), then a
        # while_loop drains stragglers — same candidate word sequence either
        # way, so the loop is deterministic and replayable.  Matches the
        # reference's unbounded loop (experiments.py:226-231) exactly.
        new_cell = old_cell
        found = jnp.zeros_like(old_cell)

        def attempt(a, new_cell, found):
            w = prng.word_from_base(base, _A_SALT + a)
            cand = w % jnp.int32(N3)
            free = 1 - occupied(occ, cand)
            take = (1 - found) * free
            new_cell = jnp.where(take == 1, cand, new_cell)
            found = jnp.maximum(found, free)
            return new_cell, found

        for a in range(n_attempts):
            new_cell, found = attempt(jnp.int32(a), new_cell, found)

        def att_cond(c):
            _, _, found = c
            return jnp.sum(found) < jnp.int32(c_blk)

        def att_body(c):
            a, new_cell, found = c
            new_cell, found = attempt(a, new_cell, found)
            return a + jnp.int32(1), new_cell, found

        _, new_cell, found = lax.while_loop(
            att_cond, att_body, (jnp.int32(n_attempts), new_cell, found)
        )

        nx = new_cell // (N * N)
        ny = (new_cell // N) % N
        nz = new_cell % N

        # One fused one-vs-all pass: net attack change per queen row, one
        # reduce.  The mover's own row contributes ind(old vs new) - 8
        # (self row gives 8, see _attack_ind); cancel it with a cheap (1, C)
        # evaluation instead of masking the (QS, C) pass.
        att = (_attack_ind(qi - nx, qj - ny, qk - nz)
               - _attack_ind(qi - ox, qj - oy, qk - oz))
        mover = _attack_ind(ox - nx, oy - ny, oz - nz)
        d_e = _reduce_rows(att, QS) - mover + jnp.int32(8)

        gstep_f = jnp.full((1, 1), 0, jnp.float32) + gstep.astype(jnp.float32)
        beta = spec.schedule(gstep_f)
        accept = u < jnp.exp(-beta * d_e.astype(jnp.float32))

        done = st < spec.n_steps
        active = jnp.logical_and(~done, gstep < spec.n_steps)
        upd = jnp.logical_and(jnp.logical_and(accept, active), found == 1)

        sel_upd = jnp.logical_and(sel, upd)
        qi_o[:] = jnp.where(sel_upd, nx, qi)
        qj_o[:] = jnp.where(sel_upd, ny, qj)
        qk_o[:] = jnp.where(sel_upd, nz, qk)
        qc_new = jnp.where(sel_upd, new_cell, qc)
        qc_o[:] = qc_new

        updi = upd.astype(jnp.int32)
        old_mask = jnp.where(iota_w == old_cell // 32,
                             updi << (old_cell % 32), 0)
        new_mask = jnp.where(iota_w == new_cell // 32,
                             updi << (new_cell % 32), 0)
        occ_o[:] = (occ & ~old_mask) | new_mask

        e = e + jnp.where(upd, d_e, 0)
        improved = jnp.logical_and(upd, e < be)
        bqc_o[:] = jnp.where(improved, qc_new, bqc_o[:])
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
    # Split accumulators assume a group spans <= 2 bins (bin width >= the
    # unroll factor); toy configs with narrower bins use per-step one-hots.
    exact_bins = spec.n_steps // spec.n_bins < unroll

    def body(t, carry):
        e, be, bs, ni, st, ab, tb = carry
        g0 = step0 + t * unroll
        b0 = bin_of(g0)
        b1 = bin_of(g0 + (unroll - 1))
        accs = (zrow, zrow, zrow, zrow)
        inner = (e, be, bs, ni, st)
        for k in range(unroll):
            gstep = g0 + k
            second = bin_of(gstep) == b1
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
            oh0 = (bin_iota == b0).astype(jnp.int32)
            oh1 = (bin_iota == b1).astype(jnp.int32)
            ab = ab + oh0 * a0 + oh1 * a1
            tb = tb + oh0 * t0 + oh1 * t1
        return (*inner, ab, tb)

    carry = (e_in[:], be_in[:], bs_in[:], ni_in[:], st_in[:],
             ab_in[:], tb_in[:])
    carry = lax.fori_loop(0, n_groups, body, carry)
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


def _qs(Q: int) -> int:
    return -(-Q // 8) * 8


def _internal_state(carry: PallasFull3DCarry, N: int):
    """(C, X)-major carry -> (X, C) padded internal planes.

    Plane order: (qi, qj, qk, qc, occ, bqc, e, be, bs, ni, st, ab, tb, cs)
    where ``qc`` is the packed-cell plane ((i*N + j)*N + k — one masked
    reduce extracts the mover's whole cell) and ``bqc`` is the packed best
    board (one select per improvement instead of three coordinate planes).
    """
    Q = carry.qi.shape[1]
    QS = _qs(Q)
    pad = QS - Q

    def plane(x, fill):
        t = x.T.astype(jnp.int32)
        if pad:
            t = jnp.concatenate(
                [t, jnp.full((pad, t.shape[1]), fill, jnp.int32)], axis=0
            )
        return t

    def packed(xi, xj, xk):
        return ((xi * N + xj) * N + xk).astype(jnp.int32)

    # Pad rows get sentinel coordinates (never equal to a real coordinate
    # and never forming equal squared differences with cells in [0, N)).
    s = 1 << 10
    return (
        plane(carry.qi, s), plane(carry.qj, 3 * s), plane(carry.qk, 7 * s),
        plane(packed(carry.qi, carry.qj, carry.qk), 0),
        carry.occ.T.astype(jnp.int32),
        plane(packed(carry.best_qi, carry.best_qj, carry.best_qk), 0),
        carry.energy.T, carry.best_energy.T, carry.best_step.T,
        carry.no_improve.T, carry.stop_step.T,
        carry.accept_bins.T, carry.total_bins.T,
        carry.chain_seeds.T.astype(jnp.int32),
    )


def _external_carry(block_seeds, st, Q: int, N: int) -> PallasFull3DCarry:
    qi, qj, qk, qc, occ, bqc, e, be, bs, ni, stp, ab, tb, cs = st
    b = bqc[:Q].T
    return PallasFull3DCarry(
        block_seeds=block_seeds,
        chain_seeds=cs.T,
        qi=qi[:Q].T, qj=qj[:Q].T, qk=qk[:Q].T, occ=occ.T,
        best_qi=b // (N * N), best_qj=(b // N) % N, best_qk=b % N,
        energy=e.T, best_energy=be.T, best_step=bs.T,
        no_improve=ni.T, stop_step=stp.T,
        accept_bins=ab.T, total_bins=tb.T,
    )


@functools.partial(jax.jit, static_argnames=("spec", "n_inner"))
def _run_block_segment(st, block_seeds, step0, spec: ChainSpec, n_inner: int):
    QS, C = st[0].shape
    n_blocks = block_seeds.shape[0]
    c_blk = C // n_blocks
    nb = spec.n_bins
    n_words = st[4].shape[0]

    def cs(rows):
        return pl.BlockSpec((rows, c_blk), lambda b: (0, b),
                            memory_space=pltpu.VMEM)

    state_specs = ([cs(QS)] * 4 + [cs(n_words)] + [cs(QS)]
                   + [cs(1)] * 5 + [cs(nb)] * 2)
    rows_of = [QS] * 4 + [n_words] + [QS] + [1] * 5 + [nb] * 2
    in_specs = [
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        cs(1),  # chain_seeds row (read-only)
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
    )(step0_arr, st[13], *st[:13])
    return tuple(outs) + (st[13],)


@functools.partial(jax.jit, static_argnames=("spec", "block"))
def init_carry_batch(seeds, spec: ChainSpec,
                     block: int | None = None,
                     initial_states=None) -> PallasFull3DCarry:
    """Carry from per-chain integer seeds (hash-based init, see fastinit)."""
    from mcqueens.core import fastinit

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
    e0 = tables_mod.batch_energies(
        queens,
        lambda q: tables_mod.table_energy(tables_mod.build_full3d_table(q, N)),
    )[:, None].astype(jnp.int32)

    block_seeds = (
        seeds[0].astype(jnp.int32)
        + 104729 * jnp.arange(n_blocks, dtype=jnp.int32)[:, None]
    )
    zeros = jnp.zeros((C, 1), jnp.int32)
    return PallasFull3DCarry(
        block_seeds=block_seeds,
        chain_seeds=seeds.astype(jnp.int32)[:, None],
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
    st = _internal_state(carry, spec.N)
    block_seeds = carry.block_seeds

    def chunk(s, outer_idx):
        s = _run_block_segment(s, block_seeds, outer_idx * stride, spec,
                               stride)
        return s, s[6][0]  # energy row -> (C,)

    st, ys = lax.scan(chunk, st, start_outer + jnp.arange(n_outer))
    return _external_carry(block_seeds, st, spec.q_eff, spec.N), ys


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
