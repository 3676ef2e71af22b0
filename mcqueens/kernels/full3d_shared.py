"""Pallas TPU kernel: shared-site full-3D Metropolis (throughput tier).

Round 2 left full_3d 20x behind the board flagship: the per-chain kernel
(:mod:`mcqueens.kernels.full3d_pallas`) pays two O(Q) one-vs-all coordinate
passes, an O(N^3/32) occupancy pass per rejection attempt, and a per-step
``lax.while_loop`` whose cross-lane cond reduce costs ~an attempt-pass even
when never entered.  This kernel removes all three with the board flagship's
trick (:mod:`mcqueens.kernels.board_shared`): chains in a VMEM block share
each step's proposal, so everything the proposal touches becomes scalar.
Reference chain being accelerated: ``/root/reference/experiments.py:199-279``
(sampler), ``/root/reference/mcmc.py:171-226`` (state/conflicts).

Three design moves, in decreasing order of payoff:

1. **Shared lazy proposal.**  Each step draws ONE candidate cell per block,
   uniform over all N^3 cells (block-keyed counter stream).  A chain whose
   candidate is occupied auto-rejects (an invalid-target proposal with
   acceptance 0 — the chain is "lazy" for that step, which preserves its
   Boltzmann law; conditioned on the candidate being free the proposal law
   is exactly the reference's uniform-over-unoccupied).  This deletes the
   rejection while_loop AND the occupancy bitfield: occupancy of the scalar
   candidate is read off the packed-cell plane inside the same one-vs-all
   pass (a queen sitting on the candidate shows up as ``qc == cand``).
   Waste: Q/N^3 (= 1/N at Q = N^2) of steps are lazy.
2. **Mover held per 8-step chunk.**  The mover queen index is shared too,
   and redrawn only every ``_HOLD`` = 8 steps (a deterministic-scan
   Metropolis variant: each substep is still reversible w.r.t. the Boltzmann
   law, so the composition preserves it).  While the mover is fixed, its
   conflicts-at-current-cell propagate as a (1, C) row — accepted move means
   ``old_conf <- new_conf`` — so the per-step work drops to ONE one-vs-all
   pass (the candidate side); the old-side pass runs once per chunk.
3. **Stale-plane algebra.**  Within a chunk the mover's row in the
   coordinate planes is left at its chunk-start value (planes are only
   rewritten at chunk end); the pass result is corrected with cheap (1, C)
   terms: subtract the stale mover's contribution ``ind(o0, cand)``, and fix
   the occupancy count with ``-(o0c == cand) + (oc == cand)``.  All other
   queens are immobile within the chunk, so their plane rows are exact.

Chains ride the lane axis as in the other round-2+ kernels; per-chain state
is (QS, C) coordinate planes (qi, qj, qk, packed cell qc, packed best bqc)
plus (1, C) bookkeeping rows.  Per-chain accept draws key on each chain's
own seed (:func:`mcqueens.kernels.prng.chain_streams` — layout-free);
candidate/mover streams are block-keyed by design.  Best boards are exact
and group-amortized exactly as in ``board_shared``: one full-plane snapshot
per unroll group plus a newest-first revert of the logged moves.

Statistical contract — same genus as ``kernel='pallas_shared'`` for boards:
every chain is an exact Metropolis chain for its own Boltzmann law
(validated by the enumerable-state stationarity test), but chains within a
block share (candidate, mover) sequences and are therefore correlated; use
``kernel='pallas'`` / ``'tables'`` when runs must be independent.
Acceptance-bin denominators count every active step (occupied-candidate
proposals are rejections of the lazy chain), so measured acceptance rates
sit ~Q/N^3 below the reference's conditional-on-valid rates.

Measured on this host: see ``tools/roofline.py`` / ``docs/DESIGN.md`` §4
(target: close the 20x full_3d gap to >= 4e8 moves/s/chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcqueens.chain.spec import ChainSpec
from mcqueens.core import tables as tables_mod
from mcqueens.kernels import prng
from mcqueens.kernels.full3d_pallas import (
    PallasFull3DCarry,
    _attack_ind,
    _qs,
    _reduce_rows,
)

DEFAULT_BLOCK = 2048
_LANE = 128
_UNROLL = 32
_UNROLL_SMALL = 8
_HOLD = 8  # steps the shared mover is held; a divisor of both unroll sizes,
# so chunk boundaries — and therefore trajectories — are unroll-invariant.

_CAND_SALT = np.int32(-1640531527)   # 0x9E3779B9: candidate-cell stream
_MOVER_SALT = np.int32(0x3C6EF372)   # mover-index stream
_OCC_BIT = 1 << 16  # occupancy rides the high bits of the fused pass

# Pad-row sentinels: distinct magnitudes so no pad row can satisfy the
# attack relation against any real cell (same scheme as full3d_pallas).
_PAD_I, _PAD_J, _PAD_K = 1 << 10, 3 << 10, 7 << 10


def block_size(n_chains: int) -> int:
    if n_chains >= DEFAULT_BLOCK:
        return DEFAULT_BLOCK
    return -(-n_chains // _LANE) * _LANE


def padded_chains(n_chains: int) -> int:
    blk = block_size(n_chains)
    return -(-n_chains // blk) * blk


def _kernel(step0_ref, seed_ref, cs_in,
            qi_in, qj_in, qk_in, qc_in, bqc_in,
            e_in, be_in, bs_in, ni_in, st_in, ab_in, tb_in,
            qi_o, qj_o, qk_o, qc_o, bqc_o,
            e_o, be_o, bs_o, ni_o, st_o, ab_o, tb_o,
            *, spec: ChainSpec, n_inner: int):
    N = spec.N
    Q = spec.q_eff
    N3 = N * N * N
    QS = qi_in.shape[0]
    c_blk = qi_in.shape[1]
    nb = spec.n_bins

    seed = seed_ref[pl.program_id(0), 0]
    step0 = step0_ref[0, 0]
    cand_base = seed * jnp.int32(0x2545F491) + _CAND_SALT
    mover_base = seed * jnp.int32(0x2545F491) + _MOVER_SALT
    g = prng.chain_streams(cs_in[:])

    qi_o[:] = qi_in[:]
    qj_o[:] = qj_in[:]
    qk_o[:] = qk_in[:]
    qc_o[:] = qc_in[:]
    bqc_o[:] = bqc_in[:]

    iota8 = lax.broadcasted_iota(jnp.int32, (8, c_blk), 0)
    bin_iota = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

    def mover_of(chunk_g0):
        w = prng.lowbias32(chunk_g0 ^ mover_base) & jnp.int32(0x7FFFFFFF)
        return w % jnp.int32(Q)

    def cand_of(gstep):
        hv = prng.lowbias32(gstep ^ cand_base) & jnp.int32(0x7FFFFFFF)
        return hv % jnp.int32(N3)

    def read_row(plane, q8, qsub):
        blk = plane[pl.ds(q8, 8), :]
        return pltpu.roll(blk, (8 - qsub) % 8, 0)[0:1, :]

    def write_row(plane, q8, qsub, value):
        blk = plane[pl.ds(q8, 8), :]
        plane[pl.ds(q8, 8), :] = jnp.where(iota8[0:8] == qsub, value, blk)

    def bin_of(gstep):
        return jnp.minimum(gstep * nb // spec.n_steps, nb - 1)

    def run_chunk(g0, length, carry, bins_cb):
        """``length`` substeps with one shared mover; returns the move log.

        ``bins_cb(gstep, da, dt)`` routes each substep's (1, C) accept/total
        increments to the caller's bin accumulators.
        """
        e, be, bs, ni, st = carry
        q_idx = mover_of(g0)
        q8 = (q_idx // 8) * 8
        qsub = q_idx % 8
        # Chunk-start (stale) mover position — stays in the planes until the
        # write-back below; the live position lives in (1, C) rows.
        o0x = read_row(qi_o, q8, qsub)
        o0y = read_row(qj_o, q8, qsub)
        o0z = read_row(qk_o, q8, qsub)
        o0c = read_row(qc_o, q8, qsub)
        ox, oy, oz, oc = o0x, o0y, o0z, o0c
        # Fresh old-side conflicts: one one-vs-all pass per chunk.  The
        # mover's own plane row contributes the degenerate self value 8.
        att0 = _attack_ind(qi_o[:] - o0x, qj_o[:] - o0y, qk_o[:] - o0z)
        old_conf = _reduce_rows(att0, QS) - jnp.int32(8)

        move_log = []
        for k in range(length):
            gstep = g0 + k
            cand = cand_of(gstep)
            cx = cand // jnp.int32(N * N)
            cy = (cand // jnp.int32(N)) % jnp.int32(N)
            cz = cand % jnp.int32(N)
            _, w1 = prng.step_words(g, gstep)
            u = prng.uniform01(w1)

            # Fused candidate-side pass: attackers of the candidate cell in
            # the low bits, occupancy count in the high bits (a queen ON the
            # candidate contributes ind = 8 low + _OCC_BIT high; distinct
            # cells contribute 0/1 low).
            qi, qj, qk, qc = qi_o[:], qj_o[:], qk_o[:], qc_o[:]
            fused = _attack_ind(qi - cx, qj - cy, qk - cz) + (
                (qc == cand).astype(jnp.int32) * jnp.int32(_OCC_BIT)
            )
            total = _reduce_rows(fused, QS)
            occ = total >> 16
            low = total & jnp.int32(0xFFFF)
            # Stale-plane corrections, all (1, C): remove the stale mover
            # row's contribution (it is the live mover's when no move was
            # accepted yet, and a ghost otherwise), and swap the stale
            # occupancy for the live mover's.  When the corrected occupancy
            # is nonzero the step is lazy and new_conf goes unused, so the
            # on-candidate queen's degenerate low contribution (8) is
            # harmless.
            stale_ind = _attack_ind(o0x - cx, o0y - cy, o0z - cz)
            occ = (occ - (o0c == cand).astype(jnp.int32)
                   + (oc == cand).astype(jnp.int32))
            new_conf = low - stale_ind
            d_e = new_conf - old_conf

            gstep_f = (jnp.full((1, 1), 0, jnp.float32)
                       + gstep.astype(jnp.float32))
            beta = spec.schedule(gstep_f)
            accept = u < jnp.exp(-beta * d_e.astype(jnp.float32))

            done = st < spec.n_steps
            active = jnp.logical_and(~done, gstep < spec.n_steps)
            free = occ == 0
            upd = jnp.logical_and(jnp.logical_and(accept, active), free)

            move_log.append((q8, qsub, oc, upd))
            ox = jnp.where(upd, cx, ox)
            oy = jnp.where(upd, cy, oy)
            oz = jnp.where(upd, cz, oz)
            oc = jnp.where(upd, cand, oc)
            old_conf = jnp.where(upd, new_conf, old_conf)

            e = e + jnp.where(upd, d_e, 0)
            improved = jnp.logical_and(upd, e < be)
            be = jnp.where(improved, e, be)
            bs = jnp.where(improved, gstep + 1, bs)
            ni = jnp.where(active, jnp.where(improved, 0, ni + 1), ni)
            if spec.early_stop_patience is not None:
                newly = jnp.logical_and(active,
                                        ni >= spec.early_stop_patience)
                st = jnp.where(newly, gstep, st)
            # Occupied-candidate steps count as rejected proposals of the
            # lazy chain (header: "Statistical contract").
            bins_cb(gstep, upd.astype(jnp.int32), active.astype(jnp.int32))

        # Write the live mover position back into the planes.
        write_row(qi_o, q8, qsub, ox)
        write_row(qj_o, q8, qsub, oy)
        write_row(qk_o, q8, qsub, oz)
        write_row(qc_o, q8, qsub, oc)
        return (e, be, bs, ni, st), move_log

    def flush_best(g0, chunk_logs, bs):
        """Group-amortized exact best tracking (board_shared scheme).

        Snapshot improved chains' packed boards, then undo the logged moves
        made after each chain's best step, newest first.  Moves within a
        chunk all target that chunk's mover row, so each chunk folds to one
        (1, C) value and one masked row write; chunks are processed newest
        first so repeated mover indices across chunks stay correct.
        """
        g_imp = bs > g0
        bqc_o[:] = jnp.where(g_imp, qc_o[:], bqc_o[:])
        for (chunk_g0, log) in reversed(chunk_logs):
            q8, qsub = log[0][0], log[0][1]
            row = read_row(bqc_o, q8, qsub)
            for k in reversed(range(len(log))):
                _, _, oc_before, upd = log[k]
                gstep = chunk_g0 + k
                mask = jnp.logical_and(jnp.logical_and(g_imp, upd),
                                       bs <= gstep)
                row = jnp.where(mask, oc_before, row)
            blk = bqc_o[pl.ds(q8, 8), :]
            bqc_o[pl.ds(q8, 8), :] = jnp.where(
                jnp.logical_and(iota8[0:8] == qsub, g_imp), row, blk)

    zrow = jnp.zeros((1, c_blk), jnp.int32)
    unroll = _UNROLL if n_inner >= 1024 else _UNROLL_SMALL
    n_groups = n_inner // unroll
    exact_bins = spec.n_steps // spec.n_bins < unroll

    def body(t, carry):
        e, be, bs, ni, st, ab, tb = carry
        g0 = step0 + t * unroll
        b0 = bin_of(g0)
        b1 = bin_of(g0 + (unroll - 1))
        # Mutable holder so run_chunk can accumulate bin counts: exact mode
        # scatters a per-step one-hot; split mode routes each step's counts
        # to (first-bin, second-bin) accumulators flushed once per group
        # (the board_shared scheme — a group spans <= 2 bins there).
        hold = {"ab": ab, "tb": tb, "a0": zrow, "a1": zrow,
                "t0": zrow, "t1": zrow}

        if exact_bins:
            def bins_cb(gstep, da, dt):
                oh = (bin_iota == bin_of(gstep)).astype(jnp.int32)
                hold["ab"] = hold["ab"] + oh * da
                hold["tb"] = hold["tb"] + oh * dt
        else:
            def bins_cb(gstep, da, dt):
                is2 = jnp.where(bin_of(gstep) == b1, 1, 0)
                hold["a0"] = hold["a0"] + da * (1 - is2)
                hold["a1"] = hold["a1"] + da * is2
                hold["t0"] = hold["t0"] + dt * (1 - is2)
                hold["t1"] = hold["t1"] + dt * is2

        inner = (e, be, bs, ni, st)
        chunk_logs = []
        for m in range(unroll // _HOLD):
            chunk_g0 = g0 + m * _HOLD
            inner, log = run_chunk(chunk_g0, _HOLD, inner, bins_cb)
            chunk_logs.append((chunk_g0, log))
        e, be, bs, ni, st = inner
        ab, tb = hold["ab"], hold["tb"]
        if not exact_bins:
            oh0 = (bin_iota == b0).astype(jnp.int32)
            oh1 = (bin_iota == b1).astype(jnp.int32)
            ab = ab + oh0 * hold["a0"] + oh1 * hold["a1"]
            tb = tb + oh0 * hold["t0"] + oh1 * hold["t1"]
        flush_best(g0, chunk_logs, bs)
        return (e, be, bs, ni, st, ab, tb)

    carry = (e_in[:], be_in[:], bs_in[:], ni_in[:], st_in[:],
             ab_in[:], tb_in[:])
    carry = lax.fori_loop(0, n_groups, body, carry)

    # Tail steps: chunks of _HOLD then a remainder chunk, exact bins, with
    # per-chunk best flush (chunk starts land on the same absolute offsets
    # as any unroll factor would produce — trajectories are unroll-invariant).
    e, be, bs, ni, st, ab, tb = carry
    tail0 = step0 + n_groups * unroll
    n_tail = n_inner - n_groups * unroll
    off = 0
    while off < n_tail:
        length = min(_HOLD, n_tail - off)
        chunk_g0 = tail0 + off
        hold = {"ab": ab, "tb": tb}

        def tail_bins(gstep, da, dt):
            oh = (bin_iota == bin_of(gstep)).astype(jnp.int32)
            hold["ab"] = hold["ab"] + oh * da
            hold["tb"] = hold["tb"] + oh * dt

        (e, be, bs, ni, st), log = run_chunk(
            chunk_g0, length, (e, be, bs, ni, st), tail_bins)
        ab, tb = hold["ab"], hold["tb"]
        flush_best(chunk_g0, [(chunk_g0, log)], bs)
        off += length

    e_o[:] = e
    be_o[:] = be
    bs_o[:] = bs
    ni_o[:] = ni
    st_o[:] = st
    ab_o[:] = ab
    tb_o[:] = tb


def _internal_state(carry: PallasFull3DCarry, N: int):
    """(C, X) carry -> (X, C) planes: qi, qj, qk, qc, bqc, rows, bins, cs.

    Unlike full3d_pallas there is no occupancy bitfield (occupancy is read
    off the qc plane inside the fused pass) and the qc pad rows hold -1
    (a value no candidate cell can take), not 0.
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

    return (
        plane(carry.qi, _PAD_I), plane(carry.qj, _PAD_J),
        plane(carry.qk, _PAD_K),
        plane(packed(carry.qi, carry.qj, carry.qk), -1),
        plane(packed(carry.best_qi, carry.best_qj, carry.best_qk), -1),
        carry.energy.T, carry.best_energy.T, carry.best_step.T,
        carry.no_improve.T, carry.stop_step.T,
        carry.accept_bins.T, carry.total_bins.T,
        carry.chain_seeds.T.astype(jnp.int32),
    )


def _external_carry(block_seeds, occ, st, Q: int, N: int) -> PallasFull3DCarry:
    qi, qj, qk, qc, bqc, e, be, bs, ni, stp, ab, tb, cs = st
    b = bqc[:Q].T
    return PallasFull3DCarry(
        block_seeds=block_seeds,
        chain_seeds=cs.T,
        qi=qi[:Q].T, qj=qj[:Q].T, qk=qk[:Q].T, occ=occ,
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

    def cs(rows):
        return pl.BlockSpec((rows, c_blk), lambda b: (0, b),
                            memory_space=pltpu.VMEM)

    state_specs = [cs(QS)] * 5 + [cs(1)] * 5 + [cs(nb)] * 2
    rows_of = [QS] * 5 + [1] * 5 + [nb] * 2
    in_specs = [
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_blocks, 1), lambda b: (0, 0),
                     memory_space=pltpu.SMEM),
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
        input_output_aliases={i + 3: i for i in range(len(rows_of))},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(step0_arr, block_seeds, st[12], *st[:12])
    return tuple(outs) + (st[12],)


@functools.partial(jax.jit, static_argnames=("spec", "block"))
def init_carry_batch(seeds, spec: ChainSpec,
                     block: int | None = None,
                     initial_states=None) -> PallasFull3DCarry:
    """Carry from per-chain seeds; same contract as full3d_pallas's.

    The ``occ`` field is kept for carry compatibility (checkpoints, runner)
    but the shared kernel never reads it.
    """
    from mcqueens.kernels import full3d_pallas

    if block is None:
        block = block_size(jnp.shape(seeds)[0])
    carry = full3d_pallas.init_carry_batch(
        seeds, spec, block=block, initial_states=initial_states)
    # Re-key the block seeds so shared-candidate streams differ from any
    # concurrently running per-chain kernel blocks.
    return carry._replace(
        block_seeds=carry.chain_seeds[0, 0].astype(jnp.int32)
        + 7919 * jnp.arange(carry.block_seeds.shape[0],
                            dtype=jnp.int32)[:, None]
    )


@functools.partial(jax.jit, static_argnames=("spec", "n_outer"))
def run_segment(carry: PallasFull3DCarry, start_outer, spec: ChainSpec,
                n_outer: int):
    stride = spec.history_stride
    st = _internal_state(carry, spec.N)
    block_seeds = carry.block_seeds
    occ = carry.occ

    def chunk(s, outer_idx):
        s = _run_block_segment(s, block_seeds, outer_idx * stride, spec,
                               stride)
        return s, s[5][0]  # energy row -> (C,)

    st, ys = lax.scan(chunk, st, start_outer + jnp.arange(n_outer))
    return _external_carry(block_seeds, occ, st, spec.q_eff, spec.N), ys


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
