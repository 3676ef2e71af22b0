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

Four design moves, in decreasing order of payoff:

1. **Shared lazy proposal.**  Each step draws ONE candidate cell per block,
   uniform over all N^3 cells (block-keyed counter stream).  A chain whose
   candidate is occupied auto-rejects (an invalid-target proposal with
   acceptance 0 — the chain is "lazy" for that step, which preserves its
   Boltzmann law; conditioned on the candidate being free the proposal law
   is exactly the reference's uniform-over-unoccupied).  This deletes the
   rejection while_loop AND the occupancy bitfield: a queen sitting on the
   candidate shows up in the same pass as an all-zero coordinate delta.
   Waste: Q/N^3 (= 1/N at Q = N^2) of steps are lazy.
2. **Mover held per 8-step chunk.**  The mover queen index is shared too,
   and redrawn only every ``_HOLD`` = 8 steps (a deterministic-scan
   Metropolis variant: each substep is still reversible w.r.t. the Boltzmann
   law, so the composition preserves it).  While the mover is fixed, its
   conflicts-at-current-cell propagate as a (1, C) row — an accepted move
   means ``old_conf <- new_conf`` — so the old-side one-vs-all pass runs
   once per chunk instead of every step.
3. **One batched sweep per chunk.**  All positions except the mover's are
   frozen within a chunk, so the chunk's 8 candidate-side passes AND the
   old-side pass evaluate against the same planes and fuse into a single
   blocked sweep: each (8, C) row block of (qi, qj, qk) is loaded once and
   scored against all 9 targets (3 loads amortized 9 ways; the 9
   independent accumulator chains also hide the reduce-tree latency that a
   per-step pass serializes on).  The attack indicator uses the 2-test
   form ``t_a = a2*(a2-m)`` per axis — ``t_a == 0`` iff ``a2`` is 0 or the
   maximum — giving attack = ``(t_p|t_q|t_r) == 0`` and occupancy =
   ``m == 0`` from the same subexpressions.
4. **Stale-plane algebra.**  The mover's plane row keeps its chunk-start
   value until the chunk-end write-back; (1, C) correction terms (stale
   contribution ``ind(o0, cand)``, stale/live occupancy swap) keep every
   per-step quantity exact.

Chains ride the lane axis; per-chain state is (QS, C) coordinate planes
(qi, qj, qk and the best-board planes bqi, bqj, bqk) plus (1, C)
bookkeeping rows.  Per-chain accept draws key on each chain's own seed
(:func:`mcqueens.kernels.prng.chain_streams` — layout-free); the
candidate/mover streams are block-keyed by design.  Best boards are exact
and group-amortized exactly as in ``board_shared``: one plane snapshot per
unroll group plus a newest-first revert of the logged moves.

Statistical contract — same genus as ``kernel='pallas_shared'`` for boards:
every chain is an exact Metropolis chain for its own Boltzmann law
(validated by the enumerable-state stationarity test), but chains within a
block share (candidate, mover) sequences and are therefore correlated; use
``kernel='pallas'`` / ``'tables'`` when runs must be independent.
Acceptance-bin denominators count every active step (occupied-candidate
proposals are rejections of the lazy chain), so measured acceptance rates
sit ~Q/N^3 below the reference's conditional-on-valid rates.

Measured on this host: see ``tools/roofline.py`` / ``docs/DESIGN.md`` §4.
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
from mcqueens.kernels import prng, sizing
from mcqueens.kernels.full3d_pallas import PallasFull3DCarry, _qs

DEFAULT_BLOCK = 2048
_LANE = 128
_UNROLL = 32
_UNROLL_SMALL = 8
_HOLD = 8  # steps the shared mover is held; a divisor of both unroll sizes,
# so chunk boundaries — and therefore trajectories — are unroll-invariant.

_CAND_SALT = np.int32(0x7F4A7C15)    # candidate-cell stream; deliberately
# distinct from board_shared._SITE_SALT (the block re-key formula is the
# same in both kernels, so a shared salt would make a board run and a
# full_3d run with equal user seeds draw identical shared-site streams)
_MOVER_SALT = np.int32(0x3C6EF372)   # mover-index stream
_OCC_BIT = 1 << 16  # occupancy rides the high bits of the fused sweep

def _pads(N: int):
    """Pad-row sentinel coordinates (N + 8, 2N + 16, 3N + 24).

    Two constraints (unlike full3d_pallas's large power-of-two sentinels):
    every pad delta magnitude against a real coordinate is nonzero AND the
    three magnitude ranges are pairwise disjoint (|di| <= N+8 < N+17 <=
    |dj| <= 2N+16 < 2N+25 <= |dk|), so no pad row can pass the attack test
    *in exact arithmetic*; and all squares stay small enough (<= (3N+24)^2,
    14400 at N=32) that the kernel's a2*(a2-m) products are exact in int32.
    Power-of-two sentinels would wrap those products mod 2^32 and can alias
    to zero (2-adic valuation >= 32), forging an attack.

    The exactness precondition is checked, not assumed: the worst product
    magnitude is max_{a2 in [0, m]} a2*(m - a2) = m^2/4 at m = (3N+24)^2,
    so int32 exactness needs (3N+24)^4 < 2^33 — it silently stops holding
    at N >= 94.
    """
    if (3 * N + 24) ** 4 >= 2 ** 33:
        raise ValueError(
            f"full3d_shared supports N <= 93: its pad sentinels need "
            f"(3N+24)^4 < 2^33 for the a2*(a2-m) attack products to stay "
            f"exact in int32 arithmetic (got N={N}); use kernel='pallas' "
            f"for larger boards")
    return N + 8, 2 * N + 16, 3 * N + 24


def block_size(n_chains: int, spec=None) -> int:
    """Chains per VMEM block; pass ``spec`` to cap the block by scoped VMEM
    (6 (QS, block) i32 coordinate layouts resident per block)."""
    cap = DEFAULT_BLOCK
    if spec is not None:
        cap = sizing.block_cap(6 * (-(-spec.q_eff // 8) * 8), DEFAULT_BLOCK)
    return sizing.block_size(n_chains, cap)


def padded_chains(n_chains: int, spec=None) -> int:
    blk = block_size(n_chains, spec)
    return -(-n_chains // blk) * blk


def _kernel(step0_ref, seed_ref, cs_in, *refs,
            spec: ChainSpec, n_inner: int, tempered: bool = False):
    if tempered:
        # Per-chain beta scale row (parallel tempering): effective beta is
        # spec.schedule(step) * beta_scale[chain] — same contract as
        # board_shared's tempered mode.
        beta_in, *refs = refs
    (qi_in, qj_in, qk_in, bqi_in, bqj_in, bqk_in,
     e_in, be_in, bs_in, ni_in, st_in, ab_in, tb_in,
     qi_o, qj_o, qk_o, bqi_o, bqj_o, bqk_o,
     e_o, be_o, bs_o, ni_o, st_o, ab_o, tb_o) = refs
    N = spec.N
    Q = spec.q_eff
    N3 = N * N * N
    QS = qi_in.shape[0]
    c_blk = qi_in.shape[1]
    nb = spec.n_bins

    seed = seed_ref[pl.program_id(0), 0]
    step0 = step0_ref[0, 0]
    beta_scale = beta_in[:] if tempered else None
    cand_base = seed * jnp.int32(0x2545F491) + _CAND_SALT
    mover_base = seed * jnp.int32(0x2545F491) + _MOVER_SALT
    g = prng.chain_streams(cs_in[:])

    qi_o[:] = qi_in[:]
    qj_o[:] = qj_in[:]
    qk_o[:] = qk_in[:]
    bqi_o[:] = bqi_in[:]
    bqj_o[:] = bqj_in[:]
    bqk_o[:] = bqk_in[:]

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
        plane[pl.ds(q8, 8), :] = jnp.where(iota8 == qsub, value, blk)

    def bin_of(gstep):
        return jnp.minimum(gstep * nb // spec.n_steps, nb - 1)

    def scores(di, dj, dk):
        """Fused attack+occupancy score of one row block vs one target.

        attack (0/1, low bits) iff every |delta| is 0 or the common max —
        per axis ``a2*(a2-m) == 0`` since ``a2 <= m`` — plus _OCC_BIT iff
        all deltas are 0 (a queen on the target cell; its low contribution
        is then 1, removed by the caller's stale/occ corrections or unused
        on lazy steps).
        """
        p2 = di * di
        q2 = dj * dj
        r2 = dk * dk
        m = jnp.maximum(p2, jnp.maximum(q2, r2))
        t = (p2 * (p2 - m)) | (q2 * (q2 - m)) | (r2 * (r2 - m))
        # occupancy: all three squares zero <=> their max is zero (reuses m
        # instead of a separate p2|q2|r2 reduction).
        return jnp.where(t == 0, 1, 0) + jnp.where(
            m == 0, jnp.int32(_OCC_BIT), 0)

    def chunk_sweep(cands, o0x, o0y, o0z):
        """ONE blocked pass scoring every row against the chunk's targets.

        Returns ([(1, C) score per candidate], (1, C) old-side score).
        Scores carry attackers in the low bits, occupancy in the high bits.
        """
        K = len(cands)
        accs = [None] * (K + 1)
        for base in range(0, QS, 8):
            bi = qi_o[base:base + 8, :]
            bj = qj_o[base:base + 8, :]
            bk = qk_o[base:base + 8, :]
            parts = [scores(bi - cx, bj - cy, bk - cz)
                     for (_, cx, cy, cz) in cands]
            parts.append(scores(bi - o0x, bj - o0y, bk - o0z))
            for idx in range(K + 1):
                accs[idx] = parts[idx] if accs[idx] is None else (
                    accs[idx] + parts[idx])

        def tree(a):
            a = a[0:4, :] + a[4:8, :]
            a = a[0:2, :] + a[2:4, :]
            return a[0:1, :] + a[1:2, :]

        return [tree(a) for a in accs[:K]], tree(accs[K])

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
        ox, oy, oz = o0x, o0y, o0z

        cands = []
        for k in range(length):
            cand = cand_of(g0 + k)
            cx = cand // jnp.int32(N * N)
            cy = (cand // jnp.int32(N)) % jnp.int32(N)
            cz = cand % jnp.int32(N)
            cands.append((cand, cx, cy, cz))
        cand_scores, old_score = chunk_sweep(cands, o0x, o0y, o0z)
        # The mover's own plane row scores 1 + _OCC_BIT against o0.
        old_conf = (old_score & jnp.int32(0xFFFF)) - jnp.int32(1)
        # Stale corrections, one per candidate: the chunk-start mover's
        # attack/occupancy contribution to each candidate's score.
        stale = [scores(o0x - cx, o0y - cy, o0z - cz)
                 for (_, cx, cy, cz) in cands]

        move_log = []
        for k in range(length):
            gstep = g0 + k
            cand, cx, cy, cz = cands[k]
            _, w1 = prng.step_words(g, gstep)
            u = prng.uniform01(w1)

            total = cand_scores[k] - stale[k]
            live_on = jnp.logical_and(
                jnp.logical_and(ox == cx, oy == cy), oz == cz)
            occ = (total >> 16) + live_on.astype(jnp.int32)
            new_conf = (total & jnp.int32(0xFFFF)) + live_on.astype(jnp.int32)
            # (live_on also adds 1 to new_conf's low bits — irrelevant: the
            # step is lazy whenever the live mover sits on the candidate.)
            d_e = new_conf - old_conf

            gstep_f = (jnp.full((1, 1), 0, jnp.float32)
                       + gstep.astype(jnp.float32))
            beta = spec.schedule(gstep_f)
            if beta_scale is not None:
                beta = beta * beta_scale
            accept = u < jnp.exp(-beta * d_e.astype(jnp.float32))

            done = st < spec.n_steps
            active = jnp.logical_and(~done, gstep < spec.n_steps)
            free = occ == 0
            upd = jnp.logical_and(jnp.logical_and(accept, active), free)

            move_log.append((q8, qsub, ox, oy, oz, upd))
            ox = jnp.where(upd, cx, ox)
            oy = jnp.where(upd, cy, oy)
            oz = jnp.where(upd, cz, oz)
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
        return (e, be, bs, ni, st), move_log

    def flush_best(g0, chunk_logs, bs):
        """Group-amortized exact best tracking (board_shared scheme).

        Snapshot improved chains' coordinate planes, then undo the logged
        moves made after each chain's best step, newest first.  Moves within
        a chunk all target that chunk's mover row, so each chunk folds to
        three (1, C) values and one masked row write; chunks are processed
        newest first so repeated mover indices across chunks stay correct.
        """
        g_imp = bs > g0
        bqi_o[:] = jnp.where(g_imp, qi_o[:], bqi_o[:])
        bqj_o[:] = jnp.where(g_imp, qj_o[:], bqj_o[:])
        bqk_o[:] = jnp.where(g_imp, qk_o[:], bqk_o[:])
        for (chunk_g0, log) in reversed(chunk_logs):
            q8, qsub = log[0][0], log[0][1]
            rx = read_row(bqi_o, q8, qsub)
            ry = read_row(bqj_o, q8, qsub)
            rz = read_row(bqk_o, q8, qsub)
            for k in reversed(range(len(log))):
                _, _, px, py, pz, upd = log[k]
                gstep = chunk_g0 + k
                mask = jnp.logical_and(jnp.logical_and(g_imp, upd),
                                       bs <= gstep)
                rx = jnp.where(mask, px, rx)
                ry = jnp.where(mask, py, ry)
                rz = jnp.where(mask, pz, rz)
            rowmask = jnp.logical_and(iota8 == qsub, g_imp)
            blk = bqi_o[pl.ds(q8, 8), :]
            bqi_o[pl.ds(q8, 8), :] = jnp.where(rowmask, rx, blk)
            blk = bqj_o[pl.ds(q8, 8), :]
            bqj_o[pl.ds(q8, 8), :] = jnp.where(rowmask, ry, blk)
            blk = bqk_o[pl.ds(q8, 8), :]
            bqk_o[pl.ds(q8, 8), :] = jnp.where(rowmask, rz, blk)

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
    """(C, X) carry -> (X, C) planes: qi, qj, qk, bqi, bqj, bqk, rows, bins.

    Unlike full3d_pallas there is no occupancy bitfield (occupancy is read
    off the coordinate planes inside the fused sweep) and no packed-cell
    plane; the best board is three coordinate planes matching the carry.
    """
    Q = carry.qi.shape[1]
    QS = _qs(Q)
    pad = QS - Q
    pad_i, pad_j, pad_k = _pads(N)

    def plane(x, fill):
        t = x.T.astype(jnp.int32)
        if pad:
            t = jnp.concatenate(
                [t, jnp.full((pad, t.shape[1]), fill, jnp.int32)], axis=0
            )
        return t

    return (
        plane(carry.qi, pad_i), plane(carry.qj, pad_j),
        plane(carry.qk, pad_k),
        plane(carry.best_qi, pad_i), plane(carry.best_qj, pad_j),
        plane(carry.best_qk, pad_k),
        carry.energy.T, carry.best_energy.T, carry.best_step.T,
        carry.no_improve.T, carry.stop_step.T,
        carry.accept_bins.T, carry.total_bins.T,
        carry.chain_seeds.T.astype(jnp.int32),
    )


def _external_carry(block_seeds, occ, st, Q: int, N: int) -> PallasFull3DCarry:
    qi, qj, qk, bqi, bqj, bqk, e, be, bs, ni, stp, ab, tb, cs = st
    return PallasFull3DCarry(
        block_seeds=block_seeds,
        chain_seeds=cs.T,
        qi=qi[:Q].T, qj=qj[:Q].T, qk=qk[:Q].T, occ=occ,
        best_qi=bqi[:Q].T, best_qj=bqj[:Q].T, best_qk=bqk[:Q].T,
        energy=e.T, best_energy=be.T, best_step=bs.T,
        no_improve=ni.T, stop_step=stp.T,
        accept_bins=ab.T, total_bins=tb.T,
    )


def _block_segment_call(st, block_seeds, step0, spec: ChainSpec,
                        n_inner: int, beta_row=None):
    QS, C = st[0].shape
    n_blocks = block_seeds.shape[0]
    c_blk = C // n_blocks
    nb = spec.n_bins
    tempered = beta_row is not None

    def cs(rows):
        return pl.BlockSpec((rows, c_blk), lambda b: (0, b),
                            memory_space=pltpu.VMEM)

    state_specs = [cs(QS)] * 6 + [cs(1)] * 5 + [cs(nb)] * 2
    rows_of = [QS] * 6 + [1] * 5 + [nb] * 2
    beta_specs = [cs(1)] if tempered else []
    in_specs = [
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_blocks, 1), lambda b: (0, 0),
                     memory_space=pltpu.SMEM),
        cs(1),  # chain_seeds row (read-only)
        *beta_specs,
    ] + state_specs
    out_shape = tuple(
        jax.ShapeDtypeStruct((r, C), jnp.int32) for r in rows_of
    )
    step0_arr = (jnp.zeros((1, 1), jnp.int32) + step0).astype(jnp.int32)
    beta_args = (beta_row,) if tempered else ()
    n_state_in = 3 + len(beta_args)

    outs = pl.pallas_call(
        functools.partial(_kernel, spec=spec, n_inner=n_inner,
                          tempered=tempered),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=tuple(state_specs),
        out_shape=out_shape,
        input_output_aliases={i + n_state_in: i for i in range(len(rows_of))},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(step0_arr, block_seeds, st[13], *beta_args, *st[:13])
    return tuple(outs) + (st[13],)


@functools.partial(jax.jit, static_argnames=("spec", "n_inner"))
def _run_block_segment(st, block_seeds, step0, spec: ChainSpec, n_inner: int):
    return _block_segment_call(st, block_seeds, step0, spec, n_inner)


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
        block = block_size(jnp.shape(seeds)[0], spec)
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
        return s, s[6][0]  # energy row -> (C,)

    st, ys = lax.scan(chunk, st, start_outer + jnp.arange(n_outer))
    return _external_carry(block_seeds, occ, st, spec.q_eff, spec.N), ys


@functools.partial(jax.jit, static_argnames=("spec", "n_outer"))
def run_segment_tempered(carry: PallasFull3DCarry, beta_scale, start_outer,
                         spec: ChainSpec, n_outer: int):
    """:func:`run_segment` with a per-chain beta scale (parallel tempering).

    Same contract as :func:`board_shared.run_segment_tempered`: each chain
    samples at ``spec.schedule(step) * beta_scale[chain]``; exchange moves
    between segments live in :mod:`mcqueens.search.tempering`.
    """
    stride = spec.history_stride
    st = _internal_state(carry, spec.N)
    block_seeds = carry.block_seeds
    occ = carry.occ
    beta_row = jnp.asarray(beta_scale, jnp.float32).reshape(1, -1)

    def chunk(s, outer_idx):
        s = _block_segment_call(s, block_seeds, outer_idx * stride, spec,
                                stride, beta_row=beta_row)
        return s, s[6][0]

    st, ys = lax.scan(chunk, st, start_outer + jnp.arange(n_outer))
    return _external_carry(block_seeds, occ, st, spec.q_eff, spec.N), ys


@functools.cache
def _sharded_segment_fn(spec: ChainSpec, n_outer: int, mesh):
    from mcqueens.dist import mesh as mesh_mod

    return mesh_mod.shard_segment_fn(
        lambda c, s: run_segment(c, s, spec, n_outer),
        PallasFull3DCarry, mesh)


def run_segment_sharded(carry, start_outer, spec, n_outer, mesh):
    return _sharded_segment_fn(spec, n_outer, mesh)(carry, start_outer)


@functools.cache
def _sharded_tempered_fn(spec: ChainSpec, n_outer: int, mesh):
    from mcqueens.dist import mesh as mesh_mod

    return mesh_mod.shard_segment_fn(
        lambda c, b, s: run_segment_tempered(c, b, s, spec, n_outer),
        PallasFull3DCarry, mesh, tempered=True)


def run_segment_tempered_sharded(carry, beta_scale, start_outer, spec,
                                 n_outer, mesh):
    """Tempered full_3d segments over a chains mesh (shard-local groups)."""
    return _sharded_tempered_fn(spec, n_outer, mesh)(
        carry, beta_scale, start_outer)
