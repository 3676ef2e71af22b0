"""Pallas TPU kernel: shared-site board Metropolis with O(N) work per move.

The round-1 kernel (:mod:`mcqueens.kernels.metropolis_pallas`) evaluates
delta-E against all N^2 board cells per proposal because Mosaic exposes no
per-lane gather.  But a board move at column (i, j) can only change conflicts
with queens in row i, column j, and the two (i, j)-diagonals — O(4N) cells
(the locality behind the count tables, ``mcqueens/core/tables.py``; reference
hot loop: ``/root/reference/experiments.py:308-355``).  This kernel extracts
exactly those cells with *dynamic sublane slices*, which Mosaic supports when
the offset is provably a multiple of 8.

The price of sliceability is that the slice offsets are scalars, so every
chain in a VMEM block proposes the **same site (i, j) each step** (its own
``new_k`` and accept draw remain per-chain).  Each chain is still an exact
random-scan Metropolis chain — sites are uniform i.i.d., the proposal law and
acceptance rule match the reference — but chains *within a block* share the
site sequence, so they are not mutually independent.  Use this kernel for
throughput-bound work (benchmarks, competition search, pod-scale sampling);
use ``kernel="pallas"``/``"tables"`` when runs must be statistically
independent (reference-parity sweeps).  Blocks get independent site streams,
so runs placed in different blocks stay independent.

Memory layout (measured on the target — see ``tools/probe_slice.py`` and
``docs/DESIGN.md``): chains live on the *lane* axis so per-chain bookkeeping
rows cost ~0.008 VREG/chain instead of 0.125 for (C, 1) columns.  Four
line-major layouts of the same board make every line through (i, j) a
contiguous, 8-aligned sublane slice (SN = N rounded up to 8; pad rows hold a
sentinel so no validity masks are needed for them):

  * ``R``  — row-major:        ``R[SN*i + j']   = h[i, j']``
  * ``Cc`` — column-major:     ``Cc[SN*j + i']  = h[i', j]``
  * ``Sk`` — skew (diagonals): ``Sk[SN*t + r]   = h[r, (t + r) % N]``
    (column t holds the complementary diagonal pair ``j - i = t (mod N)``)
  * ``Ak`` — skew (antidiag.): ``Ak[SN*t + r]   = h[r, (t - r) % N]``

On each of the four 16-ish-row blocks the move delta uses one uniform
formula: a cell at line-offset ``delta`` from the site conflicts with height
``k`` there iff ``h' == k`` (axis / plane-k-diagonal family) or
``(h' - k)^2 == delta^2`` (the diagonal family in that plane) — the same
mutually-exclusive relation algebra as :mod:`mcqueens.kernels.delta_e`, so
``dE = sum(new) - sum(old) + 8`` (the +8 cancels the moving queen's own lane
in the four blocks).  Equality with the count-table delta is asserted by the
trajectory invariants in ``tests/test_shared_kernel.py``.

Best tracking is exact but *group-amortized*: the hot loop keeps only the
(1, C) ``best_energy``/``best_step`` rows per step and logs each sub-step's
(old_k, accepted) rows; once per ``_UNROLL`` group it snapshots improved
chains' boards and reverts the logged moves made after each chain's best
step (newest first), restoring the board exactly as of ``best_step``.  That
turns the one full-(S, C) pass per step — which dominated the round-2
kernel's step cost — into one per group.

Measured on this host (see BENCH history): ~2.09e9 proposed moves/s/chip at
N=16 with exact best tracking (2.18e9 with ``track_best=False``) — ~14x the
dense per-chain-site kernel and 2.1x the BASELINE.json north-star despite
the degraded tunnel.  The unroll factor adapts to the segment length
(32 for production strides, 8 for tiny ones) purely for code size: results
are unroll-invariant.
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
from mcqueens.kernels import prng, sizing
from mcqueens.kernels.metropolis_pallas import PallasBoardCarry

# Chains per VMEM block along the lane axis.  2048 lanes balances VMEM
# (5 layouts x S x C x 4B ~ 10 MB at N=16) against per-step fixed costs.
DEFAULT_BLOCK = 2048
_LANE = 128  # lane tile granularity
_UNROLL = 32  # sub-steps per fori iteration (amortizes PRNG + loop overhead)
_UNROLL_SMALL = 8  # for tiny segments (tests, short strides): 4x less
# straight-line kernel code, same bitwise results (the unroll factor only
# groups steps; trajectories, bins and best boards are unroll-invariant)

# Pad-row height: never equals a real height and never satisfies
# (SENTINEL - k)^2 == delta^2 for |delta| < SN, so pad rows contribute 0.
_SENTINEL = 1 << 12

_SITE_SALT = np.int32(-1640531527)  # 0x9E3779B9 as int32 (golden ratio)


def _sn(N: int) -> int:
    return -(-N // 8) * 8


def block_size(n_chains: int, spec=None) -> int:
    """Chains per VMEM block; pass ``spec`` to cap the block by scoped VMEM
    (5 (~N^2, block) i32 layouts resident per block — the default 2048
    block stops fitting the 100 MB limit at N >= 22)."""
    cap = DEFAULT_BLOCK
    if spec is not None:
        cap = sizing.block_cap(5 * _sn(spec.N) * spec.N, DEFAULT_BLOCK)
    return sizing.block_size(n_chains, cap)


def padded_chains(n_chains: int, spec=None) -> int:
    blk = block_size(n_chains, spec)
    return -(-n_chains // blk) * blk


@functools.cache
def _layout_maps(N: int):
    """(perm, valid) pairs mapping flat row-major cells -> each layout.

    ``perm[s]`` is the row-major cell index stored at internal sublane ``s``
    (arbitrary for pad rows, which ``valid`` marks False).
    """
    SN = _sn(N)
    S = SN * N
    b = np.arange(S) // SN  # block index (i / j / t depending on layout)
    r = np.arange(S) % SN   # offset within the block
    valid = r < N
    rc = np.minimum(r, N - 1)  # clamp pad rows to a legal source
    to_r = b * N + rc                      # R:  h[b, r]
    to_c = rc * N + b                      # Cc: h[r, b]
    to_sk = rc * N + ((b + rc) % N)        # Sk: h[r, (b + r) % N]
    to_ak = rc * N + ((b - rc) % N)        # Ak: h[r, (b - r) % N]
    inv_r = (np.arange(N * N) // N) * SN + (np.arange(N * N) % N)
    # numpy (not jnp): this is functools.cached, and materializing jnp
    # constants inside an active jit trace leaks tracers across traces.
    return (
        to_r.astype(np.int32), to_c.astype(np.int32),
        to_sk.astype(np.int32), to_ak.astype(np.int32),
        valid, inv_r.astype(np.int32),
    )


def _expand(h_t, perm, valid):
    """(NN, C) row-major transposed heights -> (S, C) padded layout."""
    out = jnp.take(h_t, perm, axis=0)
    return jnp.where(valid[:, None], out, jnp.int32(_SENTINEL))


def _internal_state(carry: PallasBoardCarry, N: int):
    to_r, to_c, to_sk, to_ak, valid, _ = _layout_maps(N)
    h_t = carry.heights.T.astype(jnp.int32)
    bh_t = carry.best_heights.T.astype(jnp.int32)
    return (
        _expand(h_t, to_r, valid),
        _expand(h_t, to_c, valid),
        _expand(h_t, to_sk, valid),
        _expand(h_t, to_ak, valid),
        _expand(bh_t, to_r, valid),
        carry.energy.T, carry.best_energy.T, carry.best_step.T,
        carry.no_improve.T, carry.stop_step.T,
        carry.accept_bins.T, carry.total_bins.T,
        carry.chain_seeds.T.astype(jnp.int32),
    )


def _external_carry(block_seeds, st, N: int) -> PallasBoardCarry:
    inv_r = _layout_maps(N)[5]
    r, _, _, _, bh, e, be, bs, ni, stp, ab, tb, cs = st
    return PallasBoardCarry(
        block_seeds=block_seeds,
        chain_seeds=cs.T,
        heights=jnp.take(r, inv_r, axis=0).T,
        best_heights=jnp.take(bh, inv_r, axis=0).T,
        energy=e.T, best_energy=be.T, best_step=bs.T,
        no_improve=ni.T, stop_step=stp.T,
        accept_bins=ab.T, total_bins=tb.T,
    )


def _kernel(step0_ref, seed_ref, cs_in, *refs,
            spec: ChainSpec, n_inner: int, tempered: bool = False,
            freeze: bool = False, track_best: bool = True):
    if tempered:
        # Per-chain beta scale row (parallel tempering): effective beta for a
        # chain is spec.schedule(step) * beta_scale[chain].
        beta_in, *refs = refs
    if freeze:
        # Per-chain replay horizon: a chain stops updating at step
        # freeze_row[chain] (used by recover_best_heights to rebuild each
        # chain's board exactly as of its best step).
        frz_in, *refs = refs
    (r_in, c_in, sk_in, ak_in, bh_in,
     e_in, be_in, bs_in, ni_in, st_in, ab_in, tb_in,
     r_o, c_o, sk_o, ak_o, bh_o,
     e_o, be_o, bs_o, ni_o, st_o, ab_o, tb_o) = refs
    N = spec.N
    SN = _sn(N)
    c_blk = r_in.shape[1]
    nb = spec.n_bins

    seed = seed_ref[pl.program_id(0), 0]
    step0 = step0_ref[0, 0]
    beta_scale = beta_in[:] if tempered else None
    frz_row = frz_in[:] if freeze else None
    # The shared SITE stream is block-keyed by design; per-chain draws
    # (new_k, accept) are keyed by each chain's own seed (layout-free).
    site_base = seed * jnp.int32(0x2545F491) + _SITE_SALT
    g = prng.chain_streams(cs_in[:])

    # Mutate the output refs in place (input refs are read-only).
    r_o[:] = r_in[:]
    c_o[:] = c_in[:]
    sk_o[:] = sk_in[:]
    ak_o[:] = ak_in[:]
    bh_o[:] = bh_in[:]

    iota = lax.broadcasted_iota(jnp.int32, (SN, c_blk), 0)
    bin_iota = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

    def _reduce_rows(x):
        # (SN, C) -> (1, C); SN is a multiple of 8.
        acc = x[0:8, :]
        for off in range(8, SN, 8):
            acc = acc + x[off:off + 8, :]
        acc = acc[0:4, :] + acc[4:8, :]
        acc = acc[0:2, :] + acc[2:4, :]
        return acc[0:1, :] + acc[1:2, :]

    def site(gstep):
        hv = prng.lowbias32(gstep ^ site_base) & jnp.int32(0x7FFFFFFF)
        cell = hv % jnp.int32(N * N)
        return cell // N, cell % N

    def one_step(gstep, carry, update_bh=True):
        w0, w1 = prng.step_words(g, gstep)
        e, be, bs, ni, st, acc_a, acc_t = carry
        i, j = site(gstep)
        td = (j - i) % N
        ta = (i + j) % N

        kr = w0 % jnp.int32(N - 1)
        u = prng.uniform01(w1)

        rowblk = r_o[pl.ds(i * SN, SN), :]
        colblk = c_o[pl.ds(j * SN, SN), :]
        dblk = sk_o[pl.ds(td * SN, SN), :]
        ablk = ak_o[pl.ds(ta * SN, SN), :]

        # h[i, j] is sublane j of the row block.
        old_k = pltpu.roll(rowblk, (SN - j) % SN, 0)[0:1, :]
        new_k = (old_k + 1 + kr) % N

        def contrib(blk, d2, mask=None):
            # Uniform line formula: conflict with height k at offset delta
            # iff h' == k (axis/plane-k family) or (h'-k)^2 == delta^2
            # (diagonal family).  Mutually exclusive off-site (delta != 0).
            dho = blk - old_k
            dhn = blk - new_k
            dho2 = dho * dho
            dhn2 = dhn * dhn
            net = (
                (dhn2 == 0).astype(jnp.int32) - (dho2 == 0).astype(jnp.int32)
                + (dhn2 == d2).astype(jnp.int32)
                - (dho2 == d2).astype(jnp.int32)
            )
            if mask is not None:
                net = jnp.where(mask, net, 0)
            return net

        dj = iota - j
        di = iota - i
        dj2 = dj * dj
        di2 = di * di  # shared by the column and both skew blocks
        # Skew blocks hold a complementary line pair; keep the site's strip.
        vd = (iota + td < N) == (i + td < N)
        va = (iota <= ta) == (i <= ta)
        acc = (contrib(rowblk, dj2) + contrib(colblk, di2)
               + contrib(dblk, di2, vd) + contrib(ablk, di2, va))
        # +8: the moving queen's own lane contributes exactly -2 in each of
        # the four blocks (z_old and diag_old both hit at delta == 0).
        d_e = _reduce_rows(acc) + jnp.int32(8)

        gstep_f = jnp.full((1, 1), 0, jnp.float32) + gstep.astype(jnp.float32)
        beta = spec.schedule(gstep_f)
        if beta_scale is not None:
            beta = beta * beta_scale
        accept = u < jnp.exp(-beta * d_e.astype(jnp.float32))

        done = st < spec.n_steps
        active = jnp.logical_and(~done, gstep < spec.n_steps)
        if frz_row is not None:
            active = jnp.logical_and(active, gstep < frz_row)
        upd = jnp.logical_and(accept, active)

        mi_upd = jnp.logical_and(iota == i, upd)  # col/skew store mask
        r_o[pl.ds(i * SN, SN), :] = jnp.where(
            jnp.logical_and(iota == j, upd), new_k, rowblk)
        c_o[pl.ds(j * SN, SN), :] = jnp.where(mi_upd, new_k, colblk)
        sk_o[pl.ds(td * SN, SN), :] = jnp.where(mi_upd, new_k, dblk)
        ak_o[pl.ds(ta * SN, SN), :] = jnp.where(mi_upd, new_k, ablk)

        e = e + jnp.where(upd, d_e, 0)
        improved = jnp.logical_and(upd, e < be)
        if track_best and update_bh:
            # Full-(S, C) snapshot of improved chains' boards.  The unrolled
            # group path passes update_bh=False and instead reconstructs the
            # best boards once per group (see the flush in ``body``), which
            # amortizes this — the only full-board pass in the step — by the
            # unroll factor.
            bh_o[:] = jnp.where(improved, r_o[:], bh_o[:])
        be = jnp.where(improved, e, be)
        bs = jnp.where(improved, gstep + 1, bs)
        ni = jnp.where(active, jnp.where(improved, 0, ni + 1), ni)
        if spec.early_stop_patience is not None:
            newly = jnp.logical_and(active, ni >= spec.early_stop_patience)
            st = jnp.where(newly, gstep, st)

        inc = active.astype(jnp.int32)
        acc_a = acc_a + inc * accept.astype(jnp.int32)
        acc_t = acc_t + inc
        return (e, be, bs, ni, st, acc_a, acc_t), (old_k, upd)

    def flush_bins(ab, tb, b0, b1, a0, a1, t0, t1):
        # A <=UNROLL-step group spans at most two bins; group counts were
        # split into (first-bin, second-bin) accumulators.  When b0 == b1
        # both one-hots coincide and the split is summed back correctly.
        oh0 = (bin_iota == b0).astype(jnp.int32)
        oh1 = (bin_iota == b1).astype(jnp.int32)
        ab = ab + oh0 * a0 + oh1 * a1
        tb = tb + oh0 * t0 + oh1 * t1
        return ab, tb

    def bin_of(gstep):
        return jnp.minimum(gstep * nb // spec.n_steps, nb - 1)

    zrow = jnp.zeros((1, c_blk), jnp.int32)
    unroll = _UNROLL if n_inner >= 1024 else _UNROLL_SMALL
    n_groups = n_inner // unroll
    # The split-accumulator bin scheme assumes a group spans <= 2 bins,
    # guaranteed when the bin width is >= the unroll factor (any `unroll`
    # consecutive steps then fit in two bins regardless of alignment).  Toy
    # configs with narrower bins take the exact per-step one-hot path.
    exact_bins = spec.n_steps // spec.n_bins < unroll

    def body(t, carry):
        e, be, bs, ni, st, ab, tb = carry
        g0 = step0 + t * unroll
        b0 = bin_of(g0)
        b1 = bin_of(g0 + (unroll - 1))
        accs = (zrow, zrow, zrow, zrow)  # acc_a0, acc_a1, acc_t0, acc_t1
        inner = (e, be, bs, ni, st)
        move_log = []  # (old_k, upd) rows, one per unrolled sub-step
        for k in range(unroll):
            gstep = g0 + k
            second = bin_of(gstep) == b1  # scalar; routes counts to a bin
            (e, be, bs, ni, st, da, dt), mv = one_step(
                gstep, (*inner, zrow, zrow), update_bh=False)
            move_log.append(mv)
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
        if track_best:
            # Group-amortized exact best tracking: one full-board snapshot
            # for chains that improved in this group (their best_step bs is
            # inside the group), then revert the logged accepted moves that
            # happened strictly AFTER each chain's best step, newest first.
            # The board is restored to its exact state at bs — per-step
            # snapshotting spread over the group.
            g_imp = bs > g0  # (1, C): improved at least once in this group
            bh_o[:] = jnp.where(g_imp, r_o[:], bh_o[:])
            for k in reversed(range(unroll)):
                gstep = g0 + k
                old_k, upd = move_log[k]
                i, j = site(gstep)
                rowmask = jnp.logical_and(
                    jnp.logical_and(g_imp, upd), bs <= gstep)
                blk = bh_o[pl.ds(i * SN, SN), :]
                bh_o[pl.ds(i * SN, SN), :] = jnp.where(
                    jnp.logical_and(rowmask, iota == j), old_k, blk)
        return (*inner, ab, tb)

    carry = (e_in[:], be_in[:], bs_in[:], ni_in[:], st_in[:],
             ab_in[:], tb_in[:])
    carry = lax.fori_loop(0, n_groups, body, carry)
    # Tail steps (n_inner not divisible by the unroll factor).
    e, be, bs, ni, st, ab, tb = carry
    for k in range(n_inner - n_groups * unroll):
        gstep = step0 + n_groups * unroll + k
        (e, be, bs, ni, st, da, dt), _ = one_step(
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


def _block_segment_call(st, block_seeds, step0, spec: ChainSpec,
                        n_inner: int, beta_row=None, freeze_row=None,
                        track_best: bool = True):
    """One pallas_call advancing every block by n_inner steps (internal state).

    ``beta_row`` — optional (1, C) float32 per-chain beta scale (parallel
    tempering); effective beta = spec.schedule(step) * beta_row[chain].
    ``freeze_row`` — optional (1, C) int32 per-chain replay horizon; a chain
    makes no state/stat updates at steps >= its horizon
    (:func:`recover_best_heights`).
    """
    S, C = st[0].shape
    n_blocks = block_seeds.shape[0]
    c_blk = C // n_blocks
    nb = spec.n_bins
    tempered = beta_row is not None
    freeze = freeze_row is not None

    def chain_spec_(rows):
        return pl.BlockSpec((rows, c_blk), lambda b: (0, b),
                            memory_space=pltpu.VMEM)

    big = [chain_spec_(S)] * 5
    rows = [chain_spec_(1)] * 5
    bins = [chain_spec_(nb)] * 2
    beta_specs = [chain_spec_(1)] if tempered else []
    freeze_specs = [chain_spec_(1)] if freeze else []
    in_specs = [
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_blocks, 1), lambda b: (0, 0),
                     memory_space=pltpu.SMEM),
        chain_spec_(1),  # chain_seeds row (read-only)
        *beta_specs, *freeze_specs, *big, *rows, *bins,
    ]
    out_specs = tuple(big + rows + bins)
    out_shapes = tuple(
        [jax.ShapeDtypeStruct((S, C), jnp.int32)] * 5
        + [jax.ShapeDtypeStruct((1, C), jnp.int32)] * 5
        + [jax.ShapeDtypeStruct((nb, C), jnp.int32)] * 2
    )
    step0_arr = (jnp.zeros((1, 1), jnp.int32) + step0).astype(jnp.int32)
    beta_args = (beta_row,) if tempered else ()
    freeze_args = (freeze_row,) if freeze else ()
    n_state_in = 3 + len(beta_args) + len(freeze_args)

    outs = pl.pallas_call(
        functools.partial(_kernel, spec=spec, n_inner=n_inner,
                          tempered=tempered, freeze=freeze,
                          track_best=track_best),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        input_output_aliases={i + n_state_in: i for i in range(12)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(step0_arr, block_seeds, st[12], *beta_args, *freeze_args, *st[:12])
    return tuple(outs) + (st[12],)


@functools.partial(jax.jit, static_argnames=("spec", "n_inner", "track_best"))
def _run_block_segment(st, block_seeds, step0, spec: ChainSpec, n_inner: int,
                       track_best: bool = True):
    return _block_segment_call(st, block_seeds, step0, spec, n_inner,
                               track_best=track_best)


@functools.partial(jax.jit, static_argnames=("spec", "block"))
def init_carry_batch(seeds, spec: ChainSpec,
                     block: int | None = None,
                     initial_states=None) -> PallasBoardCarry:
    """Carry from per-chain integer seeds (chains padded to whole blocks).

    Same contract as :func:`metropolis_pallas.init_carry_batch`; blocks here
    are lane-axis chain groups (multiples of 128) and each block additionally
    seeds its own shared site stream.
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

    from mcqueens.core import fastinit

    if initial_states is not None:
        h2d = jnp.asarray(initial_states, jnp.int32)
        if C > h2d.shape[0]:
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


@functools.partial(jax.jit,
                   static_argnames=("spec", "n_outer", "track_best"))
def run_segment(carry: PallasBoardCarry, start_outer, spec: ChainSpec,
                n_outer: int, track_best: bool = True):
    """Segment API matching chain/board.py: n_outer chunks of stride steps.

    The external carry keeps the chains-major layout of the other kernels;
    the transposed line-major layouts are derived once per segment (cheap
    XLA gathers) and persist across the chunk scan.

    ``track_best=False`` drops the per-step best-board snapshot (the only
    full-(S, C) pass in the hot loop); ``best_energy``/``best_step`` stay
    exact and the boards can be recovered afterwards with
    :func:`recover_best_heights`, which replays the deterministic
    counter-PRNG trajectory from the initial state and freezes each chain at
    its own ``best_step`` (tested bitwise-equal to ``track_best=True``).
    """
    stride = spec.history_stride
    st = _internal_state(carry, spec.N)
    block_seeds = carry.block_seeds

    def chunk(s, outer_idx):
        s = _run_block_segment(s, block_seeds, outer_idx * stride, spec,
                               stride, track_best=track_best)
        return s, s[5][0]  # energy row -> (C,)

    st, ys = lax.scan(chunk, st, start_outer + jnp.arange(n_outer))
    return _external_carry(block_seeds, st, spec.N), ys


@functools.partial(jax.jit, static_argnames=("spec", "n_outer"))
def run_segment_tempered(carry: PallasBoardCarry, beta_scale, start_outer,
                         spec: ChainSpec, n_outer: int):
    """:func:`run_segment` with a per-chain beta scale (parallel tempering).

    ``beta_scale`` is a (C,) float32 array; each chain samples at
    ``spec.schedule(step) * beta_scale[chain]``.  With a constant-1 schedule
    this is plain parallel tempering at the ladder values; with an annealing
    schedule the whole ladder anneals together.  Exchange moves between
    segments live in :mod:`mcqueens.search.tempering`.
    """
    stride = spec.history_stride
    st = _internal_state(carry, spec.N)
    block_seeds = carry.block_seeds
    beta_row = jnp.asarray(beta_scale, jnp.float32).reshape(1, -1)

    def chunk(s, outer_idx):
        s = _block_segment_call(s, block_seeds, outer_idx * stride, spec,
                                stride, beta_row=beta_row)
        return s, s[5][0]

    st, ys = lax.scan(chunk, st, start_outer + jnp.arange(n_outer))
    return _external_carry(block_seeds, st, spec.N), ys


@functools.partial(jax.jit, static_argnames=("spec", "n_outer"))
def _run_segment_frozen(carry: PallasBoardCarry, freeze_row, start_outer,
                        spec: ChainSpec, n_outer: int):
    """:func:`run_segment` with per-chain replay horizons (no best tracking)."""
    stride = spec.history_stride
    st = _internal_state(carry, spec.N)
    block_seeds = carry.block_seeds

    def chunk(s, outer_idx):
        s = _block_segment_call(s, block_seeds, outer_idx * stride, spec,
                                stride, freeze_row=freeze_row,
                                track_best=False)
        return s, s[5][0]

    st, _ = lax.scan(chunk, st, start_outer + jnp.arange(n_outer))
    return _external_carry(block_seeds, st, spec.N)


def recover_best_heights(carry: PallasBoardCarry, spec: ChainSpec,
                         initial_states=None, verify: bool = True):
    """Rebuild the best boards of a ``track_best=False`` run by replay.

    The counter-hash streams (:mod:`mcqueens.kernels.prng`) make every
    trajectory a pure function of (chain seed, block seed, step), so the run
    can be replayed exactly from the initial state; each chain is frozen at
    its own ``best_step`` (the step count at which its best energy was
    reached), leaving its board bitwise equal to the best board a
    ``track_best=True`` run would have snapshotted.

    Cost: one ``track_best=False`` pass over ``max(best_step)`` steps — pay
    the ~4% best-tracking overhead only when a new global best actually
    needs exporting, instead of on every step of a long search.

    Args:
        carry: the final carry of a :func:`run_segment` run (any
            ``track_best`` setting; ``chain_seeds``/``block_seeds`` identify
            the streams, ``best_step``/``best_energy`` drive the replay).
        spec: the same spec the run used.
        initial_states: the warm starts the run was given, if any (the
            replay must start from the same boards).
        verify: assert each replayed board's incremental energy equals the
            recorded ``best_energy`` (host-side check, cheap).

    Returns:
        (C, N, N) int32 best boards (C includes any block padding).
    """
    seeds = np.asarray(carry.chain_seeds).reshape(-1).astype(np.uint32)
    C = int(seeds.shape[0])
    n_blocks = int(carry.block_seeds.shape[0])
    block = C // n_blocks
    fresh = init_carry_batch(seeds, spec, block=block,
                             initial_states=initial_states)
    best_step = np.asarray(carry.best_step).reshape(1, -1).astype(np.int32)
    freeze_row = jnp.asarray(best_step)
    # Replay only as far as the latest best step (whole stride chunks).
    n_outer = min(spec.n_outer,
                  max(1, -(-int(best_step.max()) // spec.history_stride)))
    replayed = _run_segment_frozen(fresh, freeze_row, jnp.int32(0), spec,
                                   n_outer)
    heights = np.asarray(replayed.heights).reshape(C, spec.N, spec.N)
    if verify:
        want = np.asarray(carry.best_energy).reshape(-1)
        got = np.asarray(replayed.energy).reshape(-1)
        if not np.array_equal(want, got):
            bad = int(np.sum(want != got))
            raise AssertionError(
                f"replay mismatch on {bad}/{C} chains: replayed energies "
                f"do not match recorded best energies (was the run warm-"
                f"started? pass the same initial_states)")
    return heights


@functools.cache
def _sharded_segment_fn(spec: ChainSpec, n_outer: int, mesh):
    from mcqueens.dist import mesh as mesh_mod

    return mesh_mod.shard_segment_fn(
        lambda c, s: run_segment(c, s, spec, n_outer),
        PallasBoardCarry, mesh)


def run_segment_sharded(carry: PallasBoardCarry, start_outer, spec: ChainSpec,
                        n_outer: int, mesh):
    """run_segment over a chains mesh: each shard advances its whole blocks."""
    return _sharded_segment_fn(spec, n_outer, mesh)(carry, start_outer)


@functools.cache
def _sharded_tempered_fn(spec: ChainSpec, n_outer: int, mesh):
    from mcqueens.dist import mesh as mesh_mod

    return mesh_mod.shard_segment_fn(
        lambda c, b, s: run_segment_tempered(c, b, s, spec, n_outer),
        PallasBoardCarry, mesh, tempered=True)


def run_segment_tempered_sharded(carry: PallasBoardCarry, beta_scale,
                                 start_outer, spec: ChainSpec, n_outer: int,
                                 mesh):
    """Tempered segments over a chains mesh (flagship search at pod scale).

    Each shard advances its own whole VMEM blocks with its own slice of the
    per-chain beta row; ladder groups are block-local (the caller guarantees
    the per-shard chain count is a multiple of the ladder length), so the
    segment phase needs zero cross-chip communication — only the host-side
    best reduction ever crosses chips (SURVEY §5.8).
    """
    return _sharded_tempered_fn(spec, n_outer, mesh)(
        carry, beta_scale, start_outer)
