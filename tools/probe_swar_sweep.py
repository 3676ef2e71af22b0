#!/usr/bin/env python
"""Settle SWAR by measurement: the packed attack test inside the
PRODUCTION fused-sweep structure, not a straight-line microbenchmark.

Round-4 VERDICT Missing #3: the committed microbenchmark
(``artifacts/probe_full3d_alternatives.json``) measured the packed-SWAR
7-relation attack test at 0.58x the production 2-test form's time per
queen — the only alternative that measured *faster* — and DESIGN.md
dismissed it by static op-counting (~25 live ops vs ~17) plus the (real)
observation that the straight-line harness is dependency-stalled.  If the
op-count is wrong, full_3d at Q=256 has ~1.7x on the table.  This probe
runs the decisive experiment: both attack tests inside a harness that
reproduces the production sweep's exact ILP structure
(``mcqueens/kernels/full3d_shared.py:chunk_sweep`` — 9 targets x 8-row
blocks over all QS plane rows, 9 independent accumulator chains per row
block, per-target tree reduces, hash-varied candidates per chunk), and
reports measured block-step time per queen for each.

Variants:

* ``production``: (QS, C) int32 coordinate planes, the live 2-test form
  ``a2*(a2-m)`` per axis + occupancy off the shared max (one fused
  accumulator, occupancy in the high bits) — exactly
  ``full3d_shared.py:scores``.
* ``swar``: (QS/2, C) planes, two queens per lane as biased 16-bit halves
  (field = coord + 64 - cand in [33, 95]: duplicated-constant adds cannot
  carry between halves at N <= 32).  The 2-test product form cannot pack
  (|a2*(a2-m)| < 2^20 overflows the halves), so the packed test is the
  7-relation equality form via mask dances (XOR + guarded-add zero tests,
  mirror-max absolute values — this Mosaic target has no 16-bit
  compare/abs/max).  Occupancy (all three deltas zero) does not fit the
  count fields' bit budget, so it accumulates into a SECOND per-target
  accumulator — an honest extra add the production form gets for free.

Calibration: the production-structure harness must reproduce the fitted
production coefficient b = 0.0137 us/queen (``probe_full3d_cap.json``)
before the SWAR number is trusted — the round-3 microbenchmark failed
exactly this (its "production" rate implied b ~4x the fitted value, so
its SWAR ratio measured pipelining in a stalled harness, not the sweep).

Writes ``artifacts/probe_swar_sweep.json``.  Run on the real TPU:
``python -m tools.probe_swar_sweep [--quick]``.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import jax.numpy as jnp

# Packed-field constants (two 16-bit halves per int32 lane).
_LO16 = 0x0000FFFF
_HINT = -0x80000000 + 0x00008000   # 0x80008000 as signed int32
_GUARD = 0x7FFF7FFF
_ONES = 1 | (1 << 16)              # 1 in bit0 of each half
_M128 = 128 | (128 << 16)


def _sync(x):
    np.asarray(x)


def prod_scores(di, dj, dk):
    """The live 2-test form (full3d_shared.py:scores): attack in the low
    bits, occupancy at bit 16."""
    p2, q2, r2 = di * di, dj * dj, dk * dk
    m = jnp.maximum(p2, jnp.maximum(q2, r2))
    t = (p2 * (p2 - m)) | (q2 * (q2 - m)) | (r2 * (r2 - m))
    return jnp.where(t == 0, 1, 0) + jnp.where(m == 0, jnp.int32(1 << 16), 0)


def _zero_halves(e):
    """1 in each 16-bit field's low bit iff that field is zero (fields must
    have bit 15 clear, which biased diffs in [33, 95] guarantee)."""
    t = (e & _GUARD) + _GUARD
    nz = (t | e) & _HINT
    m = (nz >> 15) & _ONES
    return _ONES - m


def _eq_halves(a, b):
    return _zero_halves(a ^ b)


def _smax(a, b):
    """Per-16-bit-field max via the guard-bit subtract trick."""
    z = (a | _HINT) - (b & _GUARD)
    s = z & _HINT
    mask = ((s >> 15) & _ONES) * 0xFFFF
    return (a & mask) | (b & ~mask)


def swar_scores(di, dj, dk):
    """(attack, occupancy) per half of packed biased diffs.

    Inputs are per-half ``coord - cand + 64`` in [49, 80] (raw coords in
    [0, 16) plus a duplicated ``64 - cand`` constant: no inter-half carry).
    Attack = 7-relation equality form; occupancy = all three deltas zero.
    """
    B = 64 | (64 << 16)
    zi, zj, zk = _eq_halves(di, B), _eq_halves(dj, B), _eq_halves(dk, B)
    # |d - 64| + 64 = max(d, 128 - d): shift-invariant for the equality
    # tests below, and zero-of-delta is read off zi/zj/zk instead.
    ai = _smax(di, _M128 - di)
    aj = _smax(dj, _M128 - dj)
    ak = _smax(dk, _M128 - dk)
    eij = _eq_halves(ai, aj)
    eik = _eq_halves(ai, ak)
    ejk = _eq_halves(aj, ak)
    two_axis = (zi & zj) | (zi & zk) | (zj & zk)
    att = two_axis | (zk & eij) | (zj & eik) | (zi & ejk) | (eij & eik)
    return att & _ONES, (zi & zj) & zk


def _sweep_time(kind: str, Q: int, C: int = 2048, n_chunks: int = 512,
                reps: int = 5):
    """Seconds per rep of ``n_chunks`` production-shaped chunk sweeps.

    One chunk = the fused 9-target pass of ``chunk_sweep``: for every
    8-row block of the resident coordinate planes, score 8 hash-varied
    candidates + 1 old-side target and accumulate per-target; then
    tree-reduce each target to a (1, C) row and fold it into carried
    state (so nothing dead-codes).  ``kind='swar'`` packs two queens per
    lane, halving the row count.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 8           # candidates per chunk (production _HOLD)
    QS = Q if kind == "production" else Q // 2
    assert QS % 8 == 0

    def hash32(x):
        # lowbias32 (kernels/prng.py) inlined so the harness is standalone;
        # the >2^31 multiplier must wrap through uint32 to be an int32 const
        m1 = jnp.int32(np.int32(np.uint32(0x7FEB352D)))
        m2 = jnp.int32(np.int32(np.uint32(0x846CA68B)))
        x = x ^ (x >> 16)
        x = x * m1
        x = x ^ ((x >> 15) & jnp.int32(0x1FFFF))
        x = x * m2
        return x ^ ((x >> 16) & jnp.int32(0xFFFF))

    def prod_scores(di, dj, dk):
        p2, q2, r2 = di * di, dj * dj, dk * dk
        m = jnp.maximum(p2, jnp.maximum(q2, r2))
        t = (p2 * (p2 - m)) | (q2 * (q2 - m)) | (r2 * (r2 - m))
        return jnp.where(t == 0, 1, 0) + jnp.where(
            m == 0, jnp.int32(1 << 16), 0)

    def _zero_halves(e):
        t = (e & _GUARD) + _GUARD
        nz = (t | e) & _HINT
        m = (nz >> 15) & _ONES
        return _ONES - m

    def _eq_halves(a, b):
        return _zero_halves(a ^ b)

    def _smax(a, b):
        z = (a | _HINT) - (b & _GUARD)
        s = z & _HINT
        mask = ((s >> 15) & _ONES) * 0xFFFF
        return (a & mask) | (b & ~mask)

    M128 = 128 | (128 << 16)

    def swar_scores(di, dj, dk):
        """(attack per half, occupancy per half) of packed biased diffs."""
        B = 64 | (64 << 16)
        zi, zj, zk = _eq_halves(di, B), _eq_halves(dj, B), _eq_halves(dk, B)
        ai = _smax(di, M128 - di)
        aj = _smax(dj, M128 - dj)
        ak = _smax(dk, M128 - dk)
        eij = _eq_halves(ai, aj)
        eik = _eq_halves(ai, ak)
        ejk = _eq_halves(aj, ak)
        two_axis = (zi & zj) | (zi & zk) | (zj & zk)
        att = two_axis | (zk & eij) | (zj & eik) | (zi & ejk) | (eij & eik)
        return att & _ONES, (zi & zj) & zk

    def kernel(qi_ref, qj_ref, qk_ref, o_ref):
        c_blk = qi_ref.shape[1]

        def chunk(t, carry):
            acc_att, acc_occ = carry
            # hash-varied targets: 8 candidates + 1 "old" per chunk, coords
            # in [0, 16) like the production cand_of/mover rows at N=16
            targets = []
            for k in range(K + 1):
                h = hash32(t * jnp.int32(K + 1) + jnp.int32(k)
                           + jnp.int32(0x7F4A7C15))
                cx = h & jnp.int32(15)
                cy = (h >> 4) & jnp.int32(15)
                cz = (h >> 8) & jnp.int32(15)
                if kind == "swar":
                    # duplicated (64 - c) bias constant per half
                    targets.append(((64 | (64 << 16)) - (cx | (cx << 16)),
                                    (64 | (64 << 16)) - (cy | (cy << 16)),
                                    (64 | (64 << 16)) - (cz | (cz << 16))))
                else:
                    targets.append((cx, cy, cz))

            att_accs = [None] * (K + 1)
            occ_accs = [None] * (K + 1)
            for base in range(0, QS, 8):
                bi = qi_ref[base:base + 8, :]
                bj = qj_ref[base:base + 8, :]
                bk = qk_ref[base:base + 8, :]
                for idx, (cx, cy, cz) in enumerate(targets):
                    if kind == "swar":
                        a, o = swar_scores(bi + cx, bj + cy, bk + cz)
                        occ_accs[idx] = o if occ_accs[idx] is None else (
                            occ_accs[idx] + o)
                    else:
                        a = prod_scores(bi - cx, bj - cy, bk - cz)
                    att_accs[idx] = a if att_accs[idx] is None else (
                        att_accs[idx] + a)

            def tree(a):
                a = a[0:4, :] + a[4:8, :]
                a = a[0:2, :] + a[2:4, :]
                return a[0:1, :] + a[1:2, :]

            for idx in range(K + 1):
                acc_att = acc_att ^ tree(att_accs[idx])
                if kind == "swar":
                    acc_occ = acc_occ ^ tree(occ_accs[idx])
            return acc_att, acc_occ

        z = jnp.zeros((1, c_blk), jnp.int32)
        acc_att, acc_occ = lax.fori_loop(0, n_chunks, chunk, (z, z))
        o_ref[:] = acc_att + acc_occ

    rng = np.random.default_rng(0)
    if kind == "swar":
        # biased halves: coord + 64 per 16-bit field
        def packed():
            c = rng.integers(0, 16, size=(QS, 2, C)).astype(np.int64) + 64
            return (c[:, 0] | (c[:, 1] << 16)).astype(np.int32)
        planes = [packed() for _ in range(3)]
    else:
        planes = [rng.integers(0, 16, size=(QS, C)).astype(np.int32)
                  for _ in range(3)]

    import jax
    args = [jax.device_put(p) for p in planes]
    f = jax.jit(lambda a, b, c: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))(a, b, c))
    _sync(f(*args))  # compile
    times = []
    for _ in range(reps):
        t0 = time.time()
        _sync(f(*args))
        times.append(time.time() - t0)
    return times


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="artifacts/probe_swar_sweep.json")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)

    from mcqueens.utils import cache

    cache.enable()

    n_chunks = 64 if args.quick else 512
    reps = 3 if args.quick else 7
    out = {"n_chunks": n_chunks, "reps": reps, "chains_per_block": 2048,
           "structure": "9 targets x 8-row blocks x QS rows per chunk "
                        "(full3d_shared.py:chunk_sweep)"}

    for Q in ((144, 256) if not args.quick else (256,)):
        row = {}
        for kind in ("production", "swar"):
            times = _sweep_time(kind, Q, n_chunks=n_chunks, reps=reps)
            per_chunk_us = [t / n_chunks * 1e6 for t in times]
            # one chunk = 8 steps of the sweep's O(Q) work
            per_queen_step_ns = [u * 1e3 / (8 * Q) for u in per_chunk_us]
            row[kind] = {
                "chunk_us": {"min": round(min(per_chunk_us), 3),
                             "median": round(float(np.median(per_chunk_us)), 3),
                             "max": round(max(per_chunk_us), 3)},
                "b_ns_per_queen_step": {
                    "min": round(min(per_queen_step_ns), 4),
                    "median": round(float(np.median(per_queen_step_ns)), 4),
                    "max": round(max(per_queen_step_ns), 4)},
            }
        prod_b = row["production"]["b_ns_per_queen_step"]["median"]
        swar_b = row["swar"]["b_ns_per_queen_step"]["median"]
        row["swar_vs_production"] = round(swar_b / prod_b, 3)
        out[f"Q{Q}"] = row
        print(f"Q={Q}: production b={prod_b} ns/queen-step, "
              f"swar b={swar_b} ns/queen-step, "
              f"ratio={row['swar_vs_production']}")

    # Calibration vs the fitted production coefficient: the harness is a
    # faithful stand-in only if its production variant lands near the
    # fitted b (us/queen = ns/queen-step / 1e3).
    cap_path = os.path.join(os.path.dirname(args.json) or ".",
                            "probe_full3d_cap.json")
    if os.path.exists(cap_path) and "Q256" in out:
        fitted = json.load(open(cap_path))["fit"]["b_us_per_queen"]
        harness = out["Q256"]["production"]["b_ns_per_queen_step"]["median"]
        out["fitted_b_us_per_queen"] = fitted
        out["harness_production_over_fitted"] = round(
            harness / 1e3 / fitted, 3)

    print(json.dumps(out, indent=1))
    os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
