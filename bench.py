#!/usr/bin/env python
"""Headline benchmark: proposed moves/sec/chip on the board sampler.

Runs the flagship Pallas kernel at the BASELINE.json configuration: N=16,
linear annealing, tens of thousands of chains.  The default kernel is the
round-2 shared-site sliced kernel (mcqueens/kernels/board_shared.py): O(N)
work per proposal via dynamic sublane slices of four line-major board
layouts, chains on the lane axis, group-amortized exact best tracking.
Measured 2.09e9 moves/s/chip on this host's degraded tunnel (round 1 dense
kernel: 1.3e8; first shared-site version: 1.14e9).
Prints exactly one JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is measured throughput / 1e9 — the BASELINE.json north-star for a
*nominal* v5e.  Round 1's "~50 GB/s tunnel caps this host at O(1e8)" claim
was a dispatch artifact (numpy args re-uploaded per call); with
device-resident state this kernel sustains >= 1e9 moves/s/chip here (see
docs/DESIGN.md section 4 and tools/roofline.py for the measured envelope).
The reference CPU loop runs ~6.2e3 moves/s/core on comparable hardware.
"""

import argparse
import glob
import json
import os
import sys
import time

import jax
import numpy as np

from mcqueens.chain.spec import ChainSpec
from mcqueens.core.schedules import build_schedule
from mcqueens.kernels import metropolis_pallas
from mcqueens.utils import cache

cache.enable()

BASELINE_MOVES_PER_SEC = 1e9


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=16)
    parser.add_argument("--chains", type=int, default=32768)
    parser.add_argument("--segment-steps", type=int, default=32768,
                        help="steps per timed device call")
    parser.add_argument("--target-seconds", type=float, default=5.0)
    parser.add_argument("--kernel", default="pallas_shared",
                        choices=("pallas_shared", "pallas", "tables", "naive"))
    parser.add_argument("--quick", action="store_true",
                        help="small shapes for smoke-testing the bench itself")
    args = parser.parse_args()

    if args.quick:
        args.chains = 1024
        args.segment_steps = 2048
        args.target_seconds = 1.0

    per_chip = _measure(args.n, args.chains, args.segment_steps,
                        args.target_seconds, args.kernel)
    record = {
        "metric": (
            f"proposed moves/sec/chip (board N={args.n}, "
            f"{args.chains} chains, {args.kernel} kernel)"
        ),
        "value": per_chip,
        "unit": "moves/s/chip",
        "vs_baseline": per_chip / BASELINE_MOVES_PER_SEC,
    }
    if not args.quick and args.chains != 4096:
        # Also publish the BASELINE.json-letter configuration (4096 chains)
        # next to the peak configuration, so the headline is checkable at
        # the stated config, not just at the throughput-optimal one.
        letter = _measure(args.n, 4096, args.segment_steps,
                          args.target_seconds, args.kernel)
        record["chains_4096_value"] = letter
        record["chains_4096_vs_baseline"] = letter / BASELINE_MOVES_PER_SEC
    if not args.quick:
        best = _best_prior_round()
        if best is not None:
            # Regression guard (VERDICT r3 Weak #5): compare against the best
            # committed round so a real slowdown is visible in the JSON, not
            # just absorbed as drift (r2->r3 drifted -1.7% unnoticed).
            record["vs_best_round"] = per_chip / best
            if per_chip < 0.9 * best:
                record["regression"] = (
                    f"more than 10% below the best committed round "
                    f"({best:.3e} moves/s/chip)")
    print(json.dumps(record))


def _best_prior_round():
    """Best committed BENCH_r*.json headline value, or None."""
    root = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            # The driver wraps bench output under "parsed".
            v = rec.get("parsed", rec).get("value")
        except (OSError, ValueError, AttributeError):
            continue
        if isinstance(v, (int, float)) and (best is None or v > best):
            best = float(v)
    return best


def _measure(n, chains, segment_steps, target_seconds, kernel) -> float:
    n_devices = jax.device_count()
    # A long-horizon schedule: the bench run is the opening stretch of a big
    # anneal.  n_steps bounded so bin arithmetic stays exact in int32.
    horizon = 2 ** 24
    spec = ChainSpec(
        N=n,
        n_steps=horizon,
        schedule=build_schedule(
            "linear_annealing", horizon, beta_start=1.0, beta_end=5.0
        ),
        init_mode="random",
        mcmc_type="board",
        kernel=kernel,
        history_stride=segment_steps,
    )
    seeds = np.arange(chains, dtype=np.uint32)
    if kernel == "pallas_shared":
        from mcqueens.kernels import board_shared as mod

        carry = mod.init_carry_batch(seeds, spec)
    elif kernel == "pallas":
        mod = metropolis_pallas
        carry = mod.init_carry_batch(seeds, spec)
    else:
        from mcqueens.chain import board as mod
        from mcqueens.core import rng as rng_mod

        carry = mod.init_carry_batch(rng_mod.chain_keys_from_seeds(seeds), spec)

    # Warm up: compile the segment and run it once.  NOTE: block_until_ready
    # does not reliably block on the axon platform; a host transfer does.
    carry, _ = mod.run_segment(carry, np.int32(0), spec, 1)
    _ = np.asarray(carry.energy)

    # Timed: repeat identical segments until the budget elapses.
    steps_done = 0
    seg = 1
    t0 = time.time()
    while True:
        carry, _ = mod.run_segment(carry, np.int32(seg), spec, 1)
        seg += 1
        steps_done += segment_steps
        _ = np.asarray(carry.energy)  # hard sync via device->host transfer
        elapsed = time.time() - t0
        if elapsed >= target_seconds:
            break
    moves = steps_done * chains
    return moves / elapsed / max(n_devices, 1)


if __name__ == "__main__":
    sys.exit(main())
