#!/usr/bin/env python
"""Headline benchmark: proposed moves/sec/chip on the board sampler.

Configuration matches the BASELINE.json north-star: N=16, 4096 vmapped
chains, linear annealing, tables kernel, stats on device.  Prints exactly one
JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is measured throughput / 1e9 (the >=1e9 moves/s/chip target set in
/root/repo/BASELINE.json; the reference itself publishes no throughput —
SURVEY §6 — and its pure-NumPy loop implies O(10^3-10^4) moves/s/core).
"""

import argparse
import json
import sys
import time

import jax
import numpy as np

from mcqueens.chain import board
from mcqueens.chain.spec import ChainSpec
from mcqueens.core import rng as rng_mod
from mcqueens.core.schedules import build_schedule
from mcqueens.utils import cache

cache.enable()

BASELINE_MOVES_PER_SEC = 1e9


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=16)
    parser.add_argument("--chains", type=int, default=4096)
    parser.add_argument("--segment-steps", type=int, default=8192,
                        help="steps per timed device call")
    parser.add_argument("--target-seconds", type=float, default=5.0)
    parser.add_argument("--kernel", default="tables")
    parser.add_argument("--quick", action="store_true",
                        help="small shapes for smoke-testing the bench itself")
    args = parser.parse_args()

    if args.quick:
        args.chains = 256
        args.segment_steps = 1024
        args.target_seconds = 1.0

    n_devices = jax.device_count()
    # A long-horizon schedule: the bench run is the opening stretch of a big
    # anneal.  n_steps bounded so bin arithmetic stays exact in int32.
    horizon = 2 ** 24
    spec = ChainSpec(
        N=args.n,
        n_steps=horizon,
        schedule=build_schedule(
            "linear_annealing", horizon, beta_start=1.0, beta_end=5.0
        ),
        init_mode="random",
        mcmc_type="board",
        kernel=args.kernel,
        history_stride=args.segment_steps,
    )
    keys = rng_mod.chain_keys(0, args.chains)
    carry = board.init_carry_batch(keys, spec)

    # Warm up: compile the segment and run it once.  NOTE: block_until_ready
    # does not reliably block on the axon platform; a host transfer does.
    carry, _ = board.run_segment(carry, np.int32(0), spec, 1)
    _ = np.asarray(carry.energy)

    # Timed: repeat identical segments until the budget elapses.
    steps_done = 0
    seg = 1
    t0 = time.time()
    while True:
        carry, _ = board.run_segment(carry, np.int32(seg), spec, 1)
        seg += 1
        steps_done += args.segment_steps
        _ = np.asarray(carry.energy)  # hard sync via device->host transfer
        elapsed = time.time() - t0
        if elapsed >= args.target_seconds:
            break
    moves = steps_done * args.chains
    moves_per_sec = moves / elapsed
    per_chip = moves_per_sec / max(n_devices, 1)

    print(
        json.dumps(
            {
                "metric": (
                    f"proposed moves/sec/chip (board N={args.n}, "
                    f"{args.chains} chains, {args.kernel} kernel)"
                ),
                "value": per_chip,
                "unit": "moves/s/chip",
                "vs_baseline": per_chip / BASELINE_MOVES_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
