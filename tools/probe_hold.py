#!/usr/bin/env python
"""Measure full3d_shared throughput as a function of the mover-hold length.

The shared-site full_3d kernel (``mcqueens/kernels/full3d_shared.py``) holds
one shared mover for ``_HOLD`` steps so the old-side one-vs-all pass runs
once per chunk and the chunk's candidate passes fuse into one blocked sweep.
Per step that costs (1 + 1/HOLD) pass-targets, so doubling the hold saves at
most ~1/(HOLD+1) of the pass work — this probe measures what it actually
saves on hardware (register pressure on the (HOLD+1) accumulator chains can
eat the ledger gain).

One hold value per process (the module constant is patched before the first
trace); a driver loop shells out per value:

    for h in 8 16 32; do python -m tools.probe_hold --hold $h; done

The probe also re-checks the exactness invariant after the timed run:
incremental final energies must equal the oracle recompute of the final
states for every chain (any stale-plane/correction bug at a new hold length
shows up here immediately).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--hold", type=int, default=8)
    parser.add_argument("--n", type=int, default=16)
    parser.add_argument("--chains", type=int, default=32768)
    parser.add_argument("--seg", type=int, default=8192)
    parser.add_argument("--seconds", type=float, default=5.0)
    args = parser.parse_args(argv)

    from mcqueens.utils import cache

    cache.enable()

    from mcqueens.chain.spec import ChainSpec
    from mcqueens.core.schedules import build_schedule
    from mcqueens.kernels import full3d_shared as mod

    if mod._UNROLL % args.hold:
        parser.error(f"--hold must divide _UNROLL={mod._UNROLL}")
    mod._HOLD = args.hold  # before the first trace in this process

    horizon = 2 ** 24
    spec = ChainSpec(
        N=args.n, n_steps=horizon,
        schedule=build_schedule("linear_annealing", horizon,
                                beta_start=1.0, beta_end=5.0),
        init_mode="random", mcmc_type="full_3d", kernel="pallas_shared",
        history_stride=args.seg,
    )
    seeds = np.arange(args.chains, dtype=np.uint32)
    carry = mod.init_carry_batch(seeds, spec)
    carry, _ = mod.run_segment(carry, np.int32(0), spec, 1)
    _ = np.asarray(carry.energy)  # sync (block_until_ready unreliable here)

    t0 = time.time()
    done, s = 0, 1
    while time.time() - t0 < args.seconds:
        carry, _ = mod.run_segment(carry, np.int32(s), spec, 1)
        s += 1
        done += args.seg
        _ = np.asarray(carry.energy)
    dt = time.time() - t0
    rate = done * args.chains / dt

    # Exactness invariant: incremental energy == oracle recompute.
    import jax

    from mcqueens.core.energy import full3d_energy

    queens = np.stack([np.asarray(carry.qi), np.asarray(carry.qj),
                       np.asarray(carry.qk)], axis=-1)
    idx = np.linspace(0, args.chains - 1, 256).astype(int)  # spans blocks
    with jax.default_device(jax.devices("cpu")[0]):
        oracle = np.asarray(jax.vmap(full3d_energy)(queens[idx]))
    # carry.energy is (C, 1) — ravel before comparing against the (n,) oracle.
    ok = bool((oracle == np.asarray(carry.energy).ravel()[idx]).all())

    print(json.dumps({"hold": args.hold, "moves_per_s_chip": rate,
                      "steps": done, "energy_exact": ok}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
