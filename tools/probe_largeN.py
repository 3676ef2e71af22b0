"""Hardware probe: board pallas_shared at N >= 22 (VMEM-aware block sizing).

Run from the repo root on the real TPU: ``python -m tools.probe_largeN``.
Before round 3 the board shared-site kernel used a fixed 2048-chain block,
which allocates ~108 MB of scoped VMEM at N=24 and fails to compile;
``kernels/sizing.py`` now shrinks the block from the spec (1664 at N=24,
896 at N=32).  This probe measures throughput at both sizes and oracle-
verifies the incremental energies on hardware.  Evidence:
``artifacts/probe_largeN_r3.json`` (N=24: 1.06e9 moves/s/chip; N=32:
9.9e8 — the >= 1e9 north-star effectively holds out to N=32).
"""
import json
import time

import numpy as np

import bench
from mcqueens.chain.spec import ChainSpec
from mcqueens.core.schedules import build_schedule
from mcqueens.kernels import board_shared
from tests._oracle import board_energy

out = {}
for N, chains in ((24, 16640), (32, 17920)):
    spec = ChainSpec(N=N, n_steps=2**24,
                     schedule=build_schedule("linear_annealing", 2**24, beta_start=1.0, beta_end=5.0),
                     init_mode="random", mcmc_type="board", kernel="pallas_shared",
                     history_stride=8192)
    blk = board_shared.block_size(chains, spec)
    t0 = time.time()
    per_chip = bench._measure(N, chains, 8192, 5.0, "pallas_shared")
    out[f"N{N}"] = {"block": blk, "moves_per_s_per_chip": per_chip,
                    "wall_incl_compile_s": round(time.time() - t0, 1)}
    # correctness on hardware: incremental energy == oracle recompute
    seeds = np.arange(7, 7 + chains, dtype=np.uint32)
    carry = board_shared.init_carry_batch(seeds, spec)
    carry, _ = board_shared.run_segment(carry, np.int32(0), spec, 2)
    fe = np.asarray(carry.energy).reshape(-1)
    hs = np.asarray(carry.heights, dtype=np.int64).reshape(-1, N, N)
    for r in (0, chains // 2, chains - 1):
        oe = board_energy(hs[r])
        assert int(fe[r]) == oe, (N, r, int(fe[r]), oe)
    be = np.asarray(carry.best_energy).reshape(-1)
    bh = np.asarray(carry.best_heights, dtype=np.int64).reshape(-1, N, N)
    assert int(be[0]) == board_energy(bh[0])
    out[f"N{N}"]["oracle_checked"] = True
    print(json.dumps({f"N{N}": out[f"N{N}"]}), flush=True)
print("FINAL", json.dumps(out))
