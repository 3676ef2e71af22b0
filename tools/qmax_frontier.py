"""Hardware campaign: bracket Q_max(12, 3) — past the literature table.

The reference report's Table 1 stops at N = 10 (Q_max = 91).  For N = 11
and 13, Klarner's construction (report Thm II.1, gcd(N, 210) = 1) already
places N^2 mutually non-attacking queens, and N^2 is the ceiling for any N
with a zero-attack full board.  N = 12 is the first open size: gcd(12, 210)
= 6, the theorem gives nothing, and this repo's trillion-proposal searches
put the best *full* 144-queen board at 22 attacking pairs — so
Q_max(12, 3) < 144, with no published value to compare against.

This campaign brackets it: anneal the sub-N^2 ``--q`` path at descending Q
until a zero-attack placement appears.  Each certified Q is a constructive
lower bound (oracle-verified, exported); each miss under an escalated
budget is evidence (not proof) that Q sits near the bracket's top.

Run from the repo root on the real TPU: ``python -m tools.qmax_frontier``.
Evidence artifact: ``artifacts/qmax/qmax_frontier_N12.json``.
"""
import json
import os

import numpy as np

from tools.qmax import OUTDIR, search
from tests._oracle import full3d_energy

N = 12
# Descend from just under the full board: the Q_max/N^2 ratio trend in
# Table 1 (0.83 at N=9, 0.91 at N=10) suggests the bound lands in the 130s.
PROBES = (142, 140, 138, 136, 134, 132, 130, 128, 124, 120)


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    from mcqueens.utils import cache
    cache.enable()
    out = {}

    def probe(Q):
        e, best, wall, props = search(N, Q, 1 << 20, 6.0)
        if e > 0:  # escalate: 8x steps, colder end
            e2, b2, w2, p2 = search(N, Q, 1 << 23, 8.0, seed=9999)
            wall, props = wall + w2, props + p2
            if e2 < e:
                e, best = e2, b2
        rec = {"min_energy": e, "proposals": props, "wall_s": round(wall, 1)}
        out[f"Q{Q}"] = rec
        if e == 0:
            assert full3d_energy(np.asarray(best, np.int64)) == 0
            path = os.path.join(OUTDIR, f"qmax_N{N}_Q{Q}.txt")
            with open(path, "w") as f:
                for i, j, k in np.asarray(best).tolist():
                    f.write(f"{i},{j},{k}\n")
            rec["board"] = os.path.basename(path)
        print(json.dumps({f"Q{Q}": rec}), flush=True)
        return e

    best_zero, smallest_miss = None, N * N
    for Q in PROBES:
        if probe(Q) == 0:
            best_zero = Q
            break
        smallest_miss = Q
    if best_zero is not None:  # tighten: walk up to the gap's edge
        for Q in range(best_zero + 1, smallest_miss):
            if probe(Q) != 0:
                break
            best_zero = Q
    out["lower_bound"] = best_zero
    with open(os.path.join(OUTDIR, f"qmax_frontier_N{N}.json"), "w") as f:
        json.dump(out, f, indent=1)
    misses = [int(k[1:]) for k, v in out.items()
              if k.startswith("Q") and v["min_energy"] > 0]
    print(f"FINAL Q_max({N},3) >= {best_zero}; misses at {sorted(misses)}")


if __name__ == "__main__":
    main()
