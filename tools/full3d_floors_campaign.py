#!/usr/bin/env python
"""Regenerate the unconstrained (full_3d) minimum-energy floors with the
round-3 protocol, exporting every winning board under
``artifacts/full3d_floors/competition_results/`` (the directory
``artifacts/RESULTS.md`` cites — VERDICT r3 Missing #1).

Protocol per size (RESULTS.md "Unconstrained (full_3d) floors..."):
16-level tempering ladder, 65536 chains x 8M steps (~5.2e11 proposals),
exchanges every 62.5k steps; a fresh search (beta 0.8->7, seed 31337), an
independent fresh-seed confirmation (4242), then colder (beta 2->10)
warm-started refinements from the best board so far until the floor stops
moving (at most ``--max-refines``).  Every exported board is re-scored with
the independent pairwise oracle before being trusted; the campaign log is
flushed to ``artifacts/full3d_floors/campaign.json`` after every search so
a killed run loses nothing.

Run on the real TPU:  python -m tools.full3d_floors_campaign [--sizes 12 14 15]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

OUTDIR = os.path.join("artifacts", "full3d_floors")
CHAINS = 65536
N_STEPS = 8_000_000
STRIDE = 62_500
LADDER = 16


def _newest_export():
    paths = glob.glob(os.path.join(OUTDIR, "competition_results", "*.txt"))
    return max(paths, key=os.path.getmtime) if paths else None


def _search(n, seed, beta_start, beta_end, resume_from=None):
    """One tempered search via the competition CLI; returns (energy, path)."""
    from mcqueens.cli import competition
    from tools.verify_board import verify

    argv = [
        "--n", str(n), "--mcmc-type", "full_3d",
        "--n-runs", str(CHAINS), "--n-steps", str(N_STEPS),
        "--kernel", "pallas_shared", "--tempering", str(LADDER),
        "--history-stride", str(STRIDE),
        "--beta-start", str(beta_start), "--beta-end", str(beta_end),
        "--seed", str(seed), "--outdir", OUTDIR,
    ]
    if resume_from:
        argv += ["--resume-from", resume_from]
    before = _newest_export()
    t0 = time.time()
    competition.main(argv)
    path = _newest_export()
    assert path and path != before, "search exported no board"
    rec = verify(path)
    assert rec["distinct_cells"], path
    return rec["oracle_energy"], path, round(time.time() - t0, 1)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[12, 14, 15])
    ap.add_argument("--max-refines", type=int, default=3)
    args = ap.parse_args(argv)

    from mcqueens.utils import cache

    cache.enable()
    os.makedirs(os.path.join(OUTDIR, "competition_results"), exist_ok=True)
    log_path = os.path.join(OUTDIR, "campaign.json")
    log = json.load(open(log_path)) if os.path.exists(log_path) else {}

    def flush():
        with open(log_path, "w") as f:
            json.dump(log, f, indent=1)

    for n in args.sizes:
        key = f"N{n}"
        rec = log.setdefault(key, {"searches": []})
        done = {s["kind"] for s in rec["searches"]}

        def run(kind, seed, b0, b1, resume=None):
            if kind in done:
                return
            e, path, wall = _search(n, seed, b0, b1, resume)
            rec["searches"].append({
                "kind": kind, "seed": seed, "beta": [b0, b1],
                "energy": e, "board": os.path.basename(path),
                "wall_s": wall,
                "warm_from": os.path.basename(resume) if resume else None,
            })
            print(json.dumps(rec["searches"][-1]), flush=True)
            flush()

        run("fresh", 31337, 0.8, 7.0)
        run("confirm", 4242, 0.8, 7.0)

        def best():
            s = min(rec["searches"], key=lambda s: s["energy"])
            return s["energy"], os.path.join(OUTDIR, "competition_results",
                                             s["board"])

        for i in range(args.max_refines):
            e_before, board = best()
            run(f"refine{i}", 777 + i, 2.0, 10.0, resume=board)
            e_after, _ = best()
            if e_after >= e_before:
                break  # the floor stopped moving
        rec["floor"] = best()[0]
        rec["floor_board"] = os.path.basename(best()[1])
        flush()
        print(f"N={n} full_3d floor: {rec['floor']} ({rec['floor_board']})",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
