"""Distribution-level parity vs the reference CPU implementation.

The reference (pure NumPy) is executed from /root/reference as a black-box
oracle — none of its code lives in this repo.  Bitwise parity is impossible
(MT19937 vs threefry streams); parity is defined at the distribution level
(SURVEY §2.1/§4.3): equilibrium energy at fixed beta, acceptance rates, and
annealed best-energy quality must agree within sampling noise.

Skipped automatically when the reference checkout is not present.
"""

import os
import subprocess
import sys
import textwrap
import json

import numpy as np
import pytest

from mcqueens.chain.spec import ChainSpec
from mcqueens.core.schedules import build_schedule
from mcqueens.dist import runner

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)


def _run_reference(n, n_steps, beta_start, beta_end, sched, seeds, init_mode):
    """Run reference board chains in a subprocess; return summary stats."""
    script = textwrap.dedent(
        f"""
        import json, sys
        sys.path.insert(0, {REFERENCE!r})
        import numpy as np
        from experiments import metropolis_mcmc_board, build_schedule_from_params

        out = []
        for seed in {list(seeds)!r}:
            sched = build_schedule_from_params(
                {sched!r}, {n_steps}, beta_const={beta_start},
                beta_start={beta_start}, beta_end={beta_end})
            res = metropolis_mcmc_board(
                N={n}, n_steps={n_steps}, init_mode={init_mode!r},
                beta_schedule=sched, verbose=False, seed=seed)
            hist = np.array(res["energy_history"])
            out.append({{
                "best": int(res["best_energy"]),
                "final": int(res["final_energy"]),
                "accept_rate": len(res["accepted_steps"]) / {n_steps},
                "tail_mean": float(hist[{n_steps}//2:].mean()),
            }})
        print(json.dumps(out))
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_equilibrium_energy_and_acceptance_match_reference():
    """Fixed beta: equilibrium energy level + acceptance rate agree."""
    N, n_steps, beta, n_runs = 6, 20000, 1.0, 12
    ref = _run_reference(N, n_steps, beta, beta, "constant",
                         seeds=range(100, 100 + n_runs), init_mode="random")

    spec = ChainSpec(
        N=N, n_steps=n_steps,
        schedule=build_schedule("constant", n_steps, beta_const=beta),
        init_mode="random", mcmc_type="board", kernel="tables",
    )
    res = runner.run_chains(np.arange(n_runs, dtype=np.uint32), spec)

    ref_tail = np.mean([r["tail_mean"] for r in ref])
    our_tail = res.energy_history[:, n_steps // 2:].mean()
    # Equilibrium mean energy at beta=1: agreement within a few percent
    assert abs(our_tail - ref_tail) / ref_tail < 0.05, (our_tail, ref_tail)

    ref_acc = np.mean([r["accept_rate"] for r in ref])
    our_acc = res.accept_bins.sum() / res.total_bins.sum()
    assert abs(our_acc - ref_acc) < 0.03, (our_acc, ref_acc)


def test_annealed_best_energy_quality_matches_reference():
    """Linear anneal at N=7: mean best energies agree within noise."""
    N, n_steps, n_runs = 7, 20000, 12
    ref = _run_reference(N, n_steps, 1.0, 4.0, "linear_annealing",
                         seeds=range(7, 7 + n_runs), init_mode="random")
    spec = ChainSpec(
        N=N, n_steps=n_steps,
        schedule=build_schedule("linear_annealing", n_steps,
                                beta_start=1.0, beta_end=4.0),
        init_mode="random", mcmc_type="board", kernel="tables",
    )
    res = runner.run_chains(np.arange(n_runs, dtype=np.uint32), spec)
    ref_best = np.mean([r["best"] for r in ref])
    our_best = res.best_energy.mean()
    # Solution quality parity: small additive slack, both are stochastic.
    assert abs(our_best - ref_best) <= max(2.0, 0.15 * ref_best), (
        our_best, ref_best,
    )
