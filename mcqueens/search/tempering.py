"""Parallel tempering (replica exchange) over the shared-site board kernel.

A beyond-reference search capability: the reference anneals independent
chains (``/root/reference/experiments.py:282-376``); simulated annealing gets
trapped in deep local minima (its own report shows constant/logarithmic
schedules trapping, report section IV.B).  Parallel tempering runs a ladder
of inverse temperatures simultaneously and lets configurations migrate
between levels, so cold chains inherit basin-hopping moves discovered by hot
ones.  On TPU this is nearly free: chains are lanes, so a ladder level is
just a per-chain beta scale, and the exchange move is a tiny XLA
select/permute on the (C,) beta vector between kernel segments — states never
move, only their temperatures do.

Layout: chain ``c`` sits at ladder level ``c % L`` in replica group
``c // L``.  Every ``history_stride`` steps (one kernel segment) adjacent
levels in each group attempt a swap with the standard acceptance
``min(1, exp((beta_a - beta_b) * (E_a - E_b)))``, alternating odd/even pairs
(deterministic-even-odd scheme).  Swapping *temperatures* rather than states
keeps the O(N^2) board state resident in VMEM; only the (C,) beta row is
rewritten.

Validity with the shared-site kernel: chains in a VMEM block share each
step's proposal site, but conditioned on the site sequence every chain's
transition kernel preserves its own Boltzmann law, so the product measure
over the ladder is stationary for the segment phase; the exchange phase
preserves the same product measure by detailed balance.  Marginal
stationarity per level is asserted by ``tests/test_tempering.py``.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from mcqueens.chain.spec import ChainSpec


def geometric_ladder(beta_min: float, beta_max: float, n_levels: int):
    """Geometric beta ladder (constant acceptance ratio heuristic)."""
    if n_levels < 2:
        raise ValueError("need at least 2 ladder levels")
    if not 0 < beta_min < beta_max:
        raise ValueError("need 0 < beta_min < beta_max")
    return np.geomspace(beta_min, beta_max, n_levels).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_levels", "phase"))
def exchange(betas, energies, key, n_levels: int, phase: int):
    """One replica-exchange sweep: swap betas between adjacent ladder levels.

    Args:
        betas: (C,) float32 per-chain beta values; chain c is at level
            ``c % n_levels`` of group ``c // n_levels``.  Any tail chains
            beyond the last full group keep their beta untouched.
        energies: (C,) current energies (the exact incremental energies the
            kernels carry — no recompute needed).
        key: PRNG key for the swap accept draws.
        phase: 0 or 1 — which alternation of adjacent pairs to attempt.

    Returns:
        (C,) updated betas.  Each group's multiset of betas is invariant.
    """
    C = betas.shape[0]
    G = C // n_levels
    paired = G * n_levels
    b = betas[:paired].reshape(G, n_levels)
    e = energies[:paired].reshape(G, n_levels).astype(jnp.float32)
    lo = np.arange(phase, n_levels - 1, 2)
    hi = lo + 1
    bl, bh = b[:, lo], b[:, hi]
    el, eh = e[:, lo], e[:, hi]
    # A = min(1, exp((beta_l - beta_h)(E_l - E_h))); log-space comparison.
    log_a = (bl - bh) * (el - eh)
    u = jax.random.uniform(key, bl.shape, minval=1e-38)
    swap = jnp.log(u) < log_a
    b = b.at[:, lo].set(jnp.where(swap, bh, bl))
    b = b.at[:, hi].set(jnp.where(swap, bl, bh))
    return jnp.concatenate([b.reshape(-1), betas[paired:]])


def run_tempered(
    seeds,
    spec: ChainSpec,
    ladder,
    *,
    swap_seed: int = 0,
    initial_states=None,
    verbose: bool = False,
    record_betas: bool = False,
):
    """Run parallel-tempered chains; exchange every ``history_stride`` steps.

    Args:
        seeds: (R,) per-chain integer seeds (R should be a multiple of
            ``len(ladder)`` so every group is complete).
        spec: chain spec with ``kernel='pallas_shared'`` and
            ``mcmc_type='board'``.  ``spec.schedule`` multiplies the ladder:
            a constant-1 schedule gives plain parallel tempering at the
            ladder values; an annealing schedule anneals the whole ladder.
        ladder: (L,) ascending beta values (see :func:`geometric_ladder`).
        swap_seed: seed for the exchange accept draws.
        initial_states: optional (R, N, N) warm starts.
        record_betas: also return the per-round (C,) beta assignments
            (memory: rounds x chains floats — small shapes only).

    Returns:
        dict with best_energy/best_state (over real chains), final betas,
        per-round energy history (chains x rounds+1), wall time, and
        optionally the beta history.
    """
    from mcqueens.dist import runner as runner_mod
    from mcqueens.kernels import board_shared

    if spec.kernel != "pallas_shared" or spec.mcmc_type != "board":
        raise ValueError("run_tempered requires kernel='pallas_shared', "
                         "mcmc_type='board'")
    ladder = np.asarray(ladder, np.float32)
    n_levels = int(ladder.shape[0])
    seeds = np.asarray(seeds, dtype=np.uint32)
    n_runs = seeds.shape[0]
    if initial_states is not None:
        initial_states = runner_mod.validate_initial_states(
            initial_states, spec, n_runs)

    carry = board_shared.init_carry_batch(
        seeds, spec, initial_states=initial_states)
    C = int(carry.energy.shape[0])
    reps = -(-C // n_levels)
    betas = jnp.asarray(np.tile(ladder, reps)[:C])

    key = jax.random.PRNGKey(np.uint32(swap_seed))
    e0 = np.asarray(carry.energy).reshape(-1)
    history = [e0[None, :]]
    betas_hist = []
    t0 = time.time()
    for r in range(spec.n_outer):
        carry, ys = board_shared.run_segment_tempered(
            carry, betas, np.int32(r), spec, 1)
        history.append(np.asarray(ys))
        if record_betas:
            # The betas under which this round's samples were generated.
            betas_hist.append(np.asarray(betas))
        if r + 1 < spec.n_outer:
            key, sub = jax.random.split(key)
            betas = exchange(betas, carry.energy.reshape(-1), sub,
                             n_levels, r % 2)
        if verbose and (r + 1) % max(1, spec.n_outer // 10) == 0:
            e = np.asarray(carry.energy).reshape(-1)[:n_runs]
            be = np.asarray(carry.best_energy).reshape(-1)[:n_runs]
            print(f"[tempering] round {r + 1}/{spec.n_outer}: "
                  f"mean E={e.mean():.2f} best={be.min()}")
    best_energy = np.asarray(carry.best_energy).reshape(-1)
    wall = time.time() - t0

    s = slice(0, n_runs)
    out = {
        "best_energy": best_energy[s],
        "best_state": np.asarray(carry.best_heights, dtype=np.int64)
        .reshape(-1, spec.N, spec.N)[s],
        "final_energy": np.asarray(carry.energy).reshape(-1)[s],
        "final_state": np.asarray(carry.heights, dtype=np.int64)
        .reshape(-1, spec.N, spec.N)[s],
        "energy_history": np.concatenate(history, axis=0).T[s],
        "betas": np.asarray(betas)[s],
        "ladder": ladder,
        "wall_time": wall,
        "proposals": int(np.asarray(carry.total_bins).sum()),
    }
    if record_betas:
        out["betas_history"] = np.stack(betas_hist, axis=0)[:, :n_runs]
    return out
