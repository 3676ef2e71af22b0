"""Chain-level tests: invariants, kernel equivalence, early stop, stationarity."""

import itertools

import numpy as np
import pytest

from mcqueens.chain.spec import ChainSpec
from mcqueens.core import energy
from mcqueens.core.schedules import build_schedule
from mcqueens.dist import runner
from tests import _oracle


def _spec(**kw):
    defaults = dict(
        N=6,
        n_steps=2000,
        schedule=build_schedule("linear_annealing", 2000, beta_start=0.5, beta_end=3.0),
        init_mode="random",
        mcmc_type="board",
        kernel="tables",
    )
    defaults.update(kw)
    return ChainSpec(**defaults)


def _run(spec, n_runs=3, base_seed=7, **kw):
    seeds = base_seed + np.arange(n_runs, dtype=np.uint32)
    return runner.run_chains(seeds, spec, **kw)


# ---------------------------------------------------------------------------
# Invariants
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kernel", ["tables", "naive"])
def test_board_incremental_energy_matches_recompute(kernel):
    res = _run(_spec(kernel=kernel))
    for r in range(res.n_runs):
        assert res.final_energy[r] == _oracle.board_energy(res.final_state[r])
        assert res.best_energy[r] == _oracle.board_energy(res.best_state[r])


@pytest.mark.parametrize("kernel", ["tables", "naive"])
def test_full3d_incremental_energy_matches_recompute(kernel):
    spec = _spec(mcmc_type="full_3d", N=5, n_steps=1500, kernel=kernel)
    res = _run(spec, n_runs=2)
    for r in range(res.n_runs):
        assert res.final_energy[r] == _oracle.full3d_energy(res.final_state[r])
        assert res.best_energy[r] == _oracle.full3d_energy(res.best_state[r])
        # all queens on distinct cells
        cells = {tuple(q) for q in res.final_state[r].tolist()}
        assert len(cells) == spec.q_eff


def test_tables_and_naive_kernels_trace_identically():
    """Same keys => same proposals; delta-E must agree => identical chains."""
    a = _run(_spec(kernel="tables"), n_runs=3, base_seed=11)
    b = _run(_spec(kernel="naive"), n_runs=3, base_seed=11)
    np.testing.assert_array_equal(a.energy_history, b.energy_history)
    np.testing.assert_array_equal(a.final_state, b.final_state)
    np.testing.assert_array_equal(a.accept_bins, b.accept_bins)


def test_full3d_tables_and_naive_kernels_trace_identically():
    sa = _spec(mcmc_type="full_3d", N=5, n_steps=800, kernel="tables")
    sb = _spec(mcmc_type="full_3d", N=5, n_steps=800, kernel="naive")
    a = _run(sa, n_runs=2, base_seed=3)
    b = _run(sb, n_runs=2, base_seed=3)
    np.testing.assert_array_equal(a.energy_history, b.energy_history)
    np.testing.assert_array_equal(a.final_state, b.final_state)


def test_history_shape_and_best_tracking():
    res = _run(_spec())
    n_steps = res.spec.n_steps
    assert res.energy_history.shape == (3, n_steps + 1)
    assert (res.history_steps == np.arange(n_steps + 1)).all()
    for r in range(res.n_runs):
        h = res.energy_history[r]
        # steps_to_best is the first index achieving the minimum
        assert h[res.steps_to_best[r]] == h.min()
        assert res.best_energy[r] == h.min()
        assert np.argmin(h) == res.steps_to_best[r]
        assert res.history_len[r] == n_steps + 1  # no early stop


def test_energy_decreases_under_annealing():
    res = _run(_spec(N=8, n_steps=4000))
    assert (res.best_energy < res.energy_history[:, 0]).all()


def test_seed_determinism_and_independence():
    a = _run(_spec(), n_runs=2, base_seed=5)
    b = _run(_spec(), n_runs=2, base_seed=5)
    np.testing.assert_array_equal(a.energy_history, b.energy_history)
    c = _run(_spec(), n_runs=2, base_seed=6)
    assert not np.array_equal(a.energy_history[0], c.energy_history[0])
    # chains within a batch differ from each other
    assert not np.array_equal(a.energy_history[0], a.energy_history[1])


def test_history_stride_thinning():
    full = _run(_spec(n_steps=1000), n_runs=2)
    thin = _run(_spec(n_steps=1000, history_stride=10), n_runs=2)
    assert thin.energy_history.shape == (2, 101)
    np.testing.assert_array_equal(thin.history_steps, np.arange(0, 1001, 10))
    np.testing.assert_array_equal(
        thin.energy_history, full.energy_history[:, ::10]
    )
    # final state identical regardless of thinning
    np.testing.assert_array_equal(thin.final_state, full.final_state)


# ---------------------------------------------------------------------------
# Early stopping (board-mode reference semantics)
# ---------------------------------------------------------------------------


def test_early_stop_freezes_chain_and_truncates_history():
    spec = _spec(
        N=5,
        n_steps=3000,
        schedule=build_schedule("constant", 3000, beta_const=50.0),
        early_stop_patience=50,
    )
    res = _run(spec, n_runs=3)
    # At beta=50 the chain greedily descends then stalls -> all runs stop.
    assert (res.stop_step < spec.n_steps).all()
    for r in range(res.n_runs):
        s = res.stop_step[r]
        h = res.energy_history[r]
        assert res.history_len[r] == s + 1
        # frozen after stop: emitted values repeat the last energy
        assert (h[s:] == h[s]).all()
        # bins counted the breaking step but nothing after
        assert res.total_bins[r].sum() == s + 1


def test_no_early_stop_when_patience_none():
    res = _run(_spec(early_stop_patience=None))
    assert (res.stop_step == res.spec.n_steps).all()
    assert (res.total_bins.sum(axis=1) == res.spec.n_steps).all()


def test_full3d_patience_ignored_by_reference_compatible_runner():
    """run_experiment replicates the reference quirk: full_3d never stops."""
    sched = build_schedule("constant", 500, beta_const=50.0)
    res = runner.run_experiment(
        N=4, n_steps=500, init_mode="random", schedule=sched, n_runs=2,
        base_seed=0, mcmc_type="full_3d", early_stop_patience=10,
    )
    assert (res.stop_step == 500).all()


def test_run_experiment_accepts_none_string_patience():
    sched = build_schedule("constant", 100, beta_const=1.0)
    res = runner.run_experiment(
        N=4, n_steps=100, init_mode="random", schedule=sched, n_runs=1,
        base_seed=0, mcmc_type="board", early_stop_patience="None",
    )
    assert (res.stop_step == 100).all()


# ---------------------------------------------------------------------------
# Acceptance statistics
# ---------------------------------------------------------------------------


def test_acceptance_bins_account_for_all_steps():
    res = _run(_spec(n_steps=1000))
    assert (res.total_bins.sum(axis=1) == 1000).all()
    assert (res.accept_bins <= res.total_bins).all()
    # annealing beta up => acceptance falls: first fifth vs last fifth
    rate = res.accept_bins.sum(0) / res.total_bins.sum(0)
    assert rate[:20].mean() > rate[-20:].mean()


# ---------------------------------------------------------------------------
# Stationarity (detailed-balance smoke test, SURVEY §4.2)
# ---------------------------------------------------------------------------


def test_board_chain_samples_boltzmann_distribution():
    """N=3 board: 3^9 enumerable states; empirical energy law ~ e^{-beta E}.

    N=3, not N=2: every N=2 board state has energy exactly 6, so the N=2
    "test" of round 1 could not distinguish Boltzmann from uniform (or from
    any sampler at all).  At N=3, beta=1.0 the two laws differ by 0.24 in
    total-variation-ish max gap — asserted below so the test keeps its power.
    """
    N, beta, n_steps = 3, 1.0, 20000
    spec = _spec(
        N=N,
        n_steps=n_steps,
        schedule=build_schedule("constant", n_steps, beta_const=beta),
        init_mode="random",
    )
    res = _run(spec, n_runs=8, base_seed=123)

    # Exact energy distribution by enumeration.
    weights = {}
    counts = {}
    for hs in itertools.product(range(N), repeat=N * N):
        h = np.array(hs).reshape(N, N)
        e = _oracle.board_energy(h)
        weights[e] = weights.get(e, 0.0) + np.exp(-beta * e)
        counts[e] = counts.get(e, 0) + 1
    z = sum(weights.values())
    expect = {e: w / z for e, w in weights.items()}

    burn = 2000
    samples = res.energy_history[:, burn:].reshape(-1)
    tol = 0.02
    for e, p in expect.items():
        emp = (samples == e).mean()
        assert abs(emp - p) < tol, (e, emp, p)
    n_states = sum(counts.values())
    gap = max(abs(counts[e] / n_states - expect[e]) for e in expect)
    assert gap > 2 * tol, f"test lacks power vs uniform: gap {gap}"


@pytest.mark.parametrize("kind,params", [
    ("constant", dict(beta_const=2.0)),
    ("exponential_annealing", dict(beta_start=0.5, beta_end=4.0)),
    ("logarithmic_annealing", dict(beta_start=0.5, beta_end=4.0)),
    ("sinusoidal_annealing", dict(beta_start=0.5, beta_end=4.0)),
])
def test_every_schedule_drives_a_chain(kind, params):
    """All five schedule families run inside the fused step (linear is
    exercised everywhere else)."""
    spec = _spec(
        N=5, n_steps=800, schedule=build_schedule(kind, 800, **params)
    )
    res = _run(spec, n_runs=2)
    for r in range(2):
        assert res.final_energy[r] == _oracle.board_energy(res.final_state[r])
    if kind != "constant":
        # annealing: early acceptance above late acceptance
        rate = res.accept_bins.sum(0) / np.maximum(res.total_bins.sum(0), 1)
        assert rate[:20].mean() > rate[-20:].mean()


@pytest.mark.parametrize("init_mode", ["latin", "klarner"])
def test_full3d_structured_inits_run(init_mode):
    spec = _spec(
        N=6, n_steps=500, mcmc_type="full_3d", init_mode=init_mode,
        schedule=build_schedule("linear_annealing", 500, beta_start=0.5,
                                beta_end=3.0),
    )
    res = _run(spec, n_runs=2)
    for r in range(2):
        assert res.final_energy[r] == _oracle.full3d_energy(res.final_state[r])
        cells = {tuple(q) for q in res.final_state[r].tolist()}
        assert len(cells) == 36


def test_klarner_gcd1_board_chain_stays_at_zero_when_cold():
    spec = _spec(
        N=11, n_steps=200, init_mode="klarner",
        schedule=build_schedule("constant", 200, beta_const=100.0),
    )
    res = _run(spec, n_runs=2)
    assert (res.energy_history[:, 0] == 0).all()
    assert (res.best_energy == 0).all()


def test_board_warm_start_from_explicit_heights():
    """The reference's explicit-state constructor path (mcmc_board heights=)."""
    N = 6
    rng = np.random.default_rng(0)
    starts = rng.integers(0, N, size=(2, N, N))
    spec = _spec(N=N, n_steps=300)
    res = runner.run_chains(np.arange(2, dtype=np.uint32), spec,
                            initial_states=starts)
    for r in range(2):
        assert res.energy_history[r, 0] == _oracle.board_energy(starts[r])
        assert res.final_energy[r] == _oracle.board_energy(res.final_state[r])
    with pytest.raises(ValueError, match="must be in"):
        runner.run_chains(np.arange(2, dtype=np.uint32), spec,
                          initial_states=starts + N)
    with pytest.raises(ValueError, match="shape"):
        runner.run_chains(np.arange(2, dtype=np.uint32), spec,
                          initial_states=starts[:, :3])


def test_full3d_warm_start_and_duplicate_rejection():
    N, Q = 4, 16
    rng = np.random.default_rng(1)
    starts = np.stack([_oracle.random_full3d(rng, N, Q) for _ in range(2)])
    spec = _spec(N=N, n_steps=200, mcmc_type="full_3d")
    res = runner.run_chains(np.arange(2, dtype=np.uint32), spec,
                            initial_states=starts)
    for r in range(2):
        assert res.energy_history[r, 0] == _oracle.full3d_energy(starts[r])
    bad = starts.copy()
    bad[0, 1] = bad[0, 0]  # duplicate cell
    with pytest.raises(ValueError, match="same"):
        runner.run_chains(np.arange(2, dtype=np.uint32), spec,
                          initial_states=bad)
