"""Tests for the shared-site sliced board kernel (kernel="pallas_shared").

The kernel trades per-chain proposal *sites* for O(N)-work delta-E (sites are
shared per VMEM block per step; each chain keeps its own new-height and
accept draws).  Validation mirrors the other kernels: trajectory invariants
against the energy oracle, bitwise determinism (the counter-based PRNG is
layout- and backend-independent), enumerable-state Boltzmann stationarity,
and semantics (early stop, warm starts, sharding).
"""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mcqueens.chain.spec import ChainSpec
from mcqueens.core.schedules import build_schedule
from mcqueens.dist import runner
from mcqueens.kernels import prng
from tests import _oracle


def _run(spec, n_runs=8, base_seed=3, **kw):
    with pltpu.force_tpu_interpret_mode():
        return runner.run_chains(
            base_seed + np.arange(n_runs, dtype=np.uint32), spec, **kw
        )


def _spec(**kw):
    defaults = dict(
        N=5,
        n_steps=400,
        schedule=build_schedule("linear_annealing", 400, beta_start=0.5,
                                beta_end=3.0),
        init_mode="random",
        mcmc_type="board",
        kernel="pallas_shared",
        history_stride=50,
    )
    defaults.update(kw)
    return ChainSpec(**defaults)


@pytest.mark.parametrize("N", [3, 5, 16])
def test_shared_kernel_invariants(N):
    """Incremental energies match the oracle on final and best states."""
    spec = _spec(N=N, n_steps=300, history_stride=50)
    res = _run(spec, n_runs=4)
    for r in range(res.n_runs):
        assert res.final_energy[r] == _oracle.board_energy(res.final_state[r])
        assert res.best_energy[r] == _oracle.board_energy(res.best_state[r])
        assert res.best_energy[r] <= res.energy_history[r].min()
        assert res.energy_history[r, -1] == res.final_energy[r]
    assert (res.total_bins.sum(axis=1) == spec.n_steps).all()
    assert (res.accept_bins <= res.total_bins).all()
    assert (res.best_energy <= res.energy_history[:, 0]).all()


def test_shared_kernel_deterministic():
    spec = _spec(n_steps=200, history_stride=50)
    a = _run(spec, n_runs=4)
    b = _run(spec, n_runs=4)
    np.testing.assert_array_equal(a.energy_history, b.energy_history)
    np.testing.assert_array_equal(a.final_state, b.final_state)
    np.testing.assert_array_equal(a.accept_bins, b.accept_bins)


def test_shared_kernel_klarner_stays_optimal():
    spec = _spec(N=11, init_mode="klarner", n_steps=60, history_stride=60,
                 schedule=build_schedule("constant", 60, beta_const=100.0))
    res = _run(spec, n_runs=2)
    assert (res.energy_history[:, 0] == 0).all()
    assert (res.best_energy == 0).all()
    assert (res.final_energy == 0).all()


def test_shared_kernel_early_stop():
    spec = _spec(
        n_steps=600,
        schedule=build_schedule("constant", 600, beta_const=50.0),
        early_stop_patience=40,
        history_stride=50,
    )
    res = _run(spec, n_runs=4)
    assert (res.stop_step < 600).any()
    for r in range(res.n_runs):
        s = res.stop_step[r]
        if s < 600:
            # frozen after stop; bins counted the breaking step then froze
            assert res.total_bins[r].sum() == s + 1
            assert res.energy_history[r, -1] == res.energy_history[
                r, (s // spec.history_stride) + 1
            ]


def test_shared_kernel_warm_start():
    N = 5
    rng = np.random.default_rng(2)
    starts = rng.integers(0, N, size=(3, N, N))
    spec = _spec(N=N, n_steps=200, history_stride=50)
    res = _run(spec, n_runs=3, initial_states=starts)
    for r in range(3):
        assert res.energy_history[r, 0] == _oracle.board_energy(starts[r])
        assert res.final_energy[r] == _oracle.board_energy(res.final_state[r])


def test_shared_kernel_samples_boltzmann_distribution():
    """N=3 enumerable board: per-chain marginals obey the e^{-beta E} law.

    Shared sites couple chains within a block, but each chain's marginal law
    is exactly the random-scan Metropolis chain, so pooled occupancy must
    still match Boltzmann.  N=3, not N=2: every N=2 board state has energy 6,
    so Boltzmann == uniform there and no sampler bug is detectable (round-1's
    N=2 stationarity tests were vacuous — they passed even with the stubbed
    interpret-mode PRNG's always-accept sampler).  The power guard at the
    bottom keeps this test honest against the uniform law.
    """
    N, beta, n_steps, stride = 3, 1.0, 8000, 50
    spec = _spec(
        N=N,
        n_steps=n_steps,
        schedule=build_schedule("constant", n_steps, beta_const=beta),
        history_stride=stride,
    )
    res = _run(spec, n_runs=64, base_seed=17)

    weights = {}
    counts = {}
    for hs in itertools.product(range(N), repeat=N * N):
        e = _oracle.board_energy(np.array(hs).reshape(N, N))
        weights[e] = weights.get(e, 0.0) + np.exp(-beta * e)
        counts[e] = counts.get(e, 0) + 1
    z = sum(weights.values())
    n_states = sum(counts.values())

    burn_points = 2000 // stride
    samples = res.energy_history[:, burn_points:].reshape(-1)
    assert samples.size >= 5000
    tol = 0.03
    for e, w in weights.items():
        emp = (samples == e).mean()
        assert abs(emp - w / z) < tol, (e, emp, w / z)
    # Power guard: the uniform law must be distinguishable at this beta/tol,
    # otherwise the assertions above cannot catch a broken accept test.
    gap = max(abs(counts[e] / n_states - weights[e] / z) for e in weights)
    assert gap > 2 * tol, f"test lacks power: uniform-vs-Boltzmann gap {gap}"


def test_shared_kernel_sharded_matches_same_block_layout():
    """Sharding must not change results when the block layout is identical.

    Site streams are keyed per block, so a 2-device run with 128-chain
    blocks equals an unsharded run forced to the same 128-chain blocks.
    """
    import jax

    from mcqueens.dist import mesh as mesh_mod
    from mcqueens.kernels import board_shared

    spec = _spec(n_steps=200, history_stride=100)
    seeds = np.arange(256, dtype=np.uint32)
    mesh = mesh_mod.make_mesh(jax.devices()[:2])
    with pltpu.force_tpu_interpret_mode():
        sharded = runner.run_chains(seeds, spec, mesh=mesh)
        carry = board_shared.init_carry_batch(seeds, spec, block=128)
        carry, ys = board_shared.run_segment(carry, np.int32(0), spec, 2)
    np.testing.assert_array_equal(
        sharded.final_energy, np.asarray(carry.energy).reshape(-1)
    )
    np.testing.assert_array_equal(
        sharded.energy_history[:, 1:], np.asarray(ys).T
    )
    np.testing.assert_array_equal(
        sharded.best_energy, np.asarray(carry.best_energy).reshape(-1)
    )


def test_shared_kernel_full3d_routes_to_full3d_shared():
    """Round 3: pallas_shared covers full_3d too (kernels/full3d_shared.py,
    tested in tests/test_full3d_shared.py); the spec must accept it and the
    runner must route it to the shared full-3D module."""
    from mcqueens.dist.runner import _modules
    from mcqueens.kernels import full3d_shared

    spec = _spec(mcmc_type="full_3d", N=4)
    assert _modules(spec) is full3d_shared


def test_counter_prng_uniformity():
    """lowbias32 stream sanity: mean/variance/bit balance of step words."""
    g = prng.chain_ids(jnp.int32(12345), jnp.arange(256, dtype=jnp.int32))
    ws = []
    for s in range(64):
        w0, w1 = prng.step_words(g, jnp.int32(s))
        ws.append(np.asarray(prng.uniform01(w1)))
        k = np.asarray(w0) % 15
        assert 5.5 < k.mean() < 8.5  # uniform over [0, 15) -> mean 7
    u = np.stack(ws).reshape(-1)
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1 / 12) < 0.005
    # no step-to-step correlation in the pooled stream
    flat = np.stack(ws)
    corr = np.corrcoef(flat[:-1].reshape(-1), flat[1:].reshape(-1))[0, 1]
    assert abs(corr) < 0.03


def test_shared_kernel_bins_exact_when_narrow():
    """Bin totals are exact even when an unroll group straddles >2 bins.

    n_steps=400 with the default 100 bins gives 4-step bins — narrower than
    the kernel's 8-step unroll group — and stride 50 misaligns groups with
    bin boundaries.  The fast split-accumulator scheme would leak mid-bin
    counts into the group's first bin; the kernel must detect the narrow
    width and take the exact per-step path.
    """
    spec = _spec(n_steps=400, history_stride=50)
    res = _run(spec, n_runs=4)
    assert (res.total_bins == 4).all()


def test_shared_kernel_wide_unroll_invariants():
    """Cover the production unroll-32 path (segments >= 1024 steps).

    Tiny strides take the _UNROLL_SMALL=8 path; this run's 1024-step
    segments compile the 32-step groups, whose group-amortized best-board
    reconstruction and split-bin accounting must match the oracle exactly.
    """
    spec = _spec(N=6, n_steps=2048, history_stride=1024,
                 schedule=build_schedule("linear_annealing", 2048,
                                         beta_start=0.5, beta_end=3.0))
    res = _run(spec, n_runs=2)
    for r in range(res.n_runs):
        assert res.final_energy[r] == _oracle.board_energy(res.final_state[r])
        assert res.best_energy[r] == _oracle.board_energy(res.best_state[r])
    assert (res.total_bins.sum(axis=1) == spec.n_steps).all()


def test_recover_best_heights_matches_tracked():
    """track_best=False + deterministic replay == track_best=True, bitwise."""
    from mcqueens.kernels import board_shared

    N = 5
    spec = _spec(N=N, n_steps=400, history_stride=50)
    seeds = 3 + np.arange(6, dtype=np.uint32)
    with pltpu.force_tpu_interpret_mode():
        tracked, _ = board_shared.run_segment(
            board_shared.init_carry_batch(seeds, spec), np.int32(0), spec,
            spec.n_outer)
        untracked, _ = board_shared.run_segment(
            board_shared.init_carry_batch(seeds, spec), np.int32(0), spec,
            spec.n_outer, track_best=False)
        np.testing.assert_array_equal(np.asarray(untracked.best_energy),
                                      np.asarray(tracked.best_energy))
        np.testing.assert_array_equal(np.asarray(untracked.best_step),
                                      np.asarray(tracked.best_step))
        rec = board_shared.recover_best_heights(untracked, spec)
    want = np.asarray(tracked.best_heights).reshape(-1, N, N)
    np.testing.assert_array_equal(rec, want)
    be = np.asarray(tracked.best_energy).reshape(-1)
    for c in range(rec.shape[0]):
        assert _oracle.board_energy(rec[c]) == be[c]


def test_recover_best_heights_warm_start_and_verify():
    """Replay needs the same warm starts; omitting them is caught, not wrong."""
    from mcqueens.kernels import board_shared

    N = 5
    rng = np.random.default_rng(11)
    starts = rng.integers(0, N, size=(4, N, N)).astype(np.int32)
    spec = _spec(N=N, n_steps=200, history_stride=50)
    seeds = np.arange(4, dtype=np.uint32)
    with pltpu.force_tpu_interpret_mode():
        tracked, _ = board_shared.run_segment(
            board_shared.init_carry_batch(seeds, spec,
                                          initial_states=starts),
            np.int32(0), spec, spec.n_outer)
        rec = board_shared.recover_best_heights(tracked, spec,
                                                initial_states=starts)
        np.testing.assert_array_equal(
            rec, np.asarray(tracked.best_heights).reshape(-1, N, N))
        with pytest.raises(AssertionError, match="replay mismatch"):
            board_shared.recover_best_heights(tracked, spec)
