"""Pallas kernel tests: delta-E identity + kernel invariants (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mcqueens.chain.spec import ChainSpec
from mcqueens.core import tables
from mcqueens.core.schedules import build_schedule
from mcqueens.dist import runner
from mcqueens.kernels.delta_e import board_delta_e_dense
from tests import _oracle


@pytest.mark.parametrize("N", [3, 5, 8, 16])
def test_dense_delta_e_equals_table_delta(N):
    """The kernel's gather-free identity == count-table delta, exhaustively."""
    rng = np.random.default_rng(N)
    ii = np.indices((N, N)).reshape(2, -1)
    ig, jg = jnp.int32(ii[0]), jnp.int32(ii[1])
    h = rng.integers(0, N, size=(N, N))
    t = tables.build_board_table(jnp.int32(h))
    for i in range(N):
        for j in range(N):
            old_k = int(h[i, j])
            for new_k in range(N):
                if new_k == old_k:
                    continue
                d_ref, _, _ = tables.board_delta_e(t, i, j, old_k, new_k, N)
                d = board_delta_e_dense(
                    jnp.int32(h.reshape(1, -1)), ig, jg,
                    jnp.int32([[i]]), jnp.int32([[j]]),
                    jnp.int32([[old_k]]), jnp.int32([[new_k]]),
                )
                assert int(d_ref) == int(d[0, 0]), (N, i, j, old_k, new_k)


def _run_pallas(spec, n_runs=8, base_seed=3):
    with pltpu.force_tpu_interpret_mode():
        return runner.run_chains(
            base_seed + np.arange(n_runs, dtype=np.uint32), spec
        )


def _spec(**kw):
    defaults = dict(
        N=5,
        n_steps=400,
        schedule=build_schedule("linear_annealing", 400, beta_start=0.5,
                                beta_end=3.0),
        init_mode="random",
        mcmc_type="board",
        kernel="pallas",
        history_stride=50,
    )
    defaults.update(kw)
    return ChainSpec(**defaults)


def test_pallas_kernel_invariants_interpret_mode():
    spec = _spec()
    res = _run_pallas(spec, n_runs=4)
    assert res.energy_history.shape == (4, 9)
    for r in range(res.n_runs):
        assert res.final_energy[r] == _oracle.board_energy(res.final_state[r])
        assert res.best_energy[r] == _oracle.board_energy(res.best_state[r])
        assert res.best_energy[r] <= res.energy_history[r].min()
    assert (res.total_bins.sum(axis=1) == spec.n_steps).all()
    assert (res.accept_bins <= res.total_bins).all()
    # annealing should improve over the initial energy for most chains
    assert (res.best_energy <= res.energy_history[:, 0]).all()


def test_pallas_kernel_deterministic():
    spec = _spec(n_steps=200, history_stride=50)
    a = _run_pallas(spec, n_runs=4)
    b = _run_pallas(spec, n_runs=4)
    np.testing.assert_array_equal(a.energy_history, b.energy_history)
    np.testing.assert_array_equal(a.final_state, b.final_state)


def test_pallas_early_stop():
    spec = _spec(
        n_steps=600,
        schedule=build_schedule("constant", 600, beta_const=50.0),
        early_stop_patience=40,
        history_stride=50,
    )
    res = _run_pallas(spec, n_runs=4)
    assert (res.stop_step < 600).any()
    for r in range(res.n_runs):
        s = res.stop_step[r]
        if s < 600:
            # frozen after stop; bins counted the breaking step then froze
            assert res.total_bins[r].sum() == s + 1


def test_pallas_full3d_invariants_interpret_mode():
    spec = _spec(N=4, mcmc_type="full_3d", n_steps=300, history_stride=50)
    res = _run_pallas(spec, n_runs=4)
    for r in range(res.n_runs):
        assert res.final_energy[r] == _oracle.full3d_energy(res.final_state[r])
        assert res.best_energy[r] == _oracle.full3d_energy(res.best_state[r])
        cells = {tuple(q) for q in res.final_state[r].tolist()}
        assert len(cells) == spec.q_eff  # queens stay on distinct cells
        assert (res.final_state[r] >= 0).all()
        assert (res.final_state[r] < spec.N).all()
    assert (res.total_bins.sum(axis=1) == spec.n_steps).all()
    assert (res.best_energy <= res.energy_history[:, 0]).all()


def test_pallas_full3d_klarner_init_zero_energy():
    spec = _spec(N=11, mcmc_type="full_3d", init_mode="klarner",
                 n_steps=40, history_stride=40,
                 schedule=build_schedule("constant", 40, beta_const=100.0))
    res = _run_pallas(spec, n_runs=2)
    # beta=100: the zero-energy Klarner start is never left
    assert (res.best_energy == 0).all()
    assert (res.energy_history[:, 0] == 0).all()


def test_pallas_kernel_samples_boltzmann_distribution():
    """N=3 enumerable board: the kernel's PRNG obeys the e^{-beta E} law.

    History is thinned (stride 50) — a subsampled stationary chain is still
    stationary, and one kernel launch per history point keeps interpret mode
    affordable.  N=3, not N=2: all N=2 states share energy 6, so Boltzmann
    == uniform there and round-1's N=2 version could not detect the stubbed
    interpret-mode PRNG (always-accept).  A power guard keeps this honest.
    """
    import itertools

    N, beta, n_steps, stride = 3, 1.0, 10000, 50
    spec = _spec(
        N=N,
        n_steps=n_steps,
        schedule=build_schedule("constant", n_steps, beta_const=beta),
        history_stride=stride,
    )
    res = _run_pallas(spec, n_runs=24, base_seed=17)

    weights = {}
    counts = {}
    for hs in itertools.product(range(N), repeat=N * N):
        h = np.array(hs).reshape(N, N)
        e = _oracle.board_energy(h)
        weights[e] = weights.get(e, 0.0) + np.exp(-beta * e)
        counts[e] = counts.get(e, 0) + 1
    z = sum(weights.values())

    burn_points = 2000 // stride
    samples = res.energy_history[:, burn_points:].reshape(-1)
    assert samples.size >= 3000
    tol = 0.03
    for e, w in weights.items():
        emp = (samples == e).mean()
        assert abs(emp - w / z) < tol, (e, emp, w / z)
    n_states = sum(counts.values())
    gap = max(abs(counts[e] / n_states - weights[e] / z) for e in weights)
    assert gap > 2 * tol, f"test lacks power vs uniform: gap {gap}"


def test_pallas_sharded_over_mesh_matches_unsharded():
    """Pallas kernel under shard_map on the 8-device CPU mesh.

    The mesh run uses a different block layout (one device's share per
    block) than the unsharded run — streams are keyed by each chain's own
    seed (prng.chain_streams), so results must be bitwise identical anyway
    (CLAUDE.md invariant: mesh layout must not change results).
    """
    import jax

    from mcqueens.dist import mesh as mesh_mod

    spec = _spec(n_steps=200, history_stride=50)
    seeds = np.arange(16, dtype=np.uint32)
    mesh = mesh_mod.make_mesh(jax.devices()[:2])
    with pltpu.force_tpu_interpret_mode():
        plain = runner.run_chains(seeds, spec)
        sharded = runner.run_chains(seeds, spec, mesh=mesh)
    assert sharded.n_runs == plain.n_runs
    np.testing.assert_array_equal(plain.energy_history, sharded.energy_history)
    np.testing.assert_array_equal(plain.best_energy, sharded.best_energy)


@pytest.mark.parametrize("mcmc_type", ["board", "full_3d"])
def test_pallas_block_layout_invariance(mcmc_type):
    """Explicitly different VMEM block sizes give identical trajectories.

    Chain streams are keyed by the chain's seed, not its (block, lane)
    position, so regrouping chains into different block sizes must not
    change any trajectory — the property that makes mesh sharding exact.
    """
    from mcqueens.kernels import full3d_pallas, metropolis_pallas

    mod = metropolis_pallas if mcmc_type == "board" else full3d_pallas
    spec = _spec(mcmc_type=mcmc_type, n_steps=100, history_stride=50)
    seeds = np.arange(16, dtype=np.uint32)
    with pltpu.force_tpu_interpret_mode():
        a = mod.init_carry_batch(seeds, spec, block=8)
        a, ys_a = mod.run_segment(a, np.int32(0), spec, 2)
        b = mod.init_carry_batch(seeds, spec, block=16)
        b, ys_b = mod.run_segment(b, np.int32(0), spec, 2)
    np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))
    np.testing.assert_array_equal(
        np.asarray(a.best_energy), np.asarray(b.best_energy))


def test_pallas_warm_start_from_explicit_heights():
    N = 5
    rng = np.random.default_rng(2)
    starts = rng.integers(0, N, size=(3, N, N))
    spec = _spec(N=N, n_steps=200, history_stride=50)
    with pltpu.force_tpu_interpret_mode():
        res = runner.run_chains(np.arange(3, dtype=np.uint32), spec,
                                initial_states=starts)
    from tests._oracle import board_energy

    for r in range(3):
        assert res.energy_history[r, 0] == board_energy(starts[r])
        assert res.final_energy[r] == board_energy(res.final_state[r])


def test_pallas_full3d_bins_exact_when_narrow():
    """full_3d kernel: exact bin totals when bins are narrower than the
    8-step unroll group (see test_shared_kernel_bins_exact_when_narrow)."""
    spec = _spec(N=4, mcmc_type="full_3d", n_steps=400, history_stride=50)
    res = _run_pallas(spec, n_runs=4)
    assert (res.total_bins == 4).all()
