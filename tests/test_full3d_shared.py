"""Tests for the shared-site full_3d kernel (kernel="pallas_shared").

Same validation pattern as the board flagship (tests/test_shared_kernel.py):
trajectory invariants against the pairwise oracle, bitwise determinism,
distinct-cells preservation, exact best tracking (group-amortized reverts),
early stop, warm starts, sharding equality.  Boltzmann stationarity runs in
tests/test_full3d_stationarity.py alongside the other full_3d kernels.
"""

import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from mcqueens.chain.spec import ChainSpec
from mcqueens.core.schedules import build_schedule
from mcqueens.dist import runner
from tests import _oracle


def _run(spec, n_runs=4, base_seed=3, **kw):
    with pltpu.force_tpu_interpret_mode():
        return runner.run_chains(
            base_seed + np.arange(n_runs, dtype=np.uint32), spec, **kw
        )


def _spec(**kw):
    n_steps = kw.pop("n_steps", 400)
    defaults = dict(
        N=5,
        n_steps=n_steps,
        schedule=build_schedule("linear_annealing", n_steps, beta_start=0.5,
                                beta_end=3.0),
        init_mode="random",
        mcmc_type="full_3d",
        kernel="pallas_shared",
        history_stride=50,
    )
    defaults.update(kw)
    return ChainSpec(**defaults)


def _distinct(queens):
    return len({tuple(q) for q in np.asarray(queens).tolist()})


@pytest.mark.parametrize("N,Q", [(3, 4), (5, None), (8, 64), (16, None)])
def test_full3d_shared_invariants(N, Q):
    """Incremental energies match the oracle; cells stay distinct."""
    spec = _spec(N=N, Q=Q, n_steps=300)
    res = _run(spec, n_runs=3)
    for r in range(res.n_runs):
        assert res.final_energy[r] == _oracle.full3d_energy(res.final_state[r])
        assert res.best_energy[r] == _oracle.full3d_energy(res.best_state[r])
        assert res.best_energy[r] <= res.energy_history[r].min()
        assert res.energy_history[r, -1] == res.final_energy[r]
        assert _distinct(res.final_state[r]) == spec.q_eff
        assert _distinct(res.best_state[r]) == spec.q_eff
    assert (res.total_bins.sum(axis=1) == spec.n_steps).all()
    assert (res.accept_bins <= res.total_bins).all()


def test_full3d_shared_best_is_history_min_at_stride_1():
    """With every step recorded, best_energy must equal the history minimum
    — exercises the group-amortized revert path (best boards are rebuilt
    from move logs, not snapshotted per step)."""
    spec = _spec(n_steps=240, history_stride=1,
                 schedule=build_schedule("constant", 240, beta_const=1.0))
    res = _run(spec, n_runs=4)
    for r in range(res.n_runs):
        assert res.best_energy[r] == res.energy_history[r].min()
        assert res.best_energy[r] == _oracle.full3d_energy(res.best_state[r])
    # The constant-beta chain keeps wandering after its best: the revert
    # path is only proven live if best < final somewhere.
    assert (res.best_energy < res.final_energy).any()


def test_full3d_shared_deterministic():
    spec = _spec(n_steps=200)
    a = _run(spec, n_runs=3)
    b = _run(spec, n_runs=3)
    np.testing.assert_array_equal(a.energy_history, b.energy_history)
    np.testing.assert_array_equal(a.final_state, b.final_state)
    np.testing.assert_array_equal(a.best_state, b.best_state)
    np.testing.assert_array_equal(a.accept_bins, b.accept_bins)


def test_full3d_shared_warm_start():
    N, Q = 4, 10
    rng = np.random.default_rng(7)
    cells = rng.choice(N ** 3, size=(3, Q), replace=False)
    starts = np.stack([cells // (N * N), (cells // N) % N, cells % N],
                      axis=-1).astype(np.int32)
    spec = _spec(N=N, Q=Q, n_steps=200)
    res = _run(spec, n_runs=3, initial_states=starts)
    for r in range(3):
        assert res.energy_history[r, 0] == _oracle.full3d_energy(starts[r])
        assert res.final_energy[r] == _oracle.full3d_energy(res.final_state[r])


def test_full3d_shared_early_stop():
    spec = _spec(
        n_steps=600,
        schedule=build_schedule("constant", 600, beta_const=50.0),
        early_stop_patience=40,
    )
    res = _run(spec, n_runs=4)
    assert (res.stop_step < 600).any()
    for r in range(res.n_runs):
        s = res.stop_step[r]
        if s < 600:
            assert res.total_bins[r].sum() == s + 1
            assert res.energy_history[r, -1] == res.energy_history[
                r, (s // spec.history_stride) + 1
            ]


def test_full3d_shared_sharded_matches_unsharded():
    """Whole blocks per device: the 8-device run reproduces the single-
    device run bitwise (block-keyed candidate streams are tied to global
    block indices, chain streams to seeds)."""
    import jax

    from mcqueens.dist import mesh as mesh_mod
    from mcqueens.kernels import full3d_shared

    mesh = mesh_mod.make_mesh()
    n_dev = len(jax.devices())
    spec = _spec(n_steps=150, history_stride=50)
    per_dev = full3d_shared.block_size(1)
    seeds = np.arange(n_dev * per_dev, dtype=np.uint32)
    with pltpu.force_tpu_interpret_mode():
        carry = full3d_shared.init_carry_batch(seeds, spec, block=per_dev)
        carry_s = mesh_mod.shard_chains(carry, mesh)
        a, ys_a = full3d_shared.run_segment(carry, np.int32(0), spec,
                                            spec.n_outer)
        b, ys_b = full3d_shared.run_segment_sharded(
            carry_s, np.int32(0), spec, spec.n_outer, mesh)
    np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))
    for f in ("qi", "qj", "qk", "energy", "best_energy", "best_qi",
              "best_qj", "best_qk", "accept_bins"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)


def test_full3d_shared_block_correlation_documented_but_chains_diverge():
    """Chains in a block share (mover, candidate) streams but their accept
    draws are seed-keyed: states must diverge across chains."""
    spec = _spec(n_steps=200,
                 schedule=build_schedule("constant", 200, beta_const=0.5))
    res = _run(spec, n_runs=4)
    boards = {res.final_state[r].tobytes() for r in range(4)}
    assert len(boards) == 4


def test_full3d_shared_pad_exactness_guard():
    """_pads is proven exact only while (3N+24)^4 < 2^33 (N <= 93): the
    a2*(a2-m) attack products can reach m^2/4 = (3N+24)^4/4, which wraps
    int32 beyond that and could alias a pad row to a forged attack."""
    from mcqueens.kernels import full3d_shared

    assert full3d_shared._pads(93) == (101, 202, 303)
    with pytest.raises(ValueError, match="N <= 93"):
        full3d_shared._pads(94)


def test_shared_kernels_use_distinct_site_salts():
    """A board run and a full_3d run with equal user seeds share the block
    re-key formula, so the shared-site streams must differ by salt."""
    from mcqueens.kernels import board_shared, full3d_shared

    salts = {int(board_shared._SITE_SALT),
             int(full3d_shared._CAND_SALT),
             int(full3d_shared._MOVER_SALT)}
    assert len(salts) == 3
