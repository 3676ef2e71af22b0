"""Beta-schedule tests: endpoints, monotonicity, clamps, reference formulas."""

import numpy as np
import pytest

from mcqueens.core.schedules import (
    SCHEDULE_TYPES,
    Schedule,
    build_schedule,
    schedule_from_common,
    schedules_from_types,
)

ANNEAL = [t for t in SCHEDULE_TYPES if t != "constant"]


def _np_reference(kind, step, b0, b1, n):
    """The reference closed forms, transcribed from experiments.py:13-77."""
    step = np.asarray(step, dtype=np.float64)
    if kind == "constant":
        return np.full_like(step, b0)
    if n <= 1:
        return np.full_like(step, b1)
    if kind == "linear_annealing":
        return b0 + (step / (n - 1)) * (b1 - b0)
    if kind == "exponential_annealing":
        t = np.clip(step, 0, n - 1) / (n - 1)
        return b0 * np.exp(np.log(b1 / b0) * t)
    if kind == "logarithmic_annealing":
        s = np.clip(step, 0, n)
        return b0 + (b1 - b0) * np.log(1 + s) / np.log(1 + n)
    if kind == "sinusoidal_annealing":
        s = np.clip(step, 0, n)
        return b0 + (b1 - b0) * (1 - np.cos(np.pi * s / n)) / 2
    raise AssertionError(kind)


@pytest.mark.parametrize("kind", ANNEAL)
def test_annealing_matches_reference_formula(kind):
    n = 1000
    sched = build_schedule(kind, n, beta_start=0.7, beta_end=4.2)
    steps = np.arange(n)
    got = np.asarray(sched(steps))
    want = _np_reference(kind, steps, 0.7, 4.2, n)
    # float32 on device vs float64 reference: tolerance accordingly
    np.testing.assert_allclose(got, want, rtol=1e-4)


@pytest.mark.parametrize("kind", ANNEAL)
def test_endpoints_and_monotonicity(kind):
    n = 500
    sched = build_schedule(kind, n, beta_start=1.0, beta_end=3.0)
    vals = np.asarray(sched(np.arange(n)))
    assert np.isclose(vals[0], 1.0, atol=1e-5)
    # All schedules are nondecreasing for b1 > b0.
    assert np.all(np.diff(vals) >= -1e-6)
    # Linear/exponential hit beta_end exactly at step n-1; log/sin at step n.
    if kind in ("linear_annealing", "exponential_annealing"):
        assert np.isclose(vals[-1], 3.0, atol=1e-5)
    else:
        assert np.isclose(float(sched(n)), 3.0, atol=1e-5)


@pytest.mark.parametrize("kind", ANNEAL)
def test_degenerate_nsteps_clamps_to_beta_end(kind):
    for n in (0, 1):
        sched = build_schedule(kind, n, beta_start=1.0, beta_end=3.0)
        assert float(sched(0)) == pytest.approx(3.0)


def test_constant_schedule():
    sched = build_schedule("constant", 100, beta_const=5.0)
    assert float(sched(0)) == 5.0
    assert float(sched(99)) == 5.0


def test_missing_params_raise():
    with pytest.raises(ValueError):
        build_schedule("constant", 10)
    with pytest.raises(ValueError):
        build_schedule("linear_annealing", 10, beta_start=1.0)
    with pytest.raises(ValueError):
        build_schedule("definitely_not_a_schedule", 10, beta_const=1.0)


def test_schedule_from_common_reference_config_schema():
    common = {
        "betta_scheduling": {
            "type": "exponential_annealing",
            "base_seed": 42,
            "beta_const": 5.0,
            "beta_start": 1.0,
            "beta_end": 3.0,
        }
    }
    sched, base_seed = schedule_from_common(common, 1000)
    assert base_seed == 42
    assert sched.kind == "exponential_annealing"
    assert sched.desc == "exp beta: 1.0->3.0"


def test_schedules_from_types_multi():
    cfg = {"base_seed": 7, "beta_const": 5.0, "beta_start": 1.0, "beta_end": 3.0}
    scheds = schedules_from_types(list(SCHEDULE_TYPES), cfg, 100)
    assert len(scheds) == 5
    labels = [s.label for s, _ in scheds]
    assert labels[0] == "Constant beta=5.0"
    assert "Linear 1.0->3.0" in labels
    assert all(seed == 7 for _, seed in scheds)


def test_schedule_is_hashable_static():
    a = Schedule("linear_annealing", 10, beta_start=1.0, beta_end=2.0)
    b = Schedule("linear_annealing", 10, beta_start=1.0, beta_end=2.0)
    assert a == b and hash(a) == hash(b)
