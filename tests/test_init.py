"""Initializer property tests (board + full_3d, all three modes)."""

import math

import jax
import numpy as np
import pytest

from mcqueens.core import energy, init


def test_board_latin_is_row_col_permutation():
    for N in (4, 7, 12):
        h = np.asarray(init.board_init(jax.random.key(0), N, "latin"))
        for r in range(N):
            assert sorted(h[r]) == list(range(N))
            assert sorted(h[:, r]) == list(range(N))


@pytest.mark.parametrize("N,zero", [(11, True), (13, True), (12, False), (15, False)])
def test_board_klarner_energy(N, zero):
    """Klarner gives energy 0 iff gcd(N,210)==1; fallback core keeps it low-ish."""
    h = init.board_init(jax.random.key(1), N, "klarner")
    e = int(energy.board_energy(h))
    if zero:
        assert e == 0
    else:
        assert e > 0


def test_board_klarner_fallback_core_structure():
    N = 12  # gcd(12,210)=6 -> fallback; largest M<12 coprime to 210 is 11
    h = np.asarray(init.board_init(jax.random.key(2), N, "klarner"))
    M = 11
    for i in range(M):
        for j in range(M):
            assert h[i, j] == (3 * i + 5 * j) % M
    assert np.all((h >= 0) & (h < N))


def test_board_random_uniform_heights():
    N = 8
    keys = jax.random.split(jax.random.key(3), 500)
    hs = np.asarray(jax.vmap(lambda k: init.board_init(k, N, "random"))(keys))
    assert hs.shape == (500, N, N)
    assert hs.min() >= 0 and hs.max() < N
    # Roughly uniform: each height appears with freq ~1/N.
    freqs = np.bincount(hs.reshape(-1), minlength=N) / hs.size
    assert np.all(np.abs(freqs - 1.0 / N) < 0.01)


def test_full3d_random_distinct_cells():
    N, Q = 5, 25
    queens, occ = init.full3d_init(jax.random.key(4), N, "random", Q=Q)
    queens = np.asarray(queens)
    assert queens.shape == (Q, 3)
    cells = {tuple(q) for q in queens.tolist()}
    assert len(cells) == Q
    occ = np.asarray(occ)
    assert occ.sum() == Q
    for i, j, k in cells:
        assert occ[i * N * N + j * N + k]


def test_full3d_latin_requires_q_equals_n2():
    with pytest.raises(ValueError):
        init.full3d_init(jax.random.key(0), 5, "latin", Q=10)


def test_full3d_klarner_gcd1_zero_energy():
    N = 11
    queens, _ = init.full3d_init(jax.random.key(5), N, "klarner")
    assert int(energy.full3d_energy(queens)) == 0


def test_full3d_klarner_fallback_distinct_and_core():
    N = 12
    M = 11
    queens, occ = init.full3d_init(jax.random.key(6), N, "klarner")
    queens = np.asarray(queens)
    assert queens.shape == (N * N, 3)
    cells = {tuple(q) for q in queens.tolist()}
    assert len(cells) == N * N  # all distinct
    # Core present
    for i in range(M):
        for j in range(M):
            assert (i, j, (3 * i + 5 * j) % M) in cells
    assert math.gcd(M, 210) == 1


def test_deterministic_modes_ignore_key():
    N = 7
    a = np.asarray(init.board_init(jax.random.key(0), N, "latin"))
    b = np.asarray(init.board_init(jax.random.key(99), N, "latin"))
    np.testing.assert_array_equal(a, b)


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        init.board_init(jax.random.key(0), 5, "bogus")
    with pytest.raises(ValueError):
        init.full3d_init(jax.random.key(0), 5, "bogus")
