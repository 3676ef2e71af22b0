"""Hash-based batched initializer tests (the pallas path's init)."""

import math

import numpy as np
import pytest

from mcqueens.core import energy, fastinit


def test_board_random_uniform_and_deterministic():
    N = 8
    seeds = np.arange(400, dtype=np.uint32)
    h = np.asarray(fastinit.board_init_batch(seeds, N, "random"))
    assert h.shape == (400, N, N)
    assert h.min() >= 0 and h.max() < N
    freqs = np.bincount(h.reshape(-1), minlength=N) / h.size
    assert np.all(np.abs(freqs - 1.0 / N) < 0.01)
    h2 = np.asarray(fastinit.board_init_batch(seeds, N, "random"))
    np.testing.assert_array_equal(h, h2)
    # different seeds differ
    assert not np.array_equal(h[0], h[1])


def test_board_latin_klarner_match_reference_structure():
    for N, zero in ((7, False), (11, True), (12, False)):
        lat = np.asarray(fastinit.board_init_batch(np.arange(2), N, "latin"))
        i, j = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
        np.testing.assert_array_equal(lat[0], (i + j) % N)
        kl = np.asarray(fastinit.board_init_batch(np.arange(2), N, "klarner"))
        e = int(energy.board_energy(kl[0]))
        assert (e == 0) == zero
        if math.gcd(N, 210) != 1:
            M = 11 if N == 12 else None
            if M:
                for a in range(M):
                    for b in range(M):
                        assert kl[0][a, b] == (3 * a + 5 * b) % M


def test_full3d_random_distinct_and_uniformish():
    N, Q = 5, 25
    seeds = np.arange(64, dtype=np.uint32)
    q = np.asarray(fastinit.full3d_init_batch(seeds, N, "random", Q))
    assert q.shape == (64, Q, 3)
    for c in range(64):
        cells = {tuple(x) for x in q[c].tolist()}
        assert len(cells) == Q
    # cell usage roughly uniform across chains
    flat = (q[..., 0] * N + q[..., 1]) * N + q[..., 2]
    counts = np.bincount(flat.reshape(-1), minlength=N ** 3)
    expected = 64 * Q / N ** 3
    assert counts.max() < expected * 2.5


def test_full3d_klarner_fallback_core_and_distinct():
    N = 12
    M = 11
    q = np.asarray(fastinit.full3d_init_batch(np.arange(3), N, "klarner"))
    for c in range(3):
        cells = {tuple(x) for x in q[c].tolist()}
        assert len(cells) == N * N
        for a in range(M):
            for b in range(M):
                assert (a, b, (3 * a + 5 * b) % M) in cells


def test_full3d_validation_errors():
    with pytest.raises(ValueError, match="assumes Q"):
        fastinit.full3d_init_batch(np.arange(2), 4, "latin", Q=3)
    with pytest.raises(ValueError, match="cannot exceed"):
        fastinit.full3d_init_batch(np.arange(2), 3, "random", Q=28)
    with pytest.raises(ValueError, match="Unknown init_mode"):
        fastinit.board_init_batch(np.arange(2), 4, "bogus")
