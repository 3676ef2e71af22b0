"""Attack-predicate and oracle-energy tests vs an independent brute force."""

import itertools

import numpy as np
import pytest

from mcqueens.core import energy
from tests import _oracle


def test_predicate_truth_table_exhaustive_small_cube():
    """All cell pairs of a 4-cube, both modes, vs the textual relations."""
    N = 4
    cells = np.array(list(itertools.product(range(N), repeat=3)), dtype=np.int32)
    p1 = tuple(cells[:, d][:, None] for d in range(3))
    p2 = tuple(cells[:, d][None, :] for d in range(3))
    for board_mode in (False, True):
        got = np.asarray(energy.attacks(p1, p2, board_mode=board_mode))
        for a in range(len(cells)):
            for b in range(len(cells)):
                if a == b:
                    continue  # framework masks the self pair at call sites
                want = _oracle.pair_attacks(
                    tuple(cells[a]), tuple(cells[b]), board_mode=board_mode
                )
                assert bool(got[a, b]) == want, (cells[a], cells[b], board_mode)


def test_relations_mutually_exclusive_on_distinct_cells():
    """The count-table decomposition requires exactly-one-relation per pair."""
    N = 5
    cells = list(itertools.product(range(N), repeat=3))
    rng = np.random.default_rng(0)
    pairs = rng.choice(len(cells), size=(4000, 2))
    for a, b in pairs:
        p1, p2 = cells[a], cells[b]
        if p1 == p2:
            continue
        rels = _oracle.relations(p1, p2)
        # full_3d: all 7 relations; board mode: distinct (i, j) drops same_ij.
        assert sum(rels.values()) <= 1, (p1, p2, rels)


@pytest.mark.parametrize("N", [2, 3, 5, 6, 8])
def test_board_energy_matches_bruteforce(N):
    rng = np.random.default_rng(N)
    for _ in range(3):
        h = _oracle.random_board(rng, N)
        assert int(energy.board_energy(h)) == _oracle.board_energy(h)


@pytest.mark.parametrize("N", [3, 5, 6])
def test_board_conflicts_matches_bruteforce(N):
    rng = np.random.default_rng(N + 100)
    h = _oracle.random_board(rng, N)
    for _ in range(10):
        i, j, k = rng.integers(0, N, size=3)
        assert int(energy.board_conflicts(h, i, j, k)) == _oracle.board_conflicts(
            h, i, j, k
        )


@pytest.mark.parametrize("N,Q", [(3, 9), (4, 16), (5, 12), (6, 36)])
def test_full3d_energy_matches_bruteforce(N, Q):
    rng = np.random.default_rng(N * 10 + Q)
    q = _oracle.random_full3d(rng, N, Q)
    assert int(energy.full3d_energy(q)) == _oracle.full3d_energy(q)


def test_full3d_conflicts_matches_bruteforce():
    N, Q = 5, 25
    rng = np.random.default_rng(7)
    queens = _oracle.random_full3d(rng, N, Q)
    for _ in range(10):
        q_idx = int(rng.integers(0, Q))
        pos = tuple(rng.integers(0, N, size=3))
        got = int(energy.full3d_conflicts(queens, q_idx, pos))
        assert got == _oracle.full3d_conflicts(queens, q_idx, pos)


def test_board_energy_zero_for_klarner_construction():
    """k = (3i+5j) mod N is attack-free iff gcd(N, 210) == 1 (report Thm II.1)."""
    for N, expect_zero in [(11, True), (13, True), (12, False), (14, False)]:
        i, j = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
        h = (3 * i + 5 * j) % N
        e = int(energy.board_energy(h))
        assert (e == 0) == expect_zero, (N, e)
