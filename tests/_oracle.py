"""Independent NumPy brute-force oracle used only by the test suite.

Deliberately written as straight loops over the 7 textual attack relations so
it shares no code (and no vectorization bugs) with the framework under test.
"""

import numpy as np


def pair_attacks(p1, p2, board_mode=False):
    (i1, j1, k1), (i2, j2, k2) = p1, p2
    di, dj, dk = abs(i1 - i2), abs(j1 - j2), abs(k1 - k2)
    rels = [
        i1 == i2 and k1 == k2,              # same_ik
        j1 == j2 and k1 == k2,              # same_jk
        k1 == k2 and di == dj,              # plane_k_diag
        j1 == j2 and di == dk,              # plane_j_diag
        i1 == i2 and dj == dk,              # plane_i_diag
        di == dj and dj == dk,              # space_diag
    ]
    if not board_mode:
        rels.append(i1 == i2 and j1 == j2)  # same_ij
    return any(rels)


def relations(p1, p2):
    """Individual relation truth values for the mutual-exclusivity test."""
    (i1, j1, k1), (i2, j2, k2) = p1, p2
    di, dj, dk = abs(i1 - i2), abs(j1 - j2), abs(k1 - k2)
    return {
        "same_ij": i1 == i2 and j1 == j2,
        "same_ik": i1 == i2 and k1 == k2,
        "same_jk": j1 == j2 and k1 == k2,
        "plane_k_diag": k1 == k2 and di == dj,
        "plane_j_diag": j1 == j2 and di == dk,
        "plane_i_diag": i1 == i2 and dj == dk,
        "space_diag": di == dj and dj == dk,
    }


def board_energy(heights):
    N = heights.shape[0]
    queens = [(i, j, int(heights[i, j])) for i in range(N) for j in range(N)]
    e = 0
    for a in range(len(queens)):
        for b in range(a + 1, len(queens)):
            if pair_attacks(queens[a], queens[b], board_mode=True):
                e += 1
    return e


def board_conflicts(heights, i, j, k):
    N = heights.shape[0]
    c = 0
    for i2 in range(N):
        for j2 in range(N):
            if (i2, j2) == (i, j):
                continue
            if pair_attacks((i, j, k), (i2, j2, int(heights[i2, j2])), board_mode=True):
                c += 1
    return c


def full3d_energy(queens):
    qs = [tuple(int(x) for x in q) for q in queens]
    e = 0
    for a in range(len(qs)):
        for b in range(a + 1, len(qs)):
            if pair_attacks(qs[a], qs[b]):
                e += 1
    return e


def full3d_conflicts(queens, q_idx, pos):
    qs = [tuple(int(x) for x in q) for q in queens]
    c = 0
    for idx, q in enumerate(qs):
        if idx == q_idx:
            continue
        if pair_attacks(tuple(int(x) for x in pos), q):
            c += 1
    return c


def random_board(rng, N):
    return rng.integers(0, N, size=(N, N))


def random_full3d(rng, N, Q=None):
    if Q is None:
        Q = N * N
    cells = rng.choice(N ** 3, size=Q, replace=False)
    k = cells % N
    j = (cells // N) % N
    i = cells // (N * N)
    return np.stack([i, j, k], axis=1)
