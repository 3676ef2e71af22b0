"""The SWAR-sweep probe's packed attack predicate must equal the oracle.

``tools/probe_swar_sweep.py`` settles the round-4 SWAR question by timing
the packed 7-relation mask-dance test inside the production fused-sweep
structure; its measurement is only meaningful if the packed predicate is
*exact* — both 16-bit halves must reproduce the brute-force attack oracle
(plus the self/occupancy convention of ``full3d_shared.py:scores``: the
attack bit also fires on the target cell itself, occupancy flags it).
"""

import numpy as np
import pytest

from tests._oracle import pair_attacks


@pytest.fixture(scope="module")
def jnp():
    import jax.numpy as jnp

    return jnp


def test_swar_and_production_predicates_match_oracle(jnp):
    from tools.probe_swar_sweep import prod_scores, swar_scores

    rng = np.random.default_rng(7)
    N, M = 16, 400
    qa = rng.integers(0, N, size=(M, 2, 3))   # two queens per packed lane
    c = rng.integers(0, N, size=(M, 3))       # target cell

    packed = (qa[:, 0] | (qa[:, 1] << 16)).astype(np.int64)
    bias = ((64 - c) * 0x10001).astype(np.int64)  # duplicated 64 - cand
    rows = [jnp.asarray((packed[:, a] + bias[:, a]).astype(np.int32)
                        ).reshape(1, -1) for a in range(3)]
    att, occ = swar_scores(*rows)
    att, occ = np.asarray(att)[0], np.asarray(occ)[0]

    d = qa[:, 0] - c
    prows = [jnp.asarray(d[:, a].astype(np.int32)).reshape(1, -1)
             for a in range(3)]
    prod = np.asarray(prod_scores(*prows))[0]

    for idx in range(M):
        t = tuple(c[idx])
        for half in (0, 1):
            q = tuple(qa[idx, half])
            want_att = 1 if (q == t or pair_attacks(q, t)) else 0
            want_occ = 1 if q == t else 0
            assert (att[idx] >> (16 * half)) & 0xFFFF == want_att, (q, t)
            assert (occ[idx] >> (16 * half)) & 0xFFFF == want_occ, (q, t)
        q0 = tuple(qa[idx, 0])
        want = (1 if (q0 == t or pair_attacks(q0, t)) else 0) + (
            (1 << 16) if q0 == t else 0)
        assert prod[idx] == want, (q0, t)
