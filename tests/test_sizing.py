"""Scoped-VMEM-aware block sizing (mcqueens/kernels/sizing.py).

The cap model is calibrated against a hardware data point (board_shared
N=24, block=2048 allocates 108 MB and fails the 100 MB scoped-VMEM limit);
these tests pin the pure arithmetic and each kernel's spec wiring, not the
hardware constant itself.
"""

import pytest

from mcqueens.chain.spec import ChainSpec
from mcqueens.core.schedules import build_schedule
from mcqueens.kernels import (
    board_shared,
    full3d_pallas,
    full3d_shared,
    metropolis_pallas,
    sizing,
)


def _spec(N, mcmc_type="board", kernel="pallas_shared"):
    return ChainSpec(
        N=N,
        n_steps=1000,
        schedule=build_schedule("linear_annealing", 1000, beta_start=1.0,
                                beta_end=3.0),
        init_mode="random",
        mcmc_type=mcmc_type,
        kernel=kernel,
    )


def test_block_cap_monotone_and_bounded():
    caps = [sizing.block_cap(rows, 2048) for rows in (100, 1000, 5000, 50000)]
    assert caps[0] == 2048                      # small state keeps the default
    assert all(a >= b for a, b in zip(caps, caps[1:]))  # more rows, smaller cap
    assert all(c % 128 == 0 for c in caps)      # lane multiples
    assert caps[-1] == 128                      # floor, never zero


def test_block_size_under_cap():
    assert sizing.block_size(65536, 2048) == 2048   # plentiful chains: cap
    assert sizing.block_size(100, 2048) == 128      # lane-rounded single block
    assert sizing.block_size(65536, 896) == 896     # capped default
    assert sizing.block_size(300, 896) == 384


def test_board_shared_block_caps_with_N():
    """N=16 keeps the historical 2048 block; N=24/32 shrink instead of
    blowing the scoped-VMEM budget (the pre-round-3 failure mode)."""
    assert board_shared.block_size(65536, _spec(16)) == 2048
    b24 = board_shared.block_size(65536, _spec(24))
    b32 = board_shared.block_size(65536, _spec(32))
    assert 128 <= b32 < b24 < 2048
    # Spec-less call keeps the legacy behavior (used by __graft_entry__).
    assert board_shared.block_size(65536) == 2048
    assert board_shared.padded_chains(65536, _spec(32)) % b32 == 0


def test_all_kernels_accept_spec_in_block_size():
    for mod, spec in (
        (metropolis_pallas, _spec(48, kernel="pallas")),
        (full3d_pallas, _spec(32, "full_3d", "pallas")),
        (full3d_shared, _spec(32, "full_3d")),
    ):
        blk = mod.block_size(65536, spec)
        assert blk % 128 == 0 and 128 <= blk <= 2048
        assert mod.block_size(65536) == 2048  # legacy spec-less default


def test_full3d_shared_rejects_oversized_N():
    with pytest.raises(ValueError, match="N <= 93"):
        full3d_shared._pads(94)
