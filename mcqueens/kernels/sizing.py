"""Scoped-VMEM-aware chain-block sizing shared by the Pallas kernels.

Every kernel streams (rows, block) int32 state layouts through scoped VMEM
with chains on the lane axis; the Mosaic pipeline holds the input AND output
copy of each layout plus double-buffering, which measures as ~4.6x the raw
layout bytes (hardware data point: the board_shared kernel at N=24 with
block=2048 — 5 layouts of N^2=576 rows — allocates 108.46 MB, i.e.
108.46e6 / (5 * 576 * 2048 * 4) = 4.57 per layout byte).  A block too wide
for the budget fails to compile ("Ran out of memory in memory space vmem"),
so ``block_cap`` shrinks the block until the estimate fits, keeping the
default 2048-chain block wherever it always fit before (board N <= 21).
"""

from __future__ import annotations

_LANE = 128
_PIPELINE_FACTOR = 4.6     # measured in/out + double-buffer multiplier
_BUDGET = 90 * 1024 * 1024  # headroom under the 100 MB scoped-VMEM limit


def block_cap(state_rows: int, default_block: int) -> int:
    """Largest lane-multiple block whose estimated scoped VMEM fits.

    ``state_rows``: total int32 rows of all (rows, block)-shaped state
    layouts the kernel keeps resident per block (sum over layouts).
    """
    per_chain = _PIPELINE_FACTOR * 4.0 * state_rows
    cap = int(_BUDGET / (per_chain * _LANE)) * _LANE
    return max(_LANE, min(default_block, cap))


def block_size(n_chains: int, cap: int) -> int:
    """Block for ``n_chains`` chains under ``cap``: whole cap-sized blocks
    when chains are plentiful, one lane-rounded block otherwise."""
    if n_chains >= cap:
        return cap
    return min(cap, -(-n_chains // _LANE) * _LANE)
