"""Counter-based PRNG key derivation for replicated, sharded chains.

The reference reseeds NumPy's global MT19937 per worker process
(``experiments.py:201-202,287-288``) with arithmetically derived integer seeds
(per-run ``base_seed + r``, per-beta-pair ``base_seed + 1000*idx``, ...).
Bitwise parity with MT19937 is neither possible nor desirable in JAX; parity
is defined at the distribution level.  What we preserve *exactly* is the seed
derivation arithmetic (:mod:`mcqueens.dist.runner`), so config-driven sweeps
remain reproducible and runs never share a stream.

Design rules (race-detection-by-construction, SURVEY §5.2):
  * every chain key is ``fold_in(root, global_chain_id)`` — independent of how
    chains are sharded across devices, so a 1x8 and an 8x1 mesh produce
    bit-identical chains;
  * all per-step draws derive from ``fold_in(chain_key, step)`` — no sequential
    key-carrying needed, any step's draws are recomputable in isolation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chain_keys_from_seeds(seeds):
    """One independent key per chain from an array of integer seeds.

    Each chain's stream is keyed by its own seed, mirroring the reference's
    per-run ``np.random.seed(base_seed + r)``.
    """
    seeds = jnp.asarray(seeds, jnp.uint32)
    return jax.vmap(jax.random.key)(seeds)


def chain_keys(base_seed: int, n_chains: int):
    """Keys for chains r = 0..n_chains-1 with the reference's ``base+r`` rule."""
    return chain_keys_from_seeds(base_seed + jnp.arange(n_chains, dtype=jnp.uint32))


def step_key(chain_key, step):
    """The key governing all draws of one chain step (counter-based)."""
    return jax.random.fold_in(chain_key, step)
