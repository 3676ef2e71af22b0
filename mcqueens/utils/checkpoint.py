"""Periodic checkpoint/resume for long annealing runs.

The reference has no resume path — a 120 h SLURM job that dies restarts from
scratch (SURVEY §5.4).  Here the entire sampler state is a small pytree of
per-chain arrays (heights/queens, count table, RNG key, best state, stats
counters), so checkpointing is a cheap host-side ``npz`` dump between jitted
segments.  Restores are exact: the carry *is* the chain, and per-step keys are
counter-based, so a resumed run is bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def spec_fingerprint(spec, seeds) -> str:
    """Digest of everything that defines a run's trajectory.

    Two runs with the same carry *shapes* but different dynamics (beta range,
    schedule kind, n_steps, kernel, seeds, ...) must not resume from each
    other's checkpoints; shape checks alone cannot tell them apart.
    """
    h = hashlib.sha256()
    h.update(repr(spec).encode())  # frozen dataclass: full param repr
    h.update(np.ascontiguousarray(np.asarray(seeds)).tobytes())
    return h.hexdigest()[:32]


def extend_fingerprint(fp: str, *arrays) -> str:
    """Fold extra run-defining arrays (ladder, swap seed, ...) into a digest."""
    h = hashlib.sha256(fp.encode())
    for a in arrays:
        h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
    return h.hexdigest()[:32]


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key)


def _to_numpy(x):
    """Typed PRNG keys are serialized as their raw uint32 data."""
    return np.asarray(jax.random.key_data(x) if _is_key(x) else x)


class Checkpointer:
    """Saves/restores a chain carry + streamed history between segments.

    Layout: a single ``<dir>/<tag>.npz`` with the carry leaves (field names of
    the carry NamedTuple), the completed segment count, and the history chunks
    emitted so far.  Writes are atomic (tempfile + rename).
    """

    def __init__(self, directory: str, tag: str = "chain", every: int = 1,
                 min_segments: int = 2):
        self.directory = directory
        self.tag = tag
        self.every = max(1, every)
        self.min_segments = min_segments
        os.makedirs(directory, exist_ok=True)

    @property
    def path(self) -> str:
        return os.path.join(self.directory, f"{self.tag}.npz")

    def save(self, carry, segments_done: int, history_chunks,
             seg_outer: int = -1, fingerprint: str = "",
             extras=()) -> None:
        if segments_done % self.every != 0:
            return
        payload = {f"carry_{name}": _to_numpy(val)
                   for name, val in carry._asdict().items()
                   if val is not None}
        payload["segments_done"] = np.asarray(segments_done)
        payload["seg_outer"] = np.asarray(seg_outer)
        payload["fingerprint"] = np.asarray(fingerprint)
        payload["n_history_chunks"] = np.asarray(len(history_chunks))
        for idx, chunk in enumerate(history_chunks):
            payload[f"hist_{idx}"] = np.asarray(chunk)
        for idx, extra in enumerate(extras):
            # Caller-defined side state (e.g. tempering's betas row and,
            # with record_betas, the accumulated beta history).
            payload[f"extra_{idx}"] = np.asarray(extra)
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, **payload)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def restore(self, template_carry, seg_outer: int = -1,
                fingerprint: str = "", n_extras: int = 0):
        """Return (carry, segments_done, history_chunks[, extras]) or None.

        With ``n_extras > 0`` the return gains a fourth element: the tuple of
        extra arrays stored by :meth:`save` (a checkpoint missing them is
        treated as stale).

        ``template_carry`` supplies the NamedTuple type and None-leaves.  A
        checkpoint whose spec fingerprint doesn't match (tag reuse across a
        config change — same shapes, different beta range/schedule/kernel/
        seeds), whose leaves don't match the template's shapes/dtypes, or
        whose segmentation differs (resume with a different segment size
        would misalign steps) is ignored rather than loaded wrong.
        """
        if not os.path.exists(self.path):
            return None
        with np.load(self.path) as data:
            if "seg_outer" in data and int(data["seg_outer"]) != seg_outer:
                return None
            stored_fp = str(data["fingerprint"]) if "fingerprint" in data else ""
            if stored_fp != fingerprint:
                return None  # stale checkpoint from a different run config
            fields = {}
            for name, val in template_carry._asdict().items():
                key = f"carry_{name}"
                if key not in data:
                    if val is not None:
                        return None  # stale checkpoint from another carry type
                    fields[name] = None
                    continue
                if data[key].shape != _to_numpy(val).shape:
                    return None  # stale checkpoint from another config
                if _is_key(val):
                    fields[name] = jax.random.wrap_key_data(data[key])
                else:
                    fields[name] = data[key]
            carry = type(template_carry)(**fields)
            segments_done = int(data["segments_done"])
            chunks = [data[f"hist_{i}"] for i in range(int(data["n_history_chunks"]))]
            if n_extras:
                if any(f"extra_{i}" not in data for i in range(n_extras)):
                    return None  # stale checkpoint without the side state
                extras = tuple(data[f"extra_{i}"] for i in range(n_extras))
        if n_extras:
            return carry, segments_done, chunks, extras
        return carry, segments_done, chunks

    def clear(self) -> None:
        if os.path.exists(self.path):
            os.unlink(self.path)
