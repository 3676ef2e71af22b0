"""Profiling and throughput observability.

The reference computes per-run durations but never reports them
(``experiments.py:415-427``; SURVEY §5.1).  This module surfaces the metrics
that matter for a TPU sampler: proposed moves/sec/chip (the BASELINE.json
north-star), wall time, and optional ``jax.profiler`` traces viewable in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@dataclasses.dataclass
class ThroughputReport:
    proposals: int
    wall_time_s: float
    n_devices: int

    @property
    def moves_per_sec(self) -> float:
        return self.proposals / max(self.wall_time_s, 1e-9)

    @property
    def moves_per_sec_per_chip(self) -> float:
        return self.moves_per_sec / max(self.n_devices, 1)

    def __str__(self) -> str:
        return (
            f"{self.proposals:.3e} proposals in {self.wall_time_s:.3f}s "
            f"= {self.moves_per_sec:.3e} moves/s "
            f"({self.moves_per_sec_per_chip:.3e} /chip on {self.n_devices})"
        )


def throughput_of(result, n_devices: int | None = None) -> ThroughputReport:
    """Throughput of a :class:`mcqueens.dist.runner.ChainResult`."""
    if n_devices is None:
        n_devices = jax.device_count()
    return ThroughputReport(
        proposals=result.proposals,
        wall_time_s=result.wall_time,
        n_devices=n_devices,
    )


@contextlib.contextmanager
def trace(log_dir: str | None):
    """``jax.profiler`` trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def timed(label: str, sink=print):
    t0 = time.time()
    yield
    sink(f"[mcqueens] {label}: {time.time() - t0:.3f}s")
