"""Inverse-temperature (beta) schedules.

Five schedule families with the exact closed forms of the reference
(``experiments.py:13-77`` in galgantar/monte-carlo-collective):

    constant      beta(t) = beta_const
    linear        beta(t) = b0 + t/(n-1) * (b1 - b0)
    exponential   beta(t) = b0 * exp(ln(b1/b0) * t/(n-1)),   t clipped to [0, n-1]
    logarithmic   beta(t) = b0 + (b1 - b0) * ln(1+t)/ln(1+n), t clipped to [0, n]
    sinusoidal    beta(t) = b0 + (b1 - b0) * (1 - cos(pi t/n))/2, t clipped to [0, n]

All annealing schedules collapse to ``beta_end`` when ``n_steps <= 1``
(degenerate-run clamp, matching the reference).

Unlike the reference (which returns Python closures that cannot be pickled and
must be rebuilt inside every worker process, ``experiments.py:405-449``), a
schedule here is a tiny frozen dataclass of static parameters.  Its
``__call__`` is a pure jnp expression of the step counter, so it can be
evaluated *inside* a ``lax.scan`` step on device, traced once, and shipped
anywhere (it is a valid pytree-free static argument for ``jax.jit``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp

SCHEDULE_TYPES = (
    "constant",
    "linear_annealing",
    "exponential_annealing",
    "logarithmic_annealing",
    "sinusoidal_annealing",
)


@dataclasses.dataclass(frozen=True)
class Schedule:
    """A beta schedule: a pure, jit-compatible map ``step -> beta``.

    Hashable/static so it can be closed over by traced code or passed as a
    ``static_argname`` to ``jax.jit``.
    """

    kind: str
    n_steps: int
    beta_const: Optional[float] = None
    beta_start: Optional[float] = None
    beta_end: Optional[float] = None

    def __post_init__(self):
        if self.kind not in SCHEDULE_TYPES:
            raise ValueError(f"Unknown betta_scheduling type: {self.kind}")
        if self.kind == "constant":
            if self.beta_const is None:
                raise ValueError("beta_const required for constant schedule")
        else:
            if self.beta_start is None or self.beta_end is None:
                raise ValueError(
                    f"beta_start and beta_end required for {self.kind} schedule"
                )

    def __call__(self, step):
        """Evaluate beta at ``step``.

        ``step`` may be a Python int, numpy array, or traced jnp value; the
        result is float32 when traced (float64 parity is irrelevant — parity
        with the reference is defined at the distribution level).
        """
        kind, n = self.kind, self.n_steps
        if kind == "constant":
            return jnp.full_like(jnp.asarray(step, jnp.float32), self.beta_const)
        b0 = jnp.float32(self.beta_start)
        b1 = jnp.float32(self.beta_end)
        if n <= 1:
            # Degenerate clamp: the reference returns beta_end outright.
            return jnp.full_like(jnp.asarray(step, jnp.float32), self.beta_end)
        t = jnp.asarray(step, jnp.float32)
        if kind == "linear_annealing":
            frac = t / (n - 1)
            return b0 + frac * (b1 - b0)
        if kind == "exponential_annealing":
            log_ratio = math.log(self.beta_end / self.beta_start)
            frac = jnp.clip(t, 0, n - 1) / (n - 1)
            return b0 * jnp.exp(jnp.float32(log_ratio) * frac)
        if kind == "logarithmic_annealing":
            log_norm = math.log(1 + n)
            tc = jnp.clip(t, 0, n)
            return b0 + (b1 - b0) * (jnp.log1p(tc) / jnp.float32(log_norm))
        if kind == "sinusoidal_annealing":
            tc = jnp.clip(t, 0, n)
            x = jnp.float32(math.pi) * tc / n
            return b0 + (b1 - b0) * (1 - jnp.cos(x)) / 2
        raise AssertionError(kind)

    # -- descriptions (parity with reference label strings) -----------------

    @property
    def desc(self) -> str:
        if self.kind == "constant":
            return f"constant beta={self.beta_const}"
        short = {
            "linear_annealing": "linear",
            "exponential_annealing": "exp",
            "logarithmic_annealing": "log",
            "sinusoidal_annealing": "sinusoidal",
        }[self.kind]
        return f"{short} beta: {self.beta_start}->{self.beta_end}"

    @property
    def label(self) -> str:
        if self.kind == "constant":
            return f"Constant beta={self.beta_const}"
        name = {
            "linear_annealing": "Linear",
            "exponential_annealing": "Exponential",
            "logarithmic_annealing": "Logarithmic",
            "sinusoidal_annealing": "Sinusoidal",
        }[self.kind]
        return f"{name} {self.beta_start}->{self.beta_end}"


def build_schedule(
    sched_type: str,
    n_steps: int,
    beta_const=None,
    beta_start=None,
    beta_end=None,
) -> Schedule:
    """Factory from a flat parameter set (reference ``build_schedule_from_params``)."""
    return Schedule(
        kind=sched_type,
        n_steps=int(n_steps),
        beta_const=beta_const,
        beta_start=beta_start,
        beta_end=beta_end,
    )


def schedule_from_params(params: dict, n_steps: int) -> Schedule:
    """Factory from a param dict ``{"type": ..., "beta_*": ...}``."""
    return build_schedule(
        sched_type=params["type"],
        n_steps=n_steps,
        beta_const=params.get("beta_const"),
        beta_start=params.get("beta_start"),
        beta_end=params.get("beta_end"),
    )


def schedule_from_common(common_cfg: dict, n_steps: int):
    """Build (schedule, base_seed) from a config ``common`` section.

    Accepts the reference YAML schema verbatim, including the ``betta_scheduling``
    key spelling (``config.yaml:11`` / ``experiments.py:108-152``).
    """
    sched_cfg = common_cfg["betta_scheduling"]
    sched_type = sched_cfg["type"]
    base_seed = sched_cfg.get("base_seed", 0)
    sched = build_schedule(
        sched_type=sched_type,
        n_steps=n_steps,
        beta_const=sched_cfg.get("beta_const"),
        beta_start=sched_cfg.get("beta_start"),
        beta_end=sched_cfg.get("beta_end"),
    )
    return sched, base_seed


def schedules_from_types(sched_types, sched_cfg: dict, n_steps: int):
    """Build one schedule per type sharing the same beta params.

    Mirrors the reference multi-schedule comparison path
    (``experiments.py:155-196``): all schedules share ``base_seed`` and the
    common ``beta_start/beta_end/beta_const`` values.
    Returns a list of (schedule, base_seed) pairs.
    """
    base_seed = sched_cfg["base_seed"]
    out = []
    for sched_type in sched_types:
        sched = build_schedule(
            sched_type=sched_type,
            n_steps=n_steps,
            beta_const=sched_cfg.get("beta_const"),
            beta_start=sched_cfg.get("beta_start"),
            beta_end=sched_cfg.get("beta_end"),
        )
        out.append((sched, base_seed))
    return out
