"""Config system: accepts the reference YAML schema verbatim, plus a tpu section.

Schema (reference ``config.yaml:1-38``, parsed at ``experiments.py:1204-1218``):

    experiment_type: single_N | measure_min_energy_vs_N | beta_start_end_pairs
                     | compare_beta_end
    common:
      n_steps, n_runs, verbose, initialization, mcmc_type (default "board"),
      early_stop_patience (int | None | the literal string 'None'),
      output_path,
      betta_scheduling:           # (sic — reference key spelling)
        type: <schedule> | [<schedule>, ...]
        base_seed, beta_const, beta_start, beta_end
    single_N: {N}
    measure_min_energy_vs_N: {Ns, init_modes}
    beta_start_end_pairs: {N, beta_start_ends, annealing_type, output_path,
                           output_path_acceptance}
    compare_beta_end: {Ns (exactly 2), beta_start_ends, annealing_type,
                       output_path}

New, optional, TPU-native section (all defaulted so reference configs run
unchanged):

    tpu:
      kernel: tables | naive | pallas | pallas_shared   # delta-E kernel
      history_stride: int                 # energy-history thinning
      n_bins: int                         # acceptance bins (default 100)
      mesh: bool | int                    # shard chains over devices
      checkpoint_dir: str | null          # segment checkpoint/resume
      profile_dir: str | null             # jax.profiler trace output
      allow_correlated_runs: bool         # required (true) to run the
                                          # pallas_shared kernel under the
                                          # experiment drivers, whose runs
                                          # are otherwise independent
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import yaml

EXPERIMENT_TYPES = (
    "single_N",
    "measure_min_energy_vs_N",
    "beta_start_end_pairs",
    "compare_beta_end",
)


@dataclasses.dataclass
class TpuConfig:
    kernel: str = "tables"
    history_stride: int = 1
    n_bins: int = 100
    mesh: Any = False          # False | True (all devices) | int (first n)
    checkpoint_dir: Optional[str] = None
    profile_dir: Optional[str] = None
    allow_correlated_runs: bool = False  # opt-in for pallas_shared sweeps


@dataclasses.dataclass
class Config:
    raw: dict
    experiment_type: str
    common: dict
    tpu: TpuConfig

    def _req(self, key: str):
        # The reference config schema makes these mandatory
        # (``/root/reference/config.yaml:2-18``); name the missing key
        # instead of dying with a bare KeyError deep in a driver.
        try:
            return self.common[key]
        except KeyError:
            raise ValueError(
                f"config is missing required key common.{key}") from None

    @property
    def n_steps(self) -> int:
        return int(self._req("n_steps"))

    @property
    def n_runs(self) -> int:
        return int(self._req("n_runs"))

    @property
    def verbose(self) -> bool:
        return bool(self._req("verbose"))

    @property
    def init_mode(self) -> str:
        return self._req("initialization")

    @property
    def mcmc_type(self) -> str:
        return self.common.get("mcmc_type", "board")

    @property
    def early_stop_patience(self):
        # The reference accepts the literal string 'None'
        # (config.yaml:9, experiments.py:1216-1218).
        v = self.common.get("early_stop_patience", 100000)
        if v in (None, "None", "null"):
            return None
        return int(v)

    @property
    def output_path(self) -> str:
        return self._req("output_path")

    @property
    def sched_cfg(self) -> dict:
        return self._req("betta_scheduling")

    def section(self, name: str) -> dict:
        try:
            return self.raw[name]
        except KeyError:
            raise ValueError(
                f"config is missing the '{name}' section required by "
                f"experiment_type: {self.experiment_type}") from None


def load_config(path: str) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f)
    return parse_config(raw)


def parse_config(raw: dict) -> Config:
    for key in ("experiment_type", "common"):
        if key not in raw:
            raise ValueError(f"config is missing the required top-level "
                             f"'{key}' key")
    experiment_type = raw["experiment_type"]
    if experiment_type not in EXPERIMENT_TYPES:
        raise ValueError(f"Unknown experiment_type: {experiment_type}")
    common = raw["common"]
    tpu_raw = raw.get("tpu", {}) or {}
    allowed = {f.name for f in dataclasses.fields(TpuConfig)}
    unknown = set(tpu_raw) - allowed
    if unknown:
        raise ValueError(f"Unknown tpu config keys: {sorted(unknown)}")
    tpu = TpuConfig(**tpu_raw)
    if tpu.kernel == "pallas_shared" and not tpu.allow_correlated_runs:
        # The four reference experiment types report statistics over
        # *independent* runs (``/root/reference/experiments.py:513-533``);
        # the shared-site kernel correlates chains within each VMEM block
        # (shared proposal-site streams), which silently breaks that
        # contract.  Throughput work (bench/competition/tempering) opts in
        # explicitly; parity sweeps must say they mean it.
        raise ValueError(
            "tpu.kernel 'pallas_shared' shares proposal sites across each "
            "chain block, so the experiment drivers' runs would NOT be "
            "statistically independent (the reference's n_runs contract). "
            "Use kernel 'pallas' or 'tables', or set "
            "tpu.allow_correlated_runs: true to accept correlated runs."
        )
    return Config(raw=raw, experiment_type=experiment_type, common=common, tpu=tpu)
