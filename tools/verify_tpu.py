#!/usr/bin/env python
"""One-command verification of the kernel invariants on the REAL TPU.

The pytest suite runs everything on CPU (8 virtual devices, Pallas interpret
mode); this tool replays the invariant set against the actual chip in one
command and writes the outcome to ``artifacts/VERIFY_TPU.json``:

  1. tables == naive golden trajectories (bitwise, same threefry streams) —
     the CLAUDE.md invariant, on hardware.
  2. Incremental energies == oracle recompute for every kernel
     (tables / naive / pallas / pallas_shared / full_3d pallas), final AND
     best states.
  3. TPU == interpret-mode stream equality for the counter-hash PRNG
     kernels: the same pallas_shared / full3d segments run on the TPU and on
     the host CPU backend (interpret mode) must produce bitwise-identical
     carries — the ``kernels/prng.py`` replayability claim on hardware.
  4. Klarner init at gcd(N, 210) == 1 holds energy exactly 0 under a cold
     chain (N=11).
  5. recover_best_heights replay == tracked best boards on hardware.

Usage:  python -m tools.verify_tpu [--json artifacts/VERIFY_TPU.json]

Run it with no other TPU client active (axon tunnel: one client at a time).
Reference validation strategy being upgraded: the reference has NO tests
(SURVEY §4); its only guards are constructor checks (``mcmc.py:113-118``).
"""

from __future__ import annotations

import argparse
import json
import os
import time
import traceback

import numpy as np

# The same O(N^4) pairwise oracle the CPU suite cross-checks against —
# one implementation, hardware and interpret runs alike.
from tests._oracle import board_energy as _oracle_board_energy
from tests._oracle import full3d_energy as _oracle_full3d_energy


def _spec(**kw):
    from mcqueens.chain.spec import ChainSpec
    from mcqueens.core.schedules import build_schedule

    n_steps = kw.pop("n_steps", 2000)
    defaults = dict(
        N=8,
        n_steps=n_steps,
        schedule=build_schedule("linear_annealing", n_steps,
                                beta_start=0.5, beta_end=3.0),
        init_mode="random",
        mcmc_type="board",
        history_stride=kw.pop("history_stride", 500),
    )
    defaults.update(kw)
    return ChainSpec(**defaults)


def check_tables_equals_naive():
    """Golden-trajectory equality of the two XLA kernels on hardware."""
    from mcqueens.dist import runner

    seeds = np.arange(8, dtype=np.uint32)
    res = {}
    for kern in ("tables", "naive"):
        res[kern] = runner.run_chains(seeds, _spec(kernel=kern))
    a, b = res["tables"], res["naive"]
    assert np.array_equal(a.energy_history, b.energy_history)
    assert np.array_equal(a.final_state, b.final_state)
    assert np.array_equal(a.best_state, b.best_state)
    assert np.array_equal(a.accept_bins, b.accept_bins)
    return "tables == naive bitwise over 2000 steps x 8 chains"


def check_incremental_vs_oracle():
    """final/best incremental energies == O(N^4) oracle, all kernels."""
    from mcqueens.dist import runner

    seeds = np.arange(4, dtype=np.uint32)
    checked = []
    for kern, mt in (("tables", "board"), ("naive", "board"),
                     ("pallas", "board"), ("pallas_shared", "board"),
                     ("pallas", "full_3d"), ("tables", "full_3d"),
                     ("pallas_shared", "full_3d")):
        res = runner.run_chains(seeds, _spec(kernel=kern, mcmc_type=mt))
        oracle = (_oracle_board_energy if mt == "board"
                  else _oracle_full3d_energy)
        for r in range(res.n_runs):
            assert res.final_energy[r] == oracle(res.final_state[r]), (
                kern, mt, r, "final")
            assert res.best_energy[r] == oracle(res.best_state[r]), (
                kern, mt, r, "best")
        checked.append(f"{kern}/{mt}")
    return "incremental == oracle (final+best) for " + ", ".join(checked)


def check_tpu_vs_interpret_streams():
    """The counter-hash PRNG kernels produce bitwise-identical trajectories
    on the TPU and in interpret mode (host CPU backend)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from mcqueens.kernels import board_shared, full3d_pallas

    cpu = jax.devices("cpu")[0]
    msgs = []

    spec = _spec(kernel="pallas_shared", n_steps=1024, history_stride=256)
    seeds = np.arange(256, dtype=np.uint32)
    tc = board_shared.init_carry_batch(seeds, spec)
    tc, tys = board_shared.run_segment(tc, np.int32(0), spec, spec.n_outer)
    tpu_state = {f: np.asarray(getattr(tc, f)) for f in tc._fields}
    with jax.default_device(cpu):
        with pltpu.force_tpu_interpret_mode():
            ic = board_shared.init_carry_batch(seeds, spec)
            ic, iys = board_shared.run_segment(ic, np.int32(0), spec,
                                               spec.n_outer)
            int_state = {f: np.asarray(getattr(ic, f)) for f in ic._fields}
    for f in tpu_state:
        assert np.array_equal(tpu_state[f], int_state[f]), ("board", f)
    assert np.array_equal(np.asarray(tys), np.asarray(iys))
    msgs.append("pallas_shared(board)")

    from mcqueens.kernels import full3d_shared

    for label, mod3 in (("pallas(full_3d)", full3d_pallas),
                        ("pallas_shared(full_3d)", full3d_shared)):
        spec3 = _spec(kernel="pallas", mcmc_type="full_3d", N=6, n_steps=512,
                      history_stride=128)
        seeds = np.arange(128, dtype=np.uint32)
        tc = mod3.init_carry_batch(seeds, spec3)
        tc, tys = mod3.run_segment(tc, np.int32(0), spec3, spec3.n_outer)
        tpu_state = {f: np.asarray(getattr(tc, f)) for f in tc._fields}
        with jax.default_device(cpu):
            with pltpu.force_tpu_interpret_mode():
                ic = mod3.init_carry_batch(seeds, spec3)
                ic, iys = mod3.run_segment(ic, np.int32(0), spec3,
                                           spec3.n_outer)
                int_state = {f: np.asarray(getattr(ic, f))
                             for f in ic._fields}
        for f in tpu_state:
            assert np.array_equal(tpu_state[f], int_state[f]), (label, f)
        assert np.array_equal(np.asarray(tys), np.asarray(iys)), label
        msgs.append(label)
    return "TPU == interpret bitwise: " + ", ".join(msgs)


def check_klarner_zero():
    from mcqueens.core.schedules import build_schedule
    from mcqueens.dist import runner

    spec = _spec(N=11, init_mode="klarner", kernel="pallas_shared",
                 n_steps=512, history_stride=256,
                 schedule=build_schedule("constant", 512, beta_const=100.0))
    res = runner.run_chains(np.arange(4, dtype=np.uint32), spec)
    assert (res.energy_history[:, 0] == 0).all()
    assert (res.best_energy == 0).all()
    return "Klarner N=11 init energy 0, cold chain stays at 0"


def check_recover_best_heights():
    from mcqueens.kernels import board_shared

    spec = _spec(kernel="pallas_shared", n_steps=2048, history_stride=512)
    seeds = np.arange(256, dtype=np.uint32)
    tracked, _ = board_shared.run_segment(
        board_shared.init_carry_batch(seeds, spec), np.int32(0), spec,
        spec.n_outer)
    untracked, _ = board_shared.run_segment(
        board_shared.init_carry_batch(seeds, spec), np.int32(0), spec,
        spec.n_outer, track_best=False)
    rec = board_shared.recover_best_heights(untracked, spec)
    want = np.asarray(tracked.best_heights).reshape(-1, spec.N, spec.N)
    assert np.array_equal(rec, want)
    return "replayed best boards == tracked best boards (256 chains)"


def check_init_energy_at_scale():
    """Initial energies == oracle at the 65536-chain campaign scale.

    Regression for a real miscompile found in round 4: a single whole-batch
    vmapped table build (a >2 GiB scatter buffer at C = 65536, N = 18)
    silently returned a wrong constant energy on this backend, poisoning
    every warm-started 65536-chain search.  Init now chunks the dispatch
    (``tables.batch_energies``); this check replays both init paths at the
    failing size and oracle-verifies sampled chains.
    """
    from mcqueens.kernels import board_shared

    board_energy = _oracle_board_energy
    C, N = 65536, 18
    spec = _spec(N=N, kernel="pallas_shared", n_steps=64, history_stride=64)
    seeds = np.arange(C, dtype=np.uint32)
    # warm-start path: one fixed board broadcast to every chain
    rng = np.random.default_rng(0)
    board = rng.integers(0, N, size=(N, N)).astype(np.int32)
    want = board_energy(board)
    carry = board_shared.init_carry_batch(
        seeds, spec, initial_states=np.repeat(board[None], C, axis=0))
    e = np.asarray(carry.energy).reshape(-1)
    assert (e == want).all(), (int(e.min()), int(e.max()), want)
    # fresh-init path: oracle-spot-check scattered chains
    carry2 = board_shared.init_carry_batch(seeds, spec)
    e2 = np.asarray(carry2.energy).reshape(-1)
    h2 = np.asarray(carry2.heights).reshape(-1, N, N)
    for r in (0, 1, 32768, 65535):
        assert board_energy(h2[r]) == e2[r], r
    return (f"init energies at C={C}, N={N} == oracle "
            f"(warm {want}; fresh spot-checked)")


CHECKS = [
    ("tables_equals_naive", check_tables_equals_naive),
    ("incremental_vs_oracle", check_incremental_vs_oracle),
    ("tpu_vs_interpret_streams", check_tpu_vs_interpret_streams),
    ("klarner_zero", check_klarner_zero),
    ("recover_best_heights", check_recover_best_heights),
    ("init_energy_at_scale", check_init_energy_at_scale),
]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default="artifacts/VERIFY_TPU.json")
    args = parser.parse_args(argv)

    from mcqueens.utils import cache

    cache.enable()

    import jax

    platform = jax.devices()[0].platform
    out = {"platform": platform, "device": str(jax.devices()[0]),
           "checks": {}, "ok": True}
    if platform == "cpu":
        # Smoke mode (no TPU attached): run the whole battery in interpret
        # mode so the tool itself stays testable; the hardware claims are
        # only certified when platform != cpu.
        from contextlib import ExitStack

        from jax.experimental.pallas import tpu as pltpu

        stack = ExitStack()
        stack.enter_context(pltpu.force_tpu_interpret_mode())
        out["smoke_mode"] = True
        print("[warn] no TPU attached: interpret-mode smoke run only",
              flush=True)
    for name, fn in CHECKS:
        t0 = time.time()
        try:
            detail = fn()
            status = "pass"
        except Exception:
            detail = traceback.format_exc(limit=5)
            status = "fail"
            out["ok"] = False
        dt = time.time() - t0
        out["checks"][name] = {"status": status, "detail": detail,
                               "seconds": round(dt, 1)}
        print(f"[{status.upper()}] {name} ({dt:.1f}s): {detail}"[:500],
              flush=True)
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
