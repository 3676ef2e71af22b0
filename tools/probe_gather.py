#!/usr/bin/env python
"""Probe: which dynamic-gather forms does Mosaic support on this target?

The round-2 kernel redesign wants to gather the ~4N board cells that can
interact with a proposal (row i, column j, two diagonals) instead of scanning
all N^2 lanes.  Mosaic has no per-lane scatter, and round-1 found gather only
as "full-shape" ``dynamic_gather`` — this probes exactly what that supports
(axis, shapes, widths) and what it costs, so the kernel design is grounded in
measurement instead of guesswork.

Run on the real TPU: ``python tools/probe_gather.py``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcqueens.utils import cache

cache.enable()


def probe(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"PROBE {name}: OK {out}  [{time.time()-t0:.1f}s]", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = " | ".join(str(e).split("\n")[:3])[:300]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}  "
              f"[{time.time()-t0:.1f}s]", flush=True)


def gather_correct(S, L, axis):
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    x = np.arange(S * L, dtype=np.int32).reshape(S, L)
    rng = np.random.default_rng(0)
    hi = L if axis == 1 else S
    idx = rng.integers(0, hi, size=(S, L), dtype=np.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32)
    )(x, idx)
    out = np.asarray(out)
    expect = np.take_along_axis(x, idx, axis=axis)
    if not (out == expect).all():
        bad = int((out != expect).sum())
        return f"WRONG ({bad}/{out.size} mismatch)"
    return "correct"


def gather_narrow_idx(S, L, K, axis):
    """Gather with idx narrower than the operand (the shape we actually want)."""

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=axis)

    x = np.arange(S * L, dtype=np.int32).reshape(S, L)
    rng = np.random.default_rng(1)
    if axis == 1:
        shape = (S, K)
        idx = rng.integers(0, L, size=shape, dtype=np.int32)
    else:
        shape = (K, L)
        idx = rng.integers(0, S, size=shape, dtype=np.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.int32)
    )(x, idx)
    out = np.asarray(out)
    expect = np.take_along_axis(x, idx, axis=axis)
    if not (out == expect).all():
        return "WRONG"
    return "correct"


def gather_cost(S, L, axis, n_iter=512):
    """ns per gather op over an (S, L) int32 array, amortized over a loop."""

    def kernel(x_ref, idx_ref, o_ref):
        def body(t, acc):
            g = jnp.take_along_axis(acc, idx_ref[:], axis=axis)
            return g + 1  # dependent chain, defeats CSE

        o_ref[:] = lax.fori_loop(0, n_iter, body, x_ref[:])

    x = np.arange(S * L, dtype=np.int32).reshape(S, L) % 7
    rng = np.random.default_rng(2)
    hi = L if axis == 1 else S
    idx = rng.integers(0, hi, size=(S, L), dtype=np.int32)
    f = jax.jit(
        lambda a, b: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32)
        )(a, b)
    )
    np.asarray(f(x, idx))  # warm
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        out = f(x, idx)
    np.asarray(out)
    dt = (time.time() - t0) / (reps * n_iter)
    vregs = S * L / 1024
    return f"{dt*1e9:.1f} ns/gather over {vregs:.0f} VREGs ({dt*1e9/vregs:.2f} ns/VREG)"


def add_cost(S, L, n_iter=2048):
    """Baseline: ns per dependent int32 add pass over (S, L)."""

    def kernel(x_ref, o_ref):
        def body(t, acc):
            return acc + acc

        o_ref[:] = lax.fori_loop(0, n_iter, body, x_ref[:])

    x = np.ones((S, L), dtype=np.int32)
    f = jax.jit(
        lambda a: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((S, L), jnp.int32)
        )(a)
    )
    np.asarray(f(x))
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        out = f(x)
    np.asarray(out)
    dt = (time.time() - t0) / (reps * n_iter)
    vregs = S * L / 1024
    return f"{dt*1e9:.1f} ns/add over {vregs:.0f} VREGs ({dt*1e9/vregs:.2f} ns/VREG)"


def main():
    print(f"devices: {jax.devices()}", flush=True)
    # --- correctness / legality matrix ---
    probe("lane-gather (8,128)", lambda: gather_correct(8, 128, axis=1))
    probe("lane-gather (8,256)", lambda: gather_correct(8, 256, axis=1))
    probe("lane-gather (64,128)", lambda: gather_correct(64, 128, axis=1))
    probe("lane-gather (256,512)", lambda: gather_correct(256, 512, axis=1))
    probe("sublane-gather (8,128)", lambda: gather_correct(8, 128, axis=0))
    probe("sublane-gather (32,128)", lambda: gather_correct(32, 128, axis=0))
    probe("sublane-gather (256,128)", lambda: gather_correct(256, 128, axis=0))
    probe("sublane-gather (256,1024)", lambda: gather_correct(256, 1024, axis=0))
    # narrow-index forms (what the kernel actually wants: 64 of 256)
    probe("lane-gather narrow (8,256->64)",
          lambda: gather_narrow_idx(8, 256, 64, axis=1))
    probe("sublane-gather narrow (256,128->64)",
          lambda: gather_narrow_idx(256, 128, 64, axis=0))
    # --- cost ---
    probe("add cost (256,1024)", lambda: add_cost(256, 1024))
    probe("lane-gather cost (8,128)", lambda: gather_cost(8, 128, axis=1))
    probe("lane-gather cost (64,256)", lambda: gather_cost(64, 256, axis=1))
    probe("sublane-gather cost (256,1024)",
          lambda: gather_cost(256, 1024, axis=0))


if __name__ == "__main__":
    main()
