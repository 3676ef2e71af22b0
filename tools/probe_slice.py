#!/usr/bin/env python
"""Probe: dynamic sublane slicing + transposed-layout op costs on this target.

The round-2 shared-site kernel wants, per step, to load a 16-sublane slice of
a (S, C) VMEM array at a *data-dependent* sublane offset (the proposal's row /
column / diagonal segment), compute on (16..64, C), and store a slice back.
Round 1 established that dynamic *lane* slices must be 128-aligned; this
probes whether dynamic *sublane* slices (8-aligned and 16-aligned offsets)
load and store correctly, and measures transposed-layout op costs:

  * (1, C) scalar-row ops (the transposed replacement for (C, 1) columns)
  * (64, C) pass cost (the sliced delta-E working set)
  * dynamic sublane load+store round-trip cost
  * in-kernel PRNG draw shaped (R, C)

Run on the real TPU: ``python -m tools.probe_slice``.
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


def dyn_sublane_load(S, C, width, offset):
    """Load a (width, C) slice at a dynamic sublane offset; check values."""

    def kernel(off_ref, x_ref, o_ref):
        off = off_ref[0]
        o_ref[:] = x_ref[pl.ds(off, width), :]

    x = np.arange(S * C, dtype=np.int32).reshape(S, C)
    off = np.array([offset], dtype=np.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((width, C), jnp.int32),
    )(off, x)
    out = np.asarray(out)
    expect = x[offset:offset + width]
    if not (out == expect).all():
        return "WRONG"
    return "correct"


def dyn_sublane_store(S, C, width, offset):
    """Store a (width, C) slice at a dynamic sublane offset; check values."""

    def kernel(off_ref, x_ref, o_ref):
        off = off_ref[0]
        o_ref[:] = x_ref[:]
        o_ref[pl.ds(off, width), :] = jnp.full((width, C), 7, jnp.int32)

    x = np.arange(S * C, dtype=np.int32).reshape(S, C)
    off = np.array([offset], dtype=np.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((S, C), jnp.int32),
    )(off, x)
    out = np.asarray(out)
    expect = x.copy()
    expect[offset:offset + width] = 7
    if not (out == expect).all():
        return "WRONG"
    return "correct"


def _timed(f, *args, n_iter, reps=8):
    np.asarray(f(*args))
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    np.asarray(out)
    return (time.time() - t0) / (reps * n_iter)


def dyn_slice_loop_cost(S, C, width, n_iter=4096):
    """Cost of a dependent load-slice -> add -> store-slice per iteration."""

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

        def body(t, acc):
            off = (t * 16) % S
            blk = o_ref[pl.ds(off, width), :]
            o_ref[pl.ds(off, width), :] = blk + acc
            return acc + 1

        lax.fori_loop(0, n_iter, body, jnp.int32(1))

    x = np.zeros((S, C), dtype=np.int32)
    f = jax.jit(
        lambda a: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((S, C), jnp.int32)
        )(a)
    )
    dt = _timed(f, x, n_iter=n_iter)
    return f"{dt*1e9:.1f} ns per load+add+store of ({width},{C}) slice"


def pass_cost(S, C, n_iter=8192):
    """Dependent int32 add-chain over (S, C): ns per pass."""

    def kernel(x_ref, o_ref):
        def body(t, acc):
            return acc + acc

        o_ref[:] = lax.fori_loop(0, n_iter, body, x_ref[:])

    x = np.ones((S, C), dtype=np.int32)
    f = jax.jit(
        lambda a: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((S, C), jnp.int32)
        )(a)
    )
    dt = _timed(f, x, n_iter=n_iter)
    vregs = max(1, S // 8) * max(1, C // 128)
    return f"{dt*1e9:.1f} ns/pass over ({S},{C}) = {vregs} VREGs"


def independent_pass_cost(S, C, n_iter=2048, k=8):
    """k independent add-chains over (S, C): ns per pass (throughput)."""

    def kernel(x_ref, o_ref):
        def body(t, accs):
            return tuple(a + a for a in accs)

        accs = tuple(x_ref[:] + i for i in range(k))
        accs = lax.fori_loop(0, n_iter, body, accs)
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[:] = out

    x = np.ones((S, C), dtype=np.int32)
    f = jax.jit(
        lambda a: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((S, C), jnp.int32)
        )(a)
    )
    dt = _timed(f, x, n_iter=n_iter * k)
    vregs = max(1, S // 8) * max(1, C // 128)
    return f"{dt*1e9:.1f} ns/pass over ({S},{C}) = {vregs} VREGs ({k} streams)"


def sublane_reduce_cost(S, C, n_iter=4096):
    """(S, C) -> (1, C) sum along sublanes, dependent chain."""

    def kernel(x_ref, o_ref):
        def body(t, acc):
            r = jnp.sum(x_ref[:] + acc, axis=0, keepdims=True)
            return jnp.broadcast_to(r, (1, C)).astype(jnp.int32)

        o_ref[:] = lax.fori_loop(0, n_iter, body, jnp.zeros((1, C), jnp.int32))

    x = np.ones((S, C), dtype=np.int32)
    f = jax.jit(
        lambda a: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, C), jnp.int32)
        )(a)
    )
    dt = _timed(f, x, n_iter=n_iter)
    return f"{dt*1e9:.1f} ns per ({S},{C})->(1,{C}) sum"


def prng_cost(R, C, n_iter=4096):
    def kernel(o_ref):
        pltpu.prng_seed(7, 9)

        def body(t, acc):
            r = pltpu.prng_random_bits((R, C))
            return acc + pltpu.bitcast(r, jnp.int32)

        o_ref[:] = lax.fori_loop(0, n_iter, body, jnp.zeros((R, C), jnp.int32))

    f = jax.jit(
        lambda: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32)
        )()
    )
    np.asarray(f())
    t0 = time.time()
    reps = 8
    for _ in range(reps):
        out = f()
    np.asarray(out)
    dt = (time.time() - t0) / (reps * n_iter)
    return f"{dt*1e9:.1f} ns per ({R},{C}) draw"


def main():
    print(f"devices: {jax.devices()}", flush=True)
    C = 1024
    probe("dyn sublane load (256,C) w16 off16",
          lambda: dyn_sublane_load(256, C, 16, 16))
    probe("dyn sublane load (256,C) w16 off8",
          lambda: dyn_sublane_load(256, C, 16, 8))
    probe("dyn sublane load (496,C) w16 off240",
          lambda: dyn_sublane_load(496, C, 16, 240))
    probe("dyn sublane store (256,C) w16 off48",
          lambda: dyn_sublane_store(256, C, 16, 48))
    probe("dyn sublane load unaligned (256,C) w16 off12",
          lambda: dyn_sublane_load(256, C, 16, 12))
    probe("slice loop cost (256,C) w16",
          lambda: dyn_slice_loop_cost(256, C, 16))
    probe("pass cost (1,C)", lambda: pass_cost(1, C))
    probe("pass cost (8,C)", lambda: pass_cost(8, C))
    probe("pass cost (64,C)", lambda: pass_cost(64, C))
    probe("pass cost (256,C)", lambda: pass_cost(256, C))
    probe("pass cost (C,256) [old layout]", lambda: pass_cost(C, 256))
    probe("ind pass cost (64,C)", lambda: independent_pass_cost(64, C))
    probe("ind pass cost (256,C)", lambda: independent_pass_cost(256, C))
    probe("sublane reduce (64,C)", lambda: sublane_reduce_cost(64, C))
    probe("prng (8,C)", lambda: prng_cost(8, C))
    probe("prng (2,C)", lambda: prng_cost(2, C))


if __name__ == "__main__":
    main()
