#!/usr/bin/env python
"""Microbench: per-iteration cost of the traversal's structural
primitives on the real chip (dev tool; calibrates where the per-tile
floor comes from so kernel work targets the right thing).

Variants (each a Pallas kernel running N fori iterations of one body):

  vecops    K=64 chained vector FMAs on (8,128)           [VPU baseline]
  tree      OR roll-tree over (8,128) int32, NO extract   [vector cost]
  extract   roll-tree + scalar extract + pl.when branch   [the boundary]
  while2    while-loop over a 6-bit word, 2 cheap visits  [trip cost]
  loads72   72 SMEM scalar loads broadcast into FMAs      [visit loads]
  subplane  32 slab tests + tree + extract                [sub gate]

Every body consumes the loop index and threads a carry into the output
so Mosaic cannot hoist or CSE it away. Prints ns/iteration per variant.
Usage: python tools/stallbench.py [N]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

_SUB, _LANE = 8, 128


def _roll_or(v):
    for s in (64, 32, 16, 8, 4, 2, 1):
        v = v | pltpu.roll(v, s, axis=1)
    for s in (4, 2, 1):
        v = v | pltpu.roll(v, s, axis=0)
    return v


def _kernel(sm, x_ref, out, *, variant, n_iter):
    def body(i, acc):
        fi = i.astype(jnp.float32)
        if variant == "vecops":
            v = acc
            for _ in range(64):
                v = v * jnp.float32(1.0000001) + fi
            return v
        if variant == "tree":
            bits = (acc + fi).astype(jnp.int32) & jnp.int32(15)
            plane = _roll_or(bits)
            return acc + plane.astype(jnp.float32) * jnp.float32(1e-9)
        if variant == "extract":
            bits = (acc + fi).astype(jnp.int32) & jnp.int32(15)
            word = _roll_or(bits)[0, 0]
            # The scalar extract + a data-dependent select consume the
            # word on the scalar core (a branch region would add the
            # measured SUBWORD ~1.15us/word on top; see TODO.md).
            return acc + jnp.where(word != 0, jnp.float32(1e-9),
                                   jnp.float32(0.0))
        if variant == "while2":
            # 6 set bits -> 3 trips of 2 visits (the paired sub loop).
            word = jnp.int32(0x2D) | (i & jnp.int32(1))

            def trip(c):
                w, a = c
                iso = w & (jnp.int32(0) - w)
                a = a * jnp.float32(1.0000001) + iso.astype(jnp.float32)
                w = w ^ iso
                iso2 = w & (jnp.int32(0) - w)
                a = a * jnp.float32(1.0000001) + iso2.astype(jnp.float32)
                return w ^ iso2, a

            _, acc2 = jax.lax.while_loop(lambda c: c[0] != 0, trip,
                                         (word, acc))
            return acc2
        if variant == "loads72":
            base = (i & jnp.int32(63)) * 9
            v = acc
            for k in range(72):
                v = v + sm[base + (k % 9)] * jnp.float32(1e-9)
            return v
        if variant == "subplane":
            base = (i & jnp.int32(63)) * 6
            bits = jnp.zeros((_SUB, _LANE), jnp.int32)
            for b in range(32):
                lo = sm[base + (b % 6)]
                m = (acc * jnp.float32(0.001) + fi) > lo
                bits = bits | jnp.where(m, jnp.int32(1) << (b % 31),
                                        jnp.int32(0))
            word = _roll_or(bits)[0, 0]
            return acc + word.astype(jnp.float32) * jnp.float32(1e-9)
        raise ValueError(variant)

    out[:] = jax.lax.fori_loop(0, n_iter, body, x_ref[:])


def run(variant, n_iter, reps=5):
    sm = jnp.arange(1024, dtype=jnp.float32)
    x = jnp.ones((_SUB, _LANE), jnp.float32)
    call = pl.pallas_call(
        functools.partial(_kernel, variant=variant, n_iter=n_iter),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_SUB, _LANE), jnp.float32),
    )
    jitted = jax.jit(lambda s, v: call(s, v))
    jitted(sm, x).block_until_ready()  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jitted(sm, x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / n_iter * 1e9


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    for variant in ("vecops", "tree", "extract", "while2", "loads72",
                    "subplane"):
        ns = run(variant, n)
        print(f"{variant:>9}: {ns:8.1f} ns/iter")


if __name__ == "__main__":
    main()
