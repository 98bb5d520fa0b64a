"""Round-3 microbench #2: jnp.take row-fetch cost inside a scan.

Decides the two round-3 hot-path redesigns:
  1. O1 row fetch at wide A: replace the (A,A,4,B) one-hot masked
     reduce (~150 us/sym at A=48) with jnp.take of 4B rows of width A
     from a (B*A, A) table.
  2. Renorm word fetch: replace the (256,4,B) window select
     (~22 us/sym, the A<=8 floor) with either (a) a narrower window at
     finer chunk granularity, or (b) a direct per-step take of 4B
     narrow rows + tiny in-row select.

Grid: take of N rows x width W, inside lax.scan, with data-dependent
indices (fed from the previous step so XLA cannot hoist them).
Two-point timing (T2 - T1 steps) subtracts dispatch latency (~30 ms on
the axon tunnel).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

A = 48
B = 12288
SHIFT = 10
MASK = (1 << SHIFT) - 1
T1, T2 = 32, 160

rng = np.random.default_rng(0)


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.uint32)))


def time_steps(make_fn, *args):
    """make_fn(T) -> jitted fn; returns us/step via two-point."""
    f1, f2 = make_fn(T1), make_fn(T2)
    sync(f1(*args)); sync(f2(*args))           # compile both
    outs = []
    for f, T in ((f1, T1), (f2, T2)):
        t0 = time.time(); sync(f(*args)); dt = time.time() - t0
        outs.append(dt)
    return (outs[1] - outs[0]) / (T2 - T1) * 1e6


# --- 1. take row fetch + full resolve, width W (the wide-A candidate) ---
def make_take_rowfetch(W, dtype=np.int32):
    tbl = jnp.asarray(rng.integers(0, 1 << 24, size=(B * A, W)).astype(dtype))
    brange = jnp.arange(B, dtype=jnp.int32)[None, :] * A       # (1,B)
    iw = jnp.arange(W, dtype=jnp.int32)

    def make(T):
        @jax.jit
        def run(X0, C0):
            def step(c, _):
                X, ctx = c                                     # (4,B)
                m = (X & MASK).astype(jnp.int32)
                idx = (brange + ctx).reshape(-1)               # (4B,)
                row = jnp.take(tbl, idx, axis=0,
                               mode='clip').reshape(4, B, W)
                rb = (row >> 13).astype(jnp.int32)
                rf = (row & 0x1FFF).astype(jnp.int32)
                ok = (rb <= m[:, :, None]) & (rf > 0)
                symd = jnp.max(jnp.where(ok, iw, 0), axis=2)   # (4,B)
                ohs = symd[:, :, None] == iw
                b = jnp.sum(jnp.where(ohs, rb, 0), axis=2).astype(jnp.uint32)
                f = jnp.sum(jnp.where(ohs, rf, 0), axis=2).astype(jnp.uint32)
                Xn = jnp.maximum(
                    f * (X >> SHIFT) + m.astype(jnp.uint32) - b,
                    jnp.uint32(1 << 16))
                return (Xn, symd % A), symd.astype(jnp.uint8)
            (Xf, cf), syms = lax.scan(step, (X0, C0), None, length=T)
            return syms[-1]
        return run
    return make


# --- 1b. baseline: current one-hot row fetch + resolve at width A ---
def make_onehot(Aw):
    packed = jnp.asarray(
        rng.integers(0, 1 << 24, size=(Aw, Aw, B)).astype(np.int32))
    iota_a = jnp.arange(Aw, dtype=jnp.int32)[:, None, None]

    def make(T):
        @jax.jit
        def run(X0, C0):
            def step(c, _):
                X, ctx = c
                m = (X & MASK).astype(jnp.int32)
                ohc = ctx[None, :, :] == iota_a
                row = jnp.sum(jnp.where(ohc[:, None, :, :],
                                        packed[:, :, None, :], 0), axis=0)
                rb = row >> 13
                rf = row & 0x1FFF
                ok = (rb <= m[None]) & (rf > 0)
                symd = jnp.max(jnp.where(ok, iota_a, 0), axis=0)
                ohs = symd[None, :, :] == iota_a
                b = jnp.sum(jnp.where(ohs, rb, 0), axis=0).astype(jnp.uint32)
                f = jnp.sum(jnp.where(ohs, rf, 0), axis=0).astype(jnp.uint32)
                Xn = jnp.maximum(
                    f * (X >> SHIFT) + m.astype(jnp.uint32) - b,
                    jnp.uint32(1 << 16))
                return (Xn, symd % Aw), symd.astype(jnp.uint8)
            (Xf, cf), syms = lax.scan(step, (X0, C0), None, length=T)
            return syms[-1]
        return run
    return make


# --- 2. per-step word take: 4B rows of width cw u32, + in-row select ---
def make_take_words(cw):
    NC = 64
    chunks = jnp.asarray(
        rng.integers(0, 1 << 16, size=(B * NC, cw), dtype=np.uint32))
    iw = jnp.arange(cw, dtype=jnp.int32)
    brange = jnp.arange(B, dtype=jnp.int32)[None, :] * NC

    def make(T):
        @jax.jit
        def run(X0, P0):
            def step(c, _):
                X, p = c                                       # (4,B),(B,)
                ni = (X & 3).astype(jnp.int32)                 # fake need
                off = p[None, :] + (jnp.cumsum(ni, axis=0) - ni)
                ridx = (brange + jnp.minimum(off // cw, NC - 1)).reshape(-1)
                rows = jnp.take(chunks, ridx, axis=0,
                                mode='clip').reshape(4, B, cw)
                sel = (off % cw)[:, :, None] == iw
                w = jnp.sum(jnp.where(sel, rows, jnp.uint32(0)),
                            axis=2, dtype=jnp.uint32)
                Xn = (X + w) | jnp.uint32(1 << 16)
                return (Xn, (p + jnp.sum(ni, axis=0)) % (NC * cw // 2)), \
                    w[0].astype(jnp.uint16)
            (Xf, pf), ws = lax.scan(step, (X0, P0), None, length=T)
            return ws[-1]
        return run
    return make


# --- 2b. window select at width Wn (current approach, narrower) ---
def make_winsel(Wn):
    win = jnp.asarray(
        rng.integers(0, 1 << 16, size=(Wn, B), dtype=np.uint32))
    iota_w = jnp.arange(Wn, dtype=jnp.int32)[:, None, None]

    def make(T):
        @jax.jit
        def run(X0, P0):
            def step(c, _):
                X, p = c
                ni = (X & 3).astype(jnp.int32)
                off = (p[None, :] + jnp.cumsum(ni, axis=0) - ni) % Wn
                ohw = off[None, :, :] == iota_w
                w = jnp.sum(jnp.where(ohw, win[:, None, :], jnp.uint32(0)),
                            axis=0, dtype=jnp.uint32)
                Xn = (X + w) | jnp.uint32(1 << 16)
                return (Xn, (p + jnp.sum(ni, axis=0)) % Wn), \
                    w[0].astype(jnp.uint16)
            (Xf, pf), ws = lax.scan(step, (X0, P0), None, length=T)
            return ws[-1]
        return run
    return make


def main():
    print("devices:", jax.devices())
    X0 = jnp.asarray(rng.integers(1 << 16, 1 << 30, size=(4, B),
                                  dtype=np.uint32))
    C0 = jnp.asarray(rng.integers(0, A, size=(4, B), dtype=np.int32))
    P0 = jnp.zeros((B,), jnp.int32)

    for W in (8, 16, 32, 48, 64):
        us = time_steps(make_take_rowfetch(W), X0, C0)
        ns_row = us * 1000 / (4 * B)
        gbs = 4 * B * W * 4 / us / 1e3
        print(f"take_rowfetch W={W:3d}   {us:8.1f} us/step  "
              f"{ns_row:6.2f} ns/row  {gbs:7.1f} GB/s")
    for Aw in (4, 8, 48):
        us = time_steps(make_onehot(Aw),
                        X0, jnp.minimum(C0, Aw - 1))
        print(f"onehot   A={Aw:3d}   {us:8.1f} us/step")
    for cw in (8, 16, 32):
        us = time_steps(make_take_words(cw), X0, P0)
        print(f"take_words cw={cw:3d}  {us:8.1f} us/step")
    for Wn in (32, 64, 128, 256):
        us = time_steps(make_winsel(Wn), X0, P0)
        print(f"winsel  Wn={Wn:3d}   {us:8.1f} us/step")


if __name__ == "__main__":
    main()
