"""Round-3 microbench: decode-step formulation shootout at wide A.

Times one inner-scan-shaped loop per candidate on the real device:
  carry = (X (4,B) u32, ctx (4,B) i32), T steps, per step:
  row fetch by ctx + slot->sym resolve + fake state update.

Candidates:
  base   : (A,A,B) i32 packed (base<<13|f), 2-stage masked reduce (current)
  u16e   : (A,A,B) u16 ends; fused cnt/max/min resolve
  pair   : (A,A/2,B) u32 two-ends packing
  mxu    : int8 2-plane one-hot MXU row fetch + VPU resolve over (B,4,A)
  win32/win16: window-select cost (256,B) u32 vs u16
  div    : u32 // vs f32-division-with-fixup throughput
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

A = 48
B = 12288
T = 256
SHIFT = 10
MASK = (1 << SHIFT) - 1


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.uint32) if x.dtype != jnp.float32 else x))


def timeit(fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    out = fn(*args)
    sync(out)
    dt = time.time() - t0
    return dt / T * 1e6  # us/step


rng = np.random.default_rng(0)
# fake normalised tables: per (block, ctx) a sorted ends vector summing to 1<<SHIFT
f = rng.integers(1, 40, size=(B, A, A)).astype(np.int64)
f = (f * (1 << SHIFT) / f.sum(-1, keepdims=True)).astype(np.int64)
f[:, :, -1] += (1 << SHIFT) - f.sum(-1)
ends = np.cumsum(f, axis=-1).astype(np.int32)          # (B,A,A)
bases = ends - f.astype(np.int32)
packed = ((bases << 13) | f).astype(np.int32)

X0 = jnp.asarray(rng.integers(1 << 15, 1 << 30, size=(4, B), dtype=np.uint32))
C0 = jnp.asarray(rng.integers(0, A, size=(4, B), dtype=np.int32))
iota_a = jnp.arange(A, dtype=jnp.int32)[:, None, None]


@jax.jit
def k_base(X0, C0, packedT):
    def step(c, _):
        X, ctx = c
        m = (X & MASK).astype(jnp.int32)
        ohc = ctx[None, :, :] == iota_a
        row = jnp.sum(jnp.where(ohc[:, None, :, :], packedT[:, :, None, :], 0), axis=0)
        rb = row >> 13
        rf = row & 0x1FFF
        ok = (rb <= m[None]) & (rf > 0)
        symd = jnp.max(jnp.where(ok, iota_a, 0), axis=0)
        ohs = symd[None, :, :] == iota_a
        b = jnp.sum(jnp.where(ohs & (rf > 0), rb, 0), axis=0).astype(jnp.uint32)
        fq = jnp.sum(jnp.where(ohs & (rf > 0), rf, 0), axis=0).astype(jnp.uint32)
        Xn = fq * (X >> SHIFT) + m.astype(jnp.uint32) - b
        return (Xn | jnp.uint32(1 << 16), symd), symd.astype(jnp.uint8)

    (Xf, cf), syms = lax.scan(step, (X0, C0), None, length=T)
    return syms[-1]


@jax.jit
def k_u16e(X0, C0, endsT):
    # endsT (A_ctx, A_sym, B) u16
    def step(c, _):
        X, ctx = c
        m = (X & MASK).astype(jnp.int32)
        ohc = ctx[None, :, :] == iota_a                       # (A,4,B)
        # fused 2D pass: for each sym entry s, e = ends[ctx, s]
        e = jnp.sum(jnp.where(ohc[:, None, :, :], endsT[:, :, None, :],
                              jnp.uint16(0)).astype(jnp.int32), axis=0)  # (A,4,B)
        le = e <= m[None]
        symd = jnp.sum(le.astype(jnp.int32), axis=0)
        b = jnp.max(jnp.where(le, e, 0), axis=0).astype(jnp.uint32)
        ev = jnp.min(jnp.where(le, 1 << 30, e), axis=0).astype(jnp.uint32)
        Xn = (ev - b) * (X >> SHIFT) + m.astype(jnp.uint32) - b
        return (Xn | jnp.uint32(1 << 16), symd), symd.astype(jnp.uint8)

    (Xf, cf), syms = lax.scan(step, (X0, C0), None, length=T)
    return syms[-1]


@jax.jit
def k_pair(X0, C0, pairT):
    # pairT (A_ctx, A/2, B) u32: ends[2j]<<16 | ends[2j+1]
    def step(c, _):
        X, ctx = c
        m = (X & MASK).astype(jnp.int32)
        ohc = ctx[None, :, :] == iota_a
        pr = jnp.sum(jnp.where(ohc[:, None, :, :], pairT[:, :, None, :],
                               jnp.uint32(0)), axis=0).astype(jnp.int32)  # (A/2,4,B)
        hi = pr >> 16
        lo = pr & 0xFFFF
        leh = hi <= m[None]
        lel = lo <= m[None]
        symd = jnp.sum(leh.astype(jnp.int32) + lel.astype(jnp.int32), axis=0)
        b = jnp.maximum(jnp.max(jnp.where(leh, hi, 0), axis=0),
                        jnp.max(jnp.where(lel, lo, 0), axis=0)).astype(jnp.uint32)
        ev = jnp.minimum(jnp.min(jnp.where(leh, 1 << 30, hi), axis=0),
                         jnp.min(jnp.where(lel, 1 << 30, lo), axis=0)).astype(jnp.uint32)
        Xn = (ev - b) * (X >> SHIFT) + m.astype(jnp.uint32) - b
        return (Xn | jnp.uint32(1 << 16), symd), symd.astype(jnp.uint8)

    (Xf, cf), syms = lax.scan(step, (X0, C0), None, length=T)
    return syms[-1]


@jax.jit
def k_mxu(X0, C0, plane_lo, plane_hi):
    # planes (B, A, A) int8: lo = ends & 127, hi = ends >> 7
    ioA = jnp.arange(A, dtype=jnp.int32)

    def step(c, _):
        X, ctx = c                                            # (4,B)
        m = (X & MASK).astype(jnp.int32)
        oh = (ctx[:, :, None] == ioA).astype(jnp.int8)        # (4,B,A)
        ohb = jnp.transpose(oh, (1, 0, 2))                    # (B,4,A)
        rlo = lax.dot_general(ohb, plane_lo, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
        rhi = lax.dot_general(ohb, plane_hi, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
        e = jnp.transpose(rlo + (rhi << 7), (1, 0, 2))        # (4,B,A)
        le = e <= m.T[None].transpose(1, 2, 0) if False else e <= m[:, :, None]
        symd = jnp.sum(le.astype(jnp.int32), axis=2)
        b = jnp.max(jnp.where(le, e, 0), axis=2).astype(jnp.uint32)
        ev = jnp.min(jnp.where(le, 1 << 30, e), axis=2).astype(jnp.uint32)
        Xn = (ev - b) * (X >> SHIFT) + m.astype(jnp.uint32) - b
        return (Xn | jnp.uint32(1 << 16), symd), symd.astype(jnp.uint8)

    (Xf, cf), syms = lax.scan(step, (X0, C0), None, length=T)
    return syms[-1]


@jax.jit
def k_win32(X0, C0, win):
    iota_w = jnp.arange(256, dtype=jnp.int32)[:, None, None]

    def step(c, _):
        X, p = c
        off = (p[None] + jnp.cumsum(jnp.ones((4, X.shape[1]), jnp.int32), 0)) & 255
        ohw = off[None, :, :] == iota_w
        w = jnp.sum(jnp.where(ohw, win[:, None, :], jnp.uint32(0)), axis=0,
                    dtype=jnp.uint32)
        return (X + w, (p + 1) & 127), w[0].astype(jnp.uint16)

    (Xf, pf), ws = lax.scan(step, (X0, jnp.zeros((X0.shape[1],), jnp.int32)),
                            None, length=T)
    return ws[-1]


@jax.jit
def k_win16(X0, C0, win):
    iota_w = jnp.arange(256, dtype=jnp.int32)[:, None, None]

    def step(c, _):
        X, p = c
        off = (p[None] + jnp.cumsum(jnp.ones((4, X.shape[1]), jnp.int32), 0)) & 255
        ohw = off[None, :, :] == iota_w
        w = jnp.max(jnp.where(ohw, win[:, None, :], jnp.uint16(0)), axis=0)
        return (X + w.astype(jnp.uint32), (p + 1) & 127), w[0]

    (Xf, pf), ws = lax.scan(step, (X0, jnp.zeros((X0.shape[1],), jnp.int32)),
                            None, length=T)
    return ws[-1]


@jax.jit
def k_div_u32(X0, F):
    def step(x, _):
        q = x // F
        return q + x, q[0].astype(jnp.uint16)

    xf, qs = lax.scan(step, X0, None, length=T)
    return qs[-1]


@jax.jit
def k_div_f32(X0, F):
    Ff = F.astype(jnp.float32)

    def step(x, _):
        q0 = (x.astype(jnp.float32) / Ff).astype(jnp.uint32)
        r = (x - q0 * F).astype(jnp.int32)
        q = jnp.where(r < 0, q0 - 1, jnp.where(r >= F.astype(jnp.int32), q0 + 1, q0))
        return q + x, q[0].astype(jnp.uint16)

    xf, qs = lax.scan(step, X0, None, length=T)
    return qs[-1]


def main():
    print("devices:", jax.devices())
    endsT = jnp.asarray(np.ascontiguousarray(
        np.transpose(ends, (1, 2, 0))).astype(np.uint16))
    packedT = jnp.asarray(np.ascontiguousarray(np.transpose(packed, (1, 2, 0))))
    ep = ends.reshape(B, A, A // 2, 2)
    pair = (ep[..., 0].astype(np.uint32) << 16) | ep[..., 1].astype(np.uint32)
    pairT = jnp.asarray(np.ascontiguousarray(np.transpose(pair, (1, 2, 0))))
    plane_lo = jnp.asarray((ends & 127).astype(np.int8))
    plane_hi = jnp.asarray((ends >> 7).astype(np.int8))
    win32 = jnp.asarray(rng.integers(0, 1 << 16, size=(256, B), dtype=np.uint32))
    win16 = win32.astype(jnp.uint16)
    F = jnp.asarray(rng.integers(1, 1 << 10, size=(4, B), dtype=np.uint32))

    for name, fn, args in [
        ("base  i32 2-stage", k_base, (X0, C0, packedT)),
        ("u16e  ends",        k_u16e, (X0, C0, endsT)),
        ("pair  u32",         k_pair, (X0, C0, pairT)),
        ("mxu   int8x2",      k_mxu,  (X0, C0, plane_lo, plane_hi)),
        ("win32 select",      k_win32, (X0, C0, win32)),
        ("win16 select",      k_win16, (X0, C0, win16)),
        ("div   u32",         k_div_u32, (X0, F)),
        ("div   f32fix",      k_div_f32, (X0, F)),
    ]:
        try:
            us = timeit(fn, *args)
            print(f"{name:20s} {us:8.1f} us/step")
        except Exception as e:
            print(f"{name:20s} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
