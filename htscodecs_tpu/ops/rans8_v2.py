"""Batched rANS 4x8 engines for TPU (CRAM 3.0), dense-alphabet form.

Same design as the 4x16 engines (ops/rans_v2.py) with the rANS_byte.h
parameters (reference: htscodecs/rANS_byte.h:62,281-315,439-457):
L = 1<<23, x_max = ((L >> 12) << 8) * freq, up to TWO byte
emissions/consumptions per symbol, TOTFREQ fixed at 4096.  The
interleave layouts follow rANS_static.c: order-0 codes every symbol
i -> state i&3 (the decoder reads the final partial group from the
states without advancing them, rANS_static.c:346-355); order-1 uses
the same four-quarter layout as 4x16.

Dense tables, VPU masked-reduce row fetch, chunk-window byte refill
via jnp.take rows, and the two-level sort compaction are all shared
with rans_v2.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from . import rans_v2
from .rans_v2 import (PACK_MASK, PACK_SHIFT, _col_pick, _densify,
                      _row_fetch, _undensify)

RANS8_L = 1 << 23
SHIFT = 12
CHUNK = 128
R8 = 16              # inner steps per refill: 127 + 8*16 <= 255


# ---------------------------------------------------------------------------
# encode

@functools.partial(jax.jit, static_argnames=("order", "seg_cap"))
def _enc_scan8(blocks, alpha, packed, order: int,
               seg_cap: int = rans_v2.SEG_CAP):
    """Returns (states (B,4) u32, bytes (B, cap) u16-valued, counts,
    overflow)."""
    B, N = blocks.shape
    dense = _densify(blocks, alpha)

    if order == 1:
        q = N >> 2
        tail = N - 4 * q
        D4 = dense[:, :4 * q].reshape(B, 4, q)
        sym_main = jnp.transpose(D4[:, :, 1:][:, :, ::-1], (2, 0, 1))
        ctx_main = jnp.transpose(D4[:, :, :-1][:, :, ::-1], (2, 0, 1))
        if tail:
            idx = N - 1 - jnp.arange(tail)
            st3 = dense[:, idx]
            ct3 = dense[:, idx - 1]
            sym_t = jnp.zeros((tail, B, 4), jnp.int32).at[:, :, 3].set(st3.T)
            ctx_t = jnp.zeros((tail, B, 4), jnp.int32).at[:, :, 3].set(ct3.T)
            parts_s = [sym_t, sym_main]
            parts_c = [ctx_t, ctx_main]
        else:
            parts_s = [sym_main]
            parts_c = [ctx_main]
        parts_s.append(D4[:, :, 0][None])
        parts_c.append(jnp.zeros((1, B, 4), jnp.int32))
        sym_p = jnp.concatenate(parts_s, axis=0)
        ctx_p = jnp.concatenate(parts_c, axis=0)
        K = tail + q
        valid = jnp.ones((K, B, 4), bool)
        if tail:
            v = jnp.zeros((tail, 4), bool).at[:, 3].set(True)
            valid = valid.at[:tail].set(
                jnp.broadcast_to(v[:, None, :], (tail, B, 4)))
        sym_p = sym_p[:, :, ::-1]
        ctx_p = ctx_p[:, :, ::-1]
        valid = valid[:, :, ::-1]
    else:
        K = -(-N // 4)
        pad = K * 4 - N
        dpad = jnp.pad(dense, ((0, 0), (0, pad)))
        sy = dpad.reshape(B, K, 4)
        sym_p = jnp.transpose(sy, (1, 0, 2))[::-1, :, ::-1]
        ctx_p = jnp.zeros_like(sym_p)
        valid = jnp.ones((K, B, 4), bool)
        if pad:
            vlast = jnp.zeros((4,), bool).at[4 - pad:].set(True)
            valid = valid.at[0].set(~vlast[::-1])
        sym_p = jnp.where(valid, sym_p, 0)
    sym_p = sym_p.astype(jnp.uint8)
    ctx_p = ctx_p.astype(jnp.uint8)

    x0 = jnp.full((B, 4), RANS8_L, dtype=jnp.uint32)
    xmax_mult = jnp.uint32((RANS8_L >> SHIFT) << 8)

    def step(x, inp):
        ctx, sym, ok = inp
        ctx = ctx.astype(jnp.int32)
        sym = sym.astype(jnp.int32)
        if order == 1:
            row = _row_fetch(packed, ctx)
        else:
            row = jnp.broadcast_to(packed[:, None, :],
                                   (B, 4, packed.shape[1]))
        val = _col_pick(row, sym)
        start = (val >> PACK_SHIFT).astype(jnp.uint32)
        freq = (val & PACK_MASK).astype(jnp.uint32)
        freq_s = jnp.where(ok, freq, jnp.uint32(1))
        x_max = xmax_mult * freq
        bs, es = [], []
        for _ in range(2):
            emit = (x >= x_max) & ok
            bs.append((x & jnp.uint32(0xFF)).astype(jnp.uint16))
            es.append(emit)
            x = jnp.where(emit, x >> 8, x)
        qq = x // freq_s
        newx = (qq << SHIFT) + (x - qq * freq_s) + start
        x = jnp.where(ok, newx, x)
        return x, (jnp.stack(bs, axis=2), jnp.stack(es, axis=2))

    xf, (bytes_, emits) = lax.scan(step, x0, (ctx_p, sym_p, valid))

    # forward stream order = full reverse of emission order
    w = jnp.transpose(bytes_[::-1, :, ::-1, ::-1],
                      (1, 0, 2, 3)).reshape(B, K * 8)
    e = jnp.transpose(emits[::-1, :, ::-1, ::-1],
                      (1, 0, 2, 3)).reshape(B, K * 8)
    w, e = lax.optimization_barrier((w, e))
    out, n, overflow = rans_v2._compact(w, e, seg_cap)
    return xf[:, ::-1], out, n, overflow


def _enc8(blocks, alpha, packed, order: int):
    xf, out, n, ovf = _enc_scan8(blocks, alpha, packed, order)
    if bool(np.asarray(ovf)):
        xf, out, n, _ = _enc_scan8(blocks, alpha, packed, order,
                                   seg_cap=rans_v2.SEG)
    return np.asarray(xf), np.asarray(out), np.asarray(n)


def enc_o0_batch(blocks: np.ndarray, alpha, packed):
    """Returns (states (B,4) u32, byte stream (B,cap) u16-valued,
    counts)."""
    return _enc8(jnp.asarray(blocks), jnp.asarray(alpha),
                 jnp.asarray(packed), 0)


def enc_o1_batch(blocks: np.ndarray, alpha, packed):
    return _enc8(jnp.asarray(blocks), jnp.asarray(alpha),
                 jnp.asarray(packed), 1)


# ---------------------------------------------------------------------------
# decode

@functools.partial(jax.jit, static_argnames=("K", "q", "order", "win"))
def _dec_scan8(X0, chunks, packed, K: int, q: int, order: int,
               win: str = "coarse"):
    """Byte-renorm decode scan; returns dense symbols (KO*R, B, 4)
    u8 and final states.  ``win`` mirrors rans_v2's window variants
    (byte-exact): 'coarse' = 256-wide window refilled every 16 steps,
    'fine'/'xfine' = 64/32-wide windows from 16-byte rows (each step
    consumes <= 8 bytes: 4 lanes x up to 2 renorm bytes)."""
    B = X0.shape[0]
    NC = chunks.shape[0] // B
    mask = jnp.uint32((1 << SHIFT) - 1)
    if win in rans_v2._WIN_PARAMS:
        W, NROWS, R = rans_v2._WIN_PARAMS[win]
    else:
        W, R = 2 * CHUNK, R8
    KO = -(-K // R)
    lane3 = jnp.arange(4, dtype=jnp.int32)[None, :] == 3
    iotaW = jnp.arange(W, dtype=jnp.int32)[None, None, :]

    def inner_step(carry, s):
        X, p, ctx, win, base = carry
        if order == 1:
            act = (s < q) | ((s < K) & lane3)
            row = _row_fetch(packed, ctx)
        else:
            act = jnp.broadcast_to(s < K, (B, 4))
            row = jnp.broadcast_to(packed[:, None, :],
                                   (B, 4, packed.shape[1]))
        m = (X & mask).astype(jnp.int32)
        base_r = row >> PACK_SHIFT
        f_r = row & PACK_MASK
        okm = (base_r <= m[:, :, None]) & (f_r > 0)
        iota = jnp.arange(row.shape[2], dtype=jnp.int32)
        symd = jnp.max(jnp.where(okm, iota, 0), axis=2)
        b = _col_pick(base_r, symd).astype(jnp.uint32)
        f = _col_pick(f_r, symd).astype(jnp.uint32)
        Xn = f * (X >> SHIFT) + m.astype(jnp.uint32) - b
        # Up to two byte consumptions per lane, lane 0 fully before
        # lane 1 etc.  Whether a second byte is needed is independent
        # of the first byte's value ((X<<8)|b < L  <=>  X < L>>8), so
        # all offsets are known before any fetch.
        need1 = (Xn < jnp.uint32(RANS8_L)) & act
        need2 = need1 & (Xn < jnp.uint32(RANS8_L >> 8))
        c = need1.astype(jnp.int32) + need2.astype(jnp.int32)
        startl = (p[:, None] - base) + (jnp.cumsum(c, axis=1) - c)
        off1 = jnp.where(need1, startl, W)
        off2 = jnp.where(need2, startl + 1, W)
        sel1 = off1[:, :, None] == iotaW
        sel2 = off2[:, :, None] == iotaW
        b1 = jnp.sum(jnp.where(sel1, win[:, None, :], 0),
                     axis=2).astype(jnp.uint32)
        b2 = jnp.sum(jnp.where(sel2, win[:, None, :], 0),
                     axis=2).astype(jnp.uint32)
        Xn = jnp.where(need1, (Xn << 8) | (b1 & jnp.uint32(0xFF)), Xn)
        Xn = jnp.where(need2, (Xn << 8) | (b2 & jnp.uint32(0xFF)), Xn)
        X = jnp.where(act, Xn, X)
        p = p + jnp.sum(c, axis=1)
        ctx = jnp.where(act, symd, ctx)
        return (X, p, ctx, win, base), symd.astype(jnp.uint8)

    if win in rans_v2._WIN_PARAMS:
        FC = rans_v2.FINE_CW
        NC2 = NC * (CHUNK // FC)
        chunks_f = chunks.reshape(B * NC2, FC)
        brange2 = jnp.arange(B, dtype=jnp.int32) * NC2

        def refill(p):
            c0 = jnp.minimum(p >> 4, NC2 - 1)
            cs = [brange2 + jnp.minimum(c0 + i, NC2 - 1)
                  for i in range(NROWS)]
            rows = jnp.stack(cs, axis=1).reshape(-1)
            return (jnp.take(chunks_f, rows, axis=0).reshape(B, W),
                    (c0 << 4)[:, None])
    else:
        brange = jnp.arange(B, dtype=jnp.int32) * NC

        def refill(p):
            c0 = jnp.minimum(p >> 7, NC - 1)
            c1 = jnp.minimum(c0 + 1, NC - 1)
            rows = jnp.stack([brange + c0, brange + c1],
                             axis=1).reshape(-1)
            return (jnp.take(chunks, rows, axis=0).reshape(B, 2 * CHUNK),
                    (c0 << 7)[:, None])

    def outer(carry, ko):
        X, p, ctx = carry
        winb, base = refill(p)
        steps = ko * R + jnp.arange(R)
        (X, p, ctx, _, _), syms = lax.scan(
            inner_step, (X, p, ctx, winb, base), steps)
        return (X, p, ctx), syms

    p0 = jnp.zeros((B,), jnp.int32)
    ctx0 = jnp.zeros((B, 4), jnp.int32)
    (Xf, pf, _), syms = lax.scan(outer, (X0, p0, ctx0),
                                 jnp.arange(KO, dtype=jnp.int32))
    return syms.reshape(KO * R, B, 4), Xf


@functools.partial(jax.jit, static_argnames=("K", "q", "N", "order",
                                             "win"))
def _dec8_to_bytes(X0, chunks, packed, alpha, K: int, q: int, N: int,
                   order: int, win: str = "coarse"):
    syms, Xf = _dec_scan8(X0, chunks, packed, K, q, order, win)
    B = X0.shape[0]
    out_b = _undensify(jnp.transpose(syms[:K], (1, 0, 2)), alpha)
    if order == 1:
        main = jnp.transpose(out_b[:, :q, :], (0, 2, 1)).reshape(B, 4 * q)
        if 4 * q >= N:
            return main[:, :N]
        tailp = out_b[:, q:, 3]
        return jnp.concatenate([main, tailp[:, :N - 4 * q]], axis=1)
    # order 0: the final N & 3 symbols are read from the states
    # without advancing them (rANS_static.c:346-355)
    flat = out_b.reshape(B, K * 4)
    body = N & ~3
    if body == N:
        return flat[:, :N]
    mask = jnp.uint32((1 << SHIFT) - 1)
    m = (Xf & mask).astype(jnp.int32)                  # (B, 4)
    base_r = packed >> PACK_SHIFT
    f_r = packed & PACK_MASK
    okm = (base_r[:, None, :] <= m[:, :, None]) & (f_r[:, None, :] > 0)
    iota = jnp.arange(packed.shape[1], dtype=jnp.int32)
    symd = jnp.max(jnp.where(okm, iota, 0), axis=2)
    tail_b = _undensify(symd, alpha)                   # (B, 4)
    return jnp.concatenate([flat[:, :body], tail_b[:, :N - body]], axis=1)


def _chunkify8(stream_bytes: np.ndarray) -> np.ndarray:
    """(B, W) u8 -> (B*NC, CHUNK) i32."""
    B, W = stream_bytes.shape
    NC = max(-(-W // CHUNK), 2)
    out = np.zeros((B, NC * CHUNK), np.int32)
    out[:, :W] = stream_bytes
    return out.reshape(B * NC, CHUNK)


def dec_o0_batch(states, stream, out_sz: int, alpha, packed):
    """states (B,4) u32; stream (B,W) u8 (bytes after the 16 state
    bytes); dense tables as in rans_v2.  Returns (B, out_sz) u8.

    out_sz < 4 would run a full 4-lane step before the no-advance tail
    symbols are read, corrupting the final states; such blocks belong
    on the host decoder (rANS_static.c:224-363 handles them there)."""
    if out_sz < 4:
        raise ValueError("dec_o0_batch requires out_sz >= 4; "
                         "route short blocks to the host decoder")
    q = out_sz >> 2
    K = max(q, 1)
    out = _dec8_to_bytes(
        jnp.asarray(states.astype(np.uint32)),
        jnp.asarray(_chunkify8(stream)),
        jnp.asarray(packed), jnp.asarray(alpha), K, K, out_sz, 0,
        win=rans_v2._DEC_VARIANT["win"])
    return np.asarray(out)


def dec_o1_batch(states, stream, out_sz: int, alpha, packed):
    q = out_sz >> 2
    K = q + (out_sz - 4 * q)
    out = _dec8_to_bytes(
        jnp.asarray(states.astype(np.uint32)),
        jnp.asarray(_chunkify8(stream)),
        jnp.asarray(packed), jnp.asarray(alpha), K, q, out_sz, 1,
        win=rans_v2._DEC_VARIANT["win"])
    return np.asarray(out)
