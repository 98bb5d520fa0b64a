"""Pallas TPU kernels for the batched rANS 4x16 engines (v3).

The v2 engines (ops/rans_v2.py) run the 4-state scans as XLA
``lax.scan``s; measurement shows the decode step is bound by HBM
traffic — the renorm word window and the dense tables are re-read
from HBM every step (~38 us/step at B=8192, scaling linearly with B).
These kernels keep everything resident in VMEM:

- **tables** live in VMEM for the whole block pass, laid out
  ``(A*A, T)`` with the tile's T blocks in the lane dimension, so the
  slot/row resolve is a masked max over sublanes (measured ~80 ns per
  (64,512) reduce on v5e);
- **renorm words** sit in VMEM as u16 ``(W, T)`` (W bucketed; wider
  streams fall back to the v2 engine), narrowed per-block through a
  three-level window hierarchy — 1024-word supers every 8 outer
  steps, a 256-word two-chunk window per outer step, and a 64-word
  extract buffer per 4 decode steps — so the per-step word select
  touches 64 sublanes instead of the stream;
- **states/context/positions** persist in VMEM scratch across the
  sequential outer grid.

Measured regime (v5e, forced-sync timings): the kernels beat the
lax.scan engines ~2x at equal batch size (32 vs 62 ms per 256-block
64 KiB tile), but tiles are VMEM-capped (T<=256..512), so at very
large batches (B >= 8k) the v2 engines' per-step amortisation wins.
The kernels are kept as an alternative engine for the small/medium-
batch regime; the batch wrappers currently route everything through
the v2 engines (which win at production batch sizes), so these are
exercised by tests/test_rans_pallas.py only.

State-transition maths is bit-identical to ``rANS_word.h``
(reference: htscodecs/rANS_word.h:281-321, 356-410; L = 1<<15, 16-bit
renormalisation).  The 4-quarter order-1 layout and the lane-3 tail
mirror htscodecs/rANS_static4x16pr.c:1024-1114; word consumption is
in lane order 0..3 per step, matching the interleaved RansDecRenorm
calls there.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RANS_L = 1 << 15
PER = 32                 # decode steps per outer grid step
GRP = 4                  # steps per 64-word extract-buffer refresh
SUP = 1024               # words per super (mid-level select)
MIDKO = 8                # outer steps per mid-level refresh
W_BUCKETS = (1024, 2048, 4096, 8192, 12288)

PACK_SHIFT = 13
PACK_MASK = (1 << PACK_SHIFT) - 1


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _w_bucket(w: int) -> int | None:
    for b in W_BUCKETS:
        if w <= b:
            return b
    return None


# ---------------------------------------------------------------------------
# Decode kernel


def _dec_kernel_body(A: int, T: int, W: int, shift: int, q: int, K: int,
                     order: int):
    """Build the kernel for one (A, T, W, shift, q, K, order) shape.

    Refs (in order):
      x0_ref    (8, T) u32    initial states in rows 0..3
      words_ref (W, T) u16    full word stream, transposed
      tab_ref   (A2p, T) i32  packed (base<<13|freq), row = ctx*A+sym
      alpha_ref (Ap, T) i32   dense index -> byte value
      out_ref   (PER*4, T) u8 decoded byte of step s, lane l at 4s+l
      scratch: mid (3*SUP, T) i32 (word window around p, supers),
               xs (8, T) u32, pc (8, T) i32 (row 0: p, 1..4: ctx,
               5: mid anchor super)
    The mid level is skipped (words used directly) when W <= 2048.
    """
    A2 = A * A if order == 1 else A
    A2p = max(8, -(-A2 // 8) * 8)
    Ap = max(8, -(-A // 8) * 8)
    use_mid = W > 2 * SUP
    NSUP = -(-W // SUP)
    # coverage proof: anchored at s0 = p>>10 the in-super offset is
    # <= 1023; p advances <= 128*MIDKO-1 before the next refresh and
    # the 2-chunk window extends 256 past p -> 1023+1023+256 < 2304.
    MIDW = 2 * SUP + 256

    def kernel(x0_ref, words_ref, tab_ref, alpha_ref, out_ref,
               mid, xs, pc):
        mask_m = jnp.uint32((1 << shift) - 1)
        ko = pl.program_id(0)

        @pl.when(ko == 0)
        def _init():
            xs[:] = x0_ref[:]
            pc[:] = jnp.zeros((8, T), jnp.int32)

        p = pc[0, :]

        # --- mid level: 3 supers around p, refreshed every MIDKO ---
        if use_mid:
            @pl.when(jax.lax.rem(ko, MIDKO) == 0)
            def _mid():
                s0 = p >> 10
                wv = words_ref[:].reshape(NSUP, SUP, T)
                sid = jax.lax.broadcasted_iota(
                    jnp.int32, (NSUP, 1, T), 0)
                rows = []
                for i in range(3):
                    mk = sid == (s0 + i)[None, None, :]
                    sel = jnp.where(mk, wv.astype(jnp.int32), 0)
                    if i < 2:
                        rows.append(jnp.sum(sel, axis=0))
                    else:
                        rows.append(jnp.sum(sel[:, :MIDW - 2 * SUP, :],
                                            axis=0))
                mid[:] = jnp.concatenate(rows, axis=0)
                pc[5, :] = s0

            base_mid = pc[5, :] << 10
            midv = mid[:]
            NCH = MIDW // 128
        else:
            base_mid = jnp.zeros((T,), jnp.int32)
            midv = words_ref[:].astype(jnp.int32)
            NCH = W // 128

        # --- per-ko window: 2 chunks [c0*128, +256) ---
        crel = (p - base_mid) >> 7
        wv2 = midv.reshape(NCH, 128, T)
        cid = jax.lax.broadcasted_iota(jnp.int32, (NCH, 1, T), 0)
        w0 = jnp.sum(jnp.where(cid == crel[None, None, :], wv2, 0),
                     axis=0)
        w1 = jnp.sum(jnp.where(cid == (crel + 1)[None, None, :], wv2, 0),
                     axis=0)
        win = jnp.concatenate([w0, w1], axis=0)          # (256, T) i32
        base_w = base_mid + (crel << 7)

        tab = tab_ref[:]
        if order == 1:
            row_of = jax.lax.broadcasted_iota(jnp.int32, (A2p, T), 0) // A
            sym_of = (jax.lax.broadcasted_iota(jnp.int32, (A2p, T), 0)
                      - row_of * A)
        else:
            row_of = jnp.zeros((A2p, T), jnp.int32)
            sym_of = jax.lax.broadcasted_iota(jnp.int32, (A2p, T), 0)
        tab_b = tab >> PACK_SHIFT
        tab_f = tab & PACK_MASK
        valid_t = (tab_f > 0) & (
            jax.lax.broadcasted_iota(jnp.int32, (A2p, T), 0) < A2)
        alpha = alpha_ref[:]
        aid = jax.lax.broadcasted_iota(jnp.int32, (Ap, T), 0)
        giota = jax.lax.broadcasted_iota(jnp.int32, (8, 1, T), 0)
        xiota = jax.lax.broadcasted_iota(jnp.int32, (64, T), 0)

        X = xs[:4, :]
        ctx = pc[1:5, :]
        pvec = p

        def resolve(c, m):
            """Bases ascend within a masked row: max packed = hit slot;
            sym = masked max of the symbol index (zero-freq holes make
            a popcount wrong)."""
            mk = valid_t & (row_of == c[None, :]) & (tab_b <= m[None, :])
            val = jnp.max(jnp.where(mk, tab, 0), axis=0)
            sym = jnp.max(jnp.where(mk, sym_of, 0), axis=0)
            return val, sym

        winv = win.reshape(8, 32, T)
        out_rows = []
        for grp in range(PER // GRP):
            # extract buffer: 2 32-word groups at (pvec - base_w) >> 5
            g32 = (pvec - base_w) >> 5
            e0 = jnp.sum(jnp.where(giota == g32[None, None, :],
                                   winv, 0), axis=0)
            e1 = jnp.sum(
                jnp.where(giota == (g32 + 1)[None, None, :], winv, 0),
                axis=0)
            ext = jnp.concatenate([e0, e1], axis=0)      # (64, T)
            base_x = base_w + (g32 << 5)

            for s4 in range(GRP):
                g = ko * PER + grp * GRP + s4
                newX, newctx, need_l, syms = [], [], [], []
                for l in range(4):
                    if order == 1:
                        act = (g < q) if l < 3 else (g < K)
                    else:
                        act = g < q
                    m = (X[l] & mask_m).astype(jnp.int32)
                    val, sym = resolve(
                        ctx[l] if order == 1
                        else jnp.zeros((T,), jnp.int32), m)
                    b = (val >> PACK_SHIFT).astype(jnp.uint32)
                    f = (val & PACK_MASK).astype(jnp.uint32)
                    Xn = f * (X[l] >> shift) + m.astype(jnp.uint32) - b
                    need_l.append((Xn < jnp.uint32(RANS_L)) & act)
                    newX.append(Xn)
                    syms.append(sym)
                    newctx.append(jnp.where(act, sym, ctx[l]))
                # word consumption, lane order 0..3
                off = pvec - base_x
                for l in range(4):
                    ni = need_l[l]
                    sel = xiota == jnp.where(ni, off, -1)[None, :]
                    w = jnp.sum(jnp.where(sel, ext, 0), axis=0)
                    x2 = (newX[l] << 16) | (w.astype(jnp.uint32)
                                            & jnp.uint32(0xFFFF))
                    upd = jnp.where(ni, x2, newX[l])
                    if order == 1:
                        act = (g < q) if l < 3 else (g < K)
                    else:
                        act = g < q
                    newX[l] = jnp.where(act, upd, X[l])
                    inc = ni.astype(jnp.int32)
                    off = off + inc
                    pvec = pvec + inc
                X = jnp.stack(newX, axis=0)
                ctx = jnp.stack(newctx, axis=0)
                for l in range(4):
                    mk = aid == syms[l][None, :]
                    by = jnp.sum(jnp.where(mk, alpha, 0),
                                 axis=0).astype(jnp.uint8)
                    out_rows.append(by)

        out_ref[:] = jnp.stack(out_rows, axis=0)          # (4*PER, T)
        xs[:4, :] = X
        pc[0, :] = pvec
        pc[1:5, :] = ctx

    return kernel, A2p, Ap, MIDW if use_mid else 8


@functools.partial(jax.jit, static_argnames=("A", "shift", "q", "K",
                                             "order", "interpret"))
def _dec_tile(x0, words_T, tab, alpha, A: int, shift: int, q: int, K: int,
              order: int, interpret: bool = False):
    """Decode one tile.

    x0 (8,T) u32; words_T (W, T) u16; tab (A2p, T) i32;
    alpha (Ap, T) i32.  Returns out (KO*PER, T) u32.
    """
    T = x0.shape[1]
    W = words_T.shape[0]
    KO = -(-K // PER)
    kernel, A2p, Ap, midw = _dec_kernel_body(
        A, T, W, shift, q, K, 1 if order else 0)
    out = pl.pallas_call(
        kernel,
        grid=(KO,),
        in_specs=[
            # grid-invariant inputs: constant index maps, so the
            # pipeline fetches each once and revisits the same buffer
            pl.BlockSpec((8, T), lambda ko: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, T), lambda ko: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A2p, T), lambda ko: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ap, T), lambda ko: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PER * 4, T), lambda ko: (ko, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KO * PER * 4, T), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((midw, T), jnp.int32),
            pltpu.VMEM((8, T), jnp.uint32),
            pltpu.VMEM((8, T), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x0, words_T, tab, alpha)
    return out


def _prep_tile(states, packed, alpha, T):
    """Transpose per-tile inputs into kernel layouts (XLA-side)."""
    B = states.shape[0]
    A = alpha.shape[1]
    A2 = A * A if packed.ndim == 3 else A
    A2p = max(8, -(-A2 // 8) * 8)
    Ap = max(8, -(-A // 8) * 8)
    x0 = jnp.zeros((8, T), jnp.uint32)
    x0 = x0.at[:4, :B].set(states.astype(jnp.uint32).T)
    tabT = jnp.zeros((A2p, T), jnp.int32)
    tabT = tabT.at[:A2, :B].set(
        packed.reshape(B, A2).astype(jnp.int32).T)
    alT = jnp.zeros((Ap, T), jnp.int32)
    alT = alT.at[:A, :B].set(alpha.astype(jnp.int32).T)
    return x0, tabT, alT


def _words_T(words, W, T):
    """(B, w) u16 -> (W, T) u16 transposed/padded word stream."""
    B, w = words.shape
    out = jnp.zeros((T, W), jnp.uint16)
    out = out.at[:B, :min(w, W)].set(
        words[:, :W].astype(jnp.uint16))
    return out.T


@functools.partial(jax.jit, static_argnames=("shift", "q", "K", "N",
                                             "order", "A", "W",
                                             "interpret"))
def _dec_pallas_to_bytes(states, words, packed, alpha, shift: int,
                         q: int, K: int, N: int, order: int, A: int,
                         W: int, interpret: bool = False):
    """Full tile decode: prep + kernel + byte reassembly.

    states (B,4) u32, words (B,w) u16, packed (B,A,A)/(B,A) i32,
    alpha (B,A) u8.  Returns (B, N) u8.
    """
    B = states.shape[0]
    T = max(128, -(-B // 128) * 128)
    x0, tabT, alT = _prep_tile(states, packed, alpha, T)
    wT = _words_T(words, W, T)
    out = _dec_tile(x0, wT, tabT, alT, A, shift, q, K, order, interpret)
    by = out[:4 * K, :B].reshape(K, 4, B)
    by = jnp.transpose(by, (2, 0, 1))                     # (B, K, 4)
    if order == 1:
        main = jnp.transpose(by[:, :q, :], (0, 2, 1)).reshape(B, 4 * q)
        if 4 * q >= N:
            return main[:, :N]
        tailp = by[:, q:, 3]
        return jnp.concatenate([main, tailp[:, :N - 4 * q]], axis=1)
    flat = by.reshape(B, K * 4)
    return flat[:, :N]


def _dec_batch(states, words, out_sz, alpha, packed, shift, order,
               tile):
    from . import rans_v2
    B = states.shape[0]
    A = alpha.shape[1]
    if order:
        q = out_sz >> 2
        K = q + (out_sz - 4 * q)
    else:
        q = K = -(-out_sz // 4)
    W = _w_bucket(words.shape[1])
    if W is None or out_sz < 4:
        f = rans_v2.dec_o1_batch if order else rans_v2.dec_o0_batch
        return f(states, words, out_sz, alpha, packed, shift)
    if W > 4096:
        tile = min(tile, 256)      # VMEM: words u16 + mid scratch
    interpret = not _on_tpu()
    outs = []
    for t0 in range(0, B, tile):
        t1 = min(t0 + tile, B)
        out = _dec_pallas_to_bytes(
            jnp.asarray(states[t0:t1].astype(np.uint32)),
            jnp.asarray(words[t0:t1]),
            jnp.asarray(packed[t0:t1]), jnp.asarray(alpha[t0:t1]),
            shift, q, K, out_sz, order, A, W, interpret)
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=0)


def dec_o1_batch(states, words, out_sz: int, alpha, packed, shift: int,
                 tile: int = 512):
    """Batched order-1 decode via the Pallas kernel (v2-engine fallback
    for streams wider than the largest VMEM bucket).  Same contract as
    rans_v2.dec_o1_batch."""
    return _dec_batch(states, words, out_sz, alpha, packed, shift, 1,
                      tile)


def dec_o0_batch(states, words, out_sz: int, alpha, packed,
                 shift: int = 12, tile: int = 512):
    return _dec_batch(states, words, out_sz, alpha, packed, shift, 0,
                      tile)


# ---------------------------------------------------------------------------
# Encode kernel

def _enc_kernel_body(A: int, T: int, shift: int, K: int, order: int,
                     tail: int, pad: int, KO: int):
    """Encode kernel for one (A, T, shift, K, order, tail/pad) shape.

    Refs (in order):
      sym_ref  (PER*4, T) u8  dense symbol at processing step s, lane j
                              (row 4s+j; lanes already state-3-first
                              for order 1, as in rans_v2._enc_scan_v2)
      ctx_ref  (PER*4, T) u8  dense context (order 1)
      tab_ref  (A2p, T) i32   packed (start<<13|freq), row = ctx*A+sym
      word_ref (PER*4, T) u16 emitted renorm word per step/lane
      emit_ref (PER*4, T) u8  1 if the word was emitted
      x_ref    (8, T) u32     final states (rows 0..3, processing lanes)
      scratch: xs (8, T) u32

    State maths matches rANS_word.h:281-321 (RansEncPutSymbol).
    """
    A2 = A * A if order == 1 else A
    A2p = max(8, -(-A2 // 8) * 8)

    def kernel(sym_ref, ctx_ref, tab_ref, word_ref, emit_ref, x_ref, xs):
        ko = pl.program_id(0)

        @pl.when(ko == 0)
        def _init():
            xs[:] = jnp.full((8, T), RANS_L, jnp.uint32)

        tab = tab_ref[:]
        kiota = jax.lax.broadcasted_iota(jnp.int32, (A2p, T), 0)
        xmax_mult = jnp.uint32((RANS_L >> shift) << 16)

        X4 = xs[:4, :]
        X = [X4[l] for l in range(4)]
        # read whole u8 blocks once; sub-tile ref slices of u8 crash
        # the Mosaic layout pass on this toolchain
        sy_all = sym_ref[:].astype(jnp.int32)
        cx_all = ctx_ref[:].astype(jnp.int32) if order == 1 else None
        wrows, erows = [], []
        for s4 in range(PER):
            g = ko * PER + s4
            sy4 = sy_all[4 * s4:4 * s4 + 4]
            if order == 1:
                cx4 = cx_all[4 * s4:4 * s4 + 4]
            for j in range(4):
                if order == 1:
                    # lane j=0 is state 3: tail steps use it alone
                    ok = (g < K) & ((g >= tail) | (j == 0))
                    key = cx4[j] * A + sy4[j]
                else:
                    ok = (g < K) & ((g > 0) | (j >= pad))
                    key = sy4[j]
                mk = kiota == key[None, :]
                val = jnp.max(jnp.where(mk, tab, 0), axis=0)
                start = (val >> PACK_SHIFT).astype(jnp.uint32)
                f = (val & PACK_MASK).astype(jnp.uint32)
                # unsigned max doesn't legalize in Mosaic; do it signed
                f_s = jnp.maximum(val & PACK_MASK, 1).astype(jnp.uint32)
                x = X[j]
                emit = (x >= xmax_mult * f) & ok
                wrows.append(
                    (x & jnp.uint32(0xFFFF)).astype(jnp.uint16)[None, :])
                # bool -> u8 casts crash the Mosaic layout pass on
                # this toolchain; go through i32
                erows.append(emit.astype(jnp.int32)[None, :])
                x2 = jnp.where(emit, x >> 16, x)
                qq = x2 // f_s
                xn = (qq << shift) + (x2 - qq * f_s) + start
                X[j] = jnp.where(ok, xn, x)

        word_ref[:] = jnp.concatenate(wrows, axis=0)
        emit_ref[:] = jnp.concatenate(erows, axis=0).astype(jnp.uint8)
        xs[:4, :] = jnp.concatenate([x[None, :] for x in X], axis=0)

        @pl.when(ko == KO - 1)
        def _fin():
            x_ref[:] = xs[:]

    return kernel, A2p


@functools.partial(jax.jit, static_argnames=("A", "shift", "K", "order",
                                             "tail", "pad", "interpret"))
def _enc_tile(symg, ctxg, tab, A: int, shift: int, K: int, order: int,
              tail: int, pad: int, interpret: bool = False):
    """symg/ctxg (KO*PER*4, T) u8; tab (A2p, T) i32.
    Returns (words (KO*PER*4, T) u16, emits (..) u8, states (8,T) u32)."""
    T = symg.shape[1]
    KO = symg.shape[0] // (PER * 4)
    kernel, A2p = _enc_kernel_body(A, T, shift, K, order, tail, pad, KO)
    words, emits, xf = pl.pallas_call(
        kernel,
        grid=(KO,),
        in_specs=[
            pl.BlockSpec((PER * 4, T), lambda ko: (ko, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PER * 4, T), lambda ko: (ko, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A2p, T), lambda ko: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((PER * 4, T), lambda ko: (ko, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PER * 4, T), lambda ko: (ko, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, T), lambda ko: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((KO * PER * 4, T), jnp.uint16),
            jax.ShapeDtypeStruct((KO * PER * 4, T), jnp.uint8),
            jax.ShapeDtypeStruct((8, T), jnp.uint32),
        ),
        scratch_shapes=[pltpu.VMEM((8, T), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(symg, ctxg, tab)
    return words, emits, xf


@functools.partial(jax.jit, static_argnames=("shift", "order", "seg_cap",
                                             "interpret"))
def _enc_pallas(blocks, alpha, packed, shift: int, order: int,
                seg_cap: int = None, interpret: bool = False):
    """Pallas encode: v2 prologue (densify + processing-order grids),
    kernel scan, v2 sort compaction.  Same contract as
    rans_v2._enc_scan_v2: returns (states (B,4) u32 lane 0..3,
    words (B, cap) u16 forward order, counts (B,), overflow)."""
    from . import rans_v2
    if seg_cap is None:
        seg_cap = rans_v2.SEG_CAP
    B, N = blocks.shape
    A = alpha.shape[1]
    T = max(128, -(-B // 128) * 128)
    dense = rans_v2._densify(blocks, alpha)

    if order == 1:
        q = N >> 2
        tail = N - 4 * q
        K = tail + q
        pad = 0
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
        sym_p = jnp.concatenate(parts_s, axis=0)[:, :, ::-1]
        ctx_p = jnp.concatenate(parts_c, axis=0)[:, :, ::-1]
    else:
        K = -(-N // 4)
        pad = K * 4 - N
        tail = 0
        dpad = jnp.pad(dense, ((0, 0), (0, pad)))
        sy = dpad.reshape(B, K, 4)
        sym_p = jnp.transpose(sy, (1, 0, 2))[::-1, :, ::-1]
        if pad:
            vlast = jnp.zeros((4,), bool).at[4 - pad:].set(True)
            sym_p = sym_p.at[0].set(
                jnp.where(vlast[::-1][None, :], 0, sym_p[0]))
        ctx_p = jnp.zeros_like(sym_p)

    KO = -(-K // PER)
    rows = KO * PER * 4
    symg = jnp.zeros((rows, T), jnp.uint8)
    symg = symg.at[:K * 4, :B].set(
        jnp.transpose(sym_p, (0, 2, 1)).reshape(K * 4, B).astype(jnp.uint8))
    ctxg = jnp.zeros((rows, T), jnp.uint8)
    ctxg = ctxg.at[:K * 4, :B].set(
        jnp.transpose(ctx_p, (0, 2, 1)).reshape(K * 4, B).astype(jnp.uint8))
    A2 = A * A if order == 1 else A
    A2p = max(8, -(-A2 // 8) * 8)
    tabT = jnp.zeros((A2p, T), jnp.int32)
    tabT = tabT.at[:A2, :B].set(
        packed.reshape(B, A2).astype(jnp.int32).T)

    words_g, emits_g, xf = _enc_tile(symg, ctxg, tabT, A, shift, K,
                                     order, tail, pad, interpret)

    # forward order = reverse of processing order (steps and lanes)
    wg = words_g[:K * 4, :B].reshape(K, 4, B)[::-1, ::-1, :]
    eg = emits_g[:K * 4, :B].reshape(K, 4, B)[::-1, ::-1, :]
    w = jnp.transpose(wg, (2, 0, 1)).reshape(B, K * 4)
    e = jnp.transpose(eg, (2, 0, 1)).reshape(B, K * 4) != 0
    w, e = lax.optimization_barrier((w, e))
    out, n, overflow = rans_v2._compact(w, e, seg_cap)
    states = xf[:4, :B].T[:, ::-1]
    return states, out, n, overflow


def _enc_batch(blocks, alpha, packed, shift, order, tile):
    from . import rans_v2
    B = blocks.shape[0]
    interpret = not _on_tpu()
    sts, ws, ns = [], [], []
    cap = 0
    for t0 in range(0, B, tile):
        t1 = min(t0 + tile, B)
        st, w, n, ovf = _enc_pallas(
            jnp.asarray(blocks[t0:t1]), jnp.asarray(alpha[t0:t1]),
            jnp.asarray(packed[t0:t1]), shift, order,
            interpret=interpret)
        if bool(np.asarray(ovf)):
            st, w, n, _ = _enc_pallas(
                jnp.asarray(blocks[t0:t1]), jnp.asarray(alpha[t0:t1]),
                jnp.asarray(packed[t0:t1]), shift, order,
                seg_cap=rans_v2.SEG, interpret=interpret)
        sts.append(np.asarray(st)); ws.append(np.asarray(w))
        ns.append(np.asarray(n))
        cap = max(cap, ws[-1].shape[1])
    ws = [np.pad(w, ((0, 0), (0, cap - w.shape[1]))) for w in ws]
    return (np.concatenate(sts), np.concatenate(ws),
            np.concatenate(ns))


def enc_o1_batch(blocks, alpha, packed, shift: int, tile: int = 1024):
    """Batched order-1 encode via the Pallas kernel.  Same contract as
    rans_v2.enc_o1_batch."""
    return _enc_batch(blocks, alpha, packed, shift, 1, tile)


def enc_o0_batch(blocks, alpha, packed, shift: int = 12,
                 tile: int = 1024):
    return _enc_batch(blocks, alpha, packed, shift, 0, tile)
