"""Pallas VMEM-resident rANS 4x16 decode engine (v4, round 3).

Why this exists: the XLA scan engines (ops/rans_v2.py) re-read the
dense symbol tables from HBM on EVERY decode step — at A=48, B=12288
that is 57.8 MB/step even in the u16 'b16' format, and the measured
wall is exactly that stream (docs/PERF_NOTES.md round-3: 384 GB/s
achieved, table traffic + one-hot contraction co-dominant).  An XLA
scan cannot pin the tables on-chip; a Pallas kernel can.  This kernel
keeps, per 128-block tile, the whole word stream, the symbol tables
and the decoder state resident in VMEM across the entire symbol loop,
so the per-step HBM traffic drops to (amortised) zero and the step
cost is pure VPU work.

Design notes (constraints from docs/PERF_NOTES.md measurements):

- **Lane-major folded layout**: working vectors live on a minor axis
  of 4*BT lanes indexed ``l*BT + b``.  A ``(1, 4*BT)`` <-> ``(4, BT)``
  reshape is contiguous, so the only cross-lane operation — the renorm
  word-claim prefix sum, which the format defines in lane order 0..3
  (rANS_word.h:356-410) — is three sublane adds on the ``(4, BT)``
  view.  No per-lane window replication is needed anywhere.
- **Pair-packed i32 tables**: the 'b16' monotone cumulative-base rows
  (rans_v2._b16_fill) are packed two entries per i32 as
  ``lo | (hi << 13)`` (entries <= 4096 fit 13 bits — exact at any
  shift, unlike an f32 packing where tote=4096 in a hi slot overflows
  the 24-bit mantissa).  The one-hot context fetch is a where-chain
  over ceil((A+1)/2) packed rows — HALF the select work of the
  unpacked form — and the slot->symbol resolve runs directly on the
  packed pairs via the monotone-prefix property, never unpacking to
  full rows.
- **Windowed renorm from VMEM**: a (W/2, BT) i32 window (2 words per
  entry) is re-selected from the resident word stream once per
  PER=CW/4 steps by a one-hot chain over CW-word-aligned anchors; the
  per-step claim is a (W/2, BT) masked max per lane plus a 16-bit
  extract.  Same overlapped-window trick as rans_v2's 'w128', but the
  refill reads VMEM, not HBM.
- **Packed IO**: decoded bytes leave 4-per-u32 per lane (one (4, BT)
  store every 4 steps); the dense->byte map is a where-chain over
  ceil(A/4) rows of 4-byte-packed alphabet entries.  XLA unpacks
  after the kernel.

State-transition maths is bit-identical to ``rANS_word.h``
(reference: htscodecs/rANS_word.h:281-321,356-410; L = 1<<15, 16-bit
renorm); the 4-quarter order-1 layout and lane-3 tail mirror
htscodecs/rANS_static4x16pr.c:1024-1114.  Byte-exactness is asserted
against the v2 engines and the C oracles in tests/test_rans_vmem.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rans_v2

RANS_L = 1 << 15
BT = 128          # blocks per tile (minor dim = 128 VPU lanes)
CW = 128          # window anchor granularity (words)
W = 2 * CW        # renorm window width (words)
CW2 = CW // 2     # i32 rows per anchor (2 words per row)
W2 = W // 2       # i32 rows per window
PER = CW // 4     # steps per window refill: off <= CW-1 + 4*PER < W
P4 = PER // 4     # packed u32 output rows per grid step
PACK_B = 13       # bits per packed table entry (values <= 4096)
PACK_M = (1 << PACK_B) - 1
# words-per-block bucket granularity (caps jit variants; the whole
# stream lives in VMEM so NW also gates routing, see fits())
NW_STEP = 1024
# 32768 words = (NW/2+CW) i32 rows * BT * 4 B ~= 8.5 MB VMEM (of the
# ~16 MB/core v5e budget; tables add ~2.5 MB at A=48).  Round 4: was
# 24576, which silently dropped ratio>=0.75 payloads (64 KiB blocks
# compressing worse than ~0.75 but not badly enough to CAT) onto the
# 3x-slower XLA scan — the VERDICT r3 "compressibility cliff".
NW_MAX = 32768


def _cdiv(a, b):
    return -(-a // b)


def _vmem_est(A: int, n_words: int, bt: int) -> int:
    NW = _cdiv(n_words, NW_STEP) * NW_STEP
    words_b = (_cdiv(NW, CW) * CW2 + W2) * bt * 4
    tbl_b = A * _cdiv(A + 1, 2) * bt * 4      # deduped: 1 copy/block
    return words_b + tbl_b


def pick_bt(A: int, n_words: int) -> int:
    """Blocks-per-tile for the decode kernel, or 0 if no tile fits.

    The decode kernel holds the word stream ((NW/2+CW) i32 rows x bt
    lanes) AND the pair-packed tables (A x ceil((A+1)/2) x bt i32, one
    copy per block since round 5's lane-group dedup) resident per
    tile; Mosaic rejects the kernel when their sum tops the per-core
    budget.  Measured boundary on the chip (round-5 bisect, NC2=200
    long-stream cases): est 6.90 MB compiles byte-exact, est 7.61 MB
    HTTP-500s — the gap to the ~16 MB/core budget is Pallas's grid
    double-buffering of the words tile plus kernel scratch.  Long
    refill chains are NOT the limit (NC2=200 compiles fine at A<=48).
    bt must stay 128: Pallas requires the last block dim to be
    128-divisible (a bt=64 tile is rejected outright — probed round
    5, docs/ubench_uni64_r5.py)."""
    if A > rans_v2.MAX_DENSE_A or n_words > NW_MAX:
        return 0
    if _vmem_est(A, n_words, BT) <= int(6.95 * 2**20):
        return BT
    return 0


def fits(A: int, n_words: int) -> bool:
    """True when some decode tile geometry fits the VMEM budget."""
    return pick_bt(A, n_words) != 0


# ---------------------------------------------------------------------------
# Kernel builder


def _build_kernel(A: int, NP: int, AP: int, NC2: int, q: int, K: int,
                  order: int, bt: int = BT):
    """One (alphabet, stream-bucket, block-geometry) kernel.

    Refs:
      x0_ref    (4, bt) u32     initial states (lane rows)
      sh_ref    (1, 4, bt) i32  per-block shift, lane-tiled
      words_ref (NWp2, bt) i32  word stream: 2 u16 words per entry,
                transposed, padded
      tbl_ref   (Ac, NP, bt) i32  pair-packed cumulative bases, one
                copy per block (Ac = A for order 1, 1 for order 0);
                the 4 rANS lanes of a block share one table, so the
                where-chain runs per lane group on (NP, bt) tiles —
                the same select count as a replicated (NP, 4*bt)
                chain at 1/4 the VMEM residency
      alpha_ref (AP, 4, bt) i32 dense index -> byte, 4 bytes per entry
      out_ref   (P4, 4, bt) u32 4 decoded bytes per entry (LE by step)
      xs/pq/cx  scratch: states (1,4bt) u32 / word ptr (1,bt) i32 /
                context (1,4bt) i32

    ``bt`` is the blocks-per-tile geometry from pick_bt(): 128 fills
    one block per VPU lane; 64 halves the resident stream+tables for
    big (A, NW) combos (the folded 4*bt minor still fills 256 lanes).
    """
    M = 4 * bt

    def kernel(x0_ref, sh_ref, words_ref, tbl_ref, alpha_ref, out_ref,
               xs, pq, cx):
        L = jnp.uint32(RANS_L)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            xs[:] = x0_ref[:].reshape(1, M)
            pq[:] = jnp.zeros((1, bt), jnp.int32)
            cx[:] = jnp.zeros((1, M), jnp.int32)

        shr = sh_ref[:].reshape(1, M).astype(jnp.uint32)
        mask = (jnp.uint32(1) << shr) - 1
        # lane-3 mask in the folded minor (l*bt + b)
        lane3 = lax.broadcasted_iota(jnp.int32, (1, M), 1) >= 3 * bt

        # ---- window refill: one-hot chain over CW-word anchors ----
        p = pq[:]                                        # (1, bt) i32
        c0 = jnp.minimum(p // CW, NC2 - 1)               # (1, bt)
        win = words_ref[(NC2 - 1) * CW2:(NC2 - 1) * CW2 + W2, :]
        for r in range(NC2 - 1):
            seg = words_ref[r * CW2:r * CW2 + W2, :]
            win = jnp.where(c0 == r, seg, win)
        base = c0 * CW                                   # (1, bt) words

        Ac = tbl_ref.shape[0]
        tbl = tbl_ref[:]                                 # (Ac, NP, bt)
        alpha = alpha_ref[:].reshape(AP, M)

        iota_np = lax.broadcasted_iota(jnp.int32, (NP, M), 0)
        lo_idx = 2 * iota_np                             # pair -> entry
        hi_idx = 2 * iota_np + 1
        iota_w = lax.broadcasted_iota(jnp.int32, (W2, bt), 0)
        BIG = jnp.int32(1 << 25)

        def step(u, X, ctx, p, acc):
            s = j * PER + u
            if order == 1:
                act = (s < q) | (lane3 & (s < K))
            else:
                act = jnp.broadcast_to(s < K, (1, M))
            m = (X & mask).astype(jnp.int32)             # (1, M)

            # ---- context row fetch: where-chain over packed pairs,
            # per lane group (the groups share the per-block table) ----
            if order == 1:
                ctx4 = ctx.reshape(4, bt)
                rows = []
                for l in range(4):
                    cl = ctx4[l:l + 1]                   # (1, bt)
                    rl = tbl[A - 1]                      # (NP, bt)
                    for a in range(A - 2, -1, -1):
                        rl = jnp.where(cl == a, tbl[a], rl)
                    rows.append(rl)
                row = jnp.concatenate(rows, axis=1)      # (NP, M)
            else:
                row = jnp.concatenate([tbl[0]] * 4, axis=1)
            lo = row & PACK_M
            hi = row >> PACK_B

            # ---- slot -> symbol resolve on the packed pairs ----
            # entries are monotone nondecreasing; symd = max index k<A
            # with base[k] <= m.  Entry A (the appended 1<<shift
            # column) and the zero pad at A+1 are excluded by the
            # index guards.
            ok_lo = (lo <= m) & (lo_idx < A)
            ok_hi = (hi <= m) & (hi_idx < A)
            symd = jnp.maximum(
                jnp.max(jnp.where(ok_lo, lo_idx, 0), axis=0, keepdims=True),
                jnp.max(jnp.where(ok_hi, hi_idx, 0), axis=0, keepdims=True))
            b = jnp.maximum(
                jnp.max(jnp.where(ok_lo, lo, 0), axis=0, keepdims=True),
                jnp.max(jnp.where(ok_hi, hi, 0), axis=0, keepdims=True))
            # freq = successor base - base; successor entries of a
            # decodable symbol are strictly greater (see _b16_fill);
            # the pad entry (index A+1, value 0) is guarded out
            gt_lo = lo_idx > symd                        # lo_idx <= A
            gt_hi = (hi_idx > symd) & (hi_idx <= A)
            nxt = jnp.minimum(
                jnp.min(jnp.where(gt_lo, lo, BIG), axis=0, keepdims=True),
                jnp.min(jnp.where(gt_hi, hi, BIG), axis=0, keepdims=True))
            bu = b.astype(jnp.uint32)
            fu = (nxt - b).astype(jnp.uint32)

            # ---- state advance + renorm word claim ----
            Xn = fu * (X >> shr) + m.astype(jnp.uint32) - bu
            need = (Xn < L) & act
            ni = need.astype(jnp.int32).reshape(4, bt)
            e1 = ni[0:1]
            e2 = e1 + ni[1:2]
            e3 = e2 + ni[2:3]
            tot = e3 + ni[3:4]                           # (1, bt)
            excl = jnp.concatenate(
                [jnp.zeros((1, bt), jnp.int32), e1, e2, e3], axis=0)
            offb = (p - base) + excl                     # (4, bt) words
            sel = jnp.where(ni > 0, offb, 2 * W)
            wrows = []
            for l in range(4):
                s2 = sel[l:l + 1, :]
                ohw = iota_w == (s2 >> 1)                # (W2, bt)
                # one-hot SUM, not max: the packed entry is negative
                # when the high word has bit 15 set
                pick = jnp.sum(jnp.where(ohw, win, 0),
                               axis=0, keepdims=True)
                wrows.append((pick >> (16 * (s2 & 1))) & 0xFFFF)
            wv = jnp.concatenate(wrows, axis=0).reshape(1, M)
            Xn = jnp.where(need,
                           (Xn << 16) | wv.astype(jnp.uint32), Xn)
            X = jnp.where(act, Xn, X)
            p = p + tot
            ctx = jnp.where(act, symd, ctx)

            # ---- byte output: packed-alpha fetch, 4 steps per u32 ----
            grp = symd >> 2
            ap = alpha[0:1, :]
            for g in range(1, AP):
                ap = jnp.where(grp == g, alpha[g:g + 1, :], ap)
            byte = (ap >> (8 * (symd & 3))) & 0xFF
            acc = acc | (byte.astype(jnp.uint32) << (8 * (u % 4)))
            return X, ctx, p, acc

        X = xs[:]
        ctx = cx[:]
        p = pq[:]
        for r4 in range(P4):
            acc = jnp.zeros((1, M), jnp.uint32)
            for k in range(4):
                X, ctx, p, acc = step(r4 * 4 + k, X, ctx, p, acc)
            out_ref[r4] = acc.reshape(4, bt)
        xs[:] = X
        cx[:] = ctx
        pq[:] = p

    return kernel


# ---------------------------------------------------------------------------
# XLA wrapper: table prep -> Pallas scan -> unpack


@functools.partial(
    jax.jit,
    static_argnames=("A", "NC2", "q", "K", "N", "order", "bt",
                     "interpret"))
def _dec_vmem(statesT, words, packed, alphaT, shiftv,
              A: int, NC2: int, q: int, K: int, N: int, order: int,
              bt: int = BT, interpret: bool = False):
    """statesT (4, B) u32; words (B, Wd) u16; packed (B,A,A) i32
    (order-0 (B,A)); alphaT (A, B) u8; shiftv (B,) i32.
    Returns (B, N) u8.  ``bt`` = blocks per tile (pick_bt)."""
    B = statesT.shape[1]
    NB = B // bt
    M = 4 * bt
    KO = _cdiv(K, PER)
    NWp2 = NC2 * CW2 + W2

    # pair-packed i32 tables from the b16 monotone fill, lane-tiled
    bfe = rans_v2._b16_fill(
        packed if order == 1 else packed[:, None, :], shiftv)
    Ac = bfe.shape[1]
    A1 = A + 1
    NP = _cdiv(A1, 2)
    pad = 2 * NP - A1
    if pad:
        bfe = jnp.concatenate(
            [bfe, jnp.zeros((B, Ac, pad), jnp.int32)], axis=2)
    pairs = bfe.reshape(B, Ac, NP, 2)
    tbl = pairs[..., 0] | (pairs[..., 1] << PACK_B)      # (B, Ac, NP)
    # (Ac, NP, B): one copy per block — the kernel fetches per lane
    # group; the block axis must stay the rightmost dim so BlockSpec
    # tiling picks whole lanes per tile
    tbl = jnp.transpose(tbl, (1, 2, 0))

    # word stream: 2 u16 per i32 row, transposed, padded
    Wd = words.shape[1]
    wp = jnp.zeros((B, 2 * NWp2), jnp.int32)
    wp = wp.at[:, :Wd].set(words.astype(jnp.int32))
    w2 = wp[:, 0::2] | (wp[:, 1::2] << 16)               # (B, NWp2)
    wordsP = jnp.transpose(w2, (1, 0))

    sh3 = jnp.broadcast_to(shiftv.astype(jnp.int32)[None, None, :],
                           (1, 4, B))
    # alphabet bytes packed 4 per i32, lane-tiled
    AP = _cdiv(A, 4)
    alw = jnp.zeros((4 * AP, B), jnp.int32)
    alw = alw.at[:A].set(alphaT.astype(jnp.int32))
    al4 = alw.reshape(AP, 4, B)
    alP = (al4[:, 0] | (al4[:, 1] << 8) | (al4[:, 2] << 16)
           | (al4[:, 3] << 24))                          # (AP, B)
    alP = jnp.broadcast_to(alP[:, None, :], (AP, 4, B))

    kern = _build_kernel(A, NP, AP, NC2, q, K, order, bt)
    out = pl.pallas_call(
        kern,
        grid=(NB, KO),
        in_specs=[
            pl.BlockSpec((4, bt), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, bt), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NWp2, bt), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ac, NP, bt), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((AP, 4, bt), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P4, 4, bt), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KO * P4, 4, B), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((1, M), jnp.uint32),
            pltpu.VMEM((1, bt), jnp.int32),
            pltpu.VMEM((1, M), jnp.int32),
        ],
        interpret=interpret,
    )(statesT, sh3, wordsP, tbl, alP)

    # unpack 4 bytes/u32 -> (K', 4, B) byte matrix in step order
    ks = [((out >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(4)]
    byts = jnp.stack(ks, axis=1).reshape(KO * PER, 4, B)
    if order == 1:
        main = jnp.transpose(byts[:q], (2, 1, 0)).reshape(B, 4 * q)
        if 4 * q >= N:
            return main[:, :N]
        tailp = jnp.transpose(byts[q:K, 3, :], (1, 0))
        return jnp.concatenate([main, tailp[:, :N - 4 * q]], axis=1)
    flat = jnp.transpose(byts[:K], (2, 0, 1)).reshape(B, K * 4)
    return flat[:, :N]


# ---------------------------------------------------------------------------
# Batch entry points (same signature family as rans_v2.dec_o*_batch)


def _prep(states, words, alpha, packed, shift):
    states, words, alpha, packed, B = rans_v2._pad128(
        np.asarray(states), np.asarray(words),
        np.asarray(alpha), np.asarray(packed))
    Bp = states.shape[0]
    if isinstance(shift, (int, np.integer)):
        shiftv = np.full((Bp,), int(shift), np.int32)
    else:
        shiftv = np.zeros((Bp,), np.int32)
        sa = np.asarray(shift, np.int32)
        shiftv[:len(sa)] = sa
        shiftv[len(sa):] = sa[0] if len(sa) else 12
    NC2 = max(_cdiv(_cdiv(words.shape[1], NW_STEP) * NW_STEP, CW), 1)
    return states, words, alpha, packed, shiftv, B, NC2


def dec_o1_batch(states, words, out_sz: int, alpha, packed, shift,
                 interpret: bool = False):
    """Batched order-1 decode, VMEM engine.  Mirrors
    rans_v2.dec_o1_batch; ``shift`` may be an int or a (B,) vector."""
    q = out_sz >> 2
    K = q + (out_sz - 4 * q)
    nw = int(np.asarray(words).shape[1])
    states, words, alpha, packed, shiftv, B, NC2 = _prep(
        states, words, alpha, packed, shift)
    bt = pick_bt(packed.shape[1], nw) or BT
    out = _dec_vmem(
        jnp.asarray(states.astype(np.uint32).T),
        jnp.asarray(words.astype(np.uint16)),
        jnp.asarray(packed), jnp.asarray(alpha.T), jnp.asarray(shiftv),
        packed.shape[1], NC2, q, K, out_sz, 1, bt=bt,
        interpret=interpret)
    return np.asarray(out)[:B]


def dec_o0_batch(states, words, out_sz: int, alpha, packed,
                 shift=12, interpret: bool = False):
    q = -(-out_sz // 4)
    nw = int(np.asarray(words).shape[1])
    states, words, alpha, packed, shiftv, B, NC2 = _prep(
        states, words, alpha, packed, shift)
    bt = pick_bt(packed.shape[1], nw) or BT
    out = _dec_vmem(
        jnp.asarray(states.astype(np.uint32).T),
        jnp.asarray(words.astype(np.uint16)),
        jnp.asarray(packed), jnp.asarray(alpha.T), jnp.asarray(shiftv),
        packed.shape[1], NC2, q, q, out_sz, 0, bt=bt,
        interpret=interpret)
    return np.asarray(out)[:B]


def _div_u32_small(x2, fs):
    """Exact unsigned ``x2 // fs`` for x2 < 2^31, 1 <= fs <= 4096.

    Mosaic's native u32 vector division measures ~0.35 s per q40
    encode pass (~20% of the kernel); this two-stage f32-reciprocal
    form with integer fixups is ~4x cheaper.  Each stage divides a
    value < 2^23 (exactly representable in f32), so the f32 quotient
    is within ~1 ulp of truth even with a sloppy hardware reciprocal;
    TWO fixup rounds make the result exact for |error| <= 2.  Byte-
    exactness is asserted on real hardware (interpret-mode tests use
    XLA's correctly-rounded CPU ops and could mask a divergence)."""
    f_i = fs.astype(jnp.int32)           # (u32 -> f32 casts are not
    rf = 1.0 / f_i.astype(jnp.float32)   # lowerable; go via i32)

    def _small_div(v):                   # v i32, 0 <= v < 2^23
        q = (v.astype(jnp.float32) * rf).astype(jnp.int32)
        r = v - q * f_i
        for _ in range(2):
            under = r < 0
            q = jnp.where(under, q - 1, q)
            r = jnp.where(under, r + f_i, r)
            over = r >= f_i
            q = jnp.where(over, q + 1, q)
            r = jnp.where(over, r - f_i, r)
        return q, r

    a = (x2 >> 11).astype(jnp.int32)     # < 2^20
    b = (x2 & jnp.uint32(0x7FF)).astype(jnp.int32)
    qa, ra = _small_div(a)
    qb, _rb = _small_div((ra << 11) + b)  # < f*2^11 <= 2^23
    return ((qa << 11) + qb).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# Encode kernel: tables resident in VMEM, processing-order symbol and
# context streams flowing through per-grid-step blocks, the emitted
# words flowing out segment-locally compacted; only the global
# placement sort stays in XLA.
#
# Round 4 adds a PREFETCHED variant: unlike decode, the encoder's
# (ctx, sym) sequence is an INPUT, not state — so the (start, freq)
# table fetch that dominates the wide-alphabet step (the A-deep
# where-chain over (NP, M) pair rows) can be hoisted out of the
# sequential scan entirely.  A separate fetch kernel serves every
# query with tpu.dynamic_gather lane-gathers over the table
# TRANSPOSED (blocks on sublane rows, table entries on lanes, 128
# entries per gather chunk; Mosaic supports lane-gathers on (T, 128)
# operands only — "multiple source vregs along gather dimension" is
# rejected, see docs/ubench_gather_r4.py).  The scan kernel then
# streams one packed i32 (start | freq<<12) per symbol from HBM —
# ~4 B/symbol of extra traffic (a few ms at HBM speed) in exchange
# for removing the O(A*NP) per-step select work.

PER_E = 32        # encode steps per grid step (chain kernel)
PER_E_PF = 32     # prefetched-kernel steps/grid step (64/128 measured
                  # SLOWER: placement one-hot scales with capk)
FETCH_RB = 32     # blocks (sublane rows) per fetch-kernel grid step
FETCH_QB = 2048   # queries per fetch-kernel grid step (128-multiple)


def _build_fetch_kernel(Cn: int, QB: int):
    """sf-table fetch: out[b, k] = tbl[b, idx[b, k]].

    Refs:
      tbl_ref (RB, Cn*128) i32  flat per-block sf tables (start|freq<<12)
      idx_ref (RB, QB) i32      flat query indices (< Cn*128)
      out_ref (RB, QB) i32
    Each 128-lane chunk of the table is one lane-gather operand; a
    select chain over the Cn chunks (by idx>>7) combines them.
    """

    def kernel(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]
        for g in range(QB // 128):
            q = idx_ref[:, 128 * g:128 * (g + 1)]
            ql = q & 127
            qh = q >> 7
            res = jnp.take_along_axis(tbl[:, 0:128], ql, axis=1)
            for c in range(1, Cn):
                gc = jnp.take_along_axis(
                    tbl[:, 128 * c:128 * (c + 1)], ql, axis=1)
                res = jnp.where(qh == c, gc, res)
            out_ref[:, 128 * g:128 * (g + 1)] = res

    return kernel


def _sf_fetch(sff, qidxT, Cn: int, interpret: bool = False):
    """(B, Cn*128) i32 tables + (B, KQ) i32 queries -> (B, KQ) i32."""
    B, KQ = qidxT.shape
    kern = _build_fetch_kernel(Cn, FETCH_QB)
    return pl.pallas_call(
        kern,
        grid=(B // FETCH_RB, KQ // FETCH_QB),
        in_specs=[
            pl.BlockSpec((FETCH_RB, Cn * 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FETCH_RB, FETCH_QB), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FETCH_RB, FETCH_QB), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, KQ), jnp.int32),
        interpret=interpret,
    )(sff, qidxT)


def _build_enc_kernel_pf(K: int, geom: int, order: int, capk: int,
                         per_e: int = PER_E):
    """Prefetched-table encode scan: the only per-symbol input is the
    packed (start | freq<<12) i32 stream; no tables, no where-chain.

    ``per_e`` steps per grid step: without the A-deep chain the body
    is small enough to unroll 128 steps, which shrinks the global
    stitch (KO*capk rows) and the per-grid-step overhead ~4x.

    Refs:
      sf_ref   (per_e*4, BT) i32  prefetched start|freq<<12 per symbol
      sh_ref   (1, 4, BT) i32     per-block shift, lane-tiled
      wloc_ref / xf_ref / xs      as _build_enc_kernel
    """
    M = 4 * BT

    def kernel(sf_ref, sh_ref, wloc_ref, xf_ref, xs):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            xs[:] = jnp.full((1, M), RANS_L, jnp.uint32)

        shl = sh_ref[:].reshape(1, M).astype(jnp.uint32)
        xmult = (jnp.uint32(RANS_L) >> shl) << 16
        iota_m = lax.broadcasted_iota(jnp.int32, (1, M), 1)
        lane0 = iota_m < BT
        okpad = iota_m >= geom * BT          # order-0 first-step pad
        # NOTE (round-4 measured negative): pair-packing two u16 words
        # per i32 placement row (halving the one-hot height, rank p ->
        # row (capk-1-p)>>1 shifted by 16*(p&1)) measured SLOWER on
        # chip than this plain form — q40 0.881 -> 0.95 s with either
        # variable shifts or static-shift+select.  The placement
        # one-hot is not the bottleneck Mosaic op it looks like.
        iota_rev = capk - 1 - lax.broadcasted_iota(
            jnp.int32, (capk, BT), 0)

        X = xs[:]
        acc_loc = jnp.zeros((capk, BT), jnp.int32)
        cnt = jnp.zeros((1, BT), jnp.int32)
        for u in range(per_e):
            s = j * per_e + u
            if order == 1:
                ok = ((s >= geom) | lane0) & (s < K)
            else:
                ok = jnp.broadcast_to(s < K, (1, M))
                if geom:
                    ok = ok & ((s > 0) | okpad)
            sf = sf_ref[4 * u:4 * u + 4].reshape(1, M)
            start = (sf & 0xFFF).astype(jnp.uint32)
            f = ((sf >> 12) & 0x1FFF).astype(jnp.uint32)
            fs = jnp.where(ok, f, jnp.uint32(1))
            # ---- rANS_word.h encode step (byte-exact) ----
            emit = (X >= xmult * f) & ok
            word = X & jnp.uint32(0xFFFF)
            x2 = jnp.where(emit, X >> 16, X)
            qq = _div_u32_small(x2, fs)
            xn = (qq << shl) + (x2 - qq * fs) + start
            X = jnp.where(ok, xn, X)
            # ---- segment-local compaction (see _build_enc_kernel) ----
            e4 = emit.astype(jnp.int32).reshape(4, BT)
            w4 = word.astype(jnp.int32).reshape(4, BT)
            e1 = e4[0:1]
            e2 = e1 + e4[1:2]
            e3 = e2 + e4[2:3]
            excl = jnp.concatenate(
                [jnp.zeros((1, BT), jnp.int32), e1, e2, e3], axis=0)
            prank = cnt + excl                           # (4, BT)
            for l in range(4):
                hit = (iota_rev == prank[l:l + 1]) & (e4[l:l + 1] > 0)
                acc_loc = acc_loc + jnp.where(hit, w4[l:l + 1], 0)
            cnt = cnt + e3 + e4[3:4]
        wloc_ref[:] = jnp.concatenate(
            [acc_loc, cnt, jnp.zeros((7, BT), jnp.int32)],
            axis=0).astype(jnp.uint16)
        xf_ref[:] = X.reshape(4, BT)
        xs[:] = X

    return kernel


def _build_enc_kernel(A: int, NP: int, KO: int, K: int, geom: int,
                      order: int, capk: int):
    """Refs:
      sym_ref / ctx_ref (PER_E*4, BT) u8  processing-order streams
      sh_ref   (1, 4, BT) i32   per-block shift, lane-tiled
      tbl_ref  (Ac, NP, 4, BT) i32  pair-packed cumulative bases
      wloc_ref (capk+8, BT) u16  this grid step's emitted words,
               segment-locally compacted INTO FORWARD ORDER: emission
               rank p lands at row capk-1-p, so rows [capk-L, capk)
               hold the segment's L words already forward-ordered
               (forward = reverse of emission order; the XLA global
               stitch only places whole segments).  Row capk carries
               the segment's emission count (fits u16; a separate
               (1, BT) count block would violate Mosaic's 8-sublane
               block-shape rule); rows capk+1.. are zero padding.
      xf_ref   (4, BT) u32      final states (processing-lane rows)
      xs       scratch (1, 4*BT) u32
    """
    M = 4 * BT

    def kernel(sym_ref, ctx_ref, sh_ref, tbl_ref, wloc_ref,
               xf_ref, xs):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            xs[:] = jnp.full((1, M), RANS_L, jnp.uint32)

        shl = sh_ref[:].reshape(1, M).astype(jnp.uint32)
        xmult = (jnp.uint32(RANS_L) >> shl) << 16
        Ac = tbl_ref.shape[0]
        tbl = tbl_ref[:].reshape(Ac, NP, M)
        # streams are 2D (PER_E*4, BT) u8 — a 3D (PER_E, 4, BT) block
        # has a 4-wide sublane dim far below u8's 32-sublane tile
        # granularity, which Mosaic mis-tiles (compiled-only garbage;
        # interpret mode was exact)
        syms = sym_ref[:].astype(jnp.int32)
        ctxs = ctx_ref[:].astype(jnp.int32)
        # processing-lane index masks in the folded minor (l*BT + b)
        iota_m = lax.broadcasted_iota(jnp.int32, (1, M), 1)
        lane0 = iota_m < BT
        okpad = iota_m >= geom * BT          # order-0 first-step pad
        iota_rev = capk - 1 - lax.broadcasted_iota(
            jnp.int32, (capk, BT), 0)

        X = xs[:]
        acc_loc = jnp.zeros((capk, BT), jnp.int32)
        cnt = jnp.zeros((1, BT), jnp.int32)
        for u in range(PER_E):
            s = j * PER_E + u
            if order == 1:
                ok = ((s >= geom) | lane0) & (s < K)
            else:
                ok = jnp.broadcast_to(s < K, (1, M))
                if geom:
                    ok = ok & ((s > 0) | okpad)
            sym = jnp.where(ok, syms[4 * u:4 * u + 4].reshape(1, M), 0)
            # ---- table row by context, then the (sym, sym+1) pair ----
            if order == 1:
                ctx = ctxs[4 * u:4 * u + 4].reshape(1, M)
                row = tbl[A - 1]
                for a in range(A - 2, -1, -1):
                    row = jnp.where(ctx == a, tbl[a], row)
            else:
                row = tbl[0]
            g0 = sym >> 1
            g1 = (sym + 1) >> 1
            p0 = row[NP - 1:NP]
            p1 = row[NP - 1:NP]
            for g in range(NP - 2, -1, -1):
                rg = row[g:g + 1]
                p0 = jnp.where(g0 == g, rg, p0)
                p1 = jnp.where(g1 == g, rg, p1)
            e0 = jnp.where((sym & 1) == 1, p0 >> PACK_B, p0 & PACK_M)
            e1 = jnp.where((sym & 1) == 0, p1 >> PACK_B, p1 & PACK_M)
            start = e0.astype(jnp.uint32)
            f = (e1 - e0).astype(jnp.uint32)
            fs = jnp.where(ok, f, jnp.uint32(1))
            # ---- rANS_word.h encode step (byte-exact) ----
            emit = (X >= xmult * f) & ok
            word = X & jnp.uint32(0xFFFF)
            x2 = jnp.where(emit, X >> 16, X)
            qq = _div_u32_small(x2, fs)
            xn = (qq << shl) + (x2 - qq * fs) + start
            X = jnp.where(ok, xn, X)
            # ---- segment-local compaction: place emission rank p at
            # row capk-1-p (overflowing ranks drop; cnt still counts
            # them so the caller detects overflow and retries) ----
            e4 = emit.astype(jnp.int32).reshape(4, BT)
            w4 = word.astype(jnp.int32).reshape(4, BT)
            e1 = e4[0:1]
            e2 = e1 + e4[1:2]
            e3 = e2 + e4[2:3]
            excl = jnp.concatenate(
                [jnp.zeros((1, BT), jnp.int32), e1, e2, e3], axis=0)
            prank = cnt + excl                           # (4, BT)
            for l in range(4):
                hit = (iota_rev == prank[l:l + 1]) & (e4[l:l + 1] > 0)
                acc_loc = acc_loc + jnp.where(hit, w4[l:l + 1], 0)
            cnt = cnt + e3 + e4[3:4]
        wloc_ref[:] = jnp.concatenate(
            [acc_loc, cnt, jnp.zeros((7, BT), jnp.int32)],
            axis=0).astype(jnp.uint16)
        xf_ref[:] = X.reshape(4, BT)
        xs[:] = X

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("N", "order", "seg_cap", "prefetch", "per_e",
                     "interpret"))
def _enc_vmem(blocks, alpha, packed, shiftv, N: int, order: int,
              seg_cap: int, prefetch: bool = False, per_e: int = 0,
              interpret: bool = False):
    """VMEM-engine encode: same contract as rans_v2._enc_scan_v2_pb —
    returns (states (B,4) u32 lane order, words (B,cap) u16 forward,
    counts (B,) i32, overflow bool).  ``prefetch=True`` hoists the
    (start, freq) fetch into the lane-gather fetch kernel and runs the
    table-free scan (byte-identical output).  ``per_e`` overrides the
    steps-per-grid-step for the prefetched kernel (0 = default: 128
    prefetched, 32 chain — the chain body is too big to unroll 128)."""
    B = blocks.shape[0]
    NB = B // BT
    if per_e == 0 or not prefetch:
        per_e = PER_E_PF if prefetch else PER_E
    dense = rans_v2._densify(blocks, alpha)
    sym_p, ctx_p, _valid, K, geom = rans_v2._enc_proc_inputs(
        dense, N, order)
    KO = _cdiv(K, per_e)
    Kp = KO * per_e
    if Kp > K:
        z = jnp.zeros((Kp - K, 4, B), jnp.uint8)
        sym_p = jnp.concatenate([sym_p, z], axis=0)
        ctx_p = jnp.concatenate([ctx_p, z], axis=0)
    sym_p = sym_p.reshape(Kp * 4, B)
    ctx_p = ctx_p.reshape(Kp * 4, B)

    A = packed.shape[1]
    bfe = rans_v2._b16_fill(
        packed if order == 1 else packed[:, None, :], shiftv)
    Ac = bfe.shape[1]
    A1 = A + 1

    if prefetch:
        # ---- per-symbol (start | freq<<12) i32: start <= 4095 for any
        # freq>0 symbol (start+freq <= 1<<shift <= 4096); freq <= 4096
        # fits 13 bits.  freq-0 entries wrap start harmlessly — they
        # are never queried by an active lane, and inactive lanes are
        # masked by `ok` in the kernel exactly as the chain variant
        # masks its garbage row fetch. ----
        start_t = bfe[:, :, :A]
        freq_t = bfe[:, :, 1:A + 1] - start_t
        sff = (start_t | (freq_t << 12)).reshape(B, Ac * A)
        Cn = _cdiv(Ac * A, 128)
        padt = Cn * 128 - Ac * A
        if padt:
            sff = jnp.concatenate(
                [sff, jnp.zeros((B, padt), jnp.int32)], axis=1)
        if order == 1:
            qidx = (ctx_p.astype(jnp.int32) * A
                    + sym_p.astype(jnp.int32))            # (Kp4, B)
        else:
            qidx = sym_p.astype(jnp.int32)
        KQ = _cdiv(Kp * 4, FETCH_QB) * FETCH_QB
        qidxT = jnp.zeros((B, KQ), jnp.int32).at[:, :Kp * 4].set(
            jnp.transpose(qidx, (1, 0)))
        sfq = _sf_fetch(sff, qidxT, Cn, interpret=interpret)
        sf_p = jnp.transpose(sfq[:, :Kp * 4], (1, 0))     # (Kp4, B)
        tbl = None
    else:
        NP = _cdiv(A1, 2)
        pad = 2 * NP - A1
        if pad:
            bfe = jnp.concatenate(
                [bfe, jnp.zeros((B, Ac, pad), jnp.int32)], axis=2)
        pairs = bfe.reshape(B, Ac, NP, 2)
        tbl = pairs[..., 0] | (pairs[..., 1] << PACK_B)
        tbl = jnp.broadcast_to(
            jnp.transpose(tbl, (1, 2, 0))[:, :, None, :], (Ac, NP, 4, B))
    sh3 = jnp.broadcast_to(shiftv.astype(jnp.int32)[None, None, :],
                           (1, 4, B))

    # segment cap, matched to the XLA engine's retry tiers: 32 covers
    # the SEG_CAP tier (synth/q8-class rates), 64 the SEG_CAP2 tier
    # (q40-class, ~35 words/segment); 128 = one grid step's maximum
    # possible emissions (4 lanes x 32 steps), i.e. the always-exact
    # tier.  Smaller capk shrinks both the in-kernel placement one-hot
    # and the global placement sort linearly; overflow escalates to
    # the next tier exactly like the XLA engine.  (PER_E=64/capk=96
    # would shrink the sort another 25%, but doubles the kernel body
    # and blows interpret-mode CPU compiles past 25 min/case.)
    # capk = per-grid-step emission capacity.  8-granular: the global
    # stitch sort is THE encode wall (measured round 4: 0.46 s of the
    # 0.83 s q40 encode at capk=64), and its rows scale with capk, so
    # capk should hug the batch's true max segment count (overflow
    # escalates exactly like the XLA retry tiers).  4*per_e is the
    # always-exact ceiling.
    capk = min(max(_cdiv(seg_cap, 8) * 8, 8), 4 * PER_E)
    # segment length scales with steps per grid step: keep the tier
    # coverage identical by scaling capk with per_e
    capk = min(capk * (per_e // PER_E), 4 * per_e)
    if prefetch:
        kern = _build_enc_kernel_pf(K, int(geom), order, capk, per_e)
        wloc, xfT = pl.pallas_call(
            kern,
            grid=(NB, KO),
            in_specs=[
                pl.BlockSpec((per_e * 4, BT), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4, BT), lambda i, j: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((capk + 8, BT), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, BT), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((KO * (capk + 8), B), jnp.uint16),
                jax.ShapeDtypeStruct((4, B), jnp.uint32),
            ),
            scratch_shapes=[pltpu.VMEM((1, 4 * BT), jnp.uint32)],
            interpret=interpret,
        )(sf_p, sh3)
    else:
        kern = _build_enc_kernel(A, NP, KO, K, int(geom), order, capk)
        wloc, xfT = pl.pallas_call(
            kern,
            grid=(NB, KO),
            in_specs=[
                pl.BlockSpec((PER_E * 4, BT), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((PER_E * 4, BT), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4, BT), lambda i, j: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Ac, NP, 4, BT), lambda i, j: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((capk + 8, BT), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, BT), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((KO * (capk + 8), B), jnp.uint16),
                jax.ShapeDtypeStruct((4, B), jnp.uint32),
            ),
            scratch_shapes=[pltpu.VMEM((1, 4 * BT), jnp.uint32)],
            interpret=interpret,
        )(sym_p, ctx_p, sh3, tbl)

    # ---- global stitch: place each grid step's already-forward-
    # ordered segment (rows [capk-L, capk)) at its forward offset.
    # Forward segment order is the REVERSE of grid-step order (the
    # scan runs in processing order).  This is the second level of
    # rans_v2._compact_T; the first (segment-local) level happened
    # in-kernel.
    #
    # Key insight: in forward-segment order the valid rows are ALREADY
    # in destination order (segments ordered, rows within a segment
    # ordered), so the sort key can be the forward-order flat row index
    # — a static iota, no cumsum — with invalid rows keyed past it.
    # The index fits 16 bits whenever KO*capk <= 65536, so the cheap
    # single-array packed u32 sort applies at every tier (the old
    # destination-position key needed the 2-operand sort at
    # KO*capk >= 1<<15, ~2x the cost); the [::-1] segment reversal
    # folds into the key instead of re-materializing the array.
    wl3 = wloc.reshape(KO, capk + 8, B)
    w3 = wl3[:, :capk]
    c3 = wl3[:, capk].astype(jnp.int32)                  # (KO, B)
    n = c3.sum(axis=0)
    overflow = jnp.any(c3 > capk)
    # the batch's true max segment count: callers can re-run with
    # seg_cap = this value to shrink the stitch sort (its rows scale
    # with capk and it is the dominant encode stage at capk=64)
    maxseg = jnp.max(c3)
    r = lax.broadcasted_iota(jnp.int32, (KO, capk, B), 1)
    valid = r >= capk - c3[:, None, :]
    if KO * capk < (1 << 16):     # max ordr 65534 < the 0xFFFF marker
        koi = lax.broadcasted_iota(jnp.int32, (KO, capk, B), 0)
        ordr = ((KO - 1 - koi) * capk + r).astype(jnp.uint32)
        key = jnp.where(valid, ordr << 16,
                        jnp.uint32(0xFFFF0000)) | w3.astype(jnp.uint32)
        out = lax.sort(key.reshape(KO * capk, B), dimension=0)
        words = (jnp.transpose(out, (1, 0)) & 0xFFFF).astype(jnp.uint16)
    else:                                                # unreachable at
        koi = lax.broadcasted_iota(jnp.int32, (KO, capk, B), 0)  # N<=256K
        ordr = (KO - 1 - koi) * capk + r
        gkey = jnp.where(valid, ordr,
                         jnp.int32(1 << 30)).reshape(KO * capk, B)
        _, out = lax.sort([gkey, w3.reshape(KO * capk, B)],
                          dimension=0, num_keys=1)
        words = jnp.transpose(out, (1, 0))
    return (jnp.transpose(xfT, (1, 0))[:, ::-1], words, n, overflow,
            maxseg)


def _pad_b(arrs, B):
    """Pad the leading block axis of every array to a BT multiple with
    copies of row 0 (decoded/encoded padding rows are discarded)."""
    Bp = _cdiv(B, BT) * BT
    if Bp == B:
        return arrs, B
    out = []
    for a in arrs:
        a = np.asarray(a)
        rep = np.repeat(a[:1], Bp - B, axis=0)
        out.append(np.concatenate([a, rep], axis=0))
    return out, B


def _default_prefetch() -> bool:
    import os
    return os.environ.get("HTSCODECS_TPU_ENC_PREFETCH", "1") != "0"


def enc_o1_batch(blocks, alpha, packed, shift, interpret: bool = False,
                 prefetch: bool | None = None):
    """Batched order-1 encode, VMEM engine; mirrors
    rans_v2.enc_o1_batch (+vector shift).  Returns (states, words,
    counts)."""
    return _enc_batch(blocks, alpha, packed, shift, 1, interpret,
                      prefetch)


def enc_o0_batch(blocks, alpha, packed, shift=12, interpret: bool = False,
                 prefetch: bool | None = None):
    return _enc_batch(blocks, alpha, packed, shift, 0, interpret,
                      prefetch)


def _enc_batch(blocks, alpha, packed, shift, order: int, interpret: bool,
               prefetch: bool | None = None):
    blocks = np.asarray(blocks)
    B, N = blocks.shape
    (blocks, alpha, packed), _ = _pad_b([blocks, alpha, packed], B)
    Bp = blocks.shape[0]
    if prefetch is None:
        prefetch = _default_prefetch()
    if isinstance(shift, (int, np.integer)):
        shiftv = np.full((Bp,), int(shift), np.int32)
    else:
        shiftv = np.zeros((Bp,), np.int32)
        sa = np.asarray(shift, np.int32)
        shiftv[:len(sa)] = sa
        shiftv[len(sa):] = sa[0] if len(sa) else 12
    # interpret-mode (CPU test) compiles scale with the unrolled body:
    # keep the 32-step variant there — per_e does not change output
    # bytes (the stitch reassembles segments identically), so the
    # 128-step production variant is covered by the chip runs
    pe = PER_E if interpret else 0
    for cap in (rans_v2.SEG_CAP, rans_v2.SEG_CAP2, rans_v2.SEG):
        xf, words, n, ovf, _mseg = _enc_vmem(
            jnp.asarray(blocks), jnp.asarray(alpha), jnp.asarray(packed),
            jnp.asarray(shiftv), N, order, cap, prefetch=prefetch,
            per_e=pe, interpret=interpret)
        if not bool(np.asarray(ovf)):
            break
    return np.asarray(xf)[:B], np.asarray(words)[:B], np.asarray(n)[:B]
