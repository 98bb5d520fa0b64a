"""Pallas VMEM-resident adaptive range-coder engine (round 4).

Why: the XLA arith scan (ops/arith_jax.py) re-reads the (B, M) model
arrays from HBM every byte — the same disease the round-3 VMEM rANS
kernels cured.  This kernel keeps the SIMPLE_MODEL state (symbol
permutation + frequencies + total), the range-coder registers and
(for decode) the whole compressed byte stream resident in VMEM per
128-block tile, so each byte step is pure VPU work.

Semantics are bit-identical to the reference coder
(htscodecs/c_range_coder.h:46-127) and model
(htscodecs/c_simple_model.h:85-179), matching ops/arith_jax.py's
formulation exactly:

- encode search: the model's symbols are a permutation, so the coded
  symbol matches exactly one row; p = its position, acc = sum of
  freqs before it, f = its freq.
- RC_Encode: r = rng // total (3-stage f32-reciprocal exact division
  by a u16 total); low += acc*r with carry counting; rng = r*f; at
  most two RC_ShiftLow byte events per symbol, packed
  (ffnum<<9 | ffbyte00<<8 | byte) exactly like arith_jax and expanded
  on the host.
- model update: freq[p] += 16; halve-normalise when total > MAX_FREQ;
  one bubble-swap step (c_simple_model.h:123-146 — the swap order is
  bitstream-visible and reproduced exactly).
- decode: r = rng // total; target = min(code // r, 0xFFFF) via a
  multiply-checked f32 quotient (code and r are full u32; the fixup
  compares the 48-bit product q*r against code in split halves);
  symbol search by log-depth prefix sums over the (M, BT) freqs;
  stream bytes come from a VMEM-resident window exactly like
  ops/rans_vmem.py's renorm window.

Order-0 only: the order-1 model bank (M^2 entries/block) pays an
M-deep select chain per step for the context row fetch/writeback —
measured unviable; O1 stays on arith_jax / the native host coder.

Byte-exactness is asserted against arith_jax and the host oracles in
tests/test_arith_vmem.py, and on real hardware by docs/ubench_arith_r4.py.
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

TOP = 1 << 24
THRES = 0xFF000000
M32 = 0xFFFFFFFF
MAX_FREQ = (1 << 16) - 17
STEP = 16

BT = 128          # blocks per tile
PER_A = 32        # bytes coded per grid step
CWA = 32          # decode window anchor granularity (i32 rows = 128 B)
WA = 2 * CWA      # decode window rows (256 B; <=64 B consumed/step grid)
MAX_M = 64        # model entries cap (VMEM + select-depth budget)
NBY_MAX = 49152   # max resident stream bytes per block (decode)


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# division helpers (Mosaic's native u32 vector division is ~4x slower
# than these f32-reciprocal forms; see rans_vmem._div_u32_small)


def _divmod_stage(v, d_i, rd):
    """Exact (v // d, v % d) for i32 0 <= v < 2^23, 1 <= d < 2^16."""
    q = (v.astype(jnp.float32) * rd).astype(jnp.int32)
    r = v - q * d_i
    for _ in range(2):
        under = r < 0
        q = jnp.where(under, q - 1, q)
        r = jnp.where(under, r + d_i, r)
        over = r >= d_i
        q = jnp.where(over, q + 1, q)
        r = jnp.where(over, r - d_i, r)
    return q, r


def _div_u32_u16(x, d_i):
    """Exact x // d for full-range u32 x, i32 1 <= d < 2^16.
    Three stages of 18/7/7 bits keep every stage dividend < 2^23."""
    rd = 1.0 / d_i.astype(jnp.float32)
    c0 = (x >> 14).astype(jnp.int32)             # < 2^18
    c1 = ((x >> 7) & jnp.uint32(0x7F)).astype(jnp.int32)
    c2 = (x & jnp.uint32(0x7F)).astype(jnp.int32)
    q0, r0 = _divmod_stage(c0, d_i, rd)
    q1, r1 = _divmod_stage((r0 << 7) + c1, d_i, rd)
    q2, _ = _divmod_stage((r1 << 7) + c2, d_i, rd)
    return ((q0.astype(jnp.uint32) << 14)
            + (q1.astype(jnp.uint32) << 7) + q2.astype(jnp.uint32))


def _mul_u32_hi_lo(q, r):
    """(hi, lo) of the exact product q * r for u32 q < 2^17, u32 r.

    Split q = qh*2^16 + ql with qh in {0, 1}: every partial product
    fits u32 (ql, r_hi, r_lo < 2^16), carries tracked explicitly."""
    r_hi = r >> 16
    r_lo = r & jnp.uint32(0xFFFF)
    qh = q >> 16                                  # 0 or 1
    ql = q & jnp.uint32(0xFFFF)
    ph = ql * r_hi                                # < 2^32
    pl = ql * r_lo                                # < 2^32
    t = (ph & jnp.uint32(0xFFFF)) << 16
    lo = t + pl
    hi = (ph >> 16) + (lo < t).astype(jnp.uint32)
    # qh*2^16*r: low word qh*((r & 0xFFFF) << 16), high word qh*(r>>16)
    t2 = qh * (r_lo << 16)
    lo2 = lo + t2
    hi = hi + (lo2 < lo).astype(jnp.uint32) + qh * r_hi
    return hi, lo2


def _div_u32_u32_capped(code, r):
    """min(code // r, 0xFFFF) for full-range u32 code, u32 r >= 1.

    f32 quotient + multiply-checked fixups (the 48-bit q*r product is
    compared against code via _mul_u32_hi_lo).  Valid-stream quotients
    are < total <= 2^16 with f32 error <= ~2; four fixup rounds cover
    the clamp boundary as well."""
    # u32 -> f32 via 16-bit halves: Mosaic has no uint32->float32 cast
    def _uf(x):
        return ((x >> 16).astype(jnp.int32).astype(jnp.float32)
                * 65536.0
                + (x & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(
                    jnp.float32))

    rf = 1.0 / jnp.maximum(_uf(r), 1.0)
    q = (_uf(code) * rf).astype(jnp.int32)
    q = jnp.clip(q, 0, 0x1FFFF).astype(jnp.uint32)
    for _ in range(4):
        hi, lo = _mul_u32_hi_lo(q, r)
        over = (hi > 0) | (lo > code)             # q*r > code -> too big
        q = jnp.where(over & (q > 0), q - 1, q)
        hi2, lo2 = _mul_u32_hi_lo(q + 1, r)
        under = (hi2 == 0) & (lo2 <= code)        # (q+1)*r <= code
        q = jnp.where(under, q + 1, q)
    # minimum on u32 lowers to minui, which Mosaic can't legalize
    return jnp.where(q > jnp.uint32(0xFFFF), jnp.uint32(0xFFFF), q)


# ---------------------------------------------------------------------------
# encode kernel (order 0)


def _build_enc_kernel(M: int, K: int, capk: int):
    """Refs:
      byt_ref  (PER_A, BT) u8    input bytes (block-transposed)
      len_ref  (1, BT) i32       per-block lengths
      msym_ref (1, BT) i32       per-block model size (max_sym+1)
      evloc_ref (capk+8, BT) i32 this grid step's events, rank p at
               row p (events are FORWARD order — the range coder
               emits bytes forward, unlike rANS); row capk = count;
               row capk+1 = saturation flag (sticky)
      rcf_ref  (8, BT) u32       final coder regs (low, rng, cache,
               ffnum, carry, csat, 0, 0)
      scratch: fr (M, BT) i32 freqs; sy (M, BT) i32 symbol perm;
               rc (8, BT) u32 coder regs + total
    """

    def kernel(byt_ref, len_ref, msym_ref, evloc_ref, rcf_ref, fr, sy, rc):
        j = pl.program_id(1)
        iota_m = lax.broadcasted_iota(jnp.int32, (M, BT), 0)

        @pl.when(j == 0)
        def _init():
            msym = msym_ref[:]
            fr[:] = (iota_m < msym).astype(jnp.int32)
            sy[:] = iota_m
            z = jnp.zeros((1, BT), jnp.uint32)
            rc[:] = jnp.concatenate(
                [z, jnp.full((1, BT), M32, jnp.uint32), z, z, z, z,
                 msym.astype(jnp.uint32), z], axis=0)

        lens = len_ref[:]
        freqs = fr[:]
        syms = sy[:]
        rcv = rc[:]
        low = rcv[0:1]
        rng = rcv[1:2]
        cache = rcv[2:3]
        ffnum = rcv[3:4]
        rcc = rcv[4:5]
        csat = rcv[5:6]
        total = rcv[6:7].astype(jnp.int32)

        acc_loc = jnp.zeros((capk, BT), jnp.int32)
        cnt = jnp.zeros((1, BT), jnp.int32)
        iota_c = lax.broadcasted_iota(jnp.int32, (capk, BT), 0)

        for u in range(PER_A):
            i = j * PER_A + u
            active = i < lens                      # (1, BT)
            sym = byt_ref[u:u + 1].astype(jnp.int32)

            # ---- model search (symbols are a permutation) ----
            match = syms == sym                    # (M, BT)
            p = jnp.sum(jnp.where(match, iota_m, 0), axis=0,
                        keepdims=True)             # (1, BT)
            f = jnp.sum(jnp.where(match, freqs, 0), axis=0,
                        keepdims=True)
            before = iota_m < p
            acc = jnp.sum(jnp.where(before, freqs, 0), axis=0,
                          keepdims=True)

            # ---- RC_Encode ----
            tot_i = jnp.maximum(total, 1)
            r = _div_u32_u16(rng, tot_i)
            add = acc.astype(jnp.uint32) * r
            new_low = low + add
            wrap = new_low < low
            rcc = rcc + (wrap & active).astype(jnp.uint32)
            csat = csat | (rcc > 1).astype(jnp.uint32)
            rng2 = r * jnp.maximum(f, 1).astype(jnp.uint32)
            low = jnp.where(active, new_low, low)
            rng = jnp.where(active, rng2, rng)

            # ---- up to two RC_ShiftLow events ----
            ev2 = []
            fl2 = []
            for _ in range(2):
                need = (rng < jnp.uint32(TOP)) & active
                flush = (low < jnp.uint32(THRES)) | (rcc != 0)
                byte1 = (cache + rcc) & jnp.uint32(0xFF)
                ffb00 = (rcc > 0).astype(jnp.uint32)
                evt = (ffnum << 9) | (ffb00 << 8) | byte1
                csat = csat | (need & (ffnum >= jnp.uint32(1 << 22))
                               ).astype(jnp.uint32)
                cache = jnp.where(need & flush, low >> 24, cache)
                ffnum = jnp.where(need,
                                  jnp.where(flush, jnp.uint32(0),
                                            ffnum + 1), ffnum)
                rcc = jnp.where(need & flush, jnp.uint32(0), rcc)
                low = jnp.where(need, low << 8, low)
                rng = jnp.where(need, rng << 8, rng)
                ev2.append(evt.astype(jnp.int32))
                fl2.append(need & flush)

            # ---- forward-order event placement ----
            e0 = fl2[0].astype(jnp.int32)
            e1 = fl2[1].astype(jnp.int32)
            hit0 = (iota_c == cnt) & (e0 > 0)
            acc_loc = acc_loc + jnp.where(hit0, ev2[0], 0)
            hit1 = (iota_c == cnt + e0) & (e1 > 0)
            acc_loc = acc_loc + jnp.where(hit1, ev2[1], 0)
            cnt = cnt + e0 + e1

            # ---- model update: +STEP, halve-normalise, bubble ----
            at_p = (iota_m == p) & active
            freqs = freqs + at_p.astype(jnp.int32) * STEP
            total = total + active.astype(jnp.int32) * STEP
            do_norm = (total > MAX_FREQ) & active
            halved = freqs - (freqs >> 1)
            freqs = jnp.where(do_norm & (freqs > 0), halved, freqs)
            total = jnp.where(do_norm,
                              jnp.sum(freqs, axis=0, keepdims=True),
                              total)
            at_prev = iota_m == (p - 1)
            f_at = jnp.sum(jnp.where(at_p, freqs, 0), axis=0,
                           keepdims=True)
            f_prev = jnp.sum(jnp.where(at_prev & active, freqs, 0),
                             axis=0, keepdims=True)
            s_at = jnp.sum(jnp.where(at_p, syms, 0), axis=0,
                           keepdims=True)
            s_prev = jnp.sum(jnp.where(at_prev & active, syms, 0),
                             axis=0, keepdims=True)
            do_swap = (p > 0) & (f_at > f_prev) & active
            freqs = jnp.where(do_swap & at_p, f_prev,
                              jnp.where(do_swap & at_prev, f_at, freqs))
            syms = jnp.where(do_swap & at_p, s_prev,
                             jnp.where(do_swap & at_prev, s_at, syms))

        evloc_ref[:] = jnp.concatenate(
            [acc_loc, cnt, csat.astype(jnp.int32),
             jnp.zeros((6, BT), jnp.int32)], axis=0)
        fr[:] = freqs
        sy[:] = syms
        rc[:] = jnp.concatenate(
            [low, rng, cache, ffnum, rcc, csat,
             total.astype(jnp.uint32), jnp.zeros((1, BT), jnp.uint32)],
            axis=0)
        rcf_ref[:] = rc[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("M", "interpret"))
def _enc_vmem(bytesT, lens, msyms, M: int, interpret: bool = False):
    """bytesT (Kp, B) u8 block-transposed input; lens/msyms (B,) i32.
    Returns (events (B, cap) u32 forward, counts (B,), rcf (B, 8) u32,
    saturated bool)."""
    Kp, B = bytesT.shape
    NB = B // BT
    KO = Kp // PER_A
    capk = 2 * PER_A            # always-exact: <= 2 events per byte
    kern = _build_enc_kernel(M, Kp, capk)
    evloc, rcf = pl.pallas_call(
        kern,
        grid=(NB, KO),
        in_specs=[
            pl.BlockSpec((PER_A, BT), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((capk + 8, BT), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BT), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((KO * (capk + 8), B), jnp.int32),
            jax.ShapeDtypeStruct((8, B), jnp.uint32),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, BT), jnp.int32),
            pltpu.VMEM((M, BT), jnp.int32),
            pltpu.VMEM((8, BT), jnp.uint32),
        ],
        interpret=interpret,
    )(bytesT, lens[None, :].astype(jnp.int32),
      msyms[None, :].astype(jnp.int32))

    # global stitch: events are FORWARD within segments AND segments
    # are in forward grid order, so valid rows are already in
    # destination order — static-iota key, 2-operand sort (event
    # payloads are up to 32 bits, no room to pack into one key)
    el3 = evloc.reshape(KO, capk + 8, B)
    ev = el3[:, :capk]
    c3 = el3[:, capk]
    sat = jnp.any(el3[:, capk + 1] != 0)
    n = c3.sum(axis=0)
    r = lax.broadcasted_iota(jnp.int32, (KO, capk, B), 1)
    koi = lax.broadcasted_iota(jnp.int32, (KO, capk, B), 0)
    valid = r < c3[:, None, :]
    gkey = jnp.where(valid, koi * capk + r,
                     jnp.int32(1 << 30)).reshape(KO * capk, B)
    _, out = lax.sort([gkey, ev.reshape(KO * capk, B)],
                      dimension=0, num_keys=1)
    events = jnp.transpose(out, (1, 0)).astype(jnp.uint32)
    return events, n, jnp.transpose(rcf, (1, 0)), sat


# ---------------------------------------------------------------------------
# decode kernel (order 0)


def _build_dec_kernel(M: int, NCW: int, capo: int):
    """Refs:
      strm_ref (NSp, BT) i32     byte stream packed 4 B/row, transposed
      len_ref  (1, BT) i32       output lengths
      msym_ref (1, BT) i32
      code_ref (1, BT) u32       primed 5-byte code
      out_ref  (capo, BT) u32    4 decoded bytes per u32
      scratch: fr/sy (M, BT) i32; st (8, BT) u32 (code, rng, pos,
               total, 0...)
    """

    def kernel(strm_ref, len_ref, msym_ref, code_ref, out_ref,
               fr, sy, st):
        j = pl.program_id(1)
        iota_m = lax.broadcasted_iota(jnp.int32, (M, BT), 0)

        @pl.when(j == 0)
        def _init():
            msym = msym_ref[:]
            fr[:] = (iota_m < msym).astype(jnp.int32)
            sy[:] = iota_m
            z = jnp.zeros((1, BT), jnp.uint32)
            st[:] = jnp.concatenate(
                [code_ref[:], jnp.full((1, BT), M32, jnp.uint32),
                 jnp.full((1, BT), 5, jnp.uint32),
                 msym.astype(jnp.uint32), z, z, z, z], axis=0)

        lens = len_ref[:]
        freqs = fr[:]
        syms = sy[:]
        stv = st[:]
        code = stv[0:1]
        rng = stv[1:2]
        pos = stv[2:3].astype(jnp.int32)
        total = stv[3:4].astype(jnp.int32)

        # ---- stream window refill (see rans_vmem): one-hot chain
        # over CWA-row anchors of the resident packed stream ----
        c0 = jnp.minimum((pos >> 2) // CWA, NCW - 1)   # anchor row grp
        win = strm_ref[(NCW - 1) * CWA:(NCW - 1) * CWA + WA, :]
        for a in range(NCW - 1):
            seg = strm_ref[a * CWA:a * CWA + WA, :]
            win = jnp.where(c0 == a, seg, win)
        base = c0 * (CWA * 4)                          # bytes
        iota_wv = lax.broadcasted_iota(jnp.int32, (WA, BT), 0)

        def get_byte(pos, take):
            off = jnp.where(take, pos - base, WA * 8)
            sel = iota_wv == (off >> 2)
            w = jnp.sum(jnp.where(sel, win, 0), axis=0, keepdims=True)
            return ((w >> ((off & 3) * 8)) & 0xFF).astype(jnp.uint32)

        outs = []
        acc = jnp.zeros((1, BT), jnp.uint32)
        for u in range(PER_A):
            i = j * PER_A + u
            active = i < lens
            tot_i = jnp.maximum(total, 1)
            ok = rng >= tot_i.astype(jnp.uint32)
            r = jnp.where(ok, _div_u32_u16(rng, tot_i), rng)
            target = jnp.where(
                ok, _div_u32_u32_capped(code, jnp.where(
                    r == 0, jnp.uint32(1), r)), jnp.uint32(0))
            tgt = target.astype(jnp.int32)

            # ---- search by cumulative frequency ----
            cum = freqs
            sh = 1
            while sh < M:
                cum = cum + jnp.concatenate(
                    [jnp.zeros((sh, BT), jnp.int32), cum[:M - sh]],
                    axis=0)
                sh *= 2
            le = cum <= tgt                        # (M, BT)
            p = jnp.sum(le.astype(jnp.int32), axis=0, keepdims=True)
            at_p = iota_m == p
            f = jnp.sum(jnp.where(at_p, freqs, 0), axis=0,
                        keepdims=True)
            sym = jnp.sum(jnp.where(at_p, syms, 0), axis=0,
                          keepdims=True)
            acc_c = jnp.sum(jnp.where(le, freqs, 0), axis=0,
                            keepdims=True)

            code2 = code - acc_c.astype(jnp.uint32) * r
            rng2 = r * jnp.maximum(f, 1).astype(jnp.uint32)
            code = jnp.where(active, code2, code)
            rng = jnp.where(active, rng2, rng)
            for _ in range(2):
                need = (rng < jnp.uint32(TOP)) & active
                byte = get_byte(pos, need)
                code = jnp.where(need, (code << 8) | byte, code)
                pos = pos + need.astype(jnp.int32)
                rng = jnp.where(need, rng << 8, rng)

            # ---- model update (identical to encode) ----
            at_pa = at_p & active
            freqs = freqs + at_pa.astype(jnp.int32) * STEP
            total = total + active.astype(jnp.int32) * STEP
            do_norm = (total > MAX_FREQ) & active
            halved = freqs - (freqs >> 1)
            freqs = jnp.where(do_norm & (freqs > 0), halved, freqs)
            total = jnp.where(do_norm,
                              jnp.sum(freqs, axis=0, keepdims=True),
                              total)
            at_prev = iota_m == (p - 1)
            f_at = jnp.sum(jnp.where(at_pa, freqs, 0), axis=0,
                           keepdims=True)
            f_prev = jnp.sum(jnp.where(at_prev & active, freqs, 0),
                             axis=0, keepdims=True)
            s_at = jnp.sum(jnp.where(at_pa, syms, 0), axis=0,
                           keepdims=True)
            s_prev = jnp.sum(jnp.where(at_prev & active, syms, 0),
                             axis=0, keepdims=True)
            do_swap = (p > 0) & (f_at > f_prev) & active
            freqs = jnp.where(do_swap & at_pa, f_prev,
                              jnp.where(do_swap & at_prev, f_at, freqs))
            syms = jnp.where(do_swap & at_pa, s_prev,
                             jnp.where(do_swap & at_prev, s_at, syms))

            acc = acc | (sym.astype(jnp.uint32) << (8 * (u % 4)))
            if u % 4 == 3:
                outs.append(acc)
                acc = jnp.zeros((1, BT), jnp.uint32)

        out_ref[:] = jnp.concatenate(outs, axis=0)
        fr[:] = freqs
        sy[:] = syms
        st[:] = jnp.concatenate(
            [code, rng, pos.astype(jnp.uint32),
             total.astype(jnp.uint32)] +
            [jnp.zeros((1, BT), jnp.uint32)] * 4, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("M", "NCW", "K",
                                              "interpret"))
def _dec_vmem(strmT, lens, msyms, code0, M: int, NCW: int, K: int,
              interpret: bool = False):
    """strmT (NSp, B) i32 packed stream; returns (B, K) u8."""
    NSp, B = strmT.shape
    NB = B // BT
    KO = _cdiv(K, PER_A)
    capo = PER_A // 4
    kern = _build_dec_kernel(M, NCW, capo)
    out = pl.pallas_call(
        kern,
        grid=(NB, KO),
        in_specs=[
            pl.BlockSpec((NSp, BT), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((capo, BT), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KO * capo, B), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((M, BT), jnp.int32),
            pltpu.VMEM((M, BT), jnp.int32),
            pltpu.VMEM((8, BT), jnp.uint32),
        ],
        interpret=interpret,
    )(strmT, lens[None, :].astype(jnp.int32),
      msyms[None, :].astype(jnp.int32), code0[None, :])
    # unpack 4 bytes per u32 row
    ks = [((out >> (8 * k)) & 0xFF).astype(jnp.uint8) for k in range(4)]
    byts = jnp.stack(ks, axis=1).reshape(KO * PER_A, B)
    return jnp.transpose(byts, (1, 0))[:, :K]


# ---------------------------------------------------------------------------
# batch wrappers (contract mirrors ops/arith_jax.enc_batch/dec_batch)


def _pad_bt(arrs, B):
    Bp = _cdiv(B, BT) * BT
    if Bp == B:
        return arrs
    out = []
    for a in arrs:
        a = np.asarray(a)
        pad = np.repeat(a[:1], Bp - B, axis=0)
        out.append(np.concatenate([a, pad], axis=0))
    return out


def enc_batch(blocks: np.ndarray, lens: np.ndarray, max_syms: np.ndarray,
              order: int, interpret: bool = False):
    """Order-0 VMEM encode; same contract as arith_jax.enc_batch
    (returns list of payload byte strings or None for fallback)."""
    from .arith_jax import _finish_rc, _expand_events, _round_m
    if order != 0:
        return None
    B, N = blocks.shape
    m_max = int(np.max(max_syms))
    if m_max > MAX_M:
        return None
    M = min(_round_m(m_max), MAX_M)
    Kp = _cdiv(N, PER_A) * PER_A
    bt = np.zeros((Kp, _cdiv(B, BT) * BT), np.uint8)
    bt[:N, :B] = np.asarray(blocks, np.uint8).T
    lensp, msp = _pad_bt([np.asarray(lens, np.int32),
                          np.asarray(max_syms, np.int32)], B)
    msp = np.maximum(msp, 1)
    events, n, rcf, sat = _enc_vmem(
        jnp.asarray(bt), jnp.asarray(lensp), jnp.asarray(msp), M,
        interpret=interpret)
    if bool(np.asarray(sat)):
        return None
    events = np.asarray(events)[:B]
    n = np.asarray(n)[:B]
    rcf = np.asarray(rcf)[:B]
    res = []
    for b in range(B):
        low, rng, cache, ffnum, rcc = (int(rcf[b, k]) for k in range(5))
        tail = _finish_rc(low, rng, cache, ffnum, rcc)
        res.append(_expand_events(events[b, :n[b]], tail))
    return res


def dec_batch(streams, out_sizes, max_syms, order: int,
              interpret: bool = False):
    """Order-0 VMEM decode; contract mirrors arith_jax.dec_batch."""
    from .arith_jax import _round_m
    if order != 0:
        return None
    B = len(streams)
    m_max = int(max(max_syms))
    if m_max > MAX_M:
        return None
    M = min(_round_m(m_max), MAX_M)
    K = int(max(out_sizes))
    W = max(max(len(s) for s in streams), 8)
    if W > NBY_MAX:
        return None
    NCW = max(_cdiv(_cdiv(W, 4), CWA), 1)
    NSp = NCW * CWA + WA
    Bp = _cdiv(B, BT) * BT
    buf = np.zeros((Bp, NSp * 4), np.uint8)
    code0 = np.zeros(Bp, np.uint32)
    lens = np.zeros(Bp, np.int32)
    msyms = np.ones(Bp, np.int32)
    for b, s in enumerate(streams):
        a = np.frombuffer(bytes(s), np.uint8)
        buf[b, :len(a)] = a
        msyms[b] = max(int(max_syms[b]), 1)
        if len(a) >= 6:
            c = 0
            for k in range(5):
                c = ((c << 8) | int(a[k])) & M32
            code0[b] = c
            lens[b] = int(out_sizes[b])
        else:
            lens[b] = 0         # reference refuses to decode
    strm = buf.view("<u4").reshape(Bp, NSp).T.astype(np.int32)
    out = _dec_vmem(jnp.asarray(strm), jnp.asarray(lens),
                    jnp.asarray(msyms), jnp.asarray(code0), M, NCW,
                    _cdiv(K, PER_A) * PER_A, interpret=interpret)
    return np.asarray(out)[:B, :K]
