"""Pallas VMEM prefetched-triple range-coder kernel (round 4).

The adaptive codecs' encode side splits in two: the model walk (a
pointer-chase over up to 16 MB of context models — fqzcomp_qual.c's
65536-context arena cannot live in VMEM) and the carry-counting byte
range coder (c_range_coder.h:46-89), a tiny serial register chain.
The model walk replays on the host emitting one (acc, f, tot) triple
per coded symbol (native fqz_enc_replay); THIS kernel runs the coder
chain for 128 blocks per tile with the registers resident in VMEM and
the triples streamed from HBM — the same prefetched-input design as
the rANS 'pfv' encode kernel (ops/rans_vmem._build_enc_kernel_pf).

The kernel is codec-agnostic: any adaptive model whose encode order
can be replayed host-side (fqz quality contexts, arith order-1,
tok3's arith mode) feeds the same kernel.  Byte output is identical
to the reference coder: exact u32/u16 division via staged f32
reciprocals, carry counting with ffnum deferral, saturation fallback
when a block's carry chain exceeds the event encoding (never on valid
streams; mirrors ops/arith_vmem's contract).

Decode has no such split: the context of symbol i depends on decoded
symbols < i, so adaptive decode stays on the host scans (or, for
arith O0's VMEM-resident model, ops/arith_vmem).

Refs: c_range_coder.h:46-89 (RC_ShiftLow/RC_Encode),
fqzcomp_qual.c:1040-1113 (encode loop shape).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .arith_vmem import BT, TOP, THRES, M32, _div_u32_u16, _cdiv

PER_R = 32        # events coded per grid step (production)


def _build_rc_kernel(capk: int, per_r: int):
    """Refs:
      af_ref   (PER_R, BT) i32   acc | f<<16 per event (block-major T)
      tt_ref   (PER_R, BT) i32   tot per event
      len_ref  (1, BT) i32       per-block event counts
      evloc_ref (capk+8, BT) i32 byte events, forward order; row capk =
               count; row capk+1 = carry-saturation flag (sticky)
      rcf_ref  (8, BT) u32       final regs (low, rng, cache, ffnum,
               carry, csat, 0, 0)
      scratch: rc (8, BT) u32
    """

    def kernel(af_ref, tt_ref, len_ref, evloc_ref, rcf_ref, rc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            z = jnp.zeros((1, BT), jnp.uint32)
            rc[:] = jnp.concatenate(
                [z, jnp.full((1, BT), M32, jnp.uint32), z, z, z, z, z,
                 z], axis=0)

        lens = len_ref[:]
        rcv = rc[:]
        low = rcv[0:1]
        rng = rcv[1:2]
        cache = rcv[2:3]
        ffnum = rcv[3:4]
        rcc = rcv[4:5]
        csat = rcv[5:6]

        acc_loc = jnp.zeros((capk, BT), jnp.int32)
        cnt = jnp.zeros((1, BT), jnp.int32)
        iota_c = lax.broadcasted_iota(jnp.int32, (capk, BT), 0)

        for u in range(per_r):
            i = j * per_r + u
            active = i < lens                      # (1, BT)
            af = af_ref[u:u + 1].astype(jnp.uint32)
            acc = af & jnp.uint32(0xFFFF)
            f = af >> 16
            tot_i = jnp.maximum(tt_ref[u:u + 1], 1)

            # ---- RC_Encode ----
            r = _div_u32_u16(rng, tot_i)
            add = acc * r
            new_low = low + add
            wrap = new_low < low
            rcc = rcc + (wrap & active).astype(jnp.uint32)
            csat = csat | (rcc > 1).astype(jnp.uint32)
            # max in i32: Mosaic has no unsigned-max lowering (f<=2^16)
            f1 = jnp.maximum(f.astype(jnp.int32), 1).astype(jnp.uint32)
            rng2 = r * f1
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

            e0 = fl2[0].astype(jnp.int32)
            e1 = fl2[1].astype(jnp.int32)
            hit0 = (iota_c == cnt) & (e0 > 0)
            acc_loc = acc_loc + jnp.where(hit0, ev2[0], 0)
            hit1 = (iota_c == cnt + e0) & (e1 > 0)
            acc_loc = acc_loc + jnp.where(hit1, ev2[1], 0)
            cnt = cnt + e0 + e1

        evloc_ref[:] = jnp.concatenate(
            [acc_loc, cnt, csat.astype(jnp.int32),
             jnp.zeros((6, BT), jnp.int32)], axis=0)
        rc[:] = jnp.concatenate(
            [low, rng, cache, ffnum, rcc, csat,
             jnp.zeros((2, BT), jnp.uint32)], axis=0)
        rcf_ref[:] = rc[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("per_r", "interpret"))
def _rc_vmem(afT, ttT, lens, per_r: int = PER_R,
             interpret: bool = False):
    """afT/ttT (Kp, B) i32 transposed triple streams; lens (B,) i32.
    Returns (events (B, KO*capk) u32 forward, counts (B,),
    rcf (B, 8) u32, saturated bool).  ``per_r`` does not change the
    output bytes (the stitch reassembles segments identically); CPU
    interpret tests use a small value — the placement accumulator's
    expression graph makes interpret compiles superlinear in it."""
    Kp, B = afT.shape
    NB = B // BT
    KO = Kp // per_r
    capk = 2 * per_r            # <= 2 byte events per coded symbol
    kern = _build_rc_kernel(capk, per_r)
    evloc, rcf = pl.pallas_call(
        kern,
        grid=(NB, KO),
        in_specs=[
            pl.BlockSpec((per_r, BT), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((per_r, BT), lambda i, j: (j, i),
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
        scratch_shapes=[pltpu.VMEM((8, BT), jnp.uint32)],
        interpret=interpret,
    )(afT, ttT, lens[None, :].astype(jnp.int32))

    # global stitch (see ops/arith_vmem): segments are forward and in
    # grid order, so a static-iota key places valid rows directly
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


def enc_triples_batch(triples: list, per_r: int = PER_R,
                      interpret: bool = False):
    """Encode B blocks' (acc, f, tot) u16 triple arrays into reference
    range-coder payloads.  Returns a list of bytes, or None when the
    carry chain saturates the event encoding (caller falls back)."""
    from .arith_jax import _finish_rc, _expand_events
    B = len(triples)
    lens = np.asarray([len(t[0]) for t in triples], np.int32)
    Kp = _cdiv(max(int(lens.max()), 1), per_r) * per_r
    Bp = _cdiv(B, BT) * BT
    af = np.zeros((Bp, Kp), np.int32)
    tt = np.zeros((Bp, Kp), np.int32)
    for b, (acc, f, tot) in enumerate(triples):
        k = len(acc)
        af[b, :k] = acc.astype(np.int32) | (f.astype(np.int32) << 16)
        tt[b, :k] = tot.astype(np.int32)
    lensp = np.zeros(Bp, np.int32)
    lensp[:B] = lens
    events, n, rcf, sat = _rc_vmem(
        jnp.asarray(af.T), jnp.asarray(tt.T), jnp.asarray(lensp),
        per_r=per_r, interpret=interpret)
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
