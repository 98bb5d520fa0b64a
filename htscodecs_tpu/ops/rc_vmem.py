"""Pallas VMEM prefetched-triple range-coder kernel (round 4).

The adaptive codecs' encode side splits in two: the model walk (a
pointer-chase over up to 16 MB of context models — fqzcomp_qual.c's
65536-context arena cannot live in VMEM) and the carry-counting byte
range coder (c_range_coder.h:46-89), a tiny serial register chain.
The model walk replays on the host emitting one (acc, f, tot) triple
per coded symbol (native fqz_enc_replay); THIS kernel runs the coder
chain with the registers resident in VMEM and the triples streamed
from HBM — the same prefetched-input design as the rANS 'pfv' encode
kernel (ops/rans_vmem._build_enc_kernel_pf).

Design points (each measured on chip, round 4):
- **Sublane stacking**: a coder chain is one register set, so a naive
  kernel runs one block per (1, 128) vreg row — 1/8 of the VPU.  This
  kernel stacks SB=8 independent blocks on the sublanes: every op is
  (8, 128) = 1024 blocks per tile at the same per-op cost (46x the
  naive kernel: 29M -> 1.34G events/s).
- **Once-per-grid-step event compaction**: the <=2 byte events per
  step land in fixed slots; ONE rank one-hot pass at the end of each
  grid step compacts 2*per_r slots to capk rows.  Without it the
  global stitch sorts 2*per_r rows per grid step; XLA's variadic sort
  also falls off a cliff (0.3s -> 33s) once an operand crosses ~1 GB,
  so smaller R matters twice.  capk escalates on overflow exactly
  like the rANS tiers.
- **Column-chunked stitch sorts**: each lax.sort call is kept under
  ~0.5 GB per operand (the measured XLA cliff).

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
SB = 8            # sublane-stacked blocks per tile (8 x 128 = 1024)
SORT_B = 512 << 20  # per-operand ceiling for one lax.sort call


def _build_rc_kernel(per_r: int, capk: int, sb: int):
    """Refs:
      af_ref   (per_r, sb, BT) i32      acc | f<<16 per event
      tt_ref   (per_r//2, sb, BT) i32   tot, two u16 per i32
      len_ref  (1, sb, BT) i32          per-block event counts
      ev_ref   (capk+2, sb, BT) i32     compacted byte events; row capk
               = count; row capk+1 = saturation/overflow flag (sticky)
      rcf_ref  (8, sb, BT) u32          final regs (low, rng, cache,
               ffnum, carry, csat, 0, 0)
      scratch: rc (8, sb, BT) u32

    ``sb`` < SB serves small batches: fewer sublane-stacked blocks per
    tile means proportionally less (mostly-padding) HBM/H2D traffic.
    """

    def kernel(af_ref, tt_ref, len_ref, ev_ref, rcf_ref, rc):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            z = jnp.zeros((1, sb, BT), jnp.uint32)
            rc[:] = jnp.concatenate(
                [z, jnp.full((1, sb, BT), M32, jnp.uint32),
                 z, z, z, z, z, z], axis=0)

        lens = len_ref[0]                          # (SB, BT)
        rcv = rc[:]
        low = rcv[0]
        rng = rcv[1]
        cache = rcv[2]
        ffnum = rcv[3]
        rcc = rcv[4]
        csat = rcv[5]

        evs = []      # (evt_or_-1, rank_at_emission) per fixed slot
        cnt = jnp.zeros((sb, BT), jnp.int32)
        for u in range(per_r):
            i = j * per_r + u
            active = i < lens                      # (SB, BT)
            af = af_ref[u].astype(jnp.uint32)
            acc = af & jnp.uint32(0xFFFF)
            f = af >> 16
            tt = tt_ref[u // 2]
            tot_i = jnp.maximum((tt >> (16 * (u & 1))) & 0xFFFF, 1)

            # ---- RC_Encode ----
            r = _div_u32_u16(rng, tot_i)
            new_low = low + acc * r
            wrap = new_low < low
            rcc = rcc + (wrap & active).astype(jnp.uint32)
            csat = csat | (rcc > 1).astype(jnp.uint32)
            # max in i32: Mosaic has no unsigned-max lowering (f<2^16)
            f1 = jnp.maximum(f.astype(jnp.int32), 1).astype(jnp.uint32)
            low = jnp.where(active, new_low, low)
            rng = jnp.where(active, r * f1, rng)

            # ---- up to two RC_ShiftLow events, slot + rank ----
            for _ in range(2):
                need = (rng < jnp.uint32(TOP)) & active
                flush = (low < jnp.uint32(THRES)) | (rcc != 0)
                byte1 = (cache + rcc) & jnp.uint32(0xFF)
                ffb00 = (rcc > 0).astype(jnp.uint32)
                evt = ((ffnum << 9) | (ffb00 << 8) | byte1).astype(
                    jnp.int32)
                csat = csat | (need & (ffnum >= jnp.uint32(1 << 22))
                               ).astype(jnp.uint32)
                cache = jnp.where(need & flush, low >> 24, cache)
                ffnum = jnp.where(need,
                                  jnp.where(flush, jnp.uint32(0),
                                            ffnum + 1), ffnum)
                rcc = jnp.where(need & flush, jnp.uint32(0), rcc)
                low = jnp.where(need, low << 8, low)
                rng = jnp.where(need, rng << 8, rng)
                emit = need & flush
                evs.append((jnp.where(emit, evt, -1), cnt))
                cnt = cnt + emit.astype(jnp.int32)

            # early exit once every block's events are exhausted: the
            # remaining grid steps still run (grid is static) but this
            # saves nothing — kept simple.

        # ---- once-per-grid-step compaction: slot -> rank row ----
        over = cnt > capk
        csat = csat | over.astype(jnp.uint32)
        out_rows = []
        for rk in range(capk):
            row = jnp.zeros((sb, BT), jnp.int32)
            for ev, rank in evs:
                row = row + jnp.where((rank == rk) & (ev >= 0), ev, 0)
            out_rows.append(row)
        ev_ref[:] = jnp.concatenate(
            [jnp.stack(out_rows, axis=0),
             cnt[None],
             csat.astype(jnp.int32)[None]], axis=0)
        rc[:] = jnp.stack(
            [low, rng, cache, ffnum, rcc, csat,
             jnp.zeros((sb, BT), jnp.uint32),
             jnp.zeros((sb, BT), jnp.uint32)], axis=0)
        rcf_ref[:] = rc[:]

    return kernel


def _sort_chunked(ops, R):
    """lax.sort along dim 0, column-chunked so each operand stays
    under SORT_B bytes (the measured XLA sort cliff)."""
    Bp = ops[0].shape[1]
    cols = max((SORT_B // max(R * 4, 1)) // 128 * 128, 128)
    if cols >= Bp:
        return lax.sort(ops, dimension=0, num_keys=1)
    outs = [[] for _ in ops]
    for c0 in range(0, Bp, cols):
        res = lax.sort([o[:, c0:c0 + cols] for o in ops],
                       dimension=0, num_keys=1)
        for k, r in enumerate(res):
            outs[k].append(r)
    return [jnp.concatenate(o, axis=1) for o in outs]


@functools.partial(jax.jit, static_argnames=("per_r", "capk", "bv",
                                             "interpret"))
def _rc_vmem(af3, tt3, lens3, per_r: int = PER_R, capk: int = 24,
             bv: int = 0, interpret: bool = False):
    """af3 (Kp, SB, C) i32 / tt3 (Kp//2, SB, C) i32 triple streams
    (block b lives at sublane b // C, column b % C); lens3 (1, SB, C)
    i32 event counts.  ``bv``: real-block column count (the stitch
    sorts and output planes trim to it — block b IS column b, padding
    columns carry no data); 0 = all.  Returns (pk4 (ceil(R/4), bv)
    i32 — compacted
    event BYTES packed 4 per i32, exc_pos/exc_val (R, Bp) i32
    front-compacted exception events (position = event rank), n (Bp,)
    i32 event counts, exc_n (Bp,) i32, rcf (Bp, 8) u32, saturated
    bool — saturation includes capk overflow; caller escalates)."""
    Kp, sb, C = af3.shape
    NB = C // BT
    KO = Kp // per_r
    kern = _build_rc_kernel(per_r, capk, sb)
    rows = capk + 2
    ev, rcf = pl.pallas_call(
        kern,
        grid=(NB, KO),
        in_specs=[
            pl.BlockSpec((per_r, sb, BT), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((per_r // 2, sb, BT), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sb, BT), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, sb, BT), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, sb, BT), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((KO * rows, sb, C), jnp.int32),
            jax.ShapeDtypeStruct((8, sb, C), jnp.uint32),
        ),
        scratch_shapes=[pltpu.VMEM((8, sb, BT), jnp.uint32)],
        interpret=interpret,
    )(af3, tt3, lens3)

    # ---- global stitch: rows are compacted per grid step, so one
    # sort keyed by (grid step, rank) places them.  Everything from
    # here on runs on the REAL columns only (block b = column b). ----
    Bp = sb * C
    Bv = min(_cdiv(max(bv, 1), 128) * 128, Bp) if bv else Bp
    el = ev.reshape(KO, rows, sb, C)
    sat = jnp.any(el[:, capk + 1, :, :].reshape(KO, Bp)[:, :Bv] > 0)
    c3 = el[:, capk].reshape(KO, Bp)[:, :Bv]
    n = c3.sum(axis=0).astype(jnp.int32)
    evf = el[:, :capk].reshape(KO * capk, Bp)[:, :Bv]
    R = KO * capk
    koi = lax.broadcasted_iota(jnp.int32, (KO, capk, Bv), 0)
    rnk = lax.broadcasted_iota(jnp.int32, (KO, capk, Bv), 1)
    valid = (rnk < c3[:, None, :]).reshape(R, Bv)
    key = jnp.where(valid, (koi * capk + rnk).reshape(R, Bv),
                    jnp.int32(1 << 30))
    _, evs = _sort_chunked([key, evf], R)

    # byte plane packed 4 per i32 (events are overwhelmingly plain
    # bytes; D2H through the axon tunnel is the next-largest cost)
    R4 = _cdiv(R, 4) * 4
    if R4 > R:
        evs_p = jnp.concatenate(
            [evs, jnp.zeros((R4 - R, Bv), jnp.int32)], axis=0)
    else:
        evs_p = evs
    e4 = (evs_p & 0xFF).reshape(R4 // 4, 4, Bv)
    pk4 = (e4[:, 0] | (e4[:, 1] << 8) | (e4[:, 2] << 16)
           | (e4[:, 3] << 24))

    # exceptions: ONLY ffnum>0 events need host patching (the run of
    # deferred bytes inserts after byte1).  The carry flag (bit 8) is
    # already folded into byte1 = (cache+carry)&0xFF by the kernel, so
    # carry-only events (~25% of all events!) are NOT exceptions —
    # deferral events are ~1/256 of flushes.
    exc = evs >= 512
    exc_n = exc.sum(axis=0).astype(jnp.int32)
    iota_r = lax.broadcasted_iota(jnp.int32, (R, Bv), 0)
    kx = jnp.where(exc, iota_r, jnp.int32(1 << 30))
    _, exc_pos, exc_val = _sort_chunked(
        [kx, jnp.where(exc, iota_r, 0), jnp.where(exc, evs, 0)], R)

    rcfT = jnp.transpose(rcf.reshape(8, Bp)[:, :Bv], (1, 0))
    return pk4, exc_pos, exc_val, n, exc_n, rcfT, sat


def _expand_block(by: np.ndarray, n: int, exc_pos, exc_val,
                  exc_n: int, tail: bytes) -> bytes:
    """byte plane (u8, >= n) + exception patches -> payload bytes."""
    body = by[:n]
    if exc_n:
        ep = exc_pos[:exc_n].astype(np.int64)
        ev = exc_val[:exc_n].astype(np.int64)
        ffn = ev >> 9
        ffb = np.where(ev & 0x100, 0, 0xFF).astype(np.uint8)
        # insert each run AFTER its event byte (RangeEncoder._shift_low
        # emits byte1 then the ffnum run)
        out = np.empty(n + int(ffn.sum()), np.uint8)
        prev = 0
        w = 0
        for k in range(exc_n):
            p = int(ep[k]) + 1
            seg = body[prev:p]
            out[w:w + len(seg)] = seg
            w += len(seg)
            r = int(ffn[k])
            out[w:w + r] = ffb[k]
            w += r
            prev = p
        seg = body[prev:n]
        out[w:w + len(seg)] = seg
        body = out
    return body.tobytes() + tail


def _pull_chunked(dev_arr, rows: int):
    """D2H of dev_arr[:rows] in column chunks with async staging (the
    plain np.asarray path through the axon tunnel measures ~0.2 MB/s;
    chunked async pulls measure ~30 MB/s)."""
    sl = dev_arr[:rows]
    Bp = sl.shape[1]
    CH = max(Bp // 8, 128)
    parts = [sl[:, c:c + CH] for c in range(0, Bp, CH)]
    for p in parts:
        p.copy_to_host_async()
    return np.concatenate([np.asarray(p) for p in parts], axis=1)


def enc_triples_batch(triples: list, per_r: int = PER_R,
                      interpret: bool = False):
    """Encode B blocks' (acc, f, tot) u16 triple arrays into reference
    range-coder payloads.  Returns a list of bytes, or None when the
    carry chain saturates the event encoding (caller falls back)."""
    from .arith_jax import _finish_rc
    B = len(triples)
    lens = np.asarray([len(t[0]) for t in triples], np.int32)
    Kp = _cdiv(max(int(lens.max()), 1), 2 * per_r) * 2 * per_r
    sb = min(SB, _cdiv(B, BT))         # small batches: fewer sublanes
    NB = _cdiv(B, sb * BT)
    C = NB * BT
    Bp = sb * C
    af = np.zeros((Bp, Kp), np.int32)
    tt = np.zeros((Bp, Kp), np.uint16)
    for b, (acc, f, tot) in enumerate(triples):
        k = len(acc)
        af[b, :k] = acc.astype(np.int32) | (f.astype(np.int32) << 16)
        tt[b, :k] = tot
    lensp = np.zeros(Bp, np.int32)
    lensp[:B] = lens
    # block b -> sublane b // C, column b % C
    af3 = np.transpose(af.reshape(sb, C, Kp), (2, 0, 1))
    tt2 = tt.view(np.int32)                       # (Bp, Kp//2) LE pairs
    tt3 = np.transpose(tt2.reshape(sb, C, Kp // 2), (2, 0, 1))
    l3 = lensp.reshape(1, sb, C)
    afj = jnp.asarray(af3)
    ttj = jnp.asarray(tt3)
    lj = jnp.asarray(l3)
    # average events/byte is well under 0.5 at real compression
    # ratios; escalate on per-batch overflow like the rANS tiers
    for capk in (24, 2 * per_r):
        pk4, exc_pos, exc_val, n, exc_n, rcf, sat = _rc_vmem(
            afj, ttj, lj, per_r=per_r, capk=capk, bv=B,
            interpret=interpret)
        if not bool(np.asarray(sat)):
            break
    else:
        return None
    if bool(np.asarray(sat)):
        return None
    n = np.asarray(n)
    exc_n = np.asarray(exc_n)
    rcf = np.asarray(rcf)
    nmax = int(n[:B].max(initial=0))
    xmax = int(exc_n[:B].max(initial=0))
    by = np.ascontiguousarray(
        _pull_chunked(pk4, _cdiv(max(nmax, 1), 4)).T).view(np.uint8)
    if xmax:
        xp = _pull_chunked(exc_pos, xmax).T
        xv = _pull_chunked(exc_val, xmax).T
    res = []
    for b in range(B):
        low, rng, cache, ffnum, rcc = (int(rcf[b, k]) for k in range(5))
        tail = _finish_rc(low, rng, cache, ffnum, rcc)
        res.append(_expand_block(
            by[b], int(n[b]),
            xp[b] if exc_n[b] else None,
            xv[b] if exc_n[b] else None,
            int(exc_n[b]), tail))
    return res
