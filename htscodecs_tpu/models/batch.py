"""Batched block codec API.

Compresses/decompresses many independent CRAM blocks at once, routing
the entropy payload work to the batched TPU engines (ops/rans_jax.py)
when a group is large enough, and to the native host kernels otherwise.
Streams are byte-identical to `rans4x16.compress` / the C reference in
every path.

Batching rules: blocks group by (length, order[, table precision]) —
the scans are shape-specialised.  Blocks that use transform flags
(PACK/RLE/STRIPE/CAT) fall back to the single-block host path; the
transforms are cheap host array ops and the entropy payloads they
produce re-enter this API recursively in future rounds.
"""

from __future__ import annotations

from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from . import rans4x16
from .. import native
from ..utils import varint

# Below this many blocks in a shape group, the host path wins (device
# dispatch latency + staging dominate tiny batches).
DEVICE_MIN_GROUP = 16

# Host table construction is native C via ctypes (GIL released), so a
# thread pool scales it across cores.
_POOL = ThreadPoolExecutor(max_workers=min(16, (__import__("os").cpu_count() or 4)))


def _pmap(fn, items):
    if len(items) <= 2:
        return [fn(x) for x in items]
    return list(_POOL.map(fn, items))


def _as_u8(b) -> np.ndarray:
    if isinstance(b, np.ndarray):
        return b.astype(np.uint8, copy=False)
    return np.frombuffer(bytes(b), dtype=np.uint8)


def compress_blocks(blocks, order: int, engine: str = "auto") -> list[bytes]:
    """Compress a sequence of blocks with the rANS 4x16 codec.

    engine: "auto" | "device" | "host".
    """
    arrs = [_as_u8(b) for b in blocks]
    out: list[bytes | None] = [None] * len(arrs)

    plain_order = order in (0, 1)
    groups: dict[int, list[int]] = defaultdict(list)
    for i, a in enumerate(arrs):
        if plain_order and engine != "host" and len(a) >= 32:
            groups[len(a)].append(i)
        else:
            out[i] = rans4x16.compress(a, order)

    for n, idxs in groups.items():
        if engine != "device" and len(idxs) < DEVICE_MIN_GROUP:
            for i in idxs:
                out[i] = rans4x16.compress(arrs[i], order)
            continue
        batch = np.stack([arrs[i] for i in idxs])
        streams = (_compress_batch_o1(batch) if order == 1
                   else _compress_batch_o0(batch))
        for i, s in zip(idxs, streams):
            out[i] = s

    return out  # type: ignore[return-value]


def _frame(order_byte: int, n: int, body: bytes, data: np.ndarray) -> bytes:
    """Wrapper framing incl. the CAT fallback (compressed >= input)."""
    head = bytearray([order_byte])
    varint.put_uint(head, n)
    if len(body) >= n:
        head[0] = (head[0] & ~3 & 0xFF) | rans4x16.X_CAT
        return bytes(head) + data.tobytes()
    return bytes(head) + body


def _compress_batch_o0(batch: np.ndarray) -> list[bytes]:
    from ..ops import rans_jax, rans_v2
    B, N = batch.shape
    if not native.available():
        return [rans4x16.compress(batch[b], 0) for b in range(B)]
    res = _pmap(native.build_tables_o0, list(batch))
    if any(r is None for r in res):
        return [rans4x16.compress(batch[b], 0) for b in range(B)]
    hdrs = [r[0] for r in res]
    starts = np.stack([r[1] for r in res])
    freqs = np.stack([r[2] for r in res])
    dense = rans_v2.densify_group_o0(freqs, starts)
    if dense is not None:
        alpha, packed, _ = dense
        states, words, counts = rans_v2.enc_o0_batch(batch, alpha, packed)
    else:
        states, words, counts = rans_jax.enc_o0_batch(batch, starts, freqs, 12)
    out = []
    for b in range(B):
        body = hdrs[b] + states[b].astype("<u4").tobytes() + \
            words[b, :counts[b]].astype("<u2").tobytes()
        out.append(_frame(0, N, body, batch[b]))
    return out


def _compress_batch_o1(batch: np.ndarray) -> list[bytes]:
    from ..ops import rans_jax, rans_v2
    B, N = batch.shape
    if N < 8 or not native.available():
        return [rans4x16.compress(batch[b], 1) for b in range(B)]
    res = _pmap(native.build_tables_o1_dense, list(batch))
    if any(r is None for r in res):
        # wide alphabet somewhere: rebuild sparse, use the v1 engines
        res_s = _pmap(native.build_tables_o1, list(batch))
        hdrs = [r[0] for r in res_s]
        shifts = np.array([r[3] for r in res_s], np.int32)
        out: list[bytes | None] = [None] * B
        for shift in np.unique(shifts):
            sel = np.flatnonzero(shifts == shift)
            starts = np.stack([res_s[b][1] for b in sel])
            freqs = np.stack([res_s[b][2] for b in sel])
            states, words, counts = rans_jax.enc_o1_batch(
                batch[sel], starts, freqs, int(shift))
            for k, b in enumerate(sel):
                body = hdrs[b] + states[k].astype("<u4").tobytes() + \
                    words[k, :counts[k]].astype("<u2").tobytes()
                out[b] = _frame(1, N, body, batch[b])
        return out  # type: ignore[return-value]
    hdrs = [r[0] for r in res]
    shifts = np.array([r[3] for r in res], np.int32)
    out = [None] * B
    for shift in np.unique(shifts):
        sel = np.flatnonzero(shifts == shift)
        sub = batch[sel]
        alpha, packed, _ = rans_v2.densify_builds(
            (res[b][1], res[b][2]) for b in sel)
        states, words, counts = rans_v2.enc_o1_batch(
            sub, alpha, packed, int(shift))
        for k, b in enumerate(sel):
            body = hdrs[b] + states[k].astype("<u4").tobytes() + \
                words[k, :counts[k]].astype("<u2").tobytes()
            out[b] = _frame(1, N, body, batch[b])
    return out  # type: ignore[return-value]


def r4x8_compress_blocks(blocks, order: int, engine: str = "auto") -> list[bytes]:
    """Compress a sequence of blocks with the rANS 4x8 codec (CRAM
    3.0), batching the payload scans onto the device."""
    from . import rans4x8
    from ..ops import rans_v2, rans8_v2
    arrs = [_as_u8(b) for b in blocks]
    out: list[bytes | None] = [None] * len(arrs)
    groups: dict[int, list[int]] = defaultdict(list)
    for i, a in enumerate(arrs):
        if order in (0, 1) and engine != "host" and len(a) >= 8:
            groups[len(a)].append(i)
        else:
            out[i] = rans4x8.compress(a, order)
    for n, idxs in groups.items():
        if engine != "device" and len(idxs) < DEVICE_MIN_GROUP:
            for i in idxs:
                out[i] = rans4x8.compress(arrs[i], order)
            continue
        batch = np.stack([arrs[i] for i in idxs])
        if order == 1:
            res = [rans4x8.build_tables_o1(b) for b in batch]
            dense = rans_v2.densify_builds((r[1], r[2]) for r in res)
        else:
            res = [rans4x8.build_tables_o0(b) for b in batch]
            dense = rans_v2.densify_group_o0(
                np.stack([r[1] for r in res]),
                np.stack([r[2] for r in res]))
        if dense is None:
            for i in idxs:
                out[i] = rans4x8.compress(arrs[i], order)
            continue
        alpha, packed, _ = dense
        enc = (rans8_v2.enc_o1_batch if order else rans8_v2.enc_o0_batch)
        states, wbytes, counts = enc(batch, alpha, packed)
        for k, i in enumerate(idxs):
            tab = res[k][0]
            payload = states[k].astype("<u4").tobytes() + \
                wbytes[k, :counts[k]].astype(np.uint8).tobytes()
            comp_sz = len(tab) + len(payload)
            head = bytearray([order])
            head += comp_sz.to_bytes(4, "little")
            head += n.to_bytes(4, "little")
            out[i] = bytes(head) + tab + payload
    return out  # type: ignore[return-value]


def r4x8_uncompress_blocks(streams, engine: str = "auto") -> list[bytes]:
    """Decompress a sequence of rANS 4x8 streams, batching payload
    scans onto the device."""
    from . import rans4x8
    from ..ops import rans_v2, rans8_v2
    streams = [bytes(s) for s in streams]
    out: list[bytes | None] = [None] * len(streams)
    groups: dict[tuple, list] = defaultdict(list)
    for i, s in enumerate(streams):
        if len(s) < 9 or s[0] not in (0, 1) or engine == "host":
            out[i] = rans4x8.uncompress(s)
            continue
        osz = int.from_bytes(s[5:9], "little")
        groups[(s[0], osz)].append((i, s))
    for (order, osz), items in groups.items():
        if (engine != "device" and len(items) < DEVICE_MIN_GROUP) or osz < 4:
            for i, s in items:
                out[i] = rans4x8.uncompress(s)
            continue
        parsed = []
        ok = True
        for i, s in items:
            r = (rans4x8.parse_tables_o1(s) if order
                 else rans4x8.parse_tables_o0(s))
            if r is None:
                ok = False
                break
            parsed.append(r)
        dense = None
        if ok:
            if order == 1:
                dense = rans_v2.densify_builds(
                    (r[2], r[3]) for r in parsed)
            else:
                dense = rans_v2.densify_group_o0(
                    np.stack([r[4] for r in parsed]),
                    np.stack([r[5] for r in parsed]))
        if dense is None:
            for i, s in items:
                out[i] = rans4x8.uncompress(s)
            continue
        alpha, packed, _ = dense
        B = len(items)
        W = max(len(s) - r[0] - 16 for (_i, s), r in zip(items, parsed))
        states = np.zeros((B, 4), np.uint32)
        stream = np.zeros((B, max(W, 1)), np.uint8)
        bad = False
        for k, ((_i, s), r) in enumerate(zip(items, parsed)):
            pos = r[0]
            states[k] = np.frombuffer(s[pos:pos + 16], "<u4")
            if (states[k] < rans8_v2.RANS8_L).any():
                bad = True
                break
            body = np.frombuffer(s[pos + 16:], np.uint8)
            stream[k, :len(body)] = body
        if bad:
            for i, s in items:
                out[i] = rans4x8.uncompress(s)
            continue
        dec = (rans8_v2.dec_o1_batch if order else rans8_v2.dec_o0_batch)
        res = dec(states, stream, osz, alpha, packed)
        for k, (i, _s) in enumerate(items):
            out[i] = res[k].tobytes()
    return out  # type: ignore[return-value]


def arith_compress_blocks(blocks, order: int, engine: str = "auto") -> list[bytes]:
    """Compress a sequence of blocks with the adaptive arith codec.

    engine: "auto" (native host kernels on a thread pool — the
    adaptive coder is byte-serial so a host core beats the chip for
    this codec), "device" (batched TPU scan engines, bitstream-exact),
    or "host" (pure-Python oracle path).
    """
    from . import arith as arithmod
    arrs = [_as_u8(b) for b in blocks]
    if engine != "device":
        return [arithmod.compress(a, order) for a in arrs]

    from ..ops import arith_jax
    out: list[bytes | None] = [None] * len(arrs)
    plain = order in (0, 1)
    groups: dict[int, list[int]] = defaultdict(list)
    for i, a in enumerate(arrs):
        if plain and len(a) >= 8:
            groups[len(a)].append(i)
        else:
            out[i] = arithmod.compress(a, order)
    for n, idxs in groups.items():
        batch = np.stack([arrs[i] for i in idxs])
        ms = batch.max(axis=1).astype(np.int32) + 1
        lens = np.full(len(idxs), n, np.int32)
        res = arith_jax.enc_batch(batch, lens, ms, order)
        if res is None:
            for i in idxs:
                out[i] = arithmod.compress(arrs[i], order)
            continue
        for k, i in enumerate(idxs):
            head = bytearray([order])
            varint.put_uint(head, n)
            body = bytes([int(ms[k]) & 0xFF]) + res[k]
            if len(body) >= n:
                out[i] = arithmod.compress(arrs[i], order)  # CAT fallback
            else:
                out[i] = bytes(head) + body
    return out  # type: ignore[return-value]


def arith_uncompress_blocks(streams, out_sizes=None,
                            engine: str = "auto") -> list[bytes]:
    """Decompress a sequence of arith streams (device-batched when
    engine="device" and the streams are plain order 0/1)."""
    from . import arith as arithmod
    streams = [bytes(s) for s in streams]
    if engine != "device":
        return [arithmod.uncompress(
            s, out_sizes[i] if out_sizes is not None else None)
            for i, s in enumerate(streams)]

    from ..ops import arith_jax
    out: list[bytes | None] = [None] * len(streams)
    groups: dict[tuple, list] = defaultdict(list)
    for i, s in enumerate(streams):
        if not s:
            raise ValueError("corrupt arith stream")
        flags = s[0]
        if (flags & ~1) != 0 or len(s) < 3:
            out[i] = arithmod.uncompress(
                s, out_sizes[i] if out_sizes is not None else None)
            continue
        osz, pos = varint.get_uint(s, 1, len(s))
        groups[(flags & 1, osz)].append((i, s, pos))
    for (order, osz), items in groups.items():
        payloads = [s[pos + 1:] for _, s, pos in items]
        ms = [s[pos] for _, s, pos in items]
        dec = arith_jax.dec_batch(payloads, [osz] * len(items), ms, order)
        if dec is None:
            for i, s, _ in items:
                out[i] = arithmod.uncompress(s)
            continue
        for k, (i, _s, _p) in enumerate(items):
            out[i] = dec[k][:osz].tobytes()
    return out  # type: ignore[return-value]


def uncompress_blocks(streams, out_sizes=None, engine: str = "auto") -> list[bytes]:
    """Decompress a sequence of rANS 4x16 streams."""
    streams = [bytes(s) for s in streams]
    out: list[bytes | None] = [None] * len(streams)

    # classify: plain order 0/1 with stored size -> batched path
    groups: dict[tuple, list] = defaultdict(list)
    for i, s in enumerate(streams):
        if not s:
            raise ValueError("corrupt rans4x16 stream")
        flags = s[0]
        plain = (flags & ~1) == 0 and engine != "host" and native.available()
        if not plain:
            out[i] = rans4x16.uncompress(
                s, out_sizes[i] if out_sizes is not None else None)
            continue
        osz, pos = varint.get_uint(s, 1, len(s))
        order = flags & 1
        if order == 1:
            r = native.parse_tables_o1_dense(s[pos:])
            if r is not None:
                off, alpha, packed, shift = r
                groups[(1, osz, shift)].append(
                    (i, s, pos + off, alpha, packed))
            else:
                r = native.parse_tables_o1(s[pos:])
                if r is None:
                    raise ValueError("corrupt rans4x16 stream")
                off, sfb, f2d, b2d, shift = r
                groups[(1, osz, shift, "sparse")].append(
                    (i, s, pos + off, sfb, f2d, b2d))
        else:
            r = native.parse_tables_o0(s[pos:])
            if r is None:
                raise ValueError("corrupt rans4x16 stream")
            off, ssym, sfreq, sbase = r
            groups[(0, osz)].append((i, s, pos + off, ssym, sfreq, sbase))

    from ..ops import rans_jax, rans_v2
    for key, items in groups.items():
        if engine != "device" and len(items) < DEVICE_MIN_GROUP:
            for it in items:
                i, s = it[0], it[1]
                out[i] = rans4x16.uncompress(s)
            continue
        order, osz = key[0], key[1]
        B = len(items)
        W = max((len(s) - off - 16) // 2 for _, s, off, *_ in items)
        states = np.zeros((B, 4), np.uint32)
        words = np.zeros((B, max(W, 1)), "<u2")
        for k, (_, s, off, *_t) in enumerate(items):
            states[k] = np.frombuffer(s[off:off + 16], "<u4")
            w = np.frombuffer(s[off + 16: off + 16 + 2 * ((len(s) - off - 16) // 2)], "<u2")
            words[k, :len(w)] = w
        if order == 1:
            shift = key[2]
            if len(key) == 3:     # dense-parsed group
                alpha, packed, _ = rans_v2.densify_builds(
                    (t[3], t[4]) for t in items)
                dec = rans_v2.dec_o1_batch(states, words, osz, alpha,
                                           packed, shift)
            else:                  # sparse fallback (alphabet > 96)
                sfb = np.stack([t[3] for t in items])
                f2d = np.stack([t[4] for t in items])
                b2d = np.stack([t[5] for t in items])
                dec = rans_jax.dec_o1_batch(states, words, osz, sfb, f2d,
                                            b2d, shift)
        else:
            # per-slot LUTs -> per-symbol tables: sbase[m] = m - start
            frs = np.zeros((B, 256), np.uint32)
            sts = np.zeros((B, 256), np.uint32)
            tot = items[0][4].shape[0]
            slot = np.arange(tot, dtype=np.uint32)
            for k, t in enumerate(items):
                sym = t[3].astype(np.int64)
                frs[k, sym] = t[4]
                sts[k, sym] = slot - t[5]
            dense = rans_v2.densify_group_o0(frs, sts)
            if dense is not None:
                alpha, packed, _ = dense
                dec = rans_v2.dec_o0_batch(states, words, osz, alpha, packed)
            else:
                ssym = np.stack([t[3] for t in items])
                sfreq = np.stack([t[4] for t in items])
                sbase = np.stack([t[5] for t in items])
                dec = rans_jax.dec_o0_batch(states, words, osz, ssym,
                                            sfreq, sbase, 12)
        for k, it in enumerate(items):
            out[it[0]] = dec[k].tobytes()

    return out  # type: ignore[return-value]
