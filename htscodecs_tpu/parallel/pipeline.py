"""Device pipeline and mesh sharding for the batched rANS engines.

Scaling model (SURVEY.md §2, parallelism inventory): CRAM blocks are
stateless w.r.t. each other, so the pod-scale axis is block-level data
parallelism — shard the block batch over a 1-D ``data`` mesh axis and
let XLA partition the scans (no cross-block collectives exist in the
codec; only result aggregation reduces).

The jitted round-trip step here is the framework's "flagship step":
encode scan -> word compaction -> decode scan -> on-device verification
(returns per-shard mismatch counts, summed by XLA across the mesh).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import rans_jax


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or the given) devices; blocks shard over it."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(mesh: Mesh, arr, batch_axis: int = 0):
    """Place an array with its batch dimension split over the mesh."""
    spec = [None] * arr.ndim
    spec[batch_axis] = mesh.axis_names[0]
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


@functools.partial(jax.jit, static_argnames=("shift", "cap"))
def _encode_core(st_p, fr_p, va_p, shift: int, cap: int):
    xf, words, emits = rans_jax._enc_scan(st_p, fr_p, va_p, shift)
    out, n = rans_jax._enc_compact(xf, words, emits, shift, cap)
    return xf[:, ::-1], out, n


@functools.partial(jax.jit, static_argnames=("shift",))
def _build_sfb(f2d, b2d, shift: int):
    """Device-side slot->symbol LUT construction.

    sfb[b, ctx, slot] = number of symbols whose cumulative start is
    <= slot (minus one) — a fused compare-reduce, no gathers.
    """
    B = f2d.shape[0]
    tot = 1 << shift
    slots = jnp.arange(tot, dtype=jnp.uint32)[None, None, :]
    # symbol(slot) = #{v : cum[v] <= slot} with cum the inclusive
    # cumulative freq by byte value (zero-freq symbols collapse).
    cum = jnp.cumsum(f2d.astype(jnp.uint32), axis=2)  # (B, 256, 256)
    def body(v, acc):
        return acc + (slots >= cum[:, :, v][:, :, None]).astype(jnp.uint8)
    counts = lax.fori_loop(0, 256, body, jnp.zeros((B, 256, tot), jnp.uint8))
    return counts


@functools.partial(jax.jit, static_argnames=("shift", "K", "q"))
def _decode_core_o1(states, words, f2d_u32, b2d_u32, sfb_flat, shift: int,
                    K: int, q: int):
    fbb = ((f2d_u32 << 16) | b2d_u32).reshape(states.shape[0], -1)
    syms, xf, pf = rans_jax._dec_o1_scan(
        states, words, jnp.zeros(states.shape[:1], jnp.int32),
        sfb_flat, fbb, shift, K, q)
    return syms


@functools.partial(jax.jit, static_argnames=("shift", "K", "q", "N"))
def roundtrip_o1(st_p, fr_p, va_p, f2d, b2d, ref_syms, shift: int, K: int,
                 q: int, N: int):
    """Full codec step: encode, compact, decode, verify — one jit.

    Shardable along the batch axis; returns the global mismatch count
    (XLA inserts the cross-shard reduction).
    """
    B = ref_syms.shape[0]
    cap = N + 16
    states, words, n = _encode_core(st_p, fr_p, va_p, shift, cap)
    sfb = _build_sfb(f2d, b2d, shift).reshape(B, -1).astype(jnp.uint32)
    syms = _decode_core_o1(states.astype(jnp.uint32), words.astype(jnp.uint32),
                           f2d.astype(jnp.uint32), b2d.astype(jnp.uint32),
                           sfb, shift, K, q)
    # reassemble (K, B, 4) -> (B, N)
    main = jnp.transpose(syms[:q], (1, 2, 0)).reshape(B, 4 * q)
    out = main[:, :N] if 4 * q >= N else jnp.concatenate(
        [main, jnp.transpose(syms[q:, :, 3], (1, 0))], axis=1)
    mism = jnp.sum(out.astype(jnp.uint32) != ref_syms.astype(jnp.uint32))
    comp_bytes = 16 * B + 2 * jnp.sum(n)
    return mism, comp_bytes


@functools.partial(jax.jit, static_argnames=("shift", "N"))
def roundtrip_o1_v2(blocks, alpha, packed, shift: int, N: int):
    """v2 flagship step: dense-alphabet encode -> chunkify -> decode ->
    on-device verify, one jit.  blocks (B,N) u8, alpha (B,A) u8,
    packed (B,A,A) i32.  Returns (mismatches, compressed bytes)."""
    from ..ops import rans_v2
    B = blocks.shape[0]
    states, words, n, overflow = rans_v2._enc_scan_v2(
        blocks, alpha, packed, shift, 1,
        **rans_v2.get_enc_variant())
    cap = words.shape[1]
    NC = max(-(-cap // rans_v2.CHUNK), 2)
    padded = jnp.zeros((B, NC * rans_v2.CHUNK), jnp.uint32)
    padded = padded.at[:, :cap].set(words.astype(jnp.uint32))
    chunks = padded.reshape(B * NC, rans_v2.CHUNK)
    q = N >> 2
    K = q + (N - 4 * q)
    out = rans_v2._dec_v2_to_bytes(states, chunks, packed, alpha,
                                   shift, K, q, N, 1,
                                   **rans_v2.get_dec_variant())
    # a compaction overflow (locally-expanding data) is a failure here:
    # the standalone encoders re-run the exact path instead.
    mism = jnp.sum(out != blocks) + overflow.astype(jnp.int64)
    comp_bytes = 16 * B + 2 * jnp.sum(n)
    return mism, comp_bytes


def sharded_roundtrip_o1_v2(mesh: Mesh, blocks, alpha, packed, shift: int,
                            N: int):
    """roundtrip_o1_v2 under shard_map over the mesh's data axis:
    every per-block array is local to its shard (the codec has no
    cross-block dataflow), and only the scalar verdicts reduce."""
    axis = mesh.axis_names[0]

    def local(blocks, alpha, packed):
        mism, nbytes = roundtrip_o1_v2(blocks, alpha, packed, shift, N)
        return (lax.psum(mism, axis), lax.psum(nbytes, axis))

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        # scan carries are initialised from constants (unvarying);
        # skip the varying-manual-axes check rather than pcast each.
        check_vma=False,
    )
    return fn(blocks, alpha, packed)


def build_o1_tables_dense(blocks: np.ndarray, threads: bool = True):
    """Per-block order-1 dense tables via the native kernels (thread
    pool: ctypes releases the GIL).  Returns (alpha, packed, shift,
    headers) or None if unavailable / alphabet too wide / mixed shift."""
    from .. import native
    from ..ops import rans_v2
    if not native.available():
        return None
    import os

    if threads and len(blocks) > 2 and (os.cpu_count() or 1) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(16, os.cpu_count() or 4)) as pool:
            res = list(pool.map(native.build_tables_o1_dense, list(blocks)))
    else:
        res = [native.build_tables_o1_dense(b) for b in blocks]
    if any(r is None for r in res):
        return None
    shifts = np.array([r[3] for r in res], np.int32)
    if not (shifts == shifts[0]).all():
        return None
    dense = rans_v2.densify_builds((r[1], r[2]) for r in res)
    if dense is None:
        return None
    alpha, packed, _ = dense
    return alpha, packed, int(shifts[0]), [r[0] for r in res]


def build_o1_tables(blocks: np.ndarray):
    """Per-block order-1 table construction (native kernels when
    available, Python oracle otherwise).  Returns (start2d, freq2d,
    shifts, headers)."""
    from .. import native
    B = blocks.shape[0]
    st = np.zeros((B, 256, 256), np.uint32)
    fr = np.zeros((B, 256, 256), np.uint32)
    shifts = np.zeros(B, np.int32)
    headers = []
    if native.available():
        for b in range(B):
            hdr, s, f, sh = native.build_tables_o1(blocks[b])
            st[b], fr[b], shifts[b] = s, f, sh
            headers.append(hdr)
        return st, fr, shifts, headers
    from ..ops import freq as fq
    for b in range(B):
        data = blocks[b]
        Fnp, Tnp = fq.hist1_4(data)
        F = Fnp.astype(np.int64)
        T = Tnp.astype(np.int64)
        q = len(data) >> 2
        for k in (1, 2, 3):
            F[0][data[k * q]] += 1
        T[0] += 3
        A = fq.present8(data).astype(np.int64)
        A[0] = 1
        shift, S = fq.compute_shift(A, F, T)
        shifts[b] = shift
        hdr = bytearray([0])
        fq.encode_alphabet(hdr, A)
        for i in range(256):
            if not A[i]:
                continue
            mv = S[i]
            if shift == fq.TF_SHIFT_O1_FAST and mv > fq.TOTFREQ_O1_FAST:
                mv = fq.TOTFREQ_O1_FAST
            Fi = [int(v) for v in F[i]]
            fq.normalise_freq(Fi, int(T[i]), mv)
            fq.encode_freq_d(hdr, A, Fi)
            fq.normalise_freq_shift(Fi, mv, 1 << shift)
            x = 0
            for j in range(256):
                st[b, i, j] = x
                x += Fi[j]
                fr[b, i, j] = Fi[j]
        hdr[0] = shift << 4
        headers.append(bytes(hdr))
    return st, fr, shifts, headers


def build_o1_batch_inputs(blocks: np.ndarray, start2d: np.ndarray,
                          freq2d: np.ndarray, shift: int):
    """Host-side preparation of the jit inputs for roundtrip_o1 /
    encode: per-step coding params in processing order (u32) plus
    dense tables."""
    B, N = blocks.shape
    q = N >> 2
    tail = N - 4 * q
    K = tail + q

    ctx = np.zeros((K, B, 4), dtype=np.int32)
    sym = np.zeros((K, B, 4), dtype=np.int32)
    valid = np.zeros((K, B, 4), dtype=bool)
    for s in range(tail):
        i3 = N - 2 - s
        ctx[s, :, 3] = blocks[:, i3]
        sym[s, :, 3] = blocks[:, i3 + 1]
        valid[s, :, 3] = True
    if q >= 2:
        ks = np.arange(q - 2, -1, -1)
        c = blocks[:, (ks[:, None] + np.arange(4)[None, :] * q)]
        l = blocks[:, (ks[:, None] + np.arange(4)[None, :] * q + 1)]
        ctx[tail:tail + q - 1] = np.transpose(c, (1, 0, 2))
        sym[tail:tail + q - 1] = np.transpose(l, (1, 0, 2))
        valid[tail:tail + q - 1] = True
    ctx[K - 1] = 0
    sym[K - 1] = blocks[:, (np.arange(4) * q)]
    valid[K - 1] = True

    b_idx = np.arange(B)[None, :, None]
    st = start2d[b_idx, ctx, sym].astype(np.uint32)
    fr = freq2d[b_idx, ctx, sym].astype(np.uint32)
    st_p = np.ascontiguousarray(st[:, :, ::-1])
    fr_p = np.ascontiguousarray(fr[:, :, ::-1])
    va_p = np.ascontiguousarray(valid[:, :, ::-1])
    return st_p, fr_p, va_p, K, q
