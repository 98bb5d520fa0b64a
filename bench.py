#!/usr/bin/env python
"""Headline benchmark: rANS 4x16 order-1 encode+decode on TPU.

Batch-scale analog of the reference test tools' ``-t`` mode (timed
enc/dec passes over the same data, MB/s): G unique synthetic
NovaSeq-like 64 KiB quality blocks are tiled to a B-block batch on
device and coded with the dense-alphabet v2 engines
(htscodecs_tpu/ops/rans_v2.py).

Accounting (details in docs/PERF_NOTES.md):
- t_enc = per-block host table build (native C kernels on a thread
  pool, measured on the unique blocks and scaled to B) + the full
  on-device encode jit (byte->dense remap, param fetch, reverse scan,
  sort compaction).
- t_dec = scaled host table parse + on-device decode jit (dense table
  scan + window refills + dense->byte map).
- H2D/D2H staging is excluded: the axon test tunnel moves bulk data at
  ~0.25-30 MB/s, which would only measure the harness (the C tool's
  -t likewise excludes file IO).  Correctness is verified ON DEVICE
  (mismatch count) plus a one-block byte-exact readback against the
  native host encoder.
- Baseline: the C reference on this host runs order-1 at ~140 MB/s enc
  and ~350 MB/s dec single-threaded => aggregate 2*bytes/(t_enc+t_dec)
  ~= 200 MB/s.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_AGG_MBPS = 200.0
B = 12288
G = 8
N = 65536
REPS = 3


def synth_quality(n_blocks, n, seed=42):
    """NovaSeq-like 4-symbol quality stream with runs."""
    rng = np.random.default_rng(seed)
    syms = np.array([2, 12, 23, 37], np.uint8) + 33
    out = np.empty((n_blocks, n), np.uint8)
    for b in range(n_blocks):
        vals = rng.choice(4, size=n // 8, p=[0.05, 0.10, 0.15, 0.70])
        lens = rng.geometric(0.25, size=n // 8).clip(1, 60)
        seq = np.repeat(vals, lens)[:n]
        if len(seq) < n:
            seq = np.pad(seq, (0, n - len(seq)), constant_values=3)
        out[b] = syms[seq]
    return out


def main():
    t_setup = time.time()
    import jax
    import jax.numpy as jnp
    from htscodecs_tpu import native
    from htscodecs_tpu.ops import rans_v2
    from htscodecs_tpu.parallel import pipeline

    uniq = synth_quality(G, N)
    total_mb = B * N / 1e6
    reps = B // G
    blocks = np.tile(uniq, (reps, 1))

    # Host table work: native C kernels (thread pool when >1 core),
    # measured for real over the full batch.
    _warm = pipeline.build_o1_tables_dense(uniq, threads=True)
    t_tables = None
    for _ in range(2):          # steady-state: best of two passes
        t0 = time.time()
        dense = pipeline.build_o1_tables_dense(blocks, threads=True)
        dt = time.time() - t0
        t_tables = dt if t_tables is None else min(t_tables, dt)
    if dense is None:
        print(json.dumps({"metric": "rans4x16_o1_enc_dec_aggregate",
                          "value": 0.0, "unit": "MB/s", "vs_baseline": 0.0,
                          "error": "table build unavailable"}))
        return 1
    alpha, packed, shift, _hdrs = dense

    jb = jnp.asarray(blocks)
    ja = jnp.asarray(alpha)
    jp = jnp.asarray(packed)

    # ---- encode ----
    st_d, w_d, n_d, ovf = rans_v2._enc_scan_v2(jb, ja, jp, shift, 1)
    np.asarray(jnp.sum(n_d))
    assert not bool(np.asarray(ovf)), "compaction overflow on bench data"
    t0 = time.time()
    for _ in range(REPS):
        st_d, w_d, n_d, ovf = rans_v2._enc_scan_v2(jb, ja, jp, shift, 1)
    np.asarray(jnp.sum(n_d))
    t_enc_dev = (time.time() - t0) / REPS

    # ---- decode (chunkify on device from the encoded words) ----
    counts = np.asarray(n_d)
    cap = int(((int(counts.max()) + 2 * rans_v2.CHUNK - 1)
               // rans_v2.CHUNK) * rans_v2.CHUNK)
    q = N >> 2

    @jax.jit
    def dec(st, w, jp, ja):
        Bb = st.shape[0]
        padded = jnp.zeros((Bb, cap), jnp.uint32)
        padded = padded.at[:, :w.shape[1]].set(w.astype(jnp.uint32))
        chunks = padded.reshape(Bb * (cap // rans_v2.CHUNK), rans_v2.CHUNK)
        return rans_v2._dec_v2_to_bytes(st, chunks, jp, ja, shift, q, q, N, 1)

    w_trim = w_d[:, :cap]
    out = dec(st_d, w_trim, jp, ja)
    np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
    t0 = time.time()
    for _ in range(REPS):
        out = dec(st_d, w_trim, jp, ja)
    np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
    t_dec_dev = (time.time() - t0) / REPS

    # ---- verify ----
    mism = int(np.asarray(jnp.sum(out != jb)))
    # one-block byte-exact readback vs the native host encoder
    blk0_words = np.asarray(w_d[0, :counts[0]]).astype("<u2").tobytes()
    blk0_states = np.asarray(st_d[0]).astype("<u4").tobytes()
    from htscodecs_tpu.models import rans4x16
    from htscodecs_tpu.utils import varint
    ref = rans4x16.compress(uniq[0], 1)
    osz, pos = varint.get_uint(ref, 1, len(ref))
    off, *_t = native.parse_tables_o1(ref[pos:])
    byte_exact = ref[pos + off:] == blk0_states + blk0_words

    # host-side decode table parse, measured for real and scaled to B
    t0 = time.time()
    PARSE_REPS = 256
    for _ in range(PARSE_REPS):
        native.parse_tables_o1_dense(ref[pos:])
    t_parse = (time.time() - t0) / PARSE_REPS * B

    t_enc = t_tables + t_enc_dev
    t_dec = t_parse + t_dec_dev
    enc_mbps = total_mb / t_enc
    dec_mbps = total_mb / t_dec
    agg = 2 * total_mb / (t_enc + t_dec)

    print(json.dumps({
        "enc_MBps": round(enc_mbps, 1), "dec_MBps": round(dec_mbps, 1),
        "enc_dev_s": round(t_enc_dev, 2), "dec_dev_s": round(t_dec_dev, 2),
        "host_tables_s": round(t_tables, 2), "host_parse_s": round(t_parse, 2), "blocks": B, "block_bytes": N,
        "mismatches": mism, "byte_exact_vs_reference": bool(byte_exact),
        "setup_s": round(time.time() - t_setup, 1),
    }), file=sys.stderr)
    print(json.dumps({
        "metric": "rans4x16_o1_enc_dec_aggregate",
        "value": round(agg, 1),
        "unit": "MB/s",
        "vs_baseline": round(agg / BASELINE_AGG_MBPS, 3),
    }))
    return 0 if mism == 0 and byte_exact else 1


if __name__ == "__main__":
    sys.exit(main())
