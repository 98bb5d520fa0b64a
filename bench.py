#!/usr/bin/env python
"""Headline benchmark: rANS 4x16 order-1 encode+decode on TPU.

Batch-scale analog of the reference test tools' ``-t`` mode (timed
enc/dec passes over the same data, MB/s) over a corpus table:

- ``synth4``   G unique synthetic NovaSeq-like 64 KiB quality blocks
               (A=4, run-structured) tiled to B blocks — the headline,
               comparable across rounds.
- ``distinct`` B unique synthetic blocks (no tiling): device-verify
               evidence on all-distinct data.
- ``q8`` / ``q40dir``  real `tests/dat` quality data tiled to B —
               A≈8 and A≈40+ alphabets, the reference's own corpus.

Accounting per corpus (details in docs/PERF_NOTES.md):
- t_enc = table construction (on-device histogram + bit-exact
  normalisation, ops/tables_v2.py, incl. the D2H of header
  frequencies + one native batched header-serialize call) + the full
  on-device encode jit (byte->dense remap, param fetch, reverse scan,
  sort compaction).
- t_dec = scaled host table parse + on-device decode jit.
- H2D/D2H staging of payload data is excluded: the axon test tunnel
  moves bulk data at ~30 MB/s, which would only measure the harness
  (the C tool's -t likewise excludes file IO).  Correctness is
  verified ON DEVICE (mismatch count) plus a one-block byte-exact
  readback against the native host encoder.
- Baseline: the C reference on this host runs order-1 at ~140 MB/s
  enc and ~350 MB/s dec single-threaded (q40 data) => aggregate
  2*bytes/(t_enc+t_dec) ~= 200 MB/s.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} for
the headline corpus; the full corpus table goes to stderr.
"""

import functools
import json
import pathlib
import sys
import time

import numpy as np

BASELINE_AGG_MBPS = 200.0
B = 12288
G = 8
N = 65536
REPS = 3
DAT = pathlib.Path("/root/reference/tests/dat")


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


def tile_file(path, n_blocks, n):
    raw = np.frombuffer(path.read_bytes(), np.uint8)
    nb = max(len(raw) // n, 1)
    base = raw[:nb * n]
    if len(base) < n:
        base = np.pad(raw, (0, n - len(raw)), constant_values=raw[-1])
        nb = 1
    uniq = base.reshape(nb, n)
    reps = -(-n_blocks // nb)
    return np.tile(uniq, (reps, 1))[:n_blocks]


def bench_corpus(name, blocks, check_exact=True):
    import jax
    import jax.numpy as jnp
    from htscodecs_tpu import native
    from htscodecs_tpu.ops import rans_v2, tables_v2
    from htscodecs_tpu.models import rans4x16
    from htscodecs_tpu.utils import varint

    Bc, Nc = blocks.shape
    total_mb = Bc * Nc / 1e6
    jb = jnp.asarray(blocks)

    # ---- tables (device build + native batched serialize) ----
    _warm = tables_v2.build_o1_device(jb)
    if _warm is None:
        return None
    t_tables = None
    for _ in range(2):          # steady-state: best of two passes
        t0 = time.time()
        dense = tables_v2.build_o1_device(jb)
        alpha_d, packed_d, asz, fhdr, shifts, flag, _A = dense
        hdrs = native.serialize_o1_dense_batch(
            np.asarray(alpha_d), asz, fhdr, shifts)
        dt = time.time() - t0
        t_tables = dt if t_tables is None else min(t_tables, dt)
    if hdrs is None:
        return None
    # flagged blocks are exact-decision flips the API path rebuilds on
    # host (rare); the throughput loops skip them.  Boundary-sitting
    # corpora legitimately span both shift values: encode/decode run
    # per shift group exactly like the batch wrapper does.
    nflag = int(flag.sum())
    ok = flag == 0
    groups = []
    for sv in np.unique(shifts[ok]):
        idx = np.flatnonzero(ok & (shifts == sv))
        # pad the block axis to a multiple of 128 with duplicates: odd
        # batch sizes fall off XLA's tiled layouts (~8x slower decode)
        pad = (-len(idx)) % 128
        if pad:
            idx = np.concatenate([idx, np.repeat(idx[:1], pad)])
        groups.append((int(sv), idx))
    q = Nc >> 2

    # ---- encode ----
    # less-compressible corpora (q40) exceed the fast two-level
    # compaction cap; steady state then uses the exact single-sort path
    genc = []
    for shift, idx in groups:
        jbg, jag, jpg = jb[idx], alpha_d[idx], packed_d[idx]
        seg_cap = rans_v2.SEG_CAP
        st_d, w_d, n_d, ovf = rans_v2._enc_scan_v2(jbg, jag, jpg, shift, 1)
        if bool(np.asarray(ovf)):
            seg_cap = rans_v2.SEG
            st_d, w_d, n_d, ovf = rans_v2._enc_scan_v2(
                jbg, jag, jpg, shift, 1, seg_cap=seg_cap)
        np.asarray(jnp.sum(n_d))
        assert not bool(np.asarray(ovf)), f"{name}: compaction overflow"
        genc.append((shift, idx, jbg, jag, jpg, seg_cap, st_d, w_d, n_d))
    t0 = time.time()
    for _ in range(REPS):
        for k, (shift, idx, jbg, jag, jpg, seg_cap, *_r) in enumerate(genc):
            st_d, w_d, n_d, ovf = rans_v2._enc_scan_v2(
                jbg, jag, jpg, shift, 1, seg_cap=seg_cap)
            genc[k] = (shift, idx, jbg, jag, jpg, seg_cap, st_d, w_d, n_d)
        np.asarray(sum(jnp.sum(g[8]) for g in genc))
    t_enc_dev = (time.time() - t0) / REPS

    # ---- decode (chunkify on device from the encoded words) ----
    gdec = []
    for shift, idx, jbg, jag, jpg, seg_cap, st_d, w_d, n_d in genc:
        counts = np.asarray(n_d)
        cap = int(((int(counts.max()) + 2 * rans_v2.CHUNK - 1)
                   // rans_v2.CHUNK) * rans_v2.CHUNK)

        @functools.partial(jax.jit, static_argnames=("cap", "shift"))
        def dec(st, w, jp, ja, cap, shift):
            Bb = st.shape[0]
            padded = jnp.zeros((Bb, cap), jnp.uint32)
            padded = padded.at[:, :w.shape[1]].set(w.astype(jnp.uint32))
            chunks = padded.reshape(
                Bb * (cap // rans_v2.CHUNK), rans_v2.CHUNK)
            return rans_v2._dec_v2_to_bytes(st, chunks, jp, ja, shift,
                                            q, q, Nc, 1)

        w_trim = w_d[:, :cap]
        out = dec(st_d, w_trim, jpg, jag, cap, shift)
        np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
        gdec.append((dec, st_d, w_trim, jpg, jag, cap, shift, jbg,
                     counts, w_d))
    t0 = time.time()
    for _ in range(REPS):
        outs = [dec(st_d, w_trim, jpg, jag, cap, shift)
                for dec, st_d, w_trim, jpg, jag, cap, shift, *_r in gdec]
        np.asarray(sum(jnp.sum(o[:, :4].astype(jnp.uint32)) for o in outs))
    t_dec_dev = (time.time() - t0) / REPS

    # ---- verify ----
    mism = 0
    for (dec, st_d, w_trim, jpg, jag, cap, shift, jbg, counts, w_d), out \
            in zip(gdec, outs):
        mism += int(np.asarray(jnp.sum(out != jbg)))
    byte_exact = True
    if check_exact:
        # first unflagged block of the first group, vs the host encoder
        shift, idx, jbg = genc[0][0], genc[0][1], genc[0][2]
        st_d, w_d, n_d = genc[0][6], genc[0][7], genc[0][8]
        counts = np.asarray(n_d)
        chk = int(idx[0])
        blk_words = np.asarray(w_d[0, :counts[0]]).astype("<u2").tobytes()
        blk_states = np.asarray(st_d[0]).astype("<u4").tobytes()
        ref = rans4x16.compress(blocks[chk], 1)
        osz, pos = varint.get_uint(ref, 1, len(ref))
        off, *_t = native.parse_tables_o1(ref[pos:])
        byte_exact = (ref[pos + off:] == blk_states + blk_words
                      and hdrs[chk] == ref[pos:pos + off])

    # host-side decode table parse, measured for real and scaled to B
    stream0 = hdrs[0] + b"\x00" * 16
    t0 = time.time()
    PARSE_REPS = 256
    for _ in range(PARSE_REPS):
        native.parse_tables_o1_dense(stream0)
    t_parse = (time.time() - t0) / PARSE_REPS * Bc

    t_enc = t_tables + t_enc_dev
    t_dec = t_parse + t_dec_dev
    return {
        "corpus": name,
        "enc_MBps": round(total_mb / t_enc, 1),
        "dec_MBps": round(total_mb / t_dec, 1),
        "agg_MBps": round(2 * total_mb / (t_enc + t_dec), 1),
        "tables_s": round(t_tables, 2), "enc_dev_s": round(t_enc_dev, 2),
        "parse_s": round(t_parse, 2), "dec_dev_s": round(t_dec_dev, 2),
        "shifts": [g[0] for g in groups], "flags": nflag,
        "mismatches": mism,
        "byte_exact": bool(byte_exact),
    }


def main():
    t_setup = time.time()
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")

    uniq = synth_quality(G, N)
    corpora = [
        ("synth4", np.tile(uniq, (B // G, 1))),
        ("distinct", synth_quality(B, N, seed=7)),
    ]
    if DAT.exists():
        corpora.append(("q8", tile_file(DAT / "q8", B, N)))
        corpora.append(("q40dir", tile_file(DAT / "q40+dir", B, N)))

    rows = []
    for name, blocks in corpora:
        r = bench_corpus(name, blocks, check_exact=True)
        if r is None:
            r = {"corpus": name, "error": "device path declined"}
        print(json.dumps(r), file=sys.stderr, flush=True)
        rows.append(r)

    head = rows[0]
    ok = all(r.get("mismatches", 1) == 0 and r.get("byte_exact", False)
             for r in rows if "error" not in r)
    print(json.dumps({"setup_s": round(time.time() - t_setup, 1)}),
          file=sys.stderr)
    print(json.dumps({
        "metric": "rans4x16_o1_enc_dec_aggregate",
        "value": head.get("agg_MBps", 0.0),
        "unit": "MB/s",
        "vs_baseline": round(head.get("agg_MBps", 0.0) / BASELINE_AGG_MBPS, 3),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
