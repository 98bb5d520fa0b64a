#!/usr/bin/env python
"""Round-3 probe: time EVERY byte-exact decode-step variant combo on
the real chip at q40dir shapes (A~48 padded, B=12288, N=65536).

Motivation: the bench autotuner's wide-alphabet candidate set excluded
take/coarse on a "hybrids are dominated" assumption that predates the
real-chip measurements; meanwhile the real chip shows coarse beating
the fine windows at small A (the opposite of the CPU microbench), so
the excluded combination is exactly the one most likely to win at
A~48.  This prints one JSON line per (row_fetch, win) with the decode
wall time so the autotune candidate set can be corrected from data.

Usage: python docs/ubench_q40_variants_r3.py [B]
"""
import functools
import json
import pathlib
import sys
import time

import numpy as np

# run from anywhere without PYTHONPATH (which breaks the axon
# sitecustomize plugin registration on this image)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DAT = pathlib.Path("/root/reference/tests/dat")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache_tpu")
    from htscodecs_tpu.ops import rans_v2, tables_v2

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 12288
    N = 65536
    raw = np.frombuffer((DAT / "q40+dir").read_bytes(), np.uint8)
    nb = len(raw) // N
    uniq = raw[:nb * N].reshape(nb, N)
    blocks = np.tile(uniq, (-(-B // nb), 1))[:B]
    jb = jnp.asarray(blocks)

    st = tables_v2.build_o1_device_async(jb)
    alpha_d, packed_d, fhdr_d, meta_d, _H, _A = st
    print(json.dumps({"A_pad": int(packed_d.shape[1]),
                      "shifts": sorted(int(v) for v in
                                       np.unique(np.asarray(meta_d[:, 1])))}),
          flush=True)

    st_d, w_d, n_d, ovf = rans_v2._enc_scan_v2_pb(
        jb, alpha_d, packed_d, meta_d[:, 1], 1, seg_cap=rans_v2.SEG_CAP2)
    counts = np.asarray(n_d)
    assert not bool(np.asarray(ovf))
    cap = int(((counts.max() + 2 * rans_v2.CHUNK - 1)
               // rans_v2.CHUNK) * rans_v2.CHUNK)
    q = N >> 2

    @functools.partial(jax.jit, static_argnames=("cap", "rf", "wn"))
    def dec(st, w, jp, ja, sv, cap, rf, wn):
        Bb = st.shape[0]
        padded = jnp.zeros((Bb, cap), jnp.uint32)
        padded = padded.at[:, :w.shape[1]].set(w.astype(jnp.uint32))
        chunks = padded.reshape(Bb * (cap // rans_v2.CHUNK), rans_v2.CHUNK)
        return rans_v2._dec_v2_to_bytes_pb(st, chunks, jp, ja, sv,
                                           q, q, N, 1, row_fetch=rf, win=wn)

    # ---- encode variants (same scan, different row fetch) ----
    total_mb = B * N / 1e6
    for erf in ("b16", "mxu"):
        try:
            o = rans_v2._enc_scan_v2_pb(jb, alpha_d, packed_d, meta_d[:, 1],
                                        1, seg_cap=rans_v2.SEG_CAP2,
                                        row_fetch=erf)
            o[2].block_until_ready()
            t = 1e9
            for _ in range(2):
                t0 = time.time()
                o = rans_v2._enc_scan_v2_pb(jb, alpha_d, packed_d,
                                            meta_d[:, 1], 1,
                                            seg_cap=rans_v2.SEG_CAP2,
                                            row_fetch=erf)
                o[2].block_until_ready()
                t = min(t, time.time() - t0)
            same = (int(np.asarray(jnp.sum(o[0] != st_d))) == 0
                    and int(np.asarray(jnp.sum(o[2] != n_d))) == 0)
            print(json.dumps({"enc_rf": erf, "enc_s": round(t, 3),
                              "enc_MBps": round(total_mb / t, 1),
                              "same_as_onehot": same}), flush=True)
        except Exception as e:
            print(json.dumps({"enc_rf": erf, "error": str(e)[:160]}),
                  flush=True)

    w_trim = w_d[:, :cap]
    shiftv = meta_d[:, 1]
    ref = None
    combos = [("b16", "coarse"), ("mxu", "coarse")]
    for rf, wn in combos:
        if True:
            try:
                out = dec(st_d, w_trim, packed_d, alpha_d, shiftv,
                          cap, rf, wn)
                out.block_until_ready()
                t = 1e9
                for _ in range(2):
                    t0 = time.time()
                    out = dec(st_d, w_trim, packed_d, alpha_d, shiftv,
                              cap, rf, wn)
                    out.block_until_ready()
                    t = min(t, time.time() - t0)
                mism = int(np.asarray(jnp.sum(out != jb)))
                if ref is None:
                    ref = mism
                print(json.dumps({"rf": rf, "win": wn,
                                  "dec_s": round(t, 3),
                                  "dec_MBps": round(total_mb / t, 1),
                                  "mismatches": mism}), flush=True)
            except Exception as e:
                print(json.dumps({"rf": rf, "win": wn,
                                  "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
