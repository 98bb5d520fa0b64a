#!/usr/bin/env python
"""Round-3 probe: the Pallas VMEM-resident decode engine
(ops/rans_vmem.py) vs the best XLA scan variants, on the real chip.

The XLA wide-alphabet decode is bound by re-streaming the b16 tables
from HBM every step (PERF_NOTES round-3); the VMEM kernel pins them
on-chip.  Expectation: ~2-3x at A=48; the A=8 floor (window select)
should also drop.

Usage: python docs/ubench_vmem_r3.py [B]
"""
import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DAT = pathlib.Path("/root/reference/tests/dat")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache_tpu")
    from htscodecs_tpu.ops import rans_v2, rans_vmem, tables_v2
    from bench import synth_quality, G

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 12288
    N = 65536

    corpora = [("synth4",
                np.tile(synth_quality(G, N), (-(-B // G), 1))[:B],
                "onehot")]
    q40 = DAT / "q40+dir"
    if q40.exists():
        raw = np.frombuffer(q40.read_bytes(), np.uint8)
        nb = len(raw) // N
        corpora.append(
            ("q40dir",
             np.tile(raw[:nb * N].reshape(nb, N), (-(-B // nb), 1))[:B],
             "b16"))

    q = N >> 2
    for name, blocks, rf in corpora:
        jb = jnp.asarray(blocks)
        st = tables_v2.build_o1_device_async(jb)
        alpha_d, packed_d, _f, meta_d, _H, _A = st
        cap_t = (rans_v2.SEG_CAP2 if name == "q40dir"
                 else rans_v2.SEG_CAP)
        st_d, w_d, n_d, ovf = rans_v2._enc_scan_v2_pb(
            jb, alpha_d, packed_d, meta_d[:, 1], 1, seg_cap=cap_t,
            row_fetch=rf)
        assert not bool(np.asarray(ovf))
        counts = np.asarray(n_d)
        total_mb = B * N / 1e6
        shiftv = meta_d[:, 1].astype(jnp.int32)
        A = int(packed_d.shape[1])

        # ---- XLA scan reference (current best) ----
        cap = int(((counts.max() + 2 * rans_v2.CHUNK - 1)
                   // rans_v2.CHUNK) * rans_v2.CHUNK)

        @functools.partial(jax.jit, static_argnames=("cap", "rf", "wn"))
        def dec(st, w, jp, ja, sv, cap, rf, wn):
            Bb = st.shape[0]
            padded = jnp.zeros((Bb, cap), jnp.uint32)
            padded = padded.at[:, :w.shape[1]].set(w.astype(jnp.uint32))
            chunks = padded.reshape(Bb * (cap // rans_v2.CHUNK),
                                    rans_v2.CHUNK)
            return rans_v2._dec_v2_to_bytes_pb(st, chunks, jp, ja, sv,
                                               q, q, N, 1,
                                               row_fetch=rf, win="w128")

        w_trim = w_d[:, :cap]
        out = dec(st_d, w_trim, packed_d, alpha_d, shiftv, cap, rf, "w128")
        out.block_until_ready()
        t = 1e9
        for _ in range(2):
            t0 = time.time()
            out = dec(st_d, w_trim, packed_d, alpha_d, shiftv, cap, rf,
                      "w128")
            out.block_until_ready()
            t = min(t, time.time() - t0)
        mism = int(np.asarray(jnp.sum(out != jb)))
        print(json.dumps({"corpus": name, "engine": f"v2:{rf}/w128",
                          "dec_s": round(t, 3),
                          "dec_MBps": round(total_mb / t, 1),
                          "mismatches": mism}), flush=True)

        # ---- VMEM kernel ----
        NWc = int(rans_vmem._cdiv(
            rans_vmem._cdiv(int(counts.max()), rans_vmem.NW_STEP)
            * rans_vmem.NW_STEP, rans_vmem.CW))
        w16 = w_d[:, :min(w_d.shape[1], 2 * NWc * rans_vmem.CW2)].astype(
            jnp.uint16)
        stT = jnp.transpose(st_d.astype(jnp.uint32), (1, 0))
        alT = jnp.transpose(alpha_d, (1, 0))
        try:
            t0 = time.time()
            out2 = rans_vmem._dec_vmem(stT, w16, packed_d, alT, shiftv,
                                       A, NWc, q, q, N, 1)
            out2.block_until_ready()
            t_compile = time.time() - t0
            t = 1e9
            for _ in range(2):
                t0 = time.time()
                out2 = rans_vmem._dec_vmem(stT, w16, packed_d, alT,
                                           shiftv, A, NWc, q, q, N, 1)
                out2.block_until_ready()
                t = min(t, time.time() - t0)
            mism = int(np.asarray(jnp.sum(out2 != jb)))
            print(json.dumps({"corpus": name, "engine": "vmem",
                              "compile_s": round(t_compile, 1),
                              "dec_s": round(t, 3),
                              "dec_MBps": round(total_mb / t, 1),
                              "mismatches": mism}), flush=True)
        except Exception as e:
            print(json.dumps({"corpus": name, "engine": "vmem",
                              "error": str(e)[:300]}), flush=True)

        # ---- encode: XLA scan vs VMEM kernel ----
        try:
            del out, out2
        except NameError:
            pass
        del w_d, w_trim
        t = 1e9
        for _ in range(2):
            try:
                del r
            except NameError:
                pass
            t0 = time.time()
            r = rans_v2._enc_scan_v2_pb(jb, alpha_d, packed_d,
                                        meta_d[:, 1], 1, seg_cap=cap_t,
                                        row_fetch=rf)
            np.asarray(jnp.sum(r[2]))
            t = min(t, time.time() - t0)
        ref_x = np.asarray(r[0]); ref_n = np.asarray(r[2])
        del r
        print(json.dumps({"corpus": name, "engine": f"v2-enc:{rf}",
                          "enc_s": round(t, 3),
                          "enc_MBps": round(total_mb / t, 1)}),
              flush=True)
        try:
            from htscodecs_tpu.ops import rans_vmem as rvm
            shv = meta_d[:, 1].astype(jnp.int32)
            t0 = time.time()
            r2 = rvm._enc_vmem(jb, alpha_d, packed_d, shv, N, 1, cap_t)
            np.asarray(jnp.sum(r2[2]))
            t_compile = time.time() - t0
            t = 1e9
            for _ in range(2):
                del r2
                t0 = time.time()
                r2 = rvm._enc_vmem(jb, alpha_d, packed_d, shv, N, 1,
                                   cap_t)
                np.asarray(jnp.sum(r2[2]))
                t = min(t, time.time() - t0)
            same_x = bool((np.asarray(r2[0]) == ref_x).all())
            same_n = bool((np.asarray(r2[2]) == ref_n).all())
            ovf = bool(np.asarray(r2[3]))
            del r2
            print(json.dumps({"corpus": name, "engine": "vmem-enc",
                              "compile_s": round(t_compile, 1),
                              "enc_s": round(t, 3),
                              "enc_MBps": round(total_mb / t, 1),
                              "states_eq": same_x, "counts_eq": same_n,
                              "overflow": ovf}), flush=True)
        except Exception as e:
            print(json.dumps({"corpus": name, "engine": "vmem-enc",
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
