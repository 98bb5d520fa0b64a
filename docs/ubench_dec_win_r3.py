#!/usr/bin/env python
"""Round-3 probe: decode window variants on the real chip — the
overlapped single-take windows (w256/w128/w64/w128u4) vs coarse, at
the headline A=8 shape and the wide-alphabet A=48 shape.

The decode floor (~29 us/sym) is dominated by the W-wide in-step
renorm select (~22 us at W=256); the overlapped windows halve or
quarter W at the same (or lower) refill row rate.

Usage: python docs/ubench_dec_win_r3.py [B]
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
    from htscodecs_tpu.ops import rans_v2, tables_v2
    from bench import synth_quality, G

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 12288
    N = 65536

    corpora = [("synth4",
                np.tile(synth_quality(G, N), (-(-B // G), 1))[:B],
                "onehot",
                ["coarse", "w256", "w128", "w64", "w128u4"])]
    q40 = DAT / "q40+dir"
    if q40.exists():
        raw = np.frombuffer(q40.read_bytes(), np.uint8)
        nb = len(raw) // N
        corpora.append(
            ("q40dir",
             np.tile(raw[:nb * N].reshape(nb, N), (-(-B // nb), 1))[:B],
             "b16", ["coarse", "w256", "w128"]))

    for name, blocks, rf, wins in corpora:
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
        cap = int(((counts.max() + 2 * rans_v2.CHUNK - 1)
                   // rans_v2.CHUNK) * rans_v2.CHUNK)
        q = N >> 2
        total_mb = B * N / 1e6

        @functools.partial(jax.jit, static_argnames=("cap", "rf", "wn"))
        def dec(st, w, jp, ja, sv, cap, rf, wn):
            Bb = st.shape[0]
            padded = jnp.zeros((Bb, cap), jnp.uint32)
            padded = padded.at[:, :w.shape[1]].set(w.astype(jnp.uint32))
            chunks = padded.reshape(Bb * (cap // rans_v2.CHUNK),
                                    rans_v2.CHUNK)
            return rans_v2._dec_v2_to_bytes_pb(st, chunks, jp, ja, sv,
                                               q, q, N, 1,
                                               row_fetch=rf, win=wn)

        w_trim = w_d[:, :cap]
        shiftv = meta_d[:, 1]
        for wn in wins:
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
                print(json.dumps({"corpus": name, "rf": rf, "win": wn,
                                  "dec_s": round(t, 3),
                                  "dec_MBps": round(total_mb / t, 1),
                                  "mismatches": mism}), flush=True)
            except Exception as e:
                print(json.dumps({"corpus": name, "rf": rf, "win": wn,
                                  "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
