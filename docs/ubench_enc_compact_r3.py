#!/usr/bin/env python
"""Round-3 probe: encode compaction layout ('row' transpose-then-sort
vs 'col' scan-native sort) on the real chip, at the headline synth4
shape (A<=8) and the wide-alphabet q40 shape (A=48).

Both are byte-exact (tests/test_rans_v2.py::test_encode_compact_col_
byte_exact); this picks the default from wall-time data.

Usage: python docs/ubench_enc_compact_r3.py [B]
"""
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

    corpora = [("synth4", np.tile(synth_quality(G, N), (-(-B // G), 1))[:B])]
    q40 = DAT / "q40+dir"
    if q40.exists():
        raw = np.frombuffer(q40.read_bytes(), np.uint8)
        nb = len(raw) // N
        corpora.append(
            ("q40dir", np.tile(raw[:nb * N].reshape(nb, N),
                               (-(-B // nb), 1))[:B]))

    for name, blocks in corpora:
        jb = jnp.asarray(blocks)
        st = tables_v2.build_o1_device_async(jb)
        alpha_d, packed_d, _f, meta_d, _H, _A = st
        A_pad = int(packed_d.shape[1])
        rf = "b16" if A_pad > 8 else "onehot"
        cap = rans_v2.SEG_CAP2 if name == "q40dir" else rans_v2.SEG_CAP
        total_mb = B * N / 1e6
        ref = None
        for comp in ("row", "col"):
            o = rans_v2._enc_scan_v2_pb(jb, alpha_d, packed_d,
                                        meta_d[:, 1], 1, seg_cap=cap,
                                        row_fetch=rf, compact=comp)
            o[2].block_until_ready()
            assert not bool(np.asarray(o[3]))
            t = 1e9
            for _ in range(2):
                t0 = time.time()
                o = rans_v2._enc_scan_v2_pb(jb, alpha_d, packed_d,
                                            meta_d[:, 1], 1, seg_cap=cap,
                                            row_fetch=rf, compact=comp)
                o[2].block_until_ready()
                t = min(t, time.time() - t0)
            if ref is None:
                ref = o
                same = True
            else:
                same = (int(np.asarray(jnp.sum(o[0] != ref[0]))) == 0
                        and int(np.asarray(jnp.sum(o[2] != ref[2]))) == 0)
            print(json.dumps({"corpus": name, "A_pad": A_pad,
                              "compact": comp, "rf": rf,
                              "enc_scan_s": round(t, 3),
                              "enc_scan_MBps": round(total_mb / t, 1),
                              "same": same}), flush=True)


if __name__ == "__main__":
    main()
