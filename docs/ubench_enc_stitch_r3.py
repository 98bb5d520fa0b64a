#!/usr/bin/env python
"""Round-3 probe: VMEM encode-kernel global stitch variants on chip.

The stitch places each grid step's already-compacted segment at its
forward offset.  The old key was the computed destination position
(cumsum), which exceeded 15 bits at q40's KO*capk=32768 and fell to
the 2-operand sort; the new key is the forward-order flat row index
(valid rows are already in destination order), a static iota that
fits 16 bits at every tier, so the packed single-u32 sort applies
everywhere and the segment-order [::-1] folds into the key.

Verifies the VMEM encode byte-exactly against the XLA engine before
timing.  Usage: python docs/ubench_enc_stitch_r3.py [B]
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
    from htscodecs_tpu.ops import rans_v2, rans_vmem, tables_v2
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

    import os
    only = os.environ.get("CORPUS", "")
    for name, blocks in corpora:
        if only and name != only:
            continue
        jb = jnp.asarray(blocks)
        st = tables_v2.build_o1_device_async(jb)
        alpha_d, packed_d, _f, meta_d, _H, _A = st
        A_pad = int(packed_d.shape[1])
        rf = "b16" if A_pad > 8 else "onehot"
        cap = rans_v2.SEG_CAP2 if name == "q40dir" else rans_v2.SEG_CAP
        total_mb = B * N / 1e6
        sh32 = meta_d[:, 1].astype(jnp.int32)

        # XLA engine reference (byte-exactness oracle)
        ro = rans_v2._enc_scan_v2_pb(jb, alpha_d, packed_d, meta_d[:, 1],
                                     1, seg_cap=cap, row_fetch=rf)
        assert not bool(np.asarray(ro[3]))
        rn = np.asarray(ro[2])
        rw = np.asarray(ro[1])
        rs = np.asarray(ro[0])

        o = rans_vmem._enc_vmem(jb, alpha_d, packed_d, sh32, N, 1, cap)
        o[2].block_until_ready()
        assert not bool(np.asarray(o[3])), "vmem overflow"
        vn = np.asarray(o[2])
        vw = np.asarray(o[1])
        vs = np.asarray(o[0])
        same = bool((vn == rn).all() and (vs == rs).all())
        if same:
            for b in range(B):
                if not (vw[b, :vn[b]] == rw[b, :rn[b]]).all():
                    same = False
                    break
        t = 1e9
        for _ in range(3):
            t0 = time.time()
            o = rans_vmem._enc_vmem(jb, alpha_d, packed_d, sh32, N, 1, cap)
            o[2].block_until_ready()
            t = min(t, time.time() - t0)
        print(json.dumps({"corpus": name, "A_pad": A_pad,
                          "enc_vmem_s": round(t, 3),
                          "enc_vmem_MBps": round(total_mb / t, 1),
                          "byte_exact_vs_xla": same}), flush=True)


if __name__ == "__main__":
    main()
