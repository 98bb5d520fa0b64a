#!/usr/bin/env python
"""Round-3 probe: 4x8 (CRAM 3.0) VMEM engines vs the XLA byte
engines on the real chip.  Usage: python docs/ubench_vmem8_r3.py [B]
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
    from htscodecs_tpu import native
    from htscodecs_tpu.ops import rans_v2, rans8_v2, rans8_vmem
    from bench import synth_quality, G, tile_file

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 12288
    N = 65536
    corpora = [("synth4", np.tile(synth_quality(G, N),
                                  (-(-B // G), 1))[:B])]
    if (DAT / "q40+dir").exists():
        corpora.append(("q40dir", tile_file(DAT / "q40+dir", B, N)))

    for name, blocks in corpora:
        total_mb = B * N / 1e6
        # host dense tables (the 4x8 table build has no device path)
        alps, pks = [], []
        amax = 0
        uniq = {}
        for b in range(B):
            key = blocks[b, :64].tobytes()      # tiled corpora repeat
            if key not in uniq:
                r = native.r8_build_tables_dense(blocks[b], 1)
                assert r is not None
                uniq[key] = (r[1], r[2])
            alps.append(uniq[key][0])
            pks.append(uniq[key][1])
            amax = max(amax, len(uniq[key][0]))
        A = rans_v2._round_a(amax)
        alpha = np.zeros((B, A), np.uint8)
        packed = np.zeros((B, A, A), np.int32)
        for b in range(B):
            al, pk = alps[b], pks[b]
            alpha[b, :len(al)] = al
            alpha[b, len(al):] = al[-1] if len(al) else 0
            packed[b, :len(al), :len(al)] = pk

        jb = jnp.asarray(blocks)
        ja = jnp.asarray(alpha)
        jp = jnp.asarray(packed)

        for eng, enc in (
                ("v2", lambda cap: rans8_v2._enc_scan8(
                    jb, ja, jp, 1, seg_cap=cap)),
                ("vmem", lambda cap: rans8_vmem._enc_vmem8(
                    jb, ja, jp, N, 1, cap))):
            try:
                r = enc(rans_v2.SEG_CAP2)
                ovf = bool(np.asarray(r[3]))
                if ovf:
                    del r
                    r = enc(rans_v2.SEG)
                np.asarray(jnp.sum(r[2]))
                t = 1e9
                for _ in range(2):
                    del r
                    t0 = time.time()
                    r = enc(rans_v2.SEG_CAP2)
                    np.asarray(jnp.sum(r[2]))
                    t = min(t, time.time() - t0)
                st_d, w_d, n_d = r[0], r[1], r[2]
                print(json.dumps({"corpus": name, "engine": f"{eng}-enc",
                                  "enc_s": round(t, 3),
                                  "enc_MBps": round(total_mb / t, 1)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"corpus": name, "engine": f"{eng}-enc",
                                  "error": str(e)[:200]}), flush=True)
                st_d = w_d = None
        if st_d is None:
            continue
        counts = np.asarray(n_d)
        cap = int(counts.max())
        q = N >> 2
        # device-side decode timing (a (B,N) readback through the axon
        # tunnel is ~27 s and would only measure the harness)
        st_j = jnp.asarray(np.asarray(st_d).astype(np.uint32))
        w8 = jnp.asarray(np.asarray(w_d)[:, :cap].astype(np.uint8))
        chunks8 = jnp.asarray(rans8_v2._chunkify8(
            np.asarray(w_d)[:, :cap].astype(np.uint8)))
        NC2 = max(rans8_vmem._cdiv(rans8_vmem._cdiv(
            cap, rans8_vmem.NB_STEP) * rans8_vmem.NB_STEP,
            rans8_vmem.CB), 1)
        stT = jnp.transpose(st_j, (1, 0))
        jaT = jnp.transpose(ja, (1, 0))

        for eng, dec in (
                ("v2", lambda: rans8_v2._dec8_to_bytes(
                    st_j, chunks8, jp, ja, q, q, N, 1,
                    win="coarse", row_fetch="onehot")),
                ("vmem", lambda: rans8_vmem._dec_vmem8(
                    stT, w8, jp, jaT, A, NC2, q, q, N, 1))):
            try:
                out = dec()
                out.block_until_ready()
                t = 1e9
                for _ in range(2):
                    t0 = time.time()
                    out = dec()
                    out.block_until_ready()
                    t = min(t, time.time() - t0)
                mism = int(np.asarray(jnp.sum(out != jb)))
                print(json.dumps({"corpus": name, "engine": f"{eng}-dec",
                                  "dec_s": round(t, 3),
                                  "dec_MBps": round(total_mb / t, 1),
                                  "mismatches": mism}), flush=True)
            except Exception as e:
                print(json.dumps({"corpus": name, "engine": f"{eng}-dec",
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
