"""Round-5: A=72 bucket probe — uni64-class data on the VMEM decode.

64-symbol data plus the sentinel slot used to round to A_pad=96,
whose decode-table residency (2.41 MB/tile) pushed the uni64 stream
bucket past the Mosaic VMEM ceiling (8.61 MB HTTP-500s; 8.41
compiles).  With the 72 bucket the same corpus estimates 7.95 MB.
This probe checks, on the real chip: the bucket choice, the VMEM
decode compile at uni64's true stream size, byte-exactness, and the
rate vs the XLA b16/w128 fallback.

  python docs/ubench_a72_r5.py [B] [N]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                            # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache_tpu")
import jax.numpy as jnp                               # noqa: E402
from htscodecs_tpu.ops import rans_v2, rans_vmem, tables_v2  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
N = int(sys.argv[2]) if len(sys.argv) > 2 else 65536


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(13)
    blocks = (rng.integers(0, 64, (B, N)) + 33).astype(np.uint8)
    mb = B * N / 1e6
    jb = jnp.asarray(blocks)

    st = tables_v2.build_o1_device_async(jb)
    alpha_d, packed_d, _fh, meta_d, _H, _A = st
    shiftv = meta_d[:, 1].astype(jnp.int32)
    A_pad = int(packed_d.shape[1])
    print("A_pad:", A_pad)

    t0 = time.time()
    st_d, w_d, n_d, ovf, mseg = rans_vmem._enc_vmem(
        jb, alpha_d, packed_d, shiftv, N, 1, rans_v2.SEG_CAP2,
        prefetch=True)
    np.asarray(jnp.sum(n_d))
    print(f"pfv enc warm {time.time()-t0:.2f}s ovf={bool(np.asarray(ovf))}")
    t0 = time.time()
    st_d, w_d, n_d, ovf, mseg = rans_vmem._enc_vmem(
        jb, alpha_d, packed_d, shiftv, N, 1, rans_v2.SEG_CAP2,
        prefetch=True)
    np.asarray(jnp.sum(n_d))
    te = time.time() - t0
    print(f"pfv enc scan {te:.3f}s  {mb/te:.1f} MB/s")

    counts = np.asarray(n_d)
    cap = int(((counts.max() + 2 * rans_v2.CHUNK - 1)
               // rans_v2.CHUNK) * rans_v2.CHUNK)
    print("max words/block:", counts.max(), "cap:", cap)
    w16 = w_d[:, :cap].astype(jnp.uint16)
    st_T = jnp.transpose(st_d.astype(jnp.uint32), (1, 0))
    al_T = jnp.transpose(alpha_d, (1, 0))
    NWc = max(-(-(-(-cap // rans_vmem.NW_STEP) * rans_vmem.NW_STEP)
                // rans_vmem.CW), 1)
    q = N >> 2
    btc = rans_vmem.pick_bt(A_pad, cap)
    print("pick_bt:", btc, " est128=%.2fMB" % (
        rans_vmem._vmem_est(A_pad, cap, 128) / 2**20))
    if not btc:
        print("pick_bt declined; stopping")
        return
    try:
        t0 = time.time()
        out = rans_vmem._dec_vmem(st_T, w16, packed_d, al_T, shiftv,
                                  A_pad, NWc, q, q, N, 1, bt=btc)
        np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
        tw = time.time() - t0
        t0 = time.time()
        out = rans_vmem._dec_vmem(st_T, w16, packed_d, al_T, shiftv,
                                  A_pad, NWc, q, q, N, 1, bt=btc)
        np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
        td = time.time() - t0
        mism = int(np.asarray(jnp.sum(out != jb)))
        print(f"vmem dec: warm {tw:.2f}s steady {td:.3f}s "
              f"{mb/td:.1f} MB/s mismatches={mism}")
    except Exception as e:
        print("vmem dec FAIL:", str(e).splitlines()[0][:200])


if __name__ == "__main__":
    main()
