"""Round-5: the VERDICT r3 "compressibility cliff" regime on chip.

uni64-class data (A=64, ratio ~0.75, ~24.6k words/block) topped the
VMEM decode budget at BT=128 in round 4 (Mosaic compile failure), so
bench fell back to the XLA b16/w128 scan at ~117 MB/s.  This probe
measures the round-5 bt=64 tile geometry (rans_vmem.pick_bt):

  python docs/ubench_uni64_r5.py [B] [N]

Reports: pick_bt choice, VMEM-dec compile+run at bt=64 (and the
bt=128 boundary), byte-exactness vs the input, XLA b16/w128 decode
for comparison, and the chain-vs-pfv encode kernel status at A=64.
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
    print("A_pad:", A_pad, "shifts:",
          np.unique(np.asarray(meta_d[:, 1])))

    # ---- encode: pfv (known-good at A=64) + chain-kernel status ----
    t0 = time.time()
    st_d, w_d, n_d, ovf, mseg = rans_vmem._enc_vmem(
        jb, alpha_d, packed_d, shiftv, N, 1, rans_v2.SEG_CAP2,
        prefetch=True)
    np.asarray(jnp.sum(n_d))
    print(f"pfv enc warm {time.time()-t0:.2f}s ovf={bool(np.asarray(ovf))}"
          f" maxseg={int(np.asarray(mseg))}")
    t0 = time.time()
    st_d, w_d, n_d, ovf, mseg = rans_vmem._enc_vmem(
        jb, alpha_d, packed_d, shiftv, N, 1, rans_v2.SEG_CAP2,
        prefetch=True)
    np.asarray(jnp.sum(n_d))
    te = time.time() - t0
    print(f"pfv enc scan {te:.3f}s  {mb/te:.1f} MB/s")
    try:
        t0 = time.time()
        r = rans_vmem._enc_vmem(jb, alpha_d, packed_d, shiftv, N, 1,
                                rans_v2.SEG_CAP2, prefetch=False)
        np.asarray(jnp.sum(r[2]))
        print(f"chain enc compiled+ran {time.time()-t0:.2f}s")
        del r
    except Exception as e:
        print("chain enc FAIL:", str(e).splitlines()[0][:160])

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
    print("pick_bt:", btc, " est128=%.2fMB est64=%.2fMB" % (
        rans_vmem._vmem_est(A_pad, cap, 128) / 2**20,
        rans_vmem._vmem_est(A_pad, cap, 64) / 2**20))

    for bt in (btc or 64, 128):
        try:
            t0 = time.time()
            out = rans_vmem._dec_vmem(st_T, w16, packed_d, al_T,
                                      shiftv, A_pad, NWc, q, q, N, 1,
                                      bt=bt)
            np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
            tw = time.time() - t0
            t0 = time.time()
            out = rans_vmem._dec_vmem(st_T, w16, packed_d, al_T,
                                      shiftv, A_pad, NWc, q, q, N, 1,
                                      bt=bt)
            np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
            td = time.time() - t0
            mism = int(np.asarray(jnp.sum(out != jb)))
            print(f"vmem dec bt={bt}: warm {tw:.2f}s steady {td:.3f}s "
                  f"{mb/td:.1f} MB/s mismatches={mism}")
            del out
        except Exception as e:
            print(f"vmem dec bt={bt} FAIL:",
                  str(e).splitlines()[0][:160])
        if bt == 128:
            break

    # ---- XLA b16/w128 reference point ----
    import functools

    @functools.partial(jax.jit, static_argnames=("cap",))
    def decx(stx, w, jp, ja, sv, cap):
        Bb = stx.shape[0]
        padded = jnp.zeros((Bb, cap), jnp.uint32)
        padded = padded.at[:, :w.shape[1]].set(w.astype(jnp.uint32))
        chunks = padded.reshape(Bb * (cap // rans_v2.CHUNK),
                                rans_v2.CHUNK)
        return rans_v2._dec_v2_to_bytes_pb(stx, chunks, jp, ja, sv,
                                           q, q, N, 1,
                                           row_fetch="b16", win="w128")
    try:
        w_trim = w_d[:, :cap]
        out = decx(st_d, w_trim, packed_d, alpha_d, meta_d[:, 1], cap)
        np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
        t0 = time.time()
        out = decx(st_d, w_trim, packed_d, alpha_d, meta_d[:, 1], cap)
        np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
        td = time.time() - t0
        mism = int(np.asarray(jnp.sum(out != jb)))
        print(f"xla b16/w128 dec: {td:.3f}s {mb/td:.1f} MB/s "
              f"mismatches={mism}")
    except Exception as e:
        print("xla dec FAIL:", str(e).splitlines()[0][:160])


if __name__ == "__main__":
    main()
