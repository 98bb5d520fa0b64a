"""Round-4: prefetched-table encode kernel vs the chain kernel, real chip.

python docs/ubench_encpf_r4.py [B] [N]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from htscodecs_tpu.ops import rans_v2, rans_vmem, tables_v2  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 12288
N = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
rng = np.random.default_rng(11)


def corpus_q40():
    """q40-like: A=~40-48 quality data (geometric-ish)."""
    p = np.exp(-np.arange(48) / 9.0)
    p /= p.sum()
    return rng.choice(np.arange(33, 81, dtype=np.uint8), (B, N),
                      p=p).astype(np.uint8)


def corpus_synth4():
    p = np.array([0.55, 0.25, 0.15, 0.05])
    return rng.choice(np.array([33, 45, 60, 70], np.uint8), (B, N),
                      p=p).astype(np.uint8)


def run(name, blocks):
    jb = jnp.asarray(blocks)
    st = tables_v2.build_o1_device_async(jb)
    alpha_d, packed_d, fhdr_d, meta_d, _H, A = st
    shiftv = meta_d[:, 1].astype(jnp.int32)
    print(f"{name}: A_pad={packed_d.shape[1]}")
    res = {}
    for pf in (False, True):
        tag = "pf" if pf else "chain"
        try:
            for cap in (rans_v2.SEG_CAP, rans_v2.SEG_CAP2, rans_v2.SEG):
                out = rans_vmem._enc_vmem(jb, alpha_d, packed_d, shiftv,
                                          N, 1, cap, prefetch=pf)
                jax.block_until_ready(out[3])
                if not bool(np.asarray(out[3])):
                    break
            t0 = time.perf_counter()
            out = rans_vmem._enc_vmem(jb, alpha_d, packed_d, shiftv,
                                      N, 1, cap, prefetch=pf)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            mb = B * N / 1e6
            print(f"  {tag:6s} cap={cap:3d} {dt:7.3f} s "
                  f"{mb/dt:8.1f} MB/s")
            res[tag] = (np.asarray(out[0]), np.asarray(out[1]),
                        np.asarray(out[2]))
            del out
        except Exception as e:
            print(f"  {tag} FAIL: {str(e).splitlines()[0][:160]}")
    if len(res) == 2:
        a, b = res["chain"], res["pf"]
        ok = all(np.array_equal(x, y) for x, y in zip(a, b))
        print(f"  byte-exact chain-vs-pf: {ok}")
    del res


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("q40-like", corpus_q40())
    run("synth4", corpus_synth4())
