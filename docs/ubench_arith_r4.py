"""Round-4: VMEM adaptive range-coder engine on the real chip.

Measures arith order-0 encode/decode MB/s at production batch sizes,
byte-exact vs the host codec, and compares with the XLA scan engine
(ops/arith_jax.py).  Host single-core context: the native C coder runs
O0 at ~43 MB/s enc / ~38 dec on this host (STATUS.md perf table).

python docs/ubench_arith_r4.py [B] [N]
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
from htscodecs_tpu.ops import arith_jax, arith_vmem  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
N = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
rng = np.random.default_rng(5)


def corpus():
    """q40-class quality bytes, A~40."""
    p = np.exp(-np.arange(40) / 9.0)
    p /= p.sum()
    return rng.choice(np.arange(40, dtype=np.uint8), (B, N), p=p)


def main():
    print("devices:", jax.devices())
    blocks = corpus()
    lens = np.full(B, N, np.int32)
    ms = blocks.max(axis=1).astype(np.int32) + 1
    mb = B * N / 1e6
    res = {}
    for name, mod in (("vmem", arith_vmem), ("xla", arith_jax)):
        try:
            enc = mod.enc_batch(blocks, lens, ms, 0)
            t0 = time.perf_counter()
            enc = mod.enc_batch(blocks, lens, ms, 0)
            te = time.perf_counter() - t0
            dec = mod.dec_batch(enc, lens.tolist(), ms.tolist(), 0)
            t0 = time.perf_counter()
            dec = mod.dec_batch(enc, lens.tolist(), ms.tolist(), 0)
            td = time.perf_counter() - t0
            ok = all(np.array_equal(dec[b][:lens[b]], blocks[b][:lens[b]])
                     for b in range(0, B, max(B // 64, 1)))
            print(f"{name:5s} enc {te:7.3f}s {mb/te:7.1f} MB/s   "
                  f"dec {td:7.3f}s {mb/td:7.1f} MB/s  roundtrip={ok}")
            res[name] = enc
        except Exception as e:
            print(f"{name} FAIL: {str(e).splitlines()[0][:160]}")
    if len(res) == 2:
        match = all(a == b for a, b in zip(res["vmem"], res["xla"]))
        print("vmem-vs-xla streams identical:", match)


if __name__ == "__main__":
    main()
