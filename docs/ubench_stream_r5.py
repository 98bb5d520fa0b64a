"""Round-5: small-batch streaming encode — depth sweep + phase split.

bench.py's stream/u16 candidate measured 0.066 s per 512x64KiB pass
(506 MB/s) on chip.  This probe sweeps pipeline depth and counts
where the per-pass time goes (submit wall vs collect wall) to find
the remaining fixed cost.

  python docs/ubench_stream_r5.py [B] [reps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                            # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache_tpu")
import jax.numpy as jnp                               # noqa: E402
from htscodecs_tpu.parallel.streaming import StreamEncoder  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
N = 65536
G = 8


def synth_quality(n_blocks, n, seed=42):
    rng = np.random.default_rng(seed)
    syms = np.array([2, 12, 23, 37], np.uint8) + 33
    out = np.empty((n_blocks, n), np.uint8)
    for b in range(n_blocks):
        vals = rng.choice(4, size=n // 8, p=[0.05, 0.10, 0.15, 0.70])
        lens = rng.geometric(0.25, size=n // 8).clip(1, 60)
        seq = np.repeat(vals, lens)[:n]
        if len(seq) < n:
            seq = np.pad(seq, (0, n - len(seq)), constant_values=3)
        out[b] = syms[seq]
    return out


def main():
    print("devices:", jax.devices())
    uniq = synth_quality(G, N)
    blocks = np.tile(uniq, (B // G, 1))
    jb = jnp.asarray(blocks)
    mb = B * N / 1e6

    for depth in (1, 2, 3, 4):
        # warm
        enc = StreamEncoder(order=1, depth=depth, assemble=False)
        enc.submit(jb)
        list(enc.finish())
        t_sub = t_col = 0.0
        enc = StreamEncoder(order=1, depth=depth, assemble=False)
        t0 = time.time()
        for _ in range(REPS):
            ts = time.time()
            enc.submit(jb)
            t_sub += time.time() - ts
            ts = time.time()
            for r in enc.drain_ready():
                del r
            t_col += time.time() - ts
        ts = time.time()
        for r in enc.finish():
            del r
        t_col += time.time() - ts
        dt = (time.time() - t0) / REPS
        print(f"depth={depth}: {dt*1e3:7.2f} ms/pass  {mb/dt:7.1f} MB/s"
              f"   submit {t_sub/REPS*1e3:6.2f} ms  collect"
              f" {t_col/REPS*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
