"""Round-4: fqz device-encode pipeline on the real chip.

Decomposes the two-stage fqz encode (host model replay emitting
(acc,f,tot) triples -> device VMEM range-coder kernel) against the
all-host native scan, byte-exact.  Reference loop shape:
fqzcomp_qual.c:1040-1113; host single-core context: fqz enc ~13-15
MB/s on this host (STATUS.md perf table).

python docs/ubench_fqz_rc_r4.py [B] [KB_per_block]
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
from htscodecs_tpu import native                       # noqa: E402
from htscodecs_tpu.models import fqz                   # noqa: E402
from htscodecs_tpu.ops import rc_vmem                  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
KB = int(sys.argv[2]) if len(sys.argv) > 2 else 256
rng = np.random.default_rng(5)


def mk_block(b):
    """q40-class quality strings: correlated walk over ~40 symbols."""
    L = 100
    nrec = KB * 1024 // L
    steps = rng.integers(-2, 3, (nrec, L)).cumsum(axis=1)
    q = np.clip(35 + steps + (b % 5), 1, 45).astype(np.uint8)
    return q.reshape(-1), [L] * nrec


def main():
    print("devices:", jax.devices())
    jobs = []
    for b in range(B):
        data, lens = mk_block(b)
        jobs.append((data, lens))
    mb = sum(len(j[0]) for j in jobs) / 1e6

    # ---- all-host native scan (per-block, one core) ----
    t0 = time.perf_counter()
    ref = [fqz.compress(d, l) for d, l in jobs]
    t_host = time.perf_counter() - t0
    print(f"host scan   {t_host:7.2f}s {mb/t_host:7.1f} MB/s")

    # ---- replay-only (the host half of the device path) ----
    gps = []
    t0 = time.perf_counter()
    for d, l in jobs:
        gp = fqz.pick_parameters(4, 0, list(l), [0] * len(l), d.copy())
        gps.append(gp)
    t_pick = time.perf_counter() - t0
    t0 = time.perf_counter()
    tris = []
    for (d, l), gp in zip(jobs, gps):
        tri = native.fqz_enc_replay(
            d, np.asarray(l, np.uint32),
            np.zeros(len(l), np.uint32), gp, fqz._pack_gp(gp))
        tris.append(tri)
    t_rep = time.perf_counter() - t0
    nev = sum(len(t[0]) for t in tris)
    print(f"picker      {t_pick:7.2f}s   replay {t_rep:7.2f}s "
          f"{mb/t_rep:7.1f} MB/s  ({nev/1e6:.1f}M events)")

    # ---- device kernel (warm, then timed) ----
    out = rc_vmem.enc_triples_batch(tris)             # compiles
    t0 = time.perf_counter()
    out = rc_vmem.enc_triples_batch(tris)
    t_k = time.perf_counter() - t0
    print(f"rc kernel   {t_k:7.2f}s {mb/t_k:7.1f} MB/s "
          f"({nev/t_k/1e6:.0f}M events/s)")

    # ---- full device pipeline, steady state ----
    t0 = time.perf_counter()
    dev = fqz.compress_batch_device(jobs)
    t_dev = time.perf_counter() - t0
    ok = dev is not None and all(a == b for a, b in zip(dev, ref))
    print(f"device pipe {t_dev:7.2f}s {mb/t_dev:7.1f} MB/s  "
          f"byte-exact={ok}  ({mb/t_host:.1f} -> {mb/t_dev:.1f} MB/s, "
          f"{t_host/t_dev:.2f}x)")


if __name__ == "__main__":
    main()
