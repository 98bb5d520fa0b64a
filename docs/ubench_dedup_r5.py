"""Round-5: deduped-table decode kernel regression + A=96 boundary.

The decode kernel's pair-packed tables are now one-copy-per-block
(lane-group where-chains) instead of x4 lane-replicated.  This probe
(a) regression-checks decode throughput at A=8 (synth4-class) and
A=48 (q40-class) vs the round-3 numbers (2704 / 929 MB/s at
B=12288), and (b) compiles the A=96 kernel at a tiny NW to separate
VMEM-budget failures from kernel-structure failures.

  python docs/ubench_dedup_r5.py [B]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 12288
N = 65536


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


def tile_file(path, n_blocks, n):
    import pathlib
    raw = np.frombuffer(pathlib.Path(path).read_bytes(), np.uint8)
    nb = max(len(raw) // n, 1)
    base = raw[:nb * n].reshape(nb, n)
    reps = -(-n_blocks // nb)
    return np.tile(base, (reps, 1))[:n_blocks]


def run(name, blocks, n=None):
    n = n if n is not None else blocks.shape[1]
    blocks = blocks[:, :n]
    Bc = blocks.shape[0]
    mb = Bc * n / 1e6
    jb = jnp.asarray(blocks)
    st = tables_v2.build_o1_device_async(jb)
    if st is None:
        print(f"{name}: table build declined")
        return
    alpha_d, packed_d, _fh, meta_d, _H, _A = st
    shiftv = meta_d[:, 1].astype(jnp.int32)
    A_pad = int(packed_d.shape[1])
    st_d, w_d, n_d, ovf, mseg = rans_vmem._enc_vmem(
        jb, alpha_d, packed_d, shiftv, n, 1, rans_v2.SEG_CAP2,
        prefetch=True)
    counts = np.asarray(n_d)
    assert not bool(np.asarray(ovf))
    cap = int(((counts.max() + 2 * rans_v2.CHUNK - 1)
               // rans_v2.CHUNK) * rans_v2.CHUNK)
    w16 = w_d[:, :cap].astype(jnp.uint16)
    st_T = jnp.transpose(st_d.astype(jnp.uint32), (1, 0))
    al_T = jnp.transpose(alpha_d, (1, 0))
    NWc = max(-(-(-(-cap // rans_vmem.NW_STEP) * rans_vmem.NW_STEP)
                // rans_vmem.CW), 1)
    q = n >> 2
    est = rans_vmem._vmem_est(A_pad, cap, 128) / 2**20
    print(f"{name}: A_pad={A_pad} cap={cap} est={est:.2f}MB "
          f"maxseg={int(np.asarray(mseg))}")
    try:
        t0 = time.time()
        out = rans_vmem._dec_vmem(st_T, w16, packed_d, al_T, shiftv,
                                  A_pad, NWc, q, q, n, 1)
        np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
        tw = time.time() - t0
        td = 1e9
        for _ in range(2):
            t0 = time.time()
            out = rans_vmem._dec_vmem(st_T, w16, packed_d, al_T,
                                      shiftv, A_pad, NWc, q, q, n, 1)
            np.asarray(jnp.sum(out[:, :4].astype(jnp.uint32)))
            td = min(td, time.time() - t0)
        mism = int(np.asarray(jnp.sum(out != jb)))
        print(f"{name}: dec warm {tw:.2f}s steady {td:.3f}s "
              f"{mb/td:.1f} MB/s mismatches={mism}")
    except Exception as e:
        print(f"{name}: dec FAIL:", str(e).splitlines()[0][:200])


def main():
    print("devices:", jax.devices())
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    if which in ("all", "synth4"):
        run("synth4", np.tile(synth_quality(8, N), (B // 8, 1)))
    if which in ("all", "q40dir"):
        run("q40dir", tile_file("/root/reference/tests/dat/q40+dir",
                                B, N))
    if which in ("all", "uni64"):
        # A=96 structure-vs-budget: tiny stream, est ~3.3 MB
        rng = np.random.default_rng(13)
        run("uni64_tinyN", (rng.integers(0, 64, (2048, 8192)) + 33
                            ).astype(np.uint8))


if __name__ == "__main__":
    main()
