"""Batched API must produce byte-identical streams to the host codec.

Runs in a scrubbed-env subprocess (CPU backend) so the shape-specialised
scans compile quickly and deterministically.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import sys
sys.path.insert(0, "__REPO__")
import numpy as np
from htscodecs_tpu.models import batch, rans4x16

rng = np.random.default_rng(5)
for order in (0, 1):
    for N in (1000, 4096, 1003):
        blocks = [
            (rng.integers(0, 30, N, dtype=np.uint8) + 33) for _ in range(20)
        ]
        dev = batch.compress_blocks(blocks, order, engine="device")
        ref = [rans4x16.compress(b, order) for b in blocks]
        assert dev == ref, f"encode mismatch order={order} N={N}"
        back = batch.uncompress_blocks(dev, engine="device")
        assert back == [b.tobytes() for b in blocks], f"decode mismatch {order} {N}"

# mixed lengths and transform flags route through the host path
mixed = [b"hello world" * 30, bytes(rng.integers(0, 4, 777, dtype=np.uint8) + 60)]
enc = batch.compress_blocks(mixed, 193)
assert [rans4x16.uncompress(e) for e in enc] == [bytes(m) for m in mixed]
print("BATCH-OK")
"""


def test_batch_matches_host():
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("__REPO__", str(REPO))],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert "BATCH-OK" in r.stdout, r.stdout + r.stderr[-3000:]


def test_transform_streams_batch_decode():
    """PACK/RLE/STRIPE/CAT/NOSZ streams decode through the batched
    path identically to the host wrapper."""
    import numpy as np
    from htscodecs_tpu.models import batch, rans4x16
    rng = np.random.default_rng(67)
    datas, streams, sizes = [], [], []
    for order in (0, 1, 0x40, 0x41, 0x80, 0x81, 0xC0, 0xC1,
                  0x08 | 1, 0x20, 0x10 | 1):
        for _ in range(6):
            n = int(rng.integers(64, 3000))
            d = (np.repeat(rng.choice(6, n), 1)[:n] * 7 + 33).astype(np.uint8)
            if order & 0x08:
                o = order | (4 << 8)      # stripe N=4
            else:
                o = order
            s = rans4x16.compress(d, o)
            datas.append(d)
            streams.append(s)
            sizes.append(n)
    dec = batch.uncompress_blocks(streams, out_sizes=sizes, engine="device")
    for d, got in zip(datas, dec):
        assert got == d.tobytes()
    # and without out_sizes for the non-NOSZ ones
    keep = [i for i, s in enumerate(streams)
            if not (s[0] & rans4x16.X_NOSZ)]
    dec2 = batch.uncompress_blocks([streams[i] for i in keep],
                                   engine="device")
    for k, i in enumerate(keep):
        assert dec2[k] == datas[i].tobytes()


def test_fqz_batch_wrappers():
    import numpy as np
    from htscodecs_tpu.models import batch, fqz
    rng = np.random.default_rng(5)
    jobs = []
    for _ in range(5):
        data = (rng.integers(0, 8, 3000) + 2).astype(np.uint8)
        jobs.append((data, [100] * 30))
    streams = batch.fqz_compress_blocks(jobs)
    assert streams == [fqz.compress(d, l) for d, l in jobs]
    dec = batch.fqz_decompress_blocks(streams)
    assert all(dec[i] == jobs[i][0].tobytes() for i in range(5))
