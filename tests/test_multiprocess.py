"""Two-process distributed run (the N>=2 "hosts" axis): each process
drives 4 virtual CPU devices, jax.distributed coordinates over
loopback, streams stay byte-exact per host, and the ragged archive
index linearises across processes."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

from htscodecs_tpu import native

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid)
    import numpy as np
    sys.path.insert(0, "@REPO@")
    from htscodecs_tpu.parallel import distributed as dist
    from htscodecs_tpu.models import rans4x16
    mesh = dist.block_mesh()
    assert jax.process_count() == nproc
    rng = np.random.default_rng(100 + pid)
    blocks = (rng.integers(0, 10, (16, 1024)) + 33).astype(np.uint8)
    streams = dist.compress_blocks_o1(blocks, mesh)
    assert all(streams[b] == rans4x16.compress(blocks[b], 1)
               for b in range(len(blocks)))
    offs, total = dist.archive_offsets([len(s) for s in streams])
    back = dist.uncompress_blocks_o1(streams, mesh)
    assert all(back[b] == blocks[b].tobytes()
               for b in range(len(blocks)))
    # ragged + transform-flagged generalized path: mesh=None picks the
    # per-process LOCAL mesh under jax.distributed, so the processes
    # need no matching group structure (lengths differ per pid here)
    ragged = [(rng.integers(0, 6, n) * 2 + 33).astype(np.uint8)
              for n in (768, 768, 512 + 128 * pid, 1024)]
    for order in (1, 193):
        rs = dist.compress_blocks(ragged, order, engine="device")
        assert all(rs[b] == rans4x16.compress(ragged[b], order)
                   for b in range(len(ragged))), order
        rb = dist.uncompress_blocks(rs, engine="device")
        assert all(rb[b] == ragged[b].tobytes()
                   for b in range(len(ragged))), order
    print("RESULT", pid, int(offs[0]), total, flush=True)
""").replace("@REPO@", str(REPO))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_two_process_sharded_codec(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}:\n{out[-2000:]}"
    res = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, off0, total = line.split()
                res[int(pid)] = (int(off0), int(total))
    assert set(res) == {0, 1}
    # process 1's first block starts exactly where process 0's bytes end
    assert res[0][0] == 0
    assert res[0][1] == res[1][1]
    assert 0 < res[1][0] < res[1][1]
