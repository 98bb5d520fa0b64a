"""Prefetched-triple range-coder kernel (ops/rc_vmem.py), interpret
mode: byte-exact vs the native fqz encoder and the Python
RangeEncoder on the same replayed triples.

CPU note: interpret-mode compiles scale superlinearly with per_r (the
event-compaction one-hot), so these tests run per_r=8 on tiny blocks;
per_r does not change output bytes (the stitch reassembles segments
identically) and the production per_r=32 path is chip-validated by
docs/ubench_fqz_rc_r4.py.

Reference semantics: c_range_coder.h:46-89, fqzcomp_qual.c:1040-1113.
"""

import numpy as np
import pytest

from htscodecs_tpu import native
from htscodecs_tpu.models import fqz
from htscodecs_tpu.ops import rc_vmem
from htscodecs_tpu.ops.range_coder import RangeEncoder

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _mk_jobs(B, nrec, L, seed):
    rng = np.random.default_rng(seed)
    jobs = []
    for b in range(B):
        data = rng.integers(28 + (b % 3), 42, (nrec * L,)).astype(
            np.uint8)
        jobs.append((data, [L] * nrec, [0] * nrec))
    return jobs


def _replay(jobs, strat=0):
    tris, refs = [], []
    for data, lens, flags in jobs:
        gp = fqz.pick_parameters(4, strat, lens, list(flags),
                                 data.copy())
        packed = fqz._pack_gp(gp)
        ref = native.fqz_enc_scan(
            data, np.asarray(lens, np.uint32),
            np.asarray(flags, np.uint32), gp, packed)
        tri = native.fqz_enc_replay(
            data, np.asarray(lens, np.uint32),
            np.asarray(flags, np.uint32), gp, packed)
        assert ref is not None and tri is not None
        refs.append(ref)
        tris.append(tri)
    return tris, refs


def test_replay_triples_match_python_rc():
    """The replay pass alone: triples + the Python RangeEncoder must
    reproduce the native encoder's payload exactly."""
    jobs = _mk_jobs(2, 24, 40, 3)
    tris, refs = _replay(jobs)
    for (acc, f, tot), ref in zip(tris, refs):
        rc = RangeEncoder()
        for k in range(len(acc)):
            rc.encode(int(acc[k]), int(f[k]), int(tot[k]))
        assert rc.finish() == ref


def test_kernel_byte_exact_interpret():
    jobs = _mk_jobs(3, 3, 20, 7)
    tris, refs = _replay(jobs)
    out = rc_vmem.enc_triples_batch(tris, per_r=8, interpret=True)
    assert out is not None
    for k, (a, b) in enumerate(zip(out, refs)):
        assert a == b, k


def test_fqz_compress_batch_device_interpret(monkeypatch):
    """The full batched entry is byte-identical to fqz.compress."""
    from htscodecs_tpu.ops import rans_v2
    monkeypatch.setattr(rans_v2, "_vmem_engine_ok", lambda: True)
    jobs = _mk_jobs(2, 3, 18, 11)
    ref = [fqz.compress(d, l, f) for d, l, f in jobs]
    got = fqz.compress_batch_device(
        [(d, l, list(f)) for d, l, f in jobs], per_r=8, interpret=True)
    assert got is not None
    assert got == ref
