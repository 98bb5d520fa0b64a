"""Engine x golden-vector conformance matrix.

The reference double-checks its C library against the JavaScript
implementation (reference javascript/Makefile:22-40); node is absent
here, so the matrix uses four legs: the pure-Python oracle, the native
C host kernels, the batched device engines, and — the one genuinely
independent implementation — the reference's own C decoder binaries
built by conftest.  Every golden vector decodes through EVERY leg, and
freshly-encoded streams must decode through the reference C binary as
well, so a regression in one path cannot hide behind another.
"""

import os
import pathlib
import subprocess
import tempfile

import numpy as np
import pytest

from htscodecs_tpu import native
from htscodecs_tpu.models import batch as batchmod
from htscodecs_tpu.models import rans4x16, rans4x8
from htscodecs_tpu.models import arith as arithmod

DAT = pathlib.Path("/root/reference/tests/dat")

pytestmark = pytest.mark.skipif(not DAT.exists(),
                                reason="reference goldens unavailable")


def _vectors(sub):
    d = DAT / sub
    if not d.exists():
        return []
    return sorted(d.iterdir(), key=lambda p: p.name)


def _plain(name: str) -> bytes:
    """First column of the q* fixture, newline-stripped (what the
    reference test scripts feed the codecs)."""
    base = name.split(".")[0]
    return b"".join(line.split(b"\t")[0]
                    for line in (DAT / base).read_bytes().split(b"\n"))


_TOOL = {"r4x16": "rANS_static4x16pr_test", "r4x8": "rANS_static_test",
         "arith": "arith_dynamic_test"}


def _c_decode(ref_tools, codec: str, blob: bytes) -> bytes:
    """Decode through the reference C binary (-r raw framing, -d)."""
    with tempfile.TemporaryDirectory() as td:
        fi = os.path.join(td, "in")
        fo = os.path.join(td, "out")
        open(fi, "wb").write(blob)
        subprocess.run(
            [str(ref_tools / _TOOL[codec]), "-r", "-d", fi, fo],
            check=True, capture_output=True)
        return open(fo, "rb").read()


def _engines_r4x16():
    yield "python", lambda s, exp: _py_r4x16(s)
    if native.available():
        yield "native", lambda s, exp: rans4x16.uncompress(s)
        yield "device", lambda s, exp: batchmod.uncompress_blocks(
            [s], engine="device")[0]


def _py_r4x16(s: bytes) -> bytes:
    """Force the pure-Python oracle path."""
    old = rans4x16._USE_NATIVE
    rans4x16._USE_NATIVE = False
    try:
        return rans4x16.uncompress(s)
    finally:
        rans4x16._USE_NATIVE = old


@pytest.mark.parametrize("vec", [p.name for p in _vectors("r4x16")])
def test_r4x16_matrix(vec, ref_tools):
    stream = (DAT / "r4x16" / vec).read_bytes()
    expect = _plain(vec)
    for engine, dec in _engines_r4x16():
        got = dec(stream, expect)
        assert got == expect, (vec, engine)
    assert _c_decode(ref_tools, "r4x16", stream) == expect, (vec, "c-ref")


@pytest.mark.parametrize("vec", [p.name for p in _vectors("r4x8")])
def test_r4x8_matrix(vec, ref_tools):
    stream = (DAT / "r4x8" / vec).read_bytes()
    expect = _plain(vec)
    engines = {"host": lambda s: rans4x8.uncompress(s)}
    if native.available():
        engines["device"] = lambda s: batchmod.r4x8_uncompress_blocks(
            [s], engine="device")[0]
    for engine, dec in engines.items():
        assert dec(stream) == expect, (vec, engine)
    assert _c_decode(ref_tools, "r4x8", stream) == expect, (vec, "c-ref")


@pytest.mark.parametrize("vec", [p.name for p in _vectors("arith")])
def test_arith_matrix(vec, ref_tools):
    stream = (DAT / "arith" / vec).read_bytes()
    expect = _plain(vec)
    engines = {"host": lambda s: arithmod.uncompress(s)}
    if native.available():
        engines["device"] = lambda s: batchmod.arith_uncompress_blocks(
            [s], engine="device")[0]
    for engine, dec in engines.items():
        assert dec(stream) == expect, (vec, engine)
    assert _c_decode(ref_tools, "arith", stream) == expect, (vec, "c-ref")


@pytest.mark.parametrize("vec", [p.name for p in _vectors("r4x16")[:6]])
def test_r4x16_encode_matrix(vec, ref_tools):
    """Encoder agreement per engine: host wrapper vs batched device
    path (single-block group still exercises the deferred-transform
    pipeline via engine='device'), and the fresh stream must decode
    through the INDEPENDENT reference C decoder."""
    if not native.available():
        pytest.skip("native unavailable")
    order = int(vec.split(".")[1])
    data = _plain(vec)
    a = np.frombuffer(data, np.uint8)
    host = rans4x16.compress(a, order)
    dev = batchmod.compress_blocks([a], order, engine="device")[0]
    assert host == dev, vec
    assert rans4x16.uncompress(host) == data
    assert _c_decode(ref_tools, "r4x16", host) == data, (vec, "c-ref")
