"""CLI tools: stream parity with the reference binaries."""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def run_tool(tool, args, data: bytes) -> bytes:
    r = subprocess.run(
        [sys.executable, "-m", f"htscodecs_tpu.tools.{tool}", *args],
        input=data, capture_output=True, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stderr.decode()
    return r.stdout


def test_rans4x16_raw_golden(qdata, dat_dir):
    data = qdata["q4"]
    for o in ("1", "193", "8.4"):
        blob = run_tool("rans4x16", ["-r", "-o", o], data)
        golden = dat_dir / "r4x16" / f"q4.{o.replace('.4', '')}"
        if golden.exists():
            assert blob == golden.read_bytes()
        assert run_tool("rans4x16", ["-r", "-d"], blob) == data


def test_rans4x16_framed_round_trip(qdata):
    data = qdata["q8"]
    blob = run_tool("rans4x16", ["-o", "1", "-b", "50000"], data)
    assert run_tool("rans4x16", ["-d"], blob) == data


def test_rans4x8_and_arith(qdata, dat_dir):
    data = qdata["q4"]
    blob = run_tool("rans4x8", ["-r", "-o", "1"], data)
    assert blob == (dat_dir / "r4x8" / "q4.1").read_bytes()
    blob = run_tool("arith", ["-r", "-o", "65"], data)
    assert blob == (dat_dir / "arith" / "q4.65").read_bytes()
    assert run_tool("arith", ["-r", "-d"], blob) == data


def test_fqz_cli(dat_dir):
    raw = (dat_dir / "q40+dir").read_bytes()
    blob = run_tool("fqz", ["-r", "-s", "2"], raw)
    assert blob == (dat_dir / "fqzcomp" / "q40+dir.2").read_bytes()
    out = run_tool("fqz", ["-r", "-d"], blob)
    expect = b"".join(line.split(b"\t")[0].split(b" ")[0] + b"\n"
                      for line in raw.split(b"\n") if line)
    assert out == expect


def test_rans4x8_framed_matches_c_tool(dat_dir, ref_tools):
    """Framed mode carries the reference tool's per-block order flag
    byte (tests/rANS_static_test.c:244,272): streams must be
    byte-identical and cross-decodable both directions."""
    raw = (dat_dir / "q40+dir").read_bytes()
    ours = run_tool("rans4x8", ["-o", "1"], raw)
    c = subprocess.run([str(ref_tools / "rANS_static_test"), "-o", "1"],
                       input=raw, capture_output=True)
    assert ours == c.stdout
    assert run_tool("rans4x8", ["-d"], c.stdout) == raw
    cdec = subprocess.run([str(ref_tools / "rANS_static_test"), "-d"],
                          input=ours, capture_output=True)
    assert cdec.stdout == raw


def test_fqz_dump_params(dat_dir):
    """-D dumps the parameter block (dump_params equivalent) without
    changing the emitted stream, on both encode and decode."""
    raw = (dat_dir / "q40+dir").read_bytes()
    r = subprocess.run(
        [sys.executable, "-m", "htscodecs_tpu.tools.fqz", "-r", "-s", "1",
         "-D"], input=raw, capture_output=True, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr.decode()
    assert run_tool("fqz", ["-r", "-s", "1"], raw) == r.stdout
    err = r.stderr.decode()
    assert "Global params = {" in err and "Param[0] = {" in err
    assert "context\t0x" in err
    # decode side reads the block back out of the stream
    r2 = subprocess.run(
        [sys.executable, "-m", "htscodecs_tpu.tools.fqz", "-r", "-d", "-D"],
        input=r.stdout, capture_output=True, cwd=REPO, timeout=600)
    assert r2.returncode == 0, r2.stderr.decode()
    assert "Global params = {" in r2.stderr.decode()


def test_tok3_cli(names_dir):
    raw = (names_dir / "05.names").read_bytes()
    blob = run_tool("tok3", ["-r", "-N", "7"], raw)
    out = run_tool("tok3", ["-r", "-d"], blob)
    assert out.replace(b"\x00", b"\n") == raw
