"""Run-length transform (X_RLE).

Behavioural parity with ``/root/reference/htscodecs/rle.c``: a scoring
pass picks which symbols benefit from RLE, then runs of those symbols
are split into a literals stream and a varint run-length stream.

The NumPy forms here are vectorised host code; RLE decode on device is
a prefix-sum/scatter (see ops/rans_jax.py when batching).
"""

from __future__ import annotations

import numpy as np

from ..utils import varint


def find_syms(data: np.ndarray) -> np.ndarray:
    """Score symbols: +1 each time a byte repeats its predecessor,
    -1 otherwise; symbols with positive score get run-length coded
    (``rle.c:48-98``)."""
    if not len(data):
        return np.zeros(0, dtype=np.uint8)
    rep = np.empty(len(data), dtype=bool)
    rep[0] = False
    rep[1:] = data[1:] == data[:-1]
    delta = np.where(rep, 1, -1)
    saved = np.zeros(256, dtype=np.int64)
    np.add.at(saved, data, delta)
    return np.flatnonzero(saved > 0).astype(np.uint8)


def encode(data: np.ndarray, rle_syms: np.ndarray | None = None):
    """Returns (literals, runs bytes, rle_syms)."""
    if rle_syms is None:
        rle_syms = find_syms(data)
    in_rle = np.zeros(256, dtype=bool)
    in_rle[rle_syms] = True

    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.uint8), b"", rle_syms

    # Run boundaries: start of each maximal run of equal bytes.
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = data[1:] != data[:-1]
    starts = np.flatnonzero(change)
    lens = np.diff(np.append(starts, n))
    vals = data[starts]

    runs = bytearray()
    keep = in_rle[vals]
    lits_parts = []
    # Literals: one byte per run for RLE'd symbols, the full run otherwise.
    for s, ln, v, k in zip(starts, lens, vals, keep):
        if k:
            lits_parts.append(data[s:s + 1])
            varint.put_uint(runs, int(ln) - 1)
        else:
            lits_parts.append(data[s:s + ln])
    lits = np.concatenate(lits_parts) if lits_parts else np.zeros(0, dtype=np.uint8)
    return lits, bytes(runs), rle_syms


def decode(lits, runs: bytes, rle_syms, out_len_max: int):
    """Expand literals+runs.  Returns uint8 array or None on error."""
    in_rle = np.zeros(256, dtype=bool)
    in_rle[np.asarray(rle_syms, dtype=np.uint8)] = True

    out = np.empty(out_len_max, dtype=np.uint8)
    rpos = 0
    rend = len(runs)
    opos = 0
    for b in lits:
        if opos >= out_len_max:
            return None
        if not in_rle[b]:
            out[opos] = b
            opos += 1
        else:
            rlen, rpos = varint.get_uint(runs, rpos, rend)
            if rlen:
                if opos + rlen >= out_len_max:
                    return None
                out[opos:opos + rlen + 1] = b
                opos += rlen + 1
            else:
                out[opos] = b
                opos += 1
    return out[:opos]
