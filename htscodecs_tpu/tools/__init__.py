"""Command-line tools mirroring the reference test binaries.

Each tool is stream-compatible with its C counterpart (same raw and
framed modes), so archives can be moved between the two freely:

    python -m htscodecs_tpu.tools.rans4x16 -o 193 < in > out
    python -m htscodecs_tpu.tools.rans4x16 -d < out | cmp - in
"""
