"""Length bucketing: variable-length utterances -> a small set of static
shapes so XLA compiles once per bucket (SURVEY §5 'long-context': fixed
buckets + masks replace the reference's per-file dynamic shapes)."""

from __future__ import annotations


def bucket_length(n: int, floor: int = 4096) -> int:
    """Smallest (1, 1.25, 1.5, 1.75) * 2^k >= n (bounded compile count)."""
    if n <= floor:
        return floor
    k = (n - 1).bit_length()
    base = 1 << (k - 1)
    for mult in (1.25, 1.5, 1.75, 2.0):
        b = int(base * mult)
        if b >= n:
            return b
    return 1 << k
