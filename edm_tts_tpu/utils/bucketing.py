"""Static-shape bucketing helpers.

Everything under jit is compiled per shape, so serving and CLI paths round
dynamic sizes (text length, canvas length, batch size) UP to a small set of
buckets and mask the padding — each bucket compiles once and is reused
(reference has no analogous layer: its inference is exact-size batch-1,
/root/reference/inference.py:36-56, recompiling per utterance under
torch.compile or eating eager dispatch).
"""

from __future__ import annotations


def bucket_length(n: int, multiple: int, cap: int | None = None) -> int:
    """Round ``n`` up to a multiple (cap at ``cap``) so nearby lengths share
    one compiled canvas."""
    n = -(-max(n, 1) // multiple) * multiple
    return min(n, cap) if cap else n


def bucket_batch(n: int, buckets: tuple[int, ...]) -> int:
    """Smallest bucket >= n (buckets need not be sorted); n must fit."""
    fits = [b for b in buckets if b >= n]
    if not fits:
        raise ValueError(f"batch {n} exceeds largest bucket {max(buckets)}")
    return min(fits)
