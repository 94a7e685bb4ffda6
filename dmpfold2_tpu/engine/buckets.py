"""Shape buckets: pad (nseqs, nres) to a small set of compiled shapes.

XLA compiles one program per input shape; per-target exact shapes would
recompile for every alignment. Buckets trade a little padded compute
(all padded work is masked out exactly — see features/, models/) for a
bounded number of compilations. The reference has no analog (PyTorch is
shape-dynamic); caps come from predict.py:130-132 (3000 rows).
"""

from __future__ import annotations

import bisect

SEQ_BUCKETS = [16, 32, 64, 128, 256, 512, 768, 1024, 1536, 2048, 3000]
RES_BUCKETS = [32, 48, 64, 96, 128, 160, 192, 224, 256, 320, 384, 448, 512,
               640, 768, 896, 1024, 1280, 1536]


def _round_up(value: int, buckets: list[int]) -> int:
    idx = bisect.bisect_left(buckets, value)
    if idx == len(buckets):
        return value  # beyond the largest bucket: use the exact size
    return buckets[idx]


def bucket_shape(nseqs: int, nres: int, enable: bool = True) -> tuple[int, int]:
    if not enable:
        return nseqs, nres
    return _round_up(nseqs, SEQ_BUCKETS), _round_up(nres, RES_BUCKETS)
