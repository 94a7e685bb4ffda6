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
# Residue buckets are deliberately fine-grained at small L: trunk FLOPs grow
# as L² and the DCA inverse as L³, so rounding 82 -> 96 wastes ~27% of the
# trunk (measured: the Pfam-like throughput bench gains +13% from 8-step
# buckets below 128). Granularity tapers off as compile cost per bucket and
# the relative padding waste both shrink with L. All programs land in the
# persistent compilation cache, so a production server pays each bucket once.
RES_BUCKETS = (
    list(range(32, 129, 8))         # 32..128 step 8   (waste <= ~19% trunk)
    + list(range(144, 257, 16))     # 144..256 step 16
    + list(range(288, 1025, 32))    # 288..1024 step 32
    + [1152, 1280, 1408, 1536]
)


def _round_up(value: int, buckets: list[int]) -> int:
    idx = bisect.bisect_left(buckets, value)
    if idx == len(buckets):
        return value  # beyond the largest bucket: use the exact size
    return buckets[idx]


def bucket_shape(nseqs: int, nres: int, enable: bool = True) -> tuple[int, int]:
    if not enable:
        return nseqs, nres
    return _round_up(nseqs, SEQ_BUCKETS), _round_up(nres, RES_BUCKETS)
