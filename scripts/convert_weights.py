#!/usr/bin/env python
"""Convert a torch DMPfold2 checkpoint to the native .npz format.

Usage:
  python scripts/convert_weights.py part1.pt [part2.pt ...] -o params.npz
  python scripts/convert_weights.py            # released 2-part checkpoint
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoints", nargs="*",
                    help="torch .pt state-dict shard(s), merged in order")
    ap.add_argument("-o", "--output", default="params.npz")
    args = ap.parse_args()

    from dmpfold2_tpu import weights

    if args.checkpoints:
        params = weights.load_torch_checkpoint(args.checkpoints)
    else:
        from dmpfold2_tpu.engine.fold import load_weights

        params = load_weights()
    weights.save_params(args.output, params)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
