#!/usr/bin/env python
"""Verify fidelity against the released DMPfold2 checkpoint.

The acceptance bar (BASELINE.md) is matching `fold.pdb` for the bundled
PF10963 example at default settings with the *released* weights. Those
weights are not available offline, so this script operationalizes the check
for any environment that can reach them:

  1. resolve the two-part torch checkpoint — from ``--weights-dir`` /
     ``DMPFOLD2_WEIGHTS_DIR`` (an offline mount or pre-populated cache,
     sha256-verified), else download from the same URLs the reference uses,
  2. run the REFERENCE pipeline (torch, imported from --reference-path) on
     PF10963 with those weights,
  3. run THIS framework with the converted weights (fp32_strict precision:
     LU DCA inverse like the reference's torch.inverse, raw eigh signs,
     full-fp32 matmuls),
  4. compare coordinates/confidences and report per-atom deltas.

``--canonical-signs`` equalizes the one implementation-arbitrary convention:
eigenvector signs out of the (L,L) MDS eigendecomposition. torch>=2 removed
``torch.symeig`` so the reference needs a shim either way; with this flag the
shim canonicalizes signs (largest-|component| positive) and our engine runs
its canonical mode, isolating genuine numeric drift from LAPACK sign-
convention differences between builds (measured in this environment: raw
signs differ between torch and XLA:CPU, moving coordinates by several
Angstrom while confidences agree to 1e-6 — tests/test_reference_e2e.py).

Usage:
  python scripts/verify_released_weights.py \
      [--reference-path /root/reference] [--weights-dir DIR] \
      [--canonical-signs] [--tolerance 0.01]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

import numpy as np

# runnable without installation: the package lives one level up
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sha256 of the released two-part checkpoint (psipred/DMPfold2@master
# dmpfold/trained_model/) — unknown in this offline environment; fill in on
# first verified download, after which any mounted copy is integrity-checked.
RELEASED_SHA256 = {
    "FINAL_fullmap_e2e_model_part1.pt": None,
    "FINAL_fullmap_e2e_model_part2.pt": None,
}


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def resolve_weights(weights_dir: str | None):
    """Locate (or fetch) the released checkpoint; returns the two paths."""
    from dmpfold2_tpu.engine.fold import (_default_weight_paths,
                                          _download_trained_model)

    modeldir, paths = _default_weight_paths()
    weights_dir = weights_dir or os.environ.get("DMPFOLD2_WEIGHTS_DIR")
    if weights_dir:
        mounted = [os.path.join(weights_dir, os.path.basename(p))
                   for p in paths]
        if all(os.path.isfile(p) for p in mounted):
            for src in mounted:
                want = RELEASED_SHA256.get(os.path.basename(src))
                if want is not None:
                    got = _sha256(src)
                    if got != want:
                        raise SystemExit(
                            f"{src}: sha256 {got} != pinned {want} — "
                            "refusing to verify against unknown weights")
                else:
                    print(f"note: no pinned sha256 for "
                          f"{os.path.basename(src)}; using mounted file "
                          "unverified", file=sys.stderr)
            # use the mount in place: copying into the package tree would
            # make later load_weights() calls silently treat these as the
            # released checkpoint
            return mounted
        print(f"weights dir {weights_dir} does not hold both checkpoint "
              "parts; falling back to download", file=sys.stderr)
    if not all(os.path.isfile(p) for p in paths):
        _download_trained_model(modeldir, paths)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference-path", default="/root/reference")
    ap.add_argument("--weights-dir", default=None,
                    help="offline mount holding the two released .pt parts "
                         "(default: $DMPFOLD2_WEIGHTS_DIR)")
    ap.add_argument("--aln", default=None, help="default: bundled PF10963.aln")
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--minsteps", type=int, default=100)
    ap.add_argument("--canonical-signs", action="store_true",
                    help="equalize eigenvector sign conventions on both "
                         "sides (see module docstring)")
    ap.add_argument("--tolerance", type=float, default=0.01,
                    help="max per-coordinate |delta| in Angstrom")
    ap.add_argument("--platform", default=None,
                    help="force the JAX platform (e.g. 'cpu'); needed where "
                         "a sitecustomize pins JAX_PLATFORMS early")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    aln_path = args.aln or os.path.join(
        args.reference_path, "dmpfold", "example", "PF10963.aln")

    from dmpfold2_tpu.engine.fold import Folder
    from dmpfold2_tpu.utils.aln import parse_aln
    from dmpfold2_tpu.weights import load_torch_checkpoint

    # 1+3: resolve + convert the RELEASED torch checkpoint explicitly —
    # load_weights() would silently prefer a pre-existing
    # trained_model/params.npz of unknown provenance, and this comparison is
    # only meaningful when both pipelines hold the same weights
    paths = resolve_weights(args.weights_dir)
    params = load_torch_checkpoint(paths)
    alnmat = parse_aln(aln_path)
    if args.canonical_signs:
        ours_c, ours_f = Folder(params, precision="fp32",
                                dca_method="lu").fold(
            alnmat, iterations=args.iterations, minsteps=args.minsteps)
    else:
        # fp32_strict: raw eigenvector signs + LU DCA + full-fp32 matmuls
        # (dca_method "auto" resolves to "lu" under fp32_strict, mirroring
        # the reference's torch.inverse LU factorization, predict.py:53)
        ours_c, ours_f = Folder(params, precision="fp32_strict").fold(
            alnmat, iterations=args.iterations, minsteps=args.minsteps)

    # 2: the reference's own pipeline with the same weights
    sys.path.insert(0, args.reference_path)
    import torch

    def _symeig(m, eigenvectors=True, upper=True):  # torch>=2 removed symeig
        w, v = torch.linalg.eigh(m, UPLO="U" if upper else "L")
        if args.canonical_signs:
            idx = v.abs().argmax(dim=-2, keepdim=True)
            comp = torch.gather(v, -2, idx)
            v = v * torch.where(comp < 0, -1.0, 1.0)
        return w, v

    torch.symeig = _symeig
    from dmpfold.predict import aln_to_coords as ref_aln_to_coords

    # pass the checkpoint explicitly as ONE merged file: without
    # weights_file the reference resolves weights against ITS OWN package
    # dir (predict.py:83-92) — absent there, it would re-download (or die
    # on a read-only mount), silently ignoring the weights being verified
    import tempfile

    merged = {}
    for part in paths:
        merged.update(torch.load(part, map_location="cpu"))
    with tempfile.NamedTemporaryFile(suffix=".pt", delete=False) as tmp:
        torch.save(merged, tmp.name)
        merged_path = tmp.name
    try:
        ref_c, ref_f = ref_aln_to_coords(
            aln_path, iterations=args.iterations, minsteps=args.minsteps,
            weights_file=merged_path)
    finally:
        os.unlink(merged_path)
    ref_c, ref_f = ref_c.numpy(), ref_f.numpy()

    dc = np.abs(ours_c - ref_c)
    df = np.abs(ours_f - ref_f)
    print(f"coords: max|delta| {dc.max():.5f} A   mean {dc.mean():.5f} A")
    print(f"confs:  max|delta| {df.max():.5f}     mean {df.mean():.5f}")
    if dc.max() <= args.tolerance:
        print(f"PASS (tolerance {args.tolerance} A)")
        return 0
    print(f"FAIL (tolerance {args.tolerance} A) — if confs agree but coords "
          "diverge, suspect raw eigh sign-convention differences between "
          "LAPACK builds; re-run with --canonical-signs (see "
          "ARCHITECTURE.md deviations #1)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
