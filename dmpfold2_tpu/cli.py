"""Command-line driver: `dmpfold -i input.aln > model.pdb`.

Flag-compatible with the reference CLI (reference: dmpfold/predict.py:160-208):
-i/--input_file, -d/--device, -t/--template, -n/--iterations, -m/--minsteps,
-w/--model_weights. Output formatting is byte-identical (REMARK CONF header,
N/CA/C/O/CB records with confidence in the B-factor column, glycine CB skip).

Net-new over the reference's single-target CLI: `-i` takes any number of
alignments, and with `-o OUTDIR` the targets stream through the bucketed
data-parallel batch engine (parallel/stream.BatchFolder — the same path the
HTTP server uses), writing `<outdir>/<stem>.pdb` per input at batched
throughput instead of one program dispatch per target.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from .config import FoldConfig
from .engine.fold import DEFAULT_ITERATIONS, DEFAULT_MINSTEPS, aln_to_coords
from .utils.pdb import format_pdb


def _iterations_arg(value: str):
    """-n accepts an int or 'auto' (plateau-stopped recycling, net-new)."""
    if value == "auto":
        return "auto"
    return int(value)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=(
            "The DMPfold2 method for fast and accurate protein structure "
            "prediction (TPU-native engine). Prints a PDB format model file."
        )
    )
    parser.add_argument("-i", "--input_file", type=str, required=True,
                        nargs="+",
                        help="input sequence alignment(s) in aln format; "
                             "multiple files fold as one batched stream "
                             "(requires -o)")
    parser.add_argument("-d", "--device", type=str, default=None, required=False,
                        help="device to run on (ignored; JAX auto-selects)")
    parser.add_argument("-t", "--template", type=str, required=False,
                        nargs="+",
                        help="use a PDB file as a template; in batch mode "
                             "(-o with several -i inputs) pass one template "
                             "per input positionally, with '-' for targets "
                             "without one")
    parser.add_argument("-n", "--iterations", type=_iterations_arg,
                        default=DEFAULT_ITERATIONS, required=False,
                        help="number of iteration cycles, or 'auto' to "
                             "recycle until the confidence plateaus "
                             "(single-target mode)")
    parser.add_argument("-m", "--minsteps", type=int, default=DEFAULT_MINSTEPS,
                        required=False, help="number of minimization steps")
    parser.add_argument("-w", "--model_weights", type=str, required=False,
                        help="custom model weights (.pt state dict or native .npz)")
    # TPU-native additions beyond the reference's 6 flags
    parser.add_argument("--precision", type=str, default=None,
                        choices=["fp32", "bf16", "fp32_strict"],
                        help="compute policy (default fp32; bf16 runs the "
                             "trunk on the MXU in bfloat16)")
    parser.add_argument("--dca-method", dest="dca_method", type=str, default=None,
                        choices=["auto", "cholesky", "lu", "schur", "blocked"],
                        help="DCA covariance inverse algorithm")
    parser.add_argument("-o", "--out-dir", dest="out_dir", type=str, default=None,
                        help="write <stem>.pdb per input here instead of "
                             "stdout; enables the batched streaming engine "
                             "for multiple inputs")
    parser.add_argument("--batch-size", dest="batch_size", type=int, default=16,
                        help="targets folded per device dispatch in batch "
                             "mode (per shape bucket)")
    return parser


def _run_batch(args, parser) -> None:
    """Fold many alignments through the streaming batch engine."""
    from .engine.fold import load_weights
    from .parallel.stream import BatchFolder, Target
    from .utils import pdb as pdb_io
    from .utils.aln import parse_aln
    from .utils.cache import enable_persistent_cache

    inputs = args.input_file
    stems = [os.path.splitext(os.path.basename(p))[0] for p in inputs]
    dup = {s for s in stems if stems.count(s) > 1}
    if dup:
        parser.error(f"duplicate output stems {sorted(dup)}: inputs would "
                     "overwrite each other's PDBs; rename the files")
    templates: list[str | None] = [None] * len(inputs)
    if args.template is not None:
        if len(args.template) == 1 and len(inputs) > 1:
            parser.error("-t/--template takes one template PER INPUT in "
                         "batch mode (use '-' for targets without one); a "
                         "single shared template across different targets "
                         "is almost certainly a mistake")
        if len(args.template) != len(inputs):
            parser.error(f"-t got {len(args.template)} templates for "
                         f"{len(inputs)} inputs; counts must match "
                         "positionally ('-' = no template)")
        templates = [None if t == "-" else t for t in args.template]
    if args.iterations == "auto":
        parser.error("-n auto is single-target only (early exit inside a "
                     "shape-bucketed batch would stall on the slowest "
                     "batchmate; use a fixed -n with -o)")

    enable_persistent_cache()
    cfg = FoldConfig.from_cli_args(args)
    targets = []
    for p, t in zip(inputs, templates):
        alnmat = parse_aln(p)
        template_ca = pdb_io.parse_template_ca(t) if t is not None else None
        if (template_ca is not None
                and template_ca.shape[0] != alnmat.shape[1]):
            # validate before dispatch: a wrong-length template raising
            # inside the batch engine would demote every batchmate to the
            # serial single-target fallback instead of reporting the
            # user's input error
            parser.error(
                f"template {t} has {template_ca.shape[0]} CA atoms but "
                f"{p} has {alnmat.shape[1]} residues — lengths must match")
        targets.append(Target(alnmat=alnmat, template_ca=template_ca))
    params = load_weights(cfg.weights_file)
    folder = BatchFolder(params, batch_size=args.batch_size,
                         precision=cfg.precision, dca_method=cfg.dca_method,
                         vgru_impl=cfg.vgru_impl)
    os.makedirs(args.out_dir, exist_ok=True)
    t0 = time.perf_counter()
    results = folder.fold_many(targets, iterations=cfg.iterations,
                               minsteps=cfg.minsteps)
    elapsed = time.perf_counter() - t0
    failed = []
    for path, stem, target, result in zip(inputs, stems, targets, results):
        if result is None:  # per-target failure already logged by the folder
            failed.append(path)
            continue
        coords, confs = result
        out_path = os.path.join(args.out_dir, stem + ".pdb")
        with open(out_path, "w") as fh:
            for line in format_pdb(coords, confs, target.alnmat[0]):
                fh.write(line + "\n")
    ok = len(inputs) - len(failed)
    print(f"folded {ok}/{len(inputs)} targets in {elapsed:.2f}s "
          f"({ok / max(elapsed, 1e-9):.2f} targets/s) -> {args.out_dir}",
          file=sys.stderr)
    if failed:
        print("FAILED: " + " ".join(failed), file=sys.stderr)
        raise SystemExit(1)


def run_dmpfold(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    if len(args.input_file) > 1 and args.out_dir is None:
        parser.error("multiple inputs need -o/--out-dir (one PDB per target)")
    if args.out_dir is not None:
        return _run_batch(args, parser)
    if args.template is not None and len(args.template) > 1:
        parser.error("multiple -t templates need batch mode (-o with "
                     "matching -i inputs)")
    config = FoldConfig.from_cli_args(args)
    coords, confs, alnmat = aln_to_coords(
        args.input_file[0], device=args.device, return_alnmat=True, config=config,
    )
    for line in format_pdb(coords, confs, alnmat[0]):
        print(line)


if __name__ == "__main__":
    run_dmpfold(sys.argv[1:])
