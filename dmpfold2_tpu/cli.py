"""Command-line driver: `dmpfold -i input.aln > model.pdb`.

Flag-compatible with the reference CLI (reference: dmpfold/predict.py:160-208):
-i/--input_file, -d/--device, -t/--template, -n/--iterations, -m/--minsteps,
-w/--model_weights. Output formatting is byte-identical (REMARK CONF header,
N/CA/C/O/CB records with confidence in the B-factor column, glycine CB skip).
"""

from __future__ import annotations

import argparse
import sys

from .config import FoldConfig
from .engine.fold import DEFAULT_ITERATIONS, DEFAULT_MINSTEPS, aln_to_coords
from .utils.pdb import format_pdb


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=(
            "The DMPfold2 method for fast and accurate protein structure "
            "prediction (TPU-native engine). Prints a PDB format model file."
        )
    )
    parser.add_argument("-i", "--input_file", type=str, required=True,
                        help="input sequence alignment in aln format")
    parser.add_argument("-d", "--device", type=str, default=None, required=False,
                        help="device to run on (ignored; JAX auto-selects)")
    parser.add_argument("-t", "--template", type=str, required=False,
                        help="use a PDB file as a template")
    parser.add_argument("-n", "--iterations", type=int, default=DEFAULT_ITERATIONS,
                        required=False, help="number of iteration cycles")
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
    return parser


def run_dmpfold(argv=None) -> None:
    args = build_parser().parse_args(argv)
    config = FoldConfig.from_cli_args(args)
    coords, confs, alnmat = aln_to_coords(
        args.input_file, device=args.device, return_alnmat=True, config=config,
    )
    for line in format_pdb(coords, confs, alnmat[0]):
        print(line)


if __name__ == "__main__":
    run_dmpfold(sys.argv[1:])
