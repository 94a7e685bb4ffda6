"""PDB reading (template CA extraction) and writing.

The writer reproduces the reference output byte-for-byte (reference:
dmpfold/predict.py:189-208): a `REMARK  CONF:` line with the mean
confidence, then per residue the N/CA/C/O/CB atoms (CB skipped for
glycine), confidence in the B-factor column, then `END`.
"""

from __future__ import annotations

from typing import IO, Iterable

import numpy as np

from .aln import AA3, GLYCINE

ATOM_NAMES = (" N  ", " CA ", " C  ", " O  ", " CB ")


def parse_template_ca(path: str) -> np.ndarray:
    """Extract CA coordinates from fixed-column ATOM records -> (n, 3) float32.

    Mirrors the reference's column slicing (predict.py:106-117).
    """
    with open(path) as fh:
        return parse_template_ca_lines(fh, origin=path)


def parse_template_ca_text(text: str) -> np.ndarray:
    """Like :func:`parse_template_ca` but from PDB text already in memory
    (e.g. a template carried in an HTTP request body)."""
    return parse_template_ca_lines(text.splitlines(), origin="<text>")


def parse_template_ca_lines(lines: Iterable[str], origin: str = "?") -> np.ndarray:
    coords = []
    for line in lines:
        if line[:4] == "ATOM" and line[12:16] == " CA ":
            # keep only the primary conformer: alternate-location CA
            # records (altLoc column 17 = 'B', 'C', ...) would duplicate
            # residues and trip the template-length validation
            if len(line) > 16 and line[16] not in (" ", "A"):
                continue
            coords.append(
                np.array(
                    [float(line[30:38]), float(line[38:46]), float(line[46:54])],
                    dtype=np.float32,
                )
            )
    if not coords:
        raise ValueError(f"no CA atoms found in template {origin}")
    return np.stack(coords)


def format_pdb(coords: np.ndarray, confs: np.ndarray, seq_classes: np.ndarray) -> Iterable[str]:
    """Yield PDB lines for (nres, 5, 3) coords with (nres,) confidences.

    ``seq_classes`` is the encoded first alignment row, used for residue
    names and the glycine CB skip.
    """
    coords = np.asarray(coords)
    confs = np.asarray(confs)
    seq_classes = np.asarray(seq_classes)
    yield "REMARK  CONF:  %s" % float(confs.mean())
    atomnum = 1
    for ri in range(coords.shape[0]):
        rclass = int(seq_classes[ri])
        for ai, an in enumerate(ATOM_NAMES):
            if rclass != GLYCINE or ai != 4:
                yield "ATOM   %4d %s %s  %4d    %8.3f%8.3f%8.3f  1.00%6.2f" % (
                    atomnum,
                    an,
                    AA3[rclass] if rclass < len(AA3) else "UNK",
                    ri + 1,
                    float(coords[ri, ai, 0]),
                    float(coords[ri, ai, 1]),
                    float(coords[ri, ai, 2]),
                    float(confs[ri]),
                )
                atomnum += 1
    yield "END"


def write_pdb(fh: IO[str], coords: np.ndarray, confs: np.ndarray, seq_classes: np.ndarray) -> None:
    for line in format_pdb(coords, confs, seq_classes):
        print(line, file=fh)
