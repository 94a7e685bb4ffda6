"""Alignment (.aln / FASTA-ish) parsing and residue encoding.

Reproduces the reference encoding (reference: dmpfold/predict.py:100-134):
  * lines starting with '>' are skipped, others are alignment rows
  * residue characters are mapped through the 28-character translate table
      'ARNDCQEGHILKMFPSTWYVBJOUXZ-.' -> 'ABCDEFGHIJKLMNOPQRSTUUUUUUVV'
    giving integer classes 0-19 for the 20 amino acids, 20 for ambiguous
    residues (B/J/O/U/X/Z) and 21 for gaps ('-' or '.')
  * the MSA is capped at MAX_SEQS (3000) rows.

Everything here is host-side numpy; device code consumes the int array.
"""

from __future__ import annotations

import numpy as np

# residue-order used by the reference model (index == encoded class)
AA_ORDER = "ARNDCQEGHILKMFPSTWYV"
AMBIG_CLASS = 20
GAP_CLASS = 21
NUM_CLASSES = 22  # 20 aa + ambiguous + gap

GLYCINE = AA_ORDER.index("G")  # == 7; glycine has no CB atom

MAX_SEQS = 3000

_TRANS = str.maketrans("ARNDCQEGHILKMFPSTWYVBJOUXZ-.", "ABCDEFGHIJKLMNOPQRSTUUUUUUVV")

AA3 = [
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
]


def encode_rows(rows: list[str]) -> np.ndarray:
    """Encode alignment rows (equal-length strings) to an (nseqs, nres) uint8 array.

    Characters outside the 28-char table (lowercase a3m insertion states,
    '*', digits, ...) fail loudly: silently passing them through (as the
    reference's translate does) yields class indices >= NUM_CLASSES that the
    network's one-hot treats as absent residues — a plausible-looking but
    wrong structure with no error.
    """
    if not rows:
        raise ValueError("empty alignment")
    length = len(rows[0])
    for r in rows:
        if len(r) != length:
            raise ValueError("alignment rows have unequal lengths")
    joined = "".join(rows).translate(_TRANS).encode("latin-1")
    mat = np.frombuffer(joined, dtype=np.uint8) - ord("A")
    if mat.size and mat.max() >= NUM_CLASSES:
        bad = chr(ord("A") + int(mat.max()))
        raise ValueError(
            f"alignment contains characters outside the amino-acid alphabet "
            f"(e.g. {bad!r} after translation) — lowercase rows suggest an "
            f"a3m file; rename to .a3m or convert with a3m_to_rows()")
    return mat.reshape(len(rows), length)


def a3m_to_rows(text: str) -> list[str]:
    """a3m -> aln rows: drop '>' headers and lowercase insertion states.

    Replaces the shell conversion the reference documents
    (README.md:30: ``egrep -v "^>" in.a3m | sed 's/[a-z]//g'``).
    """
    rows = []
    for line in text.splitlines():
        if line.startswith(">") or not line.strip():
            continue
        rows.append("".join(c for c in line.rstrip() if not c.islower()))
    return rows


def parse_aln(path: str, max_seqs: int = MAX_SEQS) -> np.ndarray:
    """Parse an aln (or a3m) file into an (nseqs, nres) uint8 class matrix.

    ``.a3m`` inputs are converted on the fly (headers + lowercase insertions
    dropped). Uses the native parser (native/dmpio.cpp via ctypes) when
    available; the pure-Python fallback is byte-identical.
    """
    from . import native

    if path.endswith(".a3m"):
        with open(path) as fh:
            mat = encode_rows(a3m_to_rows(fh.read()))
        return mat[:max_seqs]

    if native.available():
        with open(path, "rb") as fh:
            return native.encode_aln_bytes(fh.read(), max_seqs)

    rows = []
    with open(path) as fh:
        for line in fh:
            if not line.startswith(">"):
                stripped = line.rstrip()
                if stripped:
                    rows.append(stripped)
    mat = encode_rows(rows)
    if mat.shape[0] > max_seqs:
        mat = mat[:max_seqs]
    return mat
