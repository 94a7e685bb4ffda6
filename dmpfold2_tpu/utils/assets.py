"""Packaged data assets: bundled example + cluster list, reference fallback.

The upstream package ships its example alignment/template and the training
cluster list as package data (reference MANIFEST.in, setup.py:20-24); this
project bundles the same files (see example/README.md for provenance) so a
standalone checkout or pip install can run the golden path — CLI example
fold, golden tests, bench — without the read-only reference mount. Paths
resolve to the packaged copies first and fall back to a reference mount
(useful when running against a patched reference checkout).
"""

from __future__ import annotations

import os

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# canonical location of the read-only upstream mount in the dev container;
# override with DMPFOLD2_REFERENCE_DIR when it lives elsewhere
REFERENCE_ROOT = os.environ.get("DMPFOLD2_REFERENCE_DIR", "/root/reference")


def _resolve(packaged: str, reference_rel: str) -> str:
    path = os.path.join(_PKG_ROOT, packaged)
    if os.path.isfile(path):
        return path
    return os.path.join(REFERENCE_ROOT, reference_rel)


def example_aln_path() -> str:
    """The bundled PF10963 example alignment (252 seqs x 82 residues)."""
    return _resolve("example/PF10963.aln", "dmpfold/example/PF10963.aln")


def example_template_path() -> str:
    """The bundled 3FGX example template PDB."""
    return _resolve("example/3FGX.pdb", "dmpfold/example/3FGX.pdb")


def cluster_list_path() -> str:
    """The 26,048-line training cluster list (@30% sequence identity)."""
    return _resolve("train_clust.lst", "dmpfold/train_clust.lst")


def reference_root() -> str | None:
    """The upstream reference checkout, or None when not mounted.

    Tests that exercise the real reference *code* (e2e parity, key-layout
    insurance, released-weights verification) skip without it; everything
    else runs from the packaged data.
    """
    if os.path.isdir(os.path.join(REFERENCE_ROOT, "dmpfold")):
        return REFERENCE_ROOT
    return None
