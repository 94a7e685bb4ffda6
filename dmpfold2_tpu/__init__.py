"""dmpfold2_tpu: TPU-native end-to-end protein structure prediction.

A from-scratch JAX/XLA/Pallas re-design of the DMPfold2 method
(reference: psipred/DMPfold2). Public API mirrors the reference's two
symbols (reference: dmpfold/__init__.py:1).
"""

from .engine.fold import aln_to_coords
from .cli import run_dmpfold

__all__ = ["aln_to_coords", "run_dmpfold"]
__version__ = "0.1.0"
