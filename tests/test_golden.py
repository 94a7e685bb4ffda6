"""Golden regression: full pipeline on PF10963 with fixed random weights.

The reference's acceptance bar is a byte-matching fold.pdb with the released
weights (BASELINE.md); those weights aren't available offline, so this test
pins the *whole pipeline* (parsing, features, model, geometry, PDB writer)
against a committed golden output produced with deterministic random weights.
Formatting is compared byte-for-byte; coordinates to 0.02 Å (fp32 eigh
varies slightly across BLAS builds).

Regenerate after an intentional behavior change:
    python tests/test_golden.py regenerate
"""

import io
import os
import sys

import numpy as np
import pytest
import jax

EXAMPLE_ALN = "/root/reference/dmpfold/example/PF10963.aln"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "pf10963_seed0.pdb")

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_ALN), reason="reference example data not mounted"
)


def _fold_pdb_lines():
    from dmpfold2_tpu.engine.fold import Folder
    from dmpfold2_tpu.models.gruresnet import init_params
    from dmpfold2_tpu.utils import aln, pdb

    params = init_params(jax.random.PRNGKey(0), width=32, cwidth=16, num_blocks=2)
    alnmat = aln.parse_aln(EXAMPLE_ALN)
    coords, confs = Folder(params).fold(alnmat, iterations=1, minsteps=10)
    return list(pdb.format_pdb(coords, confs, alnmat[0]))


def test_golden_pf10963():
    lines = _fold_pdb_lines()
    golden = open(GOLDEN).read().splitlines()
    assert len(lines) == len(golden)
    assert lines[-1] == "END" == golden[-1]
    for got, want in zip(lines[1:-1], golden[1:-1]):
        # fixed columns must be byte-identical
        assert got[:30] == want[:30]
        assert got[54:] == want[54:] or abs(float(got[60:66]) - float(want[60:66])) < 0.02
        for col in range(30, 54, 8):
            assert abs(float(got[col : col + 8]) - float(want[col : col + 8])) < 0.02


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        jax.config.update("jax_platforms", "cpu")
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as fh:
            fh.write("\n".join(_fold_pdb_lines()) + "\n")
        print(f"wrote {GOLDEN}")
