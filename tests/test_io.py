import io

import numpy as np
import pytest

from dmpfold2_tpu.utils import aln, pdb

from dmpfold2_tpu.utils import assets

EXAMPLE_ALN = assets.example_aln_path()

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(EXAMPLE_ALN),
    reason="reference example data not mounted",
)
EXAMPLE_PDB = assets.example_template_path()


def test_encode_basic():
    mat = aln.encode_rows(["ARNDCQEGHILKMFPSTWYV", "BJOUXZ----..--------"])
    assert mat.shape == (2, 20)
    assert list(mat[0]) == list(range(20))
    assert list(mat[1][:6]) == [20] * 6
    assert list(mat[1][6:]) == [21] * 14


def test_parse_example_aln():
    mat = aln.parse_aln(EXAMPLE_ALN)
    assert mat.shape == (252, 82)
    assert mat.max() <= 21
    # first row of PF10963 starts with IKL -> I=9, K=11, L=10
    assert list(mat[0][:3]) == [9, 11, 10]


def test_cap_max_seqs(tmp_path):
    p = tmp_path / "big.aln"
    p.write_text("\n".join(["AAAA"] * 10) + "\n")
    mat = aln.parse_aln(str(p), max_seqs=4)
    assert mat.shape == (4, 4)


def test_parse_template_ca():
    coords = pdb.parse_template_ca(EXAMPLE_PDB)
    assert coords.shape[1] == 3
    assert coords.shape[0] == 192
    assert coords.dtype == np.float32


def test_out_of_alphabet_rejected():
    """Lowercase a3m residues (or any non-alphabet character) in an aln body
    must fail loudly, not encode to silent garbage classes."""
    with pytest.raises(ValueError, match="alphabet"):
        aln.encode_rows(["ARNDa"])
    with pytest.raises(ValueError, match="alphabet"):
        aln.encode_rows(["ARND*"])


def test_template_altloc_conformers_deduplicated(tmp_path):
    """Alternate-location CA records must not duplicate residues (they would
    trip the engine's template-length validation on valid structures)."""
    atom = ("ATOM      2  CA {alt}ALA A   1   "
            "  11.104  13.207   2.100  1.00  0.00           C")
    lines = [atom.format(alt=" "), atom.format(alt="A"), atom.format(alt="B")]
    p = tmp_path / "t.pdb"
    p.write_text("\n".join(lines) + "\nEND\n")
    coords = pdb.parse_template_ca(str(p))
    assert coords.shape[0] == 2  # blank + 'A' kept, 'B' dropped


def test_policy_resolution_fidelity():
    """fp32_strict must resolve to the reference-faithful implementations on
    every backend (shared policy helpers, engine/fold.py)."""
    from dmpfold2_tpu.engine.fold import (resolve_dca_method,
                                          resolve_fused_conv,
                                          resolve_rgru_impl)

    # strict mirrors the reference's torch.inverse = LAPACK LU (predict.py:53)
    assert resolve_dca_method("auto", "fp32_strict") == "lu"
    assert resolve_rgru_impl("fp32_strict") == "scan"
    assert resolve_fused_conv("fp32_strict") is False
    assert resolve_dca_method("lu", "bf16") == "lu"  # explicit wins

    # DCA matmul precision: fidelity modes pin true-f32-class passes; only
    # the bf16 throughput engine trades down to 3-pass "high" (measured 4e-5
    # max relative feature error on the bundled example)
    from dmpfold2_tpu.engine.fold import resolve_dca_precision

    assert resolve_dca_precision("fp32") == "highest"
    assert resolve_dca_precision("fp32_strict") == "highest"
    assert resolve_dca_precision("bf16") == "high"


def test_pdb_writer_format():
    coords = np.zeros((2, 5, 3), dtype=np.float32)
    coords[1, 1] = [1.234, -5.678, 99.999]
    confs = np.array([0.25, 0.75], dtype=np.float32)
    seq = aln.encode_rows(["GA"])[0]  # Gly (no CB), Ala
    buf = io.StringIO()
    pdb.write_pdb(buf, coords, confs, seq)
    lines = buf.getvalue().splitlines()
    assert lines[0].startswith("REMARK  CONF:  0.5")
    # Gly residue: 4 atoms (no CB); Ala: 5 atoms
    atom_lines = [l for l in lines if l.startswith("ATOM")]
    assert len(atom_lines) == 9
    assert lines[-1] == "END"
    # fixed-column check on one record
    rec = atom_lines[5]  # CA of residue 2
    assert rec[12:16] == " CA "
    assert rec[17:20] == "ALA"
    assert float(rec[30:38]) == pytest.approx(1.234)
    assert float(rec[60:66]) == pytest.approx(0.75)


def test_pdb_writer_matches_reference_formatting():
    # Same %-format string as the reference emits: spot-check exact bytes
    coords = np.zeros((1, 5, 3), dtype=np.float32)
    coords[0, 0] = [12.345, -0.001, 8.0]
    confs = np.array([0.5], dtype=np.float32)
    seq = aln.encode_rows(["A"])[0]
    lines = list(pdb.format_pdb(coords, confs, seq))
    assert lines[1] == "ATOM      1  N   ALA     1      12.345  -0.001   8.000  1.00  0.50"


def test_a3m_input(tmp_path):
    p = tmp_path / "x.a3m"
    p.write_text(">q\nARND\n>s1\nAbR-cD\n")  # lowercase b, c are insertions
    mat = aln.parse_aln(str(p))
    assert mat.shape == (2, 4)
    assert list(mat[1]) == [0, 1, 21, 3]  # A R - D
