"""Native (C++) IO parsers must be byte-identical to the Python fallbacks."""

import time

import numpy as np
import pytest

from dmpfold2_tpu.utils import aln, native

from dmpfold2_tpu.utils import assets

EXAMPLE_ALN = assets.example_aln_path()

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(EXAMPLE_ALN),
    reason="reference example data not mounted",
)


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def _python_parse_aln(path, max_seqs=3000):
    rows = []
    with open(path) as fh:
        for line in fh:
            if not line.startswith(">"):
                stripped = line.rstrip()
                if stripped:
                    rows.append(stripped)
    mat = aln.encode_rows(rows)
    return mat[:max_seqs]


def test_native_aln_matches_python():
    with open(EXAMPLE_ALN, "rb") as fh:
        text = fh.read()
    nat = native.encode_aln_bytes(text, 3000)
    ref = _python_parse_aln(EXAMPLE_ALN)
    np.testing.assert_array_equal(nat, ref)


def test_native_aln_row_cap():
    text = b"\n".join([b"AAAA"] * 10) + b"\n"
    out = native.encode_aln_bytes(text, 4)
    assert out.shape == (4, 4)


def test_native_aln_fasta_headers_and_gaps():
    text = b">header line\nAR-N.\n>x\nBJOUZ\n"
    out = native.encode_aln_bytes(text, 0)
    assert out.shape == (2, 5)
    assert list(out[0]) == [0, 1, 21, 2, 21]
    assert list(out[1]) == [20, 20, 20, 20, 20]


def test_native_aln_ragged_row_beyond_cap_rejected():
    """Rows past the cap are still length-validated (the Python path encodes
    every row before capping): both paths must reject the same inputs."""
    text = b"\n".join([b"AAAA"] * 6 + [b"AAAAAAA"]) + b"\n"
    with pytest.raises(ValueError):
        native.encode_aln_bytes(text, 4)
    with pytest.raises(ValueError):
        aln.encode_rows([r.decode() for r in text.split(b"\n") if r])


def test_native_tdb_blank_lines_match_python(tmp_path):
    """Blank lines inside a tdb file are skipped identically by the native
    parser and the Python fallback."""
    from dmpfold2_tpu.train import dataset as ds

    line = (" " * 5 + "A" + " " * 33
            + "".join(f"{v:9.3f}" for v in np.arange(15) * 0.5))
    path = tmp_path / "b.tdb"
    path.write_text("# c\n" + line + "\n\n" + line + "\n\n")

    ncls, ncoords = native.parse_tdb_bytes(path.read_bytes())
    assert ncls.shape == (2,)

    # force the pure-Python fallback
    orig = native.available
    try:
        native.available = lambda: False
        pcls, pcoords = ds.parse_tdb(str(path))
    finally:
        native.available = orig
    np.testing.assert_array_equal(pcls, ncls)
    np.testing.assert_allclose(pcoords, ncoords)


def test_native_aln_fuzz_parity(tmp_path):
    """Randomized byte-level parity: the native encoder and the pure-Python
    parser must accept/reject identical inputs and produce identical
    matrices across messy content (headers, blank lines, trailing
    whitespace, ragged rows, cap interaction)."""
    from dmpfold2_tpu.utils.aln import MAX_SEQS, parse_aln

    rng = np.random.default_rng(17)
    alphabet = list("ARNDCQEGHILKMFPSTWYVBJOUXZ-.")
    for trial in range(60):
        n_rows = int(rng.integers(1, 12))
        width = int(rng.integers(1, 30))
        lines = []
        for _ in range(n_rows):
            if rng.random() < 0.15:
                lines.append(">header " + "x" * int(rng.integers(0, 5)))
                continue
            if rng.random() < 0.1:
                lines.append("")
                continue
            row_w = width + (int(rng.integers(1, 4)) if rng.random() < 0.1 else 0)
            row = "".join(rng.choice(alphabet) for _ in range(row_w))
            if rng.random() < 0.2:
                row += rng.choice([" ", "\t", "\r", " \t "])
            lines.append(row)
        text = "\n".join(lines) + ("\n" if rng.random() < 0.8 else "")
        p = tmp_path / f"f{trial}.aln"
        p.write_text(text)
        cap = int(rng.integers(1, MAX_SEQS))

        def run(use_native):
            orig = native.available
            try:
                native.available = (lambda: True) if use_native else (lambda: False)
                try:
                    return ("ok", parse_aln(str(p), max_seqs=cap))
                except ValueError as exc:
                    return ("err", None)
            finally:
                native.available = orig

        sn, mn = run(True)
        sp, mp = run(False)
        assert sn == sp, f"trial {trial}: native={sn} python={sp}\n{text!r}"
        if sn == "ok":
            np.testing.assert_array_equal(mn, mp, err_msg=f"trial {trial}")


def test_native_tdb_matches_python(tmp_path):
    from dmpfold2_tpu.train.dataset import parse_tdb

    rng = np.random.default_rng(0)
    letters = "ARNDCQEGHILKMFPSTWYV"
    lines = ["# header"]
    L = 30
    classes = rng.integers(0, 20, L)
    coords = rng.normal(size=(L, 5, 3)) * 8
    for i in range(L):
        row = list(" " * 39)
        row[5] = letters[classes[i]]
        line = "".join(row) + "".join(
            f"{v:9.3f}" for atom in coords[i] for v in atom
        )
        lines.append(line)
    path = tmp_path / "x.tdb"
    path.write_text("\n".join(lines) + "\n")

    ncls, ncoords = native.parse_tdb_bytes(path.read_bytes())
    np.testing.assert_array_equal(ncls, classes)
    np.testing.assert_allclose(ncoords, np.round(coords, 3), atol=1e-4)
    # and the dataset-level entry point (auto native) agrees
    dcls, dcoords = parse_tdb(str(path))
    np.testing.assert_array_equal(dcls, ncls)
    np.testing.assert_allclose(dcoords, ncoords)


def test_native_tdb_fuzz_parity(tmp_path):
    """Randomized parity for the tdb parsers: same classes/coords from the
    native and Python paths across comments, blank lines and varied float
    formatting in the fixed 9-char fields."""
    from dmpfold2_tpu.train import dataset as ds

    rng = np.random.default_rng(23)
    letters = "ARNDCQEGHILKMFPSTWYVX"
    for trial in range(25):
        lines = []
        n_res = int(rng.integers(1, 12))
        for _ in range(n_res):
            if rng.random() < 0.2:
                lines.append("# comment")
            if rng.random() < 0.1:
                lines.append("")
            row = list(" " * 39)
            row[5] = letters[int(rng.integers(0, len(letters)))]
            vals = rng.normal(size=15) * (10.0 ** float(rng.integers(-2, 3)))
            lines.append("".join(row) + "".join(f"{v:9.3f}" for v in vals))
        p = tmp_path / f"t{trial}.tdb"
        p.write_text("\n".join(lines) + "\n")

        ncls, ncoords = native.parse_tdb_bytes(p.read_bytes())
        orig = native.available
        try:
            native.available = lambda: False
            pcls, pcoords = ds.parse_tdb(str(p))
        finally:
            native.available = orig
        np.testing.assert_array_equal(ncls, pcls, err_msg=f"trial {trial}")
        np.testing.assert_allclose(ncoords, pcoords, atol=0,
                                   err_msg=f"trial {trial}")


def test_native_speedup():
    with open(EXAMPLE_ALN, "rb") as fh:
        text = fh.read()
    t0 = time.perf_counter()
    for _ in range(50):
        native.encode_aln_bytes(text, 3000)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(50):
        _python_parse_aln(EXAMPLE_ALN)
    t_python = time.perf_counter() - t0
    # informational: native should not be slower (typically >5x faster)
    assert t_native < t_python * 2
