"""Engine end-to-end tests on the bundled example with converted random weights."""

import subprocess
import sys

import numpy as np
import pytest
import torch
import jax

from dmpfold2_tpu.engine.buckets import bucket_shape
from dmpfold2_tpu.engine.fold import Folder, aln_to_coords
from dmpfold2_tpu.utils import aln as aln_io
from dmpfold2_tpu.weights import convert_state_dict, load_params, save_params

from torch_oracle import OracleGRUResNet

from dmpfold2_tpu.utils import assets

EXAMPLE_ALN = assets.example_aln_path()

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(EXAMPLE_ALN),
    reason="reference example data not mounted",
)
EXAMPLE_PDB = assets.example_template_path()


@pytest.fixture(scope="module")
def params():
    torch.manual_seed(11)
    oracle = OracleGRUResNet(512, 128, 16).eval()
    return convert_state_dict(oracle.state_dict(), num_blocks=16)


def test_bucket_shape():
    assert bucket_shape(252, 82) == (256, 88)
    assert bucket_shape(252, 89) == (256, 96)
    assert bucket_shape(3000, 1536) == (3000, 1536)
    assert bucket_shape(5000, 2000) == (5000, 2000)  # beyond buckets: exact
    assert bucket_shape(252, 82, enable=False) == (252, 82)


def test_fold_example_small_iterations(params):
    alnmat = aln_io.parse_aln(EXAMPLE_ALN)[:60]  # trim MSA depth for CPU speed
    folder = Folder(params)
    coords, confs = folder.fold(alnmat, iterations=1, minsteps=5)
    assert coords.shape == (82, 5, 3)
    assert confs.shape == (82,)
    assert np.isfinite(coords).all()
    assert ((confs > 0) & (confs < 1)).all()
    # CA-CA distances should be pulled toward the 3.78 A bond length scale
    ca = coords[:, 1]
    adj = np.linalg.norm(ca[1:] - ca[:-1], axis=1)
    assert np.isfinite(adj).all()


def test_fold_bucketing_invariance(params):
    """Same target folded with/without bucket padding must agree."""
    alnmat = aln_io.parse_aln(EXAMPLE_ALN)[:40]
    exact = Folder(params, use_buckets=False)
    padded = Folder(params, use_buckets=True)
    c1, f1 = exact.fold(alnmat, iterations=1, minsteps=5)
    c2, f2 = padded.fold(alnmat, iterations=1, minsteps=5)
    np.testing.assert_allclose(f1, f2, atol=1e-4)
    np.testing.assert_allclose(c1, c2, atol=5e-3)


def test_api_with_npz_weights(tmp_path, params):
    path = str(tmp_path / "params.npz")
    save_params(path, params)
    reloaded = load_params(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(reloaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    coords, confs, alnmat = aln_to_coords(
        EXAMPLE_ALN, iterations=0, minsteps=0, weights_file=path, return_alnmat=True
    )
    assert coords.shape == (82, 5, 3)
    assert alnmat.shape == (252, 82)


def test_template_length_validation(params):
    from dmpfold2_tpu.utils.pdb import parse_template_ca

    alnmat = aln_io.parse_aln(EXAMPLE_ALN)[:10]
    template = parse_template_ca(EXAMPLE_PDB)  # 192 CAs != 82 residues
    with pytest.raises(ValueError, match="lengths must match"):
        Folder(params).fold(alnmat, template_ca=template, iterations=0, minsteps=0)


def test_cli_help():
    res = subprocess.run(
        [sys.executable, "-c", "from dmpfold2_tpu.cli import run_dmpfold; run_dmpfold(['-h'])"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0
    assert "--iterations" in res.stdout


def test_bf16_trunk_close_to_fp32(params):
    """bf16 MXU policy must stay structurally faithful to fp32."""
    from dmpfold2_tpu.utils import aln as aln_io

    alnmat = aln_io.parse_aln(EXAMPLE_ALN)[:40]
    c32, f32 = Folder(params, precision="fp32").fold(alnmat, iterations=1, minsteps=5)
    c16, f16 = Folder(params, precision="bf16").fold(alnmat, iterations=1, minsteps=5)
    assert np.isfinite(c16).all()
    # confidences agree closely; coordinates agree to sub-Angstrom scale
    np.testing.assert_allclose(f16, f32, atol=0.05)
    assert np.abs(c16 - c32).mean() < 1.0


def test_template_seeded_fold(params):
    """Template path: CA distances enter as the dmap seed channel."""
    alnmat = aln_io.parse_aln(EXAMPLE_ALN)[:30]
    folder = Folder(params)
    base_c, base_f = folder.fold(alnmat, iterations=0, minsteps=0)
    # use the predicted CA trace as a "template" of matching length
    template = base_c[:, 1, :].astype(np.float32)
    tmpl_c, tmpl_f = folder.fold(alnmat, template_ca=template,
                                 iterations=0, minsteps=0)
    assert tmpl_c.shape == base_c.shape
    assert np.isfinite(tmpl_c).all()
    # the seed channel must actually change the result
    assert np.abs(tmpl_c - base_c).max() > 1e-3


def test_single_sequence_fold(params):
    """nseqs==1: DCA features are zero (reference predict.py:139)."""
    alnmat = aln_io.parse_aln(EXAMPLE_ALN)[:1]
    coords, confs = Folder(params).fold(alnmat, iterations=1, minsteps=3)
    assert coords.shape == (82, 5, 3)
    assert np.isfinite(coords).all()


def test_short_protein_fold(params):
    """Very short chains must not produce NaNs (terminal-dummy gathers)."""
    rng = np.random.default_rng(0)
    alnmat = rng.integers(0, 20, (5, 6)).astype(np.uint8)
    coords, confs = Folder(params).fold(alnmat, iterations=1, minsteps=3)
    assert coords.shape == (6, 5, 3)
    assert np.isfinite(coords).all()


def test_gap_heavy_alignment(params):
    """Alignments dominated by gaps still fold (gap class 21 in the GRU)."""
    rng = np.random.default_rng(1)
    alnmat = np.full((8, 24), 21, np.uint8)
    alnmat[0] = rng.integers(0, 20, 24)  # query ungapped
    alnmat[1:, ::3] = 5
    coords, confs = Folder(params).fold(alnmat, iterations=0, minsteps=0)
    assert np.isfinite(coords).all()


def test_warmup(params):
    folder = Folder(params)
    folder.warmup(shapes=((8, 32),))  # compiles the bucket; no exception


def test_fold_deterministic(params):
    """Determinism-by-construction: identical runs are bit-identical."""
    alnmat = aln_io.parse_aln(EXAMPLE_ALN)[:25]
    folder = Folder(params)
    c1, f1 = folder.fold(alnmat, iterations=1, minsteps=5)
    c2, f2 = folder.fold(alnmat, iterations=1, minsteps=5)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(f1, f2)


def test_fp32_strict_mode(params):
    alnmat = aln_io.parse_aln(EXAMPLE_ALN)[:20]
    c, f = Folder(params, precision="fp32_strict").fold(alnmat, iterations=0, minsteps=0)
    assert np.isfinite(c).all()


def test_cli_batch_mode(tmp_path):
    """`dmpfold -i a.aln b.aln -o outdir` streams through BatchFolder and
    writes one PDB per input (net-new batch CLI surface)."""
    from dmpfold2_tpu.cli import run_dmpfold
    from dmpfold2_tpu.models.gruresnet import init_params

    toy = init_params(jax.random.PRNGKey(0), width=32, cwidth=16, num_blocks=2)
    wpath = str(tmp_path / "toy.npz")
    save_params(wpath, toy)

    lines = [l for l in open(EXAMPLE_ALN).read().splitlines() if l]
    a = tmp_path / "tgt_a.aln"
    b = tmp_path / "tgt_b.aln"
    a.write_text("\n".join(lines[:12]) + "\n")
    b.write_text("\n".join(lines[:7]) + "\n")
    outdir = tmp_path / "out"

    run_dmpfold(["-i", str(a), str(b), "-o", str(outdir),
                 "-n", "0", "-m", "0", "-w", wpath, "--batch-size", "2"])

    for stem, nrows in (("tgt_a", 12), ("tgt_b", 7)):
        text = (outdir / f"{stem}.pdb").read_text()
        assert text.startswith("REMARK  CONF:")
        assert text.rstrip().endswith("END")
        assert text.count("ATOM") == 406  # 82 residues x 5 atoms - 4 Gly CBs

    # single input + -o also writes a file (no stdout PDB)
    run_dmpfold(["-i", str(a), "-o", str(outdir), "-n", "0", "-m", "0",
                 "-w", wpath])
    assert (outdir / "tgt_a.pdb").exists()


def test_cli_batch_mode_errors(tmp_path):
    from dmpfold2_tpu.cli import run_dmpfold

    a = tmp_path / "x.aln"
    a.write_text("GWC\n")
    sub = tmp_path / "sub"
    sub.mkdir()
    dup = sub / "x.aln"
    dup.write_text("GWC\n")

    with pytest.raises(SystemExit):  # multiple inputs need -o
        run_dmpfold(["-i", str(a), str(dup), "-n", "0", "-m", "0"])
    with pytest.raises(SystemExit):  # duplicate stems would collide
        run_dmpfold(["-i", str(a), str(dup), "-o", str(tmp_path / "o"),
                     "-n", "0", "-m", "0"])
    with pytest.raises(SystemExit):  # ONE template can't cover two targets
        run_dmpfold(["-i", str(a), str(tmp_path / "y.aln"), "-t", "tpl.pdb",
                     "-o", str(tmp_path / "o"), "-n", "0", "-m", "0"])


def test_cli_batch_per_target_templates(tmp_path):
    """Batch mode takes one template per input positionally ('-' = none);
    a wrong-length template errors up front instead of demoting the batch
    to serial single-target folds."""
    from dmpfold2_tpu.cli import run_dmpfold
    from dmpfold2_tpu.models.gruresnet import init_params
    from dmpfold2_tpu.utils.pdb import format_pdb

    toy = init_params(jax.random.PRNGKey(0), width=32, cwidth=16, num_blocks=2)
    wpath = str(tmp_path / "toy.npz")
    save_params(wpath, toy)

    lines = [l for l in open(EXAMPLE_ALN).read().splitlines() if l]
    a = tmp_path / "ta.aln"
    b = tmp_path / "tb.aln"
    a.write_text("\n".join(lines[:10]) + "\n")
    b.write_text("\n".join(lines[:6]) + "\n")
    nres = len(lines[0])

    rng = np.random.default_rng(0)
    coords = rng.normal(size=(nres, 5, 3)).astype(np.float32) * 3
    confs = np.full((nres,), 0.5, np.float32)
    tmpl = tmp_path / "ta_tmpl.pdb"
    tmpl.write_text("\n".join(format_pdb(coords, confs,
                                         np.zeros((nres,), np.int64))) + "\n")

    out1 = tmp_path / "out1"
    run_dmpfold(["-i", str(a), str(b), "-t", str(tmpl), "-",
                 "-o", str(out1), "-n", "0", "-m", "0", "-w", wpath,
                 "--batch-size", "2"])
    out2 = tmp_path / "out2"
    run_dmpfold(["-i", str(a), str(b), "-o", str(out2),
                 "-n", "0", "-m", "0", "-w", wpath, "--batch-size", "2"])
    # the template seeds the dmap channel of target a only
    assert (out1 / "ta.pdb").read_text() != (out2 / "ta.pdb").read_text()
    assert (out1 / "tb.pdb").read_text() == (out2 / "tb.pdb").read_text()

    with pytest.raises(SystemExit):  # template/input counts must match
        run_dmpfold(["-i", str(a), str(b), "-t", str(tmpl),
                     str(tmpl), str(tmpl), "-o", str(tmp_path / "o3"),
                     "-n", "0", "-m", "0", "-w", wpath])

    short = tmp_path / "short_tmpl.pdb"
    short.write_text("\n".join(format_pdb(coords[:5], confs[:5],
                                          np.zeros((5,), np.int64))) + "\n")
    with pytest.raises(SystemExit):  # wrong-length template: upfront error
        run_dmpfold(["-i", str(a), str(b), "-t", str(short), "-",
                     "-o", str(tmp_path / "o4"), "-n", "0", "-m", "0",
                     "-w", wpath])


def test_adaptive_recycling(params):
    """`-n auto`: device-resident while_loop recycles until the best mean
    confidence plateaus (patience 2), capped at AUTO_ITERATIONS_CAP. The
    result must be bit-identical to a fixed-n run at the count actually
    executed (same iteration sequence, same best-by-conf tracking)."""
    alnmat = aln_io.parse_aln(EXAMPLE_ALN)[:30]
    folder = Folder(params)
    c_auto, f_auto = folder.fold(alnmat, iterations="auto", minsteps=3)
    used = folder.last_auto_iterations
    from dmpfold2_tpu.engine.fold import AUTO_ITERATIONS_CAP

    assert 1 <= used <= AUTO_ITERATIONS_CAP
    assert np.isfinite(c_auto).all()

    c_fix, f_fix = folder.fold(alnmat, iterations=used, minsteps=3)
    np.testing.assert_array_equal(c_auto, c_fix)
    np.testing.assert_array_equal(f_auto, f_fix)


def test_cli_auto_iterations_parse():
    from dmpfold2_tpu.cli import build_parser

    args = build_parser().parse_args(["-i", "x.aln", "-n", "auto"])
    assert args.iterations == "auto"
    args = build_parser().parse_args(["-i", "x.aln", "-n", "7"])
    assert args.iterations == 7


def test_cli_auto_rejected_in_batch_mode(tmp_path):
    from dmpfold2_tpu.cli import run_dmpfold

    a = tmp_path / "a.aln"
    a.write_text("GWC\n")
    with pytest.raises(SystemExit):
        run_dmpfold(["-i", str(a), "-o", str(tmp_path / "o"), "-n", "auto"])
