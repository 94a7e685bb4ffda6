"""Tests for the CA TM-score / RMSD scoring tool (dmpfold2_tpu/score.py)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from dmpfold2_tpu.score import tm_d0, tm_score

from dmpfold2_tpu.utils import assets

EXAMPLE_PDB = assets.example_template_path()


def _random_chain(n, seed=0):
    """Compact self-avoiding-ish CA walk with ~3.8 A steps."""
    rng = np.random.default_rng(seed)
    steps = rng.normal(size=(n, 3))
    steps /= np.linalg.norm(steps, axis=1, keepdims=True)
    return np.cumsum(steps * 3.8, axis=0).astype(np.float64)


def test_identity_and_rigid_motion():
    ca = _random_chain(60)
    r = tm_score(ca, ca)
    assert r["tm"] == pytest.approx(1.0, abs=1e-6)
    assert r["rmsd"] == pytest.approx(0.0, abs=1e-6)

    # arbitrary rotation + translation: TM and RMSD are invariant
    theta = 1.1
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0],
                    [0, 0, 1.0]])
    moved = ca @ rot.T + np.array([5.0, -3.0, 12.0])
    r = tm_score(moved, ca)
    assert r["tm"] == pytest.approx(1.0, abs=1e-5)
    assert r["rmsd"] == pytest.approx(0.0, abs=1e-5)


def test_noise_degrades_monotonically():
    ca = _random_chain(80, seed=1)
    rng = np.random.default_rng(2)
    tm_small = tm_score(ca + 0.5 * rng.normal(size=ca.shape), ca)["tm"]
    tm_large = tm_score(ca + 5.0 * rng.normal(size=ca.shape), ca)["tm"]
    assert 0.9 < tm_small <= 1.0
    assert tm_large < tm_small


def test_fragment_seeding_beats_global_kabsch():
    """Half the chain matches exactly, half is scrambled: the iterative
    fragment search must superpose the good half (TM >= ~0.5 x per-residue
    near-1 terms), where a single global Kabsch would split the difference."""
    ca = _random_chain(100, seed=3)
    decoy = ca.copy()
    rng = np.random.default_rng(4)
    decoy[50:] = _random_chain(50, seed=5) + 40.0  # unrelated second half
    r = tm_score(decoy, ca)
    # perfect first half alone bounds TM below by ~50/100 * 1.0
    assert r["tm"] > 0.45


def test_d0_clamp_small_chains():
    assert tm_d0(10) == 0.5
    assert tm_d0(21) == 0.5
    assert tm_d0(200) > 3.0


def test_shape_validation():
    ca = _random_chain(20)
    with pytest.raises(ValueError, match="share"):
        tm_score(ca, ca[:10])


def test_cli_roundtrip(tmp_path):
    """End-to-end: score the example template against itself via the CLI."""
    res = subprocess.run(
        [sys.executable, "-m", "dmpfold2_tpu.score", EXAMPLE_PDB, EXAMPLE_PDB],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr
    out = json.loads(res.stdout)
    assert out["tm"] == pytest.approx(1.0, abs=1e-6)
    assert out["nres"] == 192


def test_cli_length_mismatch(tmp_path):
    short = tmp_path / "short.pdb"
    lines = [l for l in open(EXAMPLE_PDB) if l.startswith("ATOM")][:40]
    short.write_text("".join(lines))
    res = subprocess.run(
        [sys.executable, "-m", "dmpfold2_tpu.score", str(short), EXAMPLE_PDB],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 1
    assert "differ" in res.stderr
