"""Dress rehearsal of the released-weights verification machinery.

The real released checkpoint is unreachable offline (BASELINE.md north
star), but every moving part of the check can be exercised end-to-end with
a SYNTHETIC two-part checkpoint: a random full-size (512/128) reference
state dict split like the release, served through the offline
``--weights-dir`` mount path, converted, folded by BOTH pipelines and
compared. When a weights mount or network appears, the same command
verifies the real thing in minutes (VERDICT round-3 item 7).
"""

import os
import subprocess
import sys

import pytest
import torch

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "verify_released_weights.py")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "dmpfold", "network.py")),
    reason="reference package not mounted",
)


def test_verify_script_with_synthetic_mount(tmp_path):
    sys.path.insert(0, REFERENCE)
    try:
        def _symeig(m, eigenvectors=True, upper=True):
            return torch.linalg.eigh(m, UPLO="U" if upper else "L")

        torch.symeig = _symeig
        from dmpfold.network import GRUResNet

        torch.manual_seed(4)
        sd = GRUResNet(512, 128).state_dict()
    finally:
        sys.path.remove(REFERENCE)

    # split like the release (two parts purely for GitHub's size limit)
    keys = sorted(sd)
    half = len(keys) // 2
    wdir = tmp_path / "mount"
    wdir.mkdir()
    torch.save({k: sd[k] for k in keys[:half]},
               wdir / "FINAL_fullmap_e2e_model_part1.pt")
    torch.save({k: sd[k] for k in keys[half:]},
               wdir / "FINAL_fullmap_e2e_model_part2.pt")

    # tiny alignment: the model is full-size, the workload need not be
    lines = [l for l in open(os.path.join(
        REFERENCE, "dmpfold", "example", "PF10963.aln")).read().splitlines() if l]
    aln = tmp_path / "small.aln"
    aln.write_text("\n".join(r[:30] for r in lines[:40]) + "\n")

    env = dict(os.environ, JAX_PLATFORMS="cpu", DMPFOLD2_TPU_NO_CACHE="1")
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--weights-dir", str(wdir),
         "--aln", str(aln), "--iterations", "0", "--minsteps", "0",
         "--canonical-signs", "--platform", "cpu", "--tolerance", "0.005"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout, proc.stdout
