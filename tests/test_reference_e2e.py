"""End-to-end fidelity vs the REAL reference implementation.

Unlike test_model_parity.py (which compares against a restated torch oracle),
these tests import the actual reference package from /root/reference and run
its own predict-path code — features (reweight + fast_dca with LAPACK LU
inverse, predict.py:32-61), GRUResNet forward (network.py:218-314) including
recycling, refinement and backbone completion — against our engine with the
same converted weights on (a truncation of) the bundled PF10963 example.

The one equalized convention: eigenvector signs. ``torch.symeig`` was removed
in torch>=2, so the reference needs a shim anyway; we shim it with
``torch.linalg.eigh`` + our deterministic largest-|component|-positive
canonicalization, and run our engine with canonical signs too. Raw LAPACK
sign conventions differ between the torch build and XLA:CPU in this
environment (measured: identical confidences but 3-6 A coordinate divergence
from sign flips alone — see test_strict_raw_signs_confs_match below), so a
raw-vs-raw coordinate comparison tests the linker, not the framework. The
released-weights bit-match (BASELINE.md) remains the north star for when
weights are available; scripts/verify_released_weights.py --canonical-signs
applies this same equalization there.
"""

import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "dmpfold", "network.py")),
    reason="reference package not mounted",
)


def _canonicalize(v: torch.Tensor) -> torch.Tensor:
    """Largest-|component|-positive per eigenvector, batched (..., L, L) —
    the same canonicalization as models/geometry.mds_coords."""
    idx = v.abs().argmax(dim=-2, keepdim=True)
    comp = torch.gather(v, -2, idx)
    return v * torch.where(comp < 0, -1.0, 1.0)


@pytest.fixture(scope="module")
def reference_pkg():
    sys.path.insert(0, REFERENCE)
    try:
        # torch>=2 removed symeig; the reference (torch 1.8 era) calls it at
        # network.py:247,292 — shim with eigh + canonical signs
        def _symeig(m, eigenvectors=True, upper=True):
            w, v = torch.linalg.eigh(m, UPLO="U" if upper else "L")
            return w, _canonicalize(v)

        torch.symeig = _symeig
        import dmpfold.network as ref_network
        import dmpfold.predict as ref_predict

        yield ref_network, ref_predict
    finally:
        sys.path.remove(REFERENCE)


@pytest.fixture(scope="module")
def setup(reference_pkg):
    from dmpfold2_tpu.utils.aln import parse_aln
    from dmpfold2_tpu.weights import convert_state_dict

    ref_network, ref_predict = reference_pkg
    torch.manual_seed(11)
    net = ref_network.GRUResNet(64, 32).eval()
    params = convert_state_dict(net.state_dict(), num_blocks=16)
    alnmat = parse_aln(
        os.path.join(REFERENCE, "dmpfold", "example", "PF10963.aln")
    )[:60, :40].copy()
    return net, params, alnmat, ref_predict


def _reference_fold(net, ref_predict, alnmat, iterations, minsteps):
    """The reference's own predict-path math (predict.py:136-153)."""
    l = alnmat.shape[1]
    inputs = torch.from_numpy(alnmat.astype(np.int64))
    with torch.no_grad():
        msa1hot = F.one_hot(torch.clamp(inputs, max=20), 21).float()
        w = ref_predict.reweight(msa1hot, cutoff=0.8)
        f2d = ref_predict.fast_dca(msa1hot, w).float()
        f2d = f2d.permute(2, 0, 1).unsqueeze(0)
        dmap = torch.zeros((1, 1, l, l)) - 1
        inputs2 = torch.cat((f2d, dmap), dim=1)
        coords, confs = net(inputs, inputs2, iterations, minsteps)
    return coords.view(-1, l, 5, 3)[0].numpy(), confs[0].numpy()


@pytest.mark.parametrize("iterations,minsteps", [(0, 0), (2, 10)])
def test_end_to_end_matches_real_reference(setup, iterations, minsteps):
    """Full pipeline (LU DCA features -> forward -> recycling -> refinement
    -> backbone) vs the reference's own code, canonical signs both sides.
    Measured deltas: 2.7e-4 A at (0,0), 5e-4 A at (2,10) — pure fp32
    rounding between two LAPACK/BLAS builds."""
    from dmpfold2_tpu.engine.fold import Folder

    net, params, alnmat, ref_predict = setup
    ref_c, ref_f = _reference_fold(net, ref_predict, alnmat,
                                   iterations, minsteps)
    folder = Folder(params, precision="fp32", dca_method="lu",
                    use_buckets=False)
    ours_c, ours_f = folder.fold(alnmat, iterations=iterations,
                                 minsteps=minsteps)
    np.testing.assert_allclose(ours_f, ref_f, atol=1e-5)
    np.testing.assert_allclose(ours_c, ref_c, atol=2e-3)


def test_strict_raw_signs_confs_match(setup):
    """fp32_strict (raw eigh signs, LU DCA, full-fp32 matmuls) vs the
    reference with RAW torch.linalg.eigh signs: confidences — which do not
    pass through the sign-ambiguous MDS->GRU coordinate head — must agree
    tightly. Coordinates are deliberately not compared here: raw sign
    conventions of the two LAPACK builds differ in this environment, and
    that divergence is quantified in test_eigh_signs.py / ARCHITECTURE.md."""
    from dmpfold2_tpu.engine.fold import Folder, resolve_dca_method

    assert resolve_dca_method("auto", "fp32_strict") == "lu"

    net, params, alnmat, ref_predict = setup
    raw = torch.symeig

    def _symeig_raw(m, eigenvectors=True, upper=True):
        return torch.linalg.eigh(m, UPLO="U" if upper else "L")

    torch.symeig = _symeig_raw
    try:
        ref_c, ref_f = _reference_fold(net, ref_predict, alnmat, 1, 5)
    finally:
        torch.symeig = raw
    folder = Folder(params, precision="fp32_strict", use_buckets=False)
    ours_c, ours_f = folder.fold(alnmat, iterations=1, minsteps=5)
    np.testing.assert_allclose(ours_f, ref_f, atol=1e-5)
