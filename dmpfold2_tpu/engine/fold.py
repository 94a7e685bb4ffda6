"""The folding engine: one jitted device program from MSA to structure.

Everything after host-side parsing — one-hot, reweighting, DCA (including the
(21L)² inverse), the GRU/trunk forward, recycling, refinement and backbone
completion — runs inside a single XLA computation per shape bucket
(reference pipeline: dmpfold/predict.py:74-158, which does the same work
eagerly op-by-op in torch). Iteration counts are traced scalars, so changing
``-n`` / ``-m`` does not recompile.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import FoldConfig
from ..features.dca import dca_or_zero
from ..features.msa import msa_one_hot, reweight
from ..models import gruresnet
from ..utils import aln as aln_io
from ..utils import pdb as pdb_io
from .buckets import bucket_shape

# single source of defaults: config.FoldConfig (reference predict.py:26-28)
DEFAULT_ITERATIONS = FoldConfig.iterations
DEFAULT_MINSTEPS = FoldConfig.minsteps
# `-n auto` recycles until the confidence plateaus, hard-capped here (the
# reference default is 10 fixed recycles; predict.py:26-28)
AUTO_ITERATIONS_CAP = 30


# ---------------------------------------------------------------------------
# Implementation policy: which kernel/method each precision mode runs on the
# current backend. Shared by the single-target Folder and the streaming
# BatchFolder so the two engines can never drift apart (a requeued target
# must fold with the same numerics as its batchmates).

def resolve_vgru_impl(setting: str) -> str:
    if setting != "auto":
        return setting
    return "pallas" if jax.default_backend() == "tpu" else "scan"


def resolve_dca_method(setting: str, precision: str) -> str:
    if setting != "auto":
        return setting
    if precision == "fp32_strict":
        # bit-fidelity mode mirrors the reference's torch.inverse, which is
        # LAPACK LU (reference predict.py:53) — the Cholesky inverse differs
        # at ~1e-6, which 10 recycles can amplify past a bit-match
        return "lu"
    # recursive Schur inverse keeps the (21L)² inverse on the MXU
    # (ops/chol.py:schur_spd_inverse; matches the Cholesky inverse to ~1e-6)
    if jax.default_backend() == "tpu":
        return "schur"
    return "cholesky"


def resolve_dca_precision(precision: str) -> str:
    # f32 matmul passes inside fast_dca (covariance + (21L)² inverse). The
    # fidelity engines keep true-f32-class "highest" (6 bf16 passes on TPU);
    # the bf16 throughput engine runs "high" (3 passes): measured 4e-5 max
    # relative feature error — negligible next to the bf16 trunk — for
    # 1.6-2x the DCA matmul rate (290 -> 182 ms at the L=736 stress bucket).
    return "high" if precision == "bf16" else "highest"


def resolve_fused_conv(precision: str):
    # Pallas fused conv+maxout+InstanceNorm ("norm"): bf16 on TPU only
    if precision == "bf16" and jax.default_backend() == "tpu":
        return "norm"
    return False


def resolve_refine_impl() -> str:
    # fused VMEM-resident refinement loop on TPU (kernels/refine.py)
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def resolve_rgru_impl(precision: str) -> str:
    # fused residue-GRU sequence kernel (kernels/rgru.py); fp32_strict
    # keeps the scan (reference-matmul-order fidelity)
    if jax.default_backend() == "tpu" and precision != "fp32_strict":
        return "pallas"
    return "scan"


def resolve_mds_impl(precision: str) -> str:
    # MXU subspace iteration for the top-8 MDS eigenpairs (ops/eigh.py) in
    # the throughput mode; fp32/fp32_strict keep the full eigh (the
    # reference computes a full symeig, network.py:247 — exact fidelity)
    if jax.default_backend() == "tpu" and precision == "bf16":
        return "subspace"
    return "eigh"


@partial(jax.jit, static_argnames=("dca_method", "precision", "vgru_impl",
                                   "fused_conv", "refine_impl", "rgru_impl",
                                   "mds_impl", "adaptive"))
def _fold_device(params, alnmat, nseqs, nres, dmap_channel, nloops, refine_steps,
                 dca_method="cholesky", precision="fp32", vgru_impl="scan",
                 fused_conv=False, refine_impl="xla", rgru_impl="scan",
                 mds_impl="eigh", adaptive=False):
    """(n_pad, l_pad) alignment -> ((l_pad, 5, 3) coords, (l_pad,) conf).

    ``adaptive``: `-n auto` mode — ``nloops`` becomes a cap and recycling
    stops on a confidence plateau; additionally returns the recycle count.
    """
    def body():
        oh = msa_one_hot(alnmat, nseqs, nres)
        w = reweight(oh, nres)
        dca = dca_or_zero(oh, w, nseqs, nres, method=dca_method,
                          matmul_precision=resolve_dca_precision(precision))
        x2 = jnp.concatenate([dca, dmap_channel[:, :, None]], axis=2)
        compute_dtype = jnp.bfloat16 if precision == "bf16" else None
        # fp32_strict is the like-for-like fidelity mode vs a reference run:
        # keep raw LAPACK eigenvector signs (reference network.py:247)
        out = gruresnet.forward(params, alnmat, x2, nseqs, nres, nloops,
                                refine_steps, compute_dtype=compute_dtype,
                                vgru_impl=vgru_impl, fused_conv=fused_conv,
                                canonical_signs=(precision != "fp32_strict"),
                                refine_impl=refine_impl, rgru_impl=rgru_impl,
                                mds_impl=mds_impl, adaptive_recycle=adaptive,
                                with_aux=adaptive)
        if adaptive:
            coords, confs, aux = out
            return coords, confs, aux["iterations"]
        return out

    if precision == "fp32_strict":
        # full fp32 matmuls everywhere (TPU default decomposes f32 into
        # bf16 passes); the bit-fidelity mode for released-weights checks
        with jax.default_matmul_precision("highest"):
            return body()
    return body()


def _build_dmap_channel(l_pad: int, nres: int, template_ca: np.ndarray | None):
    """Last input channel: template CA distance map, or -1 fill (predict.py:142-145).

    Valid LxL region only; zero outside so padding is conv-equivalent to a
    true boundary.
    """
    dmap = np.zeros((l_pad, l_pad), np.float32)
    if template_ca is None:
        dmap[:nres, :nres] = -1.0
    else:
        if template_ca.shape[0] != nres:
            raise ValueError(
                f"template has {template_ca.shape[0]} CA atoms but alignment "
                f"has {nres} residues — lengths must match"
            )
        diffs = template_ca[:, None, :] - template_ca[None, :, :]
        dmap[:nres, :nres] = np.sqrt((diffs ** 2).sum(-1))
    return dmap


@dataclass
class Folder:
    """Caches parameters on device and reuses compiled programs per bucket."""

    params: dict
    use_buckets: bool = True
    dca_method: str = "auto"  # "lu" | "cholesky" | "schur" | "blocked"
    precision: str = "fp32"   # "bf16" | "fp32" | "fp32_strict" (bit-fidelity)
    vgru_impl: str = "auto"   # "pallas" on TPU, "scan" elsewhere
    # recycle count actually run by the last `-n auto` fold; None after a
    # fixed-n fold (or before any fold)
    last_auto_iterations: int | None = None

    @classmethod
    def from_config(cls, params, cfg: FoldConfig) -> "Folder":
        return cls(params, use_buckets=cfg.use_buckets,
                   dca_method=cfg.dca_method, precision=cfg.precision,
                   vgru_impl=cfg.vgru_impl)

    def fold(self, alnmat: np.ndarray, template_ca: np.ndarray | None = None,
             iterations=DEFAULT_ITERATIONS, minsteps: int = DEFAULT_MINSTEPS):
        """Fold one target. Returns ((nres, 5, 3) coords, (nres,) confidences).

        ``iterations`` may be ``"auto"`` (net-new): recycle until the best
        mean confidence plateaus (2 recycles without improvement), capped at
        ``AUTO_ITERATIONS_CAP``; the count actually run is left in
        ``self.last_auto_iterations``.
        """
        return self.fold_async(alnmat, template_ca, iterations, minsteps)()

    def fold_async(self, alnmat: np.ndarray,
                   template_ca: np.ndarray | None = None,
                   iterations=DEFAULT_ITERATIONS,
                   minsteps: int = DEFAULT_MINSTEPS):
        """Dispatch one fold without blocking on the result.

        JAX execution is asynchronous: this pads, uploads and launches the
        device program, then returns a zero-arg callable that fetches
        ``(coords, confs)`` (blocking). Pipelined callers (the serving
        dispatcher) launch the next target's fold while the device still
        runs this one, hiding host-side parse/pad/upload time.
        """
        adaptive = iterations == "auto"
        self.last_auto_iterations = None
        nloops = AUTO_ITERATIONS_CAP if adaptive else max(iterations, 0)
        nseqs, nres = alnmat.shape
        n_pad, l_pad = bucket_shape(nseqs, nres, self.use_buckets)
        aln_p = np.zeros((n_pad, l_pad), np.int32)
        aln_p[:nseqs, :nres] = alnmat
        dmap = _build_dmap_channel(l_pad, nres, template_ca)
        out = _fold_device(
            self.params, jnp.asarray(aln_p), nseqs, nres, jnp.asarray(dmap),
            jnp.asarray(nloops), jnp.asarray(max(minsteps, 0)),
            dca_method=self._dca_method(), precision=self.precision,
            vgru_impl=self._vgru_impl(), fused_conv=self._fused_conv(),
            refine_impl=self._refine_impl(), rgru_impl=self._rgru_impl(),
            mds_impl=self._mds_impl(), adaptive=adaptive,
        )

        def fetch():
            # one host fetch for all outputs (each np.asarray is a separate
            # round trip on remote-device transports)
            if adaptive:
                coords, confs, iters = jax.device_get(
                    (out[0][:nres], out[1][:nres], out[2]))
                self.last_auto_iterations = int(iters)
            else:
                coords, confs = jax.device_get((out[0][:nres], out[1][:nres]))
            return np.asarray(coords), np.asarray(confs)

        return fetch

    def _vgru_impl(self) -> str:
        return resolve_vgru_impl(self.vgru_impl)

    def _dca_method(self) -> str:
        return resolve_dca_method(self.dca_method, self.precision)

    def _fused_conv(self):
        return resolve_fused_conv(self.precision)

    def _refine_impl(self) -> str:
        return resolve_refine_impl()

    def _rgru_impl(self) -> str:
        return resolve_rgru_impl(self.precision)

    def _mds_impl(self) -> str:
        return resolve_mds_impl(self.precision)

    def warmup(self, shapes=((256, 96),), iterations: int = 1, minsteps: int = 1):
        """Precompile the fold program for the given (nseqs, nres) buckets.

        Serving deployments call this at startup so the first real request
        doesn't pay compilation (compiles are also cached on disk when
        ``jax_compilation_cache_dir`` is set).
        """
        for nseqs, nres in shapes:
            self.fold(np.zeros((nseqs, nres), np.uint8),
                      iterations=iterations, minsteps=minsteps)


def _default_weight_paths():
    modeldir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "trained_model")
    paths = [os.path.join(modeldir, f"FINAL_fullmap_e2e_model_part{i}.pt") for i in (1, 2)]
    return modeldir, paths


def _download_trained_model(modeldir: str, paths):
    """First-run fetch of the released reference weights (predict.py:64-71)."""
    import sys
    from urllib import request

    print(f"Downloading trained model (~140 MB) as first time setup to {modeldir}, "
          "internet connection required", file=sys.stderr)
    os.makedirs(modeldir, exist_ok=True)
    base = "https://github.com/psipred/DMPfold2/raw/master/dmpfold/trained_model"
    for path in paths:
        # download to a temp name and rename on success: an interrupted
        # fetch must not leave a truncated .pt that later runs trust
        tmp = path + ".download"
        request.urlretrieve(f"{base}/{os.path.basename(path)}", tmp)
        os.replace(tmp, path)


def load_weights(weights_file: str | None = None):
    """Resolve weights into a parameter pytree.

    ``weights_file`` may be a native ``.npz`` (see weights.save_params), a
    torch ``.pt`` state dict, or None for the released two-part checkpoint
    (downloaded on first use, like the reference).
    """
    from .. import weights as weights_mod

    if weights_file is not None:
        if weights_file.endswith(".npz"):
            return weights_mod.load_params(weights_file)
        return weights_mod.load_torch_checkpoint([weights_file])

    modeldir, paths = _default_weight_paths()
    native = os.path.join(modeldir, "params.npz")
    if os.path.isfile(native):
        return weights_mod.load_params(native)
    if not all(os.path.isfile(p) for p in paths):
        _download_trained_model(modeldir, paths)
    return weights_mod.load_torch_checkpoint(paths)


def aln_to_coords(input_file: str, device=None, template: str | None = None,
                  iterations: int | None = None, minsteps: int | None = None,
                  weights_file: str | None = None, return_alnmat: bool = False,
                  params=None, config: FoldConfig | None = None):
    """Public API matching the reference (predict.py:74): aln file -> structure.

    ``device`` is accepted for signature compatibility and ignored — JAX
    places computation on the available accelerator. ``params`` short-circuits
    weight loading (useful for batch callers holding a Folder). ``config``
    carries the TPU-native knobs (precision, dca_method, ...); explicit
    kwargs override its reference-compatible fields.
    """
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = config or FoldConfig()
    if iterations is None:
        iterations = cfg.iterations
    if minsteps is None:
        minsteps = cfg.minsteps
    if template is None:
        template = cfg.template
    if weights_file is None:
        weights_file = cfg.weights_file
    alnmat = aln_io.parse_aln(input_file)
    template_ca = pdb_io.parse_template_ca(template) if template is not None else None
    if params is None:
        params = load_weights(weights_file)
    folder = Folder.from_config(params, cfg)
    coords, confs = folder.fold(alnmat, template_ca, iterations, minsteps)
    if return_alnmat:
        return coords, confs, alnmat
    return coords, confs
