"""Training step: teacher forcing, per-sample loss, DP-sharded batched update.

Mirrors the reference training semantics (reference: dmpfold/train.py:230-374):
random recycling depth, 100 in-graph refinement steps (differentiated through),
50% teacher-forcing of the distance-map channel with noised ground-truth CAs,
Adam, gradient accumulation. Differences, by design:

  * Samples are padded to a common bucket and *batched* (vmap) instead of the
    reference's one-at-a-time python loop — micro-batches shard across chips
    over the mesh's ``data`` axis (net-new; the reference is single-GPU).
  * The recycling count is drawn per micro-batch (must be static for reverse
    -mode AD through the python-unrolled loop) instead of per sample.
  * bf16 autocast+GradScaler is replaced by TPU-native bf16 policy (no loss
    scaling needed for bf16) — off by default, fp32 otherwise.
  * The reference's in-place noise bug (train.py:313-314 noises the loss
    target's CA trace too) is reproduced when ``noise_targets=True`` (default,
    matching reference behavior) and fixed when False.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..features.dca import dca_or_zero
from ..features.msa import msa_one_hot, reweight
from ..models import gruresnet
from .loss import fold_loss

from ..config import TrainConfig

# single source: config.TrainConfig (reference train.py:29-30)
REFINE_STEPS = TrainConfig.refine_steps
MAX_ITERATIONS = TrainConfig.max_iterations


class TrainBatch(NamedTuple):
    """One padded micro-batch of targets. DCA features are computed on
    device inside the step (the reference ships them from a spawned CUDA
    DataLoader worker per sample, train.py:175-196 — a process+device
    boundary the TPU pipeline doesn't need)."""

    alnmat: jax.Array   # (B, N, L) int32
    targets: jax.Array  # (B, L, 5, 3) ground-truth atoms
    nseqs: jax.Array    # (B,)
    nres: jax.Array     # (B,)


def _prep_sample(alnmat, targets, nseqs, nres, rng, *,
                 teacher_prob: float = 0.5, noise_targets: bool = True,
                 dca_method: str = "cholesky"):
    """Per-sample input prep: DCA features + teacher-forced dmap seed.

    Returns (x2 (L, L, 443), targets (L, 5, 3), rng_drop). Shared by the
    vmapped per-sample loss and the natively-batched loss so both paths make
    bit-identical teacher-forcing decisions for the same per-sample rng.
    """
    l_pad = alnmat.shape[1]
    row_mask = jnp.arange(l_pad) < nres
    pair_mask = row_mask[:, None] & row_mask[None, :]

    # covariation features with gradients disabled (reference train.py:175)
    oh = msa_one_hot(alnmat, nseqs, nres)
    w = reweight(oh, nres)
    dca = jax.lax.stop_gradient(
        dca_or_zero(oh, w, nseqs, nres, method=dca_method))

    rng_tf, rng_noise, rng_drop = jax.random.split(rng, 3)
    # 50%: seed the dmap channel with a noised ground-truth CA distance map
    use_tf = jax.random.bernoulli(rng_tf, teacher_prob)
    noised_ca = targets[:, 1, :] + 0.5 * jax.random.normal(rng_noise, (l_pad, 3))
    diffs = noised_ca[:, None, :] - noised_ca[None, :, :]
    tf_dmap = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(diffs), 2), 1e-16)) * pair_mask
    blank_dmap = jnp.where(pair_mask, -1.0, 0.0)
    dmap_seed = jnp.where(use_tf, tf_dmap, blank_dmap)
    if noise_targets:
        # reference bug reproduction: the loss target's CA trace is the
        # noised one whenever teacher forcing fires
        targets = jnp.where(
            use_tf,
            targets.at[:, 1, :].set(noised_ca),
            targets,
        )

    x2 = jnp.concatenate([dca, dmap_seed[:, :, None]], axis=2)
    return x2, targets, rng_drop


def _resolve_remat(params, batch_size: int, l_pad: int, nloops: int,
                   fused: bool):
    """Pick the trunk rematerialization mode for this (static) step shape.

    ``"save_conv"`` banks each block's conv+maxout output (+ the fused
    kernel's int8 argmax) so the backward replays only the cheap norm+SE
    tail — measured ~25% off the trunk grad — at ~3x the residual bytes
    of full-body checkpointing (models/trunk.py:resnet_block). Estimate
    the residual footprint across all (nloops+1) unrolled trunk passes and
    fall back to full remat (True) when it would crowd the 16 GB HBM.

    ``"recycle"`` additionally checkpoints each recycle iteration: even
    with full-body block remat, reverse-mode banks every pass's scan
    carries (num_blocks x (B, L², cwidth) bf16) plus each pass's
    955-channel input — at micro-batch 4, crop 350, nloops 3 that is
    ~12 GB and the step dies in HBM buffer assignment (the round-3
    "HTTP 500"; root-caused via scripts/bisect_batch4.py). Checkpointing
    the recycle scan body caps the peak at ~2 passes' worth for one extra
    trunk forward per recycle in the backward.

    ``"recycle_save_conv"`` is the recycle tier with save_conv INSIDE the
    replayed pass (one pass's banked conv outputs live at a time).
    Measured crop 350 nloops 3 (scripts/probe_remat_tiers.py, round 5):
    B=4 7.59 -> 7.00 s/step vs plain recycle (-8%), so it is the recycle
    tier's default when one pass's residuals fit. The same probe shows why
    no tier makes B=2 beat 2x B=1 (round-4 verdict item 4): any
    recycle-level checkpoint adds a FULL extra trunk forward per pass to
    the backward, which strictly exceeds the save_conv tail win (B=1:
    1.204 save_conv vs 1.568 hybrid; B=2/sample: 1.256 full-body vs 1.454
    hybrid vs 1.636 recycle), while pure save_conv at B=2 needs ~12 GB of
    residuals (4 passes x 3 GB) — over HBM next to params+Adam state. The
    recompute floor, not a policy gap: multi-chip DP training therefore
    rides B=1-per-chip + gradient accumulation, as PERFORMANCE.md records.
    """
    # trunk geometry from the params pytree (NOT hard-coded defaults: tests
    # and experiments train smaller models, and a wrong estimate would pick
    # save_conv where it OOMs or miss it where it fits). The stacked blocks'
    # maxout weight is (num_blocks, k, k, cwidth, cwidth*pool).
    blocks_w = params["trunk"]["blocks"]["maxout"]["w"]
    num_blocks, cwidth = blocks_w.shape[0], blocks_w.shape[3]
    in_channels = params["trunk"]["input"]["w"].shape[2]  # 955 on flagship
    area = batch_size * l_pad * l_pad
    # full-body remat still banks, per trunk pass: the block scan carries
    # + the full-channel pass input (bf16)
    per_pass = area * (num_blocks * cwidth + in_channels) * 2
    if (nloops + 1) * per_pass > 9e9:
        # recycle tier: bank conv outputs inside the replayed pass when ONE
        # pass's save_conv residuals fit (B=4 crop 350 measured: 6.1 GB,
        # runs, -8% vs plain recycle)
        one_pass_sc = num_blocks * area * cwidth * 6
        return "recycle_save_conv" if one_pass_sc <= 7e9 else "recycle"
    per_elem = 6 if fused else 12  # bytes per (L², cwidth) element saved
    est = (nloops + 1) * num_blocks * area * cwidth * per_elem
    return "save_conv" if est <= 8e9 else True


def sample_loss(params, alnmat, targets, nseqs, nres, rng, *,
                nloops: int, refine_steps: int = REFINE_STEPS,
                teacher_prob: float = 0.5, noise_targets: bool = True,
                dropout: bool = True, precision: str = "fp32",
                remat=True, dca_method: str = "cholesky"):
    """Loss for one (padded) sample, differentiable through recycling+refinement."""
    x2, targets, rng_drop = _prep_sample(
        alnmat, targets, nseqs, nres, rng,
        teacher_prob=teacher_prob, noise_targets=noise_targets,
        dca_method=dca_method)
    rngs = None
    if dropout:
        rngs = {
            "hgru": jax.random.fold_in(rng_drop, 0),
            "init": jax.random.fold_in(rng_drop, 1),
            "recycle": jax.random.fold_in(rng_drop, 2),
        }
    compute_dtype = jnp.bfloat16 if precision == "bf16" else None
    coords, confs = gruresnet.forward(
        params, alnmat, x2, nseqs, nres, nloops, refine_steps,
        rngs=rngs, remat=remat, compute_dtype=compute_dtype,
    )
    return fold_loss(coords, confs, targets, nres)


def batch_loss_native(params, batch: "TrainBatch", rngs, *,
                      nloops: int, refine_steps: int = REFINE_STEPS,
                      teacher_prob: float = 0.5, noise_targets: bool = True,
                      dropout: bool = True, precision: str = "fp32",
                      fused_conv: bool = False, remat=True,
                      dca_method: str = "cholesky"):
    """Natively-batched micro-batch loss: one trunk conv per block for the
    whole batch via :func:`gruresnet.forward_batched` — required to run the
    fused Pallas conv (custom VJP, no vmap rule) in training. Per-sample
    teacher-forcing decisions reuse :func:`_prep_sample` with the same
    per-sample rngs as the vmapped path; dropout masks are drawn over the
    whole batch (independent per sample, different bits from the vmapped
    path — distributionally equivalent).

    Returns (mean loss, metrics) like the vmapped path's reduction.
    """
    # per-sample prep runs SEQUENTIALLY (lax.map), not vmapped: the (21L)²
    # DCA inverse at crop 350 is 7392² — batching it materializes
    # f32[B, 5248, 7392]-class triangular-solve temporaries (~600 MB each)
    # and the micro-batch-4 step dies in HBM buffer assignment (the round-3
    # "HTTP 500" compile failure, root-caused round 4 via
    # scripts/bisect_batch4.py). Sequential prep caps the peak at one
    # sample's worth; DCA is a few percent of the step, so the
    # serialization costs ~nothing.
    x2, targets, rng_drop = jax.lax.map(
        lambda args: _prep_sample(
            *args, teacher_prob=teacher_prob,
            noise_targets=noise_targets, dca_method=dca_method),
        (batch.alnmat, batch.targets, batch.nseqs, batch.nres, rngs))
    drngs = None
    if dropout:
        base = rng_drop[0]
        drngs = {
            "hgru": jax.random.fold_in(base, 0),
            "init": jax.random.fold_in(base, 1),
            "recycle": jax.random.fold_in(base, 2),
        }
    compute_dtype = jnp.bfloat16 if precision == "bf16" else None
    coords, confs = gruresnet.forward_batched(
        params, batch.alnmat, x2, batch.nseqs, batch.nres, nloops,
        refine_steps, rngs=drngs, remat=remat, compute_dtype=compute_dtype,
        fused_conv=fused_conv,
    )
    losses, metrics = jax.vmap(fold_loss)(coords, confs, targets, batch.nres)
    metrics = jax.tree.map(jnp.mean, metrics)
    metrics["sample_loss"] = losses  # (B,): lets eval exclude padded samples
    return jnp.mean(losses), metrics


def make_optimizer(learning_rate: float = 1e-4, accum_steps: int = 1):
    """Adam (reference lr: 1e-4 restart / 3e-4 scratch) with optional
    gradient accumulation replacing the reference's 32-sample python loop."""
    opt = optax.adam(learning_rate)
    if accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum_steps)
    return opt


@partial(jax.jit, static_argnames=("optimizer", "nloops", "refine_steps", "train",
                                   "precision", "native_batch", "fused_conv"))
def train_step(params, opt_state, batch: TrainBatch, rng, *, optimizer,
               nloops: int, refine_steps: int = REFINE_STEPS, train: bool = True,
               precision: str = "fp32", native_batch: bool = False,
               fused_conv: bool = False):
    """One DP step over a padded micro-batch. Returns (params, opt_state, metrics).

    ``native_batch`` uses the natively-batched forward (one trunk conv per
    block for the whole micro-batch) instead of vmapping the per-sample
    loss; with ``fused_conv`` (TPU + bf16) the trunk convs then run the
    fused Pallas kernel through its custom VJP. The vmapped default keeps
    GSPMD's per-sample ``spmd_axis_name`` partitioning for mesh training.
    """
    batch_size = batch.alnmat.shape[0]
    rngs = jax.random.split(rng, batch_size)
    remat = _resolve_remat(params, batch_size, batch.alnmat.shape[2], nloops,
                           bool(fused_conv))
    # backend-resolved DCA inverse, like inference (engine/fold.py): the
    # recursive Schur inverse keeps the (21L)^2 solve on the MXU with
    # bounded temporaries (the stock Cholesky path's triangular solves are
    # also the micro-batch>=4 OOM, see batch_loss_native)
    from ..engine.fold import resolve_dca_method

    dca_method = resolve_dca_method("auto", precision)

    def batched_loss(p):
        if native_batch:
            return batch_loss_native(
                p, batch, rngs, nloops=nloops, refine_steps=refine_steps,
                dropout=train, precision=precision, fused_conv=fused_conv,
                remat=remat, dca_method=dca_method)
        losses, metrics = jax.vmap(
            lambda a, t, ns, nr, r: sample_loss(
                p, a, t, ns, nr, r, nloops=nloops, refine_steps=refine_steps,
                dropout=train, precision=precision, remat=remat,
                dca_method=dca_method,
            ),
            spmd_axis_name="data",
        )(batch.alnmat, batch.targets, batch.nseqs, batch.nres, rngs)
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["sample_loss"] = losses  # (B,): lets eval exclude padded samples
        return jnp.mean(losses), metrics

    if not train:
        _, metrics = batched_loss(params)
        return params, opt_state, metrics

    (_, metrics), grads = jax.value_and_grad(batched_loss, has_aux=True)(params)
    # non-finite guard: the reference skips samples whose SVD fails and its
    # GradScaler skips inf/nan steps (train.py:213-217, 373-374). A skipped
    # step must leave BOTH params and optimizer state untouched — zeroed
    # grads alone would still move params through Adam's decayed momentum
    # (and advance its moment/step state), which is not a skip.
    grads_ok = jnp.all(jnp.asarray(
        [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
    ))
    grads = jax.tree.map(lambda g: jnp.where(grads_ok, g, jnp.zeros_like(g)), grads)
    metrics["skipped"] = 1.0 - jnp.asarray(grads_ok, jnp.float32)
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    keep = lambda new, old: jax.tree.map(
        lambda n, o: jnp.where(grads_ok, n, o), new, old)
    return keep(new_params, params), keep(new_opt_state, opt_state), metrics
