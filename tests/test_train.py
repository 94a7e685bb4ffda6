"""Training stack tests: TM-score parity, loss masking, train-step smoke."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from dmpfold2_tpu.models import gruresnet
from dmpfold2_tpu.train.loss import fold_loss, steric_loss, tmscore
from dmpfold2_tpu.train.step import TrainBatch, make_optimizer, sample_loss, train_step


def torch_tmscore(c1, c2):
    """Reference TM-score formula as torch oracle (train.py:207-225)."""
    r1, r2 = c1.T, c2.T
    p = r1 - r1.mean(1).view(3, 1)
    q = r2 - r2.mean(1).view(3, 1)
    cov = p @ q.T
    u, s, vh = torch.linalg.svd(cov)
    v = vh.T
    d = torch.tensor([[1.0, 0, 0], [0, 1.0, 0], [0, 0, torch.det(v @ u.T)]])
    rot = v @ d @ u.T
    diffs = rot @ p - q
    d0sq = ((1.24 * diffs.shape[1] / 5 - 15.0) ** (1.0 / 3.0) - 1.8) ** 2
    return 1.0 / (1.0 + (diffs ** 2).sum(0) / d0sq)


def test_tmscore_matches_torch():
    rng = np.random.default_rng(0)
    a = (rng.normal(size=(100, 3)) * 5).astype(np.float32)
    b = (a + rng.normal(size=(100, 3)) * 0.8).astype(np.float32)
    ours = np.asarray(tmscore(jnp.asarray(a), jnp.asarray(b)))
    theirs = torch_tmscore(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_tmscore_padding_invariant():
    rng = np.random.default_rng(1)
    a = (rng.normal(size=(60, 3)) * 5).astype(np.float32)
    b = (a + rng.normal(size=(60, 3))).astype(np.float32)
    base = np.asarray(tmscore(jnp.asarray(a), jnp.asarray(b)))
    ap = np.zeros((90, 3), np.float32); ap[:60] = a
    bp = np.zeros((90, 3), np.float32); bp[:60] = b
    padded = np.asarray(tmscore(jnp.asarray(ap), jnp.asarray(bp), 60))
    np.testing.assert_allclose(padded[:60], base, atol=1e-5)


def test_perfect_match_tm_is_one():
    rng = np.random.default_rng(2)
    a = (rng.normal(size=(50, 3)) * 5).astype(np.float32)
    # arbitrary rotation + translation must give TM == 1
    theta = 0.7
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    b = a @ rot.T + np.array([3.0, -2.0, 1.0], np.float32)
    tm = np.asarray(tmscore(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(tm, 1.0, atol=1e-4)


def test_steric_loss_padding_invariant():
    rng = np.random.default_rng(3)
    ca = (rng.normal(size=(30, 3)) * 4).astype(np.float32)
    base = float(steric_loss(jnp.asarray(ca), 30))
    cap = np.zeros((48, 3), np.float32); cap[:30] = ca
    padded = float(steric_loss(jnp.asarray(cap), 30))
    assert abs(base - padded) < 1e-6


@pytest.fixture(scope="module")
def tiny_setup():
    params = gruresnet.init_params(jax.random.PRNGKey(0), width=32, cwidth=16, num_blocks=2)
    B, N, L = 2, 6, 12
    rng = np.random.default_rng(5)
    batch = TrainBatch(
        alnmat=jnp.asarray(rng.integers(0, 22, (B, N, L)), jnp.int32),
        targets=jnp.asarray(rng.normal(size=(B, L, 5, 3)) * 4, jnp.float32),
        nseqs=jnp.full((B,), N, jnp.int32),
        nres=jnp.full((B,), L, jnp.int32),
    )
    return params, batch


def test_sample_loss_finite_and_grads_flow(tiny_setup):
    params, batch = tiny_setup
    loss, metrics = sample_loss(
        params, batch.alnmat[0], batch.targets[0],
        batch.nseqs[0], batch.nres[0], jax.random.PRNGKey(1),
        nloops=1, refine_steps=3,
    )
    assert np.isfinite(float(loss))

    grads = jax.grad(
        lambda p: sample_loss(
            p, batch.alnmat[0], batch.targets[0],
            batch.nseqs[0], batch.nres[0], jax.random.PRNGKey(1),
            nloops=1, refine_steps=3,
        )[0]
    )(params)
    norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0


def test_sample_loss_grads_finite_with_padding(tiny_setup):
    """Regression (round 2): padded buckets used to NaN every gradient —
    degenerate zero eigenvalues from the padded Gram block break the eigh
    VJP, and coincident padded CAs break _normalize's sqrt backward. The
    non-finite guard then silently zeroed the whole step, so mixed-length
    batches made no training progress."""
    params, batch = tiny_setup
    for nres in (10, 7):  # strictly less than the L=12 bucket
        grads = jax.grad(
            lambda p: sample_loss(
                p, batch.alnmat[0], batch.targets[0],
                batch.nseqs[0], jnp.asarray(nres), jax.random.PRNGKey(1),
                nloops=1, refine_steps=3,
            )[0]
        )(params)
        norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
        assert all(np.isfinite(n) for n in norms), f"nres={nres}"
        assert max(norms) > 0


def test_train_step_updates_params(tiny_setup):
    params, batch = tiny_setup
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    new_params, new_state, metrics = train_step(
        params, opt_state, batch, jax.random.PRNGKey(2),
        optimizer=opt, nloops=1, refine_steps=2,
    )
    assert np.isfinite(float(metrics["loss"]))
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params))
    )
    assert changed

    # eval mode: params unchanged, loss finite
    p2, _, eval_metrics = train_step(
        params, opt_state, batch, jax.random.PRNGKey(3),
        optimizer=opt, nloops=1, refine_steps=2, train=False,
    )
    assert np.isfinite(float(eval_metrics["loss"]))
    assert all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2))
    )


def test_train_step_bf16_policy(tiny_setup):
    """bf16 trunk policy during training: finite loss, params update."""
    params, batch = tiny_setup
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    new_params, _, metrics = train_step(
        params, opt_state, batch, jax.random.PRNGKey(5),
        optimizer=opt, nloops=1, refine_steps=2, precision="bf16",
    )
    assert np.isfinite(float(metrics["loss"]))
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params))
    )


def test_train_step_skips_nonfinite_grads(tiny_setup):
    """A NaN-producing micro-batch must not poison params (GradScaler analog)."""
    params, batch = tiny_setup
    # degenerate targets (all zeros) push the Kabsch SVD toward NaN grads;
    # force the issue by injecting NaN into the targets directly
    bad = TrainBatch(
        batch.alnmat,
        jnp.full_like(batch.targets, jnp.nan),
        batch.nseqs, batch.nres,
    )
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    new_params, _, metrics = train_step(
        params, opt_state, bad, jax.random.PRNGKey(9),
        optimizer=opt, nloops=0, refine_steps=1,
    )
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params)):
        assert np.isfinite(np.asarray(b)).all()


def test_native_batch_matches_vmapped(tiny_setup):
    """The natively-batched training path (forward_batched + vmapped loss)
    must agree with the vmapped per-sample path: identical teacher-forcing
    decisions (shared per-sample rngs), same loss and same gradients with
    dropout off (dropout bits differ by construction)."""
    from dmpfold2_tpu.train.step import batch_loss_native

    params, batch = tiny_setup
    rngs = jax.random.split(jax.random.PRNGKey(7), batch.alnmat.shape[0])

    def vmapped(p):
        losses, _ = jax.vmap(
            lambda a, t, ns, nr, r: sample_loss(
                p, a, t, ns, nr, r, nloops=1, refine_steps=3, dropout=False)
        )(batch.alnmat, batch.targets, batch.nseqs, batch.nres, rngs)
        return jnp.mean(losses)

    def native(p):
        loss, _ = batch_loss_native(
            p, batch, rngs, nloops=1, refine_steps=3, dropout=False)
        return loss

    lv, gv = jax.value_and_grad(vmapped)(params)
    ln, gn = jax.value_and_grad(native)(params)
    np.testing.assert_allclose(float(ln), float(lv), rtol=1e-5)
    flat_v, _ = jax.flatten_util.ravel_pytree(gv)
    flat_n, _ = jax.flatten_util.ravel_pytree(gn)
    scale = float(jnp.abs(flat_v).max())
    np.testing.assert_allclose(np.asarray(flat_n) / scale,
                               np.asarray(flat_v) / scale, atol=2e-4)


def test_train_step_native_batch(tiny_setup):
    """native_batch=True drives a full optimizer step (dropout on) without
    NaNs and actually updates parameters."""
    params, batch = tiny_setup
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    new_params, _, metrics = train_step(
        params, opt_state, batch, jax.random.PRNGKey(3),
        optimizer=opt, nloops=2, refine_steps=2, native_batch=True,
    )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped"]) == 0.0
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params))
    )
    assert changed


def test_remat_save_conv_grad_parity():
    """remat="save_conv" (bank conv+maxout outputs, replay only the norm+SE
    tail) must produce the same trunk gradients as full-body checkpointing
    -- it changes what is saved, never the math."""
    from dmpfold2_tpu.models.trunk import trunk_apply, trunk_params

    key = jax.random.PRNGKey(0)
    params = trunk_params(key, in_channels=19, width=16, num_blocks=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 12, 19))
    mask = (jnp.arange(12) < 10)
    mask = (mask[:, None] & mask[None, :])[None, :, :, None]
    drop = jax.random.PRNGKey(2)

    def loss(p, v, remat):
        out = trunk_apply(p, v, mask, dropout_rng=drop, remat=remat)
        return jnp.sum(out)

    for dropout_rng in (drop, None):
        def loss(p, v, remat, d=dropout_rng):
            out = trunk_apply(p, v, mask, dropout_rng=d, remat=remat)
            return jnp.sum(out)

        g_full = jax.grad(loss)(params, x, True)
        g_save = jax.grad(loss)(params, x, "save_conv")
        for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_save)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


def test_resolve_remat_policy():
    """Trunk geometry comes from the params pytree, not hard-coded defaults
    (ADVICE round 3): a small test model must not inherit the flagship's
    residual estimate."""
    import jax

    from dmpfold2_tpu.models import gruresnet
    from dmpfold2_tpu.train.step import _resolve_remat

    full = {"trunk": {
        "blocks": {"maxout": {"w": np.zeros((16, 5, 5, 128, 512))}},
        "input": {"w": np.zeros((1, 1, 955, 384))},
    }}
    # B=1 crop-350 fused qualifies; bigger batches fall back to full remat
    assert _resolve_remat(full, 1, 352, 3, fused=True) == "save_conv"
    assert _resolve_remat(full, 2, 352, 3, fused=True) is True
    # the unfused residuals are ~2x, so the same shape can fall back
    assert _resolve_remat(full, 1, 352, 3, fused=False) is True
    assert _resolve_remat(full, 1, 128, 3, fused=False) == "save_conv"

    # a small experiment model (width 32, 4 blocks) has 16x fewer residual
    # bytes: shapes that fall back on the flagship qualify here
    small = gruresnet.init_params(jax.random.PRNGKey(0), width=64, cwidth=32,
                                  num_blocks=4)
    assert small["trunk"]["blocks"]["maxout"]["w"].shape[0] == 4
    assert _resolve_remat(small, 2, 352, 3, fused=True) == "save_conv"
    assert _resolve_remat(small, 1, 352, 3, fused=False) == "save_conv"

    # micro-batch >= 4 at crop 350 with recycling: even full-body remat
    # banks ~(nloops+1) passes of block carries (~12 GB) — the step must
    # pick recycle-level checkpointing (round-3 "HTTP 500" root cause).
    # Round 5: within the recycle band, one pass's banked conv outputs fit
    # at B=4 (6.1 GB measured running), so the hybrid tier is preferred...
    assert _resolve_remat(full, 4, 352, 3, fused=True) == "recycle_save_conv"
    # ...and plain recycle remains the fallback when even one pass's
    # save_conv residuals would crowd HBM (B=8 crop 350: ~12 GB)
    assert _resolve_remat(full, 8, 352, 3, fused=True) == "recycle"
    # no recycling: a single pass's residuals fit without the extra level
    assert _resolve_remat(full, 4, 352, 0, fused=True) in (True, "save_conv")
    assert _resolve_remat(full, 1, 352, 3, fused=True) == "save_conv"


def test_train_step_recycle_remat_runs():
    """The 'recycle' remat mode (per-iteration checkpoint) must produce a
    finite loss and update params — exercised on a tiny model by forcing
    the mode (the flagship triggers it at micro-batch >= 4, crop 350)."""
    import jax.numpy as jnp

    from dmpfold2_tpu.train import step as step_mod
    from dmpfold2_tpu.train.step import TrainBatch, make_optimizer, train_step

    params = gruresnet.init_params(jax.random.PRNGKey(0), width=16, cwidth=8,
                                   num_blocks=2)
    rng = np.random.default_rng(3)
    bsz, n_rows, l_pad = 2, 5, 16
    t = np.arange(l_pad, dtype=np.float32)
    helix = np.stack([2.3 * np.cos(0.6 * t), 2.3 * np.sin(0.6 * t), 1.5 * t], -1)
    gt = helix[None, :, None, :] + rng.normal(size=(bsz, l_pad, 5, 3)) * 0.3
    batch = TrainBatch(
        jnp.asarray(rng.integers(0, 21, (bsz, n_rows, l_pad)), jnp.int32),
        jnp.asarray(gt, jnp.float32),
        jnp.full((bsz,), n_rows, jnp.int32),
        jnp.full((bsz,), 14, jnp.int32),
    )
    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)
    orig = step_mod._resolve_remat
    try:
        for tier in ("recycle", "recycle_save_conv"):
            step_mod._resolve_remat = lambda *a, t=tier, **k: t
            for native in (True, False):
                new_params, _, metrics = train_step(
                    params, opt_state, batch, jax.random.PRNGKey(1),
                    optimizer=optimizer, nloops=2, refine_steps=2,
                    native_batch=native)
                assert np.isfinite(float(metrics["loss"]))
                delta = max(
                    float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                    for a, b in zip(jax.tree.leaves(params),
                                    jax.tree.leaves(new_params))
                    if np.asarray(a).size)
                assert delta > 0.0
    finally:
        step_mod._resolve_remat = orig


def test_overfit_single_sample_loss_decreases(tiny_setup):
    """End-to-end optimization evidence: repeatedly stepping on ONE sample
    must drive the composite loss down (the reference's training run is its
    only such evidence, train.py:351-400 — here it is a 50-step overfit).
    Dropout and teacher-forcing noise make per-step losses jumpy, so the
    criterion compares first-5 vs last-5 averages."""
    params, batch = tiny_setup
    one = TrainBatch(batch.alnmat[:1], batch.targets[:1],
                     batch.nseqs[:1], batch.nres[:1])
    opt = make_optimizer(3e-3)
    opt_state = opt.init(params)
    losses = []
    key = jax.random.PRNGKey(11)
    for i in range(50):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = train_step(
            params, opt_state, one, sub,
            optimizer=opt, nloops=0, refine_steps=0,
        )
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1]), f"step {i} loss not finite"
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < 0.8 * first, (
        f"loss did not decrease: first5={first:.4f} last5={last:.4f}\n{losses}")
