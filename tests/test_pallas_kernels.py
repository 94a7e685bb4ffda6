"""Pallas kernel correctness vs the lax.scan reference path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dmpfold2_tpu.kernels.vgru import vgru_final_pallas
from dmpfold2_tpu.models import gru


@pytest.fixture(scope="module")
def layers():
    key = jax.random.PRNGKey(0)
    return gru.unigru_stack_params(key, 2, 22, 64)


def _ref(layers, aln, valid):
    x = jnp.asarray(aln[..., None] == jnp.arange(22), jnp.float32)
    return gru.unigru_stack_final(layers, x, valid_len=valid)


def test_vgru_kernel_matches_scan(layers):
    rng = np.random.default_rng(0)
    aln = jnp.asarray(rng.integers(0, 22, (20, 16)), jnp.int32)
    ref = _ref(layers, aln, 20)
    out = vgru_final_pallas(layers, aln, 20, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vgru_kernel_masked(layers):
    rng = np.random.default_rng(1)
    aln = jnp.asarray(rng.integers(0, 22, (24, 16)), jnp.int32)
    valid = 15
    ref = _ref(layers, aln, valid)
    out = vgru_final_pallas(layers, aln, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vgru_cols_kernel_per_column_valid(layers):
    """Batched-mode kernel: each column freezes at its OWN valid depth —
    this is what lets one invocation serve a whole shape-bucket batch."""
    from dmpfold2_tpu.kernels.vgru import vgru_final_cols_pallas

    rng = np.random.default_rng(2)
    n_rows, n_cols = 24, 16
    aln = jnp.asarray(rng.integers(0, 22, (n_rows, n_cols)), jnp.int32)
    col_valid = jnp.asarray(rng.integers(1, n_rows + 1, (n_cols,)), jnp.int32)
    out = vgru_final_cols_pallas(layers, aln, col_valid, interpret=True)
    # reference: run each column separately at its own depth
    for c in range(n_cols):
        ref_c = _ref(layers, aln[:, c : c + 1], int(col_valid[c]))
        np.testing.assert_allclose(np.asarray(out[c]), np.asarray(ref_c[0]),
                                   atol=1e-5, err_msg=f"col {c}")


def test_vgru_cols_kernel_matches_batched_forward(layers):
    """The flattened-columns kernel equals the batched scan path for a
    (B, N, L) stack with per-target nseqs."""
    rng = np.random.default_rng(3)
    b, n_rows, l = 3, 16, 8
    alnmat = jnp.asarray(rng.integers(0, 22, (b, n_rows, l)), jnp.int32)
    nseqs = jnp.asarray([16, 9, 4], jnp.int32)

    from dmpfold2_tpu.kernels.vgru import vgru_final_cols_pallas

    aln_cols = jnp.transpose(alnmat, (1, 0, 2)).reshape(n_rows, b * l)
    col_valid = jnp.repeat(nseqs, l)
    out = vgru_final_cols_pallas(layers, aln_cols, col_valid, interpret=True)

    x = jnp.asarray(alnmat[..., None] == jnp.arange(22), jnp.float32)
    x_cols = jnp.transpose(x, (1, 0, 2, 3)).reshape(n_rows, b * l, -1)
    ref = gru.unigru_stack_final(layers, x_cols, valid_len=col_valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vgru_cols_kernel_awkward_length(layers):
    """Prime/odd column counts must pad to a full tile (not degrade to
    1-wide tiles): results still match the scan on the true columns."""
    rng = np.random.default_rng(5)
    n_rows, n_cols = 12, 13  # 13 is prime
    aln = jnp.asarray(rng.integers(0, 22, (n_rows, n_cols)), jnp.int32)
    col_valid = jnp.asarray(rng.integers(1, n_rows + 1, (n_cols,)), jnp.int32)
    from dmpfold2_tpu.kernels.vgru import vgru_final_cols_pallas

    out = vgru_final_cols_pallas(layers, aln, col_valid, interpret=True)
    assert out.shape[0] == n_cols
    x = jnp.asarray(aln[..., None] == jnp.arange(22), jnp.float32)
    ref = gru.unigru_stack_final(layers, x, valid_len=col_valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rgru_kernel_matches_scan_per_column_valid():
    """Residue-GRU sequence kernel vs lax.scan: batched, per-target lengths,
    both directions (forward freeze / reverse zero masking)."""
    from dmpfold2_tpu.kernels.rgru import bigru_stack_pallas

    key = jax.random.PRNGKey(2)
    T, B, C, H = 23, 5, 40, 128
    stack = gru.bigru_stack_params(key, 3, C, H)
    x = jax.random.normal(jax.random.PRNGKey(3), (T, B, C), jnp.float32)
    valid = jnp.asarray([23, 17, 1, 9, 23], jnp.int32)
    ref = gru.bigru_stack(stack, x, valid)
    out = bigru_stack_pallas(stack, x, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rgru_kernel_single_target_scalar_valid():
    from dmpfold2_tpu.kernels.rgru import bigru_stack_pallas

    key = jax.random.PRNGKey(4)
    stack = gru.bigru_stack_params(key, 2, 12, 128)
    x = jax.random.normal(jax.random.PRNGKey(5), (19, 1, 12), jnp.float32)
    ref = gru.bigru_stack(stack, x, 13)
    out = bigru_stack_pallas(stack, x, 13, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rgru_in_forward_interpret(monkeypatch):
    """forward(rgru_impl="pallas") must match the scan path end-to-end."""
    import dmpfold2_tpu.kernels.rgru as rgru_mod
    from dmpfold2_tpu.models import gruresnet

    orig = rgru_mod.gru_seq_pallas
    monkeypatch.setattr(
        rgru_mod, "gru_seq_pallas",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    rng = np.random.default_rng(13)
    params = gruresnet.init_params(jax.random.PRNGKey(6), width=32, cwidth=16,
                                   num_blocks=2)
    n, l = 12, 16
    alnmat = jnp.asarray(rng.integers(0, 22, (n, l)), jnp.int32)
    x2 = jnp.asarray(rng.normal(size=(l, l, 443)).astype(np.float32) * 0.1)
    args = (params, alnmat, x2, 12, 14, 1, 5)
    ref = gruresnet.forward(*args)
    out = gruresnet.forward(*args, rgru_impl="pallas")
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), atol=2e-4)


def test_fused_conv_maxout_matches_xla():
    from dmpfold2_tpu.kernels.conv_block import conv5x5_maxout

    rng = np.random.default_rng(2)
    B, L, C, CO = 2, 16, 8, 32
    x = jnp.asarray(rng.normal(size=(B, L, L, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 5, C, CO)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(CO,)), jnp.float32)
    out = conv5x5_maxout(x, w, b, interpret=True)

    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b
    ref = ref.reshape(B, L, L, CO // 4, 4).max(-1)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.05
    )


def test_fused_conv_pool1_is_plain_conv():
    """pool=1 degenerates the maxout to the identity — the kernel is then a
    plain 5x5 conv (the dx backward reuses it this way, round 4)."""
    from dmpfold2_tpu.kernels.conv_block import conv5x5_maxout

    rng = np.random.default_rng(5)
    B, L, C, CO = 1, 12, 16, 8  # wide-in, narrow-out like the dx conv
    x = jnp.asarray(rng.normal(size=(B, L, L, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 5, C, CO)) * 0.1, jnp.float32)
    b = jnp.zeros((CO,), jnp.float32)
    out = conv5x5_maxout(x, w, b, pool=1, interpret=True)

    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05)


def test_fused_conv_diff_grads_match_xla():
    """Hand-written VJP of the fused kernel vs jax.grad of the XLA reference
    (conv+bias+maxout in the same bf16/fp32-accumulate policy)."""
    from dmpfold2_tpu.kernels.conv_block import conv5x5_maxout_diff

    rng = np.random.default_rng(4)
    B, L, C, CO, pool = 2, 16, 8, 32, 4
    x = jnp.asarray(rng.normal(size=(B, L, L, C)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(5, 5, C, CO)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(CO,)) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, L, L, CO // pool)), jnp.float32)

    def fused_loss(x, w, b):
        out = conv5x5_maxout_diff(x, w, b, pool, True)  # interpret mode
        return jnp.sum(out.astype(jnp.float32) * cot)

    def ref_conv(x, w, b):
        # kernel math emulated in differentiable jnp: bf16-quantized
        # operands, fp32 accumulation — so maxout winners agree with the
        # kernel except at exact near-ties (masked below)
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.bfloat16).astype(jnp.float32),
            (1, 1), ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b

    def ref_loss(x, w, b):
        out = ref_conv(x, w, b).reshape(B, L, L, CO // pool, pool).max(-1)
        return jnp.sum(out * cot)

    vf, gf = jax.value_and_grad(fused_loss, (0, 1, 2))(x, w, b)
    vr, gr = jax.value_and_grad(ref_loss, (0, 1, 2))(x, w, b)
    assert abs(float(vf) - float(vr)) < 0.5

    # positions whose top-2 maxout margin is below bf16 resolution can route
    # the gradient to a different (equally correct) winner — exclude them
    grouped = np.asarray(ref_conv(x, w, b)).reshape(B, L, L, CO // pool, pool)
    top2 = np.sort(grouped, axis=-1)[..., -2:]
    margin_ok = (top2[..., 1] - top2[..., 0]) > 0.02
    np.testing.assert_array_less(0.97, margin_ok.mean())  # sanity: mostly clean

    for got, want, name, tol in zip(gf, gr, "xwb", (0.3, 0.5, 0.05)):
        got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
        if name != "x":
            # dw/db only see tie flips through the scatter; compare directly
            scale = max(np.abs(want).max(), 1.0)
            np.testing.assert_allclose(got / scale, want / scale,
                                       atol=tol / scale, err_msg=f"d{name}")
    # dx: compare where no near-tie touches the receptive field
    dxf, dxr = np.asarray(gf[0], np.float32), np.asarray(gr[0], np.float32)
    bad = ~margin_ok.all(axis=-1)  # (B, L, L) any unclear group at this pixel
    pad = np.pad(bad, ((0, 0), (2, 2), (2, 2)), constant_values=False)
    dil = np.zeros_like(bad)
    for dy in range(5):
        for dx_ in range(5):
            dil |= pad[:, dy : dy + L, dx_ : dx_ + L]
    clean = ~dil
    scale = max(np.abs(dxr).max(), 1.0)
    np.testing.assert_allclose(dxf[clean] / scale, dxr[clean] / scale,
                               atol=0.3 / scale, err_msg="dx")


def test_fused_conv_diff_primal_identical():
    """Without differentiation the custom-VJP wrapper must run the plain
    kernel: bit-identical outputs, no argmax side output."""
    from dmpfold2_tpu.kernels.conv_block import (conv5x5_maxout,
                                                 conv5x5_maxout_diff)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(5, 5, 8, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    a = conv5x5_maxout(x, w, b, 4, interpret=True)
    c = conv5x5_maxout_diff(x, w, b, 4, True)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(c, np.float32))


def test_fused_conv_norm_matches_two_pass():
    """conv5x5_maxout_norm (in-kernel masked stats) vs the two-pass
    conv+maxout+masked_instance_norm reference at mixed per-target nres."""
    from dmpfold2_tpu.kernels.conv_block import conv5x5_maxout_norm
    from dmpfold2_tpu.ops.norm import masked_instance_norm

    rng = np.random.default_rng(7)
    B, L, C, CO = 3, 20, 8, 32
    nres = jnp.asarray([20, 13, 7], jnp.int32)
    mask = ((jnp.arange(L)[None, :, None] < nres[:, None, None])
            & (jnp.arange(L)[None, None, :] < nres[:, None, None]))
    mask = mask[..., None].astype(jnp.float32)
    x = (jnp.asarray(rng.normal(size=(B, L, L, C)), jnp.float32)
         * mask).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(5, 5, C, CO)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(CO,)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(CO // 4,)) * 0.5 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(CO // 4,)) * 0.3, jnp.float32)

    out = conv5x5_maxout_norm(x, w, b, gamma, beta, 4, nres, mask,
                              interpret=True)

    conv = jax.lax.conv_general_dilated(
        x, w.astype(jnp.bfloat16), (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    ) + b.astype(jnp.bfloat16)
    mx = conv.reshape(B, L, L, CO // 4, 4).max(-1)
    ref = masked_instance_norm(mx, gamma, beta, mask)
    # bf16 conv rounding differs slightly between the kernel (fp32 acc,
    # single bf16 round) and XLA's bf16-output conv; normalized scale is O(1)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.1)
    # padding must stay exactly zero
    np.testing.assert_array_equal(
        np.asarray(out, np.float32) * (1 - np.asarray(mask[..., 0]))[..., None],
        0.0)


def test_fused_conv_norm_in_trunk_interpret(monkeypatch):
    """maxout2d(fused_conv="norm") must agree with the unfused masked path."""
    import dmpfold2_tpu.kernels.conv_block as cb
    from dmpfold2_tpu.models import trunk as T

    orig = cb.conv5x5_maxout_norm
    monkeypatch.setattr(
        cb, "conv5x5_maxout_norm",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    rng = np.random.default_rng(9)
    params = T.maxout_params(jax.random.PRNGKey(1), 8, 8, pool=4, ksize=5)
    B, L = 2, 16
    nres = jnp.asarray([16, 11], jnp.int32)
    mask = ((jnp.arange(L)[None, :, None] < nres[:, None, None])
            & (jnp.arange(L)[None, None, :] < nres[:, None, None]))
    mask = mask[..., None].astype(jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, L, L, 8)), jnp.float32) * mask
    ref = T.maxout2d(params, x, pool=4, mask=mask, compute_dtype=jnp.bfloat16)
    out = T.maxout2d(params, x, pool=4, mask=mask, compute_dtype=jnp.bfloat16,
                     fused_conv="norm")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.1
    )


def test_fused_norm_resnet_block_interpret(monkeypatch):
    """resnet_block(fused_conv="norm") — the fully-fused block where the
    InstanceNorm scale/shift are absorbed into the sSE conv and re-applied
    inline — must agree with the unfused masked block path."""
    import dmpfold2_tpu.kernels.conv_block as cb
    from dmpfold2_tpu.models import trunk as T

    orig = cb.conv5x5_maxout
    monkeypatch.setattr(
        cb, "conv5x5_maxout",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )
    rng = np.random.default_rng(11)
    params = T.block_params(jax.random.PRNGKey(4), 16, 5, 1)
    B, L = 2, 16
    nres = jnp.asarray([16, 10], jnp.int32)
    mask = ((jnp.arange(L)[None, :, None] < nres[:, None, None])
            & (jnp.arange(L)[None, None, :] < nres[:, None, None]))
    mask = mask[..., None].astype(jnp.float32)
    x = (jnp.asarray(rng.normal(size=(B, L, L, 16)), jnp.float32)
         * mask).astype(jnp.bfloat16)
    ref = T.resnet_block(params, x, mask, compute_dtype=jnp.bfloat16)
    out = T.resnet_block(params, x, mask, compute_dtype=jnp.bfloat16,
                         fused_conv="norm")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.1
    )
    # padding must stay exactly zero
    np.testing.assert_array_equal(
        np.asarray(out, np.float32) * (1 - np.asarray(mask)), 0.0)


def test_fused_conv_in_trunk_interpret(monkeypatch):
    """maxout2d(fused_conv=True) must agree with the XLA path (bf16 scale)."""
    import dmpfold2_tpu.kernels.conv_block as cb
    from dmpfold2_tpu.models import trunk as T

    orig = cb.conv5x5_maxout
    monkeypatch.setattr(
        cb, "conv5x5_maxout",
        lambda x, w, b, pool=4, **kw: orig(x, w, b, pool=pool, **{**kw, "interpret": True}),
    )
    rng = np.random.default_rng(3)
    params = T.maxout_params(jax.random.PRNGKey(0), 8, 8, pool=4, ksize=5)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)), jnp.float32)
    ref = T.maxout2d(params, x, pool=4, compute_dtype=jnp.bfloat16)
    out = T.maxout2d(params, x, pool=4, compute_dtype=jnp.bfloat16, fused_conv=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.1
    )


def test_gemm_maxout_matches_xla():
    """The fused 1x1 GEMM+maxout kernel (trunk input layer) vs the XLA
    conv+maxout reference, including a non-128-multiple c_in (lane-padded
    internally, like the real 955-channel input)."""
    from dmpfold2_tpu.kernels.conv_block import gemm_maxout

    rng = np.random.default_rng(21)
    B, L, C, CO, pool = 2, 12, 19, 24, 3
    x = jnp.asarray(rng.normal(size=(B, L, L, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(1, 1, C, CO)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(CO,)), jnp.float32)
    out = gemm_maxout(x, w, b, pool, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b
    ref = ref.reshape(B, L, L, CO // pool, pool).max(-1)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05)


def test_gemm_maxout_norm_matches_two_pass():
    """gemm_maxout_norm (in-kernel masked stats over GEMM-row pixels) vs
    the two-pass conv+maxout+masked_instance_norm reference at mixed
    per-target nres — validates the flat-pixel (i, j) decode and that
    tiles never cross targets."""
    from dmpfold2_tpu.kernels.conv_block import gemm_maxout_norm
    from dmpfold2_tpu.ops.norm import masked_instance_norm

    rng = np.random.default_rng(22)
    B, L, C, CO, pool = 3, 16, 19, 24, 3
    nres = jnp.asarray([16, 11, 5], jnp.int32)
    mask = ((jnp.arange(L)[None, :, None] < nres[:, None, None])
            & (jnp.arange(L)[None, None, :] < nres[:, None, None]))
    mask = mask[..., None].astype(jnp.float32)
    x = (jnp.asarray(rng.normal(size=(B, L, L, C)), jnp.float32) * mask)
    w = jnp.asarray(rng.normal(size=(1, 1, C, CO)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(CO,)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(CO // pool,)) * 0.5 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(CO // pool,)) * 0.3, jnp.float32)

    out = gemm_maxout_norm(x.astype(jnp.bfloat16), w, b, gamma, beta, pool,
                           nres, mask, interpret=True)
    conv = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    ) + b.astype(jnp.bfloat16)
    mx = conv.reshape(B, L, L, CO // pool, pool).max(-1)
    ref = masked_instance_norm(mx, gamma, beta, mask)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.1)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32) * (1 - np.asarray(mask[..., 0]))[..., None],
        0.0)


def test_gemm_maxout_in_trunk_interpret(monkeypatch):
    """The trunk input layer's fused_conv="norm" route through gemm_maxout
    must agree with the unfused masked maxout2d path."""
    import dmpfold2_tpu.kernels.conv_block as cb
    from dmpfold2_tpu.models import trunk as T

    orig = cb.gemm_maxout_norm
    monkeypatch.setattr(
        cb, "gemm_maxout_norm",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    rng = np.random.default_rng(23)
    # group must be 128-aligned for the production gate: use 128*3 out
    params = T.maxout_params(jax.random.PRNGKey(0), 19, 128, pool=3, ksize=1)
    nres = jnp.asarray([14, 9], jnp.int32)
    L = 16
    mask = ((jnp.arange(L)[None, :, None] < nres[:, None, None])
            & (jnp.arange(L)[None, None, :] < nres[:, None, None]))
    mask = mask[..., None].astype(jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, L, L, 19)), jnp.float32) * mask
    ref = T.maxout2d(params, x, pool=3, mask=mask,
                     compute_dtype=jnp.bfloat16)
    out = T.maxout2d(params, x, pool=3, mask=mask,
                     compute_dtype=jnp.bfloat16, fused_conv="norm")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.1)


def test_fused_conv_layout_selection():
    """Layout policy: full-row bands whenever one fits VMEM (the measured
    93-95%-of-peak configuration at every bucket <= ~870 cols), column
    panels past the wall — so fused_fits no longer rejects long rows
    (round-4 verdict item 1; the 896-1536 buckets used to drop to the
    ~51%-of-peak XLA conv)."""
    from dmpfold2_tpu.kernels.conv_block import _layout, _pick_band, fused_fits

    for l in (96, 736, 896, 960, 1024, 1536):
        assert fused_fits(l), l
    assert fused_fits(896, with_argmax=True)  # diff path banks argmax too
    # lane-tiling alignment: Mosaic rejects c_in (or c_out/pool) that is
    # not a multiple of 128 — a width-32 experiment model crashed the
    # round-4 hardware training run before this gate existed
    assert not fused_fits(96, c_out=128, c_in=32, pool=4)
    assert not fused_fits(96, c_out=256, c_in=64, pool=4)
    assert not fused_fits(96, c_out=256, c_in=128, pool=4)  # group 64
    assert fused_fits(96, c_out=512, c_in=256, pool=4)  # aligned + fits

    # the single-panel budget still reports the wall; _layout tiles past it
    assert _pick_band(1536, 512, 128, 4, False) == 0
    t, n_win, n_panels, panel_w = _layout(1540, 1536, 512, 128, 4, False)
    assert n_panels > 1 and panel_w % 8 == 0
    assert (n_panels - 1) * panel_w < 1536 <= n_panels * panel_w
    assert 1540 % t == 0
    # the budget must actually hold for the chosen panel layout
    assert _pick_band(1536, 512, 128, 4, False, n_win, panel_w) >= t
    # short rows keep the exact rounds-1-4 single-panel layout
    assert _layout(48 * 260, 256, 512, 128, 4, False)[2] == 1

    from dmpfold2_tpu.models.trunk import _fused_fits

    # ShapeDtypeStructs: the gate only reads static shapes — no need to
    # allocate a 576 MB zeros array to test it
    p = {"w": jax.ShapeDtypeStruct((5, 5, 128, 512), jnp.float32),
         "b": jax.ShapeDtypeStruct((512,), jnp.float32)}
    x = jax.ShapeDtypeStruct((1, 1536, 1536, 128), jnp.bfloat16)
    assert _fused_fits(p, x)  # long rows now run fused (column-tiled)
    assert _fused_fits(p, jax.ShapeDtypeStruct((1, 96, 96, 128), jnp.bfloat16))
    assert not _fused_fits(
        {"w": jax.ShapeDtypeStruct((5, 5, 32, 128), jnp.float32),
         "b": jax.ShapeDtypeStruct((128,), jnp.float32)},
        jax.ShapeDtypeStruct((1, 96, 96, 32), jnp.bfloat16))


def test_fused_conv_column_panels_match_single_panel():
    """Column-tiled layouts (forced at a small shape) must reproduce the
    single-panel kernel bit-for-bit, including the halo columns at panel
    seams and the alignment overhang of the last panel."""
    from dmpfold2_tpu.kernels.conv_block import conv5x5_maxout

    rng = np.random.default_rng(11)
    B, L, C, CO = 2, 20, 8, 32
    x = jnp.asarray(rng.normal(size=(B, L, L, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 5, C, CO)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(CO,)), jnp.float32)
    ref = conv5x5_maxout(x, w, b, interpret=True)
    for layout in ((4, 1, 2, 16), (2, 2, 3, 8), (6, 1, 2, 16)):
        out = conv5x5_maxout(x, w, b, interpret=True, force_layout=layout)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(ref, np.float32))


def test_fused_conv_column_panels_stats_and_argmax():
    """The stats (inference fused-norm) and argmax (training VJP) variants
    must agree across panelings too: per-target masked sums see global
    column indices, argmax routes identically."""
    from dmpfold2_tpu.kernels.conv_block import conv5x5_maxout

    rng = np.random.default_rng(12)
    B, L, C, CO = 2, 20, 8, 32
    nres = jnp.asarray([20, 13], jnp.int32)
    x = jnp.asarray(rng.normal(size=(B, L, L, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 5, C, CO)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(CO,)), jnp.float32)

    o_ref, s_ref, ss_ref = conv5x5_maxout(x, w, b, 4, nres, interpret=True,
                                          with_stats=True)
    # stats layouts need t_rows | stride (= 24)
    o, s, ss = conv5x5_maxout(x, w, b, 4, nres, interpret=True,
                              with_stats=True, force_layout=(4, 1, 2, 16))
    np.testing.assert_array_equal(np.asarray(o, np.float32),
                                  np.asarray(o_ref, np.float32))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_ref),
                               rtol=1e-6, atol=1e-4)

    o_ref, i_ref = conv5x5_maxout(x, w, b, 4, interpret=True,
                                  with_argmax=True)
    o, idx = conv5x5_maxout(x, w, b, 4, interpret=True, with_argmax=True,
                            force_layout=(4, 1, 2, 16))
    np.testing.assert_array_equal(np.asarray(o, np.float32),
                                  np.asarray(o_ref, np.float32))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(i_ref))
