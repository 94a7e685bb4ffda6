"""GRU scan parity vs torch.nn.GRU (the reference's cuDNN building block)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from dmpfold2_tpu.models import gru


def torch_gru_to_params(tg: torch.nn.GRU):
    """Convert a torch GRU's state to our per-layer param pytrees."""
    layers = []
    for layer_idx in range(tg.num_layers):
        def one(dir_suffix):
            wi = getattr(tg, f"weight_ih_l{layer_idx}{dir_suffix}").detach().numpy().T
            wh = getattr(tg, f"weight_hh_l{layer_idx}{dir_suffix}").detach().numpy().T
            bi = getattr(tg, f"bias_ih_l{layer_idx}{dir_suffix}").detach().numpy()
            bh = getattr(tg, f"bias_hh_l{layer_idx}{dir_suffix}").detach().numpy()
            return {"wi": jnp.asarray(wi), "wh": jnp.asarray(wh),
                    "bi": jnp.asarray(bi), "bh": jnp.asarray(bh)}

        if tg.bidirectional:
            layers.append({"fwd": one(""), "bwd": one("_reverse")})
        else:
            layers.append(one(""))
    return layers


@pytest.mark.parametrize("num_layers", [1, 2])
def test_unidirectional_final_state(num_layers):
    torch.manual_seed(0)
    T, B, C, H = 11, 5, 7, 13
    tg = torch.nn.GRU(C, H, num_layers=num_layers, bidirectional=False).eval()
    x = torch.randn(T, B, C)
    with torch.no_grad():
        out, _ = tg(x)
    layers = torch_gru_to_params(tg)
    final = gru.unigru_stack_final(layers, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(final), out[-1].numpy(), atol=2e-6)


@pytest.mark.parametrize("num_layers", [1, 3])
def test_bidirectional_outputs(num_layers):
    torch.manual_seed(1)
    T, B, C, H = 9, 4, 6, 8
    tg = torch.nn.GRU(C, H, num_layers=num_layers, bidirectional=True).eval()
    x = torch.randn(T, B, C)
    with torch.no_grad():
        out, _ = tg(x)
    layers = torch_gru_to_params(tg)
    ours = gru.bigru_stack(layers, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), out.numpy(), atol=2e-6)


def test_masked_scan_equals_truncated():
    """Padded scan with valid_len must equal scanning the unpadded input."""
    torch.manual_seed(2)
    T, Tpad, B, C, H = 10, 16, 3, 5, 6
    tg = torch.nn.GRU(C, H, num_layers=2, bidirectional=True).eval()
    x = torch.randn(T, B, C)
    layers = torch_gru_to_params(tg)

    base = gru.bigru_stack(layers, jnp.asarray(x.numpy()))
    xpad = np.zeros((Tpad, B, C), np.float32)
    xpad[:T] = x.numpy()
    padded = gru.bigru_stack(layers, jnp.asarray(xpad), valid_len=T)
    np.testing.assert_allclose(np.asarray(padded)[:T], np.asarray(base), atol=1e-6)


def test_masked_final_state_equals_truncated():
    torch.manual_seed(3)
    T, Tpad, B, C, H = 12, 20, 4, 5, 6
    tg = torch.nn.GRU(C, H, num_layers=2, bidirectional=False).eval()
    x = torch.randn(T, B, C)
    layers = torch_gru_to_params(tg)

    base = gru.unigru_stack_final(layers, jnp.asarray(x.numpy()))
    xpad = np.zeros((Tpad, B, C), np.float32)
    xpad[:T] = x.numpy()
    padded = gru.unigru_stack_final(layers, jnp.asarray(xpad), valid_len=T)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base), atol=1e-6)


def test_unigru_remat_chunk_matches_unchunked():
    """Chunked-remat vgru scan: identical final state and gradients to the
    plain scan (including a chunk-straddling valid_len and row padding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dmpfold2_tpu.models import gru

    key = jax.random.PRNGKey(0)
    layers = gru.unigru_stack_params(key, 2, 22, 32)
    rng = np.random.default_rng(0)
    t, b = 21, 6  # not a multiple of the chunk -> exercises padding
    x = jnp.asarray(rng.normal(size=(t, b, 22)), jnp.float32)
    for valid in (t, 13):  # full and mid-chunk freeze
        def plain(ls):
            return jnp.sum(gru.unigru_stack_final(ls, x, valid_len=valid) ** 2)

        def chunked(ls):
            return jnp.sum(gru.unigru_stack_final(
                ls, x, valid_len=valid, remat_chunk=8) ** 2)

        vp, gp = jax.value_and_grad(plain)(layers)
        vc, gc = jax.value_and_grad(chunked)(layers)
        np.testing.assert_allclose(float(vc), float(vp), rtol=1e-6)
        for a, c in zip(jax.tree.leaves(gp), jax.tree.leaves(gc)):
            np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                       atol=1e-6, err_msg=f"valid={valid}")
