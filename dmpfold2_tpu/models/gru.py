"""GRU layers as XLA scans, numerically equivalent to torch.nn.GRU.

The reference model leans on three cuDNN GRUs (reference: dmpfold/network.py:189-190,
213): a 2-layer unidirectional GRU scanned over MSA *rows* ("vgru"), a 2-layer
bidirectional GRU over residues ("hgru") and a 3-layer bidirectional GRU over
residues ("coord_gru"). Here each layer is a `lax.scan` whose per-step work is
only the recurrent half: the input projection ``x @ W_i + b_i`` for the whole
sequence is hoisted out of the scan into one large MXU matmul.

Gate conventions match PyTorch exactly (gate order r, z, n along the stacked
3H axis; ``h' = (1-z)*n + z*h`` with ``n = tanh(x_n + b_in + r*(h W_hn + b_hn))``),
so converted `weight_ih_l{k}`/`weight_hh_l{k}` checkpoints reproduce cuDNN
outputs bit-for-bit in fp32.

Masking: sequences are right-padded to a bucket length. For a forward scan the
hidden state is *frozen* once ``t >= valid_len`` (so the "final" state equals
the state at the true end); for a reverse scan the hidden state is held at
zero while ``t >= valid_len`` (so the first valid step sees a fresh zero
state, exactly as an unpadded reverse scan would). With full-length input the
masked scans are bit-identical to unmasked ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gru_layer_params(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    """Initialize one GRU layer-direction (torch default: U(-1/sqrt(H), 1/sqrt(H)))."""
    k = 1.0 / jnp.sqrt(jnp.asarray(hidden_size, jnp.float32))
    keys = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return {
        "wi": u(keys[0], (input_size, 3 * hidden_size)),
        "wh": u(keys[1], (hidden_size, 3 * hidden_size)),
        "bi": u(keys[2], (3 * hidden_size,)),
        "bh": u(keys[3], (3 * hidden_size,)),
    }


def _keep_mask(t, valid_len):
    """t < valid_len, broadcastable over a (B, H) state.

    ``valid_len`` may be a scalar (one sequence) or a (B,) vector of
    per-batch-column lengths (natively-batched mode).
    """
    valid_len = jnp.asarray(valid_len)
    keep = t < valid_len
    if keep.ndim:
        keep = keep[:, None]
    return keep


def _gates(xproj, hproj, h, hidden_size: int):
    r = jax.nn.sigmoid(xproj[..., :hidden_size] + hproj[..., :hidden_size])
    z = jax.nn.sigmoid(
        xproj[..., hidden_size : 2 * hidden_size] + hproj[..., hidden_size : 2 * hidden_size]
    )
    n = jnp.tanh(xproj[..., 2 * hidden_size :] + r * hproj[..., 2 * hidden_size :])
    return (1.0 - z) * n + z * h


def gru_scan(params, x, *, reverse: bool = False, valid_len=None):
    """Scan one GRU layer-direction over ``x``: (T, B, C) -> (T, B, H).

    ``valid_len``: true sequence length (scalar, may be traced). See module
    docstring for forward-freeze / reverse-zero masking semantics.
    """
    seq_len, batch, _ = x.shape
    hidden_size = params["wh"].shape[0]
    xproj = jnp.einsum("tbc,ch->tbh", x, params["wi"]) + params["bi"]

    t_idx = jnp.arange(seq_len)
    h0 = jnp.zeros((batch, hidden_size), x.dtype)

    def step(h, inp):
        t, xp = inp
        h_new = _gates(xp, h @ params["wh"] + params["bh"], h, hidden_size)
        if valid_len is not None:
            keep = _keep_mask(t, valid_len)
            if reverse:
                h_new = jnp.where(keep, h_new, jnp.zeros_like(h_new))
            else:
                h_new = jnp.where(keep, h_new, h)
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, (t_idx, xproj), reverse=reverse)
    return ys


def bigru_layer(params_fwd, params_bwd, x, valid_len=None):
    """Bidirectional layer: concat forward and reverse outputs -> (T, B, 2H)."""
    out_f = gru_scan(params_fwd, x, reverse=False, valid_len=valid_len)
    out_b = gru_scan(params_bwd, x, reverse=True, valid_len=valid_len)
    return jnp.concatenate([out_f, out_b], axis=-1)


def bigru_stack_params(key, num_layers: int, input_size: int, hidden_size: int):
    keys = jax.random.split(key, num_layers * 2)
    layers = []
    for layer_idx in range(num_layers):
        in_size = input_size if layer_idx == 0 else 2 * hidden_size
        layers.append(
            {
                "fwd": gru_layer_params(keys[2 * layer_idx], in_size, hidden_size),
                "bwd": gru_layer_params(keys[2 * layer_idx + 1], in_size, hidden_size),
            }
        )
    return layers


def bigru_stack(layers, x, valid_len=None, *, dropout_rate: float = 0.0, rng=None):
    """Multi-layer bidirectional GRU with optional inter-layer dropout.

    Dropout (torch semantics: applied to every layer's output except the
    last) is only active when ``rng`` is provided.
    """
    out = x
    for layer_idx, layer in enumerate(layers):
        out = bigru_layer(layer["fwd"], layer["bwd"], out, valid_len)
        if dropout_rate > 0.0 and rng is not None and layer_idx < len(layers) - 1:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)
    return out


def _unigru_step(layers, hidden, valid_len, hoisted: bool):
    """Per-row update for the fused multi-layer unidirectional stack."""

    def step(hs, inp):
        t, x_t = inp
        new_hs = []
        layer_in = None
        for layer_idx, p in enumerate(layers):
            h = hs[layer_idx]
            if layer_idx == 0:
                xp = x_t if hoisted else x_t @ p["wi"] + p["bi"]
            else:
                xp = layer_in @ p["wi"] + p["bi"]
            h_new = _gates(xp, h @ p["wh"] + p["bh"], h, hidden)
            if valid_len is not None:
                h_new = jnp.where(_keep_mask(t, valid_len), h_new, h)
            new_hs.append(h_new)
            layer_in = h_new
        return tuple(new_hs), None

    return step


def unigru_stack_final(layers, x, valid_len=None, remat_chunk: int = 0):
    """Fused multi-layer unidirectional GRU returning only the FINAL hidden
    state of the last layer: (T, B, C) -> (B, H).

    This is the vertical MSA reduction (reference: dmpfold/network.py:224-225
    takes ``vgru(x)[0][-1]``). Fusing the layers into one scan avoids
    materializing the (T, B, H) intermediate sequence — for a 3000-row MSA at
    L=350 that's ~2 GB it never allocates. Layer 0's input projection is
    still hoisted into one big matmul; deeper layers project their (B, H)
    input per step (an MXU matmul batched over residue positions).

    ``remat_chunk`` (training): checkpoint the scan in row-chunks of this
    size — reverse-mode residuals shrink from O(T·B·H) (which OOMs a 16 GB
    chip at the dataset's own 852-row cap, crop 350) to one chunk's worth
    plus the chunk-boundary carries, for one extra forward recompute of
    each chunk during backward.
    """
    seq_len, batch, in_dim = x.shape
    hidden = layers[0]["wh"].shape[0]
    h0 = tuple(jnp.zeros((batch, hidden), x.dtype) for _ in layers)

    if remat_chunk and seq_len > remat_chunk:
        pad = (-seq_len) % remat_chunk
        if valid_len is None:
            valid_len = seq_len  # freeze the state over padded rows
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        n_chunks = (seq_len + pad) // remat_chunk
        xs_r = x.reshape(n_chunks, remat_chunk, batch, in_dim)
        t_r = jnp.arange(n_chunks * remat_chunk).reshape(n_chunks, remat_chunk)

        @jax.checkpoint
        def seg(hs, inp):
            ts, xc = inp
            # hoist layer 0's projection per chunk (recomputed in backward,
            # never held as a residual)
            xpc = jnp.einsum("tbc,ch->tbh", xc, layers[0]["wi"]) + layers[0]["bi"]
            hs, _ = jax.lax.scan(
                _unigru_step(layers, hidden, valid_len, hoisted=True),
                hs, (ts, xpc))
            return hs, None

        hs, _ = jax.lax.scan(seg, h0, (t_r, xs_r))
        return hs[-1]

    # hoist layer 0's input projection only when the (T, B, 3H) result is
    # small enough to materialize (it is 14 GB at the long-target stress
    # shape); otherwise project per-step inside the scan
    hoist = seq_len * batch * 3 * hidden <= 2 ** 27
    if hoist:
        xs = jnp.einsum("tbc,ch->tbh", x, layers[0]["wi"]) + layers[0]["bi"]
    else:
        xs = x
    t_idx = jnp.arange(seq_len)
    hs, _ = jax.lax.scan(
        _unigru_step(layers, hidden, valid_len, hoisted=hoist),
        h0, (t_idx, xs))
    return hs[-1]


def unigru_stack_params(key, num_layers: int, input_size: int, hidden_size: int):
    keys = jax.random.split(key, num_layers)
    layers = []
    for layer_idx in range(num_layers):
        in_size = input_size if layer_idx == 0 else hidden_size
        layers.append(gru_layer_params(keys[layer_idx], in_size, hidden_size))
    return layers
