"""SASRec forward parity vs a torch twin of the reference equations.

Builds the reference's computation (SASRec.py:14-31 scaled dot-product
attention with global max-subtraction and -inf masking; 96-110 block =
self-attn -> W1/relu/W2 -> residual -> LayerNorm, then mean-pool valid
steps) in torch, copies OUR flax weights into it, and checks the encoder
outputs agree — evidence that the jax re-design preserves the reference
semantics bit-for-bit (up to float tolerance), including the quirks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pytorchrec_tpu.ops.attention import SASRecBlock, sasrec_encoder
from pytorchrec_tpu.ops.seq_utils import get_valid_his_index


def torch_reference_block(x, valid, weights):
    """One reference SASRec block in torch (same math as SASRec.py:96-107)."""
    q = x @ weights["Q"]  # [B, L, E]
    k = x @ weights["K"]
    scale = x.shape[-1] ** -0.5
    attention = torch.einsum("bqd,bkd->bqk", q, k) * scale
    attention = attention - attention.max()
    mask = (1 - valid)[:, None, :].bool()  # key position invalid
    attention = attention.masked_fill(mask, float("-inf"))
    attention = torch.softmax(attention, dim=-1)
    context = torch.einsum("bqk,bkd->bqd", attention, k)
    h = torch.relu(context @ weights["W1_k"] + weights["W1_b"])
    h = h @ weights["W2_k"] + weights["W2_b"]
    out = x + h  # no dropout at eval
    return torch.nn.functional.layer_norm(
        out, (out.shape[-1],), weights["ln_scale"], weights["ln_bias"]
    )


def test_sasrec_encoder_matches_torch_reference():
    rng = np.random.default_rng(0)
    batch, seq, emb = 6, 7, 16
    x = rng.normal(size=(batch, seq, emb)).astype(np.float32)
    his_len = rng.integers(1, seq + 1, size=batch).astype(np.int32)
    positions = np.arange(seq)[None, :]
    valid = (positions < his_len[:, None]).astype(np.int32)
    valid = np.asarray(get_valid_his_index(jnp.asarray(valid)))

    block = SASRecBlock(emb_size=emb, dropout=0.0)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x), 1 - jnp.asarray(valid)[:, None, :].repeat(seq, axis=1))
    ours = sasrec_encoder(
        jnp.asarray(x), jnp.asarray(valid), jnp.asarray(his_len),
        # bind the initialized params onto a single-block encoder
        [lambda h, m, train=False: block.apply(params, h, m, train=train)],
    )

    p = params["params"]
    weights = {
        "Q": torch.tensor(np.asarray(p["Q"]["kernel"])),
        "K": torch.tensor(np.asarray(p["K"]["kernel"])),
        "W1_k": torch.tensor(np.asarray(p["W1"]["kernel"])),
        "W1_b": torch.tensor(np.asarray(p["W1"]["bias"])),
        "W2_k": torch.tensor(np.asarray(p["W2"]["kernel"])),
        "W2_b": torch.tensor(np.asarray(p["W2"]["bias"])),
        "ln_scale": torch.tensor(np.asarray(p["LayerNorm_0"]["scale"])),
        "ln_bias": torch.tensor(np.asarray(p["LayerNorm_0"]["bias"])),
    }
    tx = torch.tensor(x)
    tvalid = torch.tensor(valid.astype(np.float32))
    with torch.no_grad():
        ref = torch_reference_block(tx, tvalid, weights)
        pooled = (ref * tvalid[..., None]).sum(dim=1) / torch.tensor(
            his_len.astype(np.float32)
        )[:, None]

    np.testing.assert_allclose(
        np.asarray(ours), pooled.numpy(), rtol=2e-4, atol=2e-5
    )
