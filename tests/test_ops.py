"""Ops unit tests: masked GRU vs torch pack_padded reference, attention vs the
reference formula, FM identity vs brute force, DCN cross layer, seq utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorchrec_tpu.ops import (
    MaskedGRU,
    fm_interaction,
    get_position_ids,
    get_valid_his_index,
    scaled_dot_product_attention,
)
from pytorchrec_tpu.ops.interactions import cross_layer_v2, fm_interaction_vector


class TestMaskedGRU:
    def test_matches_torch_pack_padded(self):
        """Bit-level semantic parity with the reference's
        sort->pack_padded_sequence->GRU->take-hidden idiom (GRU4Rec.py:51-61)."""
        import torch

        batch, seq, emb, hidden = 5, 7, 6, 4
        rng = np.random.default_rng(0)
        x = rng.normal(size=(batch, seq, emb)).astype(np.float32)
        lengths = np.array([7, 3, 1, 5, 2], dtype=np.int32)

        torch_gru = torch.nn.GRU(input_size=emb, hidden_size=hidden, batch_first=True)
        with torch.no_grad():
            # reference idiom: sort by length desc, pack, run, unsort
            sort_idx = np.argsort(-lengths, kind="stable")
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                torch.tensor(x[sort_idx]), torch.tensor(lengths[sort_idx]), batch_first=True
            )
            _, h = torch_gru(packed, None)
            unsort = np.argsort(sort_idx, kind="stable")
            want = h[-1].numpy()[unsort]

        gru = MaskedGRU(hidden_size=hidden)
        params = gru.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths))
        # copy torch weights: torch [3H, E] row-blocks (r|z|n) -> ours [E, 3H]
        sd = torch_gru.state_dict()
        params = {
            "params": {
                "w_ih": jnp.asarray(sd["weight_ih_l0"].numpy().T),
                "w_hh": jnp.asarray(sd["weight_hh_l0"].numpy().T),
                "b_ih": jnp.asarray(sd["bias_ih_l0"].numpy()),
                "b_hh": jnp.asarray(sd["bias_hh_l0"].numpy()),
            }
        }
        got = np.asarray(gru.apply(params, jnp.asarray(x), jnp.asarray(lengths)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_jit_and_grad(self):
        gru = MaskedGRU(hidden_size=8)
        x = jnp.ones((2, 5, 3))
        lengths = jnp.array([5, 2])
        params = gru.init(jax.random.PRNGKey(1), x, lengths)

        @jax.jit
        def loss(p):
            return jnp.sum(gru.apply(p, x, lengths) ** 2)

        grads = jax.grad(loss)(params)
        assert jnp.isfinite(loss(params))
        flat, _ = jax.tree_util.tree_flatten(grads)
        assert all(jnp.all(jnp.isfinite(g)) for g in flat)


class TestAttention:
    def test_matches_reference_formula(self):
        """Numpy re-derivation of SASRec.py:14-31 (bmm, scale, max-subtract,
        masked_fill(-inf), softmax, bmm)."""
        rng = np.random.default_rng(2)
        q = rng.normal(size=(3, 4, 5)).astype(np.float32)
        k = rng.normal(size=(3, 6, 5)).astype(np.float32)
        v = rng.normal(size=(3, 6, 5)).astype(np.float32)
        mask = (rng.random((3, 4, 6)) > 0.7).astype(np.float32)
        mask[:, :, 0] = 0  # keep at least one unmasked key
        scale = 5 ** -0.5

        att = np.einsum("bqd,bkd->bqk", q, k) * scale
        att = att - att.max()
        att = np.where(mask.astype(bool), -np.inf, att)
        att = np.exp(att - att.max(axis=-1, keepdims=True))
        att = att / att.sum(axis=-1, keepdims=True)
        want = np.einsum("bqk,bkd->bqd", att, v)

        got = np.asarray(scaled_dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
            attn_mask=jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestInteractions:
    def test_fm_identity_vs_bruteforce(self):
        rng = np.random.default_rng(3)
        v = rng.normal(size=(10, 7, 4)).astype(np.float32)
        want = np.zeros(10, dtype=np.float64)
        for i in range(7):
            for j in range(i + 1, 7):
                want += np.sum(v[:, i] * v[:, j], axis=-1)
        got = np.asarray(fm_interaction(jnp.asarray(v)))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_fm_vector_sums_to_scalar(self):
        rng = np.random.default_rng(4)
        v = jnp.asarray(rng.normal(size=(6, 5, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(jnp.sum(fm_interaction_vector(v), axis=-1)),
            np.asarray(fm_interaction(v)),
            rtol=1e-5,
        )

    def test_cross_layer(self):
        rng = np.random.default_rng(5)
        x0 = rng.normal(size=(4, 8)).astype(np.float32)
        xl = rng.normal(size=(4, 8)).astype(np.float32)
        w = rng.normal(size=(8, 8)).astype(np.float32)
        b = rng.normal(size=(8,)).astype(np.float32)
        got = np.asarray(cross_layer_v2(jnp.asarray(x0), jnp.asarray(xl), jnp.asarray(w), jnp.asarray(b)))
        want = x0 * (xl @ w + b) + xl
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestSeqUtils:
    def test_valid_his_index_forces_first(self):
        his = jnp.array([[0, 0, 3], [1, 2, 0]])
        got = np.asarray(get_valid_his_index(his))
        np.testing.assert_array_equal(got, [[1, 0, 1], [1, 1, 0]])

    def test_position_ids_reference_example(self):
        # reference docstring example (SASRec.py:90-92)
        lengths = jnp.array([4, 2, 5])
        valid = jnp.array([[1, 1, 1, 1, 0], [1, 1, 0, 0, 0], [1, 1, 1, 1, 1]])
        got = np.asarray(get_position_ids(valid, lengths))
        np.testing.assert_array_equal(
            got, [[4, 3, 2, 1, 0], [2, 1, 0, 0, 0], [5, 4, 3, 2, 1]]
        )


def test_cross_network_zero_layers_identity():
    """num_cross_layers=0 must be the identity, not a crash (the fused
    kernel cannot take a [0, D, D] weight stack)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorchrec_tpu.ops.interactions import CrossNetworkV2

    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)), jnp.float32)
    net = CrossNetworkV2(num_layers=0)
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
