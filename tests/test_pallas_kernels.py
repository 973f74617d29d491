"""Pallas kernel parity tests (interpret mode on CPU) against the XLA ops.

On real TPU hardware the same kernels compile natively; scripts/tpu_smoke.py
exercises that path on the one available chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchrec_tpu.ops.interactions import fm_interaction, cross_layer_v2
from pytorchrec_tpu.ops.kernels.cross import cross_network_pallas
from pytorchrec_tpu.ops.kernels.fm import fm_interaction_pallas


def test_fm_kernel_forward_matches_xla():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(100, 26, 16)), jnp.float32)
    ours = fm_interaction_pallas(v, block_b=32, interpret=True)
    ref = fm_interaction(v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fm_kernel_gradient_matches_xla():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(64, 8, 4)), jnp.float32)
    g1 = jax.grad(lambda v: jnp.sum(fm_interaction_pallas(v, block_b=32, interpret=True) ** 2))(v)
    g2 = jax.grad(lambda v: jnp.sum(fm_interaction(v) ** 2))(v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def _xla_cross(x0, ws, bs):
    xl = x0
    for layer in range(ws.shape[0]):
        xl = cross_layer_v2(x0, xl, ws[layer], bs[layer])
    return xl


def test_cross_kernel_forward_matches_xla():
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(70, 48)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(3, 48, 48)) * 0.1, jnp.float32)
    bs = jnp.asarray(rng.normal(size=(3, 48)) * 0.1, jnp.float32)
    ours = cross_network_pallas(x0, ws, bs, block_b=32, interpret=True)
    ref = _xla_cross(x0, ws, bs)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_cross_kernel_gradients_match_xla():
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(40, 16)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(2, 16, 16)) * 0.2, jnp.float32)
    bs = jnp.asarray(rng.normal(size=(2, 16)) * 0.2, jnp.float32)

    def loss_pallas(x0, ws, bs):
        return jnp.sum(cross_network_pallas(x0, ws, bs, block_b=32, interpret=True) ** 2)

    def loss_xla(x0, ws, bs):
        return jnp.sum(_xla_cross(x0, ws, bs) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x0, ws, bs)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x0, ws, bs)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_din_kernel_matches_xla_module():
    from pytorchrec_tpu.ops.attention import DINAttentionPool
    from pytorchrec_tpu.ops.kernels.din_attention import din_attention_pool_pallas

    rng = np.random.default_rng(4)
    b, s, e, n = 10, 6, 8, 3
    his = jnp.asarray(rng.normal(size=(b, s, e)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(b, n, e)), jnp.float32)
    valid = jnp.asarray(rng.integers(0, 2, size=(b, s)), jnp.int32).at[:, 0].set(1)

    module = DINAttentionPool(hidden_units=(16, 8), activation="sigmoid",
                              use_pallas=False)
    params = module.init(jax.random.PRNGKey(0), his, tgt, valid)
    ref = module.apply(params, his, tgt, valid)

    # the module owns explicit w{i}/b{i} params shared by both backends
    p = params["params"]
    mlp = []
    for i in range(3):
        mlp += [p[f"w{i}"], p[f"b{i}"]]
    ours = din_attention_pool_pallas(his, tgt, valid, tuple(mlp), block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_din_kernel_single_hidden_layer():
    """Arbitrary-depth MLP support: 1 hidden layer."""
    from pytorchrec_tpu.ops.attention import DINAttentionPool
    from pytorchrec_tpu.ops.kernels.din_attention import din_attention_pool_pallas

    rng = np.random.default_rng(5)
    b, s, e, n = 6, 4, 8, 2
    his = jnp.asarray(rng.normal(size=(b, s, e)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(b, n, e)), jnp.float32)
    valid = jnp.asarray(rng.integers(0, 2, size=(b, s)), jnp.int32).at[:, 0].set(1)
    module = DINAttentionPool(hidden_units=(8,), use_pallas=False)
    params = module.init(jax.random.PRNGKey(1), his, tgt, valid)
    ref = module.apply(params, his, tgt, valid)
    p = params["params"]
    mlp = (p["w0"], p["b0"], p["w1"], p["b1"])
    ours = din_attention_pool_pallas(his, tgt, valid, mlp, block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_din_kernel_gradients_match_xla():
    """custom_vjp: gradients through the fused DIN pool == XLA composite."""
    from pytorchrec_tpu.ops.attention import DINAttentionPool
    from pytorchrec_tpu.ops.kernels.din_attention import din_attention_pool_pallas

    rng = np.random.default_rng(6)
    b, s, e, n = 6, 4, 8, 2
    his = jnp.asarray(rng.normal(size=(b, s, e)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(b, n, e)), jnp.float32)
    valid = jnp.asarray(rng.integers(0, 2, size=(b, s)), jnp.int32).at[:, 0].set(1)
    module = DINAttentionPool(hidden_units=(8,), use_pallas=False)
    params = module.init(jax.random.PRNGKey(1), his, tgt, valid)
    p = params["params"]
    mlp = (p["w0"], p["b0"], p["w1"], p["b1"])

    def loss_pallas(his, tgt, mlp):
        return jnp.sum(
            din_attention_pool_pallas(his, tgt, valid, mlp, block_b=8, interpret=True) ** 2
        )

    def loss_xla(his, tgt, mlp):
        return jnp.sum(module.apply({"params": {
            "w0": mlp[0], "b0": mlp[1], "w1": mlp[2], "b1": mlp[3]
        }}, his, tgt, valid) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(his, tgt, mlp)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(his, tgt, mlp)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_seg_scan_kernel_matches_xla_twin():
    """segmented_sum_scan_pallas == the XLA _segmented_sum_scan, including
    segments LONGER than a block (cross-block carry) and segments crossing
    block boundaries mid-run."""
    from pytorchrec_tpu.ops.kernels.seg_scan import segmented_sum_scan_pallas
    from pytorchrec_tpu.ops.sparse_update import _segmented_sum_scan

    rng = np.random.default_rng(11)
    for n, e, block in ((300, 16, 32), (257, 16, 64), (64, 8, 8)):
        # random segment heads plus one run longer than several blocks
        heads = rng.random(n) < 0.15
        heads[0] = True
        heads[40:40 + min(3 * block, n - 45)] = False  # long run spans blocks
        x = rng.normal(size=(n, e)).astype(np.float32)
        want = _segmented_sum_scan(jnp.asarray(x), jnp.asarray(heads))
        got = segmented_sum_scan_pallas(
            jnp.asarray(x), jnp.asarray(heads), block_rows=block,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_seg_scan_kernel_single_and_all_heads():
    from pytorchrec_tpu.ops.kernels.seg_scan import segmented_sum_scan_pallas

    rng = np.random.default_rng(5)
    x = rng.normal(size=(50, 4)).astype(np.float32)
    # all heads: output == input
    got = segmented_sum_scan_pallas(
        jnp.asarray(x), jnp.ones(50, bool), block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), x, rtol=1e-6)
    # one segment: output == cumsum
    heads = np.zeros(50, bool)
    heads[0] = True
    got = segmented_sum_scan_pallas(
        jnp.asarray(x), jnp.asarray(heads), block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.cumsum(x, axis=0),
                               rtol=1e-4, atol=1e-5)


def _naive_bin_max(q, items, tc, group):
    """Numpy re-derivation of the bin-max contract: per super-chunk of
    tc*group corpus rows, bin l = max over local ids with id % 128 == l,
    ties -> lowest id; corpus-tail pad entries score PAD_SCORE (the
    kernel's pad-flag-column construction)."""
    from pytorchrec_tpu.ops.kernels.retrieval_topk import PAD_SCORE

    scores = (q.astype(np.float32) @ items.astype(np.float32).T)
    b, v = scores.shape
    sup = tc * group
    vp = -(-v // sup) * sup
    pad = np.full((b, vp - v), PAD_SCORE, np.float32)
    s = np.concatenate([scores, pad], axis=1)
    n_super = vp // sup
    s = s.reshape(b, n_super, sup // 128, 128)
    vals = s.max(axis=2)
    arg = s.argmax(axis=2).astype(np.int32)
    lane = np.arange(128, dtype=np.int32)[None, None, :]
    base = (np.arange(n_super, dtype=np.int32) * sup)[None, :, None]
    idx = base + arg * 128 + lane
    return vals.reshape(b, -1), idx.reshape(b, -1)


@pytest.mark.parametrize("v,tc,group", [(1024, 256, 2), (1000, 256, 2),
                                        (700, 256, 4)])
def test_retrieval_bin_max_kernel_matches_naive(v, tc, group):
    """Fused score+bin-max kernel (interpret mode) and its XLA twin both
    reproduce the numpy bin contract, incl. ragged corpus tails (pad rows
    masked to -inf) and ragged query tiles."""
    from pytorchrec_tpu.ops.kernels.retrieval_topk import (
        bin_max_scores_pallas,
        bin_max_scores_xla,
    )

    rng = np.random.default_rng(9)
    q = rng.normal(size=(37, 16)).astype(np.float32)
    items = rng.normal(size=(v, 16)).astype(np.float32)
    want_vals, want_idx = _naive_bin_max(q, items, tc, group)

    for fn in (
        lambda: bin_max_scores_pallas(jnp.asarray(q), jnp.asarray(items),
                                      tb=16, tc=tc, group=group,
                                      interpret=True),
        lambda: bin_max_scores_xla(jnp.asarray(q), jnp.asarray(items),
                                   tc=tc, group=group),
    ):
        vals, idx = fn()
        # chunked-vs-full matmul accumulation order: ~1e-7 absolute noise
        np.testing.assert_allclose(np.asarray(vals), want_vals,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)


def test_retrieval_fused_topk_high_recall():
    """make_retrieve_fn(approx='fused') (XLA twin on CPU): returned ids'
    scores are exact, recall vs exact top-k is high on random scores."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_two_tower import _make_model
    from pytorchrec_tpu.serving.retrieval import (
        build_item_index,
        make_retrieve_fn,
    )

    model = _make_model(n_items=800, normalize=False)
    batch = {"uid": jnp.arange(8), "iid": jnp.zeros((8,), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), batch, False)
    index = build_item_index(model, params, num_items=800, batch_size=128,
                             dtype=jnp.float32)
    exact = make_retrieve_fn(model, chunk_items=256)
    fused = make_retrieve_fn(model, approx="fused")
    s1, i1 = exact(params, index, jnp.arange(8), k=10)
    s2, i2 = fused(params, index, jnp.arange(8), k=10)
    u_vec = np.asarray(model.apply(params, jnp.arange(8),
                                   method=model.user_vectors))
    full = u_vec @ np.asarray(index).T
    np.testing.assert_allclose(
        np.asarray(s2), np.take_along_axis(full, np.asarray(i2), axis=1),
        rtol=1e-4)
    recall = np.mean([np.isin(np.asarray(i2)[b], np.asarray(i1)[b]).mean()
                      for b in range(8)])
    assert recall >= 0.8, recall
