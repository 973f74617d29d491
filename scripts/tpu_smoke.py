"""Real-TPU smoke + microbenchmark for the Pallas kernels.

Runs each kernel compiled (not interpreted) on the attached chip, checks
parity vs the XLA ops, and times both. Not part of pytest (tests force the
CPU backend); run manually or from the bench harness.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters * 1e6  # us


def main():
    from pytorchrec_tpu.ops.interactions import cross_layer_v2, fm_interaction
    from pytorchrec_tpu.ops.kernels.cross import cross_network_pallas
    from pytorchrec_tpu.ops.kernels.fm import fm_interaction_pallas

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    # FM: Criteo-like 26 fields x 16 dims
    v = jnp.asarray(rng.normal(size=(8192, 26, 16)), jnp.float32)
    xla_fm = jax.jit(fm_interaction)
    pl_fm = jax.jit(lambda v: fm_interaction_pallas(v, block_b=256))
    np.testing.assert_allclose(np.asarray(pl_fm(v)), np.asarray(xla_fm(v)),
                               rtol=1e-4, atol=1e-4)
    print(f"fm:    xla {timeit(xla_fm, v):8.1f}us   pallas {timeit(pl_fm, v):8.1f}us")

    # Cross: D=429 (26*16+13), 3 layers
    d = 26 * 16 + 13
    x0 = jnp.asarray(rng.normal(size=(8192, d)), jnp.float32)
    ws = jnp.asarray(rng.normal(size=(3, d, d)) * 0.05, jnp.float32)
    bs = jnp.asarray(rng.normal(size=(3, d)) * 0.05, jnp.float32)

    def xla_cross(x0, ws, bs):
        xl = x0
        for layer in range(3):
            xl = cross_layer_v2(x0, xl, ws[layer], bs[layer])
        return xl

    jit_xla_cross = jax.jit(xla_cross)
    jit_pl_cross = jax.jit(lambda x0, ws, bs: cross_network_pallas(x0, ws, bs, block_b=512))
    # MXU accumulation-order noise compounds across the 3 chained layers;
    # require 99.99% of elements within tolerance instead of all
    a = np.asarray(jit_pl_cross(x0, ws, bs))
    bref = np.asarray(jit_xla_cross(x0, ws, bs))
    close = np.isclose(a, bref, rtol=1e-2, atol=1e-2)
    assert close.mean() > 0.9999, f"cross mismatch fraction {1 - close.mean():.2e}"
    print(f"cross: xla {timeit(jit_xla_cross, x0, ws, bs):8.1f}us   "
          f"pallas {timeit(jit_pl_cross, x0, ws, bs):8.1f}us")

    # DIN attention pooling
    from pytorchrec_tpu.ops.attention import DINAttentionPool
    from pytorchrec_tpu.ops.kernels.din_attention import din_attention_pool_pallas

    b, s, e, n = 1024, 32, 32, 8
    his = jnp.asarray(rng.normal(size=(b, s, e)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(b, n, e)), jnp.float32)
    valid = jnp.asarray(rng.integers(0, 2, size=(b, s)), jnp.int32).at[:, 0].set(1)
    module = DINAttentionPool(hidden_units=(80, 40), activation="sigmoid",
                              use_pallas=False)
    params = module.init(jax.random.PRNGKey(0), his, tgt, valid)
    p = params["params"]
    mlp = []
    for i in range(3):
        mlp += [p[f"w{i}"], p[f"b{i}"]]

    xla_din = jax.jit(lambda h, t, m: module.apply(params, h, t, m))
    pl_din = jax.jit(lambda h, t, m: din_attention_pool_pallas(h, t, m, tuple(mlp), block_b=128))
    np.testing.assert_allclose(np.asarray(pl_din(his, tgt, valid)),
                               np.asarray(xla_din(his, tgt, valid)),
                               rtol=1e-2, atol=1e-2)
    print(f"din:   xla {timeit(xla_din, his, tgt, valid):8.1f}us   "
          f"pallas {timeit(pl_din, his, tgt, valid):8.1f}us")
    print("tpu kernel smoke OK")


if __name__ == "__main__":
    main()
