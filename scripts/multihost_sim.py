"""Multi-host simulation: N python processes, jax.distributed over localhost.

The TPU answer to "test multi-node without a cluster" (SURVEY §4): every
process runs ``jax.distributed.initialize`` against a local coordinator with
CPU devices, they form ONE global mesh, and a data-parallel FunkSVD train
step runs with per-host batch shards — XLA's psum crosses the (simulated)
hosts. The script checks that all hosts agree on the resulting params.

With ``--engine`` (or env ``_MULTIHOST_ENGINE=1``) the drill additionally
runs the EXPLICIT sharded-embedding engine across the process boundary
(VERDICT r3 #3 — shard_map + jax.distributed is where collective-layout
bugs surface): 2 processes x 4 CPU devices form a (data=4, model=2) mesh
and ``ShardedSparseEmbeddingTrainer`` takes 3 fit steps in three
configurations — (a) grid + two_hop + bounded capacity, packed; (b)
hot/cold placement, packed; (c) quantized int8 packed byte rows (1d) —
each checked numerically against the single-process single-device twin
trainer run on the same batches.

Usage:  python scripts/multihost_sim.py [num_processes] [--engine]
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = 12355


def _engine_drill(process_id: int, num_processes: int) -> None:
    """Explicit sharded engine across real process boundaries: every config
    must match its single-process twin's table numerics (digests compared
    with a reassociation tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.parallel import DATA_AXIS, make_mesh
    from pytorchrec_tpu.training import (
        ShardedSparseEmbeddingTrainer,
        SparseEmbeddingTrainer,
    )
    from jax.sharding import NamedSharding, PartitionSpec

    n_global = len(jax.devices())
    d, m = n_global // 2, 2
    mesh = make_mesh(data=d, model=m)
    B, V_U, V_I, E = 32, 64, 128, 8

    uid = CategoricalColumnWithIdentity(feature_name="uid", category_num=V_U)
    iid = CategoricalColumnWithIdentity(feature_name="iid", category_num=V_I)
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)

    def mk_model():
        return FunkSVD(uid_column=uid, iid_column=iid, label_column=label,
                       emb_size=E, table_row_multiple=n_global)

    def batches(k):
        out = []
        for s in range(k):
            rng = np.random.default_rng(100 + s)
            out.append({
                "uid": rng.integers(0, V_U, size=B).astype(np.int32),
                "iid": rng.integers(0, V_I, size=B).astype(np.int32),
                "label": rng.integers(0, 2, size=B).astype(np.int32),
            })
        return out

    sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    per_host = B // num_processes

    def to_device(batch):
        local = {k: v[process_id * per_host:(process_id + 1) * per_host]
                 for k, v in batch.items()}
        return {k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in local.items()}

    @jax.jit
    def table_digest(leaf):  # replicated scalar from a sharded leaf
        return jnp.sum(jnp.abs(leaf[:, :E].astype(jnp.float32)))

    counts = np.random.default_rng(9).zipf(1.5, size=V_I).astype(np.float64)
    configs = {
        "grid+two_hop+cap packed": dict(strategy="grid", two_hop=True,
                                        exchange_capacity=2.0,
                                        packed_tables=True),
        "hot_cold packed": dict(strategy="hot_cold", packed_tables=True,
                                hot_counts={"i": counts}, hot_rows=0.5),
    }
    for tag, kw in configs.items():
        st = ShardedSparseEmbeddingTrainer(mk_model(), mesh=mesh, **kw)
        st.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",))
        st.init_state(batches(1)[0], seed=0)
        for batch in batches(3):
            loss = st._train_step(to_device(batch))
        assert np.isfinite(float(loss)), (tag, loss)

        # single-process single-device twin on the same batches
        tw = SparseEmbeddingTrainer(mk_model(), packed_tables=True)
        tw.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",))
        tw.init_state(batches(1)[0], seed=0)
        for batch in batches(3):
            tw._train_step(batch)

        if kw.get("strategy") == "hot_cold":
            # fragments: digest = hot + cold (padding rows are zero)
            got = float(table_digest(
                st.state.params["i_embeddings"]["embedding"])) + float(
                table_digest(
                    st.state.params["hot_tables"]["i_embeddings"]["embedding"]))
        else:
            got = float(table_digest(
                st.state.params["i_embeddings"]["embedding"]))
        want = float(table_digest(
            jnp.asarray(tw.state.params["i_embeddings"]["embedding"])))
        assert abs(got - want) <= 1e-3 * max(1.0, abs(want)), (
            tag, got, want)
        if process_id == 0:
            print(f"engine drill [{tag}]: digest {got:.5f} == twin "
                  f"{want:.5f}", flush=True)

    # (c) quantized int8 packed byte rows, 1d sharding
    from pytorchrec_tpu.models import DLRM
    from pytorchrec_tpu.feature_column import NumericColumn
    from pytorchrec_tpu.ops.quantized_packed import (
        dequant_packed_rows,
        packed_q_base,
    )
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )

    sp = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                        category_num=64) for i in range(2)]
    de = [NumericColumn(feature_name="d_0")]

    def mk_q():
        return DLRM(sparse_columns=tuple(sp), dense_columns=tuple(de),
                    label_column=label, emb_size=E, bottom_layers=(8,),
                    top_layers=(8,), unified_embedding=True,
                    quantized_embedding=True, table_packed=True,
                    table_row_multiple=n_global)

    def q_batches(k):
        out = []
        for s in range(k):
            rng = np.random.default_rng(200 + s)
            b = {f"c_{i}": rng.integers(0, 64, size=B).astype(np.int32)
                 for i in range(2)}
            b["d_0"] = rng.normal(size=B).astype(np.float32)
            b["label"] = rng.integers(0, 2, size=B).astype(np.int32)
            out.append(b)
        return out

    qt = ShardedSparseEmbeddingTrainer(mk_q(), mesh=mesh, packed_tables=True)
    qt.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("auc",))
    qt.init_state(q_batches(1)[0], seed=0)
    for batch in q_batches(3):
        loss = qt._train_step(to_device(batch))
    assert np.isfinite(float(loss))

    qw = QuantizedEmbeddingTrainer(mk_q(), packed_tables=True)
    qw.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("auc",))
    qw.init_state(q_batches(1)[0], seed=0)
    for batch in q_batches(3):
        qw._train_step(batch)

    base = packed_q_base(E, 8, 1)

    @jax.jit
    def q_digest(leaf):
        return jnp.sum(jnp.abs(dequant_packed_rows(leaf[:, :base], E, 8, 1)))

    got = float(q_digest(qt.state.params["unified_q"]))
    want = float(q_digest(jnp.asarray(qw.state.params["unified_q"])))
    assert abs(got - want) <= 1e-3 * max(1.0, abs(want)), (got, want)
    if process_id == 0:
        print(f"engine drill [quantized 1d]: digest {got:.5f} == twin "
              f"{want:.5f}", flush=True)

    # (d) RL through the engine across the process boundary (round 5):
    # packed fast-width QNet tables, both networks' lookups on the
    # all-to-all, target sync shard-wise — digest vs the single-process
    # packed SparseRLTrainer twin
    from pytorchrec_tpu.models.rl import DQNQNet, ValueRLModel
    from pytorchrec_tpu.training import ShardedSparseRLTrainer, SparseRLTrainer

    S_RL, N_RL, V_RL = 4, 3, 8 * n_global

    def mk_rl():
        col = CategoricalColumnWithIdentity
        return ValueRLModel(
            qnet=DQNQNet(
                iid_column=col(feature_name="iid", category_num=V_RL),
                state_column=col(feature_name="state", category_num=V_RL),
                state_len_column=col(feature_name="state_len",
                                     category_num=S_RL + 1),
                next_state_column=col(feature_name="next_state",
                                      category_num=V_RL),
                next_state_len_column=col(feature_name="next_state_len",
                                          category_num=S_RL + 1),
                rl_sample_column=col(feature_name="rl_sample",
                                     category_num=V_RL),
                emb_size=E, hidden_size=8, table_row_multiple=n_global),
            reward_column=label)

    def rl_batches(k):
        out = []
        for s in range(k):
            rng = np.random.default_rng(300 + s)
            out.append({
                "iid": rng.integers(0, V_RL, size=B).astype(np.int32),
                "state": rng.integers(1, V_RL,
                                      size=(B, S_RL)).astype(np.int32),
                "state_len": rng.integers(1, S_RL + 1,
                                          size=B).astype(np.int32),
                "next_state": rng.integers(
                    1, V_RL, size=(B, S_RL)).astype(np.int32),
                "next_state_len": rng.integers(
                    1, S_RL + 1, size=B).astype(np.int32),
                "rl_sample": rng.integers(
                    0, V_RL, size=(B, N_RL)).astype(np.int32),
                "label": rng.integers(0, 2, size=B).astype(np.int32),
            })
        return out

    rt = ShardedSparseRLTrainer(mk_rl(), mesh=mesh, packed_tables=True)
    rt.compile(optimizer="adam", lr=0.05, loss="mse", metrics=())
    rt.init_state(rl_batches(1)[0], seed=0)
    for batch in rl_batches(3):
        out = rt._train_step(to_device(batch))
        loss = out[1] if isinstance(out, tuple) else out
    assert np.isfinite(float(loss))

    rw = SparseRLTrainer(mk_rl(), packed_tables=True)
    rw.compile(optimizer="adam", lr=0.05, loss="mse", metrics=())
    rw.init_state(rl_batches(1)[0], seed=0)
    for batch in rl_batches(3):
        rw._train_step(batch)

    got = float(table_digest(rt.state.params["i_embedding"]["embedding"]))
    want = float(table_digest(
        jnp.asarray(rw.state.params["i_embedding"]["embedding"])))
    assert abs(got - want) <= 1e-3 * max(1.0, abs(want)), (got, want)
    if process_id == 0:
        print(f"engine drill [RL packed 1d]: digest {got:.5f} == twin "
              f"{want:.5f}", flush=True)


def worker(process_id: int, num_processes: int) -> None:
    devices_per_proc = int(os.environ.get("_MULTIHOST_DEVICES", "2"))
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.parallel import DATA_AXIS, make_mesh
    from pytorchrec_tpu.training import Trainer

    assert jax.process_count() == num_processes
    n_global = len(jax.devices())
    assert n_global == devices_per_proc * num_processes, n_global
    mesh = make_mesh(data=n_global, model=1)

    uid = CategoricalColumnWithIdentity(feature_name="uid", category_num=64)
    iid = CategoricalColumnWithIdentity(feature_name="iid", category_num=128)
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = FunkSVD(uid_column=uid, iid_column=iid, label_column=label, emb_size=8)
    trainer = Trainer(model, mesh=mesh)
    trainer.compile(optimizer="adam", lr=0.1, loss="bce", metrics=("hit@5",))

    # every host generates the same global batch and feeds its shard via
    # make_array_from_process_local_data
    rng = np.random.default_rng(0)
    global_batch = {
        "uid": rng.integers(0, 64, size=32).astype(np.int32),
        "iid": rng.integers(0, 128, size=32).astype(np.int32),
        "label": rng.integers(0, 2, size=32).astype(np.int32),
    }
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    per_host = 32 // num_processes
    local = {
        k: v[process_id * per_host : (process_id + 1) * per_host]
        for k, v in global_batch.items()
    }
    device_batch = {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local.items()
    }

    trainer.init_state(global_batch, seed=0)
    for _ in range(3):
        loss = trainer._train_step(device_batch)
    loss = float(loss)
    assert np.isfinite(loss), loss

    # all hosts must hold identical replicated params
    leaf = trainer.state.params["u_embeddings"]["embedding"]
    digest = float(jnp.sum(jnp.abs(leaf)))
    digests = jax.experimental.multihost_utils.process_allgather(
        jnp.asarray(digest)
    )
    assert np.allclose(np.asarray(digests), digest), digests
    if process_id == 0:
        print(f"multihost sim OK: {num_processes} processes x "
              f"{devices_per_proc} devices, "
              f"loss={loss:.4f}, digest={digest:.4f}", flush=True)

    if os.environ.get("_MULTIHOST_ENGINE"):
        _engine_drill(process_id, num_processes)


def main(num_processes: int = 2, engine: bool = False) -> None:
    if os.environ.get("_MULTIHOST_WORKER"):
        worker(int(os.environ["_MULTIHOST_WORKER_ID"]), num_processes)
        return
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env["_MULTIHOST_WORKER"] = "1"
        env["_MULTIHOST_WORKER_ID"] = str(pid)
        if engine:
            env["_MULTIHOST_ENGINE"] = "1"
            env.setdefault("_MULTIHOST_DEVICES", "4")
        env.pop("PYTHONPATH", None)  # CPU only: drop the TPU plugin path
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             *[a for a in (str(num_processes),
                           "--engine" if engine else None) if a]],
            env=env,
        ))
    codes = [p.wait(timeout=600) for p in procs]
    assert all(c == 0 for c in codes), codes
    print("all workers exited cleanly")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--engine"]
    main(int(args[0]) if args else 2, engine="--engine" in sys.argv)
