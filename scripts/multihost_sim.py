"""Multi-host simulation: N python processes, jax.distributed over localhost.

The TPU answer to "test multi-node without a cluster" (SURVEY §4): every
process runs ``jax.distributed.initialize`` against a local coordinator with
CPU devices, they form ONE global mesh, and a data-parallel FunkSVD train
step runs with per-host batch shards — XLA's psum crosses the (simulated)
hosts. The script checks that all hosts agree on the resulting params.

Usage:  python scripts/multihost_sim.py [num_processes]
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = 12355


def worker(process_id: int, num_processes: int) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
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
    assert n_global == 2 * num_processes, n_global
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
        print(f"multihost sim OK: {num_processes} processes x 2 devices, "
              f"loss={loss:.4f}, digest={digest:.4f}", flush=True)


def main(num_processes: int = 2) -> None:
    if os.environ.get("_MULTIHOST_WORKER"):
        worker(int(os.environ["_MULTIHOST_WORKER_ID"]), num_processes)
        return
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env["_MULTIHOST_WORKER"] = "1"
        env["_MULTIHOST_WORKER_ID"] = str(pid)
        env.pop("PYTHONPATH", None)  # CPU only: drop the TPU plugin path
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(num_processes)],
            env=env,
        ))
    codes = [p.wait(timeout=300) for p in procs]
    assert all(c == 0 for c in codes), codes
    print("all workers exited cleanly")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
