"""Elastic pod-resize drill: preempt a 2-process run, resume at 4 processes.

The multi-host answer to elastic recovery (SURVEY §5.3/§5.4 build mandate;
the reference has no resume at all — weights-only torch.save,
/root/reference/torchrec/model/IModel.py:73-81). Phases:

1. TRAIN  — 2 processes x 2 CPU devices, mesh (data=2, model=2), FunkSVD
   with row-sharded tables, driven through ``Trainer.fit_steps`` with a
   ``PreemptionGuard``. The parent SIGTERMs ONLY process 0 mid-training:
   the guard's cross-process consensus must propagate the flag so BOTH
   processes stop at the same step and complete the collective orbax save.
2. RESUME — 4 processes x 2 CPU devices, mesh (data=2, model=4): a
   DIFFERENT process count AND a different table sharding layout.
   ``maybe_resume`` restores the phase-1 checkpoint resharded into the new
   mesh, training continues, and all hosts verify identical params.

Usage:  python scripts/elastic_sim.py
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

PORTS = {"train": 12356, "resume": 12357}
PROCS = {"train": 2, "resume": 4}
MESHES = {"train": (2, 2), "resume": (2, 4)}  # (data, model)
BATCH = 32
EMB = 8
N_UID, N_IID = 64, 128  # divisible by both model-axis sizes


def make_batches(seed: int):
    """Identical global-batch stream on every process (seed-aligned loader
    contract — trainer._put_batch slices this host's rows)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    while True:
        yield {
            "uid": rng.integers(0, N_UID, size=BATCH).astype(np.int32),
            "iid": rng.integers(0, N_IID, size=BATCH).astype(np.int32),
            "label": rng.integers(0, 2, size=BATCH).astype(np.int32),
        }


def build_trainer(mesh_shape):
    from pytorchrec_tpu.feature_column import CategoricalColumnWithIdentity
    from pytorchrec_tpu.models import FunkSVD
    from pytorchrec_tpu.parallel import make_mesh
    from pytorchrec_tpu.training import Trainer

    uid = CategoricalColumnWithIdentity(feature_name="uid", category_num=N_UID)
    iid = CategoricalColumnWithIdentity(feature_name="iid", category_num=N_IID)
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = FunkSVD(uid_column=uid, iid_column=iid, label_column=label, emb_size=EMB)
    data, model_axis = mesh_shape
    trainer = Trainer(model, mesh=make_mesh(data=data, model=model_axis))
    trainer.compile(optimizer="adam", lr=0.05, loss="bce", metrics=("hit@5",))
    return trainer


def _digest_equal_everywhere(trainer):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    total = sum(
        float(jnp.sum(jnp.abs(leaf)))
        for leaf in jax.tree_util.tree_leaves(trainer.state.params)
    )
    digests = np.asarray(multihost_utils.process_allgather(np.asarray(total)))
    assert np.allclose(digests, total, rtol=1e-6), digests
    return total


def worker(phase: str, process_id: int, workdir: str) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORTS[phase]}",
        num_processes=PROCS[phase],
        process_id=process_id,
    )
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pytorchrec_tpu.training.callbacks import Callback
    from pytorchrec_tpu.training.checkpoint import PreemptionGuard

    ckpt_dir = os.path.join(workdir, "ckpt")
    trainer = build_trainer(MESHES[phase])
    guard = PreemptionGuard(ckpt_dir, sync_every=5)

    if phase == "train":
        class Ready(Callback):
            fired = False

            def on_train_batch_end(self, batch, logs=None):
                if not Ready.fired and batch >= 5:
                    Ready.fired = True
                    open(os.path.join(workdir, f"ready_{process_id}"), "w").close()

        trainer.fit_steps(
            make_batches(seed=7), steps=10_000_000,
            callbacks=[guard, Ready()], verbose=0, log_every=1_000_000, seed=3,
        )
        assert trainer.stop_training, "guard never stopped the loop"
        step = int(trainer.state.step)
        assert guard.ckpt.latest_step() == step
        if process_id == 0:
            with open(os.path.join(workdir, "saved_step"), "w") as f:
                f.write(str(step))
            print(f"[train] preempted + saved at step {step}", flush=True)
    else:
        expect_step = int(open(os.path.join(workdir, "saved_step")).read())
        batches = make_batches(seed=7)
        trainer.init_state(next(batches), seed=99)
        guard.set_trainer(trainer)
        resumed = guard.maybe_resume()
        assert resumed == expect_step, (resumed, expect_step)
        # tables restored onto the model=4 layout: verify the sharding spec
        leaf = trainer.state.params["i_embeddings"]["embedding"]
        spec = leaf.sharding.spec
        assert spec and spec[0] == "model", spec
        before = _digest_equal_everywhere(trainer)
        history = trainer.fit_steps(
            batches, steps=10, callbacks=[guard], verbose=0, log_every=10,
        )
        loss = history.history["loss"][-1]
        assert np.isfinite(loss), loss
        assert int(trainer.state.step) == expect_step + 10
        after = _digest_equal_everywhere(trainer)
        if process_id == 0:
            print(
                f"[resume] {PROCS['train']}p -> {PROCS['resume']}p OK: "
                f"resumed step {resumed}, +10 steps, loss={loss:.4f}, "
                f"digest {before:.4f} -> {after:.4f}", flush=True,
            )
            open(os.path.join(workdir, "resume_ok"), "w").close()


def launch(phase: str, workdir: str):
    procs = []
    for pid in range(PROCS[phase]):
        env = dict(os.environ)
        env["_ELASTIC_PHASE"] = phase
        env["_ELASTIC_PID"] = str(pid)
        env["_ELASTIC_WORKDIR"] = workdir
        env.pop("PYTHONPATH", None)  # CPU only: drop the TPU plugin path
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
        ))
    return procs


def main() -> None:
    if os.environ.get("_ELASTIC_PHASE"):
        worker(os.environ["_ELASTIC_PHASE"], int(os.environ["_ELASTIC_PID"]),
               os.environ["_ELASTIC_WORKDIR"])
        # the drill's semantic work (checkpoint / resume markers) is
        # durably on disk by now; skip interpreter + C++ teardown. Under
        # machine load, jax.distributed's grpc teardown can abort
        # (SIGABRT, "terminate called ... FATAL: exception not rethrown")
        # when one process exits while its peer is mid-shutdown — a
        # teardown race observed 2026-08-21 that failed the drill on exit
        # codes AFTER every assertion had already passed.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    import tempfile

    workdir = os.environ.get("ELASTIC_SIM_DIR") or tempfile.mkdtemp(prefix="elastic_sim_")
    print(f"workdir: {workdir}", flush=True)

    procs = launch("train", workdir)
    # wait until process 0 is demonstrably inside the training loop, then
    # deliver SIGTERM to it ALONE — consensus must reach process 1
    deadline = time.time() + 240
    while not os.path.exists(os.path.join(workdir, "ready_0")):
        assert time.time() < deadline, "phase 1 never reached the train loop"
        assert all(p.poll() is None for p in procs), "phase-1 worker died early"
        time.sleep(0.2)
    procs[0].send_signal(signal.SIGTERM)
    codes = [p.wait(timeout=300) for p in procs]
    assert all(c == 0 for c in codes), f"train phase exit codes {codes}"

    codes = [p.wait(timeout=300) for p in launch("resume", workdir)]
    assert all(c == 0 for c in codes), f"resume phase exit codes {codes}"
    assert os.path.exists(os.path.join(workdir, "resume_ok"))
    print("elastic resize drill OK: 2-process preempt -> 4-process resume", flush=True)


if __name__ == "__main__":
    main()
