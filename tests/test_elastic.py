"""Elastic recovery: cross-mesh checkpoint resharding + the multi-process
pod-resize drill (SURVEY §5.3/§5.4 build mandate; the reference has no
resume at all — weights-only torch.save, model/IModel.py:73-81)."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from pytorchrec_tpu.data import SimpleDataReader, SplitMode, TrainMode
from pytorchrec_tpu.data.process.datasets.synthetic import generate_synthetic_ml
from pytorchrec_tpu.models import FunkSVD
from pytorchrec_tpu.training import Trainer
from pytorchrec_tpu.training.checkpoint import CheckpointManager
from pytorchrec_tpu.utils import constants as C

DATASET = "Synthetic-ML-Elastic"


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wd")
    os.environ["PYTORCHREC_TPU_WORK_DIR"] = str(tmp)
    # 119 items -> a 120-row table (ids 0..119): divisible by model-axis
    # sizes 2 AND 4, so the table is genuinely row-sharded on both meshes
    generate_synthetic_ml(DATASET, n_users=64, n_items=119, seed=31)
    yield str(tmp)
    os.environ.pop("PYTORCHREC_TPU_WORK_DIR", None)


def make_trainer(reader, mesh):
    cols = reader.get_feature_column_dict()
    model = FunkSVD(uid_column=cols[C.UID], iid_column=cols[C.IID],
                    label_column=cols[C.LABEL], emb_size=8)
    t = Trainer(model, mesh=mesh)
    t.compile(optimizer="adam", lr=0.02, loss="bce", metrics=("hit@5",),
              user_sample_n=10)
    return t


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_cross_mesh_reshard_restore(dataset_dir, tmp_path):
    """A checkpoint saved on one mesh layout restores onto a different one:
    values identical, leaves adopt the NEW template's shardings, and
    training continues."""
    from pytorchrec_tpu.parallel import MODEL_AXIS, make_mesh

    reader = SimpleDataReader(DATASET, split_mode=SplitMode.LEAVE_K_OUT,
                              warm_n=5, leave_k=1, neg_sample_n=9,
                              train_mode=TrainMode.POINT_WISE, random_seed=2020)
    t1 = make_trainer(reader, make_mesh(data=4, model=2))
    t1.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    assert t1.state.params["i_embeddings"]["embedding"].sharding.spec[0] == MODEL_AXIS

    ckpt = CheckpointManager(str(tmp_path / "xmesh"))
    ckpt.save(int(t1.state.step), t1.state)
    ckpt.wait()

    t2 = make_trainer(reader, make_mesh(data=2, model=4))
    t2.init_state(reader.get_batch("train", np.arange(4)), seed=5)
    t2.state = ckpt.restore(t2.state)
    ckpt.close()

    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    leaf = t2.state.params["i_embeddings"]["embedding"]
    assert leaf.sharding.spec[0] == MODEL_AXIS
    assert leaf.sharding.mesh.shape[MODEL_AXIS] == 4  # resharded 2-way -> 4-way

    step_before = int(t2.state.step)
    t2.fit(reader, batch_size=32, epochs=1, verbose=0, eval_dev=False)
    assert int(t2.state.step) > step_before


def test_pod_resize_drill(tmp_path):
    """Run the full 2-process-preempt -> 4-process-resume sim out of
    process (scripts/elastic_sim.py): SIGTERM to one host only, consensus
    stop, collective save, resharded resume, cross-host digest equality."""
    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "elastic_sim.py")
    env = dict(os.environ)
    env["ELASTIC_SIM_DIR"] = str(tmp_path)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    result = subprocess.run(
        [sys.executable, os.path.abspath(script)],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert result.returncode == 0, result.stdout + result.stderr
    assert "elastic resize drill OK" in result.stdout
    assert os.path.exists(tmp_path / "resume_ok")
