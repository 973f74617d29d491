"""End-to-end example smoke: the criteo_end_to_end script runs to completion
at tiny scale (its own process, CPU)."""

import os
import subprocess
import sys


def test_criteo_example_smoke(tmp_path):
    env = dict(os.environ)
    env["PYTORCHREC_TPU_WORK_DIR"] = str(tmp_path)
    env.pop("PYTHONPATH", None)  # CPU-only: drop any TPU plugin path
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "criteo_end_to_end.py"),
         "--rows", "20000", "--steps", "10", "--batch", "512", "--cpu"],
        env=env, capture_output=True, text=True, timeout=500, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "held-out AUC:" in out.stdout, out.stdout


def test_criteo_example_vocab_cap_smoke(tmp_path):
    env = dict(os.environ)
    env["PYTORCHREC_TPU_WORK_DIR"] = str(tmp_path)
    env.pop("PYTHONPATH", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "criteo_end_to_end.py"),
         "--rows", "20000", "--steps", "10", "--batch", "512", "--cpu",
         "--vocab_cap", "400"],
        env=env, capture_output=True, text=True, timeout=500, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mean coverage" in out.stdout, out.stdout
    assert "held-out AUC:" in out.stdout, out.stdout
