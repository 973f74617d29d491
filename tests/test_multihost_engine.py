"""Cross-process drill of the explicit sharded-embedding engine (VERDICT r3
#3): 2 ``jax.distributed`` processes x 4 CPU devices run
ShardedSparseEmbeddingTrainer (grid+two_hop packed, hot/cold packed,
quantized int8) and every config's table digest must equal its
single-process twin — shard_map collectives really cross a process
boundary. The worker logic lives in scripts/multihost_sim.py (--engine)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_engine_survives_process_boundary():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["PYTHONPATH"] = REPO
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_sim.py"),
         "2", "--engine"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert result.returncode == 0, (result.stdout[-3000:],
                                    result.stderr[-3000:])
    assert "engine drill [quantized 1d]" in result.stdout, result.stdout
    assert "engine drill [RL packed 1d]" in result.stdout, result.stdout
    assert "all workers exited cleanly" in result.stdout
