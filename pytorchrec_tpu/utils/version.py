"""Version / platform compatibility notes (reference utils/version.py — a
comment-only torch↔CUDA table; the TPU-native analogue records the
jax↔libtpu↔TPU-generation pairs this build is developed and tested against,
plus a runtime helper so tasks can log the environment they actually ran on).

#   jax        libtpu / platform        TPU
#   0.9.x      enumerated via jax.local_devices(); this build is developed
#              on a v5e (one chip) and an 8-virtual-device CPU mesh.
#   Older jax (< 0.4.35) lacks jax.shard_map as a top-level export — the
#   parallel layer requires it and asserts at import.
"""

from __future__ import annotations

from typing import Dict


def environment_summary() -> Dict[str, str]:
    """Versions + devices of the live environment, for logs/repro records."""
    import jax

    devices = jax.local_devices()
    return {
        "jax": jax.__version__,
        "backend": devices[0].platform if devices else "none",
        "devices": ",".join(d.device_kind for d in devices[:4])
        + ("..." if len(devices) > 4 else ""),
        "n_devices": str(jax.device_count()),
        "n_processes": str(jax.process_count()),
    }
