"""Serving-bundle export: everything a C++ PJRT process needs, in one dir.

A bundle directory contains:

* ``module.stablehlo.bc`` — the StableHLO portable artifact from
  ``jax.export`` (params baked in as constants; shapes fixed to the sample
  batch). PJRT_Client_Compile accepts it directly as format ``"mlir"``.
* ``compile_options.pb`` — a serialized XLA ``CompileOptionsProto``
  (1 replica, 1 partition) so the C++ side needs no protobuf dependency.
* ``input_<i>.bin`` / ``expected_<i>.bin`` — raw little-endian tensors:
  the *kept* flat inputs of the exported module (jax.export drops unused
  batch columns, e.g. the label — ``module_kept_var_idx``) and the scores
  the jitted serving fn produced for them at export time.
* ``manifest.txt`` — plugin path, env contract, typed client-create
  options, tensor dtypes/shapes, verification tolerance. Format documented
  in ``native/serving/pjrt_serving.cpp``.

The manifest's plugin/env/options default to THIS machine's PJRT contract
(the axon tunnel plugin and the registration options its sitecustomize
passes — see /root/.claude CLAUDE.md env notes). On a real TPU host pass
``plugin_path="/path/to/libtpu.so", client_options={}, env={}`` — libtpu
needs no create options.

No reference counterpart: the reference's predict path is Python-only
(model/IModel.py:272-308).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import numpy as np

_DTYPE_CODES = {
    np.dtype(np.float32): "f32",
    np.dtype(np.float64): "f64",
    np.dtype(np.int32): "i32",
    np.dtype(np.int64): "i64",
    np.dtype(np.uint32): "u32",
    np.dtype(np.int8): "i8",
    np.dtype(np.uint8): "u8",
}

# env vars that parameterize the axon PJRT plugin; snapshot whichever are
# set at export time so the C++ process reproduces the contract
_ENV_PREFIXES = ("AXON_", "TPU_", "PALLAS_AXON_")


def _dtype_code(arr: np.ndarray) -> str:
    code = _DTYPE_CODES.get(np.dtype(arr.dtype))
    if code is None:
        # bfloat16 has no numpy builtin; match by name
        if arr.dtype.name == "bfloat16":
            return "bf16"
        raise ValueError(f"unsupported dtype for serving bundle: {arr.dtype}")
    return code


def _dims_csv(arr: np.ndarray) -> str:
    return ",".join(str(d) for d in arr.shape) if arr.ndim else "scalar"


def _default_axon_contract() -> tuple[str, dict[str, str], list[tuple[str, str, str]]]:
    """(plugin_path, env, typed options) for this machine's axon plugin.

    Mirrors what the sitecustomize registration passes to
    ``PJRT_Client_Create`` (axon/register/pjrt.py::_register_backend with
    remote_compile=True: AOT options are empty, so the full set is the six
    provider options below). ``session_id`` is ``@fresh``: the shim
    substitutes a new uuid per process — session ids key the terminal's
    session lock and must not be reused across processes.
    """
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    remote_compile = "1" if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1" else "0"
    plugin = os.environ.get("AXON_SO_PATH", "/opt/axon/libaxon_pjrt.so")
    env: dict[str, str] = {}
    for key, value in os.environ.items():
        if key.startswith(_ENV_PREFIXES) and "\n" not in value and " " not in value:
            env[key] = value
    env.setdefault("TPU_SKIP_MDS_QUERY", "1")
    env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    try:  # the wire-format version tag the Rust client reads
        import sys

        sys.path.insert(0, "/root/.axon_site")
        from axon.register import COMPAT_VERSION  # type: ignore

        env.setdefault("AXON_COMPAT_VERSION", str(COMPAT_VERSION))
    except Exception:
        pass
    options = [
        ("s", "topology", f"{gen}:1x1x1"),
        ("s", "session_id", "@fresh"),
        ("i", "remote_compile", remote_compile),
        ("i", "local_only", "0"),
        ("i", "priority", "0"),
        ("i", "n_slices", "1"),
    ]
    return plugin, env, options


def shim_binary_path() -> str:
    """Path of the compiled C++ shim (build with ``make`` in its dir)."""
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "native", "serving", "pjrt_serve")


def export_serving_bundle(
    trainer: Any,
    sample_batch: Mapping[str, np.ndarray],
    out_dir: str,
    *,
    plugin_path: str | None = None,
    env: Mapping[str, str] | None = None,
    client_options: list[tuple[str, str, str]] | None = None,
    tolerance: float = 1e-4,
) -> str:
    """Export ``trainer``'s serving fn as a self-contained C++ bundle.

    Returns ``out_dir``. Runs the serving fn once on ``sample_batch`` to
    record expected outputs, so the C++ shim verifies end-to-end numerics,
    not just plumbing.
    """
    from jax import export as jax_export
    from jaxlib import xla_client

    serve = trainer.make_serving_fn()
    exported = jax_export.export(serve)(dict(sample_batch))

    # flat input order must match the exported module's calling convention:
    # flatten ((args, kwargs)) the way jax.export did, then keep only the
    # args the module actually uses
    args_flat, in_tree = jax.tree_util.tree_flatten(((dict(sample_batch),), {}))
    if in_tree != exported.in_tree:
        raise ValueError("sample_batch pytree does not match the exported in_tree")
    kept = list(exported.module_kept_var_idx)
    kept_names = _flat_arg_names(sample_batch, in_tree, len(args_flat))

    outputs = serve(dict(sample_batch))
    out_flat = [np.asarray(x) for x in jax.tree_util.tree_leaves(outputs)]

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "module.stablehlo.bc"), "wb") as f:
        f.write(exported.mlir_module_serialized)

    opts = xla_client.CompileOptions()
    opts.num_replicas = 1
    opts.num_partitions = 1
    with open(os.path.join(out_dir, "compile_options.pb"), "wb") as f:
        f.write(opts.SerializeAsString())

    plugin, env_map, options = _default_axon_contract()
    if plugin_path is not None:
        plugin = plugin_path
    if env is not None:
        env_map = dict(env)
    if client_options is not None:
        options = list(client_options)

    lines = [f"plugin {plugin}"]
    for key, value in sorted(env_map.items()):
        lines.append(f"env {key} {value}")
    for typ, key, value in options:
        lines.append(f"opt {typ} {key} {value}")
    lines.append("program module.stablehlo.bc")
    lines.append("compile_options compile_options.pb")

    for slot, idx in enumerate(kept):
        arr = np.ascontiguousarray(np.asarray(args_flat[idx]))
        fname = f"input_{slot}.bin"
        arr.tofile(os.path.join(out_dir, fname))
        lines.append(
            f"input {_dtype_code(arr)} {_dims_csv(arr)} {fname} {kept_names[idx]}")

    for slot, arr in enumerate(out_flat):
        arr = np.ascontiguousarray(arr)
        fname = f"expected_{slot}.bin"
        arr.tofile(os.path.join(out_dir, fname))
        lines.append(f"expected {_dtype_code(arr)} {_dims_csv(arr)} {fname}")

    lines.append(f"tolerance {tolerance}")
    with open(os.path.join(out_dir, "manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return out_dir


def _flat_arg_names(sample_batch: Mapping[str, Any], in_tree, n: int) -> list[str]:
    """Best-effort names for the flat args (batch dict keys, sorted like
    pytree flattening sorts them); falls back to positional labels."""
    try:
        names_tree = ({k: k for k in sample_batch},)
        flat, tree = jax.tree_util.tree_flatten((names_tree, {}))
        if tree == in_tree and len(flat) == n:
            return [str(x) for x in flat]
    except Exception:
        pass
    return [f"arg{i}" for i in range(n)]
