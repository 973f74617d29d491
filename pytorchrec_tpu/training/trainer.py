"""Keras-parity trainer on a jitted functional core.

Capability parity with reference model/IModel.py:94-321 (compile / fit /
evaluate / predict / save- & load-weights / best-weights-in-RAM) — re-designed
TPU-first:

* ``train_step`` is ONE jitted pure function ``(state, batch) -> (state,
  loss)`` with donated state (the reference mutates module+optimizer in
  python per batch, IModel.py:116-125);
* batches have static shapes (fixed batch size, padded eval remainders), so
  each step compiles exactly once;
* eval keeps predictions on device per batch and only transfers the final
  concatenated arrays once per evaluate call (the reference copies
  device→host per batch, IModel.py:250-251);
* an optional ``jax.sharding.Mesh`` turns the same trainer multi-chip: params
  replicated (or sharded by the model's param_sharding rules), batches split
  over the ``data`` axis — see pytorchrec_tpu/parallel/.

Epoch-log semantics match the reference exactly: ``loss`` is the LAST batch's
loss (IModel.py:190-192 ``epoch_logs = copy.copy(logs)``), dev metrics merge
in every ``dev_freq`` epochs, History/EarlyStopping/Checkpoint consume those
keys.
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from pytorchrec_tpu.data.loader import eval_batches, num_train_batches, train_batches
from pytorchrec_tpu.data.readers.base import DataReader
from pytorchrec_tpu.data.schema import TrainMode
from pytorchrec_tpu.loss import get_loss
from pytorchrec_tpu.metric import MetricList
from pytorchrec_tpu.models.base import RecModel
from pytorchrec_tpu.optim import build_optimizer
from pytorchrec_tpu.training.callbacks import Callback, CallbackList, History
from pytorchrec_tpu.training.state import TrainState

logger = logging.getLogger(__name__)

Batch = Dict[str, np.ndarray]


def _chain_first(first, iterator):
    yield first
    yield from iterator


class Trainer:
    """Owns the train state and the jitted step functions for one model."""

    def __init__(self, model: RecModel, mesh: Optional[jax.sharding.Mesh] = None,
                 packed_transfer: Optional[bool] = None):
        self.model = model
        self.mesh = mesh
        # pack the ~40 small batch arrays into one int32 + one float32 buffer
        # per transfer (data/packing.py) — one dispatch instead of 40. Only
        # for unsharded runs (a packed 1-D buffer can't shard by batch dim).
        self.packed_transfer = (mesh is None) if packed_transfer is None else packed_transfer
        self._packer = None
        self._eval_packer = None
        self.state: Optional[TrainState] = None
        self.best_params = None  # host-side copy (reference IModel.py:314-315)
        self.stop_training = False
        self.history: Optional[History] = None

        self._compiled = False
        self.tx = None
        self.loss_fn: Optional[Callable] = None
        self.metrics: Optional[MetricList] = None
        self._train_step_fn = None
        self._eval_step_fn = None
        self._state_shardings = None

    # ------------------------------------------------------------------
    # compile / init
    # ------------------------------------------------------------------

    def compile(
        self,
        optimizer: Union[str, Any] = "adam",
        loss: Union[str, Callable] = "bce",
        metrics: Sequence[str] = ("ndcg@10", "hit@10"),
        lr: float = 1e-3,
        weight_decay: float = 0.0,
        user_sample_n: int = 100,
        grad_clip_norm: Optional[float] = None,
        matmul_precision: Optional[str] = None,
        **optimizer_kwargs,
    ) -> None:
        """Validate + store optimizer/loss/metrics (reference IModel.py:94-114).

        ``optimizer`` may be a registry name or an optax transformation;
        ``loss`` a registry name or ``fn(prediction, target) -> scalar``.
        """
        if isinstance(optimizer, str):
            self.tx = build_optimizer(
                optimizer, lr=lr, weight_decay=weight_decay,
                grad_clip_norm=grad_clip_norm, **optimizer_kwargs,
            )
        else:
            self.tx = optimizer
        self.loss_fn = get_loss(loss) if isinstance(loss, str) else loss
        self.metrics = MetricList(list(metrics), user_sample_n=user_sample_n)
        # models whose prediction columns are log-probabilities (ESMM's
        # column 1 = log pCTCVR) declare log_prob_task_columns; sigmoid-based
        # sliced metrics on those columns would silently compute
        # sigmoid(log p) instead of p (ADVICE r3 #4) — AUC is safe (monotone)
        log_prob_cols = getattr(self.model, "log_prob_task_columns", ())
        if log_prob_cols:
            from pytorchrec_tpu.metric.metrics import LogLoss, MSE, TaskSlice

            bad = [m.name for m in self.metrics.metrics
                   if isinstance(m, TaskSlice) and m.task in log_prob_cols
                   and isinstance(m.inner, (LogLoss, MSE))]
            assert not bad, (
                f"{bad}: task column(s) {sorted(log_prob_cols)} of "
                f"{type(self.model).__name__} are log-probabilities — only "
                "auc/<t> (rank-monotone) is meaningful there"
            )
        # 'bfloat16' runs f32 matmuls as single-pass bf16 on the MXU
        # (+13% on the DCN bench config; params/optimizer state stay f32)
        self.matmul_precision = matmul_precision
        self._compiled = True
        self._train_step_fn = None  # retrace on recompile

    def _assert_compiled(self) -> None:
        if not self._compiled:
            raise RuntimeError("compile() must be called before training/evaluation")

    def _make_state(self, sample_batch: Batch, seed) -> TrainState:
        root = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(root)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, sample_batch, train=False
        )
        params = variables["params"]
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=state_rng,
        )

    def _compute_state_shardings(self, sample_batch: Batch, seed):
        """NamedSharding pytree over the whole train state: embedding tables
        (and their optimizer moments, matched by path) row-sharded over the
        mesh 'model' axis, everything else replicated. Resolved via
        eval_shape so opt_state leaves inherit the table rule through their
        param-named paths."""
        from pytorchrec_tpu.parallel.sharding import is_embedding_table
        from pytorchrec_tpu.parallel.mesh import MODEL_AXIS

        mesh = self.mesh
        model_size = mesh.shape.get(MODEL_AXIS, 1)
        shape_tree = jax.eval_shape(lambda: self._make_state(sample_batch, seed))

        def rule(path, leaf):
            if (
                model_size > 1
                and is_embedding_table(path, leaf)
                and leaf.shape[0] % model_size == 0
                and leaf.shape[0] >= model_size
            ):
                return jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(MODEL_AXIS, None)
                )
            return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

        return jax.tree_util.tree_map_with_path(rule, shape_tree)

    def init_state(self, sample_batch: Batch, seed: int = 2020) -> TrainState:
        """Initialize parameters from one (host) sample batch.

        With a mesh, the state materializes directly in its sharded layout
        (tables land row-sharded; no full-table host copy)."""
        self._assert_compiled()
        if self.mesh is not None:
            self._state_shardings = self._compute_state_shardings(sample_batch, seed)
            make = jax.jit(
                lambda b: self._make_state(b, seed),
                out_shardings=self._state_shardings,
            )
            # sample batch stays unsharded: it only provides shapes
            self.state = make(sample_batch)
        else:
            self.state = self._make_state(sample_batch, seed)
        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(self.state.params)
        )
        logger.info("initialized %d parameters", n_params)
        return self.state

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _build_train_step(self):
        model, loss_fn, tx = self.model, self.loss_fn, self.tx

        def train_step(state: TrainState, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)

            def compute_loss(params):
                prediction, target = model.apply(
                    {"params": params}, batch, train=True, rngs={"dropout": step_rng}
                )
                return loss_fn(prediction, target)

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state, step=state.step + 1
            )
            return new_state, loss

        return train_step  # pure; jitted by _get_train_step_fn / scan fusion

    def _with_precision(self, fn):
        """Trace-time matmul-precision context (compile(matmul_precision=...))."""
        if not self.matmul_precision:
            return fn
        precision = self.matmul_precision

        def wrapped(*args):
            with jax.default_matmul_precision(precision):
                return fn(*args)

        return wrapped

    def _jit_train_step(self, train_step):
        """Single-device: plain jit with donation (optionally over packed
        buffers, unpacked in-jit). Mesh: in/out shardings pin the
        sharded-state layout; XLA inserts the data-axis grad psum and the
        model-axis table-gather collectives."""
        train_step = self._with_precision(train_step)
        if self.mesh is None:
            if self.packed_transfer and self._packer is not None:
                packer = self._packer

                def packed_step(state, ints, floats):
                    return train_step(state, packer.unpack(ints, floats))

                return jax.jit(packed_step, donate_argnums=0)
            return jax.jit(train_step, donate_argnums=0)
        from pytorchrec_tpu.parallel.mesh import data_sharding, replicated

        loss_sharding = replicated(self.mesh)
        return jax.jit(
            train_step,
            donate_argnums=0,
            in_shardings=(self._state_shardings, data_sharding(self.mesh)),
            out_shardings=(self._state_shardings, loss_sharding),
        )

    def _build_eval_step(self):
        model = self.model

        def eval_step(params, batch):
            return model.apply({"params": params}, batch, train=False)

        return self._jit_eval_step(eval_step)

    def _jit_eval_step(self, eval_step):
        if self.mesh is None:
            if self._use_packing() and self._eval_packer is not None:
                packer = self._eval_packer

                def packed_eval(params, ints, floats):
                    return eval_step(params, packer.unpack(ints, floats))

                return jax.jit(packed_eval)
            return jax.jit(eval_step)
        from pytorchrec_tpu.parallel.mesh import data_sharding

        return jax.jit(
            eval_step,
            in_shardings=(self._state_shardings.params, data_sharding(self.mesh)),
        )

    def _use_packing(self) -> bool:
        return self.packed_transfer and self.mesh is None

    @staticmethod
    def _batch_signature(batch: Batch):
        return tuple(sorted((k, np.asarray(v).shape) for k, v in batch.items()))

    def _ensure_train_packer(self, batch: Batch) -> None:
        sig = self._batch_signature(batch)
        if self._packer is None or getattr(self, "_packer_sig", None) != sig:
            from pytorchrec_tpu.data.packing import BatchPacker

            self._packer = BatchPacker(batch)
            self._packer_sig = sig
            self._train_step_fn = None  # retrace for the new layout

    def _train_step(self, batch) -> float:
        if self._use_packing():
            if not isinstance(batch, tuple):  # prefetch may pre-pack
                self._ensure_train_packer(batch)
                batch = self._packer.pack(batch)
            if self._train_step_fn is None:
                self._train_step_fn = self._jit_train_step(self._build_train_step())
            self.state, loss = self._train_step_fn(self.state, *batch)
            return loss
        if self._train_step_fn is None:
            self._train_step_fn = self._jit_train_step(self._build_train_step())
        batch = self._put_batch(batch)
        self.state, loss = self._train_step_fn(self.state, batch)
        return loss  # device scalar; converted lazily

    def _eval_step(self, batch: Batch):
        if self._use_packing():
            sig = self._batch_signature(batch)
            if self._eval_packer is None or getattr(self, "_eval_sig", None) != sig:
                from pytorchrec_tpu.data.packing import BatchPacker

                self._eval_packer = BatchPacker(batch)
                self._eval_sig = sig
                self._eval_step_fn = None  # retrace with the packed layout
            if self._eval_step_fn is None:
                self._eval_step_fn = self._build_eval_step()
            return self._eval_step_fn(self.state.params, *self._eval_packer.pack(batch))
        if self._eval_step_fn is None:
            self._eval_step_fn = self._build_eval_step()
        return self._eval_step_fn(self.state.params, self._put_batch(batch))

    def _put_batch(self, batch: Batch):
        """Host batch -> device, sharded over the mesh's data axis if set.

        Already-transferred batches (from the prefetch thread) pass through
        at no cost: device_put on a correctly-placed array is a no-op.
        """
        if self.mesh is None:
            return batch
        sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec("data")
        )
        if jax.process_count() > 1:
            # multi-host contract: every process holds the SAME global batch
            # (seed-aligned loaders); each host materializes only the rows its
            # addressable devices own (SURVEY §5.8 per-host data sharding)
            def put(a):
                if isinstance(a, jax.Array):
                    return a  # already global (prefetch transferred it)
                a = np.asarray(a)
                return jax.make_array_from_callback(
                    a.shape, sharding, lambda idx: a[idx]
                )

            return jax.tree_util.tree_map(put, batch)
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), batch)

    def _prefetch(self, batches):
        """Wrap a host batch iterator with lookahead device transfer
        (pytorchrec_tpu/data/prefetch.py — the DataLoader-workers analogue).
        With packing enabled the prefetch thread also does the packing, so
        the training thread only dispatches the step."""
        from pytorchrec_tpu.data.prefetch import device_put_prefetch, prefetch

        if self._use_packing():

            def put(batch):
                self._ensure_train_packer(batch)
                ints, floats = self._packer.pack(batch)
                return (jax.device_put(ints), jax.device_put(floats))

            return prefetch(batches, size=2, transform=put)
        if self.mesh is not None and jax.process_count() > 1:
            return prefetch(batches, size=2, transform=self._put_batch)
        sharding = None
        if self.mesh is not None:
            sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("data")
            )
        return device_put_prefetch(batches, sharding=sharding, size=2)

    # ------------------------------------------------------------------
    # fit / evaluate / predict (reference IModel.py:127-308)
    # ------------------------------------------------------------------

    def fit(
        self,
        reader: DataReader,
        batch_size: int,
        epochs: int,
        train_mode: Optional[TrainMode] = None,
        verbose: int = 1,
        callbacks: Optional[Union[List[Callback], CallbackList]] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        dev_batch_size: Optional[int] = None,
        dev_freq: int = 1,
        seed: int = 2020,
        eval_dev: bool = True,
    ) -> History:
        self._assert_compiled()
        if self.state is None:
            bootstrap = reader.get_batch("train", np.arange(min(2, reader.get_train_dataset_size())))
            self.init_state(bootstrap, seed=seed)
        train_mode = train_mode or reader.train_mode
        batches = num_train_batches(reader.get_train_dataset_size(), batch_size, drop_last)

        if not isinstance(callbacks, CallbackList):
            callbacks = CallbackList(
                callbacks,
                add_history=True,
                add_progbar=verbose != 0,
                trainer=self,
                verbose=verbose,
                epochs=epochs,
                batches=batches,
            )
        self.history = callbacks.history

        shuffle_rng = np.random.default_rng(seed)
        self.stop_training = False
        callbacks.on_train_begin()
        logs: Dict[str, Any] = {}
        for epoch in range(epochs):
            callbacks.on_epoch_begin(epoch)
            if train_mode == TrainMode.PAIR_WISE:
                reader.train_neg_sample()
            loss = None
            # skip the per-batch device->host loss sync when no callback
            # listens (reference implements_*_batch_hooks introspection) —
            # keeps the dispatch queue full on TPU
            batch_hooks = callbacks.implements_train_batch_hooks()
            batches = train_batches(reader, batch_size, shuffle_rng, shuffle, drop_last)
            for b, batch in enumerate(self._prefetch(batches)):
                if batch_hooks:
                    callbacks.on_train_batch_begin(b)
                loss = self._train_step(batch)
                if batch_hooks:
                    callbacks.on_train_batch_end(b, {"loss": float(loss)})
                    if self.stop_training:
                        break
            epoch_logs = {"loss": float(loss)} if loss is not None else {}

            if eval_dev and (epoch + 1) % dev_freq == 0 and not self.stop_training:
                dev_logs = self.evaluate(
                    reader, split="dev",
                    batch_size=dev_batch_size or batch_size,
                    verbose=verbose, callbacks=callbacks,
                )
                epoch_logs.update(dev_logs)

            callbacks.on_epoch_end(epoch, epoch_logs)
            if self.stop_training:
                break
        callbacks.on_train_end()
        return self.history

    def _make_scan_step(self, steps_per_call: int):
        """Fuse K train steps into one jitted ``lax.scan`` over stacked packed
        batches — amortizes per-step dispatch (big on remote/tunnel devices,
        measurable even locally). Packing must be enabled."""
        assert self._use_packing() and self._packer is not None
        step_fn = self._build_train_step()
        packer = self._packer

        def body(state, xs):
            ints, floats = xs
            return step_fn(state, packer.unpack(ints, floats))

        def multi_step(state, ints_k, floats_k):
            state, losses = jax.lax.scan(body, state, (ints_k, floats_k))
            return state, losses[-1]

        return jax.jit(self._with_precision(multi_step), donate_argnums=0)

    def fit_steps(
        self,
        batches,
        steps: int,
        callbacks: Optional[Union[List[Callback], CallbackList]] = None,
        verbose: int = 1,
        log_every: int = 100,
        steps_per_call: int = 1,
        seed: int = 2020,
    ) -> History:
        """Step-driven training over any batch iterator (e.g. a
        ``StreamingBatchSource`` for datasets that don't fit in RAM). One
        "epoch" log entry per ``log_every`` steps.

        ``steps_per_call > 1`` fuses that many steps into one device call via
        ``lax.scan`` (requires packed transfer; per-batch callbacks then see
        only the fused call's final loss)."""
        self._assert_compiled()
        iterator = iter(batches)
        if self.state is None:
            first = next(iterator)
            self.init_state(first, seed=seed)
            iterator = _chain_first(first, iterator)
        if steps_per_call > 1:
            return self._fit_steps_fused(iterator, steps, callbacks, verbose,
                                         log_every, steps_per_call)
        if not isinstance(callbacks, CallbackList):
            callbacks = CallbackList(
                callbacks, add_history=True, add_progbar=verbose != 0,
                trainer=self, epochs=(steps + log_every - 1) // log_every,
                batches=log_every,
            )
        self.history = callbacks.history
        self.stop_training = False
        callbacks.on_train_begin()
        window = 0
        callbacks.on_epoch_begin(window)
        loss = None
        batch_hooks = callbacks.implements_train_batch_hooks()
        for step, batch in enumerate(self._prefetch(iterator)):
            if step >= steps or self.stop_training:
                break
            if batch_hooks:
                callbacks.on_train_batch_begin(step)
            loss = self._train_step(batch)
            if batch_hooks:
                callbacks.on_train_batch_end(step, {"loss": float(loss)})
            if (step + 1) % log_every == 0:
                callbacks.on_epoch_end(window, {"loss": float(loss)})
                window += 1
                if step + 1 < steps:
                    callbacks.on_epoch_begin(window)
        if loss is not None and (steps % log_every) != 0:
            callbacks.on_epoch_end(window, {"loss": float(loss)})
        callbacks.on_train_end()
        return self.history

    def _fit_steps_fused(self, iterator, steps, callbacks, verbose, log_every,
                         steps_per_call):
        assert self._use_packing(), "steps_per_call > 1 requires packed_transfer"
        if not isinstance(callbacks, CallbackList):
            callbacks = CallbackList(
                callbacks, add_history=True, add_progbar=verbose != 0,
                trainer=self, epochs=(steps + log_every - 1) // log_every,
                batches=log_every,
            )
        self.history = callbacks.history
        self.stop_training = False
        callbacks.on_train_begin()
        window = 0
        callbacks.on_epoch_begin(window)
        scan_fn = None
        loss = None
        done = 0
        since_log = 0
        while done < steps and not self.stop_training:
            k = min(steps_per_call, steps - done)
            stack = []
            for batch in iterator:
                self._ensure_train_packer(batch)
                stack.append(self._packer.pack(batch))
                if len(stack) == k:
                    break
            if not stack:
                break
            if len(stack) < k or scan_fn is None or k != steps_per_call:
                scan_fn = self._make_scan_step(len(stack))
            ints_k = np.stack([s[0] for s in stack])
            floats_k = np.stack([s[1] for s in stack])
            self.state, loss = scan_fn(self.state, ints_k, floats_k)
            done += len(stack)
            since_log += len(stack)
            if since_log >= log_every:
                callbacks.on_epoch_end(window, {"loss": float(loss)})
                since_log = 0
                window += 1
                if done < steps:
                    callbacks.on_epoch_begin(window)
            if len(stack) < steps_per_call:
                scan_fn = None  # tail call used a different K; retrace next time
        if loss is not None and since_log:
            callbacks.on_epoch_end(window, {"loss": float(loss)})
        callbacks.on_train_end()
        return self.history

    def _collect_predictions(self, reader: DataReader, split: str, batch_size: int,
                             callbacks: CallbackList, hooks: str):
        """Run eval steps over a split; returns (predictions, targets) numpy.

        Device arrays are accumulated and concatenated with a single
        host transfer at the end.
        """
        preds, targets = [], []
        on_begin = getattr(callbacks, f"on_{hooks}_batch_begin")
        on_end = getattr(callbacks, f"on_{hooks}_batch_end")
        for b, (batch, valid) in enumerate(eval_batches(reader, split, batch_size)):
            on_begin(b)
            prediction, target = self._eval_step(batch)
            preds.append(prediction[:valid])
            if target is not None:
                targets.append(target[:valid])
            on_end(b)
        def to_host(parts):
            merged = jnp.concatenate(parts, axis=0)
            if jax.process_count() > 1:
                # multi-host: gather the globally-sharded predictions so every
                # host computes identical metrics (SURVEY §5.8 eval recipe)
                from jax.experimental import multihost_utils

                merged = multihost_utils.process_allgather(merged, tiled=True)
            return np.asarray(merged)

        predictions = to_host(preds)
        target_array = to_host(targets) if targets else None
        return predictions, target_array

    def _collect_metric_partials(self, reader: DataReader, split: str,
                                 batch_size: int, callbacks: CallbackList):
        """Streaming eval: fold each batch into a fixed-size on-device metric
        accumulator (SURVEY §5.8 eval recipe). Memory is independent of the
        split size — nothing is concatenated; one tiny host transfer at the
        end. Multi-host: partials are summed across processes (the psum)."""
        state = self.metrics.partial_init()
        update = jax.jit(self.metrics.partial_update, donate_argnums=0)
        for b, (batch, valid) in enumerate(eval_batches(reader, split, batch_size)):
            callbacks.on_test_batch_begin(b)
            prediction, target = self._eval_step(batch)
            state = update(state, prediction, target, jnp.asarray(valid))
            callbacks.on_test_batch_end(b)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            gathered = multihost_utils.process_allgather(state)
            state = {k: np.sum(v, axis=0) for k, v in gathered.items()}
        return self.metrics.partial_finalize(state)

    def evaluate(
        self,
        reader: DataReader,
        split: str = "test",
        batch_size: int = 256,
        verbose: int = 1,
        callbacks: Optional[Union[List[Callback], CallbackList]] = None,
        streaming: bool = False,
    ) -> Dict[str, float]:
        """``streaming=True`` accumulates metric partials on device with
        O(1) memory in the split size (exact for rank metrics and
        logloss/mse; AUC binned to ~1e-4 — metric/metrics.py partials);
        default concatenates predictions like the reference
        (IModel.py:247-255)."""
        self._assert_compiled()
        if not isinstance(callbacks, CallbackList):
            size = getattr(reader, f"get_{split}_dataset_size")()
            callbacks = CallbackList(
                callbacks, add_progbar=verbose != 0, trainer=self,
                verbose=verbose, epochs=1,
                batches=-(-size // batch_size),
            )
        callbacks.on_test_begin()
        if streaming:
            logs = self._collect_metric_partials(reader, split, batch_size, callbacks)
        else:
            predictions, targets = self._collect_predictions(
                reader, split, batch_size, callbacks, "test"
            )
            logs = self.metrics(predictions, targets)
        callbacks.on_test_end(logs)
        return logs

    def predict(
        self,
        reader: DataReader,
        split: str = "test",
        batch_size: int = 256,
        verbose: int = 0,
        callbacks: Optional[Union[List[Callback], CallbackList]] = None,
    ) -> np.ndarray:
        self._assert_compiled()
        if not isinstance(callbacks, CallbackList):
            size = getattr(reader, f"get_{split}_dataset_size")()
            callbacks = CallbackList(
                callbacks, add_progbar=verbose != 0, trainer=self,
                verbose=verbose, epochs=1,
                batches=-(-size // batch_size),
            )
        callbacks.on_predict_begin()
        predictions, _ = self._collect_predictions(
            reader, split, batch_size, callbacks, "predict"
        )
        callbacks.on_predict_end()
        return predictions

    # ------------------------------------------------------------------
    # serving
    # ------------------------------------------------------------------

    def make_serving_fn(self):
        """Jitted pure scorer ``fn(batch) -> prediction`` over the current
        params — the deployment artifact (no reference counterpart: the
        reference serves through the mutable module's predict loop,
        IModel.py:272-308). Params are closed over as constants-by-reference;
        export with ``jax.jit(...).lower(batch).compile()`` for AOT."""
        self._assert_compiled()
        assert self.state is not None, "init_state()/fit() first"
        model, params = self.model, self.state.params

        @jax.jit
        def serve(batch):
            prediction, _ = model.apply({"params": params}, batch, train=False)
            return prediction

        return serve

    def export_serving(self, filepath: str, sample_batch: Batch) -> None:
        """AOT-export the serving function as serialized StableHLO
        (``jax.export``): a deployment artifact loadable without the model
        code or parameters — both are baked in. Shapes are fixed to the
        sample batch's."""
        from jax import export as jax_export

        serve = self.make_serving_fn()
        exported = jax_export.export(serve)(sample_batch)
        os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
        with open(filepath, "wb") as f:
            f.write(exported.serialize())

    @staticmethod
    def load_serving(filepath: str):
        """Load an ``export_serving`` artifact -> callable(batch) -> scores."""
        from jax import export as jax_export

        with open(filepath, "rb") as f:
            exported = jax_export.deserialize(bytearray(f.read()))
        return jax.jit(exported.call)

    # ------------------------------------------------------------------
    # weights (reference IModel.py:73-92, 314-321)
    # ------------------------------------------------------------------

    def save_weights(self, filepath: str) -> None:
        os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
        with open(filepath, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(self.state.params)))

    def load_weights(self, filepath: str) -> None:
        with open(filepath, "rb") as f:
            data = f.read()
        template = jax.device_get(self.state.params)
        self.state = self.state.replace(
            params=serialization.from_bytes(template, data)
        )
        self._eval_step_fn = None

    def save_best_weights(self) -> None:
        self.best_params = jax.device_get(self.state.params)

    def load_best_weights(self) -> None:
        assert self.best_params is not None
        self.state = self.state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, self.best_params)
        )

    # full train-state checkpoint (no reference counterpart — the reference
    # has no true resume, SURVEY §5.4; this saves params + optimizer state +
    # step + PRNG key)
    def save_checkpoint(self, filepath: str) -> None:
        os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
        state = jax.device_get(self.state)
        with open(filepath, "wb") as f:
            pickle.dump(serialization.to_state_dict(state), f)

    def restore_checkpoint(self, filepath: str) -> None:
        assert self.state is not None, "init_state() first (shapes template)"
        with open(filepath, "rb") as f:
            state_dict = pickle.load(f)
        state = serialization.from_state_dict(self.state, state_dict)
        if self._state_shardings is not None:
            # re-place restored host arrays onto the mesh layout (tables land
            # row-sharded again, not host numpy)
            state = jax.tree_util.tree_map(jax.device_put, state,
                                           self._state_shardings)
        self.state = state
