"""Loss functions as pure jnp functions.

Capability parity with the reference loss layer (loss/BPRLoss.py:9-23,
loss/Top1Loss.py:8-22, loss/losses.py:8-21) plus BCE for CTR models. All
losses take ``(prediction, target)`` and a reduction, and are jit/grad
friendly (no shape asserts inside traced code; shapes are validated at trace
time since they are static under XLA).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from pytorchrec_tpu.utils.registry import Registry


def _reduce(values: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(values)
    if reduction == "sum":
        return jnp.sum(values)
    return values


def bpr_loss(prediction: jnp.ndarray, target=None, reduction: str = "mean") -> jnp.ndarray:
    """Pairwise BPR: ``softplus(neg - pos)`` on ``[B, 2]`` input.

    Numerically identical to the reference's stabilized ``softplus(-(pos-neg))``
    (loss/BPRLoss.py:17-21). ``target`` is ignored (pair layout is positional).
    """
    assert prediction.ndim == 2 and prediction.shape[1] == 2, prediction.shape
    pos, neg = prediction[:, 0], prediction[:, 1]
    return _reduce(jax.nn.softplus(neg - pos), reduction)


def top1_loss(prediction: jnp.ndarray, target=None, reduction: str = "mean") -> jnp.ndarray:
    """TOP1: ``sigmoid(neg - pos) + sigmoid(neg^2)`` on ``[B, 2]`` input
    (loss/Top1Loss.py:16-20)."""
    assert prediction.ndim == 2 and prediction.shape[1] == 2, prediction.shape
    pos, neg = prediction[:, 0], prediction[:, 1]
    return _reduce(jax.nn.sigmoid(neg - pos) + jax.nn.sigmoid(neg * neg), reduction)


def mse_loss(prediction: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    return _reduce(jnp.square(prediction - target), reduction)


def bce_loss(prediction: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    """Binary cross entropy on logits (stable log-sigmoid form)."""
    log_p = jax.nn.log_sigmoid(prediction)
    log_not_p = jax.nn.log_sigmoid(-prediction)
    return _reduce(-(target * log_p + (1.0 - target) * log_not_p), reduction)


def softmax_ce_loss(prediction: jnp.ndarray, target=None, reduction: str = "mean") -> jnp.ndarray:
    """Sampled-softmax cross entropy on a positive-first candidate layout.

    ``prediction`` is ``[B, N]`` logits with the positive in column 0 (the
    layout every ranking model in the zoo emits — e.g. reference
    FunkSVD.py:64-65's one-hot-first target). Loss is
    ``-log softmax(logits)[:, 0]``: with N-1 sampled negatives this is
    sampled softmax; with the TwoTower model's in-batch layout it is the
    standard in-batch-negatives contrastive loss. ``target`` is ignored
    (the layout is positional, like bpr/top1). No reference counterpart —
    the reference has no softmax ranking loss; this is the retrieval-family
    training loss (models/two_tower.py).
    """
    assert prediction.ndim == 2 and prediction.shape[1] >= 2, prediction.shape
    return _reduce(-jax.nn.log_softmax(prediction, axis=-1)[:, 0], reduction)


def esmm_loss(prediction: jnp.ndarray, target: jnp.ndarray,
              reduction: str = "mean") -> jnp.ndarray:
    """ESMM entire-space loss (Ma et al. 2018 eq. 3), for
    models/multitask.py::ESMM's ``[B, 2]`` = (ctr_logit, log pCTCVR) layout
    against targets (click, click*conversion):

    ``bce(ctr_logit, click) + bce_from_logprob(log pCTCVR, ctcvr)``

    both over ALL impressions — the CVR tower is supervised only through
    the product, which removes conversion's sample-selection bias. The
    second term's probability arrives in log space (a sum of log-sigmoids,
    always < 0); ``log(1 - p)`` uses the stable ``log(-expm1(log p))``.
    """
    assert prediction.ndim == 2 and prediction.shape[1] == 2, prediction.shape
    ctr_logit, log_p = prediction[:, 0], prediction[:, 1]
    click, ctcvr = target[:, 0], target[:, 1]
    ctr_term = -(click * jax.nn.log_sigmoid(ctr_logit)
                 + (1.0 - click) * jax.nn.log_sigmoid(-ctr_logit))
    log_p = jnp.minimum(log_p, -1e-7)  # keep expm1 strictly negative
    log_not_p = jnp.log(-jnp.expm1(log_p))
    ctcvr_term = -(ctcvr * log_p + (1.0 - ctcvr) * log_not_p)
    return _reduce(ctr_term + ctcvr_term, reduction)


LOSSES: Registry[Callable] = Registry("loss")
LOSSES.register("bpr", bpr_loss)
LOSSES.register("top1", top1_loss)
LOSSES.register("mse", mse_loss)
LOSSES.register("bce", bce_loss)
LOSSES.register("softmax", softmax_ce_loss)
# "bce" already covers plain multi-task [B, T] logits (elementwise mean =
# equal-weighted per-task BCE); "esmm" is the entire-space CTR x CVR loss
LOSSES.register("esmm", esmm_loss)

loss_name_list = list(LOSSES.names())


def get_loss(loss_name: str) -> Callable:
    return LOSSES.get(loss_name)
