"""Imitation + auxiliary losses as explicit functions.

Replaces the reference's global `AuxLosses` singleton
(`vlnce_baselines/common/aux_losses.py:4-47`) with a pure loss-dict design:
every monitor returns a per-sample loss vector; :func:`reduce_aux` applies
the validity mask and alpha weights (`aux_losses.py:24-35`). The action loss
mirrors `DaggerTrainer._update_agent` (`dagger_trainer.py:522-531`).

All tensors are episode-major: [N, T, ...].
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ws_mgmap_tpu.ops.pooling import interpolate_area_nhwc, interpolate_nearest_nhwc

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MonitorConfig:
    """Monitor switches + weights (reference `config/default.py:118-129`)."""

    progress: bool = True
    progress_alpha: float = 1.0
    contrastive: bool = True
    contrastive_alpha: float = 1.0
    contrastive_tau: float = 0.07
    prediction: bool = True
    prediction_alpha: float = 0.1

    @classmethod
    def from_config(cls, model_cfg) -> "MonitorConfig":
        m = model_cfg
        return cls(
            progress=m.PROGRESS_MONITOR.use,
            progress_alpha=m.PROGRESS_MONITOR.alpha,
            contrastive=m.CONTRASTIVE_MONITOR.use,
            contrastive_alpha=m.CONTRASTIVE_MONITOR.alpha,
            contrastive_tau=m.CONTRASTIVE_MONITOR.target_tau,
            prediction=m.PREDICTION_MONITOR.use,
            prediction_alpha=m.PREDICTION_MONITOR.alpha,
        )


def action_loss(pred_mean: Array, waypoint: Array, weights: Array) -> Array:
    """Weighted waypoint MSE (`dagger_trainer.py:526-531`).

    pred_mean [N,T,2] raw Gaussian mean; waypoint [N,T,2]; weights [N,T]
    (0 on padding). loss = mean_n( sum_t w*mse / sum_t w ).
    """
    logits = jnp.tanh(pred_mean)
    per_step = jnp.sum((logits - waypoint) ** 2, axis=-1)  # [N, T]
    per_ep = jnp.sum(weights * per_step, axis=1) / jnp.maximum(
        jnp.sum(weights, axis=1), 1e-8)
    return jnp.mean(per_ep)


def prediction_monitor(pred_sem_map: Array, gt_semantic_map: Array) -> Array:
    """CE of hallucinated semantics vs GT map (`policy.py:63-67`).

    pred_sem_map [B,48,48,27] logits; gt_semantic_map [B,100,100] int.
    Returns per-sample loss [B].
    """
    out_hw = pred_sem_map.shape[1:3]  # 48x48 for the 100-cell ego map
    tgt = interpolate_nearest_nhwc(
        gt_semantic_map[..., None].astype(jnp.float32), out_hw
    )[..., 0].astype(jnp.int32)
    logp = jax.nn.log_softmax(pred_sem_map, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(ce, axis=(1, 2))


def contrastive_monitor(att_map: Array, dis_map: Array, tau: float) -> Array:
    """KL(text->map attention || softened GT-path distribution)
    (`policy.py:69-84`). att_map [B,S] (already softmax); dis_map
    [B,100,100] distance transform of the GT path. Returns [B].

    Note the reference normalizes with the *global* (whole-batch) max/min of
    the distance map (`policy.py:76`); replicated here.
    """
    feature_size = int(round(att_map.shape[-1] ** 0.5))
    d = dis_map.astype(jnp.float32)
    dmax, dmin = jnp.max(d), jnp.min(d)
    target = (dmax - d) / jnp.maximum(dmax - dmin, 1e-8)
    target = interpolate_area_nhwc(
        target[..., None], (feature_size, feature_size))[..., 0]
    target = target.reshape(target.shape[0], -1)
    target = jax.nn.softmax(target / tau, axis=1)
    log_pred = jnp.log(jnp.maximum(att_map, 1e-30))
    kl = target * (jnp.log(jnp.maximum(target, 1e-30)) - log_pred)
    kl = jnp.where(target > 0, kl, 0.0)
    return jnp.mean(kl, axis=-1)


def progress_monitor(prog: Array, progress_target: Array) -> Array:
    """MSE of tanh progress head vs oracle progress (`policy.py:86-89`)."""
    return jnp.mean(
        (prog - progress_target.reshape(prog.shape)) ** 2, axis=-1)


def reduce_aux(losses: Dict[str, Tuple[Array, float]], mask: Array) -> Array:
    """Masked weighted sum of per-sample monitors (`aux_losses.py:24-35`).

    losses: name -> (per_sample [B], alpha); mask [B] bool.
    """
    total = 0.0
    denom = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1e-8)
    for _, (vec, alpha) in sorted(losses.items()):
        masked_mean = jnp.sum(vec * mask.astype(vec.dtype)) / denom
        total = total + alpha * masked_mean
    return total


def total_loss(
    pred_mean: Array,
    aux_out: Dict[str, Array],
    batch: Dict[str, Array],
    weights: Array,
    mon: MonitorConfig,
) -> Tuple[Array, Dict[str, Array]]:
    """Full teacher-forcing objective (`dagger_trainer.py:522-533`).

    batch: episode-major obs incl. 'waypoint' [N,T,2] and monitor targets.
    """
    n, t = weights.shape
    a_loss = action_loss(pred_mean, batch["waypoint"][..., :2], weights)

    flat_mask = (weights > 0).reshape(n * t)
    aux = {}
    if mon.prediction and "gt_semantic_map" in batch:
        gt = batch["gt_semantic_map"].reshape(n * t, *batch["gt_semantic_map"].shape[2:])
        ps = aux_out["pred_sem_map"]
        aux["prediction_monitor"] = (
            prediction_monitor(ps.reshape(n * t, *ps.shape[2:]), gt),
            mon.prediction_alpha,
        )
    if mon.contrastive and "gt_path" in batch:
        dis = batch["gt_path"].reshape(n * t, *batch["gt_path"].shape[2:])
        aux["contrastive_monitor"] = (
            contrastive_monitor(
                aux_out["att_map"].reshape(n * t, -1), dis, mon.contrastive_tau),
            mon.contrastive_alpha,
        )
    if mon.progress and "progress" in batch:
        aux["progress_monitor"] = (
            progress_monitor(
                aux_out["prog"].reshape(n * t, 1),
                batch["progress"].reshape(n * t, -1)[:, :1]),
            mon.progress_alpha,
        )

    aux_total = reduce_aux(aux, flat_mask) if aux else jnp.float32(0.0)
    loss = a_loss + aux_total
    metrics = {
        "loss": loss,
        "action_loss": a_loss,
        "aux_loss": aux_total,
    }
    for k, (vec, _) in aux.items():
        metrics[k] = jnp.sum(vec * flat_mask) / jnp.maximum(
            jnp.sum(flat_mask.astype(vec.dtype)), 1e-8)
    return loss, metrics
