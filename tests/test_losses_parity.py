"""Aux-monitor loss parity vs the reference torch formulas
(`vlnce_baselines/models/policy.py:58-89`, `dagger_trainer.py:505-541`)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ws_mgmap_tpu.train import losses

RNG = np.random.RandomState(21)


def test_prediction_monitor_parity():
    b = 4
    pred = RNG.randn(b, 48, 48, 27).astype(np.float32)
    gt = RNG.randint(0, 27, (b, 100, 100)).astype(np.int64)

    got = np.asarray(losses.prediction_monitor(jnp.asarray(pred), jnp.asarray(gt)))

    t_pred = torch.from_numpy(np.transpose(pred, (0, 3, 1, 2)))
    tgt = F.interpolate(torch.from_numpy(gt).unsqueeze(1).float(),
                        size=(48, 48)).squeeze(1).long()
    want = F.cross_entropy(t_pred, tgt, reduction="none").mean([1, 2]).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_contrastive_monitor_parity():
    b, s = 3, 24
    att_logits = RNG.randn(b, s * s).astype(np.float32)
    att = np.exp(att_logits) / np.exp(att_logits).sum(-1, keepdims=True)
    dis = (RNG.rand(b, 96, 96) * 40).astype(np.float32)
    tau = 0.07

    got = np.asarray(losses.contrastive_monitor(
        jnp.asarray(att), jnp.asarray(dis), tau))

    d = torch.from_numpy(dis)
    target = (d.max() - d) / (d.max() - d.min())  # global max/min quirk
    target = F.interpolate(target.unsqueeze(1), size=[s, s],
                           mode="area").squeeze(1)
    target = target.reshape(b, -1)
    target = F.softmax(target / tau, dim=1)
    pred = torch.from_numpy(att)
    kl = F.kl_div(torch.log(pred), target, reduction="none").mean(-1).numpy()
    np.testing.assert_allclose(got, kl, atol=1e-6, rtol=1e-4)


def test_progress_monitor_parity():
    b = 5
    prog = RNG.uniform(-1, 1, (b, 1)).astype(np.float32)
    target = RNG.rand(b, 1).astype(np.float32)
    got = np.asarray(losses.progress_monitor(jnp.asarray(prog), jnp.asarray(target)))
    want = F.mse_loss(torch.from_numpy(prog), torch.from_numpy(target),
                      reduction="none").mean(-1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_action_loss_parity():
    """Weighted waypoint MSE (`dagger_trainer.py:526-531`), episode-major."""
    n, t = 4, 7
    pred = RNG.randn(n, t, 2).astype(np.float32)
    wp = RNG.uniform(-1, 1, (n, t, 2)).astype(np.float32)
    weights = (RNG.rand(n, t) > 0.3).astype(np.float32)
    weights[:, 0] = 1.0

    got = float(losses.action_loss(jnp.asarray(pred), jnp.asarray(wp),
                                   jnp.asarray(weights)))

    # torch reference computes over [T, N]
    logits = torch.tanh(torch.from_numpy(pred)).permute(1, 0, 2)
    target = torch.from_numpy(wp).permute(1, 0, 2)
    w = torch.from_numpy(weights).t()
    al = F.mse_loss(logits, target, reduction="none").sum(dim=2)
    want = float(((w * al).sum(0) / w.sum(0)).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reduce_aux_masked_weighting():
    vec_a = jnp.asarray(RNG.randn(10).astype(np.float32))
    vec_b = jnp.asarray(RNG.randn(10).astype(np.float32))
    mask = jnp.asarray((RNG.rand(10) > 0.5))
    total = float(losses.reduce_aux(
        {"a": (vec_a, 0.5), "b": (vec_b, 2.0)}, mask))
    m = np.asarray(mask)
    want = 0.5 * np.asarray(vec_a)[m].mean() + 2.0 * np.asarray(vec_b)[m].mean()
    np.testing.assert_allclose(total, want, rtol=1e-5)
