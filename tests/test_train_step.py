"""Teacher-forcing update: correctness, frozen-trunk masking, DP equivalence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from ws_mgmap_tpu.models.policy import BasePolicy, MGMapConfig
from ws_mgmap_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ws_mgmap_tpu.train.losses import MonitorConfig
from ws_mgmap_tpu.train import step as train_step_lib

RNG = np.random.RandomState(7)

CFG = MGMapConfig(
    vocab_size=50,
    instr_hidden=16,
    rgb_output_size=32,
    depth_output_size=16,
    map_output_size=32,
    ego_map_size=20,
    hidden_size=64,
)
N, T, L = 8, 5, 6


def make_batch():
    obs = {
        "instruction": np.tile(
            np.pad(RNG.randint(1, 50, (N, 1, 3)), ((0, 0), (0, 0), (0, L - 3))),
            (1, T, 1),
        ),
        "rgb_features": RNG.randn(N, T, 7, 7, 512).astype(np.float32) * 0.1,
        "depth_features": RNG.randn(N, T, 4, 4, 128).astype(np.float32) * 0.1,
        "rgb_ego_map": RNG.rand(N, T, 20, 20, 64).astype(np.float32),
        "waypoint": RNG.uniform(-0.9, 0.9, (N, T, 2)).astype(np.float32),
        "progress": RNG.rand(N, T, 1).astype(np.float32),
        "gt_path": (RNG.rand(N, T, 20, 20) * 30).astype(np.float32),
        "gt_semantic_map": RNG.randint(0, 27, (N, T, 20, 20)).astype(np.int32),
    }
    weights = np.ones((N, T), np.float32)
    weights[:, -1] = 0.0  # padded tail
    masks = np.ones((N, T), np.float32)
    masks[:, 0] = 0.0
    return {
        "obs": {k: jnp.asarray(v) for k, v in obs.items()},
        "weights": jnp.asarray(weights),
        "not_done_masks": jnp.asarray(masks),
    }


@pytest.fixture(scope="module")
def policy_and_state():
    policy = BasePolicy(CFG)
    batch = make_batch()
    variables = policy.init(
        jax.random.PRNGKey(0), batch["obs"], jnp.zeros((2, N, CFG.hidden_size)),
        batch["not_done_masks"], True, method=BasePolicy.forward_seq,
    )
    opt = train_step_lib.make_optimizer(2.5e-4)
    state = train_step_lib.create_train_state(variables, opt)
    update = train_step_lib.make_train_step(
        policy, opt, MonitorConfig(), CFG.hidden_size)
    return policy, state, update


def test_loss_decreases_on_fixed_batch(policy_and_state):
    _, state, update = policy_and_state
    batch = make_batch()
    jit_update = jax.jit(update)
    losses = []
    for _ in range(6):
        state, metrics = jit_update(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    for k in ("action_loss", "aux_loss", "prediction_monitor",
              "contrastive_monitor", "progress_monitor"):
        assert np.isfinite(float(metrics[k])), k


def test_padding_is_masked(policy_and_state):
    """Changing targets on zero-weight (padded) steps must not change loss."""
    _, state, update = policy_and_state
    batch = make_batch()
    _, m1 = jax.jit(update)(state, batch)

    batch2 = jax.tree.map(lambda x: x, batch)
    wp = np.asarray(batch2["obs"]["waypoint"]).copy()
    wp[:, -1, :] = 123.0  # padded step (weight 0)
    batch2["obs"]["waypoint"] = jnp.asarray(wp)
    _, m2 = jax.jit(update)(state, batch2)
    np.testing.assert_allclose(float(m1["action_loss"]),
                               float(m2["action_loss"]), rtol=1e-6)


def test_frozen_labels():
    fake = {
        "net": {
            "rgb_encoder": {"base_model": {"k": np.zeros(3)}},
            "depth_encoder": {"visual_encoder": {"k": np.zeros(3)}},
            "map_encoder": {"k": np.zeros(3)},
        },
        "action_distribution": {"fc_mean": {"kernel": np.zeros(3)}},
    }
    opt = train_step_lib.make_optimizer(1.0)
    opt_state = opt.init(fake)
    grads = jax.tree.map(lambda x: np.ones_like(x), fake)
    updates, _ = opt.update(grads, opt_state, fake)
    flat = traverse_util.flatten_dict(updates)
    for path, u in flat.items():
        if path[:2] in (("net", "rgb_encoder"), ("net", "depth_encoder")):
            assert np.all(np.asarray(u) == 0.0), path
        else:
            assert np.any(np.asarray(u) != 0.0), path


@pytest.mark.slow
def test_dp8_matches_single_device(policy_and_state):
    """SURVEY §4: the jitted update on 1 vs 8 devices must agree.

    We compare the loss and the *gradients* (after XLA's automatic dp
    all-reduce). Comparing post-Adam parameters is ill-posed: parameters
    with exactly-zero true gradient (e.g. a conv bias feeding BatchNorm)
    receive +-lr updates whose sign is pure reduction-order noise.
    """
    policy, state0, update = policy_and_state
    batch = make_batch()

    def loss_only(params, batch):
        variables = {"params": params, "batch_stats": state0.batch_stats}
        h0 = jnp.zeros((2, N, CFG.hidden_size))
        (pred, aux_out), _ = policy.apply(
            variables, batch["obs"], h0, batch["not_done_masks"], True,
            method=BasePolicy.forward_seq, mutable=["batch_stats"],
        )
        from ws_mgmap_tpu.train.losses import total_loss
        loss, _ = total_loss(pred, aux_out, batch["obs"], batch["weights"],
                             MonitorConfig())
        return loss

    grad_fn = jax.value_and_grad(loss_only)
    l1, g1 = jax.jit(grad_fn)(state0.params, batch)

    mesh = make_mesh(dp=8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    jit8 = jax.jit(
        grad_fn,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))),
        out_shardings=NamedSharding(mesh, P()),
    )
    l8, g8 = jit8(replicate(mesh, state0.params), shard_batch(mesh, batch))

    np.testing.assert_allclose(float(l1), float(l8), rtol=2e-5)
    f1 = traverse_util.flatten_dict(g1)
    f8 = traverse_util.flatten_dict(jax.device_get(g8))
    # BatchNorm statistics couple every element of the (sharded) batch, so
    # reduction-order noise is amplified through large cancelling sums in
    # the BN-backed convs; require tight relative-L2 agreement per tensor.
    for k in f1:
        a = np.asarray(f1[k]).ravel()
        b = np.asarray(f8[k]).ravel()
        denom = np.linalg.norm(a)
        if denom < 1e-5:
            # degenerate direction (e.g. conv bias directly feeding BN has
            # exactly-zero true gradient); both sides are float noise.
            assert np.linalg.norm(b) < 1e-4, "/".join(k)
            continue
        rel_l2 = np.linalg.norm(a - b) / denom
        # Noise floor measured empirically: permuting episodes on a SINGLE
        # device (mathematically invariant) already yields rel-L2 up to
        # ~7e-3 on BN-coupled tensors in fp32. 3e-2 = ~4x that floor.
        assert rel_l2 < 3e-2, ("/".join(k), rel_l2)


@pytest.mark.slow
def test_remat_matches_plain(policy_and_state):
    """jax.checkpoint rematerialization must not change losses/grad flow."""
    _, state, _ = policy_and_state
    batch = make_batch()
    opt = train_step_lib.make_optimizer(2.5e-4)
    upd_plain = train_step_lib.make_train_step(
        policy_and_state[0], opt, MonitorConfig(), CFG.hidden_size)
    upd_remat = train_step_lib.make_train_step(
        policy_and_state[0], opt, MonitorConfig(), CFG.hidden_size, remat=True)
    s1, m1 = jax.jit(upd_plain)(state, batch)
    s2, m2 = jax.jit(upd_remat)(state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)

    # Compare gradients (not Adam updates — see the dp8 test for why):
    policy = policy_and_state[0]

    def loss_only(params, do_remat):
        def forward(p):
            (pred, aux_out), _ = policy.apply(
                {"params": p, "batch_stats": state.batch_stats},
                batch["obs"], jnp.zeros((2, N, CFG.hidden_size)),
                batch["not_done_masks"], True,
                method=BasePolicy.forward_seq, mutable=["batch_stats"])
            return pred, aux_out
        fwd = jax.checkpoint(forward) if do_remat else forward
        pred, aux_out = fwd(params)
        from ws_mgmap_tpu.train.losses import total_loss
        return total_loss(pred, aux_out, batch["obs"], batch["weights"],
                          MonitorConfig())[0]

    g1 = jax.jit(jax.grad(lambda p: loss_only(p, False)))(state.params)
    g2 = jax.jit(jax.grad(lambda p: loss_only(p, True)))(state.params)
    f1 = traverse_util.flatten_dict(g1)
    f2 = traverse_util.flatten_dict(g2)
    for k in f1:
        a = np.asarray(f1[k]).ravel()
        b = np.asarray(f2[k]).ravel()
        denom = np.linalg.norm(a)
        if denom < 1e-5:  # degenerate direction (conv bias feeding BN)
            assert np.linalg.norm(b) < 1e-4, "/".join(k)
            continue
        rel_l2 = np.linalg.norm(a - b) / denom
        assert rel_l2 < 1e-2, ("/".join(k), rel_l2)
