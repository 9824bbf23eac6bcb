"""Device-side rollout engine for collection and evaluation.

The reference's rollout loops (`dagger_trainer.py:249-503`,
`common_trainer.py:228-506`) interleave per-step GPU forwards with host
bookkeeping. TPU-first design: the policy step (UNet -> projection ->
registration -> CMA core) is ONE jitted function over the whole env batch
with the persistent global map donated in HBM — the host only moves raw
observations in and small outputs (waypoint, prog) out. `update_map` steps
(2 of every 3 sim steps, `policy.py:30-32`) compile to a lighter graph
without the policy heads.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from ws_mgmap_tpu.models.policy import BasePolicy, PolicyOutputs
from ws_mgmap_tpu.ops.mapping import init_global_map
from ws_mgmap_tpu.ops.pallas.tuning import with_compile_fallback


class RolloutEngine:
    """compute_dtype: None = fp32 (bit-parity with the reference's eval);
    jnp.bfloat16 = reduced-precision rollout mode for the frozen trunks —
    collection/eval only, parity-exempt, ~1.5-2x step throughput on TPU
    (the reference always rolls out fp32, `common_trainer.py:289`).

    mesh: an optional dp Mesh (parallel.mesh.make_mesh). When it has >1
    ``dp`` devices, act/update_map run under ``shard_map`` with the env
    batch (obs, hidden, global map, masks) sharded over dp — the TPU
    equivalent of the reference's one-sim-pool-per-GPU collection
    parallelism (`env_utils.py:53-66`): each chip of a slice runs the full
    perception/mapping step on its slice of envs, no collectives needed.
    Batch sizes not divisible by the dp extent fall back to the largest
    dividing prefix of the mesh (and to single-device at dp=1), so pausing
    envs mid-eval stays correct."""

    def __init__(self, policy: BasePolicy, variables: Dict[str, Any],
                 num_envs: int, instruction_len: int = 200,
                 compute_dtype=None, mesh: Optional[Mesh] = None):
        self.policy = policy
        self.cfg = policy.cfg
        self.dtype = compute_dtype or jnp.float32
        if compute_dtype is not None:
            variables = jax.tree.map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(
                    np.asarray(x).dtype, np.floating) else x,
                variables)
        self.variables = variables
        self.instruction_len = instruction_len
        self.mesh = (mesh if mesh is not None
                     and dict(zip(mesh.axis_names, mesh.devices.shape)
                              ).get("dp", 1) > 1
                     and jax.process_count() == 1 else None)
        self._shard_cache: Dict[Any, Any] = {}

        def _act_body(variables, obs, hidden, global_map, masks):
            out = policy.apply(
                variables, obs, hidden, masks, global_map, True,
                method=BasePolicy.act)
            if compute_dtype is not None:
                # host consumers (action makers, stores) expect fp32 numerics
                out = out._replace(
                    action=out.action.astype(jnp.float32),
                    prog=out.prog.astype(jnp.float32),
                    ego_map=out.ego_map.astype(jnp.float32),
                    rgb_features=None if out.rgb_features is None
                    else out.rgb_features.astype(jnp.float32),
                    depth_features=None if out.depth_features is None
                    else out.depth_features.astype(jnp.float32))
            return out

        def _update_map_body(variables, obs, global_map, masks):
            ego_map, new_global = policy.apply(
                variables, obs, masks, global_map,
                method=BasePolicy.update_map)
            if compute_dtype is not None:
                ego_map = ego_map.astype(jnp.float32)
            return ego_map, new_global

        @jax.jit
        def _encode_text(variables, tokens):
            return policy.apply(variables, tokens,
                                method=BasePolicy.encode_text)

        self._act_body = _act_body
        self._update_map_body = _update_map_body
        self._act = jax.jit(_act_body, donate_argnums=(3,))
        self._update_map = jax.jit(_update_map_body, donate_argnums=(2,))
        self._encode_text = _encode_text
        self.reset_state(num_envs)

    # -- dp sharding ---------------------------------------------------------
    def _dp_for(self, batch: int) -> int:
        if self.mesh is None:
            return 1
        from ws_mgmap_tpu.parallel.mesh import best_dp
        return best_dp(batch, dict(zip(self.mesh.axis_names,
                                       self.mesh.devices.shape))["dp"])

    def _submesh(self, dp: int) -> Mesh:
        key = ("mesh", dp)
        if key not in self._shard_cache:
            devs = self.mesh.devices.reshape(-1)[:dp]
            self._shard_cache[key] = Mesh(
                np.asarray(devs).reshape(dp), ("dp",))
        return self._shard_cache[key]

    def _place_state(self, dp: int) -> None:
        """Re-place carried state (global map, hidden) onto the active
        submesh: after keep() shrinks the batch, state committed to the
        previous dp's devices would be rejected by the smaller shard_map."""
        if dp <= 1:
            return
        from jax.sharding import NamedSharding
        sub = self._submesh(dp)
        gm_sh = NamedSharding(sub, PartitionSpec("dp"))
        hid_sh = NamedSharding(sub, PartitionSpec(None, "dp"))
        if getattr(self.global_map, "sharding", None) != gm_sh:
            self.global_map = jax.device_put(self.global_map, gm_sh)
        if getattr(self.hidden, "sharding", None) != hid_sh:
            self.hidden = jax.device_put(self.hidden, hid_sh)

    def _sharded_act(self, example_args):
        """shard_map'd act for the current batch size (cached per dp)."""
        b = example_args[1]["rgb"].shape[0]
        dp = self._dp_for(b)
        if dp <= 1:
            return self._act
        key = ("act", dp)
        if key not in self._shard_cache:
            P = PartitionSpec
            out_shapes = jax.eval_shape(self._act_body, *example_args)
            out_specs = PolicyOutputs(**{
                f: (None if getattr(out_shapes, f) is None
                    else (P(None, "dp") if f == "hidden" else P("dp")))
                for f in PolicyOutputs._fields})
            fn = jax.shard_map(
                self._act_body, mesh=self._submesh(dp),
                in_specs=(P(), P("dp"), P(None, "dp"), P("dp"), P("dp")),
                out_specs=out_specs, check_vma=False)
            self._shard_cache[key] = jax.jit(fn, donate_argnums=(3,))
        return self._shard_cache[key]

    def _sharded_update_map(self, batch: int):
        dp = self._dp_for(batch)
        if dp <= 1:
            return self._update_map
        key = ("update_map", dp)
        if key not in self._shard_cache:
            P = PartitionSpec
            fn = jax.shard_map(
                self._update_map_body, mesh=self._submesh(dp),
                in_specs=(P(), P("dp"), P("dp"), P("dp")),
                out_specs=(P("dp"), P("dp")), check_vma=False)
            self._shard_cache[key] = jax.jit(fn, donate_argnums=(2,))
        return self._shard_cache[key]

    # -- state ---------------------------------------------------------------
    def reset_state(self, num_envs: int) -> None:
        self.num_envs = num_envs
        h = self.cfg.hidden_size
        self.hidden = jnp.zeros((2, num_envs, h), self.dtype)
        self.global_map = init_global_map(num_envs, self.cfg.mapper,
                                          dtype=self.dtype)
        self.prev_actions = np.zeros((num_envs, 2), np.float32)
        self.prog = np.zeros((num_envs, 1), np.float32)
        # per-episode instruction cache (tokens key -> encoded features)
        self._text_tokens = None
        self._text_cache = None

    def zero_hidden_at(self, idx: int) -> None:
        """End-of-look-around hidden reset (`dagger_trainer.py:443-445`)."""
        self.hidden = self.hidden.at[:, idx, :].set(0.0)

    def keep(self, keep_indices: Sequence[int]) -> None:
        """Drop paused env slots from all device state
        (`common_trainer.py:141-187` incl. the global-map slice)."""
        idx = jnp.asarray(list(keep_indices), jnp.int32)
        self.hidden = jnp.take(self.hidden, idx, axis=1)
        self.global_map = jnp.take(self.global_map, idx, axis=0)
        self.prev_actions = self.prev_actions[list(keep_indices)]
        self.prog = self.prog[list(keep_indices)]
        self.num_envs = len(keep_indices)
        self._text_tokens = None  # batch rows changed; re-encode next act

    # -- obs ---------------------------------------------------------------
    def batch_obs(self, observations: List[Dict[str, Any]]) -> Dict[str, jnp.ndarray]:
        """Host-side stacking + device upload (batch_obs + transform_obs,
        `common/utils.py:15-45`)."""
        tokens = []
        for o in observations:
            t = np.asarray(o["instruction"]["tokens"]
                           if isinstance(o["instruction"], dict)
                           else o["instruction"], np.int32)
            if t.shape[0] < self.instruction_len:
                t = np.pad(t, (0, self.instruction_len - t.shape[0]))
            tokens.append(t[: self.instruction_len])
        batch = {
            "instruction": np.stack(tokens),
            "rgb": np.stack([np.asarray(o["rgb"], np.float32)
                             for o in observations]),
            "depth": np.stack([np.asarray(o["depth"], np.float32)
                               for o in observations]),
            "gps": np.stack([np.asarray(o["gps"], np.float32)
                             for o in observations]),
            "compass": np.stack([np.asarray(o["compass"], np.float32)
                                 for o in observations]),
        }
        # gps/compass stay fp32: they feed grid/rotation coordinate math
        cast = {"rgb", "depth"}
        return {k: jnp.asarray(v).astype(self.dtype) if k in cast
                else jnp.asarray(v) for k, v in batch.items()}

    # -- steps ---------------------------------------------------------------
    def _with_text(self, obs_batch: Dict[str, jnp.ndarray]
                   ) -> Dict[str, jnp.ndarray]:
        """Attach per-episode cached text features (the 200-step biLSTM is
        a sequential scan; instructions only change on episode boundaries,
        so re-encode only when the token batch changes)."""
        tokens = np.asarray(obs_batch["instruction"])
        if (self._text_tokens is None
                or self._text_tokens.shape != tokens.shape
                or not np.array_equal(self._text_tokens, tokens)):
            self._text_cache = with_compile_fallback(
                self._encode_text, self.variables,
                obs_batch["instruction"])
            self._text_tokens = tokens.copy()
        text, text_pad = self._text_cache
        return dict(obs_batch, text_features=text, text_pad=text_pad)

    def act(self, obs_batch: Dict[str, jnp.ndarray], masks: np.ndarray,
            deterministic: bool = True):
        self._place_state(self._dp_for(obs_batch["rgb"].shape[0]))
        args = (self.variables, self._with_text(obs_batch), self.hidden,
                self.global_map,
                jnp.asarray(masks, np.float32).astype(self.dtype))
        # compile fallback: aggressive kernel params first, conservative on
        # a pool worker that rejects their VMEM footprint (tuning.py)
        out = with_compile_fallback(self._sharded_act(args), *args)
        self.hidden = out.hidden
        self.global_map = out.global_map
        self.prog = np.asarray(out.prog, np.float32)
        return out

    def update_map(self, obs_batch: Dict[str, jnp.ndarray],
                   masks: np.ndarray):
        b = obs_batch["rgb"].shape[0]
        self._place_state(self._dp_for(b))
        ego_map, self.global_map = with_compile_fallback(
            self._sharded_update_map(b), self.variables, obs_batch,
            self.global_map,
            jnp.asarray(masks, np.float32).astype(self.dtype))
        return ego_map
