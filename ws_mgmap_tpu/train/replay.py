"""Replay pipeline: episode records -> episode-major training batches.

Re-provides `IWTrajectoryDataset` + `collate_fn`
(`dagger_trainer.py:40-238`) on top of the native trajstore:
  * writer side: temporal subsample ``ep[24::3]`` after the look-around
    spin, 25..200-step length filter, dtype narrowing
    (`dagger_trainer.py:363-406`, `common_trainer.py:514-532`);
  * reader side: rank/worker index-range sharding, block shuffle with
    length-sorted preloads (`dagger_trainer.py:157-230`), inflection
    weights (all-ones by the reference's own construction,
    `dagger_trainer.py:204`);
  * collate: episode-major [N, T, ...] (dp-shardable, see models.policy.seq)
    padded with fill 1.0 like the reference (`dagger_trainer.py:58-91`),
    zero-padded weights, not-done masks 0 at t=0.
"""
from __future__ import annotations

import random
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ws_mgmap_tpu.data.trajstore import TrajStoreReader, pack_record, unpack_record

NARROW_DTYPES = {
    "vln_oracle_action_sensor": np.uint8,
    "rgb_ego_map": np.float16,
    "gt_path": np.float16,
    "rgb": np.uint8,
    "depth": np.float16,
    "rgb_features": np.float16,
    "depth_features": np.float16,
    "gt_semantic_map": np.int32,
}

EPISODE_OBS_DROP = ("heading", "compass", "gps")  # `dagger_trainer.py:373-378`


def narrow_obs(obs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in obs.items():
        v = np.asarray(v)
        out[k] = v.astype(NARROW_DTYPES[k]) if k in NARROW_DTYPES else v
    return out


def episode_to_record(
    steps: List[Tuple[Dict[str, np.ndarray], np.ndarray, np.ndarray]],
    spin_steps: int = 24,
    step_num: int = 3,
    min_len: int = 25,
    max_len: int = 200,
    ep_id: Optional[str] = None,
) -> Optional[bytes]:
    """(obs, prev_action, oracle_waypoint) per sim step -> packed record.

    Returns None when the episode fails the length filter
    (`dagger_trainer.py:365-369`). `ep_id` (when collecting with unique-
    episode dedup) is stored in the record like the reference's
    `traj_obs['ep_id']` (`dagger_trainer.py:380-381`).
    """
    if len(steps) > max_len or len(steps) < min_len:
        return None
    sub = steps[spin_steps::step_num]
    if not sub:
        return None
    obs_keys = [k for k in sub[0][0] if k not in EPISODE_OBS_DROP]
    obs = {k: np.stack([np.asarray(s[0][k]) for s in sub]) for k in obs_keys}
    obs = narrow_obs(obs)
    record = {
        "obs": obs,
        "prev_actions": np.stack([s[1] for s in sub]).astype(np.float32),
        "oracle_actions": np.stack([s[2] for s in sub]).astype(np.float32),
    }
    if ep_id is not None:
        record["ep_id"] = str(ep_id)
    return pack_record(record)


def _block_shuffle(items: List[int], block_size: int,
                   rng: random.Random) -> List[int]:
    """`dagger_trainer.py:116-119`."""
    blocks = [items[i:i + block_size] for i in range(0, len(items), block_size)]
    rng.shuffle(blocks)
    return [x for b in blocks for x in b]


class ReplayLoader:
    """Iterates collated batches over a trajstore directory."""

    def __init__(
        self,
        directory: str,
        batch_size: int,
        rank: int = 0,
        world_size: int = 1,
        max_len: int = 200,
        seed: int = 0,
        drop_last: bool = True,
        fixed_len: bool = False,
    ):
        self.reader = TrajStoreReader(directory)
        self.batch_size = batch_size
        self.rank = rank
        self.world_size = world_size
        self.max_len = max_len
        # multi-process training needs identical batch shapes on every
        # rank; pad every batch to max_len instead of the batch max
        self.fixed_len = fixed_len
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self) -> int:
        per = len(self.reader) // self.world_size
        return per // self.batch_size if self.drop_last else -(-per // self.batch_size)

    def _drop_page_cache(self):
        """Advise the kernel to drop cached store pages before an epoch
        (`dagger_trainer.py:601-605` posix_fadvise DONTNEED)."""
        import glob as _glob
        import os as _os
        for shard in _glob.glob(_os.path.join(self.reader.directory,
                                              "shard_*.bin")):
            try:
                fd = _os.open(shard, _os.O_RDONLY)
                _os.posix_fadvise(fd, 0, 0, _os.POSIX_FADV_DONTNEED)
                _os.close(fd)
            except OSError:
                pass

    def _batches(self) -> Iterator[Dict[str, Any]]:
        rng = random.Random(self.seed + self._epoch)
        self._epoch += 1
        self._drop_page_cache()
        per = len(self.reader) // self.world_size
        start = per * self.rank
        order = _block_shuffle(list(range(start, start + per)),
                               self.batch_size, rng)
        for i in range(0, len(order), self.batch_size):
            chunk = order[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            eps = [unpack_record(self.reader.get(j)) for j in chunk]
            # length-sorted within the preload block (`:185-192`) — here the
            # block IS the batch, so sorting only stabilizes padding waste.
            eps.sort(key=lambda e: e["prev_actions"].shape[0])
            yield collate_episodes(eps, self.max_len,
                                   fixed_len=self.fixed_len)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        """Background-thread prefetch (the reference's 4 DataLoader workers,
        `dagger_trainer.py:585-594`): decode/collate of batch k+1 overlaps
        the device step on batch k."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2)
        sentinel = object()

        def producer():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()


def collate_episodes(episodes: Sequence[Dict[str, Any]],
                     max_len: int = 200,
                     t_bucket: int = 16,
                     fixed_len: bool = False) -> Dict[str, Any]:
    """Pad + stack to episode-major [N, T, ...] (`dagger_trainer.py:40-113`).

    T is rounded up to a multiple of ``t_bucket`` (capped at max_len) so the
    jitted update sees a handful of static shapes instead of one per batch —
    a TPU-specific addition; padded steps carry zero weight either way.
    Returns {"obs": {...}, "weights": [N,T], "not_done_masks": [N,T]}.
    """
    n = len(episodes)
    if fixed_len:
        t_max = max_len
    else:
        t_max = min(max(e["prev_actions"].shape[0] for e in episodes), max_len)
        if t_bucket > 1:
            t_max = min(-(-t_max // t_bucket) * t_bucket, max_len)

    def pad_stack(key_fn, fill):
        rows = []
        for e in episodes:
            arr = np.asarray(key_fn(e))[:t_max]
            if arr.shape[0] < t_max:
                pad_shape = (t_max - arr.shape[0],) + arr.shape[1:]
                arr = np.concatenate(
                    [arr, np.full(pad_shape, fill, arr.dtype)], axis=0)
            rows.append(arr)
        return np.stack(rows)

    obs_keys = episodes[0]["obs"].keys()
    obs = {}
    for k in obs_keys:
        stacked = pad_stack(lambda e, k=k: e["obs"][k], 1.0)
        if stacked.dtype == np.float16:
            stacked = stacked.astype(np.float32)
        obs[k] = stacked
    prev_actions = pad_stack(lambda e: e["prev_actions"], 0.0)
    weights = np.zeros((n, t_max), np.float32)
    for i, e in enumerate(episodes):
        weights[i, :min(e["prev_actions"].shape[0], t_max)] = 1.0
    masks = np.ones((n, t_max), np.float32)
    masks[:, 0] = 0.0
    return {
        "obs": obs,
        "prev_actions": prev_actions,
        "weights": weights,
        "not_done_masks": masks,
    }
