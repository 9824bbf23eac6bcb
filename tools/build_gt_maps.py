#!/usr/bin/env python3
"""Offline GT semantic-map cache builder.

Produces ``data/map_data/semantic/{split}/ep_<id>.npy`` files (480x480,
0.12 m cells, episode-start-centered) consumed by the GT semantic-map
sensor — the cache the reference assumes pre-built (`README.md:41-44`,
`sensors.py:362-410`). Works from preprocessed scene point clouds
(`<scene>_pcloud.npz`, `common/utils.py:124-144`) or from FakeSim scenes.

Usage:
  python tools/build_gt_maps.py --split train --out data/map_data/semantic/train \
      [--episodes data/datasets/.../train.json.gz] [--pcloud-dir DIR] [--fake]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--split", default="train")
    p.add_argument("--out", required=True)
    p.add_argument("--episodes", default=None,
                   help="{split}.json.gz (defaults to the standard layout)")
    p.add_argument("--pcloud-dir", default=None,
                   help="dir of <scene>_pcloud.npz files")
    p.add_argument("--fake", action="store_true",
                   help="build from FakeSim scenes (tests/CI)")
    args = p.parse_args()

    import numpy as np

    from ws_mgmap_tpu.env.dataset import VLNCEDataset, make_fake_dataset
    from ws_mgmap_tpu.env.semantics import (
        build_episode_gt_map, load_scene_pcloud, rasterize_gt_map, slice_scene)
    from ws_mgmap_tpu.env.sim import FakeSim
    from ws_mgmap_tpu.utils.geometry import AgentState, get_sim_location

    if args.fake or not args.episodes or not os.path.exists(args.episodes):
        ds = make_fake_dataset(num_episodes=8)
    else:
        ds = VLNCEDataset.from_file(args.episodes)

    n = 0
    for ep in ds.episodes:
        if args.pcloud_dir:
            scene_name = os.path.splitext(os.path.basename(ep.scene_id))[0]
            (x, y, z), _, labels27 = load_scene_pcloud(
                args.pcloud_dir, scene_name)
            state = AgentState(np.asarray(ep.start_position),
                               ep.start_rotation_quat)
            pose, height = get_sim_location(state)
            xf, yf, lf = slice_scene(x, y, z, labels27, height)
            grid = rasterize_gt_map(xf, yf, lf, pose)
            os.makedirs(args.out, exist_ok=True)
            np.save(os.path.join(args.out, f"ep_{ep.episode_id}.npy"), grid)
        else:
            sim = FakeSim(ep.scene_id)
            build_episode_gt_map(sim, ep, args.out)
        n += 1
    print(f"wrote {n} GT maps to {args.out}")


if __name__ == "__main__":
    main()
