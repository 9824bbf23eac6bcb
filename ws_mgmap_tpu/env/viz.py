"""Evaluation visualization: frame compositor + video writer.

Re-provides the reference's eval-video pipeline
(`habitat_extensions/utils.py:131-269` + habitat's `generate_video`):
each frame is rgb | top-down occupancy map with agent/waypoint | colorized
27-class egocentric semantic map | text->map attention heatmap, with the
instruction text appended below.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import cv2
import numpy as np

# 27-class palette (label 0 = free space), loosely matching the reference's
# d3-40-colors usage (`habitat_extensions/utils.py:14-128`).
_rng = np.random.RandomState(7)
PALETTE_27 = np.concatenate(
    [np.array([[255, 255, 255]], np.uint8),
     _rng.randint(40, 230, size=(26, 3)).astype(np.uint8)], axis=0)


def colorize_semantic_map(sem: np.ndarray, num_classes: int = 27) -> np.ndarray:
    """[H, W] int labels -> [H, W, 3] uint8."""
    sem = np.clip(np.asarray(sem, np.int64), 0, num_classes - 1)
    return PALETTE_27[sem]


def colorize_heatmap(att: np.ndarray, out_hw=(100, 100)) -> np.ndarray:
    """Attention vector [S] (or [h,w]) -> JET heatmap image."""
    a = np.asarray(att, np.float32)
    if a.ndim == 1:
        s = int(round(len(a) ** 0.5))
        a = a.reshape(s, s)
    a = (a - a.min()) / max(a.max() - a.min(), 1e-8)
    img = cv2.applyColorMap((a * 255).astype(np.uint8), cv2.COLORMAP_JET)
    return cv2.resize(img, out_hw[::-1], interpolation=cv2.INTER_NEAREST)


def top_down_view(sim, waypoint_world=None, size: int = 240) -> np.ndarray:
    """Occupancy top-down with agent pose (+ optional waypoint) marked."""
    scene = getattr(sim, "scene", None)
    if scene is None:
        return np.full((size, size, 3), 200, np.uint8)
    occ = scene.occ.astype(np.uint8)
    img = np.where(occ[..., None] > 0, 60, 255).astype(np.uint8)
    img = np.repeat(img, 3, axis=-1) if img.shape[-1] == 1 else img

    ag = sim.get_agent_state()
    r, c = scene.world_to_cell(ag.position)
    cv2.circle(img, (c, r), 3, (0, 0, 255), -1)
    fwd = sim.forward_vector() if hasattr(sim, "forward_vector") else None
    if fwd is not None:
        r2, c2 = scene.world_to_cell(ag.position + 0.6 * fwd)
        cv2.line(img, (c, r), (c2, r2), (0, 0, 255), 1)
    if waypoint_world is not None:
        wr, wc = scene.world_to_cell(waypoint_world)
        cv2.circle(img, (wc, wr), 3, (255, 0, 0), -1)
    return cv2.resize(img, (size, size), interpolation=cv2.INTER_NEAREST)


def append_text_to_image(image: np.ndarray, text: str,
                         band: int = 40) -> np.ndarray:
    h, w = image.shape[:2]
    canvas = np.full((h + band, w, 3), 255, np.uint8)
    canvas[:h] = image
    cv2.putText(canvas, text[:90], (4, h + 26), cv2.FONT_HERSHEY_SIMPLEX,
                0.45, (0, 0, 0), 1, cv2.LINE_AA)
    return canvas


def legend_panel(num_classes: int = 27, tile: int = 240,
                 names=None) -> np.ndarray:
    """Class-color legend strip (reference `utils.py` legend panel)."""
    img = np.full((tile, 120, 3), 255, np.uint8)
    rows = num_classes
    rh = max(tile // rows, 6)
    for i in range(num_classes):
        y0 = i * rh
        if y0 + rh > tile:
            break
        img[y0:y0 + rh - 1, 4:24] = PALETTE_27[i]
        label = str(i) if names is None else str(names[i])[:10]
        cv2.putText(img, label, (28, y0 + rh - 2), cv2.FONT_HERSHEY_PLAIN,
                    0.6, (0, 0, 0), 1, cv2.LINE_AA)
    return img


def draw_collision(view: np.ndarray, alpha: float = 0.4) -> np.ndarray:
    """Blend a red border band into the egocentric view on collision steps
    (re-provides habitat's `draw_collision`, used by the reference frame
    compositor at `habitat_extensions/utils.py:165-167`)."""
    view = view.copy()
    h, w = view.shape[:2]
    t = max(2, min(h, w) // 20)
    mask = np.zeros((h, w), bool)
    mask[:t] = mask[-t:] = True
    mask[:, :t] = mask[:, -t:] = True
    red = np.array([255, 0, 0], np.float32)
    view[mask] = ((1 - alpha) * view[mask].astype(np.float32)
                  + alpha * red).astype(np.uint8)
    return view


def observations_to_image(
    obs: Dict[str, Any],
    sim=None,
    pred_sem_map: Optional[np.ndarray] = None,
    att_map: Optional[np.ndarray] = None,
    waypoint_world=None,
    tile: int = 240,
    info: Optional[Dict[str, Any]] = None,
) -> np.ndarray:
    """Compose one eval-video frame (reference `utils.py:131-269`)."""
    panels: List[np.ndarray] = []
    rgb = np.asarray(obs["rgb"], np.float32)
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    rgb = cv2.resize(rgb, (tile, tile))
    if (info and isinstance(info.get("collisions"), dict)
            and info["collisions"].get("is_collision")):
        rgb = draw_collision(rgb)  # reference `utils.py:165-167`
    panels.append(rgb)
    if sim is not None:
        panels.append(top_down_view(sim, waypoint_world, size=tile))
    if "semantic_filter" in obs:
        # first-person semantic view (27-class one-hot from the
        # SemanticFilterSensor, reference `utils.py` semantic panel)
        sf = np.asarray(obs["semantic_filter"])
        panels.append(cv2.resize(
            colorize_semantic_map(np.argmax(sf, axis=-1)), (tile, tile),
            interpolation=cv2.INTER_NEAREST))
    if pred_sem_map is not None:
        labels = np.argmax(pred_sem_map, axis=-1) if pred_sem_map.ndim == 3 \
            else pred_sem_map
        panels.append(cv2.resize(colorize_semantic_map(labels), (tile, tile),
                                 interpolation=cv2.INTER_NEAREST))
    elif "gt_semantic_map" in obs:
        panels.append(cv2.resize(
            colorize_semantic_map(obs["gt_semantic_map"]), (tile, tile),
            interpolation=cv2.INTER_NEAREST))
    if att_map is not None:
        panels.append(cv2.resize(colorize_heatmap(att_map), (tile, tile)))
    if pred_sem_map is not None or "gt_semantic_map" in obs:
        panels.append(legend_panel(tile=tile))
    return np.concatenate(panels, axis=1)


def generate_video(video_dir: str, frames: List[np.ndarray], episode_id: str,
                   checkpoint_idx: int = 0,
                   metrics: Optional[Dict[str, float]] = None,
                   fps: int = 10,
                   video_option: Optional[List[str]] = None,
                   tb_writer=None) -> Optional[str]:
    """Write an episode video per `video_option` ("disk" -> mp4 via cv2 with
    a PNG-directory fallback, "tensorboard" -> SummaryWriter.add_video like
    the reference's habitat generate_video, `common_trainer.py:384-396`)."""
    if not frames:
        return None
    video_option = list(video_option or ["disk"])
    metric_str = "-".join(f"{k}={v:.2f}" for k, v in (metrics or {}).items())
    name = f"episode={episode_id}-ckpt={checkpoint_idx}-{metric_str}"
    if "tensorboard" in video_option and tb_writer is not None:
        try:
            import torch

            vid = torch.from_numpy(
                np.stack(frames)).permute(0, 3, 1, 2)[None]  # [1,T,C,H,W]
            tb_writer.add_video(f"episode_{episode_id}", vid,
                                global_step=checkpoint_idx, fps=fps)
        except Exception:
            pass  # tensorboard video needs torch+moviepy; disk still works
    if "disk" not in video_option:
        return None
    os.makedirs(video_dir, exist_ok=True)
    h, w = frames[0].shape[:2]
    path = os.path.join(video_dir, name + ".avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    if writer.isOpened():
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        return path
    # codec unavailable: dump frames
    frame_dir = os.path.join(video_dir, name)
    os.makedirs(frame_dir, exist_ok=True)
    for i, f in enumerate(frames):
        cv2.imwrite(os.path.join(frame_dir, f"{i:05d}.png"),
                    cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    return frame_dir
