"""Viz subsystem: frame composition and video writing."""
import os

import numpy as np

from ws_mgmap_tpu.env.sim import FakeSim
from ws_mgmap_tpu.env.viz import (
    append_text_to_image,
    colorize_heatmap,
    colorize_semantic_map,
    generate_video,
    observations_to_image,
)
from ws_mgmap_tpu.utils.geometry import quat_from_yaw

RNG = np.random.RandomState(11)


def test_frame_composition(tmp_path):
    sim = FakeSim("fake/sceneA")
    sim.reset_agent(sim.scene.sample_navigable(RNG), quat_from_yaw(0.3))
    obs = sim.render()
    obs["gt_semantic_map"] = RNG.randint(0, 27, (100, 100))
    frame = observations_to_image(
        obs, sim=sim,
        pred_sem_map=RNG.randn(48, 48, 27).astype(np.float32),
        att_map=RNG.rand(576).astype(np.float32),
        waypoint_world=np.zeros(3),
    )
    assert frame.dtype == np.uint8 and frame.shape[0] == 240
    assert frame.shape[1] == 4 * 240 + 120  # + legend strip
    frame = append_text_to_image(frame, "walk to the kitchen")
    assert frame.shape[0] == 280

    path = generate_video(str(tmp_path), [frame] * 5, episode_id="e1",
                          metrics={"spl": 0.5})
    assert path is not None and os.path.exists(path)


def test_colorizers():
    sem = colorize_semantic_map(np.arange(27).reshape(27, 1))
    assert sem.shape == (27, 1, 3)
    assert (sem[0] == 255).all()  # free space is white
    heat = colorize_heatmap(np.linspace(0, 1, 576))
    assert heat.shape == (100, 100, 3)


def test_generate_video_tensorboard_option(tmp_path):
    from ws_mgmap_tpu.env.viz import generate_video

    frames = [np.full((32, 48, 3), i * 10, np.uint8) for i in range(5)]

    class FakeTB:
        calls = []

        def add_video(self, tag, vid, global_step=None, fps=None):
            self.calls.append((tag, tuple(vid.shape), global_step, fps))

    tb = FakeTB()
    # tensorboard only: nothing written to disk
    out = generate_video(str(tmp_path / "v"), frames, episode_id="7",
                         checkpoint_idx=3, video_option=["tensorboard"],
                         tb_writer=tb)
    assert out is None
    assert tb.calls == [("episode_7", (1, 5, 3, 32, 48), 3, 10)]
    assert not (tmp_path / "v").exists()

    # both: disk artifact also produced
    out = generate_video(str(tmp_path / "v"), frames, episode_id="7",
                         checkpoint_idx=3, video_option=["disk", "tensorboard"],
                         tb_writer=tb)
    assert out is not None and os.path.exists(out)
    assert len(tb.calls) == 2
