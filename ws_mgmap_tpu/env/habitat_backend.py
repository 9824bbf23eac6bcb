"""Habitat-sim adapter for the SimBackend protocol (optional).

When the habitat-sim/habitat-lab stack (reference `SETUP.md:24-44`) is
installed on the host, this adapter exposes it through the same surface as
:class:`ws_mgmap_tpu.env.sim.FakeSim`, so the whole task/trainer stack is
backend-agnostic. Import is lazy: the TPU framework never requires habitat.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

try:  # pragma: no cover - exercised only on hosts with habitat installed
    import habitat_sim  # noqa: F401

    HABITAT_AVAILABLE = True
except Exception:  # pragma: no cover
    HABITAT_AVAILABLE = False


class HabitatSimBackend:  # pragma: no cover - requires habitat assets
    """Thin wrapper over habitat_sim.Simulator with VLN-CE sensor config."""

    forward_step = 0.25
    turn_angle_deg = 15.0

    def __init__(self, scene_id: str, rgb_hw=(224, 224), depth_hw=(256, 256)):
        if not HABITAT_AVAILABLE:
            raise ImportError(
                "habitat_sim is not installed; use TASK_CONFIG.SIMULATOR."
                "TYPE=FakeSim or install habitat-sim v0.1.5 (SETUP.md)")
        import habitat_sim
        from habitat_sim.utils.settings import make_cfg, default_sim_settings

        settings = dict(default_sim_settings)
        settings.update({
            "scene": scene_id,
            "width": rgb_hw[1], "height": rgb_hw[0],
            "color_sensor": True, "depth_sensor": True,
            "semantic_sensor": True,
        })
        self._sim = habitat_sim.Simulator(make_cfg(settings))
        self._pathfinder = self._sim.pathfinder
        self.record_heading = 0.0  # HeadingSensor side channel (`sensors.py:449`)
        self.last_collided = False  # feeds the Collisions measure

    def reset_agent(self, position, rotation) -> None:
        state = self._sim.get_agent(0).get_state()
        state.position = np.asarray(position, np.float32)
        w, x, y, z = rotation
        import quaternion as _q  # habitat ships numpy-quaternion

        state.rotation = _q.quaternion(w, x, y, z)
        self._sim.get_agent(0).set_state(state)

    def get_agent_state(self):
        from ws_mgmap_tpu.utils.geometry import AgentState

        s = self._sim.get_agent(0).get_state()
        q = s.rotation
        return AgentState(np.asarray(s.position, np.float64),
                          np.array([q.w, q.x, q.y, q.z]))

    def step(self, action: int) -> None:
        names = {1: "move_forward", 2: "turn_left", 3: "turn_right"}
        if action in names:
            self._sim.step(names[action])
            self.last_collided = bool(
                getattr(self._sim, "previous_step_collided", False))

    def geodesic_distance(self, a, b) -> float:
        import habitat_sim
        path = habitat_sim.ShortestPath()
        path.requested_start = np.asarray(a, np.float32)
        path.requested_end = np.asarray(b, np.float32)
        self._pathfinder.find_path(path)
        return float(path.geodesic_distance)

    def get_straight_shortest_path_points(self, a, b) -> List[np.ndarray]:
        import habitat_sim
        path = habitat_sim.ShortestPath()
        path.requested_start = np.asarray(a, np.float32)
        path.requested_end = np.asarray(b, np.float32)
        self._pathfinder.find_path(path)
        return [np.asarray(p, np.float64) for p in path.points]

    def is_navigable(self, p) -> bool:
        return bool(self._pathfinder.is_navigable(np.asarray(p, np.float32)))

    def render(self) -> Dict[str, np.ndarray]:
        obs = self._sim.get_sensor_observations()
        out = {
            "rgb": obs["color_sensor"][..., :3].astype(np.float32),
            "depth": obs["depth_sensor"][..., None].astype(np.float32) / 10.0,
        }
        if "semantic_sensor" in obs:
            out["semantic"] = obs["semantic_sensor"]
        return out
