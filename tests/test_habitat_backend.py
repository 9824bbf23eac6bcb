"""Contract test for the habitat-sim adapter (VERDICT r1 missing #2/#8).

habitat_sim is not installable here; this mock implements exactly the API
surface `HabitatSimBackend` consumes (Simulator/agent state/ShortestPath/
pathfinder/sensor observations, habitat-sim v0.1.5 shapes) so the adapter's
marshaling is exercised: wrong attribute names, quaternion order, depth
scaling or path-query protocol would fail here instead of on a TPU-VM host.
"""
import importlib
import sys
import types

import numpy as np
import pytest


class _Quat:
    def __init__(self, w, x, y, z):
        self.w, self.x, self.y, self.z = w, x, y, z


class _AgentState:
    def __init__(self):
        self.position = np.zeros(3, np.float32)
        self.rotation = _Quat(1.0, 0.0, 0.0, 0.0)


class _Agent:
    def __init__(self):
        self._state = _AgentState()

    def get_state(self):
        return self._state

    def set_state(self, s):
        self._state = s


class _ShortestPath:
    def __init__(self):
        self.requested_start = None
        self.requested_end = None
        self.geodesic_distance = 0.0
        self.points = []


class _PathFinder:
    def find_path(self, path):
        a = np.asarray(path.requested_start, np.float64)
        b = np.asarray(path.requested_end, np.float64)
        path.geodesic_distance = float(np.linalg.norm(b - a) * 1.25)
        mid = (a + b) / 2.0
        path.points = [a, mid, b]
        return True

    def is_navigable(self, p):
        return bool(np.all(np.abs(np.asarray(p)) < 100.0))


class _MockSim:
    created = []

    def __init__(self, cfg):
        self.cfg = cfg
        self._agent = _Agent()
        self.pathfinder = _PathFinder()
        self.steps = []
        _MockSim.created.append(self)

    def get_agent(self, idx):
        assert idx == 0
        return self._agent

    def step(self, name):
        self.steps.append(name)
        st = self._agent._state
        if name == "move_forward":
            # habitat convention: forward is -z in the agent frame; with the
            # identity rotation that is -z in world
            st.position = st.position + np.array([0, 0, -0.25], np.float32)

    def get_sensor_observations(self):
        return {
            "color_sensor": np.full((224, 224, 4), 128, np.uint8),
            "depth_sensor": np.full((256, 256), 3.0, np.float32),
            "semantic_sensor": np.ones((224, 224), np.int32),
        }


@pytest.fixture()
def habitat_backend(monkeypatch):
    hs = types.ModuleType("habitat_sim")
    hs.Simulator = _MockSim
    hs.ShortestPath = _ShortestPath
    settings_mod = types.ModuleType("habitat_sim.utils.settings")
    settings_mod.default_sim_settings = {"width": 0, "height": 0}
    settings_mod.make_cfg = lambda s: dict(s)
    utils_mod = types.ModuleType("habitat_sim.utils")
    utils_mod.settings = settings_mod
    hs.utils = utils_mod
    quat_mod = types.ModuleType("quaternion")
    quat_mod.quaternion = _Quat
    monkeypatch.setitem(sys.modules, "habitat_sim", hs)
    monkeypatch.setitem(sys.modules, "habitat_sim.utils", utils_mod)
    monkeypatch.setitem(sys.modules, "habitat_sim.utils.settings", settings_mod)
    monkeypatch.setitem(sys.modules, "quaternion", quat_mod)

    import ws_mgmap_tpu.env.habitat_backend as hb

    hb = importlib.reload(hb)
    assert hb.HABITAT_AVAILABLE
    yield hb
    importlib.reload(hb)  # restore real availability state


def test_adapter_drives_habitat_api(habitat_backend):
    _MockSim.created.clear()
    backend = habitat_backend.HabitatSimBackend("scenes/X.glb")
    assert len(_MockSim.created) == 1
    sim = _MockSim.created[0]
    assert sim.cfg["scene"] == "scenes/X.glb"
    assert sim.cfg["depth_sensor"] and sim.cfg["semantic_sensor"]

    # reset -> state marshaling (SimBackend protocol passes [w,x,y,z],
    # see Episode.start_rotation_quat / geometry.quat_from_coeffs)
    backend.reset_agent([1.0, 0.5, -2.0], [1.0, 0.0, 0.0, 0.0])
    st = backend.get_agent_state()
    np.testing.assert_allclose(st.position, [1.0, 0.5, -2.0])
    np.testing.assert_allclose(st.rotation, [1.0, 0.0, 0.0, 0.0])

    # discrete actions map to habitat action names; STOP (0) is a no-op
    backend.step(0)
    backend.step(1)
    backend.step(2)
    backend.step(3)
    assert sim.steps == ["move_forward", "turn_left", "turn_right"]
    np.testing.assert_allclose(backend.get_agent_state().position,
                               [1.0, 0.5, -2.25])

    # geodesic + shortest path go through habitat_sim.ShortestPath
    d = backend.geodesic_distance([0, 0, 0], [4, 0, 0])
    assert d == pytest.approx(5.0)
    pts = backend.get_straight_shortest_path_points([0, 0, 0], [4, 0, 0])
    assert len(pts) == 3 and np.allclose(pts[1], [2, 0, 0])
    assert backend.is_navigable([1, 0, 1])
    assert not backend.is_navigable([500, 0, 0])

    # sensor marshaling: rgb drops alpha, depth scaled to habitat [0,1]x10
    obs = backend.render()
    assert obs["rgb"].shape == (224, 224, 3)
    assert obs["depth"].shape == (256, 256, 1)
    np.testing.assert_allclose(obs["depth"][0, 0, 0], 0.3)
    assert obs["semantic"].shape == (224, 224)


def test_adapter_satisfies_simbackend_protocol(habitat_backend):
    """The adapter must expose the same surface FakeSim does, so the task
    layer stays backend-agnostic."""
    from ws_mgmap_tpu.env.sim import FakeSim

    surface = ["reset_agent", "get_agent_state", "step", "geodesic_distance",
               "get_straight_shortest_path_points", "is_navigable", "render",
               "forward_step", "turn_angle_deg"]
    for name in surface:
        assert hasattr(habitat_backend.HabitatSimBackend, name), name
        assert hasattr(FakeSim, name), name
