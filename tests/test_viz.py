"""Visualization: sprite IO, geometry helpers, frame rendering (Agg)."""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from ilqr_tpu.utils.geometry import get_boundary, get_closed_curve
from ilqr_tpu.viz.render import imread_mat, make_car_sprite


def test_boundary_straight_line():
    traj = np.zeros((5, 4))
    traj[:, 0] = np.arange(5.0)  # straight along +x, yaw 0
    b = get_boundary(traj, 2.0)
    assert b.shape == (4, 4)  # first row skipped (reference quirk)
    np.testing.assert_allclose(b[:, 1], 1.0, atol=1e-12)  # left at +1
    np.testing.assert_allclose(b[:, 3], -1.0, atol=1e-12)  # right at -1
    np.testing.assert_allclose(b[:, 0], np.arange(1.0, 5.0), atol=1e-12)


def test_closed_curve_shape_and_order():
    b = np.arange(16, dtype=float).reshape(4, 4)
    c = get_closed_curve(b)
    assert c.shape == (2, 8)
    # first point is the LAST left point (reversed), last is last right point
    np.testing.assert_allclose(c[:, 0], [b[-1, 0], b[-1, 1]])
    np.testing.assert_allclose(c[:, -1], [b[-1, 2], b[-1, 3]])


def test_sprite_roundtrip(tmp_path):
    # write a tiny sprite in the reference's text format and read it back
    path = tmp_path / "s.mat.txt"
    data = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4) / 24.0
    with open(path, "w") as f:
        f.write("Convert from PNG\n2 3 4\n")
        for row in data.reshape(-1, 4):
            f.write(" ".join(str(v) for v in row) + "\n")
    back = imread_mat(str(path))
    np.testing.assert_allclose(back, data, atol=1e-6)
    with pytest.raises(ValueError):
        bad = tmp_path / "bad.txt"
        bad.write_text("nope\n")
        imread_mat(str(bad))


def test_make_car_sprite_rgba():
    s = make_car_sprite()
    assert s.ndim == 3 and s.shape[2] == 4
    assert s[:, :, 3].max() == 1.0  # opaque body
    assert s[0, 0, 3] == 0.0  # transparent corners


def test_get_cur_obstacle_states():
    from ilqr_tpu.utils.refline import RoutingLine, get_cur_obstacle_states

    ego = RoutingLine([0, 1], [0, 0], [0, 0])
    a1 = RoutingLine([5, 6], [1, 1], [0.1, 0.1])
    a2 = RoutingLine([9, 10], [2, 2], [0.2, 0.2])
    # reference src/utils.cpp:105-115: line 0 is the ego's, rest are agents
    out = get_cur_obstacle_states([ego, a1, a2], 1)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0], [6.0, 1.0, 0.1])
    np.testing.assert_allclose(out[1], [10.0, 2.0, 0.2])
    assert get_cur_obstacle_states([ego], 0).shape == (0, 3)


def test_animate_demo_replay_smoke(tmp_path):
    """Demo-2 replay renders headless and saves a GIF
    (reference scripts/2-cilqr-motionplanning.py:479-503)."""
    from ilqr_tpu.viz.render import animate_demo_replay

    N = 6
    x = np.zeros((N + 1, 4))
    x[:, 0] = np.arange(N + 1) * 0.5
    x[:, 2] = 5.0
    u = np.tile(np.asarray([0.5, -0.02]), (N, 1))
    obs = np.zeros((2, N + 1, 4))
    obs[0, :, 0] = 6.5 + 0.3 * np.arange(N + 1)
    obs[1, :, 0] = 20.0
    obs[1, :, 1] = 4.0
    out = tmp_path / "demo.gif"
    fig = animate_demo_replay(u, x, obs, length=4.5, width=2.0, acc_max=2.0,
                              out_path=str(out))
    assert out.exists() and out.stat().st_size > 0
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_cilqr_demo_cli_smoke(tmp_path):
    """apps.cilqr_demo runs headless end to end (tiny iteration budget)."""
    from ilqr_tpu.apps.cilqr_demo import main

    assert main(["--no-viz", "--max-iter", "3", "--f32"]) == 0


def test_render_frame_smoke():
    import matplotlib.pyplot as plt
    import jax.numpy as jnp
    from ilqr_tpu.config import GlobalConfig
    from ilqr_tpu.sim.scenario import build_scenario_setup
    from ilqr_tpu.viz.render import render_frame
    from tests.conftest import CONFIG_DIR

    gc = GlobalConfig.from_file(os.path.join(CONFIG_DIR, "scenario_two_straight.yaml"))
    st = build_scenario_setup(gc)
    fig, ax = plt.subplots()
    planned = np.tile(np.asarray([1.0, 0.0, 8.0, 0.0]), (31, 1))
    planned[:, 0] += np.arange(31) * 0.8
    render_frame(ax, st, st.ego_x0, planned, np.asarray([0.5, 0.01]), tick=0)
    assert len(ax.images) >= 2  # car sprites + steering wheel blitted
    plt.close(fig)


def test_plot_wire_car_and_console_smoke():
    """Demo-1 car + console render headless: body outline, 4 wheels with the
    front pair steered, heading arrow, wheel sprite, pedal bars
    (reference scripts/1-lqr-pathtracking.py:59-123)."""
    import matplotlib.pyplot as plt
    from ilqr_tpu.viz.render import plot_tracking_console, plot_wire_car

    fig, ax = plt.subplots()
    plot_wire_car(ax, 3.0, 1.0, 0.4, steer=0.3)
    # 5 polylines (outline + 4 wheels) + 3 arrow segments
    assert len(ax.lines) == 8
    # steered front wheels are rotated: their first segment is not parallel
    # to the rear wheels'
    segs = [l.get_xydata() for l in ax.lines]
    def direction(s):
        d = s[1] - s[0]
        return d / np.hypot(*d)
    rear_dir = direction(segs[2])
    front_dir = direction(segs[1])
    cross = rear_dir[0] * front_dir[1] - rear_dir[1] * front_dir[0]
    assert abs(float(cross)) > 0.25  # ~sin(0.3)
    plot_tracking_console(ax, steer=0.2, acc=-1.5, acc_max=5.0)
    assert len(ax.images) == 1  # steering wheel blit
    assert len(ax.patches) >= 2  # brake + accelerator bars
    plt.close(fig)


def test_lqr_tracking_app_renders(tmp_path):
    """The demo-1 CLI renders the full frame (car + console) headless."""
    from ilqr_tpu.apps.lqr_tracking import main

    out = tmp_path / "frame.png"
    assert main(["--save", str(out)]) == 0
    assert out.exists() and out.stat().st_size > 0
