"""Visualization smoke tests (Agg backend, no display)."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.controllers.spiraling import MPCConfig, MPCWeights
from ft_mpc_tpu.ops.dynamics import BodyParams, build_thruster_matrix
from ft_mpc_tpu.sim.env import SimConfig, rollout
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory
from ft_mpc_tpu.viz.animate import animate_rollout, thruster_geometry
from ft_mpc_tpu.viz.dashboards import (
    show_direct_inputs,
    show_generalized_inputs,
    show_orbit_errors,
    show_robot_errors,
)


def small_history():
    params = BodyParams.default(0.1)
    sc = _build_scenario_with_terminal(
        params, [BrokenThruster(10, 1.0)], DEFAULT_TUNING
    )
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(horizon=8, sqp_iters=1)
    traj = generate_trajectory("hover", 0.1, 3)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.asarray(sc.omega_des), 16.8, 0.1, 9
    )
    x0 = np.zeros(13)
    x0[9] = 1.0
    hist = rollout(
        params, sc, weights, cfg, SimConfig(steps=6, noise_mode="none"),
        jnp.asarray(x0), jnp.asarray(x_ref), jnp.asarray(u_ref),
        jax.random.key(0),
    )
    return hist, sc, params


def test_thruster_geometry_consistent_with_D():
    """Derived positions/directions must reproduce the allocation matrix."""
    D = build_thruster_matrix()
    poss, dirs = thruster_geometry(D)
    for i in range(16):
        f = D[0:3, i]
        tau = D[3:6, i]
        # force on the body is opposite the exhaust direction
        np.testing.assert_allclose(-dirs[i] * np.linalg.norm(f), f, atol=1e-12)
        # torque = r x f at the drawn position (surface offset is along f,
        # so it contributes nothing to the cross product)
        np.testing.assert_allclose(np.cross(poss[i], f), tau, atol=1e-12)


def test_dashboards_render(tmp_path):
    hist, sc, params = small_history()
    D = np.asarray(params.D)
    for fig in [
        show_direct_inputs(hist),
        show_generalized_inputs(hist, D),
        show_orbit_errors(hist),
        show_robot_errors(hist),
    ]:
        fig.savefig(tmp_path / "f.png")


def test_animation_renders(tmp_path):
    hist, sc, params = small_history()
    animate_rollout(hist, sc, save_path=str(tmp_path / "a.gif"), stride=1, fps=5)
    assert (tmp_path / "a.gif").stat().st_size > 0


def test_polytope_plots(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ft_mpc_tpu.geometry.polytope import Polytope
    from ft_mpc_tpu.viz import plot_polytope_2d, plot_polytope_3d, plot_wrench_sets
    from ft_mpc_tpu.utils.faults import BrokenThruster

    ax = plot_polytope_2d(Polytope.from_box([-1, -1], [1, 2]), show_vertices=True)
    ax.figure.savefig(tmp_path / "p2.png")
    plt.close(ax.figure)

    ax3 = plot_polytope_3d(Polytope.from_box([-1, -1, 0], [1, 2, 1]))
    ax3.figure.savefig(tmp_path / "p3.png")
    plt.close(ax3.figure)

    _, _, params = small_history()
    fig = plot_wrench_sets(
        np.asarray(params.D), 3.4,
        [[], [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]],
        save_path=str(tmp_path / "wrench.png"),
    )
    plt.close(fig)
    assert (tmp_path / "wrench.png").stat().st_size > 0
