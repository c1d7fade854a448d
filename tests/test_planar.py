"""2D freeflyer model family (planar craft embedded in the 3D engine)."""

import jax
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.controllers.spiraling import MPCConfig, MPCWeights
from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope, zonotope_halfspaces
from ft_mpc_tpu.models.planar import (
    build_thruster_matrix_2d,
    planar_body_params,
    planar_fault,
)
from ft_mpc_tpu.sim.env import SimConfig, rollout
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory


def test_planar_matrix_properties():
    D = build_thruster_matrix_2d()
    assert np.all(D[:, 8:] == 0)  # absent thrusters
    assert np.all(D[2:5, :] == 0)  # no z-force, no roll/pitch torque
    # pure +x force attainable with zero torque
    u = np.zeros(16)
    u[2] = u[3] = 1.0
    w = D @ u
    assert w[0] == 2.0 and abs(w[5]) < 1e-12


def test_degenerate_zonotope_planar():
    D = build_thruster_matrix_2d()
    fault = planar_fault([])
    broken = np.zeros(16)
    intensity = np.zeros(16)
    for f in fault:
        broken[f.index] = 1.0
        intensity[f.index] = f.intensity
    P = attainable_wrench_polytope(D, 1.75, broken, intensity)
    # equality rows pin the out-of-plane components to zero
    assert P.contains(np.zeros(6))
    assert not P.contains([0, 0, 0.1, 0, 0, 0])  # z-force unattainable
    assert P.contains([1.0, 0, 0, 0, 0, 0])
    assert not P.contains([20.0, 0, 0, 0, 0, 0])


def test_degenerate_zonotope_volume_cases():
    # rank-2 zonotope in 3-d: facets + equality rows
    G = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
    Z = zonotope_halfspaces(np.zeros(3), G)
    assert Z.contains([0.5, 0.5, 0.0])
    assert not Z.contains([0.5, 0.5, 0.1])
    assert not Z.contains([1.5, 0.5, 0.0])


def test_planar_hover_under_fault():
    params = planar_body_params(0.1)
    faults = planar_fault([BrokenThruster(6, 1.0)])  # +y thruster stuck on
    sc = _build_scenario_with_terminal(params, faults, DEFAULT_TUNING)
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(horizon=12, sqp_iters=2)
    traj = generate_trajectory("hover", 0.1, 20)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.asarray(sc.omega_des), float(params.mass), 0.1, 13
    )
    x0 = np.zeros(13)
    x0[0:2] = [0.5, -0.3]
    x0[9] = 1.0
    hist = rollout(
        params, sc, weights, cfg, SimConfig(steps=100, noise_mode="none"),
        jnp.asarray(x0), jnp.asarray(x_ref), jnp.asarray(u_ref),
        jax.random.key(0),
    )
    state = np.asarray(hist.state)
    assert np.isfinite(state).all()
    # planar invariance: z, vz, roll/pitch rates stay ~0
    assert np.abs(state[:, 2]).max() < 1e-4
    assert np.abs(state[:, 10:12]).max() < 1e-5
    # absent thrusters never commanded
    u = np.asarray(hist.u_phys)
    assert np.abs(u[:, 8:]).max() < 1e-9
    # orbit center converges toward the hover point
    err = np.linalg.norm(
        np.asarray(hist.c0[:, 0:2]) - np.asarray(hist.x_ref0[:, 0:2]), axis=1
    )
    assert err[-1] < err[0] * 0.3
