"""Fault-aware orbit selection (controllers/orbit_search.py).

The reference hard-codes the micro-orbit (`spiral_parameters.py:30-36`);
`select_orbit` keeps that default when certifiable and otherwise searches
for an orbit that makes the terminal certificate feasible (VERDICT r3
next-step 2).  Census on the reference plant: 52/137 patterns certify at
the default, 81 more certify only with a searched orbit, 4 are physically
degenerate (antiparallel surviving thruster columns).
"""

import numpy as np
import pytest

from ft_mpc_tpu.controllers.orbit_search import (
    DEFAULT_F_VIRT,
    DEFAULT_OMEGA,
    DEFAULT_R_DIR,
    select_orbit,
)
from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope
from ft_mpc_tpu.ops.dynamics import BodyParams
from ft_mpc_tpu.utils.faults import BrokenThruster

PARAMS = BodyParams.default(0.1)
D = np.asarray(PARAMS.D)
MT = float(PARAMS.max_thrust)
MASS = float(PARAMS.mass)
J = np.asarray(PARAMS.inertia)


def _hull_and_fault(pattern):
    ff = np.zeros(16)
    for i in pattern:
        ff[i] = MT
    broken = (ff > 0).astype(float)
    return attainable_wrench_polytope(D, MT, broken, ff / MT), D @ ff


@pytest.mark.parametrize("pattern", [(), (10, 11)])
def test_default_orbit_kept_when_certifiable(pattern):
    """Certifiable-at-default patterns return the reference's exact orbit
    (scenarios stay bit-identical to pre-orbit-search rounds)."""
    hull, fgen = _hull_and_fault(pattern)
    c = select_orbit(hull, MASS, J, fgen)
    assert c.certifiable and c.is_default
    assert c.omega_des == DEFAULT_OMEGA
    assert c.r_dir == DEFAULT_R_DIR
    assert c.f_virt_mag == DEFAULT_F_VIRT
    assert c.r_empc > 0.05


def test_adjacent_double_fault_becomes_certifiable():
    """Thrusters 8+9 (both -y) are uncertifiable at the default orbit but
    certify with a fault-aligned orbit at a healthy-class r_empc."""
    hull, fgen = _hull_and_fault((8, 9))
    c = select_orbit(hull, MASS, J, fgen)
    assert c.certifiable and not c.is_default
    assert c.r_empc > 0.09  # same class as default-certifiable patterns
    # the virtual force should point WITH the fault force (-y), not against
    assert c.r_dir[1] < -0.5


def test_degenerate_pattern_reported_uncertifiable():
    """Thrusters 12+13 leave antiparallel z-thruster columns: the
    attainable set is flat, no orbit can certify, and the screen detects
    it without sweeping the candidate grid (fast)."""
    import time

    hull, fgen = _hull_and_fault((12, 13))
    t0 = time.time()
    c = select_orbit(hull, MASS, J, fgen)
    assert not c.certifiable
    assert c.r_empc == 0.0
    assert time.time() - t0 < 5.0  # degeneracy screen, not a full sweep


def test_scenario_build_uses_selected_orbit(tmp_path):
    """`_build_scenario_with_terminal` (empc mode) wires the searched orbit
    into the Scenario: real terminal set, non-default omega_des, and the
    compensation input consistent with the chosen f_virt."""
    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal

    faults = [BrokenThruster(8, 1.0), BrokenThruster(9, 1.0)]
    sc = _build_scenario_with_terminal(
        PARAMS, faults, DEFAULT_TUNING, cache_dir=str(tmp_path)
    )
    # real certified terminal set, not the quadratic fallback's
    assert float(np.asarray(sc.term_mask).sum()) > 0
    om = np.asarray(sc.omega_des)
    assert not np.allclose(om, [0.0, 0.0, 0.6])  # searched orbit in use
    # u_comp = [f_virt; 0] - fault wrench (SpiralParameters semantics)
    fgen = D @ (np.array([0.0] * 8 + [MT, MT] + [0.0] * 6))
    f_virt = np.asarray(sc.u_comp)[:3] + fgen[:3]
    assert abs(np.linalg.norm(f_virt) - 3.5) < 2.6  # searched magnitude grid
    # cached second build is identical
    sc2 = _build_scenario_with_terminal(
        PARAMS, faults, DEFAULT_TUNING, cache_dir=str(tmp_path)
    )
    np.testing.assert_array_equal(
        np.asarray(sc.term_A), np.asarray(sc2.term_A)
    )
    np.testing.assert_array_equal(
        np.asarray(sc.omega_des), np.asarray(sc2.omega_des)
    )


def test_previously_infeasible_pattern_restores_closed_loop(tmp_path):
    """Closed loop on a double-adjacent fault the default orbit cannot
    certify: with the fault-aware orbit the craft converges to its orbit
    center reference and the restoration gap vanishes (beats the
    reference, whose terminal pipeline and IPOPT both fail here:
    `terminal_ingredients.py:57-166`, `spiraling_mpc.py:347-353`)."""
    import jax
    import jax.numpy as jnp

    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.controllers.spiraling import MPCConfig, MPCWeights
    from ft_mpc_tpu.sim.env import SimConfig, rollout
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )

    faults = [BrokenThruster(8, 1.0), BrokenThruster(9, 1.0)]
    sc = _build_scenario_with_terminal(
        PARAMS, faults, DEFAULT_TUNING, cache_dir=str(tmp_path)
    )
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(horizon=15, sqp_iters=2)
    steps = 30
    traj = generate_trajectory("hover", 0.1, (steps + 20) * 0.1)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.asarray(sc.omega_des), MASS, 0.1, 16
    )
    x0 = np.zeros(13)
    x0[0:3] = [0.4, -0.3, 0.2]
    x0[9] = 1.0
    hist = rollout(
        PARAMS, sc, weights, cfg, SimConfig(steps=steps, noise_mode="none"),
        jnp.asarray(x0), jnp.asarray(x_ref), jnp.asarray(u_ref),
        jax.random.key(0),
    )
    assert np.isfinite(np.asarray(hist.state)).all()
    err = np.linalg.norm(
        np.asarray(hist.c0[:, 0:3] - hist.x_ref0[:, 0:3]), axis=1
    )
    assert err[-1] < 0.5 * err[0]  # contracting toward the orbit center
    # restoration resolved: no residual terminal-infeasibility gap
    assert float(np.asarray(hist.term_gap)[-5:].max()) < 1e-3
    # fault respected: stuck thrusters commanded 0 by the allocator
    assert np.abs(np.asarray(hist.u_phys)[:, 8:10]).max() < 1e-6


@pytest.mark.parametrize(
    "fault_dir",
    [
        np.array([0.0, -1.0, 0.0, 0.0, 0.0, 0.0]),       # axis-aligned fault
        np.array([0.7, -0.7, 0.0, 0.0, 0.0, 0.0]),       # diagonal fault
        np.array([0.3, -0.5, 0.81, 0.0, 0.0, 0.0]),      # generic 3-d fault
        np.zeros(6),                                      # healthy
    ],
)
def test_candidates_exactly_perpendicular(fault_dir):
    """Every candidate (omega_des, r_dir) pair must satisfy omega . r = 0:
    the certificate's centripetal cancellation f_virt = m|w|^2 r assumes
    it, and a violation leaves an unmodeled constant acceleration (w.r)w
    that no certificate term budgets for (ADVICE r4 high)."""
    from ft_mpc_tpu.controllers.orbit_search import candidate_orbits

    n = 0
    for omega_des, r_dir, fmag in candidate_orbits(fault_dir):
        w = np.asarray(omega_des)
        rd = np.asarray(r_dir)
        assert abs(float(w @ rd)) < 1e-12 * max(1.0, np.linalg.norm(w))
        assert abs(np.linalg.norm(rd) - 1.0) < 1e-12
        assert np.linalg.norm(w) > 0.1  # projected axes stay renormalized
        n += 1
    assert n >= 48  # grid did not collapse


@pytest.mark.parametrize(
    "omega_des,r_dir",
    [
        ((0.0, 0.0, 0.6), (0.0, 1.0, 0.0)),   # reference default
        ((0.9, 0.0, 0.0), (0.0, -1.0, 0.0)),  # searched: x-spin, -y orbit
        ((0.0, 0.6, 0.0), (0.0, 0.0, 1.0)),   # y-spin, z orbit
        ((0.0, 0.9, 0.0), (0.7, -0.7, 0.0)),  # fault-aligned (non-axis) r_dir
    ],
)
def test_M_matches_center_dynamics_jacobian(omega_des, r_dir):
    """SpiralParameters.M (wrench -> center acceleration) must equal the
    jacobian of the actual center dynamics for ANY orbit direction.  The
    reference hard-codes the r-along-+y special case
    (`spiral_parameters.py:48-57`); the general -[r]x J^-1 form is what
    fault-aware orbit selection relies on."""
    import jax
    import jax.numpy as jnp

    from ft_mpc_tpu.controllers.spiral_params import SpiralParameters
    from ft_mpc_tpu.ops.dynamics import center_dx_dt

    rd = np.asarray(r_dir) / np.linalg.norm(r_dir)
    sp = SpiralParameters.compute(MASS, J, np.zeros(6), omega_des, rd, 2.5)
    # center state at the nominal orbit: identity attitude, omega = omega_des
    c = jnp.zeros(13).at[6:9].set(jnp.asarray(omega_des)).at[12].set(1.0)
    f = lambda u: center_dx_dt(PARAMS, jnp.zeros(6), jnp.asarray(sp.r), c, u)
    Jac = jax.jacfwd(f)(jnp.zeros(6))  # (13, 6)
    M_dyn = np.vstack([np.asarray(Jac)[3:6], np.asarray(Jac)[6:9]])
    np.testing.assert_allclose(M_dyn, sp.M, atol=1e-5)


def test_shared_reference_window_correct_for_searched_orbits(tmp_path):
    """The controller sources the reference's omega rows from the scenario
    (reference semantics: `assign_trajectory` overwrites them with
    omega_des), so a SHARED x_ref window prepared at the default orbit
    must give exactly the same control as one prepared at the scenario's
    own searched orbit -- this is what lets one bank mix orbits."""
    import jax
    import jax.numpy as jnp

    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.controllers.spiraling import (
        MPCConfig,
        MPCWeights,
        get_control,
        init_warmstart,
    )
    from ft_mpc_tpu.ops.dynamics import robot_to_center
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )

    sc = _build_scenario_with_terminal(
        PARAMS, [BrokenThruster(8, 1.0), BrokenThruster(9, 1.0)],
        DEFAULT_TUNING, cache_dir=str(tmp_path),
    )
    assert not np.allclose(np.asarray(sc.omega_des), [0, 0, 0.6])
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(horizon=10, sqp_iters=2)
    traj = generate_trajectory("hover", 0.1, 5)
    outs = []
    for omega in (np.array([0.0, 0.0, 0.6]), np.asarray(sc.omega_des)):
        x_ref, u_ref = prepare_center_trajectory(traj, omega, MASS, 0.1, 11)
        x0 = jnp.zeros(13).at[9].set(1.0).at[0].set(0.3)
        warm = init_warmstart(
            PARAMS, sc, cfg, robot_to_center(sc.r, x0)
        )
        outs.append(
            get_control(
                PARAMS, sc, weights, cfg, x0,
                jnp.asarray(x_ref[:11]), jnp.asarray(u_ref[:11]), warm,
            )
        )
    np.testing.assert_array_equal(
        np.asarray(outs[0].u_phys), np.asarray(outs[1].u_phys)
    )
    np.testing.assert_array_equal(
        np.asarray(outs[0].wrench), np.asarray(outs[1].wrench)
    )


def test_uncertifiable_patterns_proven_impossible():
    """The 4 census-uncertified patterns are structurally uncertifiable
    (ORBITS_r05.json impossibility section): [12,13]/[14,15] by rank
    deficiency of the healthy generator matrix, [12,15]/[13,14] by
    zero-margin body-frame x-torque balance (x-torque support is thrusters
    12-15 only, `ops/dynamics.build_thruster_matrix`; reference parity
    `ft_mpc/models/sys_model.py:73-123`)."""
    from ft_mpc_tpu.ops.dynamics import build_thruster_matrix

    D = np.asarray(build_thruster_matrix())
    fmax = 3.4
    assert np.flatnonzero(np.abs(D[3]) > 1e-12).tolist() == [12, 13, 14, 15]

    for pat in ([12, 13], [14, 15]):
        healthy = [i for i in range(16) if i not in pat]
        G = D[:, healthy]
        assert np.linalg.matrix_rank(G, tol=1e-9) == 5
        u, _, _ = np.linalg.svd(G)
        min_width = min(np.sum(np.abs(u[:, k] @ G)) for k in range(6))
        assert min_width < 1e-12  # attainable set is flat: empty interior

    for pat in ([12, 15], [13, 14]):
        fault_tx = sum(D[3, i] for i in pat) * fmax
        healthy_z = [i for i in (12, 13, 14, 15) if i not in pat]
        ctrl = [D[3, i] * fmax for i in healthy_z]
        reach = sum(c for c in ctrl if c * (-fault_tx) > 0)
        # balance is attainable ONLY at full saturation of both survivors
        np.testing.assert_allclose(reach, -fault_tx, atol=1e-12)
