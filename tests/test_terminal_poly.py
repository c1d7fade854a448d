"""Polynomial terminal cost: evaluator, cross-term tables, reference parity.

Validates the round-2 capability-parity item: the reference's certified
terminal cost (quadratic + quartic cross_1 + sqrt-abs cross_2,
`ft_mpc/controllers/tools/terminal_ingredients.py:299-370`) represented as
data tables (`ft_mpc_tpu.terminal.poly`) and importable from the reference's
cached `config/terminal.yaml` artifact without eval.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as la

from ft_mpc_tpu.controllers.spiral_params import SpiralParameters
from ft_mpc_tpu.terminal.poly import (
    assemble_terminal_poly,
    cross_term_tables,
    quadratic_terminal,
    terminal_gradient,
    terminal_hessian_psd,
    terminal_value,
)

REF_YAML = Path("/root/reference/ft_mpc/config/terminal.yaml")

# Reference plant / tuning constants (`sys_model.py:52-60`, `reactive.yaml`).
MASS = 16.8
J = np.diag([0.2, 0.3, 0.25])
Q9 = np.diag([1, 1, 1, 1, 1, 1, 2, 2, 2.0])
R6 = np.diag([0.1, 0.1, 0.1, 0.01, 0.01, 0.01])
K_OMEGA = np.array([1.0, 1.0, 1.0])
DT = 0.1


def _ref_params():
    sp = SpiralParameters.compute(MASS, J, np.zeros(6))
    Minv = np.linalg.inv(sp.M)
    qt_abs = float(np.linalg.norm(Minv.T @ R6 @ Minv))
    return sp, qt_abs


def test_quadratic_parity(rng):
    P = rng.standard_normal((9, 9))
    P = P @ P.T + np.eye(9)
    p = rng.standard_normal(9)
    term = jax.tree.map(jnp.asarray, quadratic_terminal(P, p, 1.5))
    e = jnp.asarray(rng.standard_normal(9))
    assert np.isclose(float(terminal_value(term, e)), float(e @ P @ e + p @ e + 1.5))
    np.testing.assert_allclose(
        np.asarray(terminal_gradient(term, e)), 2 * P @ np.asarray(e) + p, rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(terminal_hessian_psd(term, e)), 2 * P, rtol=1e-12
    )


def test_ad_safe_at_zero():
    """Gradients/Hessians of the monomial tables stay finite at eo = 0."""
    sp, qt_abs = _ref_params()
    term = assemble_terminal_poly(
        np.eye(9), np.zeros(9), 0.0, MASS, J, sp.r, sp.omega_des, Q9, K_OMEGA,
        qt_abs, input_empc_max=0.2,
    )
    term = jax.tree.map(jnp.asarray, term)
    for e in (jnp.zeros(9), jnp.ones(9) * 1e-9, jnp.ones(9)):
        assert bool(jnp.isfinite(terminal_value(term, e)))
        assert bool(jnp.isfinite(terminal_gradient(term, e)).all())
        assert bool(jnp.isfinite(terminal_hessian_psd(term, e)).all())


def test_hessian_psd(rng):
    """The convexified Hessian is PSD even deep in the sqrt-abs concave region."""
    sp, qt_abs = _ref_params()
    term = assemble_terminal_poly(
        np.eye(9) * 0.01, np.zeros(9), 0.0, MASS, J, sp.r, sp.omega_des, Q9,
        K_OMEGA, qt_abs, input_empc_max=0.2,
    )
    term = jax.tree.map(jnp.asarray, term)
    for _ in range(20):
        e = jnp.asarray(rng.uniform(-1.0, 1.0, 9))
        H = np.asarray(terminal_hessian_psd(term, e))
        assert np.linalg.eigvalsh(H).min() > -1e-8


@pytest.mark.skipif(not REF_YAML.exists(), reason="reference artifact not mounted")
def test_reference_yaml_import_matches_sympy(rng):
    """Imported TerminalPoly evaluates the stored expression to 1e-6."""
    import sympy  # noqa: F401  (skip cleanly if unavailable)

    from ft_mpc_tpu.terminal.reference_io import (
        load_reference_terminal_yaml,
        parse_cost_expression,
    )
    import yaml
    import sympy as sp_

    raw = yaml.safe_load(REF_YAML.read_text())
    expr, syms = parse_cost_expression(raw["cost"])
    term, term_set = load_reference_terminal_yaml(REF_YAML, n_poly=8, n_sqrt=16)
    assert term_set.A.shape[1] == 9

    f = sp_.lambdify(syms, expr, modules="numpy")
    term_j = jax.tree.map(jnp.asarray, term)
    E = rng.uniform(-1, 1, (100, 9))
    v_ref = np.array([f(*e) for e in E])
    v_ours = np.asarray(jax.vmap(lambda e: terminal_value(term_j, e))(jnp.asarray(E)))
    rel = np.abs(v_ref - v_ours) / np.maximum(1.0, np.abs(v_ref))
    assert rel.max() < 1e-6


@pytest.mark.skipif(not REF_YAML.exists(), reason="reference artifact not mounted")
def test_cross_tables_match_reference_artifact():
    """Our cross_1/cross_2 coefficient formulas reproduce the reference's
    cached artifact coefficient-by-coefficient (quirk-prefactor mode).

    The only quantity not derivable from plant constants is the artifact's
    eMPC input bound r_empc; it is recovered from the single coefficient it
    reaches (the first cross_2 summand) and every remaining coefficient is
    then a parameter-free prediction.
    """
    from ft_mpc_tpu.terminal.reference_io import load_reference_terminal_yaml

    term, _ = load_reference_terminal_yaml(REF_YAML, n_poly=8, n_sqrt=16)
    sp, qt_abs = _ref_params()

    pc, pp, sc, spw, P_add, _ = cross_term_tables(
        MASS, J, sp.r, sp.omega_des, Q9, K_OMEGA, qt_abs, 1.0, prefactor_all=False
    )
    parsed_s = {
        tuple(pw): c
        for pw, c in zip(np.asarray(term.sqrt_pow), np.asarray(term.sqrt_c))
        if c != 0
    }
    r_empc = parsed_s[tuple(spw[0])] / sc[0]
    assert 0.01 < r_empc < 2.0

    pc, pp, sc, spw, P_add, _ = cross_term_tables(
        MASS, J, sp.r, sp.omega_des, Q9, K_OMEGA, qt_abs, float(r_empc),
        prefactor_all=False,
    )
    parsed_p = {
        tuple(pw): c
        for pw, c in zip(np.asarray(term.poly_pow), np.asarray(term.poly_c))
        if c != 0
    }
    assert len(parsed_p) == 7 and len(parsed_s) == 12
    for pw, c in zip(map(tuple, pp), pc):
        assert abs(parsed_p[pw] - c) <= 1e-9 * abs(c), (pw, parsed_p[pw], c)
    for pw, c in zip(map(tuple, spw), sc):
        assert abs(parsed_s[pw] - c) <= 1e-9 * abs(c), (pw, parsed_s[pw], c)

    # Degree-2 block: parsed omega diagonal = discrete-Lyapunov omega cost
    # (`terminal_ingredients.py:316-321`) + the degree-2 cross_1 rows.
    A_om = np.eye(3) - np.diag(K_OMEGA) * DT
    P_om = la.solve_discrete_lyapunov(
        A_om, Q9[6:9, 6:9] + 2 * qt_abs * np.diag(K_OMEGA) ** 2
    )
    np.testing.assert_allclose(
        np.diag(np.asarray(term.P)[6:9, 6:9]), np.diag(P_om + P_add), rtol=1e-10
    )


def test_sqp_with_poly_terminal():
    """Closed-loop SQP consuming a full polynomial terminal cost stays
    finite and converges (du -> small) under the reference double fault."""
    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.controllers.spiraling import (
        MPCConfig,
        MPCWeights,
        get_control,
        init_warmstart,
        shift_warmstart,
    )
    from ft_mpc_tpu.ops.dynamics import BodyParams, robot_step, robot_to_center
    from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
    from ft_mpc_tpu.terminal.quadratic import quadratic_terminal_ingredients
    from ft_mpc_tpu.utils.faults import BrokenThruster
    from ft_mpc_tpu.utils.trajectory import (
        generate_trajectory,
        prepare_center_trajectory,
    )
    from ft_mpc_tpu.geometry.scenario import build_scenario

    params = BodyParams.default(0.1)
    faults = [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]
    tuning = DEFAULT_TUNING

    # Quadratic ingredients + cross-term tables on top (certified assembly).
    D = np.asarray(params.D)
    ff = np.zeros(16)
    for f in faults:
        ff[f.index] = f.intensity * float(params.max_thrust)
    spp = SpiralParameters.compute(MASS, J, D @ ff)
    P9, p9, c, tset = quadratic_terminal_ingredients(
        np.asarray(tuning["Q"], np.float64), np.asarray(tuning["R"], np.float64),
        spp.M, tuning["k_omega"], 0.1,
    )
    Minv = np.linalg.inv(spp.M)
    qt_abs = float(np.linalg.norm(Minv.T @ R6 @ Minv))
    term = assemble_terminal_poly(
        P9, p9, c, MASS, J, spp.r, spp.omega_des, Q9, K_OMEGA, qt_abs,
        input_empc_max=0.2,
    )
    sc = build_scenario(params, faults, terminal=term, terminal_set=tset)

    weights = MPCWeights.from_diagonals(tuning["Q"], tuning["R"])
    cfg = MPCConfig(
        horizon=10, sqp_iters=3,
        admm=StructuredADMMConfig(iters=60, phases=2, rho=10.0),
    )
    traj = generate_trajectory("hover", 0.1, 6)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.asarray(sc.omega_des), MASS, 0.1, cfg.horizon + 1
    )
    x_ref, u_ref = jnp.asarray(x_ref), jnp.asarray(u_ref)

    x = jnp.zeros(13).at[0].set(0.4).at[9].set(1.0).at[12].set(0.3)
    c0 = robot_to_center(sc.r, x)
    warm = init_warmstart(params, sc, cfg, c0)
    step = jax.jit(get_control, static_argnames=("cfg",))
    n_steps = 30
    for i in range(n_steps):
        out = step(
            params, sc, weights, cfg, x,
            x_ref[i : i + cfg.horizon + 1], u_ref[i : i + cfg.horizon + 1], warm,
        )
        assert bool(jnp.isfinite(out.u_phys).all())
        x = robot_step(params, sc.fault, x, out.u_phys)
        warm = shift_warmstart(out.warm, robot_to_center(sc.r, x))
    assert float(out.info.du_norm) < 0.2  # SQP step settled (transient over)
    assert float(jnp.linalg.norm(out.c0[:3] - x_ref[n_steps, :3])) < 0.3
