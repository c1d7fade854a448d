"""Terminal-ingredient pipeline: MCAIS, value sampling, UB fit, roundtrip."""

import numpy as np
import pytest

from ft_mpc_tpu.api import DEFAULT_TUNING
from ft_mpc_tpu.controllers.spiral_params import SpiralParameters
from ft_mpc_tpu.geometry.invariant import mcais
from ft_mpc_tpu.geometry.polytope import Polytope
from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope
from ft_mpc_tpu.ops.dynamics import BodyParams
from ft_mpc_tpu.terminal.pipeline import (
    compute_terminal_ingredients,
    empc_ingredients,
    fb_lin_residual,
    fit_quadratic_upper_bound,
    input_bound_box,
    load_terminal_ingredients,
    sample_value_function,
    save_terminal_ingredients,
)
from ft_mpc_tpu.terminal.quadratic import quadratic_terminal_ingredients


def double_fault_setup():
    params = BodyParams.default(0.1)
    D = np.asarray(params.D)
    ff = np.zeros(16)
    ff[10] = ff[11] = 3.4
    sp = SpiralParameters.compute(16.8, np.asarray(params.inertia), D @ ff)
    hull = attainable_wrench_polytope(D, 3.4, (ff > 0).astype(float), ff / 3.4)
    return params, sp, hull


def test_mcais_known_double_integrator():
    # x+ = A_cl x with a stable gain; MCAIS must be invariant and admissible.
    h = 0.5
    Ad = np.array([[1, h], [0, 1]])
    Bd = np.array([[h * h / 2], [h]])
    K = np.array([[0.5, 1.0]])
    A_cl = Ad - Bd @ K
    assert np.max(np.abs(np.linalg.eigvals(A_cl))) < 1
    C = np.vstack([np.eye(2), -np.eye(2), K, -K])
    d = np.array([1.0, 1.0, 1.0, 1.0, 0.4, 0.4])
    P = mcais(A_cl, C, d)
    # invariance: A_cl maps vertices back inside
    for v in P.vertices():
        assert P.contains(A_cl @ v, tol=1e-7)
    # admissibility: contained in the constraint set
    for v in P.vertices():
        assert np.all(C @ v <= d + 1e-7)


def test_fb_residual_zero_at_zero_error():
    _, sp, _ = double_fault_setup()
    params = BodyParams.default(0.1)
    res = fb_lin_residual(
        np.zeros(3), sp.omega_des, sp.r, np.asarray(params.inertia)
    )
    np.testing.assert_allclose(res, 0, atol=1e-12)


def test_fb_quad_coeffs_exact():
    """fb_lin_residual is exactly quadratic; the extracted coefficients must
    reproduce it to round-off at arbitrary (not grid) points."""
    from ft_mpc_tpu.terminal.pipeline import fb_quad_coeffs

    _, sp, _ = double_fault_setup()
    J = np.asarray(BodyParams.default(0.1).inertia)
    H, G, c = fb_quad_coeffs(sp.omega_des, sp.r, J)
    rng = np.random.default_rng(3)
    for _ in range(100):
        e = rng.uniform(-3, 3, 3)
        exact = fb_lin_residual(e, sp.omega_des, sp.r, J)
        quad = np.einsum("i,kij,j->k", e, H, e) + G @ e + c
        np.testing.assert_allclose(quad, exact, atol=1e-11)


def test_fb_bound_is_verified_maximum():
    """The per-facet fb-lin bound is a VERIFIED maximum: 1e5 random samples
    never exceed it with NO safety factor, and it is attained (tight) up to
    sampling resolution -- VERDICT r2 item 4 (replaces the 9^3-grid + 1.1x
    heuristic; reference derives symbolic bounds, terminal_ingredients.py:57-166).
    """
    from ft_mpc_tpu.terminal.pipeline import _fb_bound_per_facet

    params, sp, hull = double_fault_setup()
    J = np.asarray(params.inertia)
    Minv = np.linalg.inv(sp.M)
    acc = Polytope(hull.A @ Minv, hull.b).normalized()
    emax = 0.31  # arbitrary non-grid value
    bound = _fb_bound_per_facet(acc.A, emax, sp.omega_des, sp.r, J)

    rng = np.random.default_rng(0)
    es = rng.uniform(-emax, emax, (100_000, 3))
    # corners included: quadratic maxima over a box often sit at vertices
    corners = emax * np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    es = np.vstack([es, corners])
    w = sp.omega_des + es
    Jw = w @ J.T
    g = np.cross(w, Jw)
    Jinv_g = g @ np.linalg.inv(J).T
    lin = (
        np.cross(w, np.cross(w, sp.r[None, :]))
        - np.cross(sp.omega_des, np.cross(sp.omega_des, sp.r))
        - np.cross(Jinv_g, sp.r[None, :])
    )
    fb = np.concatenate([lin, -Jinv_g], axis=1)  # (N, 6)
    samp = acc.A @ fb.T  # (F, N)
    slack = bound[:, None] - samp
    assert slack.min() >= -1e-9, f"bound violated by {slack.min():.2e}"
    # tight: on facets where the max is positive, sampling comes close
    pos = bound > 1e-6
    gap = bound[pos] - np.maximum(samp[pos].max(axis=1), 0.0)
    assert gap.max() < 0.05 * max(bound.max(), 1e-6)


def test_input_bound_box_is_certified():
    params, sp, hull = double_fault_setup()
    emax, r_empc = input_bound_box(
        hull,
        sp.M,
        np.concatenate([sp.f_virt, np.zeros(3)]),
        np.ones(3),
        sp.omega_des,
        sp.r,
        np.asarray(params.inertia),
    )
    assert r_empc > 0 and emax[0] > 0
    # Spot-check the certificate: worst-case acceleration demands at random
    # (a, eo) inside the certified region stay in the acceleration polytope.
    Minv = np.linalg.inv(sp.M)
    acc = Polytope(hull.A @ Minv, hull.b).normalized()
    rng = np.random.default_rng(0)
    for _ in range(200):
        a = rng.standard_normal(3)
        a = a / np.linalg.norm(a) * r_empc * rng.uniform(0, 1)
        eo = rng.uniform(-emax, emax)
        demand = (
            sp.M @ np.concatenate([sp.f_virt, np.zeros(3)])
            + np.concatenate([a, -1.0 * eo])
            + fb_lin_residual(eo, sp.omega_des, sp.r, np.asarray(params.inertia))
        )
        assert np.all(acc.A @ demand <= acc.b + 1e-6)


def test_value_function_sampling_matches_scipy():
    empc = empc_ingredients(1.0, 1.0, 0.5, 0.1, 5.0, uimax=0.3)
    pts, vals, feas = sample_value_function(empc, horizon=3, grid_step=0.5)
    assert feas.sum() >= 10
    # golden check on a few feasible points via scipy
    from scipy.optimize import minimize

    idx = np.where(feas)[0][:: max(1, feas.sum() // 5)][:5]
    for i in idx:
        x0 = pts[i]

        def cost(u):
            x = x0.copy()
            J = float(x @ empc.Q @ x)
            for k in range(3):
                J += empc.R[0, 0] * u[k] ** 2
                x = empc.Ad @ x + empc.Bd[:, 0] * u[k]
                if k < 2:
                    J += float(x @ empc.Q @ x)
            J += float(x @ empc.P @ x)
            return J

        cons = [
            {"type": "ineq", "fun": lambda u, j=j: empc.uimax - abs(u[j])}
            for j in range(3)
        ]

        def term_con(u):
            x = x0.copy()
            for k in range(3):
                x = empc.Ad @ x + empc.Bd[:, 0] * u[k]
            return empc.domain.b - empc.domain.A @ x

        cons.append({"type": "ineq", "fun": term_con})
        res = minimize(cost, np.zeros(3), constraints=cons, method="SLSQP",
                       options={"maxiter": 300, "ftol": 1e-12})
        assert vals[i] == pytest.approx(res.fun, rel=2e-2, abs=1e-3)


def test_fit_quadratic_upper_bound_property():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, (200, 2))
    vals = 3 * pts[:, 0] ** 2 + pts[:, 1] ** 2 + 0.5 * np.abs(pts[:, 0])
    A2, b2, c = fit_quadratic_upper_bound(pts, vals)
    vhat = np.einsum("mi,ij,mj->m", pts, A2, pts) + pts @ b2 + c
    assert np.all(vhat >= vals - 1e-2)  # upper bound (small tolerance)
    assert np.mean(vhat - vals) < 2.0  # and reasonably tight


def test_full_pipeline_and_roundtrip(tmp_path):
    params, sp, hull = double_fault_setup()
    ti = compute_terminal_ingredients(
        hull=hull,
        M=sp.M,
        f_virt6=np.concatenate([sp.f_virt, np.zeros(3)]),
        omega_des=sp.omega_des,
        r=sp.r,
        mass=16.8,
        inertia=np.asarray(params.inertia),
        dt=0.1,
        Q=np.array(DEFAULT_TUNING["Q"], dtype=np.float64),
        R=np.array(DEFAULT_TUNING["R"], dtype=np.float64),
        k_omega=np.ones(3),
        grid_step=0.25,
    )
    # omega Lyapunov block must match the closed-form quadratic ingredient
    P9q, _, _, _ = quadratic_terminal_ingredients(
        np.array(DEFAULT_TUNING["Q"], dtype=np.float64),
        np.array(DEFAULT_TUNING["R"], dtype=np.float64),
        sp.M,
        np.ones(3),
        0.1,
    )
    np.testing.assert_allclose(ti.P9[6:9, 6:9], P9q[6:9, 6:9], rtol=1e-9)
    assert ti.term_set.contains(np.zeros(9))
    # data-only roundtrip
    p = tmp_path / "t.npz"
    save_terminal_ingredients(ti, p)
    ti2 = load_terminal_ingredients(p)
    np.testing.assert_allclose(ti2.P9, ti.P9)
    np.testing.assert_allclose(ti2.term_set.A, ti.term_set.A)
    assert ti2.meta == ti.meta
