"""Lane-fused Pallas QP backend vs the XLA structured-ADMM path.

Runs on CPU in Pallas interpreter mode (conftest forces JAX_PLATFORMS=cpu);
the same code compiles to fused kernels on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    get_control,
    get_control_batch,
    init_warmstart,
    init_warmstart_batch,
)
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_to_center
from ft_mpc_tpu.sim.env import SimConfig, batched_rollout, batched_rollout_lanes
from ft_mpc_tpu.solvers.lanes_qp import (
    build_K,
    exact_kinv,
    newton_kinv,
    solve_mpc_qp_lanes,
)
from ft_mpc_tpu.solvers.mpc_qp import (
    StructuredADMMConfig,
    StructuredMPCQP,
    solve_mpc_qp,
)
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import (
    generate_trajectory,
    prepare_center_trajectory,
)


def random_structured_qp(rng, B=4, Nt=15, F=32, T=64):
    n = Nt * 6
    Hq = rng.standard_normal((B, n, 24)).astype(np.float32)
    H = np.einsum("bik,bjk->bij", Hq, Hq) * 0.1 + 2.0 * np.eye(n, dtype=np.float32)
    g = rng.standard_normal((B, n)).astype(np.float32)
    hull_A = rng.standard_normal((B, F, 6)).astype(np.float32)
    h_hull = (np.abs(rng.standard_normal((B, Nt, F))) + 0.5).astype(np.float32)
    G_term = (rng.standard_normal((B, T, n)) * 0.1).astype(np.float32)
    h_term = (np.abs(rng.standard_normal((B, T))) + 0.5).astype(np.float32)
    return StructuredMPCQP(
        *[jnp.asarray(a) for a in (H, g, hull_A, h_hull, G_term, h_term)]
    )


def test_lanes_matches_xla_cold(rng):
    qp = random_structured_qp(rng)
    cfg = StructuredADMMConfig(iters=50, phases=2, rho=1.0)
    s_ref = jax.vmap(lambda q: solve_mpc_qp(q, cfg))(qp)
    s_lan = solve_mpc_qp_lanes(qp, cfg)
    np.testing.assert_allclose(
        np.asarray(s_lan.x), np.asarray(s_ref.x), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_lan.y_hull), np.asarray(s_ref.y_hull), atol=5e-4
    )


def test_lanes_warm_newton_refresh(rng):
    qp = random_structured_qp(rng)
    cfg2 = StructuredADMMConfig(iters=50, phases=2, rho=1.0)
    cold = solve_mpc_qp_lanes(qp, cfg2)
    # perturb H slightly (a relinearization-sized change) and re-solve warm
    dH = 0.01 * jnp.einsum("bik,bjk->bij", qp.H[:, :, :4], qp.H[:, :, :4])
    qp2 = qp._replace(H=qp.H + dH)
    cfg1 = StructuredADMMConfig(iters=50, phases=1, rho=1.0, adapt_clip=1.5)
    s_ref = jax.vmap(
        lambda q, a, b, c: solve_mpc_qp(q, cfg1, y_hull0=a, y_term0=b, rho0=c)
    )(qp2, cold.y_hull, cold.y_term, cold.rho)
    s_lan = solve_mpc_qp_lanes(
        qp2, cfg1, y_hull0=cold.y_hull, y_term0=cold.y_term, rho0=cold.rho,
        kinv0=cold.kinv, newton_iters=3,
    )
    # same QP, slightly different (refreshed vs refactored) metric: both
    # must reach comparable primal residuals and nearby iterates
    assert float(s_lan.r_prim.max()) < 2.0 * float(s_ref.r_prim.max()) + 1e-3
    np.testing.assert_allclose(
        np.asarray(s_lan.x), np.asarray(s_ref.x), atol=5e-3
    )


def test_newton_kinv_accuracy_and_fallback(rng):
    n, B = 90, 3
    Ls = rng.standard_normal((B, n, n)).astype(np.float32) * 0.3
    K = jnp.asarray(
        np.einsum("bik,bjk->bij", Ls, Ls) + 3 * np.eye(n, dtype=np.float32)
    )
    kinv = exact_kinv(K)
    eye = np.eye(n)
    # warm refresh after a bounded drift
    K2 = K * 1.3
    X = newton_kinv(K2, kinv, 3)
    resid = np.max(np.abs(np.einsum("bij,bjk->bik", np.asarray(K2), np.asarray(X)) - eye))
    assert resid < 1e-3
    # garbage warm start must trigger the contractive fallback, not NaNs
    X_bad = newton_kinv(K, -5.0 * kinv, 3)
    assert np.isfinite(np.asarray(X_bad)).all()
    resid_bad = np.max(
        np.abs(np.einsum("bij,bjk->bik", np.asarray(K), np.asarray(X_bad)) - eye)
    )
    assert resid_bad < 1.0  # contracting toward K^{-1}, no blow-up


def _bank_setup(B=4, horizon=8, terminal_mode="empc"):
    dt = 0.1
    params = BodyParams.default(dt)
    pats = [
        [],
        [BrokenThruster(10, 1.0)],
        [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)],
        [BrokenThruster(3, 0.5)],
    ]
    uniq = [
        _build_scenario_with_terminal(
            params, f, DEFAULT_TUNING, terminal_mode=terminal_mode
        )
        for f in pats
    ]
    bank = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *uniq)
    weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
    cfg = MPCConfig(
        horizon=horizon,
        sqp_iters=2,
        admm=StructuredADMMConfig(iters=30, phases=1, rho=50.0, adapt_clip=1.5),
    )
    traj = generate_trajectory("hover", dt, 10)
    x_ref, u_ref = prepare_center_trajectory(
        traj, np.array([0.0, 0.0, 0.6]), 16.8, dt, horizon + 1
    )
    rng = np.random.default_rng(0)
    # initial states near the certified terminal set's region of attraction:
    # far outside it the controller is in feasibility-restoration mode,
    # where closed-loop backend comparison is chaotic (both controllers are
    # valid but tiny arithmetic differences compound).
    x0 = np.zeros((B, 13))
    x0[:, 0:3] = rng.uniform(-0.4, 0.4, (B, 3))
    x0[:, 3:6] = rng.uniform(-0.15, 0.15, (B, 3))
    q = rng.standard_normal((B, 4))
    x0[:, 6:10] = q / np.linalg.norm(q, axis=1, keepdims=True)
    x0[:, 10:13] = rng.uniform(-0.15, 0.15, (B, 3))
    return params, bank, weights, cfg, jnp.asarray(x0), jnp.asarray(x_ref), jnp.asarray(u_ref)


def test_get_control_batch_matches_vmap():
    params, bank, weights, cfg, x0, x_ref_full, u_ref_full = _bank_setup()
    # Backend equivalence is asserted at tight ADMM settings: at the
    # deployed (truncated) settings both backends carry the same ~1e-1
    # truncation error but realize it differently, which is the accuracy
    # gate's budget (benchmarks/accuracy.py), not an equivalence question.
    cfg = cfg._replace(
        admm=StructuredADMMConfig(iters=150, phases=3, rho=50.0, adapt_clip=1.5)
    )
    Nt = cfg.horizon
    x_ref = x_ref_full[: Nt + 1]
    u_ref = u_ref_full[: Nt + 1]
    c0 = jax.vmap(robot_to_center)(bank.r, x0)
    warm_s = jax.vmap(lambda sc, c: init_warmstart(params, sc, cfg, c))(bank, c0)
    warm_b = init_warmstart_batch(params, bank, weights, cfg, c0, x_ref, u_ref)
    out_s = jax.vmap(
        lambda sc, x, w: get_control(params, sc, weights, cfg, x, x_ref, u_ref, w)
    )(bank, x0, warm_s)
    out_b = get_control_batch(params, bank, weights, cfg, x0, x_ref, u_ref, warm_b)
    # first solve: exact metric on both sides -> tight agreement (2e-2 N
    # absorbs active-set/line-search sensitivity of the certified problem)
    np.testing.assert_allclose(
        np.asarray(out_b.u_phys), np.asarray(out_s.u_phys), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_b.wrench), np.asarray(out_s.wrench), atol=2e-2
    )


def test_batched_rollout_lanes_closed_loop():
    """Backend trajectory equality is asserted on the quadratic problem
    class (smooth, large region of attraction).  Under the certified
    terminal ingredients the merit line search sits near discrete alpha
    branches outside the region of attraction, so cross-backend trajectory
    comparison is chaotic there -- the certified closed loop is instead
    smoke-checked in test_batched_rollout_lanes_certified below and gated
    end-to-end by benchmarks/accuracy.py."""
    params, bank, weights, cfg, x0, x_ref_full, u_ref_full = _bank_setup(
        terminal_mode="quadratic"
    )
    sim = SimConfig(steps=12, noise_mode="none")
    keys = jax.random.split(jax.random.key(0), x0.shape[0])
    h_l = batched_rollout_lanes(
        params, bank, weights, cfg, sim, x0, x_ref_full, u_ref_full, keys
    )
    h_x = batched_rollout(
        params, bank, weights, cfg, sim, x0, x_ref_full, u_ref_full, keys
    )
    assert np.isfinite(np.asarray(h_l.u_phys)).all()
    assert np.isfinite(np.asarray(h_l.state)).all()
    # same closed-loop trajectory class: states stay close over the window
    dev = np.max(np.abs(np.asarray(h_l.state) - np.asarray(h_x.state)))
    assert dev < 0.05, dev
    # controller is actually controlling: position error shrinks
    e0 = np.linalg.norm(np.asarray(h_l.c0[:, 0, 0:3] - h_l.x_ref0[:, 0, 0:3]), axis=1)
    eT = np.linalg.norm(np.asarray(h_l.c0[:, -1, 0:3] - h_l.x_ref0[:, -1, 0:3]), axis=1)
    assert (eT < e0).all()


def test_batched_rollout_lanes_certified():
    """Certified (empc) closed loop on the lanes backend: finite, healthy
    residuals, and the controller contracts the position error."""
    params, bank, weights, cfg, x0, x_ref_full, u_ref_full = _bank_setup()
    sim = SimConfig(steps=12, noise_mode="none")
    keys = jax.random.split(jax.random.key(0), x0.shape[0])
    h_l = batched_rollout_lanes(
        params, bank, weights, cfg, sim, x0, x_ref_full, u_ref_full, keys
    )
    assert np.isfinite(np.asarray(h_l.u_phys)).all()
    assert np.isfinite(np.asarray(h_l.state)).all()
    assert float(np.asarray(h_l.r_prim).max()) < 0.1
    e0 = np.linalg.norm(np.asarray(h_l.c0[:, 0, 0:3] - h_l.x_ref0[:, 0, 0:3]), axis=1)
    eT = np.linalg.norm(np.asarray(h_l.c0[:, -1, 0:3] - h_l.x_ref0[:, -1, 0:3]), axis=1)
    assert (eT < e0).all()


# ---------------------------------------------------------------------------
# elastic terminal rows (exact-penalty feasibility restoration) + tail cleanup
# ---------------------------------------------------------------------------


def test_elastic_matches_hard_on_feasible(rng):
    """Exact-penalty theorem: with ||y*||_inf << elastic_y_max, clamping the
    terminal duals changes nothing on a feasible QP -- bit-identical on the
    XLA path and kernel-identical on lanes."""
    qp = random_structured_qp(rng, B=4)
    hard = StructuredADMMConfig(iters=60, phases=2, rho=1.0, elastic_y_max=0.0)
    el = StructuredADMMConfig(iters=60, phases=2, rho=1.0, elastic_y_max=1e3)
    s_h = jax.vmap(lambda q: solve_mpc_qp(q, hard))(qp)
    s_e = jax.vmap(lambda q: solve_mpc_qp(q, el))(qp)
    np.testing.assert_array_equal(np.asarray(s_h.x), np.asarray(s_e.x))
    assert float(jnp.max(s_e.term_gap)) == 0.0
    l_h = solve_mpc_qp_lanes(qp, hard)
    l_e = solve_mpc_qp_lanes(qp, el)
    np.testing.assert_array_equal(np.asarray(l_h.x), np.asarray(l_e.x))
    assert float(jnp.max(l_e.term_gap)) == 0.0


def test_elastic_infeasible_converges_and_reports_gap(rng):
    """Contradictory terminal rows (x_0 <= -1 AND x_0 >= 1) make the QP
    infeasible: the hard solver's r_prim floors at the infeasibility gap at
    any budget (this is what IPOPT reports as 'infeasible' in the
    reference, `spiraling_mpc.py:347-353`), while elastic mode converges
    (small r_prim) and reports the violation as term_gap."""
    qp = random_structured_qp(rng, B=2, T=4)
    n = qp.g.shape[1]
    row = np.zeros((2, 4, n), np.float32)
    row[:, 0, 0] = 1.0   # x_0 <= -1
    row[:, 1, 0] = -1.0  # -x_0 <= -1  (x_0 >= 1)
    ht = np.full((2, 4), 1e8, np.float32)
    ht[:, 0] = -1.0
    ht[:, 1] = -1.0
    qp = qp._replace(G_term=jnp.asarray(row), h_term=jnp.asarray(ht))
    hard = StructuredADMMConfig(iters=400, phases=3, rho=10.0, elastic_y_max=0.0)
    el = StructuredADMMConfig(iters=400, phases=3, rho=10.0, elastic_y_max=1e3)
    s_h = jax.vmap(lambda q: solve_mpc_qp(q, hard))(qp)
    s_e = jax.vmap(lambda q: solve_mpc_qp(q, el))(qp)
    assert float(jnp.min(s_h.r_prim)) > 0.2          # hard mode cannot converge
    assert float(jnp.max(s_e.r_prim)) < 1e-2         # elastic converges
    assert 0.5 < float(jnp.min(s_e.term_gap)) < 1.6  # honest min-violation gap
    # lanes backend agrees with the XLA elastic path
    l_e = solve_mpc_qp_lanes(qp, el)
    np.testing.assert_allclose(
        np.asarray(l_e.term_gap), np.asarray(s_e.term_gap), atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(l_e.x), np.asarray(s_e.x), atol=5e-4)


def test_cleanup_pass_tightens_tail():
    """The tail-cleanup pass (gather worst-K -> exact-factor big-budget
    re-solve -> scatter) must strictly improve the worst QP residuals of a
    deliberately starved base budget."""
    params, bank, weights, cfg0, x0, x_ref_full, u_ref_full = _bank_setup()
    x_ref = x_ref_full[: cfg0.horizon + 1]
    u_ref = u_ref_full[: cfg0.horizon + 1]
    base = cfg0._replace(
        sqp_iters=2,
        admm=cfg0.admm._replace(iters=8, phases=1, rho=50.0, adapt_clip=1.5),
    )
    # cleanup_k covers the whole starved bank: the worst-K ranking is the
    # transient-aware r_prim + du_norm + defect score, so with K < B the
    # top-r_prim row is not guaranteed to be among the cleaned rows of
    # this deliberately under-converged setup.
    clean = base._replace(cleanup_iters=120, cleanup_k=4, cleanup_phases=2)
    c0 = jax.vmap(robot_to_center)(bank.r, x0)

    def solve(cfg):
        warm = init_warmstart_batch(params, bank, weights, cfg, c0, x_ref, u_ref)
        out = get_control_batch(
            params, bank, weights, cfg, c0, x_ref, u_ref, warm
        )
        return np.sort(np.asarray(out.info.r_prim))[::-1]

    rp_base = solve(base)
    rp_clean = solve(clean)
    # the two cleaned rows must improve materially; nothing may regress badly
    assert rp_clean[0] < 0.5 * rp_base[0], (rp_base, rp_clean)
    assert rp_clean[1] < rp_base[1] + 1e-6
