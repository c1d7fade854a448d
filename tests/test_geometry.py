"""Constraint geometry: zonotope facets vs qhull golden, polytope ops."""

import itertools

import numpy as np
import pytest
from scipy.spatial import ConvexHull

from ft_mpc_tpu.geometry.polytope import Polytope
from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope, zonotope_halfspaces
from ft_mpc_tpu.ops.dynamics import BodyParams, build_thruster_matrix
from ft_mpc_tpu.geometry.scenario import build_scenario, build_scenario_bank
from ft_mpc_tpu.utils.faults import BrokenThruster


def corner_enumeration_hull(D, mt, broken_idx):
    """Reference-semantics golden: enumerate all thruster corners (vectorized)."""
    m = D.shape[1]
    idx = np.arange(2**m, dtype=np.uint32)
    bits = ((idx[:, None] >> np.arange(m)) & 1).astype(np.float64)
    levels = bits * mt
    for i in broken_idx:
        levels[:, i] = mt  # pinned to fault value (intensity 1.0 here)
    return np.unique(levels @ D.T, axis=0)


@pytest.mark.parametrize("broken_idx", [[], [10, 11], [0, 5, 12], [8]])
def test_zonotope_matches_corner_enumeration(broken_idx):
    D = build_thruster_matrix()
    mt = 3.4
    broken = np.zeros(16)
    intensity = np.zeros(16)
    for i in broken_idx:
        broken[i] = 1.0
        intensity[i] = 1.0
    P = attainable_wrench_polytope(D, mt, broken, intensity)
    pts = corner_enumeration_hull(D, mt, broken_idx)
    # Every attainable corner satisfies the halfspaces...
    assert np.max(P.A @ pts.T - P.b[:, None]) < 1e-9
    # ...and every facet is tight (touched by at least one corner) -- the
    # representation is exact, not just an outer bound.
    slack = np.min(P.b[:, None] - P.A @ pts.T, axis=1)
    assert slack.max() < 1e-9


def test_zonotope_small_cases_match_qhull():
    rng = np.random.default_rng(0)
    for _ in range(5):
        G = rng.standard_normal((3, 6))
        c = rng.standard_normal(3)
        Z = zonotope_halfspaces(c, G)
        # enumerate corners
        corners = np.array(list(itertools.product([0.0, 1.0], repeat=6)))
        pts = c + corners @ G.T
        hull = ConvexHull(pts)
        vol_ref = hull.volume
        assert np.max(Z.A @ pts.T - Z.b[:, None]) < 1e-8
        # volume of our polytope equals hull volume (via vertex enumeration)
        verts = Z.vertices()
        vol_ours = ConvexHull(verts).volume
        np.testing.assert_allclose(vol_ours, vol_ref, rtol=1e-6)


def test_polytope_box_and_chebyshev():
    P = Polytope.from_box([-1, -2], [3, 4])
    c, r = P.chebyshev_center()
    assert r == pytest.approx(2.0)
    assert P.contains([0, 0])
    assert not P.contains([4, 0])


def test_polytope_reduce():
    # Redundant constraint x <= 2 inside box |x|,|y| <= 1.
    A = np.array([[1.0, 0], [-1, 0], [0, 1], [0, -1], [1, 0]])
    b = np.array([1.0, 1, 1, 1, 2.0])
    P = Polytope(A, b).reduce()
    assert P.num_facets == 4


def test_minkowski_subtract_ball():
    P = Polytope.from_box([-1, -1], [1, 1]).minkowski_subtract_ball(0.5)
    assert P.contains([0.49, 0.49])
    assert not P.contains([0.51, 0.0])


def test_scenario_bank_shapes():
    params = BodyParams.default(0.1)
    bank = build_scenario_bank(
        params,
        [[], [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)]],
    )
    assert bank.size == 2
    s = bank.scenarios
    assert s.hull_A.shape == (2, 32, 6)
    assert s.u_ub.shape == (2, 16)
    # double-fault scenario: thrusters 10, 11 pinned
    s1 = bank[1]
    assert float(s1.u_ub[10]) == 0.0
    assert float(s1.faulty_force[11]) == pytest.approx(3.4)
    # compensation force: [f_virt;0] - fault wrench
    np.testing.assert_allclose(
        np.asarray(s1.u_comp),
        np.concatenate([[0, 3.5, 0], np.zeros(3)])
        - np.asarray(s1.faulty_force_gen),
        atol=1e-6,
    )
    # orbit radius |f|/(m w^2) along +y
    r_expected = 3.5 / (16.8 * 0.6**2)
    np.testing.assert_allclose(np.asarray(s1.r), [0, r_expected, 0], atol=1e-6)


def test_largest_contained_box():
    from ft_mpc_tpu.geometry.polytope import Polytope

    # Box in a box: optimum is the polytope itself.
    P = Polytope.from_box([-1.0, -2.0], [3.0, 2.0])
    c, w = P.largest_contained_box()
    np.testing.assert_allclose(c, [1.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(w, [2.0, 2.0], atol=1e-4)

    # Simplex x,y >= 0, x + y <= 1: optimum square has w = 1/4 at c = (1/4, 1/4)
    # (maximize log w1 + log w2 s.t. c1+c2+w1+w2 <= 1, w <= c elementwise).
    S = Polytope(np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]]),
                 np.array([1.0, 0.0, 0.0]))
    c, w = S.largest_contained_box()
    np.testing.assert_allclose(w, [0.25, 0.25], atol=1e-3)
    # Contained: all 4 corners inside.
    for sx in (-1, 1):
        for sy in (-1, 1):
            assert S.contains(c + [sx * w[0], sy * w[1]], tol=1e-6)

    # fixed_center mode
    c2, w2 = S.largest_contained_box(fixed_center=np.array([0.3, 0.3]))
    np.testing.assert_allclose(c2, [0.3, 0.3])
    assert S.contains(c2 + w2, tol=1e-6) and S.contains(c2 - w2, tol=1e-6)
