"""Native C++ runtime vs numpy reference implementation."""

import itertools
import time

import numpy as np
import pytest

from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope
from ft_mpc_tpu.ops.dynamics import build_thruster_matrix
from ft_mpc_tpu.runtime import batched_wrench_hulls, native_available


def fault_bank(patterns):
    broken = np.zeros((len(patterns), 16))
    intensity = np.zeros((len(patterns), 16))
    for s, pat in enumerate(patterns):
        for i in pat:
            broken[s, i] = 1.0
            intensity[s, i] = 1.0
    return broken, intensity


def test_native_compiles():
    assert native_available(), "C++ runtime failed to build"


def test_native_matches_numpy():
    D = build_thruster_matrix()
    patterns = [(), (10, 11), (0, 5, 12), (3,), (8, 9)]
    broken, intensity = fault_bank(patterns)
    A, b, mask = batched_wrench_hulls(D, 3.4, broken, intensity)
    for s, pat in enumerate(patterns):
        ref = attainable_wrench_polytope(D, 3.4, broken[s], intensity[s])
        n = int(mask[s].sum())
        assert n == ref.num_facets
        # same facet set (order-independent): sort rows of [A|b]
        got = np.hstack([A[s, :n], b[s, :n, None]])
        want = np.hstack([ref.A, ref.b[:, None]])
        got = got[np.lexsort(got.T[::-1])]
        want = want[np.lexsort(want.T[::-1])]
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_native_handles_partial_intensity():
    D = build_thruster_matrix()
    broken = np.zeros((1, 16))
    intensity = np.zeros((1, 16))
    broken[0, 4] = 1.0
    intensity[0, 4] = 0.35
    A, b, mask = batched_wrench_hulls(D, 3.4, broken, intensity)
    ref = attainable_wrench_polytope(D, 3.4, broken[0], intensity[0])
    n = int(mask[0].sum())
    assert n == ref.num_facets
    # every reference facet must be reproduced
    for i in range(n):
        d = np.abs(ref.A - A[0, i]).sum(axis=1) + np.abs(ref.b - b[0, i])
        assert d.min() < 1e-9


@pytest.mark.skipif(not native_available(), reason="no native runtime")
def test_native_is_fast_on_large_bank():
    D = build_thruster_matrix()
    patterns = list(itertools.combinations(range(16), 2))  # all double faults
    broken, intensity = fault_bank(patterns)
    t0 = time.perf_counter()
    A, b, mask = batched_wrench_hulls(D, 3.4, broken, intensity)
    elapsed = time.perf_counter() - t0
    assert mask.sum(axis=1).min() > 0
    # 120 scenarios well under a second on any machine with threads
    assert elapsed < 5.0
