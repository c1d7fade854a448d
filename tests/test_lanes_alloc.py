"""Lane-fused allocation kernel vs the vmapped reference path.

The kernel runs in Pallas interpreter mode on CPU (same code path as TPU).
Reference parity: `allocate_thrusters` mirrors the reference's allocation
QP + infeasibility projection (`ft_mpc/controllers/tools/
control_allocator.py:27-95`); this checks the fused kernel against it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.ops.dynamics import BodyParams
from ft_mpc_tpu.solvers.allocation import allocate_thrusters
from ft_mpc_tpu.solvers.lanes_alloc import allocate_thrusters_lanes
from ft_mpc_tpu.utils.faults import BrokenThruster


def _bank(params, reps=2):
    pats = [
        [],
        [BrokenThruster(10, 1.0)],
        [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)],
        [BrokenThruster(3, 0.5)],
    ]
    uniq = [_build_scenario_with_terminal(params, f, DEFAULT_TUNING) for f in pats]
    bank = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *uniq)
    return jax.tree.map(lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)), bank)


def test_lanes_alloc_matches_vmap(rng):
    params = BodyParams.default(0.1)
    bank = _bank(params, reps=8)
    B = bank.u_ub.shape[0]
    # Half small (feasible) and half large (clipped) demands; fp32 inputs
    # as on the deployed path.
    wr = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.5, 0.5, (B // 2, 6)), rng.uniform(-6, 6, (B - B // 2, 6))]
        )
    )

    # Reference path in float64 (x64 test env) = a tighter golden than the
    # deployed fp32; the kernel is compared at fp32 tolerances.
    ref = jax.vmap(
        lambda sc, w: allocate_thrusters(
            w, params.D, sc.u_ub, sc.faulty_force_gen, sc.hull_A, sc.hull_b,
            sc.hull_mask, gen_G=sc.gen_G, gen_c=sc.gen_c, gen_L=sc.gen_L,
            max_thrust=params.max_thrust,
        )
    )(bank, wr)
    new = allocate_thrusters_lanes(
        wr.astype(jnp.float32), params.D, bank.u_ub,
        bank.faulty_force_gen, bank.hull_A, bank.hull_b,
        bank.hull_mask, bank.gen_G, bank.gen_c, bank.gen_L,
        params.max_thrust,
    )

    assert np.isfinite(np.asarray(new.u_phys)).all()
    # Both branches of the feasibility test must be exercised.
    assert 0 < int(np.asarray(ref.was_clipped).sum()) < B
    np.testing.assert_array_equal(
        np.asarray(ref.was_clipped), np.asarray(new.was_clipped)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.used_fallback), np.asarray(new.used_fallback)
    )
    np.testing.assert_allclose(
        np.asarray(new.wrench_clipped), np.asarray(ref.wrench_clipped),
        atol=2e-5,
    )
    # fp32 iteration-order noise between Woodbury and Cholesky x-updates.
    np.testing.assert_allclose(
        np.asarray(new.u_phys), np.asarray(ref.u_phys), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(new.r_prim), np.asarray(ref.r_prim), atol=2e-3
    )


def test_lanes_alloc_non_multiple_batch(rng):
    """B not a multiple of 128 exercises the padding path."""
    params = BodyParams.default(0.1)
    bank = _bank(params, reps=3)  # B = 12
    B = bank.u_ub.shape[0]
    wr = jnp.asarray(rng.uniform(-3, 3, (B, 6)), jnp.float32)
    out = allocate_thrusters_lanes(
        wr, params.D, bank.u_ub, bank.faulty_force_gen,
        bank.hull_A, bank.hull_b, bank.hull_mask,
        bank.gen_G, bank.gen_c, bank.gen_L, params.max_thrust,
    )
    assert out.u_phys.shape == (B, 16)
    assert np.isfinite(np.asarray(out.u_phys)).all()
    # wrench equality holds on the healthy scenarios with modest demands
    w_real = np.asarray(out.u_phys) @ np.asarray(params.D).T
    err = np.abs(w_real - np.asarray(out.wrench_clipped)).max(axis=1)
    assert np.median(err) < 5e-3
