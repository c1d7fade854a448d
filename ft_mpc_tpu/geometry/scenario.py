"""Fault scenarios as batched device tensors.

The reference mutates Python objects per fault (`SystemModel.set_fault`
rebuilds the CasADi graph, `ft_mpc/models/sys_model.py:228-243`; InputBounds
re-runs a 2^16 enumeration, `input_bounds.py:43-76`).  Here a fault pattern
compiles *once*, at bank-build time, into a `Scenario`: a pytree of arrays
(fault wrench, padded attainable-wrench polytope, compensation input,
terminal ingredients).  A `ScenarioBank` stacks scenarios along a leading
axis; every controller/simulator function vmaps over it, and `shard_map`
shards that axis across a TPU mesh.

Mid-trajectory fault switching -- stubbed in the reference
(`examples/sim.py:25-27`) -- is just swapping which bank row a rollout reads
at a given step.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.controllers.spiral_params import SpiralParameters
from ft_mpc_tpu.geometry.polytope import Polytope
from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope
from ft_mpc_tpu.ops.dynamics import BodyParams, FaultState, N_THRUSTERS
from ft_mpc_tpu.terminal.poly import TerminalPoly, quadratic_terminal
from ft_mpc_tpu.utils.faults import BrokenThruster

# Default padding sizes for the scenario tensors.  The reference plant's
# wrench zonotope has 26 facets healthy and under typical fault patterns
# (32 covers every single/double fault of the reference plant; the builder
# raises if a pattern exceeds it, in which case pass a larger value).
MAX_HULL_FACETS = 32
MAX_TERM_FACETS = 64


class Scenario(NamedTuple):
    """All per-fault-pattern data consumed by the controller, as arrays."""

    fault: FaultState
    faulty_force: jnp.ndarray  # (16,) stuck-on thrust per thruster
    faulty_force_gen: jnp.ndarray  # (6,) generalized fault wrench (body frame)
    u_ub: jnp.ndarray  # (16,) per-thruster command upper bound
    # Attainable total-wrench polytope {A w <= b}, padded + masked.
    hull_A: jnp.ndarray  # (F, 6)
    hull_b: jnp.ndarray  # (F,)
    hull_mask: jnp.ndarray  # (F,)
    # Micro-orbit parameters.
    omega_des: jnp.ndarray  # (3,)
    r: jnp.ndarray  # (3,) orbit-center offset (body frame)
    u_comp: jnp.ndarray  # (6,) compensation input
    beta: jnp.ndarray  # (4,) force-aligned frame quaternion (xyzw)
    M: jnp.ndarray  # (6, 6) wrench -> center acceleration
    # Generator-space view of the attainable set (zonotope): total wrench =
    # gen_c + gen_G theta, theta in [0,1]^16 (broken columns zeroed).  Used
    # for the exact FISTA wrench projection and fallback allocation.
    gen_G: jnp.ndarray  # (6, 16)
    gen_c: jnp.ndarray  # (6,)
    gen_L: jnp.ndarray  # scalar ||gen_G||_2^2 (Lipschitz constant)
    # Terminal ingredients (quadratic + polynomial + sqrt-abs cost tables;
    # a purely quadratic cost is the zero-table special case).
    term: TerminalPoly
    term_A: jnp.ndarray  # (T, 9)
    term_b: jnp.ndarray  # (T,)
    term_mask: jnp.ndarray  # (T,)


class ScenarioBank(NamedTuple):
    """A batch of scenarios: same pytree structure with a leading axis."""

    scenarios: Scenario
    size: int

    def __getitem__(self, i: int) -> Scenario:
        return jax.tree.map(lambda x: x[i], self.scenarios)


def build_scenario(
    params: BodyParams,
    faults: Sequence[BrokenThruster] = (),
    terminal: TerminalPoly | None = None,
    terminal_set: Polytope | None = None,
    max_hull_facets: int = MAX_HULL_FACETS,
    max_term_facets: int = MAX_TERM_FACETS,
    omega_des=(0.0, 0.0, 0.6),
    r_dir=(0.0, 1.0, 0.0),
    f_virt_mag: float = 3.5,
    precomputed_hull: tuple | None = None,
) -> Scenario:
    """Compile one fault pattern into device tensors (host-side, runs once)."""
    D = np.asarray(params.D)
    max_thrust = float(params.max_thrust)
    mass = float(params.mass)
    inertia = np.asarray(params.inertia)

    fault = FaultState.from_faults(faults)
    broken = np.asarray(fault.broken)
    intensity = np.asarray(fault.intensity)

    faulty_force = broken * intensity * max_thrust
    faulty_force_gen = D @ faulty_force
    u_ub = np.where(broken > 0.5, 0.0, max_thrust)

    if precomputed_hull is not None:
        hull_A, hull_b, hull_mask = precomputed_hull
    else:
        hull = attainable_wrench_polytope(D, max_thrust, broken, intensity)
        hull_A, hull_b, hull_mask = hull.as_padded(max_hull_facets)

    sp = SpiralParameters.compute(
        mass, inertia, faulty_force_gen, omega_des, r_dir, f_virt_mag
    )

    gen_G = D * max_thrust * (broken < 0.5)[None, :]
    gen_L = max(float(np.linalg.norm(gen_G, 2) ** 2), 1e-9)

    if terminal is None:
        # Placeholder P = 0; callers normally pass a DARE/pipeline-based cost.
        terminal = quadratic_terminal(np.zeros((9, 9)), np.zeros(9), 0.0)
    if terminal_set is None:
        term_A = np.zeros((max_term_facets, 9))
        term_b = np.ones(max_term_facets)
        term_mask = np.zeros(max_term_facets)
    else:
        term_A, term_b, term_mask = terminal_set.as_padded(max_term_facets)

    # Host-side numpy throughout: each jnp.asarray would be a separate
    # host->device transfer (and through a remote-compile tunnel, a separate
    # round trip).  Leaves stay numpy; jit/device_put moves the whole bank in
    # one shot when it is first used.
    f_dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    as_f = lambda x: np.asarray(x, dtype=f_dtype)
    terminal = terminal._replace(
        P=as_f(terminal.P),
        p=as_f(terminal.p),
        c=as_f(terminal.c),
        poly_c=as_f(terminal.poly_c),
        poly_pow=np.asarray(terminal.poly_pow, dtype=np.int32),
        sqrt_c=as_f(terminal.sqrt_c),
        sqrt_pow=np.asarray(terminal.sqrt_pow, dtype=np.int32),
        app=as_f(terminal.app),
    )
    return Scenario(
        fault=fault,
        faulty_force=as_f(faulty_force),
        faulty_force_gen=as_f(faulty_force_gen),
        u_ub=as_f(u_ub),
        hull_A=as_f(hull_A),
        hull_b=as_f(hull_b),
        hull_mask=as_f(hull_mask),
        omega_des=as_f(sp.omega_des),
        r=as_f(sp.r),
        u_comp=as_f(sp.compensation_force),
        beta=as_f(sp.beta),
        M=as_f(sp.M),
        gen_G=as_f(gen_G),
        gen_c=as_f(faulty_force_gen),
        gen_L=as_f(gen_L),
        term=terminal,
        term_A=as_f(term_A),
        term_b=as_f(term_b),
        term_mask=as_f(term_mask),
    )


def stack_scenarios(scenarios: Sequence[Scenario]) -> ScenarioBank:
    """Stack host-built scenarios into a batched bank (leading scenario axis)."""
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *scenarios)
    return ScenarioBank(scenarios=stacked, size=len(scenarios))


def build_randomized_bank(
    params0: BodyParams,
    n: int,
    seed: int = 0,
    fault_pool: Sequence[Sequence[BrokenThruster]] | None = None,
    mass_range: tuple = (0.85, 1.15),
    inertia_range: tuple = (0.8, 1.2),
    tuning: dict | None = None,
    max_hull_facets: int = MAX_HULL_FACETS,
):
    """Randomized (fault pattern x initial state x inertia) scenario bank.

    BASELINE config 5: each of the n rows draws a fault pattern from the
    pool (healthy + all singles + all doubles by default), a mass/inertia
    perturbation around the `data/InertialProperties.md` constants (the
    values the reference hard-codes at `ft_mpc/models/sys_model.py:51-60`),
    and a random initial robot state.  Per-row spiral parameters,
    compensation wrench, and quadratic terminal ingredients are computed
    from THAT row's plant, so the whole bank is physically consistent.

    Returns (bank, params, x0):
      bank    ScenarioBank of n rows;
      params  BodyParams whose mass/inertia/inertia_inv leaves carry a
              leading (n,) axis (see `controllers.spiraling.params_batch_axes`);
              D/max_thrust/dt stay shared (thruster geometry);
      x0      (n, 13) random robot states.
    """
    from ft_mpc_tpu.runtime import batched_wrench_hulls
    from ft_mpc_tpu.terminal.quadratic import quadratic_terminal_ingredients

    rng = np.random.default_rng(seed)
    tuning = dict(tuning or {})
    Q = np.asarray(tuning.get("Q", [1, 1, 1, 1, 1, 1, 2, 2, 2]), np.float64)
    R = np.asarray(tuning.get("R", [0.1, 0.1, 0.1, 0.01, 0.01, 0.01]), np.float64)
    k_omega = tuning.get("k_omega", [1.0, 1.0, 1.0])
    time_scaling = float(tuning.get("time_scaling", 5))

    if fault_pool is None:
        fault_pool = [[]]
        fault_pool += [[BrokenThruster(i, 1.0)] for i in range(N_THRUSTERS)]
        fault_pool += [
            [BrokenThruster(i, 1.0), BrokenThruster(j, 1.0)]
            for i in range(N_THRUSTERS)
            for j in range(i + 1, N_THRUSTERS)
        ]

    # Wrench hulls depend only on (D, max_thrust, fault) -- shared across
    # rows with the same pattern: one threaded native call for the pool.
    P = len(fault_pool)
    broken = np.zeros((P, N_THRUSTERS))
    intensity = np.zeros((P, N_THRUSTERS))
    for s, faults in enumerate(fault_pool):
        for f in faults:
            broken[s, f.index] = 1.0
            intensity[s, f.index] = f.intensity
    hA, hb, hm = batched_wrench_hulls(
        np.asarray(params0.D), float(params0.max_thrust), broken, intensity,
        max_facets=max_hull_facets,
    )

    m0 = float(params0.mass)
    J0 = np.diag(np.asarray(params0.inertia))
    pattern_idx = rng.integers(0, P, size=n)
    masses = m0 * rng.uniform(*mass_range, size=n)
    J_diags = J0[None, :] * rng.uniform(*inertia_range, size=(n, 3))

    from ft_mpc_tpu.controllers.spiral_params import SpiralParameters

    scenarios = []
    for row in range(n):
        k = int(pattern_idx[row])
        inertia = np.diag(J_diags[row])
        params_i = params0._replace(
            mass=np.asarray(masses[row], dtype=np.asarray(params0.mass).dtype),
            inertia=inertia.astype(np.asarray(params0.inertia).dtype),
            inertia_inv=np.linalg.inv(inertia).astype(
                np.asarray(params0.inertia).dtype
            ),
        )
        faults = fault_pool[k]
        ff = broken[k] * intensity[k] * float(params0.max_thrust)
        sp = SpiralParameters.compute(
            masses[row], inertia, np.asarray(params0.D) @ ff
        )
        P9, p9, c, tset = quadratic_terminal_ingredients(
            Q, R, sp.M, k_omega, float(params0.dt), time_scaling=time_scaling
        )
        scenarios.append(
            build_scenario(
                params_i, faults,
                terminal=quadratic_terminal(P9, p9, c),
                terminal_set=tset,
                max_hull_facets=max_hull_facets,
                precomputed_hull=(hA[k], hb[k], hm[k]),
            )
        )
    bank = stack_scenarios(scenarios)

    f_dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    inertias = np.stack([np.diag(J_diags[r]) for r in range(n)])
    params = params0._replace(
        mass=masses.astype(f_dtype),
        inertia=inertias.astype(f_dtype),
        inertia_inv=np.linalg.inv(inertias).astype(f_dtype),
    )

    x0 = np.zeros((n, 13), dtype=f_dtype)
    x0[:, 0:3] = rng.uniform(-1, 1, (n, 3))
    x0[:, 3:6] = rng.uniform(-0.3, 0.3, (n, 3))
    q = rng.standard_normal((n, 4))
    x0[:, 6:10] = q / np.linalg.norm(q, axis=1, keepdims=True)
    x0[:, 10:13] = rng.uniform(-0.3, 0.3, (n, 3))
    return bank, params, x0


def build_scenario_bank(
    params: BodyParams,
    fault_patterns: Sequence[Sequence[BrokenThruster]],
    max_hull_facets: int = MAX_HULL_FACETS,
    **kwargs,
) -> ScenarioBank:
    """Build a bank from a list of fault patterns (host-side).

    The per-pattern wrench hulls are computed in one threaded native call
    (`ft_mpc_tpu.runtime.batched_wrench_hulls`, C++), falling back to the
    numpy path automatically.
    """
    from ft_mpc_tpu.runtime import batched_wrench_hulls

    B = len(fault_patterns)
    broken = np.zeros((B, N_THRUSTERS))
    intensity = np.zeros((B, N_THRUSTERS))
    for s, faults in enumerate(fault_patterns):
        for f in faults:
            broken[s, f.index] = 1.0
            intensity[s, f.index] = f.intensity
    A, b, mask = batched_wrench_hulls(
        np.asarray(params.D), float(params.max_thrust), broken, intensity,
        max_facets=max_hull_facets,
    )
    return stack_scenarios(
        [
            build_scenario(
                params, faults, max_hull_facets=max_hull_facets,
                precomputed_hull=(A[s], b[s], mask[s]), **kwargs
            )
            for s, faults in enumerate(fault_patterns)
        ]
    )
