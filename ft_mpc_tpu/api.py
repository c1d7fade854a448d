"""User-facing API: stateful wrappers over the pure jitted core.

A user of the reference drives `SpiralingController` + `SimulationEnvironment`
objects (`ft_mpc/controllers/spiraling_mpc.py:23`, `ft_mpc/simulation/sim_env.py:5`).
These classes reproduce that workflow -- construct from a reactive.yaml-style
config, load a trajectory, step or run -- while everything per-step runs as
one jitted device program underneath.

Unlike the reference, runtime fault injection actually works:
`SimulationEnvironment.set_fault` rebuilds the scenario tensors (host-side,
milliseconds) and the next step uses them -- the reference warns and skips
mid-run faults (`examples/sim.py:25-27`, `sim_env.py:67-75`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.controllers.spiral_params import SpiralParameters
from ft_mpc_tpu.controllers.spiraling import (
    MPCConfig,
    MPCWeights,
    get_control,
    init_warmstart,
    shift_warmstart,
)
from ft_mpc_tpu.geometry.scenario import Scenario, build_scenario
from ft_mpc_tpu.terminal.poly import quadratic_terminal
from ft_mpc_tpu.ops.dynamics import BodyParams, robot_step, robot_to_center
from ft_mpc_tpu.ops.quaternion import quat_normalize
from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
from ft_mpc_tpu.terminal.quadratic import quadratic_terminal_ingredients
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory

DEFAULT_TUNING = {
    "horizon": 15,
    "Q": [1, 1, 1, 1, 1, 1, 2, 2, 2],
    "R": [0.1, 0.1, 0.1, 0.01, 0.01, 0.01],
    "k_omega": [1.0, 1.0, 1.0],
    "time_scaling": 5,
    "sqp_iters": 3,
}


def _build_scenario_with_terminal(
    params: BodyParams,
    faults: Sequence[BrokenThruster],
    tuning: dict,
    terminal_mode: str = "empc",
    cache_dir: str | None = None,
) -> Scenario:
    """Compile a fault pattern + tuning into a Scenario with terminal data.

    terminal_mode:
      'quadratic' -- fast DARE/Lyapunov ingredients (milliseconds).
      'empc'      -- full offline pipeline (`ft_mpc_tpu.terminal.pipeline`):
                     certified input-bound box, per-axis eMPC value-function
                     bound sampled via batched QPs, MCAIS terminal set, and
                     the polynomial cross-term cost tables (default).
                     Cached to disk per (fault pattern, tuning).
      '<path>.yaml' -- import a reference-format terminal.yaml artifact
                     (`ft_mpc_tpu.terminal.reference_io`), parsed as data.
    """
    D = np.asarray(params.D)
    ff = np.zeros(16)
    for f in faults:
        ff[f.index] = f.intensity * float(params.max_thrust)
    sp = SpiralParameters.compute(
        float(params.mass), np.asarray(params.inertia), D @ ff
    )
    if terminal_mode == "quadratic":
        P9, p9, c, tset = quadratic_terminal_ingredients(
            np.asarray(tuning["Q"], dtype=np.float64),
            np.asarray(tuning["R"], dtype=np.float64),
            sp.M,
            tuning.get("k_omega", [1.0, 1.0, 1.0]),
            float(params.dt),
            time_scaling=float(tuning.get("time_scaling", 5)),
        )
        term = quadratic_terminal(P9, p9, c)
    elif str(terminal_mode).endswith((".yaml", ".yml")):
        from ft_mpc_tpu.terminal.reference_io import load_reference_terminal_yaml

        term, tset = load_reference_terminal_yaml(terminal_mode)
    elif terminal_mode == "empc":
        from ft_mpc_tpu.controllers.orbit_search import select_orbit
        from ft_mpc_tpu.geometry.zonotope import attainable_wrench_polytope
        from ft_mpc_tpu.terminal.pipeline import (
            cache_key,
            compute_terminal_ingredients,
            load_terminal_ingredients,
            plant_fingerprint,
            save_terminal_ingredients,
        )

        cdir = Path(cache_dir) if cache_dir else (
            Path(__file__).parent / "config" / "terminal_cache"
        )
        cdir.mkdir(parents=True, exist_ok=True)
        cpath = cdir / f"{cache_key(faults, tuning, plant_fingerprint(params))}.npz"
        if cpath.exists():
            ti = load_terminal_ingredients(cpath)
        else:
            broken = (ff > 0).astype(float)
            hull = attainable_wrench_polytope(
                D, float(params.max_thrust), broken,
                ff / float(params.max_thrust),
            )
            # Fault-aware orbit selection: keep the reference's default
            # orbit when certifiable, else search (omega_des, r_dir,
            # |f_virt|) for the certificate-objective maximizer.  Most
            # double-fault patterns the default cannot certify become
            # certifiable this way (see controllers/orbit_search.py).
            k_omega = tuning.get("k_omega", [1.0, 1.0, 1.0])
            max_acc = float(tuning.get("max_acceleration", 0.0))
            choice = select_orbit(
                hull, float(params.mass), np.asarray(params.inertia),
                D @ ff, k_omega, max_acc,
            )
            orbit_meta = {
                "omega_des": list(choice.omega_des),
                "r_dir": list(choice.r_dir),
                "f_virt_mag": choice.f_virt_mag,
                "is_default": choice.is_default,
            }
            ti = None
            if choice.certifiable:
                sp_c = SpiralParameters.compute(
                    float(params.mass), np.asarray(params.inertia), D @ ff,
                    choice.omega_des, choice.r_dir, choice.f_virt_mag,
                )
                try:
                    ti = compute_terminal_ingredients(
                        hull=hull,
                        M=sp_c.M,
                        f_virt6=np.concatenate([sp_c.f_virt, np.zeros(3)]),
                        omega_des=sp_c.omega_des,
                        r=sp_c.r,
                        mass=float(params.mass),
                        inertia=np.asarray(params.inertia),
                        dt=float(params.dt),
                        Q=np.asarray(tuning["Q"], dtype=np.float64),
                        R=np.asarray(tuning["R"], dtype=np.float64),
                        k_omega=k_omega,
                        max_acceleration=max_acc,
                        time_scaling=float(tuning.get("time_scaling", 5)),
                        empc_horizon=int(tuning.get("empc_horizon", 3)),
                    )
                    ti.meta["orbit"] = orbit_meta
                except RuntimeError:
                    # select_orbit's screen and the full pipeline can still
                    # disagree on edge-of-feasibility patterns; never crash a
                    # scenario build over it -- fall back to the quadratic
                    # terminal exactly like an uncertifiable pattern.
                    ti = None
            if ti is None:
                # Pattern physically uncertifiable at ANY candidate orbit
                # (degenerate attainable set, e.g. antiparallel surviving
                # thruster columns).  The reference's terminal NLP
                # (`terminal_ingredients.py:57-166`) is equally infeasible
                # there.  Keep controlling with the uncertified quadratic
                # ingredients; the fallback is cached and recorded in meta
                # so downstream tooling can see it.
                from ft_mpc_tpu.terminal.pipeline import TerminalIngredients

                P9, p9, c, tset_q = quadratic_terminal_ingredients(
                    np.asarray(tuning["Q"], dtype=np.float64),
                    np.asarray(tuning["R"], dtype=np.float64),
                    sp.M,
                    k_omega,
                    float(params.dt),
                    time_scaling=float(tuning.get("time_scaling", 5)),
                )
                ti = TerminalIngredients(
                    P9=P9, p9=p9, c=c,
                    term=quadratic_terminal(P9, p9, c),
                    term_set=tset_q,
                    emax=np.zeros(3), r_empc=0.0,
                    meta={
                        "fallback": "quadratic",
                        "reason": "uncertifiable at every candidate orbit",
                        "orbit": orbit_meta,
                    },
                )
            save_terminal_ingredients(ti, cpath)
        term, tset = ti.term, ti.term_set
        orbit = ti.meta.get("orbit")
        if orbit is not None:
            return build_scenario(
                params, faults, terminal=term, terminal_set=tset,
                omega_des=tuple(orbit["omega_des"]),
                r_dir=tuple(orbit["r_dir"]),
                f_virt_mag=float(orbit["f_virt_mag"]),
            )
    else:
        raise ValueError(f"unknown terminal_mode {terminal_mode}")

    return build_scenario(params, faults, terminal=term, terminal_set=tset)


class SpiralingMPC:
    """Drop-in analogue of the reference `SpiralingController`."""

    def __init__(
        self,
        params: BodyParams,
        faults: Sequence[BrokenThruster] = (),
        tuning: dict | None = None,
        terminal_mode: str = "empc",
    ):
        self.params = params
        self.tuning = {**DEFAULT_TUNING, **(tuning or {})}
        self.faults = list(faults)
        self.terminal_mode = terminal_mode
        self.scenario = _build_scenario_with_terminal(
            params, self.faults, self.tuning, terminal_mode=terminal_mode
        )
        self.weights = MPCWeights.from_diagonals(
            self.tuning["Q"], self.tuning["R"],
            x_lb=self.tuning.get("xlb"), x_ub=self.tuning.get("xub"),
            du_max=self.tuning.get("du_max"),
        )
        self.cfg = MPCConfig(
            horizon=int(self.tuning["horizon"]),
            sqp_iters=int(self.tuning.get("sqp_iters", 3)),
            admm=StructuredADMMConfig(iters=30, phases=1, rho=50.0),
        )
        self.trajectory = None  # (T, 9) center reference
        self.nominal_input = None  # (T, 6)
        self._warm = None
        self._get_control = jax.jit(get_control, static_argnames=("cfg",))

    def set_fault(self, fault: BrokenThruster) -> None:
        """Add a fault and recompile the scenario data (host-side).

        Milliseconds for cached fault patterns; first-time patterns whose
        default orbit is uncertifiable additionally run the orbit search +
        terminal pipeline (seconds, then cached on disk).  A deployment
        that needs bounded fault-reaction latency should pre-build the
        cache for its fault census (`benchmarks/build_terminal_cache.py`).
        """
        self.faults.append(fault)
        self.scenario = _build_scenario_with_terminal(
            self.params, self.faults, self.tuning, terminal_mode=self.terminal_mode
        )
        # The carried warm start (trajectory, duals, metric) describes the
        # pre-fault problem; re-initialize from the next measured state
        # instead of feeding stale information into the reshaped problem.
        self._warm = None
        if self.trajectory is not None:
            # Re-prepare: omega_des may change with the new orbit parameters.
            self.assign_trajectory(self._raw_traj)

    def load_trajectory(self, cmd: str, duration: float, fpath: str | None = None):
        traj = generate_trajectory(cmd, float(self.params.dt), duration, fpath)
        self.assign_trajectory(traj)

    def assign_trajectory(self, traj13: np.ndarray):
        self._raw_traj = traj13
        omega_des = np.asarray(self.scenario.omega_des)
        x_ref, u_ref = prepare_center_trajectory(
            traj13, omega_des, float(self.params.mass), float(self.params.dt),
            self.cfg.horizon + 1,
        )
        self.trajectory = jnp.asarray(x_ref)
        self.nominal_input = jnp.asarray(u_ref)

    def get_control(self, x0, t: float) -> np.ndarray:
        """Return 16-d thruster commands for robot state x0 at time t."""
        if self.trajectory is None:
            raise RuntimeError("call load_trajectory first")
        i = int(round(t / float(self.params.dt)))
        Nt = self.cfg.horizon
        if i < 0 or i + Nt + 1 > self.trajectory.shape[0]:
            raise ValueError(
                f"t={t} maps to step {i}, but the loaded trajectory only "
                f"covers steps 0..{self.trajectory.shape[0] - Nt - 2} at "
                f"horizon {Nt} (dt={float(self.params.dt)}); load a longer "
                "trajectory or reduce the simulated duration"
            )
        x_ref = self.trajectory[i : i + Nt + 1]
        u_ref = self.nominal_input[i : i + Nt + 1]
        self._last_ref_index = i
        x0 = jnp.asarray(x0, dtype=self.trajectory.dtype)

        c0 = robot_to_center(self.scenario.r, x0)
        if self._warm is None:
            self._warm = init_warmstart(
                self.params, self.scenario, self.cfg, c0, weights=self.weights
            )
        else:
            self._warm = shift_warmstart(self._warm, c0)

        out = self._get_control(
            self.params, self.scenario, self.weights, self.cfg,
            x0, x_ref, u_ref, self._warm,
        )
        self._warm = out.warm
        self.last_output = out
        return np.asarray(out.u_phys)


class SimulationEnvironment:
    """Drop-in analogue of the reference `SimulationEnvironment`
    (`ft_mpc/simulation/sim_env.py:5-112`), stepping the full 16-thruster
    robot model with the controller in the loop.

    For batched/bench use prefer `ft_mpc_tpu.sim.rollout` (single fused scan);
    this class trades throughput for the reference's imperative workflow,
    including working runtime fault injection.
    """

    def __init__(self, params: BodyParams, controller: SpiralingMPC, seed: int = 0):
        self.params = params
        self.controller = controller
        self.dt = float(params.dt)
        self.state = np.zeros(13)
        self.state[9] = 1.0  # identity quaternion (w last)
        self.cur_time = 0.0
        self.noise = {
            "position": 1e-3,
            "velocity": 1e-3,
            "orientation": 1e-3,
            "angular_velocity": 1e-3,
        }
        self._rng = np.random.default_rng(seed)
        self.history = []  # (t, state, u) tuples, reference-style
        self._records = []  # full RolloutHistory-compatible records

    def set_initial_state(
        self, position=None, velocity=None, orientation=None, angular_velocity=None
    ):
        if position is not None:
            self.state[0:3] = position
        if velocity is not None:
            self.state[3:6] = velocity
        if orientation is not None:
            self.state[6:10] = orientation
        if angular_velocity is not None:
            self.state[10:13] = angular_velocity

    def set_fault(self, fault: BrokenThruster):
        """Inject a fault mid-run: model and controller both reshape."""
        self.controller.set_fault(fault)

    def step(self):
        u = self.controller.get_control(self.state, self.cur_time)
        x_new = np.array(  # np.array: jax buffers view as read-only via asarray
            robot_step(
                self.params,
                self.controller.scenario.fault,
                jnp.asarray(self.state),
                jnp.asarray(u),
            )
        )
        x_new[0:3] += self._rng.uniform(0, self.noise["position"], 3)
        x_new[3:6] += self._rng.uniform(0, self.noise["velocity"], 3)
        x_new[6:10] += self._rng.uniform(0, self.noise["orientation"], 4)
        x_new[10:13] += self._rng.uniform(0, self.noise["angular_velocity"], 3)
        x_new[6:10] /= np.linalg.norm(x_new[6:10])
        self.history.append((self.cur_time, self.state.copy(), u))
        # Full observability record (RolloutHistory-compatible), so the
        # imperative workflow feeds the same 67-column CSV/dashboards as the
        # fused-rollout path (`controller_debug.py:216-260` parity).
        out = self.controller.last_output
        ref_i = getattr(self.controller, "_last_ref_index", 0)
        self._records.append(
            dict(
                time=self.cur_time,
                state=self.state.copy(),
                c0=np.asarray(out.c0),
                u_phys=np.asarray(u),
                wrench=np.asarray(out.wrench),
                x_ref0=np.asarray(self.controller.trajectory[ref_i]),
                cost=float(out.info.cost),
                r_prim=float(out.info.r_prim),
                r_dual=float(out.info.r_dual),
                defect=float(out.info.defect),
                term_gap=float(out.info.term_gap),
                was_clipped=bool(out.alloc.was_clipped),
            )
        )
        self.state = x_new
        self.cur_time += self.dt

    def run_simulation(self, duration: float):
        for _ in range(int(duration / self.dt)):
            self.step()

    def to_history(self):
        """Stacked `RolloutHistory` of everything stepped so far -- feeds
        `ft_mpc_tpu.sim.history.history_to_table`/`export_csv` and the
        `viz.dashboards` views exactly like the fused-scan rollout."""
        from ft_mpc_tpu.sim.env import RolloutHistory

        if not self._records:
            raise RuntimeError("no steps recorded yet")
        stack = {
            k: np.asarray([r[k] for r in self._records])
            for k in self._records[0]
        }
        return RolloutHistory(**stack)

    def export_csv(self, file_path: str) -> None:
        """67-column reference-schema CSV of the stepped run."""
        from ft_mpc_tpu.sim.history import export_csv

        export_csv(self.to_history(), np.asarray(self.params.D), file_path)
