"""Run configuration: reactive.yaml-compatible schema + dataclass view.

The reference drives everything from `ft_mpc/config/reactive.yaml`
(`examples/sim.py:16`, schema documented in SURVEY.md section 5): mode,
time_step, traj_shape, traj_duration, actuator_failures list, and a tuning
tree `tuning.<controller>.<param_set>` with Q/R/k_omega/max_acceleration/
time_scaling/empc_horizon.  This module loads that exact schema (a reference
user's YAML works unchanged) plus framework extras under `tpu:` (batching,
solver iterations, noise mode).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import yaml

from ft_mpc_tpu.utils.faults import BrokenThruster

DEFAULT_CONFIG_PATH = Path(__file__).parent.parent / "config" / "reactive.yaml"


@dataclass
class RunConfig:
    time_step: float = 0.1
    traj_shape: str = "hover"
    traj_duration: float = 30.0
    mode: str = "reactive"
    faults: list = field(default_factory=list)  # BrokenThruster entries
    tuning: dict = field(default_factory=dict)  # active param set (spiraling)
    # TPU-framework extras
    batch: int = 1
    noise_mode: str = "reference"
    seed: int = 0
    # Numeric-sanitizer mode: enables jax_debug_nans so the first NaN
    # produced anywhere in the jitted control stack raises at the emitting
    # op (the reference's only numeric guard is IPOPT's
    # check_derivatives_for_naninf, `spiraling_mpc.py:222`).
    debug_nans: bool = False

    @property
    def steps(self) -> int:
        return int(self.traj_duration / self.time_step)

    def apply_debug_flags(self) -> None:
        """Apply sanitizer flags to the JAX runtime (call before tracing)."""
        if self.debug_nans:
            import jax

            jax.config.update("jax_debug_nans", True)


def load_config(path: str | Path | None = None) -> RunConfig:
    """Parse a reactive.yaml-style file into a RunConfig."""
    path = DEFAULT_CONFIG_PATH if path is None else Path(path)
    with open(path) as f:
        raw = yaml.safe_load(f)

    faults = [
        BrokenThruster(
            index=int(f["act_id"]),
            intensity=float(f["intensity"]),
            start_time=float(f.get("start_time", 0.0)),
        )
        for f in raw.get("actuator_failures", [])
    ]

    tuning = {}
    spir = raw.get("tuning", {}).get("spiraling", {})
    if spir:
        pset = spir.get(spir.get("param_set", "P1"), {})
        tuning = {
            "horizon": spir.get("horizon", 15),
            "Q": pset.get("Q", [1, 1, 1, 1, 1, 1, 2, 2, 2]),
            "R": pset.get("R", [0.1, 0.1, 0.1, 0.01, 0.01, 0.01]),
            "k_omega": pset.get("k_omega", [1.0, 1.0, 1.0]),
            "max_acceleration": pset.get("max_acceleration", 0.0),
            "time_scaling": pset.get("time_scaling", 5),
            "empc_horizon": pset.get("empc_horizon", 3),
        }
        # Optional stage constraints: xlb/xub are the reference's per-stage
        # state box keys (`spiraling_mpc.py:129-130`, 13-vectors); du_max is
        # a framework extra (6-vector wrench rate bound per control step).
        for key in ("xlb", "xub", "du_max"):
            if pset.get(key) is not None:
                tuning[key] = pset[key]

    tpu = raw.get("tpu", {})
    return RunConfig(
        time_step=float(raw.get("time_step", 0.1)),
        traj_shape=raw.get("traj_shape", "hover"),
        traj_duration=float(raw.get("traj_duration", 30)),
        mode=raw.get("mode", "reactive"),
        faults=faults,
        tuning=tuning,
        batch=int(tpu.get("batch", 1)),
        noise_mode=tpu.get("noise_mode", "reference"),
        seed=int(tpu.get("seed", 0)),
        debug_nans=bool(tpu.get("debug_nans", False)),
    )
