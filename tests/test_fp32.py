"""fp32 regression coverage (the deployed TPU precision class).

The suite runs in x64 (tests/conftest.py); the deployed TPU path is fp32,
where ADMM conditioning and Pallas-kernel arithmetic behave differently --
round-1's on-chip NaN issues would be invisible to an x64-only suite.
These tests run a closed loop in a *subprocess* (x64 is process-global)
in pure fp32, with the jax_debug_nans sanitizer armed so any NaN anywhere
in the jitted stack fails loudly at the emitting op.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", True)  # sanitizer: first NaN raises
jax.config.update("jax_default_matmul_precision", "highest")
import json
import jax.numpy as jnp
import numpy as np

from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
from ft_mpc_tpu.controllers.spiraling import MPCConfig, MPCWeights
from ft_mpc_tpu.ops.dynamics import BodyParams
from ft_mpc_tpu.sim.env import SimConfig, batched_rollout_lanes, rollout
from ft_mpc_tpu.solvers.mpc_qp import StructuredADMMConfig
from ft_mpc_tpu.utils.faults import BrokenThruster
from ft_mpc_tpu.utils.trajectory import generate_trajectory, prepare_center_trajectory

assert not jax.config.jax_enable_x64

dt = 0.1
params = BodyParams.default(dt)
sc = _build_scenario_with_terminal(
    params, [BrokenThruster(10, 1.0), BrokenThruster(11, 1.0)], DEFAULT_TUNING
)
weights = MPCWeights.from_diagonals(DEFAULT_TUNING["Q"], DEFAULT_TUNING["R"])
# deployed fast config (bench.py)
cfg = MPCConfig(
    horizon=15, sqp_iters=2,
    admm=StructuredADMMConfig(iters=40, phases=1, rho=50.0, adapt_clip=1.5),
)
traj = generate_trajectory("hover", dt, 10)
x_ref, u_ref = prepare_center_trajectory(
    traj, np.asarray(sc.omega_des), 16.8, dt, 16
)
x_ref = jnp.asarray(x_ref, jnp.float32)
u_ref = jnp.asarray(u_ref, jnp.float32)
x0 = np.zeros(13, np.float32)
x0[0:3] = [0.4, 0.0, 0.4]
x0[3:6] = [0.2, 0.1, 0.0]
x0[6:10] = [0, 0, 0, 1]
x0[10:13] = [0.0, 0.0, 0.4]
sim = SimConfig(steps=50, noise_mode="zero_mean")

# XLA per-scenario path
h = rollout(params, sc, weights, cfg, sim, jnp.asarray(x0), x_ref, u_ref,
            jax.random.key(0))
e0 = float(np.linalg.norm(np.asarray(h.c0[0, 0:3] - h.x_ref0[0, 0:3])))
eT = float(np.linalg.norm(np.asarray(h.c0[-1, 0:3] - h.x_ref0[-1, 0:3])))
assert np.isfinite(np.asarray(h.state)).all()
assert np.isfinite(np.asarray(h.u_phys)).all()

# deployed lane-fused path (Pallas interpret off-TPU)
bank1 = jax.tree.map(lambda x: jnp.asarray(x)[None], sc)
hl = batched_rollout_lanes(
    params, bank1, weights, cfg, sim, jnp.asarray(x0)[None], x_ref, u_ref,
    jax.random.split(jax.random.key(0), 1),
)
assert np.isfinite(np.asarray(hl.state)).all()
assert np.isfinite(np.asarray(hl.u_phys)).all()
eT_l = float(np.linalg.norm(np.asarray(hl.c0[0, -1, 0:3] - hl.x_ref0[0, -1, 0:3])))

print(json.dumps({"e0": e0, "eT": eT, "eT_lanes": eT_l}))
"""


def test_fp32_closed_loop_double_fault():
    """fp32 + NaN sanitizer: closed loop under the reference double fault
    stays finite and converges on both backends."""
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/tmp"},
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["eT"] < 0.5 * out["e0"], out  # controller contracts in fp32
    assert out["eT_lanes"] < 0.5 * out["e0"], out
