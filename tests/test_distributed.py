"""Multi-host scaffolding validation.

Boots a REAL `jax.distributed` service (1 process, coordinator on
localhost) in a subprocess -- `jax.distributed.initialize` is process-global
-- with an 8-device virtual CPU mesh, and drives the full multi-host path:
env-var plumbing, host-major mesh construction, per-process bank slicing,
`make_array_from_process_local_data` assembly, and the sharded lane-fused
control step.  2+ real hosts cannot exist in this environment (one tunneled
chip); this proves the harness is runnable, which the reference never was
(SURVEY.md section 2.2: no distributed story at all).
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import os
os.environ["FT_MPC_COORDINATOR"] = "localhost:12357"
os.environ["FT_MPC_NUM_PROCESSES"] = "1"
os.environ["FT_MPC_PROCESS_ID"] = "0"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from ft_mpc_tpu.parallel.distributed import (
    initialize_distributed,
    local_scenario_range,
    make_host_scenario_mesh,
)

# Env-var plumbing boots a real coordinator + client.
assert initialize_distributed() is True
assert initialize_distributed() is True  # idempotent
assert jax.process_count() == 1
assert len(jax.devices()) == 8

mesh = make_host_scenario_mesh()
assert mesh.devices.shape == (8,)

lo, hi = local_scenario_range(64)
assert (lo, hi) == (0, 64)

# Full sharded step through the launch entry (prints one JSON line).
from ft_mpc_tpu.parallel.launch import main
main(["--per-device", "16", "--reps", "2", "--horizon", "5"])
"""


def test_distributed_harness_boots_and_steps():
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 0, res.stderr[-4000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["processes"] == 1
    assert out["devices"] == 8
    assert out["global_batch"] == 128
    assert out["max_r_prim"] < 1.0
    assert out["solves_per_s"] > 0
