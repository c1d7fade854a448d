"""reactive.yaml-schema plumbing of xlb/xub/du_max through the user API.

The reference reads xub/xlb from the tuning param set
(`ft_mpc/controllers/spiraling_mpc.py:129-130`); du_max is a framework
extra.  This test drives the full path: YAML -> load_config -> SpiralingMPC
-> one control step with a binding velocity box.
"""

import os
import tempfile

import numpy as np

from ft_mpc_tpu.api import SpiralingMPC
from ft_mpc_tpu.ops.dynamics import BodyParams
from ft_mpc_tpu.utils.config import load_config

YAML_TEXT = """
time_step: 0.1
traj_shape: hover
traj_duration: 10
actuator_failures:
  - {act_id: 10, intensity: 1.0, start_time: 0}
tuning:
  spiraling:
    horizon: 10
    param_set: P1
    P1:
      Q: [1,1,1,1,1,1,2,2,2]
      R: [0.1,0.1,0.1,0.01,0.01,0.01]
      xub: [1e8,1e8,1e8, 0.5,0.5,0.5, 1e8,1e8,1e8,1e8, 1e8,1e8,1e8]
      du_max: [2.0,2.0,2.0,1.0,1.0,1.0]
"""


def test_yaml_bounds_reach_the_solver():
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(YAML_TEXT)
        path = f.name
    try:
        cfg = load_config(path)
        assert cfg.tuning["xub"][3] == 0.5
        assert cfg.tuning["du_max"][0] == 2.0

        mpc = SpiralingMPC(
            BodyParams.default(0.1), cfg.faults, tuning=cfg.tuning,
            terminal_mode="quadratic",
        )
        assert mpc.weights.x_ub is not None and mpc.weights.du_max is not None
        mpc.load_trajectory("hover", 10)
        x0 = np.zeros(13)
        x0[9] = 1.0
        x0[3] = 0.8  # starts above the 0.5 m/s velocity box
        u = mpc.get_control(x0, 0.0)
        assert np.isfinite(u).all()
        # planned stages respect the box (stage 0 is the pinned measurement)
        planned_vmax = float(np.max(np.asarray(mpc.last_output.warm.X[1:-1, 3])))
        assert planned_vmax <= 0.5 + 1e-3, planned_vmax
    finally:
        os.unlink(path)
