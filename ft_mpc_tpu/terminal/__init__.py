"""Terminal ingredients (cost-to-go + invariant set) for the spiraling MPC.

Two tiers, mirroring the reference's offline/online split
(`ft_mpc/controllers/tools/terminal_ingredients.py` + cached
`config/terminal.yaml`):

  * `quadratic`: fast, self-contained quadratic ingredients (per-axis
    double-integrator DARE + discrete Lyapunov omega cost) computed at
    scenario-bank build time.  Serialization is data-only (arrays), never
    code -- the reference's `eval` of YAML'd sympy code
    (`terminal_ingredients.py:451-474`) is deliberately not reproduced.
  * `pipeline`: the full explicit-MPC-based certified pipeline (value
    function sampling via batched TPU QP solves, MCAIS terminal set).
"""

from ft_mpc_tpu.terminal.quadratic import quadratic_terminal_ingredients  # noqa: F401
