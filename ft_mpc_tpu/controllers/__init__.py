"""Controllers: spiral parameter selection and the SQP micro-orbiting MPC."""

from ft_mpc_tpu.controllers.spiral_params import SpiralParameters  # noqa: F401
