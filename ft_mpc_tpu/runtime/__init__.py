"""Native (C++) runtime components with Python fallbacks.

`batched_wrench_hulls` builds the padded attainable-wrench polytopes for a
whole fault bank in one threaded native call (ctypes binding to
`zonotope_native.cpp`); the pure-numpy path in `geometry.zonotope` remains
the reference implementation and the fallback when no compiler is available.
The shared object is compiled on first use and cached next to the source.
"""

from ft_mpc_tpu.runtime.native import (  # noqa: F401
    batched_wrench_hulls,
    native_available,
)
