"""Console entry points (the reference's only interface was editing scripts).

    ft-mpc-sim       closed-loop demo (reactive.yaml-compatible config)
    ft-mpc-bench     one-chip batched solves/s benchmark
    ft-mpc-terminal  offline terminal-ingredient pipeline (writes npz cache)
"""

from __future__ import annotations

import sys
from pathlib import Path


def sim_main() -> None:
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from examples.sim import main

    main()


def bench_main() -> None:
    sys.path.insert(0, str(Path(__file__).parent.parent))
    import bench

    bench.main()


def terminal_main() -> None:
    from ft_mpc_tpu.terminal.pipeline import main

    main()
