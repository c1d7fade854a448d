"""Build the committed terminal-ingredient cache for the whole fault census.

Runs the offline pipeline (fault-aware orbit selection + certified terminal
ingredients, `ft_mpc_tpu/terminal/pipeline.py` + `controllers/orbit_search.py`)
for healthy + all 16 single faults + all 120 double faults at the default
tuning, writing the per-pattern npz caches `_build_scenario_with_terminal`
loads at scenario-build time.  Also writes ORBITS_r{N}.json summarizing the
census: which patterns certify at the reference's default orbit, which need
a searched orbit (and what it is), and which are physically uncertifiable.

The reference computes its terminal.yaml once for ONE fault configuration by
hand (`terminal_ingredients.py:476-503`, cache invalidation manual per the
comment at `reactive.yaml:35`); this regenerates the entire census
deterministically.

Usage:  PYTHONPATH=/root/repo python benchmarks/build_terminal_cache.py [--out ORBITS.json]
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="census summary JSON path")
    ap.add_argument(
        "--prune-stale", action="store_true",
        help="delete cache entries not produced by this run (old versions)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # offline pipeline: host math

    from ft_mpc_tpu.api import DEFAULT_TUNING, _build_scenario_with_terminal
    from ft_mpc_tpu.ops.dynamics import BodyParams
    from ft_mpc_tpu.terminal.pipeline import (
        cache_key,
        load_terminal_ingredients,
        plant_fingerprint,
    )
    from ft_mpc_tpu.utils.faults import BrokenThruster

    params = BodyParams.default(0.1)
    cdir = Path(__file__).parent.parent / "ft_mpc_tpu" / "config" / "terminal_cache"

    patterns = [[]]
    patterns += [[i] for i in range(16)]
    patterns += [[i, j] for i in range(16) for j in range(i + 1, 16)]

    rows, produced = [], set()
    t0 = time.time()
    for pat in patterns:
        faults = [BrokenThruster(i, 1.0) for i in pat]
        key = cache_key(faults, DEFAULT_TUNING, plant_fingerprint(params))
        t1 = time.time()
        _build_scenario_with_terminal(params, faults, DEFAULT_TUNING)
        ti = load_terminal_ingredients(cdir / f"{key}.npz")
        produced.add(f"{key}.npz")
        orbit = ti.meta.get("orbit", {})
        rows.append(
            {
                "pattern": list(pat),
                "certified": "fallback" not in ti.meta,
                "r_empc": float(ti.r_empc),
                "orbit_default": bool(orbit.get("is_default", True)),
                "omega_des": orbit.get("omega_des"),
                "r_dir": [round(float(v), 4) for v in orbit.get("r_dir", [])],
                "f_virt_mag": orbit.get("f_virt_mag"),
                "secs": round(time.time() - t1, 1),
            }
        )
        print(f"{pat}: certified={rows[-1]['certified']} "
              f"default_orbit={rows[-1]['orbit_default']} "
              f"r_empc={rows[-1]['r_empc']:.3f} ({rows[-1]['secs']}s)")

    if args.prune_stale:
        for f in sorted(cdir.glob("*.npz")):
            if f.name not in produced:
                f.unlink()
                print(f"pruned stale cache {f.name}")

    n_def = sum(r["certified"] and r["orbit_default"] for r in rows)
    n_fix = sum(r["certified"] and not r["orbit_default"] for r in rows)
    n_bad = sum(not r["certified"] for r in rows)
    summary = {
        "patterns": len(rows),
        "certified_default_orbit": n_def,
        "certified_searched_orbit": n_fix,
        "uncertifiable": n_bad,
        "uncertifiable_patterns": [r["pattern"] for r in rows if not r["certified"]],
        "elapsed_s": round(time.time() - t0, 1),
        "rows": rows,
    }
    out = args.out or str(Path(__file__).parent.parent / "ORBITS_r04.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))


if __name__ == "__main__":
    main()
