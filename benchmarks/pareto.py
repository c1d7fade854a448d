"""Accuracy/throughput Pareto sweep of the deployed solver config (real TPU).

Sweeps (sqp_iters, admm_iters, phases, newton_iters) through bench.py's env
hooks, one subprocess per point (fresh backend + compile each), and writes
`benchmarks/pareto_r04.json` plus a markdown table.  Purpose: spend the >4x
throughput margin over the 10k solves/s BASELINE target on accuracy --
pick the deployed config at max_r_prim <= 1e-3 while staying >= 10k solves/s
(the reference's own IPOPT tolerance is 1e-3, `spiraling_mpc.py:221`).

Run on the TPU:  python benchmarks/pareto.py
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# (sqp_iters, admm_iters, phases, newton_iters, cleanup_iters, cleanup_k)
# cleanup_iters = 0 disables the worst-K tail-cleanup pass.  All points run
# with elastic terminal rows (the deployed default), so max_r_prim measures
# solver convergence and restoration gaps are reported separately.
CONFIGS = [
    (2, 40, 1, 3, 0, 0),       # round-2 deployed config (fast anchor)
    (2, 60, 1, 3, 0, 0),
    (2, 60, 1, 3, 300, 256),   # round-3 deployed config
    (2, 60, 1, 3, 450, 256),
    (2, 60, 1, 3, 600, 256),   # round-4 deployed config (bench.py default)
    (3, 80, 1, 3, 600, 256),   # accuracy-max corner
]


def run_point(sqp, iters, phases, newton, cleanup, cleanup_k, batch=2048):
    env = dict(os.environ)
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_tpu_cache")
    )
    env.update(
        FT_MPC_BENCH_SQP=str(sqp),
        FT_MPC_BENCH_ITERS=str(iters),
        FT_MPC_BENCH_PHASES=str(phases),
        FT_MPC_BENCH_NEWTON=str(newton),
        FT_MPC_BENCH_CLEANUP=str(cleanup),
        FT_MPC_BENCH_CLEANUP_K=str(cleanup_k),
        FT_MPC_BENCH_BATCH=str(batch),
        FT_MPC_BENCH_GAP_GATE="10",  # sweep measures residuals, not gates
    )
    res = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    if res.returncode != 0:
        return {"error": res.stderr[-2000:]}
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    out_path = REPO / "benchmarks" / "pareto_r04.json"
    rows = json.loads(out_path.read_text()) if out_path.exists() else []

    def key(r):
        return (r["sqp_iters"], r["admm_iters"], r["phases"],
                r["newton_iters"], r.get("cleanup_iters", 0),
                r.get("cleanup_k", 0))

    done = {key(r) for r in rows if "error" not in r}
    for cfg in CONFIGS:
        if cfg in done:
            continue
        sqp, iters, phases, newton, cleanup, cleanup_k = cfg
        out = run_point(*cfg)
        row = {
            "sqp_iters": sqp, "admm_iters": iters, "phases": phases,
            "newton_iters": newton, "cleanup_iters": cleanup,
            "cleanup_k": cleanup_k, **out,
        }
        rows = [r for r in rows if key(r) != cfg]
        rows.append(row)
        out_path.write_text(json.dumps(rows, indent=2))
        print(json.dumps(row), flush=True)

    # Frontier table: solver-convergence metrics ONLY.  Restoration gaps
    # are a property of 5 pinned (pattern, state) rows of the bench bank
    # (state-rate infeasibility; see bench.py's pinned-row gate), not of
    # the solver budget -- every budget measures the same 5 rows, so a
    # term_gap column would be constant and adds no frontier information
    # (VERDICT r4 weak 5).  They are reported once, separately, below.
    md = [
        "| sqp | admm iters | cleanup | solves/s | max_r_prim | ms/step |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        cl = (f"{r['cleanup_iters']}@K{r['cleanup_k']}"
              if r.get("cleanup_iters") else "off")
        if "error" in r:
            md.append(f"| {r['sqp_iters']} | {r['admm_iters']} | {cl} |"
                      f" ERROR | — | — |")
            continue
        md.append(
            f"| {r['sqp_iters']} | {r['admm_iters']}x{r['phases']} | {cl} |"
            f" {r['value']:.0f} | {r['max_r_prim']:.2e} |"
            f" {r['per_step_latency_ms']:.1f} |"
        )
    gaps = sorted(
        {(tuple(r.get("gap_rows", [])), round(r.get("max_term_gap", 0.0), 4))
         for r in rows if "error" not in r}
    )
    md += [
        "",
        "Restoration gaps (separate from the frontier): every budget point "
        "reports the same pinned gap-row set -- a property of those "
        "(pattern, state) rows of the deterministic bench bank, not of the "
        "solver budget:",
    ] + [
        f"- rows {list(g[0]) if g[0] else '(not recorded in this sweep)'}, "
        f"max gap {g[1]}"
        for g in gaps
    ]
    (REPO / "benchmarks" / "pareto_r05.md").write_text("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
