"""Weak-scaling probe for the extraction kernel (no Spark).

Fixed work PER core at two worker counts: if per-core throughput holds,
adding executors at constant per-executor load preserves rates — the
property that matters when a 10^12-turn job adds nodes (each node brings
its own memory bandwidth, unlike extra cores on one box).

Prints one JSON line with per-core turns/sec at each level and the
weak-scaling efficiency (rate_hi_per_core / rate_lo_per_core).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src"))

TURNS_PER_CORE = int(os.environ.get("KGNORM_WEAK_TURNS_PER_CORE", "60000"))


def _setup():
    global AUTO, TEXTS
    from kgnorm.ac import build_automaton
    from kgnorm.ontology import load_fixture_ontology
    from kgnorm.synth import note_templates

    AUTO = build_automaton(load_fixture_ontology().dictionary)
    TEXTS = note_templates()


def _work(n: int) -> int:
    from kgnorm import rules

    total = 0
    for i in range(n):
        total += len(rules.extract_mentions(TEXTS[i % 10], AUTO))
    return total


def measure(procs: int) -> float:
    chunk = 2000
    tasks = [chunk] * (TURNS_PER_CORE * procs // chunk)
    with mp.Pool(procs, initializer=_setup) as pool:
        t0 = time.time()
        pool.map(_work, tasks)
        elapsed = time.time() - t0
    return (TURNS_PER_CORE * procs) / elapsed / procs


def main() -> None:
    lo = int(os.environ.get("KGNORM_WEAK_LO", "8"))
    hi = int(os.environ.get("KGNORM_WEAK_HI", "32"))
    reps = int(os.environ.get("KGNORM_WEAK_REPS", "3"))
    rate_lo = max(measure(lo) for _ in range(reps))
    rate_hi = max(measure(hi) for _ in range(reps))
    print(json.dumps({
        "turns_per_core": TURNS_PER_CORE,
        f"per_core_rate_{lo}w": round(rate_lo, 1),
        f"per_core_rate_{hi}w": round(rate_hi, 1),
        "weak_scaling_efficiency": round(rate_hi / rate_lo, 3),
    }))


if __name__ == "__main__":
    main()
