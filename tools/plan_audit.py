"""Registry-wide plan audit: scan every ``__spark_entry__.queries()``
entry's optimized + physical plan for scale red flags.

Flags raised:

* ``cartesian`` — a CartesianProduct in the physical plan (all-pairs
  work; at 100 TB this is always a bug unless both sides are dims);
* ``row-at-a-time-python-udf`` — BatchEvalPython (non-Arrow Python
  execution in the hot path; every kernel here must be Arrow-batched);
* ``global-window`` — a window function with no PARTITION BY.  Two are
  expected and test-pinned (they consume tiny aggregates, bounded by
  config, not data): ``quality_trend``'s pid-count offsets and
  ``quality_rollup``'s mention-count histogram.  Anything else is a
  single-task funnel.

Exit code 1 if any UNEXPECTED flag appears, so the audit can gate a
round.  Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "src"))

# (query, flag) pairs that are analyzed, justified, and pinned by tests
EXPECTED = {
    ("quality_trend", "global-window"),         # pid-count offsets, ≤ shuffle-partitions rows
    ("quality_trend_prefix", "global-window"),  # same pid-count offsets (prefix path)
    ("quality_rollup", "global-window"),        # mention-count histogram, ≤ distinct counts
}


def audit_plan(opt: str, phys: str) -> list[str]:
    flags = []
    if "CartesianProduct" in phys:
        flags.append("cartesian")
    if "BatchEvalPython" in phys:
        flags.append("row-at-a-time-python-udf")
    for ln in opt.splitlines():
        if "windowspecdefinition(" in ln:
            inner = ln.split("windowspecdefinition(", 1)[1]
            # partitioned windows list partition columns before the
            # ORDER BY expressions; an unpartitioned spec starts with a
            # sort expression ("col ASC ..."/"col DESC ...")
            head = inner.split(",")[0]
            if " ASC" in head or " DESC" in head:
                flags.append("global-window")
                break
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    unexpected = 0
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            flags = audit_plan(qe.optimizedPlan().toString(),
                               qe.executedPlan().toString())
        except Exception as ex:  # an unbuildable plan is itself a finding
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
            unexpected += 1
            continue
        for f in flags:
            tag = "expected" if (name, f) in EXPECTED else "UNEXPECTED"
            if tag == "UNEXPECTED":
                unexpected += 1
            print(f"{name}: {f} ({tag})")
    print(f"AUDIT: {unexpected} unexpected flags across "
          f"{len(entrymod.queries())} queries")
    spark.stop()
    sys.exit(1 if unexpected else 0)


if __name__ == "__main__":
    main()
