"""Extra benchmarks: per-stage isolation + plan capture (guide §1).

``bench.py`` is the frozen driver contract; this file exists so the
optimization rounds can (a) time one pipeline stage at a time with the
noop sink (so we measure the computation, not the sink or a count's
column pruning), and (b) dump ``.explain("formatted")`` for every stage
to ``plans/<tag>/<stage>_<suffix>.txt`` for the plan-diff evidence.

Usage::

    python bench_extra.py --turns 10000000 --reps 3 \
        --stages extract,facts,graph,canon
    python bench_extra.py --plans plans/r06 --suffix before

Environment mirrors bench.py: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(REPO, "src"))

from pyspark.sql import functions as F  # noqa: E402

from kgnorm import canon, facts as facts_mod, graph, link, ontology, synth  # noqa: E402
from kgnorm.extract import extract_mentions_df  # noqa: E402
from kgnorm.session import get_spark  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stages", default="extract,link,facts,graph,canon")
    ap.add_argument("--plans", default=None, help="directory to write explain() files to")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--unique-texts", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or (os.cpu_count() or 4))
    os.environ.setdefault("KGNORM_DRIVER_MEM", "48g")
    spark = get_spark("kgnorm-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")

    ont = ontology.load_fixture_ontology()
    dictionary = ontology.broadcast_dictionary(spark, ont)
    concepts = ontology.concepts_df(spark, ont)
    synonyms = ontology.synonyms_df(spark, ont)
    relationships = ontology.relationships_df(spark, ont)
    transcripts = synth.synth_transcripts(spark, args.turns,
                                          unique_texts=args.unique_texts)

    def mentions_df():
        return extract_mentions_df(transcripts, dictionary, num_partitions=cpus * 2)

    def candidates_df(m):
        return link.link_mentions(m, concepts, synonyms,
                                  assume_all_direct=ontology.all_entries_linked(ont))

    def facts_df(m):
        return facts_mod.build_facts(
            facts_mod.mention_facts_input(m, link.top_candidates(candidates_df(m))))

    # ------------------------------------------------------------------
    # plan capture mode
    # ------------------------------------------------------------------
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        m = mentions_df()
        f_ = facts_df(m)
        plans = {
            "extract": m,
            "facts": f_,
            "graph_first_facts": graph.first_facts(f_),
            "graph_triples": graph.build_triples(f_),
            "graph_nodes": graph.build_nodes(f_),
            "canon": graph.build_triples(canon.canonicalize_facts(f_, relationships)),
        }
        sys.path.insert(0, REPO)
        import __spark_entry__ as entrymod

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        q = entrymod.queries()
        plans["flagship_kg_triples"] = q["kg_triples"](spark, sf_dir)
        for name, df in plans.items():
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print("wrote", path)
        spark.stop()
        return

    # ------------------------------------------------------------------
    # per-stage noop timing (stage inputs persisted+materialized first,
    # so each timing covers exactly one stage's computation)
    # ------------------------------------------------------------------
    stages = args.stages.split(",")
    out: dict[str, list[float]] = {s: [] for s in stages}
    sc = spark.sparkContext

    # warm python workers / codegen once
    sc.setJobDescription("warmup")
    mentions_df().limit(10_000).write.format("noop").mode("overwrite").save()

    for rep in range(args.reps):
        m = mentions_df().persist()
        if "extract" in stages:
            sc.setJobDescription(f"extract rep{rep}")
            out["extract"].append(noop(m))
        else:
            m.count()
        if "link" in stages:
            sc.setJobDescription(f"link rep{rep}")
            out["link"].append(noop(candidates_df(m)))
        f_ = facts_df(m).persist()
        if "facts" in stages:
            sc.setJobDescription(f"facts rep{rep}")
            out["facts"].append(noop(f_))
        else:
            f_.count()
        if "graph" in stages:
            sc.setJobDescription(f"graph rep{rep}")
            gb = graph.first_facts(f_).persist()
            t = noop(gb)
            t += noop(graph.build_nodes(gb, prepared=True))
            t += noop(graph.build_edges(gb, prepared=True))
            gb.unpersist()
            out["graph"].append(round(t, 3))
        if "canon" in stages:
            sc.setJobDescription(f"canon rep{rep}")
            out["canon"].append(noop(
                graph.build_triples(canon.canonicalize_facts(f_, relationships))))
        f_.unpersist()
        m.unpersist()

    print(json.dumps({
        "turns": args.turns, "cpus": cpus, "reps": args.reps,
        "unique_texts": args.unique_texts,
        "stage_sec": {k: v for k, v in out.items() if v},
        "stage_min": {k: min(v) for k, v in out.items() if v},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
