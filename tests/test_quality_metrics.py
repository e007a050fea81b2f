"""Quality-metrics trending operators (kgnorm.metrics).

Mirrors reference quality_metrics.py:246-387,494-525 semantics:
index-based percentiles, confidence buckets, mapping success rate,
rolling trend, precision/recall/F1 with raw-ratio F1.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from kgnorm import metrics


@pytest.fixture(scope="module")
def mentions(spark):
    rows = []
    # 25 conversations, conv i has i+1 mentions at confidence .4 + i*.02
    for i in range(25):
        for j in range(i + 1):
            rows.append((f"C{i:02d}", 0, f"t{j}", 0.4 + i * 0.02,
                         "Condition" if j % 2 == 0 else "Drug",
                         100 + j if j % 3 else 0))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, mention_text string,"
              " confidence double, domain_hint string, omop_concept_id long")


def test_per_doc_metrics(spark, mentions):
    pm = {r.conv_id: r for r in metrics.per_doc_metrics(mentions).collect()}
    assert pm["C04"].mentions_extracted == 5
    assert pm["C04"].conditions_extracted == 3
    assert pm["C04"].drugs_extracted == 2
    assert pm["C04"].mappings_found + pm["C04"].mappings_failed == 5


def test_aggregated_quality_percentile_indexing(spark, mentions):
    row = metrics.aggregated_quality(metrics.per_doc_metrics(mentions)).collect()[0]
    assert row.document_count == 25
    assert row.total_mentions == 25 * 26 // 2
    # sorted per-doc loads are 1..25; reference p50 = sorted[25 // 2] = 13
    assert row.p50_mentions == 13
    # n=25 > 20 → p95 = sorted[int(25 * 0.95)] = sorted[23] = 24
    assert row.p95_mentions == 24
    # n=25 <= 100 → p99 falls back to max
    assert row.p99_mentions == 25
    assert row.max_mentions == 25
    assert row.conf_0_05 + row.conf_05_07 + row.conf_07_09 + row.conf_09_10 == 25


def test_rolling_trend(spark, mentions):
    pm = metrics.per_doc_metrics(mentions)
    got = {r.conv_id: r for r in metrics.rolling_trend(pm, "mentions_extracted", 3).collect()}
    assert got["C00"].rolling_avg == pytest.approx(1.0)
    assert got["C02"].rolling_avg == pytest.approx((1 + 2 + 3) / 3)
    assert got["C10"].rolling_avg == pytest.approx((9 + 10 + 11) / 3)


def test_rolling_trend_prefix_path(spark, mentions):
    """The w ≫ 100 prefix-sum formulation gives the same rolling means
    as the explode plan on the driver query's integer metric, including
    a window larger than the row count."""
    pm = metrics.per_doc_metrics(mentions)
    for w in (1, 3, 1000):
        a = {(r.conv_id, r.value): r.rolling_avg for r in metrics.rolling_trend(
            pm, "mentions_extracted", w, method="explode").collect()}
        b = {(r.conv_id, r.value): r.rolling_avg for r in metrics.rolling_trend(
            pm, "mentions_extracted", w, method="prefix").collect()}
        assert a == b, f"window_size={w}"
    with pytest.raises(ValueError):
        metrics.rolling_trend(pm, "mentions_extracted", 5, method="bogus")


def test_rolling_trend_auto_switches_to_prefix(spark, mentions):
    """method='auto' must avoid the w× row explosion for large windows:
    no explode/sequence in the optimized plan above the cutoff."""
    pm = metrics.per_doc_metrics(mentions)
    big = metrics.rolling_trend(pm, "mentions_extracted", 500) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "explode" not in big.lower()
    small = metrics.rolling_trend(pm, "mentions_extracted", 10) \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "explode" in small.lower()


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=0, max_value=50),
                     min_size=1, max_size=30),
       w=st.integers(min_value=1, max_value=64))
def test_rolling_trend_formulations_agree_property(spark, vals, w):
    """Property pin (r4 verdict #7): explode and prefix formulations are
    byte-identical on integer metrics for random inputs and window
    sizes, and both equal the direct rolling mean."""
    rows = [(f"C{i:05d}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "conv_id string, m long")
    got = {}
    for method in ("explode", "prefix"):
        got[method] = sorted(
            (r.conv_id, r.value, r.rolling_avg)
            for r in metrics.rolling_trend(df, "m", w, method=method).collect())
    expected = sorted(
        (f"C{i:05d}", v,
         round(sum(vals[max(0, i - w + 1):i + 1]) / min(i + 1, w), 6))
        for i, v in enumerate(vals))
    assert got["explode"] == got["prefix"] == expected


def test_rolling_trend_no_unpartitioned_window_over_docs(spark, mentions):
    """r3 verdict item #1: the rolling mean must never funnel the
    per-doc table through one task.  In the new plan every
    unpartitioned window consumes the per-range-partition COUNTS
    aggregate (≤ shuffle-partitions rows); the per-doc rows only meet a
    window partitioned by the range-partition id."""
    pm = metrics.per_doc_metrics(mentions)
    plan = metrics.rolling_trend(
        pm, "mentions_extracted", 10)._jdf.queryExecution().optimizedPlan().toString()
    ln = plan.splitlines()
    for i, l in enumerate(ln):
        if "windowspecdefinition(" not in l:
            continue
        if "windowspecdefinition(pid" in l or "windowspecdefinition(SPARK_PARTITION_ID" in l:
            continue  # partitioned by the range-partition id — distributed
        # unpartitioned window: must sit over the tiny pid-counts Aggregate
        below = "\n".join(ln[i:i + 4])
        assert "Aggregate" in below, f"global window over non-aggregate input:\n{below}"
    # and the distributed row_number window must exist
    assert any("windowspecdefinition(pid" in l or "spark_partition_id" in l.lower()
               for l in ln)


def test_rolling_trend_window_sizes(spark, mentions):
    """Exactness across edge window sizes on the distributed plan."""
    pm = metrics.per_doc_metrics(mentions)
    for w in (1, 2, 25, 40):  # 1, partial, == n, > n
        got = {r.conv_id: r.rolling_avg
               for r in metrics.rolling_trend(pm, "mentions_extracted", w).collect()}
        vals = {f"C{i:02d}": i + 1 for i in range(25)}
        for i in range(25):
            lo = max(0, i - w + 1)
            exp = round(sum(vals[f"C{j:02d}"] for j in range(lo, i + 1)) / (i - lo + 1), 6)
            assert got[f"C{i:02d}"] == pytest.approx(exp, abs=1e-9), (w, i)


def test_accuracy_prf(spark):
    rows = [
        ("condition", True, True),   # tp
        ("condition", True, False),  # fp
        ("condition", False, True),  # fn
        ("drug", True, True),        # tp
    ]
    val = spark.createDataFrame(rows, "entity_type string, predicted boolean, actual boolean")
    got = {r.entity_type: r for r in metrics.accuracy_prf(val).collect()}
    c = got["condition"]
    assert (c.tp, c.fp, c.fn) == (1, 1, 1)
    assert c.precision == pytest.approx(0.5)
    assert c.recall == pytest.approx(0.5)
    assert c.f1_score == pytest.approx(0.5)
    d = got["drug"]
    assert (d.precision, d.recall, d.f1_score) == (1.0, 1.0, 1.0)
    a = got["all"]
    assert a.total_samples == 4 and a.tp == 2


def test_aggregated_quality_percentiles_with_duplicate_values(spark):
    # histogram-cumsum path (r3): duplicate m runs must map every index
    # inside the run to that m — 4 docs with m=[1,1,1,2] → i50=3 → p50=1
    rows = []
    for i, m in enumerate([1, 1, 1, 2]):
        for j in range(m):
            rows.append((f"D{i}", 0, f"t{j}", 0.9, "Condition", 1))
    mdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, mention_text string,"
              " confidence double, domain_hint string, omop_concept_id long")
    row = metrics.aggregated_quality(metrics.per_doc_metrics(mdf)).collect()[0]
    assert row.p50_mentions == 1
    # ≤20 docs → p95/p99 fall back to max (quality_metrics.py idx guards)
    assert row.p95_mentions == 2 and row.p99_mentions == 2


def test_aggregated_quality_no_per_doc_global_sort(spark):
    # the only Window in the plan must consume the groupBy(m) histogram,
    # never the raw per-doc table: check the window's child is an
    # aggregate, which caps the single-partition data at #distinct values
    rows = [(f"E{i}", 0, "t", 0.9, "Condition", 1) for i in range(30)]
    mdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, mention_text string,"
              " confidence double, domain_hint string, omop_concept_id long")
    plan = metrics.aggregated_quality(
        metrics.per_doc_metrics(mdf))._jdf.queryExecution().optimizedPlan().toString()
    ln = plan.splitlines()
    widx = [i for i, l in enumerate(ln) if "Window" in l]
    assert widx, "expected a Window for the cumulative histogram"
    # beneath every Window there must be an Aggregate before any scan
    for i in widx:
        below = "\n".join(ln[i:i + 6])
        assert "Aggregate" in below


def test_logical_lineage_stable_across_partitionings(spark, mentions):
    """The logical-bucket lineage must be byte-identical however the
    physical layout changes (the resumability contract stage_metrics'
    spark_partition_id cannot give)."""
    bucket = F.pmod(F.hash("conv_id"), F.lit(8))
    a = metrics.logical_lineage(mentions, "m", bucket, 8).collect()
    b = metrics.logical_lineage(
        mentions.repartition(3, "mention_text"), "m", bucket, 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sum(r.rows for r in a) == mentions.count()
    assert all(r.stage == "m" and 0 <= r.bucket < 8 for r in a)
