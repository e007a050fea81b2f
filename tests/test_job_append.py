"""--append CLI mode: sequential incremental appends must converge to
the same facts a single full batch run produces."""

from pyspark.sql import functions as F

from kgnorm import facts as facts_mod, job, link, ontology, synth


def _expected_facts(spark, transcripts, ontology_bundle):
    from kgnorm.extract import extract_mentions_df

    d = ontology.broadcast_dictionary(spark, ontology_bundle)
    m = extract_mentions_df(transcripts, d)
    c = link.link_mentions(
        m, ontology.concepts_df(spark, ontology_bundle),
        ontology.synonyms_df(spark, ontology_bundle),
        assume_all_direct=ontology.all_entries_linked(ontology_bundle))
    return facts_mod.build_facts(
        facts_mod.mention_facts_input(m, link.top_candidates(c)))


def _canon(df):
    return sorted(
        (r.conv_id, r.omop_concept_id, r.assertion, r.temporality,
         r.experiencer, r.concept_name, r.domain, round(r.confidence, 6),
         r.evidence_count, r.first_turn_idx, r.first_start_offset)
        for r in df.collect()
    )


def test_two_appends_equal_one_batch(spark, tmp_path, ontology_bundle):
    from kgnorm import graph

    out_dir = str(tmp_path / "wh")
    all_t = synth.synth_transcripts(spark, 400)
    first = all_t.filter(F.col("turn_idx") < 5)
    second = all_t.filter(F.col("turn_idx") >= 5)

    r1 = job.run_append(spark, first, out_dir, n_buckets=8)
    n1 = r1["facts"].count()
    r2 = job.run_append(spark, second, out_dir, n_buckets=8)

    expected = _expected_facts(spark, all_t, ontology_bundle)
    assert _canon(r2["facts"]) == _canon(expected)
    assert r2["facts"].count() >= n1
    # the incrementally-maintained triples projection equals the batch one
    got_triples = sorted(
        (t.conv_id, t.subj, t.pred, t.obj, t.assertion)
        for t in r2["triples"].collect())
    exp_triples = sorted(
        (t.conv_id, t.subj, t.pred, t.obj, t.assertion)
        for t in graph.build_triples(expected).collect())
    assert got_triples == exp_triples
