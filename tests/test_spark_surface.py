"""End-to-end Spark-surface tests: match job, context columns, sinks,
streaming (availableNow), multimodal plumbing, pipeline ops.

One shared local[4] session; each test drives a real DataFrame action.
"""

import os
import shutil

import pytest

from fuzzy_search_spark.fixtures import (
    README_CONFIG,
    README_MODEL,
    write_web_pages_parquet,
)
from fuzzy_search_spark.model import compile_model

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def spark():
    from fuzzy_search_spark.spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = get_spark(master="local[4]", app_name="surface-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "web_pages.parquet")
    write_web_pages_parquet(path, n_bulk=60, tail_docs_per_1k=0)
    return path


@pytest.fixture(scope="module")
def matches_df(spark, pages_path):
    from fuzzy_search_spark.spark.job import match_documents

    model = compile_model(README_MODEL, README_CONFIG)
    df = spark.read.parquet(pages_path)
    return match_documents(df, model).cache()


def test_match_job_golden_rows(matches_df):
    golden = matches_df.filter(
        matches_df.url.contains("golden-nl-1")).orderBy("offset").collect()
    assert [(r.string, r.offset, r.end) for r in golden] == [
        ("Veucris", 3, 10), ("den 5. Januaris 1725", 11, 31),
        ("PR&ASIDE", 33, 41), ("PRASENTIEBUS", 63, 75), ("Velters", 322, 329),
    ]


def test_context_columns(spark, pages_path, matches_df):
    from fuzzy_search_spark.context import attach_context_columns

    from pyspark.sql import functions as F

    docs = spark.read.parquet(pages_path)
    ctx = attach_context_columns(matches_df, docs, context_size=10)
    # NB: ctx.offset would resolve to DataFrame.offset (the method) in
    # Spark 4 — always address this column via F.col
    row = ctx.filter(
        ctx.url.contains("golden-nl-1") & (F.col("offset") == 33)).head()
    assert row.string == "PR&ASIDE"
    assert row.context == "ris 1725. PR&ASIDE, Den Heer"
    assert row.prefix == "ris 1725. "
    assert row.suffix == ", Den Heer"


def test_context_library_matches_spark(spark, pages_path, matches_df):
    from fuzzy_search_spark.context import find_matches_with_context

    docs = {r.url: r.text for r in spark.read.parquet(pages_path)
            .filter("url like '%golden-nl-1%'").collect()}
    model = compile_model(README_MODEL, README_CONFIG)
    for url, text in docs.items():
        ctxs = find_matches_with_context(text, model, context_size=10)
        assert [c["match"].string for c in ctxs][:2] == [
            "Veucris", "den 5. Januaris 1725"]


def test_sinks(matches_df):
    import json

    from fuzzy_search_spark.sinks import to_match_json, to_web_annotations

    row = to_match_json(matches_df).head()
    payload = json.loads(row.match_json)
    assert payload["type"] == "PhraseMatch"
    assert {"phrase", "variant", "string", "offset", "match_scores"} <= set(payload)

    anno = json.loads(to_web_annotations(matches_df).head().annotation)
    assert anno["type"] == "Annotation"
    assert anno["target"]["selector"][0]["type"] == "TextPositionSelector"


def test_streaming_available_now(spark, pages_path, tmp_path):
    from fuzzy_search_spark.streaming import stream_matches

    model = compile_model(README_MODEL, README_CONFIG)
    # file-source streaming wants a directory of files
    stream_in = tmp_path / "stream_in"
    stream_in.mkdir()
    shutil.copy(pages_path, stream_in / "part-0.parquet")
    out = str(tmp_path / "stream_out")
    chk = str(tmp_path / "chk")
    q = stream_matches(spark, str(stream_in), model, out, chk,
                       available_now=True)
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    n_first = first.count()
    assert n_first > 0
    # incremental: a new shard arrives; only its rows are appended
    shutil.copy(pages_path, stream_in / "part-1.parquet")
    q2 = stream_matches(spark, str(stream_in), model, out, chk,
                        available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2 * n_first


def test_stream_matches_byte_equals_batch(spark, pages_path, tmp_path):
    """The exactly-once claim, pinned: an availableNow stream_matches run
    over sharded input produces BYTE-IDENTICAL rows to the batch
    match_documents plan on the same pages (streaming is the batch plan
    under readStream — same broadcast model, same mapInPandas kernel)."""
    import shutil as _sh

    from fuzzy_search_spark.spark.job import match_documents
    from fuzzy_search_spark.streaming import stream_matches

    model = compile_model(README_MODEL, README_CONFIG)
    stream_in = tmp_path / "in"
    stream_in.mkdir()
    # two shards so the catch-up run spans multiple micro-batch files
    _sh.copy(pages_path, stream_in / "part-0.parquet")
    df = spark.read.parquet(pages_path)
    extra = df.limit(17)
    extra.write.mode("overwrite").parquet(str(tmp_path / "extra"))
    for f in (tmp_path / "extra").glob("*.parquet"):
        _sh.copy(f, stream_in / "part-1.parquet")
    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    q = stream_matches(spark, str(stream_in), model, out, chk,
                       available_now=True)
    q.awaitTermination(120)

    batch_df = match_documents(
        spark.read.parquet(str(stream_in)), model, html_col="html")
    batch = sorted(map(str, batch_df.collect()))
    streamed = sorted(map(str, spark.read.parquet(out)
                          .select(*batch_df.columns).collect()))
    assert len(batch) > 0
    assert streamed == batch


def test_multimodal_plumbing(spark, pages_path):
    from fuzzy_search_spark.pipeline.multimodal import (
        image_features,
        media_metadata,
    )

    df = spark.read.parquet(pages_path).selectExpr(
        "url", "html as payload").limit(20)
    meta = media_metadata(df).collect()
    assert all(m.media_type == "application/octet-stream" for m in meta)
    assert all(len(m.sha256) == 64 and m.n_bytes > 0 for m in meta)

    png = spark.createDataFrame(
        [("u1", b"\x89PNG\r\n\x1a\n" + b"x" * 64),
         ("u2", b"\xff\xd8\xff\xe0" + b"y" * 64)],
        "url string, payload binary")
    got = {r.url: r for r in media_metadata(png).collect()}
    assert got["u1"].media_type == "image/png"
    assert got["u2"].media_type == "image/jpeg"

    # both payloads carry real magics over garbage bodies: the REAL
    # decoders (PNG inflate+unfilter, JPEG huffman+IDCT) reject them and
    # the rows are skipped — corrupt crawl bytes cost rows, never tasks
    feats = image_features(png).collect()
    assert feats == []
    # a VALID baseline JPEG decodes for real
    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import encode_jpeg_gray

    ok = spark.createDataFrame(
        [("j1", bytearray(encode_jpeg_gray(
            np.full((16, 16), 150, dtype=np.uint8))))],
        "url string, payload binary")
    got = image_features(ok).collect()
    assert len(got) == 1
    assert got[0].mean_rgb == [150.0, 150.0, 150.0]
    assert (got[0].height, got[0].width) == (16, 16)


def test_resume_manifest(spark, pages_path, tmp_path):
    from fuzzy_search_spark.spark.job import run_extraction_job

    model = compile_model(README_MODEL, README_CONFIG)
    out = str(tmp_path / "job_out")
    s1 = run_extraction_job(spark, pages_path, out, model, num_groups=2)
    assert s1["ran"] == [0, 1]
    s2 = run_extraction_job(spark, pages_path, out, model, num_groups=2)
    assert s2["ran"] == [] and s2["skipped"] == [0, 1]
    # metrics rows exist per group
    assert sorted(os.listdir(os.path.join(out, "_metrics"))) == [
        "group=0.json", "group=1.json"]


def test_resume_fingerprint_drift(spark, pages_path, tmp_path):
    """A config change must invalidate committed groups (new fingerprint)."""
    from fuzzy_search_spark.spark.job import run_extraction_job

    out = str(tmp_path / "drift_out")
    m1 = compile_model(README_MODEL, README_CONFIG)
    s1 = run_extraction_job(spark, pages_path, out, m1, num_groups=2)
    assert s1["ran"] == [0, 1]
    changed = dict(README_CONFIG, levenshtein_threshold=0.8)
    m2 = compile_model(README_MODEL, changed)
    s2 = run_extraction_job(spark, pages_path, out, m2, num_groups=2)
    assert s2["ran"] == [0, 1] and s2["skipped"] == []
    # and the original model still resumes cleanly
    s3 = run_extraction_job(spark, pages_path, out, m1, num_groups=2)
    assert s3["ran"] == [] and s3["skipped"] == [0, 1]


def test_template_matching_spark(spark, matches_df):
    """groupBy(url).applyInPandas template wrapper agrees with the local
    template engine on every document."""
    from fuzzy_search_spark.template import (
        find_template_matches,
        match_templates,
        parse_template,
    )
    from fuzzy_search_spark.matcher import Match

    labels = {"date", "person"}
    tpl = parse_template(["date", "person"], known_labels=labels)
    # give two phrases template labels
    labeled = matches_df.selectExpr(
        "url", "phrase", "variant", "string", "offset", "end",
        "CASE WHEN phrase = 'den .. Januarii 1725' THEN array('date') "
        "     WHEN phrase IN ('Veneris', 'PRAESIDE') THEN array('person') "
        "     ELSE label END AS label",
        "ignorecase", "char_match", "ngram_match", "levenshtein_similarity")
    got = {}
    for r in match_templates(labeled, tpl).collect():
        got.setdefault(r.url, []).append(
            (r.template_index, r.n_matches, tuple(r.labels)))

    expect = {}
    for url, rows in _group_rows(labeled.collect()).items():
        ms = [Match(phrase=x.phrase, variant=x.variant, string=x.string,
                    offset=x.offset, end=x.end,
                    label=list(x.label) if x.label is not None else None,
                    char_match=x.char_match, ngram_match=x.ngram_match,
                    levenshtein_similarity=x.levenshtein_similarity)
              for x in sorted(rows, key=lambda m: (m.offset, m.end, m.phrase))]
        tms = find_template_matches(ms, tpl)
        if tms:
            expect[url] = [
                (i, len(t.phrase_matches),
                 tuple(sorted({lab for m in t.phrase_matches
                               for lab in (m.label or [])
                               if lab is not None})))
                for i, t in enumerate(tms)]
    assert got == expect and expect, "spark/local template mismatch"


def _group_rows(rows):
    out = {}
    for r in rows:
        out.setdefault(r.url, []).append(r)
    return out


def test_partitioning_invariance(spark, pages_path):
    """t3 (SURVEY §5.2): per-url results are identical regardless of
    partition count, url-hash salting, or giant-doc chunking — Spark
    distribution must never change what a document matches."""
    from fuzzy_search_spark.spark.job import match_documents, salt_by_url

    model = compile_model(README_MODEL, README_CONFIG)
    base = spark.read.parquet(pages_path)

    def rows(df, **kw):
        out = match_documents(df, model, **kw)
        return sorted(
            (r.url, r.phrase, r.variant, r.string, r.offset, r.end,
             r.char_match, r.ngram_match, r.levenshtein_similarity)
            for r in out.collect())

    expect = rows(base.coalesce(1))
    assert expect, "fixture produced no matches"
    assert rows(base.repartition(7)) == expect
    assert rows(salt_by_url(base, 5)) == expect
    assert rows(base.repartition(3), chunk_chars=512) == expect


def test_lineage_metrics_values(spark, pages_path, tmp_path):
    """Per-partition lineage rows must ACCOUNT for the data: summed docs ==
    input rows with text, summed matches == written match rows, and every
    partition row carries a non-negative wall."""
    import json

    from fuzzy_search_spark.spark.job import run_extraction_job

    model = compile_model(README_MODEL, README_CONFIG)
    out = str(tmp_path / "lineage_out")
    run_extraction_job(spark, pages_path, out, model, num_groups=2)

    n_input = spark.read.parquet(pages_path).filter(
        "text is not null and text <> ''").count()
    n_matches = spark.read.parquet(os.path.join(out, "matches")).count()

    total_docs = total_matches = 0
    for g in (0, 1):
        with open(os.path.join(out, "_metrics", f"group={g}.json")) as fh:
            payload = json.load(fh)
        rows = payload["partitions"]
        assert rows, f"group {g} has no partition rows"
        assert all(r["wall_ms"] >= 0 and r["chars"] >= r["docs"]
                   for r in rows)
        total_docs += sum(r["docs"] for r in rows)
        total_matches += sum(r["matches"] for r in rows)
    assert total_docs == n_input
    assert total_matches == n_matches


def test_minhash_plan_shape(spark):
    """Plan-regression guard for the LSH shape: zero SortAggregates
    (numeric signature components keep min() in a mutable hash-agg
    buffer), and the bucket-size-cap pre-count shares the banded-signature
    subtree with the pair generation via runtime stage reuse — the
    shingle->signature pipeline materializes ONCE, not per branch."""
    from fuzzy_search_spark.pipeline.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"word{i} alpha beta gamma delta epsilon {i}") for i in range(50)],
        "doc_id long, text string")
    out = minhash_lsh_pairs(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan
    # exactly two branches over the banded subtree: the size pre-count and
    # the capped collect_list (a third would mean an accidental recompute)
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 2
    out.collect()
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert final.count("Reused") >= 1, "banded subtree not stage-reused"


def test_minhash_bucket_cap(spark):
    """Oversized buckets are excluded from pair generation and surfaced by
    the audit helper."""
    from fuzzy_search_spark.pipeline.dedup import (
        minhash_lsh_pairs,
        oversized_lsh_buckets,
    )

    # 30 identical docs (one degenerate bucket) + 2 near-dups
    docs = spark.createDataFrame(
        [(i, "the same templated text every time") for i in range(30)]
        + [(100, "a unique document about owls and trees"),
           (101, "a unique document about owls and bees")],
        "doc_id long, text string")
    capped = minhash_lsh_pairs(docs, max_bucket_size=10)
    ids = {r["id_a"] for r in capped.collect()} | \
        {r["id_b"] for r in capped.collect()}
    assert ids <= {100, 101}, "capped bucket leaked pairs"
    audit = oversized_lsh_buckets(docs, max_bucket_size=10).collect()
    assert audit and all(r["bucket_n"] == 30 for r in audit)
    uncapped = minhash_lsh_pairs(docs)
    assert uncapped.filter("id_a < 50").count() > 0


def test_cli_entry_point(spark, pages_path, tmp_path):
    """The spark-submit entry point (python -m fuzzy_search_spark) runs
    both pipelines end to end from file-based phrase/config inputs."""
    import json

    from fuzzy_search_spark.__main__ import main

    phrases_file = tmp_path / "phrases.json"
    phrases_file.write_text(json.dumps(list(README_MODEL)))
    config_file = tmp_path / "config.json"
    config_file.write_text(json.dumps(README_CONFIG))

    out1 = str(tmp_path / "cli_out")
    summary = main([
        "--input", pages_path, "--output", out1,
        "--phrases", str(phrases_file), "--config", str(config_file),
        "--num-groups", "2",
    ], spark=spark)
    assert summary["mode"] == "phrase" and summary["ran"] == [0, 1]
    assert spark.read.parquet(os.path.join(out1, "matches")).count() > 0

    out2 = str(tmp_path / "cli_out_tokens")
    summary2 = main([
        "--input", pages_path, "--output", out2,
        "--phrases", str(phrases_file), "--config", str(config_file),
        "--token-mode",
    ], spark=spark)
    assert summary2["mode"] == "token"
    assert spark.read.parquet(out2).count() > 0


def test_vocabulary_table_dense_ids_no_global_window(spark):
    """Vocabulary dense ids are lexicographic ranks; the vocabulary itself
    never flows through a single-partition window or an RDD/Python pass —
    the only SinglePartition exchange feeds the tiny per-prefix-bucket
    count table (scale guard)."""
    from fuzzy_search_spark.analysis.vocabulary import vocabulary_table

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog ran"), (3, "a cat ran the race")],
        "doc_id long, text string")
    out = vocabulary_table(docs)
    rows = out.orderBy("term_id").collect()
    terms = [r["term"] for r in rows]
    assert terms == sorted(terms)
    assert [r["term_id"] for r in rows] == list(range(len(rows)))
    freqs = {r["term"]: r["freq"] for r in rows}
    assert freqs["the"] == 3 and freqs["cat"] == 2 and freqs["race"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the row_number window over the full term set must be partitioned
    assert "row_number() windowspecdefinition(_bkt" in plan
    # exactly one SinglePartition exchange: the bucket-count running sum
    assert plan.count("Exchange SinglePartition") == 1
    # no RDD/Python pass in the id assignment
    assert "PythonRDD" not in plan and "MapPartitions" not in plan


def test_vocabulary_round_trip(spark):
    """vocabulary_from_df collects into the reference-API Vocabulary and
    the term<->id maps are mutually inverse."""
    from fuzzy_search_spark.analysis.vocabulary import vocabulary_from_df

    docs = spark.createDataFrame(
        [(1, "Alpha beta Gamma"), (2, "beta delta")],
        "doc_id long, text string")
    vocab = vocabulary_from_df(docs)
    assert len(vocab) == 4
    for term in vocab:
        assert vocab.id2term(vocab.term2id(term)) == term
    assert vocab.has_term("ALPHA")  # ignorecase inherited from lowercase=True
    assert vocab.term_freq["beta"] == 2


def test_analysis_plans_are_lazy(spark):
    """Regression guard for the de-eagered scalar-totals pattern: building
    the spelling/frequency plans must trigger ZERO Spark jobs (totals are
    broadcast one-row aggregates inside the DAG, not driver .head() calls),
    and the adaptive runtime reuses the shared aggregation exchange."""
    from fuzzy_search_spark.analysis.freq import (
        log_likelihood_ratio,
        ngram_probabilities,
    )
    from fuzzy_search_spark.analysis.spelling import spelling_shifts

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i % 7} beta") for i in range(40)],
        "doc_id long, text string")
    docs2 = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i % 5} zeta") for i in range(40)],
        "doc_id long, text string")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    p1 = ngram_probabilities(docs)
    p2 = log_likelihood_ratio(docs, docs2, min_freq=1)
    p3 = spelling_shifts(docs, docs2, min_freq=1, similarity_threshold=0.1)
    after = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
    assert after == before, "plan construction ran eager Spark jobs"
    assert p1.count() > 0 and p2.count() > 0 and p3.count() >= 0
    p1.collect()
    final = p1._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert final.count("Reused") >= 1, "no exchange/stage reuse in AQE plan"


def test_ann_plans_are_lazy_with_dim(spark):
    """pairwise_topk/lsh_bucket must not fire eager .head() dim-probe jobs
    when the caller passes the known dimension."""
    from fuzzy_search_spark.pipeline.ann import lsh_bucket, pairwise_topk

    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0], f"l{i % 2}") for i in range(12)],
        "vec_id long, embedding array<double>, label string")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    p1 = pairwise_topk(df, k=2, dim=3)
    p2 = lsh_bucket(df, num_planes=4, dim=3)
    after = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
    assert after == before, "plan construction ran eager Spark jobs"
    assert p1.count() > 0 and p2.count() == 12


def test_write_matches_iceberg_is_partition_overwrite():
    """Iceberg group writes must be replace-not-append so a re-run of a
    group whose manifest line never landed stays idempotent (the sandbox
    has no Iceberg jars, so the v2-writer call is asserted via a stub)."""
    from fuzzy_search_spark.spark.job import write_matches

    calls = []

    class _Writer:
        def overwritePartitions(self):
            calls.append("overwritePartitions")

        def append(self):  # pragma: no cover - would be the bug
            calls.append("append")

    class _Df:
        def writeTo(self, target):
            calls.append(f"writeTo:{target}")
            return _Writer()

    write_matches(_Df(), "cat.db.matches", table_format="iceberg")
    assert calls == ["writeTo:cat.db.matches", "overwritePartitions"]


def test_cli_chunk_chars_forwarded(spark, pages_path, tmp_path):
    """--chunk-chars reaches match_documents (ADVICE r1: it was parsed but
    dropped) and, being exactness-preserving, leaves the output identical."""
    import json

    from fuzzy_search_spark.__main__ import main

    phrases_file = tmp_path / "phrases.json"
    phrases_file.write_text(json.dumps(list(README_MODEL)))
    config_file = tmp_path / "config.json"
    config_file.write_text(json.dumps(README_CONFIG))

    out_plain = str(tmp_path / "plain")
    out_chunked = str(tmp_path / "chunked")
    base = ["--phrases", str(phrases_file), "--config", str(config_file),
            "--input", pages_path, "--num-groups", "1"]
    main(base + ["--output", out_plain], spark=spark)
    main(base + ["--output", out_chunked, "--chunk-chars", "120"],
         spark=spark)
    cols = ["url", "phrase", "string", "offset", "end"]
    a = sorted(map(tuple, spark.read.parquet(
        os.path.join(out_plain, "matches")).select(cols).collect()))
    b = sorted(map(tuple, spark.read.parquet(
        os.path.join(out_chunked, "matches")).select(cols).collect()))
    assert a == b and len(a) > 0


def test_skipgram_similarity_bucketed_identical_and_debuckets_hot_grams(spark):
    """The (gram, length)-keyed variant returns exactly the banded
    variant's output, and a hot gram's join-key fanout drops because its
    candidates split across term lengths."""
    from pyspark.sql import functions as F

    from fuzzy_search_spark.analysis.similarity import (
        char_skipgram_counts,
        skipgram_similarity_topk,
        skipgram_similarity_topk_bucketed,
    )

    # a hot trigram 'the' spread over many lengths + assorted other terms
    terms = ([f"the{'x' * i}" for i in range(12)]
             + [f"{'y' * i}the" for i in range(12)]
             + ["cat", "cart", "chart", "charts", "smart", "start"])
    df = spark.createDataFrame([(t,) for t in set(terms)], "term string")
    banded = {(r["term"], r["rank"]): (r["similar_term"], r["cosine"])
              for r in skipgram_similarity_topk(df, k=4).collect()}
    bucketed = {(r["term"], r["rank"]): (r["similar_term"], r["cosine"])
                for r in skipgram_similarity_topk_bucketed(df, k=4).collect()}
    assert banded == bucketed and len(bucketed) > 0

    grams = char_skipgram_counts(df)
    hot = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n")) \
        .agg(F.max("n")).head()[0]
    hot_bucketed = grams.groupBy("gram", F.length("term").alias("l")) \
        .agg(F.count(F.lit(1)).alias("n")).agg(F.max("n")).head()[0]
    # the hottest raw gram key concentrates >= 3x more rows than any
    # (gram, length) key -> per-key quadratic fanout shrinks >= 9x
    assert hot >= 3 * hot_bucketed


def test_spelling_shifts_similarity_injection(spark):
    """An injected (term_a, term_b, similarity) table — the reference's
    external-embedding hook — replaces the built-in skipgram cosine and is
    honored in both orientations."""
    from pyspark.sql import functions as F

    from fuzzy_search_spark.analysis.spelling import spelling_shifts

    c1 = spark.createDataFrame(
        [(i, "aleph aleph aleph bet bet gimel") for i in range(6)],
        "doc_id long, text string")
    c2 = spark.createDataFrame(
        [(i, "alef alef alef bet bet gimel") for i in range(6)],
        "doc_id long, text string")
    sims = spark.createDataFrame(
        [("alef", "aleph", 0.9), ("gimel", "dalet", 0.8)],
        "term_a string, term_b string, similarity double")
    out = spelling_shifts(c1, c2, min_freq=1, similarity_threshold=0.5,
                          similarity_df=sims).collect()
    assert [(r["drop_word"], r["jump_word"], r["similarity"],
             r["change_type"]) for r in out] == [
        ("aleph", "alef", 0.9, "replace")]
    # below-threshold pairs drop out
    none = spelling_shifts(c1, c2, min_freq=1, similarity_threshold=0.95,
                           similarity_df=sims)
    assert none.count() == 0


def test_extract_mode_main_in_job(spark, tmp_path):
    """--extract-mode main routes the DOM-heuristic extractor through the
    job, and a mode switch invalidates manifest resume (new fingerprint)."""
    import json

    from pyspark.sql import functions as F

    from fuzzy_search_spark.__main__ import main

    page = (b"<html><body><nav><a href='/'>Home</a> <a href='/a'>A</a> "
            b"<a href='/b'>B</a></nav>"
            b"<article><p>Anthony Bosman, Makelaers tot Rotterdam, zullen "
            b"verkopen een schip met veel lading en toebehoren.</p>"
            b"</article></body></html>")
    src = tmp_path / "pages"
    spark.createDataFrame(
        [("u1", None, bytearray(page), None, "nl")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).coalesce(1).write.mode("overwrite").parquet(str(src))

    phrases_file = tmp_path / "p.json"
    phrases_file.write_text(json.dumps(["Makelaers"]))
    config_file = tmp_path / "c.json"
    config_file.write_text(json.dumps({"char_match_threshold": 0.6,
                                       "levenshtein_threshold": 0.6}))
    out = str(tmp_path / "out")
    base = ["--input", str(src), "--output", out, "--phrases",
            str(phrases_file), "--config", str(config_file),
            "--num-groups", "1"]
    s1 = main(base + ["--extract-mode", "main"], spark=spark)
    assert s1["matches"] == 1
    # strip mode: nav junk present upstream of the match, offsets differ
    s2 = main(base + ["--extract-mode", "strip"], spark=spark)
    assert s2["ran"] == [0], "extractor change must invalidate resume"
    got = spark.read.parquet(out + "/matches").filter(
        F.col("phrase") == "Makelaers").collect()
    assert len(got) == 1


def test_single_scan_pattern_and_ngram_plans(spark):
    """Plan guards: multi-pattern extraction and multi-order ngram counts
    read the corpus ONCE (tagged-array explode), not once per pattern or
    order (unionAll re-scans)."""
    from pyspark.sql import functions as F

    from fuzzy_search_spark.analysis.freq import word_ngram_counts
    from fuzzy_search_spark.patterns import extract_patterns

    docs = spark.createDataFrame(
        [(i, f"u{i}", "the cat sat on the mat in Amsterdam 1725")
         for i in range(10)],
        "doc_id long, url string, text string")
    for df in (extract_patterns(docs), word_ngram_counts(docs, max_n=3)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        scans = plan.count("Scan parquet") + plan.count("Scan ExistingRDD")
        assert scans == 1 and "Union" not in plan
    # the order tag must be the ngram order, not the array index
    counts = word_ngram_counts(docs, max_n=3)
    per_n = {r["n"]: r["total"] for r in counts.groupBy("n").agg(
        F.sum("freq").alias("total")).collect()}
    assert per_n == {1: 90, 2: 80, 3: 70}


def test_video_and_audio_plumbing(spark):
    from fuzzy_search_spark.pipeline.multimodal import (
        audio_features,
        video_frame_features,
    )

    payloads = spark.createDataFrame(
        [("v1", b"\x00\x00\x00\x18ftypmp42" + b"x" * 64),
         ("v2", b"different payload bytes here")],
        "url string, payload binary")
    frames = video_frame_features(payloads, n_frames=3).collect()
    assert len(frames) == 6  # row per (video, frame)
    assert {(f.height, f.width) for f in frames} == {(16, 16)}
    assert sorted({f.frame_index for f in frames}) == [0, 1, 2]
    again = video_frame_features(payloads, n_frames=3).collect()
    assert sorted(map(str, frames)) == sorted(map(str, again))

    # audio_features skips non-audio payloads (the video rows), decodes
    # real WAV bytes, and fake-decodes compressed audio (ID3/mp3)
    import numpy as np

    from fuzzy_search_spark.pipeline.codecs import encode_wav

    wav = encode_wav(
        np.array([3000, -3000] * 100, dtype=np.int16), 16000)
    audio = spark.createDataFrame(
        [("a1", bytearray(wav)), ("a2", b"ID3" + b"z" * 64),
         ("v1", b"\x00\x00\x00\x18ftypmp42" + b"x" * 64)],
        "url string, payload binary")
    clips = {c.url: c for c in audio_features(audio).collect()}
    assert set(clips) == {"a1", "a2"}
    assert clips["a1"].n_samples == 200
    assert clips["a1"].sample_rate == 16000
    assert clips["a1"].zero_crossings == 199
    assert clips["a2"].n_samples == 1024 and 0.0 < clips["a2"].rms < 1.0


def test_match_documents_matchless_batch(spark):
    """A batch that produces ZERO matches must yield cleanly: pandas 2.x
    types empty frames float64 and Arrow cannot convert that to the
    list<string> label column (regression: crashed before the WARC e2e
    job exposed it)."""
    from fuzzy_search_spark.spark.job import match_documents

    model = compile_model(README_MODEL, README_CONFIG)
    docs = spark.createDataFrame(
        [(f"u{i}", "zzz qqq xxx nothing matches here") for i in range(8)]
        + [("u-empty", None)],
        "url string, text string")
    out = match_documents(docs, model)
    assert out.count() == 0
    assert out.schema["label"].dataType.simpleString() == "array<string>"


def test_bucketed_join_is_colocated(spark, tmp_path):
    """write_bucketed tables join with ZERO Exchange operators — the
    shuffle is paid once at write time, not per query (the 100-TB layout
    story); the same join over unbucketed frames shuffles both sides."""
    from fuzzy_search_spark.spark.job import write_bucketed

    old_wh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pages = spark.range(500).selectExpr(
            "concat('u', id) AS url", "id AS x")
        matches = spark.range(1500).selectExpr(
            "concat('u', id % 500) AS url", "id AS m")
        write_bucketed(pages, "pages_b", num_buckets=8)
        write_bucketed(matches, "matches_b", num_buckets=8)

        j = spark.table("pages_b").join(spark.table("matches_b"), "url")
        assert j.count() == 1500
        plan = j._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan

        j2 = pages.join(matches, "url")
        j2.count()
        plan2 = j2._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
        assert plan2.count("Exchange") >= 2
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_b")
        spark.sql("DROP TABLE IF EXISTS matches_b")
        if old_wh is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_wh)


def test_match_job_plan_is_narrow(spark, pages_path):
    """The headline job (scan -> mapInPandas -> [write]) must stay a
    single narrow stage: no Exchange anywhere unless salting is asked
    for — the property that makes throughput scale linearly with
    executors at 10^12 rows."""
    from fuzzy_search_spark.spark.job import match_documents, salt_by_url

    model = compile_model(README_MODEL, README_CONFIG)
    df = spark.read.parquet(pages_path)
    plan = match_documents(df, model)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Exchange" not in plan, plan
    # salting is the one deliberate shuffle, and exactly one
    salted = match_documents(salt_by_url(df, 8), model)
    splan = salted._jdf.queryExecution().executedPlan().toString()
    assert splan.count("Exchange") == 1, splan
