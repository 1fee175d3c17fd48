"""Unit tests for the round-3 web-corpus hygiene ops: Gopher-style
repetition signals, benchmark decontamination, PII scan/redaction, and
URL canonicalization + URL-level dedup.

Each crafted test pins hand-computed expectations; the differential test
recomputes repetition fractions with an independent pure-Python oracle
(mirroring the driver's DuckDB oracle structure).
"""

from collections import Counter

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def spark():
    import os

    from fuzzy_search_spark.spark.session import get_spark

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = get_spark(master="local[4]", app_name="textops-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


# ---------------------------------------------------------------------------
# repetition_signals
# ---------------------------------------------------------------------------

def test_repetition_signals_crafted(spark):
    from fuzzy_search_spark.pipeline.textstats import repetition_signals

    rows = [
        (1, "a a a a a a a a a a"),      # maximal repetition
        (2, "one two three four five six seven eight nine ten"),
        (3, "x y x y x y"),
        (4, "hi"),                        # too short for any order
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert len(out) == 4

    # doc 1: every 2/3-gram identical, every 5-gram duplicated, the single
    # 10-gram occurs once (dup10 = 0)
    assert out[1].n_tokens == 10
    assert out[1].top2_frac == 1.0 and out[1].top3_frac == 1.0
    assert out[1].dup5_frac == 1.0 and out[1].dup10_frac == 0.0

    # doc 2: all grams distinct
    assert out[2].top2_frac == pytest.approx(1 / 9, abs=1e-6)
    assert out[2].dup5_frac == 0.0 and out[2].dup10_frac == 0.0

    # doc 3: 2-grams = [x y, y x, x y, y x, x y] -> top 3/5; 3-grams
    # [x y x, y x y, x y x, y x y] -> top 2/4; both 5-grams unique
    assert out[3].top2_frac == pytest.approx(0.6, abs=1e-6)
    assert out[3].top3_frac == pytest.approx(0.5, abs=1e-6)
    assert out[3].dup5_frac == 0.0

    # doc 4: one token -> no gram positions at any order -> all zeros
    assert out[4].top2_frac == 0.0 and out[4].top3_frac == 0.0
    assert out[4].dup5_frac == 0.0 and out[4].dup10_frac == 0.0


def test_repetition_signals_matches_python(spark):
    """Differential check against a pure-Python recomputation over the
    same lower + whitespace token stream."""
    from fuzzy_search_spark.pipeline.textstats import repetition_signals

    rows = [
        (1, "the cat sat on the mat the cat sat on the mat again"),
        (2, "spark spark spark streaming window window agg"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]

    def frac(words, n, kind):
        grams = [" ".join(words[i:i + n])
                 for i in range(len(words) - n + 1)]
        if not grams:
            return 0.0
        c = Counter(grams)
        if kind == "top":
            return max(c.values()) / len(grams)
        return sum(v for v in c.values() if v > 1) / len(grams)

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    for doc_id, text in rows:
        w = text.lower().split()
        r = out[doc_id]
        assert r.n_tokens == len(w)
        assert r.top2_frac == pytest.approx(frac(w, 2, "top"), abs=1e-6)
        assert r.top3_frac == pytest.approx(frac(w, 3, "top"), abs=1e-6)
        assert r.dup5_frac == pytest.approx(frac(w, 5, "dup"), abs=1e-6)
        assert r.dup10_frac == pytest.approx(frac(w, 10, "dup"), abs=1e-6)


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------

def test_decontaminate_crafted(spark):
    from fuzzy_search_spark.pipeline.textstats import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string")
    corpus = spark.createDataFrame([
        (1, "x alpha beta gamma delta y"),        # both bench 3-grams
        (2, "alpha beta gamma"),                   # one
        (3, "nothing shared here at all"),         # clean
        (4, "alpha beta gamma alpha beta gamma"),  # same span twice: 1 distinct
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in
           decontaminate(corpus, bench, k=3).collect()}
    assert len(out) == 4
    assert out[1].n_bench_spans == 2 and out[1].contaminated
    assert out[2].n_bench_spans == 1 and out[2].contaminated
    assert out[3].n_bench_spans == 0 and not out[3].contaminated
    assert out[4].n_bench_spans == 1 and out[4].contaminated


# ---------------------------------------------------------------------------
# pii_scan
# ---------------------------------------------------------------------------

def test_pii_scan_crafted(spark):
    from fuzzy_search_spark.pipeline.pii import pii_scan

    rows = [
        (1, "write to john.doe+spam@mail.example.org today"),
        (2, "server at 192.168.0.1 rebooted"),
        (3, "call +31 (0)20 555-0100 now"),
        (4, "no pii here"),
        (5, "a@b.co and 8.8.8.8 and +12345678901"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in pii_scan(docs).collect()}

    assert (out[1].n_emails, out[1].n_ipv4, out[1].n_phones) == (1, 0, 0)
    assert out[1].redacted_text == "write to <EMAIL> today"
    assert (out[2].n_emails, out[2].n_ipv4, out[2].n_phones) == (0, 1, 0)
    assert out[2].redacted_text == "server at <IP> rebooted"
    assert (out[3].n_emails, out[3].n_ipv4, out[3].n_phones) == (0, 0, 1)
    assert out[3].redacted_text == "call <PHONE> now"
    assert out[4].n_pii == 0 and out[4].redacted_text == "no pii here"
    assert out[5].n_pii == 3
    assert out[5].redacted_text == "<EMAIL> and <IP> and <PHONE>"


# ---------------------------------------------------------------------------
# URL canonicalization + dedup
# ---------------------------------------------------------------------------

def test_canonical_url_cases(spark):
    from pyspark.sql import functions as F

    from fuzzy_search_spark.pipeline.urls import canonical_url

    cases = [
        ("HTTPS://WWW.Example.COM:443/Path/", "https://www.example.com/Path"),
        ("http://example.com:80/a?b=1#frag", "http://example.com/a?b=1"),
        ("http://example.com:8080/a/", "http://example.com:8080/a"),
        ("https://example.com", "https://example.com"),
        ("example.com/Foo#x", "example.com/foo"),     # schemeless fallback
        ("http://example.com/a/?q=1", "http://example.com/a/?q=1"),
        ("https://example.com/x//", "https://example.com/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in
           df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_url_dup_groups_merges_variants(spark):
    from fuzzy_search_spark.pipeline.urls import url_dup_groups

    rows = [
        (1, "https://example.com/page"),
        (2, "HTTPS://EXAMPLE.com:443/page/"),
        (3, "https://example.com/page#top"),
        (4, "https://example.com/other"),
        (5, "https://example.com/page?v=2"),   # query differs: no merge
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.canonical_url: r for r in url_dup_groups(df).collect()}
    assert list(out) == ["https://example.com/page"]
    grp = out["https://example.com/page"]
    assert grp.keep_id == 1 and grp.n_pages == 3


# ---------------------------------------------------------------------------
# corpus mixing: mixture_plan + corpus_sample
# ---------------------------------------------------------------------------

def test_mixture_plan_crafted(spark):
    from fuzzy_search_spark.pipeline.mixing import mixture_plan

    rows = [
        (1, "a", "one two three four"),          # 4 tokens
        (2, "a", "five six"),                     # stratum a: 6 tokens
        (3, "b", "x " * 99 + "x"),                # stratum b: 100 tokens
        (4, "c", "only excluded stratum here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in
           mixture_plan(df, {"a": 3.0, "b": 1.0}, 40).collect()}
    assert set(out) == {"a", "b"}                 # 'c' has no weight
    # a: weight 0.75 -> 30 target tokens over 6 available -> capped at 1.0
    assert out["a"].n_docs == 2 and out["a"].n_tokens == 6
    assert out["a"].target_tokens == 30.0 and out["a"].rate == 1.0
    # b: weight 0.25 -> 10 target over 100 -> rate 0.1
    assert out["b"].n_tokens == 100 and out["b"].rate == pytest.approx(0.1)


def test_corpus_sample_deterministic_and_monotone(spark):
    import hashlib

    from fuzzy_search_spark.pipeline.mixing import corpus_sample

    rows = [(i, "s", "text") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    def py_bucket(i):
        return int(hashlib.md5(f"mix-v1:{i}".encode())
                   .hexdigest()[:15], 16) % 1_000_000

    got = {r.doc_id: r.bucket
           for r in corpus_sample(df, {"s": 0.3}).collect()}
    want = {i: py_bucket(i) for i in range(200)
            if py_bucket(i) < 300_000}
    assert got == want                            # matches python oracle

    # deterministic under repartitioning (unlike DataFrame.sample)
    again = {r.doc_id for r in
             corpus_sample(df.repartition(7), {"s": 0.3}).collect()}
    assert again == set(want)

    # monotone: raising the rate only ever ADDS documents
    bigger = {r.doc_id for r in corpus_sample(df, {"s": 0.6}).collect()}
    assert set(want) <= bigger


def test_corpus_sample_accepts_plan_df(spark):
    from fuzzy_search_spark.pipeline.mixing import corpus_sample, mixture_plan

    rows = [(i, "a" if i % 2 else "b", "w1 w2 w3 w4 w5") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = mixture_plan(df, {"a": 1.0, "b": 1.0}, 100)
    sampled = corpus_sample(df, plan)
    # rates = 50 target / 250 stratum tokens = 0.2 -> roughly 20 docs
    n = sampled.count()
    assert 0 < n < 100
    assert set(sampled.columns) == {"doc_id", "source", "bucket"}


# ---------------------------------------------------------------------------
# token counting: regex pre-tokenizer + distributed BPE encode
# ---------------------------------------------------------------------------

def test_regex_token_stats_crafted(spark):
    from fuzzy_search_spark.pipeline.textstats import regex_token_stats

    rows = [
        (1, "don't stop: $5.99 now!"),
        (2, "plain words only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in regex_token_stats(docs).collect()}
    # don | 't | " stop" | : | " $" | 5 | . | 99 | " now" | !
    assert out[1].n_ws_tokens == 4 and out[1].n_subword_tokens == 10
    assert out[1].subword_ratio == pytest.approx(2.5)
    # pure letter words split 1:1
    assert out[2].n_ws_tokens == 4 and out[2].n_subword_tokens == 4
    assert out[2].subword_ratio == 1.0


def test_bpe_token_counts_matches_python(spark):
    """Distributed encode counts == pure-Python encode_bpe over the same
    trained merges (and the hoisted-rank fast path is exercised)."""
    from fuzzy_search_spark.analysis.subtoken import (bpe_token_counts,
                                                      encode_bpe, train_bpe)

    texts = {
        1: "low lower lowest low low slow slower",
        2: "new newer newest news new",
        3: "low new low new wider wide",
    }
    hist = Counter(w for t in texts.values() for w in t.lower().split())
    _, merges = train_bpe(dict(hist), 12)

    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    got = {r.doc_id: r for r in
           bpe_token_counts(df.repartition(3), merges).collect()}
    for doc_id, text in texts.items():
        words = text.lower().split()
        want = sum(len(encode_bpe(w, merges)) for w in words)
        assert got[doc_id].n_words == len(words)
        assert got[doc_id].n_bpe_tokens == want
        assert got[doc_id].fertility == pytest.approx(
            round(want / len(words), 6))


# ---------------------------------------------------------------------------
# plan-shape guards (scale regression pins for the round-3 ops)
# ---------------------------------------------------------------------------

def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=40):
    return spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i % 7} beta epsilon zeta eta "
             f"theta iota kappa w{i % 3}") for i in range(n)],
        "doc_id long, text string")


def test_projection_ops_have_no_exchange(spark):
    """pii_scan / regex_token_stats / canonicalize_urls are pure column
    algebra: the executed plan must contain NO Exchange (they fuse into
    the scan — the property that makes them free at 100 TB)."""
    from fuzzy_search_spark.pipeline.pii import pii_scan
    from fuzzy_search_spark.pipeline.textstats import regex_token_stats
    from fuzzy_search_spark.pipeline.urls import canonicalize_urls

    docs = _docs(spark)
    urls = spark.createDataFrame(
        [(1, "HTTP://Example.com:80/a/"), (2, "https://x.org/b#frag")],
        "doc_id long, url string")
    for df in (pii_scan(docs), regex_token_stats(docs),
               canonicalize_urls(urls)):
        plan = _plan(df)
        assert "Exchange" not in plan, plan
        assert "Python" not in plan, plan


def test_bpe_token_counts_is_narrow(spark):
    """The distributed BPE encode is a narrow mapInPandas over the scan's
    partitioning: no Exchange anywhere in the plan."""
    from fuzzy_search_spark.analysis.subtoken import bpe_token_counts

    out = bpe_token_counts(_docs(spark), [("b", "e"), ("be", "ta")])
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_dup_span_ops_hash_aggregate_only(spark):
    """duplicate_spans / url_dup_groups / boilerplate_ratio keep every
    aggregation in HashAggregate (numeric agg buffers; no sort fallback),
    and boilerplate_ratio's two branches over the exploded-gram relation
    share one exchange at runtime (AQE reuse) instead of recomputing the
    explode."""
    from fuzzy_search_spark.pipeline.textstats import (boilerplate_ratio,
                                                       duplicate_spans)
    from fuzzy_search_spark.pipeline.urls import url_dup_groups

    docs = _docs(spark)
    urls = spark.createDataFrame(
        [(i, f"http://site{i % 5}.com/page#{i}") for i in range(20)],
        "doc_id long, url string")
    for df in (duplicate_spans(docs, k=3), url_dup_groups(urls)):
        assert "SortAggregate" not in _plan(df)

    br = boilerplate_ratio(docs, k=3)
    assert "SortAggregate" not in _plan(br)
    br.collect()
    final = _plan(br)
    assert "isFinalPlan=true" in final
    assert final.count("Reused") >= 1, "gram subtree not stage-reused"


def test_repetition_signals_no_window_no_python(spark):
    """repetition_signals is two hash aggregations — never a per-doc
    window, never a Python pass; all gram orders explode from ONE
    projection (a single scan feeds the counts subtree)."""
    from fuzzy_search_spark.pipeline.textstats import repetition_signals

    out = repetition_signals(_docs(spark))
    plan = _plan(out)
    assert "Window" not in plan
    assert "Python" not in plan
    assert "SortAggregate" not in plan


def test_decontaminate_broadcasts_bench(spark):
    """The benchmark span set joins broadcast-side: the 100-TB corpus is
    never shuffled on gram keys (probe is a map-side BroadcastHashJoin)."""
    from fuzzy_search_spark.pipeline.textstats import decontaminate

    docs = _docs(spark)
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta w1 beta epsilon zeta")],
        "doc_id long, text string")
    out = decontaminate(docs, bench, k=3)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    # the only span_hash-keyed exchange is the TINY benchmark-side
    # distinct; the corpus gram stream is never shuffled on span_hash
    # (its distinct/rollup keys always include doc_id)
    assert plan.count("hashpartitioning(span_hash") <= 1, plan


def test_mixing_is_broadcast_and_lazy(spark):
    """corpus_sample shuffles NOTHING (broadcast rate table + row filter)
    and neither mixing op fires a Spark job at plan-construction time."""
    from fuzzy_search_spark.pipeline.mixing import corpus_sample, mixture_plan

    from pyspark.sql import functions as F

    docs = _docs(spark).withColumn(
        "source", (F.col("doc_id") % 2 == 0).cast("string"))
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    plan_df = mixture_plan(docs, {"true": 2.0, "false": 1.0},
                           token_budget=100)
    sample = corpus_sample(docs, {"true": 0.5, "false": 0.25})
    after = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None))
    assert after == before, "plan construction ran eager Spark jobs"

    splan = _plan(sample)
    assert "BroadcastHashJoin" in splan
    assert "Exchange hashpartitioning" not in splan, splan
    assert plan_df.count() == 2 and sample.count() > 0



def test_packing_plan_invariants(spark):
    """Per-shard packing: positions are dense, running sums are
    consistent (start_tok of pos p == start_tok + n_tokens of pos p-1),
    bins honor the budget arithmetic, and the plan is deterministic
    across repartitioning."""
    from fuzzy_search_spark.pipeline.mixing import packing_plan

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(5 + i % 17)))
         for i in range(60)],
        "doc_id long, text string")
    rows = packing_plan(docs, max_tokens=32, num_shards=4).collect()
    assert len(rows) == 60

    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= {0, 1, 2, 3}
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r.pos)
        assert [m.pos for m in members] == list(range(len(members)))
        cum = 0
        for m in members:
            assert m.start_tok == cum
            assert m.bin_id == cum // 32
            assert m.bin_offset == cum % 32
            cum += m.n_tokens

    # deterministic under input repartitioning
    again = {r.doc_id: (r.shard, r.pos, r.bin_id) for r in
             packing_plan(docs.repartition(7), max_tokens=32,
                          num_shards=4).collect()}
    assert again == {r.doc_id: (r.shard, r.pos, r.bin_id) for r in rows}


def test_packing_plan_no_global_window(spark):
    """The cumulative sum windows over SHARD, never a single partition."""
    from fuzzy_search_spark.pipeline.mixing import packing_plan

    out = packing_plan(_docs(spark), max_tokens=64, num_shards=8)
    plan = _plan(out)
    assert "windowspecdefinition(shard" in plan
    assert "Exchange SinglePartition" not in plan
    assert "Python" not in plan


def test_tfidf_topk_crafted(spark):
    """TF-IDF keywords: a term unique to one doc outranks corpus-wide
    terms; ranking is dense 1..k; ubiquitous terms get the lowest idf."""
    import math

    from fuzzy_search_spark.analysis.freq import tfidf_topk

    docs = spark.createDataFrame([
        (1, "shared shared shared zebra"),
        (2, "shared shared quokka quokka quokka"),
        (3, "shared plain words here"),
    ], "doc_id long, text string")
    rows = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for members in by_doc.values():
        assert [m.rank for m in sorted(members, key=lambda m: m.rank)] \
            == list(range(1, len(members) + 1))
    # doc 2: quokka (tf=3, df=1) dominates shared (tf=2, df=3)
    top2 = sorted(by_doc[2], key=lambda m: m.rank)
    assert top2[0].term == "quokka" and top2[0].tf == 3 and top2[0].df == 1
    want = round(3 * (math.log(4 / 2) + 1), 6)
    assert top2[0].score == pytest.approx(want, abs=1e-6)
    # doc 1: zebra (unique) beats shared despite tf 1 vs 3?  No: tf 3
    # keeps shared ahead -> pin the actual order to the formula
    s_shared = round(3 * (math.log(4 / 4) + 1), 6)
    s_zebra = round(1 * (math.log(4 / 2) + 1), 6)
    top1 = sorted(by_doc[1], key=lambda m: m.rank)
    if s_shared >= s_zebra:
        assert top1[0].term == "shared"
    else:
        assert top1[0].term == "zebra"


def test_tfidf_topk_plan_shape(spark):
    """The (doc, term) pair aggregation materializes once (AQE stage
    reuse across the df-count and scoring branches); the only window
    partitions by doc_id."""
    from fuzzy_search_spark.analysis.freq import tfidf_topk

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma w{i % 5} delta") for i in range(30)],
        "doc_id long, text string")
    out = tfidf_topk(docs, k=3)
    out.collect()
    final = (out._jdf.queryExecution().executedPlan().toString()
             .split("== Initial")[0])
    assert "isFinalPlan=true" in final
    assert final.count("Reused") >= 1, "pair subtree not stage-reused"
    assert final.count("Generate explode") == 1
    assert "windowspecdefinition(doc_id" in final
    # the only SinglePartition exchange is the one-row corpus-count
    # total that gets broadcast (the blessed scalar-totals pattern)
    assert final.count("Exchange SinglePartition") <= 1


# ---------------------------------------------------------------------------
# Stupid-Backoff bigram LM quality scoring (pipeline/lm.py)
# ---------------------------------------------------------------------------


def test_lm_bigram_training_counts(spark):
    from fuzzy_search_spark.pipeline.lm import train_bigram_lm

    train = spark.createDataFrame(
        [(0, "the cat sat"), (2, "the cat ran"), (4, "")],
        "doc_id long, text string")
    uni, big, tot = train_bigram_lm(train)
    assert sorted((r.w, r.c) for r in uni.collect()) == [
        ("cat", 2), ("ran", 1), ("sat", 1), ("the", 2)]
    # context counts attached; <s> context = n_docs (incl. the empty doc)
    assert sorted((r.g, r.c12, r.c1) for r in big.collect()) == [
        ("<s> the", 2, 3), ("cat ran", 1, 2), ("cat sat", 1, 2),
        ("the cat", 2, 2)]
    t = tot.collect()[0]
    assert (t.train_tokens, t.vocab_size, t.n_docs) == (6, 4, 3)


def test_lm_score_documents_hand_computed(spark):
    """Seen-bigram, backoff-unigram and OOV paths, against hand math;
    empty docs survive with zero counts and perplexity 1."""
    import math

    from fuzzy_search_spark.pipeline.lm import (score_documents,
                                                train_bigram_lm)

    train = spark.createDataFrame(
        [(0, "the cat sat"), (2, "the cat ran"), (4, "")],
        "doc_id long, text string")
    uni, big, tot = train_bigram_lm(train)
    score = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog"), (9, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           score_documents(score, uni, big, tot).collect()}

    # doc 0: (<s> the) 2/3, (the cat) 2/2, (cat sat) 1/2 - all seen bigrams
    exp0 = (round(math.log10(2 / 3) * 1e6) + 0
            + round(math.log10(0.5) * 1e6))
    assert out[0].n_scored == 3
    assert out[0].sum_logp_micro == exp0
    # doc 1: (<s> the) seen; (the dog) OOV word -> alpha/(T+V+1) = 0.4/11
    exp1 = (round(math.log10(2 / 3) * 1e6)
            + round(math.log10(0.4 / 11) * 1e6))
    assert out[1].sum_logp_micro == exp1
    assert out[1].avg_logp == round(exp1 / 2) / 1e6
    assert out[1].perplexity == round(10 ** -out[1].avg_logp, 4)
    # empty doc: kept, zeroed, ppl 1
    assert (out[9].n_scored, out[9].sum_logp_micro,
            out[9].avg_logp, out[9].perplexity) == (0, 0, 0.0, 1.0)


def test_lm_backoff_seen_unigram_path(spark):
    """A word seen in training but in an unseen bigram takes the
    alpha*(c+1)/(T+V+1) unigram backoff."""
    import math

    from fuzzy_search_spark.pipeline.lm import (score_documents,
                                                train_bigram_lm)

    train = spark.createDataFrame(
        [(0, "a b"), (2, "b c")], "doc_id long, text string")
    uni, big, tot = train_bigram_lm(train)
    # bigram "a c" unseen; c seen (count 1); T=4 V=3
    out = score_documents(
        spark.createDataFrame([(1, "a c")], "doc_id long, text string"),
        uni, big, tot).collect()[0]
    exp = (round(math.log10(1 / 2) * 1e6)           # (<s> a): 1/2 docs
           + round(math.log10(0.4 * 2 / 8) * 1e6))  # backoff for c
    assert out.sum_logp_micro == exp


def test_lm_plan_shape(spark):
    """LM training + scoring stays JVM-side: zero SortAggregates (numeric
    agg buffers), no Python stage, and no per-doc Window — pair
    construction is zip_with over shifted slices.  The two-tier skew
    guard must surface as a BroadcastHashJoin (the hot-gram tier joins
    map-side; only tail-gram rows shuffle)."""
    from fuzzy_search_spark.pipeline.lm import (score_documents,
                                                train_bigram_lm)

    docs = _docs(spark)
    uni, big, tot = train_bigram_lm(docs)
    out = score_documents(docs, uni, big, tot)
    plan = _plan(out)
    assert "SortAggregate" not in plan
    assert "Python" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan  # hot tier of the skew guard


def test_lm_two_tier_equivalence(spark):
    """The skew guard is a pure execution-strategy change: scores with
    the hot tier enabled (even a tiny hot_k that splits the stream into
    both tiers) match the plain shuffle-join path row for row, for both
    the bigram and trigram scorers."""
    from fuzzy_search_spark.pipeline.lm import (score_documents,
                                                score_documents_trigram,
                                                train_bigram_lm,
                                                train_trigram_lm)

    docs = _docs(spark)
    uni, big, tot = train_bigram_lm(docs)
    plain = sorted(map(tuple, score_documents(
        docs, uni, big, tot, hot_k=0).collect()))
    tiered = sorted(map(tuple, score_documents(
        docs, uni, big, tot, hot_k=3).collect()))
    assert plain == tiered

    uni3, big3, tri3, tot3 = train_trigram_lm(docs)
    plain3 = sorted(map(tuple, score_documents_trigram(
        docs, uni3, big3, tri3, tot3, hot_k=0).collect()))
    tiered3 = sorted(map(tuple, score_documents_trigram(
        docs, uni3, big3, tri3, tot3, hot_k=3).collect()))
    assert plain3 == tiered3


def test_fix_mojibake_crafted(spark):
    """Repairs UTF-8-as-Latin-1, leaves ASCII, genuine Latin-1, and
    beyond-Latin-1 text untouched; double-checks the no-shuffle shape."""
    from fuzzy_search_spark.pipeline.textstats import fix_mojibake

    moji = "café déjà".encode("utf-8").decode("latin-1")  # 'cafÃ© dÃ©jÃ\xa0'
    df = spark.createDataFrame([
        (0, "plain ascii"),
        (1, "x " + moji),
        (2, "naïve reälly"),       # real Latin-1: invalid as UTF-8 bytes
        (3, "euro € beyond"),      # > U+00FF: not re-encodable, untouched
        (4, ""),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in fix_mojibake(df).collect()}
    assert (out[0].was_mojibake, out[0].text_fixed) == (False, "plain ascii")
    assert (out[1].was_mojibake, out[1].text_fixed) == (True, "x café déjà")
    assert (out[2].was_mojibake, out[2].text_fixed) == (False,
                                                        "naïve reälly")
    assert (out[3].was_mojibake, out[3].text_fixed) == (False,
                                                        "euro € beyond")
    assert (out[4].was_mojibake, out[4].text_fixed) == (False, "")

    plan = _plan(fix_mojibake(df))
    assert "Exchange" not in plan and "Python" not in plan


def test_host_page_cap_deterministic(spark):
    """Per-host cap keeps exactly k pages per host, selection is a pure
    function of the url set (stable across repartitioning), and every
    input row survives with an auditable rank."""
    from fuzzy_search_spark.pipeline.urls import host_page_cap

    urls = spark.createDataFrame(
        [(i, f"https://h{i % 3}.com/page/{i}") for i in range(30)],
        "doc_id long, url string")
    out = host_page_cap(urls, max_pages_per_host=4)
    rows = out.collect()
    assert len(rows) == 30
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    for host, members in by_host.items():
        assert sum(m.kept for m in members) == 4
        assert sorted(m.host_rank for m in members) == \
            list(range(1, len(members) + 1))

    # repartitioned input selects the SAME pages
    again = host_page_cap(urls.repartition(7), max_pages_per_host=4)
    kept1 = {r.doc_id for r in rows if r.kept}
    kept2 = {r.doc_id for r in again.collect() if r.kept}
    assert kept1 == kept2


def test_normalize_nfc_crafted(spark):
    """NFC collapses canonical equivalents (decomposed accents, singleton
    Angstrom) so hash-keyed dedup sees one byte form; ASCII and None pass
    through; compatibility forms (ligatures) are NOT touched (NFC, not
    NFKC)."""
    from fuzzy_search_spark.pipeline.textstats import normalize_nfc

    df = spark.createDataFrame([
        (0, "plain"),
        (1, "cafe\u0301"),       # e + combining acute -> \u00e9
        (2, "\u212b"),           # Angstrom sign -> \u00c5 (singleton)
        (3, "\ufb01n"),          # ligature fi: unchanged under NFC
        (4, None),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_nfc(df).collect()}
    assert (out[0].changed, out[0].text_nfc) == (False, "plain")
    assert (out[1].changed, out[1].text_nfc) == (True, "caf\u00e9")
    assert (out[2].changed, out[2].text_nfc) == (True, "\u00c5")
    assert (out[3].changed, out[3].text_nfc) == (False, "\ufb01n")
    assert (out[4].changed, out[4].text_nfc) == (False, None)


def test_corpus_profile_hand_computed(spark):
    from fuzzy_search_spark.pipeline.textstats import corpus_profile

    df = spark.createDataFrame([
        (0, "a b c", "en"), (1, "a b", "en"), (2, "x", "nl"),
        (3, "p q r s", "en"),
    ], "doc_id long, text string, lang string")
    row = corpus_profile(df).collect()[0]
    assert row.docs == 4
    assert row.total_tokens == 3 + 2 + 1 + 4
    assert row.mean_tokens == 2.5
    assert row.p50_tokens == 2.5            # interpolated between 2 and 3
    assert row.total_chars == 5 + 3 + 1 + 7
    assert row.n_langs == 2
    assert (row.top_lang, row.top_lang_share) == ("en", 0.75)

    plan = corpus_profile(df)._jdf.queryExecution() \
        .executedPlan().toString()
    # the struct-max argmax plans sort-based, but only AFTER the lang
    # HashAggregate reduced the stream to one row per language (same
    # accepted shape as anchor_text_index); the per-doc stream itself
    # must stay hash-aggregated with no window
    assert "Window" not in plan
    assert "HashAggregate(keys=[lang" in plan


def test_crawl_delta_statuses(spark):
    from fuzzy_search_spark.pipeline.urls import crawl_delta

    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "will change"), ("u3", "goes away")],
        "url string, text string")
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "changed now"), ("u4", "brand new")],
        "url string, text string")
    got = {r.url: r.status for r in crawl_delta(old, new).collect()}
    assert got == {"u1": "unchanged", "u2": "changed",
                   "u3": "removed", "u4": "added"}

    # one full-outer join over (url, digest) projections
    plan = crawl_delta(old, new)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "FullOuter" in plan
    assert plan.count("md5") >= 2      # digests computed BELOW the join


def test_assign_splits_deterministic_and_growth_stable(spark):
    """Splits are a pure function of the id: retries/repartitioning and
    corpus GROWTH never move a document between splits; fractions land
    near the requested weights; thresholds are exact bucket cutoffs."""
    from fuzzy_search_spark.pipeline.mixing import assign_splits

    docs = spark.range(2000).selectExpr("id AS doc_id")
    w = {"train": 0.8, "validation": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in assign_splits(docs, w).collect()}
    b = {r.doc_id: r.split
         for r in assign_splits(docs.repartition(13), w).collect()}
    assert a == b
    # growth: the first 500 docs keep their split when 1500 more arrive
    small = {r.doc_id: r.split for r in assign_splits(
        spark.range(500).selectExpr("id AS doc_id"), w).collect()}
    assert all(a[k] == v for k, v in small.items())
    from collections import Counter

    frac = Counter(a.values())
    assert 0.75 <= frac["train"] / 2000 <= 0.85
    assert frac["validation"] > 0 and frac["test"] > 0

    plan = assign_splits(docs, w)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_lm_trigram_hand_computed(spark):
    """Trigram stupid backoff against hand math: seen-trigram,
    bigram-backoff, unigram-backoff and OOV paths; recursive alpha decay;
    empty docs survive zeroed."""
    import math

    from fuzzy_search_spark.pipeline.lm import (score_documents_trigram,
                                                train_trigram_lm)

    train = spark.createDataFrame(
        [(0, "the cat sat"), (2, "the cat ran"), (4, "")],
        "doc_id long, text string")
    uni, bi, tri, tot = train_trigram_lm(train)
    assert sorted((r.g, r.c123, r.c12) for r in tri.collect()) == [
        ("<s> <s> the", 2, 3), ("<s> the cat", 2, 2),
        ("the cat ran", 1, 2), ("the cat sat", 1, 2)]

    score = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog sat"), (9, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           score_documents_trigram(score, uni, bi, tri, tot).collect()}
    a, D = 0.4, 6 + 4 + 1
    # doc 0: all trigrams seen: 2/3, 2/2, 1/2
    exp0 = (round(math.log10(2 / 3) * 1e6) + 0
            + round(math.log10(0.5) * 1e6))
    assert out[0].sum_logp_micro == exp0
    # doc 1: (<s> <s> the) seen 2/3; (<s> the dog) OOV word -> a^2/D;
    # (the dog sat): tri+bi unseen, sat seen c=1 -> a^2 * 2/D
    exp1 = (round(math.log10(2 / 3) * 1e6)
            + round(math.log10(a * a / D) * 1e6)
            + round(math.log10(a * a * 2 / D) * 1e6))
    assert out[1].sum_logp_micro == exp1
    assert (out[9].n_scored, out[9].sum_logp_micro,
            out[9].perplexity) == (0, 0, 1.0)


def test_lm_trigram_bigram_backoff_path(spark):
    """A seen bigram under an unseen trigram context takes alpha * c/c."""
    import math

    from fuzzy_search_spark.pipeline.lm import (score_documents_trigram,
                                                train_trigram_lm)

    train = spark.createDataFrame(
        [(0, "a b c"), (2, "x b c")], "doc_id long, text string")
    uni, bi, tri, tot = train_trigram_lm(train)
    # scoring "q b c": (<s> <s> q) OOV; (<s> q b) tri+bi('q b') unseen,
    # b seen; (q b c): trigram unseen, bigram 'b c' seen c=2 ctx c(b)=2
    out = score_documents_trigram(
        spark.createDataFrame([(1, "q b c")], "doc_id long, text string"),
        uni, bi, tri, tot).collect()[0]
    a, D = 0.4, 6 + 4 + 1    # T=6 tokens, V=4 ({a, b, c, x})
    exp = (round(math.log10(a * a / D) * 1e6)              # q OOV
           + round(math.log10(a * a * (2 + 1) / D) * 1e6)  # b unigram
           + round(math.log10(a * 2 / 2) * 1e6))           # bigram 'b c'
    assert out.sum_logp_micro == exp


# ---------------------------------------------------------------------------
# cross_doc_spans
# ---------------------------------------------------------------------------

def test_cross_doc_spans_crafted(spark):
    """Positional ExactSubstr semantics, hand-computed: a 7-token run
    shared by two docs merges into one maximal span per doc; within-doc
    repeats alone never flag; distant flagged windows stay separate
    islands; a fully-shared doc pair is one full-width span."""
    from fuzzy_search_spark.pipeline.textstats import cross_doc_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c1 c2 c3 c4 c5 c6 c7 x y z"),
            (2, "p q r c1 c2 c3 c4 c5 c6 c7 s"),
            (3, "m n o m n o m n"),                       # within-doc only
            (4, "c1 c2 c3 t u v w1 w2 w3 g h i c1 c2 c3"),
            (5, "x1 w1 w2 w3 x2"),
            (6, "d1 d2 d3 d4 d5 d6"),
            (7, "d1 d2 d3 d4 d5 d6"),
        ],
        "doc_id long, text string")
    out = {(r.doc_id, r.tok_start): (r.tok_end, r.n_windows)
           for r in cross_doc_spans(docs, k=3).collect()}
    assert out == {
        (1, 2): (9, 5),
        (2, 3): (10, 5),
        (4, 0): (3, 1), (4, 6): (9, 1), (4, 12): (15, 1),
        (5, 1): (4, 1),
        (6, 0): (6, 4),
        (7, 0): (6, 4),
    }


def test_cross_doc_spans_abutting_windows_merge(spark):
    """Two flagged windows exactly k apart cover abutting token ranges
    and must merge into one span (the > k island break is strict)."""
    from fuzzy_search_spark.pipeline.textstats import cross_doc_spans

    # "e1 e2 e3" at pos 0 and "f1 f2 f3" at pos 3 — both corpus-duplicated,
    # ranges [0,3) + [3,6) abut -> one island [0,6).
    docs = spark.createDataFrame(
        [(1, "e1 e2 e3 f1 f2 f3"),
         (2, "zz e1 e2 e3 yy"),
         (3, "qq f1 f2 f3 rr")],
        "doc_id long, text string")
    rows = {(r.doc_id, r.tok_start, r.tok_end, r.n_windows)
            for r in cross_doc_spans(docs, k=3).collect()}
    assert (1, 0, 6, 2) in rows
    assert (2, 1, 4, 1) in rows and (3, 1, 4, 1) in rows


def test_cross_doc_spans_plan_shape(spark):
    """Aggregations stay in HashAggregate (numeric keys/buffers); no
    Python stage anywhere; the only sort is the per-document island
    window (inherent to gaps-and-islands); and the flag aggregation +
    membership probe share ONE exchange at runtime (the corpus is
    scanned and exploded exactly once)."""
    from fuzzy_search_spark.pipeline.textstats import cross_doc_spans

    df = cross_doc_spans(_docs(spark), k=3)
    plan = _plan(df)
    assert "SortAggregate" not in plan
    assert "Python" not in plan
    df.collect()
    final = _plan(df)
    assert "isFinalPlan=true" in final
    assert final.count("Reused") >= 1, "window subtree not stage-reused"


def test_strip_cross_doc_spans_crafted(spark):
    """The removal pass cuts exactly the covered token ranges, keeps
    every input row (totality), and reports token accounting."""
    from fuzzy_search_spark.pipeline.textstats import strip_cross_doc_spans

    docs = spark.createDataFrame(
        [(1, "a b c1 c2 c3 c4 c5 c6 c7 x y z"),
         (2, "p q r c1 c2 c3 c4 c5 c6 c7 s"),
         (3, "m n o m n o m n"),           # within-doc only: untouched
         (4, "lone   doc    with   gaps")],  # whitespace normalization
        "doc_id long, text string")
    out = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
           for r in strip_cross_doc_spans(docs, k=3).collect()}
    assert out == {
        1: (12, 7, "a b x y z"),
        2: (11, 7, "p q r s"),
        3: (8, 0, "m n o m n o m n"),
        4: (4, 0, "lone doc with gaps"),
    }


def test_strip_cross_doc_spans_case_insensitive_detection(spark):
    """Windows are detected on lowered text (same stream as every other
    word-gram op) but the ORIGINAL tokens are removed/kept."""
    from fuzzy_search_spark.pipeline.textstats import strip_cross_doc_spans

    docs = spark.createDataFrame(
        [(1, "KEEP Alpha BETA gamma END"),
         (2, "x alpha beta GAMMA y")],
        "doc_id long, text string")
    out = {r.doc_id: r.clean_text
           for r in strip_cross_doc_spans(docs, k=3).collect()}
    assert out == {1: "KEEP END", 2: "x y"}


def test_strip_cross_doc_spans_no_python_stage(spark):
    """The rebuild is JVM column algebra: a doc-keyed join plus a
    higher-order filter-by-index — no Python stage anywhere."""
    from fuzzy_search_spark.pipeline.textstats import strip_cross_doc_spans

    plan = _plan(strip_cross_doc_spans(_docs(spark), k=3))
    assert "Python" not in plan
    assert "SortAggregate" not in plan


def test_perplexity_tiers_crafted(spark):
    """Per-language CCNet tiers: exact integer ranking keys, equal-count
    thirds per language, deterministic tie-break on doc_id."""
    from pyspark.sql import functions as F

    from fuzzy_search_spark.pipeline.lm import perplexity_tiers

    # synthetic scored rows: lang A has 6 docs (2/2/2 tiers), lang B has
    # 4 (ceil boundaries: 2/1/1), one zero-scored doc, one exact tie.
    scored = spark.createDataFrame(
        [(i, n, s) for i, n, s in [
            (0, 2, -200), (1, 2, -400), (2, 2, -600), (3, 2, -800),
            (4, 2, -1000), (5, 0, 0),
            (10, 2, -100), (11, 2, -300), (12, 2, -300), (13, 2, -900),
        ]],
        "doc_id long, n_scored long, sum_logp_micro long")
    langs = spark.createDataFrame(
        [(i, "aa" if i < 10 else "bb") for i in
         [0, 1, 2, 3, 4, 5, 10, 11, 12, 13]],
        "doc_id long, lang_guess string")
    out = {r.doc_id: r for r in
           perplexity_tiers(scored, langs).collect()}

    # lang aa: avg micro = -100,-200,-300,-400,-500, and doc 5 -> 0 (best)
    order_aa = [5, 0, 1, 2, 3, 4]
    for rank, doc in enumerate(order_aa, start=1):
        assert out[doc].lang_rank == rank, doc
        assert out[doc].n_lang == 6
    assert [out[d].tier for d in order_aa] == \
        ["head", "head", "middle", "middle", "tail", "tail"]

    # lang bb: -50, then the -150 tie broken by doc_id (11 before 12)
    order_bb = [10, 11, 12, 13]
    for rank, doc in enumerate(order_bb, start=1):
        assert out[doc].lang_rank == rank, doc
    # n=4, tiers at floor(3*(r-1)/4): ranks 1-2 head, 3 middle, 4 tail
    assert [out[d].tier for d in order_bb] == \
        ["head", "head", "middle", "tail"]

    # repartitioning the input must not change a single row
    again = {r.doc_id: r for r in
             perplexity_tiers(scored.repartition(7, F.col("doc_id")),
                              langs).collect()}
    assert {k: tuple(v) for k, v in out.items()} == \
        {k: tuple(v) for k, v in again.items()}


def test_perplexity_tiers_by_cutoffs_agrees_with_rank_anchor(spark):
    """The skew-safe cutoff variant: monotone in score within language,
    near-equal tier sizes, and per-doc agreement with the exact rank
    anchor everywhere except within one boundary position per cutoff."""
    import random

    from fuzzy_search_spark.pipeline.lm import (perplexity_tiers,
                                                perplexity_tiers_by_cutoffs)

    rng = random.Random(3)
    rows, lang_rows = [], []
    for lang, n in (("aa", 90), ("bb", 31)):
        base = 0 if lang == "aa" else 10_000
        for i in range(n):
            doc = base + i
            rows.append((doc, 2, -rng.randrange(1, 10**6) * 2))
            lang_rows.append((doc, lang))
    scored = spark.createDataFrame(
        rows, "doc_id long, n_scored long, sum_logp_micro long")
    langs = spark.createDataFrame(lang_rows, "doc_id long, lang_guess string")

    exact = {r.doc_id: r for r in perplexity_tiers(scored, langs).collect()}
    cut = {r.doc_id: r
           for r in perplexity_tiers_by_cutoffs(scored, langs).collect()}
    assert set(cut) == set(exact)

    # monotone: a better score never lands in a worse tier (per lang)
    by_lang = {}
    for d, r in cut.items():
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (-r.avg_logp_micro, r.doc_id))
        assert all(a.tier_idx <= b.tier_idx for a, b in zip(rs, rs[1:])), lang
        # near-equal sizes: each tier within 2 of n/3
        n = len(rs)
        for t in range(3):
            size = sum(1 for r in rs if r.tier_idx == t)
            assert abs(size - n / 3) <= 2, (lang, t, size)

    # agreement with the exact anchor except at tier boundaries: a doc
    # may shift by at most one tier, and only within one rank position
    # of a boundary
    for d in exact:
        e, c = exact[d], cut[d]
        if e.tier_idx != c.tier_idx:
            assert abs(e.tier_idx - c.tier_idx) == 1, d
            boundary_ranks = {e.n_lang // 3, 2 * e.n_lang // 3}
            assert min(abs(e.lang_rank - 1 - b) for b in boundary_ranks) \
                <= 1, (d, e.lang_rank)

    # plan shape: no window function anywhere — one hash agg + a
    # broadcast join is the whole point
    plan = (perplexity_tiers_by_cutoffs(scored, langs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_gopher_quality_rules_crafted(spark):
    """The seven Gopher rules against a hand-built python mirror."""
    import re

    from fuzzy_search_spark.pipeline.textstats import (GOPHER_STOPWORDS,
                                                       gopher_quality)

    docs = [
        (1, "the cat and the dog have a house to be with that thing " * 10),
        (2, "• item one\n• item two\n- dash\n* star"),
        (3, "### ### hash symbols ### everywhere"),
        (4, ""),
        (5, "and the end to be of that have with...\n" + "word " * 60),
        (6, "trailing dots...\nmore dots…\nclean line\nanother"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality(df).collect()}

    for doc_id, text in docs:
        ws = [w for w in re.split(r"\s+", text) if w]
        lns = [ln for ln in text.split("\n") if ln.strip()]
        nw, nl = max(len(ws), 1), max(len(lns), 1)
        r = out[doc_id]
        assert r.n_words == len(ws)
        assert r.mean_word_len == round(sum(map(len, ws)) / nw, 6)
        assert r.symbol_ratio == round(
            sum("#" in w or "..." in w or "…" in w for w in ws) / nw, 6)
        assert r.bullet_ratio == round(
            sum(bool(re.match(r"^[•\-\*]", ln.strip()))
                for ln in lns) / nl, 6)
        assert r.ellipsis_ratio == round(
            sum(bool(re.search(r"(\.\.\.|…)$", ln.strip()))
                for ln in lns) / nl, 6)
        assert r.alpha_ratio == round(
            sum(bool(re.search("[A-Za-z]", w)) for w in ws) / nw, 6)
        assert r.n_stopwords == sum(
            s in [w.lower() for w in ws] for s in GOPHER_STOPWORDS)
        assert r.keep == (r.rule_word_count and r.rule_mean_word_len
                          and r.rule_symbol_ratio and r.rule_bullet_lines
                          and r.rule_ellipsis_lines and r.rule_alpha_words
                          and r.rule_stopwords)
    assert out[1].keep and not out[2].keep and not out[4].keep

    plan = (gopher_quality(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


def test_c4_filters_crafted(spark):
    """The C4 line and page heuristics against a hand-built mirror."""
    import re

    from fuzzy_search_spark.pipeline.textstats import c4_filters

    docs = [
        (1, "This is a good first sentence here.\n"
            "Another proper sentence with enough words!\n"
            "And a third full sentence to pass the gate."),
        (2, "short line.\nno terminal punctuation here at all\n"
            "click here"),                      # everything filtered
        (3, "Uses javascript for the menu bar today.\n"
            "This line is long enough and it stays fine.\n"
            "Second keeper sentence right here folks.\n"
            "Third keeper sentence right here folks."),
        (4, "Lorem ipsum dolor sit amet something here.\n"
            "A fine sentence that would otherwise stay here.\n"
            "Another fine sentence that would stay here.\n"
            "Third fine sentence that would stay here."),
        (5, "function() { return 1; } is code.\n"
            "A fine sentence that would otherwise stay here.\n"
            "Another fine sentence that would stay here.\n"
            "Third fine sentence that would stay here."),
        (6, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_filters(df).collect()}

    def mirror(text):
        lns = [ln for ln in text.split("\n") if ln.strip()]
        kept = [ln for ln in lns
                if re.search("[.!?\"']$", ln.strip())
                and len([w for w in re.split(r"\s+", ln.strip()) if w]) >= 5
                and "javascript" not in ln.strip().lower()]
        clean = "\n".join(kept)
        n_sent = 0 if not clean else len(
            [s for s in re.split("[.!?]", clean) if s.strip()])
        lorem = "lorem ipsum" in text.lower()
        curly = "{" in text
        return (len(lns), len(kept), clean, n_sent, lorem, curly,
                n_sent >= 3 and not lorem and not curly)

    for doc_id, text in docs:
        r = out[doc_id]
        assert (r.n_lines, r.n_lines_kept, r.clean_text, r.n_sentences,
                r.has_lorem_ipsum, r.has_curly_brace, r.keep) \
            == mirror(text), doc_id
    assert out[1].keep                       # clean page survives
    assert out[2].n_lines_kept == 0          # all lines filtered
    assert "javascript" not in out[3].clean_text
    assert not out[4].keep and not out[5].keep

    plan = (c4_filters(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


def test_host_quality_rollup(spark):
    """Integer-exact site-level gate: per-host counts and the
    cross-multiplied keep-rate flag, joined back per document."""
    from fuzzy_search_spark.pipeline.textstats import host_quality_rollup

    rows = [(0, "a.com", True), (1, "a.com", True), (2, "a.com", False),
            (3, "b.com", False), (4, "b.com", False), (5, "b.com", True),
            (6, "c.com", True)]
    df = spark.createDataFrame(rows, "doc_id long, host string, keep boolean")
    got = {r.doc_id: r for r in host_quality_rollup(df).collect()}
    assert len(got) == 7
    # a.com: 2/3 kept -> 2*2 >= 3 -> keep; b.com: 1/3 -> 2 < 3 -> drop;
    # c.com: 1/1 -> keep
    assert got[0].host_docs == 3 and got[0].host_kept == 2
    assert got[0].host_keep and got[1].host_keep and not got[3].host_keep
    assert got[6].host_keep and got[6].host_docs == 1
    # min_host_docs gate excludes small hosts
    strict = {r.doc_id: r for r in
              host_quality_rollup(df, min_host_docs=2).collect()}
    assert not strict[6].host_keep and strict[0].host_keep
