"""Deduplication operators: exact hash dedup, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale notes:
- exact dedup is one hash-aggregate (map-side partial combine for free);
- MinHash signatures are computed row-local (explode shingles -> min over
  md5 hashes), then LSH banding turns near-dup search into an equi-join on
  (band, band_hash) — the shuffle key is the band hash, which is uniform by
  construction, so no skew;
- all hashing uses md5 of explicit strings so results are engine-portable
  (the DuckDB correctness oracle computes bit-identical signatures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, keep_id, dup_count).

    Keeps the smallest id as the canonical representative."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"),
             F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def word_shingles(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct k-word shingles per document: (id, shingle).

    Shingles build as a zip_with chain over shifted word-array views (one
    linear pass; a per-index slice+join allocates k-element arrays per
    shingle and measures ~4x slower).  A document shorter than k words
    yields its whole word sequence as the single shingle."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    n = F.size(words)
    grams = words
    for j in range(1, k):
        shifted = F.slice(words, j + 1, F.greatest(n - j, F.lit(1)))
        grams = F.zip_with(grams, shifted,
                           lambda a, b: F.concat(a, F.lit(" "), b))
    shingle = F.when(n >= k, F.slice(grams, 1, n - (k - 1))) \
        .otherwise(F.array(F.concat_ws(" ", words)))
    # array_distinct BEFORE the explode already makes (id, shingle) unique
    # — a .distinct() here would be a second full shuffle for nothing
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(shingle))
                  .alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def _hash60(expr) -> "F.Column":
    """Portable 60-bit hash of a string column: top 15 hex digits of md5
    parsed as an integer.  DuckDB equivalent:
    ``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(expr), 1, 15), 16, 10).cast("long")


#: universal-hash family for MinHash: h_i(s) = (a_i * base32(s) + b_i) mod P
#: with one 32-bit md5-derived base hash per shingle.  One md5 per shingle
#: instead of num_hashes md5s — measured 2.6x faster at sf0.1 — and every
#: operation is 64-bit-safe (a < 2^31, base < 2^32, so a*base+b < 2^63) and
#: portable to the DuckDB oracle verbatim.  Constants are fixed
#: (random.Random(42)) so signatures are deterministic across engines/runs.
MINHASH_P = 4294967311  # smallest prime > 2^32


def _minhash_ab(num_hashes: int) -> list:
    import random

    rng = random.Random(42)
    return [(rng.randrange(1, 2 ** 31), rng.randrange(0, MINHASH_P))
            for _ in range(num_hashes)]


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 3,
                       num_hashes: int = 8) -> DataFrame:
    """MinHash signature per document: (id, sig array<long>).

    Hash family: affine transforms of one md5-derived 32-bit base hash
    (see MINHASH_P); the signature component is the numeric minimum.
    Numeric (not string) components matter at scale: min(long) aggregates
    in a mutable hash-agg buffer (HashAggregate), while min(string) falls
    back to SortAggregate — a per-partition sort of the full shingle
    stream."""
    shingled = word_shingles(df, id_col, text_col, k)
    base = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10) \
        .cast("long")
    shingled = shingled.withColumn("_hb", base)
    aggs = [
        F.min((F.lit(a) * F.col("_hb") + F.lit(b)) % F.lit(MINHASH_P))
        .alias(f"h{i}")
        for i, (a, b) in enumerate(_minhash_ab(num_hashes))
    ]
    sig = shingled.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def _banded_signatures(df: DataFrame, id_col: str, text_col: str, k: int,
                       num_hashes: int, bands: int) -> DataFrame:
    """(id, band, band_hash) rows: one per document per band — the shared
    front half of LSH pair generation and bucket auditing."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    return sig.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *[
                    F.element_at("sig", b * rows + r + 1)
                    for r in range(rows)
                ])).alias("band_hash"),
            )
            for b in range(bands)
        ])).alias("bh"),
    ).select(id_col, "bh.band", "bh.band_hash")


def oversized_lsh_buckets(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 3,
                          num_hashes: int = 8, bands: int = 4,
                          max_bucket_size: int = 10_000) -> DataFrame:
    """Audit companion to :func:`minhash_lsh_pairs`: the (band, band_hash,
    bucket_n) buckets the cap dropped — run it to quantify what the cap
    excluded (constant-size count buffers only, never the id lists)."""
    banded = _banded_signatures(df, id_col, text_col, k, num_hashes, bands)
    return (
        banded.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket_size)
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      num_hashes: int = 8, bands: int = 4,
                      max_bucket_size: int = 10_000) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding: (id_a, id_b, n_bands).

    Documents sharing any band (num_hashes/bands rows of the signature)
    become a candidate pair; n_bands counts how many bands agree.

    Physical shape: ONE pass — band-explode the signatures, group by
    (band, band_hash) into buckets, and emit within-bucket pairs by a
    double explode.  A self-join on (band, band_hash) would recompute the
    whole shingle->signature pipeline for both join branches; the bucket
    aggregation shuffles the (tiny) signature rows exactly once on a
    uniformly-distributed key.

    ``max_bucket_size`` caps degenerate buckets (a band hash shared by a
    huge templated/near-empty cluster): one hot band would otherwise
    concentrate the whole cluster's id list in a single aggregation buffer
    AND emit O(n^2) pairs from it.  The cap is enforced BEFORE the id
    lists materialize — a count aggregation sizes every bucket first and
    only ids in surviving buckets reach collect_list, so no aggregation
    buffer ever exceeds the cap (the count pass itself is a constant-size
    buffer with map-side combine).  Buckets above the cap are dropped — at
    that size the members are template clusters that exact/simhash dedup
    handles directly; use :func:`oversized_lsh_buckets` to audit what was
    dropped."""
    banded = _banded_signatures(df, id_col, text_col, k, num_hashes, bands)
    keep = (
        banded.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter((F.col("bucket_n") >= 2)
                & (F.col("bucket_n") <= max_bucket_size))
        .select("band", "band_hash")
    )
    buckets = (
        banded.join(keep, ["band", "band_hash"])
        .groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
    )
    pairs = (
        buckets.select(F.posexplode("ids").alias("pos", "id_a"), "ids")
        .select("id_a",
                F.explode(F.slice("ids", F.col("pos") + 2,
                                  F.size("ids"))).alias("id_b"))
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def simhash64(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash over lowercased word tokens: (id, simhash bigint).

    Each distinct word votes +1/-1 per bit of xxhash64(word); the sign
    vector packs into one bigint.  Spark-only (xxhash64 is not portable to
    the oracle, so this op gets a rows-only correctness check)."""
    words = (
        df.select(F.col(id_col),
                  F.explode(F.array_distinct(
                      F.split(F.lower(F.col(text_col)), r"\s+")))
                  .alias("word"))
        .filter(F.length("word") > 0)
        .withColumn("h", F.xxhash64("word"))
    )
    bit_votes = [
        F.sum(F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1)
              .otherwise(-1)).alias(f"b{b}")
        for b in range(63)  # avoid the sign bit to keep the packing simple
    ]
    voted = words.groupBy(id_col).agg(*bit_votes)
    packed = None
    for b in range(63):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return voted.select(F.col(id_col), packed.cast("long").alias("simhash"))


def simhash64_portable(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", bits: int = 60) -> DataFrame:
    """Engine-portable SimHash: (id, simhash bigint) over 60 bits.

    The word hash is the top 15 hex digits of md5(word) parsed as an
    integer, so a SQL oracle (DuckDB ``CAST('0x' || substr(md5(w),1,15) AS
    BIGINT)``) reproduces the exact signature.  Same vote/pack scheme as
    :func:`simhash64`; use that one when portability is not needed
    (xxhash64 is JVM-native and ~3x cheaper than md5)."""
    words = (
        df.select(F.col(id_col),
                  F.explode(F.array_distinct(
                      F.split(F.lower(F.col(text_col)), r"\s+")))
                  .alias("word"))
        .filter(F.length("word") > 0)
        .withColumn("h", F.conv(F.substring(F.md5("word"), 1, 15),
                                16, 10).cast("long"))
    )
    bit_votes = [
        F.sum(F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1)
              .otherwise(-1)).alias(f"b{b}")
        for b in range(bits)
    ]
    voted = words.groupBy(id_col).agg(*bit_votes)
    packed = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return voted.select(F.col(id_col), packed.cast("long").alias("simhash"))


def near_duplicates(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    num_hashes: int = 8, bands: int = 4,
                    threshold: float = 0.5) -> DataFrame:
    """The production near-dup shape: MinHash-LSH candidate generation,
    then exact shingle-Jaccard verification of ONLY the candidate pairs:
    (id_a, id_b, n_bands, jaccard).

    At 10^12 docs the all-pairs exact join is impossible; LSH reduces the
    workload to candidate pairs (uniform bucket key, one shuffle), and the
    verifier re-shingles ONLY documents that appear in some candidate pair
    — a semi-join first, so the exact-verification pass never touches the
    vast non-candidate majority of the corpus."""
    cands = minhash_lsh_pairs(df, id_col, text_col, k, num_hashes, bands)
    cand_ids = (
        cands.select(F.explode(F.array("id_a", "id_b")).alias(id_col))
        .distinct()
    )
    sh = word_shingles(df.join(cand_ids, id_col), id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sh_a = sh.select(F.col(id_col).alias("id_a"),
                     F.col("shingle").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"),
                     F.col("shingle").alias("sh_b"))
    inter = (
        cands.join(sh_a, "id_a").join(sh_b, "id_b")
        .filter(F.col("sh_a") == F.col("sh_b"))
        .groupBy("id_a", "id_b", "n_bands")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a").join(nb, "id_b")
        .withColumn("jaccard_raw",
                    F.col("inter")
                    / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .filter(F.col("jaccard_raw") >= threshold)
        .select("id_a", "id_b", "n_bands",
                F.round("jaccard_raw", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs sharing at least
    one shingle: (id_a, id_b, jaccard).  The join key is the shingle, so
    common shingles fan out — use minhash_lsh_pairs first at scale; this is
    the exact verifier for the candidate set."""
    sh = word_shingles(df, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(na), "id_a").join(F.broadcast(nb), "id_b")
        .withColumn("jaccard",
                    F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def connected_components(pairs_df: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iterations: int = 25) -> DataFrame:
    """(node, label) connected components over an undirected pair set by
    min-label propagation with ADAPTIVE POINTER DOUBLING: every node
    starts labeled with itself; each round takes the min over its
    neighbors' labels, and — once the per-round changed-count shows
    slow, chain-like convergence — additionally replaces its label with
    its label's label (``label[x] <- label[label[x]]``).  The doubling
    step is valid because labels are always node ids of the same
    component, so chasing one pointer can only move toward the component
    minimum — and it compresses chains geometrically, turning the
    classic O(component diameter) round count into O(log diameter) (the
    watch-item for path-shaped components at 10^12-doc scale).

    Doubling is adaptive because it costs one extra co-keyed exchange
    per round, and the common case — dense template clusters — converges
    in 2-3 plain rounds where that exchange is pure overhead (it
    regressed near_dup_groups/corpus_clean 1.4x at bench scale when
    unconditional).  The trigger: after the first round, if the changed
    count fails to at least halve round-over-round, convergence is
    diameter-bound (each plain round only moves labels one hop along a
    chain, so `changed` decays by ~1/diameter, not geometrically) and
    doubling switches on for all remaining rounds.  Dense inputs decay
    fast and never pay for it; a 60-node chain engages doubling at round
    2 and converges in 8 rounds.

    Scale shape: one (or two, once doubling engages) co-keyed joins +
    one hash aggregation per round, each round localCheckpoint()ed so
    the lineage does not grow with iterations (the classic
    iterative-Spark failure mode); the convergence check is a flag
    column computed in the same pass and counted off the checkpointed
    table — no per-round labels-join job — and the same count drives the
    doubling trigger, so adaptivity adds zero actions.
    ``max_iterations`` bounds pathological inputs; the loop exits early
    on fixpoint.  If the budget runs out first a warning is emitted —
    unconverged labels would otherwise silently split one true
    component into several groups downstream."""
    edges = pairs_df.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    labels = (
        edges.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    prev_changed = None
    doubling = False
    for _ in range(max_iterations):
        nbr = (
            edges.join(labels.select(F.col("node").alias("b"),
                                     F.col("label").alias("nbr_label")), "b")
            .groupBy("a").agg(F.min("nbr_label").alias("nbr_min"))
        )
        # the previous label rides along as ``old`` so the convergence
        # check is a flag on the SAME materialized pass — no extra
        # labels-join job per round just to count changes
        stepped = (
            labels.join(nbr.select(F.col("a").alias("node"), "nbr_min"),
                        "node", "left")
            .select("node", F.col("label").alias("old"),
                    F.least(F.col("label"),
                            F.coalesce(F.col("nbr_min"), F.col("label")))
                    .alias("label"))
        )
        if doubling:
            # pointer doubling: label[x] <- min(label[x], label[label[x]]).
            # Every label IS a node of the same table (labels start as
            # self and only ever adopt other nodes' labels), so the
            # parent lookup is a plain co-keyed self-join.
            stepped = (
                stepped.join(
                    stepped.select(F.col("node").alias("label"),
                                   F.col("label").alias("parent_label")),
                    "label")
                .select("node", "old",
                        F.least(F.col("label"), F.col("parent_label"))
                        .alias("label"))
            )
        new_labels = (
            stepped.select("node", "label",
                           (F.col("label") != F.col("old")).alias("chg"))
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("chg").count()
        if (not doubling and prev_changed is not None
                and changed * 2 >= prev_changed and changed > 0):
            doubling = True
        prev_changed = changed
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        import warnings

        warnings.warn(
            f"connected_components did not converge within "
            f"{max_iterations} iterations ({changed} labels still "
            f"changing); components wider than the budget are split — "
            f"raise max_iterations",
            RuntimeWarning, stacklevel=2)
    return labels


def near_dup_groups(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    num_hashes: int = 8, bands: int = 4,
                    threshold: float = 0.5) -> DataFrame:
    """Canonical near-duplicate groups: (doc_id, group_id, group_size).

    The full production dedup chain — MinHash-LSH candidates, exact
    Jaccard verification, then connected components over the verified
    pairs — so transitively-linked documents land in one group whose id
    is the smallest member (the canonical representative a pipeline
    keeps).  Only documents that appear in at least one verified pair are
    returned; the non-duplicate majority never enters the component
    computation."""
    from pyspark.sql import Window

    pairs = near_duplicates(df, id_col, text_col, k, num_hashes, bands,
                            threshold)
    cc = connected_components(pairs).select(
        F.col("node").alias(id_col), F.col("label").alias("group_id"))
    w = Window.partitionBy("group_id")
    return cc.withColumn("group_size", F.count(F.lit(1)).over(w))


def incremental_near_duplicates(new_df: DataFrame, corpus_df: DataFrame,
                                id_col: str = "doc_id",
                                text_col: str = "text", k: int = 3,
                                num_hashes: int = 8, bands: int = 4,
                                threshold: float = 0.5,
                                max_bucket_size: int = 10_000) -> DataFrame:
    """Asymmetric near-dup scan: which documents of a NEW batch
    near-duplicate the EXISTING corpus — the shape a daily-increment
    pipeline actually runs (dedup the day's crawl against everything
    already kept, never corpus x corpus again).

    Returns ``(new_id, corpus_id, n_bands, jaccard)`` for cross-side
    pairs clearing ``threshold``; within-batch duplicates are
    :func:`near_duplicates` on the batch alone.

    Scale shape: both sides band their MinHash signatures exactly as
    :func:`minhash_lsh_pairs`; the candidate join is new-side x
    corpus-side per (band, band_hash) — the corpus never self-joins.
    The CORPUS side's degenerate buckets are capped with the same
    count-first discipline as the symmetric op (a hot template bucket
    would otherwise cross-product against every matching new doc); the
    new side is a single operator-controlled batch, small by
    construction, and stays uncapped so no fresh document silently
    skips screening.  Exact-Jaccard verification re-shingles ONLY
    candidate docs on each side (semi-joins first).  When the new
    batch is tiny, AQE broadcasts its banded side into the probe join.
    """
    bn = (_banded_signatures(new_df, id_col, text_col, k, num_hashes,
                             bands)
          .select(F.col(id_col).alias("new_id"), "band", "band_hash"))
    bc = (_banded_signatures(corpus_df, id_col, text_col, k, num_hashes,
                             bands)
          .select(F.col(id_col).alias("corpus_id"), "band", "band_hash"))
    keep_c = (bc.groupBy("band", "band_hash")
              .agg(F.count(F.lit(1)).alias("bucket_n"))
              .filter(F.col("bucket_n") <= max_bucket_size)
              .select("band", "band_hash"))
    cands = (
        bn.join(bc.join(keep_c, ["band", "band_hash"]),
                ["band", "band_hash"])
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    cn = cands.select(F.col("new_id").alias(id_col)).distinct()
    cc = cands.select(F.col("corpus_id").alias(id_col)).distinct()
    shn = word_shingles(new_df.join(cn, id_col, "left_semi"),
                        id_col, text_col, k)
    shc = word_shingles(corpus_df.join(cc, id_col, "left_semi"),
                        id_col, text_col, k)
    inter = (
        cands
        .join(shn.select(F.col(id_col).alias("new_id"),
                         F.col("shingle").alias("sh_n")), "new_id")
        .join(shc.select(F.col(id_col).alias("corpus_id"),
                         F.col("shingle").alias("sh_c")), "corpus_id")
        .filter(F.col("sh_n") == F.col("sh_c"))
        .groupBy("new_id", "corpus_id", "n_bands")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    nn = (shn.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_n"))
          .select(F.col(id_col).alias("new_id"), "n_n"))
    nc = (shc.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_c"))
          .select(F.col(id_col).alias("corpus_id"), "n_c"))
    return (
        inter.join(nn, "new_id").join(nc, "corpus_id")
        .withColumn("jaccard_raw",
                    F.col("inter")
                    / (F.col("n_n") + F.col("n_c") - F.col("inter")))
        .filter(F.col("jaccard_raw") >= threshold)
        .select("new_id", "corpus_id", "n_bands",
                F.round("jaccard_raw", 6).alias("jaccard"))
    )
