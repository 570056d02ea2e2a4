"""Deduplication operators over documents(doc_id, text, ...).

Training-data pipeline dedup family, Spark-first with paired DuckDB
oracle SQL (same deterministic arithmetic both sides):

* exact       — hash groupBy of normalized text
* ngram       — exact word-3-gram Jaccard similarity join (inverted
                index on shingles + doc-frequency cap for scale)
* minhash     — MinHash signatures + banded LSH candidate pairs
* simhash     — 32-bit SimHash per document (scalar list arithmetic,
                no shuffle) + 16-bit band keys for bucketing
* embedding   — cosine near-dup pairs over embeddings(vec_id, embedding)

All hashes derive from the md5-prefix base hash
(textstats.md5_hash32_expr) so Spark and DuckDB agree bit-for-bit.
Jaccard values are ratios of integers -> identical doubles in both
engines.

Scale notes (100 TB): the shingle inverted index is the standard
near-dup layout — explode is map-side; the self-join shuffles on
shingle, and the doc-frequency cap (MAX_DF) removes the head keys
that would otherwise create quadratic candidate blowup; the minhash
path avoids the full index entirely (constant-size signatures, band
join on short keys); simhash is embarrassingly parallel.
"""

from __future__ import annotations

from ..sources.scan import scan_parquet

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import (
    md5_hash32_expr,
    md5_hash32_sql,
    md5_hash60_expr,
    md5_hash60_sql,
)

NGRAM_N = 3
JACCARD_T = 0.6
MAX_DF = 50  # shingles in more docs than this are dropped (stop-shingles)

# minhash: 16 hashes = 4 bands x 4 rows (same family as linking, but
# md5-based so the oracle can reproduce it)
MH_K, MH_BANDS, MH_ROWS = 16, 4, 4
MH_P = (1 << 31) - 1
MH_A = [2654435761 % MH_P, 2246822519 % MH_P, 3266489917 % MH_P,
        668265263, 374761393, 1103515245, 1299709, 15485863,
        32452843, 49979687, 67867967, 86028121, 104395301,
        122949823, 141650939, 160481183]
MH_B = [i * 7919 + 17 for i in range(MH_K)]

COS_T = 0.45  # embeddings near-dup threshold (chosen with margin at sf0.01)


def _shingles_expr(text_col):
    words = F.split(text_col, " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), n - NGRAM_N),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, NGRAM_N)),
    )
    return F.array_distinct(F.when(n >= NGRAM_N, grams).otherwise(F.array(text_col)))


def _shingles_sql(text_col: str) -> str:
    w = f"string_split({text_col}, ' ')"
    grams = (
        f"list_transform(range(0, len({w}) - {NGRAM_N - 1}), "
        f"i -> array_to_string({w}[i+1:i+{NGRAM_N}], ' '))"
    )
    return (
        f"list_distinct(CASE WHEN len({w}) >= {NGRAM_N} THEN {grams} "
        f"ELSE [{text_col}] END)"
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain read, no parallelism floor: the map side is one lower+trim
    # pass with partial aggregation — cheaper than the repartition
    # exchange the floor would add (measured 0.34 s vs 0.55 s at sf1.0)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.groupBy(F.lower(F.trim(F.col("text"))).alias("text_key"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY lower(trim(text))"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", _shingles_expr(F.col("text")).alias("sh")
    ).select(
        "doc_id",
        # n_sh counts the DISTINCT raw shingles (the Jaccard
        # denominator) BEFORE hashing
        F.size("sh").alias("n_sh"),
        # both downstream shuffles (df pre-pass, postings collect) key
        # on the shingle — hash the ~40-byte 5-gram strings to 60-bit
        # md5 prefixes so the exchanges carry 8-byte longs (the
        # span-coverage shape, dedup.py:474). The md5 prefix is the
        # cross-engine base hash, so the DuckDB oracle applies the
        # SAME hash and even collisions agree bit-for-bit.
        F.transform("sh", md5_hash60_expr).alias("sh"),
    )
    # three consumers below (sizes, df pre-pass, postings) would each
    # recompute the shingle arrays from the scan; persist so the
    # split+slice+concat+hash work runs once (measured 2.4x the query
    # wall uncached at sf0.1). MEMORY_AND_DISK: at 100 TB this spills
    # rather than evicts — the production-scale form of the same plan
    # is a checkpoint of (doc_id, sh) to parquet (plans/checkpoint.py).
    # The cache is not unpersisted (the return is lazy; the action
    # happens in the caller) — a deliberate, bounded leak, same as
    # build_graph's branch caches: the block is table-sized, spillable,
    # and reused by any later query sharing the shingle subtree.
    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = docs.select("doc_id", "n_sh")
    inv = docs.select("doc_id", F.explode("sh").alias("shingle"))
    # doc-frequency cap FIRST, as a count() agg: count keeps O(1) state
    # per key (map-side partial combine), so a head stop-shingle in
    # 10^9+ documents costs one long per partition — whereas running
    # collect_list before the cap would materialize its full posting
    # array on a single reducer before discarding it (OOM at 100 TB).
    # Shingles are list_distinct per doc, so count(*) == doc frequency.
    # The filter side is the HEAD set (df > MAX_DF): Zipf's head is
    # tiny, so AQE turns the anti-join into a broadcast and the
    # inverted index is shuffled only once (for the collect). A
    # semi-join against the RARE set would ship nearly every distinct
    # shingle and re-shuffle inv (measured ~1.8x the whole query wall);
    # if the head ever outgrows the broadcast threshold, AQE falls back
    # to a shuffle join — degraded, never wrong.
    heads = (
        inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > MAX_DF)
        .select("shingle")
    )
    # anti-join the heads out, THEN collect: every posting list that
    # reaches collect_list is <= MAX_DF long by construction. Size-1
    # lists expand to zero pairs; dropping them post-collect is free.
    postings = (
        inv.join(heads, "shingle", "left_anti")
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("docs"),
            lambda a, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.size(F.col("docs"))),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    pairs = (
        postings.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        pairs.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
    )


def sql_jaccard_ctes() -> str:
    """CTE chain ending in ``jpairs(doc_a, doc_b, jaccard)`` — the
    filtered near-dup pair list. Shared by the pair query and the
    connected-components oracle (operators/components.py)."""
    sh = _shingles_sql("text")
    return f"""s AS (SELECT doc_id, {sh} AS sh FROM documents),
inv AS (SELECT doc_id, {md5_hash60_sql('shingle')} AS shingle
        FROM (SELECT doc_id, unnest(sh) AS shingle FROM s)),
rare AS (SELECT shingle FROM inv GROUP BY shingle HAVING count(*) <= {MAX_DF}),
inv2 AS (SELECT inv.* FROM inv JOIN rare USING (shingle)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM inv2 a JOIN inv2 b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sized AS (SELECT doc_id, len(sh) AS n_sh FROM s),
jpairs AS (
  SELECT doc_a, doc_b,
         round(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
  FROM pairs
  JOIN sized sa ON sa.doc_id = doc_a
  JOIN sized sb ON sb.doc_id = doc_b
  WHERE round(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) >= {JACCARD_T})"""


def sql_dedup_ngram_jaccard() -> str:
    return f"WITH {sql_jaccard_ctes()}\nSELECT doc_a, doc_b, jaccard FROM jpairs"


def _minhash_over_base(base_col):
    """16 min-hashes over a pre-computed base-hash array: the md5 is
    evaluated once per shingle; each signature row is a cheap LCG over
    the long array."""

    def lcg(a: int, b: int):
        return lambda h: (h * a + b) % MH_P

    return [
        F.array_min(F.transform(base_col, lcg(MH_A[i], MH_B[i]))).alias(f"mh_{i}")
        for i in range(MH_K)
    ]


def _band_table(base: DataFrame) -> DataFrame:
    """``base(doc_id, bh)`` (bh = per-shingle base hashes mod MH_P) ->
    LSH band table ``(doc_id, band_idx, band_key)`` — signatures and
    banding are map-side projections, the explode is MH_BANDS rows per
    doc."""
    sig = base.select("doc_id", *_minhash_over_base(F.col("bh")))
    # band_key is a STRUCT of the MH_ROWS minhash longs, not the old
    # ':'-concat string: struct equality is exactly string equality
    # here (both encodings are injective), joins/windows key on it
    # unchanged, and the exchanges carry 4 longs instead of a ~40-char
    # string (measured ~6% off the LSH pair walls, outputs identical)
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.struct(
                            *[
                                F.col(f"mh_{b * MH_ROWS + r}").alias(
                                    f"r{r}"
                                )
                                for r in range(MH_ROWS)
                            ]
                        ).alias("band_key"),
                    )
                    for b in range(MH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_key")


def minhash_pairs(
    docs: DataFrame, bucket_cap: int | None = None
) -> DataFrame:
    """MinHash-LSH candidate pairs over ``docs(doc_id, sh)`` (sh = the
    shingle array). The gate entry q_dedup_minhash runs this with no
    cap; ``bucket_cap`` is the 100 TB hot-bucket guard:

    A band bucket of size K emits K(K-1)/2 candidate pairs, so ONE
    boilerplate text shared by a large slice of a crawl makes ONE
    bucket quadratic in output. AQE's skew-join splitting cannot
    defuse this — it rebalances join INPUT partitions by size, and a
    hot bucket's input rows are few; the explosion happens in the join
    OUTPUT (measured in tools/run_skew.py: the skewed wall tracks the
    emitted-pair count, AQE on). The standard mitigation (used by the
    public crawl-dedup pipelines) is a bucket-size cap: buckets larger
    than ``bucket_cap`` are STAR-LINKED — every member pairs with the
    bucket's min doc_id — O(K) pairs whose transitive closure (the
    connected-components step every dedup consumer runs next) yields
    the same duplicate clusters for true boilerplate blobs, while
    buckets at or under the cap keep exact all-pairs semantics."""
    base = docs.select(
        "doc_id",
        F.transform(
            F.col("sh"), lambda s: md5_hash32_expr(s) % MH_P
        ).alias("bh"),
    )
    bands = _band_table(base)
    # the LSH bucket join is a SELF-join of `bands` — without a
    # persist both sides recompute the full shingle -> 24-minhash ->
    # band chain (measured ~2x the query wall at sf0.1; round 3's
    # bench hid this by accidentally reusing the ngram query's
    # persisted shingles across queries). Bounded: n_docs x MH_BANDS
    # rows of constant width, MEMORY_AND_DISK so 100 TB spills rather
    # than evicts. Deliberate leak, same contract as the ngram persist
    # above; release with session.cache_scope when the consumer is done.
    from pyspark.storagelevel import StorageLevel

    bands = bands.persist(StorageLevel.MEMORY_AND_DISK)

    def all_pairs(side: DataFrame) -> DataFrame:
        return (
            side.alias("a")
            .join(
                side.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
        )

    if bucket_cap is None:
        return all_pairs(bands).dropDuplicates()
    # bucket sizes + hub (min doc_id) via a WINDOW over the band key:
    # one exchange on (band_idx, band_key) that the all_pairs
    # self-join below then reuses (its join keys are a prefix of the
    # window partitioning), vs. the agg+join form's two extra
    # exchanges — measured 2.95 s -> window form in
    # BENCH/dedup_decomp.json. Window sort within a bucket is
    # K log K, dominated by the K^2 pair emission the cap bounds.
    from pyspark.sql.window import Window

    wspec = Window.partitionBy("band_idx", "band_key")
    tagged = bands.select(
        "doc_id",
        "band_idx",
        "band_key",
        F.count(F.lit(1)).over(wspec).alias("_n"),
        F.min("doc_id").over(wspec).alias("_hub"),
    )
    small = tagged.filter(F.col("_n") <= bucket_cap).select(
        "doc_id", "band_idx", "band_key"
    )
    star = (
        tagged.filter(
            (F.col("_n") > bucket_cap) & (F.col("doc_id") != F.col("_hub"))
        )
        .select(
            F.col("_hub").alias("doc_a"), F.col("doc_id").alias("doc_b")
        )
    )
    return all_pairs(small).unionByName(star).dropDuplicates()


# The registered gate entry runs minhash_pairs WITH the production
# star-link guard active (r6 verdict #3: an uncapped gate never
# cross-engine-verifies the guard path). 2 is a GATE-SCALE value
# picked so the path actually fires on the synthetic corpus (max
# bucket size at sf0.01 is 3; production crawls pass ~500-5000) —
# the DuckDB oracle mirrors the same star-link decision.
MH_BUCKET_CAP = 2


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", _shingles_expr(F.col("text")).alias("sh")
    )
    return minhash_pairs(docs, bucket_cap=MH_BUCKET_CAP)


def sql_dedup_minhash() -> str:
    sh = _shingles_sql("text")
    h = md5_hash32_sql("s")
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(sh, s -> (({h}) % {MH_P} * {MH_A[i]} "
        f"+ {MH_B[i]}) % {MH_P}), 'min') AS mh_{i}"
        for i in range(MH_K)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        + " || ':' || ".join(
            f"CAST(mh_{b * MH_ROWS + r} AS VARCHAR)" for r in range(MH_ROWS)
        )
        + " AS band_key FROM sig"
        for b in range(MH_BANDS)
    )
    return f"""
WITH s AS (SELECT doc_id, {sh} AS sh FROM documents),
sig AS (SELECT doc_id, {mh_cols} FROM s),
bands AS ({band_rows}),
sizes AS (
  SELECT band_idx, band_key, count(*) AS n, min(doc_id) AS hub
  FROM bands GROUP BY band_idx, band_key),
tagged AS (
  SELECT b.doc_id, b.band_idx, b.band_key, s.n, s.hub
  FROM bands b JOIN sizes s USING (band_idx, band_key))
SELECT DISTINCT doc_a, doc_b FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM tagged a JOIN tagged b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
  WHERE a.n <= {MH_BUCKET_CAP}
  UNION ALL
  SELECT hub AS doc_a, doc_id AS doc_b FROM tagged
  WHERE n > {MH_BUCKET_CAP} AND doc_id <> hub)"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    # word hashes materialized once, then ONE fold over the array
    # carrying all 32 bit-counters as the accumulator (zip_with per
    # element). Replaces the r1-r6 form of 32 independent F.aggregate
    # folds — one array pass instead of 32: 1.97 -> 0.90 s at sf0.1,
    # bitwise-identical output, and still map-only (the explode +
    # codegen-sum alternative measured 1.24 s but adds a doc_id
    # shuffle the fold form never pays — the wrong trade at 100 TB).
    hashed = docs.select(
        "doc_id",
        F.transform(
            F.split(F.col("text"), " "), lambda w: md5_hash32_expr(w)
        ).alias("wh"),
    )
    counts = F.expr(
        "aggregate(wh, array_repeat(CAST(0 AS BIGINT), 32), "
        "(acc, h) -> zip_with(acc, sequence(0, 31), "
        "(a, b) -> a + IF(((shiftright(h, b)) & 1) = 1, 1, -1)))"
    )
    simhash = F.expr(
        "aggregate(zip_with(cnt, sequence(0, 31), "
        "(c, b) -> IF(c >= 0, shiftleft(CAST(1 AS BIGINT), b), "
        "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    return hashed.select("doc_id", counts.alias("cnt")).select(
        "doc_id", simhash.alias("simhash")
    ).select(
        "doc_id",
        "simhash",
        (F.col("simhash") % (1 << 16)).alias("band_lo"),
        F.shiftright(F.col("simhash"), 16).alias("band_hi"),
    )


def sql_dedup_simhash() -> str:
    h = md5_hash32_sql("w")
    terms = " + ".join(
        f"(CASE WHEN coalesce(list_sum(list_transform(wh, x -> CASE WHEN "
        f"(x >> {b}) & 1 = 1 THEN 1 ELSE -1 END)), 0) >= 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(32)
    )
    return f"""
WITH wh_t AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> {h}) AS wh
  FROM documents),
sh AS (SELECT doc_id, ({terms}) AS simhash FROM wh_t)
SELECT doc_id, simhash,
       simhash % {1 << 16} AS band_lo,
       simhash >> 16 AS band_hi
FROM sh"""


# banded random-hyperplane LSH for embedding near-dup candidates:
# B bands of R planes; a pair at angular similarity p = 1 - theta/pi
# collides in >=1 band with prob 1-(1-p^R)^B (~0.96 at cosine 0.45,
# ~0.9998 at cosine 0.7 with B=16, R=4). The ORACLE stays the exact
# all-pairs SQL, so a hash match certifies LSH recall = 1.0 on this
# data — the exactness gate VERDICT asked for. Planes are seeded and
# embedded identically on both sides of the recall test.
EMB_BANDS, EMB_ROWS = 16, 4
_EMB_SEED = 11


def _emb_band_structs(v_col, dim: int):
    import numpy as np

    rng = np.random.RandomState(_EMB_SEED)
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    bands = []
    for b in range(EMB_BANDS):
        key = None
        for r in range(EMB_ROWS):
            plane = F.array(
                *[F.lit(round(float(x), 6)) for x in rng.randn(dim)]
            )
            bit = F.when(dot(v_col, plane) >= 0, F.lit(1 << r)).otherwise(
                F.lit(0)
            )
            key = bit if key is None else key + bit
        bands.append(
            F.struct(F.lit(b).alias("band_idx"), key.alias("band_key"))
        )
    return F.array(*bands)


def q_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup embedding pairs: banded hyperplane-LSH candidates ->
    exact-cosine verify. The plan is a band equi-join (shuffle on short
    (band_idx, band_key) keys) + two id-joins to fetch vectors for the
    verify — never an all-pairs nested loop."""
    emb = scan_parquet(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    # hyperplanes must match the vector width: a mismatched literal dim
    # would NULL the zip_with dot product, collapse every row into one
    # band key, and silently degrade the band join to all-pairs
    dim = int(emb.select(F.size("v").alias("d")).first()["d"])
    from pyspark.storagelevel import StorageLevel

    # same self-join shape as the minhash band table: without a
    # persist each side of the candidate join recomputes all
    # bands x rows-per-band hyperplane dot products; the verify joins
    # below also rescan emb twice. Both persists are bounded
    # (n_vecs x bands short rows; n_vecs x dim doubles) and released
    # by session.cache_scope.
    emb = emb.persist(StorageLevel.MEMORY_AND_DISK)
    bands = emb.select(
        "vec_id", F.explode(_emb_band_structs(F.col("v"), dim)).alias("band")
    ).select("vec_id", "band.band_idx", "band.band_key").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .dropDuplicates()
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        cand.join(emb.select(F.col("vec_id").alias("vec_a"),
                             F.col("v").alias("va")), "vec_a")
        .join(emb.select(F.col("vec_id").alias("vec_b"),
                         F.col("v").alias("vb")), "vec_b")
        .withColumn("cosine", F.round(dot / (norm("va") * norm("vb")), 6))
        .filter(F.col("cosine") >= COS_T)
        .select("vec_a", "vec_b", "cosine")
    )


SQL_DEDUP_EMBED = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {COS_T}"""


SPAN_K = 8  # word k-grams for duplicated-span coverage


def q_dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fine-grained (substring-level) dedup metric, the Lee et al.
    "Deduplicating Training Data Makes Language Models Better" shape:
    for every document, how many of its word K-gram POSITIONS are
    covered by a K-gram that also appears in at least one other
    document. Exact-duplicate detection removes whole documents;
    span coverage finds boilerplate/quote contamination INSIDE
    otherwise-unique documents — the per-doc (dup_kgrams,
    total_kgrams) pair is what a curation pipeline thresholds on.

    Scale shape: grams are hashed to 60-bit md5 prefixes so the two
    shuffles (distinct-doc count per gram; the flag join back) carry
    8-byte keys, never gram strings; both are keyed on the same
    column so the aggregated side reuses the exchange. Head grams
    (site boilerplate in 10^9 docs) have O(1) count state map-side,
    and the flag join multiplies nothing (one row per gram on the
    aggregated side). Output is pure integers — exact cross-engine.
    """
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    )
    n = F.size("ws")
    # sequence() with stop < start counts DOWN — guard short docs
    idx = F.when(
        n >= SPAN_K, F.sequence(F.lit(0), n - SPAN_K)
    ).otherwise(F.array().cast("array<int>"))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: md5_hash60_expr(
                    F.array_join(F.slice("ws", i + 1, SPAN_K), " ")
                ),
            )
        ).alias("g"),
    )
    # (r9 note: pre-aggregating the exploded stream to (g, doc_id, k)
    # grain before the flag join was tried — 3.5 vs 3.1 s at sf1.0.
    # K-grams are nearly unique within a doc here, so the pre-agg
    # shuffles the same row count and just adds a pass; kept the
    # direct form.)
    n_docs_per_gram = (
        grams.dropDuplicates(["g", "doc_id"])
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("_nd"))
    )
    dup_hits = (
        grams.join(n_docs_per_gram.filter(F.col("_nd") >= 2), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_kgrams"))
    )
    totals = docs.select(
        "doc_id", F.greatest(n - (SPAN_K - 1), F.lit(0)).cast("long").alias(
            "total_kgrams"
        )
    )
    return totals.join(dup_hits, "doc_id", "left").select(
        "doc_id",
        "total_kgrams",
        F.coalesce("dup_kgrams", F.lit(0)).cast("long").alias("dup_kgrams"),
    )


def sql_dedup_span_coverage() -> str:
    gram = f"array_to_string(ws[i:i+{SPAN_K - 1}], ' ')"
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, {md5_hash60_sql(gram)} AS g
  FROM w, LATERAL unnest(range(1, len(ws) - {SPAN_K} + 2)) AS t(i)
  WHERE len(ws) >= {SPAN_K}),
nd AS (SELECT g, count(DISTINCT doc_id) AS n FROM g GROUP BY g),
hits AS (
  SELECT doc_id, count(*) AS dup_kgrams
  FROM g JOIN nd USING (g) WHERE nd.n >= 2 GROUP BY doc_id)
SELECT w.doc_id,
       CAST(greatest(len(ws) - {SPAN_K - 1}, 0) AS BIGINT) AS total_kgrams,
       CAST(coalesce(h.dup_kgrams, 0) AS BIGINT) AS dup_kgrams
FROM w LEFT JOIN hits h ON w.doc_id = h.doc_id"""


# ------------------------------------------- paragraph-level dedup
# RefinedWeb/Falcon-style exact dedup at PARAGRAPH granularity: the
# dominant near-dup mass in a web corpus is boilerplate paragraphs
# (nav text, newsletter prompts, copyright footers) repeated across
# otherwise-distinct pages. Doc-level dedup can't touch it; this
# removes every paragraph already seen earlier in the corpus (global
# first occurrence by (doc_id, idx) wins) and reassembles each
# document from its surviving paragraphs.
#
# Scale shape: explode is map-side; ONE shuffle on the paragraph key
# with a map-side-partial min(struct(doc_id, idx)) aggregation — the
# keeper row needs no second pass because the group key IS the
# paragraph text — then one shuffle on doc_id to reassemble. No
# window sort over duplicate sets, no join back to the exploded
# stream. At 10^12 documents the group key would be a 128-bit content
# hash with the text as payload; here the corpus is small enough to
# key on the paragraph itself (exact, collision-free).
#
# The word-soup documents have no naturally repeated 12-word chunks,
# so the gate synthesizes the web pathology deterministically: every
# (doc_id + idx) residue class is replaced by one of two boilerplate
# paragraphs (vocabulary disjoint from the corpus), mirrored in SQL.

PARA_W = 12
BOILER_A = "subscribe to our newsletter for all the latest updates"
BOILER_B = "copyright example press all rights reserved worldwide"


def _paras_expr():
    d = F.col("doc_id")
    ws = F.split(F.col("text"), " ")
    nch = F.ceil(F.size(ws) / F.lit(float(PARA_W))).cast("int")

    def mk(i):
        return (
            F.when((d + i) % 4 == 0, F.lit(BOILER_A))
            .when((d + i) % 9 == 0, F.lit(BOILER_B))
            .otherwise(
                F.concat_ws(" ", F.slice(ws, i * PARA_W + 1, PARA_W))
            )
        )

    return F.transform(F.sequence(F.lit(0), nch - 1), mk)


def q_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.select(
        "doc_id",
        _paras_expr().alias("paras"),
    ).select(
        "doc_id", F.size("paras").cast("long").alias("n_total"), "paras"
    )
    ex = base.select(
        "doc_id", F.posexplode("paras").alias("idx", "para")
    )
    kept = (
        ex.groupBy("para")
        .agg(F.min(F.struct("doc_id", "idx")).alias("k"))
        .select(
            F.col("k.doc_id").alias("doc_id"),
            F.col("k.idx").alias("idx"),
            "para",
        )
    )
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s["para"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    return (
        base.select("doc_id", "n_total")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            "n_total",
        )
    )


def sql_dedup_paragraph() -> str:
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
n AS (SELECT doc_id, ws,
             CAST(ceil(len(ws) / {float(PARA_W)}) AS INT) AS nch
      FROM w),
ex AS (
  SELECT doc_id, CAST(i AS BIGINT) AS idx,
         CASE WHEN (doc_id + i) % 4 = 0 THEN '{BOILER_A}'
              WHEN (doc_id + i) % 9 = 0 THEN '{BOILER_B}'
              ELSE array_to_string(
                ws[CAST(i*{PARA_W}+1 AS INT):CAST(i*{PARA_W}+{PARA_W} AS INT)],
                ' ')
         END AS para
  FROM n, LATERAL unnest(range(nch)) AS t(i)),
k AS (SELECT doc_id, idx, para,
             row_number() OVER (
               PARTITION BY para ORDER BY doc_id, idx) AS rn
      FROM ex),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(para, ' ' ORDER BY idx) AS text_dedup
        FROM k WHERE rn = 1 GROUP BY doc_id)
SELECT n.doc_id,
       coalesce(a.text_dedup, '') AS text_dedup,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(n.nch AS BIGINT) AS n_total
FROM n LEFT JOIN agg a ON n.doc_id = a.doc_id"""


# ---------------------------------------------------------------------------
# Incremental dedup: new crawl batch vs existing corpus index
# ---------------------------------------------------------------------------

NEW_SOURCE = "src0"  # the batch; every other source is the index
# JACCARD_T = 0.6 as an integer cross-multiply: common/union >= 3/5
INC_T_NUM, INC_T_DEN = 3, 5


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus index — the
    production shape (daily crawl vs historical index), where the
    batch is orders of magnitude smaller than the index.

    Verdict per batch doc: 'exact' (normalized-text match in the
    index), 'near_dup' (LSH band collision with an index doc AND
    word-3-gram Jaccard >= 3/5), else 'keep'; match_doc_id = the
    smallest matching index doc.

    Scale shape — the index is NEVER shuffled:
    * exact pass: index scan inner-joined against the BROADCAST batch
      key set (map-side), then a tiny per-key min agg; the batch is
      marked by broadcasting those matches back.
    * near-dup pass: the batch's LSH band table (MH_BANDS rows/doc) is
      BROADCAST against the index's map-side band projection; only
      candidate index docs' shingle sets survive (semi-join) into the
      exact-Jaccard verify, which compares integer-cross-multiplied
      ratios — zero float thresholds. In production the index band
      table and text keys are precomputed once and stored (the table
      format's incremental scan feeds only new index files).
    """
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "source",
        md5_hash60_expr(F.lower(F.trim(F.col("text")))).alias("tkey"),
        _shingles_expr(F.col("text")).alias("sh"),
    )
    # md5 evaluated ONCE per shingle: hsh (60-bit) and bh (32-bit) are
    # both prefixes of the same digest, so deriving them from a shared
    # md5-hex array is bitwise-identical to the old two-pass form while
    # halving the digest work (measured 4.9 s -> 1.5 s for this frame's
    # materialization at sf1.0 — guide §1.2 "per-task work")
    docs = docs.select(
        "doc_id", "source", "tkey",
        F.size("sh").alias("n_sh"),
        F.transform("sh", F.md5).alias("m"),
    ).select(
        "doc_id",
        "source",
        "tkey",
        "n_sh",
        F.array_distinct(
            F.transform(
                "m",
                lambda m: F.conv(F.substring(m, 1, 15), 16, 10).cast("long"),
            )
        ).alias("hsh"),
        F.transform(
            "m",
            lambda m: F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
            % MH_P,
        ).alias("bh"),
    )
    from pyspark.storagelevel import StorageLevel

    batch = docs.filter(F.col("source") == NEW_SOURCE).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # the index side has THREE consumers (exact keys, band projection,
    # candidate shingle sets) that would each re-run the shingle+digest
    # chain from the scan; persist it once — the in-memory stand-in for
    # the precomputed stored index the docstring describes (bounded:
    # one row per index doc, constant-width signature arrays,
    # MEMORY_AND_DISK so production sizes spill rather than evict)
    index = docs.filter(F.col("source") != NEW_SOURCE).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # exact: index scan vs broadcast batch keys, min index doc per key
    exact = (
        index.select("tkey", "doc_id")
        .join(F.broadcast(batch.select("tkey").distinct()), "tkey")
        .groupBy("tkey")
        .agg(F.min("doc_id").alias("exact_match"))
    )
    exact_marks = batch.select("doc_id", "tkey").join(
        F.broadcast(exact), "tkey"
    ).select("doc_id", "exact_match")

    # near-dup: index band projection vs broadcast batch band table
    bbands = _band_table(batch.select("doc_id", "bh")).select(
        F.col("doc_id").alias("bdoc"), "band_idx", "band_key"
    )
    ibands = _band_table(index.select("doc_id", "bh")).select(
        F.col("doc_id").alias("idoc"), "band_idx", "band_key"
    )
    cand = (
        ibands.join(F.broadcast(bbands), ["band_idx", "band_key"])
        .select("bdoc", "idoc")
        .distinct()
    )
    iset = index.select(
        F.col("doc_id").alias("idoc"),
        F.col("hsh").alias("ish"),
        F.col("n_sh").alias("n_i"),
    ).join(cand.select("idoc").distinct(), "idoc")
    bset = batch.select(
        F.col("doc_id").alias("bdoc"),
        F.col("hsh").alias("bsh"),
        F.col("n_sh").alias("n_b"),
    )
    common = F.size(F.array_intersect("bsh", "ish"))
    near = (
        cand.join(iset, "idoc")
        .join(F.broadcast(bset), "bdoc")
        .filter(
            common * F.lit(INC_T_DEN)
            >= (F.col("n_b") + F.col("n_i") - common) * F.lit(INC_T_NUM)
        )
        .groupBy("bdoc")
        .agg(F.min("idoc").alias("near_match"))
        .withColumnRenamed("bdoc", "doc_id")
    )

    return (
        batch.select("doc_id")
        .join(exact_marks, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_match").isNotNull(), F.lit("exact"))
            .when(F.col("near_match").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
            F.coalesce("exact_match", "near_match").alias("match_doc_id"),
        )
    )


def sql_dedup_incremental() -> str:
    sh = _shingles_sql("text")
    mh_cols = ", ".join(
        f"list_aggregate(list_transform(bh, x -> (x * {MH_A[i]} "
        f"+ {MH_B[i]}) % {MH_P}), 'min') AS mh_{i}"
        for i in range(MH_K)
    )

    def band_rows(src: str, idc: str) -> str:
        return " UNION ALL ".join(
            f"SELECT doc_id AS {idc}, {b} AS band_idx, "
            + " || ':' || ".join(
                f"CAST(mh_{b * MH_ROWS + r} AS VARCHAR)"
                for r in range(MH_ROWS)
            )
            + f" AS band_key FROM {src}"
            for b in range(MH_BANDS)
        )

    return f"""
WITH d AS (
  SELECT doc_id, source,
         {md5_hash60_sql("lower(trim(text))")} AS tkey, {sh} AS sh
  FROM documents),
h AS (
  SELECT doc_id, source, tkey, len(sh) AS n_sh,
         list_distinct(list_transform(sh, s -> {md5_hash60_sql('s')})) AS hsh,
         list_transform(sh, s -> ({md5_hash32_sql('s')}) % {MH_P}) AS bh
  FROM d),
b AS (SELECT * FROM h WHERE source = '{NEW_SOURCE}'),
ix AS (SELECT * FROM h WHERE source <> '{NEW_SOURCE}'),
ex AS (SELECT b.tkey, min(ix.doc_id) AS exact_match
       FROM b JOIN ix ON b.tkey = ix.tkey GROUP BY 1),
bsig AS (SELECT doc_id, {mh_cols} FROM b),
isig AS (SELECT doc_id, {mh_cols} FROM ix),
bbands AS ({band_rows('bsig', 'bdoc')}),
ibands AS ({band_rows('isig', 'idoc')}),
cand AS (SELECT DISTINCT bdoc, idoc
         FROM ibands JOIN bbands USING (band_idx, band_key)),
ver AS (
  SELECT c.bdoc, c.idoc
  FROM cand c JOIN b ON b.doc_id = c.bdoc JOIN ix ON ix.doc_id = c.idoc
  WHERE len(list_intersect(b.hsh, ix.hsh)) * {INC_T_DEN}
        >= (b.n_sh + ix.n_sh - len(list_intersect(b.hsh, ix.hsh)))
           * {INC_T_NUM}),
nr AS (SELECT bdoc AS doc_id, min(idoc) AS near_match
       FROM ver GROUP BY 1)
SELECT b.doc_id,
       CASE WHEN ex.exact_match IS NOT NULL THEN 'exact'
            WHEN nr.near_match IS NOT NULL THEN 'near_dup'
            ELSE 'keep' END AS verdict,
       coalesce(ex.exact_match, nr.near_match) AS match_doc_id
FROM b
LEFT JOIN ex ON ex.tkey = b.tkey
LEFT JOIN nr ON nr.doc_id = b.doc_id"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_paragraph": q_dedup_paragraph,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embed_cosine": q_dedup_embed_cosine,
    "dedup_span_coverage": q_dedup_span_coverage,
    "dedup_incremental": q_dedup_incremental,
}

ORACLES = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_paragraph": sql_dedup_paragraph(),
    "dedup_ngram_jaccard": sql_dedup_ngram_jaccard(),
    "dedup_minhash_lsh": sql_dedup_minhash(),
    "dedup_simhash": sql_dedup_simhash(),
    "dedup_embed_cosine": SQL_DEDUP_EMBED,
    "dedup_span_coverage": sql_dedup_span_coverage(),
    "dedup_incremental": sql_dedup_incremental(),
}
