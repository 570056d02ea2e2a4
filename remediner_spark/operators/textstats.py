"""Text-analysis operators over a documents(doc_id, text, lang, ...) table.

Training-data pipeline utilities (language ID, quality scoring, token
counting, fingerprinting), each implemented twice on purpose:

* a Spark DataFrame expression (JVM-side, whole-stage codegen), in
  ``QUERIES`` — the engine path;
* an equivalent ANSI-SQL string for the DuckDB oracle, in ``ORACLES``.

The pair gives every operator a differential correctness check: the
driver executes both and compares row counts + schema + value hashes.
All expressions avoid engine-specific regex corners and raw-float
outputs (ratios are rounded) so the comparison is exact.
"""

from __future__ import annotations

from ..sources.scan import scan_parquet

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Marker-substring language scorer (mirrors kernels.webtext semantics,
# SQL-expressible: count = (len(s)-len(replace(s,m,'')))/len(m)).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of ", " in ", " is "),
    "de": (" der ", " die ", " und ", " ist ", " mit "),
    "fr": (" le ", " la ", " les ", " et ", " est "),
    "es": (" el ", " los ", " las ", " es ", " con "),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS = ("the", "a", "of", "in", "and", "to", "is", "was")

# BPE-ish token pattern: letter runs, digit runs, single other glyphs —
# identical semantics under Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# FP_MOD * FP_BASE + 2^32 must stay < 2^63 (ANSI overflow is a hard
# error in Spark 4): 1e12-scale modulus with a 1e6-scale base.
FP_BASE = 1_000_003
FP_MOD = 999_999_999_989


def _marker_count_expr(col, marker: str):
    return (F.length(col) - F.length(F.replace(col, F.lit(marker)))) / len(marker)


def _marker_count_sql(col: str, marker: str) -> str:
    m = marker.replace("'", "''")
    return f"(length({col}) - length(replace({col}, '{m}', ''))) / {len(marker)}"


def _lang_score_exprs(col):
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    return {
        lang: sum(_marker_count_expr(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    scores = _lang_score_exprs(F.col("text"))
    langs = list(LANG_MARKERS)
    # first language (dict order) achieving the strictly-highest score;
    # 'und' when every score is zero
    best = F.greatest(*[scores[lg] for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when((best > 0) & (scores[lg] == best), F.lit(lg)).otherwise(pred)
    return docs.select(
        "doc_id", pred.alias("lang_pred"), F.col("lang").alias("lang_true")
    )


def sql_text_langid() -> str:
    langs = list(LANG_MARKERS)
    padded = "(' ' || lower(text) || ' ')"
    score = {
        lg: "(" + " + ".join(_marker_count_sql(padded, m) for m in LANG_MARKERS[lg]) + ")"
        for lg in langs
    }
    best = f"greatest({', '.join(score[lg] for lg in langs)})"
    case = "CASE "
    for lg in langs:
        case += f"WHEN {best} > 0 AND {score[lg]} = {best} THEN '{lg}' "
    case += "ELSE 'und' END"
    return (
        f"SELECT doc_id, {case} AS lang_pred, lang AS lang_true FROM documents"
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.lower(w).isin(*STOPWORDS)))
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_text"),
        n_words.cast("long").alias("n_words"),
        F.round(n_stop / n_words, 6).alias("stopword_ratio"),
        F.round(n_alpha / F.greatest(F.length("text"), F.lit(1)), 6).alias(
            "alpha_ratio"
        ),
    )


def sql_text_quality() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
SELECT doc_id,
       length(text) AS n_chars_text,
       len(string_split(text, ' ')) AS n_words,
       round(len(list_filter(string_split(text, ' '),
                             w -> lower(w) IN ({stop_list})))
             / len(string_split(text, ' ')), 6) AS stopword_ratio,
       round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
             / greatest(length(text), 1), 6) AS alpha_ratio
FROM documents"""


# Gopher-style quality gate bounds (tuned to the synthetic fixture's
# length distribution so the filter actually discriminates there; the
# rule SHAPES are the public Gopher/C4 ones: length window, mean word
# length window, stopword floor, alphabetic floor)
QF_MIN_WORDS, QF_MAX_WORDS = 16, 5000
QF_MWL_LO, QF_MWL_HI = 2, 12  # mean word length window
QF_MIN_STOP = 2  # at least 2 stopword hits
QF_ALPHA_NUM, QF_ALPHA_DEN = 82, 100  # alpha chars / chars >= 0.82


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality gate (the keep/drop decision op, on
    top of q_text_quality's metrics): per-rule booleans + the AND.
    Every comparison is INTEGER arithmetic (cross-multiplied ratios),
    so cross-engine equality is exact by construction — no float
    thresholds anywhere. Map-only; at 100 TB this is a scan-fused
    projection feeding a pushed-down keep filter."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    # total word chars == non-space chars (single-space join invariant
    # holds for both engines' identical split/replace semantics)
    sum_len = F.length(F.regexp_replace(F.col("text"), " ", ""))
    n_stop = F.size(F.filter(words, lambda w: F.lower(w).isin(*STOPWORDS)))
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    n_chars = F.length("text")
    r_len = (n_words >= QF_MIN_WORDS) & (n_words <= QF_MAX_WORDS)
    r_mwl = (sum_len >= QF_MWL_LO * n_words) & (sum_len <= QF_MWL_HI * n_words)
    r_stop = n_stop >= QF_MIN_STOP
    r_alpha = n_alpha * QF_ALPHA_DEN >= QF_ALPHA_NUM * n_chars
    return docs.select(
        "doc_id",
        r_len.alias("r_len"),
        r_mwl.alias("r_mwl"),
        r_stop.alias("r_stop"),
        r_alpha.alias("r_alpha"),
        (r_len & r_mwl & r_stop & r_alpha).alias("keep"),
    )


def sql_quality_filter() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH m AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         length(replace(text, ' ', '')) AS sum_len,
         len(list_filter(string_split(text, ' '),
                         w -> lower(w) IN ({stop_list}))) AS n_stop,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(text) AS n_chars
  FROM documents)
SELECT doc_id,
       n_words >= {QF_MIN_WORDS} AND n_words <= {QF_MAX_WORDS} AS r_len,
       sum_len >= {QF_MWL_LO} * n_words
         AND sum_len <= {QF_MWL_HI} * n_words AS r_mwl,
       n_stop >= {QF_MIN_STOP} AS r_stop,
       n_alpha * {QF_ALPHA_DEN} >= {QF_ALPHA_NUM} * n_chars AS r_alpha,
       (n_words >= {QF_MIN_WORDS} AND n_words <= {QF_MAX_WORDS})
         AND (sum_len >= {QF_MWL_LO} * n_words
              AND sum_len <= {QF_MWL_HI} * n_words)
         AND n_stop >= {QF_MIN_STOP}
         AND n_alpha * {QF_ALPHA_DEN} >= {QF_ALPHA_NUM} * n_chars AS keep
FROM m"""


REP_PCT = 95  # repetitive when distinct bigrams < 95% of bigrams


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality metric (the Gopher duplicate-n-gram family):
    per-doc bigram count, distinct-bigram count, their ratio (6dp),
    and an integer-compared `repetitive` flag. Map-only expression —
    the n-gram lists live inside one row, never exploded."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
        ),
    ).otherwise(F.array(F.col("text")))
    n_grams = F.size(grams)
    n_dist = F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id",
        n_grams.cast("long").alias("n_bigrams"),
        n_dist.cast("long").alias("n_distinct"),
        F.round(n_dist / n_grams, 6).alias("uniq_ratio"),
        (n_dist * 100 < REP_PCT * n_grams).alias("repetitive"),
    )


def sql_text_repetition() -> str:
    w = "string_split(text, ' ')"
    grams = (
        f"CASE WHEN len({w}) >= 2 THEN "
        f"list_transform(range(0, len({w}) - 1), "
        f"i -> array_to_string({w}[i+1:i+2], ' ')) "
        f"ELSE [text] END"
    )
    return f"""
WITH g AS (
  SELECT doc_id, {grams} AS grams FROM documents),
m AS (
  SELECT doc_id, len(grams) AS n_bigrams,
         len(list_distinct(grams)) AS n_distinct
  FROM g)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       round(n_distinct * 1.0 / n_bigrams, 6) AS uniq_ratio,
       n_distinct * 100 < {REP_PCT} * n_bigrams AS repetitive
FROM m"""


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ws_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)")
        ).cast("long").alias("bpe_tokens"),
    )


def sql_text_tokens() -> str:
    return f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS bpe_tokens
FROM documents"""


def md5_hash32_expr(col):
    """Deterministic 32-bit hash from md5 hex prefix — identical in
    Spark (conv) and DuckDB (hex cast); the cross-engine base hash for
    fingerprints, minhash and simhash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_hash32_sql(col: str) -> str:
    return f"CAST(('0x' || substring(md5({col}), 1, 8)) AS BIGINT)"


def md5_hash60_expr(col):
    """60-bit md5-prefix hash (15 hex chars): wide enough that birthday
    collisions stay negligible at 10^12-scale key populations (a 32-bit
    hash collides ~50% at just ~77k distinct keys), while still fitting
    a signed BIGINT in both Spark conv() and DuckDB hex CAST."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash60_sql(col: str) -> str:
    return f"CAST(('0x' || substring(md5({col}), 1, 15)) AS BIGINT)"


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    words = F.split(F.col("text"), " ")
    fp = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * FP_BASE + md5_hash32_expr(w)) % FP_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def sql_text_fingerprint() -> str:
    h = md5_hash32_sql("w")
    return f"""
SELECT doc_id,
       coalesce(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(text, ' '), w -> {h})),
           (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}), 0) AS fingerprint
FROM documents"""


KEYWORDS_K = 3
MIN_TERM_LEN = 3


def q_text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k distinguishing terms per document, scored tf/df (term
    frequency over document frequency — the tf-idf ranking family with
    a RATIONAL score: integer/integer division is bit-identical in
    Spark and DuckDB, where a log-based idf could flip ranks in the
    last ulp). Shape at scale: one explode + two hash aggs + a
    broadcastable df join (term vocabulary), then a per-doc top-k
    window."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    ).filter(F.length("term") >= MIN_TERM_LEN)
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    from pyspark.sql.window import Window

    scored = tf.join(F.broadcast(df), "term").withColumn(
        "score", F.round(F.col("tf") / F.col("df"), 6)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= KEYWORDS_K)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


def sql_text_keywords() -> str:
    return f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms
  WHERE length(term) >= {MIN_TERM_LEN}
  GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         round(tf.tf * 1.0 / df.df, 6) AS score
  FROM tf JOIN df USING (term)),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, term) AS rank
  FROM scored)
SELECT doc_id, rank, term, tf, df, score FROM ranked
WHERE rank <= {KEYWORDS_K}"""


# --------------------------------------------------- URL canonicalization
# The crawl-dedup step BEFORE any content dedup: the same page is
# reachable under scheme/host case variants, explicit default ports,
# tracking query params, param order, fragments, and trailing slashes.
# Canonicalizing folds those into one key so exact URL dedup (a
# hash-groupBy, dedup_exact's shape) collapses re-fetch duplicates at
# the cost of string expressions — pure JVM built-ins, whole-stage
# codegen, no UDF. The driver tables carry no URL column, so the gate
# synthesizes a deterministic messy URL per doc_id (the multimodal
# payload pattern) and DuckDB mirrors both the synthesis and the
# canonicalization.

TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "gclid", "fbclid"
)


def _synth_url_expr():
    """Deterministic messy URL per doc_id: case variants, explicit
    default port, tracking params, unsorted params, fragment,
    trailing slash — each keyed off a different doc_id residue."""
    d = F.col("doc_id")
    scheme = (
        F.when(d % 3 == 0, F.lit("https"))
        .when(d % 3 == 1, F.lit("HTTPS"))
        .otherwise(F.lit("http"))
    )
    host = F.concat(
        F.lit("WWW.Example"),
        (d % 5).cast("string"),
        F.when(d % 2 == 0, F.lit(".COM")).otherwise(F.lit(".com")),
    )
    port = F.when(
        d % 5 == 0,
        F.when(d % 3 == 2, F.lit(":80")).otherwise(F.lit(":443")),
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/articles/"),
        (d % 29).cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = (
        F.when(d % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
        .when(d % 3 == 1, F.lit("?a=1&b=2"))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 6 == 0, F.lit("#section-2")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


def canonical_url_expr(url):
    """Canonical form of ``url``: lowercase scheme+host, default port
    stripped, fragment dropped, tracking params removed, remaining
    params sorted, trailing slash trimmed (except the bare root).
    Split/sort built-ins only — identical semantics in DuckDB."""
    scheme = F.lower(F.regexp_extract(url, "^([^:/]+)://", 1))
    hostport = F.lower(F.regexp_extract(url, "^[^:/]+://([^/]+)", 1))
    host = F.when(
        scheme == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(F.regexp_replace(hostport, ":80$", ""))
    pathqf = F.regexp_extract(url, "^[^:/]+://[^/]+(/.*)$", 1)
    defrag = F.substring_index(pathqf, "#", 1)
    path0 = F.substring_index(defrag, "?", 1)
    qraw = F.when(
        defrag.contains("?"), F.substring_index(defrag, "?", -1)
    ).otherwise(F.lit(""))
    path = F.when(path0 == "/", path0).otherwise(
        F.regexp_replace(path0, "/$", "")
    )
    kept = F.filter(
        F.split(qraw, "&"),
        lambda p: (p != "")
        & ~F.substring_index(p, "=", 1).isin(*TRACKING_PARAMS),
    )
    canon_q = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), canon_q)
        ),
    )


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # plain read, no parallelism floor: a pure projection over doc_id
    # — the floor's exchange would be the only shuffle in the plan and
    # costs more than the map work it spreads (0.51 vs 0.66 s sf1.0)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.select(
        "doc_id",
        _synth_url_expr().alias("url_raw"),
    ).withColumn("url_canon", canonical_url_expr(F.col("url_raw")))


_SQL_SYNTH_URL = """
    CASE doc_id % 3 WHEN 0 THEN 'https' WHEN 1 THEN 'HTTPS'
         ELSE 'http' END
    || '://WWW.Example' || CAST(doc_id % 5 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 0 THEN '.COM' ELSE '.com' END
    || CASE WHEN doc_id % 5 = 0 THEN
         (CASE WHEN doc_id % 3 = 2 THEN ':80' ELSE ':443' END)
       ELSE '' END
    || '/articles/' || CAST(doc_id % 29 AS VARCHAR)
    || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
    || CASE doc_id % 3 WHEN 0 THEN '?utm_source=feed&b=2&a=1'
            WHEN 1 THEN '?a=1&b=2' ELSE '' END
    || CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END
"""


def sql_url_canonicalize() -> str:
    tracking = ", ".join(f"'{t}'" for t in TRACKING_PARAMS)
    return f"""
WITH u AS (SELECT doc_id, {_SQL_SYNTH_URL} AS url_raw FROM documents),
p AS (SELECT doc_id, url_raw,
        lower(regexp_extract(url_raw, '^([^:/]+)://', 1)) AS scheme,
        lower(regexp_extract(url_raw, '^[^:/]+://([^/]+)', 1)) AS hostport,
        regexp_extract(url_raw, '^[^:/]+://[^/]+(/.*)$', 1) AS pathqf
      FROM u),
q AS (SELECT *,
        CASE WHEN scheme = 'https'
             THEN regexp_replace(hostport, ':443$', '')
             ELSE regexp_replace(hostport, ':80$', '') END AS host,
        split_part(pathqf, '#', 1) AS defrag
      FROM p),
r AS (SELECT *,
        split_part(defrag, '?', 1) AS path0,
        CASE WHEN contains(defrag, '?') THEN split_part(defrag, '?', 2)
             ELSE '' END AS qraw
      FROM q),
s AS (SELECT *,
        CASE WHEN path0 = '/' THEN path0
             ELSE regexp_replace(path0, '/$', '') END AS path,
        coalesce(array_to_string(list_sort(list_filter(
            string_split(qraw, '&'),
            x -> x <> '' AND NOT list_contains(
                [{tracking}], split_part(x, '=', 1)))), '&'), '')
          AS canon_q
      FROM r)
SELECT doc_id, url_raw,
       scheme || '://' || host || path
       || CASE WHEN canon_q = '' THEN '' ELSE '?' || canon_q END
       AS url_canon
FROM s"""


# ------------------------------------------------- bigram LM scoring
# The CCNet-style quality signal: score each document under a count-
# based language model trained on the corpus itself (here: add-one-
# smoothed bigram MLE, P(w|prev) = (c_bi+1)/(c_uni+V)). Low average
# probability = out-of-distribution text (gibberish, boilerplate,
# wrong language) — the standard pretraining-corpus filter signal.
#
# Scale shape: two count aggregations (shuffles on word / word-pair
# keys, map-side partials), then an inner join of the bigram stream
# against the count tables and one per-doc aggregation. No UDF.
#
# Cross-engine exactness discipline: each per-bigram probability is an
# IEEE double division rounded to 9dp; the per-document sum is a LEFT
# FOLD over the bigrams in position order (F.aggregate / DuckDB
# list_reduce over a position-sorted list) — same terms, same order,
# bit-identical — and the final mean is rounded to 6dp.


def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    )
    n = F.size("ws")
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("ws", 1, n - 1),
                F.arrays_zip(
                    F.sequence(F.lit(1), n - 1),
                    F.slice("ws", 2, n - 1),
                ),
                lambda prev, z: F.struct(
                    z["0"].alias("pos"),
                    prev.alias("w_prev"),
                    z["1"].alias("w"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.pos", "b.w_prev", "b.w")
    words = docs.select(F.explode("ws").alias("w"))
    c_uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("c_uni"))
    vocab = words.select("w").distinct().count()
    c_bi = bigrams.groupBy("w_prev", "w").agg(
        F.count(F.lit(1)).alias("c_bi")
    )
    scored = (
        bigrams.join(c_bi, ["w_prev", "w"])
        .join(c_uni.withColumnRenamed("w", "w_prev"), "w_prev")
        .select(
            "doc_id",
            "pos",
            F.round(
                (F.col("c_bi") + 1)
                / (F.col("c_uni") + F.lit(vocab)).cast("double"),
                9,
            ).alias("p"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.collect_list(F.struct("pos", "p")).alias("ps")
    )
    fold = F.aggregate(
        F.array_sort("ps"), F.lit(0.0), lambda acc, x: acc + x["p"]
    )
    return per_doc.select(
        "doc_id",
        F.size("ps").cast("long").alias("n_bigrams"),
        F.round(fold / F.size("ps"), 6).alias("avg_p"),
    )


SQL_TEXT_LM_SCORE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
big AS (
  SELECT doc_id, i AS pos, ws[i] AS w_prev, ws[i + 1] AS w
  FROM t, UNNEST(range(1, len(ws))) AS r(i)),
uni AS (
  SELECT w, count(*) AS c_uni
  FROM (SELECT unnest(ws) AS w FROM t) GROUP BY w),
v AS (SELECT count(*) AS vocab FROM uni),
bi AS (SELECT w_prev, w, count(*) AS c_bi FROM big GROUP BY 1, 2),
p AS (
  SELECT big.doc_id, big.pos,
         round((bi.c_bi + 1) / CAST(uni.c_uni + v.vocab AS DOUBLE), 9)
           AS p
  FROM big
  JOIN bi ON bi.w_prev = big.w_prev AND bi.w = big.w
  JOIN uni ON uni.w = big.w_prev
  CROSS JOIN v),
agg AS (
  SELECT doc_id, list(p ORDER BY pos) AS ps FROM p GROUP BY doc_id)
SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_bigrams,
       round(list_reduce(ps, (a, b) -> a + b) / len(ps), 6) AS avg_p
FROM agg"""


def q_text_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split the
    corpus into head/middle/tail thirds by LM score (higher avg
    bigram probability = more in-domain), the partition CCNet uses to
    keep/discard/flag crawl text before pretraining.

    Gate form: exact thirds via one global ntile window over
    (avg_p DESC, doc_id) — deterministic under 6dp ties. At 100 TB the
    production form keeps the same plan shape but derives the two
    cutoff scores from a sample (approx quantiles, broadcast) so
    bucketing stays map-side; the exact global window exists here
    because the oracle must match bit-for-bit."""
    from pyspark.sql.window import Window

    scores = q_text_lm_score(spark, sf_dir)
    w = Window.orderBy(F.col("avg_p").desc(), "doc_id")
    return scores.select(
        "doc_id",
        "avg_p",
        F.ntile(3).over(w).alias("tile"),
    ).select(
        "doc_id",
        "avg_p",
        F.when(F.col("tile") == 1, "head")
        .when(F.col("tile") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


SQL_TEXT_PPL_BUCKETS = f"""
WITH b AS (
  SELECT doc_id, avg_p,
         ntile(3) OVER (ORDER BY avg_p DESC, doc_id) AS tile
  FROM ({SQL_TEXT_LM_SCORE}) s)
SELECT doc_id, avg_p,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS bucket
FROM b"""


def q_text_ppl_buckets_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of CCNet bucketing (r7 verdict #3): the exact
    global ntile above needs a total order over every document — a
    single-partition window at corpus scale. Production derives the
    two cutoff scores from a DETERMINISTIC sample (docs whose md5
    doc-id hash lands in 1/10 of the space), broadcasts the two
    cutoffs, and buckets map-side — the only non-map-side work left is
    ranking the sample itself.

    Cross-engine exactness: the sample membership is the shared
    md5-prefix hash, the cutoffs are the ceil(n/3)/ceil(2n/3)-ranked
    sample rows under (avg_p DESC, doc_id) — a total order with no
    float ties ambiguity since avg_p is already rounded to 6dp — and
    the bucket rule is a pure (avg_p, doc_id)-vs-cutoff comparison, so
    DuckDB reproduces every decision bit-for-bit."""
    from pyspark.sql.window import Window

    scores = q_text_lm_score(spark, sf_dir)
    sample = scores.where(
        md5_hash32_expr(F.col("doc_id").cast("string")) % 10 == 0
    )
    ranked = sample.select(
        "avg_p",
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("avg_p").desc(), "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    k1, k2 = F.expr("(n + 2) div 3"), F.expr("(2 * n + 2) div 3")
    cut = ranked.agg(
        F.max(F.when(F.col("rn") == k1, F.col("avg_p"))).alias("c1_p"),
        F.max(F.when(F.col("rn") == k1, F.col("doc_id"))).alias("c1_id"),
        F.max(F.when(F.col("rn") == k2, F.col("avg_p"))).alias("c2_p"),
        F.max(F.when(F.col("rn") == k2, F.col("doc_id"))).alias("c2_id"),
    )
    before_c1 = (F.col("avg_p") > F.col("c1_p")) | (
        (F.col("avg_p") == F.col("c1_p")) & (F.col("doc_id") <= F.col("c1_id"))
    )
    before_c2 = (F.col("avg_p") > F.col("c2_p")) | (
        (F.col("avg_p") == F.col("c2_p")) & (F.col("doc_id") <= F.col("c2_id"))
    )
    return scores.crossJoin(F.broadcast(cut)).select(
        "doc_id",
        "avg_p",
        F.when(before_c1, "head")
        .when(before_c2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


SQL_TEXT_PPL_BUCKETS_SAMPLED = f"""
WITH scores AS ({SQL_TEXT_LM_SCORE}),
s AS (
  SELECT doc_id, avg_p,
         row_number() OVER (ORDER BY avg_p DESC, doc_id) AS rn,
         count(*) OVER () AS n
  FROM scores
  WHERE {md5_hash32_sql('CAST(doc_id AS VARCHAR)')} % 10 = 0),
cut AS (
  SELECT max(CASE WHEN rn = (n + 2) // 3 THEN avg_p END) AS c1_p,
         max(CASE WHEN rn = (n + 2) // 3 THEN doc_id END) AS c1_id,
         max(CASE WHEN rn = (2 * n + 2) // 3 THEN avg_p END) AS c2_p,
         max(CASE WHEN rn = (2 * n + 2) // 3 THEN doc_id END) AS c2_id
  FROM s)
SELECT scores.doc_id, scores.avg_p,
       CASE WHEN avg_p > c1_p
              OR (avg_p = c1_p AND scores.doc_id <= c1_id) THEN 'head'
            WHEN avg_p > c2_p
              OR (avg_p = c2_p AND scores.doc_id <= c2_id) THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scores CROSS JOIN cut"""


QUERIES = {
    "text_langid": q_text_langid,
    "text_quality": q_text_quality,
    "text_tokens": q_text_tokens,
    "text_fingerprint": q_text_fingerprint,
    "text_keywords": q_text_keywords,
    "quality_filter": q_quality_filter,
    "text_repetition": q_text_repetition,
    "url_canonicalize": q_url_canonicalize,
    "text_lm_score": q_text_lm_score,
    "text_ppl_buckets": q_text_ppl_buckets,
    "text_ppl_buckets_sampled": q_text_ppl_buckets_sampled,
}

ORACLES = {
    "text_langid": sql_text_langid(),
    "text_quality": sql_text_quality(),
    "text_tokens": sql_text_tokens(),
    "text_fingerprint": sql_text_fingerprint(),
    "text_keywords": sql_text_keywords(),
    "quality_filter": sql_quality_filter(),
    "text_repetition": sql_text_repetition(),
    "url_canonicalize": sql_url_canonicalize(),
    "text_lm_score": SQL_TEXT_LM_SCORE,
    "text_ppl_buckets": SQL_TEXT_PPL_BUCKETS,
    "text_ppl_buckets_sampled": SQL_TEXT_PPL_BUCKETS_SAMPLED,
}
