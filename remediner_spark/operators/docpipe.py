"""KG pipeline semantics exercised on the driver's `documents` table.

The medical corpus fixtures can't be registered as DuckDB oracle views,
so these queries re-run the *same engine code paths* (GazetteerTagger
-> mentions_from_word_iob -> pair_mentions_positional, i.e. M1 -> M3 ->
M6) over `documents` with an OLAP-domain lexicon, paired with oracle
SQL expressing the identical semantics relationally. This gives the
pandas-UDF inference stage a true differential check against SQL.

Lexicon words are single tokens present in the synthetic documents
vocabulary, so first-occurrence rank pairing is exactly
`list_position`-rank pairing in SQL.
"""

from __future__ import annotations

from ..sources.scan import scan_parquet

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.tagmatch import BatchMatcher
from .ner import GazetteerTagger

DOC_DRUGS = ["spark", "customer", "vector", "window"]
DOC_EFFECTS = ["slow", "fast", "big", "small"]


def _tagger() -> GazetteerTagger:
    return GazetteerTagger(DOC_DRUGS, DOC_EFFECTS)


def q_m1_gazetteer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 (NER stage, deterministic model): per-document mention counts
    via the tagging UDF (ref model surface:
    src/FINALMODEL/final_model.py:20-24)."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    tagger = _tagger()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # space_split mirrors the reference/oracle string_split(text,' ')
        # semantics; parity with the per-row tag_words loop is pinned by
        # tests/test_tagmatch_differential.py::test_space_split_mode
        matcher = BatchMatcher.from_tagger(tagger, space_split=True)
        for pdf in batches:
            nd, ne = matcher.count_b_tags(pdf["text"])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_drug": nd, "n_effect": ne}
            )

    return docs.mapInPandas(fn, "doc_id long, n_drug long, n_effect long")


def _sql_in_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# lower(word): the engine's gazetteer matches case-insensitively and
# emits lowercase surfaces (the reference's convention) — the oracle
# mirrors that instead of relying on the corpus being lowercase
SQL_M1 = f"""
SELECT doc_id,
       len(list_filter(string_split(text, ' '),
                       w -> lower(w) IN ({_sql_in_list(DOC_DRUGS)}))) AS n_drug,
       len(list_filter(string_split(text, ' '),
                       w -> lower(w) IN ({_sql_in_list(DOC_EFFECTS)}))) AS n_effect
FROM documents"""


def q_m6_triples_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 (triple assembly): the full M1->M3->M6 kernel chain per doc —
    k-th first-seen drug pairs with k-th first-seen effect (ref pairing
    semantics: src/RE/data_utilities_re.py:24-40)."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    tagger = _tagger()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = BatchMatcher.from_tagger(tagger, space_split=True)
        for pdf in batches:
            pairs = matcher.extract_pairs(pdf["text"])
            r = pairs["row"].to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[r],
                    "subj": pairs["subj"].to_numpy(),
                    "pred": "CAUSES",
                    "obj": pairs["obj"].to_numpy(),
                }
            )

    return docs.mapInPandas(fn, "doc_id long, subj string, pred string, obj string")


def _sql_mention_ranks() -> str:
    """CTEs computing per-doc mention ranks with the M3 run-merge
    semantics: consecutive same-class lexicon words merge into ONE
    mention (the reference's de_append latch,
    /root/reference/src/FINALMODEL/final_model.py:102-106), surfaces
    dedupe keeping first occurrence, rank by first position."""
    d_list = _sql_in_list(DOC_DRUGS)
    e_list = _sql_in_list(DOC_EFFECTS)
    return f"""
w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
flags AS (
  SELECT doc_id, pos, lower(word) AS word,
         lower(word) IN ({d_list}) AS is_d,
         lower(word) IN ({e_list}) AS is_e
  FROM w),
marked AS (
  SELECT doc_id, pos, word, is_d, is_e,
         CASE WHEN is_d AND NOT coalesce(
             lag(is_d) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
           THEN 1 ELSE 0 END AS d_start,
         CASE WHEN is_e AND NOT coalesce(
             lag(is_e) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
           THEN 1 ELSE 0 END AS e_start
  FROM flags),
runs AS (
  SELECT doc_id, pos, word, is_d, is_e,
         sum(d_start) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS d_run,
         sum(e_start) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS e_run
  FROM marked),
d_surf AS (
  SELECT doc_id, d_run, string_agg(word, ' ' ORDER BY pos) AS surface,
         min(pos) AS first_pos
  FROM runs WHERE is_d GROUP BY doc_id, d_run),
e_surf AS (
  SELECT doc_id, e_run, string_agg(word, ' ' ORDER BY pos) AS surface,
         min(pos) AS first_pos
  FROM runs WHERE is_e GROUP BY doc_id, e_run),
d_rank AS (
  SELECT doc_id, surface,
         row_number() OVER (PARTITION BY doc_id ORDER BY fp) AS rnk
  FROM (SELECT doc_id, surface, min(first_pos) AS fp
        FROM d_surf GROUP BY doc_id, surface)),
e_rank AS (
  SELECT doc_id, surface,
         row_number() OVER (PARTITION BY doc_id ORDER BY fp) AS rnk
  FROM (SELECT doc_id, surface, min(first_pos) AS fp
        FROM e_surf GROUP BY doc_id, surface))"""


SQL_M6 = f"""
WITH {_sql_mention_ranks()}
SELECT d_rank.doc_id, d_rank.surface AS subj, 'CAUSES' AS pred,
       e_rank.surface AS obj
FROM d_rank JOIN e_rank
  ON d_rank.doc_id = e_rank.doc_id AND d_rank.rnk = e_rank.rnk"""


def q_m9_edges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9 (canonicalized edge agg) over the M6 triples: salted
    two-phase groupBy (skew-safe; see operators/graph.py)."""
    triples = q_m6_triples_docs(spark, sf_dir)
    partial = triples.withColumn(
        "_salt", F.pmod(F.col("doc_id"), F.lit(8))
    ).groupBy("subj", "obj", "_salt").agg(F.count(F.lit(1)).alias("_w"))
    return partial.groupBy("subj", "obj").agg(F.sum("_w").alias("weight"))


SQL_M9 = f"""
WITH {_sql_mention_ranks()},
triples AS (
  SELECT d_rank.doc_id, d_rank.surface AS subj, e_rank.surface AS obj
  FROM d_rank JOIN e_rank
    ON d_rank.doc_id = e_rank.doc_id AND d_rank.rnk = e_rank.rnk)
SELECT subj, obj, count(*) AS weight FROM triples GROUP BY subj, obj"""


def q_s2_entity_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 (substring-index source): first-occurrence character offset of
    each lexicon surface per document (the reference's nested `indexes`
    struct, /root/reference/ade_corpus_v2/ade_corpus_v2.py:207-214,
    flattened to rows)."""
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    terms = DOC_DRUGS + DOC_EFFECTS
    offsets = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.locate(t, F.col("text")).cast("long").alias("start_pos"),
            )
            for t in terms
        ]
    )
    return (
        docs.select("doc_id", F.explode(offsets).alias("o"))
        .select("doc_id", "o.term", "o.start_pos")
        .filter(F.col("start_pos") > 0)
        .withColumn(
            "end_pos",
            (F.col("start_pos") + F.length(F.col("term")) - 1).cast("long"),
        )
    )


SQL_S2 = " UNION ALL ".join(
    f"SELECT doc_id, '{t}' AS term, strpos(text, '{t}') AS start_pos, "
    f"strpos(text, '{t}') + {len(t) - 1} AS end_pos "
    f"FROM documents WHERE strpos(text, '{t}') > 0"
    for t in DOC_DRUGS + DOC_EFFECTS
)


def q_kg_top_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship KG consumer query: top-3 effects per drug by edge
    weight ('what does drug X cause?') over the M6/M9 graph."""
    from pyspark.sql.window import Window

    edges = q_m9_edges_docs(spark, sf_dir)
    w = Window.partitionBy("subj").orderBy(
        F.col("weight").desc(), F.col("obj")
    )
    return (
        edges.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("subj", "rank", "obj", "weight")
    )


SQL_KG_TOP = f"""
WITH {_sql_mention_ranks()},
triples AS (
  SELECT d_rank.doc_id, d_rank.surface AS subj, e_rank.surface AS obj
  FROM d_rank JOIN e_rank
    ON d_rank.doc_id = e_rank.doc_id AND d_rank.rnk = e_rank.rnk),
edges AS (
  SELECT subj, obj, count(*) AS weight FROM triples GROUP BY subj, obj),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY subj ORDER BY weight DESC, obj) AS rank
  FROM edges)
SELECT subj, rank, obj, weight FROM ranked WHERE rank <= 3"""


def q_kg_cooccurring_drugs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop graph query: drug pairs sharing an adverse effect, scored
    by min(edge weight) — 'which drugs co-report effect X?'. The
    relational shape of multi-hop KG traversal (edge self-join on the
    shared node)."""
    edges = q_m9_edges_docs(spark, sf_dir)
    return (
        edges.alias("a")
        .join(
            edges.alias("b"),
            (F.col("a.obj") == F.col("b.obj"))
            & (F.col("a.subj") < F.col("b.subj")),
        )
        .select(
            F.col("a.subj").alias("drug_a"),
            F.col("b.subj").alias("drug_b"),
            F.col("a.obj").alias("shared_effect"),
            F.least(F.col("a.weight"), F.col("b.weight")).alias("support"),
        )
    )


SQL_KG_COOCCUR = f"""
WITH {_sql_mention_ranks()},
triples AS (
  SELECT d_rank.doc_id, d_rank.surface AS subj, e_rank.surface AS obj
  FROM d_rank JOIN e_rank
    ON d_rank.doc_id = e_rank.doc_id AND d_rank.rnk = e_rank.rnk),
edges AS (
  SELECT subj, obj, count(*) AS weight FROM triples GROUP BY subj, obj)
SELECT a.subj AS drug_a, b.subj AS drug_b, a.obj AS shared_effect,
       least(a.weight, b.weight) AS support
FROM edges a JOIN edges b
  ON a.obj = b.obj AND a.subj < b.subj"""


SIM_MIN_JACCARD = 0.25
SIM_MAX_EFFECT_DF = 64  # cap: effects reported by more drugs are hubs


def q_kg_drug_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-similarity analytics: drug pairs scored by Jaccard overlap
    of their effect sets ('drugs with similar adverse-event profiles').
    Same scale-safe shape as ngram-Jaccard dedup: per-effect posting
    lists of drugs with a HUB CAP enforced by a count agg + anti-join
    BEFORE collect_list (an effect reported for most drugs carries no
    similarity signal and would concentrate one reducer), map-side
    pair expansion on the aggregated row, rational Jaccard rounded
    6dp."""
    edges = (
        q_m9_edges_docs(spark, sf_dir)
        .select("subj", "obj")
        .persist()  # consumers: hub cap + the hub-free edge set
    )
    hubs = (
        edges.groupBy("obj")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > SIM_MAX_EFFECT_DF)
        .select("obj")
    )
    # Jaccard over the HUB-FREE effect sets on both sides of the
    # ratio: sizes must come from the same anti-joined universe as the
    # intersection counts, or the score is the Jaccard of no
    # well-defined pair of sets (hub-heavy drugs would be
    # systematically under-scored by an all-effects denominator)
    nonhub = edges.join(hubs, "obj", "left_anti")
    sizes = nonhub.groupBy("subj").agg(F.count(F.lit(1)).alias("n_eff"))
    postings = (
        nonhub.groupBy("obj")
        .agg(F.sort_array(F.collect_list("subj")).alias("drugs"))
        .filter(F.size("drugs") >= 2)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("drugs"),
            lambda a, i: F.transform(
                F.slice(F.col("drugs"), i + 2, F.size(F.col("drugs"))),
                lambda b: F.struct(a.alias("drug_a"), b.alias("drug_b")),
            ),
        )
    )
    pairs = (
        postings.select(F.explode(pair_structs).alias("p"))
        .select("p.drug_a", "p.drug_b")
        .groupBy("drug_a", "drug_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        pairs.join(
            sizes.select(F.col("subj").alias("drug_a"),
                         F.col("n_eff").alias("n_a")), "drug_a")
        .join(
            sizes.select(F.col("subj").alias("drug_b"),
                         F.col("n_eff").alias("n_b")), "drug_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("n_a") + F.col("n_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= SIM_MIN_JACCARD)
        .select("drug_a", "drug_b", "common", "jaccard")
    )


SQL_KG_DRUG_SIM = f"""
WITH {_sql_mention_ranks()},
triples AS (
  SELECT d_rank.doc_id, d_rank.surface AS subj, e_rank.surface AS obj
  FROM d_rank JOIN e_rank
    ON d_rank.doc_id = e_rank.doc_id AND d_rank.rnk = e_rank.rnk),
edges AS (SELECT subj, obj FROM triples GROUP BY subj, obj),
rare AS (SELECT obj FROM edges GROUP BY obj
         HAVING count(*) <= {SIM_MAX_EFFECT_DF}),
inv AS (SELECT e.* FROM edges e JOIN rare USING (obj)),
sizes AS (SELECT subj, count(*) AS n_eff FROM inv GROUP BY subj),
pairs AS (
  SELECT a.subj AS drug_a, b.subj AS drug_b, count(*) AS common
  FROM inv a JOIN inv b ON a.obj = b.obj AND a.subj < b.subj
  GROUP BY 1, 2)
SELECT drug_a, drug_b, common,
       round(common * 1.0 / (sa.n_eff + sb.n_eff - common), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.subj = drug_a
JOIN sizes sb ON sb.subj = drug_b
WHERE round(common * 1.0 / (sa.n_eff + sb.n_eff - common), 6)
      >= {SIM_MIN_JACCARD}"""


QUERIES = {
    "s2_entity_offsets": q_s2_entity_offsets,
    "m1_gazetteer_ner": q_m1_gazetteer_counts,
    "m6_triple_assembly": q_m6_triples_docs,
    "m9_edge_agg_salted": q_m9_edges_docs,
    "kg_top_effects_per_drug": q_kg_top_effects,
    "kg_cooccurring_drugs": q_kg_cooccurring_drugs,
    "kg_drug_similarity": q_kg_drug_similarity,
}

ORACLES = {
    "s2_entity_offsets": SQL_S2,
    "m1_gazetteer_ner": SQL_M1,
    "m6_triple_assembly": SQL_M6,
    "m9_edge_agg_salted": SQL_M9,
    "kg_top_effects_per_drug": SQL_KG_TOP,
    "kg_cooccurring_drugs": SQL_KG_COOCCUR,
    "kg_drug_similarity": SQL_KG_DRUG_SIM,
}
