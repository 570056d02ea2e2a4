"""PII redaction — the standard pre-training scrub stage.

Every public web-corpus pipeline (C4, RefinedWeb, Dolma) masks
personally identifiable strings before training: email addresses,
phone numbers, IP addresses. This implements the regex family as a
pure JVM codegen projection — `regexp_replace` / `regexp_count`
built-ins only, no UDF, no shuffle — so at 10^12 documents the stage
is embarrassingly map-parallel and fuses into whatever scan feeds it.

The reference corpus (PubMed abstracts in the reference repo,
word-soup `documents` here) carries no PII, so the gate synthesizes a
deterministic PII-bearing string per doc_id (the url_canonicalize /
multimodal payload pattern) and DuckDB mirrors both the synthesis and
the redaction. The regexes are written in the Java-regex ∩ RE2 common
subset (no lookarounds, no backrefs) so both engines compile them
identically.

Redaction order is part of the operator contract: email → IP → phone.
Email first so digit runs inside a local part can't be eaten by the
phone pattern; IP before phone so a dotted quad is never half-matched
as a phone fragment. Counts are taken against the same intermediate
strings the replacements see, so `n_email + n_phone + n_ip` is exactly
the number of masks inserted.
"""

from __future__ import annotations

from ..sources.scan import scan_parquet

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PAT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PAT_IP = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PAT_PHONE = r"(?:\+\d{1,2}[ -])?(?:\(\d{3}\) ?|\d{3}[ -])\d{3}[ -]\d{4}"

MASK_EMAIL = "<EMAIL>"
MASK_IP = "<IP>"
MASK_PHONE = "<PHONE>"


def redact_pii(text: Column) -> dict[str, Column]:
    """email → IP → phone redaction chain over ``text``.

    Returns the redacted column plus per-category match counts, each
    counted against the string the corresponding replacement actually
    ran on (so overlapping categories are never double-counted).
    """
    n_email = F.regexp_count(text, F.lit(PAT_EMAIL))
    t1 = F.regexp_replace(text, PAT_EMAIL, MASK_EMAIL)
    n_ip = F.regexp_count(t1, F.lit(PAT_IP))
    t2 = F.regexp_replace(t1, PAT_IP, MASK_IP)
    n_phone = F.regexp_count(t2, F.lit(PAT_PHONE))
    t3 = F.regexp_replace(t2, PAT_PHONE, MASK_PHONE)
    return {
        "text_redacted": t3,
        "n_email": n_email,
        "n_ip": n_ip,
        "n_phone": n_phone,
    }


# ------------------------------------------------ deterministic synth
# Per-doc PII-bearing text keyed off doc_id residues: email/phone/IP
# formats rotate, and each category is absent for one residue class so
# zero-count rows are exercised. The surrounding word-soup text is
# all-alphabetic (no digits, no '@'), so it can never false-positive.


def _synth_pii_expr() -> Column:
    d = F.col("doc_id")
    ds = d.cast("string")
    email = (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("user"), ds, F.lit("@Mail"),
                (d % 7).cast("string"), F.lit(".example.com"),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit("First.Last+tag"), ds, F.lit("@sub.Example"),
                (d % 5).cast("string"), F.lit(".ORG"),
            ),
        )
        .when(d % 4 == 2, F.lit("nobody here"))
        .otherwise(
            F.concat(
                F.lit("a_b-c"), ds, F.lit("@x"),
                (d % 3).cast("string"), F.lit(".co"),
            )
        )
    )
    p1 = (d % 700 + 200).cast("string")  # 3 digits, 200-899
    p2 = (d % 9000 + 1000).cast("string")  # 4 digits
    phone = (
        F.when(
            d % 3 == 0,
            F.concat(F.lit("(555) "), p1, F.lit("-"), p2),
        )
        .when(
            d % 3 == 1,
            F.concat(F.lit("+1 555 "), p1, F.lit(" "), p2),
        )
        .otherwise(F.lit("no phone"))
    )
    ip = (
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("10."), (d % 256).cast("string"),
                F.lit("."), (d % 200).cast("string"),
                F.lit("."), (d % 250).cast("string"),
            ),
        )
        .when(
            d % 5 >= 3,
            F.concat(
                F.lit("192.168."), (d % 256).cast("string"),
                F.lit("."), (d % 100).cast("string"),
            ),
        )
        .otherwise(F.lit("no address"))
    )
    return F.concat(
        F.substring(F.col("text"), 1, 40),
        F.lit(" contact "), email,
        F.lit(" or call "), phone,
        F.lit(" from "), ip,
        F.lit(" "), F.substring(F.col("text"), 41, 40),
    )


_SQL_SYNTH_PII = """
    substring(text, 1, 40)
    || ' contact '
    || CASE doc_id % 4
         WHEN 0 THEN 'user' || CAST(doc_id AS VARCHAR)
                 || '@Mail' || CAST(doc_id % 7 AS VARCHAR)
                 || '.example.com'
         WHEN 1 THEN 'First.Last+tag' || CAST(doc_id AS VARCHAR)
                 || '@sub.Example' || CAST(doc_id % 5 AS VARCHAR)
                 || '.ORG'
         WHEN 2 THEN 'nobody here'
         ELSE 'a_b-c' || CAST(doc_id AS VARCHAR)
              || '@x' || CAST(doc_id % 3 AS VARCHAR) || '.co'
       END
    || ' or call '
    || CASE doc_id % 3
         WHEN 0 THEN '(555) ' || CAST(doc_id % 700 + 200 AS VARCHAR)
                 || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
         WHEN 1 THEN '+1 555 ' || CAST(doc_id % 700 + 200 AS VARCHAR)
                 || ' ' || CAST(doc_id % 9000 + 1000 AS VARCHAR)
         ELSE 'no phone'
       END
    || ' from '
    || CASE
         WHEN doc_id % 5 = 0 THEN
           '10.' || CAST(doc_id % 256 AS VARCHAR)
           || '.' || CAST(doc_id % 200 AS VARCHAR)
           || '.' || CAST(doc_id % 250 AS VARCHAR)
         WHEN doc_id % 5 >= 3 THEN
           '192.168.' || CAST(doc_id % 256 AS VARCHAR)
           || '.' || CAST(doc_id % 100 AS VARCHAR)
         ELSE 'no address'
       END
    || ' ' || substring(text, 41, 40)
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    pii = docs.select(
        "doc_id", _synth_pii_expr().alias("text_pii")
    )
    cols = redact_pii(F.col("text_pii"))
    return pii.select(
        "doc_id",
        "text_pii",
        cols["text_redacted"].alias("text_redacted"),
        cols["n_email"].cast("long").alias("n_email"),
        cols["n_ip"].cast("long").alias("n_ip"),
        cols["n_phone"].cast("long").alias("n_phone"),
    )


def sql_pii_redact() -> str:
    e, i, p = PAT_EMAIL, PAT_IP, PAT_PHONE
    return f"""
WITH raw AS (
  SELECT doc_id, {_SQL_SYNTH_PII} AS text_pii FROM documents
),
s1 AS (
  SELECT doc_id, text_pii,
         CAST(len(regexp_extract_all(text_pii, '{e}')) AS BIGINT)
           AS n_email,
         regexp_replace(text_pii, '{e}', '{MASK_EMAIL}', 'g') AS t1
  FROM raw
),
s2 AS (
  SELECT *,
         CAST(len(regexp_extract_all(t1, '{i}')) AS BIGINT) AS n_ip,
         regexp_replace(t1, '{i}', '{MASK_IP}', 'g') AS t2
  FROM s1
)
SELECT doc_id, text_pii,
       regexp_replace(t2, '{p}', '{MASK_PHONE}', 'g') AS text_redacted,
       n_email, n_ip,
       CAST(len(regexp_extract_all(t2, '{p}')) AS BIGINT) AS n_phone
FROM s2"""


QUERIES = {"pii_redact": q_pii_redact}
ORACLES = {"pii_redact": sql_pii_redact()}
