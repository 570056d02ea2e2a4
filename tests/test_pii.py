"""PII redaction semantics: crafted strings through the regex chain."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from remediner_spark.operators.pii import redact_pii


def _run(spark, texts):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(texts)), "t": texts})
    )
    cols = redact_pii(F.col("t"))
    rows = (
        df.select(
            "i",
            cols["text_redacted"].alias("r"),
            cols["n_email"].alias("ne"),
            cols["n_ip"].alias("ni"),
            cols["n_phone"].alias("np"),
        )
        .orderBy("i")
        .collect()
    )
    return [(x.r, x.ne, x.ni, x.np) for x in rows]


def test_each_category_masks(spark):
    out = _run(
        spark,
        [
            "write to First.Last+x@sub.Example.ORG today",
            "server at 10.2.3.4 responded",
            "call (555) 201-7788 now",
            "or +1 555 987 6543 works",
        ],
    )
    assert out[0] == ("write to <EMAIL> today", 1, 0, 0)
    assert out[1] == ("server at <IP> responded", 0, 1, 0)
    assert out[2] == ("call <PHONE> now", 0, 0, 1)
    assert out[3] == ("or <PHONE> works", 0, 0, 1)


def test_order_prevents_cross_category_bites(spark):
    # the email local part contains a phone-shaped digit run; the IP is
    # a dotted quad a greedy phone regex could half-eat — the contract
    # order (email -> IP -> phone) must mask each exactly once
    out = _run(
        spark,
        ["5552017788@x.co and 192.168.11.22 and 555-201-7788"],
    )
    assert out[0] == ("<EMAIL> and <IP> and <PHONE>", 1, 1, 1)


def test_plain_text_untouched(spark):
    txt = "the fast key order sort table scan merge part window"
    out = _run(spark, [txt])
    assert out[0] == (txt, 0, 0, 0)


def test_idempotent(spark):
    once = _run(spark, ["mail a@b.io at 1.2.3.4 or (555) 111-2222"])[0][0]
    twice = _run(spark, [once])[0]
    assert twice == (once, 0, 0, 0)


def test_multiple_matches_counted(spark):
    out = _run(spark, ["a@b.co c@d.org then 1.2.3.4 5.6.7.8"])
    assert out[0][1] == 2 and out[0][2] == 2
