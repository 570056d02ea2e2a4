"""Iceberg-style table format: snapshots, time travel, pruning."""

from __future__ import annotations

import pytest

from remediner_spark.sources.corpus import generate_pages
from remediner_spark.sources.table import (
    _snap_files,
    pruned_file_count,
    read_table,
    table_snapshots,
    write_table,
)


@pytest.fixture()
def pages_pdf():
    pages, _ = generate_pages(120)
    return pages


def test_append_and_time_travel(spark, tmp_path, pages_pdf):
    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(pages_pdf.iloc[:50])
    df2 = spark.createDataFrame(pages_pdf.iloc[50:])
    s1 = write_table(df1, path, mode="append", partition_by=["lang"])
    s2 = write_table(df2, path, mode="append", partition_by=["lang"])
    assert s1["snapshot_id"] == 1 and s2["snapshot_id"] == 2
    assert read_table(spark, path).count() == 120
    # time travel: snapshot 1 still sees only the first batch
    assert read_table(spark, path, snapshot_id=1).count() == 50


def test_overwrite_keeps_history(spark, tmp_path, pages_pdf):
    path = str(tmp_path / "tbl")
    write_table(spark.createDataFrame(pages_pdf.iloc[:50]), path)
    write_table(
        spark.createDataFrame(pages_pdf.iloc[50:80]), path, mode="overwrite"
    )
    assert read_table(spark, path).count() == 30
    assert read_table(spark, path, snapshot_id=1).count() == 50
    snaps = table_snapshots(path)
    assert [s["mode"] for s in snaps] == ["append", "overwrite"]


def test_partition_pruning_from_manifest(spark, tmp_path, pages_pdf):
    path = str(tmp_path / "tbl")
    write_table(
        spark.createDataFrame(pages_pdf), path, partition_by=["lang"]
    )
    selected, total = pruned_file_count(path, {"lang": "de"})
    assert 0 < selected < total
    df = read_table(spark, path, partition_filter={"lang": "de"})
    got = df.toPandas()
    want = pages_pdf[pages_pdf["lang"] == "de"]
    assert len(got) == len(want)
    # partition column recovered on read
    assert set(got["lang"]) == {"de"}


def test_schema_mismatch_rejected(spark, tmp_path, pages_pdf):
    path = str(tmp_path / "tbl")
    write_table(spark.createDataFrame(pages_pdf), path)
    bad = spark.createDataFrame(pages_pdf.drop(columns=["lang"]))
    with pytest.raises(ValueError, match="schema mismatch"):
        write_table(bad, path)


def test_empty_filter_returns_empty_with_schema(spark, tmp_path, pages_pdf):
    path = str(tmp_path / "tbl")
    write_table(
        spark.createDataFrame(pages_pdf), path, partition_by=["lang"]
    )
    df = read_table(spark, path, partition_filter={"lang": "xx"})
    assert df.count() == 0
    assert "url" in df.columns


def test_replace_partitions_and_compaction(spark, tmp_path, pages_pdf):
    """replace_partitions rewrites only touched partitions; compaction
    bin-packs multi-file partitions into one file per partition with
    identical data; time travel still reaches pre-compaction files."""
    from remediner_spark.sources.table import compact_table

    path = str(tmp_path / "tbl")
    # three appends -> each lang partition holds 3 small files
    for i in range(3):
        chunk = pages_pdf.iloc[i * 40 : (i + 1) * 40]
        write_table(
            spark.createDataFrame(chunk).repartition(1),
            path, mode="append", partition_by=["lang"],
        )
    before = read_table(spark, path).toPandas()
    snaps = table_snapshots(path)
    pre_files = {
        f["path"] for f in __import__(
            "remediner_spark.sources.table", fromlist=["live_files"]
        ).live_files(path)
    }
    assert len(pre_files) > len(set(before["lang"]))

    snap = compact_table(spark, path)
    assert snap["snapshot_id"] == len(snaps) + 1
    after = read_table(spark, path).toPandas()
    key = ["url"]
    assert (
        before.sort_values(key).reset_index(drop=True)["url"].tolist()
        == after.sort_values(key).reset_index(drop=True)["url"].tolist()
    )
    # one file per compacted lang partition
    post = __import__(
        "remediner_spark.sources.table", fromlist=["live_files"]
    ).live_files(path)
    per_part = {}
    for f in post:
        per_part.setdefault(f["partition"]["lang"], 0)
        per_part[f["partition"]["lang"]] += 1
    assert max(per_part.values()) == 1
    # pre-compaction snapshot still readable (old files kept)
    assert read_table(spark, path, snapshot_id=3).count() == 120


def test_expire_snapshots_deletes_orphans(spark, tmp_path, pages_pdf):
    import os

    from remediner_spark.sources.table import compact_table, expire_snapshots

    path = str(tmp_path / "tbl")
    for i in range(3):
        chunk = pages_pdf.iloc[i * 40 : (i + 1) * 40]
        write_table(
            spark.createDataFrame(chunk).repartition(1),
            path, mode="append", partition_by=["lang"],
        )
    compact_table(spark, path)
    from remediner_spark.sources.table import _load_snapshots

    old_files = {f["path"] for f in _snap_files(path, _load_snapshots(path)[0])}
    res = expire_snapshots(path, keep_last=1)
    assert res["removed_snapshots"] == 3
    assert res["deleted_files"] > 0
    # the surviving snapshot is fully readable; orphans are gone
    assert read_table(spark, path).count() == 120
    assert any(not os.path.exists(p) for p in old_files)
    # expiring again is a no-op
    assert expire_snapshots(path, keep_last=1) == {
        "removed_snapshots": 0, "deleted_files": 0,
    }


def test_snapshot_ids_unique_after_expiry(spark, tmp_path, pages_pdf):
    """Regression: snapshot ids were len(snapshots)+1, so a write after
    expire_snapshots reused a surviving id, corrupting time travel."""
    from remediner_spark.sources.table import expire_snapshots

    path = str(tmp_path / "tbl")
    for i in range(3):
        chunk = pages_pdf.iloc[i * 40 : (i + 1) * 40]
        write_table(
            spark.createDataFrame(chunk), path, mode="append",
            partition_by=["lang"],
        )
    expire_snapshots(path, keep_last=2)  # ids [2, 3] survive
    s4 = write_table(
        spark.createDataFrame(pages_pdf.iloc[:10]), path, mode="append",
        partition_by=["lang"],
    )
    assert s4["snapshot_id"] == 4
    ids = [s["snapshot_id"] for s in table_snapshots(path)]
    assert len(ids) == len(set(ids)) == 3
    # time travel to a surviving pre-expiry snapshot still works
    assert read_table(spark, path, snapshot_id=3).count() == 120


def test_partition_values_survive_uri_encoding(spark, tmp_path):
    """Regression: input_file_name() returns a PERCENT-ENCODED URI, so
    partition dirs containing a space, '%', '=', '+', or non-ASCII
    re-encode (lang=a%3Db -> a%253Db) and the manifest join silently
    yielded NULL partition columns. The read side now percent-decodes
    ('+' preserved — URI encoding never means space by '+')."""
    import pandas as pd

    nasty = ["has space", "50%off", "a=b", "plus+plus", "naïve", "plain"]
    pdf = pd.DataFrame(
        {"url": [f"u{i}" for i in range(60)],
         "lang": [nasty[i % len(nasty)] for i in range(60)],
         "text": [f"t{i}" for i in range(60)]}
    )
    path = str(tmp_path / "tbl nasty")  # space in the TABLE path too
    write_table(spark.createDataFrame(pdf), path, partition_by=["lang"])
    got = read_table(spark, path).toPandas()
    assert len(got) == 60
    assert got["lang"].isna().sum() == 0
    assert set(got["lang"]) == set(nasty)
    # per-value filter + recovery both intact
    for v in nasty:
        sub = read_table(
            spark, path, partition_filter={"lang": v}
        ).toPandas()
        assert len(sub) == 10 and set(sub["lang"]) == {v}, v


def test_expire_commits_manifest_before_deleting(tmp_path, spark, pages_pdf, monkeypatch):
    """Regression (round-3 advice): expire_snapshots must persist the
    pruned manifest BEFORE removing data files, so a crash mid-delete
    leaks orphan files instead of leaving snapshots.json pointing at
    removed ones (broken time travel + lost carried_scopes)."""
    import os

    from remediner_spark.sources import table as T

    path = str(tmp_path / "tbl")
    for i in range(3):
        chunk = pages_pdf.iloc[i * 40 : (i + 1) * 40]
        write_table(
            spark.createDataFrame(chunk).repartition(1), path, mode="append",
            partition_by=["lang"],
        )
    T.compact_table(spark, path)  # makes the pre-compaction files dead

    real_remove = os.remove
    calls = {"n": 0}

    def crashy_remove(p):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash mid-delete")
        real_remove(p)

    monkeypatch.setattr(T.os, "remove", crashy_remove)
    with pytest.raises(RuntimeError, match="simulated crash"):
        T.expire_snapshots(path, keep_last=1)
    monkeypatch.setattr(T.os, "remove", real_remove)

    # manifest already pruned: every listed file exists, table readable
    snaps = T._load_snapshots(path)
    assert len(snaps) == 1
    assert all(os.path.exists(f["path"]) for f in _snap_files(path, snaps[-1]))
    assert read_table(spark, path).count() == 120
    # a second expiry is a no-op on snapshots (files already orphaned)
    res = T.expire_snapshots(path, keep_last=1)
    assert res["removed_snapshots"] == 0


def test_stats_data_skipping(spark, tmp_path):
    """Per-file column min/max stats (from parquet footers) prune
    files whose value range is disjoint from the requested range; the
    result still equals a full scan + filter exactly, and timestamps
    work through the ISO-string canonical form."""
    import datetime

    import pandas as pd

    from remediner_spark.sources.table import (
        read_table,
        stats_pruned_count,
    )

    base = datetime.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "doc_id": range(1000),
            "val": [i * 2 for i in range(1000)],
            "ts": pd.Series(
                [base + datetime.timedelta(hours=i) for i in range(1000)]
            ).astype("datetime64[us]"),
            "lang": ["en"] * 1000,
        }
    )
    path = str(tmp_path / "tbl")
    # range-partition on doc_id -> files hold disjoint id ranges, the
    # layout where data skipping bites (sorted/clustered ingest)
    df = spark.createDataFrame(pdf).repartitionByRange(8, "doc_id")
    write_table(df, path)

    sel, total = stats_pruned_count(path, {"doc_id": (100, 180)})
    assert total == 8 and 1 <= sel <= 2

    got = (
        read_table(spark, path, stats_filter={"doc_id": (100, 180)})
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = pdf[(pdf.doc_id >= 100) & (pdf.doc_id <= 180)].reset_index(
        drop=True
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["val"].tolist() == want["val"].tolist()

    # open-ended bound + timestamp column
    lo_ts = base + datetime.timedelta(hours=900)
    sel_ts, _ = stats_pruned_count(path, {"ts": (lo_ts, None)})
    assert sel_ts <= 2
    got_ts = read_table(
        spark, path, stats_filter={"ts": (lo_ts, None)}
    ).toPandas()
    assert len(got_ts) == 100
    # a column with overlapping ranges everywhere prunes nothing but
    # still filters exactly
    got_all = read_table(
        spark, path, stats_filter={"lang": ("en", "en")}
    ).toPandas()
    assert len(got_all) == 1000


def test_schema_evolution_add_column(spark, tmp_path):
    """Iceberg-style add-column evolution: an append with NEW columns
    widens the table schema; old files read as null for them; column
    ORDER is not identity; dropping or retyping still rejects; time
    travel sees each snapshot's own schema."""
    import pandas as pd

    path = str(tmp_path / "tbl")
    v1 = pd.DataFrame(
        {"url": ["a", "b"], "lang": ["en", "de"], "text": ["x", "y"]}
    )
    write_table(spark.createDataFrame(v1), path, partition_by=["lang"])

    # append with a new column AND shuffled column order
    v2 = pd.DataFrame(
        {"score": [0.5, 0.9], "text": ["z", "w"],
         "url": ["c", "d"], "lang": ["en", "en"]}
    )
    write_table(
        spark.createDataFrame(v2)[["score", "text", "url", "lang"]],
        path, mode="append", partition_by=["lang"],
    )
    got = read_table(spark, path).toPandas().sort_values("url")
    assert list(got.columns) == ["url", "lang", "text", "score"]
    assert got[got.url.isin(["a", "b"])]["score"].isna().all()
    assert got[got.url == "c"]["score"].iloc[0] == 0.5
    # time travel: snapshot 1 keeps the narrow schema
    old = read_table(spark, path, snapshot_id=1)
    assert "score" not in old.columns

    # dropping a column still rejects
    with pytest.raises(ValueError, match="missing columns"):
        write_table(
            spark.createDataFrame(v1.drop(columns=["text"])), path,
            mode="append", partition_by=["lang"],
        )
    # retyping still rejects
    bad = v1.copy()
    bad["text"] = [1, 2]
    with pytest.raises(ValueError, match="type changes"):
        write_table(
            spark.createDataFrame(bad), path, mode="append",
            partition_by=["lang"],
        )


def test_compaction_after_schema_evolution(spark, tmp_path):
    """Compacting partitions whose files span schema versions must
    null-fill evolved columns for old rows and keep new rows' values —
    regression for the inferred-schema read that would have dropped or
    crashed on the added column."""
    import pandas as pd

    from remediner_spark.sources.table import compact_table

    path = str(tmp_path / "tbl")
    v1 = pd.DataFrame(
        {"url": [f"a{i}" for i in range(6)], "lang": ["en"] * 6,
         "text": ["x"] * 6}
    )
    write_table(
        spark.createDataFrame(v1).repartition(1), path,
        mode="append", partition_by=["lang"],
    )
    v2 = v1.assign(url=[f"b{i}" for i in range(6)], score=1.5)
    write_table(
        spark.createDataFrame(v2).repartition(1), path,
        mode="append", partition_by=["lang"],
    )
    v3 = v1.assign(url=[f"c{i}" for i in range(6)], score=2.5)
    write_table(
        spark.createDataFrame(v3).repartition(1), path,
        mode="append", partition_by=["lang"],
    )
    compact_table(spark, path)
    got = read_table(spark, path).toPandas()
    assert len(got) == 18
    assert got[got.url.str.startswith("a")]["score"].isna().all()
    assert (got[got.url.str.startswith("b")]["score"] == 1.5).all()
    assert (got[got.url.str.startswith("c")]["score"] == 2.5).all()


def test_sort_order_enables_data_skipping(spark, tmp_path):
    """The Iceberg sort-order write (sort_by) clusters values so file
    ranges are disjoint and stats pruning bites; the same data written
    unclustered prunes nothing (every file spans the domain). Results
    are identical either way."""
    import random

    import pandas as pd

    from remediner_spark.sources.table import (
        read_table,
        stats_pruned_count,
    )

    rng = random.Random(3)
    ids = list(range(2000))
    rng.shuffle(ids)
    pdf = pd.DataFrame({"doc_id": ids, "val": [i % 7 for i in ids]})

    unsorted_path = str(tmp_path / "unsorted")
    write_table(
        spark.createDataFrame(pdf).repartition(8), unsorted_path
    )
    sorted_path = str(tmp_path / "sorted")
    write_table(
        spark.createDataFrame(pdf).repartition(8), sorted_path,
        sort_by=["doc_id"],
    )
    flt = {"doc_id": (500, 600)}
    sel_u, tot_u = stats_pruned_count(unsorted_path, flt)
    sel_s, tot_s = stats_pruned_count(sorted_path, flt)
    assert sel_u == tot_u == 8  # shuffled: every file spans the domain
    assert tot_s >= 4 and sel_s <= 2  # clustered: most files skipped

    a = read_table(spark, unsorted_path, stats_filter=flt).toPandas()
    b = read_table(spark, sorted_path, stats_filter=flt).toPandas()
    key = ["doc_id"]
    assert (
        a.sort_values(key).reset_index(drop=True)["val"].tolist()
        == b.sort_values(key).reset_index(drop=True)["val"].tolist()
    )
    assert len(a) == 101


def test_upsert_rows_copy_on_write(spark, tmp_path):
    """Row-level MERGE: matching keys replaced, new keys inserted,
    files outside the updates' key bounds carried by reference (not
    rewritten), pre-merge snapshot still time-travels."""
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        read_table,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame(
        {"doc_id": range(1000), "val": [i * 10 for i in range(1000)]}
    )
    write_table(
        spark.createDataFrame(pdf).repartition(8), path,
        sort_by=["doc_id"],
    )
    pre_files = {f["path"] for f in _snap_files(path, _load_snapshots(path)[-1])}

    ups = pd.DataFrame(
        {"doc_id": [100, 101, 5000], "val": [-1, -2, -3]}
    )
    snap = upsert_rows(
        spark, path, spark.createDataFrame(ups), ["doc_id"], strategy="cow"
    )
    # narrow key range + clustered files: most files carried untouched
    assert snap["properties"]["carried_files"] >= 5
    assert snap["properties"]["rewritten_files"] <= 3
    post_files = {f["path"] for f in _snap_files(path, _load_snapshots(path)[-1])}
    assert len(pre_files & post_files) == snap["properties"]["carried_files"]

    got = read_table(spark, path).toPandas().set_index("doc_id")
    assert len(got) == 1001  # 1000 originals - 2 replaced + 2 + 1 new
    assert got.loc[100, "val"] == -1 and got.loc[101, "val"] == -2
    assert got.loc[5000, "val"] == -3
    assert got.loc[99, "val"] == 990  # untouched row intact
    # pre-merge snapshot unchanged
    old = read_table(spark, path, snapshot_id=1).toPandas().set_index("doc_id")
    assert len(old) == 1000 and old.loc[100, "val"] == 1000

    # schema mismatch is loud
    with pytest.raises(ValueError, match="updates schema"):
        upsert_rows(
            spark, path,
            spark.createDataFrame(ups.drop(columns=["val"])), ["doc_id"],
        )


def test_upsert_rows_partitioned(spark, tmp_path):
    """Upsert on a partitioned table keeps partition recovery and
    per-partition files correct."""
    import pandas as pd

    from remediner_spark.sources.table import read_table, upsert_rows

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame(
        {"doc_id": range(100),
         "lang": ["en" if i % 2 else "de" for i in range(100)],
         "val": list(range(100))}
    )
    write_table(spark.createDataFrame(pdf), path, partition_by=["lang"])
    ups = pd.DataFrame(
        {"doc_id": [0, 1], "lang": ["de", "en"], "val": [-5, -6]}
    )
    upsert_rows(spark, path, spark.createDataFrame(ups), ["doc_id"])
    got = read_table(spark, path).toPandas().set_index("doc_id")
    assert len(got) == 100
    assert got.loc[0, "val"] == -5 and got.loc[1, "val"] == -6
    assert set(got["lang"]) == {"en", "de"}


def test_upsert_rejects_duplicate_keys_and_keeps_clustering(spark, tmp_path):
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(400), "val": range(400)})
    write_table(
        spark.createDataFrame(pdf).repartition(4), path,
        sort_by=["doc_id"],
    )
    dup = pd.DataFrame({"doc_id": [7, 7], "val": [1, 2]})
    with pytest.raises(ValueError, match="duplicate key"):
        upsert_rows(spark, path, spark.createDataFrame(dup), ["doc_id"])

    # two sequential narrow upserts: the second still carries files —
    # clustering (and therefore stats tightness) survived the first
    # rewrite because upsert re-applies the table's sort order
    one = pd.DataFrame({"doc_id": [10], "val": [-1]})
    upsert_rows(spark, path, spark.createDataFrame(one), ["doc_id"])
    snap2 = upsert_rows(
        spark, path,
        spark.createDataFrame(pd.DataFrame({"doc_id": [11], "val": [-2]})),
        ["doc_id"],
    )
    assert snap2["properties"]["carried_files"] >= 2
    assert _load_snapshots(path)[-1]["sort_by"] == ["doc_id"]


def test_delete_range_metadata_only_drop(spark, tmp_path):
    """Range DELETE on a clustered table: fully-covered files drop
    WITHOUT being read or rewritten, disjoint files carry by
    reference, boundary files rewrite with the complement filter;
    time travel still reaches the deleted rows."""
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        delete_range,
        read_table,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(1000), "val": range(1000)})
    write_table(
        spark.createDataFrame(pdf).repartition(8), path, sort_by=["doc_id"]
    )
    pre_files = {f["path"] for f in _snap_files(path, _load_snapshots(path)[-1])}

    snap = delete_range(spark, path, "doc_id", 200, 700)
    props = snap["properties"]
    assert props["dropped_files"] >= 2  # whole files inside [200, 700]
    assert props["carried_files"] >= 2  # files fully below/above
    assert props["rewritten_files"] <= 4
    # carried files are literally the same paths
    post_files = {f["path"] for f in _snap_files(path, _load_snapshots(path)[-1])}
    assert len(pre_files & post_files) == props["carried_files"]

    got = read_table(spark, path).toPandas()
    assert len(got) == 1000 - 501
    assert got["doc_id"].between(200, 700).sum() == 0
    # time travel pre-delete
    assert read_table(spark, path, snapshot_id=1).count() == 1000

    # open-ended retention cut: everything >= 900 goes
    delete_range(spark, path, "doc_id", 900, None)
    got2 = read_table(spark, path).toPandas()
    assert got2["doc_id"].max() < 900
    assert len(got2) == 1000 - 501 - 100

def test_delete_range_keeps_null_rows(spark, tmp_path):
    """SQL DELETE semantics: a NULL delete-column makes the predicate
    UNKNOWN, so NULL rows are KEPT — both on the rewrite path (the
    null-safe complement filter) and on the metadata-drop path (a file
    with NULL rows is never dropped metadata-only, however 'inside'
    its min/max range looks, because parquet stats ignore NULLs)."""
    import pandas as pd

    from remediner_spark.sources.table import delete_range, read_table

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame(
        {
            "k": [float(i) for i in range(100)] + [None] * 5,
            "val": list(range(105)),
        }
    )
    # single file: min/max = [0, 99], fully inside the delete range,
    # but it carries 5 NULL rows — the old metadata-drop would lose them
    write_table(spark.createDataFrame(pdf).coalesce(1), path)

    snap = delete_range(spark, path, "k", 0.0, 200.0)
    assert snap["properties"]["dropped_files"] == 0  # null gate held
    got = read_table(spark, path).toPandas()
    assert len(got) == 5
    assert got["k"].isna().all()
    assert sorted(got["val"]) == [100, 101, 102, 103, 104]


def test_delete_range_nullfree_still_drops_metadata_only(spark, tmp_path):
    """The null gate must not tax the common case: a null-free
    clustered table still gets the metadata-only drop (nullfree flag
    recorded from parquet null_count stats at write time)."""
    import pandas as pd

    from remediner_spark.sources.table import _load_snapshots, delete_range

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"k": range(1000), "val": range(1000)})
    write_table(spark.createDataFrame(pdf).repartition(8), path, sort_by=["k"])
    for f in _snap_files(path, _load_snapshots(path)[-1]):
        assert "k" in f["nullfree"]
    snap = delete_range(spark, path, "k", 200, 700)
    assert snap["properties"]["dropped_files"] >= 2


def test_stats_match_date_vs_datetime_bounds(spark, tmp_path):
    """Date-column stats are stored as 'YYYY-MM-DD'; a datetime filter
    bound canonicalizes to 'YYYY-MM-DDTHH:MM:SS'. Raw lexicographic
    comparison would FALSELY prune a file whose max date equals the
    bound's date ('2024-01-05' < '2024-01-05T00:00:00'); the promoted
    comparison keeps it. Incomparable representations (numeric bound
    vs string stats) degrade to keep, never TypeError."""
    import datetime

    from remediner_spark.sources.table import _stats_match

    entry = {"stats": {"d": ["2024-01-01", "2024-01-05"]}}
    # bound at midnight of the max date: rows with d == 2024-01-05
    # satisfy d >= bound under Spark's date->timestamp cast — keep
    assert _stats_match(
        entry, {"d": (datetime.datetime(2024, 1, 5, 0, 0, 0), None)}
    )
    # bound strictly past the range: provably disjoint — prune
    assert not _stats_match(
        entry, {"d": (datetime.datetime(2024, 1, 6, 0, 0, 0), None)}
    )
    # datetime stats vs date bound (reverse direction): hi bound
    # date(2024,1,5) casts to midnight; a file starting at 10:00 that
    # day is disjoint
    ts_entry = {"stats": {"t": ["2024-01-05T10:00:00", "2024-01-07T00:00:00"]}}
    assert not _stats_match(ts_entry, {"t": (None, datetime.date(2024, 1, 5))})
    assert _stats_match(ts_entry, {"t": (None, datetime.date(2024, 1, 6))})
    # numeric bound against string stats: incomparable -> keep, no raise
    assert _stats_match(entry, {"d": (5, None)})
    assert _stats_match(entry, {"d": (None, 5)})

def test_upsert_mor_equals_cow(spark, tmp_path):
    """Merge-on-read upsert must produce the same table contents as
    copy-on-write — without rewriting any data file — and time travel
    must reach the pre-merge rows in both."""
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        read_table,
        upsert_rows,
    )

    pdf = pd.DataFrame(
        {"doc_id": range(1000), "val": [i * 10 for i in range(1000)]}
    )
    ups = pd.DataFrame({"doc_id": [100, 101, 5000], "val": [-1, -2, -3]})
    results = {}
    for strat in ("cow", "mor"):
        path = str(tmp_path / strat)
        write_table(
            spark.createDataFrame(pdf).repartition(8), path,
            sort_by=["doc_id"],
        )
        snap = upsert_rows(
            spark, path, spark.createDataFrame(ups), ["doc_id"],
            strategy=strat,
        )
        if strat == "mor":
            assert snap["properties"]["rewritten_files"] == 0
            assert snap["properties"]["delete_targets"] >= 1
            # every pre-merge data file is still in the manifest
            pre = {f["path"] for f in _snap_files(path, _load_snapshots(path)[0])}
            post = {f["path"] for f in _snap_files(path, snap)}
            assert pre <= post
            assert len(snap["delete_files"]) == 1
        results[strat] = (
            read_table(spark, path)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # pre-merge time travel intact
        old = read_table(spark, path, snapshot_id=1).toPandas()
        assert len(old) == 1000
        assert old.set_index("doc_id").loc[100, "val"] == 1000
    pd.testing.assert_frame_equal(results["cow"], results["mor"])


def test_upsert_auto_picks_mor_for_narrow_updates(spark, tmp_path):
    """strategy='auto': a 3-row update against files holding hundreds
    of rows (high CoW amplification) goes merge-on-read; a dense
    update (most rows replaced) goes copy-on-write."""
    import pandas as pd

    from remediner_spark.sources.table import upsert_rows

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(1000), "val": range(1000)})
    write_table(
        spark.createDataFrame(pdf).repartition(4), path, sort_by=["doc_id"]
    )
    narrow = pd.DataFrame({"doc_id": [5], "val": [-1]})
    snap = upsert_rows(spark, path, spark.createDataFrame(narrow), ["doc_id"])
    assert snap["mode"] == "upsert-mor"
    dense = pd.DataFrame({"doc_id": range(500), "val": [-2] * 500})
    snap2 = upsert_rows(spark, path, spark.createDataFrame(dense), ["doc_id"])
    assert snap2["mode"] == "upsert"


def test_compact_folds_mor_deletes(spark, tmp_path):
    """compact_table applies pending delete entries while rewriting and
    the folded entries leave the manifest (their targets are gone)."""
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        compact_table,
        read_table,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame(
        {"doc_id": range(300),
         "lang": ["en" if i % 2 else "de" for i in range(300)],
         "val": list(range(300))}
    )
    write_table(
        spark.createDataFrame(pdf).repartition(3), path,
        partition_by=["lang"],
    )
    ups = pd.DataFrame(
        {"doc_id": [10, 11], "lang": ["en", "de"], "val": [-1, -2]}
    )
    upsert_rows(spark, path, spark.createDataFrame(ups), ["doc_id"],
                strategy="mor")
    assert _load_snapshots(path)[-1]["delete_files"]
    before = (
        read_table(spark, path).toPandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    snap = compact_table(spark, path, min_files_per_partition=1)
    assert not snap["delete_files"]  # folded in
    after = (
        read_table(spark, path).toPandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        before, after[before.columns.tolist()]
    )
    # the pre-compaction MoR snapshot still time-travels with deletes
    prev_id = snap["snapshot_id"] - 1
    tt = read_table(spark, path, snapshot_id=prev_id).toPandas()
    assert tt.set_index("doc_id").loc[10, "val"] == -1


def test_delete_range_mor_predicate(spark, tmp_path):
    """strategy='mor' range DELETE: boundary files stay in place under
    a predicate-delete entry; contents equal the CoW delete; NULL rows
    survive; inside files still metadata-drop."""
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        delete_range,
        read_table,
    )

    pdf = pd.DataFrame(
        {"k": [float(i) for i in range(1000)] + [None] * 5,
         "val": list(range(1005))}
    )
    results = {}
    for strat in ("cow", "mor"):
        path = str(tmp_path / strat)
        write_table(
            spark.createDataFrame(pdf).repartition(8), path, sort_by=["k"]
        )
        snap = delete_range(spark, path, "k", 201.5, 700.5, strategy=strat)
        assert snap["properties"]["dropped_files"] >= 1
        if strat == "mor":
            assert snap["properties"]["rewritten_files"] == 0
            assert snap["properties"]["delete_targets"] >= 1
            assert any(
                d["type"] == "pred" for d in snap["delete_files"]
            )
        results[strat] = (
            read_table(spark, path).toPandas()
            .sort_values("val").reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(results["cow"], results["mor"])
    got = results["mor"]
    assert len(got) == 1005 - 499  # k in [202, 700] deleted
    assert got["k"].isna().sum() == 5  # NULL rows kept


def test_expire_keeps_live_equality_delete_files(spark, tmp_path):
    """expire_snapshots must treat equality-delete files as live while
    any kept snapshot references them, and reap them once expired."""
    import os

    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        expire_snapshots,
        read_table,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(200), "val": range(200)})
    write_table(spark.createDataFrame(pdf).repartition(2), path,
                sort_by=["doc_id"])
    ups = pd.DataFrame({"doc_id": [7], "val": [-1]})
    upsert_rows(spark, path, spark.createDataFrame(ups), ["doc_id"],
                strategy="mor")
    eq_path = _load_snapshots(path)[-1]["delete_files"][0]["path"]
    # another append so the MoR snapshot is not the only one
    write_table(
        spark.createDataFrame(pd.DataFrame({"doc_id": [900], "val": [9]})),
        path, mode="append",
    )
    expire_snapshots(path, keep_last=2)
    assert os.path.exists(eq_path)  # still referenced by kept snapshots
    got = read_table(spark, path).toPandas().set_index("doc_id")
    assert got.loc[7, "val"] == -1
    # overwrite drops all files + delete entries; expiry then reaps
    write_table(
        spark.createDataFrame(pdf), path, mode="overwrite",
    )
    expire_snapshots(path, keep_last=1)
    assert not os.path.exists(eq_path)


def test_upsert_composite_key_file_targeting(spark, tmp_path):
    """A two-column narrow upsert into a sorted table rewrites only the
    files whose stats box actually contains an update key tuple — the
    composite-key generalization of the sorted-keyset targeting (the
    old fallback was a global per-column bounding box)."""
    import pandas as pd

    from remediner_spark.sources.table import read_table, upsert_rows

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame(
        {
            "bucket": [i // 125 for i in range(1000)],
            "doc_id": [i % 125 for i in range(1000)],
            "val": list(range(1000)),
        }
    )
    write_table(
        spark.createDataFrame(pdf).repartition(8), path,
        sort_by=["bucket", "doc_id"],
    )
    # two updates in far-apart buckets: a bounding box over (bucket,
    # doc_id) would span the whole table; tuple targeting touches only
    # the two owning files
    ups = pd.DataFrame(
        {"bucket": [0, 7], "doc_id": [10, 100], "val": [-1, -2]}
    )
    snap = upsert_rows(
        spark, path, spark.createDataFrame(ups), ["bucket", "doc_id"],
        strategy="cow",
    )
    assert snap["properties"]["rewritten_files"] <= 2
    assert snap["properties"]["carried_files"] >= 6
    got = read_table(spark, path).toPandas().set_index(["bucket", "doc_id"])
    assert got.loc[(0, 10), "val"] == -1
    assert got.loc[(7, 100), "val"] == -2
    assert len(got) == 1000


def test_rename_column_metadata_only(spark, tmp_path):
    """Field-id rename: metadata-only commit, old files keep serving
    the column under the new name, appends use the new name, time
    travel to the pre-rename snapshot sees the old name."""
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        read_table,
        rename_column,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(100), "val": range(100)})
    write_table(spark.createDataFrame(pdf).repartition(2), path,
                sort_by=["doc_id"])
    pre_files = {f["path"] for f in _snap_files(path, _load_snapshots(path)[-1])}

    snap = rename_column(path, "val", "score")
    assert snap["mode"] == "evolve-rename"
    assert {f["path"] for f in _snap_files(path, snap)} == pre_files  # no rewrite
    got = read_table(spark, path).toPandas()
    assert "score" in got.columns and "val" not in got.columns
    assert got.sort_values("doc_id")["score"].tolist() == list(range(100))
    # sort order followed the rename? no - sort was on doc_id; appends:
    write_table(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [200], "score": [999]})
        ),
        path, mode="append",
    )
    got2 = read_table(spark, path).toPandas().set_index("doc_id")
    assert got2.loc[200, "score"] == 999 and len(got2) == 101
    # time travel: pre-rename schema of its day
    old = read_table(spark, path, snapshot_id=1).toPandas()
    assert "val" in old.columns and "score" not in old.columns


def test_drop_column_and_readd_never_resurrects(spark, tmp_path):
    """Dropping a column is metadata-only; re-adding the same NAME is a
    NEW field id, so old files read null for it (Iceberg id semantics);
    time travel pre-drop still sees the original values."""
    import pandas as pd

    from remediner_spark.sources.table import (
        drop_column,
        read_table,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(50), "secret": range(50)})
    write_table(spark.createDataFrame(pdf).repartition(2), path)
    drop_column(path, "secret")
    got = read_table(spark, path).toPandas()
    assert list(got.columns) == ["doc_id"]
    # re-add the same name via append evolution
    readd = pd.DataFrame({"doc_id": [100], "secret": [-1]})
    write_table(spark.createDataFrame(readd), path, mode="append")
    got2 = read_table(spark, path).toPandas().set_index("doc_id")
    assert got2.loc[100, "secret"] == -1
    # old rows must NOT resurrect the dropped data
    assert got2.loc[range(50), "secret"].isna().all()
    # time travel pre-drop
    old = read_table(spark, path, snapshot_id=1).toPandas()
    assert old.set_index("doc_id").loc[10, "secret"] == 10


def test_widen_column_int_to_long(spark, tmp_path):
    """int->long widening: metadata-only; old int files cast at read;
    new long appends mix transparently; unsafe retype still raises."""
    import pandas as pd

    from remediner_spark.sources.table import (
        read_table,
        widen_column,
    )

    path = str(tmp_path / "tbl")
    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(20), "n": range(20)})
    ).selectExpr("doc_id", "CAST(n AS INT) AS n")
    write_table(sdf, path)
    widen_column(path, "n", "long")
    got = read_table(spark, path)
    assert dict(got.dtypes)["n"] == "bigint"
    big = spark.createDataFrame(
        pd.DataFrame({"doc_id": [99], "n": [2**40]})
    )
    write_table(big, path, mode="append")
    vals = read_table(spark, path).toPandas().set_index("doc_id")["n"]
    assert vals.loc[99] == 2**40 and vals.loc[5] == 5
    # time travel pre-widening keeps the int schema
    assert dict(read_table(spark, path, snapshot_id=1).dtypes)["n"] == "int"
    with pytest.raises(ValueError, match="unsafe type change"):
        widen_column(path, "doc_id", "string")


def test_evolution_guards(spark, tmp_path):
    """Partition columns can't rename/drop; sort-order columns can't
    drop; delete-entry keys can't drop before folding."""
    import pandas as pd

    from remediner_spark.sources.table import (
        drop_column,
        rename_column,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame(
        {"doc_id": range(100),
         "lang": ["en" if i % 2 else "de" for i in range(100)],
         "val": list(range(100))}
    )
    write_table(spark.createDataFrame(pdf), path, partition_by=["lang"])
    with pytest.raises(ValueError, match="partition column"):
        rename_column(path, "lang", "language")
    with pytest.raises(ValueError, match="partition column"):
        drop_column(path, "lang")

    path2 = str(tmp_path / "tbl2")
    write_table(
        spark.createDataFrame(pdf.drop(columns=["lang"])), path2,
        sort_by=["doc_id"],
    )
    with pytest.raises(ValueError, match="sort order"):
        drop_column(path2, "doc_id")
    # delete-entry guard: key the MoR delete on a NON-sort column
    path3 = str(tmp_path / "tbl3")
    write_table(
        spark.createDataFrame(pdf.drop(columns=["lang"])).repartition(2),
        path3,
    )
    ups = pd.DataFrame({"doc_id": [-1], "val": [5]})
    upsert_rows(spark, path3, spark.createDataFrame(ups), ["val"],
                strategy="mor")
    with pytest.raises(ValueError, match="delete entry"):
        drop_column(path3, "val")


def test_rename_with_pending_mor_delete(spark, tmp_path):
    """An equality-delete committed before a rename must keep applying
    afterwards: the entry's logical cols follow the rename while the
    delete parquet keeps its physical column names."""
    import pandas as pd

    from remediner_spark.sources.table import (
        read_table,
        rename_column,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(200), "val": range(200)})
    write_table(spark.createDataFrame(pdf).repartition(2), path,
                sort_by=["doc_id"])
    ups = pd.DataFrame({"doc_id": [7], "val": [-1]})
    upsert_rows(spark, path, spark.createDataFrame(ups), ["doc_id"],
                strategy="mor")
    rename_column(path, "doc_id", "page_id")
    got = read_table(spark, path).toPandas().set_index("page_id")
    assert len(got) == 200  # old row 7 deleted, update inserted
    assert got.loc[7, "val"] == -1


def test_stats_skipping_survives_rename(spark, tmp_path):
    """Footer stats stay keyed by the write-time physical name; after
    a rename the filter column must resolve through the field-id
    mapping so data skipping keeps pruning (a conservative fallback
    would silently read everything forever)."""
    import pandas as pd

    from remediner_spark.sources.table import (
        read_table,
        rename_column,
        stats_pruned_count,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(1000), "val": range(1000)})
    write_table(spark.createDataFrame(pdf).repartition(8), path,
                sort_by=["doc_id"])
    rename_column(path, "doc_id", "page_id")
    selected, total = stats_pruned_count(path, {"page_id": (900, None)})
    assert total == 8 and selected <= 2  # pruning still bites
    got = read_table(spark, path, stats_filter={"page_id": (900, None)})
    assert got.count() == 100


def test_stats_filter_prunes_pre_add_files(spark, tmp_path):
    """Files that predate an added column hold only NULLs for it, and
    a bounded range predicate excludes NULL rows — those files prune
    entirely at the manifest level."""
    import pandas as pd

    from remediner_spark.sources.table import read_table, stats_pruned_count

    path = str(tmp_path / "tbl")
    old = pd.DataFrame({"doc_id": range(100)})
    write_table(spark.createDataFrame(old).repartition(4), path)
    new = pd.DataFrame({"doc_id": [200, 201], "score": [5, 7]})
    write_table(spark.createDataFrame(new), path, mode="append")
    selected, total = stats_pruned_count(path, {"score": (0, None)})
    assert selected < total
    got = read_table(spark, path, stats_filter={"score": (0, None)}).toPandas()
    assert sorted(got["doc_id"]) == [200, 201]


def test_upsert_after_widen_and_rename(spark, tmp_path):
    """MERGE through evolution: after int->long widening and a key
    rename, upserts keyed on the new name still target files through
    the field-id mapping and merge correctly in both strategies."""
    import pandas as pd

    from remediner_spark.sources.table import (
        read_table,
        rename_column,
        upsert_rows,
        widen_column,
    )

    for strat in ("cow", "mor"):
        path = str(tmp_path / strat)
        base = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(400), "n": range(400)})
        ).selectExpr("doc_id", "CAST(n AS INT) AS n")
        write_table(base.repartition(4), path, sort_by=["doc_id"])
        widen_column(path, "n", "long")
        rename_column(path, "doc_id", "page_id")
        ups = spark.createDataFrame(
            pd.DataFrame({"page_id": [5], "n": [2**40]})
        )
        snap = upsert_rows(spark, path, ups, ["page_id"], strategy=strat)
        if strat == "cow":
            # field-id stats targeting still prunes: only the file
            # holding page_id=5 rewrites
            assert snap["properties"]["rewritten_files"] == 1
            assert snap["properties"]["carried_files"] == 3
        got = read_table(spark, path).toPandas().set_index("page_id")
        assert len(got) == 400
        assert got.loc[5, "n"] == 2**40
        assert got.loc[6, "n"] == 6


def test_delete_range_after_rename(spark, tmp_path):
    """Range DELETE on a renamed column: classification resolves file
    stats through the field-id mapping, so metadata-only drops still
    happen and the result equals the relational recomputation."""
    import pandas as pd

    from remediner_spark.sources.table import (
        delete_range,
        read_table,
        rename_column,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(1000), "val": range(1000)})
    write_table(spark.createDataFrame(pdf).repartition(8), path,
                sort_by=["doc_id"])
    rename_column(path, "doc_id", "page_id")
    snap = delete_range(spark, path, "page_id", 200, 700)
    assert snap["properties"]["dropped_files"] >= 2  # stats still map
    got = read_table(spark, path).toPandas()
    assert len(got) == 1000 - 501
    assert got["page_id"].between(200, 700).sum() == 0


def test_remove_orphan_files(spark, tmp_path):
    """Orphan cleanup: a crashed write's unreferenced data files are
    reaped once past the age guard; young files (possible in-flight
    commits) and every referenced file survive; dry_run only reports."""
    import os
    import time as _time

    import pandas as pd

    from remediner_spark.sources.table import (
        read_table,
        remove_orphan_files,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(100), "val": range(100)})
    write_table(spark.createDataFrame(pdf).repartition(2), path,
                sort_by=["doc_id"])
    upsert_rows(
        spark, path,
        spark.createDataFrame(pd.DataFrame({"doc_id": [3], "val": [-1]})),
        ["doc_id"], strategy="mor",
    )
    # simulate a crashed write: files on disk, no manifest entry
    crash_dir = os.path.join(path, "data", "commit=deadbeef")
    os.makedirs(crash_dir)
    orphan = os.path.join(crash_dir, "part-00000-crash.parquet")
    open(orphan, "wb").write(b"not a real parquet")
    old = _time.time() - 7200
    os.utime(orphan, (old, old))
    young = os.path.join(crash_dir, "part-00001-inflight.parquet")
    open(young, "wb").write(b"in-flight commit")

    rep = remove_orphan_files(path, dry_run=True)
    assert rep["orphans"] == [orphan] and rep["deleted"] == 0
    assert os.path.exists(orphan)
    rep2 = remove_orphan_files(path)
    assert rep2["deleted"] == 1
    assert not os.path.exists(orphan)
    assert os.path.exists(young)  # age guard protects in-flight commits
    # table fully intact, MoR delete file included
    got = read_table(spark, path).toPandas().set_index("doc_id")
    assert len(got) == 100 and got.loc[3, "val"] == -1


def test_metadata_tables(spark, tmp_path):
    """Iceberg-style .files/.history introspection from the manifest."""
    import pandas as pd

    from remediner_spark.sources.table import (
        table_files,
        table_history,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(100), "val": range(100)})
    write_table(spark.createDataFrame(pdf).repartition(2), path,
                sort_by=["doc_id"])
    upsert_rows(
        spark, path,
        spark.createDataFrame(pd.DataFrame({"doc_id": [3], "val": [-1]})),
        ["doc_id"], strategy="mor",
    )
    files = table_files(spark, path).toPandas()
    assert files["record_count"].sum() == 101  # physical rows incl. update
    assert all("doc_id" in nf for nf in files["nullfree"])
    hist = table_history(spark, path).toPandas()
    assert hist["operation"].tolist() == ["append", "upsert-mor"]
    assert hist["delete_file_count"].tolist() == [0, 1]


def test_read_incremental_appends(spark, tmp_path):
    """Incremental append scan: only the rows added after the base
    snapshot; schema evolution in range is transparent; rewriting
    operations in range are loud."""
    import pandas as pd

    from remediner_spark.sources.table import (
        read_incremental,
        rename_column,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    for lo in (0, 100, 200):
        write_table(
            spark.createDataFrame(
                pd.DataFrame(
                    {"doc_id": range(lo, lo + 100), "val": range(100)}
                )
            ),
            path, mode="append",
        )
    inc = read_incremental(spark, path, from_snapshot=1).toPandas()
    assert sorted(inc["doc_id"]) == list(range(100, 300))
    inc2 = read_incremental(spark, path, 1, 2).toPandas()
    assert sorted(inc2["doc_id"]) == list(range(100, 200))
    assert read_incremental(spark, path, 3, 3).count() == 0

    # rename in range is metadata-only: incremental read still works,
    # under the target snapshot's schema
    rename_column(path, "doc_id", "page_id")
    write_table(
        spark.createDataFrame(
            pd.DataFrame({"page_id": [900], "val": [9]})
        ),
        path, mode="append",
    )
    inc3 = read_incremental(spark, path, 2).toPandas()
    assert "page_id" in inc3.columns
    assert sorted(inc3["page_id"]) == list(range(200, 300)) + [900]

    # an upsert in range rewrites rows -> loud
    upsert_rows(
        spark, path,
        spark.createDataFrame(pd.DataFrame({"page_id": [0], "val": [-1]})),
        ["page_id"], strategy="cow",
    )
    with pytest.raises(ValueError, match="non-append"):
        read_incremental(spark, path, 1)


def test_optimistic_commit_conflict(spark, tmp_path):
    """Concurrent-writer safety: a commit planned against a stale tip
    raises CommitConflictError instead of silently dropping the other
    writer's snapshot; a stale crashed lock is broken, a fresh one
    times out."""
    import os
    import time as _time

    import pandas as pd

    from remediner_spark.sources.table import (
        CommitConflictError,
        _commit_snapshot,
        _load_snapshots,
        _meta_dir,
        read_table,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(50), "val": range(50)})
    write_table(spark.createDataFrame(pdf), path)
    # writer A plans against tip=1; writer B commits first
    write_table(
        spark.createDataFrame(pd.DataFrame({"doc_id": [99], "val": [9]})),
        path, mode="append",
    )  # tip is now 2
    fake = dict(_load_snapshots(path)[-1])
    fake["snapshot_id"] = 2
    with pytest.raises(CommitConflictError, match="planned against 1"):
        _commit_snapshot(path, 1, fake)
    # nothing was lost
    assert read_table(spark, path).count() == 51
    assert [s["snapshot_id"] for s in _load_snapshots(path)] == [1, 2]

    # stale lock (crashed writer) is broken and the commit proceeds
    lock = os.path.join(_meta_dir(path), "commit.lock")
    open(lock, "w").write("0")
    old = _time.time() - 3600
    os.utime(lock, (old, old))
    write_table(
        spark.createDataFrame(pd.DataFrame({"doc_id": [100], "val": [1]})),
        path, mode="append",
    )
    assert read_table(spark, path).count() == 52
    # fresh lock blocks until timeout
    open(lock, "w").write("0")
    from remediner_spark.sources.table import _commit_lock

    with pytest.raises(TimeoutError, match="commit lock busy"):
        with _commit_lock(path, timeout_s=0.3):
            pass
    os.remove(lock)


def test_compact_unpartitioned_folds_deletes(spark, tmp_path):
    """Unpartitioned tables fold MoR deletes by whole-table rewrite:
    contents unchanged, delete entries gone, sort order preserved,
    time travel intact."""
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        compact_table,
        delete_range,
        read_table,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(500), "val": range(500)})
    write_table(spark.createDataFrame(pdf).repartition(6), path,
                sort_by=["doc_id"])
    upsert_rows(
        spark, path,
        spark.createDataFrame(pd.DataFrame({"doc_id": [7], "val": [-1]})),
        ["doc_id"], strategy="mor",
    )
    delete_range(spark, path, "doc_id", 480, None, strategy="mor")
    assert _load_snapshots(path)[-1]["delete_files"]
    before = (
        read_table(spark, path).toPandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    snap = compact_table(spark, path)
    assert not snap["delete_files"]
    assert len(_snap_files(path, snap)) <= 2
    assert snap["sort_by"] == ["doc_id"]
    after = (
        read_table(spark, path).toPandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after)
    assert len(after) == 500 - 20  # 480..499 deleted, key 7 updated
    assert after.set_index("doc_id").loc[7, "val"] == -1
    # pre-compaction snapshots still time travel
    assert read_table(spark, path, snapshot_id=1).count() == 500


def test_cmp_stats_matches_chronology():
    """Property: _cmp_stats on canonicalized date/datetime bounds must
    agree with true chronological order whenever it returns a verdict
    (the ADVICE r4 false-prune class: '2024-01-05' vs
    '2024-01-05T00:00:00' compared lexicographically)."""
    import datetime
    import itertools

    from remediner_spark.sources.table import _cmp_stats, _stats_value

    instants = []
    for d in (1, 5, 28):
        instants.append(datetime.date(2024, 1, d))
        for h, m_ in ((0, 0), (10, 30), (23, 59)):
            instants.append(datetime.datetime(2024, 1, d, h, m_))
    for a, b in itertools.product(instants, repeat=2):
        ta = (
            a
            if isinstance(a, datetime.datetime)
            else datetime.datetime(a.year, a.month, a.day)
        )
        tb = (
            b
            if isinstance(b, datetime.datetime)
            else datetime.datetime(b.year, b.month, b.day)
        )
        want = (ta > tb) - (ta < tb)
        got = _cmp_stats(_stats_value(a), _stats_value(b))
        assert got == want, (a, b, got, want)
    # incomparable representations return None, never raise
    assert _cmp_stats(5, "2024-01-01") is None
    assert _cmp_stats(True, 1) is None


def test_stats_filter_composes_with_mor_deletes(spark, tmp_path):
    """Interplay paranoia: manifest stats pruning + row-level range
    filter + pending equality/predicate deletes must compose to the
    exact relational answer — a pruned file's delete entry simply has
    nothing to apply to."""
    import pandas as pd

    from remediner_spark.sources.table import (
        delete_range,
        read_table,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(1000), "val": range(1000)})
    write_table(spark.createDataFrame(pdf).repartition(8), path,
                sort_by=["doc_id"])
    upsert_rows(
        spark, path,
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [150, 850], "val": [-1, -2]})
        ),
        ["doc_id"], strategy="mor",
    )
    delete_range(spark, path, "doc_id", 300, 499, strategy="mor")

    got = (
        read_table(spark, path, stats_filter={"doc_id": (100, 899)})
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    # relational recompute in pandas
    want = pdf.copy()
    want.loc[want.doc_id.isin([150, 850]), "val"] = [-1, -2]
    want = want[~want.doc_id.between(300, 499)]
    want = (
        want[want.doc_id.between(100, 899)]
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_break_stale_lock_spares_fresh_lock(tmp_path, monkeypatch):
    """A stale commit lock is broken; a fresh one is left alone — and
    the race where the lock is REPLACED between the staleness stat and
    the claim (r5 ADVICE TOCTOU) restores the stolen fresh lock."""
    import os
    import time as _time

    from remediner_spark.sources.table import _break_stale_lock

    lock = str(tmp_path / "commit.lock")

    # stale lock: removed
    with open(lock, "w") as fh:
        fh.write("111:dead")
    os.utime(lock, (_time.time() - 9999, _time.time() - 9999))
    _break_stale_lock(lock, stale_s=300.0)
    assert not os.path.exists(lock)

    # fresh lock: untouched
    with open(lock, "w") as fh:
        fh.write("222:live")
    _break_stale_lock(lock, stale_s=300.0)
    assert os.path.exists(lock)

    # TOCTOU: the first stat observes a STALE file, but by claim time a
    # FRESH lock (different inode) sits at the path — simulate with a
    # patched first stat reporting staleness + a different inode
    real_stat = os.stat
    real = real_stat(lock)
    calls = {"n": 0}

    class _FakeStat:
        st_ino = real.st_ino + 12345
        st_mtime = _time.time() - 9999

    def fake_stat(p, *a, **kw):
        if p == lock and calls["n"] == 0:
            calls["n"] += 1
            return _FakeStat()
        return real_stat(p, *a, **kw)

    monkeypatch.setattr(os, "stat", fake_stat)
    _break_stale_lock(lock, stale_s=300.0)
    monkeypatch.undo()
    assert os.path.exists(lock)  # fresh lock restored, not deleted
    with open(lock) as fh:
        assert fh.read() == "222:live"
    assert not [p for p in os.listdir(tmp_path) if ".break." in p]


def test_compact_partitioned_preserves_sort_order(spark, tmp_path):
    """Partitioned compaction keeps the table's sort order (it used to
    commit sort_by: [], silently losing clustering — r5 ADVICE) and the
    rewritten files still stats-prune."""
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        compact_table,
        read_table,
        stats_pruned_count,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame(
        {"doc_id": range(400),
         "lang": ["en" if i % 2 else "de" for i in range(400)],
         "val": list(range(400))}
    )
    for lo in (0, 100, 200, 300):  # 4 small commits per partition
        write_table(
            spark.createDataFrame(pdf.iloc[lo:lo + 100]), path,
            partition_by=["lang"], sort_by=["val"],
        )
    snap = compact_table(spark, path, min_files_per_partition=1)
    assert snap["sort_by"] == ["val"]
    assert read_table(spark, path).count() == 400
    selected, total = stats_pruned_count(path, {"val": (0, 40)})
    assert 0 < selected < total  # clustering survived the rewrite
    assert _load_snapshots(path)[-1]["sort_by"] == ["val"]


def test_compact_folds_emptied_partition(spark, tmp_path):
    """Pending MoR deletes that empty an entire partition still fold:
    the rewrite emits no file for it, but compact_table names it as
    replaced, so its old files leave the manifest, its delete entries
    prune, and a second compaction is a no-op (the r5 ADVICE
    permanent-no-progress finding)."""
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        compact_table,
        delete_range,
        read_table,
    )

    path = str(tmp_path / "tbl")
    # >60-char string values defeat footer stats, forcing delete_range
    # into the boundary (rewrite/MoR) class instead of metadata drops
    pdf = pd.DataFrame(
        {"doc_id": range(100),
         "lang": ["de" if i < 50 else "en" for i in range(100)],
         "val": [("x" * 70 if i < 50 else "z" * 70) + str(i)
                 for i in range(100)]}
    )
    write_table(
        spark.createDataFrame(pdf), path, partition_by=["lang"]
    )
    # deletes every 'de' row (all start 'xxx…'), no 'en' row ('zzz…')
    delete_range(spark, path, "val", lo="x", hi="y", strategy="mor")
    assert _load_snapshots(path)[-1]["delete_files"]
    assert read_table(spark, path).count() == 50

    snap = compact_table(spark, path, min_files_per_partition=1)
    assert not snap["delete_files"]  # folded, including the emptied one
    assert read_table(spark, path).count() == 50
    assert set(
        read_table(spark, path).toPandas()["lang"].unique()
    ) == {"en"}
    # no re-qualification: the next compaction has nothing to do
    snap2 = compact_table(spark, path, min_files_per_partition=1)
    assert snap2["snapshot_id"] == snap["snapshot_id"]


def test_append_writes_o1_manifest_bytes(spark, tmp_path):
    """Manifest-list commits: a 1-file append to an N-file table writes
    one 1-entry manifest + one manifest list + one O(1) snapshot
    record; every pre-existing manifest file is untouched (carried by
    ref), at ANY table size (the r5 verdict's O(total files x history)
    rewrite is gone)."""
    import json
    import os

    import pandas as pd

    from remediner_spark.sources.table import _manifest_dir, live_files

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(200), "val": range(200)})
    write_table(spark.createDataFrame(pdf).repartition(20), path)
    assert len(live_files(path)) == 20
    one = spark.createDataFrame(pd.DataFrame({"doc_id": [990], "val": [0]}))

    def manifest_state():
        d = _manifest_dir(path)
        return {
            n: (os.path.getsize(os.path.join(d, n)),
                os.path.getmtime(os.path.join(d, n)))
            for n in os.listdir(d)
        }

    def snapjson_size():
        return os.path.getsize(
            os.path.join(path, "_metadata", "snapshots.json")
        )

    deltas, manifest_sizes = [], []
    for _ in range(2):
        before, sz0 = manifest_state(), snapjson_size()
        write_table(one, path, mode="append")
        after = manifest_state()
        # every pre-existing manifest file is byte-identical
        assert all(after[n] == st for n, st in before.items())
        new = [n for n in after if n not in before]
        new_m = [n for n in new if n.startswith("m-")]
        new_ml = [n for n in new if n.startswith("ml-")]
        assert len(new_m) == 1 and len(new_ml) == 1 and len(new) == 2
        entries = json.load(
            open(os.path.join(_manifest_dir(path), new_m[0]))
        )
        assert len(entries) == 1  # exactly the appended file
        manifest_sizes.append(os.path.getsize(
            os.path.join(_manifest_dir(path), new_m[0])
        ))
        deltas.append(snapjson_size() - sz0)

    # grow the table by 30 more commits, then re-measure one append
    for _ in range(30):
        write_table(one, path, mode="append")
    before, sz0 = manifest_state(), snapjson_size()
    write_table(one, path, mode="append")
    after = manifest_state()
    assert all(after[n] == st for n, st in before.items())
    new_m = [n for n in after if n not in before and n.startswith("m-")]
    entries = json.load(open(os.path.join(_manifest_dir(path), new_m[0])))
    assert len(entries) == 1
    big_manifest = os.path.getsize(
        os.path.join(_manifest_dir(path), new_m[0])
    )
    big_delta = snapjson_size() - sz0
    # new-manifest bytes independent of table size; the snapshot record
    # grows only by ~one 40-byte manifest ref vs the 22-file table
    assert big_manifest <= 2 * manifest_sizes[0]
    assert big_delta <= deltas[0] + 300
    assert len(live_files(path)) == 53
    assert read_table(spark, path).count() == 233


def test_legacy_inline_manifest_migrates(spark, tmp_path):
    """Tables whose snapshots embed an inline "files" list (the pre-r6
    layout) stay readable, and the next write migrates them to manifest
    lists without changing results."""
    import json
    import os

    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        _snap_files,
        upsert_rows,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(100), "val": range(100)})
    write_table(spark.createDataFrame(pdf).repartition(4), path)

    # rewrite snapshots.json into the legacy inline shape
    sfile = os.path.join(path, "_metadata", "snapshots.json")
    snaps = _load_snapshots(path)
    for s in snaps:
        s["files"] = _snap_files(path, s)
        s.pop("manifest_list", None)
    with open(sfile, "w") as fh:
        json.dump(snaps, fh)

    assert read_table(spark, path).count() == 100  # legacy read path

    # append migrates: new tip uses a manifest list, data intact
    write_table(
        spark.createDataFrame(pd.DataFrame({"doc_id": [500], "val": [1]})),
        path, mode="append",
    )
    tip = _load_snapshots(path)[-1]
    assert "manifest_list" in tip and "files" not in tip
    assert read_table(spark, path).count() == 101

    # subtractive op on a migrated table still targets correctly
    upsert_rows(
        spark, path,
        spark.createDataFrame(pd.DataFrame({"doc_id": [10], "val": [-1]})),
        ["doc_id"], strategy="cow",
    )
    got = read_table(spark, path).toPandas()
    assert len(got) == 101
    assert got.set_index("doc_id").loc[10, "val"] == -1


def test_concurrent_appends_converge_with_retry(spark, tmp_path):
    """Four writer threads race one-row appends, retrying on
    CommitConflictError (the Iceberg client loop). Every committed row
    survives, snapshot ids stay strictly increasing and unique, and
    the tip's manifest list resolves to exactly the union of files —
    the optimistic-CAS + manifest-list machinery under real
    contention."""
    import threading

    import pandas as pd

    from remediner_spark.sources.table import (
        CommitConflictError,
        _load_snapshots,
        live_files,
        read_table,
    )

    path = str(tmp_path / "tbl")
    write_table(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": range(50), "val": range(50)})
        ),
        path,
    )

    errors: list[Exception] = []

    def writer(tid: int) -> None:
        try:
            for k in range(5):
                doc = 1000 + tid * 10 + k
                df = spark.createDataFrame(
                    pd.DataFrame({"doc_id": [doc], "val": [tid]})
                )
                for _attempt in range(40):
                    try:
                        write_table(df, path, mode="append")
                        break
                    except CommitConflictError:
                        continue
                else:
                    raise RuntimeError(f"writer {tid} starved on {doc}")
        except Exception as exc:  # surface thread failures to pytest
            errors.append(exc)

    threads = [
        threading.Thread(target=writer, args=(t,)) for t in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    got = read_table(spark, path).toPandas()
    assert len(got) == 70
    want = set(range(50)) | {
        1000 + t * 10 + k for t in range(4) for k in range(5)
    }
    assert set(got["doc_id"]) == want  # nothing lost, nothing doubled
    snaps = _load_snapshots(path)
    ids = [s["snapshot_id"] for s in snaps]
    assert ids == list(range(1, 22))  # 1 initial + 20 appends, no gaps
    assert snaps[-1]["total_rows"] == 70
    assert sum(f["rows"] for f in live_files(path)) == 70


def test_table_manifests_metadata(spark, tmp_path):
    """.manifests metadata table: one row per manifest of the current
    snapshot, counts consistent with live_files."""
    import pandas as pd

    from remediner_spark.sources.table import live_files, table_manifests

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame(
        {"doc_id": range(60),
         "lang": ["en" if i % 2 else "de" for i in range(60)]}
    )
    write_table(
        spark.createDataFrame(pdf.iloc[:30]), path, partition_by=["lang"]
    )
    write_table(
        spark.createDataFrame(pdf.iloc[30:]), path, mode="append",
        partition_by=["lang"],
    )
    m = table_manifests(spark, path).toPandas()
    assert len(m) == 2  # one manifest per commit, carried by ref
    assert m["row_count"].sum() == 60
    assert m["file_count"].sum() == len(live_files(path))
    assert all(
        '"lang": "de"' in p or '"lang": "en"' in p
        for parts in m["partitions"] for p in parts
    )


def test_table_model_based_random_ops(spark, tmp_path):
    """Model-based interaction test: a seeded random sequence of
    append / upsert (cow+mor) / range-delete (cow+mor) / compaction /
    rename / widen / expiry / partition-spec evolution against a
    pandas reference model. After
    every step the live read equals the model, and surviving
    historical snapshots still time-travel to their recorded state —
    the pairwise tests above can't see cross-op interactions (e.g. a
    MoR delete folded by a compaction after a rename)."""
    import random

    import pandas as pd

    from remediner_spark.sources.table import (
        compact_table,
        delete_range,
        evolve_partition_spec,
        expire_snapshots,
        read_table,
        rename_column,
        table_snapshots,
        upsert_rows,
        widen_column,
    )

    rng = random.Random(20260817)
    path = str(tmp_path / "tbl")
    next_id = 0
    val_col = "val"
    val_ts = "int32"

    def make_rows(n):
        nonlocal next_id
        rows = pd.DataFrame(
            {
                "doc_id": pd.array(
                    range(next_id, next_id + n), dtype="int64"
                ),
                val_col: pd.array(
                    [rng.randrange(1000) for _ in range(n)], dtype=val_ts
                ),
                "lang": [rng.choice(["en", "de"]) for _ in range(n)],
            }
        )
        next_id += n
        return rows

    def norm(df):
        out = df.sort_values("doc_id").reset_index(drop=True)
        out = out[sorted(out.columns)]
        for c in out.columns:
            if c != "lang":
                out[c] = out[c].astype("int64")
        return out

    model = make_rows(40)
    cur_spec = ["lang"]
    write_table(spark.createDataFrame(model), path, partition_by=cur_spec)
    history = {1: model.copy()}

    def check_live():
        pd.testing.assert_frame_equal(
            norm(read_table(spark, path).toPandas()), norm(model)
        )

    for _step in range(20):
        op = rng.choice(
            ["append", "upsert", "delete", "compact", "rename",
             "widen", "expire", "evolve"]
        )
        if op == "append":
            batch = make_rows(rng.randrange(1, 8))
            write_table(
                spark.createDataFrame(batch), path, mode="append",
                partition_by=cur_spec,
            )
            model = pd.concat([model, batch], ignore_index=True)
        elif op == "upsert" and len(model):
            keys = rng.sample(
                sorted(model["doc_id"]), k=min(4, len(model))
            )
            ups = model[model["doc_id"].isin(keys)].copy()
            ups[val_col] = pd.array(
                [rng.randrange(1000) for _ in range(len(ups))],
                dtype=val_ts,
            )
            new = make_rows(rng.randrange(0, 3))
            ups = pd.concat([ups, new], ignore_index=True)
            upsert_rows(
                spark, path, spark.createDataFrame(ups), ["doc_id"],
                strategy=rng.choice(["cow", "mor", "auto"]),
            )
            model = pd.concat(
                [model[~model["doc_id"].isin(ups["doc_id"])], ups],
                ignore_index=True,
            )
        elif op == "delete" and len(model):
            lo = rng.randrange(900)
            hi = lo + rng.randrange(150)
            delete_range(
                spark, path, val_col, lo, hi,
                strategy=rng.choice(["cow", "mor"]),
            )
            model = model[
                ~model[val_col].astype("int64").between(lo, hi)
            ].reset_index(drop=True)
        elif op == "compact":
            compact_table(spark, path, min_files_per_partition=1)
        elif op == "rename":
            new_name = "score" if val_col == "val" else "val"
            rename_column(path, val_col, new_name)
            model = model.rename(columns={val_col: new_name})
            val_col = new_name
        elif op == "widen":
            widen_column(path, val_col, "long")
            val_ts = "int64"
            model[val_col] = model[val_col].astype("int64")
        elif op == "evolve":
            # toggle the spec: subsequent appends/compactions run
            # under the NEW spec while old files keep serving reads
            cur_spec = [] if cur_spec else ["lang"]
            evolve_partition_spec(path, cur_spec)
        elif op == "expire":
            expire_snapshots(path, keep_last=3)
            alive = {s["snapshot_id"] for s in table_snapshots(path)}
            for sid in list(history):
                if sid not in alive:
                    del history[sid]
        check_live()
        tip = table_snapshots(path)[-1]["snapshot_id"]
        history[tip] = model.copy()

    # surviving snapshots still time-travel to their recorded state
    alive = [s["snapshot_id"] for s in table_snapshots(path)]
    checked = 0
    for sid in alive:
        if sid in history:
            pd.testing.assert_frame_equal(
                norm(read_table(spark, path, snapshot_id=sid).toPandas()),
                norm(history[sid]),
            )
            checked += 1
    assert checked >= 2


def test_snapshot_tags_pin_retention(spark, tmp_path):
    """Iceberg refs/tags: a tagged snapshot survives expire_snapshots
    past keep_last and stays readable via read_table(tag=...); dropping
    the tag releases it to the next expiry; tags resolve and re-point."""
    import pandas as pd

    from remediner_spark.sources.table import (
        drop_tag,
        expire_snapshots,
        read_table,
        table_snapshots,
        table_tags,
        tag_snapshot,
    )

    path = str(tmp_path / "tbl")
    for k in range(5):  # snapshots 1..5, 10 rows each
        write_table(
            spark.createDataFrame(
                pd.DataFrame(
                    {"doc_id": range(k * 10, k * 10 + 10), "val": [k] * 10}
                )
            ),
            path, mode="append",
        )
    assert tag_snapshot(path, "audited", snapshot_id=2) == 2
    assert tag_snapshot(path, "latest") == 5  # defaults to tip
    assert table_tags(path) == {"audited": 2, "latest": 5}

    res = expire_snapshots(path, keep_last=2)
    alive = [s["snapshot_id"] for s in table_snapshots(path)]
    assert alive == [2, 4, 5]  # tagged 2 pinned; 1 and 3 expired
    assert res["removed_snapshots"] == 2
    assert read_table(spark, path, tag="audited").count() == 20
    assert read_table(spark, path, tag="latest").count() == 50
    assert read_table(spark, path).count() == 50

    # re-point a tag, release the old pin, expire again
    tag_snapshot(path, "audited", snapshot_id=4)
    drop_tag(path, "latest")
    expire_snapshots(path, keep_last=1)
    alive = [s["snapshot_id"] for s in table_snapshots(path)]
    assert alive == [4, 5]
    assert read_table(spark, path, tag="audited").count() == 40

    import pytest

    with pytest.raises(ValueError, match="no tag"):
        read_table(spark, path, tag="gone")
    with pytest.raises(ValueError, match="no snapshot 99"):
        tag_snapshot(path, "x", snapshot_id=99)
    with pytest.raises(ValueError, match="not both"):
        read_table(spark, path, snapshot_id=4, tag="audited")


def test_compaction_folds_emptied_partition_no_loop(spark, tmp_path):
    """Delete EVERY row of one partition via pending MoR predicate
    deletes, then compact twice: the first pass folds the deletes and
    drops the emptied partition's files from the manifest; the second
    pass is a NO-OP (same snapshot) — the r5 ADVICE no-progress loop
    (emptied partitions re-qualifying for compaction forever) stays
    dead after the a3fc09f fix."""
    import pandas as pd

    from remediner_spark.sources.table import (
        _load_snapshots,
        compact_table,
        delete_range,
    )

    path = str(tmp_path / "tbl")
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(200)),
            "lang": ["de" if i < 100 else "en" for i in range(200)],
            "val": [i if i < 100 else 1000 + i for i in range(200)],
        }
    )
    write_table(spark.createDataFrame(pdf), path, partition_by=["lang"])
    # two MoR cuts that TOGETHER cover every de row ([0,99]); each one
    # only OVERLAPS the de file's val stats, so neither can take the
    # metadata-only full-drop path — both must land as pending
    # predicate-delete entries
    delete_range(spark, path, "val", 0, 50, strategy="mor")
    s2 = delete_range(spark, path, "val", 51, 99, strategy="mor")
    assert s2.get("delete_files"), "setup must leave pending MoR deletes"
    got = read_table(spark, path).toPandas()
    assert set(got["lang"]) == {"en"} and len(got) == 100

    snap = compact_table(spark, path)
    assert not snap.get("delete_files")  # deletes folded
    # the emptied partition's files left the manifest entirely
    assert all(
        f["partition"].get("lang") != "de" for f in _snap_files(path, snap)
    )
    got = read_table(spark, path).toPandas()
    assert set(got["lang"]) == {"en"} and len(got) == 100

    again = compact_table(spark, path)
    assert again["snapshot_id"] == snap["snapshot_id"]
    assert _load_snapshots(path)[-1]["snapshot_id"] == snap["snapshot_id"]


class TestPartitionEvolution:
    """evolve_partition_spec: metadata-only spec change; mixed-spec
    reads, pruning exactness, compaction safety, full migration."""

    def _counts(self, spark, path, **kw):
        from remediner_spark.sources.table import read_table

        return read_table(spark, path, **kw)

    def test_unpartitioned_to_partitioned(self, spark, tmp_path, pages_pdf):
        from remediner_spark.sources.table import (
            evolve_partition_spec, read_table, table_snapshots, write_table,
        )

        path = str(tmp_path / "tbl")
        write_table(spark.createDataFrame(pages_pdf.iloc[:60]), path)
        s = evolve_partition_spec(path, ["lang"])
        assert s["mode"] == "evolve-partition-spec"
        write_table(
            spark.createDataFrame(pages_pdf.iloc[60:]), path,
            mode="append", partition_by=["lang"],
        )
        # full read: both file generations, lang correct everywhere
        got = read_table(spark, path).toPandas()
        assert len(got) == 120
        expect = pages_pdf.sort_values("url").reset_index(drop=True)
        got = got.sort_values("url").reset_index(drop=True)
        assert list(got["lang"]) == list(expect["lang"])
        assert list(got["text"]) == list(expect["text"])
        # partition filter stays EXACT: old-spec files can't be pruned
        # but the row-level backstop filters them
        en = read_table(spark, path, partition_filter={"lang": "en"})
        assert en.count() == int((pages_pdf["lang"] == "en").sum())
        assert set(r["lang"] for r in en.select("lang").distinct().collect()) == {"en"}
        # time travel to the pre-evolution snapshot still works
        assert read_table(spark, path, snapshot_id=1).count() == 60
        assert [x["mode"] for x in table_snapshots(path)] == [
            "append", "evolve-partition-spec", "append",
        ]

    def test_partitioned_to_unpartitioned(self, spark, tmp_path, pages_pdf):
        from remediner_spark.sources.table import (
            evolve_partition_spec, read_table, write_table,
        )

        path = str(tmp_path / "tbl")
        write_table(
            spark.createDataFrame(pages_pdf.iloc[:60]), path,
            partition_by=["lang"],
        )
        evolve_partition_spec(path, [])
        write_table(spark.createDataFrame(pages_pdf.iloc[60:]), path,
                    mode="append")
        got = read_table(spark, path).toPandas()
        assert len(got) == 120
        # lang for OLD files comes from their manifest partition values
        expect = pages_pdf.sort_values("url").reset_index(drop=True)
        got = got.sort_values("url").reset_index(drop=True)
        assert list(got["lang"]) == list(expect["lang"])
        # a partition filter on the no-longer-partitioned column still
        # returns exactly the matching rows (old files prune, new ones
        # row-filter)
        de = read_table(spark, path, partition_filter={"lang": "de"})
        assert de.count() == int((pages_pdf["lang"] == "de").sum())

    def test_validation(self, spark, tmp_path, pages_pdf):
        from remediner_spark.sources.table import (
            evolve_partition_spec, write_table,
        )

        path = str(tmp_path / "tbl")
        write_table(spark.createDataFrame(pages_pdf.iloc[:20]), path)
        with pytest.raises(ValueError, match="not in schema"):
            evolve_partition_spec(path, ["nope"])
        with pytest.raises(ValueError, match="duplicate"):
            evolve_partition_spec(path, ["lang", "lang"])
        # appending under the OLD spec after evolution is refused with
        # guidance
        evolve_partition_spec(path, ["lang"])
        with pytest.raises(ValueError, match="evolve_partition_spec"):
            write_table(spark.createDataFrame(pages_pdf.iloc[20:40]),
                        path, mode="append")

    def test_compaction_skips_other_spec_files(self, spark, tmp_path,
                                               pages_pdf):
        from remediner_spark.sources.table import (
            _snap_files, compact_table, evolve_partition_spec, read_table,
            table_snapshots, write_table,
        )

        path = str(tmp_path / "tbl")
        write_table(spark.createDataFrame(pages_pdf.iloc[:40]), path,
                    partition_by=["lang"])
        evolve_partition_spec(path, [])
        # several small unpartitioned commits -> crowded current spec..
        # but current spec is unpartitioned: compact reads EVERYTHING
        # (full overwrite) which IS the safe migration — data equality
        for lo in (40, 60, 80, 100):
            write_table(
                spark.createDataFrame(pages_pdf.iloc[lo:lo + 20]), path,
                mode="append",
            )
        before = read_table(spark, path).toPandas().sort_values(
            "url").reset_index(drop=True)
        compact_table(spark, path, min_files_per_partition=2)
        after = read_table(spark, path).toPandas().sort_values(
            "url").reset_index(drop=True)
        assert list(before["url"]) == list(after["url"])
        assert list(before["lang"]) == list(after["lang"])

    def test_compaction_partitioned_current_spec_guard(
        self, spark, tmp_path, pages_pdf
    ):
        from remediner_spark.sources.table import (
            _snap_files, compact_table, evolve_partition_spec, read_table,
            table_snapshots, write_table,
        )

        path = str(tmp_path / "tbl")
        # old spec: unpartitioned; new spec: lang
        write_table(spark.createDataFrame(pages_pdf.iloc[:40]), path)
        evolve_partition_spec(path, ["lang"])
        for lo in (40, 55, 70, 85, 100):
            write_table(
                spark.createDataFrame(pages_pdf.iloc[lo:lo + 15]), path,
                mode="append", partition_by=["lang"],
            )
        before = read_table(spark, path).toPandas().sort_values(
            "url").reset_index(drop=True)
        snap = compact_table(spark, path, min_files_per_partition=1)
        after = read_table(spark, path).toPandas().sort_values(
            "url").reset_index(drop=True)
        # no data loss: the legacy unpartitioned files survived the
        # partitioned compaction untouched
        assert list(before["url"]) == list(after["url"])
        legacy = [
            f for f in _snap_files(path, snap)
            if set(f["partition"].keys()) != {"lang"}
        ]
        assert legacy, "legacy-spec files should still be present"

    def test_rewrite_to_spec_migrates(self, spark, tmp_path, pages_pdf):
        from remediner_spark.sources.table import (
            _snap_files, evolve_partition_spec, read_table,
            rewrite_to_spec, table_snapshots, write_table,
        )

        path = str(tmp_path / "tbl")
        write_table(spark.createDataFrame(pages_pdf.iloc[:60]), path)
        evolve_partition_spec(path, ["lang"])
        write_table(spark.createDataFrame(pages_pdf.iloc[60:]), path,
                    mode="append", partition_by=["lang"])
        before = read_table(spark, path).toPandas().sort_values(
            "url").reset_index(drop=True)
        snap = rewrite_to_spec(spark, path)
        # every live file now carries the current spec
        assert all(
            set(f["partition"].keys()) == {"lang"}
            for f in _snap_files(path, snap)
        )
        after = read_table(spark, path).toPandas().sort_values(
            "url").reset_index(drop=True)
        assert list(before["url"]) == list(after["url"])
        assert list(before["lang"]) == list(after["lang"])
        # idempotent: second call is a no-op returning the same snapshot
        assert rewrite_to_spec(spark, path)["snapshot_id"] == snap[
            "snapshot_id"]
        # pre-migration snapshots still time travel
        assert read_table(spark, path, snapshot_id=1).count() == 60

    def test_mor_delete_survives_evolution(self, spark, tmp_path, pages_pdf):
        from remediner_spark.sources.table import (
            delete_range, evolve_partition_spec, read_table, write_table,
        )

        path = str(tmp_path / "tbl")
        write_table(spark.createDataFrame(pages_pdf.iloc[:60]), path,
                    partition_by=["lang"])
        # MoR predicate delete targeting the old-spec files
        urls = sorted(pages_pdf.iloc[:60]["url"])
        delete_range(spark, path, "url", lo=urls[0], hi=urls[9],
                     strategy="mor")
        evolve_partition_spec(path, [])
        write_table(spark.createDataFrame(pages_pdf.iloc[60:]), path,
                    mode="append")
        got = read_table(spark, path)
        assert got.count() == 120 - 10
        # the deleted urls stay deleted across the spec change
        assert got.filter(got["url"] <= urls[9]).count() == 0

    def test_ddl_guard_covers_legacy_spec_columns(self, spark, tmp_path,
                                                  pages_pdf):
        from remediner_spark.sources.table import (
            evolve_partition_spec, rename_column, write_table,
        )

        path = str(tmp_path / "tbl")
        write_table(spark.createDataFrame(pages_pdf.iloc[:30]), path,
                    partition_by=["lang"])
        evolve_partition_spec(path, [])
        # lang is no longer in the CURRENT spec, but live files still
        # source it from their directory-layout manifest values
        with pytest.raises(ValueError, match="partition column"):
            rename_column(path, "lang", "language")


class TestZOrder:
    def test_two_dim_pruning_beats_one_dim(self, spark, tmp_path):
        """Z-order by (a, b) gives every file a tight 2-D box: stats
        pruning fires for range predicates on EITHER column, where the
        1-D a-sorted layout prunes only on a."""
        import numpy as np
        import pandas as pd

        from remediner_spark.sources.table import (
            read_table, stats_pruned_count, write_table, zorder_frame,
        )

        rng = np.random.RandomState(7)
        pdf = pd.DataFrame({
            "a": np.arange(4000, dtype="int64"),
            "b": rng.permutation(4000).astype("int64"),  # uncorrelated
            "v": rng.randint(0, 100, 4000).astype("int64"),
        })
        df = spark.createDataFrame(pdf)

        z_path = str(tmp_path / "ztbl")
        write_table(zorder_frame(df, ["a", "b"], n_files=16), z_path)
        s_path = str(tmp_path / "stbl")
        write_table(df.repartition(16), s_path, sort_by=["a"])

        filt = {"b": (0, 249)}  # 1/16 of the b domain
        z_sel, z_tot = stats_pruned_count(z_path, filt)
        s_sel, s_tot = stats_pruned_count(s_path, filt)
        # the 1-D a-sort spreads b across EVERY file (no pruning);
        # z-order scans a strictly smaller fraction on b
        assert s_sel == s_tot
        assert z_sel / z_tot < s_sel / s_tot, (z_sel, z_tot, s_sel, s_tot)
        # the trade: 1-D is tighter on its own column, but z-order
        # still prunes meaningfully on a too
        a_sel, a_tot = stats_pruned_count(z_path, {"a": (0, 249)})
        assert a_sel < a_tot
        # pruning is transparent: result equals full scan + filter
        got = sorted(
            r["a"] for r in read_table(
                spark, z_path, stats_filter=filt).collect()
        )
        expect = sorted(pdf[pdf["b"] <= 249]["a"].tolist())
        assert got == expect

    def test_validation_and_degenerate_span(self, spark):
        import pandas as pd

        from remediner_spark.sources.table import zorder_frame

        df = spark.createDataFrame(
            pd.DataFrame({"a": [1, 1, 1], "b": [3, 1, 2]})
        )
        with pytest.raises(ValueError):
            zorder_frame(df, [], 4)
        # constant column (span 0): no crash, rows preserved
        out = zorder_frame(df, ["a", "b"], 2)
        assert sorted(r["b"] for r in out.collect()) == [1, 2, 3]

    def test_many_column_bits_autoshrink(self, spark):
        """bits * k > 63 must not reach the sign bit or alias mod 64
        (r7 ADVICE): 5 columns at default bits=16 would put positions
        at 64+; the auto-shrunk key must order identically to an
        explicitly-safe bits value."""
        import pandas as pd

        from remediner_spark.sources.table import zorder_frame

        pdf = pd.DataFrame(
            {c: [(i * (j + 3)) % 17 for i in range(40)]
             for j, c in enumerate("abcde")}
        )
        df = spark.createDataFrame(pdf)
        cols = list("abcde")
        auto = zorder_frame(df, cols, n_files=1).collect()
        explicit = zorder_frame(df, cols, n_files=1, bits=12).collect()
        assert [tuple(r) for r in auto] == [tuple(r) for r in explicit]


class TestBoolPartitionFilter:
    def test_bool_filter_matches_hive_convention(self, spark, tmp_path):
        """partition_filter={'flag': True} on a bool-partitioned table
        (Hive dirs flag=true/flag=false) must return the true rows —
        str(True)='True' previously matched nothing in both the
        manifest layer and the row backstop (r7 ADVICE)."""
        import pandas as pd

        from remediner_spark.sources.table import read_table, write_table

        path = str(tmp_path / "boolpart")
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(10),
                          "flag": [i % 2 == 0 for i in range(10)]})
        )
        write_table(df, path, partition_by=["flag"])
        got = read_table(spark, path, partition_filter={"flag": True})
        ids = sorted(r["doc_id"] for r in got.collect())
        assert ids == [0, 2, 4, 6, 8]
        got_f = read_table(
            spark, path, partition_filter={"flag": [False]}
        )
        assert sorted(r["doc_id"] for r in got_f.collect()) == [1, 3, 5, 7, 9]


class TestMigrateLegacyFiles:
    """migrate_legacy_files: the incremental spec migration — rewrites
    ONLY other-spec files, carries current-spec files by reference,
    folds MoR deletes on the migrated tail."""

    def test_migrates_only_legacy_tail(self, spark, tmp_path, pages_pdf):
        from remediner_spark.sources.table import (
            evolve_partition_spec, live_files, migrate_legacy_files,
            read_table, write_table,
        )

        path = str(tmp_path / "tbl")
        write_table(spark.createDataFrame(pages_pdf.iloc[:60]), path)
        evolve_partition_spec(path, ["lang"])
        write_table(
            spark.createDataFrame(pages_pdf.iloc[60:]), path,
            mode="append", partition_by=["lang"],
        )
        before = {
            f["path"]: set(f["partition"])
            for f in live_files(path)
        }
        kept = {p for p, spec in before.items() if spec == {"lang"}}
        s = migrate_legacy_files(spark, path)
        assert s["mode"] == "migrate-spec"
        assert s["properties"]["migrated_files"] == len(before) - len(kept)
        after = {f["path"]: set(f["partition"]) for f in live_files(path)}
        # every file now carries the current spec; the current-spec
        # files were carried BY PATH, not rewritten
        assert all(spec == {"lang"} for spec in after.values())
        assert kept <= set(after)
        # data unchanged, partition filter exact, and idempotent
        got = read_table(spark, path).toPandas()
        expect = pages_pdf.sort_values("url").reset_index(drop=True)
        got = got.sort_values("url").reset_index(drop=True)
        assert list(got["lang"]) == list(expect["lang"])
        assert list(got["text"]) == list(expect["text"])
        en = read_table(spark, path, partition_filter={"lang": "en"})
        assert en.count() == int((pages_pdf["lang"] == "en").sum())
        assert migrate_legacy_files(spark, path)["snapshot_id"] == \
            s["snapshot_id"]  # single-spec now: no-op

    def test_folds_mor_deletes_on_legacy_files(
        self, spark, tmp_path, pages_pdf
    ):
        from pyspark.sql import functions as F

        from remediner_spark.sources.table import (
            evolve_partition_spec, migrate_legacy_files, read_table,
            table_snapshots, upsert_rows, write_table,
        )

        path = str(tmp_path / "tbl")
        write_table(spark.createDataFrame(pages_pdf.iloc[:60]), path)
        # MoR upsert against the (legacy, unpartitioned) files
        upd = spark.createDataFrame(pages_pdf.iloc[:3]).withColumn(
            "text", F.lit("UPDATED")
        )
        upsert_rows(spark, path, upd, ["url"], strategy="mor")
        evolve_partition_spec(path, ["lang"])
        s = migrate_legacy_files(spark, path)
        # the eq-delete targeted only legacy files -> folded away
        assert (table_snapshots(path)[-1].get("delete_files") or []) == []
        got = read_table(spark, path).toPandas()
        assert len(got) == 60
        assert (got["text"] == "UPDATED").sum() == 3
        # the MoR update file predates the evolution, so it is ALSO
        # legacy-spec and migrates along with the base files
        assert s["properties"]["migrated_files"] >= 2
        assert s["properties"]["carried_files"] == 0
