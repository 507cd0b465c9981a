"""Prefix-filtered set-similarity join: lossless vs brute force, and the
filter actually prunes the candidate space."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventsourcing_spark.io import load_table
from eventsourcing_spark.pipeline.setjoin import (
    JACCARD_PERMILLE,
    setjoin_prefix_jaccard,
)


def _shingles(docs):
    words = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    return words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> concat(t[i], '_', t[i + 1]))"
            )
        ).alias("tok"),
    ).distinct()


def test_matches_bruteforce_exactly(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = _shingles(docs)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    brute = (
        toks.alias("a")
        .join(toks.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
        .join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sz", "sz_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "sz", "sz_b"
            ),
            "doc_b",
        )
        .filter(
            F.lit(1000) * F.col("inter")
            >= JACCARD_PERMILLE
            * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
    )
    want = {(r.doc_a, r.doc_b) for r in brute.collect()}
    got = {(r.doc_a, r.doc_b) for r in setjoin_prefix_jaccard(spark, sf_dir).collect()}
    assert got == want  # prefix filtering loses nothing, adds nothing


def test_jaccard_values_meet_threshold(spark, sf_dir):
    for r in setjoin_prefix_jaccard(spark, sf_dir).collect():
        assert r.jaccard_permille >= JACCARD_PERMILLE
        assert r.doc_a < r.doc_b
        assert 0 < r.inter <= r.un


def test_fastss_long_and_duplicate_names_match_oracle(spark, tmp_path):
    """The two structural desync risks the TPC-H corpus never exercises:
    names past the 64-position cap (both engines must miss the same
    far-edit pairs) and duplicate name strings (pair grain is the
    CUSTKEY pair in both engines, not the name pair)."""
    import duckdb

    from eventsourcing_spark.registry import ORACLE_SQL, SPARK_QUERIES

    long_a = "x" * 70
    long_b = "x" * 69 + "y"        # edit at position 70 — past the cap
    long_c = "z" + "x" * 69        # edit at position 1 — inside the cap
    rows = [
        (1, "Customer#001"),
        (2, "Customer#002"),       # dist 1 from #001
        (3, "Customer#001"),       # duplicate of #001 → id-pair grain
        (4, long_a),
        (5, long_b),               # dist 1 from long_a but past the cap
        (6, long_c),               # dist 1 from long_a inside the cap
        (7, "unrelated name"),
    ]
    spark.createDataFrame(rows, "c_custkey long, c_name string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    got = sorted(
        (r.name_a, r.name_b, r.n_pairs_total)
        for r in SPARK_QUERIES["fastss_editdist1_pairs"](
            spark, str(tmp_path)
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW customer AS SELECT * FROM read_parquet("
        f"'{tmp_path}/customer.parquet/*.parquet')"
    )
    want = sorted(
        (a, b, int(n))
        for a, b, n in con.sql(
            ORACLE_SQL["fastss_editdist1_pairs"]
        ).fetchall()
    )
    assert got == want
    names = {(a, b) for a, b, _ in got}
    # Duplicate-name pairs: (#001,#001) dist 0, plus (#001,#002) twice
    # (once per duplicate id) — the id-pair grain keeps both rows.
    assert ("Customer#001", "Customer#001") in names
    assert sum(1 for a, b in ((a, b) for a, b, _ in got)
               if {a, b} == {"Customer#001", "Customer#002"}) == 2
    # The cap is shared: the far-edit pair is missed by BOTH engines,
    # the near-edit pair found by both.
    assert (long_a, long_b) not in names
    assert (long_c, long_a) in names or (long_a, long_c) in names
