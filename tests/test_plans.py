"""Physical-plan regressions — the shapes that matter at 100 TB must not
silently degrade (SURVEY.md §4):

* fixture fetch: the huge pages side is scanned once and SEMI-filtered by a
  broadcast of the bounded batch — never built into a join hash table;
* parquet scans get predicate pushdown + column pruning.
"""

from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fetch_join_broadcasts_batch_not_pages(spark, tmp_path):
    from crawler_spark.operators.fetch import fixture_fetch

    pages = spark.range(10_000).select(
        F.concat(F.lit("http://h/"), F.col("id").cast("string")).alias("url"),
        F.encode(F.lit("<html>x</html>"), "utf-8").alias("html"),
        F.current_timestamp().alias("warc_ts"),
    )
    batch = spark.range(100).select(
        F.concat(F.lit("http://h/"), F.col("id").cast("string")).alias("url"),
        F.lit(0).alias("attempts"),
    )
    plan = _executed_plan(fixture_fetch(batch, pages))
    # pages side passes through a LeftSemi whose BUILD side is the batch
    assert "LeftSemi" in plan
    assert "BuildRight" in plan
    # and the only outer join builds the (bounded) semi-filtered result
    assert plan.count("SortMergeJoin") == 0


def test_parquet_pushdown_and_pruning(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(1000).select(
        "id",
        (F.col("id") % 7).alias("k"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    ).write.parquet(p)
    df = spark.read.parquet(p).where(F.col("k") == 3).select("id")
    plan = _executed_plan(df)
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in plan
    # column pruning: v is not read
    assert "ReadSchema: struct<id:bigint,k:bigint>" in plan
