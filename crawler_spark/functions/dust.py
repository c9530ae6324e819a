"""DUST mining: detect URL query params that don't change content.

"Different URLs with Similar Text" (Bar-Yossef, Keidar, Schonfeld,
WWW'07): a crawler that has fetched (url, content-fingerprint) pairs can
*learn* URL rewrite rules — here the param-irrelevance subset: a query
parameter ``p`` is irrelevant on host ``h`` when URLs that differ only in
``p`` (different values, or present vs absent) always carry the same
content fingerprint. Stripping learned-irrelevant params before the
URL-seen check collapses alias families (session ids, tracking params,
cache busters) into one frontier entry — at 10¹⁰-URL scale the cheapest
dedup is the fetch you never schedule.

The reference hand-avoids this per connector (each museum config
enumerates exact search URLs, base.js seed configs); a generalized
frontier must learn it. Shape at scale: one explode (≤ params-per-URL
rows each), one aggregation keyed (host, param, rest-of-url) — the
natural shuffle key, hot hosts split across params — then a tiny
(host, param) rollup. The absence side joins URLs to a per-host param
vocabulary capped at ``max_params_per_host`` (frequency-ranked), so the
fan-out is bounded ×K even on parameter-explosion hosts. Pure JVM column
expressions end to end; rules apply via :func:`dust_canonicalize` as a
broadcast join on host.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.urlfilter import url_host, url_path, url_query

_PNAME = r"^([^=]*)"


def _param_names(params: Column) -> Column:
    return F.transform(params, lambda x: F.regexp_extract(x, _PNAME, 1))


def dust_param_rules(
    df: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
    *,
    min_support: int = 2,
    min_precision: float = 1.0,
    max_params_per_host: int = 16,
) -> DataFrame:
    """Mine per-(host, param) irrelevance rules from (url, fingerprint).

    Evidence group = URLs identical once ``param`` is removed (path +
    the remaining params, order-normalized). A group *supports* the rule
    when it holds ≥2 distinct URLs; it *violates* when those URLs carry
    >1 distinct fingerprint. Returns one row per (host, param) with
    support ≥ ``min_support`` evidence groups:

    ``(host, param, support, violations, is_irrelevant)`` where
    ``is_irrelevant ⇔ violations ≤ (1 - min_precision) · support``.
    """
    u = F.col(url_col)
    base = df.select(
        u.alias("url"),
        F.col(fp_col).alias("fp"),
        url_host(u).alias("host"),
        url_path(u).alias("path"),
        F.array_remove(F.split(url_query(u), "&"), "").alias("params"),
    )

    # per-host param vocabulary, frequency-capped: bounds the absence-side
    # fan-out at ×K even on faceted-search hosts with 100s of param names
    occ = base.select(
        "host", F.explode(_param_names(F.col("params"))).alias("pname")
    )
    vocab = (
        occ.groupBy("host", "pname")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("host").orderBy(F.desc("n"), F.asc("pname"))
            ),
        )
        .where(F.col("rk") <= max_params_per_host)
        .select("host", "pname")
    )

    def rest_key(params: Column) -> Column:
        return F.concat(
            F.col("path"), F.lit("?"), F.array_join(F.array_sort(params), "&")
        )

    # "with" evidence: each URL × each of its own params, keyed by the URL
    # with that occurrence removed
    withr = base.select(
        "host",
        "path",
        "fp",
        "url",
        "params",
        F.explode("params").alias("param"),
    ).select(
        "host",
        F.regexp_extract(F.col("param"), _PNAME, 1).alias("pname"),
        "fp",
        "url",
        rest_key(F.array_remove(F.col("params"), F.col("param"))).alias("rest"),
    )
    # "absence" evidence: the URL itself, for every vocab param it lacks —
    # lands in the same group as URLs that carry that param
    absent = (
        base.join(vocab, "host")
        .where(~F.array_contains(_param_names(F.col("params")), F.col("pname")))
        .select(
            "host", "pname", "fp", "url", rest_key(F.col("params")).alias("rest")
        )
    )

    groups = (
        withr.unionByName(absent)
        .groupBy("host", "pname", "rest")
        .agg(
            F.countDistinct("url").alias("nu"),
            F.countDistinct("fp").alias("nf"),
        )
        .where(F.col("nu") >= 2)
    )
    slack = 1.0 - min_precision
    return (
        groups.groupBy("host", F.col("pname").alias("param"))
        .agg(
            F.count("*").alias("support"),
            F.sum(F.when(F.col("nf") > 1, 1).otherwise(0)).alias("violations"),
        )
        .where(F.col("support") >= min_support)
        .withColumn(
            "is_irrelevant",
            F.col("violations") <= F.lit(slack) * F.col("support"),
        )
    )


def dust_canonicalize(
    df: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Strip learned-irrelevant params (broadcast join on host; rules are
    (host, param) grain — tiny by construction). Remaining params keep
    their original order; a URL whose whole query dies loses the ``?``.
    Adds/overwrites ``url_dust`` next to the input columns."""
    u = F.col(url_col)
    bad = (
        rules.where("is_irrelevant")
        .groupBy("host")
        .agg(F.collect_set("param").alias("bad_params"))
    )
    out = df.withColumn("__host", url_host(u)).join(
        F.broadcast(bad.withColumnRenamed("host", "__host")),
        "__host",
        "left",
    )
    params = F.array_remove(F.split(url_query(u), "&"), "")
    kept = F.filter(
        params,
        lambda x: ~F.array_contains(
            F.coalesce(F.col("bad_params"), F.array().cast("array<string>")),
            F.regexp_extract(x, _PNAME, 1),
        ),
    )
    prefix = F.regexp_extract(u, r"^([^?#]*)", 1)
    fragment = F.regexp_extract(u, r"(#.*)$", 1)
    rebuilt = F.concat(
        prefix,
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&")))
        .otherwise(F.lit("")),
        fragment,
    )
    return out.withColumn("url_dust", rebuilt).drop("__host", "bad_params")
