"""crawler_spark — a from-scratch PySpark-native URL-frontier & fetch-scheduler
engine with the crawl semantics of silknow/crawler (reference at
/root/reference, studied in SURVEY.md), re-expressed as batch-iterative
DataFrame rounds over parquet/Iceberg tables of Common-Crawl-style pages.

Subpackages
-----------
functions   column-level building blocks (URL canonicalization, text stats,
            dedup families, similarity search) — all JVM expressions or
            Arrow-vectorized pandas UDFs, never row-at-a-time Python.
operators   crawl dataflow operators (frontier pop, URL-seen dedup, fetch,
            extraction, politeness, OPIC priority).
plans       the round loop (BFS/priority crawl) + checkpoint/resume.
sources     synthetic deterministic site corpus + auxiliary readers.
oracle      pure-Python replay of the reference's sequential crawl semantics
            (crawl-order / URL-seen / extracted-text parity gate).
"""

__version__ = "0.1.0"
