"""topicalcrawler_spark — a PySpark-native topical-crawl analytics engine.

Brand-new implementation (NOT a port) of the query / data-processing
capabilities described by the reference spec (``BASELINE.json`` — the
reference checkout at /root/reference was empty at survey time; see
SURVEY.md §0 for the verification log).  Everything here is built from
public knowledge: the Apache Spark / PySpark API, the focused-crawling
literature, and standard data-engineering practice.

Layout
------
core/       pure deterministic Python+numpy shared by the Spark engine
            and the single-process oracle (tests/oracle_crawler.py):
            URL canonicalization, synthetic web, relevance model,
            image codecs + phash, bloom bitmaps.
icelite/    minimal snapshot/manifest table layer over parquet
            (Iceberg stand-in — no Iceberg jar in-sandbox, SURVEY.md §1.2).
sources/    scans, seed lists, fixture generators, streaming sources.
functions/  vectorized pandas/Arrow UDF wrappers over core.
operators/  dedup, politeness scheduling, robots, fetch, images,
            similarity search, text analysis.
plans/      the crawl-round driver loop, resume, lineage.
streaming/  Structured Streaming demos (ST1-ST8).
"""

__version__ = "0.1.0"
