"""Pure deterministic core shared by the Spark engine and the oracle.

Everything in this package is plain Python + numpy + stdlib (no Spark
imports) so the single-process executable-spec oracle
(``tests/oracle_crawler.py``) and the distributed engine call the SAME
functions for every environment-model computation: URL canonicalization,
the synthetic web, the relevance model, image codecs, perceptual hashing.
Scheduler logic (ordering, budgets, dedup) is implemented independently
on both sides — that is exactly what the trace-equality test checks.
"""
