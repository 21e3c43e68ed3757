"""J8 phash near-dup join: the banding must find exactly the pairs an
exact all-pairs hamming scan finds (pigeonhole recall proof holds when
n_bands > max_hamming)."""

from __future__ import annotations

from itertools import combinations

from topicalcrawler_spark.operators.images import phash_near_dup_pairs
from topicalcrawler_spark.schemas import CORPUS
from topicalcrawler_spark.sources import fixtures as fx


def test_phash_banding_equals_bruteforce(spark):
    rows = fx.make_corpus(n=300, near_dup_rate=0.05)
    corpus = spark.createDataFrame(rows, CORPUS)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(corpus, max_hamming=8).collect()
    }
    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")
    expect = {
        (a["image_id"], b["image_id"]): ham(a["phash"], b["phash"])
        for a, b in combinations(rows, 2)
        if ham(a["phash"], b["phash"]) <= 8
    }
    assert got == expect
    assert len(expect) > 0  # the fixture's planted near-dups exist
