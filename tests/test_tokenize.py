"""BPE tokenizer: train / encode / count (Sennrich et al. 2016)."""

from __future__ import annotations

import pyjanitor_spark as pj
from pyjanitor_spark.operators.tokenize import EOW, _encode_word, _train_merges

# hand-derived fixture: rank-ordered merge table and its encodings
MERGES = [
    ("l", "o"), ("lo", "w"), ("lo", "w</w>"),
    ("e", "r</w>"), ("e", "s"), ("es", "t</w>"),
]
EXPECT = {
    "low": ["low</w>"],
    "lower": ["low", "er</w>"],
    "lowest": ["low", "est</w>"],
    "widest": ["w", "i", "d", "est</w>"],
    "unseen": ["u", "n", "s", "e", "e", "n</w>"],
}


def test_encode_word_hand_derived():
    ranks = {p: i for i, p in enumerate(MERGES)}
    for w, want in EXPECT.items():
        assert _encode_word(w, ranks, {}) == want, w


def test_train_is_deterministic_and_useful():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m1 = _train_merges(wc, 10, min_frequency=2)
    m2 = _train_merges(list(reversed(wc)), 10, min_frequency=2)
    assert m1 == m2  # input order must not matter
    # highest-mass pair first: (e,s) appears in newest+widest = 9
    assert m1[0] == ("e", "s")
    ranks = {p: i for i, p in enumerate(m1)}
    assert _encode_word("newest", ranks, {}) == ["newest</w>"]


def test_min_frequency_stops_merging():
    wc = [("ab", 1), ("cd", 1)]
    assert _train_merges(wc, 10, min_frequency=2) == []


def test_spark_train_encode_roundtrip(spark, documents):
    merges = pj.bpe_train(documents, "text", n_merges=50)
    assert merges.columns == ["rank", "left", "right"]
    n = merges.count()
    assert 0 < n <= 50
    enc = pj.bpe_encode(documents.limit(20), "text", merges)
    from pyspark.sql import functions as F

    # lossless: concatenating tokens and stripping EOW restores the
    # whitespace-normalized text
    back = enc.select(
        "text",
        F.array_join(
            F.transform(
                "bpe_tokens", lambda t: F.replace(t, F.lit(EOW), F.lit(" "))
            ),
            "",
        ).alias("rt"),
    ).collect()
    for r in back:
        assert r["rt"].rstrip() == " ".join(r["text"].split()), r["text"][:50]


def test_spark_encode_nulls_and_empties(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "id int, text string"
    )
    rows = {r["id"]: r["bpe_tokens"]
            for r in pj.bpe_encode(df, "text", MERGES).collect()}
    assert rows[1] is None
    assert rows[2] == [] and rows[3] == []


def test_token_count(spark):
    df = spark.createDataFrame([(1, "low lowest")], "id int, text string")
    r = pj.bpe_token_count(df, "text", MERGES).first()
    assert r["n_bpe_tokens"] == 3  # low</w> + low + est</w>


def test_merges_table_persistable(spark, tmp_path, documents):
    merges = pj.bpe_train(documents, "text", n_merges=30)
    p = str(tmp_path / "bpe_merges")
    merges.write.parquet(p)
    stored = spark.read.parquet(p)
    a = pj.bpe_encode(documents.limit(5), "text", merges).collect()
    b = pj.bpe_encode(documents.limit(5), "text", stored).collect()
    assert [r["bpe_tokens"] for r in a] == [r["bpe_tokens"] for r in b]


def test_bpe_roundtrip_property(spark):
    """Hypothesis-style random-text round-trip: for ANY corpus and any
    trained merge table, concatenating the encoded tokens and stripping
    EOW restores the whitespace-normalized text."""
    import random

    rng = random.Random(123)
    alphabet = "abcdef xyz QW ,.!?"
    rows = []
    for i in range(50):
        n = rng.randrange(0, 60)
        rows.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    df = spark.createDataFrame(rows, "id int, text string")
    merges = pj.bpe_train(df, "text", n_merges=40, min_frequency=1)
    from pyspark.sql import functions as F

    back = (
        pj.bpe_encode(df, "text", merges)
        .select(
            "text",
            F.array_join(
                F.transform(
                    "bpe_tokens",
                    lambda t: F.replace(t, F.lit(EOW), F.lit(" ")),
                ),
                "",
            ).alias("rt"),
        )
        .collect()
    )
    for r in back:
        assert r["rt"].rstrip() == " ".join(r["text"].split()), repr(r["text"])
