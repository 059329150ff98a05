"""hash_columns (pseudonymization), quantile_bin (scalable qcut),
hashed_tfidf (hashing-trick vectorizer)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

import pyjanitor_spark as pj


class TestHashColumns:
    @pytest.fixture(scope="class")
    def df(self, spark):
        return spark.createDataFrame(
            [(1, "alice", "a@x.com"), (2, "bob", None), (3, None, "c@x.com")],
            "id int, name string, email string",
        )

    def test_md5_matches_hashlib(self, df):
        out = {r["id"]: r["name"] for r in pj.hash_columns(df, "name", salt="s").collect()}
        assert out[1] == hashlib.md5(b"s:alice").hexdigest()
        assert out[3] is None

    def test_sha256_and_truncate(self, df):
        out = {
            r["id"]: r["name"]
            for r in pj.hash_columns(df, "name", algo="sha256", truncate=12).collect()
        }
        assert out[2] == hashlib.sha256(b":bob").hexdigest()[:12]
        assert len(out[1]) == 12

    def test_xxhash64_null_stays_null(self, df):
        rows = {r["id"]: r for r in pj.hash_columns(df, ["name", "email"], algo="xxhash64").collect()}
        assert rows[3]["name"] is None and rows[2]["email"] is None
        assert isinstance(rows[1]["name"], int)

    def test_joinability_same_salt(self, spark, df):
        other = spark.createDataFrame([("alice", 99)], "name string, score int")
        a = pj.hash_columns(df, "name", salt="k")
        b = pj.hash_columns(other, "name", salt="k")
        joined = a.join(b, "name")
        assert joined.count() == 1 and joined.first()["score"] == 99

    def test_suffix_keeps_original(self, df):
        out = pj.hash_columns(df, "name", suffix="_h")
        assert {"name", "name_h"} <= set(out.columns)
        assert out.filter(F.col("name") == "alice").first()["name_h"] is not None

    def test_bad_args(self, df):
        with pytest.raises(ValueError):
            pj.hash_columns(df, "name", algo="crc32")
        with pytest.raises(KeyError):
            pj.hash_columns(df, "nope")


class TestQuantileBin:
    def test_unique_values_even_split(self, spark):
        df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id int, v double")
        out = pj.quantile_bin(df, "v", "b", 4)
        sizes = {r["b"]: r["n"] for r in out.groupBy("b").agg(F.count("*").alias("n")).collect()}
        assert sizes == {0: 25, 1: 25, 2: 25, 3: 25}

    def test_ties_share_bin(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0), (2, 10.0), (3, 20.0), (4, 20.0), (5, 20.0)], "id int, v double"
        )
        out = {r["id"]: r["b"] for r in pj.quantile_bin(df, "v", "b", 2).collect()}
        assert out[3] == out[4] == out[5] == 1
        assert out[1] == out[2] == 0

    def test_null_gets_null_bin(self, spark):
        df = spark.createDataFrame([(1, 1.0), (2, None), (3, 3.0)], "id int, v double")
        out = {r["id"]: r["b"] for r in pj.quantile_bin(df, "v", "b", 2).collect()}
        assert out[2] is None and out[1] == 0 and out[3] == 1

    def test_labels(self, spark):
        df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id int, v double")
        out = pj.quantile_bin(df, "v", "b", 2, labels=["lo", "hi"])
        got = {r["id"]: r["b"] for r in out.collect()}
        assert got[0] == "lo" and got[9] == "hi"

    def test_stable_under_repartition(self, spark):
        df = spark.createDataFrame([(i, float(i % 17)) for i in range(200)], "id int, v double")
        a = sorted((r["id"], r["b"]) for r in pj.quantile_bin(df.repartition(1), "v", "b", 5).collect())
        b = sorted((r["id"], r["b"]) for r in pj.quantile_bin(df.repartition(13), "v", "b", 5).collect())
        assert a == b

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, 1.0)], "id int, v double")
        with pytest.raises(ValueError):
            pj.quantile_bin(df, "v", "b", 0)
        with pytest.raises(ValueError):
            pj.quantile_bin(df, "v", "b", 3, labels=["a"])


class TestHashedTfidf:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(1, "the cat sat"), (2, "the dog sat"), (3, ""), (4, None), (5, "cat cat cat")],
            "doc_id int, text string",
        )

    def test_long_form_weights(self, docs):
        rows = pj.hashed_tfidf(docs, "text", "doc_id", dim=64, as_vector=False).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["weight"])
        # N=3 docs with tokens; "cat" appears in docs 1 and 5 -> df=2
        # weight for one 'cat' occurrence = 1 * (ln(4/3) + 1)
        w_cat = math.log(4 / 3) + 1
        assert any(abs(w - w_cat) < 1e-12 for w in by_doc[1])
        assert any(abs(w - 3 * w_cat) < 1e-12 for w in by_doc[5])
        assert 3 not in by_doc and 4 not in by_doc

    def test_dense_shape_and_zero_vector(self, docs):
        out = pj.hashed_tfidf(docs, "text", "doc_id", dim=16)
        rows = {r["doc_id"]: r["tfidf"] for r in out.collect()}
        assert set(rows) == {1, 2, 3, 4, 5}
        assert all(len(v) == 16 for v in rows.values())
        assert rows[3] == [0.0] * 16 and rows[4] == [0.0] * 16

    def test_l2_normalize(self, docs):
        out = pj.hashed_tfidf(docs, "text", "doc_id", dim=32, l2_normalize=True)
        for r in out.filter("doc_id in (1,2,5)").collect():
            norm = math.sqrt(sum(x * x for x in r["tfidf"]))
            assert abs(norm - 1.0) < 1e-9

    def test_dense_agrees_with_long(self, docs):
        dim = 32
        long = pj.hashed_tfidf(docs, "text", "doc_id", dim=dim, as_vector=False).collect()
        dense = {
            r["doc_id"]: r["tfidf"]
            for r in pj.hashed_tfidf(docs, "text", "doc_id", dim=dim).collect()
        }
        for r in long:
            assert abs(dense[r["doc_id"]][r["bucket"]] - r["weight"]) < 1e-12

    def test_bm25_matches_brute_force(self, docs):
        corpus = {1: "the cat sat", 2: "the dog sat", 5: "cat cat cat"}
        out = {
            r["doc_id"]: r["bm25"]
            for r in pj.bm25_score(docs.filter("doc_id in (1,2,5)"), "text", "cat sat").collect()
        }

        def brute(q_terms, doc):
            toks = corpus[doc].split()
            n, avgdl = len(corpus), sum(len(v.split()) for v in corpus.values()) / len(corpus)
            s = 0.0
            for t in q_terms:
                tf = toks.count(t)
                dfq = sum(1 for v in corpus.values() if t in v.split())
                idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1)
                s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
            return s

        for d in corpus:
            assert abs(out[d] - brute(["cat", "sat"], d)) < 1e-9, d
        # BM25 saturation: matching BOTH terms (doc 1) beats repeating
        # one term (doc 5), which beats a single match (doc 2)
        assert out[1] > out[5] > out[2]

    def test_bm25_edge_cases(self, docs):
        with pytest.raises(ValueError):
            pj.bm25_score(docs, "text", "   ")
        # repeated query terms are deduped (score("cat cat") == score("cat"))
        a = {r["doc_id"]: r["bm25"] for r in pj.bm25_score(docs, "text", "cat cat").collect()}
        c = {r["doc_id"]: r["bm25"] for r in pj.bm25_score(docs, "text", "cat").collect()}
        assert a == c
        # query term absent everywhere -> all zeros; empty/null docs score 0
        z = pj.bm25_score(docs, "text", "zzzznotaword")
        assert all(r["bm25"] == 0.0 for r in z.collect())

    def test_feeds_cosine_topk(self, docs):
        vecs = pj.hashed_tfidf(docs, "text", "doc_id", dim=64, l2_normalize=True)
        q = vecs.filter("doc_id = 1").first()["tfidf"]
        top = pj.cosine_topk(vecs.filter("doc_id <> 4"), q, "tfidf", "doc_id", k=2)
        got = [r["doc_id"] for r in top.collect()]
        assert got[0] == 1  # itself first; doc 5 shares 'cat', doc 2 shares 'the sat'
        assert len(got) == 2


class TestHashColumnsTruncateValidation:
    def test_truncate_zero_raises(self, spark):
        df = spark.createDataFrame([(1, "a")], ["id", "name"])
        with pytest.raises(ValueError, match="truncate"):
            pj.hash_columns(df, "name", truncate=0)

    def test_truncate_negative_raises(self, spark):
        df = spark.createDataFrame([(1, "a")], ["id", "name"])
        with pytest.raises(ValueError, match="truncate"):
            pj.hash_columns(df, "name", truncate=-3)

    def test_truncate_beyond_digest_raises(self, spark):
        df = spark.createDataFrame([(1, "a")], ["id", "name"])
        with pytest.raises(ValueError, match=r"\[1, 32\]"):
            pj.hash_columns(df, "name", algo="md5", truncate=33)
        with pytest.raises(ValueError, match=r"\[1, 64\]"):
            pj.hash_columns(df, "name", algo="sha256", truncate=65)

    def test_truncate_with_xxhash64_raises(self, spark):
        df = spark.createDataFrame([(1, "a")], ["id", "name"])
        with pytest.raises(ValueError, match="xxhash64"):
            pj.hash_columns(df, "name", algo="xxhash64", truncate=8)


class TestJitterKeyed:
    def test_distribution_and_determinism(self, spark):
        import math

        df = spark.range(20000).select(
            F.col("id").alias("k"), F.lit(10.0).alias("v")
        )
        out = pj.jitter(df, "v", "vj", scale=2.0, random_state=3, key_column="k")
        vals = [r["vj"] - 10.0 for r in out.collect()]
        n = len(vals)
        mean = sum(vals) / n
        std = math.sqrt(sum((x - mean) ** 2 for x in vals) / n)
        assert abs(mean) < 0.05          # ~3 sigma of 2/sqrt(20000)
        assert abs(std - 2.0) < 0.05
        # layout-stable: same row -> same noise on any partitioning
        a = {r["k"]: r["vj"] for r in out.collect()}
        b = {r["k"]: r["vj"] for r in pj.jitter(
            df.repartition(7), "v", "vj", scale=2.0,
            random_state=3, key_column="k").collect()}
        assert a == b

    def test_clip_and_salt(self, spark):
        df = spark.range(100).select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
        clipped = pj.jitter(df, "v", "vj", scale=5.0, clip=(-1.0, 1.0),
                            random_state=1, key_column="k")
        assert all(-1.0 <= r["vj"] <= 1.0 for r in clipped.collect())
        a = {r["k"]: r["vj"] for r in pj.jitter(
            df, "v", "vj", scale=1.0, random_state=1, key_column="k").collect()}
        c = {r["k"]: r["vj"] for r in pj.jitter(
            df, "v", "vj", scale=1.0, random_state=2, key_column="k").collect()}
        assert a != c  # salt changes the noise stream

    def test_default_randn_path_unchanged(self, spark):
        df = spark.range(1000).select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
        out = pj.jitter(df, "v", "vj", scale=1.0, random_state=5)
        assert out.count() == 1000
