"""Deterministic sampling + repetition/PII text ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import pyjanitor_spark as pj


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


class TestDeterministicSample:
    def test_stable_under_repartition(self, documents):
        a = _ids(pj.deterministic_sample(documents.repartition(1), "doc_id", 0.3))
        b = _ids(pj.deterministic_sample(documents.repartition(7), "doc_id", 0.3))
        assert a == b and len(a) > 0

    def test_fraction_approx(self, documents):
        total = documents.count()
        kept = pj.deterministic_sample(documents, "doc_id", 0.5).count()
        assert abs(kept / total - 0.5) < 0.15

    def test_salt_changes_sample(self, documents):
        a = _ids(pj.deterministic_sample(documents, "doc_id", 0.3, salt="x"))
        b = _ids(pj.deterministic_sample(documents, "doc_id", 0.3, salt="y"))
        assert a != b

    def test_flag_mode_matches_filter(self, documents):
        flagged = pj.deterministic_sample(documents, "doc_id", 0.3, dest="keep")
        assert flagged.count() == documents.count()
        assert _ids(flagged.filter("keep")) == _ids(
            pj.deterministic_sample(documents, "doc_id", 0.3)
        )

    def test_nested_fractions_monotone(self, documents):
        """The 10% sample is a subset of the 20% sample (same salt) —
        the property that makes threshold-based sampling resumable."""
        small = set(_ids(pj.deterministic_sample(documents, "doc_id", 0.1)))
        big = set(_ids(pj.deterministic_sample(documents, "doc_id", 0.2)))
        assert small <= big


class TestStratifiedSample:
    def test_per_stratum_fractions(self, documents):
        out = pj.stratified_sample(
            documents, "lang", "doc_id", {"en": 1.0, "de": 0.0}, default_fraction=0.0
        )
        langs = {r[0] for r in out.select("lang").distinct().collect()}
        assert langs == {"en"}
        assert out.count() == documents.filter("lang = 'en'").count()

    def test_default_fraction(self, documents):
        out = pj.stratified_sample(
            documents, "lang", "doc_id", {"en": 0.0}, default_fraction=1.0
        )
        assert out.filter("lang = 'en'").count() == 0
        assert out.count() == documents.filter("lang <> 'en'").count()


class TestSplitTrainHoldout:
    def test_partition_is_total_and_stable(self, documents):
        out = pj.split_train_holdout(documents, "doc_id", holdout_fraction=0.2)
        assert out.count() == documents.count()
        again = pj.split_train_holdout(documents.repartition(5), "doc_id", 0.2)
        a = sorted(tuple(r) for r in out.select("doc_id", "is_holdout").collect())
        b = sorted(tuple(r) for r in again.select("doc_id", "is_holdout").collect())
        assert a == b


class TestRepetitionScore:
    def test_hand_values(self, spark):
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "a a a"), (3, "x y z"), (4, "")], ["doc_id", "t"]
        )
        rows = {
            r["doc_id"]: r
            for r in pj.repetition_score(df, "t", shingle_n=2).collect()
        }
        assert abs(rows[1]["rep_word_frac"] - (1 - 2 / 3)) < 1e-12
        # bigrams of "a a b": ["a a", "a b"] -> 2 distinct of 2 raw
        assert rows[1]["rep_ngram_frac"] == 0.0
        # "a a a": bigrams ["a a", "a a"] -> 1 distinct of 2 raw
        assert rows[2]["rep_ngram_frac"] == 0.5
        assert rows[3]["rep_word_frac"] == 0.0
        assert rows[4]["rep_word_frac"] == 0.0 and rows[4]["rep_ngram_frac"] == 0.0

    def test_no_shuffle(self, documents):
        from pyjanitor_spark.plans import shuffle_count

        assert shuffle_count(pj.repetition_score(documents, "text")) == 0


class TestPiiRedact:
    def test_redactions(self, spark):
        df = spark.createDataFrame(
            [
                (1, "mail bob.smith+x@corp.example.org now"),
                (2, "ssn 123-45-6789 phone 555-123-4567"),
                (3, "call 555.123.4567"),
                (4, "clean text"),
            ],
            ["doc_id", "t"],
        )
        out = {r["doc_id"]: r for r in pj.pii_redact(df, "t").collect()}
        assert out[1]["t_redacted"] == "mail [EMAIL] now"
        assert out[1]["pii_email_count"] == 1
        # SSN wins over the looser phone shape for the first number
        assert out[2]["t_redacted"] == "ssn [SSN] phone [PHONE]"
        assert out[2]["pii_ssn_count"] == 1 and out[2]["pii_phone_count"] == 1
        assert out[3]["t_redacted"] == "call [PHONE]"
        assert out[4]["t_redacted"] == "clean text"
        assert out[4]["pii_email_count"] == 0

    def test_custom_dest_and_kinds(self, spark):
        df = spark.createDataFrame([(1, "a@b.co 123-45-6789")], ["doc_id", "t"])
        out = pj.pii_redact(df, "t", dest="clean", kinds=("email",), counts=False).collect()[0]
        assert out["clean"] == "[EMAIL] 123-45-6789"
        assert "pii_email_count" not in out.asDict()


def test_embedding_near_dup_auto_block(embeddings):
    e = embeddings
    dim = len(e.select("embedding").first()[0])
    brute = pj.embedding_near_dup(
        e, "vec_id", "embedding", threshold=0.4, allow_cross_join=True
    )
    auto = pj.embedding_near_dup(
        e, "vec_id", "embedding", threshold=0.4,
        auto_block_planes=4, auto_block_bands=8, dim=dim,
    )
    bp = {(r["id_1"], r["id_2"]) for r in brute.collect()}
    ap = {(r["id_1"], r["id_2"]) for r in auto.collect()}
    assert ap <= bp                      # perfect precision by construction
    assert len(ap) >= 0.5 * len(bp)      # banded recall well above 1 bucket
    assert "__edb_bkt" not in auto.columns


def test_embedding_near_dup_auto_block_requires_dim(embeddings):
    import pytest
    with pytest.raises(ValueError):
        pj.embedding_near_dup(embeddings, "vec_id", "embedding", auto_block_planes=4)


def test_embedding_near_dup_no_silent_cross_join(embeddings):
    """Unblocked + no dim + no opt-in must raise, not plan an O(n^2) join."""
    import pytest
    with pytest.raises(ValueError, match="cross join"):
        pj.embedding_near_dup(embeddings, "vec_id", "embedding")


@pytest.mark.slow  # heavy sweep: builder gate


def test_embedding_near_dup_dim_auto_blocks(embeddings):
    """dim= alone auto-enables hyperplane blocking (no ValueError, no
    unconditional cross join: pairs are a subset of brute force)."""
    e = embeddings
    dim = len(e.select("embedding").first()[0])
    auto = pj.embedding_near_dup(e, "vec_id", "embedding", threshold=0.4, dim=dim)
    brute = pj.embedding_near_dup(
        e, "vec_id", "embedding", threshold=0.4, allow_cross_join=True
    )
    ap = {(r["id_1"], r["id_2"]) for r in auto.collect()}
    bp = {(r["id_1"], r["id_2"]) for r in brute.collect()}
    assert ap <= bp


class TestChunkText:
    def test_covers_all_tokens_no_overlap(self, spark):
        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id int, text string"
        )
        rows = pj.chunk_text(df, "text", max_tokens=4).orderBy("chunk_id").collect()
        assert [r["chunk"] for r in rows] == ["t0 t1 t2 t3", "t4 t5 t6 t7", "t8 t9"]
        assert [r["chunk_n_tokens"] for r in rows] == [4, 4, 2]

    def test_overlap_shares_tokens(self, spark):
        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id int, text string"
        )
        rows = pj.chunk_text(df, "text", max_tokens=4, overlap=1).orderBy("chunk_id").collect()
        chunks = [r["chunk"].split() for r in rows]
        for prev, cur in zip(chunks, chunks[1:]):
            assert prev[-1:] == cur[:1]
        flat = [t for i, c in enumerate(chunks) for t in (c if i == 0 else c[1:])]
        assert flat == [f"t{i}" for i in range(10)]

    def test_blank_and_null_documents(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, None), (4, "one")], "doc_id int, text string"
        )
        out = pj.chunk_text(df, "text", max_tokens=8)
        assert [r["doc_id"] for r in out.collect()] == [4]
        kept = pj.chunk_text(df, "text", max_tokens=8, keep_empty=True)
        assert kept.count() == 4 and kept.filter("doc_id=1").first()["chunk"] == ""

    def test_validation(self, spark):
        import pytest
        df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
        with pytest.raises(ValueError):
            pj.chunk_text(df, "text", max_tokens=0)
        with pytest.raises(ValueError):
            pj.chunk_text(df, "text", max_tokens=4, overlap=4)

    def test_deterministic_across_layouts(self, documents):
        a = pj.chunk_text(documents.repartition(1), "text", 32).select(
            "doc_id", "chunk_id", "chunk"
        )
        b = pj.chunk_text(documents.repartition(7), "text", 32).select(
            "doc_id", "chunk_id", "chunk"
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestUrlOps:
    def test_extract_urls_and_domains(self, spark):
        from pyspark.sql import functions as F
        from pyjanitor_spark.operators.text_analysis import domain_of

        df = spark.createDataFrame(
            [
                (1, "see https://www.Example.COM/a?q=1 and http://sub.other.org/x."),
                (2, "no links here"),
            ],
            "doc_id int, text string",
        )
        out = pj.extract_urls(df, "text")
        urls = {r["doc_id"]: r["urls"] for r in out.collect()}
        assert len(urls[1]) == 2 and urls[2] == []
        doms = [
            r[0]
            for r in out.select(F.explode("urls").alias("u"))
            .select(domain_of(F.col("u")))
            .collect()
        ]
        assert sorted(doms) == ["example.com", "sub.other.org"]

    def test_top_domains_counts_and_ties(self, spark):
        df = spark.createDataFrame(
            [
                ("http://a.com/1 http://a.com/2 https://b.net/x",),
                ("https://www.b.net/y",),
            ],
            "text string",
        )
        rows = [(r["domain"], r["cnt"]) for r in pj.top_domains(df, "text", k=5).collect()]
        assert rows == [("a.com", 2), ("b.net", 2)]  # tie -> lexicographic


class TestUrlNormalize:
    def test_canonical_forms(self, spark):
        cases = [
            (1, "HTTPS://Example.COM:443/Path?utm_source=x&id=5#frag",
             "https://example.com/Path?id=5"),
            (2, "http://site.org:80/a?utm_campaign=z", "http://site.org/a"),
            (3, "http://site.org/a?x=1&y=2", "http://site.org/a?x=1&y=2"),
            (4, "not a url", "not a url"),
            (5, "https://Host.net/UPPER", "https://host.net/UPPER"),
            (6, "http://h.io/p?gclid=1&fbclid=2", "http://h.io/p"),
            (7, None, None),
        ]
        df = spark.createDataFrame([(i, u) for i, u, _ in cases], "id int, url string")
        got = {r["id"]: r["url"] for r in pj.url_normalize(df, "url").collect()}
        for i, _, want in cases:
            assert got[i] == want, (i, got[i], want)

    def test_keep_options(self, spark):
        df = spark.createDataFrame(
            [(1, "http://a.b/p?utm_x=1&k=2#frag")], "id int, url string"
        )
        keep_frag = pj.url_normalize(df, "url", drop_fragment=False, dest="u2").first()["u2"]
        assert "#frag" in keep_frag
        keep_track = pj.url_normalize(df, "url", strip_tracking=False, dest="u3").first()["u3"]
        assert "utm_x=1" in keep_track

    def test_dedup_after_normalize(self, spark):
        """The point of the verb: case/port/tracking variants of one
        resource collapse to a single key."""
        df = spark.createDataFrame(
            [(1, "HTTP://X.io:80/a?utm_s=1"), (2, "http://x.io/a"), (3, "http://x.io/b")],
            "id int, url string",
        )
        n = pj.url_normalize(df, "url").select("url").distinct().count()
        assert n == 2


class TestNormalizeText:
    def test_full_pipeline(self, spark):
        df = spark.createDataFrame(
            [
                (1, "“Café” — naïve…\x07 résumé"),
                (2, "A B\t\tC\n\nD"),
                (3, None),
                (4, "   "),
            ],
            "id int, text string",
        )
        out = {r["id"]: r["norm"]
               for r in pj.normalize_text(df, "text", dest="norm").collect()}
        assert out[1] == '"cafe" - naive. resume'
        assert out[2] == "a b c d"
        assert out[3] is None
        assert out[4] == ""

    def test_inplace_and_flags(self, spark):
        df = spark.createDataFrame([(1, "Été Café")], "id int, text string")
        # in-place replaces the column
        out = pj.normalize_text(df, "text")
        assert out.columns == ["id", "text"]
        assert out.first()["text"] == "ete cafe"
        # accents kept when disabled
        keep = pj.normalize_text(df, "text", strip_accents=False).first()["text"]
        assert keep == "été café"
        # case kept when disabled
        up = pj.normalize_text(df, "text", lowercase=False).first()["text"]
        assert up == "Ete Cafe"

    def test_idempotent(self, spark, documents):
        once = pj.normalize_text(documents, "text", dest="n1")
        twice = pj.normalize_text(once, "n1", dest="n2")
        assert twice.filter("n1 <> n2").count() == 0


class TestUrlNormalizeExactTrackingNames:
    def test_prefix_collisions_survive(self, spark):
        # gclid_src / fbclid2 merely share a prefix with the tracking
        # names — exact-name semantics must keep them
        df = spark.createDataFrame(
            [
                (1, "https://ex.com/p?gclid_src=aw&x=1"),
                (2, "https://ex.com/p?fbclid2=z"),
                (3, "https://ex.com/p?gclid=abc&x=1"),
                (4, "https://ex.com/p?fbclid=b&mc_cid=c&mc_eid=d"),
                (5, "https://ex.com/p?utm_source=s&utm_medium=m&y=2"),
            ],
            ["id", "url"],
        )
        got = {r["id"]: r["url"] for r in pj.url_normalize(df, "url").collect()}
        assert got[1] == "https://ex.com/p?gclid_src=aw&x=1"
        assert got[2] == "https://ex.com/p?fbclid2=z"
        assert got[3] == "https://ex.com/p?x=1"
        assert got[4] == "https://ex.com/p"
        assert got[5] == "https://ex.com/p?y=2"

    def test_bare_tracking_name_no_value_stripped(self, spark):
        df = spark.createDataFrame([(1, "https://ex.com/p?gclid&x=1")], ["id", "url"])
        assert pj.url_normalize(df, "url").first()["url"] == "https://ex.com/p?x=1"


class TestMixCorpora:
    def _df(self, spark):
        rows = []
        for i in range(300):
            rows.append((i, ["web", "books", "code"][i % 3]))
        return spark.createDataFrame(rows, ["doc_id", "source"])

    def test_proportions_realized(self, spark):
        df = self._df(spark)  # 100 rows per source
        out = pj.mix_corpora(
            df, "source", "doc_id", {"web": 0.6, "books": 0.4}
        )
        got = {r["source"]: 0 for r in out.collect()}
        for r in out.collect():
            got[r["source"]] += 1
        # binding source is web (100/0.6=166 < 100/0.4=250): web keeps
        # 100%, books keeps 0.4*166.66/100 = 2/3
        assert got["web"] == 100
        assert 50 <= got["books"] <= 80  # ~67 expected, binomial noise
        assert "code" not in got  # omitted sources dropped

    def test_layout_deterministic(self, spark):
        df = self._df(spark)
        a = {r["doc_id"] for r in pj.mix_corpora(
            df.repartition(1), "source", "doc_id", {"web": 0.5, "books": 0.5}).collect()}
        b = {r["doc_id"] for r in pj.mix_corpora(
            df.repartition(7), "source", "doc_id", {"web": 0.5, "books": 0.5}).collect()}
        assert a == b

    def test_bad_proportions(self, spark):
        df = self._df(spark)
        with pytest.raises(ValueError, match="sum to 1"):
            pj.mix_corpora(df, "source", "doc_id", {"web": 0.5, "books": 0.4})
        with pytest.raises(ValueError, match="positive"):
            pj.mix_corpora(df, "source", "doc_id", {"web": 1.2, "books": -0.2})
        with pytest.raises(ValueError, match="non-empty"):
            pj.mix_corpora(df, "source", "doc_id", {})
        with pytest.raises(ValueError, match="not present"):
            pj.mix_corpora(df, "source", "doc_id", {"web": 0.5, "nope": 0.5})


class TestTakeTokenBudget:
    def _df(self, spark):
        return spark.createDataFrame(
            [(i, " ".join(["tok"] * (10 * (i + 1)))) for i in range(5)],
            ["doc_id", "text"],
        )  # token counts 10,20,30,40,50; cumsums 10,30,60,100,150

    def test_budget_boundary(self, spark):
        df = self._df(spark)
        kept = {r["doc_id"] for r in pj.take_token_budget(df, "text", 60, "doc_id").collect()}
        assert kept == {0, 1, 2}  # cum 10,30,60 <= 60; 100 crosses
        kept59 = {r["doc_id"] for r in pj.take_token_budget(df, "text", 59, "doc_id").collect()}
        assert kept59 == {0, 1}
        assert pj.take_token_budget(df, "text", 0, "doc_id").count() == 0

    def test_dest_keeps_all_rows(self, spark):
        df = self._df(spark)
        out = {r["doc_id"]: r["cum"] for r in pj.take_token_budget(
            df, "text", 60, "doc_id", dest="cum").collect()}
        assert out == {0: 10, 1: 30, 2: 60, 3: 100, 4: 150}

    def test_layout_deterministic(self, spark, documents):
        a = sorted(r["doc_id"] for r in pj.take_token_budget(
            documents.repartition(1), "text", 5000, "doc_id").collect())
        b = sorted(r["doc_id"] for r in pj.take_token_budget(
            documents.repartition(7), "text", 5000, "doc_id").collect())
        assert a == b and 0 < len(a) < documents.count()

    def test_bad_params(self, spark):
        df = self._df(spark)
        with pytest.raises(ValueError, match="budget"):
            pj.take_token_budget(df, "text", -1, "doc_id")
        with pytest.raises(KeyError, match="nope"):
            pj.take_token_budget(df, "text", 10, "nope")


class TestWeightedSample:
    def _df(self, spark, weights):
        return spark.createDataFrame(
            [(i, float(w)) for i, w in enumerate(weights)], "id int, w double"
        )

    def test_exact_aes_priorities(self, spark):
        # the op IS deterministic: recompute ln(u)/w in python from the
        # same md5-derived uniforms and assert the identical top-k set
        import hashlib
        import math

        weights = [1.0, 5.0, 2.0, 9.0, 0.5, 3.0, 7.0, 1.5]
        df = self._df(spark, weights)
        got = [r["id"] for r in pj.weighted_sample(df, "w", 3, "id", salt="t").collect()]
        pri = {}
        for i, w in enumerate(weights):
            h = hashlib.md5(f"t:{i}".encode()).hexdigest()
            u = (int(h[:13], 16) + 0.5) / 2**52
            pri[i] = math.log(u) / w
        exp = sorted(pri, key=lambda i: (-pri[i], i))[:3]
        assert sorted(got) == sorted(exp)

    def test_heavy_weight_wins_across_salts(self, spark):
        # one row with 1000x weight must be drawn in nearly every sample
        df = self._df(spark, [1.0] * 20 + [1000.0])
        hits = sum(
            any(
                r["id"] == 20
                for r in pj.weighted_sample(df, "w", 3, "id", salt=f"s{j}").collect()
            )
            for j in range(10)
        )
        assert hits >= 9, hits

    @pytest.mark.slow  # heavy brute/sweep: builder gate

    def test_inclusion_frequency_proportional_to_weight(self, spark):
        # the A-ES statistical property itself: with k=1 the inclusion
        # probability of row i is exactly w_i / sum(w).  160 fixed salts,
        # one action (the per-salt top-1 plans unioned) — deterministic,
        # so the frequencies are pinned, not flaky.
        from functools import reduce

        df = self._df(spark, [1.0, 2.0, 5.0])
        n_salts = 160
        picks = reduce(
            lambda a, b: a.unionByName(b),
            [
                pj.weighted_sample(df, "w", 1, "id", salt=f"freq{j}")
                for j in range(n_salts)
            ],
        )
        counts = {r["id"]: r["n"] for r in picks.groupBy("id").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        total = sum(counts.values())
        assert total == n_salts
        expected = {0: 1 / 8, 1: 2 / 8, 2: 5 / 8}
        for i, p in expected.items():
            obs = counts.get(i, 0) / total
            # ±3.5 sigma of Binomial(160, p) — generous, and the fixed
            # salt set makes the outcome reproducible anyway
            tol = 3.5 * (p * (1 - p) / n_salts) ** 0.5
            assert abs(obs - p) <= tol, (i, obs, p, tol)

    def test_layout_independent_and_stable(self, spark):
        df = self._df(spark, [float(i % 7 + 1) for i in range(100)])
        a = sorted(r["id"] for r in pj.weighted_sample(df.repartition(1), "w", 10, "id").collect())
        b = sorted(r["id"] for r in pj.weighted_sample(df.repartition(9), "w", 10, "id").collect())
        assert a == b and len(a) == 10

    def test_nonpositive_and_null_weights_excluded(self, spark):
        df = spark.createDataFrame(
            [(0, 1.0), (1, 0.0), (2, -2.0), (3, None), (4, 2.0)],
            "id int, w double",
        )
        got = sorted(r["id"] for r in pj.weighted_sample(df, "w", 10, "id").collect())
        assert got == [0, 4]  # k > eligible rows -> all eligible rows

    def test_error_contract(self, spark):
        df = self._df(spark, [1.0])
        with pytest.raises(ValueError, match="k must be"):
            pj.weighted_sample(df, "w", 0, "id")


class TestDsirWeights:
    def _corpus(self, spark):
        rows = [(i, "the quick brown fox jumps over dogs", "en") for i in range(10)]
        rows += [(100 + i, "der schnelle braune fuchs springt hoch", "de") for i in range(10)]
        return spark.createDataFrame(rows, "doc_id int, text string, lang string")

    def test_target_domain_scores_higher(self, spark):
        df = self._corpus(spark)
        tgt = df.filter(F.col("lang") == "en")
        out = pj.dsir_weights(df, tgt, "text", "doc_id")
        rows = {r["doc_id"]: r["dsir_logw"] for r in out.collect()}
        en = [v for k, v in rows.items() if k < 100]
        de = [v for k, v in rows.items() if k >= 100]
        assert min(en) > max(de), (min(en), max(de))

    def test_logw_monotone_in_target_likeness(self, spark):
        # graded overlap with the target domain -> strictly decreasing
        # logw: 100% target bigrams > 2/3 > 1/3 > 0%
        tgt_text = "alpha beta gamma delta"  # target bigrams: 3
        rows = [
            (0, "alpha beta gamma delta"),          # 3/3 target bigrams
            (1, "alpha beta gamma zork"),           # 2/3
            (2, "alpha beta yerp zork"),            # 1/3
            (3, "wibble yerp zork quux"),           # 0/3
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        tgt = spark.createDataFrame([(99, tgt_text)], "doc_id int, text string")
        w = {r["doc_id"]: r["dsir_logw"]
             for r in pj.dsir_weights(df, tgt, "text", "doc_id").collect()}
        assert w[0] > w[1] > w[2] > w[3], w

    def test_source_equals_target_is_exactly_zero(self, spark):
        # T == S bucket-for-bucket -> every log-ratio is exactly 0.0
        df = self._corpus(spark)
        out = pj.dsir_weights(df, df, "text", "doc_id")
        assert all(r["dsir_logw"] == 0.0 for r in out.collect())

    def test_layout_independent_and_empty_doc(self, spark):
        df = self._corpus(spark).unionByName(
            spark.createDataFrame(
                [(999, "", "en"), (998, "single", "en")],
                "doc_id int, text string, lang string",
            )
        )
        tgt = df.filter(F.col("lang") == "en")
        a = {r["doc_id"]: r["dsir_logw"]
             for r in pj.dsir_weights(df.repartition(1), tgt, "text", "doc_id").collect()}
        b = {r["doc_id"]: r["dsir_logw"]
             for r in pj.dsir_weights(df.repartition(7), tgt, "text", "doc_id").collect()}
        assert a == b  # DECIMAL sums: exactly equal, not just close
        # no bigrams (empty / single token) -> weight 0
        assert a[999] == 0.0 and a[998] == 0.0

    def test_error_contracts(self, spark):
        df = self._corpus(spark)
        with pytest.raises(ValueError, match="n must"):
            pj.dsir_weights(df, df, "text", "doc_id", n=0)
        with pytest.raises(ValueError, match="num_buckets"):
            pj.dsir_weights(df, df, "text", "doc_id", num_buckets=1)
        with pytest.raises(ValueError, match="k must"):
            pj.dsir_weights(df, df, "text", "doc_id", k=0)
        empty_tgt = df.filter(F.lit(False))
        with pytest.raises(ValueError, match="target corpus"):
            pj.dsir_weights(df, empty_tgt, "text", "doc_id")


class TestNaiveBayes:
    def test_separable_classes_classify_perfectly(self, spark):
        rows = [(i, "spam buy now cheap pills", "spam") for i in range(20)]
        rows += [(100 + i, "meeting notes quarterly report", "ham") for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
        model = pj.nb_train(df, "text", "lang")
        out = pj.nb_score(df, model, "text", "doc_id")
        assert out.filter(F.col("nb_pred") == F.col("lang")).count() == 40

    def test_unknown_tokens_fall_back_to_prior(self, spark):
        # 3:1 priors; a doc of only-unknown tokens predicts the majority
        rows = [(i, "alpha beta", "a") for i in range(3)] + [(9, "gamma delta", "b")]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
        model = pj.nb_train(df, "text", "lang")
        probe = spark.createDataFrame(
            [(1, "zzz qqq never seen")], "doc_id int, text string"
        )
        got = pj.nb_score(probe, model, "text", "doc_id").first()["nb_pred"]
        assert got == "a"

    def test_scores_columns_and_model_shape(self, spark):
        df = spark.createDataFrame(
            [(1, "x y", "a"), (2, "y z", "b")], "doc_id int, text string, lang string"
        )
        model = pj.nb_train(df, "text", "lang")
        # dense: 3 vocab tokens x 2 labels + 2 priors
        assert model.count() == 8
        out = pj.nb_score(df, model, "text", "doc_id", keep_scores=True)
        assert {"nb_score_a", "nb_score_b"} <= set(out.columns)
        r = out.filter(F.col("doc_id") == 1).first()
        assert r["nb_score_a"] > r["nb_score_b"]

    def test_error_contracts(self, spark):
        df = spark.createDataFrame([(1, "x", "a")], "doc_id int, text string, lang string")
        with pytest.raises(ValueError, match="k must be"):
            pj.nb_train(df, "text", "lang", k=0)
        with pytest.raises(ValueError, match="prior rows"):
            pj.nb_score(df, df.select(F.lit("x").alias("token"),
                                      F.lit("a").alias("label"),
                                      F.lit(0.0).alias("llk")),
                        "text", "doc_id")

    def test_dotted_labels_survive_pivot(self, spark):
        # label values with dots must not pass through F.col parsing
        rows = [(1, "aa bb", "en.US"), (2, "cc dd", "fr.FR"), (3, "aa bb", "en.US")]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
        model = pj.nb_train(df, "text", "lang")
        out = pj.nb_score(df, model, "text", "doc_id", keep_scores=True)
        got = {r["doc_id"]: r["nb_pred"] for r in out.collect()}
        assert got == {1: "en.US", 2: "fr.FR", 3: "en.US"}
        assert "nb_score_en.US" in out.columns

    def test_space_and_reserved_word_labels(self, spark):
        # spaces + SQL reserved words in label VALUES must survive the
        # positional-rename path (classify.py pivot -> toDF) and the
        # keep_scores column attach
        rows = [
            (1, "aa bb", "new label"), (2, "cc dd", "select"),
            (3, "aa bb", "new label"), (4, "cc dd", "select"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
        model = pj.nb_train(df, "text", "lang")
        out = pj.nb_score(df, model, "text", "doc_id", keep_scores=True)
        got = {r["doc_id"]: r["nb_pred"] for r in out.collect()}
        assert got == {1: "new label", 2: "select", 3: "new label", 4: "select"}
        assert {"nb_score_new label", "nb_score_select"} <= set(out.columns)

    def test_single_label_corpus(self, spark):
        rows = [(1, "aa bb", "only"), (2, "cc dd", "only")]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
        model = pj.nb_train(df, "text", "lang")
        # prior row: ln(2/2) = 0.0 exactly
        prior = model.filter(F.col("token").isNull()).first()
        assert prior["label"] == "only" and prior["llk"] == 0.0
        out = pj.nb_score(df, model, "text", "doc_id")
        assert [r["nb_pred"] for r in out.collect()] == ["only", "only"]

    def test_empty_vocab_after_min_count(self, spark):
        # every token is a hapax; min_count=2 empties the vocabulary ->
        # model is priors-only and scoring falls back to the prior argmax
        rows = [(1, "aa bb", "x"), (2, "cc dd", "x"), (3, "ee ff", "y")]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
        model = pj.nb_train(df, "text", "lang", min_count=2)
        assert model.filter(F.col("token").isNotNull()).count() == 0
        out = pj.nb_score(df, model, "text", "doc_id")
        assert [r["nb_pred"] for r in out.collect()] == ["x", "x", "x"]

    def test_tie_breaks_first_sorted_label_layout_independent(self, spark):
        # perfectly symmetric corpus: every doc scores both labels
        # identically -> argmax must pick the FIRST sorted label, on
        # every row, regardless of partitioning
        rows = [(1, "tok", "b"), (2, "tok", "a")]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
        model = pj.nb_train(df, "text", "lang")
        for nparts in (1, 7):
            out = pj.nb_score(
                df.repartition(nparts), model, "text", "doc_id"
            )
            assert [r["nb_pred"] for r in out.orderBy("doc_id").collect()] == [
                "a", "a",
            ]

    def test_null_labels_dropped_in_training(self, spark):
        rows = [(1, "aa bb", "x"), (2, "cc dd", None), (3, "aa bb", "x")]
        df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
        model = pj.nb_train(df, "text", "lang")
        labs = {r["label"] for r in model.collect()}
        assert labs == {"x"}
        allnull = spark.createDataFrame(
            [(1, "aa", None)], "doc_id int, text string, lang string"
        )
        with pytest.raises(ValueError, match="non-null"):
            pj.nb_train(allnull, "text", "lang")
