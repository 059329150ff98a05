"""Feature-hashing text vectorization (hashing-trick TF-IDF).

Turns a text column into fixed-dimension sparse/dense TF-IDF vectors
without any vocabulary fitting step — the "hashing trick" (Weinberger et
al., *Feature Hashing for Large Scale Multitask Learning*, ICML 2009):
token → ``md5`` → bucket in ``[0, dim)``.  No vocabulary means no
driver-side state, no second pass, and no 100 GB broadcast of a
billion-term dictionary — the classic scale failure of fitted
vectorizers.  Collisions are the accepted trade (bounded by ``dim``).

Everything is Column expressions + three aggregations:

1. ``explode`` tokens → ``groupBy(id, bucket).count()`` — the only
   full-size shuffle, keyed on (id, bucket) with map-side combine;
2. document frequency: ``groupBy(bucket)`` over the tf rows — output is
   at most ``dim`` rows, broadcast back;
3. (``as_vector=True`` only) ``groupBy(id)`` to assemble the dense
   array via ``map_from_entries`` + ``transform(sequence(...))``.

``md5``-based bucketing keeps the result engine-reproducible (the
DuckDB oracle recomputes identical buckets).  The long-form output
(``as_vector=False``) is the 100 TB shape — (id, bucket, weight) rows
feed joins and similarity ops without materializing dense arrays.

Output composes with ``similarity.cosine_topk`` / ``ivf_topk`` /
``lsh_bucket_topk`` and ``dedup.embedding_near_dup`` — an end-to-end
text → vector → ANN / near-dup pipeline with no external model.

No reference analog; part of the training-data pipeline pack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import tokens

__all__ = ["hashed_tfidf"]


def hashed_tfidf(
    df: DataFrame,
    column_name: str,
    id_column: str,
    dim: int = 1024,
    dest: str = "tfidf",
    mode: str = "whitespace",
    lowercase: bool = True,
    l2_normalize: bool = False,
    as_vector: bool = True,
) -> DataFrame:
    """TF-IDF vectors over hashed token buckets.

    ``weight(d, b) = tf(d, b) * (ln((1 + N) / (1 + df(b))) + 1)`` —
    smoothed IDF (sklearn's ``smooth_idf`` formulation, public docs),
    where ``N`` counts documents with at least one token and ``df(b)``
    counts documents hitting bucket ``b``.

    * ``as_vector=True``: returns ``df`` with a dense
      ``array<double>`` column ``dest`` of length ``dim`` (docs with no
      tokens get the zero vector).  Feed this to the ANN ops.
    * ``as_vector=False``: returns long form ``(id_column, bucket,
      weight)`` — only non-zero entries, no dense materialization; the
      shape to keep at corpus scale when ``dim`` is large.
    * ``l2_normalize``: scale each document's weights to unit L2 norm
      (cosine similarity becomes a dot product) — one extra
      ``partitionBy(id)`` window, still fully parallel.
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    col = F.col(column_name)
    if lowercase:
        col = F.lower(col)
    tok = F.explode(F.filter(tokens(col, mode), lambda t: t != "")).alias("__tok")
    exploded = df.select(F.col(id_column), tok)
    bucket = (
        F.conv(F.substring(F.md5(F.col("__tok")), 1, 8), 16, 10).cast("bigint")
        % F.lit(dim)
    ).alias("bucket")
    tf = exploded.select(id_column, bucket).groupBy(id_column, "bucket").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    dfreq = tf.groupBy("bucket").agg(F.count(F.lit(1)).alias("__df"))
    ndocs = tf.agg(F.count_distinct(F.col(id_column)).alias("__n"))
    weighted = (
        tf.join(F.broadcast(dfreq), "bucket")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "weight",
            F.col("__tf")
            * (
                F.log((F.lit(1.0) + F.col("__n")) / (F.lit(1.0) + F.col("__df")))
                + F.lit(1.0)
            ),
        )
    )
    if l2_normalize:
        from pyspark.sql import Window

        w = Window.partitionBy(id_column)
        weighted = weighted.withColumn(
            "weight",
            F.col("weight") / F.sqrt(F.sum(F.col("weight") * F.col("weight")).over(w)),
        )
    long_form = weighted.select(id_column, "bucket", "weight")
    if not as_vector:
        return long_form

    dense = (
        long_form.groupBy(id_column)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket").cast("int"), F.col("weight")))
            ).alias("__m")
        )
        .withColumn(
            dest,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.element_at(F.col("__m"), i), F.lit(0.0)),
            ),
        )
        .select(id_column, dest)
    )
    zero = F.array_repeat(F.lit(0.0), dim)
    return (
        df.join(dense, on=id_column, how="left")
        .withColumn(dest, F.coalesce(F.col(dest), zero))
    )
