"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force cosine top-k against one query vector:
  the query is a LITERAL array folded into the plan (broadcast by
  construction), similarity is ``zip_with``/``aggregate`` codegen, and
  top-k is ``orderBy(...).limit(k)`` which Spark executes as
  per-partition TakeOrdered + driver merge of k·p candidates — no full
  sort, no shuffle of the data.
* ``ivf_topk`` — IVF-style: rank cluster centroids (one small agg),
  scan only the ``nprobe`` nearest clusters (partition-pruned filter),
  then brute-force inside.  With a cluster column from KMeans (Spark ML)
  or any partitioner, the scan cost drops by ~n_clusters/nprobe.
* ``lsh_bucket_topk`` — random-hyperplane LSH bucketing: sign bits of
  dot products with md5-derived ±1 hyperplanes (deterministic across
  engines); candidates = same-bucket rows, then exact re-rank.

Reference has no similarity search — these are the training-data
pipeline extensions (see build brief).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyjanitor_spark.operators.dedup import cosine_sim

__all__ = [
    "cosine_topk",
    "ivf_topk",
    "lsh_bucket_topk",
    "hyperplane_bucket",
    "semdedup",
    "centroids",
    "kmeans_assign",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "ivf_pq_topk",
]


def _qvec(query: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query]).cast("array<double>")


# sentinel distinguishing "caller passed max_cluster_size" from the
# 100_000 default — split mode can't enforce the cluster-level row
# gate, and an EXPLICIT cap being silently inactive deserves a warning
# while the mere default does not.  A named class with a readable
# __repr__ so help()/inspect.signature show DEFAULT(100_000) instead
# of a bare object address (ADVICE r12)
class _RowCapUnset:
    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return "DEFAULT(100_000)"


_ROW_CAP_UNSET = _RowCapUnset()

# a cluster counts as a straggler only when it holds at least this
# share of the corpus' embedding cells: below it, other clusters keep
# the cores busy while the big one runs, and the distributed-components
# overhead of split mode outweighs the win (measured crossover,
# SKEW_BENCH_r11 / SCALE.md)
_AUTO_HOT_SHARE = 0.2


def cosine_topk(
    df: DataFrame,
    query: list[float],
    vec_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k: returns (id, cos), ties broken by id."""
    if k < 1:
        raise ValueError("k must be >= 1")
    sim = cosine_sim(F.col(vec_col).cast("array<double>"), _qvec(query))
    return (
        df.select(F.col(id_col), sim.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def centroids(df: DataFrame, vec_col: str, cluster_col: str) -> DataFrame:
    """Elementwise-mean centroid per cluster: posexplode → (cluster,
    pos) avg → re-assemble with array_agg sorted by pos.  One shuffle on
    (cluster,pos); output is n_clusters rows (tiny)."""
    exploded = df.select(
        F.col(cluster_col), F.posexplode(F.col(vec_col).cast("array<double>"))
    )
    # sum in DECIMAL: decimal addition is exact, so the centroid is
    # independent of partitioning/combine order (a double sum is not),
    # making results reproducible across cluster layouts AND engines
    # (the DuckDB oracle recomputes the identical value); the single
    # rounding happens once, at the final cast-to-double division
    per_pos = exploded.groupBy(cluster_col, "pos").agg(
        (
            F.sum(F.col("col").cast("decimal(27,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    return per_pos.groupBy(cluster_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("v")))
        ).alias("__pv")
    ).select(
        cluster_col, F.transform(F.col("__pv"), lambda s: s["v"]).alias("centroid")
    )


def ivf_topk(
    df: DataFrame,
    query: list[float],
    vec_col: str,
    id_col: str,
    cluster_col: str,
    k: int = 10,
    nprobe: int = 3,
    centroids_df: DataFrame | None = None,
) -> DataFrame:
    """IVF search: probe the ``nprobe`` clusters whose centroids are
    most cosine-similar to the query, brute-force only inside them.

    Two bounded small actions: centroid agg (n_clusters rows) and the
    centroid ranking; the big-table scan is filtered to the probed
    clusters (prunes partitions when the table is partitioned by
    cluster).

    ``centroids_df`` — a persisted :func:`centroids` frame
    (``cluster_col``, ``centroid``): pass it to skip the per-query
    centroid aggregation entirely.  The real-deployment pattern: build
    centroids once per corpus version (they're decimal-exact, so the
    persisted file is bit-reproducible), serve every query against the
    stored index — per-query cost is one tiny ranking action plus the
    pruned scan."""
    cents = (
        centroids_df
        if centroids_df is not None
        else centroids(df, vec_col, cluster_col)
    )
    ranked = (
        cents.select(
            F.col(cluster_col),
            cosine_sim(F.col("centroid"), _qvec(query)).alias("ccos"),
        )
        .orderBy(F.col("ccos").desc(), F.col(cluster_col).asc())
        .limit(nprobe)
        .collect()
    )
    probe = [r[cluster_col] for r in ranked]
    return cosine_topk(df.filter(F.col(cluster_col).isin(probe)), query, vec_col, id_col, k)


def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cluster_col: str,
    eps: float = 0.95,
    keep: str = "far",
    checkpoint_dir: str | None = None,
    max_cluster_size: int | None = _ROW_CAP_UNSET,  # type: ignore[assignment]
    check: str = "inline",
    max_cluster_cells: int | None = 200_000_000,
    split: int | str = 1,
    auto_split_cells: int = 25_000_000,
    auto_split_flops: int = 2_000_000_000,
) -> DataFrame:
    """Semantic deduplication over an embedding column (SemDeDup,
    Abbas et al. 2023): within each pre-assigned cluster, rows whose
    cosine similarity exceeds ``eps`` form semantic-duplicate groups;
    keep ONE representative per group — the member FARTHEST from its
    cluster centroid (``keep='far'``, the paper's preferred policy:
    outliers carry more information) or nearest (``keep='near'``), ties
    broken by smallest id.  Returns ``df`` filtered to kept rows.

    Plan shape at 100 TB: ONE shuffle on the cluster key feeds ONE
    Arrow task per cluster, which computes the Σ size² pairwise cosine
    as BLOCKED matrix products (numpy/BLAS — the paper's own
    computation shape; the score-matrix block is capped at ~32 MB so
    task memory is O(cluster·dim), never O(cluster²)) and closes the
    duplicate groups with an in-task union-find — components can never
    span clusters, so the log-round distributed label propagation
    ``near_dup_clusters`` needs for unbounded graphs is unnecessary
    here, and only (id, group) rows ever leave the task (the pair
    stream itself is never shuffled).  Centroids are the decimal-exact
    bounded aggregate reused from :func:`ivf_topk` and join back
    broadcast (n_clusters rows).  ``checkpoint_dir`` is accepted for
    API compatibility and unused: the in-task closure has no iterative
    lineage to checkpoint.

    The Σ size² pair cost is only bounded when clusters are genuinely
    small relative to the corpus — the natural failure mode is feeding a
    billion-row table clustered with ``kmeans_assign(k=8)`` and paying
    (n/8)² per block.  ``max_cluster_size`` makes that cost explicit
    (the same gate pattern as ``embedding_near_dup``'s
    ``allow_cross_join``): any cluster exceeding it aborts the job.
    ``check='inline'`` (default) enforces it INSIDE the per-cluster
    task before any pair work starts — zero extra jobs, the violation
    surfaces as a runtime error naming the offending cluster.
    ``check='eager'`` runs one bounded pre-flight aggregate instead and
    raises ``ValueError`` listing the five largest offenders before any
    heavy work starts (nicer message, one extra scan).  Pass
    ``max_cluster_size=None`` to skip entirely.

    ``max_cluster_cells`` additionally bounds rows × dim float64 CELLS
    per task (default 2e8 ≈ 1.6 GB): a row cap alone under-gates
    high-dim embeddings — 100k rows passes ``max_cluster_size`` but at
    3072 dims is a 2.5 GB matrix before any score block.  Checked
    under the same ``check`` policy (eager uses one ``size(vec)``
    sample per cluster).  Degenerate vectors — null, ragged length, or
    non-finite components — are zero-filled in-task: they group with
    nothing (cosine 0.0 < any positive eps) and survive as singleton
    groups, matching the old expression path's null-pair exclusion
    instead of crashing the task.

    ``split`` > 1 is the HOT-CLUSTER straggler fix: one dominant
    cluster otherwise runs as a single Arrow task while every other
    core idles.  The pair stage becomes triangle-partitioned
    ``embedding_near_dup(split=...)`` sub-tasks — split·(split+1)/2
    balanced tasks per cluster, per-task memory ÷(split/2) — and the
    duplicate groups close through the distributed log-round
    :func:`~pyjanitor_spark.operators.dedup.near_dup_clusters` (which
    is where ``checkpoint_dir`` finally matters: pass a durable path
    on a real cluster).  Output is identical — the in-task union-find
    and min-label propagation both yield min-reachable-id groups.  In
    split mode the cluster-level row gate does not apply
    (``max_cluster_size`` default 100,000 — passing it EXPLICITLY
    together with a split emits a warning instead of silently ignoring
    it, as does ``check='eager'``, whose cluster-level pre-flight is
    replaced by the per-sub-task gates); ``max_cluster_cells`` is
    enforced per SUB-task (the memory-relevant unit).  The quadratic
    pair COST remains — pick ``split ≈ ceil(hot_cluster_rows / 50k)``.

    ``split='auto'`` removes the manual knob entirely: ONE bounded
    pre-flight aggregate (a single collected row — per-cluster rows,
    cells and pair-flops maxima/totals) decides the path.  The split
    pipeline engages only when the in-task path would either ABORT
    (the largest cluster violates ``max_cluster_size`` /
    ``max_cluster_cells``) or STRAGGLE — the largest cluster exceeds a
    per-task budget (``auto_split_cells``, the sub-block matrix
    budget, default 2.5e7 cells ≈ 200 MB float64; or
    ``auto_split_flops``, the pair-work budget ``rows²·dim``
    multiply-adds, default 2e9 ≈ a ~1 s BLAS task) AND holds ≥ 20 %
    of the corpus' total pair work, the measured crossover below
    which other clusters keep the cores busy and distributed
    components costs more than it saves (SCALE.md).  When it engages,
    the per-BLOCK split factor is then sized by the pair stage itself
    (``embedding_near_dup(split='auto')``) — cold clusters run as
    single diagonal tasks, only hot ones fan out.  Output is identical
    to ``split=1`` in every case.
    """
    if keep not in ("far", "near"):
        raise ValueError(f"keep must be 'far' or 'near', got {keep!r}")
    if check not in ("inline", "eager"):
        raise ValueError(f"check must be 'inline' or 'eager', got {check!r}")
    explicit_row_cap = max_cluster_size is not _ROW_CAP_UNSET
    if not explicit_row_cap:
        max_cluster_size = 100_000
    if isinstance(split, str):
        if split != "auto":
            raise ValueError(
                f"split must be an int >= 1 or 'auto', got {split!r}"
            )
        v0 = F.col(vec_col).cast("array<double>")
        st = (
            df.groupBy(cluster_col)
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.coalesce(F.max(F.size(v0)).cast("long"), F.lit(1)).alias(
                    "__d"
                ),
            )
            .agg(
                F.max(F.col("__n") * F.col("__d")).alias("mx_cells"),
                F.max(F.col("__n")).alias("mx_rows"),
                # pair-work n²·d in double (long overflows at ~1e9 rows)
                F.max(
                    F.col("__n").cast("double")
                    * F.col("__n")
                    * F.col("__d")
                ).alias("mx_flops"),
                F.sum(
                    F.col("__n").cast("double")
                    * F.col("__n")
                    * F.col("__d")
                ).alias("tot_flops"),
            )
            .head()  # bounded: exactly one row
        )
        if st is None or st["mx_cells"] is None:
            split_eff: int | str = 1  # empty frame
        else:
            would_abort = (
                max_cluster_size is not None
                and st["mx_rows"] > int(max_cluster_size)
            ) or (
                max_cluster_cells is not None
                and st["mx_cells"] > int(max_cluster_cells)
            )
            over_budget = st["mx_cells"] > int(auto_split_cells) or st[
                "mx_flops"
            ] > float(auto_split_flops)
            straggler = over_budget and st["mx_flops"] >= _AUTO_HOT_SHARE * max(
                1.0, st["tot_flops"]
            )
            split_eff = "auto" if (would_abort or straggler) else 1
    else:
        split_eff = int(split)
        if split_eff < 1:
            raise ValueError("split must be >= 1")
    split_path = split_eff == "auto" or split_eff > 1
    if split_path:
        import warnings

        notes = []
        if explicit_row_cap and max_cluster_size is not None:
            notes.append(
                f"the cluster-level row gate max_cluster_size="
                f"{max_cluster_size} does not apply in split mode "
                f"(pass max_cluster_size=None to silence)"
            )
        if check == "eager":
            notes.append(
                "check='eager' has no cluster-level pre-flight in split "
                "mode; max_cluster_cells is enforced per sub-task instead"
            )
        if notes:
            warnings.warn(
                "semdedup split mode: " + "; ".join(notes),
                UserWarning,
                stacklevel=2,
            )
    if (
        check == "eager"
        and not split_path
        and (max_cluster_size is not None or max_cluster_cells is not None)
    ):
        row_cap = -1 if max_cluster_size is None else int(max_cluster_size)
        cell_cap = -1 if max_cluster_cells is None else int(max_cluster_cells)
        big = (
            df.groupBy(cluster_col)
            .agg(
                F.count(F.lit(1)).alias("__sz"),
                F.max(F.size(F.col(vec_col))).alias("__dim"),
            )
            .filter(
                ((F.lit(row_cap) >= 0) & (F.col("__sz") > row_cap))
                | (
                    (F.lit(cell_cap) >= 0)
                    & (F.col("__sz") * F.col("__dim") > cell_cap)
                )
            )
            .orderBy((F.col("__sz") * F.col("__dim")).desc())
            .limit(5)
            .collect()  # bounded: 5 rows
        )
        if big:
            worst = ", ".join(
                f"{r[cluster_col]}={r['__sz']}rows x {r['__dim']}dims"
                for r in big
            )
            raise ValueError(
                f"semdedup: cluster(s) exceed max_cluster_size="
                f"{max_cluster_size} rows or max_cluster_cells="
                f"{max_cluster_cells} rows*dims ({worst}); the "
                f"within-cluster pair work is quadratic in cluster size "
                f"and task memory is rows*dims*8 bytes — re-cluster with "
                f"a larger k (kmeans_assign) or raise/disable the caps "
                f"explicitly"
            )
    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col), F.col(cluster_col), v.alias("__v"))
    id_t = df.schema[id_col].dataType.simpleString()
    eps_f = float(eps)
    cap = None if max_cluster_size is None else int(max_cluster_size)
    cells_cap = None if max_cluster_cells is None else int(max_cluster_cells)

    # ONE Arrow task per cluster computes the Σ size² pair work as
    # BLOCKED matrix products (the SemDeDup paper's own computation
    # shape) and closes the duplicate groups with an in-task
    # union-find.  vs the previous expression-join pair stage this (a)
    # moves the quadratic inner loop from interpreted HOF lambdas
    # (zip_with/aggregate are CodegenFallback — evaluated per PAIR)
    # into one dgemm per block, and (b) removes the pair-stream
    # shuffle entirely — only (id, group) rows leave the task.  The
    # row-block size bounds the in-task score matrix to ~32 MB, so
    # memory is O(cluster·dim + block·cluster) regardless of cluster
    # size.  cos semantics unchanged: dot/(n1·n2), zero-norm pairs
    # score 0.0.  The max_cluster_size guard aborts IN the task (same
    # job-abort behavior the assert_true window gave, one less window).
    # applyInArrow reads the vector column's flat Arrow buffer as the
    # (n, dim) matrix directly (utils/vecmat.py) — no per-row Python
    # objects at peak; degenerate vectors are zero-filled (singleton
    # groups), and a rows×dim cells cap guards high-dim clusters a
    # row count alone would admit.
    def _cluster_groups(key, tbl):
        import numpy as np
        import pyarrow as pa

        from pyjanitor_spark.utils.vecmat import list_column_matrix

        n_rows = tbl.num_rows
        if cap is not None and n_rows > cap:
            raise ValueError(
                f"semdedup: cluster {key[0]!r} has {n_rows} rows, "
                f"exceeding max_cluster_size={cap}; the within-cluster "
                f"pair work is quadratic in cluster size - re-cluster "
                f"with a larger k (kmeans_assign) or raise/disable "
                f"max_cluster_size"
            )
        ids_arr = tbl.column("__id")
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        if n_rows < 2:
            return pa.table({"__sid": ids_arr, "__grp": ids_arr})
        V, _good, dim = list_column_matrix(tbl.column("__v"))
        if cells_cap is not None and n_rows * dim > cells_cap:
            raise ValueError(
                f"semdedup: cluster {key[0]!r} holds {n_rows} x {dim} "
                f"= {n_rows * dim} embedding cells, exceeding "
                f"max_cluster_cells={cells_cap} (~{cells_cap * 8 >> 30} "
                f"GiB float64 per task); re-cluster with a larger k or "
                f"raise/disable max_cluster_cells"
            )
        ids = ids_arr.to_numpy(zero_copy_only=False)
        norms = np.sqrt((V * V).sum(axis=1))
        # vectorized union-find: labels are parent pointers kept fully
        # shortcut (lab[lab] == lab); per edge batch, hook via
        # scatter-min then pointer-jump to the fixpoint.  Once two rows
        # share a root they share it forever (roots only merge), so
        # per-block fixpoints compose into the global components.  The
        # per-PAIR python loop this replaces was the task bottleneck on
        # duplicate-dense clusters (every qualifying pair paid
        # interpreter cost; replicated corpora qualify ~all pairs).
        lab = np.arange(n_rows, dtype=np.int64)

        def union_edges(lab, u, v):
            while True:
                lu, lv = lab[u], lab[v]
                if np.array_equal(lu, lv):
                    return lab
                m = np.minimum(lu, lv)
                np.minimum.at(lab, lu, m)
                np.minimum.at(lab, lv, m)
                while True:
                    nl = lab[lab]
                    if np.array_equal(nl, lab):
                        break
                    lab = nl

        block = max(1, (1 << 22) // n_rows)
        for s in range(0, n_rows, block):
            e = min(s + block, n_rows)
            S = V[s:e] @ V.T
            denom = norms[s:e, None] * norms[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                C = np.where(denom > 0, S / denom, 0.0)
            bi, j = np.nonzero(C >= eps_f)
            u = bi + s
            keep = u < j  # upper triangle only
            if keep.any():
                lab = union_edges(lab, u[keep], j[keep])
        # representative = min ID in the component (the previous
        # min-reachable-id rule, applied on values not indices)
        rep: dict = {}
        roots = lab.tolist()
        for i, r in enumerate(roots):
            if r not in rep or ids[i] < ids[rep[r]]:
                rep[r] = i
        grp_idx = pa.array(
            np.fromiter((rep[r] for r in roots), dtype=np.int64, count=n_rows)
        )
        return pa.table({"__sid": ids_arr, "__grp": ids_arr.take(grp_idx)})

    if split_path:
        # hot-cluster path: triangle-partitioned pair sub-tasks
        # (embedding_near_dup split=) + distributed min-label
        # components — identical min-reachable-id groups, no
        # single-task straggler.  The per-SUB-TASK cells gate
        # (max_cluster_cells, applied as max_block_cells) still
        # protects task memory; the cluster-level gates don't apply.
        # split_eff == 'auto' defers the per-cluster factor to the
        # pair stage's own window-sized triangle split.
        from pyjanitor_spark.operators.dedup import (
            embedding_near_dup,
            near_dup_clusters,
        )

        pairs = embedding_near_dup(
            base,
            id_col,
            "__v",
            threshold=eps_f,
            block_col=cluster_col,
            max_block_cells=max_cluster_cells,
            split=split_eff,
            auto_split_cells=auto_split_cells,
            auto_split_flops=auto_split_flops,
        )
        grp = near_dup_clusters(
            pairs.select("id_1", "id_2"),
            id_col="__sid",
            dest="__grp",
            checkpoint_dir=checkpoint_dir,
        )
    else:
        grp = (
            base.select(
                F.col(cluster_col), F.col(id_col).alias("__id"), F.col("__v")
            )
            .groupBy(cluster_col)
            .applyInArrow(_cluster_groups, f"__sid {id_t}, __grp {id_t}")
        )
    cents = centroids(df, vec_col, cluster_col)
    # centrality carries EVERY id (base x broadcast centroids), so the
    # group labels attach directly to it — unpaired rows coalesce to
    # singleton groups (their own id); no separate df.select(id) branch
    # and one less join than joining groups and centrality separately
    # LEFT join: a cluster whose vectors are all null/empty produces no
    # centroid row (posexplode emits nothing) — its members must still
    # flow through as singletons (__cent null), not silently vanish
    centrality = base.join(F.broadcast(cents), cluster_col, "left").select(
        F.col(id_col),
        cosine_sim(F.col("__v"), F.col("centroid").cast("array<double>")).alias(
            "__cent"
        ),
    )
    groups = centrality.join(
        grp.withColumnRenamed("__sid", id_col), id_col, "left"
    ).withColumn("__grp", F.coalesce(F.col("__grp"), F.col(id_col)))
    # keeper = rank-1 row of the (order, id) window: row_number + rn=1
    # plans as Window + WindowGroupLimit (per-partition top-1 pushdown)
    # — measured FASTER than the equivalent min_by-over-struct
    # aggregation, which falls to SortAggregate (struct ordering has no
    # hash-agg buffer) and re-sorts twice
    order = F.col("__cent").asc() if keep == "far" else F.col("__cent").desc()
    w = Window.partitionBy("__grp").orderBy(order, F.col(id_col).asc())
    kept = (
        groups.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col)
    )
    return df.join(kept, id_col, "left_semi")


def hyperplane_bucket(
    vec: Column, dim: int, planes: int = 8, seed: str = "lsh"
) -> Column:
    """LSH bucket id: for plane p, sign of Σ_d s(p,d)·v_d with s(p,d) =
    ±1 from the low bit of md5(f'{seed}:{p}:{d}') — deterministic and
    engine-portable.  Returns a ``planes``-char '0'/'1' string."""
    import hashlib

    bits = []
    for p in range(planes):
        signs = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            signs.append(1.0 if int(h[-1], 16) & 1 else -1.0)
        # one zip_with+aggregate per plane instead of a dim-term sum
        # tree: ~16x fewer codegen nodes, so Janino compile time (the
        # dominant cost for small inputs) stays flat as dim grows
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucket_topk(
    df: DataFrame,
    query: list[float],
    vec_col: str,
    id_col: str,
    k: int = 10,
    planes: int = 8,
) -> DataFrame:
    """ANN via hyperplane-LSH: exact re-rank within the query's bucket.
    The hyperplane signs are hashed constants folded into the plan —
    the bucket assignment is a pure projection (scan-time)."""
    dim = len(query)
    bucketed = df.withColumn(
        "__bkt", hyperplane_bucket(F.col(vec_col).cast("array<double>"), dim, planes)
    )
    import hashlib

    qbits = ""
    for p in range(planes):
        acc = 0.0
        for d in range(dim):
            h = hashlib.md5(f"lsh:{p}:{d}".encode()).hexdigest()
            s = 1.0 if int(h[-1], 16) & 1 else -1.0
            acc += s * float(query[d])
        qbits += "1" if acc > 0 else "0"
    return cosine_topk(
        bucketed.filter(F.col("__bkt") == qbits), query, vec_col, id_col, k
    )


# above this many centroids, assignment rides a one-row broadcast of the
# centroid data instead of O(k*dim) plan literals — large literal trees
# break whole-stage codegen and eventually Janino's 64 KB method limit
_KMEANS_LITERAL_MAX = 64


def _argmin_cluster(v: Column, cents: list[list[float]]) -> Column:
    """0-based index of the nearest centroid by squared Euclidean
    distance; ties take the lowest index (both engines' first-match)."""
    from pyjanitor_spark.utils.expr import let

    def dists(vv: Column) -> Column:
        d = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        vv,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in cents
            ]
        )
        return let(
            d, lambda arr: (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        )

    return let(v, dists)


def _argmin_cluster_data(v: Column, cents_arr: Column) -> Column:
    """Data-driven twin of :func:`_argmin_cluster`: centroids arrive as
    an ``array<array<double>>`` COLUMN (one broadcast row), so the plan
    is O(1) size regardless of k.  Same first-min tie semantics."""
    from pyjanitor_spark.utils.expr import let

    def dists(vv: Column) -> Column:
        d = F.transform(
            cents_arr,
            lambda c: F.aggregate(
                F.zip_with(vv, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return let(
            d, lambda arr: (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        )

    return let(v, dists)


def _with_cluster(
    df: DataFrame, v: Column, cents: list[list[float]], dest: str
) -> DataFrame:
    """Attach the nearest-centroid index as ``dest``.  Small k folds the
    centroids into the plan as literals (pure projection, scan-time);
    above ``_KMEANS_LITERAL_MAX`` the centroids ride ONE broadcast row
    cross-joined in, keeping the expression tree O(1) while the data
    plane carries the k*dim doubles."""
    if len(cents) <= _KMEANS_LITERAL_MAX:
        return df.withColumn(dest, _argmin_cluster(v, cents))
    cdf = df.sparkSession.createDataFrame(
        [([list(map(float, c)) for c in cents],)],
        "__cents array<array<double>>",
    )
    return (
        df.crossJoin(F.broadcast(cdf))
        .withColumn(dest, _argmin_cluster_data(v, F.col("__cents")))
        .drop("__cents")
    )


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 2,
    dest: str = "cluster",
    seed: str = "km",
) -> DataFrame:
    """Deterministic Lloyd k-means over an embedding column — the
    cluster-assignment producer for :func:`ivf_topk` / :func:`semdedup`
    when no natural partition exists.

    Engine-reproducible by construction (no RNG): initial centroids are
    the ``k`` rows with the smallest ``md5(seed:id)`` (a fixed hash
    permutation); each Lloyd round recomputes centroids with the same
    DECIMAL-exact elementwise mean as :func:`centroids` (order- and
    layout-independent); assignment is first-min squared-Euclidean.
    Clusters that lose every member keep their previous centroid.

    Cost: ``iters`` scans, each with one (cluster, pos)-keyed shuffle
    for the centroid update and one bounded k-row collect (the
    documented iterative-algorithm exception, same as
    ``near_dup_clusters``).  Assignment is a pure projection: for small
    ``k`` the centroids fold into the plan as literals; beyond
    ``_KMEANS_LITERAL_MAX`` (64) they ride a single broadcast row so the
    expression tree stays O(1) regardless of ``k`` (large literal trees
    would break whole-stage codegen).  This is fixed-round Lloyd, not
    convergence-driven: ``iters`` bounds cost explicitly.  ``k`` is
    clamped to the row count when the input is smaller than ``k``.
    """
    if k < 1 or iters < 0:
        raise ValueError("k >= 1 and iters >= 0 required")
    v = F.col(vec_col).cast("array<double>")
    # pin the (hash, vector) working set once: Lloyd re-reads it per
    # round (seed scan + one scan per iteration), and each unpinned
    # read re-runs the source scan and the array cast — the standard
    # iterative-trainer input cache (Spark MLlib KMeans persists its
    # input the same way).  The final assignment projects over the
    # caller's full frame and is not served by the pin.
    base = df.select(
        v.alias("__v"),
        F.md5(
            F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
        ).alias("__h"),
    ).localCheckpoint(eager=False)
    seeds = (
        base.orderBy("__h")
        .limit(k)  # bounded: k rows
        .collect()
    )
    if not seeds:
        raise ValueError("kmeans_assign: input DataFrame is empty")
    # fewer rows than k: clamp — every row is its own centroid and the
    # extra clusters could never win an assignment anyway
    k = min(k, len(seeds))
    cents = [list(r["__v"]) for r in seeds]
    for _ in range(iters):
        assigned = _with_cluster(base, F.col("__v"), cents, "__c").select(
            F.col("__c"), F.col("__v")
        )
        per_pos = (
            assigned.select(F.col("__c"), F.posexplode(F.col("__v")))
            .groupBy("__c", "pos")
            .agg(
                (
                    F.sum(F.col("col").cast("decimal(27,10)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
        )
        rows = (
            per_pos.groupBy("__c")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ).alias("__pm")
            )
            .select(
                "__c", F.transform(F.col("__pm"), lambda s: s["m"]).alias("cv")
            )
            .collect()  # bounded: k rows
        )
        got = {r["__c"]: list(r["cv"]) for r in rows}
        cents = [got.get(i, cents[i]) for i in range(k)]
    return _with_cluster(df, v, cents, dest)


# --- Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search") — the compressed-domain ANN scale path:
# m sub-codebooks of k centroids quantize each vector to m small codes
# (dim*4 bytes -> m bytes), and queries score candidates through
# asymmetric distance computation (ADC): a tiny m*k lookup table built
# once per query, folded into the plan as literals.  At 100 TB the
# embedding column is the dominant payload; scanning codes instead of
# raw floats is a ~dim*4/m reduction in bytes moved.


def _pq_slices(v: Column, m: int, dsub: int) -> list[Column]:
    return [F.slice(v, s * dsub + 1, dsub) for s in range(m)]


def _pq_train_cents(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int,
    k: int,
    iters: int,
    seed: str,
) -> list[list[list[float]]]:
    """Deterministic per-subspace Lloyd, all ``m`` subspaces in ONE scan
    per round.  Same reproducibility contract as :func:`kmeans_assign`:
    k global seed rows by ``md5(seed:id)`` (each subspace initializes
    from the same rows' slices), DECIMAL-exact per-(subspace, cluster,
    position) means, first-min tie-break, empty clusters keep their
    previous centroid.  Bounded collects only (k seed rows; m*k centroid
    rows per round)."""
    if m < 1 or k < 1 or iters < 0:
        raise ValueError("m >= 1, k >= 1 and iters >= 0 required")
    v = F.col(vec_col).cast("array<double>")
    # iterative-trainer input cache (see kmeans_assign): the seed scan
    # and every Lloyd round re-read the cast vectors
    base = df.select(
        v.alias("__v"),
        F.md5(
            F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
        ).alias("__h"),
    ).localCheckpoint(eager=False)
    seeds = (
        base.orderBy("__h")
        .limit(k)  # bounded: k rows
        .collect()
    )
    if not seeds:
        raise ValueError("pq_train: input DataFrame is empty")
    k = min(k, len(seeds))
    dim = len(seeds[0]["__v"])
    if dim % m:
        raise ValueError(f"vector dim {dim} is not divisible by m={m}")
    dsub = dim // m
    cents = [
        [list(r["__v"][s * dsub : (s + 1) * dsub]) for r in seeds[:k]]
        for s in range(m)
    ]
    if iters:
        # one broadcast row carries all m codebooks; the per-row subspace
        # explode keys every Lloyd statistic by (subspace, cluster, pos)
        # so a single shuffle per round updates every codebook
        spark = df.sparkSession
        for _ in range(iters):
            cdf = spark.createDataFrame(
                [(cents,)], "__cb array<array<array<double>>>"
            )
            assigned = (
                base.select(
                    F.posexplode(
                        F.array(*_pq_slices(F.col("__v"), m, dsub))
                    )
                )
                .withColumnRenamed("pos", "__s")
                .withColumnRenamed("col", "__sv")
                .crossJoin(F.broadcast(cdf))
                .select(
                    "__s",
                    "__sv",
                    _argmin_cluster_data(
                        F.col("__sv"),
                        F.element_at(F.col("__cb"), F.col("__s") + 1),
                    ).alias("__c"),
                )
            )
            rows = (
                assigned.select("__s", "__c", F.posexplode(F.col("__sv")))
                .groupBy("__s", "__c", "pos")
                .agg(
                    (
                        F.sum(F.col("col").cast("decimal(27,10)")).cast("double")
                        / F.count(F.lit(1))
                    ).alias("m")
                )
                .groupBy("__s", "__c")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("m")))
                    ).alias("__pm")
                )
                .select(
                    "__s",
                    "__c",
                    F.transform(F.col("__pm"), lambda x: x["m"]).alias("cv"),
                )
                .collect()  # bounded: m*k rows
            )
            got = {(r["__s"], r["__c"]): list(r["cv"]) for r in rows}
            cents = [
                [got.get((s, c), cents[s][c]) for c in range(k)] for s in range(m)
            ]
    return cents


def pq_train(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    seed: str = "pq",
) -> DataFrame:
    """Train product-quantization codebooks; returns a BOUNDED frame of
    ``m * k`` rows ``(sub, code, centroid array<double>)`` — persistable
    to parquet and accepted by :func:`pq_encode` / :func:`pq_topk`
    (the :func:`bpe_train` model-table pattern)."""
    cents = _pq_train_cents(df, vec_col, id_col, m, k, iters, seed)
    rows = [
        (s, c, list(map(float, cents[s][c])))
        for s in range(len(cents))
        for c in range(len(cents[s]))
    ]
    return df.sparkSession.createDataFrame(
        rows, "sub int, code int, centroid array<double>"
    )


def _pq_collect_cents(codebooks: DataFrame) -> list[list[list[float]]]:
    rows = codebooks.collect()  # bounded: m*k rows by construction
    m = 1 + max(r["sub"] for r in rows)
    k = 1 + max(r["code"] for r in rows)
    cents = [[None] * k for _ in range(m)]
    for r in rows:
        cents[r["sub"]][r["code"]] = list(r["centroid"])
    if any(c is None for sub in cents for c in sub):
        raise ValueError("codebooks frame is missing (sub, code) entries")
    return cents


def _pq_codes(v: Column, cents: list[list[list[float]]]) -> Column:
    """array<int> of length m: per-subspace nearest-centroid index.
    Small codebooks (total centroids <= _KMEANS_LITERAL_MAX) fold into
    the plan as literals — a pure scan-time projection."""
    m = len(cents)
    dsub = len(cents[0][0])
    return F.array(
        *[
            _argmin_cluster(sv, cents[s])
            for s, sv in enumerate(_pq_slices(v, m, dsub))
        ]
    )


def _pq_codes_data(v: Column, cb: Column, m: int, dsub: int) -> Column:
    """Data-driven twin of :func:`_pq_codes`: codebooks arrive as one
    broadcast ``array<array<array<double>>>`` row, keeping the
    expression tree O(1) for large ``m * k``."""
    return F.array(
        *[
            _argmin_cluster_data(sv, F.element_at(cb, s + 1))
            for s, sv in enumerate(_pq_slices(v, m, dsub))
        ]
    )


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: DataFrame,
    dest: str = "pq_code",
) -> DataFrame:
    """Quantize ``vec_col`` to ``m`` codebook indices (``array<int>``) —
    the compressed representation ADC search scans instead of raw
    vectors.  Pure projection: literal codebooks up to
    ``_KMEANS_LITERAL_MAX`` total centroids, one broadcast row beyond
    (the documented 1-row attach)."""
    cents = _pq_collect_cents(codebooks)
    v = F.col(vec_col).cast("array<double>")
    total = sum(len(sub) for sub in cents)
    if total <= _KMEANS_LITERAL_MAX:
        return df.withColumn(dest, _pq_codes(v, cents))
    m, dsub = len(cents), len(cents[0][0])
    cdf = df.sparkSession.createDataFrame(
        [(cents,)], "__cb array<array<array<double>>>"
    )
    return (
        df.crossJoin(F.broadcast(cdf))
        .withColumn(dest, _pq_codes_data(v, F.col("__cb"), m, dsub))
        .drop("__cb")
    )


def pq_topk(
    df: DataFrame,
    query: list[float],
    vec_col: str,
    id_col: str,
    k: int = 10,
    m: int = 8,
    codebook_k: int = 16,
    iters: int = 2,
    codebooks: DataFrame | None = None,
    code_col: str | None = None,
    seed: str = "pq",
) -> DataFrame:
    """ADC top-k: approximate nearest neighbors of ``query`` by summed
    per-subspace distances to each row's quantized code.

    The query-side distance table (``m * codebook_k`` floats) is
    computed on the driver and folded into the plan as literals, so the
    scan does ``m`` array lookups + adds per row — no join, no shuffle;
    top-k is TakeOrdered exactly like :func:`cosine_topk`.  Pass
    ``codebooks`` (from :func:`pq_train`) to reuse a trained model and
    ``code_col`` to score pre-encoded rows (the compressed-scan path —
    at scale you encode once and drop the raw vectors); otherwise
    trains + encodes inline.  Returns ``(id, adc_dist)`` ascending,
    ties by id."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if code_col is not None and codebooks is None:
        # pre-encoded codes index SOME codebook's centroids; retraining
        # here would score them against fresh (seed/m/k-dependent)
        # centroids with no error — only correct by coincidence
        raise ValueError(
            "code_col requires codebooks: pre-encoded codes are only "
            "meaningful against the codebooks that produced them "
            "(pass the pq_train output used at encode time)"
        )
    if codebooks is not None:
        cents = _pq_collect_cents(codebooks)
    else:
        cents = _pq_train_cents(df, vec_col, id_col, m, codebook_k, iters, seed)
    mm = len(cents)
    if len(query) != mm * len(cents[0][0]):
        raise ValueError(
            f"query dim {len(query)} != codebook dim {mm * len(cents[0][0])}"
        )
    dsub = len(cents[0][0])
    # ADC table: table[s][c] = ||q_s - cent[s][c]||^2, tiny and literal
    table = [
        [
            sum(
                (float(query[s * dsub + i]) - float(cent[i])) ** 2
                for i in range(dsub)
            )
            for cent in cents[s]
        ]
        for s in range(mm)
    ]
    if code_col is not None:
        codes = F.col(code_col)
    else:
        codes = _pq_codes(F.col(vec_col).cast("array<double>"), cents)
    dist = None
    for s in range(mm):
        term = F.element_at(
            F.array(*[F.lit(x) for x in table[s]]),
            F.element_at(codes, s + 1) + 1,
        )
        dist = term if dist is None else dist + term
    return (
        df.select(F.col(id_col), dist.alias("adc_dist"))
        # nulls LAST to match cosine_topk's contract: a null vector /
        # null pre-encoded code must not occupy top-k slots (Spark's
        # plain .asc() is NULLS FIRST)
        .orderBy(F.col("adc_dist").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_pq_topk(
    df: DataFrame,
    query: list[float],
    vec_col: str,
    id_col: str,
    cluster_col: str,
    k: int = 10,
    nprobe: int = 3,
    m: int = 8,
    codebook_k: int = 16,
    iters: int = 2,
    codebooks: DataFrame | None = None,
    code_col: str | None = None,
    centroids_df: DataFrame | None = None,
    seed: str = "pq",
) -> DataFrame:
    """IVF-PQ: the standard billion-scale ANN recipe — centroid-ranked
    cluster pruning (:func:`ivf_topk`'s routing) feeding the compressed
    ADC scan (:func:`pq_topk`).

    Codebooks are GLOBAL (trained on the full frame when not given), so
    one stored codebook + stored codes serve every query; only the
    ``nprobe`` nearest clusters are scanned, and inside them the scan
    reads ``m`` bytes per row instead of ``dim*4``.  The deployment
    pattern: persist :func:`centroids` + :func:`pq_train` outputs once
    per corpus version, :func:`pq_encode` on write — per-query cost is
    two tiny bounded actions (cluster ranking, codebook collect) plus
    the pruned compressed scan."""
    if code_col is not None and codebooks is None:
        # same contract as pq_topk: pre-encoded codes only score
        # correctly against the codebooks that produced them
        raise ValueError(
            "code_col requires codebooks: pre-encoded codes are only "
            "meaningful against the codebooks that produced them"
        )
    cents = (
        centroids_df
        if centroids_df is not None
        else centroids(df, vec_col, cluster_col)
    )
    ranked = (
        cents.select(
            F.col(cluster_col),
            cosine_sim(F.col("centroid"), _qvec(query)).alias("ccos"),
        )
        .orderBy(F.col("ccos").desc(), F.col(cluster_col).asc())
        .limit(nprobe)
        .collect()
    )
    probe = [r[cluster_col] for r in ranked]
    if codebooks is None:
        codebooks = pq_train(df, vec_col, id_col, m, codebook_k, iters, seed)
    return pq_topk(
        df.filter(F.col(cluster_col).isin(probe)),
        query,
        vec_col,
        id_col,
        k=k,
        codebooks=codebooks,
        code_col=code_col,
    )
