"""PageRank as iterative DataFrame algebra (SURVEY.md §2.6 G1-G3).

Reference semantics (ref: Ranker/PageRank.java:14-105):
  damping d = 0.85, epsilon = 1e-5
  init rank = 1/N
  per iteration:
    dangling = Σ rank(v) over zero-outdegree v        (:63-72)
    rank'(i) = (1-d)/N + d·Σ_{j→i} rank(j)/out(j) + d·dangling/N  (:75-90)
  converge when EVERY node moves <= ε (max-delta criterion, :93-100)

The reference's inner loop is O(V²·E) (a linear `contains` scan per node
pair); here each iteration is one join + one aggregation:

  contribs = edges ⋈ ranks on src  → (dst, rank/out_deg)
  new_ranks = contribs.groupBy(dst).sum + teleport + dangling term

Scale design:
  * edges are deduped once up front (the reference dedups adjacency with a
    `contains` check, DataBaseManager.java:49-53).
  * out-degrees are computed once and JOINED onto ranks (not recomputed).
  * ranks are repartitioned by node id once; the per-iteration join is
    then co-partitioned (edges pre-partitioned by src) — a single shuffle
    of the (small) rank table per iteration, never the edge table.
  * lineage is cut with localCheckpoint every ``checkpoint_every``
    iterations, otherwise 50+ iterations blow the plan up exponentially.
  * convergence = F.max(abs(new-old)) — one tiny agg per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import DEFAULT, EngineConfig
from search_engine_spark.session import local_df


def edges_from_links(links: DataFrame, docs: DataFrame) -> DataFrame:
    """G1 graph load: resolve (src_doc_id, target_url) link rows against
    the doc table's url column into (src, dst) edges, deduped
    (ref: Data/DataBaseManager.java:37-57)."""
    return (
        links.join(docs, links["extracted_link"] == docs["url"], "inner")
        .select(
            links["doc_id"].alias("src"), docs["id"].alias("dst")
        )
        .distinct()
    )


def _pagerank_local(
    spark,
    edges: DataFrame,
    nodes: DataFrame,
    n: int,
    cfg: EngineConfig,
    init: dict[int, float] | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Driver-side numpy fixpoint — same update rule and ε criterion as
    the distributed loop (G2: teleport + d·(in-sum + dangling/N), max
    all-node delta ≤ ε), chosen when the graph fits comfortably on the
    driver. One scatter-add per iteration instead of one Spark job."""
    import numpy as np

    node_ids = np.array(
        [r["doc_id"] for r in nodes.collect()], dtype=np.int64
    )
    node_ids.sort()
    pos = {int(v): i for i, v in enumerate(node_ids)}
    e = edges.collect()
    # out-degree counts EVERY edge leaving a node (even to targets
    # outside the node set), matching the distributed loop's
    # groupBy(src).count(); only contributions to known nodes land.
    out_deg = np.zeros(n, dtype=np.float64)
    keep = []
    for r in e:
        s = pos.get(r["src"])
        if s is None:
            continue
        out_deg[s] += 1.0
        t = pos.get(r["dst"])
        if t is not None:
            keep.append((s, t))
    src = np.array([s for s, _ in keep], dtype=np.int64)
    dst = np.array([t for _, t in keep], dtype=np.int64)
    d, eps = cfg.pagerank_damping, cfg.pagerank_epsilon
    if init:
        rank = np.array(
            [init.get(int(v), 1.0 / n) for v in node_ids], dtype=np.float64
        )
        rank /= rank.sum() or 1.0
    else:
        rank = np.full(n, 1.0 / n)
    iters = 0
    for _ in range(cfg.pagerank_max_iter):
        iters += 1
        dangling = float(rank[out_deg == 0].sum())
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] / out_deg[src])
        new = (1.0 - d) / n + d * (contrib + dangling / n)
        if float(np.abs(new - rank).max()) <= eps:
            rank = new
            break
        rank = new
    if stats is not None:
        stats["iterations"] = iters
        stats["n"] = n
    return local_df(
        spark,
        [(int(i), float(r)) for i, r in zip(node_ids, rank)],
        "doc_id: long, page_rank: double",
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    cfg: EngineConfig = DEFAULT,
    init_ranks: DataFrame | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """G2 iterate: returns (doc_id, page_rank).

    ``nodes``: one-column DataFrame of node ids; defaults to the ids seen
    in the edge list (the reference iterates over all doc ids — pass the
    docs projection to include isolated nodes).

    ``init_ranks``: optional (doc_id, page_rank) warm-start vector — e.g.
    the PREVIOUS generation's ranks after an incremental index merge
    (merge.py / streaming/live_index.py publish new docs whose graph
    differs only by the delta). The d=0.85 teleport iteration is an
    L1-contraction with factor d, so ANY start converges to the SAME
    unique fixpoint — warm-starting changes only the iteration count
    (log(δ0)/log(d) fewer rounds when the previous ranks are δ0-close),
    never the answer. Nodes absent from ``init_ranks`` (new docs) start
    at 1/N; the vector is renormalized to sum 1 over the current node
    set so dangling mass stays a probability. At 100 TB each saved
    iteration is a full edge-table join — warm-start is the difference
    between ~5 and ~60 shuffles per nightly rank refresh.

    ``stats``: optional dict; filled with {"iterations", "n"} for
    convergence evidence / ops metrics.
    """
    spark = edges.sparkSession
    edges = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()

    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("doc_id"))
            .unionByName(edges.select(F.col("dst").alias("doc_id")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("doc_id")).distinct()

    shuffle_n = int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    nodes = nodes.repartition(shuffle_n, "doc_id").persist()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("page_rank", F.lit(0.0))

    if n <= cfg.pagerank_local_threshold:
        init = None
        if init_ranks is not None:
            c0, c1 = init_ranks.columns[:2]
            init = {
                int(r[c0]): float(r[c1])
                for r in init_ranks.select(c0, c1).collect()
                if r[c1] is not None
            }
        return _pagerank_local(
            spark, edges, nodes, n, cfg, init=init, stats=stats
        )

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # node table with out-degree (0 for dangling) — partitioned by id once;
    # the edge table is pre-partitioned by src so the per-iteration join of
    # ranks (partitioned by doc_id) with edges (by src) lines up.
    base = (
        nodes.join(out_deg, nodes["doc_id"] == out_deg["src"], "left")
        .select("doc_id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .repartition(shuffle_n, "doc_id")
        .persist()
    )
    edges = edges.repartition(shuffle_n, "src").persist()
    edges.count()  # materialize

    d = cfg.pagerank_damping
    eps = cfg.pagerank_epsilon
    teleport = (1.0 - d) / n

    if init_ranks is None:
        ranks = base.select(
            "doc_id", "out_deg", F.lit(1.0 / n).alias("rank")
        )
    else:
        c0, c1 = init_ranks.columns[:2]
        ir = init_ranks.select(
            F.col(c0).cast("long").alias("doc_id"),
            F.col(c1).cast("double").alias("r0"),
        )
        warm = (
            base.join(ir, "doc_id", "left")
            .select(
                "doc_id",
                "out_deg",
                F.coalesce("r0", F.lit(1.0 / n)).alias("rank"),
            )
            .localCheckpoint()
        )
        total = warm.agg(F.sum("rank").alias("s")).collect()[0]["s"] or 1.0
        ranks = warm.select(
            "doc_id", "out_deg", (F.col("rank") / F.lit(total)).alias("rank")
        )
    ranks = ranks.localCheckpoint()
    dangling = (
        ranks.where(F.col("out_deg") == 0)
        .agg(F.sum("rank").alias("s"))
        .collect()[0]["s"]
        or 0.0
    )

    iters = 0
    for it in range(cfg.pagerank_max_iter):
        iters += 1
        contribs = (
            edges.join(ranks, edges["src"] == ranks["doc_id"])
            .select(
                F.col("dst").alias("doc_id"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        new_ranks = (
            base.join(contribs, "doc_id", "left")
            .select(
                "doc_id",
                "out_deg",
                (
                    F.lit(teleport)
                    + F.lit(d)
                    * (F.coalesce("in_sum", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        # localCheckpoint every iteration: the rank table is tiny relative
        # to the corpus and this also materializes it for the convergence
        # agg, so each iteration stays O(1) plan depth.
        new_ranks = new_ranks.localCheckpoint()
        # ONE job per iteration: convergence delta and the NEXT
        # iteration's dangling mass come out of the same aggregation
        row = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "doc_id")
            .agg(
                F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("m"),
                F.sum(
                    F.when(F.col("n.out_deg") == 0, F.col("n.rank"))
                ).alias("s"),
            )
            .collect()[0]
        )
        delta, dangling = row["m"], row["s"] or 0.0
        ranks = new_ranks
        if delta is not None and delta <= eps:
            break

    if stats is not None:
        stats["iterations"] = iters
        stats["n"] = n
    return ranks.select("doc_id", F.col("rank").alias("page_rank"))


def incremental_pagerank(
    edges: DataFrame,
    nodes: DataFrame | None,
    prev_ranks: DataFrame,
    cfg: EngineConfig = DEFAULT,
    stats: dict | None = None,
) -> DataFrame:
    """Rank refresh after an incremental index change (the LSM
    merge/live-generation story: merge_indexes / StreamingLiveIndex
    publish a new doc set whose link graph differs from the previous
    generation by a small delta). Warm-starts the G2 fixpoint from
    ``prev_ranks`` — e.g. the previous generation's saved docs
    projection ``(doc_id, page_rank)`` — and converges to the SAME
    fixpoint as a cold run on the new graph (contraction argument in
    :func:`pagerank`), in ~log(δ0)/log(0.85) fewer edge-join rounds.

    New docs (absent from ``prev_ranks``) start at 1/N; deleted docs
    are dropped by the node-set join; the vector is renormalized. Pass
    ``stats`` to record the realized iteration count — the cold/warm
    iteration gap is the evidence row in BENCH.md."""
    return pagerank(
        edges, nodes, cfg=cfg, init_ranks=prev_ranks, stats=stats
    )


def write_back_pagerank(
    spark,
    docs_path: str,
    edges: DataFrame,
    cfg: EngineConfig = DEFAULT,
    id_col: str = "doc_id",
    warm_start: bool = False,
    stats: dict | None = None,
) -> int:
    """G3 rank write-back (ref Data/DataBaseManager.java:59-74: batched
    ``UPDATE DocumentMetaData SET page_rank = ? WHERE id = ?``): compute
    PageRank over ``edges`` and MERGE the ranks onto the docs table at
    ``docs_path`` as its ``page_rank`` column (docs absent from the graph
    keep/get 0.0 — the reference's column default).

    Parquet has no in-place UPDATE, so the merge is a staged rewrite with
    a directory swap (write to ``<path>.staging``, rename the live dir to
    ``<path>.old``, rename staging in, drop old). The two renames are NOT
    one atomic operation: a crash between them leaves the table at
    ``<path>.old`` — which this function self-heals on the next call (and
    requires a driver-local POSIX path; on object stores / HDFS use the
    Iceberg form, where this whole function is one ``MERGE INTO``
    snapshot commit and the staging dance disappears). Single-writer,
    no-concurrent-readers contract (ADVICE r02): a reader with a lazy
    DataFrame over ``docs_path`` that scans DURING the swap fails or
    reads nothing while the directory is momentarily absent — schedule
    the write-back in a maintenance window, or use the Iceberg form
    whose snapshot commit readers never observe mid-flight. Returns the
    number of docs that received a nonzero rank."""
    import os
    import shutil

    old = docs_path.rstrip("/") + ".old"
    if not os.path.exists(docs_path) and os.path.exists(old):
        # crash window between the two renames on a previous run: the
        # pre-merge table is intact at .old — restore it and redo
        os.rename(old, docs_path)

    docs = spark.read.parquet(docs_path)
    init = None
    if warm_start and "page_rank" in docs.columns:
        # nightly-refresh shape: the docs table already carries the
        # previous run's ranks — warm-start from them (docs with 0.0 /
        # null were unranked; let them default to 1/N)
        init = docs.select(
            F.col(id_col).alias("doc_id"), "page_rank"
        ).where(F.coalesce(F.col("page_rank"), F.lit(0.0)) > 0.0)
        if init.limit(1).count() == 0:
            init = None
    pr = pagerank(
        edges,
        docs.select(F.col(id_col).alias("doc_id")),
        cfg=cfg,
        init_ranks=init,
        stats=stats,
    )
    merged = (
        docs.drop("page_rank")
        .join(
            pr.withColumnRenamed("doc_id", id_col), id_col, "left"
        )
        .withColumn("page_rank", F.coalesce(F.col("page_rank"), F.lit(0.0)))
    )
    staging = docs_path.rstrip("/") + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    n_ranked = (
        spark.read.parquet(staging).where(F.col("page_rank") > 0.0).count()
    )
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(docs_path, old)
    os.rename(staging, docs_path)
    shutil.rmtree(old)
    return n_ranked


def repo_link_graph(corpus: DataFrame) -> DataFrame:
    """Synthetic link graph for the source-code corpus (SURVEY.md §7
    Phase 3): docs in the same repo form a ring (each file links to the
    next file id in its repo), and each repo's first file links to the
    first file of the lexicographically next repo — deterministic,
    connected-ish, with dangling tails. Pure DataFrame ops (windows over
    repo partitions, no driver loop)."""
    from pyspark.sql import Window

    w = Window.partitionBy("repo").orderBy("doc_id")
    intra = (
        corpus.select("repo", "doc_id")
        .withColumn("nxt", F.lead("doc_id").over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.col("doc_id").alias("src"), F.col("nxt").alias("dst"))
    )
    # inter-repo chain, DISTRIBUTED (VERDICT r02 #7: a bare
    # Window.orderBy("repo") is a single-partition sort over one row per
    # repo — a straggler at tens of millions of repos): range-partition
    # the repo heads, lead() WITHIN each range partition, then stitch
    # partition boundaries through a per-partition min/max aggregate.
    # The only single-partition work left is the boundary window over
    # ONE ROW PER SHUFFLE PARTITION — metadata-scale at any corpus size.
    firsts = corpus.groupBy("repo").agg(F.min("doc_id").alias("head"))
    parts = firsts.repartitionByRange("repo").withColumn(
        "pid", F.spark_partition_id()
    )
    wp = Window.partitionBy("pid").orderBy("repo")
    within = (
        parts.withColumn("nxt_head", F.lead("head").over(wp))
        .where(F.col("nxt_head").isNotNull())
        .select(F.col("head").alias("src"), F.col("nxt_head").alias("dst"))
    )
    bounds = parts.groupBy("pid").agg(
        F.min_by("head", "repo").alias("first_head"),
        F.max_by("head", "repo").alias("last_head"),
    )
    wb = Window.orderBy("pid")  # tiny: one row per range partition
    cross = (
        bounds.withColumn("nxt_first", F.lead("first_head").over(wb))
        .where(F.col("nxt_first").isNotNull())
        .select(
            F.col("last_head").alias("src"),
            F.col("nxt_first").alias("dst"),
        )
    )
    return intra.unionByName(within).unionByName(cross)
