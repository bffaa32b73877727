"""Deduplication operators for large-scale training-data pipelines.

All candidate generation is expressed as joins/aggregations Catalyst can
plan (no driver-side pairwise loops):

  * exact_dedup        — hash-groupBy (one shuffle on the hash)
  * shingles           — word n-gram shingling, JVM-side array ops
  * ngram_jaccard_pairs— shingle-inverted-index self-join: pairs sharing a
                         shingle -> |∩| by groupBy, |∪| from per-doc sizes
  * minhash_signatures — K min-hashes: one 32-bit hash per shingle, K
                         arithmetic permutations (a_i*h+b_i) mod p
  * minhash_lsh_pairs  — banded LSH: candidates share >=1 band, verified
                         with exact Jaccard
  * simhash            — 60-bit fingerprint from per-term hash bit votes

Scale notes:
  * ``max_shingle_df`` caps the posting length of one shingle in the
    pair-join (a boilerplate shingle shared by 1e6 docs would otherwise
    create 1e12 candidate rows). Dropped shingles only lose candidate
    RECALL for near-dup detection of boilerplate — the exact verify step
    is unaffected. Set None to disable (the SQL-oracle-checked config).
  * min-hash hashes each shingle ONCE (32 bits of md5) and derives the K
    permutations arithmetically — sig_i = min((a_i*h + b_i) mod p) with
    p the smallest prime > 2^32 and a_i < 2^31 so every product fits a
    signed 64-bit integer in both Spark and standard SQL (enables the
    DuckDB oracle, no custom UDF). One hash + K multiplies per shingle
    instead of K md5s: the signature stage is ~K× cheaper, which at
    100 TB is the difference between one content pass and K.
  * simhash uses the first 15 hex chars (60 bits) of md5 so the value
    fits a signed 64-bit integer in both Spark and standard SQL.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 60

# --- min-hash permutation family: sig_i(h) = (a_i*h + b_i) mod MH_P ---
# MH_P: smallest prime > 2^32 (so every 32-bit shingle hash is a distinct
# residue); a_i odd < 2^31 keeps a_i*h < 2^63 (no int64 overflow, Spark
# and DuckDB agree exactly). Constants are a fixed Weyl-style sequence —
# deterministic, importable by the oracle-SQL builder.
MH_P = 4294967311
MH_A = [((2654435761 * (2 * i + 1)) % (1 << 31)) | 1 for i in range(64)]
MH_B = [(2246822519 * (i + 1)) % MH_P for i in range(64)]


def _shingle_hash32(s: Column) -> Column:
    """First 8 hex chars of md5 → uniform 32-bit non-negative bigint;
    identical in Spark (`conv`) and DuckDB (`('0x'||hex)::BIGINT`)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct content hash: (content_hash, keep_id, dup_count).
    keep_id = min id (deterministic survivor), mirroring the reference
    crawler's content-hash dedup gate (ref: Crawler/Crawler.java:163-169,
    542-555 — MD5 of content, first writer wins; we keep min-id instead of
    first-arrival because arrival order is nondeterministic in a cluster).
    """
    return (
        df.select(
            F.md5(F.col(text_col)).alias("content_hash"),
            F.col(id_col).alias("id"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("id").alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def shingle_array(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a token array — pure JVM array ops
    (whole-stage codegen, no Python)."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(
                " ", F.slice(tokens, i + 1, n)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(doc_id, shingle) distinct — whitespace tokens, word n-grams."""
    toks = F.split(F.col(text_col), " ")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingle_array(toks, n)).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b, jaccard >= threshold) over word
    n-gram shingle sets. Inverted-index self-join: only pairs sharing at
    least one shingle are ever materialized."""
    sh = doc_shingles(df, text_col, id_col, n)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("sdf"))
            .where(F.col("sdf") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sh = sh.persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def doc_shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(doc_id, shs: array<string>, n_sh): the distinct shingle SET per
    doc, built entirely narrow (``array_distinct`` instead of
    explode→distinct→collect) — zero shuffles, stays in whole-stage
    codegen. Docs with < n tokens yield no row (same as the exploded
    form). Array size is bounded by doc length, so per-row memory is
    bounded at 100 TB too."""
    toks = F.split(F.col(text_col), " ")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.array_distinct(shingle_array(toks, n)).alias("shs"),
        )
        .where(F.size("shs") > 0)
        .withColumn("n_sh", F.size("shs"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """(doc_id, sig_0..sig_{K-1}): K independent min-hashes — each
    shingle hashed ONCE (32-bit md5 prefix), then K arithmetic
    permutations ``min((a_i*h + b_i) mod MH_P)``. Computed narrowly from
    the per-doc shingle array (transform + array_min) — no shuffle at
    all, and one md5 per shingle instead of K."""
    return _minhash_from_sets(
        doc_shingle_sets(df, text_col, id_col, n), num_hashes
    ).drop("shs", "n_sh")


def _minhash_from_sets(sets: DataFrame, num_hashes: int) -> DataFrame:
    if num_hashes > len(MH_A):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the permutation family "
            f"size {len(MH_A)}"
        )

    def sig(i: int) -> Column:
        a, b = MH_A[i], MH_B[i]
        # NB: the transform lambda must be single-argument — a second
        # parameter would be bound to the array index by Spark
        return F.array_min(
            F.transform(
                F.col("_hs32"),
                lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MH_P),
            )
        ).alias(f"sig_{i}")

    hashed = sets.withColumn(
        "_hs32", F.transform(F.col("shs"), _shingle_hash32)
    )
    return hashed.select(
        *sets.columns, *[sig(i) for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Banded-LSH near-dup pairs: candidates share at least one min-hash
    band (band size 1 here: P[collide] = jaccard per band), then exact
    Jaccard verification >= threshold. Returns (doc_a, doc_b, jaccard).

    Plan shape at scale: shingle sets AND signatures are computed in one
    narrow pass over the corpus (no shuffle until the band self-join);
    verification joins the small candidate set back to the per-doc
    shingle arrays and intersects JVM-side (``array_intersect``), so the
    only wide exchanges are the band bucket-join and two doc_id-keyed
    lookups. The per-doc set table is persisted (at 100 TB: a written
    intermediate, same shape)."""
    sets = doc_shingle_sets(df, text_col, id_col, n).persist()
    # eager fill: the signature pass and BOTH verify lookups read `sets`
    # inside one job — a lazy persist lets those branches race to compute
    # the shingle arrays concurrently instead of sharing one cached copy
    sets.count()
    sigs = _minhash_from_sets(sets, num_hashes)
    # stack the K signatures into (band, value, doc_id) rows, bucket-join
    stacked = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.col(f"sig_{i}").alias("val"),
                    )
                    for i in range(num_hashes)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "bv.band", "bv.val")
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # exact verify on candidates only: two doc_id-keyed lookups into the
    # per-doc shingle arrays, then a codegen'd array_intersect — no
    # shingle-level shuffle
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n_sh").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n_sh").alias("nb"),
    )
    n_inter = F.size(F.array_intersect(F.col("shs_a"), F.col("shs_b")))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_inter", n_inter)
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _term_hash60(term: Column) -> Column:
    """First 15 hex chars of md5 → 60-bit non-negative bigint, identical
    in Spark and ANSI SQL (conv/from-hex)."""
    return F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash over the doc's DISTINCT
    whitespace tokens — per bit, majority vote of the token hashes."""
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
        .withColumn("h", _term_hash60(F.col("term")))
    )
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    voted = toks.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else (fp + bit)
    return voted.select("doc_id", fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 60-bit fingerprint into
    ``n_bands`` 15-bit chunks — any pair within hamming distance
    < n_bands shares at least one identical chunk (pigeonhole) — then
    verify exact hamming distance <= max_hamming."""
    fps = simhash(df, text_col, id_col).persist()
    width = SIMHASH_BITS // n_bands
    chunks = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "simhash", "bc.band", "bc.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.withColumn("hamming", ham).where(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")


# --------------------------------------------------------------------------
# embedding-cosine near-dup (the vector-space member of the dedup family)
# --------------------------------------------------------------------------

def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All embedding pairs (id_a < id_b) with cosine >= threshold.

    Brute-force O(n²) self-join — the *correctness baseline / oracle
    anchor*. Never run this shape at 100 TB; use
    ``embedding_dup_pairs_lsh`` (bucket-local join) there. Cosine is a
    JVM fold (``zip_with``/``aggregate``) — no Python on the hot path.
    Reference parity: the dedup family mirrors the content-hash gate at
    Crawler.java:542-555, lifted to vector space."""
    from search_engine_spark.operators.similarity import (
        _dot,
        _norm,
        as_double_array,
    )

    base = emb.select(
        F.col(id_col).cast("long").alias("vid"),
        as_double_array(F.col(vec_col)).alias("v"),
        _norm(as_double_array(F.col(vec_col))).alias("nrm"),
    )
    a, b = base.alias("a"), base.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_dup_pairs_lsh(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: candidate pairs only within the same sign-LSH bucket
    (narrow bucket assignment, then a bucket-keyed equi-join — the
    shuffle is on ``bucket``, so each task joins one bucket locally),
    exact-cosine verified. Trades recall for n²→Σ|bucket|² work; recall
    vs the brute-force baseline is pinned in tests."""
    from search_engine_spark.operators.similarity import lsh_assign_buckets

    bucketed = lsh_assign_buckets(
        emb, dim=dim, n_planes=n_planes, id_col=id_col, vec_col=vec_col
    ).select("vec_id", vec_col, "bucket")
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col(f"a.{vec_col}").alias("va"),
        F.col("b.vec_id").alias("id_b"),
        F.col(f"b.{vec_col}").alias("vb"),
    )
    from search_engine_spark.operators.similarity import (
        _dot,
        _norm,
        as_double_array,
    )

    va, vb = as_double_array(F.col("va")), as_double_array(F.col("vb"))
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return cand.select("id_a", "id_b", cos.alias("cosine")).where(
        F.col("cosine") >= threshold
    )


# ---------------------------------------------------------------------------
# Near-duplicate CLUSTERS: pairs -> connected components -> keep-canonical
# ---------------------------------------------------------------------------


def _components_local(spark, rows) -> DataFrame:
    """Driver-side union-find (path compression + union by min label)
    for sub-threshold pair graphs — exact same (node, min-reachable-id)
    contract as the distributed loop, without one Spark round per
    propagation step."""
    from ..session import local_df

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps the root = the component's min label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return local_df(
        spark,
        sorted((n, find(n)) for n in parent),
        "node long, component long",
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    local_threshold: int = 200_000,
) -> DataFrame:
    """(node, component) labels over the undirected near-dup pair
    graph: ``component`` = the smallest node id reachable from
    ``node``. The missing piece between pair emitters
    (minhash/simhash/embedding) and actually DROPPING duplicates — a
    cluster of k mutual near-dups must shed k-1 docs, not be counted
    k·(k-1)/2 times.

    Distributed min-label propagation WITH pointer jumping: each round
    every node takes the min of its own label and its neighbors'
    labels, then replaces its label by its LABEL'S label (path
    halving) — one round is two joins + one groupBy and the
    combination converges in O(log n) rounds even on a path graph
    (plain neighbor propagation needs O(diameter): a 200-node chain
    would exhaust any reasonable round cap — pinned in tests). The
    loop checkpoints labels per round (``localCheckpoint``) to keep
    the plan flat, stops when a round changes no label, and RAISES if
    ``max_iter`` rounds don't converge rather than returning wrong
    labels. Deterministic; nothing materializes driver-side except the
    converged flag.

    ``local_threshold``: pair graphs with at most this many rows are
    solved by an exact driver-side union-find instead (same design as
    ``pagerank_local_threshold``): the pair graph holds ONLY near-dup
    members — usually a tiny fraction of the corpus — and each
    distributed round costs two joins + a groupBy, so below the
    threshold the fixed per-round job overhead dominates. The probe is
    a ``limit(threshold+1).collect()`` (bounded driver memory: 16
    bytes/row); past it, the full distributed loop runs. Set 0 to
    force the distributed path."""
    _probed = False
    if local_threshold > 0:
        # persist before probing: the pair EMITTER upstream (e.g. the
        # LSH band join + exact verify) is the expensive part — without
        # this, a graph just past the threshold would pay for it twice
        # (once for the probe, again when the distributed loop builds
        # its edge table)
        pairs = pairs.persist()
        _probed = True
        probe = (
            pairs.select(
                F.col(id_a).cast("long"), F.col(id_b).cast("long")
            )
            .limit(local_threshold + 1)
            .collect()
        )
        if len(probe) <= local_threshold:
            out = _components_local(
                pairs.sparkSession, [(r[0], r[1]) for r in probe]
            )
            pairs.unpersist()
            return out
    edges = (
        pairs.select(
            F.col(id_a).cast("long").alias("src"),
            F.col(id_b).cast("long").alias("dst"),
        )
        .union(
            pairs.select(
                F.col(id_b).cast("long").alias("src"),
                F.col(id_a).cast("long").alias("dst"),
            )
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    if _probed:
        # the edge table is materialized past this point (labels'
        # localCheckpoint evaluated it); the probe cache can go
        pairs.unpersist()
    for _ in range(max_iter):
        # step 1: min over neighbors' current labels
        nbr = (
            edges.join(
                labels.withColumnRenamed("node", "dst"), "dst"
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = labels.join(nbr, "node", "left").select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_min"), F.col("component")),
            ).alias("component"),
        )
        # step 2: pointer jumping (path halving) — follow the label's
        # own label; a component label is always a graph node, so the
        # self-join mapping is total (left join only for safety)
        mapping = stepped.select(
            F.col("node").alias("component"),
            F.col("component").alias("_cc"),
        )
        new_labels = (
            stepped.join(mapping, "component", "left")
            .select(
                "node",
                F.coalesce(F.col("_cc"), F.col("component")).alias(
                    "component"
                ),
            )
        ).localCheckpoint()
        # converged iff NO label moved this round (either step)
        moved = (
            labels.withColumnRenamed("component", "_old")
            .join(new_labels, "node")
            .where(F.col("component") < F.col("_old"))
            .head(1)
        )
        labels = new_labels
        if not moved:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "rounds — raise max_iter"
        )
    edges.unpersist()
    return labels


def drop_near_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep one CANONICAL doc per near-dup component (the smallest id —
    deterministic) plus every doc that appears in no pair. The actual
    dedup step a training pipeline runs after any pair emitter; the
    component labels are broadcast-joined (the pair graph is tiny
    relative to the corpus — only near-dups appear in it)."""
    labels = connected_components(pairs, id_a=id_a, id_b=id_b)
    losers = labels.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(F.broadcast(losers), id_col, "left_anti")


# ---------------------------------------------------------------------------
# substring-level exact dedup (duplicated-span detection / removal)
# ---------------------------------------------------------------------------


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 20,
    keep_first: bool = True,
) -> DataFrame:
    """(doc_id, span_start, span_end, n_grams): maximal TOKEN spans
    covered by exact ``min_len``-token runs that also occur elsewhere
    in the corpus — substring-level exact dedup in the style of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al., 2021), re-expressed relationally instead of via a suffix
    array: a duplicated substring of length >= L is exactly a run of
    duplicated L-grams, so the L-gram inverted index finds every such
    region and a per-doc interval merge (gaps-and-islands) recovers the
    maximal spans. ``span_end`` is exclusive; spans from overlapping
    L-gram hits coalesce.

    ``keep_first=True`` exempts one canonical occurrence per gram —
    the (min doc_id, min pos) one, deterministic under any partitioning
    — so stripping the reported spans keeps exactly one copy of every
    repeated region corpus-wide (the paper's policy). ``False`` reports
    every occurrence (flag-only audits).

    Plan shape at 100 TB: one narrow posexplode over the corpus, one
    groupBy on the gram (the inverted index — the only content-keyed
    exchange, same shape the posting build survives at scale), a
    semi/anti join back, and a doc_id-keyed window for the merge. No
    suffix array, no driver state.
    """
    toks = F.split(F.col(text_col), " ")
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(shingle_array(toks, min_len)).alias("pos", "gram"),
    )
    per_gram = grams.groupBy("gram").agg(
        F.count("*").alias("occ"),
        F.min(F.struct("doc_id", "pos")).alias("keeper"),
    )
    dup = grams.join(per_gram.where(F.col("occ") > 1), "gram")
    if keep_first:
        dup = dup.where(
            (F.col("doc_id") != F.col("keeper.doc_id"))
            | (F.col("pos") != F.col("keeper.pos"))
        )
    hits = dup.select(
        "doc_id",
        F.col("pos").alias("start"),
        (F.col("pos") + F.lit(min_len)).alias("end"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "_prev_max",
        F.coalesce(F.max("end").over(w), F.lit(-1)),
    ).withColumn(
        "island",
        F.sum(
            F.when(F.col("start") > F.col("_prev_max"), 1).otherwise(0)
        ).over(
            Window.partitionBy("doc_id")
            .orderBy("start")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count("*").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "n_grams")
    )


def strip_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 20,
) -> DataFrame:
    """Input rows with every non-canonical duplicated span removed from
    ``text_col`` (tokens outside the spans re-joined with single
    spaces; exactly one copy of every repeated >= ``min_len``-token
    region survives corpus-wide). Docs without spans pass through
    byte-identical. The span table is small (only duplicated regions),
    so it broadcasts; the cut itself is one Arrow stage."""
    spans = duplicated_spans(
        df, text_col, id_col, min_len=min_len, keep_first=True
    ).groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )

    @F.pandas_udf("string")
    def _cut(text: pd.Series, spans_col: pd.Series) -> pd.Series:
        out = []
        for t, sp in zip(text, spans_col):
            if sp is None or len(sp) == 0:
                out.append(t)
                continue
            toks = t.split(" ")
            drop = set()
            for s in sp:
                drop.update(range(int(s["span_start"]), int(s["span_end"])))
            out.append(
                " ".join(
                    tk for i, tk in enumerate(toks) if i not in drop
                )
            )
        return pd.Series(out)

    joined = df.join(
        F.broadcast(spans.withColumnRenamed("doc_id", "_sid")),
        df[id_col] == F.col("_sid"),
        "left",
    ).drop("_sid")
    return joined.withColumn(
        text_col, _cut(F.col(text_col), F.col("_spans"))
    ).drop("_spans")
