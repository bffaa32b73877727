"""Serving tier for the saved VectorIndex artifact: interactive ANN
over the parquet layout ``VectorIndex.save`` writes, loaded with
pyarrow and answered in numpy — NO SparkSession anywhere on the query
path (the vector-search counterpart of serving.py's text cell; same
split: Spark builds/merges the artifact at cluster scale, this module
serves it at memory speed).

Semantics are the SAME algorithms as the Spark query path, value-level:
  * ``exact=True``   — brute cosine over the loaded clusters
                       (== VectorIndex.topk(exact=True)).
  * default          — IVF probe (adaptive ceil(0.7·C), the measured
                       ≥0.85-coverage default of similarity.ivf_topk) +
                       PQ-ADC screen over the packed code words (the
                       identical numpy view-as-uint8 + LUT-gather
                       arithmetic pq_topk ships into its Arrow UDF) +
                       full-precision rerank of the top ``pool``.
Rank identity to the Spark path on both dials is pinned in
tests/test_vector_serving.py.

Scale shape: one cell holds ONE cluster range (``clusters=`` loads
only those ``cluster=K`` directories — the partitionBy layout IS the
shard map); ``VectorServingRouter`` fans a query over N cells and
stays rank-identical to the single node by construction: the screen
and the rerank are separate steps, so the router merges the per-cell
APPROX screens into one global pool first (exactly the pool the
single node would keep — a pool member's rank within its own cell can
only improve when other cells' rows leave the comparison), then
reranks only that pool at full precision.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

from search_engine_spark.operators.similarity import PQCodebooks


def _read_meta(path: str) -> dict:
    rows = []
    for p in sorted(glob.glob(os.path.join(path, "meta", "part-*"))):
        with open(p) as f:
            rows += [ln for ln in f.read().splitlines() if ln.strip()]
    if not rows:
        raise FileNotFoundError(f"no meta rows under {path}/meta")
    return json.loads(json.loads(rows[0])["meta"])


def _cluster_dirs(path: str) -> dict[int, str]:
    out = {}
    for d in glob.glob(os.path.join(path, "vectors", "cluster=*")):
        out[int(os.path.basename(d).split("=", 1)[1])] = d
    if not out:
        raise FileNotFoundError(f"no cluster=* dirs under {path}/vectors")
    return out


class VectorServing:
    """One ANN serving cell over a saved VectorIndex (or a cluster
    range of one). Loads lazily per cluster on first touch; a probe of
    P clusters therefore reads only P directories — the pyarrow twin
    of the Spark path's partition-pruned scan."""

    def __init__(self, path: str, clusters: list[int] | None = None):
        meta = _read_meta(path)
        self.path = path
        self.dim = int(meta["dim"])
        self.cents = np.asarray(meta["cents"], dtype=np.float64)
        self.codebooks = PQCodebooks.from_json(meta["codebooks"])
        self.n_vectors = int(meta["n_vectors"])
        # bucket-IDF the corpus embeddings were weighted with (None for
        # unweighted indexes) — topk_text embeds the query with the
        # SAME weighting, or the cosine is silently asymmetric
        raw_idf = meta.get("idf")
        self.idf = (
            np.asarray(raw_idf, dtype=np.float64)
            if raw_idf is not None
            else None
        )
        dirs = _cluster_dirs(path)
        if clusters is not None:
            dirs = {c: d for c, d in dirs.items() if c in set(clusters)}
        self._dirs = dirs
        self._data: dict[int, dict] = {}

    @classmethod
    def load(
        cls, path: str, clusters: list[int] | None = None
    ) -> "VectorServing":
        return cls(path, clusters=clusters)

    @property
    def clusters(self) -> list[int]:
        return sorted(self._dirs)

    # -- per-cluster columnar load -------------------------------------------

    def _cluster(self, c: int) -> dict:
        got = self._data.get(c)
        if got is not None:
            return got
        import pyarrow.dataset as ds

        word_cols = self.codebooks.word_cols
        cols = ["vec_id", "embedding", "vec_norm"] + word_cols
        tbl = ds.dataset(self._dirs[c], format="parquet").to_table(
            columns=cols
        )
        n = tbl.num_rows
        ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
        # flatten() respects offsets/validity; the boxed to_pylist path
        # is only for the (never-written-by-build) null-embedding case
        earr = tbl.column("embedding").combine_chunks()
        if earr.null_count == 0:
            emb = np.asarray(
                earr.flatten(), dtype=np.float64
            ).reshape(n, self.dim)
        else:
            emb = np.asarray(
                [
                    x if x is not None else [0.0] * self.dim
                    for x in earr.to_pylist()
                ],
                dtype=np.float64,
            ).reshape(n, self.dim)
        norms = tbl.column("vec_norm").to_numpy(zero_copy_only=False)
        # packed int64 words -> (n, m) uint8 codes; NULL words -> mask
        m = self.codebooks.m
        words = np.zeros((n, self.codebooks.n_words), dtype=np.int64)
        ok = np.ones(n, dtype=bool)
        for i, w in enumerate(word_cols):
            col = tbl.column(w)
            ok &= ~np.asarray(col.is_null())
            words[:, i] = col.fill_null(0).to_numpy(zero_copy_only=False)
        codes = words.view(np.uint8).reshape(n, -1)[:, :m]
        got = {"ids": ids, "emb": emb, "norms": norms,
               "codes": codes, "ok": ok}
        self._data[c] = got
        return got

    # -- probe selection (same arithmetic as similarity.ivf_topk) -------------

    def _probe(self, q: np.ndarray, n_probe: int | None) -> list[int]:
        n_cents = self.cents.shape[0]
        if n_probe is None:
            n_probe = max(4, -(-7 * n_cents // 10))  # ceil(0.7·C)
        d2 = ((self.cents - q[None, :]) ** 2).sum(axis=1)
        order = sorted(range(n_cents), key=lambda i: float(d2[i]))
        return [c for c in order[:n_probe] if c in self._dirs]

    # -- screen / rerank (split so a router can pool globally) ----------------

    def screen(
        self,
        query_vec,
        pool: int,
        n_probe: int | None = None,
        exclude_ids=None,
    ) -> tuple[np.ndarray, np.ndarray, list[int]]:
        """(ids, approx, probed_clusters) of this cell's top ``pool``
        rows by PQ-ADC score inside the probed clusters — the identical
        LUT-gather pq_topk ships into its Arrow screen. The probed
        cluster list lets rerank stay O(probed), not O(ever-loaded)."""
        q = np.asarray(query_vec, dtype=np.float64)
        qn = float(np.linalg.norm(q))
        qu = q / qn if qn > 0 else q
        C = self.codebooks.cents
        m, _ks, sub = C.shape
        lut256 = np.zeros((m, 256), dtype=np.float64)
        for s in range(m):
            lut256[s, : C.shape[1]] = C[s] @ qu[s * sub : (s + 1) * sub]
        sel = np.arange(m)
        probed = self._probe(q, n_probe)
        ids_all, sc_all = [], []
        for c in probed:
            d = self._cluster(c)
            sc = lut256[sel[None, :], d["codes"]].sum(axis=1)
            sc[~d["ok"]] = -np.inf
            ids_all.append(d["ids"])
            sc_all.append(sc)
        if not ids_all:
            return np.array([], dtype=np.int64), np.array([]), probed
        ids = np.concatenate(ids_all)
        sc = np.concatenate(sc_all)
        if exclude_ids:
            keep = ~np.isin(ids, np.asarray(list(exclude_ids)))
            ids, sc = ids[keep], sc[keep]
        top = _top_by(sc, ids, pool)
        return ids[top], sc[top], probed

    def rerank(
        self, query_vec, ids: np.ndarray, k: int,
        clusters: list[int] | None = None,
    ) -> list[tuple[int, float]]:
        """Exact-cosine top-k among ``ids``. Pass the screen's probed
        cluster list to keep the fetch O(probed rows); the fallback
        scans whatever this cell has loaded (pool members can only
        come from screened clusters, so neither widens the probe's
        pruned read)."""
        q = np.asarray(query_vec, dtype=np.float64)
        qn = float(np.linalg.norm(q))
        want = set(int(i) for i in ids)
        out_ids, out_cos = [], []
        for c in clusters if clusters is not None else sorted(self._data):
            d = self._cluster(c)
            mask = np.isin(d["ids"], np.asarray(list(want) or [-1]))
            if not mask.any():
                continue
            emb = d["emb"][mask]
            nrm = d["norms"][mask]
            dot = emb @ q
            denom = nrm * qn
            cos = np.where(denom > 0, dot / np.where(denom == 0, 1, denom),
                           0.0)
            out_ids.append(d["ids"][mask])
            out_cos.append(cos)
        if not out_ids:
            return []
        ids_v = np.concatenate(out_ids)
        cos_v = np.concatenate(out_cos)
        top = _top_by(cos_v, ids_v, k)
        return [(int(ids_v[i]), float(cos_v[i])) for i in top]

    # -- the query surface -----------------------------------------------------

    def topk(
        self,
        query_vec,
        k: int = 10,
        n_probe: int | None = None,
        pool: int | None = None,
        exact: bool = False,
        exclude_ids=None,
    ) -> list[tuple[int, float]]:
        """Top-k (vec_id, cosine), cos DESC / id ASC — the same dials
        and defaults as VectorIndex.topk."""
        q = np.asarray(query_vec, dtype=np.float64)
        if exact or (
            n_probe is not None and n_probe >= self.cents.shape[0]
        ):
            return self._brute(q, k, exclude_ids)
        if pool is None:
            pool = max(10 * k, 200)
        if pool >= 1_000_000:
            # the Spark path (ivf_topk -> pq_topk huge-pool dial)
            # skips the screen but still scans only the PROBED
            # clusters — mirror that, or the two paths diverge
            return self._brute(
                q, k, exclude_ids, clusters=self._probe(q, n_probe)
            )
        ids, _, probed = self.screen(
            q, pool, n_probe=n_probe, exclude_ids=exclude_ids
        )
        return self.rerank(q, ids, k, clusters=probed)

    def topk_text(
        self, query_text: str, k: int = 10, idf=None, **kw
    ):
        """Free-text entry point over a hashed-embedding index
        (operators/embed.py): embeds the query with the same signed
        feature hashing — and the same bucket-IDF weighting the index
        was built with (``meta["idf"]``, overridable via ``idf=``) —
        and dispatches to ``topk``."""
        from search_engine_spark.operators.embed import embed_text

        w = idf if idf is not None else self.idf
        return self.topk(
            embed_text(query_text, self.dim, idf=w), k=k, **kw
        )

    def _brute(self, q, k, exclude_ids, clusters=None):
        qn = float(np.linalg.norm(q))
        ids_all, cos_all = [], []
        for c in self.clusters if clusters is None else clusters:
            d = self._cluster(c)
            denom = d["norms"] * qn
            cos = np.where(
                denom > 0, (d["emb"] @ q) / np.where(denom == 0, 1, denom),
                0.0,
            )
            ids_all.append(d["ids"])
            cos_all.append(cos)
        if not ids_all:  # a router shard may probe no local cluster
            return []
        ids = np.concatenate(ids_all)
        cos = np.concatenate(cos_all)
        if exclude_ids:
            keep = ~np.isin(ids, np.asarray(list(exclude_ids)))
            ids, cos = ids[keep], cos[keep]
        top = _top_by(cos, ids, k)
        return [(int(ids[i]), float(cos[i])) for i in top]


def _top_by(score: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k rows by (score DESC, id ASC) — the
    engine-wide tie-break, via lexsort (stable, deterministic)."""
    if len(score) == 0:
        return np.array([], dtype=np.int64)
    order = np.lexsort((ids, -score))
    return order[: min(k, len(order))]


class HybridServing:
    """Interactive hybrid retrieval: the text serving cell's BM25 pool
    fused with this module's ANN pool by reciprocal-rank fusion — the
    serving twin of operators/hybrid.hybrid_topk, at memory speed
    (both pools answer in ~1 ms; fusion is a dict walk over <= 2·pool
    entries). With ``exact_sem=True`` the dense pool is brute-force
    (the parity dial vs the Spark operator); default leaves the
    ANN cell on its IVF-PQ dial for speed.

    Both sides compose with their fleets: ``text`` accepts any
    ServingIndex — including a term-range ServingRouter — and
    ``vectors`` any VectorServing-shaped cell, so a fully sharded
    hybrid fleet is the same three lines (pinned rank-identical in
    tests)."""

    def __init__(
        self,
        text,
        vectors: VectorServing,
        rrf_k: int = 60,
        pool: int = 100,
        exact_sem: bool = False,
    ):
        self.text = text
        self.vectors = vectors
        self.rrf_k = rrf_k
        self.pool = pool
        self.exact_sem = exact_sem

    def search(
        self, query: str, k: int = 10, pool: int | None = None
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, rrf_score), rrf DESC / id ASC."""
        pool = pool or self.pool
        lex = self.text.search(query, k=pool)  # already (score↓, id↑)
        sem = self.vectors.topk_text(
            query, k=pool, exact=self.exact_sem
        )
        fused: dict[int, float] = {}
        for r, row in enumerate(lex, start=1):
            fused[int(row[0])] = fused.get(int(row[0]), 0.0) + 1.0 / (
                self.rrf_k + r
            )
        for r, (vid, _cos) in enumerate(sem, start=1):
            fused[int(vid)] = fused.get(int(vid), 0.0) + 1.0 / (
                self.rrf_k + r
            )
        out = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:k]
        return [(d, s) for d, s in out]


class VectorServingRouter:
    """N cells over disjoint cluster ranges, rank-identical to the
    single node: exact queries merge per-cell brute top-k; approximate
    queries merge per-cell SCREENS into the one global pool the single
    node would keep, then rerank only that pool."""

    def __init__(self, shards: list[VectorServing]):
        if not shards:
            raise ValueError("router needs >= 1 shard")
        self.shards = shards

    @classmethod
    def load(cls, path: str, n_shards: int = 2) -> "VectorServingRouter":
        all_clusters = sorted(_cluster_dirs(path))
        if n_shards < 1:
            raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
        ranges = [all_clusters[i::n_shards] for i in range(n_shards)]
        return cls(
            [VectorServing(path, clusters=r) for r in ranges if r]
        )

    def topk(
        self,
        query_vec,
        k: int = 10,
        n_probe: int | None = None,
        pool: int | None = None,
        exact: bool = False,
        exclude_ids=None,
    ) -> list[tuple[int, float]]:
        q = np.asarray(query_vec, dtype=np.float64)
        n_cents = self.shards[0].cents.shape[0]
        if exact or (n_probe is not None and n_probe >= n_cents):
            # the same dials VectorServing.topk resolves to all-cluster
            # brute force must stay brute here too, or rank-identity
            # breaks
            merged = [
                r
                for s in self.shards
                for r in s._brute(q, k, exclude_ids)
            ]
            merged.sort(key=lambda t: (-t[1], t[0]))
            return merged[:k]
        if pool is not None and pool >= 1_000_000:
            # huge-pool dial = exact cosine over the PROBED clusters
            # only (the single cell's semantics); each shard's probe is
            # the global probe list filtered to its clusters, so the
            # union equals the single node's probed set
            merged = [
                r
                for s in self.shards
                for r in s._brute(
                    q, k, exclude_ids, clusters=s._probe(q, n_probe)
                )
            ]
            merged.sort(key=lambda t: (-t[1], t[0]))
            return merged[:k]
        if pool is None:
            pool = max(10 * k, 200)
        ids_all, sc_all, probed_by_shard = [], [], []
        for s in self.shards:
            ids, sc, probed = s.screen(
                q, pool, n_probe=n_probe, exclude_ids=exclude_ids
            )
            ids_all.append(ids)
            sc_all.append(sc)
            probed_by_shard.append(probed)
        ids = np.concatenate(ids_all) if ids_all else np.array([])
        sc = np.concatenate(sc_all) if sc_all else np.array([])
        top = _top_by(sc, ids, pool)  # the single node's global pool
        pool_ids = ids[top]
        per_shard = [
            s.rerank(q, pool_ids, k, clusters=probed)
            for s, probed in zip(self.shards, probed_by_shard)
        ]
        merged = [r for rs in per_shard for r in rs]
        merged.sort(key=lambda t: (-t[1], t[0]))
        return merged[:k]

    def topk_text(
        self, query_text: str, k: int = 10, idf=None, **kw
    ):
        """Free-text entry: every shard shares the artifact's meta, so
        the first shard's dim/IDF is the fleet's."""
        from search_engine_spark.operators.embed import embed_text

        s0 = self.shards[0]
        w = idf if idf is not None else s0.idf
        return self.topk(
            embed_text(query_text, s0.dim, idf=w), k=k, **kw
        )
