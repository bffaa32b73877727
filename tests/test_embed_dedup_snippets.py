"""Embedding-cosine near-dup (brute + LSH-bucketed) and snippet
generation: correctness vs independent numpy/python recomputation,
LSH recall vs the brute-force baseline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import (
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
)
from search_engine_spark.operators.snippets import make_snippets

DIM = 8
N = 80
THRESH = 0.6


@pytest.fixture(scope="module")
def emb(spark):
    # clustered vectors: 8 centroids + small noise → plenty of near-dups
    rng = np.random.default_rng(11)
    cents = rng.standard_normal((8, DIM))
    vecs = cents[np.arange(N) % 8] + 0.15 * rng.standard_normal((N, DIM))
    rows = [
        (int(i), [float(x) for x in vecs[i]]) for i in range(N)
    ]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


@pytest.fixture(scope="module")
def numpy_pairs(emb):
    rows = sorted(
        (r.vec_id, np.array(r.embedding, dtype=np.float64))
        for r in emb.collect()
    )
    vecs = np.stack([v for _, v in rows])
    sims = (vecs @ vecs.T) / (
        np.linalg.norm(vecs, axis=1)[:, None]
        * np.linalg.norm(vecs, axis=1)[None, :]
    )
    out = {}
    for i in range(N):
        for j in range(i + 1, N):
            if sims[i, j] >= THRESH:
                out[(i, j)] = sims[i, j]
    return out


def test_brute_pairs_match_numpy(emb, numpy_pairs):
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dup_pairs(emb, threshold=THRESH).collect()
    }
    assert set(got) == set(numpy_pairs)
    for k, v in got.items():
        assert abs(v - numpy_pairs[k]) < 1e-9


def test_lsh_pairs_subset_with_recall(emb, numpy_pairs):
    got = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs_lsh(
            emb, dim=DIM, threshold=THRESH, n_planes=4
        ).collect()
    }
    assert got <= set(numpy_pairs)  # no false positives (exact verify)
    recall = len(got) / len(numpy_pairs)
    assert recall >= 0.5, recall  # clustered data: same bucket often


def test_snippets_window_and_highlight(spark):
    rows = [
        (0, "alpha beta gamma delta " * 20 + "needle in the stack"),
        (1, "no hits here at all"),
        (2, "Needle first then filler " + "x " * 200),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r.doc_id: r.snippet
        for r in make_snippets(df, ["needle"], width=60).collect()
    }
    # hit centred: window starts 30 chars before the hit
    assert "**needle**" in out[0]
    assert len(out[0]) <= 60 + len("****")
    # miss → document head, unhighlighted
    assert out[1] == "no hits here at all"
    # case-insensitive match, original casing preserved in highlight
    assert out[2].startswith("**Needle**")


def test_snippets_multiword_first_hit(spark):
    df = spark.createDataFrame(
        [(0, "zzz " * 50 + "join here and hash there")],
        "doc_id: long, text: string",
    )
    (snip,) = [
        r.snippet for r in make_snippets(df, ["hash", "join"], width=40).collect()
    ]
    # earliest of the two words anchors the window
    assert "**join**" in snip


def test_ivf_ann_recall(spark, emb):
    """IVF: deterministic k-means training, cluster-probed top-k; recall
    vs brute-force cosine_topk on clustered data."""
    from search_engine_spark.operators.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
    )

    cents = kmeans_centroids(emb, dim=DIM, n_centroids=8, iters=3)
    assert len(cents) == 8 and all(len(c) == DIM for c in cents)
    # training is deterministic: same call, same centroids
    again = kmeans_centroids(emb, dim=DIM, n_centroids=8, iters=3)
    assert cents == again

    assigned = ivf_assign(emb, cents).persist()
    assert assigned.select("cluster").distinct().count() > 1

    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = [r.vec_id for r in cosine_topk(emb, qvec, k=10).collect()]
    approx = [
        r.vec_id
        for r in ivf_topk(assigned, cents, qvec, k=10, n_probe=2).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.7, recall  # clustered data, 2-of-8 probes


def test_lsh_exact_configs_equal_brute(spark, emb):
    """Exactness dials: probe_radius == n_planes scans every bucket and
    must reproduce brute-force cosine_topk verbatim; n_planes=0 pair
    dedup must equal the brute-force pair join."""
    from search_engine_spark.operators.similarity import cosine_topk, lsh_topk

    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = [
        (r.vec_id, round(r.cosine, 9))
        for r in cosine_topk(emb, qvec, k=10, exclude_ids=[0]).collect()
    ]
    full_probe = [
        (r.vec_id, round(r.cosine, 9))
        for r in lsh_topk(
            emb, qvec, dim=DIM, k=10, n_planes=4, probe_radius=4,
            exclude_ids=[0],
        ).collect()
    ]
    assert full_probe == exact

    brute = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(emb, threshold=THRESH).collect()
    }
    one_bucket = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs_lsh(
            emb, dim=DIM, threshold=THRESH, n_planes=0
        ).collect()
    }
    assert one_bucket == brute


def test_lsh_multiprobe_recall_monotone(spark, emb):
    """Multiprobe: widening the hamming radius can only add candidates,
    so recall vs brute force is monotone in the radius."""
    from search_engine_spark.operators.similarity import cosine_topk, lsh_topk

    qvec = [float(x) for x in emb.where("vec_id = 1").first()["embedding"]]
    exact = {r.vec_id for r in cosine_topk(emb, qvec, k=10).collect()}
    recalls = []
    for radius in (0, 1, 4):
        got = {
            r.vec_id
            for r in lsh_topk(
                emb, qvec, dim=DIM, k=10, n_planes=4, probe_radius=radius
            ).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0


def test_lsh_high_dim_plan_stays_small(spark):
    """dim=768: bucket assignment must be ONE Arrow UDF, not ~6k per-dim
    literals in a Catalyst tree (the round-1 analysis blow-up)."""
    import numpy as np

    from search_engine_spark.operators.similarity import lsh_assign_buckets

    rng = np.random.default_rng(5)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(768)])
        for i in range(32)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    bucketed = lsh_assign_buckets(df, dim=768, n_planes=8)
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 20_000, len(plan)   # literal-expansion guard
    assert plan.count("ArrowEvalPython") == 1
    got = bucketed.select("vec_id", "bucket").collect()
    assert len(got) == 32
    assert all(0 <= r.bucket < 256 for r in got)
    # deterministic: numpy recomputation of one signature matches
    from search_engine_spark.operators.similarity import lsh_query_bucket

    v = dict(rows)[3]
    want = lsh_query_bucket(v, dim=768, n_planes=8)
    assert dict((r.vec_id, r.bucket) for r in got)[3] == want


def test_kmeans_init_no_global_window(spark, emb):
    """The round-1 init pushed the whole table through one task via
    row_number() over an unpartitioned Window; the hash-sample init must
    plan as TakeOrderedAndProject with no Window/Exchange-to-1."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.similarity import (
        _init_sample,
        as_double_array,
    )

    base = emb.select(
        F.col("vec_id").alias("_id"),
        as_double_array(F.col("embedding")).alias("v"),
    )
    plan = _init_sample(base, 8)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_lsh_null_embedding_bucket_zero(spark):
    """NULL / wrong-dim embedding rows must land in bucket 0 (the old
    column-expression behavior), not crash the Arrow UDF task."""
    from search_engine_spark.operators.similarity import lsh_assign_buckets

    rows = [
        (0, [1.0] * 4),
        (1, None),
        (2, [0.5, -0.5, 0.25, -0.25]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = {
        r.vec_id: r.bucket
        for r in lsh_assign_buckets(df, dim=4, n_planes=4).collect()
    }
    assert got[1] == 0
    assert 0 <= got[0] < 16 and 0 <= got[2] < 16


# ---------------------------------------------------------------------------
# sentence-aligned snippet mode (reference BackendManager.generateSnippet)


def _java_snippet(text, query_words, radius=150):
    """Direct pure-Python transcription of the reference's
    generateSnippet (BackendManager.java:160-271): the pytest oracle for
    mode="sentence". Single-alternation highlight (the reference loops a
    SET of words in undefined order; alternation is the deterministic
    equivalent)."""
    import re as _re

    t = _re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", text or "")
    t = _re.sub(r"\s*[\r\n]+\s*", " ", t)
    t = _re.sub(r"\s*[.,!?]+\s*", ". ", t)
    t = _re.sub(r"\.+", ".", t)
    t = _re.sub(r"\s+", " ", t)
    t = t.strip()
    low = t.lower()
    best = -1
    for w in query_words:
        p = low.find(w.lower())
        if p != -1:
            best = p
            break
    if best == -1:
        return "No preview available for this result."
    startPos = best
    while startPos > 0 and startPos > best - radius:
        if startPos >= 2 and t[startPos - 2 : startPos] == ". ":
            startPos -= 2
            break
        startPos -= 1
    endPos = best
    while endPos < len(t) and endPos < best + radius:
        if endPos + 2 <= len(t) and t[endPos : endPos + 2] == ". ":
            endPos += 2
            break
        endPos += 1
    startPos, endPos = max(0, startPos), min(len(t), endPos)
    lead = "..." if startPos > 0 else ""
    body = t[startPos:endPos].strip()
    if not any(w.lower() in body.lower() for w in query_words):
        s2, endPos = max(0, best - 100), min(len(t), best + 100)
        body = t[s2:endPos].strip()
    body = _re.sub(r"\s+", " ", body)
    body = _re.sub(r"\s*[.,!?]+\s*", ". ", body)
    body = _re.sub(r"\.+", ".", body)
    body = _re.sub(r"^[^a-zA-Z0-9]+", "", body)
    body = _re.sub(r"[^a-zA-Z0-9]+$", "", body)
    body = body.strip()
    pat = "(?i)\\b(" + "|".join(_re.escape(w) for w in query_words) + ")\\b"
    body = _re.sub(pat, lambda m: f"<strong>{m.group(0)}</strong>", body)
    tail = "..." if endPos < len(t) else ""
    return lead + body + tail


SENTENCE_EDGE_DOCS = [
    "plain words then hash appears late " + "x " * 120 + "hash end",
    "Short. With hash here. Another sentence follows. " + "y" * 200,
    ("a" * 200) + " hash " + ("b" * 200),
    "hash at start. second sentence. third sentence.",
    "no query word at all in this text",
    "punctuation,, and!! weird?? spacing\n\nnewlines\ttabs hash done",
    "ends exactly at hash",
    "hash",
    "A window into a join. The hash join window. tail words here.",
    "CASE case Hash HASH hash mixed case matches",
]


def test_sentence_snippets_match_java_transcription(spark):
    words = ["hash", "join", "window"]
    rows = [(i, t) for i, t in enumerate(SENTENCE_EDGE_DOCS)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["snippet"]
        for r in make_snippets(df, words, width=150, mode="sentence").collect()
    }
    for i, t in rows:
        assert got[i] == _java_snippet(t, words), (i, t[:60], got[i])


def test_sentence_snippets_on_corpus(spark):
    """Every sf0.001 document through the sentence mode must equal the
    transcription oracle byte-for-byte."""
    words = ["hash", "join", "window"]
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["doc_id"]: r["snippet"]
        for r in make_snippets(docs, words, width=150, mode="sentence").collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == _java_snippet(r["text"], words), r["doc_id"]


def test_sentence_snippets_random_property(spark):
    """Seeded random texts (word salad + punctuation) — the loop/scan
    arithmetic must agree with the transcription on arbitrary inputs."""
    import random

    rng = random.Random(7)
    vocab = ["hash", "join", "alpha", "beta", "gamma", "x", "longword"]
    punct = [". ", ", ", "! ", "? ", " ", "  ", ".", "\n"]
    rows = []
    for i in range(200):
        n = rng.randint(0, 80)
        rows.append(
            (
                i,
                "".join(
                    rng.choice(vocab) + rng.choice(punct) for _ in range(n)
                ),
            )
        )
    words = ["hash", "join"]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["snippet"]
        for r in make_snippets(df, words, width=150, mode="sentence").collect()
    }
    for i, t in rows:
        assert got[i] == _java_snippet(t, words), (i, repr(t[:80]))


def test_snippets_regex_metachar_words(spark):
    """Query words with regex metacharacters must highlight literally,
    not crash Java Pattern (review finding)."""
    df = spark.createDataFrame(
        [(1, "using c++ for speed. a.b is dotted.")],
        "doc_id long, text string",
    )
    for mode in ("char", "sentence"):
        got = {
            r["doc_id"]: r["snippet"]
            for r in make_snippets(df, ["c++", "a.b"], mode=mode).collect()
        }
        assert "c++" in got[1].replace("**", "").replace(
            "<strong>", ""
        ).replace("</strong>", "")
        # 'a.b' must not match 'aXb'
        assert "axb" not in got[1].lower()
