"""Eval-set decontamination (operators/decontam.py): pure-Python shingle
oracle, threshold semantics, and the broadcast-join plan shape."""

import pytest

from search_engine_spark.operators.decontam import (
    contamination_stats,
    decontaminate,
    eval_shingles,
)

TRAIN = [
    # (doc_id, text)
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),          # clean
    (2, "sphinx of black quartz judge my vow today"),
    (3, "quick brown fox ran away"),                          # 1 shared 3-gram
    (4, "aa bb"),                                             # shorter than n
    (5, "the quick brown fox jumps high"),                    # 3 shared
]
EVAL = [
    (100, "one quick brown fox jumps over fences"),
    (101, "sphinx of black quartz judge my vow"),
]


def _shingles(text: str, n: int) -> set:
    toks = text.split(" ")
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    } if len(toks) >= n else set()


def _oracle(train, ev, n):
    ev_sh = set().union(*(_shingles(t, n) for _, t in ev))
    out = {}
    for did, t in train:
        hits = len(_shingles(t, n) & ev_sh)
        if hits:
            out[did] = hits
    return out


@pytest.fixture(scope="module")
def frames(spark):
    tr = spark.createDataFrame(TRAIN, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    return tr, ev


def test_contamination_stats_matches_oracle(frames):
    tr, ev = frames
    for n in (3, 4):
        got = {
            r["doc_id"]: r["n_shared"]
            for r in contamination_stats(tr, ev, n=n).collect()
        }
        assert got == _oracle(TRAIN, EVAL, n), n


def test_short_doc_never_contaminated(frames):
    tr, ev = frames
    got = {r["doc_id"] for r in contamination_stats(tr, ev, n=3).collect()}
    assert 4 not in got  # 2 tokens < n=3: no shingles, no contamination


def test_decontaminate_removes_hits_only(frames):
    tr, ev = frames
    oracle = _oracle(TRAIN, EVAL, 3)
    kept = {r["doc_id"] for r in decontaminate(tr, ev, n=3).collect()}
    assert kept == {d for d, _ in TRAIN} - set(oracle)


def test_min_hits_threshold(frames):
    tr, ev = frames
    oracle = _oracle(TRAIN, EVAL, 3)
    thresh = 2
    kept = {
        r["doc_id"]
        for r in decontaminate(tr, ev, n=3, min_hits=thresh).collect()
    }
    assert kept == {
        d for d, _ in TRAIN if oracle.get(d, 0) < thresh
    }
    with pytest.raises(ValueError):
        decontaminate(tr, ev, min_hits=0)


def test_eval_side_is_broadcast(frames):
    """The training corpus must not shuffle against the eval set: the
    eval shingles ride a broadcast exchange."""
    tr, ev = frames
    plan = (
        contamination_stats(tr, ev, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_eval_shingles_distinct(frames, spark):
    _, ev = frames
    rows = [r["shingle"] for r in eval_shingles(ev, n=3).collect()]
    assert len(rows) == len(set(rows))
    exp = set().union(*(_shingles(t, 3) for _, t in EVAL))
    assert set(rows) == exp


# ---------------------------------------------------------------------------
# near-dup clusters (dedup.connected_components / drop_near_duplicates)
# ---------------------------------------------------------------------------


def test_connected_components_vs_python(spark):
    """Chain, triangle, isolated pair, long path — labels must equal a
    driver-side union-find."""
    from search_engine_spark.operators.dedup import connected_components

    pairs = [
        (1, 2), (2, 3),            # chain -> comp 1
        (10, 11), (11, 12), (10, 12),  # triangle -> comp 10
        (20, 21),                  # pair -> comp 20
        (30, 31), (31, 32), (32, 33), (33, 34),  # path -> comp 30
    ]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()  # local path
    }
    got_dist = {
        r["node"]: r["component"]
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert got == got_dist

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    exp = {n: find(n) for n in parent}
    assert got == exp


def test_drop_near_duplicates_keeps_canonicals(spark):
    from search_engine_spark.operators.dedup import drop_near_duplicates

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (6, 7)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in drop_near_duplicates(docs, pairs).collect()
    )
    # component {1,2,5} keeps 1; {6,7} keeps 6; 0,3,4 untouched
    assert kept == [0, 1, 3, 4, 6]


def test_connected_components_random_graphs(spark):
    """Property check on random graphs: distributed labels == a
    driver-side union-find (8 seeds, up to 40 nodes / 60 edges)."""
    import random

    from search_engine_spark.operators.dedup import connected_components

    for seed in range(8):
        rng = random.Random(seed)
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        # odd seeds take the distributed loop, even seeds the
        # sub-threshold union-find — both must match the oracle
        got = {
            r["node"]: r["component"]
            for r in connected_components(
                df, local_threshold=0 if seed % 2 else 200_000
            ).collect()
        }
        parent = {}
        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        exp = {x: find(x) for x in parent}
        assert got == exp, seed


def test_connected_components_long_path(spark):
    """A 200-node path graph: plain neighbor propagation needs ~200
    rounds; pointer jumping must converge within the default cap and
    label every node with 0."""
    from search_engine_spark.operators.dedup import connected_components

    pairs = [(i, i + 1) for i in range(200)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            df, max_iter=20, local_threshold=0
        ).collect()
    }
    assert set(got.values()) == {0} and len(got) == 201


def test_hashed_join_matches_string_join(frames, spark):
    """contamination_stats(hashed=True) — the big-eval-set broadcast
    mode — must produce the same (doc_id, n_shared) rows as the string
    join (60-bit hash, no collisions at any realistic test scale)."""
    tr, ev = frames
    for n in (2, 3):
        a = {
            (r["doc_id"], r["n_shared"])
            for r in contamination_stats(tr, ev, n=n).collect()
        }
        b = {
            (r["doc_id"], r["n_shared"])
            for r in contamination_stats(
                tr, ev, n=n, hashed=True
            ).collect()
        }
        assert a == b, n
