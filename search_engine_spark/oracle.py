"""Pure-Python reference oracle (SURVEY.md §7 Phase 0).

An obviously-correct, ~200-line implementation of the reference engine's
semantics (tokenize → stem → TF/IDF & BM25 → boolean/phrase → rank),
including every §2.9 quirk:

  Q2  IDF = log10(N/df)                       (SQLiteSearcher.java:362)
  Q3  query terms stemmed but NOT stopword/validity filtered (QP.java:392-414)
  Q4  AND keeps the LEFT side's tf/idf only   (QP.java:245-273)
  Q5  OR merge: right side wins per shared term, pageRank = max
      (QP.java:275-325)
  Q6  deterministic tie-break: score DESC, doc_id ASC
  Q8  phrase: MAX_GAP=3 with the reference's literal chained-walk inner
      loop (QueryIndex.java:341-395)
  Q9  at most ONE boolean operator, detected in order OR, AND, NOT
      (QP.java:360-373)

Used by pytest to pin golden top-k answers the Spark engine must
reproduce rank-identically.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from search_engine_spark.config import DEFAULT, EngineConfig  # noqa: F401
from search_engine_spark.operators.parser import (
    detect_operator,
    is_phrase,
    query_stems,
    strip_phrase,
)
from search_engine_spark.operators.tokenize import aggregate_tokens, tokenize_valid


@dataclass
class OracleIndex:
    # term -> {doc_id -> (tf, positions)}
    postings: dict = field(default_factory=dict)
    doc_len: dict = field(default_factory=dict)
    n_docs: int = 0
    avgdl: float = 0.0
    page_rank: dict = field(default_factory=dict)
    cfg: EngineConfig = DEFAULT

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        if df == 0:
            return 0.0
        return math.log10(self.n_docs / df)


def oracle_build(
    docs: list[tuple[int, str]],
    cfg: EngineConfig = DEFAULT,
    page_rank: dict | None = None,
) -> OracleIndex:
    idx = OracleIndex(cfg=cfg)
    idx.n_docs = len(docs)
    total = 0
    for doc_id, content in docs:
        words = tokenize_valid(content, cfg)
        tokens, n = aggregate_tokens(words)
        idx.doc_len[doc_id] = n
        total += n
        for t in tokens:
            idx.postings.setdefault(t["term"], {})[doc_id] = (
                t["tf"],
                t["positions"],
            )
    idx.avgdl = total / idx.n_docs if idx.n_docs else 0.0
    idx.page_rank = dict(page_rank or {})
    return idx


def oracle_tokenize_sections(
    elements: list[tuple[str, str]], cfg: EngineConfig = DEFAULT
) -> tuple[dict, int]:
    """Independent transcription of the reference's weighted sectioned
    tokenizer (Tokenizer.java:126-253): per-element processText with
    count += section weight, per-element position restart, max-weight
    section label, and the countTokens quirk (totalTokens re-validates
    the STEMMED words, Tokenizer.java:250-254).

    ``elements``: (section_label, text) in processing order. Returns
    (term -> {count, top_section, importance, positions}, total_tokens).
    The reference then stores frequency = count / total_tokens."""
    from search_engine_spark.operators.tokenize import SECTION_WEIGHTS

    def _valid(w: str) -> bool:
        return (
            cfg.min_word_len <= len(w) <= cfg.max_word_len
            and w.isascii()
            and w.isalpha()
            and (not cfg.remove_stopwords or w not in _stopset())
        )

    def _stopset():
        from search_engine_spark.functions.stopwords import STOPWORDS

        return STOPWORDS

    acc: dict[str, dict] = {}
    total = 0
    for section, text in elements:
        if not text:
            continue
        weight = SECTION_WEIGHTS.get(section, SECTION_WEIGHTS["content"])
        words = tokenize_valid(text, cfg)
        total += sum(1 for s in words if _valid(s))
        for i, w in enumerate(words):
            ent = acc.get(w)
            if ent is None:
                acc[w] = {
                    "count": weight,
                    "top_section": section,
                    "importance": weight,
                    "positions": [i],
                }
            else:
                ent["count"] += weight
                if weight > ent["importance"]:
                    ent["top_section"], ent["importance"] = section, weight
                ent["positions"].append(i)
    return acc, total


def bm25_tf(tf: float, dl: float, idx: OracleIndex) -> float:
    k1, b = idx.cfg.bm25_k1, idx.cfg.bm25_b
    avgdl = max(idx.avgdl, 1e-12)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def lookup_terms(idx: OracleIndex, stems: list[str]) -> dict:
    """Q4 posting lookup: doc_id -> {stem: (tf, positions)}."""
    out: dict[int, dict] = {}
    for s in stems:
        for doc_id, (tf, pos) in idx.postings.get(s, {}).items():
            out.setdefault(doc_id, {})[s] = (tf, pos)
    return out


def phrase_match(position_lists: list[list[int]], max_gap: int = 3) -> bool:
    """Literal transcription of the reference matcher's control flow
    (QueryIndex.java:355-395), including the chained-walk inner loop that
    keeps advancing currentPos within one word's position list."""
    if any(len(pl) == 0 for pl in position_lists):
        return False
    for start_pos in position_lists[0]:
        valid = True
        current = start_pos
        wi = 0
        while wi < len(position_lists) - 1:
            wi += 1
            found = False
            for pos in position_lists[wi]:
                if current < pos <= current + max_gap:
                    if (not found) or (pos < current + max_gap):
                        current = pos
                        found = True
            if not found:
                valid = False
                break
        if valid:
            return True
    return False


def phrase_candidates(idx: OracleIndex, stems: list[str]) -> dict:
    """Q6: docs containing ALL stems; then Q8 position check."""
    uniq = list(dict.fromkeys(stems))
    cand = lookup_terms(idx, uniq)
    out = {}
    for doc_id, terms in cand.items():
        if len(terms) != len(uniq):
            continue
        pls = [sorted(terms[s][1]) for s in stems]
        if phrase_match(pls, idx.cfg.phrase_max_gap):
            out[doc_id] = terms
    return out


def _component(idx: OracleIndex, part: str) -> dict:
    if is_phrase(part):
        return phrase_candidates(idx, query_stems(strip_phrase(part)))
    return lookup_terms(idx, query_stems(part))


def oracle_search(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    mode: str = "bm25",
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) with quirk-faithful boolean semantics."""
    op, left, right = detect_operator(query)
    lres = _component(idx, left)
    if op is None:
        docs = lres
    else:
        rres = _component(idx, right)
        if op == "AND":  # Q4: keep left's term data only
            docs = {d: t for d, t in lres.items() if d in rres}
        elif op == "NOT":
            docs = {d: t for d, t in lres.items() if d not in rres}
        else:  # OR — Q5: right side wins on shared terms
            docs = {}
            for d, t in lres.items():
                docs[d] = dict(t)
            for d, t in rres.items():
                if d in docs:
                    docs[d].update(t)
                else:
                    docs[d] = dict(t)

    w_rel, w_pr = idx.cfg.relevance_weight, idx.cfg.pagerank_weight
    scored = []
    for doc_id, terms in docs.items():
        dl = idx.doc_len.get(doc_id, 0)
        rel = 0.0
        for s in sorted(terms):  # deterministic fold order
            tf, _ = terms[s]
            if mode == "bm25":
                rel += idx.idf(s) * bm25_tf(tf, dl, idx)
            else:  # reference tf-idf parity: normalized tf × log10 idf
                tf_norm = tf / dl if dl else 0.0
                rel += tf_norm * idx.idf(s)
        score = w_rel * rel + w_pr * idx.page_rank.get(doc_id, 0.0)
        scored.append((doc_id, score))
    scored.sort(key=lambda t: (-t[1], t[0]))  # quirk Q6 tie-break
    return scored[:k]


def oracle_pagerank(
    edges: list[tuple[int, int]],
    nodes: list[int],
    damping: float = 0.85,
    epsilon: float = 1e-5,
    max_iter: int = 1000,
) -> dict[int, float]:
    """Power iteration with dangling-mass redistribution and all-nodes
    max-delta convergence (ref: Ranker/PageRank.java:31-105)."""
    nodes = sorted(set(nodes))
    n = len(nodes)
    if n == 0:
        return {}
    out_deg: dict[int, int] = {}
    in_edges: dict[int, list[int]] = {v: [] for v in nodes}
    seen = set()
    for s, d in edges:
        if (s, d) in seen:  # adjacency dedup, DataBaseManager.java:49-53
            continue
        seen.add((s, d))
        out_deg[s] = out_deg.get(s, 0) + 1
        if d in in_edges:
            in_edges[d].append(s)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(max_iter):
        dangling = sum(r for v, r in rank.items() if out_deg.get(v, 0) == 0)
        new = {}
        for v in nodes:
            s = sum(rank[u] / out_deg[u] for u in in_edges[v])
            new[v] = (1.0 - damping) / n + damping * (s + dangling / n)
        if all(abs(new[v] - rank[v]) <= epsilon for v in nodes):
            rank = new
            break
        rank = new
    return rank
