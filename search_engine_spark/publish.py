"""Generation-pointer index publishing: serve while (re)building.

The reference serves queries from the same SQLite file its indexer
writes into, relying on SQLite's single-writer locking for a
"serve-while-crawling" loop (ref: Indexer/Indexer.java:42-45 rebuilds in
place; SE/BackendManager.java queries concurrently). A distributed
index has no such file lock, and ``Index.save``'s overwrite-mode
parquet write is NOT safe under a concurrent reader (the directory is
momentarily partial). This module provides the standard object-store
answer — an immutable snapshot per build plus one atomically-swapped
pointer, the same design as an Iceberg/Delta snapshot pointer:

  <root>/gen=K/...      one complete, immutable ``Index.save`` layout
  <root>/LATEST         tiny JSON {generation, path, n_docs, ...},
                        written tmp+rename — readers see the old
                        pointer or the new one, never a torn state

Contract:
  * ``publish_index`` writes gen=K fully BEFORE flipping LATEST, so a
    crash mid-publish leaves an orphan gen dir and a still-valid old
    pointer; the next publish skips past the orphan (K = max existing
    gen + 1), nothing needs repair.
  * Readers (``ServingIndex.load_latest`` / ``refresh``, or
    ``load_latest_index`` for a Spark reader) resolve LATEST at load
    time and then read only immutable files — no reader ever races a
    writer. This removes the concurrent-reader caveat that
    ``pagerank.write_back_pagerank``'s in-place swap documents.
  * Old generations are kept until ``prune_generations`` drops all but
    the newest ``keep`` — run it on whatever cadence ops chooses, after
    long-lived readers have refreshed (time-travel debugging gets the
    old snapshots for free until then).

Scale: LATEST is one tiny file per index root; on S3-like stores the
rename becomes a conditional PUT of the pointer object (or an Iceberg
snapshot commit) — the layout underneath is unchanged.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

_GEN_RE = re.compile(r"^gen=(\d+)$")


def _existing_generations(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _GEN_RE.match(name)
        if m and os.path.isdir(os.path.join(root, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def read_latest(root: str) -> dict | None:
    """The LATEST pointer's JSON, or None if nothing is published yet."""
    path = os.path.join(root, "LATEST")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def latest_index_path(root: str) -> str:
    """Absolute path of the currently-published generation directory."""
    ptr = read_latest(root)
    if ptr is None:
        raise FileNotFoundError(
            f"no published index under {root!r} (missing LATEST pointer)"
        )
    return os.path.join(root, ptr["path"])


def publish_index(idx, root: str) -> int:
    """Write ``idx`` as the next immutable generation under ``root`` and
    atomically flip the LATEST pointer to it. Returns the generation
    number. Safe against crashes (orphan gen dirs are skipped past) and
    against concurrent readers (they hold the old pointer's immutable
    files)."""
    os.makedirs(root, exist_ok=True)
    gens = _existing_generations(root)
    gen = (gens[-1] + 1) if gens else 0
    gen_dir = os.path.join(root, f"gen={gen}")
    idx.save(gen_dir)
    ptr = {
        "generation": gen,
        "path": f"gen={gen}",
        "n_docs": idx.n_docs,
        "avgdl": idx.avgdl,
        "published_unix": time.time(),
    }
    tmp = os.path.join(root, "LATEST.tmp")
    with open(tmp, "w") as fh:
        json.dump(ptr, fh, indent=1)
    os.replace(tmp, os.path.join(root, "LATEST"))  # atomic pointer flip
    return gen


def load_latest_index(spark, root: str):
    """Spark-side reader: ``Index.load`` of the published generation."""
    from search_engine_spark.operators.index_build import Index

    return Index.load(spark, latest_index_path(root))


def prune_generations(root: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` generations (never the one
    LATEST points at). Returns the generations removed."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1 (got {keep})")
    ptr = read_latest(root)
    current = ptr["generation"] if ptr else None
    gens = _existing_generations(root)
    drop = [g for g in gens[:-keep] if g != current]
    for g in drop:
        shutil.rmtree(os.path.join(root, f"gen={g}"))
    return drop
