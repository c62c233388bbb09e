"""Persisted Bloom DECONTAMINATION store — the benchmark-protection
counterpart of `operators/dedup_store.py`: the held-out/benchmark
shingle set is built ONCE into a Bloom filter persisted as parquet,
and every later training-data ingest probes it MAP-ONLY without
re-shingling the benchmark corpus or rebuilding the filter.

Why a store: at 100 TB the training side dwarfs the benchmark side by
orders of magnitude, but the benchmark set itself is also too big to
re-shingle per ingest (and often lives with a different team). The
filter is a pure SET OF BIT POSITIONS (<= m_bits rows, hard-capped by
`operators/sketches.py::bloom_positions`), so:

- persisting it is a tiny parquet (plus a params sidecar — probing
  with the wrong (k, m_bits) silently breaks the no-false-negative
  guarantee, so the parameters travel WITH the bits and the probe
  reads them back instead of trusting the caller);
- appending a new benchmark split is a bit-OR = parquet append +
  distinct-on-read (`bloom_merge` semantics at rest);
- probing broadcasts the position set into the training scan — the
  probe side never enters an exchange, the same contract as the
  signature store's candidate join.

A Bloom hit is a MAYBE: `decontaminate_against_store` returns per-doc
maybe-counts a pipeline uses to ROUTE suspicious docs to the exact
check (q70's shuffle join over just the flagged slice), not to drop
outright. The no-false-negative property (every truly contaminated
shingle hits) is what makes the routing safe, and is pytest-pinned.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.operators.sketches import (
    bloom_positions,
    bloom_probe,
)

_PARAMS_FILE = "_bloom_params.json"


def _params_path(path: str) -> str:
    return os.path.join(path, _PARAMS_FILE)


def write_bloom_store(
    items: DataFrame,
    path: str,
    col: str = "sh",
    k: int = 3,
    m_bits: int = 131072,
) -> None:
    """Build the filter from the benchmark's shingle rows and persist
    (position parquet + params sidecar). Overwrites any prior store.

    Crash/concurrency ordering (r7 ADVICE): the sidecar is the
    probe-ability token, so it is (1) REMOVED before the positions
    overwrite — a crash mid-rewrite leaves bits without params, which
    `read_store_params` rejects loudly, never a silent wrong-(k,m_bits)
    probe against stale params — and (2) re-written LAST via a temp
    file + `os.replace`, so any concurrent reader sees either no
    sidecar (loud error) or a complete one matching the bits."""
    try:
        os.remove(_params_path(path))
    except FileNotFoundError:
        pass
    bloom_positions(items, col, k=k, m_bits=m_bits).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "positions"))
    tmp = _params_path(path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"k": k, "m_bits": m_bits}, fh)
    os.replace(tmp, _params_path(path))


def append_to_bloom_store(items: DataFrame, path: str, col: str = "sh") -> None:
    """OR another split's shingles into the store: same-parameter
    positions append; the probe's distinct-on-read merges the bits
    (`bloom_merge` at rest). The params sidecar is the law — appends
    always hash with the STORED (k, m_bits)."""
    params = read_store_params(path)
    bloom_positions(
        items, col, k=params["k"], m_bits=params["m_bits"]
    ).write.mode("append").parquet(os.path.join(path, "positions"))


def read_store_params(path: str) -> dict:
    """The sidecar is the probe-ability token: absent means the store
    is mid-rewrite (or a rewrite crashed between bits and params) —
    refuse to probe rather than risk a stale-(k, m_bits) hash."""
    try:
        with open(_params_path(path)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"bloom store at {path} has positions but no {_PARAMS_FILE} "
            "sidecar — incomplete rewrite; rebuild with write_bloom_store"
        ) from None


def decontaminate_against_store(
    spark: SparkSession,
    docs_shingles: DataFrame,
    path: str,
    col: str = "sh",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shingles, bloom_maybe, maybe_frac) per training doc
    — map-only over the training side: the stored positions broadcast
    into the scan (<= m_bits rows after the distinct-on-read merge of
    any appended splits), k chained BroadcastHashJoins per the
    `bloom_probe` formulation, then one per-doc aggregate.

    Contract: `bloom_maybe` counts shingles the filter CANNOT rule
    out. Zero means provably clean (no false negatives); non-zero
    routes the doc to the exact check over the flagged slice only.
    """
    params = read_store_params(path)
    bits = (
        spark.read.parquet(os.path.join(path, "positions"))
        .distinct()  # bit-OR of every appended split
        .localCheckpoint(eager=False)  # k probe joins reuse one copy
    )
    probed = bloom_probe(
        docs_shingles, bits, col, k=params["k"], m_bits=params["m_bits"]
    )
    return probed.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum("bloom_hit").cast("long").alias("bloom_maybe"),
        F.round(
            F.sum("bloom_hit").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("maybe_frac"),
    )


def compact_bloom_store(spark: SparkSession, path: str) -> dict:
    """Store lifecycle (r12 verdict item 6): every appended epoch
    lands its own position rows, so the store accumulates duplicates
    of already-set bits (the probe's distinct-on-read hides the
    waste but the broadcast build pays it on every ingest).
    Compaction re-ORs the epochs at rest: one DISTINCT over the
    position set, rewritten side-by-side and swapped in — the
    resulting positions are EXACTLY the from-scratch build over the
    union of splits (pytest-pinned), at most m_bits rows forever.
    Bloom bits cannot be per-document retired (no per-doc ownership);
    retention for a decon store means rebuilding from the surviving
    benchmark corpus via `write_bloom_store`.

    The params sidecar is untouched and keeps gating probe-ability
    through the swap: a crash leaves either the intact old positions
    or the complete compacted set, both matching the sidecar (the
    distinct never changes (k, m_bits) semantics)."""
    import os
    import shutil

    params = read_store_params(path)  # refuse mid-rewrite stores
    pos_dir = os.path.join(path, "positions")
    cur = spark.read.parquet(pos_dir)
    rows_before = cur.count()
    tmp = pos_dir + "__compact_tmp"
    old = pos_dir + "__compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    cur.distinct().write.mode("overwrite").parquet(tmp)
    rows_after = spark.read.parquet(tmp).count()
    shutil.rmtree(old, ignore_errors=True)
    os.rename(pos_dir, old)
    os.rename(tmp, pos_dir)
    shutil.rmtree(old, ignore_errors=True)
    assert params == read_store_params(path)
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "rows_dropped": rows_before - rows_after,
    }
