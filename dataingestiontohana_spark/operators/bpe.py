"""Byte-Pair-Encoding subword learner and encoder over a document
corpus — the tokenizer-training stage of a pretraining-data pipeline
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units"; the same word-count-then-merge architecture
HuggingFace `tokenizers` uses).

Scale architecture (why this shape is right at 100 TB):

1. **Corpus pass (Spark, the only big-data stage):** one scan reduces
   the corpus to the DISTINCT-WORD frequency table — groupBy(word)
   with map-side combine. BPE's training state never needs more: every
   pair count is a weighted sum over distinct word types, and the
   type vocabulary grows ~O(corpus^0.5) (Heaps' law), millions of rows
   where the corpus is trillions of tokens.
2. **Merge loop (exact, driver-side over the reduced table):** the
   classic algorithm on (word-symbols, count) — identical results to
   running over the raw corpus, at type-table cost. This is the same
   reduction every production BPE trainer performs; distributing the
   loop itself would spend a Spark job's latency per merge to scan a
   table that fits in memory by construction. A guard raises if the
   type table exceeds ``max_types`` rather than silently collecting
   an unbounded frame.
3. **Application (Spark, map-only):** encoding documents with the
   learned merges broadcasts the rank table and runs in Arrow batches
   (mapInPandas) — embarrassingly parallel, no shuffle.

Determinism contract: ties on pair frequency break by the
lexicographically smallest (left, right) pair, so the merge sequence
is a pure function of the corpus — reproducible across engines and
cluster sizes, the property every other operator in this repo pins.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# end-of-word sentinel (Sennrich's </w>): lets a merge distinguish
# word-final from word-internal occurrences
EOW = "</w>"

# the executor-side twin of functions/text.py::tokens(): lowercase +
# split on JAVA \s (ASCII whitespace ONLY — python's str.split() also
# splits on NBSP and other Unicode spaces, which would desynchronize
# encoding from the vocabulary the merges were learned on)
_WS = "[ \t\n\x0b\f\r]+"


def _py_tokens(text: str) -> list[str]:
    import re

    return [
        w
        for w in re.split(_WS, text.lower().strip(" \t\n\x0b\f\r"))
        if w
    ]


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the corpus reduced to its distinct-word frequency
    table — one scan, one shuffle with map-side combine."""
    from dataingestiontohana_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    """Apply one merge to a symbol tuple (leftmost-first, as the
    reference algorithm does)."""
    out = []
    i, n = 0, len(symbols)
    while i < n:
        if (
            i + 1 < n
            and symbols[i] == pair[0]
            and symbols[i + 1] == pair[1]
        ):
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    max_types: int = 2_000_000,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [(rank, left, right, pair_freq)] in merge order.

    The corpus reduces to the distinct-word table in Spark (see module
    docstring); the merge loop is the exact Sennrich algorithm over
    that table. Raises if the type table exceeds ``max_types`` —
    at that point shard the corpus or raise the bound consciously
    instead of OOMing the driver.
    """
    wc = word_counts(docs, text_col).collect()
    if len(wc) > max_types:
        raise ValueError(
            f"distinct-word table has {len(wc)} types > max_types="
            f"{max_types}; raise the bound or pre-truncate the corpus"
        )
    vocab: dict[tuple, int] = {}
    for row in wc:
        vocab[tuple(row["word"]) + (EOW,)] = row["cnt"]

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for symbols, cnt in vocab.items():
            for i in range(len(symbols) - 1):
                pairs[(symbols[i], symbols[i + 1])] += cnt
        if not pairs:
            break
        # deterministic argmax: max freq, then lexicographically
        # smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), freq = best
        merges.append((rank, left, right, freq))
        vocab = {
            _merge_word(symbols, (left, right)): cnt
            for symbols, cnt in vocab.items()
        }
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document with the learned merges:
    (id, n_words, n_subwords) — map-only Arrow batches, merge ranks
    broadcast once per executor via closure capture.

    Encoding applies merges in rank order per word (the standard
    greedy application); a per-batch word cache collapses repeated
    types so the cost is O(distinct words per batch), not O(tokens).
    """
    ranks = {(left, right): rank for rank, left, right, _ in merges}
    out_schema = f"{id_col} long, n_words long, n_subwords long"

    def encode_word(word: str) -> int:
        symbols = tuple(word) + (EOW,)
        while len(symbols) > 1:
            best = None
            for i in range(len(symbols) - 1):
                r = ranks.get((symbols[i], symbols[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, (symbols[i], symbols[i + 1]))
            if best is None:
                break
            symbols = _merge_word(symbols, best[1])
        return len(symbols)

    def run(batches):
        import pandas as pd

        cache: dict[str, int] = {}
        for pdf in batches:
            n_words, n_sub = [], []
            for text in pdf[text_col].fillna(""):
                words = _py_tokens(text)
                n_words.append(len(words))
                total = 0
                for w in words:
                    if w not in cache:
                        cache[w] = encode_word(w)
                    total += cache[w]
                n_sub.append(total)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": n_words,
                    "n_subwords": n_sub,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, out_schema)
