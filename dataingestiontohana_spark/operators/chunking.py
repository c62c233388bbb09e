"""Context-window chunking: split documents into fixed-size token
windows with overlap — the standard prep step that turns a cleaned
corpus into training-window rows (every LLM data pipeline ends here
before tokenizer/packing stages).

Two formulations, identical output:

- :func:`chunk_windows` — the SCALE path. Pure built-in expressions:
  tokenize once, compute the chunk count arithmetically, explode a
  chunk-index sequence, slice the token array per index. Map-only (no
  shuffle, no Python); row growth is ~n_tokens/stride per doc, the
  output's intrinsic size.
- :func:`make_chunk_udtf` — the same logic as a Spark 4 Python UDTF
  (lateral-join table function). The API-surface variant: useful when
  the per-chunk logic outgrows SQL (real tokenizers, packing
  heuristics); kept row-identical to the declarative path by the test
  suite so either can stand in for the other.

Chunk layout: starts at 0, stride, 2*stride, ... with
stride = chunk_tokens - overlap; the number of chunks is
ceil(max(n_tokens - overlap, 1) / stride), so every token lands in
at least one chunk, consecutive chunks share exactly ``overlap``
tokens, and a short document yields one (short) chunk. The emitted
``chunk_fp`` is md5 of the space-joined window — a portable 32-char
identity that keeps the row narrow and DuckDB-checkable (the full
text is recoverable by re-slicing; pipelines that need the window
text materialize it with ``with_text=True``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# knuth_bucket: the shared portable high-bits multiplicative bucket
# (functions/hashing.py) — the earlier low-bits (id*K) mod m form
# degenerated for even m (round-4 advice), and the single shared
# implementation keeps ivf / pack_chunks / the q78 oracle bit-identical
from dataingestiontohana_spark.functions.hashing import knuth_bucket
from dataingestiontohana_spark.functions.text import tokens

DEFAULT_CHUNK_TOKENS = 128
DEFAULT_OVERLAP = 16


def chunk_windows(
    docs: DataFrame,
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    overlap: int = DEFAULT_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_text: bool = False,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_fp[, chunk_text]) rows."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # NULL text behaves like '' (one 1-token chunk of the empty token),
    # matching the UDTF's `text or ""` — without the coalesce the
    # declarative path emits n_tokens = NULL for NULL docs and the two
    # formulations silently diverge (round-4 advice)
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n = F.size(toks)
    n_chunks = F.ceil(F.greatest(n - overlap, F.lit(1)) / F.lit(stride)).cast(
        "int"
    )
    base = docs.select(
        F.col(id_col), toks.alias("__toks"), n_chunks.alias("__nc")
    ).select(
        id_col,
        "__toks",
        F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
    )
    window = F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    cols = [
        F.col(id_col),
        F.col("chunk_id"),
        F.size(window).alias("n_tokens"),
        F.md5(F.concat_ws(" ", window)).alias("chunk_fp"),
    ]
    if with_text:
        cols.append(F.concat_ws(" ", window).alias("chunk_text"))
    return base.select(*cols)


def make_chunk_udtf(
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS, overlap: int = DEFAULT_OVERLAP
):
    """Build the UDTF class for ``spark.udtf.register`` — lateral form:
    ``SELECT d.doc_id, c.* FROM documents d, LATERAL chunk_doc(d.text) c``.

    Python-side normalization/tokenization mirrors functions.text
    tokens() exactly (lower, collapse whitespace, trim, split on one
    space), and the fingerprint is the same md5-of-joined-window, so
    the output is row-identical to :func:`chunk_windows`.
    """
    import hashlib
    import re

    from pyspark.sql.functions import udtf

    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    @udtf(returnType="chunk_id int, n_tokens int, chunk_fp string")
    class ChunkDoc:
        def eval(self, text: str):
            # ASCII-only whitespace on purpose: python's unicode-aware
            # \s (and bare str.strip()) would also eat NBSP and
            # friends, which Spark's Java regex/trim and DuckDB's RE2
            # (both ASCII) do not — without re.ASCII + the explicit
            # strip set, the three engines disagree on any document
            # containing them (caught by the nasty-whitespace test)
            norm = re.sub(
                r"\s+", " ", (text or "").lower(), flags=re.ASCII
            ).strip(" \t\n\r\f\v")
            toks = norm.split(" ")
            n_chunks = -(-max(len(toks) - overlap, 1) // stride)  # ceil div
            for k in range(n_chunks):
                w = toks[k * stride : k * stride + chunk_tokens]
                joined = " ".join(w)
                yield k, len(w), hashlib.md5(joined.encode()).hexdigest()

    return ChunkDoc





def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int = 2048,
    n_buckets: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Pack chunk rows into fixed-token-budget training sequences:
    (bucket, pack_id, n_chunks, n_tokens, fill) — one row per packed
    sequence. NOTE: the default ``n_buckets`` follows the cluster's
    ``defaultParallelism``, so bucket/pack_id assignments VARY with
    cluster size under the default — pass an explicit ``n_buckets``
    whenever those columns are part of your output contract (same
    input, same packing, on any cluster).

    Layout: each chunk lands in a deterministic bucket (high-bits
    Knuth multiplicative hash of the doc id — portable, so co-located
    with its document's other chunks), chunks order by (doc_id,
    chunk_id) within the bucket, and a chunk belongs to pack
    floor(tokens_before_it / budget) — the concat-stream-then-cut
    packing, where the chunk straddling a cut starts the next
    sequence's attention span. This is the window-expressible packing:
    true greedy no-split packing is sequentially dependent per bucket
    and cannot parallelize beyond buckets either.

    Scale: ONE window (cumulative sum) partitioned by bucket — the
    parallel unit is the bucket. ``n_buckets`` defaults to the
    cluster's ``defaultParallelism`` so the window parallelism tracks
    the cluster automatically (on a 1000-executor cluster the cumsum
    fans out 1000+ ways with no parameter tuning); pass an explicit
    value when the bucket layout itself is part of the output contract
    (the declared q78 pins 8 for oracle stability). The per-pack
    aggregation then reduces on (bucket, pack_id). No single-partition
    window anywhere (the engine-wide plan test enforces this).
    """
    if n_buckets is None:
        n_buckets = chunks.sparkSession.sparkContext.defaultParallelism
    bucket = knuth_bucket(id_col, n_buckets)
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col, "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = chunks.select(
        F.col(id_col), "chunk_id", "n_tokens", bucket.alias("bucket")
    ).select(
        "bucket",
        id_col,
        "chunk_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__before"),
    )
    packed = staged.select(
        "bucket",
        F.floor(F.col("__before") / budget_tokens).cast("int").alias("pack_id"),
        "n_tokens",
    )
    return (
        packed.groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_chunks"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "pack_id",
            "n_chunks",
            "n_tokens",
            F.round(F.col("n_tokens") / F.lit(budget_tokens), 4).alias("fill"),
        )
    )
