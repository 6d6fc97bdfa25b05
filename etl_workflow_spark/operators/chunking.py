"""Document chunking and training-sequence packing.

The two steps between a cleaned corpus and a training dataloader:

  chunk_documents   split each document into fixed-token-budget chunks
                    (optionally overlapping, RAG-style)
  pack_sequences    bin chunks into context-window-sized packs (the
                    "sequence packing" that keeps GPU batches dense)

Chunking is pure Spark SQL: tokens via ``split``, per-chunk slices via
``transform`` over a ``sequence`` of chunk indexes, fanned out with
``posexplode``. Each output row carries ONLY its own chunk text (the
alternative — exploding positions and re-slicing the full token array
per row — duplicates the whole document once per chunk, quadratic in
document length). The transform lambda is interpreted, but it runs
once per CHUNK with vectorized slice/concat inside, so total work stays
O(corpus tokens).

Packing is a greedy per-shard recurrence (each pack's state depends on
the previous decision), so it cannot be a window function. It IS
embarrassingly parallel across shards: documents hash-shard, each shard
packs its own chunk stream in one Arrow batch (``applyInPandas``), and
shard-local pack ids are made global by offsetting with the shard id.
Two strategies: next-fit (default — doc-order adjacency, cross-shard
waste at most one partial pack per shard) and best-fit-decreasing
(fewer packs on skewed sizes at the cost of doc contiguity; waste
follows the any-fit bound, not next-fit's one-partial-pack one). See
``pack_sequences``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACK_SHARD_BITS = 40  # local pack ids stay below 2^40 per shard


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 0,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size whitespace-token chunks per document.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; every document yields at
    least one chunk (empty/short docs give one short chunk). Output:
    (id, chunk_idx, chunk_text, n_tokens). Shuffle-free projection.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    # Materialize the token array BEFORE the chunk lambda references
    # it: a lambda body re-evaluates any captured outer expression per
    # element, so embedding the split() tree here would re-tokenize
    # the document once per chunk (quadratic in document length); a
    # bound column reference is O(1) per access.
    prepared = df.select(
        F.col(id_col), F.split(F.trim(F.col(col)), r"\s+").alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * stride + 1, chunk_tokens)
        ),
    )
    return prepared.select(
        F.col(id_col),
        n.alias("_n"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).select(
        id_col,
        "chunk_idx",
        "chunk_text",
        F.least(
            F.lit(chunk_tokens), F.col("_n") - F.col("chunk_idx") * stride
        )
        .cast("int")
        .alias("n_tokens"),
    )


def chunk_documents_oracle(
    chunk_tokens: int = 128,
    overlap: int = 0,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    stride = chunk_tokens - overlap
    toks = "string_split_regex(trim(text), '\\s+')"
    return f"""
        WITH t AS (
            SELECT {id_col}, {toks} AS toks, len({toks}) AS n FROM {table}
        ),
        x AS (
            SELECT {id_col}, toks, n,
                   unnest(generate_series(0,
                       GREATEST(CAST(CEIL((n - {overlap})
                                          / CAST({stride} AS DOUBLE)) AS INT),
                                1) - 1)) AS chunk_idx
            FROM t
        )
        SELECT {id_col}, CAST(chunk_idx AS INT) AS chunk_idx,
               array_to_string(
                   list_slice(toks, chunk_idx * {stride} + 1,
                              chunk_idx * {stride} + {chunk_tokens}), ' ')
                   AS chunk_text,
               CAST(LEAST({chunk_tokens}, n - chunk_idx * {stride}) AS INT)
                   AS n_tokens
        FROM x
    """


def pack_sequences(
    chunks: DataFrame,
    budget_tokens: int = 512,
    num_shards: int = 64,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
    strategy: str = "next_fit",
) -> DataFrame:
    """Greedy sequence packing: assign each chunk a ``pack_id`` so
    every pack's token total stays within ``budget_tokens``.

    Chunks longer than the budget get a pack of their own (they should
    have been chunked smaller — the pack still records them rather than
    dropping data). Deterministic: shard = hash(doc id), shard streams
    ordered by (doc id, chunk idx).

    Strategies (both shard-local — no sequential global pass):

    - ``next_fit`` (default): one open pack per stream; a chunk's
      doc-order neighbors stay adjacent, and every closed pack is
      fuller than ``budget - max_chunk``.
    - ``best_fit``: best-fit-decreasing — chunks sorted by descending
      size, each placed into the FULLEST open pack that still fits.
      Less padding waste (classic BFD ≤ 11/9·OPT + 1 packs) at the
      cost of scattering a document's chunks across packs; choose it
      when samples are independent chunks, not document streams.
    """
    if strategy not in ("next_fit", "best_fit"):
        raise ValueError(
            f"strategy must be 'next_fit' or 'best_fit', got {strategy!r}"
        )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in chunks.select(id_col, idx_col, tokens_col).schema.fields
    ) + ", pack_id long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([id_col, idx_col], kind="mergesort")
        shard = int(pdf["_shard"].iloc[0])
        out = pdf[[id_col, idx_col, tokens_col]].copy()
        if strategy == "next_fit":
            pack_ids, local, fill = [], 0, 0
            for n in pdf[tokens_col].to_numpy():
                n = int(n)
                if fill > 0 and fill + n > budget_tokens:
                    local += 1
                    fill = 0
                fill += n
                pack_ids.append((shard << _PACK_SHARD_BITS) | local)
        else:
            # best-fit-decreasing over the shard: stable argsort by
            # descending size keeps (doc, idx) order among equal sizes,
            # so the assignment is deterministic. Open packs live in a
            # fill-sorted list; the fullest pack that still fits is one
            # bisect (O(log p)) — a per-chunk linear scan would be
            # O(chunks × packs), quadratic in shard size, exactly on
            # the large-corpus path this strategy exists for. The
            # pop/insert memmoves are C-level on a flat int list.
            import bisect

            import numpy as np

            sizes = pdf[tokens_col].to_numpy()
            order = np.argsort(-sizes, kind="stable")
            fills: list[int] = []   # sorted open-pack fills
            packs: list[int] = []   # pack index parallel to fills
            next_pack = 0
            pack_ids = np.zeros(len(sizes), dtype=np.int64)
            for i in order:
                n = int(sizes[i])
                j = bisect.bisect_right(fills, budget_tokens - n) - 1
                if j >= 0:
                    f = fills.pop(j) + n
                    p = packs.pop(j)
                else:
                    f, p = n, next_pack
                    next_pack += 1
                k = bisect.bisect_left(fills, f)
                fills.insert(k, f)
                packs.insert(k, p)
                pack_ids[i] = (shard << _PACK_SHARD_BITS) | p
            pack_ids = pack_ids.tolist()
        out["pack_id"] = pack_ids
        return out

    return (
        chunks.select(id_col, idx_col, tokens_col)
        .withColumn(
            "_shard",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards)).cast("int"),
        )
        .groupBy("_shard")
        .applyInPandas(pack, schema=out_schema)
    )


def chunk_token_ids(
    df: DataFrame,
    ids_col: str = "token_ids",
    chunk_tokens: int = 1024,
    overlap: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size chunks of TOKENIZER id arrays — the unit a training
    pipeline actually packs. :func:`chunk_documents` counts whitespace
    tokens, which only approximates the tokenizer's sequence length;
    this operator chunks the encoded arrays (``bpe_encode`` /
    ``unigram_encode`` ``ids=True`` output) exactly, so every chunk is
    a model-ready id window.

    Chunk ``i`` covers ids ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; a non-NULL document
    yields at least one chunk (empty arrays give one empty chunk — the
    :func:`chunk_documents` rule); NULL arrays (NULL text was never
    encoded) yield one row with NULL ids and NULL ``n_tokens``,
    preserving the module's null contract. Output: (id, chunk_idx,
    ids, n_tokens) — feed straight into :func:`pack_sequences`.

    All codegen (transform over sequence + slice), shuffle-free; the
    id array is a bound column reference, never re-evaluated per
    chunk (the module's lambda-capture rule).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    ids = F.col("__ids")
    n = F.size(ids)
    n_chunks = F.when(ids.isNull(), F.lit(1)).otherwise(
        F.greatest(
            F.ceil((n - F.lit(overlap)) / F.lit(float(stride))), F.lit(1)
        )
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(ids, i * stride + 1, chunk_tokens),
    )
    # posexplode of a NULL array would DROP the row; a single NULL
    # element keeps the doc visible downstream
    chunks = F.when(ids.isNull(), F.array(F.lit(None))).otherwise(chunks)
    return (
        df.select(F.col(id_col), F.col(ids_col).alias("__ids"))
        .select(
            F.col(id_col),
            n.alias("_n"),
            F.posexplode(chunks).alias("chunk_idx", "ids"),
        )
        .select(
            id_col,
            "chunk_idx",
            "ids",
            F.when(F.col("ids").isNull(), F.lit(None)).otherwise(
                F.least(
                    F.lit(chunk_tokens),
                    F.col("_n") - F.col("chunk_idx") * stride,
                )
            ).cast("int").alias("n_tokens"),
        )
    )
