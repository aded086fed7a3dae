"""Sequence packing — assembling fixed-budget training shards.

An LLM pre-training pipeline doesn't feed documents one-by-one; it packs
them into fixed-token-budget sequences (shards) so every training step is
full. Distributed greedy packing: each partition packs its own documents
first-fit into shards of ``max_tokens``, with shard ids namespaced by
partition id so the global id space never needs coordination — the
embarrassingly-parallel formulation that scales linearly with partitions
(packing quality is within a small constant of optimal for doc ≪ budget,
and no shuffle is needed at all).

Oversized documents (n_tokens > max_tokens) get a shard of their own and
are flagged ``oversize`` — the caller decides whether to split or drop
(splitting is tokenizer-dependent, out of scope here).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PACKED_SCHEMA = (
    "shard_id long, doc_id long, n_tokens long, shard_fill long, oversize boolean"
)

# shard_id = partition_id * _PID_STRIDE + local shard seq — collision-free
# as long as no partition packs more than _PID_STRIDE shards
_PID_STRIDE = 1 << 40


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    max_tokens: int = 2048,
) -> DataFrame:
    """Greedy first-fit packing per partition → (shard_id, doc_id, n_tokens,
    shard_fill, oversize). Every input doc appears exactly once; every
    shard's fill is ≤ max_tokens unless it holds a single oversize doc."""

    def pack_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid * _PID_STRIDE
        shard_seq = 0
        fill = 0
        out_shard: list[int] = []
        out_doc: list[int] = []
        out_tok: list[int] = []
        for pdf in batches:
            for doc_id, n_tok in zip(pdf[id_col], pdf[tokens_col]):
                n_tok = int(n_tok)
                if fill > 0 and fill + n_tok > max_tokens:
                    shard_seq += 1
                    fill = 0
                out_shard.append(base + shard_seq)
                out_doc.append(int(doc_id))
                out_tok.append(n_tok)
                fill += n_tok
                if fill >= max_tokens:
                    shard_seq += 1
                    fill = 0
        if out_doc:
            df = pd.DataFrame(
                {"shard_id": out_shard, "doc_id": out_doc, "n_tokens": out_tok}
            )
            fills = df.groupby("shard_id")["n_tokens"].transform("sum")
            df["shard_fill"] = fills
            df["oversize"] = df["n_tokens"] > max_tokens
            yield df

    return docs.select(id_col, tokens_col).mapInPandas(
        pack_partition, schema=PACKED_SCHEMA
    )
