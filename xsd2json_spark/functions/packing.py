"""Training-sequence packing: assign documents to fixed-token-budget
packs, deterministically and in parallel.

The pretraining data-layout step after filtering/dedup: concatenate
documents into training sequences of ~budget tokens. A global greedy
first-fit is inherently sequential (and irreproducible under
repartition); the scalable, reproducible shape is:

1. SHARD by a deterministic key hash (sampling.hash_bucket) — packs
   never cross shards, so every shard packs independently in parallel;
2. within a shard, order by the key and run a window cumulative token
   sum; pack_id = floor(exclusive-cumsum / budget) — contiguous
   next-fit: a pack takes documents until the budget is crossed, the
   crossing document overflows into its pack (training pipelines chunk
   the concatenated stream anyway, so overflow is handled downstream).

Pure window expressions — one shuffle on the shard key, SQL-replayable
(the DuckDB oracle runs the identical window), stable under
repartition and corpus growth WITHIN a shard prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xsd2json_spark.functions.sampling import hash_bucket


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 64,
    seed: int = 42,
    family: str = "xxhash64",
) -> DataFrame:
    """Add (shard, pack_id, pack_pos) to each document. Deterministic:
    shard = key-hash bucket mod n_shards; within a shard, documents are
    ordered by id and packed contiguously by exclusive cumulative token
    count. One window per shard — parallelism = n_shards; pick n_shards
    >= cluster cores at scale (the window itself is a single pass per
    shard)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    shard = F.pmod(hash_bucket([id_col], seed, family), F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy(id_col)
    csum_excl = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        df.withColumn("shard", shard.cast("int"))
        .withColumn("pack_id", F.floor(csum_excl / budget).cast("long"))
        .withColumn("pack_pos", (F.row_number().over(w) - 1).cast("long"))
    )


def pack_stats(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-(shard, pack) fill statistics — the packing-quality audit:
    n_docs, token_sum, and whether the pack overflowed its budget
    (every pack except a shard's last should sit in
    (budget - max_doc_tokens, budget + last_doc_tokens])."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("token_sum"),
    )
