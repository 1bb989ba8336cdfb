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


def pack_stats(packed: DataFrame, token_col: str, budget: "int | None" = None) -> DataFrame:
    """Per-(shard, pack) fill statistics — the packing-quality audit:
    n_docs, token_sum, and (when ``budget`` is given) the overflow
    flags. ``overflowed`` marks a pack whose token_sum exceeds the
    budget — expected for every non-final pack under next-fit, since
    the crossing document lands in the pack it started in.
    ``oversized_doc`` marks the pathological case: a SINGLE document
    larger than the budget. Such a document still gets exactly one
    pack_id (floor of its exclusive cumsum), but the following pack ids
    in its shard skip numbers (floor jumps by >1) and the pack can't be
    trained on without splitting — the flag is the downstream signal to
    chunk or drop it. Policy: packing never silently truncates; audit
    and decide."""
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("token_sum"),
    ]
    if budget is not None:
        aggs.append((F.sum(token_col) > F.lit(budget)).alias("overflowed"))
        aggs.append((F.max(token_col) > F.lit(budget)).alias("oversized_doc"))
    return packed.groupBy("shard", "pack_id").agg(*aggs)
