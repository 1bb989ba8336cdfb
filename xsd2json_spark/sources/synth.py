"""Deterministic synthetic source tables (the BASELINE.json input_hint
shape): files(repo, path, commit, lang, content) + dimension tables.

Everything is a pure column expression over ``spark.range(n)`` — the
generator is itself distributed (no driver-side row materialization, no
RNG state), so the same code synthesizes 10^4 rows for pytest and 10^8+
rows for the scaling bench; two runs at different parallelism produce
IDENTICAL rows (seeded xxhash64 of the row id — per SURVEY §7 the
two-parallelism benchmark and goldens must be reproducible).

Violation injection is id-modulo based and therefore exactly countable
in tests:
- NULL content       at id % null_every == 0        (not_null fixture)
- out-of-enum lang   at id % bad_lang_every == 0    (enum fixture)
- short commit (39)  at id % bad_commit_every == 0  (length/pattern)
- oversize content   at id % oversize_every == 0    (length fixture)
- duplicate key      at id % dup_every == 0 (key derived from id-1)
  inside whatever repo id-1 lands in                (unique fixture)
- FK-dangling repos  repos_dim deliberately omits FK_MISSING_REPOS

Skew: repo is Zipf-ish — ``hot_share`` of rows land in repo_0 (the hot
repo), the rest spread uniformly over n_repos-1 — to exercise the salted
uniqueness path and AQE skew joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "scala", "go", "js", "sql"]
EXT = {"python": "py", "java": "java", "scala": "scala", "go": "go", "js": "js", "sql": "sql"}
WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
]
FK_MISSING_REPOS = ("repo_7", "repo_13")


def _h(col, seed: int):
    """Deterministic non-negative hash of a column + seed."""
    return F.abs(F.xxhash64(col.cast("string"), F.lit(seed)))


def _pick(arr: list, idx_col) -> "F.Column":
    return F.element_at(F.array(*[F.lit(w) for w in arr]), (idx_col % len(arr) + 1).cast("int"))


def files_table(
    spark: SparkSession,
    n_rows: int = 10_000,
    n_repos: int = 20,
    hot_share: int = 50,  # percent of rows in repo_0
    seed: int = 42,
    null_every: int = 997,
    bad_lang_every: int = 499,
    bad_commit_every: int = 739,
    oversize_every: int = 1499,
    dup_every: int = 1009,
    partitions: int | None = None,
) -> DataFrame:
    df = spark.range(0, n_rows, numPartitions=partitions) if partitions else spark.range(n_rows)
    gid = F.col("id")

    # key identity: duplicate rows borrow the previous id's key columns
    base = F.when((gid % dup_every == 0) & (gid > 0), gid - 1).otherwise(gid)

    repo = F.when(
        _h(base, seed) % 100 < hot_share, F.lit("repo_0")
    ).otherwise(F.concat(F.lit("repo_"), (_h(base, seed + 1) % (n_repos - 1) + 1).cast("string")))

    lang = F.when(gid % bad_lang_every == 0, F.lit("cobol")).otherwise(_pick(LANGS, _h(base, seed + 2)))
    # ext consistent with the (valid) lang
    ext = F.when(gid % bad_lang_every == 0, F.lit("cob")).otherwise(
        _pick([EXT[l] for l in LANGS], _h(base, seed + 2))
    )
    path = F.concat(
        F.lit("src/"), _pick(WORDS, _h(base, seed + 3)),
        F.lit("/"), _pick(WORDS, _h(base, seed + 4)),
        F.lit("_"), (_h(base, seed + 5) % 1000).cast("string"),
        F.lit("."), ext,
    )

    commit_full = F.substring(F.sha2(F.concat(base.cast("string"), F.lit(f"#{seed}")), 256), 1, 40)
    commit = F.when(gid % bad_commit_every == 0, F.substring(commit_full, 1, 39)).otherwise(commit_full)

    body = F.concat_ws(
        " ",
        _pick(WORDS, _h(gid, seed + 6)), _pick(WORDS, _h(gid, seed + 7)),
        _pick(WORDS, _h(gid, seed + 8)), _pick(WORDS, _h(gid, seed + 9)),
        F.lit("fn"), (_h(gid, seed + 10) % 100000).cast("string"),
    )
    content = (
        F.when(gid % null_every == 0, F.lit(None).cast("string"))
        .when(gid % oversize_every == 0, F.concat(body, F.repeat(F.lit(" xx"), 40000)))
        .otherwise(F.concat(F.lit("// "), path, F.lit("\n"), body))
    )

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def repos_dim(spark: SparkSession, n_repos: int = 20) -> DataFrame:
    """Dimension for FK checks; FK_MISSING_REPOS deliberately absent
    (dangling-$ref analog, xsd2json.pl:983-986)."""
    return (
        spark.range(n_repos)
        .select(F.concat(F.lit("repo_"), F.col("id").cast("string")).alias("repo"))
        .filter(~F.col("repo").isin(*FK_MISSING_REPOS))
        .withColumn("default_branch", F.lit("main"))
    )


def commits_dim(spark: SparkSession, files: DataFrame, drop_every: int = 17) -> DataFrame:
    """(repo, commit) dimension derived from the fact table with every
    drop_every-th distinct commit removed -> dangling commits."""
    distinct = files.select("repo", "commit").dropDuplicates()
    return distinct.filter(_h(F.col("commit"), 7) % drop_every != 0)
