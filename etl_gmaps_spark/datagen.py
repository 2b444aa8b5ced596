"""Deterministic synthetic CDC fixtures (FIXTURES.md #1-#3).

Everything is generated *distributed* with ``spark.range`` plus pure
arithmetic (31-bit LCG mixing) — no driver-side loops, no RNG objects,
no wall clock — so the same generator that makes the 10k-event test
fixture makes a 10^10-event bench log by changing one argument, and the
same formulas are expressible in ANSI SQL for DuckDB oracles.

Embedded scenarios required by FIXTURES.md #2:
  * skew: ``hot_keys`` doc_ids receive ``hot_frac`` of all events
  * duplicate epochs: ``dup_epochs`` full epochs appear twice, identical
    rows (replayed batch — mirrors the reference's idempotent enqueue,
    ON CONFLICT DO NOTHING, postgres/provider.go:108-111)
  * out-of-order within epoch: rows are stored shuffled w.r.t. lsn
  * delete→reinsert and update-after-delete arise naturally from the
    per-key op stream (ops are key-independent draws)
  * additive evolution: events with ``lsn > evolve_at`` carry a ``lang``
    column (mirrors migration 0002_add_lat_lon_results.up.sql)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50257  # GPT-2-ish token id domain per FIXTURES.md #1
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2_147_483_648  # 2^31 — products stay < 2^61, safe under ANSI mode
SOURCES = ("web", "books", "code", "wiki")


def _mix(col, salt: int):
    """One LCG round; chain for decorrelation. Pure int64-safe arithmetic."""
    return F.pmod(col * F.lit(LCG_A) + F.lit(LCG_C + salt * 7919), F.lit(LCG_M))


def _mix2(col, salt: int):
    return _mix(_mix(col, salt), salt + 104729)


def _tokens_expr(mix_col, n_tok_col):
    """tokens[i] = (mix + (i+1)*104729) % VOCAB — deterministic per event."""
    return F.transform(
        F.sequence(F.lit(1), n_tok_col),
        lambda i: ((mix_col + i.cast("long") * F.lit(104729)) % F.lit(VOCAB)).cast("int"),
    )


def gen_base(
    spark: SparkSession,
    n_docs: int = 1000,
    seed: int = 42,
    max_tok: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    """Initial target-table state: ``doc-%08d`` keyed, tokens 1..max_tok."""
    df = spark.range(n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    m = _mix2(F.col("id") + F.lit(seed * 31), 1)
    n_tok = (F.pmod(_mix2(F.col("id") + F.lit(seed * 31), 2), F.lit(max_tok)) + 1).cast("int")
    return df.select(
        F.format_string("doc-%08d", F.col("id")).alias("doc_id"),
        _tokens_expr(m, n_tok).alias("tokens"),
        n_tok.alias("n_tok"),
        F.element_at(F.array(*[F.lit(s) for s in SOURCES]), (F.pmod(m, F.lit(4)) + 1).cast("int")).alias("source"),
    )


def gen_changelog(
    spark: SparkSession,
    n_docs: int = 1000,
    n_events: int = 10_000,
    seed: int = 42,
    max_tok: int = 64,
    hot_keys: int = 5,
    hot_frac: float = 0.30,
    pct_insert: int = 25,
    pct_delete: int = 15,
    epoch_size: int = 1000,
    dup_epochs: tuple[int, ...] = (2,),
    evolve_at: int | None = None,
    new_key_space: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Synthetic binlog over the ``gen_base(n_docs)`` corpus.

    Returns a DataFrame in *storage order* (shuffled within epoch); the
    schema includes ``lang`` iff ``evolve_at`` is set. op mix defaults to
    25% I / 60% U / 15% D. I and U are both upserts at apply time (the
    target is keyed; MERGE resolves existence) — op 'D' is the only
    semantic difference, matching last-writer-wins over (op, payload).
    """
    new_key_space = new_key_space or n_docs // 2
    nparts = partitions or spark.sparkContext.defaultParallelism
    df = spark.range(n_events, numPartitions=nparts).select((F.col("id") + 1).alias("lsn"))

    s = F.col("lsn") + F.lit(seed * 1_000_003)
    r_op = F.pmod(_mix2(s, 11), F.lit(100))
    r_hot = F.pmod(_mix2(s, 13), F.lit(100))
    r_key = _mix2(s, 17)
    r_pay = _mix2(s, 19)

    op = (
        F.when(r_op < F.lit(pct_insert), F.lit("I"))
        .when(r_op < F.lit(100 - pct_delete), F.lit("U"))
        .otherwise(F.lit("D"))
    )
    # hot_frac of events hit one of `hot_keys` ids; I-ops may mint keys
    # just past the base range (delete→reinsert still hits base keys).
    doc_num = (
        F.when(r_hot < F.lit(int(hot_frac * 100)), F.pmod(r_key, F.lit(hot_keys)))
        .when(op == F.lit("I"), F.pmod(r_key, F.lit(n_docs + new_key_space)))
        .otherwise(F.pmod(r_key, F.lit(n_docs)))
    )
    n_tok = (F.pmod(r_pay, F.lit(max_tok)) + 1).cast("int")
    is_del = op == F.lit("D")

    cols = [
        F.col("lsn"),
        ((F.col("lsn") - 1) / F.lit(epoch_size)).cast("long").alias("epoch"),
        op.alias("op"),
        F.format_string("doc-%08d", doc_num).alias("doc_id"),
        F.when(is_del, F.lit(None)).otherwise(_tokens_expr(r_pay, n_tok)).alias("tokens"),
        F.when(is_del, F.lit(None)).otherwise(n_tok).alias("n_tok"),
        F.when(is_del, F.lit(None)).otherwise(
            F.element_at(F.array(*[F.lit(x) for x in SOURCES]), (F.pmod(r_pay, F.lit(4)) + 1).cast("int"))
        ).alias("source"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("lsn")).alias("ts"),
    ]
    if evolve_at is not None:
        langs = F.array(F.lit("en"), F.lit("es"), F.lit("de"), F.lit("fr"))
        cols.append(
            F.when(
                (F.col("lsn") > F.lit(evolve_at)) & ~is_del,
                F.element_at(langs, (F.pmod(r_pay, F.lit(4)) + 1).cast("int")),
            ).alias("lang")
        )
    log = df.select(*cols)

    # replayed batches: duplicate whole epochs, byte-identical rows
    if dup_epochs:
        log = log.unionByName(log.filter(F.col("epoch").isin(list(dup_epochs))))

    # out-of-order within epoch: store scrambled w.r.t. lsn
    return log.repartition(nparts, F.pmod(_mix2(F.col("lsn"), 23), F.lit(nparts))).sortWithinPartitions(
        F.pmod(_mix2(F.col("lsn"), 29), F.lit(LCG_M))
    )


def write_fixtures(
    spark: SparkSession,
    out_dir: str,
    n_docs: int = 1000,
    n_events: int = 10_000,
    seed: int = 42,
    evolve_at: int | None = None,
    **log_kwargs,
) -> dict[str, str]:
    """Materialize base + log parquet under ``out_dir``; returns paths."""
    base_path = f"{out_dir}/target_base"
    log_path = f"{out_dir}/change_log"
    gen_base(spark, n_docs=n_docs, seed=seed).write.mode("overwrite").parquet(base_path)
    gen_changelog(
        spark, n_docs=n_docs, n_events=n_events, seed=seed, evolve_at=evolve_at, **log_kwargs
    ).write.mode("overwrite").parquet(log_path)
    return {"base": base_path, "log": log_path}
