"""etl_gmaps_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the data-pipeline semantics of the
reference system (Paniceres/etl-gmaps — a Go scraping ETL with a durable
job queue, idempotent batched upserts, key dedupe, incremental
consolidation, schema evolution, and crash-resume) as an idiomatic
Spark engine:

* binlog/WAL-style change stream (lsn, epoch, op, key, payload)
* last-writer-wins via max-LSN per key (salted two-phase reduce)
* exactly-once apply through a commit-epoch ledger stored in table
  snapshot metadata
* per-partition checkpoint/lineage table for crash-resume
* additive schema evolution mid-stream
* all hot-path logic in DataFrame ops / Arrow-vectorized pandas UDFs

Layout:
    session     SparkSession builder (Arrow on, AQE on)
    schemas     StructTypes for target/log/ledger/checkpoint
    datagen     deterministic synthetic binlog + base table (seeded)
    oracle      single-threaded Python replay oracle (golden)
    tableio     snapshot-table storage: Iceberg if available, else a
                from-scratch parquet snapshot format with atomic commits
    operators   LWW reduce, merge apply, dedupe family, similarity, text
    sources     change-log reader, drift-tolerant CSV
    functions   scalar function library (geo, text, email, json)
    plans       the query catalog exposed through __spark_entry__
    streaming   micro-batch replay driver, ledger, checkpointing
"""

__version__ = "0.1.0"
