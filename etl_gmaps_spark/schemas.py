"""Schemas for the CDC engine (FIXTURES.md #1-#6).

Target row shape is authoritative from BASELINE.json input_hint:
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``.

The change-log envelope is modeled on the reference's durable queue row
(reference: scripts/migrations/0001_create_tables.up.sql —
``gmaps_jobs(id, priority, payload_type, payload, created_at, status)``)
with ``payload_type`` becoming the ``op`` discriminator and the
``(priority, created_at)`` consumption order (reference:
postgres/provider.go:159) collapsed into a single total-order ``lsn``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- target table (FIXTURES.md #1) ------------------------------------
TARGET_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), nullable=False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), nullable=True),
        T.StructField("n_tok", T.IntegerType(), nullable=True),
        T.StructField("source", T.StringType(), nullable=True),
    ]
)

# --- change log (FIXTURES.md #2) ---------------------------------------
CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), nullable=False),
        T.StructField("epoch", T.LongType(), nullable=False),
        T.StructField("op", T.StringType(), nullable=False),  # I / U / D
        T.StructField("doc_id", T.StringType(), nullable=False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), nullable=True),
        T.StructField("n_tok", T.IntegerType(), nullable=True),
        T.StructField("source", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=True),
    ]
)

# --- change log with additive evolution (FIXTURES.md #3) ---------------
CHANGELOG_EVOLVED_SCHEMA = T.StructType(
    CHANGELOG_SCHEMA.fields + [T.StructField("lang", T.StringType(), nullable=True)]
)

# --- per-partition checkpoint / lineage (FIXTURES.md #4) ---------------
# Mirrors the reference's job-lineage log (0_AGENTE_GOSOM/src/
# core_logic.py:488-514: job_id, fecha, hora, filas_extraidas, error) and
# the queue status flips new->queued (postgres/provider.go:152-165).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType(), nullable=False),
        T.StructField("last_lsn", T.LongType(), nullable=False),
        T.StructField("rows_applied", T.LongType(), nullable=False),
        T.StructField("bytes", T.LongType(), nullable=False),
        T.StructField("epoch", T.LongType(), nullable=False),
        T.StructField("updated_at", T.TimestampType(), nullable=True),
    ]
)

# --- commit-epoch ledger (FIXTURES.md #5) -------------------------------
# Mirrors the reference's idempotent enqueue (ON CONFLICT DO NOTHING on
# job UUID, postgres/provider.go:108-111) and the web job state machine
# pending/working/ok/failed (web/job.go:11-16).
LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), nullable=False),
        T.StructField("status", T.StringType(), nullable=False),
        T.StructField("rows_applied", T.LongType(), nullable=False),
        T.StructField("snapshot_id", T.LongType(), nullable=False),
    ]
)

OPS = ("I", "U", "D")
