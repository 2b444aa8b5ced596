"""Export sinks (SURVEY.md S5/S6): CSV and JSON-lines result files.

The reference ships results through csv.Writer / json.Encoder over one
output file (runner/filerunner/filerunner.go:159-182), with every
nested Entry field JSON-stringified into its CSV cell
(gmaps/entry.go:157-231: stringify(e.OpenHours), stringify(e.Images),
...). The Spark-first shape: ``to_json`` each non-atomic column —
JVM-side codegen, no UDF — then a plain distributed ``df.write``.

Scale notes: both writers emit one part file per partition in a single
pass (no driver collect); ``single_file=True`` coalesces to one part
for the reference's one-file UX — only sane for final small exports,
never for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def stringify_nested(df: DataFrame) -> DataFrame:
    """JSON-stringify every array/struct/map column (the stringify()
    calls in the reference's CsvRow, gmaps/entry.go:195-231); atomic
    columns pass through unchanged. Null stays null, not 'null'."""
    cols = [
        F.to_json(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """S5: CSV sink with nested columns JSON-stringified into cells
    (reference csvwriter via filerunner.go:175-182 + entry.go:195-231).
    """
    out = stringify_nested(df)
    if single_file:
        out = out.coalesce(1)
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """S6: JSON-lines sink (reference jsonwriter via
    filerunner.go:176-178) — nested columns stay nested; Spark's json
    writer emits one object per row."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)
