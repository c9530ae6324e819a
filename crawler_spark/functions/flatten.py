"""P4 nested-object flatten (SURVEY.md §2.2): dot-notation key flattening.

Reference: ``flattenObject`` (utils.js:71-94, used by paris-musees.js:126)
walks a nested JSON object producing ``a.b.c`` keys; arrays are NOT
descended into (utils.js skips them — they stay as values). Here the same
rule over Spark ``StructType`` columns: every struct column expands
recursively into dotted leaf columns; arrays/maps/scalars pass through.
Pure ``select`` generation — zero execution cost beyond the projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = ".") -> DataFrame:
    """Expand all StructType columns to dotted leaf columns, recursively."""
    cols = []

    def walk(prefix: str, path: str, dtype: T.DataType) -> None:
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f"{prefix}{sep}{f.name}", f"{path}.`{f.name}`", f.dataType)
        else:
            cols.append(F.expr(path).alias(prefix))

    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            walk(f.name, f"`{f.name}`", f.dataType)
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
