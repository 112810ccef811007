"""Nested-schema flattening — the JSON-ingest companion: turn
deeply-nested struct/array columns (the shape ``spark.read.json``
and API landing zones produce) into the flat relational layout the
rest of the engine's operators expect.

Reference parity note: the reference job (gluejob.py) only ever sees
flat JDBC/CSV rows; this extends the source-side surface the same
way sources/warc.py does — the semi-structured feeds a real lake
ingests need a deterministic flattening step before the reference's
own operators (upsert keys, partition derivation) can apply.

Semantics:

* ``flatten_structs`` lifts every struct field to a top-level column
  named ``parent<sep>child`` (recursively, depth-first in field
  order), leaving arrays/maps/scalars untouched. Pure projection —
  no shuffle, no data movement, column pruning still reaches the
  scan because Catalyst sees plain ``GetStructField`` chains
  (nested-schema pruning applies when reading parquet/JSON).
* ``explode_path`` explodes ONE array column (outer: empty/NULL
  arrays keep their row with NULLs — dropping parents silently is
  the classic flattening bug) and re-flattens any structs the
  elements expose. Callers chain it per array level EXPLICITLY;
  auto-exploding every array in one call multiplies cardinalities
  invisibly (a row with two independent 100-element arrays would
  fan out 10,000x), so that is deliberately not offered.
* Name collisions (a literal ``a_b`` column beside struct ``a.b``)
  raise at plan time rather than silently shadowing.

NULL handling: a NULL struct yields NULL in every lifted child
column (Spark's GetStructField semantics); NULL/empty arrays yield
one row of NULLs under ``explode_path`` (outer explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _lifted(prefix: str, dtype: T.DataType, col, sep: str):
    """Depth-first (name, Column) pairs for one top-level column."""
    if isinstance(dtype, T.StructType):
        out = []
        for f in dtype.fields:
            out += _lifted(
                f"{prefix}{sep}{f.name}", f.dataType, col[f.name], sep
            )
        return out
    return [(prefix, col)]


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Every struct column (recursively) lifted to ``parent_child``
    top-level columns; non-struct columns pass through in place."""
    cols = []
    names: set[str] = set()
    for field in df.schema.fields:
        for name, col in _lifted(
            field.name, field.dataType, F.col(field.name), sep
        ):
            if name in names:
                raise ValueError(
                    f"flatten_structs: name collision on {name!r}"
                )
            names.add(name)
            cols.append(col.alias(name))
    return df.select(*cols)


def explode_path(
    df: DataFrame, array_col: str, sep: str = "_"
) -> DataFrame:
    """One row per element of ``array_col`` (OUTER: rows with
    NULL/empty arrays survive with NULL elements), the element's
    struct fields lifted to ``array_col<sep>field`` columns. Chain
    per nesting level; see module docstring for why only one level
    explodes per call."""
    others = [c for c in df.columns if c != array_col]
    elem_type = dict(
        (f.name, f.dataType) for f in df.schema.fields
    )[array_col]
    if not isinstance(elem_type, T.ArrayType):
        raise ValueError(f"explode_path: {array_col!r} is not an array")
    exploded = df.select(
        *others, F.explode_outer(array_col).alias(array_col)
    )
    if isinstance(elem_type.elementType, T.StructType):
        pairs = _lifted(
            array_col, elem_type.elementType, F.col(array_col), sep
        )
        dup = {name for name, _ in pairs} & set(others)
        if dup:
            raise ValueError(
                f"explode_path: name collision on {sorted(dup)}"
            )
        return exploded.select(
            *others, *[col.alias(name) for name, col in pairs]
        )
    return exploded
