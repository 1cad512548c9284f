"""F12 — recursive sanitize over arbitrarily nested payloads as a
plan-time expression generator.

The reference's ``sanitize_payload`` walks the payload tree depth-first
applying per-key rules (reference src/utils/api_helpers.py:268-279; its
own docs name it the first thing to test, docs/technical-spec.md:99).
A Spark engine must not do that walk per row in Python: the payload
*schema* is known at plan time, so the walk happens once over the
``StructType``, emitting one nested Column expression tree —
``struct()`` rebuilds for struct fields, ``transform()`` for arrays of
structs — that then runs entirely inside whole-stage codegen.

Rule table (name-keyed, mirroring the reference's key dispatch):
- ``*_budget`` / ``spend_cap``  → positive-amount money coerce (F1/F3)
- ``start_time``                → parse → clamp-to-now → ISO (F7/F8/F9)
- other ``*_time``              → parse → ISO (F7/F8, the F10 fields)
- ``*_categories``              → string-collection normalize (F4/F5)
- ``is_*``                      → boolean coerce (F14)
- structs / arrays-of-structs   → recurse (depth-capped)
- anything else                 → passthrough

Depth is capped (SURVEY §7 risk register) — the reference's payloads
bottom out at 4 levels (``object_story_spec`` trees).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

from ad_data_lake_spark.functions import sanitize as S

MAX_DEPTH = 8


def leaf_rule(name: str, col: Column, now: Column) -> Column:
    """The scalar sanitize rule for one leaf field, selected by name —
    the plan-time analogue of the reference's per-key dispatch."""
    if name.endswith("_budget") or name == "spend_cap":
        return S.parse_positive_amount(col)
    if name == "start_time":
        return S.isoformat_datetime(S.clamp_start_time(col, now))
    if name.endswith("_time"):
        return S.isoformat_datetime(S.parse_datetime_value(col))
    if name.endswith("_categories"):
        return S.normalize_string_collection(col)
    if name.startswith("is_"):
        return S.boolean_coerce(col)
    return col


def sanitize_expr(name: str, dtype: DataType, col: Column, now: Column, depth: int = 0) -> Column:
    """Walk one field: recurse through structs and arrays-of-structs,
    apply the leaf rule otherwise."""
    if depth >= MAX_DEPTH:
        return col
    if isinstance(dtype, StructType):
        return F.struct(
            *[
                sanitize_expr(f.name, f.dataType, col.getField(f.name), now, depth + 1).alias(
                    f.name
                )
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, ArrayType) and isinstance(dtype.elementType, StructType):
        et = dtype.elementType
        return F.transform(
            col,
            lambda x: F.struct(
                *[
                    sanitize_expr(f.name, f.dataType, x.getField(f.name), now, depth + 1).alias(
                        f.name
                    )
                    for f in et.fields
                ]
            ),
        )
    return leaf_rule(name, col, now)


def sanitize_payload(df: DataFrame, payload_col: str, now: Column) -> DataFrame:
    """Recursively sanitize a nested payload column: one generated
    expression tree, no per-row Python. The schema walk runs once at
    plan build; every rule executes JVM-side."""
    dtype = df.schema[payload_col].dataType
    return df.withColumn(payload_col, sanitize_expr(payload_col, dtype, F.col(payload_col), now))
