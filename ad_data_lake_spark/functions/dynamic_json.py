"""Dynamic-JSON sanitize (SURVEY §1.4 raw-JSON fallback; reference
src/utils/api_helpers.py:268-279): the reference's recursive payload
sanitizer walks ARBITRARY dict trees — applying its scalar rules to
whatever keys exist — because the Graph API drifts (unknown keys, wrong
types; drift is called out in reference docs/technical-spec.md:88).
The schema-driven F12 operator (operators/sanitize_queries.py) covers
the STABLE payload skeleton; this module covers the drifted remainder
without declaring any schema at all.

Spark-first shape: ``from_json(col, "map<string,string>")`` is the
permissive parse — every top-level key survives, scalars arrive as
bare strings, nested objects/arrays as raw JSON fragments — and the
whole sanitize is ONE generated column expression (map_entries →
per-entry rule CASE → array_sort → concat), zero shuffles, zero
Python. Depth is expanded by Python-side expression recursion
(``SANITIZE_DEPTH`` levels, default 3): below it, object fragments pass
through verbatim — the bounded-depth analog of the reference's
unbounded Python recursion (an unbounded tree would need VARIANT or a
vectorized UDF; API payloads are depth ≤ 3 in practice, reference
fixtures included).

Sanitize contract (the reference's ``_apply_dict_rules`` re-expressed
deterministically for cross-engine value verification):
- null / empty-after-trim scalars are DROPPED (the rule the reference
  applies to start_time/stop_time/empty strings);
- id-like keys (``*_id``/``*_ids`` or the reference's
  ``numeric_exclusions`` set) are NEVER autocast — kept as strings;
- digit strings (optionally signed, ≤18 digits) autocast to integers
  (leading zeros stripped by the cast, as Python ``int()`` does);
- clean decimal strings (``-?\\d+.\\d+``) are unquoted in place; the
  exotic-notation tail ("1e3", "inf") stays quoted — the reference's
  ``float()`` accepts those, but their re-rendering is engine-specific
  so the contract here keeps them strings (documented divergence);
- ``true``/``false`` strings coerce to JSON booleans (F10's rule);
- the reference's collection fields (``special_ad_categories``, the
  brand-safety triple) normalize as string collections: elements
  trimmed, empties dropped, order kept;
- other arrays and below-depth objects pass through verbatim;
- output keys are SORTED — a canonical serialization both engines
  agree on (the reference keeps dict order; sorting is the
  deterministic equivalent).

Escaping note: quoted strings re-escape only backslash and quote —
the payload domain here (API field values) carries no control
characters; a corpus with them needs the F13 pandas-UDF tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference src/utils/api_helpers.py numeric_exclusions
NUMERIC_EXCLUSIONS = (
    "id",
    "account_id",
    "campaign_id",
    "adset_id",
    "creative_id",
    "parent_id",
    "existing_creative_id",
)
# reference fields run through _normalize_string_collection
COLLECTION_KEYS = (
    "special_ad_categories",
    "brand_safety_content_filter_levels",
    "brand_safety_content_severity_levels",
    "excluded_brand_safety_content_types",
)
INT_RE = r"^-?[0-9]{1,18}$"
DEC_RE = r"^-?[0-9]+\.[0-9]+$"
# Expression-recursion depth: levels of nested objects that get the
# scalar rules (the reference recurses unboundedly,
# api_helpers.py:268-279; here each level is one more generated
# Column expression, so the cap is a compile-time knob, not a
# semantic one — raise it and both the Spark plan and the DuckDB
# oracle regenerate in lockstep from this constant). Depth 3 covers
# the deepest drift observed in reference fixtures (payload → meta →
# deep); objects below the cap pass through verbatim.
SANITIZE_DEPTH = 3


def _quote(v: Column) -> Column:
    esc = F.regexp_replace(
        F.regexp_replace(v, F.lit(r"\\"), F.lit(r"\\\\")),
        F.lit('"'),
        F.lit(r'\\"'),
    )
    return F.concat(F.lit('"'), esc, F.lit('"'))


def _norm_collection(v: Column) -> Column:
    """String-collection normalization on a raw array fragment: parse
    permissively (scalars coerce to strings identically in both
    engines), trim, drop empties, keep order, re-render."""
    elems = F.from_json(v, "array<string>")
    kept = F.filter(
        F.transform(elems, lambda x: F.trim(x)),
        lambda x: x.isNotNull() & (x != ""),
    )
    rendered = F.concat(
        F.lit("["),
        F.concat_ws(",", F.transform(kept, _quote)),
        F.lit("]"),
    )
    # unparseable fragment (from_json -> null): verbatim
    return F.when(elems.isNull(), v).otherwise(rendered)


def _render_value(key: Column, v: Column, depth: int) -> Column:
    """JSON rendering of one (key, raw-value-string) pair; NULL means
    'drop this key'."""
    t = F.trim(v)
    is_obj = t.startswith("{")
    is_arr = t.startswith("[")
    id_like = (
        key.isin(*NUMERIC_EXCLUSIONS)
        | key.endswith("_id")
        | key.endswith("_ids")
    )
    out = (
        F.when(v.isNull() | (t == ""), F.lit(None).cast("string"))
        .when(is_obj, sanitize_json_fragment(v, depth - 1) if depth > 1 else v)
        .when(is_arr & key.isin(*COLLECTION_KEYS), _norm_collection(v))
        .when(is_arr, v)
        .when(id_like, _quote(v))
        .when(t.rlike(INT_RE), t.cast("bigint").cast("string"))
        .when(t.rlike(DEC_RE), t)
        .when(t.isin("true", "false"), t)
        .otherwise(_quote(v))
    )
    return out


def sanitize_json_fragment(col: Column, depth: int = SANITIZE_DEPTH) -> Column:
    """Sanitize one JSON-object fragment (string column) → canonical
    sanitized JSON string. Invalid JSON (map parse fails) passes
    through unchanged rather than erroring — drift never kills the
    batch, the reference's try/except posture."""
    entries = F.map_entries(F.from_json(col, "map<string,string>"))
    rendered = F.filter(
        F.transform(
            entries,
            lambda e: F.struct(
                e["key"].alias("k"), _render_value(e["key"], e["value"], depth).alias("r")
            ),
        ),
        lambda s: s["r"].isNotNull(),
    )
    body = F.concat_ws(
        ",",
        F.transform(
            F.array_sort(rendered),
            lambda s: F.concat(F.lit('"'), s["k"], F.lit('":'), s["r"]),
        ),
    )
    return F.when(entries.isNull(), col).otherwise(
        F.concat(F.lit("{"), body, F.lit("}"))
    )


def sanitize_dynamic_json(
    df: DataFrame, json_col: str = "payload", out_col: str = "sanitized"
) -> DataFrame:
    """Apply the dynamic sanitize to a raw JSON string column — the
    drift-tolerant ingest step: no schema declared, every key the
    payload happens to carry gets the scalar rules, unknown keys
    survive."""
    return df.withColumn(out_col, sanitize_json_fragment(F.col(json_col)))
