"""The sanitize/normalize layer (SURVEY.md §2.8 F1–F14) as native Column
expressions — the reference's ``sanitize_payload`` rules (reference
src/utils/api_helpers.py:99-280) re-expressed so they run JVM-side
inside whole-stage codegen, never as row-at-a-time Python.

Documented divergences from the reference (SURVEY §7 risk register):
- money rounding is HALF_UP (Spark ``round``); the reference's
  ``int(round())`` is banker's rounding — differs only on exact .5.
- ``normalize_string_collection`` coerces JSON arrays through
  ``array<string>`` (non-string JSON elements stringify per Spark
  casting rules, the reference uses Python ``str()``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Boolean vocab (reference pages/1_Campaign_Cloner.py:65-69).
TRUTHY = ("true", "1", "yes", "y")
FALSY = ("false", "0", "no", "n")

# Keys never numeric-coerced (reference src/utils/api_helpers.py:238-246).
NUMERIC_EXCLUSIONS = frozenset(
    {"id", "account_id", "campaign_id", "adset_id", "creative_id", "parent_id", "existing_creative_id"}
)

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ssxxx"  # isoformat() with +00:00 offset, no micros


def parse_positive_amount(col: Column) -> Column:
    """F1: str/num → trim → float → reject ≤0 → rounded long (money cents).
    (reference src/utils/api_helpers.py:104-119)"""
    amount = F.trim(col.cast("string")).try_cast("double")
    return F.when(amount > 0, F.round(amount, 0).cast("long"))


def budget_mutual_exclusion(daily: Column, lifetime: Column) -> tuple[Column, Column]:
    """F2: if a valid daily budget exists keep only it; else a valid
    lifetime budget; else drop both (reference
    src/utils/api_helpers.py:157-172). Returns (daily', lifetime') —
    exactly one non-null, or both null.
    """
    d, lt = parse_positive_amount(daily), parse_positive_amount(lifetime)
    return (
        F.when(d.isNotNull(), d),
        F.when(d.isNull() & lt.isNotNull(), lt),
    )


def normalize_spend_cap(col: Column) -> Column:
    """F3: drop if ∈ {None, '', '0', 0}, else positive-int coerce
    (reference src/utils/api_helpers.py:174-185)."""
    trimmed = F.trim(col.cast("string"))
    return F.when(
        col.isNull() | trimmed.isin("", "0"), F.lit(None).cast("long")
    ).otherwise(parse_positive_amount(col))


def normalize_string_collection(col: Column) -> Column:
    """F4: str → JSON-array parse, else CSV split; trim items, drop
    empties; null/''/'[]' → [] (reference src/utils/api_helpers.py:121-151).
    """
    trimmed = F.trim(col)
    # from_json yields null on malformed JSON (PERMISSIVE), so csv-split
    # is a coalesce fallback — the JSON parse runs exactly once per row
    # (a when(from_json.isNotNull(), from_json) form would evaluate it
    # twice; measurably slower, same semantics). The startswith('[')
    # guard skips the parse entirely for plain CSV strings: from_json
    # with an array schema returns null for any non-'['-prefixed input,
    # so gating it changes nothing semantically, and JsonToStructs is a
    # CodegenFallback expression — the guard keeps most rows fully
    # inside codegen (~2× on this function's bench query).
    arr = F.coalesce(
        F.when(trimmed.startswith("["), F.from_json(trimmed, "array<string>")),
        F.split(trimmed, ","),
    )
    cleaned = F.filter(F.transform(arr, lambda x: F.trim(x)), lambda x: x != "")
    return F.when(
        col.isNull() | (trimmed == "") | (trimmed == "[]"), F.array().cast("array<string>")
    ).otherwise(cleaned)


def default_special_ad_categories(col: Column) -> Column:
    """F5: missing/null at top level → [] (reference
    src/utils/api_helpers.py:187-195)."""
    return F.coalesce(normalize_string_collection(col), F.array().cast("array<string>"))


def parse_datetime_value(col: Column) -> Column:
    """F7: accept ISO-8601 with Z / ±hh:mm / ±hhmm offsets, naive
    T/space separators, date-only, fractional seconds, and epoch
    seconds; everything normalized to UTC (reference
    src/utils/api_helpers.py:56-88 plus the ``fromisoformat`` forms it
    admits: date-only, fractional, ±hh offsets).

    Implementation: Spark's native string→timestamp cast already parses
    every one of those shapes in a single pass (one codegen'd branch —
    ~4× faster than a coalesce over per-format ``try_to_timestamp``,
    whose failing branches pay a JVM exception per row). Epoch fallback
    only fires when the cast yields null.

    Documented divergences (module docstring contract):
    - digit strings are accepted as epoch seconds; the reference only
      treats int/float *values* as epoch and nulls epoch-like strings.
    - the native cast is a superset parser (it also admits e.g.
      ``2024-1-2`` single-digit fields the reference would reject).
    """
    s = F.trim(col.cast("string"))
    epoch = s.try_cast("double")
    return F.coalesce(
        s.try_cast("timestamp"),
        F.when(epoch.isNotNull(), F.timestamp_seconds(epoch)),
    )


def isoformat_datetime(col: Column) -> Column:
    """F8: UTC ISO-8601 string, microseconds stripped (reference
    src/utils/api_helpers.py:92-95)."""
    return F.date_format(col, ISO_FMT)


def clamp_start_time(col: Column, now: Column) -> Column:
    """F9: a past start_time is replaced with 'now' (reference
    src/utils/api_helpers.py:210-218). ``now`` is injected (a literal in
    tests/oracle) — never ``current_timestamp()`` inside the transform,
    so runs are reproducible and plans cacheable.
    """
    parsed = parse_datetime_value(col)
    return F.when(parsed.isNotNull(), F.greatest(parsed, now))


def boolean_coerce(col: Column) -> Column:
    """F14: TRUTHY/FALSY vocab → boolean, else null (reference
    pages/1_Campaign_Cloner.py:65-69,117-126)."""
    low = F.lower(F.trim(col.cast("string")))
    return F.when(low.isin(*TRUTHY), F.lit(True)).when(low.isin(*FALSY), F.lit(False))


def numeric_autocast(col: Column, key: str) -> Column:
    """F11 (value form): digit-string → long, float-string → double,
    never for id-like keys (reference src/utils/api_helpers.py:238-264).
    Spark columns are monomorphic, so the int/float split must be decided
    per column; this returns the widest sound type (double) for mixed
    numeric columns — callers wanting longs use ``numeric_autocast_long``.
    """
    if key in NUMERIC_EXCLUSIONS or key.endswith("_id") or key.endswith("_ids"):
        return col
    return F.coalesce(F.trim(col).try_cast("double"), col.try_cast("double"))


def account_id_norm(col: Column) -> Column:
    """F25: prefix ``act_`` when missing (reference
    src/main_extractor.py:361)."""
    return F.when(col.startswith("act_"), col).otherwise(F.concat(F.lit("act_"), col))


def unicode_unescape(col: Column) -> Column:
    """F13: decode ``\\uXXXX``/``\\xXX`` escape sequences. No Spark
    builtin exists; Arrow-batched pandas UDF (only used on error-display
    paths in the reference, pages/1_Campaign_Cloner.py:60-70 — cold path,
    so the Python hop is acceptable).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _unescape(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None or ("\\u" not in v and "\\x" not in v):
                return v
            try:
                return v.encode("utf-8").decode("unicode_escape")
            except (UnicodeDecodeError, ValueError):
                return v

        return s.map(one)

    return _unescape(col)


# F10: which time fields each object type normalizes (reference
# time_fields_map, src/utils/api_helpers.py:220-236). start_time is
# additionally clamped to now (F9); the others are parse+ISO only.
TIME_FIELDS_MAP = {
    "campaign": ("start_time", "stop_time"),
    "adset": ("start_time", "end_time"),
    "ad": (),
}


def normalize_time_field(name: str, col: Column, now: Column) -> Column:
    """F10 leaf: clamp start_time, plain parse+ISO for stop/end."""
    if name == "start_time":
        return isoformat_datetime(clamp_start_time(col, now))
    return isoformat_datetime(parse_datetime_value(col))


def sanitize_adset_payload(df, now: Column):
    """F10/F12-composite for an adset-shaped frame: budget exclusion +
    the adset time-field set (start_time clamped, end_time normalized,
    per TIME_FIELDS_MAP) — the second entry of the reference's
    per-object-type sanitize dispatch."""
    daily, lifetime = budget_mutual_exclusion(F.col("daily_budget"), F.col("lifetime_budget"))
    cols = [
        F.col("id"),
        daily.alias("daily_budget"),
        lifetime.alias("lifetime_budget"),
    ]
    cols += [
        normalize_time_field(name, F.col(name), now).alias(name)
        for name in TIME_FIELDS_MAP["adset"]
    ]
    return df.select(*cols)


def sanitize_campaign_payload(df, now: Column):
    """F12-composite: the write-contract transform for a campaign-shaped
    DataFrame — budget mutual exclusion, spend_cap normalize,
    special_ad_categories default, start_time clamp + ISO format
    (reference sanitize_payload, src/utils/api_helpers.py:99-280, applied
    before every POST at :395-451). Flat-schema form; nested structs go
    through ``plans.struct_rules`` (schema-walk expression generator).
    """
    daily, lifetime = budget_mutual_exclusion(F.col("daily_budget"), F.col("lifetime_budget"))
    return df.select(
        F.col("id"),
        daily.alias("daily_budget"),
        lifetime.alias("lifetime_budget"),
        normalize_spend_cap(F.col("spend_cap")).alias("spend_cap"),
        default_special_ad_categories(F.col("special_ad_categories")).alias(
            "special_ad_categories"
        ),
        isoformat_datetime(clamp_start_time(F.col("start_time"), now)).alias("start_time"),
    )
