"""Oracle-checkable golden queries for the sanitize layer (§2.8).

Pattern: the Spark side *constructs* a messy input (JSON-ish strings,
mixed timestamp formats, budget strings) deterministically from driver
table columns, then applies the real sanitize function; the DuckDB
oracle computes the expected clean output directly from the source
columns. A value-hash match therefore proves the function's semantics,
not just that two engines parse the same SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ad_data_lake_spark.functions import creative as C
from ad_data_lake_spark.functions import sanitize as S

CLAMP_NOW = "1998-01-01 00:00:00"


def _m(col: str, n: int) -> Column:
    return F.col(col) % n


def fn_positive_amount(orders: DataFrame) -> DataFrame:
    raw = F.concat(F.lit("  "), (F.col("o_totalprice") - 150000).cast("string"), F.lit(" "))
    return orders.select(
        "o_orderkey", S.parse_positive_amount(raw).alias("amount_cents")
    )


def fn_budget_exclusion(orders: DataFrame) -> DataFrame:
    daily_raw = F.when(_m("o_orderkey", 3) == 0, F.col("o_totalprice").cast("string"))
    lifetime_raw = F.when(_m("o_orderkey", 2) == 0, (F.col("o_totalprice") * 2).cast("string"))
    daily, lifetime = S.budget_mutual_exclusion(daily_raw, lifetime_raw)
    return orders.select(
        "o_orderkey", daily.alias("daily_budget"), lifetime.alias("lifetime_budget")
    )


def fn_spend_cap(orders: DataFrame) -> DataFrame:
    raw = (
        F.when(_m("o_orderkey", 4) == 0, F.lit("0"))
        .when(_m("o_orderkey", 4) == 1, F.lit("  "))
        .when(_m("o_orderkey", 4) == 3, F.col("o_totalprice").cast("string"))
    )
    return orders.select("o_orderkey", S.normalize_spend_cap(raw).alias("spend_cap"))


def fn_string_collection(customer: DataFrame) -> DataFrame:
    raw = (
        F.when(
            _m("c_custkey", 3) == 0,
            F.concat(F.lit('["'), F.col("c_name"), F.lit(' ", " '), F.col("c_mktsegment"), F.lit('"]')),
        )
        .when(
            _m("c_custkey", 3) == 1,
            F.concat(F.col("c_name"), F.lit(" , "), F.col("c_mktsegment")),
        )
        .otherwise(F.lit("[]"))
    )
    return customer.select(
        "c_custkey",
        F.concat_ws("|", S.normalize_string_collection(raw)).alias("categories"),
    )


def fn_parse_datetime(orders: DataFrame) -> DataFrame:
    raw = (
        F.when(_m("o_orderkey", 3) == 0, F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .when(
            _m("o_orderkey", 3) == 1,
            F.concat(F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+0800")),
        )
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
    )
    return orders.select("o_orderkey", S.parse_datetime_value(raw).alias("parsed_ts"))


def fn_clamp_start_time(orders: DataFrame) -> DataFrame:
    raw = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    now = F.lit(CLAMP_NOW).cast("timestamp")
    return orders.select(
        "o_orderkey",
        S.isoformat_datetime(S.clamp_start_time(raw, now)).alias("start_time"),
    )


def fn_numeric_autocast(customer: DataFrame) -> DataFrame:
    return customer.select(
        S.numeric_autocast(F.col("c_custkey").cast("string"), "c_id").alias("c_id"),
        S.numeric_autocast(F.col("c_acctbal").cast("string"), "acctbal").alias("acctbal_num"),
        S.numeric_autocast(F.col("c_nationkey").cast("string"), "natkey").alias("natkey_num"),
    )


def fn_boolean_coerce(orders: DataFrame) -> DataFrame:
    vocab = F.array(*[F.lit(v) for v in ("true", "1", "YES", " y ", "FALSE", "0", "no", " N", "maybe")])
    raw = F.element_at(vocab, (_m("o_orderkey", 9) + 1).cast("int"))
    return orders.select(
        "o_orderkey", S.boolean_coerce(raw).alias("is_dynamic_creative")
    )


def fn_actid_norm(customer: DataFrame) -> DataFrame:
    raw = F.when(
        _m("c_custkey", 2) == 0, F.concat(F.lit("act_"), F.col("c_custkey").cast("string"))
    ).otherwise(F.col("c_custkey").cast("string"))
    return customer.select("c_custkey", S.account_id_norm(raw).alias("account_id"))


def fn_flatten_ref(lineitem: DataFrame) -> DataFrame:
    ads = lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.struct(F.col("l_partkey").cast("string").alias("id")).alias("creative"),
    )
    return C.flatten_creative_ref(ads)


def fn_coalesce_spec(part: DataFrame) -> DataFrame:
    m = _m("p_partkey", 4)

    def branch(active: Column, text: Column) -> Column:
        # inactive branches carry an empty message — must be skipped
        return F.struct(F.when(active, text).otherwise(F.lit("")).alias("message"))

    spec = F.struct(
        branch(m == 0, F.col("p_name")).alias("template_data"),
        branch(m == 1, F.col("p_name")).alias("link_data"),
        branch(m == 2, F.col("p_name")).alias("video_data"),
        branch(m == 3, F.col("p_name")).alias("photo_data"),
    )
    return part.select("p_partkey", C.coalesce_spec_field(spec, "message").alias("message"))


def fn_gather_arrays(part: DataFrame) -> DataFrame:
    empty = F.lit(None).cast("array<string>")

    def branch(items: Column) -> Column:
        return F.struct(items.alias("retailer_item_ids"))

    spec = F.struct(
        F.array(F.col("p_brand"), F.col("p_type")).alias("retailer_item_ids"),
        branch(F.array(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" ")), F.col("p_name"))).alias(
            "link_data"
        ),
        branch(empty).alias("template_data"),
        branch(F.array(F.lit("  "))).alias("video_data"),
        branch(empty).alias("photo_data"),
    )
    return part.select(
        "p_partkey", F.concat_ws("|", C.gather_retailer_item_ids(spec)).alias("items")
    )


def fn_nested_update(part: DataFrame) -> DataFrame:
    spec = F.struct(
        F.struct(
            F.col("p_name").alias("message"),
            F.lit("old_hash").alias("image_hash"),
            F.col("p_brand").alias("headline"),
        ).alias("link_data")
    )
    updated = C.update_story_spec(spec, F.upper(F.col("p_name")), F.md5(F.col("p_brand")))
    return part.select("p_partkey", F.to_json(updated).alias("spec_json"))


def fn_unicode_unescape(documents: DataFrame) -> DataFrame:
    # golden escapes appended so the UDF has real work on every row
    raw = F.concat(F.substring("text", 1, 20), F.lit("\\u0041\\x42"))
    return documents.select("doc_id", S.unicode_unescape(raw).alias("decoded"))


def sanitize_campaign(orders: DataFrame) -> DataFrame:
    """The composite write-contract transform over a campaign-shaped
    projection — the engine-side equivalent of running the reference's
    ``sanitize_payload(payload, 'campaign')`` before a POST."""
    shaped = orders.select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.when(_m("o_orderkey", 3) == 0, F.col("o_totalprice").cast("string")).alias(
            "daily_budget"
        ),
        F.when(_m("o_orderkey", 2) == 0, (F.col("o_totalprice") * 2).cast("string")).alias(
            "lifetime_budget"
        ),
        F.when(_m("o_orderkey", 4) == 3, F.col("o_totalprice").cast("string"))
        .otherwise(F.lit("0"))
        .alias("spend_cap"),
        F.when(
            _m("o_orderkey", 3) == 0, F.concat(F.lit('["'), F.col("o_orderpriority"), F.lit('"]'))
        )
        .when(_m("o_orderkey", 3) == 1, F.col("o_orderpriority"))
        .alias("special_ad_categories"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("start_time"),
    )
    out = S.sanitize_campaign_payload(shaped, F.lit(CLAMP_NOW).cast("timestamp"))
    return out.withColumn("special_ad_categories", F.concat_ws("|", "special_ad_categories"))
