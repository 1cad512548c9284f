"""Creative-spec functions (SURVEY.md §2.8 F15–F23, F26, F28): the
nested ``object_story_spec`` manipulation the reference performs with
dict surgery (reference pages/1_Campaign_Cloner.py:250-670,
pages/3_Creative_Composer.py:45-339), re-expressed as nested Column
expressions (coalesce chains, withField, array constructors) — all
JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

VIDEO_EXTENSIONS = (".mp4", ".mov", ".avi", ".mkv", ".wmv")

# The branch priority the reference walks when extracting creative text
# (reference pages/1_Campaign_Cloner.py:250-330: template_data →
# link_data → video_data → photo_data).
SPEC_BRANCHES = ("template_data", "link_data", "video_data", "photo_data")


def coalesce_spec_field(spec: Column, field: str) -> Column:
    """F15/F16/F17: first non-empty value of ``field`` across the spec
    branches in reference priority order, with '' treated as missing."""
    candidates = []
    for branch in SPEC_BRANCHES:
        c = spec.getField(branch).getField(field)
        candidates.append(F.when(F.length(F.trim(c)) > 0, F.trim(c)))
    return F.coalesce(*candidates)


def extract_call_to_action_link(spec: Column) -> Column:
    """F15 CTA fallback: call_to_action.value.link, else .link_url
    (reference pages/1_Campaign_Cloner.py:300-320)."""
    cta = lambda b, f: spec.getField(b).getField("call_to_action").getField("value").getField(f)  # noqa: E731
    candidates = []
    for branch in SPEC_BRANCHES:
        candidates.extend([cta(branch, "link"), cta(branch, "link_url")])
    return F.coalesce(*candidates)


def gather_retailer_item_ids(spec: Column) -> Column:
    """F18: union ``retailer_item_ids`` arrays from the spec root and its
    sections, trim entries, ordered-dedupe preserving first occurrence
    (reference pages/1_Campaign_Cloner.py:362-385). ``array_distinct``
    keeps first-occurrence order — exactly the reference's semantics.
    """
    parts = [spec.getField("retailer_item_ids")]
    for branch in SPEC_BRANCHES:
        parts.append(spec.getField(branch).getField("retailer_item_ids"))
    merged = F.flatten(
        F.filter(F.array(*parts), lambda a: a.isNotNull())
    )
    trimmed = F.filter(F.transform(merged, lambda x: F.trim(x)), lambda x: x != "")
    return F.array_distinct(trimmed)


def update_story_spec(spec: Column, new_message: Column, new_image_hash: Column) -> Column:
    """F19: immutable nested rewrite — set link_data.message and swap
    link_data.image_hash (reference pages/1_Campaign_Cloner.py:552-670
    rebuilds the dict tree; here one ``withField`` chain on the struct).
    """
    return spec.withField(
        "link_data",
        spec.getField("link_data")
        .withField("message", new_message)
        .withField("image_hash", new_image_hash),
    )


def build_call_to_action(cta_type: Column, link: Column) -> Column:
    """F22: upper-case CTA type + optional link value struct (reference
    pages/3_Creative_Composer.py:45-56)."""
    return F.struct(
        F.upper(F.trim(cta_type)).alias("type"),
        F.struct(link.alias("link")).alias("value"),
    )


def flatten_creative_ref(df, struct_col: str = "creative", id_field: str = "id"):
    """F26: ``ad.creative{id}`` → scalar ``creative_id``, struct dropped
    (reference src/main_extractor.py:386-395)."""
    return df.withColumn(
        "creative_id", F.col(f"{struct_col}.{id_field}")
    ).drop(struct_col)


def infer_asset_kind(mime: Column, filename: Column) -> Column:
    """F28: MIME prefix or extension → image|video (reference
    pages/1_Campaign_Cloner.py:397-402, pages/2_Creative_Uploader.py:42-53).
    """
    lower_name = F.lower(filename)
    is_video_ext = F.lit(False)
    for ext in VIDEO_EXTENSIONS:
        is_video_ext = is_video_ext | lower_name.endswith(ext)
    return F.when(
        F.lower(mime).startswith("video/") | is_video_ext, F.lit("video")
    ).otherwise(F.lit("image"))


def assemble_creative_payload(
    name: Column,
    creative_type: Column,
    message: Column,
    link: Column,
    image_hash: Column,
    video_id: Column,
    children: Column,
) -> Column:
    """F23: validated creative payload construction for the three
    creative kinds the reference composes (reference
    pages/3_Creative_Composer.py:175-218 single image, :221-274
    carousel incl. ``child_attachments``, :277-327 video):

    - single_image → link_data{message, link, image_hash}
    - carousel     → link_data{message, link, child_attachments[...]}
    - video        → video_data{video_id, message}

    One struct type covers all branches (Spark structs are
    monomorphic); inapplicable fields/branches are null and vanish at
    ``to_json`` time — exactly the reference's only-set-keys POST dict.
    """
    link_data = F.when(
        creative_type.isin("single_image", "carousel"),
        F.struct(
            message.alias("message"),
            link.alias("link"),
            F.when(creative_type == "single_image", image_hash).alias("image_hash"),
            F.when(creative_type == "carousel", children).alias("child_attachments"),
        ),
    )
    video_data = F.when(
        creative_type == "video",
        F.struct(video_id.alias("video_id"), message.alias("message")),
    )
    return F.struct(
        name.alias("name"),
        F.struct(
            link_data.alias("link_data"), video_data.alias("video_data")
        ).alias("object_story_spec"),
    )


# Stable targeting skeleton (reference pages/4_AdSet_Creator.py:83-102
# accepts dict / JSON-string and passes it through; the long tail of
# targeting keys stays in the raw string per SURVEY §7 risk register).
TARGETING_SCHEMA = (
    "struct<geo_locations: struct<countries: array<string>>, "
    "age_min: int, age_max: int, interests: array<string>>"
)


def parse_targeting(col: Column) -> Column:
    """F24: JSON-string targeting → typed struct (null on malformed,
    mirroring the reference's return-None-on-parse-failure)."""
    return F.from_json(col, TARGETING_SCHEMA)


def strip_nulls_json(payload: Column) -> Column:
    """F27: the null/empty-stripping POST contract — ``to_json`` drops
    null fields (reference pages/4_AdSet_Creator.py:136-151 deletes
    empty keys before POST), so serializing the payload struct IS the
    write contract."""
    return F.to_json(payload)


def is_campaign_budget_optimized(daily: Column, lifetime: Column) -> Column:
    """F20: any campaign-level budget > 0, string-tolerant (reference
    pages/1_Campaign_Cloner.py:238-247)."""
    d = F.trim(daily.cast("string")).try_cast("double")
    lt = F.trim(lifetime.cast("string")).try_cast("double")
    return (F.coalesce(d, F.lit(0.0)) > 0) | (F.coalesce(lt, F.lit(0.0)) > 0)


def resolve_budget(daily: Column, lifetime: Column, default: Column) -> Column:
    """F21: pick daily → lifetime → default (reference
    pages/1_Campaign_Cloner.py:540-547)."""
    return F.coalesce(daily, lifetime, default)
