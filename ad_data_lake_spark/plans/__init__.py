"""Plan-time expression generators — see ``plans.struct_rules`` (F12
recursive sanitize: one schema walk emits the nested Column tree)."""

from ad_data_lake_spark.plans import struct_rules  # noqa: F401
