"""Explicit schemas for every table the engine touches.

The reference lets pandas infer types and only pins them down in dbt casts
(reference stg_abilities.sql:5-14). Here schemas are explicit StructTypes —
never inferred — both for the reference-shaped tables (FIXTURES.md T1-T7)
and for the driver's synthetic TPC-H-ish tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-shaped tables (FIXTURES.md T1-T5, T7)
# ---------------------------------------------------------------------------

# T1 raw_abilities — reference datasets/raw_abilities.csv, producer
# web_scraper.py:492-567.  attribute_list is a REAL array here (the
# reference keeps it as a stringified Python list, stg_schema.yml:31-35).
RAW_ABILITIES = T.StructType(
    [
        T.StructField("char_name", T.StringType(), False),
        T.StructField("ability_name", T.StringType(), False),
        T.StructField("ability_id", T.IntegerType(), True),  # NULL on synthesized rows
        T.StructField("main_target_hp_attacks", T.ShortType(), False),
        T.StructField("non_target_hp_attacks", T.ShortType(), False),
        T.StructField("hp_dmg_cap_up_perc", T.ShortType(), False),
        T.StructField("attribute_list", T.ArrayType(T.StringType()), True),
        T.StructField("game_version", T.StringType(), False),  # CHARACTER(2): GL/JP
        T.StructField("scrape_started_at_utc", T.TimestampType(), True),
        T.StructField("scrape_ended_at_utc", T.TimestampType(), True),
    ]
)

# T2 raw_bt_effects — reference datasets/raw_bt_effects.csv, producer
# web_scraper.py:739-760.
RAW_BT_EFFECTS = T.StructType(
    [
        T.StructField("char_name", T.StringType(), False),
        T.StructField("bt_personal_hp_dmg_cap_up", T.ShortType(), False),
        T.StructField("bt_party_hp_dmg_cap_up", T.ShortType(), False),
        T.StructField("enemy_count_apply_list", T.ArrayType(T.IntegerType()), True),
        T.StructField("game_version", T.StringType(), False),
        T.StructField("scrape_started_at_utc", T.TimestampType(), True),
        T.StructField("scrape_ended_at_utc", T.TimestampType(), True),
    ]
)

# T3 raw_high_armor_caps — reference datasets/raw_high_armor_caps.csv,
# producer web_scraper.py:1079-1099.
RAW_HIGH_ARMOR_CAPS = T.StructType(
    [
        T.StructField("char_name", T.StringType(), False),
        T.StructField("personal_hp_dmg_cap_up", T.ShortType(), False),
        T.StructField("party_ha_hp_dmg_cap_up", T.ShortType(), False),
        T.StructField("game_version", T.StringType(), False),
        T.StructField("scrape_started_at_utc", T.TimestampType(), True),
        T.StructField("scrape_ended_at_utc", T.TimestampType(), True),
    ]
)

# T4 followups_manual_entry — hand-curated CSV source (reference S8,
# raw_sources.yml:97-171).  Raw shape: booleans arrive as 'T'/'F' strings
# and the file is latin-1; stage_followups() converts at the staging
# boundary (reference keeps them as text).
FOLLOWUPS_MANUAL_ENTRY_RAW = T.StructType(
    [
        T.StructField("char_name", T.StringType(), False),
        T.StructField("ability_name", T.StringType(), False),
        T.StructField("main_target_hp_attacks", T.ShortType(), True),
        T.StructField("non_target_hp_attacks", T.ShortType(), True),
        T.StructField("hp_dmg_cap_up_perc", T.ShortType(), True),
        T.StructField("timing", T.StringType(), True),  # during/after/before
        T.StructField("triggers", T.StringType(), True),  # comma-joined list
        T.StructField("default", T.StringType(), True),  # 'T'/'F'
        T.StructField("during_bt", T.StringType(), True),  # 'T'/'F'
        T.StructField("double_during_bt", T.StringType(), True),  # 'T'/'F'
    ]
)

# T4b followups_manual_entry — the REAL reference file's physical layout
# (datasets/followups_manual_entry.csv, 15 columns; raw_sources.yml:97-171).
# FOLLOWUPS_MANUAL_ENTRY_RAW above is the hand-shaped 10-column staging
# subset used by unit fixtures; this one reads the shipped file byte-for-
# byte: attribute_list arrives as a stringified Python list, timestamps as
# 'M/d/yyyy H:mm' local strings (kept as text here — parsed only at the
# staging boundary, never silently coerced by the reader).
FOLLOWUPS_MANUAL_ENTRY_FILE = T.StructType(
    [
        T.StructField("char_name", T.StringType(), False),
        T.StructField("ability_name", T.StringType(), False),
        T.StructField("ability_id", T.IntegerType(), True),  # blank on synthesized followups
        T.StructField("main_target_hp_attacks", T.ShortType(), True),
        T.StructField("non_target_hp_attacks", T.ShortType(), True),
        T.StructField("hp_dmg_cap_up_perc", T.ShortType(), True),
        T.StructField("attribute_list", T.StringType(), True),  # "['Magic', 'FollowUp']"
        T.StructField("game_version", T.StringType(), False),
        T.StructField("scrape_started_at_utc", T.StringType(), True),
        T.StructField("scrape_ended_at_utc", T.StringType(), True),
        T.StructField("timing", T.StringType(), True),
        T.StructField("triggers", T.StringType(), True),
        T.StructField("default", T.StringType(), True),
        T.StructField("during_bt", T.StringType(), True),
        T.StructField("double_during_bt", T.StringType(), True),
    ]
)

# T6 bt_special_effect_labeling — the second hand-maintained CSV source
# (reference S8, datasets/bt_special_effect_labeling.csv): per-character
# BT cap labels plus free-text `special_effect_for_hp_dmg_cap_on_turn`
# and `issue_to_fix` correction notes.  Physical quirks pinned here: the
# header row ends with a trailing comma, so every record carries an empty
# 10th field (`_trailing`), and the timestamps are LOCAL 'M/d/yyyy H:mm'
# strings without the `_utc` suffix the scraped tables use.
BT_SPECIAL_EFFECT_LABELING_FILE = T.StructType(
    [
        T.StructField("char_name", T.StringType(), False),
        T.StructField("bt_personal_hp_dmg_cap_up", T.ShortType(), False),
        T.StructField("bt_party_hp_dmg_cap_up", T.ShortType(), False),
        T.StructField("enemy_count_apply_list", T.StringType(), True),  # "[1, 2, 3]" or "2"
        T.StructField("game_version", T.StringType(), False),
        T.StructField("scrape_started_at", T.StringType(), True),
        T.StructField("scrape_ended_at", T.StringType(), True),
        T.StructField("special_effect_for_hp_dmg_cap_on_turn", T.StringType(), True),
        T.StructField("issue_to_fix", T.StringType(), True),
        T.StructField("_trailing", T.StringType(), True),
    ]
)

# T7 ability_html_lines — the parse layer's true input (SURVEY.md §1 item 7):
# one prettified-HTML line per row, offset-addressable by line_no.
ABILITY_HTML_LINES = T.StructType(
    [
        T.StructField("char_name", T.StringType(), False),
        T.StructField("ability_name", T.StringType(), False),
        T.StructField("ability_id", T.IntegerType(), True),
        T.StructField("game_version", T.StringType(), False),
        T.StructField("line_no", T.IntegerType(), False),
        T.StructField("line", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver synthetic tables (TESTDATA.md) — declared for documentation/tests;
# parquet files carry their own (matching) physical schema.
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), False),  # JSON string {"k": int}
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

# Multimodal column convention (SURVEY.md §2k): opaque payload + typed
# metadata struct.  The payload column is BinaryType; decode happens in
# Arrow-batched mapInPandas (dffoo_data_pipeline_spark/multimodal).
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)
