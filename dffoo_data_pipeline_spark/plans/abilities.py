"""Reference-parity pipeline: the abilities parser as a Spark plan.

Re-expresses `generate_ability_df` (reference web_scraper.py:344-567)
declaratively over the html-lines IR (FIXTURES.md T7): the reference's
`lines[i ± k]` offset addressing becomes `lead`/`lag` windows, its
running counters become conditional sums, its elif ladder becomes a
`when` chain, and its order-dependent "copy main count to non-target"
assignment (web_scraper.py:484-486) becomes a running-sum window +
last-copy-wins aggregation — fully vectorized, no Python in the plan.

Scale: one shuffle on (char, ability, version) for the window pass, then
a groupBy on the same key (no second shuffle — partitioning is reused);
correction tables are bounded hand-maintained dims → broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}

KEYS = ["char_name", "ability_name", "game_version"]


# ---------------------------------------------------------------------------
# Correction dimension tables (hand-maintained data in the reference;
# values from web_scraper.py:56-115, restructured as relational rows)
# ---------------------------------------------------------------------------


def fix_hp_cap_dim(spark: SparkSession) -> DataFrame:
    """J1 override dim (reference FIX_HP_CAP_DICT, web_scraper.py:99-115)."""
    rows = [
        ("barret", "Beam", 10),
        ("yshtola", "Spiritual Ray", 400),
        ("gilgamesh", "Ultimate Illusion", 100),
        ("noel", "Additional attack from Hunter of Light", 15),
        ("kadaj", "Geophagy", 20),
    ]
    return spark.createDataFrame(rows, "char_name string, ability_name string, fixed_cap smallint")


def uncapped_abilities_dim(spark: SparkSession) -> DataFrame:
    """J2 membership dim (reference UNCAPPED_ABILITIES_DICT,
    web_scraper.py:90-95)."""
    rows = [
        ("caitsith", "Transform"),
        ("leonora", "Flare"),
        ("leonora", "A Little Black Magic"),
        ("jessie", "Shaped Charge"),
        ("aerith", "Additional attack from White Materia's Brilliance"),
    ]
    return spark.createDataFrame(rows, "char_name string, ability_name string")


def uncapped_split_dim(spark: SparkSession) -> DataFrame:
    """J3 split dim (reference N_HP_ATTACKS_UNCAPPED, web_scraper.py:56-86):
    abilities whose last HP attack is uncapped → split into base + twin."""
    rows = [
        ("Chuck Staff", "Chuck Staff (Uncapped HP Attack)", 1, 1, 1, 1),
        ("Crystal Ray", "Crystal Ray (Uncapped HP Attack)", 1, 1, 1, 1),
        ("Soul Burst", "Soul Burst (Uncapped HP Attack)", 1, 1, 0, 0),
        ("Soul Burst+", "Soul Burst+ (Uncapped HP Attack)", 1, 2, 0, 0),
    ]
    return spark.createDataFrame(
        rows,
        "ability_name string, followup_name string, gl_main smallint, "
        "jp_main smallint, gl_non smallint, jp_non smallint",
    )


# ---------------------------------------------------------------------------
# The parser
# ---------------------------------------------------------------------------


def parse_ability_lines(lines_df: DataFrame) -> DataFrame:
    """html-lines → one row per (char, ability, version) with
    main_target_hp_attacks / non_target_hp_attacks / hp_dmg_cap_up_perc.

    Faithful to reference web_scraper.py:387-490 (see module docstring).
    """
    w = Window.partitionBy(*KEYS).orderBy("line_no")
    e = lambda c: F.coalesce(c, F.lit(""))  # out-of-range offsets read as ""
    df = lines_df.select(
        *KEYS,
        "ability_id",
        "line_no",
        "line",
        e(F.lag("line", 1).over(w)).alias("p1"),
        e(F.lag("line", 2).over(w)).alias("p2"),
        e(F.lag("line", 3).over(w)).alias("p3"),
        e(F.lead("line", 2).over(w)).alias("l2"),
        e(F.lead("line", 6).over(w)).alias("l6"),
        e(F.lead("line", 11).over(w)).alias("l11"),
        e(F.lead("line", 13).over(w)).alias("l13"),
    )

    as_int = lambda c: F.regexp_replace(F.trim(c), "%", "").cast("int")
    # cap accumulation (A1): every line contributes, gated by regex
    cap_contrib = F.when(F.col("line").rlike("- MAX BRV Cap"), as_int(F.col("l6"))).otherwise(
        0
    ) + F.when(F.col("line").rlike("MAX BRV Cap Up by"), as_int(F.col("l2"))).otherwise(0)

    # hit gate: icon line, not a skipped source-descriptor icon
    is_hit = F.col("line").contains("inline HP") & ~F.col("p2").rlike("Attack")

    # AOE from context lines i-1 ++ i-3 ++ i+2 (web_scraper.py:403-405)
    ctx_aoe = F.concat(F.col("p1"), F.col("p3"), F.col("l2")).rlike("Group")

    # attack-info line resolution (+2 / +6-by-name / +11 / +13 / +6)
    info0 = F.when(F.col("ability_name").rlike("Crystal Generation"), F.col("l6")).otherwise(
        F.col("l2")
    )
    extra = F.col("l6")
    stored = (info0.rlike("Damage by") | info0.rlike("Damage to")) & extra.rlike(
        "of stored value from"
    )
    info1 = F.when(stored, F.col("l11")).otherwise(info0)
    statlike = (info1.rlike(" by") | info1.rlike(" based on")) & extra.rlike("of ")
    info = (
        F.when(
            statlike & F.col("l13").rlike("to non-targets") & F.col("l11").rlike("inline BREAK"),
            F.col("l13"),
        )
        .when(statlike, F.col("l6"))
        .otherwise(info1)
    )

    # classification ladder (A3, web_scraper.py:449-478) — one exclusive
    # when-chain producing (main_add, non_add, is_copy, sub_one, ladder_aoe)
    branch = (
        F.when(
            info.rlike("Damage to non-targets after each HP Attack, except last"),
            F.struct(
                F.lit(0).alias("m"),
                F.lit(0).alias("nn"),
                F.lit(True).alias("cp"),
                F.lit(True).alias("s1"),
                F.lit(False).alias("la"),
            ),
        )
        .when(
            info.rlike("Damage to non-targets after each HP Attack"),
            F.struct(F.lit(0).alias("m"), F.lit(0).alias("nn"), F.lit(True).alias("cp"),
                     F.lit(False).alias("s1"), F.lit(False).alias("la")),
        )
        .when(
            info.rlike("Group \\d+"),
            F.struct(
                F.regexp_extract(info, "Group (\\d+) times", 1).cast("int").alias("m"),
                F.lit(0).alias("nn"), F.lit(False).alias("cp"), F.lit(False).alias("s1"),
                F.lit(True).alias("la"),
            ),
        )
        .when(
            info.rlike("Group"),
            F.struct(F.lit(1).alias("m"), F.lit(0).alias("nn"), F.lit(False).alias("cp"),
                     F.lit(False).alias("s1"), F.lit(True).alias("la")),
        )
        .when(
            info.rlike("to non-targets × \\d+"),
            F.struct(
                F.lit(0).alias("m"),
                F.regexp_extract(info, "× (\\d+)", 1).cast("int").alias("nn"),
                F.lit(False).alias("cp"), F.lit(False).alias("s1"), F.lit(False).alias("la"),
            ),
        )
        .when(
            info.rlike("to non-targets \\d+ times")
            | info.rlike("to non-trap triggered targets \\d+ times"),
            F.struct(
                F.lit(0).alias("m"),
                F.regexp_extract(info, "(\\d+) times", 1).cast("int").alias("nn"),
                F.lit(False).alias("cp"), F.lit(False).alias("s1"), F.lit(False).alias("la"),
            ),
        )
        .when(
            info.rlike("to non-targets") | info.rlike("to non-trap triggered targets"),
            F.struct(F.lit(0).alias("m"), F.lit(1).alias("nn"), F.lit(False).alias("cp"),
                     F.lit(False).alias("s1"), F.lit(False).alias("la")),
        )
        .when(
            info.rlike("\\d+ times"),
            F.struct(
                F.regexp_extract(info, "(\\d+) times", 1).cast("int").alias("m"),
                F.lit(0).alias("nn"), F.lit(False).alias("cp"), F.lit(False).alias("s1"),
                F.lit(False).alias("la"),
            ),
        )
        .otherwise(
            F.struct(F.lit(1).alias("m"), F.lit(0).alias("nn"), F.lit(False).alias("cp"),
                     F.lit(False).alias("s1"), F.lit(False).alias("la"))
        )
    )

    scored = df.select(
        *KEYS,
        "ability_id",
        "line_no",
        cap_contrib.alias("cap_contrib"),
        F.when(is_hit, branch).alias("b"),
        is_hit.alias("is_hit"),
        (is_hit & (ctx_aoe | F.when(is_hit, branch).getField("la"))).alias("aoe"),
    ).select(
        *KEYS,
        "ability_id",
        "line_no",
        "cap_contrib",
        # branch precedence mirrors reference: if AOE → add to both;
        # elif copy → assignment (handled below); else main/non adds
        F.when(F.col("aoe"), F.col("b.m"))
        .when(F.col("is_hit") & F.col("b.cp"), 0)
        .when(F.col("is_hit"), F.col("b.m"))
        .otherwise(0)
        .alias("main_inc"),
        F.when(F.col("aoe"), F.col("b.m"))
        .when(F.col("is_hit") & F.col("b.cp"), 0)
        .when(F.col("is_hit"), F.col("b.nn"))
        .otherwise(0)
        .alias("non_inc"),
        (F.col("is_hit") & F.col("b.cp") & ~F.col("aoe")).alias("is_copy"),
        F.coalesce(F.col("b.s1"), F.lit(False)).alias("sub_one"),
    )

    # the order-dependent copy assignment: non := running-main [-1] at the
    # LAST copy line, plus any non-target adds after it
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    run_main = F.sum("main_inc").over(wcum)
    copy_val = F.when(
        F.col("is_copy"), run_main - F.when(F.col("sub_one"), 1).otherwise(0)
    )
    staged = scored.select(
        *KEYS,
        "ability_id",
        "line_no",
        "cap_contrib",
        "main_inc",
        "non_inc",
        "is_copy",
        copy_val.alias("copy_val"),
        F.max(F.when(F.col("is_copy"), F.col("line_no"))).over(wall).alias("last_copy_line"),
        F.last(copy_val, ignorenulls=True).over(wall).alias("last_copy_val"),
    )

    return staged.groupBy(*KEYS).agg(
        F.first("ability_id").alias("ability_id"),
        F.sum("main_inc").cast("int").alias("main_target_hp_attacks"),
        F.coalesce(
            F.max("last_copy_val")
            + F.sum(F.when(F.col("line_no") > F.col("last_copy_line"), F.col("non_inc")).otherwise(0)),
            F.sum("non_inc"),
        )
        .cast("int")
        .alias("non_target_hp_attacks"),
        F.sum("cap_contrib").cast("int").alias("hp_dmg_cap_up_perc"),
    )


# ---------------------------------------------------------------------------
# Corrections + row splits (J1/J2/J3/A6) and the full pipeline
# ---------------------------------------------------------------------------


def apply_corrections(parsed: DataFrame, attrs_df: DataFrame | None = None) -> DataFrame:
    """Correction-table enrichment, reference web_scraper.py:501-559:

    1. FIX_HP_CAP override (broadcast left join + COALESCE)        [J1]
    2. uncapped abilities: cap := 900, prepend 'Uncapped' attr     [J2]
    3. uncapped-split abilities: subtract per-version counts from the
       base row and emit a `(Uncapped HP Attack)` twin (explode)   [J3/A6]
    4. seymour's synthetic `Chainspell - Follow Up` row (unionByName)
    """
    spark = parsed.sparkSession
    df = parsed
    if attrs_df is not None:
        df = df.join(F.broadcast(attrs_df), KEYS, "left")
    else:
        df = df.withColumn("attribute_list", F.array().cast("array<string>"))

    # J1: override dict
    fix = fix_hp_cap_dim(spark)
    df = df.join(F.broadcast(fix), ["char_name", "ability_name"], "left").withColumn(
        "hp_dmg_cap_up_perc",
        F.coalesce(F.col("fixed_cap").cast("int"), F.col("hp_dmg_cap_up_perc")),
    ).drop("fixed_cap")

    # J2: uncapped membership → cap 900 + 'Uncapped' prepended
    unc = uncapped_abilities_dim(spark).withColumn("is_uncapped", F.lit(True))
    df = (
        df.join(F.broadcast(unc), ["char_name", "ability_name"], "left")
        .withColumn(
            "hp_dmg_cap_up_perc",
            F.when(F.col("is_uncapped"), 900).otherwise(F.col("hp_dmg_cap_up_perc")),
        )
        .withColumn(
            "attribute_list",
            F.when(
                F.col("is_uncapped"),
                F.concat(F.array(F.lit("Uncapped")), F.col("attribute_list")),
            ).otherwise(F.col("attribute_list")),
        )
        .drop("is_uncapped")
    )

    # J3/A6: split rows — base minus uncapped portion + cap-900 twin
    split = uncapped_split_dim(spark)
    df = df.join(F.broadcast(split), ["ability_name"], "left")
    m_sub = F.when(F.col("game_version") == "GL", F.col("gl_main")).otherwise(F.col("jp_main"))
    n_sub = F.when(F.col("game_version") == "GL", F.col("gl_non")).otherwise(F.col("jp_non"))
    followup_attrs = F.when(
        F.array_contains(F.col("attribute_list"), "FollowUp"), F.col("attribute_list")
    ).otherwise(F.concat(F.array(F.lit("FollowUp")), F.col("attribute_list")))
    variants = F.when(
        F.col("followup_name").isNotNull(),
        F.array(
            F.struct(
                F.col("ability_name").alias("ability_name"),
                F.col("ability_id").alias("ability_id"),
                (F.col("main_target_hp_attacks") - m_sub).cast("int").alias("main_target_hp_attacks"),
                (F.col("non_target_hp_attacks") - n_sub).cast("int").alias("non_target_hp_attacks"),
                F.col("hp_dmg_cap_up_perc").alias("hp_dmg_cap_up_perc"),
                F.col("attribute_list").alias("attribute_list"),
            ),
            F.struct(
                F.col("followup_name").alias("ability_name"),
                F.lit(None).cast("int").alias("ability_id"),
                m_sub.cast("int").alias("main_target_hp_attacks"),
                n_sub.cast("int").alias("non_target_hp_attacks"),
                F.lit(900).alias("hp_dmg_cap_up_perc"),
                followup_attrs.alias("attribute_list"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.col("ability_name").alias("ability_name"),
                F.col("ability_id").alias("ability_id"),
                F.col("main_target_hp_attacks").alias("main_target_hp_attacks"),
                F.col("non_target_hp_attacks").alias("non_target_hp_attacks"),
                F.col("hp_dmg_cap_up_perc").alias("hp_dmg_cap_up_perc"),
                F.col("attribute_list").alias("attribute_list"),
            )
        )
    )
    df = df.select(
        "char_name", "game_version", F.explode(variants).alias("v")
    ).select(
        "char_name",
        F.col("v.ability_name").alias("ability_name"),
        F.col("v.ability_id").alias("ability_id"),
        F.col("v.main_target_hp_attacks").alias("main_target_hp_attacks"),
        F.col("v.non_target_hp_attacks").alias("non_target_hp_attacks"),
        F.col("v.hp_dmg_cap_up_perc").alias("hp_dmg_cap_up_perc"),
        F.col("v.attribute_list").alias("attribute_list"),
        "game_version",
    )

    # seymour's synthetic follow-up row (web_scraper.py:545-559), one per
    # game_version present for seymour
    seymour_versions = parsed.where(F.col("char_name") == "seymour").select(
        "game_version"
    ).distinct()
    chainspell = seymour_versions.select(
        F.lit("seymour").alias("char_name"),
        F.lit("Chainspell - Follow Up").alias("ability_name"),
        F.lit(None).cast("int").alias("ability_id"),
        F.lit(4).alias("main_target_hp_attacks"),
        F.lit(0).alias("non_target_hp_attacks"),
        F.lit(20).alias("hp_dmg_cap_up_perc"),
        F.array(F.lit("Magic"), F.lit("FollowUp")).alias("attribute_list"),
        "game_version",
    )
    return df.unionByName(chainspell)


def ability_pipeline(lines_df: DataFrame, attrs_df: DataFrame | None = None) -> DataFrame:
    """Full reference pipeline: parse → corrections → fixed column order
    (reference web_scraper.py:567)."""
    return apply_corrections(parse_ability_lines(lines_df), attrs_df).select(
        "char_name",
        "ability_name",
        "ability_id",
        "main_target_hp_attacks",
        "non_target_hp_attacks",
        "hp_dmg_cap_up_perc",
        "attribute_list",
        "game_version",
    )


# ---------------------------------------------------------------------------
# Driver-contract entries
# ---------------------------------------------------------------------------


def _fixture_lines_df(spark: SparkSession) -> DataFrame:
    from dffoo_data_pipeline_spark.fixtures import ability_line_rows
    from dffoo_data_pipeline_spark.schemas import ABILITY_HTML_LINES

    return spark.createDataFrame(ability_line_rows(), ABILITY_HTML_LINES)


def abilities_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parser over the golden fixture corpus (sf-independent input — the
    fixture IS the dataset, mirroring the reference's golden tests)."""
    return parse_ability_lines(_fixture_lines_df(spark)).select(
        "char_name",
        "ability_name",
        "ability_id",
        "main_target_hp_attacks",
        "non_target_hp_attacks",
        "hp_dmg_cap_up_perc",
        "game_version",
    )


def abilities_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse + corrections + splits + synthetic rows, stringified attrs
    (reference CSV parity form, F9)."""
    out = ability_pipeline(_fixture_lines_df(spark))
    return out.select(
        "char_name",
        "ability_name",
        "ability_id",
        "main_target_hp_attacks",
        "non_target_hp_attacks",
        "hp_dmg_cap_up_perc",
        F.concat_ws("|", "attribute_list").alias("attributes"),
        "game_version",
    )


QUERIES["abilities_parse"] = abilities_parse
QUERIES["abilities_full_pipeline"] = abilities_full_pipeline
