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
    # cap accumulation (A1): every line contributes, gated by a literal
    # substring probe (`contains` — an unanchored literal rlike is the
    # same predicate, but pays a UTF-16 conversion + regex engine per row)
    cap_contrib = F.when(F.col("line").contains("- MAX BRV Cap"), as_int(F.col("l6"))).otherwise(
        0
    ) + F.when(F.col("line").contains("MAX BRV Cap Up by"), as_int(F.col("l2"))).otherwise(0)

    # hit gate: icon line, not a skipped source-descriptor icon
    is_hit = F.col("line").contains("inline HP") & ~F.col("p2").contains("Attack")

    # AOE from context lines i-1 ++ i-3 ++ i+2 (web_scraper.py:403-405)
    ctx_aoe = F.concat(F.col("p1"), F.col("p3"), F.col("l2")).contains("Group")

    # attack-info line resolution (+2 / +6-by-name / +11 / +13 / +6)
    info0 = F.when(F.col("ability_name").contains("Crystal Generation"), F.col("l6")).otherwise(
        F.col("l2")
    )
    extra = F.col("l6")
    stored = (info0.contains("Damage by") | info0.contains("Damage to")) & extra.contains(
        "of stored value from"
    )
    info1 = F.when(stored, F.col("l11")).otherwise(info0)
    statlike = (info1.contains(" by") | info1.contains(" based on")) & extra.contains("of ")
    info = (
        F.when(
            statlike & F.col("l13").contains("to non-targets") & F.col("l11").contains("inline BREAK"),
            F.col("l13"),
        )
        .when(statlike, F.col("l6"))
        .otherwise(info1)
    )

    # classification ladder (A3, web_scraper.py:449-478) — one exclusive
    # when-chain producing (main_add, non_add, is_copy, sub_one, ladder_aoe)
    branch = (
        F.when(
            info.contains("Damage to non-targets after each HP Attack, except last"),
            F.struct(
                F.lit(0).alias("m"),
                F.lit(0).alias("nn"),
                F.lit(True).alias("cp"),
                F.lit(True).alias("s1"),
                F.lit(False).alias("la"),
            ),
        )
        .when(
            info.contains("Damage to non-targets after each HP Attack"),
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
            info.contains("Group"),
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
            info.contains("to non-targets") | info.contains("to non-trap triggered targets"),
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

    # two-step projection: the when-ladder struct is generated ONCE and the
    # aoe flag reads its field — inlining `branch` twice doubles the
    # generated code and trips janino's 64 KB method limit (whole-stage
    # codegen would silently fall back to interpreted rows);
    # CollapseProject keeps the split because the ladder isn't cheap-to-dup
    scored = df.select(
        *KEYS,
        "ability_id",
        "line_no",
        cap_contrib.alias("cap_contrib"),
        F.when(is_hit, branch).alias("b"),
        is_hit.alias("is_hit"),
        ctx_aoe.alias("ctx_aoe"),
    ).select(
        *KEYS,
        "ability_id",
        "line_no",
        "cap_contrib",
        "b",
        "is_hit",
        (F.col("is_hit") & (F.col("ctx_aoe") | F.col("b.la"))).alias("aoe"),
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


def extract_attributes(lines_df: DataFrame) -> DataFrame:
    """Attribute-list extraction (reference web_scraper.py:296-305, F8):
    every `inline <Word>` icon class in an ability's lines except the
    HP/BREAK attack icons becomes an attribute tag, first-seen order,
    deduplicated.

    Pure expressions: regexp_extract_all per line → posexplode-free
    ordered dedup via (min line_no per tag) → sorted collect_list.
    """
    tags = lines_df.select(
        *KEYS,
        "line_no",
        F.explode(
            F.regexp_extract_all("line", F.lit(r"inline (\w+)"), 1)
        ).alias("tag"),
    ).where(~F.col("tag").isin("HP", "BREAK"))
    firsts = tags.groupBy(*KEYS, "tag").agg(F.min("line_no").alias("first_at"))
    return firsts.groupBy(*KEYS).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("first_at"), F.col("tag")))
            ),
            lambda s: s.getField("tag"),
        ).alias("attribute_list")
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
        # abilities with zero attribute icons are absent from attrs_df;
        # the reference gives every ability a real (possibly empty) list
        df = df.join(F.broadcast(attrs_df), KEYS, "left").withColumn(
            "attribute_list",
            F.coalesce(F.col("attribute_list"), F.array().cast("array<string>")),
        )
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


def abilities_from_pysource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME parse fed by the custom Python DataSource
    (sources/pysource.py: `spark.read.format("charwiki")` — the
    reference's scraper loop as a partition-per-character DataSource V2
    connector with char_name filter pushdown).  Shares abilities_parse's
    oracle, so the driver hash-checks the whole connector path: source
    enumeration → partitioned read → parse → identical 57 rows.
    """
    from dffoo_data_pipeline_spark.sources import pysource

    # read_charwiki negotiates filter pushdown against the live session
    # conf — a raw format("charwiki") read with a pushFilters reader is
    # a hard planning error under a stock (pushdown-off) driver session
    lines = pysource.read_charwiki(spark)
    return parse_ability_lines(lines).select(
        "char_name",
        "ability_name",
        "ability_id",
        "main_target_hp_attacks",
        "non_target_hp_attacks",
        "hp_dmg_cap_up_perc",
        "game_version",
    )


QUERIES["abilities_parse"] = abilities_parse
QUERIES["abilities_full_pipeline"] = abilities_full_pipeline
QUERIES["abilities_from_pysource"] = abilities_from_pysource


# ---------------------------------------------------------------------------
# DuckDB oracle twins: the same parse + corrections in ANSI-ish SQL over the
# same fixture rows (generated from fixtures.ability_line_rows so both
# engines read identical input)
# ---------------------------------------------------------------------------


def _fixture_values_sql() -> str:
    from dffoo_data_pipeline_spark.fixtures import ability_line_rows

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    return ",\n".join(
        f"({q(c)},{q(a)},{i},{q(v)},{n},{q(l)})"
        for c, a, i, v, n, l in ability_line_rows()
    )


_PARSE_SQL_BODY = """
led AS (
  SELECT char_name, ability_name, ability_id, game_version, line_no, line,
    COALESCE(lag(line,1)  OVER w, '') AS p1,
    COALESCE(lag(line,2)  OVER w, '') AS p2,
    COALESCE(lag(line,3)  OVER w, '') AS p3,
    COALESCE(lead(line,2) OVER w, '') AS l2,
    COALESCE(lead(line,6) OVER w, '') AS l6,
    COALESCE(lead(line,11) OVER w, '') AS l11,
    COALESCE(lead(line,13) OVER w, '') AS l13
  FROM lines
  WINDOW w AS (PARTITION BY char_name, ability_name, game_version ORDER BY line_no)
),
gated AS (
  SELECT *,
    CASE WHEN regexp_matches(line, '- MAX BRV Cap')
         THEN TRY_CAST(replace(trim(l6), '%', '') AS INT) ELSE 0 END
    + CASE WHEN regexp_matches(line, 'MAX BRV Cap Up by')
           THEN TRY_CAST(replace(trim(l2), '%', '') AS INT) ELSE 0 END AS cap_contrib,
    (line LIKE '%inline HP%') AND NOT regexp_matches(p2, 'Attack') AS is_hit,
    regexp_matches(p1 || p3 || l2, 'Group') AS ctx_aoe,
    CASE WHEN regexp_matches(ability_name, 'Crystal Generation') THEN l6 ELSE l2 END AS info0
  FROM led
),
resolved AS (
  SELECT *,
    CASE WHEN (regexp_matches(info1, ' by') OR regexp_matches(info1, ' based on'))
              AND regexp_matches(l6, 'of ')
         THEN CASE WHEN regexp_matches(l13, 'to non-targets')
                        AND regexp_matches(l11, 'inline BREAK')
                   THEN l13 ELSE l6 END
         ELSE info1 END AS info
  FROM (
    SELECT *,
      CASE WHEN (regexp_matches(info0, 'Damage by') OR regexp_matches(info0, 'Damage to'))
                AND regexp_matches(l6, 'of stored value from')
           THEN l11 ELSE info0 END AS info1
    FROM gated)
),
branched AS (
  SELECT char_name, ability_name, ability_id, game_version, line_no,
         cap_contrib, is_hit, ctx_aoe, info,
    CASE
      WHEN NOT is_hit THEN 'none'
      WHEN regexp_matches(info, 'Damage to non-targets after each HP Attack, except last') THEN 'copy1'
      WHEN regexp_matches(info, 'Damage to non-targets after each HP Attack') THEN 'copy'
      WHEN regexp_matches(info, 'Group \\d+') THEN 'groupN'
      WHEN regexp_matches(info, 'Group') THEN 'group1'
      WHEN regexp_matches(info, 'to non-targets × \\d+') THEN 'nonx'
      WHEN regexp_matches(info, 'to non-targets \\d+ times')
           OR regexp_matches(info, 'to non-trap triggered targets \\d+ times') THEN 'nont'
      WHEN regexp_matches(info, 'to non-targets')
           OR regexp_matches(info, 'to non-trap triggered targets') THEN 'non1'
      WHEN regexp_matches(info, '\\d+ times') THEN 'times'
      ELSE 'one' END AS k
  FROM resolved
),
scored AS (
  SELECT *,
    CASE k WHEN 'groupN' THEN TRY_CAST(regexp_extract(info, 'Group (\\d+) times', 1) AS INT)
           WHEN 'group1' THEN 1
           WHEN 'times'  THEN TRY_CAST(regexp_extract(info, '(\\d+) times', 1) AS INT)
           WHEN 'one'    THEN 1 ELSE 0 END AS m_add,
    CASE k WHEN 'nonx' THEN TRY_CAST(regexp_extract(info, '× (\\d+)', 1) AS INT)
           WHEN 'nont' THEN TRY_CAST(regexp_extract(info, '(\\d+) times', 1) AS INT)
           WHEN 'non1' THEN 1 ELSE 0 END AS n_add,
    (is_hit AND (ctx_aoe OR k IN ('groupN','group1'))) AS aoe,
    (k IN ('copy','copy1')) AS copy_raw,
    (k = 'copy1') AS sub_one
  FROM branched
),
incs AS (
  SELECT *,
    CASE WHEN aoe THEN m_add WHEN copy_raw THEN 0 WHEN is_hit THEN m_add ELSE 0 END AS main_inc,
    CASE WHEN aoe THEN m_add WHEN copy_raw THEN 0 WHEN is_hit THEN n_add ELSE 0 END AS non_inc,
    (copy_raw AND NOT aoe) AS is_copy
  FROM scored
),
runs AS (
  SELECT *,
    SUM(main_inc) OVER (PARTITION BY char_name, ability_name, game_version
                        ORDER BY line_no
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_main
  FROM incs
),
copied AS (
  SELECT *,
    CASE WHEN is_copy THEN run_main - CASE WHEN sub_one THEN 1 ELSE 0 END END AS copy_val,
    MAX(CASE WHEN is_copy THEN line_no END)
      OVER (PARTITION BY char_name, ability_name, game_version) AS last_copy_line
  FROM runs
),
parsed AS (
  SELECT char_name, ability_name,
    CAST(MIN(ability_id) AS INT) AS ability_id,
    CAST(SUM(main_inc) AS INT)   AS main_target_hp_attacks,
    CAST(COALESCE(
      MAX(CASE WHEN is_copy AND line_no = last_copy_line THEN copy_val END)
        + SUM(CASE WHEN line_no > last_copy_line THEN non_inc ELSE 0 END),
      SUM(non_inc)) AS INT)      AS non_target_hp_attacks,
    CAST(SUM(cap_contrib) AS INT) AS hp_dmg_cap_up_perc,
    game_version
  FROM copied
  GROUP BY char_name, ability_name, game_version
)
"""

ORACLES["abilities_parse"] = (
    "WITH lines(char_name, ability_name, ability_id, game_version, line_no, line) AS (VALUES\n"
    + _fixture_values_sql()
    + "),\n"
    + _PARSE_SQL_BODY
    + "\nSELECT * FROM parsed"
)
# the connector path must produce byte-identical results to the fixture
# path — same oracle checks both
ORACLES["abilities_from_pysource"] = ORACLES["abilities_parse"]

_CORRECTIONS_SQL = """
fix(char_name, ability_name, fixed_cap) AS (VALUES
  ('barret','Beam',10), ('yshtola','Spiritual Ray',400),
  ('gilgamesh','Ultimate Illusion',100),
  ('noel','Additional attack from Hunter of Light',15), ('kadaj','Geophagy',20)),
unc(char_name, ability_name) AS (VALUES
  ('caitsith','Transform'), ('leonora','Flare'), ('leonora','A Little Black Magic'),
  ('jessie','Shaped Charge'),
  ('aerith','Additional attack from White Materia''s Brilliance')),
spl(ability_name, followup_name, gl_main, jp_main, gl_non, jp_non) AS (VALUES
  ('Chuck Staff','Chuck Staff (Uncapped HP Attack)',1,1,1,1),
  ('Crystal Ray','Crystal Ray (Uncapped HP Attack)',1,1,1,1),
  ('Soul Burst','Soul Burst (Uncapped HP Attack)',1,1,0,0),
  ('Soul Burst+','Soul Burst+ (Uncapped HP Attack)',1,2,0,0)),
corr AS (
  SELECT p.char_name, p.ability_name, p.ability_id,
         p.main_target_hp_attacks, p.non_target_hp_attacks,
         CASE WHEN u.ability_name IS NOT NULL THEN 900
              ELSE COALESCE(f.fixed_cap, p.hp_dmg_cap_up_perc) END AS cap,
         (u.ability_name IS NOT NULL) AS is_unc,
         s.followup_name, s.gl_main, s.jp_main, s.gl_non, s.jp_non,
         p.game_version
  FROM parsed p
  LEFT JOIN fix f ON p.char_name = f.char_name AND p.ability_name = f.ability_name
  LEFT JOIN unc u ON p.char_name = u.char_name AND p.ability_name = u.ability_name
  LEFT JOIN spl s ON p.ability_name = s.ability_name
),
base AS (
  SELECT char_name, ability_name, ability_id,
    CAST(main_target_hp_attacks - CASE WHEN followup_name IS NULL THEN 0
         WHEN game_version = 'GL' THEN gl_main ELSE jp_main END AS INT) AS main_target_hp_attacks,
    CAST(non_target_hp_attacks - CASE WHEN followup_name IS NULL THEN 0
         WHEN game_version = 'GL' THEN gl_non ELSE jp_non END AS INT) AS non_target_hp_attacks,
    CAST(cap AS INT) AS hp_dmg_cap_up_perc,
    CASE WHEN is_unc THEN 'Uncapped' ELSE '' END AS attributes,
    game_version
  FROM corr
),
twins AS (
  SELECT char_name, followup_name AS ability_name, CAST(NULL AS INT) AS ability_id,
    CAST(CASE WHEN game_version = 'GL' THEN gl_main ELSE jp_main END AS INT) AS main_target_hp_attacks,
    CAST(CASE WHEN game_version = 'GL' THEN gl_non ELSE jp_non END AS INT) AS non_target_hp_attacks,
    CAST(900 AS INT) AS hp_dmg_cap_up_perc,
    CASE WHEN is_unc THEN 'FollowUp|Uncapped' ELSE 'FollowUp' END AS attributes,
    game_version
  FROM corr WHERE followup_name IS NOT NULL
),
seym AS (
  SELECT DISTINCT 'seymour' AS char_name, 'Chainspell - Follow Up' AS ability_name,
    CAST(NULL AS INT) AS ability_id, CAST(4 AS INT) AS main_target_hp_attacks,
    CAST(0 AS INT) AS non_target_hp_attacks, CAST(20 AS INT) AS hp_dmg_cap_up_perc,
    'Magic|FollowUp' AS attributes, game_version
  FROM parsed WHERE char_name = 'seymour'
)
SELECT * FROM base UNION ALL SELECT * FROM twins UNION ALL SELECT * FROM seym
"""

ORACLES["abilities_full_pipeline"] = (
    "WITH lines(char_name, ability_name, ability_id, game_version, line_no, line) AS (VALUES\n"
    + _fixture_values_sql()
    + "),\n"
    + _PARSE_SQL_BODY
    + ",\n"
    + _CORRECTIONS_SQL
)


# attribute-extraction fixture: abilities with mixed attribute icons
ATTR_FIXTURE_ROWS = [
    ("aerith", "Planet Protection", 1, "GL", 0, '<img class="inline Magic"> cast'),
    ("aerith", "Planet Protection", 1, "GL", 1, '<img alt="HP Attack Icon" class="inline HP">'),
    ("aerith", "Planet Protection", 1, "GL", 2, '<img class="inline Ranged"> then <img class="inline Magic">'),
    ("astos", "Cremation", 2, "GL", 0, '<img class="inline Melee"> strike'),
    ("astos", "Cremation", 2, "GL", 1, '<img class="inline BREAK">'),
    ("astos", "Cremation", 2, "GL", 2, '<img class="inline FollowUp">'),
    ("astos", "Cremation", 2, "GL", 3, 'plain text line'),
]


def abilities_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute extraction as a driver query (F8/P8: `inline (\\w+)` icon
    classes, attack icons excluded, first-seen order), serialized for the
    oracle hash."""
    from dffoo_data_pipeline_spark.schemas import ABILITY_HTML_LINES

    lines = spark.createDataFrame(ATTR_FIXTURE_ROWS, ABILITY_HTML_LINES)
    return extract_attributes(lines).select(
        "char_name",
        "ability_name",
        F.concat_ws("|", "attribute_list").alias("attributes"),
        "game_version",
    )


def _attr_oracle() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vals = ",\n".join(
        f"({q(c)},{q(a)},{i},{q(g)},{n},{q(l)})" for c, a, i, g, n, l in ATTR_FIXTURE_ROWS
    )
    return (
        "WITH lines(char_name, ability_name, ability_id, game_version, line_no, line) AS (VALUES\n"
        + vals
        + r"""),
tags AS (
  SELECT char_name, ability_name, game_version, line_no,
         unnest(regexp_extract_all(line, 'inline (\w+)', 1)) AS tag
  FROM lines
),
firsts AS (
  SELECT char_name, ability_name, game_version, tag, MIN(line_no) AS fa
  FROM tags WHERE tag NOT IN ('HP', 'BREAK')
  GROUP BY char_name, ability_name, game_version, tag
)
SELECT char_name, ability_name,
       string_agg(tag, '|' ORDER BY fa) AS attributes,
       game_version
FROM firsts GROUP BY char_name, ability_name, game_version
"""
    )


QUERIES["abilities_attributes"] = abilities_attributes
ORACLES["abilities_attributes"] = _attr_oracle()


def pystr_list(col) -> F.Column:
    """Serialize array<string> exactly like Python's ``str(list)`` — the
    reference's raw_abilities.csv attribute_list format (F9; reference
    datasets/raw_abilities.csv:2 shows ``['Melee']``, empty lists ``[]``;
    SURVEY.md:416-418).  ``['A', 'B']``: single quotes, comma-space."""
    col = F.col(col) if isinstance(col, str) else col
    return F.when(F.coalesce(F.size(col), F.lit(0)) == 0, F.lit("[]")).otherwise(
        F.concat(F.lit("['"), F.concat_ws("', '", col), F.lit("']"))
    )


def abilities_attribute_list_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 parity view: attribute lists in the reference CSV's Python-str
    form — multi-element ``['Magic', 'Ranged']``, empty ``[]`` for
    abilities with no icons (left join + coalesce, same as the pipeline).
    Round-tripping against actual reference CSV rows is covered in
    tests/test_abilities_golden.py::test_pystr_serialization_matches_reference_csv.
    """
    from dffoo_data_pipeline_spark.schemas import ABILITY_HTML_LINES

    rows = ATTR_FIXTURE_ROWS + [
        ("yuna", "Esuna", 3, "GL", 0, "Removes all debuffs"),  # zero icons → []
    ]
    lines = spark.createDataFrame(rows, ABILITY_HTML_LINES)
    base = lines.select("char_name", "ability_name", "game_version").distinct()
    out = base.join(extract_attributes(lines), KEYS, "left")
    return out.select(
        "char_name",
        "ability_name",
        pystr_list(
            F.coalesce(F.col("attribute_list"), F.array().cast("array<string>"))
        ).alias("attribute_list"),
        "game_version",
    )


def _attr_parity_oracle() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = ATTR_FIXTURE_ROWS + [("yuna", "Esuna", 3, "GL", 0, "Removes all debuffs")]
    vals = ",\n".join(
        f"({q(c)},{q(a)},{i},{q(g)},{n},{q(l)})" for c, a, i, g, n, l in rows
    )
    return (
        "WITH lines(char_name, ability_name, ability_id, game_version, line_no, line) AS (VALUES\n"
        + vals
        + r"""),
tags AS (
  SELECT char_name, ability_name, game_version, line_no,
         unnest(regexp_extract_all(line, 'inline (\w+)', 1)) AS tag
  FROM lines
),
firsts AS (
  SELECT char_name, ability_name, game_version, tag, MIN(line_no) AS fa
  FROM tags WHERE tag NOT IN ('HP', 'BREAK')
  GROUP BY char_name, ability_name, game_version, tag
),
agged AS (
  SELECT char_name, ability_name, game_version,
         '[' || string_agg('''' || tag || '''', ', ' ORDER BY fa) || ']' AS attribute_list
  FROM firsts GROUP BY char_name, ability_name, game_version
)
SELECT b.char_name, b.ability_name,
       COALESCE(a.attribute_list, '[]') AS attribute_list,
       b.game_version
FROM (SELECT DISTINCT char_name, ability_name, game_version FROM lines) b
LEFT JOIN agged a USING (char_name, ability_name, game_version)
"""
    )


QUERIES["abilities_attribute_list_parity"] = abilities_attribute_list_parity
ORACLES["abilities_attribute_list_parity"] = _attr_parity_oracle()


def abilities_parse_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parse pipeline at volume: fixture lines replicated across
    synthetic characters (scale follows the sf directory: sf0.1 → ~1.4M
    lines / ~11k characters).  Proves the window-offset parse is one
    shuffle at ANY corpus size, not just the golden fixture.

    The replication factor is derived FROM THE DATA (orders rows / 150,
    the generator's rows-per-0.0001-sf), exactly as the oracle derives
    it — the old form parsed the scale factor out of the DIRECTORY NAME,
    which crashed on any foreign directory and could silently disagree
    with the oracle's data-derived count (r12 hostile sweep).  The
    count() is one map-side-combined scan of the smallest fact table,
    driver-bounded to a single long.
    """
    from dffoo_data_pipeline_spark.sources.readers import load_table

    copies = max(1, load_table(spark, sf_dir, "orders").count() // 150)
    lines = _fixture_lines_df(spark)
    reps = spark.range(copies).select(F.col("id").alias("__rep"))
    scaled = (
        lines.crossJoin(reps)
        .select(
            F.concat_ws("_", "char_name", "__rep").alias("char_name"),
            "ability_name",
            "ability_id",
            "game_version",
            "line_no",
            "line",
        )
    )
    return parse_ability_lines(scaled).groupBy("game_version").agg(
        F.count(F.lit(1)).alias("n_abilities"),
        F.sum("main_target_hp_attacks").cast("bigint").alias("total_main_hits"),
    )


QUERIES["abilities_parse_scaled"] = abilities_parse_scaled
# Oracle: per-replica parses are independent and identical, so the scaled
# aggregate is exactly `copies ×` the unscaled parse aggregate.  `copies`
# is derived from the data in BOTH engines: the testdata generator emits
# exactly 1.5M×sf orders rows, so count(orders)/150 == int(sf·10_000) ==
# the query's replication factor at every shipped SF.
ORACLES["abilities_parse_scaled"] = (
    "WITH lines(char_name, ability_name, ability_id, game_version, line_no, line) AS (VALUES\n"
    + _fixture_values_sql()
    + "),\n"
    + _PARSE_SQL_BODY
    + """,
copies AS (SELECT GREATEST(1, CAST(count(*) / 150 AS BIGINT)) AS c FROM orders)
SELECT game_version,
       CAST(count(*) * c AS BIGINT) AS n_abilities,
       CAST(SUM(main_target_hp_attacks) * c AS BIGINT) AS total_main_hits
FROM parsed, copies
GROUP BY game_version, c
"""
)
