"""Reference-parity pipelines for the other two reference outputs:

- BT effects (A4): `retrieve_hp_caps_from_bt` (reference
  web_scraper.py:593-760) — per character, personal and party MAX-BRV-cap
  sums over gated lines (value 6 lines below the marker, `└─` continuation
  variants included) plus the enemy-count apply list.
- High-armor caps (A5): `retrieve_ha_hp_dmg_cap_up` (reference
  web_scraper.py:997-1082) — base-armor block plus ≥5 HA+ blocks, personal
  and party totals accumulated across all blocks.

Same architecture as the abilities parser (plans/abilities.py): html-lines
IR → lead() offset windows → regex-gated conditional sums → one groupBy per
character.  One shuffle on (char, version); the window partitioning is
reused by the aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}

PAD = '<div class="bluebase separator">'

# ---------------------------------------------------------------------------
# Fixtures: deterministic per-character planted values.  Expected outputs
# are the sums of what's planted — tests recompute them independently.
# ---------------------------------------------------------------------------

# char -> (personal cap values, party cap values, enemy-count list)
BT_FIXTURES: dict[str, tuple[list[int], list[int], list[int]]] = {
    "aerith": ([60], [20], [1, 2, 3]),
    "astos": ([50, 20], [], [1]),
    "auron": ([80], [10, 10], [1, 2]),
    "paine": ([], [30], [2, 3]),
    "sherlotta": ([40, 20, 10], [], [1, 2, 3]),
}

# char -> list of (personal, party) per armor block: base + 5 HA+ blocks
HA_FIXTURES: dict[str, list[tuple[int, int]]] = {
    "aerith": [(10, 0), (5, 0), (5, 0), (5, 0), (5, 0), (5, 0)],
    "auron": [(10, 5), (5, 0), (5, 0), (5, 0), (5, 0), (5, 5)],
    "warrioroflight": [(0, 10), (5, 0), (5, 0), (5, 0), (5, 0), (10, 0)],
}


def bt_line_rows(game_version: str = "GL"):
    """(char_name, game_version, line_no, line) rows for the BT pages."""
    rows = []
    for char, (personal, party, enemies) in BT_FIXTURES.items():
        lines: list[str] = ["<div>bt header</div>"]
        for i, v in enumerate(personal):
            marker = "- MAX BRV Cap Up" if i == 0 else "└─ - MAX BRV Cap Up"
            lines += [marker, PAD, PAD, PAD, PAD, PAD, str(v)]
        for i, v in enumerate(party):
            marker = (
                "- Party MAX BRV Cap Up" if i == 0 else "└─ - Party MAX BRV Cap Up"
            )
            lines += [marker, PAD, PAD, PAD, PAD, PAD, str(v)]
        lines += [f"Applies based on enemy count: {', '.join(map(str, enemies))}"]
        rows += [(char, game_version, n, l) for n, l in enumerate(lines)]
    return rows


def ha_line_rows(game_version: str = "GL"):
    """(char_name, game_version, line_no, line) rows for armor pages:
    one base block + five HA+ blocks per character."""
    rows = []
    for char, blocks in HA_FIXTURES.items():
        lines: list[str] = []
        for b, (p, q) in enumerate(blocks):
            kind = "Base High Armor" if b == 0 else f"High Armor+ {b}"
            lines += [f"<div>{kind}</div>"]
            lines += ["- HP DMG Cap Up", PAD, str(p)]
            lines += ["- Party HP DMG Cap Up", PAD, str(q)]
        rows += [(char, game_version, n, l) for n, l in enumerate(lines)]
    return rows


_LINES_SCHEMA = "char_name string, game_version string, line_no int, line string"


# ---------------------------------------------------------------------------
# Parsers
# ---------------------------------------------------------------------------


def parse_bt_lines(lines_df: DataFrame) -> DataFrame:
    """BT page lines → (char_name, bt_personal_hp_dmg_cap_up,
    bt_party_hp_dmg_cap_up, enemy_count_apply_list, game_version).

    Party gate checked first — the personal marker is a substring-shaped
    cousin, exactly the reference's elif ordering (web_scraper.py:729-737).
    """
    w = Window.partitionBy("char_name", "game_version").orderBy("line_no")
    l6 = F.coalesce(F.lead("line", 6).over(w), F.lit(""))
    is_party = F.col("line").contains("- Party MAX BRV Cap Up")
    is_personal = F.col("line").contains("- MAX BRV Cap Up") & ~is_party
    val6 = F.trim(l6).cast("int")
    enemies = F.when(
        F.col("line").contains("Applies based on enemy count:"),
        F.transform(
            F.split(F.regexp_extract("line", r"enemy count: (.*)$", 1), r",\s*"),
            lambda x: x.cast("int"),
        ),
    )
    staged = lines_df.select(
        "char_name",
        "game_version",
        F.when(is_personal, val6).otherwise(0).alias("p_contrib"),
        F.when(is_party, val6).otherwise(0).alias("q_contrib"),
        enemies.alias("enemies"),
    )
    return staged.groupBy("char_name", "game_version").agg(
        F.sum("p_contrib").cast("int").alias("bt_personal_hp_dmg_cap_up"),
        F.sum("q_contrib").cast("int").alias("bt_party_hp_dmg_cap_up"),
        F.first("enemies", ignorenulls=True).alias("enemy_count_apply_list"),
    )


def parse_ha_lines(lines_df: DataFrame) -> DataFrame:
    """Armor page lines → (char_name, personal_hp_dmg_cap_up,
    party_ha_hp_dmg_cap_up, game_version): conditional sums across the
    base + HA+ blocks (the reference accumulates the same totals across
    its base-page scan and the ≥5 scrolled HA+ divs)."""
    w = Window.partitionBy("char_name", "game_version").orderBy("line_no")
    l2 = F.coalesce(F.lead("line", 2).over(w), F.lit(""))
    is_party = F.col("line").contains("- Party HP DMG Cap Up")
    is_personal = F.col("line").contains("- HP DMG Cap Up") & ~is_party
    val2 = F.trim(l2).cast("int")
    staged = lines_df.select(
        "char_name",
        "game_version",
        F.when(is_personal, val2).otherwise(0).alias("p_contrib"),
        F.when(is_party, val2).otherwise(0).alias("q_contrib"),
    )
    return staged.groupBy("char_name", "game_version").agg(
        F.sum("p_contrib").cast("int").alias("personal_hp_dmg_cap_up"),
        F.sum("q_contrib").cast("int").alias("party_ha_hp_dmg_cap_up"),
    )


# ---------------------------------------------------------------------------
# Driver-contract queries + DuckDB oracle twins over identical fixture rows
# ---------------------------------------------------------------------------


def bt_effects_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: BT-effect personal/party cap sums + enemy apply list."""
    lines = spark.createDataFrame(bt_line_rows(), _LINES_SCHEMA)
    out = parse_bt_lines(lines)
    # array column → csv string so the DuckDB value-hash compares cleanly
    return out.select(
        "char_name",
        "bt_personal_hp_dmg_cap_up",
        "bt_party_hp_dmg_cap_up",
        F.concat_ws(",", F.col("enemy_count_apply_list").cast("array<string>")).alias(
            "enemy_counts_csv"
        ),
        "game_version",
    )


def ha_caps_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: high-armor personal/party cap totals across base + HA+ blocks."""
    lines = spark.createDataFrame(ha_line_rows(), _LINES_SCHEMA)
    return parse_ha_lines(lines).select(
        "char_name",
        "personal_hp_dmg_cap_up",
        "party_ha_hp_dmg_cap_up",
        "game_version",
    )


def _values_sql(rows) -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    return ",\n".join(f"({q(c)},{q(g)},{n},{q(l)})" for c, g, n, l in rows)


def _bt_oracle() -> str:
    return (
        "WITH lines(char_name, game_version, line_no, line) AS (VALUES\n"
        + _values_sql(bt_line_rows())
        + """),
led AS (
  SELECT char_name, game_version, line,
    COALESCE(lead(line, 6) OVER (PARTITION BY char_name, game_version
                                 ORDER BY line_no), '') AS l6
  FROM lines
)
SELECT char_name,
  CAST(SUM(CASE WHEN regexp_matches(line, '- MAX BRV Cap Up')
                 AND NOT regexp_matches(line, '- Party MAX BRV Cap Up')
            THEN TRY_CAST(trim(l6) AS INT) ELSE 0 END) AS INT)
    AS bt_personal_hp_dmg_cap_up,
  CAST(SUM(CASE WHEN regexp_matches(line, '- Party MAX BRV Cap Up')
            THEN TRY_CAST(trim(l6) AS INT) ELSE 0 END) AS INT)
    AS bt_party_hp_dmg_cap_up,
  MAX(CASE WHEN regexp_matches(line, 'Applies based on enemy count:')
      THEN replace(regexp_extract(line, 'enemy count: (.*)$', 1), ' ', '')
      END) AS enemy_counts_csv,
  game_version
FROM led GROUP BY char_name, game_version
"""
    )


def _ha_oracle() -> str:
    return (
        "WITH lines(char_name, game_version, line_no, line) AS (VALUES\n"
        + _values_sql(ha_line_rows())
        + """),
led AS (
  SELECT char_name, game_version, line,
    COALESCE(lead(line, 2) OVER (PARTITION BY char_name, game_version
                                 ORDER BY line_no), '') AS l2
  FROM lines
)
SELECT char_name,
  CAST(SUM(CASE WHEN regexp_matches(line, '- HP DMG Cap Up')
                 AND NOT regexp_matches(line, '- Party HP DMG Cap Up')
            THEN TRY_CAST(trim(l2) AS INT) ELSE 0 END) AS INT)
    AS personal_hp_dmg_cap_up,
  CAST(SUM(CASE WHEN regexp_matches(line, '- Party HP DMG Cap Up')
            THEN TRY_CAST(trim(l2) AS INT) ELSE 0 END) AS INT)
    AS party_ha_hp_dmg_cap_up,
  game_version
FROM led GROUP BY char_name, game_version
"""
    )


QUERIES["bt_effects_parse"] = bt_effects_parse
QUERIES["ha_caps_parse"] = ha_caps_parse
ORACLES["bt_effects_parse"] = _bt_oracle()
ORACLES["ha_caps_parse"] = _ha_oracle()
