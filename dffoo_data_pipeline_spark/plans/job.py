"""The composed batch job — reference entry point E1 as a Spark job graph.

`python web_scraper.py config.yml` (reference web_scraper.py:1116-1291)
runs: per-character scrape+parse of three tables → per-character
checkpoint CSVs → JP second pass for reworked/unreleased characters →
union → run-timestamp stamping → final CSVs + one Postgres append
transaction.  Here the same graph is four declarative stages over the
html-lines IR:

  parse (abilities ∥ bt ∥ ha)  →  GL/JP union routing (U2/U3)  →
  run-stamp (P4)  →  checkpoint sink (S5) + run-stamped append (S7)

Scale: each parse is one shuffle; the three tables are independent
(scheduler runs them concurrently); sinks are partitioned writes — a
re-run of any character slice overwrites only its partitions, and
downstream latest-run reads prune to one run_id partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.plans import bt_ha
from dffoo_data_pipeline_spark.plans.abilities import (
    _fixture_lines_df,
    ability_pipeline,
)
from dffoo_data_pipeline_spark.sources import writers


def build_outputs(
    spark: SparkSession, jp_chars: tuple[str, ...] = ("sherlotta",)
) -> dict[str, DataFrame]:
    """The three raw output tables from their line-IR inputs.

    `jp_chars` models the reference's second pass (web_scraper.py:
    1187-1244): the union-distinct of reworked + not-in-GL characters is
    re-scraped under game_version='JP' and unioned in (U2/U3).
    """
    from dffoo_data_pipeline_spark.fixtures import GOLDEN_FIXTURES, ability_line_rows
    from dffoo_data_pipeline_spark.schemas import ABILITY_HTML_LINES

    jp_fixtures = {c: GOLDEN_FIXTURES[c] for c in jp_chars if c in GOLDEN_FIXTURES}
    jp_lines = spark.createDataFrame(
        ability_line_rows(jp_fixtures, game_version="JP"), ABILITY_HTML_LINES
    )
    abilities = ability_pipeline(_fixture_lines_df(spark).unionByName(jp_lines))

    bt = bt_ha.parse_bt_lines(
        spark.createDataFrame(bt_ha.bt_line_rows(), bt_ha._LINES_SCHEMA)
    )
    ha = bt_ha.parse_ha_lines(
        spark.createDataFrame(bt_ha.ha_line_rows(), bt_ha._LINES_SCHEMA)
    )
    return {"raw_abilities": abilities, "raw_bt_effects": bt, "raw_high_armor_caps": ha}


def run_batch(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    jp_chars: tuple[str, ...] = ("sherlotta",),
) -> dict[str, DataFrame]:
    """Execute the full job: build, stamp, checkpoint, append.

    Returns the stamped DataFrames (for inspection); durable state is
    `{out_dir}/checkpoints/<table>` (latest content, partition-overwrite)
    and `{out_dir}/runs/<table>` (full run history, partitioned by run_id).
    """
    from pyspark.sql import Observation

    started = F.current_timestamp()
    outputs = build_outputs(spark, jp_chars)
    stamped = {}
    metrics: dict[str, dict] = {}
    for name, df in outputs.items():
        s = df.withColumn("scrape_started_at_utc", started).withColumn(
            "scrape_ended_at_utc", F.current_timestamp()
        )
        # data-quality counters ride the write job (df.observe: zero extra
        # passes — the reference logged counts from a separate loop)
        obs = Observation(f"dq_{name}")
        s = s.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            # DISTINCT aggs are disallowed in observed metrics; the HLL
            # sketch is the observable cardinality counter
            F.approx_count_distinct("char_name").alias("n_chars"),
        )
        writers.write_checkpointed(
            s, f"{out_dir}/checkpoints/{name}", partition_cols=("char_name", "game_version")
        )
        metrics[name] = obs.get
        writers.write_run_stamped(
            s.drop("scrape_started_at_utc", "scrape_ended_at_utc"),
            f"{out_dir}/runs/{name}",
            run_id,
        )
        stamped[name] = s
    stamped["__metrics__"] = metrics
    return stamped


def latest(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    """Latest-run view of one output table (partition-pruned read)."""
    return writers.read_latest_run(spark, f"{out_dir}/runs/{name}")


def pipeline_latest_abilities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed E1 batch job as a driver query: the job WRITES —
    checkpoints + run-stamped appends — then reads back the
    partition-pruned latest-run view.  The side effects are not SQL, but
    the read-back CONTENT is deterministic, so `_latest_abilities_oracle`
    hash-verifies it end-to-end (write → partition prune → read).
    Output: the latest run's abilities table, GL + JP-second-pass rows.
    The ``attribute_list`` array is serialized to the reference CSV's
    Python-str form at this boundary (F9 parity, same transform as
    ``abilities_attribute_list_parity``) — downstream row-hash comparators
    canonicalize by sorting values and an array cell is unhashable there."""
    import tempfile

    from dffoo_data_pipeline_spark.plans.abilities import pystr_list

    out = tempfile.mkdtemp(prefix="sg_jobq_")
    run_batch(spark, out, run_id="r001")
    df = latest(spark, out, "raw_abilities").drop("run_id")
    if "attribute_list" in df.columns:
        df = df.withColumn(
            "attribute_list",
            pystr_list(
                F.coalesce(
                    F.col("attribute_list"), F.array().cast("array<string>")
                )
            ),
        )
    return df


def _latest_abilities_oracle() -> str:
    """DuckDB twin of the composed job's latest-run abilities read-back.

    The job is write-then-read, but its CONTENT is fully deterministic:
    ability_pipeline(base GL fixtures ∪ sherlotta-JP second pass) with
    volatile run stamps dropped before the run-stamped write.  So the
    oracle is the existing full-pipeline SQL over the combined GL+JP
    fixture VALUES, with the pipe-joined `attributes` string re-serialized
    to the reference CSV's Python-str `attribute_list` form (F9) — which
    upgrades this row from rows-only to hash-verified: a wrong partition
    prune in read_latest_run, a dropped JP row, or a stamp leaking into
    the output all become hash mismatches.
    """
    from dffoo_data_pipeline_spark.fixtures import GOLDEN_FIXTURES, ability_line_rows
    from dffoo_data_pipeline_spark.plans.abilities import (
        _CORRECTIONS_SQL,
        _PARSE_SQL_BODY,
    )

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    jp = {c: GOLDEN_FIXTURES[c] for c in ("sherlotta",) if c in GOLDEN_FIXTURES}
    rows = ability_line_rows() + ability_line_rows(jp, game_version="JP")
    vals = ",\n".join(
        f"({q(c)},{q(a)},{i},{q(v)},{n},{q(l)})" for c, a, i, v, n, l in rows
    )
    inner = (
        "WITH lines(char_name, ability_name, ability_id, game_version, line_no, line) AS (VALUES\n"
        + vals
        + "),\n"
        + _PARSE_SQL_BODY
        + ",\n"
        + _CORRECTIONS_SQL
    )
    return (
        "SELECT char_name, ability_name, ability_id, main_target_hp_attacks,\n"
        "       non_target_hp_attacks, hp_dmg_cap_up_perc,\n"
        "       CASE WHEN attributes = '' THEN '[]'\n"
        "            ELSE '[''' || replace(attributes, '|', ''', ''') || ''']' END AS attribute_list,\n"
        "       game_version\n"
        f"FROM (\n{inner}\n) t"
    )


_DUCK_TYPES = {
    "string": "VARCHAR",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "array<string>": "VARCHAR[]",
    "array<int>": "INTEGER[]",
    "array<bigint>": "BIGINT[]",
}


def _duck_ddl(name: str, schema) -> str:
    cols = []
    for f in schema.fields:
        t = f.dataType.simpleString()
        if t not in _DUCK_TYPES:
            raise TypeError(
                f"unsupported Spark type {t!r} for column {f.name!r} of table"
                f" {name!r} — extend _DUCK_TYPES"
            )
        cols.append(f'"{f.name}" {_DUCK_TYPES[t]}')
    return f"CREATE TABLE {name} ({', '.join(cols)})"


def pipeline_db_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The E1 tail as a driver query: build the three output tables, load
    them into the warehouse in ONE transaction
    (writers.write_db_append_all_or_nothing — the reference's exact S7
    shape, web_scraper.py:1286-1291), then report per-table row counts
    READ BACK FROM THE WAREHOUSE.  The oracle computes the same counts
    from the fixture SQL twins, so the hash certifies the full path:
    parse → corrections → JP second pass → stage → single-transaction
    bulk load → read-back.  A dropped table, a torn transaction, or a
    miscounted load all become hash mismatches."""
    import shutil
    import tempfile

    import duckdb

    outputs = build_outputs(spark)
    root = tempfile.mkdtemp(prefix="sg_dbload_")
    try:
        db = f"{root}/wh.duckdb"
        con = duckdb.connect(db)
        for name, df in outputs.items():
            con.execute(_duck_ddl(name, df.schema))
        con.close()
        writers.write_db_append_all_or_nothing(outputs, db, f"{root}/stage")
        con = duckdb.connect(db)
        rows = [
            (n, int(con.execute(f"SELECT count(*) FROM {n}").fetchone()[0]))
            for n in outputs
        ]
        con.close()
    finally:
        # the counts are plain Python ints by now — the scratch warehouse
        # (a full copy of all three tables per invocation) must not
        # accumulate across driver sweeps and bench reps
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, "table_name string, n_rows long")


def _db_load_oracle() -> str:
    from dffoo_data_pipeline_spark.plans.bt_ha import _bt_oracle, _ha_oracle

    return (
        "SELECT 'raw_abilities' AS table_name, CAST(count(*) AS BIGINT) AS n_rows "
        f"FROM (\n{_latest_abilities_oracle()}\n) a\n"
        "UNION ALL SELECT 'raw_bt_effects', CAST(count(*) AS BIGINT) "
        f"FROM (\n{_bt_oracle()}\n) b\n"
        "UNION ALL SELECT 'raw_high_armor_caps', CAST(count(*) AS BIGINT) "
        f"FROM (\n{_ha_oracle()}\n) h"
    )


QUERIES = {
    "pipeline_latest_abilities": pipeline_latest_abilities,
    "pipeline_db_load": pipeline_db_load,
}
ORACLES: dict = {
    "pipeline_latest_abilities": _latest_abilities_oracle(),
    "pipeline_db_load": _db_load_oracle(),
}
