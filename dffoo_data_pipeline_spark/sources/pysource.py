"""Custom Python DataSource: the reference scraper as a first-class
Spark source (`spark.read.format("charwiki")`).

The reference's character-page scan is a bespoke enumeration loop — list
characters, fetch each page, emit HTML lines (web_scraper.py:131-173
builds the character→URL dict; :1135-1185 walks it one character at a
time).  In Spark that contract is a DataSource V2 connector: the
character list becomes the PARTITION list (one InputPartition per
character, so a 177-character scrape runs 177-way parallel instead of
the reference's sequential loop), the per-character fetch becomes
``read(partition)``, and the "characters not in GL yet" predicate
(web_scraper.py:237-250) becomes real FILTER PUSHDOWN — an EqualTo on
``char_name`` prunes partitions before any fetch happens.

The fixture corpus stands in for the remote wiki (the container has no
network; fixtures.py synthesizes the parser's line-offset contract), so
``read`` yields from module data.  A production connector swaps the
body of ``_char_rows`` for the HTTP fetch; everything else — schema,
partitioning, pushdown, the streaming offset protocol — is the real
Spark surface.

The stream reader simulates the reference's incremental per-character
checkpointing (web_scraper.py:1164-1183): each micro-batch delivers one
character and the offset {"idx": n} is the resume point, so a restarted
stream continues from the last committed character instead of
re-scraping.

Workers import this module by path; on a real cluster ship the package
via ``--py-files`` (local-mode tests share the filesystem).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "char_name string, ability_name string, ability_id int, "
    "game_version string, line_no int, line string"
)


def _all_chars() -> list[str]:
    from dffoo_data_pipeline_spark.fixtures import GOLDEN_FIXTURES

    return sorted(GOLDEN_FIXTURES)


def _char_rows(char: str, game_version: str):
    """One character's HTML-line rows — the per-character 'page fetch'."""
    from dffoo_data_pipeline_spark.fixtures import GOLDEN_FIXTURES, ability_line_rows

    return ability_line_rows({char: GOLDEN_FIXTURES[char]}, game_version)


class _CharPartition(InputPartition):
    def __init__(self, char: str):
        self.char = char


class CharacterWikiReader(DataSourceReader):
    """Base reader: stock-session safe.  It deliberately does NOT
    define ``pushFilters`` — Spark 4.1 refuses to plan a Python
    DataSource whose reader overrides it while
    ``spark.sql.python.filterPushdown.enabled`` is false
    (DATA_SOURCE_PUSHDOWN_DISABLED), and false is the STOCK DEFAULT,
    so a pushdown-only reader breaks under any foreign driver session
    that didn't opt in.  Partition pruning is still available through
    the ``char_name`` option; predicate pushdown lives in the
    ``CharacterWikiPushdownReader`` subclass, selected by
    ``option("pushdown", "true")`` (see ``read_charwiki``, which sets
    it from the live session conf)."""

    def __init__(self, options: dict):
        self.game_version = options.get("game_version", "GL")
        self.only_char: str | None = options.get("char_name")

    def partitions(self):
        chars = _all_chars()
        if self.only_char is not None:
            chars = [c for c in chars if c == self.only_char]
        return [_CharPartition(c) for c in chars]

    def read(self, partition: _CharPartition):
        yield from _char_rows(partition.char, self.game_version)


class CharacterWikiPushdownReader(CharacterWikiReader):
    """Pushdown-capable variant, used only when the session has
    ``spark.sql.python.filterPushdown.enabled=true`` (our tuned
    session turns it on; stock Spark leaves it off)."""

    def pushFilters(self, filters):
        """Accept EqualTo on char_name (partition pruning — the
        reference's availability predicate, applied before any fetch);
        everything else is returned for Spark to evaluate post-scan."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("char_name",):
                self.only_char = f.value
            else:
                yield f


class CharacterWikiStreamReader(SimpleDataSourceStreamReader):
    """One character per micro-batch; offset = index into the sorted
    character list.  A restart resumes from the committed offset — the
    reference's per-character checkpoint CSVs, as a streaming-source
    offset contract."""

    def __init__(self, options: dict):
        self.game_version = options.get("game_version", "GL")

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start: dict):
        chars = _all_chars()
        idx = start["idx"]
        if idx >= len(chars):
            return iter([]), {"idx": idx}
        return iter(_char_rows(chars[idx], self.game_version)), {"idx": idx + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        chars = _all_chars()
        rows: list = []
        for i in range(start["idx"], min(end["idx"], len(chars))):
            rows.extend(_char_rows(chars[i], self.game_version))
        return iter(rows)


class CharacterWikiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "charwiki"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CharacterWikiReader:
        # decided via option, not session conf: reader() runs in the
        # planning worker, which has no SparkSession to consult
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return CharacterWikiPushdownReader(self.options)
        return CharacterWikiReader(self.options)

    def simpleStreamReader(self, schema) -> CharacterWikiStreamReader:
        return CharacterWikiStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the charwiki format."""
    spark.dataSource.register(CharacterWikiDataSource)


def read_charwiki(spark, game_version: str | None = None, char_name: str | None = None):
    """Batch-read the charwiki source with pushdown negotiated against
    the LIVE session: ``option("pushdown", "true")`` only when
    ``spark.sql.python.filterPushdown.enabled`` is actually on.  Always
    use this instead of a raw ``spark.read.format("charwiki")`` — under
    a stock session (pushdown conf false, the Spark default) a reader
    that defines pushFilters is a hard planning error, not a silent
    no-pushdown fallback (caught by the stock-driver-twin sweep,
    PERF.md round 7)."""
    register(spark)
    r = spark.read.format("charwiki")
    if game_version is not None:
        r = r.option("game_version", game_version)
    if char_name is not None:
        r = r.option("char_name", char_name)
    enabled = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    if str(enabled).lower() == "true":
        r = r.option("pushdown", "true")
    return r.load()
