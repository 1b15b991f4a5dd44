"""Corpus-curation operators for a training-data pipeline (§2k extension).

What a 100 TB curation run needs beyond dedup/quality/similarity:
deterministic sampling (reproducible subsets for eval/ablation), weighted
source mixing (the dataset-mixture knob in every LLM data recipe), PII
redaction, and the stage-by-stage curation funnel report.

Determinism contract: "randomness" is md5 of the stable doc id — the
same function computes identically in Spark and DuckDB, so every sampling
decision is reproducible, join-free, and oracle-checkable.  A real
pipeline swaps the seed by prefixing a salt literal; the md5 hex compare
trick keeps the whole decision inside JVM column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.functions import text as TX
from dffoo_data_pipeline_spark.sources.readers import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _doc_hash():
    """Deterministic per-doc 'random' draw, identical in both engines."""
    return F.md5(F.col("doc_id").cast("string"))


def stratified_topk(
    df: DataFrame,
    stratum_col: str,
    k: int,
    salt_buckets: int = 64,
) -> DataFrame:
    """Deterministic k-per-stratum sample: the k docs with the smallest
    md5(doc_id) per stratum (hash order ≈ uniform random, but stable and
    engine-independent).

    Scale: a single window over the stratum would funnel each stratum
    through ONE reducer — with 5 languages over 100 TB that is 5 hot
    tasks.  Two-phase instead: per-(stratum, salt) local top-k bounds
    every task at k rows out, then the global top-k runs over ≤
    salt_buckets·k survivors per stratum.  Identical result to the direct
    window (each salt bucket keeps its k best, and the global top-k of
    the union is the true top-k), one extra cheap shuffle.
    """
    h = _doc_hash().alias("__h")
    salted = df.select("*", h, F.pmod("doc_id", F.lit(salt_buckets)).alias("__salt"))
    w1 = Window.partitionBy(stratum_col, "__salt").orderBy("__h", "doc_id")
    stage1 = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(stratum_col).orderBy("__h", "doc_id")
    return (
        stage1.withColumn("sample_rank", F.row_number().over(w2))
        .where(F.col("sample_rank") <= k)
        .drop("__h")
    )


@_register(
    "curation_sample_stratified",
    """
    SELECT doc_id, lang, sample_rank FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS sample_rank
        FROM documents)
    WHERE sample_rank <= 20
    """,
)
def curation_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20-docs-per-language sample (eval/ablation subsets
    that reproduce bit-identically across runs and engines)."""
    d = load_table(spark, sf_dir, "documents")
    return stratified_topk(d, "lang", k=20).select("doc_id", "lang", "sample_rank")


# per-source mixture weights as md5-prefix cutoffs: a doc survives when
# its 4-hex-digit hash prefix sorts below the stratum's cutoff.  Cutoff
# 0x4000/0x10000 = keep ~25%, 0xC000 ≈ 75%, 0xFFFF+1 → keep all.
_MIX_CUTOFFS = [
    ("src0", "4000"), ("src1", "4000"), ("src2", "4000"), ("src3", "4000"),
    ("src4", "8000"), ("src5", "8000"), ("src6", "8000"), ("src7", "8000"),
    ("src8", "c000"), ("src9", "c000"), ("src10", "c000"), ("src11", "c000"),
]  # sources not listed keep everything (weight 1.0)


def weighted_source_mix(df: DataFrame, source_col: str, cutoffs) -> DataFrame:
    """Weighted downsampling per source: deterministic md5-prefix
    thresholding — the dataset-mixture knob (e.g. downweight crawl dups,
    keep all curated text).  Pure filter: no shuffle, no join, no RNG
    state; the same rows survive on any cluster, any partitioning.
    """
    expr = None
    for src, hexcut in cutoffs:
        cond = F.col(source_col) == src
        expr = F.when(cond, F.lit(hexcut)) if expr is None else expr.when(cond, F.lit(hexcut))
    cut = expr.otherwise(F.lit("ffffffff"))
    return df.where(F.substring(_doc_hash(), 1, 4) < cut)


def _mix_cutoff_sql() -> str:
    cases = " ".join(f"WHEN '{s}' THEN '{c}'" for s, c in _MIX_CUTOFFS)
    return f"CASE source {cases} ELSE 'ffffffff' END"


@_register(
    "curation_weighted_mix",
    f"""
    SELECT source, COUNT(*) AS n_kept, MIN(doc_id) AS first_doc
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < {_mix_cutoff_sql()}
    GROUP BY source
    """,
)
def curation_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted corpus: ~25% of src0-3, ~50% of src4-7, ~75% of
    src8-11, all of the rest — reported as per-source survivor counts."""
    d = load_table(spark, sf_dir, "documents")
    kept = weighted_source_mix(d, "source", _MIX_CUTOFFS)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("first_doc")
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_LONGNUM_RE = r"[0-9]{7,}"


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Regex PII scrub: emails → <EMAIL>, 7+-digit runs → <NUM> (phone/
    account-number shaped).  Pure JVM projection — at 100 TB this runs
    inside the scan's whole-stage codegen with zero shuffle.  Real
    deployments chain more patterns (IBAN, SSN, addresses) through the
    same shape; recall beyond regex needs an NER pass (the multimodal
    decode-stub pattern applies: Arrow-batched model UDF behind this
    same column contract).
    """
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), _EMAIL_RE, "<EMAIL>"),
        _LONGNUM_RE,
        "<NUM>",
    )
    return df.withColumn("redacted_text", redacted).withColumn(
        "n_redactions",
        F.size(F.split(F.col("redacted_text"), "<EMAIL>|<NUM>")) - 1,
    )


@_register(
    "curation_pii_redaction",
    f"""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_LONGNUM_RE}', '<NUM>', 'g')) AS redacted_md5,
           len(string_split_regex(
               regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_LONGNUM_RE}', '<NUM>', 'g'),
               '<EMAIL>|<NUM>')) - 1 AS n_redactions
    FROM documents
    """,
)
def curation_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus; the oracle compares the md5 of the
    redacted text (full-content check without hauling text through the
    hash compare) plus the per-doc redaction count."""
    d = load_table(spark, sf_dir, "documents")
    return redact_pii(d, "text").select(
        "doc_id",
        F.md5("redacted_text").alias("redacted_md5"),
        "n_redactions",
    )


@_register(
    "curation_split_assign",
    """
    WITH assigned AS (
        SELECT doc_id, lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
    SELECT doc_id, lang, split FROM assigned
    """,
)
def curation_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5-hex prefix of the
    stable doc id: first hex digit 0-b → train (75%), c-d → val (12.5%),
    e-f → test (12.5%).  The split a training pipeline must make BEFORE
    any shuffling so membership never changes as the corpus grows or is
    repartitioned — hash-of-id, not row_number or rand().

    Scale: a pure projection (no shuffle, no state, no RNG); the same doc
    lands in the same split on any cluster size.  Changing the ratio is a
    cutoff edit; changing the seed is salting the hashed string.
    """
    d = load_table(spark, sf_dir, "documents")
    h1 = F.substring(_doc_hash(), 1, 1)
    return d.select(
        "doc_id",
        "lang",
        F.when(h1 < "c", "train").when(h1 < "e", "val").otherwise("test").alias("split"),
    )


@_register(
    "curation_funnel",
    """
    WITH q AS (
        SELECT doc_id, lang, text,
               len(string_split_regex(trim(text), '\\s+')) AS n_tok,
               md5(lower(trim(text))) AS chash,
               ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                  ORDER BY doc_id) AS rn
        FROM documents),
    s1 AS (SELECT * FROM q),
    s2 AS (SELECT * FROM s1 WHERE lang IN ('en', 'de', 'fr', 'es')),
    s3 AS (SELECT * FROM s2 WHERE n_tok BETWEEN 10 AND 100000),
    s4 AS (SELECT * FROM s3 WHERE rn = 1)
    SELECT 1 AS stage, 'total'        AS name, COUNT(*) AS n_docs FROM s1
    UNION ALL
    SELECT 2, 'lang_filter',    COUNT(*) FROM s2
    UNION ALL
    SELECT 3, 'length_filter',  COUNT(*) FROM s3
    UNION ALL
    SELECT 4, 'exact_dedup',    COUNT(*) FROM s4
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel report: how many documents survive each stage
    (lang allowlist → length gate → exact dedup).  One pass computes all
    stage predicates as columns, then a single aggregation counts every
    stage with conditional sums — no per-stage re-scan of the corpus,
    which is the difference between 1× and 4× I/O at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    flags = d.select(
        F.col("lang").isin("en", "de", "fr", "es").alias("lang_ok"),
        TX.token_count("text").between(10, 100000).alias("len_ok"),
        (F.row_number().over(w) == 1).alias("is_first"),
    )
    counted = flags.agg(
        F.count(F.lit(1)).alias("c1"),
        F.sum(F.col("lang_ok").cast("long")).alias("c2"),
        F.sum((F.col("lang_ok") & F.col("len_ok")).cast("long")).alias("c3"),
        F.sum((F.col("lang_ok") & F.col("len_ok") & F.col("is_first")).cast("long")).alias("c4"),
    )
    stages = F.array(
        F.struct(F.lit(1).alias("stage"), F.lit("total").alias("name"), F.col("c1").alias("n_docs")),
        F.struct(F.lit(2).alias("stage"), F.lit("lang_filter").alias("name"), F.col("c2").alias("n_docs")),
        F.struct(F.lit(3).alias("stage"), F.lit("length_filter").alias("name"), F.col("c3").alias("n_docs")),
        F.struct(F.lit(4).alias("stage"), F.lit("exact_dedup").alias("name"), F.col("c4").alias("n_docs")),
    )
    return counted.select(F.explode(stages).alias("s")).select("s.stage", "s.name", "s.n_docs")
