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

from dffoo_data_pipeline_spark.functions import numeric as N
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


def _salted_topk(
    df: DataFrame,
    stratum_col: str,
    k: int,
    order_cols,
    rank_name: str,
    salt_buckets: int = 64,
) -> DataFrame:
    """Skew-safe top-k per stratum under a caller-supplied TOTAL order.

    Scale: a single window over the stratum would funnel a hot stratum
    through ONE reducer — a 100 TB mega-domain or a 5-language corpus
    both hit this.  Two-phase instead: per-(stratum, salt) local top-k
    bounds every task at k rows out, then the global top-k runs over ≤
    salt_buckets·k survivors per stratum.  Identical result to the
    direct window (a row in the global top-k is necessarily in its salt
    bucket's top-k), one extra cheap shuffle.  `order_cols` must be a
    total order (include a unique tiebreak) or ranks are
    nondeterministic.
    """
    salted = df.withColumn("__salt", F.pmod("doc_id", F.lit(salt_buckets)))
    w1 = Window.partitionBy(stratum_col, "__salt").orderBy(*order_cols)
    stage1 = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(stratum_col).orderBy(*order_cols)
    return stage1.withColumn(rank_name, F.row_number().over(w2)).where(
        F.col(rank_name) <= k
    )


def stratified_topk(
    df: DataFrame,
    stratum_col: str,
    k: int,
    salt_buckets: int = 64,
) -> DataFrame:
    """Deterministic k-per-stratum sample: the k docs with the smallest
    md5(doc_id) per stratum (hash order ≈ uniform random, but stable and
    engine-independent).  Skew-safety via _salted_topk."""
    with_h = df.select("*", _doc_hash().alias("__h"))
    return _salted_topk(
        with_h,
        stratum_col,
        k,
        order_cols=[F.col("__h"), F.col("doc_id")],
        rank_name="sample_rank",
        salt_buckets=salt_buckets,
    ).drop("__h")


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


def source_caps(
    df: DataFrame,
    stratum_col: str,
    cap: int,
    salt_buckets: int = 64,
) -> DataFrame:
    """Per-source document cap, quality-prioritized: keep at most `cap`
    docs per source, preferring higher quality_score (ties broken on
    doc_id) — the domain-cap every crawl-derived corpus applies so one
    boilerplate-heavy domain cannot dominate the training mixture.
    Skew-safety via _salted_topk (a direct per-source window would
    funnel a 100 TB mega-domain through ONE reducer).

    The token array is staged once and passed into quality_score —
    the bare form re-inlines the interpreted split ~3× per row
    (functions/text.py's own warning), tripling the dominant per-row
    cost of a full-corpus scan.
    """
    staged = df.select("*", TX.tokens("text").alias("__toks"))
    with_q = staged.select(
        "*", TX.quality_score("text", toks=F.col("__toks")).alias("__q")
    ).drop("__toks")
    return (
        _salted_topk(
            with_q,
            stratum_col,
            cap,
            order_cols=[F.desc("__q"), F.col("doc_id")],
            rank_name="keep_rank",
            salt_buckets=salt_buckets,
        )
        .withColumnRenamed("__q", "quality")
    )


def _source_caps_sql(cap: int) -> str:
    from dffoo_data_pipeline_spark.functions.text import quality_score_sql

    return f"""
    SELECT doc_id, source, quality, keep_rank FROM (
        SELECT doc_id, source,
               {quality_score_sql("text")} AS quality,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY {quality_score_sql("text")} DESC, doc_id)
                 AS keep_rank
        FROM documents)
    WHERE keep_rank <= {cap}
    """


@_register("curation_source_caps", _source_caps_sql(15))
def curation_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the 15 best-quality docs per source (deterministic ties on
    doc_id) — the per-domain cap stage of a crawl-curation pipeline,
    executed skew-safe (salted two-phase top-k, no single-reducer
    domain funnels)."""
    d = load_table(spark, sf_dir, "documents")
    return source_caps(d, "source", cap=15).select(
        "doc_id", "source", "quality", "keep_rank"
    )


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
               len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS n_tok,
               md5(lower(trim(text))) AS chash
        FROM documents),
    s1 AS (SELECT * FROM q),
    s2 AS (SELECT * FROM s1 WHERE lang IN ('en', 'de', 'fr', 'es')),
    s3 AS (SELECT * FROM s2 WHERE n_tok BETWEEN 10 AND 100000),
    s4 AS (SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY chash
                                         ORDER BY doc_id) AS rn
            FROM s3) WHERE rn = 1)
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

    The dedup stage ranks among STAGE-3 SURVIVORS, not the full corpus
    (r10 self-review): the funnel is sequential, so a doc whose only
    earlier-doc_id duplicate was itself removed by the lang/length
    gates must survive stage 4 — ranking pre-filter would drop it and
    understate survivors (the sibling curation_e2e_corpus already
    dedups post-gate; the synthetic corpus has no duplicate-content
    groups, so the oracle never exercised the difference).  Expressed
    as min(doc_id) over the content partition among gated rows — an
    unordered window, still one pass.
    """
    d = load_table(spark, sf_dir, "documents")
    wch = Window.partitionBy(F.md5(F.lower(F.trim("text"))))
    lang_ok = F.col("lang").isin("en", "de", "fr", "es")
    len_ok = TX.token_count("text").between(10, 100000)
    gated = lang_ok & len_ok
    first_gated = F.min(F.when(gated, F.col("doc_id"))).over(wch)
    flags = d.select(
        lang_ok.alias("lang_ok"),
        len_ok.alias("len_ok"),
        (gated & (F.col("doc_id") == first_gated)).alias("is_first"),
    )
    counted = flags.agg(
        F.count(F.lit(1)).alias("c1"),
        F.sum(F.col("lang_ok").cast("long")).alias("c2"),
        F.sum((F.col("lang_ok") & F.col("len_ok")).cast("long")).alias("c3"),
        F.sum(F.col("is_first").cast("long")).alias("c4"),
    )
    stages = F.array(
        F.struct(F.lit(1).alias("stage"), F.lit("total").alias("name"), F.col("c1").alias("n_docs")),
        F.struct(F.lit(2).alias("stage"), F.lit("lang_filter").alias("name"), F.col("c2").alias("n_docs")),
        F.struct(F.lit(3).alias("stage"), F.lit("length_filter").alias("name"), F.col("c3").alias("n_docs")),
        F.struct(F.lit(4).alias("stage"), F.lit("exact_dedup").alias("name"), F.col("c4").alias("n_docs")),
    )
    return counted.select(F.explode(stages).alias("s")).select("s.stage", "s.name", "s.n_docs")


_TEMPORAL_SPLIT_SQL = """
WITH cuts AS (
    SELECT quantile_cont(epoch_us(ts), 0.8) AS c80,
           quantile_cont(epoch_us(ts), 0.9) AS c90
    FROM events),
tagged AS (
    SELECT e.user_id,
           CASE WHEN epoch_us(e.ts) <= c.c80 THEN 'train'
                WHEN epoch_us(e.ts) <= c.c90 THEN 'val'
                ELSE 'test' END AS split
    FROM events e CROSS JOIN cuts c),
per_user AS (
    SELECT user_id,
           SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
           SUM(CASE WHEN split = 'val'   THEN 1 ELSE 0 END) AS n_val,
           SUM(CASE WHEN split = 'test'  THEN 1 ELSE 0 END) AS n_test
    FROM tagged GROUP BY user_id)
SELECT 'train' AS split,
       CAST(SUM(n_train) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (n_train > 0) AS BIGINT) AS n_users,
       CAST(COUNT(*) FILTER (n_train > 0) AS BIGINT) AS n_users_seen_in_train
FROM per_user
UNION ALL
SELECT 'val',
       CAST(SUM(n_val) AS BIGINT),
       CAST(COUNT(*) FILTER (n_val > 0) AS BIGINT),
       CAST(COUNT(*) FILTER (n_val > 0 AND n_train > 0) AS BIGINT)
FROM per_user
UNION ALL
SELECT 'test',
       CAST(SUM(n_test) AS BIGINT),
       CAST(COUNT(*) FILTER (n_test > 0) AS BIGINT),
       CAST(COUNT(*) FILTER (n_test > 0 AND n_train > 0) AS BIGINT)
FROM per_user
"""


@_register("curation_temporal_split", _TEMPORAL_SPLIT_SQL)
def curation_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/val/test split (80/10/10 by exact time quantile)
    with a leakage report: events up to the 0.8 time quantile are train,
    up to 0.9 val, rest test — the split you must use when the model will
    be evaluated on the FUTURE — plus, per split, how many of its users
    also appear in train (entity overlap is the leakage a purely temporal
    split does not remove; a stricter pipeline would drop those users).

    Scale: the cut table is one broadcast row (exact `percentile` here;
    `approx_percentile` at unbounded scale); tagging is map-side; the
    per-user flag table shuffles once on user_id and every split-level
    number reduces from it with map-side partials.  Consistent `<=`
    comparisons keep boundary events in the same split in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    cuts = e.agg(
        F.expr("percentile(unix_micros(ts), array(0.8, 0.9))").alias("cs")
    ).select(F.col("cs")[0].alias("c80"), F.col("cs")[1].alias("c90"))
    tagged = e.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        F.when(us <= F.col("c80"), "train")
        .when(us <= F.col("c90"), "val")
        .otherwise("test")
        .alias("split"),
    )
    per_user = tagged.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("split") == s, 1).otherwise(0)).alias(f"n_{s}")
            for s in ("train", "val", "test")
        ]
    )
    n = {s: F.col(f"n_{s}") for s in ("train", "val", "test")}
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    one = per_user.agg(
        *[F.sum(n[s]).cast("bigint").alias(f"{s}_events") for s in n],
        *[cnt(n[s] > 0).alias(f"{s}_users") for s in n],
        cnt((n["val"] > 0) & (n["train"] > 0)).alias("val_in_train"),
        cnt((n["test"] > 0) & (n["train"] > 0)).alias("test_in_train"),
    )
    rows = F.array(
        F.struct(
            F.lit("train").alias("split"),
            F.col("train_events").alias("n_events"),
            F.col("train_users").alias("n_users"),
            F.col("train_users").alias("n_users_seen_in_train"),
        ),
        F.struct(
            F.lit("val").alias("split"),
            F.col("val_events").alias("n_events"),
            F.col("val_users").alias("n_users"),
            F.col("val_in_train").alias("n_users_seen_in_train"),
        ),
        F.struct(
            F.lit("test").alias("split"),
            F.col("test_events").alias("n_events"),
            F.col("test_users").alias("n_users"),
            F.col("test_in_train").alias("n_users_seen_in_train"),
        ),
    )
    return one.select(F.inline(rows))


def _e2e_sql() -> str:
    from dffoo_data_pipeline_spark.functions.text import quality_score_sql

    return rf"""
WITH scored AS (
    SELECT doc_id, lang, n_chars,
           len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS n_tok,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
           {quality_score_sql('text')} AS quality
    FROM documents),
gated AS (SELECT * FROM scored WHERE quality >= 0.5),
deduped AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM gated)
    WHERE rn = 1),
cuts AS (
    SELECT lang,
           FLOOR(quantile_cont(n_chars, 0.99) * 1000000 + 0.5) / 1000000 AS p99
    FROM deduped GROUP BY lang),
kept AS (
    SELECT d.* FROM deduped d JOIN cuts c USING (lang)
    WHERE CAST(d.n_chars AS DOUBLE) <= c.p99),
split AS (
    SELECT lang, n_tok,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                ELSE 'test' END AS split
    FROM kept)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM split GROUP BY split, lang
"""


@_register("curation_e2e_corpus", _e2e_sql())
def curation_e2e_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation pipeline in one plan — the composite a
    team migrating from the reference would actually run nightly:

      1. score: token count + heuristic quality per document
      2. gate: drop quality < 0.5
      3. exact dedup: keep the lowest doc_id per content fingerprint
      4. length gate: drop docs above their language's p99 (computed on
         the POST-dedup corpus, so boilerplate floods can't move the cut)
      5. split: deterministic hash-of-id train/val/test assignment
      6. report: docs + tokens per (split, lang) — the artifact a
         training run consumes as its data card.

    Scale: stage 3 is one shuffle on fp (content-hash keys are uniform —
    no skew); stage 4's cut table is |langs| rows broadcast back; every
    other stage is map-side.  The report shuffle is (split, lang) —
    bounded.  Stages 1-3 compose into one Catalyst plan (the scan is
    shared, filters push into it); the post-dedup frame — four narrow
    columns — is the single stage boundary, checkpointed so the p99 cut
    table and the length gate share one evaluation instead of each
    re-running the pipeline (contrast with the reference's staged CSV
    temp files, web_scraper.py's per-stage outputs).
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    staged = d.select(
        "doc_id",
        "lang",
        "n_chars",
        "text",
        TX.tokens("text").alias("__toks"),
    )
    scored = staged.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size("__toks").alias("n_tok"),
        TX.fingerprint_md5("text").alias("fp"),
        TX.quality_score_from_parts(
            F.size("__toks"), TX.avg_token_len("text", toks=F.col("__toks")), "text"
        ).alias("quality"),
    )
    gated = scored.where(F.col("quality") >= 0.5)
    w = Window.partitionBy("fp").orderBy("doc_id")
    # checkpoint the NARROW post-dedup frame: its two consumers (the p99
    # cut table and the length gate) otherwise each re-ran the whole
    # scan→tokenize→quality→window-dedup pipeline (the r12 before-plan
    # is two identical full-pipeline branches — 2 scans, 2 window
    # dedups).  Only the four columns the tail needs are materialized.
    deduped = (
        gated.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars", "n_tok")
        .localCheckpoint(eager=False)
    )
    from dffoo_data_pipeline_spark.functions.numeric import round_det

    cuts = deduped.groupBy("lang").agg(
        round_det(F.expr("percentile(n_chars, 0.99)"), 6).alias("p99")
    )
    kept = deduped.join(F.broadcast(cuts), "lang").where(
        F.col("n_chars").cast("double") <= F.col("p99")
    )
    h1 = F.substring(_doc_hash(), 1, 1)
    split = F.when(h1 < "c", "train").when(h1 < "e", "val").otherwise("test")
    return (
        kept.select("lang", "n_tok", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split (near-dup clusters move atomically)
# ---------------------------------------------------------------------------

_LEAKAGE_SPLIT_ORACLE = r"""
WITH RECURSIVE
toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), t -> t <> '') AS t
    FROM documents
),
shingles AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
    FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS isect
    FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
pairs AS (
    SELECT i.a, i.b FROM inter i
    JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
    WHERE i.isect * 1.0 / (sa.sz + sb.sz - i.isect) >= 0.6
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
reach(id, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
clusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
       CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
            WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
            ELSE 'test' END AS split
FROM clusters
"""


@_register("curation_leakage_safe_split", _LEAKAGE_SPLIT_ORACLE)
def curation_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment that near-dup ANALYSIS can't leak
    through: hash the near-dup CLUSTER id, not the doc id, so every
    member of a paraphrase/near-copy cluster lands in the same split.
    `curation_split_assign`'s per-doc hash is correct only AFTER perfect
    dedup — any surviving near-dup pair straddling train/test silently
    inflates eval (the contamination failure mode
    text_contamination_overlap measures after the fact; this op prevents
    it structurally).

    Plan: exact Jaccard pairs at the threshold via the LOSSLESS
    prefix-filter all-pairs plan (operators/dedup.py:prefix_filter_pairs
    — at corpus scale the same decision runs over MinHash-LSH
    candidates) → connected components (operators/graph.py iterative
    min-label propagation, lineage-checkpointed) → md5-of-cluster-id
    split, the same join-free deterministic draw as the other curation
    ops.  Singleton docs are their own cluster (cluster_id = doc_id), so
    ratios converge to the 75/12.5/12.5 cuts as dedup removes mass.

    r13: the pair generator was `ngram_jaccard_pairs` — full posting
    lists over EVERY shingle, whose hot-shingle combos made this the
    4th-worst sf1 scaler (28.4 s cold).  `prefix_filter_pairs` emits the
    IDENTICAL pair set at the threshold (Bayardo/Chaudhuri losslessness;
    pinned equal on this corpus by
    tests/test_dedup.py::test_prefix_filter_lossless_and_hot_shingle_safe
    and the 0.6-threshold twin below it) while indexing only each doc's
    rarest ``|x| − ⌈t|x|⌉ + 1`` shingles — hot boilerplate shingles never
    enter a posting list.  Float-ceil note: 0.6's double is strictly
    below the rational 0.6, so ⌈t·sz⌉ can only round DOWN to the exact
    value — the prefix can only lengthen, keeping the filter lossless;
    verification is exact Jaccard either way.
    """
    from dffoo_data_pipeline_spark.operators import dedup
    from dffoo_data_pipeline_spark.operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.prefix_filter_pairs(d, id_col="doc_id", text_col="text", n=3, threshold=0.6)
    # raise, not warn: a PARTIAL cluster id here scatters one near-dup
    # cluster across train and test — exactly the leakage this split
    # exists to prevent, so non-convergence must abort, not degrade
    clusters = connected_components(
        d.select("doc_id"), pairs, id_col="doc_id", src_col="doc_a", dst_col="doc_b",
        on_nonconvergence="raise",
    )
    h1 = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 1)
    return clusters.select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        F.when(h1 < "c", "train").when(h1 < "e", "val").otherwise("test").alias("split"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_K_ANON_K = 10

_K_ANON_ORACLE = f"""
WITH cells AS (
    SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS k
    FROM customer
    GROUP BY c_nationkey, c_mktsegment),
gen AS (
    SELECT c_nationkey, CAST(SUM(k) AS BIGINT) AS k_generalized
    FROM cells GROUP BY c_nationkey)
SELECT c.c_nationkey, c.c_mktsegment, c.k,
       c.k < {_K_ANON_K} AS at_risk,
       g.k_generalized,
       g.k_generalized < {_K_ANON_K} AS still_at_risk
FROM cells c JOIN gen g USING (c_nationkey)
"""


@_register("curation_k_anonymity", _K_ANON_ORACLE)
def curation_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002 — public) over the quasi-identifier
    pair (nation, market segment): a released row is re-identifiable when
    its QI cell holds fewer than k=10 individuals.  Emits per-cell k, the
    at-risk flag, and the k after generalizing the finer QI away
    (segment → ANY) — the first remediation every privacy review tries.
    `curation_pii_redaction` scrubs direct identifiers; this measures the
    indirect ones redaction can't touch.

    Scale: two cheap aggregations — the cell count shuffles on the QI
    pair (bounded cardinality: |nations|×|segments|), the generalized
    count is a re-agg of the CELL table (125 rows), not a second scan of
    the population.  All counts BIGINT — no float anywhere.
    """
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    gen = cells.groupBy("c_nationkey").agg(
        F.sum("k").cast("bigint").alias("k_generalized")
    )
    return (
        cells.join(F.broadcast(gen), "c_nationkey")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            (F.col("k") < _K_ANON_K).alias("at_risk"),
            "k_generalized",
            (F.col("k_generalized") < _K_ANON_K).alias("still_at_risk"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing weights
# ---------------------------------------------------------------------------

_MIX_TEMP_BUDGET = 1_000_000  # token budget the quotas are scaled to

_MIX_TEMP_ORACLE = f"""
WITH per_source AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> ''))) AS BIGINT)
             AS n_tokens
    FROM documents GROUP BY source),
sq AS (
    SELECT *,
           CAST(FLOOR(sqrt(n_tokens) * 1000000 + 0.5) AS DECIMAL(18,0)) AS sq6
    FROM per_source),
tot AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
           SUM(sq6) AS tot_sq6
    FROM sq)
SELECT s.source, s.n_docs, s.n_tokens,
       FLOOR((s.n_tokens * 1.0 / t.tot_tokens) * 1000000 + 0.5) / 1000000
         AS p_raw,
       FLOOR((s.sq6 / t.tot_sq6) * 1000000 + 0.5) / 1000000 AS p_temp,
       CAST(FLOOR({_MIX_TEMP_BUDGET} * (FLOOR((s.sq6 / t.tot_sq6) * 1000000 + 0.5)
                                        / 1000000)) AS BIGINT) AS quota_tokens
FROM sq s CROSS JOIN tot t
"""


@_register("curation_mix_temperature", _MIX_TEMP_ORACLE)
def curation_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the T=2 / α=0.5 upsampling rule
    from public multilingual recipes — mT5, XLM-R): sampling weight
    p_i ∝ n_tokens_i^(1/2) instead of raw share, boosting small sources
    without letting any dominate.  Emits raw vs temperature share plus
    the token quota each source gets out of a 1M-token budget —
    `curation_weighted_mix` consumes exactly these weights.

    Scale: one agg over documents shuffled on `source` (bounded
    cardinality), then arithmetic over the tiny per-source table; the
    global totals come from re-aggregating THAT table, never a second
    corpus scan (the one-row totals frame joins back as a broadcast
    nested-loop — the sanctioned global-scalar shape).  Cross-engine
    float rule: sqrt is a single correctly-rounded IEEE op on an exact
    BIGINT, rounded to 6dp and summed as DECIMAL so partition order
    can't move the total; every emitted ratio goes through round_det.
    """
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(TX.token_count("text")).cast("bigint").alias("n_tokens"),
    )
    sq = per_source.withColumn(
        "sq6",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000 + 0.5)
        .cast("decimal(18,0)"),
    )
    tot = sq.agg(
        F.sum("n_tokens").cast("bigint").alias("tot_tokens"),
        F.sum("sq6").alias("tot_sq6"),
    )
    from dffoo_data_pipeline_spark.functions import numeric as N

    p_temp = N.round_det(F.col("sq6").cast("double") / F.col("tot_sq6").cast("double"), 6)
    return sq.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        N.round_det(F.col("n_tokens") / F.col("tot_tokens"), 6).alias("p_raw"),
        p_temp.alias("p_temp"),
        F.floor(F.lit(_MIX_TEMP_BUDGET) * p_temp).cast("bigint").alias("quota_tokens"),
    )


# ---------------------------------------------------------------------------
# DP-style noisy release (seeded Laplace — reproducible, oracle-checkable)
# ---------------------------------------------------------------------------

_DP_B = 5.0  # Laplace scale b = sensitivity/ε = 1/0.2

_DP_HEX = "0123456789abcdef"
_DP_RELEASE_ORACLE = rf"""
WITH per_source AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source),
seeded AS (
    SELECT source, n_docs, md5(source) AS h FROM per_source),
unif AS (
    SELECT source, n_docs,
           ({" + ".join(
               f"(strpos('{_DP_HEX}', substr(h, {i+1}, 1)) - 1) / {16**(i+1)}.0"
               for i in range(8)
           )} + {0.5 / 16**8}) AS u
    FROM seeded),
noise AS (
    SELECT source, n_docs,
           FLOOR(({_DP_B} * (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                  * ln(GREATEST(1.0 - 2.0 * abs(u - 0.5), 1e-12)) * -1.0)
                 * 10000 + 0.5) / 10000 AS lap
    FROM unif)
SELECT source, n_docs, lap AS noise,
       CAST(GREATEST(FLOOR(n_docs + lap + 0.5), 0) AS BIGINT) AS released_n_docs
FROM noise
"""


@_register("curation_dp_release", _DP_RELEASE_ORACLE)
def curation_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Dwork et al. 2006 — public):
    per-source doc counts + Laplace(b=5) noise (sensitivity 1, ε=0.2) —
    the mechanism for publishing corpus composition stats without
    revealing any single document's membership.

    The noise draw is SEEDED, not sampled: the uniform comes from the
    first 8 hex digits of md5(source) (the same deterministic-draw trick
    as every curation op — swap the seed by salting the hashed string),
    pushed through the Laplace inverse CDF.  A production release uses a
    fresh RNG; the seeded form is what you want for reproducible
    pipeline tests, and it makes the whole mechanism oracle-checkable.
    Each 16^-i weight is an exact binary double, so u is bit-identical
    across engines; the one transcendental (ln) is rounded at 1e-4
    before adding to the BIGINT count (same discipline as
    text_unigram_logprob's log).

    Scale: one agg shuffled on `source` (bounded cardinality) + per-row
    arithmetic on the tiny per-source table.  Released counts clamp at 0.
    """
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    h = F.md5("source")
    u = sum(
        [
            (F.instr(F.lit(_DP_HEX), F.substring(h, i + 1, 1)) - 1) / F.lit(float(16 ** (i + 1)))
            for i in range(8)
        ],
        start=F.lit(0.5 / 16**8),
    )
    sgn = F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    lap = N.round_det(
        F.lit(_DP_B) * sgn * F.log(F.greatest(1.0 - 2.0 * F.abs(u - 0.5), F.lit(1e-12))) * -1.0,
        4,
    )
    out = per_source.select("source", "n_docs", lap.alias("noise"))
    return out.select(
        "source",
        "n_docs",
        "noise",
        F.greatest(F.floor(F.col("n_docs") + F.col("noise") + 0.5), F.lit(0))
        .cast("bigint")
        .alias("released_n_docs"),
    )


# ---------------------------------------------------------------------------
# Epoch/repetition mixing planner
# ---------------------------------------------------------------------------

MAX_EPOCHS = 4  # repetition cap per source (data-repetition hygiene)
_BUDGET_X = 2  # token budget = 2x the corpus (forces some sources past 1 epoch)

_EPOCH_MIX_ORACLE = rf"""
WITH avail AS (
    SELECT source,
           CAST(SUM(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''))) AS BIGINT)
             AS avail_tokens,
           CAST(10 + (('0x' || substr(md5(source), 1, 8))::BIGINT) % 41 AS BIGINT)
             AS priority
    FROM documents GROUP BY source),
tot AS (
    SELECT CAST(SUM(avail_tokens) AS BIGINT) AS tot_tokens,
           CAST(SUM(priority) AS BIGINT) AS sum_p
    FROM avail),
plan AS (
    SELECT source, avail_tokens, priority,
           ({_BUDGET_X} * tot_tokens) * priority // sum_p AS ideal_tokens
    FROM avail CROSS JOIN tot)
SELECT source, avail_tokens, priority, ideal_tokens,
       LEAST(ideal_tokens, {MAX_EPOCHS} * avail_tokens) AS planned_tokens,
       LEAST(ideal_tokens, {MAX_EPOCHS} * avail_tokens) * 1000 // avail_tokens
         AS epochs_milli
FROM plan
"""


@_register("curation_epoch_mix", _EPOCH_MIX_ORACLE)
def curation_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition schedule per source — the "how many epochs of each
    source" table of an LLM data-mixing plan: each source gets a token
    allocation proportional to its priority weight under a total budget
    of 2x the corpus, CAPPED at MAX_EPOCHS passes over what the source
    actually has (repeating a small high-priority source more than ~4
    epochs measurably hurts, so the cap is a first-class constraint,
    not a footnote).  epochs_milli = planned/available in exact
    milli-epochs.  Priorities here are a deterministic md5 stand-in in
    [10, 50]; a real run joins curated weights (e.g. the output of
    curation_mix_temperature) through the identical plan.

    Scale: one corpus aggregation to (source, token count) — map-side
    combined, |sources| rows survive — then pure integer arithmetic on
    the source dim (broadcast totals); nothing else touches the corpus.
    Integer floor division throughout makes the plan bit-identical
    across engines with no float tolerance.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    avail = d.groupBy("source").agg(
        F.sum(TX.token_count("text")).cast("bigint").alias("avail_tokens"),
        (
            10 + F.conv(F.substring(F.md5(F.first("source")), 1, 8), 16, 10).cast("long") % 41
        ).alias("priority"),
    )
    tot = avail.agg(
        F.sum("avail_tokens").cast("bigint").alias("tot_tokens"),
        F.sum("priority").cast("bigint").alias("sum_p"),
    )
    plan = avail.crossJoin(F.broadcast(tot)).select(
        "source",
        "avail_tokens",
        "priority",
        F.expr(f"({_BUDGET_X} * tot_tokens) * priority div sum_p").alias("ideal_tokens"),
    )
    planned = F.least(F.col("ideal_tokens"), MAX_EPOCHS * F.col("avail_tokens"))
    return plan.select(
        "source",
        "avail_tokens",
        "priority",
        "ideal_tokens",
        planned.alias("planned_tokens"),
        F.expr(
            f"least(ideal_tokens, {MAX_EPOCHS} * avail_tokens) * 1000 div avail_tokens"
        ).alias("epochs_milli"),
    )


_NEG_K = 4       # negatives kept per anchor
_NEG_DRAWS = 8   # seeded draws per anchor (extras absorb rejections)

_NEG_ORACLE = f"""
WITH m AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
anchors AS (
    SELECT doc_id AS anchor_id, source AS anchor_source, m.m
    FROM documents CROSS JOIN m WHERE doc_id % 10 = 0),
draws AS (
    SELECT a.anchor_id, a.anchor_source, u.j,
           (('0x' || substr(md5('neg:' || CAST(a.anchor_id AS VARCHAR)
                                 || ':' || CAST(u.j AS VARCHAR)), 1, 8))::BIGINT)
             % a.m AS cand
    FROM anchors a, unnest(range(1, {_NEG_DRAWS + 1})) AS u(j)),
valid AS (
    SELECT d.anchor_id, d.anchor_source, d.j,
           i.doc_id AS neg_id, i.source AS neg_source
    FROM draws d JOIN documents i ON i.doc_id = d.cand
    WHERE i.source <> d.anchor_source AND i.doc_id <> d.anchor_id),
ranked AS (
    SELECT anchor_id, anchor_source, neg_id, neg_source,
           ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY j) AS k
    FROM valid)
SELECT anchor_id, anchor_source, CAST(k AS INT) AS k, neg_id, neg_source
FROM ranked WHERE k <= {_NEG_K}
"""


@_register("curation_contrastive_negatives", _NEG_ORACLE)
def curation_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: every
    anchor document (doc_id % 10 = 0 here; in production the batch being
    trained on) gets up to 4 negatives drawn uniformly from the corpus by
    seeded md5 draws, REJECTING same-source and self candidates — the
    hard-negative hygiene rule that keeps in-batch negatives from being
    accidental positives.  8 draws absorb rejections; survivors are
    ranked by draw order so the same (anchor, k) always names the same
    negative — the reproducibility every ablation needs.

    Scale: no global windows and no positional index — candidates are
    drawn directly in id space (md5-uniform mod max_id+1, the 1-row max
    aggregate broadcast to anchors) and resolved by an equi-join on
    doc_id; draws that miss a hole in the id space simply reject, identically
    in both engines.  Work is |anchors|·8 join probes against the corpus
    (one shuffle) and a per-anchor window over ≤ 8 rows.  Determinism:
    the draw is the seeded md5-prefix integer idiom verified
    cross-engine in plans/selection.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    m = docs.agg((F.max("doc_id") + 1).alias("m"))
    anchors = (
        docs.where(F.col("doc_id") % 10 == 0)
        .select(F.col("doc_id").alias("anchor_id"), F.col("source").alias("anchor_source"))
        .crossJoin(F.broadcast(m))
    )
    draws = anchors.select(
        "anchor_id",
        "anchor_source",
        F.explode(F.sequence(F.lit(1), F.lit(_NEG_DRAWS))).alias("j"),
        "m",
    ).select(
        "anchor_id",
        "anchor_source",
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("neg:"),
                            F.col("anchor_id").cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.col("m")
        ).alias("cand"),
    )
    valid = (
        draws.join(
            docs.select(
                F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
            ),
            draws.cand == F.col("neg_id"),
        )
        .where(
            (F.col("neg_source") != F.col("anchor_source"))
            & (F.col("neg_id") != F.col("anchor_id"))
        )
    )
    w = Window.partitionBy("anchor_id").orderBy("j")
    return (
        valid.withColumn("k", F.row_number().over(w))
        .where(F.col("k") <= _NEG_K)
        .select(
            "anchor_id",
            "anchor_source",
            F.col("k").cast("int").alias("k"),
            "neg_id",
            "neg_source",
        )
    )


_SCALER_ORACLE = """
WITH assigned AS (
    SELECT doc_id, n_chars,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
                ELSE 'test' END AS split
    FROM documents),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS s1,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
    FROM assigned WHERE split = 'train')
SELECT a.doc_id, a.split, a.n_chars,
       FLOOR((a.n_chars - CAST(s.s1 AS DOUBLE) / s.n)
             / sqrt(CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE)
                    / (CAST(s.n AS DOUBLE) * s.n))
             * 1000000 + 0.5) / 1000000 AS z
FROM assigned a CROSS JOIN stats s
"""


@_register("curation_trainonly_scaler", _SCALER_ORACLE)
def curation_trainonly_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe feature scaling: z-score every document's length
    using mean/std fitted on the TRAIN split ONLY (the md5 split rule of
    curation_split_assign), then applied to all splits — the
    preprocessing twin of curation_leakage_safe_split.  Fitting a scaler
    on the full corpus leaks val/test statistics into training; fitting
    per split makes splits incomparable.  Train-only fit is the rule.

    Scale: the fit is a 1-row aggregate over a filtered pass (map-side
    combined), broadcast to the apply projection — the inherent
    stats-then-apply two-pass (PERF.md policy); at 100 TB the 1-row
    stats frame is persisted alongside the model, not recomputed.
    Determinism: n_chars is integer, so Σx and Σx² are EXACT DECIMALs
    (38,0 — bigint would overflow the n·Σx² product at corpus scale);
    mean and population variance are computed as quotients of exact
    integers ((n·Σx² − (Σx)²)/n² avoids the catastrophic cancellation of
    mean-of-squares in floating point); sqrt is IEEE-correctly-rounded;
    the z is floor-rounded at 1e-6.
    """
    d = load_table(spark, sf_dir, "documents")
    h1 = F.substring(_doc_hash(), 1, 1)
    assigned = d.select(
        "doc_id",
        "n_chars",
        F.when(h1 < "c", "train").when(h1 < "e", "val").otherwise("test").alias("split"),
    )
    # exact-integer sums in DECIMAL(38,0), not BIGINT: Σx² and the n·Σx²
    # − (Σx)² numerator overflow int64 at corpus scale (ANSI would raise
    # ARITHMETIC_OVERFLOW); decimal keeps the math exact with 1e38 headroom
    nc = F.col("n_chars").cast("decimal(19,0)")
    stats = (
        assigned.where(F.col("split") == "train")
        .agg(
            F.count(F.lit(1)).cast("decimal(19,0)").alias("n"),
            F.sum(nc).cast("decimal(38,0)").alias("s1"),
            F.sum(nc * nc).cast("decimal(38,0)").alias("s2"),
        )
    )
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    return assigned.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "split",
        "n_chars",
        N.round_det((F.col("n_chars") - mean) / F.sqrt(var), 6).alias("z"),
    )
