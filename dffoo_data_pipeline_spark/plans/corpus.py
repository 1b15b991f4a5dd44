"""Corpus-preparation operators: context-window chunking, token
budgeting, TF-IDF term importance, and a unigram-LM quality signal.

These are the operations a pretraining-data pipeline runs between raw
documents and a tokenized training set (reference analog: the per-blob
parse/emit loop, web_scraper.py:344-567, is the same doc→rows shape as
chunking; everything else here is the LLM-scale extension SURVEY.md §2k
calls for).  All four are pure DataFrame plans — the only Python is plan
construction; every expression is JVM-evaluated.

Cross-engine float discipline (functions/numeric.py): natural log is the
one libm call here (ln is not IEEE-correctly-rounded, unlike sqrt), so
every ln() result is immediately rounded with `round_det` at 6 places —
a last-ulp divergence between the engines' libm cannot survive that
unless it lands exactly on a 5e-7 boundary; sums of such values go
through DECIMAL so partition order can't change them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.functions import text as TX
from dffoo_data_pipeline_spark.functions.numeric import round_det
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


# ---------------------------------------------------------------------------
# Context-window chunking (doc → overlapping token-window rows)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 50
CHUNK_OVERLAP = 10
_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP

_CHUNK_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS t
    FROM documents),
starts AS (
    -- a token-less doc (empty/whitespace-only/NULL text) has nothing to
    -- chunk: zero output rows, not one degenerate empty chunk (r11)
    SELECT doc_id, t,
           unnest(range(1, greatest(len(t) - {CHUNK_OVERLAP}, 1) + 1, {_STRIDE}))
             AS start
    FROM toks WHERE len(t) > 0)
SELECT doc_id,
       CAST((start - 1) / {_STRIDE} + 1 AS BIGINT) AS chunk_no,
       CAST(len(list_slice(t, start, start + {CHUNK_TOKENS} - 1)) AS INT)
         AS n_chunk_tokens,
       array_to_string(list_slice(t, start, start + {CHUNK_TOKENS} - 1), ' ')
         AS chunk_text
FROM starts
"""


@_register("text_chunk_windows", _CHUNK_ORACLE)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into 50-token context windows with 10-token
    overlap (stride 40) — the chunking step that turns documents into
    training sequences / RAG passages.  Window starts are
    1, 41, 81, … ≤ max(n_tokens − overlap, 1), so every token is covered
    and only the final chunk may be short.

    Scale: explode of a per-row computed array — embarrassingly parallel,
    NO shuffle at all; output rows ≈ n_tokens/stride per doc.  The token
    array is materialized once per row (staged projection) and both the
    starts sequence and the slices read it.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    # token-less docs (NULL size is filtered too) produce no chunks
    staged = d.select("doc_id", TX.tokens("text").alias("t")).where(F.size("t") > 0)
    n = F.size("t")
    starts = staged.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(1), F.greatest(n - CHUNK_OVERLAP, F.lit(1)), F.lit(_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice(F.col("t"), F.col("start"), CHUNK_TOKENS)
    return starts.select(
        "doc_id",
        ((F.col("start") - 1) / _STRIDE + 1).cast("bigint").alias("chunk_no"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Corpus token budget (the "how many tokens do we have, where" report)
# ---------------------------------------------------------------------------

_BUDGET_ORACLE = r"""
WITH per_doc AS (
    SELECT lang, source, len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS n_tok
    FROM documents),
grouped AS (
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM per_doc GROUP BY lang, source)
SELECT lang, source, n_docs, n_tokens,
       FLOOR(CAST(n_tokens AS DOUBLE)
             / CAST(CAST(SUM(n_tokens) OVER () AS BIGINT) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS token_frac
FROM grouped
"""


@_register("corpus_token_budget", _BUDGET_ORACLE)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, source) stratum: document count, token count, and the
    stratum's fraction of all corpus tokens — the report that drives
    sampling-weight decisions (and the denominator for any token-budget
    mix like curation_weighted_mix).

    Scale: one shuffle on (lang, source) with map-side partials; the
    global total is a window over the GROUPED rows (stratum cardinality =
    langs × sources, thousands at most — the single-partition window runs
    on a tiny aggregated frame, never on the corpus).
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    grouped = (
        d.select("lang", "source", TX.token_count("text").alias("n_tok"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return grouped.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        round_det(F.col("n_tokens").cast("double") / total.cast("double"), 6).alias(
            "token_frac"
        ),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------

_TFIDF_TOPK = 3

_TFIDF_ORACLE = rf"""
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), t -> t <> ''))
             AS term
    FROM documents),
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok GROUP BY doc_id, term),
df AS (
    SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM tok GROUP BY term),
d_total AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           FLOOR(CAST(tf.tf AS DOUBLE)
                 * (ln((CAST(d.n_docs AS DOUBLE) + 1) / (CAST(df.df AS DOUBLE) + 1)) + 1)
                 * 1000000 + 0.5) / 1000000 AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN d_total d)
SELECT doc_id, term, tf, df, tfidf FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term) AS rn
    FROM scored)
WHERE rn <= {_TFIDF_TOPK}
"""


@_register("text_tfidf_top_terms", _TFIDF_ORACLE)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by smoothed TF-IDF
    (tf · (ln((D+1)/(df+1)) + 1)) — keyword extraction / topic signal for
    curation dashboards and near-dup triage.

    Scale: tf shuffles on (doc_id, term); df falls out of tf (one row
    per (doc, term)) as a plain count per term — map-side combine makes
    that aggregation skew-proof — and joins back on term.  tf is
    checkpointed at the stage boundary so the df side reads the
    materialized table instead of re-running the scan→explode→tf
    subtree; the JOIN layout stays (a window-over-term would be
    single-lineage but pins every pair of a stop-word term into ONE
    task with no recourse — unsplittable at 100 TB — while a skewed
    JOIN key is exactly what AQE skew-join splits).  df stays
    vocabulary-sized, far too big to broadcast.  D arrives via a
    one-row broadcast cross join, not a driver collect.  Ranked winner
    is deterministic: tfidf rounded at 1e-6, ties broken by term.
    """
    # no fan-out: exchange outweighs the cheap map stage (A/B at sf0.1)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(TX.tokens(TX.normalized_text("text"))).alias("term")
    )
    # checkpoint: tf feeds BOTH the df aggregation and the scoring join;
    # unshared consumers each re-ran the scan→tokenize→explode→agg
    # subtree (2 corpus tokenizations in the r12 before-plan).  The
    # materialized (doc, term, tf) table keeps the tf⋈df JOIN layout the
    # docstring defends (AQE-splittable skew) while the tokenize pass
    # runs once (guide §2.4).
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    d_total = d.agg(F.count_distinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(d_total))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            round_det(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("n_docs").cast("double") + 1)
                        / (F.col("df").cast("double") + 1)
                    )
                    + 1
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TFIDF_TOPK)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Length-outlier gate (per-language p99 filter)
# ---------------------------------------------------------------------------

_OUTLIER_ORACLE = r"""
WITH cuts AS (
    SELECT lang,
           FLOOR(quantile_cont(n_chars, 0.99) * 1000000 + 0.5) / 1000000 AS p99
    FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars, c.p99
FROM documents d JOIN cuts c USING (lang)
WHERE CAST(d.n_chars AS DOUBLE) > c.p99
"""


@_register("curation_length_outliers", _OUTLIER_ORACLE)
def curation_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-outlier gate: flag documents longer than their
    language's p99 — the distribution-relative length filter (a fixed
    global cutoff is wrong across languages with different scripts and
    tokenization densities).

    Scale: the quantile agg shuffles on lang (exact here for the oracle;
    approx_percentile at 100 TB), the cut table is |langs| rows →
    broadcast joined back, so the corpus streams through one map-side
    stage.  Cuts rounded at 1e-6 so the boundary decision is
    engine-identical.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    cuts = d.groupBy("lang").agg(
        round_det(F.expr("percentile(n_chars, 0.99)"), 6).alias("p99")
    )
    return (
        d.join(F.broadcast(cuts), "lang")
        .where(F.col("n_chars").cast("double") > F.col("p99"))
        .select("doc_id", "lang", "n_chars", "p99")
    )


# ---------------------------------------------------------------------------
# Corpus snapshot diff (versioned-dump audit)
# ---------------------------------------------------------------------------

_SNAPSHOT_DIFF_ORACLE = r"""
WITH old AS (
    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
    FROM documents WHERE doc_id % 5 <> 0),
new AS (
    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
    FROM documents WHERE doc_id % 3 <> 0)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp <> n.fp THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""


@_register("corpus_snapshot_diff", _SNAPSHOT_DIFF_ORACLE)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus audit (operators/dedup.py:
    snapshot_diff): classify every doc id as added / removed / changed /
    unchanged between two dumps so re-processing touches only
    added+changed.  Proxy snapshots here are modular slices of the same
    table (so `changed` can't fire — the operator's changed branch is
    unit-tested with genuinely differing texts in tests/test_dedup.py).

    Scale: one full-outer shuffle join on doc_id, fingerprints computed
    map-side.
    """
    from dffoo_data_pipeline_spark.operators.dedup import snapshot_diff

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return snapshot_diff(
        d.where(F.col("doc_id") % 5 != 0),
        d.where(F.col("doc_id") % 3 != 0),
    )


# ---------------------------------------------------------------------------
# Corpus-wide top n-grams (vocabulary / stopword induction)
# ---------------------------------------------------------------------------

_TOP_NGRAMS_K = 50

_TOP_NGRAMS_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), t -> t <> '') AS t
    FROM documents),
grams AS (
    SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
                                 i -> t[i] || ' ' || t[i+1])) AS gram
    FROM toks WHERE len(t) >= 2),
cnt AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS n FROM grams GROUP BY gram)
SELECT gram, n, CAST(rn AS INT) AS rank FROM (
    SELECT gram, n, ROW_NUMBER() OVER (ORDER BY n DESC, gram) AS rn FROM cnt)
WHERE rn <= {_TOP_NGRAMS_K}
"""


@_register("corpus_top_ngrams", _TOP_NGRAMS_ORACLE)
def corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-50 bigrams — vocabulary/stopword-list induction
    and the collocation signal quality filters build on.

    Scale: explode bigrams → one map-side-combined count shuffle → top-k
    via orderBy+limit (TakeOrderedAndProject per-partition heaps, no
    global sort); the rank window runs over k rows only — same shape as
    operators/skew.py:heavy_hitter_report.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    staged = d.select(TX.tokens(TX.normalized_text("text")).alias("t"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("t"), i), F.element_at(F.col("t"), i + 1)
        ),
    )
    grams = staged.where(F.size("t") >= 2).select(F.explode(bigrams).alias("gram"))
    cnt = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
    topk = cnt.orderBy(F.desc("n"), "gram").limit(_TOP_NGRAMS_K)
    w = Window.orderBy(F.desc("n"), "gram")
    return topk.withColumn("rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# Per-document language-ID (stopword-signal argmax classifier)
# ---------------------------------------------------------------------------

_LANG_SETS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
}


def _lang_ratio_sql(toks_expr: str, words: tuple) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return (
        f"FLOOR(len(list_filter({toks_expr}, x -> x IN ({in_list}))) * 1.0"
        f" / len({toks_expr}) * 10000 + 0.5) / 10000"
    )


_LANG_PREDICT_ORACLE = r"""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), t -> t <> '') AS tk
    FROM documents),
scored AS (
    SELECT doc_id,
""" + ",\n".join(
    f"           {_lang_ratio_sql('tk', ws)} AS s_{lang}" for lang, ws in _LANG_SETS.items()
) + """
    FROM t)
SELECT doc_id, s_en, s_de, s_es, s_fr,
       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS predicted_lang
FROM scored
"""


@_register("text_lang_predict", _LANG_PREDICT_ORACLE)
def text_lang_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document language-ID: stopword-hit ratio per candidate
    language, classify by argmax — the n-gram-heuristic langid step,
    taken from per-label aggregate signal (text_lang_signal) to an actual
    per-doc classifier.  Real deployments widen `_LANG_SETS` to character
    n-gram profiles; the plan (K per-row signals → fixed-precedence
    argmax ladder) is unchanged.

    Scale: pure per-row expressions, no shuffle, whole-stage codegen;
    ratios rounded at 1e-4 and ties resolved by a fixed precedence
    (en > de > es > fr), so the winner is engine-independent.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    staged = d.select("doc_id", TX.tokens(TX.normalized_text("text")).alias("tk"))
    n = F.size("tk")
    # n=0 (empty/whitespace-only doc under the non-empty-token spec)
    # must yield NULL scores like the oracle's x*1.0/0, not an ANSI
    # DIVIDE_BY_ZERO (r11 hostile-input sweep); the argmax ladder then
    # falls through every NULL comparison to the 'fr' default in both
    # engines
    scores = {
        lang: round_det(
            F.when(n > 0, F.size(F.filter(F.col("tk"), lambda x: x.isin(*ws))) / n),
            4,
        ).alias(f"s_{lang}")
        for lang, ws in _LANG_SETS.items()
    }
    scored = staged.select("doc_id", *scores.values())
    s = {lang: F.col(f"s_{lang}") for lang in _LANG_SETS}
    predicted = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en"
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return scored.select(
        "doc_id", "s_en", "s_de", "s_es", "s_fr", predicted.alias("predicted_lang")
    )


# ---------------------------------------------------------------------------
# Per-source quality dashboard
# ---------------------------------------------------------------------------

_SOURCE_REPORT_ORACLE = r"""
WITH per_doc AS (
    SELECT source,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
           len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS n_tok,
           CAST(FLOOR(((CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''))
                                  BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END
                        + CASE WHEN (FLOOR((list_sum(list_transform(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''),
                                                                    x -> length(x))) * 1.0
                                            / NULLIF(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')), 0)) * 10000 + 0.5) / 10000)
                                    BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END
                        + (1 - LEAST(FLOOR((length(regexp_replace(text, '[^.!?,;:]', '', 'g')) * 1.0
                                            / NULLIF(length(text), 0)) * 10000 + 0.5) / 10000
                                     + FLOOR((length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                                              / NULLIF(length(text), 0)) * 10000 + 0.5) / 10000, 1.0)))
                       / 3) * 10000 + 0.5) / 10000 AS DECIMAL(18,4)) AS quality
    FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       FLOOR(CAST(SUM(quality) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000
         AS avg_quality,
       FLOOR((1 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*)) * 1000000 + 0.5)
         / 1000000 AS dup_rate
FROM per_doc
GROUP BY source
"""


@_register("corpus_source_report", _SOURCE_REPORT_ORACLE)
def corpus_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: doc count, token count, mean quality
    score, and exact-duplicate rate — the single report a curation team
    reads before setting per-source sampling weights (composes
    fingerprint_md5 + token_count + quality_score in one pass).

    Scale: one shuffle on `source` (bounded cardinality); the dup rate is
    a COUNT(DISTINCT fp) per source — two-phase-safe because the
    fingerprint prefix spreads any hot source across reducers (the same
    argument as operators/skew.py:skew_safe_count_distinct); quality is
    rounded per doc then summed as DECIMAL so the mean is
    partition-order-exact.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    staged = d.select("source", "text", TX.tokens("text").alias("__toks"))
    parts = staged.select(
        "source",
        "text",
        F.size("__toks").alias("__n_tok"),
        TX.avg_token_len("text", toks=F.col("__toks")).alias("__avg_len"),
    )
    per_doc = parts.select(
        "source",
        TX.fingerprint_md5("text").alias("fp"),
        F.col("__n_tok").alias("n_tok"),
        TX.quality_score_from_parts(F.col("__n_tok"), F.col("__avg_len"), "text")
        .cast("decimal(18,4)")
        .alias("quality"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        round_det(F.sum("quality").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_quality"
        ),
        round_det(
            1 - F.count_distinct(F.col("fp")).cast("double") / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# C4-style repeated-unit (boilerplate) removal
# ---------------------------------------------------------------------------

_UNIT_N = 3
_MAX_OCC = 2

_REPEAT_REMOVAL_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), t -> t <> '') AS t
    FROM documents),
units AS (
    SELECT doc_id, i - 1 AS unit_no,
           array_to_string(list_slice(t, (i - 1) * {_UNIT_N} + 1, i * {_UNIT_N}), ' ') AS unit
    FROM toks,
         unnest(range(1, greatest(CAST(ceil(len(t) / {_UNIT_N}.0) AS BIGINT), 1) + 1)) AS u(i)),
cnt AS (SELECT unit, CAST(COUNT(*) AS BIGINT) AS c FROM units GROUP BY unit),
totals AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_units FROM units GROUP BY doc_id),
kept AS (SELECT u.doc_id, u.unit_no, u.unit
         FROM units u JOIN cnt USING (unit) WHERE cnt.c <= {_MAX_OCC}),
reasm AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
           string_agg(unit, ' ' ORDER BY unit_no) AS clean_text
    FROM kept GROUP BY doc_id)
SELECT t.doc_id, t.n_units,
       t.n_units - COALESCE(r.n_kept, 0) AS n_units_dropped,
       COALESCE(r.clean_text, '') AS clean_text
FROM totals t LEFT JOIN reasm r USING (doc_id)
"""


@_register("corpus_repeated_unit_removal", _REPEAT_REMOVAL_ORACLE)
def corpus_repeated_unit_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate scrub: drop every text unit occurring more
    than twice across the corpus, keep each document's surviving units in
    order (operators/boilerplate.py).  C4's unit is the newline-split
    line; this fixture has single-line documents, so the registered query
    uses non-overlapping 3-token windows — identical plan shape.

    Scale notes live on the operator: count shuffle with map-side
    combine, skew-safe join (not window-over-unit), positional reassembly.
    """
    from dffoo_data_pipeline_spark.operators.boilerplate import (
        remove_repeated_units,
        token_window_units,
    )

    # fan_out: the single-file test input would otherwise run the whole
    # explode+count on one task (heavy compute before the first shuffle)
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return remove_repeated_units(
        d,
        unit_fn=lambda c: token_window_units(c, _UNIT_N),
        max_occurrences=_MAX_OCC,
        # stage the exploded unit frame once (lazy localCheckpoint): its
        # two consumers otherwise re-ran the scan→tokenize→window
        # subtree (2 of the 3 documents scans in the r12 before-plan)
        stage_units=True,
    )


# ---------------------------------------------------------------------------
# Best-quality dedup survivor per near-dup cluster
# ---------------------------------------------------------------------------

_BEST_SURVIVOR_ORACLE = r"""
WITH clusters AS (
    WITH RECURSIVE
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), t -> t <> '') AS t
        FROM documents),
    shingles AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS isect
        FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id),
    pairs AS (
        SELECT i.a, i.b FROM inter i
        JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
        WHERE i.isect * 1.0 / (sa.sz + sb.sz - i.isect) >= 0.6),
    edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
),
quality AS (
    SELECT doc_id,
           FLOOR(((CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''))
                             BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END
                   + CASE WHEN (FLOOR((list_sum(list_transform(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''),
                                                               x -> length(x))) * 1.0
                                       / NULLIF(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')), 0)) * 10000 + 0.5) / 10000)
                               BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END
                   + (1 - LEAST(FLOOR((length(regexp_replace(text, '[^.!?,;:]', '', 'g')) * 1.0
                                       / NULLIF(length(text), 0)) * 10000 + 0.5) / 10000
                                + FLOOR((length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                                         / NULLIF(length(text), 0)) * 10000 + 0.5) / 10000, 1.0)))
                  / 3) * 10000 + 0.5) / 10000 AS quality
    FROM documents)
SELECT cluster_id, doc_id AS survivor_id, quality AS survivor_quality,
       cluster_size
FROM (
    SELECT c.cluster_id, c.doc_id, q.quality,
           CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS cluster_size,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY q.quality DESC, c.doc_id) AS rn
    FROM clusters c JOIN quality q USING (doc_id))
WHERE rn = 1
"""


@_register("dedup_best_survivor", _BEST_SURVIVOR_ORACLE)
def dedup_best_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection: within each transitive
    near-dup cluster (≥0.6 Jaccard connected components), keep the
    HIGHEST-quality document rather than the first-seen one — what a real
    curation pipeline ships (keep-first discards the clean copy whenever
    the boilerplate-laden copy sorts earlier).

    Scale: clusters come from the linear-candidate path + iterative
    min-label propagation (operators/graph.py); quality is a per-row
    expression; the pick is one window over (cluster_id) — cluster
    cardinality is bounded by the dedup threshold, no global sort.
    Deterministic: quality rounded at 1e-4, doc_id tiebreak.
    """
    from dffoo_data_pipeline_spark.operators import dedup as D
    from dffoo_data_pipeline_spark.operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    pairs = D.ngram_jaccard_pairs(d, id_col="doc_id", text_col="text", n=3, threshold=0.6)
    clusters = connected_components(
        d.select("doc_id"), pairs, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    ).select(F.col("id").alias("doc_id"), "cluster_id")

    staged = d.select("doc_id", "text", TX.tokens("text").alias("__toks"))
    quality = staged.select(
        "doc_id",
        TX.quality_score_from_parts(
            F.size("__toks"),
            TX.avg_token_len("text", toks=F.col("__toks")),
            "text",
        ).alias("quality"),
    )
    joined = clusters.join(quality, "doc_id")
    w = Window.partitionBy("cluster_id")
    wr = w.orderBy(F.desc("quality"), "doc_id")
    return (
        joined.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("survivor_id"),
            F.col("quality").alias("survivor_quality"),
            "cluster_size",
        )
    )


# ---------------------------------------------------------------------------
# Token-budget-constrained sampling per source
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 500

_BUDGET_FILL_ORACLE = rf"""
WITH t AS (
    SELECT source, doc_id,
           len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')) AS n_tok,
           md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents),
c AS (
    SELECT source, doc_id, n_tok,
           CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_tokens
    FROM t)
SELECT source, doc_id, n_tok, cum_tokens
FROM c WHERE cum_tokens - n_tok < {_BUDGET_TOKENS}
"""


@_register("curation_token_budget_fill", _BUDGET_FILL_ORACLE)
def curation_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained sampling: fill each source's quota of
    500 (`_BUDGET_TOKENS`) training tokens by deterministic hash order —
    the op that turns
    'mix 30% source A, 70% source B' weights into an actual bounded
    document pick, stable as the corpus grows (hash order, not
    row_number over arrival order).  A doc that straddles the budget
    boundary is included (cum BEFORE it is under budget), so every quota
    is met, never silently under-filled.

    Scale: one shuffle on source + an in-partition ordered cumulative
    sum — same shape as sessionization; no global sort, no collect.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    t = d.select(
        "source",
        "doc_id",
        TX.token_count("text").alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = t.withColumn("cum_tokens", F.sum("n_tok").over(w).cast("bigint"))
    return c.where(F.col("cum_tokens") - F.col("n_tok") < _BUDGET_TOKENS).select(
        "source", "doc_id", "n_tok", "cum_tokens"
    )


# ---------------------------------------------------------------------------
# Unigram-LM log-probability (CCNet-style LM quality proxy)
# ---------------------------------------------------------------------------

_UNIGRAM_ORACLE = r"""
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '), t -> t <> ''))
             AS tok
    FROM documents),
freq AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY tok),
n_total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM freq),
logp AS (
    SELECT tok,
           CAST(FLOOR(ln(CAST(cnt AS DOUBLE) / CAST(n.n AS DOUBLE)) * 1000000 + 0.5)
                / 1000000 AS DECIMAL(18,6)) AS lp
    FROM freq CROSS JOIN n_total n)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       FLOOR(CAST(SUM(l.lp) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000
         AS avg_logprob
FROM tok t JOIN logp l USING (tok)
GROUP BY t.doc_id
"""


@_register("text_unigram_logprob", _UNIGRAM_ORACLE)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the cheap stand-in for the LM-perplexity quality filter
    (CCNet / Gopher style): gibberish and boilerplate score far from the
    corpus mean.  An external frozen vocabulary would be a drop-in
    replacement for `freq`.

    Scale: ONE explode feeds a (doc, tok) term-frequency aggregation;
    the vocab frequency table falls out of tf with a skew-proof
    map-side-combined shuffle, and scoring joins DISTINCT (doc, tok)
    pairs weighted by tf rather than touching every instance.  tf is
    checkpointed at the stage boundary so the freq side reads the
    materialized table instead of recomputing the scan→explode→tf
    subtree; the JOIN layout stays (the single-lineage alternative — a
    SUM over a tok window — pins every pair of a stop-word token into
    one unsplittable task, while a skewed join partition is what AQE
    skew-join splits).  The total-token denominator
    is the SUM of the vocab counts — a window over the vocab-sized freq
    frame, not another scan of documents.  Determinism: each ln() is rounded
    at 1e-6 (`round_det`'s floor form is mode-independent for negatives
    too) then carried as DECIMAL(18,6); tf·lp stays in DECIMAL, so the
    per-doc sum is exact under any partition order.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    tok = d.select(
        "doc_id", F.explode(TX.tokens(TX.normalized_text("text"))).alias("tok")
    )
    # checkpoint: tf feeds BOTH the vocab aggregation and the scoring
    # join — unshared consumers re-ran the tokenize pass (2 corpus scans
    # in the r12 before-plan); the materialized table keeps the join
    # layout (AQE-splittable skew, per the docstring) at one pass
    tf = (
        tok.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    freq = tf.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("cnt"))
    freq = freq.withColumn(
        "n", F.sum("cnt").over(Window.partitionBy()).cast("bigint")
    )
    logp = freq.select(
        "tok",
        round_det(F.log(F.col("cnt").cast("double") / F.col("n").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    return (
        tf.join(logp, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            round_det(
                F.sum(F.col("lp") * F.col("tf")).cast("double")
                / F.sum("tf").cast("double"),
                6,
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style LM-quality buckets (head / middle / tail per language)
# ---------------------------------------------------------------------------

_PPL_BUCKETS_ORACLE = rf"""
WITH perdoc AS ({_UNIGRAM_ORACLE}),
langs AS (SELECT doc_id, lang FROM documents),
scored AS (
    SELECT p.doc_id, l.lang, p.n_tokens, p.avg_logprob
    FROM perdoc p JOIN langs l USING (doc_id)),
cuts AS (
    SELECT lang,
           FLOOR(quantile_cont(avg_logprob, 1.0/3) * 1000000 + 0.5) / 1000000 AS c1,
           FLOOR(quantile_cont(avg_logprob, 2.0/3) * 1000000 + 0.5) / 1000000 AS c2
    FROM scored GROUP BY lang)
SELECT s.doc_id, s.lang, s.n_tokens, s.avg_logprob,
       CASE WHEN s.avg_logprob >= c.c2 THEN 'head'
            WHEN s.avg_logprob >= c.c1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s JOIN cuts c USING (lang)
"""


@_register("corpus_ppl_buckets", _PPL_BUCKETS_ORACLE)
def corpus_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing: split each language's documents
    into head / middle / tail terciles of mean unigram log-probability
    (the cheap perplexity proxy from text_unigram_logprob) — the exact
    shape of CCNet's per-language perplexity partition, which downstream
    recipes sample at different rates (head-heavy for quality, tail kept
    for diversity).

    Scale: the per-doc score reuses text_unigram_logprob's plan (two
    corpus shuffles); the cut table is |langs| × 2 values computed from
    the SCORED frame (exact `percentile` here, `approx_percentile` at
    unbounded scale) and broadcast back, so bucketing is map-side.
    Known cost, accepted deliberately: `scored` has two consumers (cuts
    + final join), so the whole per-doc pipeline is computed twice in
    the registered single-plan form — the oracle does the same.  At
    100 TB you stage `scored` to storage (one line:
    `scored.write.parquet(...)`; or `localCheckpoint` as
    operators/graph.py does for iteration) and point both consumers at
    the staged table — this module keeps the no-hidden-cache rule
    (operators/boilerplate.py states the same policy).
    Determinism: per-doc scores are already rounded at 1e-6; cuts are
    rounded at 1e-6; both engines compare with the same `>=`, and tercile
    boundaries interpolate over identical doubles.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    perdoc = text_unigram_logprob(spark, sf_dir)
    scored = perdoc.join(d.select("doc_id", "lang"), "doc_id")
    cuts = scored.groupBy("lang").agg(
        round_det(F.expr("percentile(avg_logprob, 1.0d/3)"), 6).alias("c1"),
        round_det(F.expr("percentile(avg_logprob, 2.0d/3)"), 6).alias("c2"),
    )
    bucket = (
        F.when(F.col("avg_logprob") >= F.col("c2"), "head")
        .when(F.col("avg_logprob") >= F.col("c1"), "middle")
        .otherwise("tail")
    )
    return scored.join(F.broadcast(cuts), "lang").select(
        "doc_id", "lang", "n_tokens", "avg_logprob", bucket.alias("bucket")
    )


# ---------------------------------------------------------------------------
# Corpus health: Zipf slope + type/token (Heaps) stats per source
# ---------------------------------------------------------------------------

_ZIPF_TOPK = 50

_ZIPF_HEAPS_ORACLE = rf"""
WITH tok AS (
    SELECT source,
           unnest(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                               ' '), t -> t <> '')) AS term
    FROM documents),
tf AS (
    SELECT source, term, CAST(COUNT(*) AS BIGINT) AS freq
    FROM tok GROUP BY source, term),
totals AS (
    SELECT source, CAST(SUM(freq) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM tf GROUP BY source),
ranked AS (
    SELECT source, freq,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY freq DESC, term) AS rank
    FROM tf),
top AS (
    SELECT source,
           CAST(FLOOR(ln(rank) * 1000000000 + 0.5) / 1000000000
                AS DECIMAL(18,9)) AS x,
           CAST(FLOOR(ln(freq) * 1000000000 + 0.5) / 1000000000
                AS DECIMAL(18,9)) AS y
    FROM ranked WHERE rank <= {_ZIPF_TOPK}),
m AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy
    FROM top GROUP BY source)
SELECT t.source, t.n_tokens, t.n_types,
       FLOOR((t.n_types * 1.0 / t.n_tokens) * 1000000 + 0.5) / 1000000
         AS type_token_ratio,
       FLOOR(((m.n * m.sxy - m.sx * m.sy)
              / (m.n * m.sxx - m.sx * m.sx)) * 1000000 + 0.5) / 1000000
         AS zipf_slope
FROM totals t JOIN m USING (source)
"""


@_register("corpus_zipf_heaps", _ZIPF_HEAPS_ORACLE)
def corpus_zipf_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health report per source: token/type counts, type-token
    ratio (the Heaps'-law operating point), and the Zipf slope — the
    least-squares slope of ln(freq) on ln(rank) over the top-50 terms.
    Natural language sits near −1; machine-generated or template spam
    drifts flat — a cheap corpus-drift alarm between snapshots.

    Scale: term frequencies shuffle once on (source, term) with map-side
    combine; the rank window runs over the AGGREGATED tf frame only, and
    the regression runs on ≤50 rows per source.  Determinism
    (profile_corr_lineitem's discipline): ln of exact BIGINTs is rounded
    at 1e-9 and summed as DECIMAL — partition order cannot move the
    moment sums — then the textbook slope formula runs on identical
    doubles in both engines.
    """
    # no fan-out: exchange outweighs the cheap map stage (A/B at sf0.1)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(TX.tokens(TX.normalized_text("text"))).alias("term")
    )
    tf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("freq"))
    totals = tf.groupBy("source").agg(
        F.sum("freq").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("freq"), "term")
    x = round_det(F.log(F.col("rank").cast("double")), 9).cast("decimal(18,9)")
    y = round_det(F.log(F.col("freq").cast("double")), 9).cast("decimal(18,9)")
    top = (
        tf.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _ZIPF_TOPK)
        .select("source", x.alias("x"), y.alias("y"))
    )
    m = top.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    return totals.join(m, "source").select(
        "source",
        "n_tokens",
        "n_types",
        round_det(F.col("n_types") / F.col("n_tokens"), 6).alias("type_token_ratio"),
        round_det((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# Interpolated bigram LM quality score
# ---------------------------------------------------------------------------

_LAMBDA = 0.8  # bigram weight; (1-λ) backs off to the unigram MLE

_BIGRAM_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                        ' '), x -> x <> '') AS t
    FROM documents),
eligible AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 2),
bi AS (
    SELECT doc_id,
           unnest(list_transform(range(2, n + 1),
                                 i -> t[i-1] || ' ' || t[i])) AS bigram
    FROM eligible),
tf_bi AS (
    SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS tf
    FROM bi GROUP BY doc_id, bigram),
c_bi AS (
    SELECT bigram, CAST(SUM(tf) AS BIGINT) AS cb FROM tf_bi GROUP BY bigram),
c_prev AS (
    SELECT string_split(bigram, ' ')[1] AS w_prev,
           CAST(SUM(cb) AS BIGINT) AS cp
    FROM c_bi GROUP BY string_split(bigram, ' ')[1]),
uni AS (
    SELECT unnest(t) AS w FROM toks),
c_uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cu FROM uni GROUP BY w),
n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM uni),
lp AS (
    SELECT b.bigram,
           CAST(FLOOR(ln({_LAMBDA} * (CAST(b.cb AS DOUBLE) / CAST(p.cp AS DOUBLE))
                         + {1 - _LAMBDA} * (CAST(u.cu AS DOUBLE) / CAST(t.nn AS DOUBLE)))
                      * 1000000 + 0.5) / 1000000 AS DECIMAL(18,6)) AS lp
    FROM c_bi b
    JOIN c_prev p ON string_split(b.bigram, ' ')[1] = p.w_prev
    JOIN c_uni u ON string_split(b.bigram, ' ')[2] = u.w
    CROSS JOIN n_tot t)
SELECT f.doc_id,
       CAST(SUM(f.tf) AS BIGINT) AS n_bigrams,
       FLOOR(CAST(SUM(l.lp * f.tf) AS DOUBLE) / CAST(SUM(f.tf) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS avg_bigram_logprob
FROM tf_bi f JOIN lp l USING (bigram)
GROUP BY f.doc_id
"""


@_register("corpus_bigram_logprob", _BIGRAM_ORACLE)
def corpus_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log-probability under an interpolated bigram LM
    trained on the corpus itself: p(w|v) = λ·c(vw)/c(v·) + (1−λ)·c(w)/N,
    λ=0.8 — one LM order up from text_unigram_logprob, the shape of the
    CCNet/KenLM perplexity filter (a frozen external LM drops into the
    count tables unchanged).  Docs need ≥2 tokens to have a bigram.

    Scale: doc bigram term frequencies shuffle once on (doc, bigram);
    the corpus LM is two count aggregations (bigram, unigram) whose
    left-word and corpus-total rollups are WINDOWS over the vocab-sized
    count frames (not separate consumers of the corpus subtree — that
    form compiled to five full scans; this one needs three: tf build,
    tf re-read for scoring, unigram counts, the first two collapsing to
    one with the staged-table remedy of corpus_ppl_buckets), joined into
    a per-BIGRAM logprob dim — sized by distinct corpus bigrams, NOT doc
    count — and scoring joins tf⋈lp on the bigram key (AQE splits any
    hot bigram).  Determinism: corpus counts are exact int64 cast to
    double (exact < 2^53), the interpolation is a fixed IEEE expression
    of those, each ln floor-rounded at 1e-6 into DECIMAL, tf-weighted
    DECIMAL sum, one final division — same discipline as the unigram LM.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    staged = d.select("doc_id", TX.tokens(TX.normalized_text("text")).alias("t"))
    n = F.size("t")
    bi = staged.where(n >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(2, size(t)), i -> concat(t[i-2], ' ', t[i-1]))")
        ).alias("bigram"),
    )
    tf_bi = bi.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("tf"))
    c_bi = tf_bi.groupBy("bigram").agg(F.sum("tf").cast("bigint").alias("cb"))
    w_prev = F.split(F.col("bigram"), " ")[0]
    w_cur = F.split(F.col("bigram"), " ")[1]
    # left-word totals as a WINDOW over the bigram-vocab frame, and the
    # corpus token total as a window over the unigram-vocab frame: both
    # rollups were separate consumers of their count subtree, which
    # recompiled the doc tokenization into two extra full corpus scans
    # (the frames under the windows are vocab-sized — the pareto
    # argument — so the windows cost nothing at any scale)
    c_bi = c_bi.withColumn(
        "cp",
        F.sum("cb").over(Window.partitionBy(w_prev)).cast("bigint"),
    )
    uni = staged.select(F.explode("t").alias("w"))
    c_uni = uni.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("cu"))
    c_uni = c_uni.withColumn(
        "nn", F.sum("cu").over(Window.partitionBy()).cast("bigint")
    )
    lp = (
        c_bi.join(c_uni, w_cur == F.col("w"))
        .select(
            "bigram",
            round_det(
                F.log(
                    _LAMBDA * (F.col("cb").cast("double") / F.col("cp").cast("double"))
                    + (1 - _LAMBDA)
                    * (F.col("cu").cast("double") / F.col("nn").cast("double"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    return (
        tf_bi.join(lp, "bigram")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            round_det(
                F.sum(F.col("lp") * F.col("tf")).cast("double")
                / F.sum("tf").cast("double"),
                6,
            ).alias("avg_bigram_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge learning (tokenizer induction)
# ---------------------------------------------------------------------------

N_BPE_MERGES = 8


@_register("corpus_bpe_learn")  # rows-only: iterative, merge rules are
# data-dependent literals in later rounds' plans — not one SQL statement
def corpus_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first {N_BPE_MERGES} BPE merges from the corpus: word
    vocabulary (token → frequency, ONE corpus-sized aggregation), then
    the iterative pair-count → argmax → rewrite loop of
    operators/bpe.py, which touches only the vocab table.  Output: the
    merge table (merge_rank, left, right, pair_count) — the tokenizer
    artifact a pretraining pipeline ships.

    Correctness is pinned by tests/test_bpe.py against a pure-Python
    reference implementation of the same algorithm (exact equality,
    including tie-breaks); the driver records a rows-only row.
    """
    from dffoo_data_pipeline_spark.operators.bpe import learn_bpe_merges

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    vocab = (
        d.select(F.explode(TX.tokens(TX.normalized_text("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    merges = learn_bpe_merges(vocab, n_merges=N_BPE_MERGES)
    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, pair_count long"
    )


@_register("corpus_bpe_encode")  # rows-only: merge table is data-dependent
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode side of the tokenizer: apply the corpus-learned BPE merge
    table (corpus_bpe_learn) to every document and report whitespace
    vs BPE token counts + the compression ratio — the number that tells
    you what a context window actually holds.

    Scale: encoding runs on the distinct-word VOCAB (chained
    leftmost-nonoverlapping folds, no shuffle), then one broadcast-able
    (word → n_bpe_tokens) join brings counts back to the corpus; the
    per-doc rollup is the only corpus-sized shuffle.  Exact-equality
    tested against a pure-Python reference encoder.
    """
    from dffoo_data_pipeline_spark.operators.bpe import (
        apply_bpe_merges,
        learn_bpe_merges,
    )

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = d.select("doc_id", F.explode(TX.tokens(TX.normalized_text("text"))).alias("word"))
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    vocab = vocab.localCheckpoint(eager=False)  # feeds learning AND encoding once
    merges = learn_bpe_merges(vocab, n_merges=N_BPE_MERGES)
    encoded = apply_bpe_merges(vocab, merges)
    return (
        toks.join(encoded, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            round_det(F.col("n_bpe_tokens") / F.col("n_words"), 4).alias("bpe_per_word"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus data card (one-row summary)
# ---------------------------------------------------------------------------

_ENTROPY_TERM = "CAST(FLOOR(c * ln(c) * 1000000 + 0.5) / 1000000 AS DECIMAL(28,6))"

_DATA_CARD_ORACLE = rf"""
WITH base AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t <> ''))) AS BIGINT)
             AS n_tokens,
           CAST(COUNT(DISTINCT md5(lower(trim(text)))) AS BIGINT) AS n_unique,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents),
src AS (
    SELECT CAST(SUM({_ENTROPY_TERM}) AS DOUBLE) AS slnl
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY source)),
lng AS (
    SELECT CAST(SUM({_ENTROPY_TERM}) AS DOUBLE) AS llnl
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY lang))
SELECT n_docs, n_tokens, n_sources, n_langs,
       FLOOR((1.0 - n_unique * 1.0 / n_docs) * 1000000 + 0.5) / 1000000
         AS exact_dup_rate,
       FLOOR((n_tokens * 1.0 / n_docs) * 1000000 + 0.5) / 1000000
         AS mean_tokens,
       FLOOR((ln(n_docs) - slnl / n_docs) * 1000000 + 0.5) / 1000000
         AS source_entropy,
       FLOOR((ln(n_docs) - llnl / n_docs) * 1000000 + 0.5) / 1000000
         AS lang_entropy
FROM base CROSS JOIN src CROSS JOIN lng
"""


@_register("corpus_data_card", _DATA_CARD_ORACLE)
def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row data card a corpus release ships: sizes, exact-dup
    rate, and the Shannon entropy (nats) of the source and language
    mixes — the two numbers that say at a glance whether the corpus is
    one source wearing ten names or a real mixture.

    Scale: two corpus passes — one wide aggregate (counts + distinct
    hash) and one grouping-sets-style pass for the per-source/per-lang
    counts; entropy then runs on the dimension-sized count tables.
    Determinism: each c·ln(c) term is floor-rounded at 1e-6 into
    DECIMAL before summing (partition-order-exact), and H =
    ln(N) − Σc·ln(c)/N is one IEEE subtract/divide of identical
    operands on both engines.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    base = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(TX.token_count("text")).cast("bigint").alias("n_tokens"),
        F.count_distinct(F.md5(F.lower(F.trim("text")))).cast("bigint").alias("n_unique"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
    )

    def _ent_sum(key: str, alias: str) -> DataFrame:
        counts = d.groupBy(key).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        term = round_det(F.col("c") * F.log("c"), 6).cast("decimal(28,6)")
        return counts.agg(F.sum(term).cast("double").alias(alias))

    ent = lambda lnl: round_det(  # noqa: E731
        F.log("n_docs") - F.col(lnl) / F.col("n_docs"), 6
    )
    return (
        base.crossJoin(F.broadcast(_ent_sum("source", "slnl")))
        .crossJoin(F.broadcast(_ent_sum("lang", "llnl")))
        .select(
            "n_docs",
            "n_tokens",
            "n_sources",
            "n_langs",
            round_det(1.0 - F.col("n_unique") / F.col("n_docs"), 6).alias("exact_dup_rate"),
            round_det(F.col("n_tokens") / F.col("n_docs"), 6).alias("mean_tokens"),
            ent("slnl").alias("source_entropy"),
            ent("llnl").alias("lang_entropy"),
        )
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (self-audit against labeled data)
# ---------------------------------------------------------------------------

_LANGID_CONFUSION_ORACLE = f"""
WITH pred AS ({_LANG_PREDICT_ORACLE.strip()})
SELECT d.lang AS true_lang, p.predicted_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred p USING (doc_id)
GROUP BY d.lang, p.predicted_lang
"""


@_register("text_langid_confusion", _LANGID_CONFUSION_ORACLE)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language classifier against the
    corpus's ground-truth labels — the audit that says whether the
    stopword heuristic is good enough to gate on, per language (the
    synthetic corpus is heavily en-skewed, so the off-diagonal rows are
    exactly the docs a real pipeline would mis-route).

    Scale: the classifier is per-row codegen; the join is doc_id-keyed;
    the matrix aggregate is |langs|² rows.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    pred = text_lang_predict(spark, sf_dir).select("doc_id", "predicted_lang")
    return (
        d.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


_PSI_BIN_W = 100  # n_chars drift bins

_DRIFT_PSI_ORACLE = f"""
WITH u AS (
    SELECT doc_id % 2 AS is_new, 'n_chars' AS feature,
           CAST(CAST(FLOOR(n_chars / {_PSI_BIN_W}.0) AS BIGINT) AS VARCHAR) AS bucket
    FROM documents
    UNION ALL
    SELECT doc_id % 2, 'lang', lang FROM documents),
cnt AS (
    SELECT feature, bucket,
           CAST(SUM(CASE WHEN is_new = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_old,
           CAST(SUM(CASE WHEN is_new = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_new
    FROM u GROUP BY feature, bucket),
tot AS (
    SELECT feature, c_old, c_new,
           CAST(SUM(c_old) OVER (PARTITION BY feature) AS BIGINT) AS n_old,
           CAST(SUM(c_new) OVER (PARTITION BY feature) AS BIGINT) AS n_new,
           CAST(COUNT(*) OVER (PARTITION BY feature) AS BIGINT) AS b
    FROM cnt),
terms AS (
    SELECT feature, b,
           (CAST(c_new + 1 AS DOUBLE) / (n_new + b)
            - CAST(c_old + 1 AS DOUBLE) / (n_old + b)) AS dp,
           FLOOR(ln((CAST(c_new + 1 AS DOUBLE) / (n_new + b))
                    / (CAST(c_old + 1 AS DOUBLE) / (n_old + b)))
                 * 1000000 + 0.5) / 1000000 AS lr
    FROM tot)
SELECT feature, MAX(b) AS n_buckets,
       FLOOR(CAST(SUM(CAST(FLOOR(dp * lr * 1000000000 + 0.5) / 1000000000
                           AS DECIMAL(18,9))) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS psi
FROM terms GROUP BY feature
"""


@_register("corpus_drift_psi", _DRIFT_PSI_ORACLE)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between two corpus
    snapshots (proxied here by doc_id parity; production passes the
    previous and current crawl): PSI = Σ_buckets (p_new − p_old) ·
    ln(p_new/p_old) with add-one smoothing, over the length histogram
    (100-char bins) and the language mix.  PSI < 0.1 is the standard
    "no action" gate; > 0.25 means the mixture moved enough to re-tune
    curation thresholds — the monitor that catches a crawl source going
    dark or a boilerplate explosion BEFORE a model trains on it.

    Scale: ONE corpus scan (both features exploded from each row into a
    tagged struct), one map-side-combined (feature, bucket) aggregation
    — bucket cardinality is |bins| + |langs| — and windows over that
    tiny frame.  Determinism: counts stay BIGINT; each probability is a
    quotient of exact integers (identical doubles cross-engine); ln is
    rounded at 1e-6 immediately (module ln discipline), terms at 1e-9
    into DECIMAL(18,9) so the per-feature sum is partition-order-exact.
    """
    d = load_table(spark, sf_dir, "documents")
    u = d.select(
        (F.col("doc_id") % 2).alias("is_new"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("n_chars").alias("feature"),
                    F.floor(F.col("n_chars") / float(_PSI_BIN_W))
                    .cast("bigint")
                    .cast("string")
                    .alias("bucket"),
                ),
                F.struct(F.lit("lang").alias("feature"), F.col("lang").alias("bucket")),
            )
        ).alias("f"),
    ).select("is_new", "f.feature", "f.bucket")
    cnt = u.groupBy("feature", "bucket").agg(
        F.sum(F.when(F.col("is_new") == 0, 1).otherwise(0)).cast("bigint").alias("c_old"),
        F.sum(F.when(F.col("is_new") == 1, 1).otherwise(0)).cast("bigint").alias("c_new"),
    )
    wf = Window.partitionBy("feature")
    tot = cnt.select(
        "feature",
        "c_old",
        "c_new",
        F.sum("c_old").over(wf).cast("bigint").alias("n_old"),
        F.sum("c_new").over(wf).cast("bigint").alias("n_new"),
        F.count(F.lit(1)).over(wf).cast("bigint").alias("b"),
    )
    p_new = (F.col("c_new") + 1).cast("double") / (F.col("n_new") + F.col("b"))
    p_old = (F.col("c_old") + 1).cast("double") / (F.col("n_old") + F.col("b"))
    terms = tot.select(
        "feature",
        "b",
        (p_new - p_old).alias("dp"),
        round_det(F.log(p_new / p_old), 6).alias("lr"),
    )
    return terms.groupBy("feature").agg(
        F.max("b").alias("n_buckets"),
        round_det(
            F.sum(
                round_det(F.col("dp") * F.col("lr"), 9).cast("decimal(18,9)")
            ).cast("double"),
            6,
        ).alias("psi"),
    )


# chi-square critical value at alpha=0.05 for dof=(5-1)(20-1)=76 —
# fixture-specific literal; a generic operator joins a critical-value dim
_CHI2_CRIT_76 = "97.351"

_CHI2_ORACLE = f"""
WITH o AS (
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
    FROM documents GROUP BY lang, source),
tot AS (
    SELECT lang, source, obs,
           CAST(SUM(obs) OVER (PARTITION BY lang) AS BIGINT) AS rt,
           CAST(SUM(obs) OVER (PARTITION BY source) AS BIGINT) AS ct,
           CAST(SUM(obs) OVER () AS BIGINT) AS n
    FROM o),
cells AS (
    SELECT n,
           CAST(FLOOR((obs - CAST(rt AS DOUBLE) * ct / n)
                      * (obs - CAST(rt AS DOUBLE) * ct / n)
                      / (CAST(rt AS DOUBLE) * ct / n)
                      * 1000000000 + 0.5) / 1000000000 AS DECIMAL(20,9)) AS term
    FROM tot),
stat AS (
    SELECT MAX(n) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(term) AS DOUBLE) AS chi2
    FROM cells)
SELECT n, n_cells,
       FLOOR(chi2 * 1000000 + 0.5) / 1000000 AS chi2,
       CAST(76 AS BIGINT) AS dof,
       chi2 > {_CHI2_CRIT_76} AS significant
FROM stat
"""


@_register("corpus_chi2_independence", _CHI2_ORACLE)
def corpus_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² test of independence between language and source over
    the corpus — the mixture audit that detects a source drifting toward
    one language (a broken crawler or a mislabeled feed shows up as a
    dependent contingency table long before eyeballing shares would).
    The fixture assigns lang and source independently, so `significant`
    must come out FALSE — the correct negative, pinned in
    tests/test_properties.py.

    Scale: one scan to the |langs|×|sources| contingency table (100
    cells here); row/column/grand totals are windows over that tiny
    frame and the statistic is one DECIMAL-carried sum of per-cell
    terms.  Determinism: observed counts and margins are exact BIGINTs,
    each (O−E)²/E term is the identical IEEE expression floor-rounded
    at 1e-9 into DECIMAL(20,9), and the 0.05 critical value for
    dof=76 is the same literal in both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    wall = Window.partitionBy()
    tot = o.select(
        "obs",
        F.sum("obs").over(wl).cast("bigint").alias("rt"),
        F.sum("obs").over(ws).cast("bigint").alias("ct"),
        F.sum("obs").over(wall).cast("bigint").alias("n"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    term = round_det((F.col("obs") - e) * (F.col("obs") - e) / e, 9).cast(
        "decimal(20,9)"
    )
    stat = tot.select("n", term.alias("term")).groupBy().agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("term").cast("double").alias("chi2"),
    )
    return stat.select(
        "n",
        "n_cells",
        round_det(F.col("chi2"), 6).alias("chi2"),
        F.lit(76).cast("bigint").alias("dof"),
        (F.col("chi2") > float(_CHI2_CRIT_76)).alias("significant"),
    )


_LOO_ORACLE = """
WITH s AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY source),
t AS (
    SELECT source, n_docs, chars,
           CAST(SUM(n_docs) OVER () AS BIGINT) AS nn,
           CAST(SUM(chars) OVER () AS BIGINT) AS tt
    FROM s)
SELECT source, n_docs,
       FLOOR(CAST(tt AS DOUBLE) / nn * 1000000 + 0.5) / 1000000 AS mean_all,
       FLOOR(CAST(tt - chars AS DOUBLE) / (nn - n_docs) * 1000000 + 0.5) / 1000000
         AS mean_without,
       FLOOR((CAST(tt - chars AS DOUBLE) / (nn - n_docs)
              - CAST(tt AS DOUBLE) / nn) * 1000000 + 0.5) / 1000000
         AS delta_if_removed
FROM t
"""


@_register("corpus_loo_source_ablation", _LOO_ORACLE)
def corpus_loo_source_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out ablation of corpus quality (mean doc length
    as the metric; swap in any additive score): for EVERY source, what
    the corpus metric becomes if that source is dropped — the data-
    valuation question behind every mixture decision, answered for all
    sources at once because additive statistics make "all minus one" a
    subtraction (the lineitem_regression_cv trick applied to curation).
    The naive form rescans the corpus per source — O(|sources|) passes;
    this is ONE pass plus windows over the |sources|-row frame.

    Determinism: all totals are exact BIGINTs; the three reported means
    are quotients of exact integers, floor-rounded at 1e-6.
    """
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    wall = Window.partitionBy()
    t = s.select(
        "source",
        "n_docs",
        "chars",
        F.sum("n_docs").over(wall).cast("bigint").alias("nn"),
        F.sum("chars").over(wall).cast("bigint").alias("tt"),
    )
    mean_all = F.col("tt").cast("double") / F.col("nn")
    mean_wo = (F.col("tt") - F.col("chars")).cast("double") / (
        F.col("nn") - F.col("n_docs")
    )
    return t.select(
        "source",
        "n_docs",
        round_det(mean_all, 6).alias("mean_all"),
        round_det(mean_wo, 6).alias("mean_without"),
        round_det(mean_wo - mean_all, 6).alias("delta_if_removed"),
    )
