"""Data-selection operators: exact duplicated-span detection/removal and
DSIR-style importance weighting/resampling.

Selection signals a pretraining pipeline computes between dedup and
sampling (SURVEY.md §2k's curation surface; reference analog: the
keep/drop row gates of web_scraper.py's parse loop, lifted to
corpus-statistics-driven gates):

* ``dedup_duplicate_spans`` — the window-hash approximation of
  suffix-array exact-substring dedup (Lee et al. 2022, "Deduplicating
  Training Data Makes Language Models Better"): every stride-1 window of
  ``W_SPAN`` consecutive tokens is hashed; a window whose hash occurs
  ≥2× anywhere in the corpus is a duplicated span, and documents past a
  duplicated-span-fraction threshold are flagged for dropping.  The full
  suffix array finds arbitrary-length repeats; fixed-W windows find
  exactly the repeats of length ≥ W — the standard distributed
  relaxation, expressible as two hash shuffles.

* ``curation_dsir_weights`` — hashed-unigram importance weights (Xie et
  al. 2023, "Data Selection for Language Models via Importance
  Resampling"): build bucketed unigram LMs of a target slice and of the
  whole corpus over ``N_BUCKETS`` hash buckets, and score each document
  by its mean per-token log importance ratio ln(p_target/p_source).
  The registered query uses the ``lang = 'en'`` slice as the target
  stand-in; a real run swaps in any high-quality reference corpus.

Cross-engine determinism: the bucket hash is the leading 8 hex digits of
md5 parsed as an integer — Spark ``conv(substring(md5(x),1,8),16,10)``
and DuckDB ``('0x' || substr(md5(x),1,8))::BIGINT`` produce identical
values (both engines compute the same RFC-1321 md5 of the same
normalized token bytes).  Every ln() is floor-rounded at 1e-6
(`round_det`, mode-independent) then carried as DECIMAL so per-doc sums
are partition-order-exact — same discipline as plans/corpus.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
# Exact duplicated-span detection (windowed suffix-array relaxation)
# ---------------------------------------------------------------------------

W_SPAN = 8  # tokens per rolling window (= minimum repeat length detected)
DUP_FRAC_DROP = 0.2  # drop a doc when ≥20% of its windows are duplicated

_SPANS_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                        ' '), x -> x <> '') AS t
    FROM documents),
eligible AS (
    SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= {W_SPAN}),
starts AS (
    SELECT doc_id, t,
           unnest(range(1, n - {W_SPAN} + 2)) AS s
    FROM eligible),
wins AS (
    SELECT doc_id,
           md5(array_to_string(list_slice(t, s, s + {W_SPAN} - 1), ' ')) AS h
    FROM starts),
cnts AS (
    SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
perdoc_dup AS (
    SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
    FROM wins w JOIN cnts USING (h)
    GROUP BY w.doc_id),
perdoc AS (
    SELECT doc_id, CAST(n - {W_SPAN} + 1 AS BIGINT) AS n_windows
    FROM eligible),
flagged AS (
    SELECT p.doc_id, p.n_windows,
           CAST(COALESCE(d.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           FLOOR(COALESCE(d.n_dup_windows, 0) * 1.0 / p.n_windows
                 * 10000 + 0.5) / 10000 AS dup_frac
    FROM perdoc p LEFT JOIN perdoc_dup d USING (doc_id))
SELECT doc_id, n_windows, n_dup_windows, dup_frac,
       CAST(CASE WHEN dup_frac >= {DUP_FRAC_DROP} THEN 1 ELSE 0 END AS INT)
         AS drop_flag
FROM flagged
"""


@_register("dedup_duplicate_spans", _SPANS_ORACLE)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span audit: fraction of the document's
    stride-1 {W_SPAN}-token windows whose hash occurs ≥2× corpus-wide
    (including elsewhere in the same document — self-repeats are exactly
    what the templating/boilerplate signal wants), plus a drop flag at
    the 20% threshold.  Documents shorter than W_SPAN tokens have no
    windows and are excluded (they cannot contain a length-≥W repeat).

    Scale: the explode is ~n_tokens rows per doc (stride 1 — inherent to
    the operator, this is the cost suffix-array dedup pays up front too)
    but each row is only (doc_id, 32-byte hash); the span text itself
    never shuffles.  Two hash shuffles: COUNT per window hash (map-side
    combine folds each task's repeats first) and the wins⋈dup-hashes
    join (AQE handles a skewed hash — a boilerplate span shared by
    millions of docs — by splitting its partition).  `wins` is
    checkpointed at the stage boundary (the batch analog of "stage
    `wins` to storage once") so the count side, the dup join and the
    per-doc window total all read one materialized pass; the JOIN
    layout stays (a window-over-h alternative would pin each hot hash
    into one unsplittable task).  The final per-doc rollup shuffles
    doc_id-sized keys only.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    staged = d.select(
        "doc_id", TX.tokens(TX.normalized_text("text")).alias("t")
    ).where(F.size("t") >= W_SPAN)
    n = F.size("t")
    # wins IS the docstring's "stage `wins` to storage once" artifact —
    # checkpointed so its three consumers (the hash count, the dup join,
    # the per-doc window total) share ONE tokenize+window+md5 pass; the
    # naive lineage ran the scan→tokenize→explode subtree three times
    # (3 documents scans in the r12 before-plan).
    wins = staged.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), n - W_SPAN + 1)).alias("s"),
    ).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(F.col("t"), F.col("s"), W_SPAN))).alias("h"),
    ).localCheckpoint(eager=False)
    dup_hashes = (
        wins.groupBy("h").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") >= 2).select("h")
    )
    # BOTH per-doc counts fall out of ONE aggregation over the
    # dup-flagged windows: every staged doc emits exactly n − W + 1
    # window rows, so n_windows = COUNT(*) and n_dup_windows = count of
    # rows whose hash matched the dup set (dup_hashes is distinct, so
    # the left join never multiplies rows).  The former three-consumer
    # layout (inner-join count + separate totals + final doc join) cost
    # two extra doc-keyed shuffles.
    flagged = wins.join(dup_hashes.withColumn("__dup", F.lit(1)), "h", "left")
    per = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.count("__dup").cast("bigint").alias("n_dup_windows"),
    )
    dup_frac = round_det(F.col("n_dup_windows") / F.col("n_windows"), 4)
    return per.select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        dup_frac.alias("dup_frac"),
        (dup_frac >= DUP_FRAC_DROP).cast("int").alias("drop_flag"),
    )


# ---------------------------------------------------------------------------
# DSIR hashed-unigram importance weights
# ---------------------------------------------------------------------------

N_BUCKETS = 64  # hashed-unigram feature buckets (DSIR uses 10k at web scale)
_TARGET_LANG = "en"  # stand-in target slice for the registered query

_DSIR_SCORED_CTE = rf"""
tok AS (
    SELECT doc_id, lang,
           unnest(list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                               ' '), t -> t <> '')) AS tok
    FROM documents),
b AS (
    SELECT doc_id, lang,
           (('0x' || substr(md5(tok), 1, 8))::BIGINT) % {N_BUCKETS} AS bucket
    FROM tok),
dim AS (
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS cs,
           CAST(COUNT(*) FILTER (WHERE lang = '{_TARGET_LANG}') AS BIGINT) AS ct
    FROM b GROUP BY bucket),
tot AS (
    SELECT CAST(SUM(cs) AS BIGINT) AS total_s,
           CAST(SUM(ct) AS BIGINT) AS total_t
    FROM dim),
lr AS (
    SELECT bucket,
           CAST(FLOOR(ln(CAST((ct + 1) * (total_s + {N_BUCKETS}) AS DOUBLE)
                         / CAST((cs + 1) * (total_t + {N_BUCKETS}) AS DOUBLE))
                      * 1000000 + 0.5) / 1000000 AS DECIMAL(18,6)) AS lr
    FROM dim, tot),
perdocbucket AS (
    SELECT doc_id, lang, bucket, CAST(COUNT(*) AS BIGINT) AS tf
    FROM b GROUP BY doc_id, lang, bucket),
scored AS (
    SELECT doc_id, lang,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           FLOOR(CAST(SUM(lr * tf) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS dsir_logw
    FROM perdocbucket JOIN lr USING (bucket)
    GROUP BY doc_id, lang)
"""

_DSIR_ORACLE = rf"""
WITH {_DSIR_SCORED_CTE}
SELECT doc_id, lang, n_tokens, dsir_logw,
       CAST(CASE WHEN dsir_logw > 0 THEN 1 ELSE 0 END AS INT) AS selected
FROM scored
"""


@_register("curation_dsir_weights", _DSIR_ORACLE)
def curation_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight per document: mean over tokens of
    ln(p_target(bucket)/p_source(bucket)) under add-one-smoothed
    hashed-unigram LMs (64 buckets here; web-scale DSIR uses ~10k —
    one constant).  Target = the corpus's own 'en' slice as a
    deterministic, oracle-able stand-in; `selected` = weight > 0, i.e.
    the doc looks more target-like than corpus-average.  Importance
    RESAMPLING is then a weighted sample over `dsir_logw` (see
    curation_sample_stratified for the sampling machinery).

    Scale: one explode feeds a (doc, bucket) term-frequency aggregation
    (map-side combine; ≤64 distinct buckets per doc survive the
    shuffle), checkpointed at the stage boundary.  The bucket LM dim is
    exactly 64 rows — derived from the materialized tf rollup (sums of
    tf, not a second tokenize pass) and broadcast back, so scoring adds
    no shuffle beyond the tf rollup.  Smoothed count ratios cast each int64 factor
    to double BEFORE multiplying (each factor exact below 2^53; the
    product correctly rounded once — an int64 product would overflow at
    corpus scale, an ANSI ARITHMETIC_OVERFLOW), divided once
    (IEEE-identical both engines), ln'd and floor-rounded at 1e-6 into
    DECIMAL, so the tf-weighted per-doc sum is partition-order-exact.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    tok = d.select(
        "doc_id", "lang", F.explode(TX.tokens(TX.normalized_text("text"))).alias("tok")
    )
    b = tok.select(
        "doc_id",
        "lang",
        (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % N_BUCKETS).alias(
            "bucket"
        ),
    )
    # ONE tokenization: the naive layout (dim and pdb both aggregate the
    # exploded frame, tot re-aggregates dim) ran the scan→tokenize→
    # bucket subtree three times (3 documents scans in the r12
    # before-plan).  pdb — the per-(doc, bucket) tf rollup every
    # consumer can be derived from — is checkpointed at the stage
    # boundary; dim falls out of it as sums of tf (identical integers:
    # cs = Σ tf over the bucket, ct = Σ tf over its target-lang rows,
    # coalesced to 0 where count-of-when yielded 0 for bucketless
    # matches), and the 64-row dim is checkpointed too so tot and lr
    # share one evaluation (guide §2.4).
    pdb = (
        b.groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dim = (
        pdb.groupBy("bucket")
        .agg(
            F.sum("tf").alias("cs"),
            F.coalesce(
                F.sum(F.when(F.col("lang") == _TARGET_LANG, F.col("tf"))), F.lit(0)
            ).alias("ct"),
        )
        .localCheckpoint(eager=False)
    )
    tot = dim.agg(
        F.sum("cs").alias("total_s"),
        F.sum("ct").alias("total_t"),
    )
    lr = dim.crossJoin(F.broadcast(tot)).select(
        "bucket",
        # cast each factor BEFORE multiplying: at corpus scale the int64
        # product (count × total-count) can overflow, which under ANSI
        # raises ARITHMETIC_OVERFLOW; the double product cannot
        round_det(
            F.log(
                ((F.col("ct") + 1).cast("double") * (F.col("total_s") + N_BUCKETS).cast("double"))
                / ((F.col("cs") + 1).cast("double") * (F.col("total_t") + N_BUCKETS).cast("double"))
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lr"),
    )
    scored = (
        pdb.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            round_det(
                F.sum(F.col("lr") * F.col("tf")).cast("double")
                / F.sum("tf").cast("double"),
                6,
            ).alias("dsir_logw"),
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        "dsir_logw",
        (F.col("dsir_logw") > 0).cast("int").alias("selected"),
    )


# ---------------------------------------------------------------------------
# DSIR importance resampling via deterministic Gumbel top-k
# ---------------------------------------------------------------------------

SAMPLE_K = 100  # documents drawn by the registered query
_SEED_TAG = "seed-42:"  # salt for the md5-uniform draws

_RESAMPLE_ORACLE = rf"""
WITH {_DSIR_SCORED_CTE},
keyed AS (
    SELECT doc_id, lang, dsir_logw,
           dsir_logw
           + FLOOR(-ln(-ln(((('0x' || substr(md5('{_SEED_TAG}' || doc_id), 1, 8))::BIGINT
                             + 0.5) / 4294967296.0))
                   ) * 1000000 + 0.5) / 1000000 AS gumbel_key
    FROM scored),
ranked AS (
    SELECT doc_id, lang, dsir_logw, gumbel_key,
           CAST(ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id)
                AS BIGINT) AS sample_rank
    FROM keyed)
SELECT doc_id, lang, dsir_logw, gumbel_key, sample_rank
FROM ranked WHERE sample_rank <= {SAMPLE_K}
"""


@_register("curation_dsir_resample", _RESAMPLE_ORACLE)
def curation_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling without replacement, the second half of
    DSIR: draw SAMPLE_K documents with probability proportional to their
    importance weight via the Gumbel top-k identity — adding independent
    Gumbel(0,1) noise g = −ln(−ln(u)) to each log-weight and taking the
    K largest keys IS a weighted sample without replacement.  The
    uniforms are seeded md5 draws, so the "sample" is a pure
    deterministic function of the corpus: rerunnable, oracle-able, and
    identical on every engine.

    Scale: the per-doc scored frame is curation_dsir_weights' plan (two
    shuffles); the noise key adds zero shuffles (row-local md5), and the
    global top-K is sort-free — TakeOrderedAndProject keeps a K-row heap
    per partition and merges K·n_partitions rows on one reducer.  The
    rank window then orders K rows, not the corpus.  Determinism:
    u = (h + 0.5)/2^32 is an exact power-of-two division of an exact
    integer (identical doubles both engines); each −ln(−ln(u)) is
    floor-rounded at 1e-6; key = rounded logw + rounded noise is one
    exact IEEE add.
    """
    scored = curation_dsir_weights(spark, sf_dir).drop("selected", "n_tokens")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(_SEED_TAG), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    g = round_det(-F.log(-F.log((h + F.lit(0.5)) / F.lit(4294967296.0))), 6)
    keyed = scored.select(
        "doc_id", "lang", "dsir_logw", (F.col("dsir_logw") + g).alias("gumbel_key")
    )
    topk = keyed.orderBy(F.col("gumbel_key").desc(), "doc_id").limit(SAMPLE_K)
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.orderBy(F.col("gumbel_key").desc(), "doc_id")
    )
    return topk.select(
        "doc_id", "lang", "dsir_logw", "gumbel_key", rank.cast("bigint").alias("sample_rank")
    )


# ---------------------------------------------------------------------------
# Duplicated-span REMOVAL (the rewrite half of exact-substring dedup)
# ---------------------------------------------------------------------------

_REMOVAL_ORACLE = rf"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                        ' '), x -> x <> '') AS t
    FROM documents),
nn AS (SELECT doc_id, t, len(t) AS n FROM toks),
wins AS (
    SELECT doc_id, s,
           md5(array_to_string(list_slice(t, s, s + {W_SPAN} - 1), ' ')) AS h
    FROM (SELECT doc_id, t, n, unnest(range(1, n - {W_SPAN} + 2)) AS s
          FROM nn WHERE n >= {W_SPAN})),
dup_h AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
covered AS (
    SELECT DISTINCT doc_id, pos FROM (
        SELECT w.doc_id, unnest(range(w.s, w.s + {W_SPAN})) AS pos
        FROM wins w JOIN dup_h USING (h))),
tokpos AS (
    SELECT doc_id, pos, t[pos] AS tok
    FROM (SELECT doc_id, t, unnest(range(1, n + 1)) AS pos FROM nn)),
kept AS (
    SELECT k.doc_id, k.pos, k.tok
    FROM tokpos k LEFT JOIN covered c ON k.doc_id = c.doc_id AND k.pos = c.pos
    WHERE c.pos IS NULL),
re AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
           string_agg(tok, ' ' ORDER BY pos) AS clean_text
    FROM kept GROUP BY doc_id)
SELECT a.doc_id, CAST(a.n AS BIGINT) AS n_tokens,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept_tokens,
       COALESCE(r.clean_text, '') AS clean_text
FROM nn a LEFT JOIN re r USING (doc_id)
"""


@_register("corpus_duplicate_span_removal", _REMOVAL_ORACLE)
def corpus_duplicate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rewrite half of exact-substring dedup (Lee et al. 2022 REMOVES
    the repeated spans rather than dropping documents): every token
    covered by any corpus-duplicated {W_SPAN}-token window is excised and
    the survivors are reassembled in original order.  Documents shorter
    than W_SPAN keep their text verbatim; a fully-templated document
    survives as ''.

    Scale: extends dedup_duplicate_spans' two hash shuffles with a
    coverage explode — ≤ W_SPAN positions per duplicated window, deduped
    on (doc, pos) — and a (doc, pos) anti-join against the token
    positions, so the rewrite cost is proportional to the DUPLICATED
    text, not the corpus.  Reassembly is the positional idiom from
    operators/boilerplate.py (array_sort over (pos, tok) structs — and,
    same pitfall, per-doc scalars ride a separate no-explode projection,
    never the generator).  Both engines order ties identically because
    (doc, pos) is unique.
    """
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    staged = d.select("doc_id", TX.tokens(TX.normalized_text("text")).alias("t"))
    n = F.size("t")
    wins = staged.where(n >= W_SPAN).select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), n - W_SPAN + 1)).alias("s"),
    ).select(
        "doc_id",
        "s",
        F.md5(F.concat_ws(" ", F.slice(F.col("t"), F.col("s"), W_SPAN))).alias("h"),
    )
    dup_h = (
        wins.groupBy("h").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") >= 2).select("h")
    )
    covered = (
        wins.join(dup_h, "h")
        .select("doc_id", F.explode(F.sequence(F.col("s"), F.col("s") + W_SPAN - 1)).alias("pos"))
        .distinct()
    )
    tokpos = staged.select(
        "doc_id", F.posexplode("t").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    kept = tokpos.join(covered, ["doc_id", "pos"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    all_docs = staged.select("doc_id", n.cast("bigint").alias("n_tokens"))
    return all_docs.join(reassembled, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept_tokens"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


_EVIDENCE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                        ' '), x -> x <> '') AS t
    FROM documents),
shing AS (
    SELECT DISTINCT doc_id,
           unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
    FROM toks),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shing GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS isect
    FROM shing a JOIN shing b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY 1, 2),
pairs AS (
    SELECT i.doc_a, i.doc_b,
           ROUND(i.isect * 1.0 / (sa.sz + sb.sz - i.isect), 4) AS jaccard
    FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                 JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE i.isect * 1.0 / (sa.sz + sb.sz - i.isect) >= 0.5),
eligible AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= {W_SPAN}),
wins AS (
    SELECT doc_id, s,
           md5(array_to_string(list_slice(t, s, s + {W_SPAN} - 1), ' ')) AS h
    FROM (SELECT doc_id, t, unnest(range(1, n - {W_SPAN} + 2)) AS s FROM eligible)),
m AS (
    SELECT p.doc_a, p.doc_b, p.jaccard, wa.s AS sa, wa.s - wb.s AS diag
    FROM pairs p
    JOIN wins wa ON wa.doc_id = p.doc_a
    JOIN wins wb ON wb.doc_id = p.doc_b AND wb.h = wa.h),
runs AS (
    SELECT doc_a, doc_b, jaccard, diag,
           sa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag
                                   ORDER BY sa) AS grp,
           sa
    FROM (SELECT DISTINCT doc_a, doc_b, jaccard, diag, sa FROM m)),
spans AS (
    SELECT doc_a, doc_b, jaccard,
           CAST(COUNT(*) + {W_SPAN} - 1 AS BIGINT) AS span_tokens
    FROM runs GROUP BY doc_a, doc_b, jaccard, diag, grp)
SELECT doc_a, doc_b, jaccard,
       CAST(MAX(span_tokens) AS BIGINT) AS longest_shared_span,
       CAST(COUNT(*) AS BIGINT) AS n_shared_runs
FROM spans GROUP BY doc_a, doc_b, jaccard
"""


@_register("dedup_pair_evidence", _EVIDENCE_ORACLE)
def dedup_pair_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVIDENCE for near-dup verdicts: for every exact-Jaccard pair at
    t ≥ 0.5, the longest contiguous shared token span (via matching
    stride-1 window hashes grouped into diagonal runs — two windows k
    apart in BOTH docs extend one run) plus the number of distinct
    shared runs.  This is the reviewer's view a dedup pipeline owes its
    users: "these two are 0.8-similar AND share a 57-token verbatim
    block" is actionable; a bare score is not.

    Scale: the window relation is corpus-sized, but it is pruned by the
    PAIR join before the hash equijoin — evidence cost is proportional
    to candidate pairs × doc windows, never corpus².  Diagonal runs are
    the gaps-and-islands idiom keyed by (pair, s_a − s_b).
    Determinism: hashes, positions, run arithmetic all exact integers;
    jaccard reuses the registered rounding.
    """
    from dffoo_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, id_col="doc_id", text_col="text", n=3, threshold=0.5, max_doc_frequency=None
    )
    toks = d.select("doc_id", TX.tokens(TX.normalized_text("text")).alias("t")).where(
        F.size("t") >= W_SPAN
    )
    n = F.size("t")
    wins = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n - W_SPAN + 1)).alias("s"),
        "t",
    ).select(
        "doc_id",
        "s",
        F.md5(F.concat_ws(" ", F.slice(F.col("t"), F.col("s"), W_SPAN))).alias("h"),
    )
    wa = wins.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"), "h")
    wb = wins.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"), "h")
    m = (
        pairs.join(wa, "doc_a")
        .join(wb, ["doc_b", "h"])
        .select("doc_a", "doc_b", "jaccard", "sa", (F.col("sa") - F.col("sb")).alias("diag"))
        .distinct()
    )
    from pyspark.sql import Window

    wrun = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("sa")
    runs = m.withColumn("grp", F.col("sa") - F.row_number().over(wrun))
    spans = runs.groupBy("doc_a", "doc_b", "jaccard", "diag", "grp").agg(
        (F.count(F.lit(1)) + W_SPAN - 1).cast("bigint").alias("span_tokens")
    )
    return spans.groupBy("doc_a", "doc_b", "jaccard").agg(
        F.max("span_tokens").cast("bigint").alias("longest_shared_span"),
        F.count(F.lit(1)).cast("bigint").alias("n_shared_runs"),
    )
