"""Registered table-profile queries (operators/profile.py).

The oracle is generated per column from the same (name, kind) spec the
Spark operator derives from the schema, so both sides always profile the
identical column set with identical type mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dffoo_data_pipeline_spark.operators.profile import profile_table
from dffoo_data_pipeline_spark.sources.readers import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_LINEITEM_COLS = [
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def _branch(table: str, c: str, kind: str) -> str:
    if kind == "num":
        mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        mns = mxs = "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mn, mx = f"CAST(epoch_us(MIN({c})) AS DOUBLE)", f"CAST(epoch_us(MAX({c})) AS DOUBLE)"
        mns = mxs = "CAST(NULL AS VARCHAR)"
    else:
        mn = mx = "CAST(NULL AS DOUBLE)"
        mns, mxs = f"MIN({c})", f"MAX({c})"
    return (
        f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        f"{mn} AS min_num, {mx} AS max_num, {mns} AS min_str, {mxs} AS max_str "
        f"FROM {table}"
    )


_PROFILE_LINEITEM_ORACLE = "\nUNION ALL\n".join(
    _branch("lineitem", c, k) for c, k in _LINEITEM_COLS
)


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan profile of every lineitem column (exact distincts so the
    oracle can hash-check; `profile_table(df, approx=True)` is the
    100 TB variant — HLL distincts, no Expand, same schema)."""
    return profile_table(load_table(spark, sf_dir, "lineitem", fan_out=True))


QUERIES["profile_lineitem"] = profile_lineitem
ORACLES["profile_lineitem"] = _PROFILE_LINEITEM_ORACLE


_QUANTILE_PS = [0.25, 0.5, 0.75, 0.95, 0.99]
_QUANTILE_COLS = ["l_quantity", "l_extendedprice", "l_discount"]

_PROFILE_QUANTILES_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, CAST({p} AS DOUBLE) AS p, "
    f"FLOOR(quantile_cont({c}, {p}) * 1000000 + 0.5) / 1000000 AS q "
    f"FROM lineitem"
    for c in _QUANTILE_COLS
    for p in _QUANTILE_PS
)


def profile_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per numeric column, one row per
    (column, p).  Spark's `percentile` and DuckDB's `quantile_cont` share
    the linear-interpolation definition (probed bit-identical; the 1e-6
    round guards residual ulp).

    Scale: EXACT percentile buffers each group's values — fine per
    column at test scale, wrong at 100 TB; the scale path is
    `approx_percentile` (Greenwald-Khanna sketch, mergeable map-side),
    a drop-in with identical output shape (rows-only checkable).  All
    columns compute in one aggregate = one scan.
    """
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.functions.numeric import round_det

    li = load_table(spark, sf_dir, "lineitem", fan_out=True)
    ps = ", ".join(str(p) for p in _QUANTILE_PS)
    one = li.agg(
        *[
            F.expr(f"percentile({c}, array({ps}))").alias(f"{c}__q")
            for c in _QUANTILE_COLS
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.lit(p).alias("p"),
                round_det(F.col(f"{c}__q")[i], 6).alias("q"),
            )
            for c in _QUANTILE_COLS
            for i, p in enumerate(_QUANTILE_PS)
        ]
    )
    return one.select(F.inline(rows))


QUERIES["profile_quantiles_lineitem"] = profile_quantiles_lineitem
ORACLES["profile_quantiles_lineitem"] = _PROFILE_QUANTILES_ORACLE


_GROUP_PS = [0.25, 0.5, 0.75]

_GROUP_QUANTILES_ORACLE = "\nUNION ALL\n".join(
    f"SELECT lang, CAST({p} AS DOUBLE) AS p, "
    f"FLOOR(quantile_cont(n_chars, {p}) * 1000000 + 0.5) / 1000000 AS q "
    f"FROM documents GROUP BY lang"
    for p in _GROUP_PS
)


def profile_quantiles_docs_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact quantiles: document-length distribution per language
    (the per-stratum length profile behind curation length gates).

    Scale: one shuffle on `lang`; exact percentile buffers per GROUP (a
    language's docs), which caps memory at the largest stratum — already
    marginal at 100 TB, so the scale path is the same query with
    `approx_percentile` (mergeable sketch, bounded state per group).
    """
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.functions.numeric import round_det

    d = load_table(spark, sf_dir, "documents", fan_out=True)
    ps = ", ".join(str(p) for p in _GROUP_PS)
    one = d.groupBy("lang").agg(
        F.expr(f"percentile(n_chars, array({ps}))").alias("qs")
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(p).alias("p"),
                round_det(F.col("qs")[i], 6).alias("q"),
            )
            for i, p in enumerate(_GROUP_PS)
        ]
    )
    return one.select("lang", F.inline(rows))


QUERIES["profile_quantiles_docs_by_lang"] = profile_quantiles_docs_by_lang
ORACLES["profile_quantiles_docs_by_lang"] = _GROUP_QUANTILES_ORACLE


_CORR_ORACLE = """
WITH m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(l_quantity      AS DECIMAL(18,2))) AS sx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
           SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))
             AS sxx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))
             AS syy,
           SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))
             AS sxy
    FROM lineitem)
SELECT n,
       FLOOR((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / (n - 1) * 10000 + 0.5) / 10000 AS covar_qty_price,
       FLOOR((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                    * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n))
             * 1000000 + 0.5) / 1000000 AS corr_qty_price,
       FLOOR(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                  / (n - 1)) * 10000 + 0.5) / 10000 AS stddev_qty
FROM m
"""


def profile_corr_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation / sample covariance / stddev of quantity vs
    price — computed from EXACT DECIMAL moment sums (n, Σx, Σy, Σx²,
    Σy², Σxy) rather than `F.corr`/`F.covar_samp`: the built-ins
    accumulate doubles in partition order, so their last ulps are
    nondeterministic run-to-run AND engine-to-engine, which an exact
    value hash rejects.  Five decimal sums are partition-order-exact;
    the textbook formulas then run on identical doubles in both engines.

    Scale: one scan, one single-row aggregate (map-side partials — the
    five sums are each one DECIMAL per partition); no shuffle of data
    rows at all.  This is the same one-pass moment trick every
    distributed stats library uses, minus the floating-point merge.
    """
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.functions.numeric import round_det

    # no fan-out: exchange outweighs the cheap map stage (A/B at sf0.1)
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    cov_num = sxy - sx * sy / n
    varx = sxx - sx * sx / n
    vary = syy - sy * sy / n
    return m.select(
        F.col("n"),
        round_det(cov_num / (n - 1), 4).alias("covar_qty_price"),
        round_det(cov_num / F.sqrt(varx * vary), 6).alias("corr_qty_price"),
        round_det(F.sqrt(varx / (n - 1)), 4).alias("stddev_qty"),
    )


QUERIES["profile_corr_lineitem"] = profile_corr_lineitem
ORACLES["profile_corr_lineitem"] = _CORR_ORACLE


APPROX_QUANTILE_ACCURACY = 10_000  # GK sketch knob: rank error <= n/accuracy


def profile_approx_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB quantile path made first-class: `approx_percentile`
    (Greenwald-Khanna sketch — bounded memory, mergeable map-side, one
    scan for all columns) with the SAME output shape as the exact
    `profile_quantiles_lineitem`, so callers swap by name.  Rows-only
    for the driver (sketch internals are engine-specific); the rank
    error contract |rank(q̂) − p·n| ≤ n/accuracy is asserted against
    the exact quantiles in tests/test_profile.py.
    """
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem", fan_out=True)
    ps = ", ".join(str(p) for p in _QUANTILE_PS)
    one = li.agg(
        *[
            F.expr(
                f"approx_percentile({c}, array({ps}), {APPROX_QUANTILE_ACCURACY})"
            ).alias(f"{c}__q")
            for c in _QUANTILE_COLS
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.lit(p).alias("p"),
                F.col(f"{c}__q")[i].cast("double").alias("q"),
            )
            for c in _QUANTILE_COLS
            for i, p in enumerate(_QUANTILE_PS)
        ]
    )
    return one.select(F.inline(rows))


QUERIES["profile_approx_quantiles_lineitem"] = profile_approx_quantiles_lineitem


_SAMPLE_EST_ORACLE = """
WITH agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_total,
           CAST(SUM(CASE WHEN substr(md5('samp:' || CAST(l_orderkey AS VARCHAR)
                                     || ':' || CAST(l_linenumber AS VARCHAR)), 1, 1)
                              = '0' THEN 1 ELSE 0 END) AS BIGINT) AS n_s,
           CAST(SUM(CASE WHEN substr(md5('samp:' || CAST(l_orderkey AS VARCHAR)
                                     || ':' || CAST(l_linenumber AS VARCHAR)), 1, 1)
                              = '0' THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                AS BIGINT) AS s1,
           CAST(SUM(CASE WHEN substr(md5('samp:' || CAST(l_orderkey AS VARCHAR)
                                     || ':' || CAST(l_linenumber AS VARCHAR)), 1, 1)
                              = '0' THEN CAST(l_quantity AS BIGINT)
                                         * CAST(l_quantity AS BIGINT) ELSE 0 END)
                AS BIGINT) AS s2
    FROM lineitem),
calc AS (
    SELECT n_total, n_s,
           CAST(s1 AS DOUBLE) / n_s AS est_mean,
           sqrt(CAST(n_s * s2 - s1 * s1 AS DOUBLE)
                / (CAST(n_s AS DOUBLE) * (n_s - 1)) / n_s
                * (CAST(n_total - n_s AS DOUBLE) / (n_total - 1))) AS se,
           CAST(sum_total AS DOUBLE) / n_total AS exact_mean
    FROM agg)
SELECT n_total, n_s AS n_sample,
       FLOOR(est_mean * 1000000 + 0.5) / 1000000 AS est_mean,
       FLOOR(se * 1000000 + 0.5) / 1000000 AS se,
       FLOOR((est_mean - 1.96 * se) * 1000000 + 0.5) / 1000000 AS ci95_lo,
       FLOOR((est_mean + 1.96 * se) * 1000000 + 0.5) / 1000000 AS ci95_hi,
       FLOOR(exact_mean * 1000000 + 0.5) / 1000000 AS exact_mean,
       (FLOOR((est_mean - 1.96 * se) * 1000000 + 0.5) / 1000000
          <= FLOOR(exact_mean * 1000000 + 0.5) / 1000000
        AND FLOOR(exact_mean * 1000000 + 0.5) / 1000000
          <= FLOOR((est_mean + 1.96 * se) * 1000000 + 0.5) / 1000000) AS covered95,
       (FLOOR((est_mean - 2.576 * se) * 1000000 + 0.5) / 1000000
          <= FLOOR(exact_mean * 1000000 + 0.5) / 1000000
        AND FLOOR(exact_mean * 1000000 + 0.5) / 1000000
          <= FLOOR((est_mean + 2.576 * se) * 1000000 + 0.5) / 1000000) AS covered99
FROM calc
"""


def profile_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate-with-error-bar audit: the mean of l_quantity estimated
    from a deterministic 1/16 sample (md5 first hex digit of the row
    key) with its standard error, finite-population-corrected 95%/99%
    CIs, and the exact mean beside it plus coverage verdicts — the
    "measure cheaply and KNOW the error" discipline; at 100 TB most
    profiling questions should be answered this way, with the exact
    pass reserved for when the CI is too wide.  The fixture honestly
    shows calibration in action: this particular md5 draw lands ~2.2 SE
    high at sf0.01 (a 1-in-30 draw), so covered95 is FALSE there while
    covered99 is TRUE — which is exactly what a 95% interval is allowed
    to do and what the audit exists to surface.

    Scale: ONE scan — sample membership is a per-row hash predicate, so
    sample and exact moments are conditional aggregates in the same
    map-side-combined pass (no second read, no shuffle beyond the 1-row
    agg).  Determinism: quantities are integral, so all moments are
    exact BIGINTs; the estimator ((nΣx²−(Σx)²)/(n(n−1)), fpc
    (N−n)/(N−1)) is the identical IEEE expression on both engines;
    `covered` compares the 1e-6-rounded bounds so the boolean can't
    straddle an ulp.
    """
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.functions.numeric import round_det

    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.lit("samp:"),
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    in_s = F.substring(F.md5(key), 1, 1) == "0"
    q = F.col("l_quantity").cast("bigint")
    agg = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(q).cast("bigint").alias("sum_total"),
        F.sum(F.when(in_s, 1).otherwise(0)).cast("bigint").alias("n_s"),
        F.sum(F.when(in_s, q).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(in_s, q * q).otherwise(0)).cast("bigint").alias("s2"),
    )
    n_total, n_s = F.col("n_total"), F.col("n_s")
    est = F.col("s1").cast("double") / n_s
    se = F.sqrt(
        (n_s * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (n_s.cast("double") * (n_s - 1))
        / n_s
        * ((n_total - n_s).cast("double") / (n_total - 1))
    )
    exact = F.col("sum_total").cast("double") / n_total
    lo95, hi95 = round_det(est - 1.96 * se, 6), round_det(est + 1.96 * se, 6)
    lo99, hi99 = round_det(est - 2.576 * se, 6), round_det(est + 2.576 * se, 6)
    ex = round_det(exact, 6)
    return agg.select(
        "n_total",
        n_s.alias("n_sample"),
        round_det(est, 6).alias("est_mean"),
        round_det(se, 6).alias("se"),
        lo95.alias("ci95_lo"),
        hi95.alias("ci95_hi"),
        ex.alias("exact_mean"),
        ((lo95 <= ex) & (ex <= hi95)).alias("covered95"),
        ((lo99 <= ex) & (ex <= hi99)).alias("covered99"),
    )


QUERIES["profile_sample_estimate"] = profile_sample_estimate
ORACLES["profile_sample_estimate"] = _SAMPLE_EST_ORACLE


_REGRESSION_ORACLE = """
WITH mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sd,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sdd,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sxd,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(14,4))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(14,4))
                    * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syx,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(14,4))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS syd,
           CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(14,4)) AS DECIMAL(24,4))
                    * CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(14,4))) AS DOUBLE) AS syy
    FROM lineitem),
solved AS (
    SELECT n, sx, sd, sxx, sdd, sxd, sy, syx, syd, syy,
           n * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd)
             + sd * (sx * sxd - sxx * sd) AS det,
           sy * (sxx * sdd - sxd * sxd) - sx * (syx * sdd - sxd * syd)
             + sd * (syx * sxd - sxx * syd) AS det0,
           n * (syx * sdd - sxd * syd) - sy * (sx * sdd - sxd * sd)
             + sd * (sx * syd - syx * sd) AS det1,
           n * (sxx * syd - syx * sxd) - sx * (sx * syd - syx * sd)
             + sy * (sx * sxd - sxx * sd) AS det2
    FROM solved_base),
coef AS (
    SELECT n, sx, sd, sxx, sdd, sxd, sy, syx, syd, syy,
           FLOOR(det0 / det * 1000000 + 0.5) / 1000000 AS b0,
           FLOOR(det1 / det * 1000000 + 0.5) / 1000000 AS b1,
           FLOOR(det2 / det * 1000000 + 0.5) / 1000000 AS b2
    FROM solved)
SELECT n, b0, b1 AS b_price, b2 AS b_discount,
       FLOOR((1 - (syy - 2 * (b0 * sy + b1 * syx + b2 * syd)
                   + (b0 * b0 * n + b1 * b1 * sxx + b2 * b2 * sdd
                      + 2 * b0 * b1 * sx + 2 * b0 * b2 * sd
                      + 2 * b1 * b2 * sxd))
                  / (syy - sy * sy / n)) * 1000000 + 0.5) / 1000000 AS r2
FROM coef
"""
_REGRESSION_ORACLE = _REGRESSION_ORACLE.replace("FROM solved_base", "FROM mom")


def lineitem_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form linear-model fitting from EXACT sufficient statistics:
    discounted revenue (extendedprice·(1−discount)) regressed on
    (extendedprice, discount) by the normal equations — all nine moments
    are exact DECIMAL/BIGINT sums collected in ONE map-side-combined
    pass, the 3×3 system is solved by Cramer's rule in scalar column
    math, and R² comes from the same moments (no residual pass).  The
    fit genuinely recovers structure: the solver rediscovers the pricing
    formula's linearization (b_price ≈ 1−E[discount], b_discount ≈
    −E[price], R² ≈ 0.99 — pinned, along with a numpy lstsq
    cross-check).  This is the aggregative-ML contract: when the model
    has a closed form, training at 100 TB is one aggregation — no
    iteration, no sampling, no driver loop.  (Fitting price on quantity
    was the first attempt — the synthetic columns are mutually
    independent, R² = 0.00005; the profiler reporting "no signal" is
    itself the correct answer there.)

    Determinism: money and discount carry exactly 2 decimals (the
    functions/numeric.py data contract) so every cross-moment is an
    exact DECIMAL sum; both engines cast the same exact decimals to
    double and evaluate the same determinant expressions, so
    coefficients match to the bit before their 1e-6 rounds.
    """
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.functions import numeric as N
    from dffoo_data_pipeline_spark.functions.numeric import round_det

    li = load_table(spark, sf_dir, "lineitem")
    x = N.dec2("l_extendedprice")
    dd = N.dec_small("l_discount")
    y = (x * (1 - dd)).cast("decimal(14,4)")
    mom = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(dd).cast("double").alias("sd"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(dd * dd).cast("double").alias("sdd"),
        F.sum(x * dd).cast("double").alias("sxd"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * x).cast("double").alias("syx"),
        F.sum(y * dd).cast("double").alias("syd"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sd = F.col("n"), F.col("sx"), F.col("sd")
    sxx, sdd, sxd = F.col("sxx"), F.col("sdd"), F.col("sxd")
    sy, syx, syd, syy = F.col("sy"), F.col("syx"), F.col("syd"), F.col("syy")
    det = n * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd) + sd * (
        sx * sxd - sxx * sd
    )
    det0 = sy * (sxx * sdd - sxd * sxd) - sx * (syx * sdd - sxd * syd) + sd * (
        syx * sxd - sxx * syd
    )
    det1 = n * (syx * sdd - sxd * syd) - sy * (sx * sdd - sxd * sd) + sd * (
        sx * syd - syx * sd
    )
    det2 = n * (sxx * syd - syx * sxd) - sx * (sx * syd - syx * sd) + sy * (
        sx * sxd - sxx * sd
    )
    coef = mom.select(
        "n", "sx", "sd", "sxx", "sdd", "sxd", "sy", "syx", "syd", "syy",
        round_det(det0 / det, 6).alias("b0"),
        round_det(det1 / det, 6).alias("b1"),
        round_det(det2 / det, 6).alias("b2"),
    )
    b0, b1, b2 = F.col("b0"), F.col("b1"), F.col("b2")
    sse = syy - 2 * (b0 * sy + b1 * syx + b2 * syd) + (
        b0 * b0 * n
        + b1 * b1 * sxx
        + b2 * b2 * sdd
        + 2 * b0 * b1 * sx
        + 2 * b0 * b2 * sd
        + 2 * b1 * b2 * sxd
    )
    return coef.select(
        "n",
        b0.alias("b0"),
        b1.alias("b_price"),
        b2.alias("b_discount"),
        round_det(1 - sse / (syy - sy * sy / n), 6).alias("r2"),
    )


QUERIES["lineitem_price_regression"] = lineitem_price_regression
ORACLES["lineitem_price_regression"] = _REGRESSION_ORACLE


_CONF_KEY = (
    "substr(md5('samp:' || CAST(l_orderkey AS VARCHAR) || ':' "
    "|| CAST(l_linenumber AS VARCHAR)), 1, 1)"
)
_CONF_Y = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(14,4))"
)

_CONFORMAL_ORACLE = f"""
WITH base AS (
    SELECT CAST(l_extendedprice AS DECIMAL(12,2)) AS x,
           CAST(l_discount AS DECIMAL(4,2)) AS d,
           {_CONF_Y} AS y,
           CASE WHEN {_CONF_KEY} < '8' THEN 'train'
                WHEN {_CONF_KEY} < 'c' THEN 'cal'
                ELSE 'test' END AS split
    FROM lineitem),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(d) AS DOUBLE) AS sd,
           CAST(SUM(x * x) AS DOUBLE) AS sxx,
           CAST(SUM(d * d) AS DOUBLE) AS sdd,
           CAST(SUM(x * d) AS DOUBLE) AS sxd,
           CAST(SUM(y) AS DOUBLE) AS sy,
           CAST(SUM(y * x) AS DOUBLE) AS syx,
           CAST(SUM(y * d) AS DOUBLE) AS syd
    FROM base WHERE split = 'train'),
coef AS (
    SELECT FLOOR((sy * (sxx * sdd - sxd * sxd) - sx * (syx * sdd - sxd * syd)
                  + sd * (syx * sxd - sxx * syd))
                 / (n * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd)
                    + sd * (sx * sxd - sxx * sd)) * 1000000 + 0.5) / 1000000 AS b0,
           FLOOR((n * (syx * sdd - sxd * syd) - sy * (sx * sdd - sxd * sd)
                  + sd * (sx * syd - syx * sd))
                 / (n * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd)
                    + sd * (sx * sxd - sxx * sd)) * 1000000 + 0.5) / 1000000 AS b1,
           FLOOR((n * (sxx * syd - syx * sxd) - sx * (sx * syd - syx * sd)
                  + sy * (sx * sxd - sxx * sd))
                 / (n * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd)
                    + sd * (sx * sxd - sxx * sd)) * 1000000 + 0.5) / 1000000 AS b2
    FROM mom),
resid AS (
    SELECT b.split,
           ABS(FLOOR((CAST(b.y AS DOUBLE)
                      - (c.b0 + c.b1 * CAST(b.x AS DOUBLE)
                         + c.b2 * CAST(b.d AS DOUBLE)))
                     * 1000000 + 0.5) / 1000000) AS ar
    FROM base b CROSS JOIN coef c),
q AS (
    SELECT FLOOR(quantile_cont(ar, 0.95) * 1000000 + 0.5) / 1000000 AS q95
    FROM resid WHERE split = 'cal')
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM resid WHERE split = 'train') AS n_train,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM resid WHERE split = 'cal') AS n_cal,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM resid WHERE split = 'test') AS n_test,
       (SELECT q95 FROM q) AS q95,
       (SELECT FLOOR(AVG(CASE WHEN ar <= (SELECT q95 FROM q)
                              THEN 1.0 ELSE 0.0 END) * 1000000 + 0.5) / 1000000
        FROM resid WHERE split = 'test') AS coverage
"""


def lineitem_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals around the closed-form
    revenue regression: fit on a 50% hash split, take the 95th
    percentile of absolute residuals on a 25% CALIBRATION split, and
    measure interval coverage on the held-out 25% — the
    distribution-free uncertainty contract (coverage ≈ the nominal 95%
    for ANY model, guaranteed by row exchangeability alone, Vovk et
    al.).  The measured coverage ≈ 0.95 is pinned in
    tests/test_profile.py; this is the piece that turns any point
    predictor in this repo into a calibrated interval predictor.

    Scale: fit moments are ONE conditional aggregation; residuals are a
    map-side projection against the broadcast 1-row coefficient frame
    (the shared base relation is lazily checkpointed, so the corpus is
    read once); the calibration quantile is an exact percentile over
    the cal split (approx_percentile at 100 TB, same contract) and
    coverage is one more conditional aggregate.  Determinism: the
    regression discipline (exact DECIMAL moments, identical determinant
    expressions) plus residuals floor-rounded at 1e-6 before the
    percentile, which Spark and DuckDB interpolate identically
    (profile_quantiles precedent).
    """
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.functions import numeric as N
    from dffoo_data_pipeline_spark.functions.numeric import round_det

    li = load_table(spark, sf_dir, "lineitem")
    key = F.substring(
        F.md5(
            F.concat(
                F.lit("samp:"),
                F.col("l_orderkey").cast("string"),
                F.lit(":"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        1,
        1,
    )
    x = N.dec2("l_extendedprice")
    dd = N.dec_small("l_discount")
    y = (x * (1 - dd)).cast("decimal(14,4)")
    base = li.select(
        x.alias("x"),
        dd.alias("d"),
        y.alias("y"),
        F.when(key < "8", "train").when(key < "c", "cal").otherwise("test").alias(
            "split"
        ),
    ).localCheckpoint(eager=False)
    mom = base.where(F.col("split") == "train").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("d").cast("double").alias("sd"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
        F.sum(F.col("x") * F.col("d")).cast("double").alias("sxd"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("x")).cast("double").alias("syx"),
        F.sum(F.col("y") * F.col("d")).cast("double").alias("syd"),
    )
    n, sx, sd = F.col("n"), F.col("sx"), F.col("sd")
    sxx, sdd, sxd = F.col("sxx"), F.col("sdd"), F.col("sxd")
    sy, syx, syd = F.col("sy"), F.col("syx"), F.col("syd")
    det = n * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd) + sd * (
        sx * sxd - sxx * sd
    )
    det0 = sy * (sxx * sdd - sxd * sxd) - sx * (syx * sdd - sxd * syd) + sd * (
        syx * sxd - sxx * syd
    )
    det1 = n * (syx * sdd - sxd * syd) - sy * (sx * sdd - sxd * sd) + sd * (
        sx * syd - syx * sd
    )
    det2 = n * (sxx * syd - syx * sxd) - sx * (sx * syd - syx * sd) + sy * (
        sx * sxd - sxx * sd
    )
    coef = mom.select(
        round_det(det0 / det, 6).alias("b0"),
        round_det(det1 / det, 6).alias("b1"),
        round_det(det2 / det, 6).alias("b2"),
    )
    resid = base.crossJoin(F.broadcast(coef)).select(
        "split",
        F.abs(
            round_det(
                F.col("y").cast("double")
                - (
                    F.col("b0")
                    + F.col("b1") * F.col("x").cast("double")
                    + F.col("b2") * F.col("d").cast("double")
                ),
                6,
            )
        ).alias("ar"),
    ).localCheckpoint(eager=False)
    q = resid.where(F.col("split") == "cal").agg(
        round_det(F.expr("percentile(ar, 0.95)"), 6).alias("q95")
    )
    return (
        resid.crossJoin(F.broadcast(q))
        .groupBy()
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
            .cast("bigint")
            .alias("n_train"),
            F.sum(F.when(F.col("split") == "cal", 1).otherwise(0))
            .cast("bigint")
            .alias("n_cal"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
            .cast("bigint")
            .alias("n_test"),
            F.max("q95").alias("q95"),
            round_det(
                F.sum(
                    F.when(
                        (F.col("split") == "test") & (F.col("ar") <= F.col("q95")), 1.0
                    ).otherwise(
                        F.when(F.col("split") == "test", 0.0).otherwise(F.lit(None))
                    )
                )
                / F.sum(F.when(F.col("split") == "test", 1).otherwise(0)),
                6,
            ).alias("coverage"),
        )
    )


QUERIES["lineitem_conformal_interval"] = lineitem_conformal_interval
ORACLES["lineitem_conformal_interval"] = _CONFORMAL_ORACLE


_CV_FOLDS = 5
_CV_KEY = (
    "(('0x' || substr(md5('cv:' || CAST(l_orderkey AS VARCHAR) || ':' "
    "|| CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT) % 5"
)

_CV_ORACLE = f"""
WITH base AS (
    SELECT CAST(l_extendedprice AS DECIMAL(12,2)) AS x,
           CAST(l_discount AS DECIMAL(4,2)) AS d,
           {_CONF_Y} AS y,
           {_CV_KEY} AS fold
    FROM lineitem),
fm AS (
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(x) AS sx, SUM(d) AS sd, SUM(x * x) AS sxx,
           SUM(d * d) AS sdd, SUM(x * d) AS sxd,
           SUM(y) AS sy, SUM(y * x) AS syx, SUM(y * d) AS syd
    FROM base GROUP BY fold),
hold AS (
    SELECT fold,
           CAST(SUM(n)   OVER () - n   AS DOUBLE) AS n_tr,
           CAST(SUM(sx)  OVER () - sx  AS DOUBLE) AS sx,
           CAST(SUM(sd)  OVER () - sd  AS DOUBLE) AS sd,
           CAST(SUM(sxx) OVER () - sxx AS DOUBLE) AS sxx,
           CAST(SUM(sdd) OVER () - sdd AS DOUBLE) AS sdd,
           CAST(SUM(sxd) OVER () - sxd AS DOUBLE) AS sxd,
           CAST(SUM(sy)  OVER () - sy  AS DOUBLE) AS sy,
           CAST(SUM(syx) OVER () - syx AS DOUBLE) AS syx,
           CAST(SUM(syd) OVER () - syd AS DOUBLE) AS syd
    FROM fm),
coef AS (
    SELECT fold,
           FLOOR((sy * (sxx * sdd - sxd * sxd) - sx * (syx * sdd - sxd * syd)
                  + sd * (syx * sxd - sxx * syd))
                 / (n_tr * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd)
                    + sd * (sx * sxd - sxx * sd)) * 1000000 + 0.5) / 1000000 AS b0,
           FLOOR((n_tr * (syx * sdd - sxd * syd) - sy * (sx * sdd - sxd * sd)
                  + sd * (sx * syd - syx * sd))
                 / (n_tr * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd)
                    + sd * (sx * sxd - sxx * sd)) * 1000000 + 0.5) / 1000000 AS b1,
           FLOOR((n_tr * (sxx * syd - syx * sxd) - sx * (sx * syd - syx * sd)
                  + sy * (sx * sxd - sxx * sd))
                 / (n_tr * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd)
                    + sd * (sx * sxd - sxx * sd)) * 1000000 + 0.5) / 1000000 AS b2
    FROM hold)
SELECT b.fold, CAST(COUNT(*) AS BIGINT) AS n_oos,
       FLOOR(sqrt(CAST(SUM(CAST(FLOOR(
                 (CAST(b.y AS DOUBLE) - (c.b0 + c.b1 * CAST(b.x AS DOUBLE)
                                         + c.b2 * CAST(b.d AS DOUBLE)))
                 * (CAST(b.y AS DOUBLE) - (c.b0 + c.b1 * CAST(b.x AS DOUBLE)
                                           + c.b2 * CAST(b.d AS DOUBLE)))
                 * 1000 + 0.5) / 1000 AS DECIMAL(24,3))) AS DOUBLE)
                  / COUNT(*)) * 1000000 + 0.5) / 1000000 AS rmse_oos
FROM base b JOIN coef c USING (fold)
GROUP BY b.fold
"""


def lineitem_regression_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation of the revenue regression in TWO passes
    REGARDLESS of k: pass 1 aggregates sufficient statistics PER FOLD;
    each fold's training moments are then total-minus-fold (sufficient
    statistics are additive, so "all data except fold k" costs a
    subtraction, not a rescan); pass 2 scores every row against its own
    fold's held-out coefficients for the out-of-sample RMSE.  The naive
    formulation retrains k times over k−1/k of the data — O(k) passes;
    additivity makes CV effectively free at 100 TB.

    Determinism: per-fold moments stay DECIMAL through the 5-row window
    subtraction (exact), the determinant solve is the regression
    discipline, per-row squared errors are floor-rounded at 1e-3 into
    DECIMAL(24,3) so the fold sums are partition-order-exact, and the
    final RMSE rounds at 1e-6.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.functions import numeric as N
    from dffoo_data_pipeline_spark.functions.numeric import round_det

    li = load_table(spark, sf_dir, "lineitem")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cv:"),
                        F.col("l_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _CV_FOLDS
    )
    x = N.dec2("l_extendedprice")
    dd = N.dec_small("l_discount")
    y = (x * (1 - dd)).cast("decimal(14,4)")
    base = li.select(
        x.alias("x"), dd.alias("d"), y.alias("y"), fold.alias("fold")
    ).localCheckpoint(eager=False)
    fm = base.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("d").alias("sd"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("x") * F.col("d")).alias("sxd"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("x")).alias("syx"),
        F.sum(F.col("y") * F.col("d")).alias("syd"),
    )
    wall = Window.partitionBy()
    hold = fm.select(
        "fold",
        *[
            (F.sum(c).over(wall) - F.col(c)).cast("double").alias(c2)
            for c, c2 in [
                ("n", "n_tr"), ("sx", "sx"), ("sd", "sd"), ("sxx", "sxx"),
                ("sdd", "sdd"), ("sxd", "sxd"), ("sy", "sy"), ("syx", "syx"),
                ("syd", "syd"),
            ]
        ],
    )
    n, sx, sd = F.col("n_tr"), F.col("sx"), F.col("sd")
    sxx, sdd, sxd = F.col("sxx"), F.col("sdd"), F.col("sxd")
    sy, syx, syd = F.col("sy"), F.col("syx"), F.col("syd")
    det = n * (sxx * sdd - sxd * sxd) - sx * (sx * sdd - sxd * sd) + sd * (
        sx * sxd - sxx * sd
    )
    det0 = sy * (sxx * sdd - sxd * sxd) - sx * (syx * sdd - sxd * syd) + sd * (
        syx * sxd - sxx * syd
    )
    det1 = n * (syx * sdd - sxd * syd) - sy * (sx * sdd - sxd * sd) + sd * (
        sx * syd - syx * sd
    )
    det2 = n * (sxx * syd - syx * sxd) - sx * (sx * syd - syx * sd) + sy * (
        sx * sxd - sxx * sd
    )
    coef = hold.select(
        "fold",
        round_det(det0 / det, 6).alias("b0"),
        round_det(det1 / det, 6).alias("b1"),
        round_det(det2 / det, 6).alias("b2"),
    )
    err = F.col("y").cast("double") - (
        F.col("b0")
        + F.col("b1") * F.col("x").cast("double")
        + F.col("b2") * F.col("d").cast("double")
    )
    return (
        base.join(F.broadcast(coef), "fold")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_oos"),
            round_det(
                F.sqrt(
                    F.sum(round_det(err * err, 3).cast("decimal(24,3)")).cast("double")
                    / F.count(F.lit(1))
                ),
                6,
            ).alias("rmse_oos"),
        )
    )


QUERIES["lineitem_regression_cv"] = lineitem_regression_cv
ORACLES["lineitem_regression_cv"] = _CV_ORACLE


_BOOT_B = 32
# cumulative Poisson(1) CDF thresholds, spelled identically in both engines
_POIS_CDF = [
    "0.3678794412", "0.7357588823", "0.9196986029", "0.9810118431",
    "0.9963401532", "0.9994058151", "0.9999167589", "0.9999897508",
    "0.9999988486",
]


def _pois_sql(u: str) -> str:
    w = f"CASE WHEN {u} < {_POIS_CDF[0]} THEN 0 "
    for k in range(1, len(_POIS_CDF)):
        w += f"WHEN {u} < {_POIS_CDF[k]} THEN {k} "
    return w + f"ELSE {len(_POIS_CDF)} END"


_BOOT_U = (
    "((('0x' || substr(md5('bs:' || CAST(l_orderkey AS VARCHAR) || ':' "
    "|| CAST(l_linenumber AS VARCHAR) || ':' || CAST(r.b AS VARCHAR)), 1, 8))"
    "::BIGINT) + 0.5) / 4294967296.0"
)

_BOOTSTRAP_ORACLE = f"""
WITH reps AS (
    SELECT r.b,
           CAST(SUM({_pois_sql(_BOOT_U)}) AS BIGINT) AS sw,
           CAST(SUM({_pois_sql(_BOOT_U)} * CAST(l_quantity AS BIGINT))
                AS BIGINT) AS swx
    FROM lineitem, (SELECT unnest(range(1, {_BOOT_B + 1})) AS b) r
    GROUP BY r.b),
means AS (
    SELECT b, CAST(swx AS DOUBLE) / sw AS m FROM reps),
pt AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS em
    FROM lineitem)
SELECT (SELECT n FROM pt) AS n,
       FLOOR((SELECT em FROM pt) * 1000000 + 0.5) / 1000000 AS point_mean,
       FLOOR(quantile_cont(m, 0.025) * 1000000 + 0.5) / 1000000 AS ci_lo,
       FLOOR(quantile_cont(m, 0.975) * 1000000 + 0.5) / 1000000 AS ci_hi,
       FLOOR(sqrt((COUNT(*) * CAST(SUM(CAST(FLOOR(m * m * 1000000000 + 0.5)
                                            / 1000000000 AS DECIMAL(24,9)))
                                   AS DOUBLE)
                   - CAST(SUM(CAST(FLOOR(m * 1000000000 + 0.5) / 1000000000
                                   AS DECIMAL(20,9))) AS DOUBLE)
                     * CAST(SUM(CAST(FLOOR(m * 1000000000 + 0.5) / 1000000000
                                     AS DECIMAL(20,9))) AS DOUBLE))
                  / (COUNT(*) * (COUNT(*) - 1)))
             * 1000000 + 0.5) / 1000000 AS se_boot
FROM means
"""


def profile_bootstrap_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON bootstrap of the mean — the bootstrap that distributes:
    classical resampling needs a global draw of n rows per replicate (a
    shuffle per replicate); the Poisson trick gives every row an
    independent Poisson(1) replication weight per replicate, so all 32
    replicate means are conditional aggregates in ONE corpus pass and
    the replicate weights never materialize outside the map side.  Each
    weight is the inverse-CDF of a seeded md5-uniform — same literal
    thresholds in both engines, so replicates are reproducible and the
    whole resampling experiment is oracle-checked.  Output: the exact
    point mean, the percentile-bootstrap 95% CI, and the bootstrap SE
    (which the analytic SE of profile_sample_estimate cross-checks in
    tests/test_profile.py).

    Determinism: weights are exact integers, so each replicate's Σw and
    Σwx are exact BIGINTs and its mean is one IEEE divide; the 32-row
    stats frame rounds means into DECIMAL(20,9) before stddev and uses
    the shared interpolated-percentile definition for the CI.
    """
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.functions.numeric import round_det

    li = load_table(spark, sf_dir, "lineitem")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bs:"),
                        F.col("l_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("l_linenumber").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    w = F.when(u < float(_POIS_CDF[0]), 0)
    for k in range(1, len(_POIS_CDF)):
        w = w.when(u < float(_POIS_CDF[k]), k)
    w = w.otherwise(len(_POIS_CDF))
    q = F.col("l_quantity").cast("bigint")
    reps = (
        li.select(
            "l_orderkey",
            "l_linenumber",
            q.alias("q"),
            F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"),
        )
        .select("b", w.alias("w"), "q")
        .groupBy("b")
        .agg(
            F.sum("w").cast("bigint").alias("sw"),
            F.sum(F.col("w") * F.col("q")).cast("bigint").alias("swx"),
        )
    )
    means = reps.select((F.col("swx").cast("double") / F.col("sw")).alias("m"))
    pt = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum(q).cast("double") / F.count(F.lit(1))).alias("em"),
    )
    return (
        means.crossJoin(F.broadcast(pt))
        .groupBy()
        .agg(
            F.max("n").alias("n"),
            round_det(F.max("em"), 6).alias("point_mean"),
            round_det(F.expr("percentile(m, 0.025)"), 6).alias("ci_lo"),
            round_det(F.expr("percentile(m, 0.975)"), 6).alias("ci_hi"),
            round_det(
                F.sqrt(
                    (
                        F.count(F.lit(1))
                        * F.sum(
                            round_det(F.col("m") * F.col("m"), 9).cast("decimal(24,9)")
                        ).cast("double")
                        - F.sum(round_det(F.col("m"), 9).cast("decimal(20,9)"))
                        .cast("double")
                        * F.sum(round_det(F.col("m"), 9).cast("decimal(20,9)"))
                        .cast("double")
                    )
                    / (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1))
                ),
                6,
            ).alias("se_boot"),
        )
    )


QUERIES["profile_bootstrap_mean"] = profile_bootstrap_mean
ORACLES["profile_bootstrap_mean"] = _BOOTSTRAP_ORACLE


# Benford first-digit probabilities log10(1+1/d), d=1..9 — identical
# literals in both engines
_BENFORD_P = [
    "0.301029995664", "0.176091259056", "0.124938736608", "0.096910013008",
    "0.079181246048", "0.066946789631", "0.057991946978", "0.051152522447",
    "0.045757490561",
]

_BENFORD_ORACLE = f"""
WITH digits AS (
    SELECT CAST(substr(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1)
                AS BIGINT) AS d
    FROM lineitem WHERE l_extendedprice >= 1),
obs AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS o,
           CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
    FROM digits GROUP BY d),
exp AS (
    SELECT d, o, n,
           CASE d {' '.join(f"WHEN {i+1} THEN {p}" for i, p in enumerate(_BENFORD_P))}
           END * n AS e
    FROM obs),
stat AS (
    SELECT MAX(n) AS n,
           CAST(SUM(CAST(FLOOR((o - e) * (o - e) / e * 1000000000 + 0.5)
                         / 1000000000 AS DECIMAL(20,9))) AS DOUBLE) AS chi2
    FROM exp)
SELECT n, FLOOR(chi2 * 1000000 + 0.5) / 1000000 AS chi2,
       CAST(8 AS BIGINT) AS dof,
       chi2 > 15.507 AS deviates_from_benford
FROM stat
"""


def profile_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the money column: χ² of the leading-digit
    distribution against log10(1+1/d) — the forensic-accounting test
    for fabricated or truncated numeric data.  Organic multi-scale
    amounts follow Benford; this fixture's prices are UNIFORM on a
    bounded range, which genuinely violates Benford — so the audit must
    FIRE (`deviates_from_benford` = true, pinned) — the true-positive
    twin of corpus_chi2_independence's true negative.

    Scale: one scan to 9 digit counts (map-side combined); everything
    after runs on the 9-row frame.  Determinism: the leading digit is
    taken from the exact DECIMAL(12,2) string form (no float
    formatting), expected shares are shared literals, terms are
    DECIMAL-carried, and the dof-8 critical value 15.507 is a literal.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dffoo_data_pipeline_spark.functions import numeric as N
    from dffoo_data_pipeline_spark.functions.numeric import round_det

    li = load_table(spark, sf_dir, "lineitem")
    d = F.substring(N.dec2("l_extendedprice").cast("string"), 1, 1).cast("bigint")
    obs = (
        li.where(F.col("l_extendedprice") >= 1)
        .groupBy(d.alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .withColumn("n", F.sum("o").over(Window.partitionBy()).cast("bigint"))
    )
    p = F.lit(None).cast("double")
    expr = None
    for i, lit in enumerate(_BENFORD_P):
        cond = (F.col("d") == i + 1, F.lit(float(lit)))
        expr = F.when(*cond) if expr is None else expr.when(*cond)
    e = expr * F.col("n")
    term = round_det((F.col("o") - e) * (F.col("o") - e) / e, 9).cast("decimal(20,9)")
    stat = obs.select("n", term.alias("term")).groupBy().agg(
        F.max("n").alias("n"), F.sum("term").cast("double").alias("chi2")
    )
    return stat.select(
        "n",
        round_det(F.col("chi2"), 6).alias("chi2"),
        F.lit(8).cast("bigint").alias("dof"),
        (F.col("chi2") > 15.507).alias("deviates_from_benford"),
    )


QUERIES["profile_benford_audit"] = profile_benford_audit
ORACLES["profile_benford_audit"] = _BENFORD_ORACLE
