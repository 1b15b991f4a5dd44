"""Text-analysis column expressions (SURVEY.md §2k, BASELINE north star).

Everything here is a pure `pyspark.sql` Column builder — JVM-evaluated,
whole-stage-codegen friendly, zero Python in the hot path — so the same
expressions run unchanged over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.functions.numeric import round_det

# Deliberately tiny, deterministic stopword set shared with the DuckDB
# oracles (plans/llm_ops.py keeps SQL literals in sync).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# THE cross-engine whitespace spec (r11, closing the r10 \v gap): token
# separators are exactly RE2's \s = [ \t\n\r\f] — what the DuckDB
# oracles' '\s+' matches.  Java \s (Spark regexp) ADDITIONALLY matches
# \v (0x0B) and Python's ASCII \s matches \v too, so every Spark-side
# tokenizer here spells the class out explicitly instead of writing \s;
# a doc containing a vertical tab must tokenize identically in every
# engine that probes a portable index, and under this spec \v stays
# INSIDE a token everywhere (pinned against live DuckDB in
# tests/test_dedup.py::test_shingler_uses_ascii_whitespace_spec).
WS_CHARS = " \t\n\r\f"  # the actual characters (Python-side membership tests)
WS_RE = r" \t\n\r\f"  # escape spelling for regex classes (Java + RE2 + SQL-safe)
WS_CLASS = "[" + WS_RE + "]"


def tokens(text) -> Column:
    """Whitespace tokenization of trimmed text → array<string>
    (separator spec: ``WS_CLASS``, the RE2-\\s portable class).

    TOKEN SPEC (r11 hostile-input sweep): a token is a maximal
    NON-EMPTY run of non-whitespace — empty or whitespace-only text has
    ZERO tokens, never the edge-'' tokens a bare split() emits (trim()
    strips spaces only, so a doc like ``'\\tfoo'`` still splits to an
    edge '').  Without the filter, empty/whitespace-only docs counted
    1-2 phantom tokens, shifting every corpus-total statistic and
    diverging from the Python paths (str.split/findall never emit '').
    NULL text stays NULL (SQL propagation; consumers guard like any
    aggregate).  DuckDB mirror:
    ``list_filter(string_split_regex(trim(x), '\\s+'), t -> t <> '')``.

    Implemented as regexp_extract_all of the token pattern (the
    complement class) rather than split-then-filter: one JVM regex pass,
    no interpreted higher-order filter (~8% cheaper on token-count
    aggregates, measured at sf0.1), and non-empty by construction.
    Built with F.lit, NOT F.expr — a SQL string literal would eat the
    ``\\f`` escape as a plain ``f`` and silently drop every leading
    ``f`` from tokens (measured: 'fast' → 'ast').
    """
    # no trim() needed: edge whitespace simply doesn't match the token
    # pattern (one string copy per row saved)
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(f"[^{WS_RE}]+"), 0)


def token_count(text) -> Column:
    return F.size(tokens(text))


def char_count(text) -> Column:
    return F.length(text)


def avg_token_len(text, toks=None) -> Column:
    """Mean token length, rounded for cross-engine determinism.

    Pass a pre-computed token array as ``toks`` to avoid re-tokenizing
    (higher-order fns are interpreted, so Catalyst's codegen-level
    common-subexpression elimination does not dedupe the split here).
    """
    toks = tokens(text) if toks is None else toks
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)
    # NULL (not a crash) for a token-less doc: under the pinned ANSI-on
    # sessions a 0/0 aborts the whole query, while the DuckDB oracles'
    # x*1.0/0 yields NULL (r10 review) — guard every ratio denominator
    n = F.size(toks)
    return round_det(F.when(n > 0, total / n), 4)


def stopword_ratio(text, stopwords=EN_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords — cheap language/quality signal."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    n = F.size(toks)
    return round_det(F.when(n > 0, hits / n), 4)


def punct_ratio(text) -> Column:
    """Punctuation chars / total chars."""
    n_punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    n = F.length(text)
    return round_det(F.when(n > 0, n_punct / n), 4)


def digit_ratio(text) -> Column:
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    n = F.length(text)
    return round_det(F.when(n > 0, n_digit / n), 4)


def quality_score(text, toks=None) -> Column:
    """Composite heuristic quality score in [0, 1] (Gopher/C4-style gates
    re-expressed as arithmetic): rewards mid-length docs, real word shapes,
    low punctuation/digit noise.  Deterministic, SQL-mirrorable.

    ``toks``: optional pre-computed token array.  Tokenize ONCE in a prior
    select and pass the column — the split otherwise appears 3× in this
    expression tree, and because the avg-length fold is an interpreted
    higher-order function the engine will not CSE it away (see
    plans/llm_ops.py:text_quality_score for the two-stage pattern).
    """
    toks = tokens(text) if toks is None else toks
    return quality_score_from_parts(F.size(toks), avg_token_len(text, toks=toks), text)


def quality_score_from_parts(n_tok, avg_len, text) -> Column:
    """Score from pre-computed token count + avg token length (both may be
    staged columns, letting the caller evaluate each expensive interpreted
    fold exactly once) and the raw text for the char-level noise ratios."""
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    wordshape_ok = F.when((avg_len >= 2) & (avg_len <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    noise = punct_ratio(text) + digit_ratio(text)
    return round_det((length_ok + wordshape_ok + (1 - F.least(noise, F.lit(1.0)))) / 3, 4)


# BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct splits,
# RE2-compatible — no lookarounds — so the DuckDB oracle matches exactly):
# runs of letters (with optional leading apostrophe for contractions),
# runs of digits, or single non-space symbols.  "Non-space" spells the
# explicit WS_RE class, not \s: under Java regex \s would also eat
# \v, making Spark drop a symbol the RE2 oracle keeps (r11 spec fix).
BPE_PATTERN = rf"'?[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_RE}]"


def bpe_tokens(text) -> Column:
    """BPE-style pre-tokens → array<string>.  The subword merge step of a
    real BPE vocab is a lookup on top of this split; token COUNTING for
    data curation only needs the split."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text) -> Column:
    return F.size(bpe_tokens(text))


def normalized_text(text) -> Column:
    """Canonical form for fingerprinting: lowercase, whitespace collapsed
    (``WS_CLASS`` spec — \\v survives, exactly as in the RE2 oracles)."""
    return F.regexp_replace(F.lower(F.trim(text)), WS_CLASS + "+", " ")


def fingerprint_md5(text) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text.
    (md5 is bit-identical across engines, unlike xxhash64/murmur.)"""
    return F.md5(normalized_text(text))


def word_shingles(text, n: int = 3) -> Column:
    """n-gram word shingles as array<string> (space-joined), via a
    positional transform over the token array — no explode needed when the
    consumer wants per-doc shingle sets."""
    toks = tokens(normalized_text(text))
    k = F.size(toks) - (n - 1)
    idx = F.when(k > 0, F.sequence(F.lit(1), k)).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
    )


def quality_score_sql(text_expr: str = "text") -> str:
    """DuckDB mirror of `quality_score` as a SQL fragment (same gates,
    same 1e-4 rounding).  Keeping the one authoritative string here stops
    the oracle fragment from drifting between plan modules — any change
    to the Spark expression and this SQL must land together."""
    # the non-empty-token spec, mirrored (see tokens()): edge ''
    # tokens from whitespace-only docs are dropped in both engines
    toks = rf"list_filter(string_split_regex(trim({text_expr}), '\s+'), t -> t <> '')"
    # NULLIF denominators: empty/token-less docs get NULL ratios in both
    # engines (the Spark side guards with F.when; ANSI would crash on /0)
    avg_len = (
        rf"(FLOOR((list_sum(list_transform({toks}, x -> length(x))) * 1.0"
        rf" / NULLIF(len({toks}), 0)) * 10000 + 0.5) / 10000)"
    )
    punct = (
        rf"FLOOR((length(regexp_replace({text_expr}, '[^.!?,;:]', '', 'g')) * 1.0"
        rf" / NULLIF(length({text_expr}), 0)) * 10000 + 0.5) / 10000"
    )
    digit = (
        rf"FLOOR((length(regexp_replace({text_expr}, '[^0-9]', '', 'g')) * 1.0"
        rf" / NULLIF(length({text_expr}), 0)) * 10000 + 0.5) / 10000"
    )
    return (
        rf"FLOOR(((CASE WHEN len({toks}) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END"
        rf" + CASE WHEN {avg_len} BETWEEN 2 AND 12 THEN 1.0 ELSE 0.0 END"
        rf" + (1 - LEAST({punct} + {digit}, 1.0))) / 3) * 10000 + 0.5) / 10000"
    )
