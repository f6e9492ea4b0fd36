"""Text analysis for training-data pipelines (SURVEY extension scope):
token counting, quality scoring, language ID, document fingerprinting.

Everything here is pure Catalyst column expressions (JVM-side,
whole-stage codegen) — including the fingerprint, an F.aggregate
xxhash64 fold over the token array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est"],
    "es": ["el", "los", "las", "es", "una", "para"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (split on single space, empties included —
    matches the SQL oracle's string_split semantics exactly)."""
    return F.size(F.split(text, " "))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish regex token count: words, numbers, punctuation runs."""
    return F.size(F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / space ratio quality features.

    All ratios are integer-count / integer-count double divisions —
    deterministic and bit-exact against an equivalent SQL oracle.
    """
    t = F.col(text_col)
    n = F.length(t)
    spaces = n - F.length(F.regexp_replace(t, " ", ""))
    digits = n - F.length(F.regexp_replace(t, "[0-9]", ""))
    punct = n - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    denom = F.greatest(n, F.lit(1)).cast("double")
    return (df
            .withColumn("n_chars_calc", n)
            .withColumn("n_tokens", token_count(t))
            .withColumn("space_ratio", spaces.cast("double") / denom)
            .withColumn("digit_ratio", digits.cast("double") / denom)
            .withColumn("punct_ratio", punct.cast("double") / denom))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0, 1]: long-enough, low-digit, low-punct."""
    q = quality_columns(df, text_col)
    score = (
        F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
        * (F.lit(1.0) - F.least(F.col("digit_ratio") * 2, F.lit(1.0)))
        * (F.lit(1.0) - F.least(F.col("punct_ratio") * 2, F.lit(1.0))))
    return q.withColumn("quality_score", score)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID; `und` when no marker hits.

    Pure column expressions: per-language hit counts over a lowercased
    token set, argmax via greatest + chained when.
    """
    # materialize the split and each count once — naming the intermediate
    # columns keeps Catalyst from inlining the (expensive) split/intersect
    # expression tree into every branch of the argmax CASE chain
    out = df.withColumn("_toks", F.split(F.lower(F.col(text_col)), r"\s+"))
    for lang, words in _LANG_MARKERS.items():
        out = out.withColumn(f"_c_{lang}", F.size(F.array_intersect(
            F.col("_toks"), F.array(*[F.lit(w) for w in words]))))
    counts = {lang: F.col(f"_c_{lang}") for lang in _LANG_MARKERS}
    out = out.withColumn("_best", F.greatest(*counts.values()))
    best = F.col("_best")
    expr = F.lit("und")
    # reverse order → earlier languages win ties after the fold
    for lang in reversed(list(counts)):
        expr = F.when(counts[lang] == best, F.lit(lang)).otherwise(expr)
    out = out.withColumn("lang_pred",
                         F.when(best <= 0, F.lit("und")).otherwise(expr))
    return out.drop("_toks", "_best",
                    *[f"_c_{lang}" for lang in _LANG_MARKERS])


def doc_fingerprint(col: Column) -> Column:
    """64-bit order-sensitive document fingerprint, entirely JVM-side.

    A rolling hash chain over whitespace tokens: ``h' = xxhash64(h, tok)``
    folded left-to-right with ``F.aggregate`` (higher-order function inside
    whole-stage codegen — zero per-row Python).  Order-sensitive: permuted
    token order yields a different fingerprint; empty/whitespace-only text
    fingerprints to 0.
    """
    toks = F.filter(F.split(F.coalesce(col, F.lit("")), r"\s+"),
                    lambda x: x != "")
    return F.aggregate(toks, F.lit(0).cast("long"),
                       lambda acc, x: F.xxhash64(acc, x))


def top_tokens(df: DataFrame, k: int = 10, by: str = "source",
               text_col: str = "text") -> DataFrame:
    """Exact heavy hitters: top-k tokens by count per group.

    Output: (by, token, n, rank), rank 1..k, ties broken by token
    string ascending (deterministic across engines).

    Scale design: the explode feeds a ``groupBy(by, token)`` count that
    partial-aggregates map-side, so the shuffle carries one row per
    distinct (group, token) — vocabulary-bounded, not corpus-bounded.
    The rank window then runs over per-group vocabularies only.  If the
    vocabulary itself is unbounded (URLs, hashes), cap with a count
    filter before the window, or switch to a count-min + heap sketch —
    for natural-language token streams the exact path holds at 100 TB.
    """
    toks = (df.select(F.col(by),
                      F.explode(F.split(F.col(text_col), r"\s+"))
                      .alias("token"))
            .where(F.col("token") != ""))
    counts = toks.groupBy(by, "token").agg(F.count("*").alias("n"))
    from pyspark.sql import Window
    w = Window.partitionBy(by).orderBy(F.col("n").desc(),
                                       F.col("token").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(by, "token", F.col("n").cast("long").alias("n"),
                    F.col("rank").cast("long").alias("rank")))


# PII patterns restricted to the regex subset with identical semantics
# in Java (Spark) and RE2 (DuckDB): no backrefs, no lookaround
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
               token: str = "[PII]") -> DataFrame:
    """Scrub PII-looking spans from a text column, pure Catalyst.

    A chain of ``regexp_replace`` expressions (whole-stage codegen, no
    Python) replaces each matched span with ``token``; ``n_redactions``
    sums a ``regexp_count`` per kind so the observability tier can
    monitor redaction rates per source.  Each kind is counted against
    the text as already redacted by the kinds before it — the order
    (emails, then phones, then IPs) keeps the phone pattern from
    eating an address's digit runs.
    """
    out = df
    total = F.lit(0).cast("long")
    redacted = F.col(text_col)
    for kind in kinds:
        pat = _PII_PATTERNS[kind]
        total = total + F.regexp_count(redacted, F.lit(pat)).cast("long")
        redacted = F.regexp_replace(redacted, pat, token)
    return (out.withColumn("n_redactions", total)
            .withColumn(text_col, redacted))
