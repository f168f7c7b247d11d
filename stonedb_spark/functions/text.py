"""Text-analysis building blocks for the training-data pipeline operators.

All pure Catalyst expressions (whole-stage codegen, no Python UDFs):
tokenization, word shingles, stopword counting, quality scoring,
language-ID scoring, document fingerprints.  Each has an exact DuckDB-SQL
twin used by the oracle queries in stonedb_spark.queries.pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small and inlined so the DuckDB oracle can
# reproduce scoring exactly.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "et", "les", "des", "un", "est", "une"),
    "es": ("el", "la", "de", "que", "los", "un", "es", "una"),
}

PUNCT_CLASS = r"[^.!?,;:]"


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(text), r"\s+")


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (the MinHash/Jaccard unit).

    Word shingling is the standard near-dup unit (Broder 1997,
    "Syntactic clustering of the Web").
    """
    w = tokens(text)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(w) - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + F.lit(j)) for j in range(k)]),
    )
    empty = F.array().cast("array<string>")
    return F.array_distinct(F.when(F.size(w) >= k, sh).otherwise(empty))


def with_shingles(df, text_col: str = "text", k: int = 3):
    """documents → (doc_id, shingle) exploded, distinct per doc."""
    return df.select(
        "doc_id", F.explode(shingles(F.col(text_col), k)).alias("shingle")
    )


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def quality_score(n_tokens: Column, n_chars: Column, n_stop: Column) -> Column:
    """Deterministic doc-quality heuristic in [0, 1]:
    length term + stopword-ratio term + mean-word-length sanity term.
    Identical arithmetic on the DuckDB side."""
    nt = n_tokens.cast("double")
    nc = n_chars.cast("double")
    ns = n_stop.cast("double")
    len_term = F.least(nt / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(F.lit(4.0) * ns / nt, F.lit(1.0))
    awl = nc / nt
    wl_term = F.when((awl >= 3.0) & (awl <= 10.0), 1.0).otherwise(0.0)
    return F.lit(0.4) * len_term + F.lit(0.3) * stop_term + F.lit(0.3) * wl_term


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed text (the rolling-hash analog — an
    order-sensitive content hash)."""
    return F.md5(F.regexp_replace(F.lower(text), r"\s+", " "))


# BPE-ish tokenizer regex (GPT-2-style pretokenization, ASCII subset):
# contractions, letter runs, digit runs, punctuation runs — applied to
# lowercased text.  Alternation order matters (contraction first) and is
# leftmost-first in both Java regex (Spark) and RE2 (DuckDB oracle).
BPE_PATTERN = r"'(s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pretokenizer — the unit an LLM
    training pipeline budgets by (whitespace counts undercount punct-
    heavy text).  Pure codegen expression: regexp_count, no UDF."""
    return F.regexp_count(F.lower(text), F.lit(BPE_PATTERN))


# ---------------------------------------------------------------------------
# Repetition / diversity metrics (Gopher quality rules, Rae et al. 2021
# §A1.1; C4 heuristics, Raffel et al. 2020 §2.2) — pure higher-order
# array expressions, no UDF.  Per-row cost is O(len * vocab) but strictly
# row-local: at 100 TB this stays a map-only stage with no shuffle.


def type_token_ratio(toks: Column) -> Column:
    """Distinct-token fraction — low TTR flags boilerplate/spam."""
    return F.size(F.array_distinct(toks)) / F.size(toks)


def mean_word_length(toks: Column) -> Column:
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    return sum_len / F.size(toks)


def top_token_fraction(toks: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token."""
    counts = F.transform(
        F.array_distinct(toks),
        lambda t: F.size(F.filter(toks, lambda x: x == t)),
    )
    return F.array_max(counts) / F.size(toks)


def bigrams(toks: Column) -> Column:
    """Adjacent-pair strings; empty for single-token docs (Spark's
    sequence(1,0) counts DOWN, so the short case must be guarded)."""
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    pairs = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    return F.when(F.size(toks) > 1, pairs).otherwise(
        F.array().cast("array<string>")
    )


def gopher_keep(
    n_tokens: Column,
    mean_wlen: Column,
    ttr: Column,
    top_frac: Column,
) -> Column:
    """Gopher-style document filter verdict (thresholds adapted to the
    synthetic corpus so both outcomes occur at every SF)."""
    return (
        n_tokens.between(50, 100000)
        & mean_wlen.between(3.0, 10.0)
        & (ttr > 0.3)
        & (top_frac < 0.15)
    )


# ---------------------------------------------------------------------------
# PII redaction (C4 / RefinedWeb-style cleaning).  Patterns restricted
# to syntax Java regex (Spark) and RE2 (DuckDB oracle) interpret
# identically — no backrefs, no lookaround.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def scrub_pii(text: Column) -> Column:
    """Replace emails, then phones, then IPv4 literals with typed
    placeholder tokens.  Email runs first so digit runs inside
    addresses can't be half-matched by the later patterns."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, IPV4_RE, "<IP>")


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)),
        F.regexp_count(text, F.lit(PHONE_RE)),
        F.regexp_count(text, F.lit(IPV4_RE)),
    )


def ordered_shingles(text: Column, k: int = 3) -> Column:
    """Positional (non-distinct) k-word shingles — winnowing needs the
    document-order sequence, unlike the MinHash set unit."""
    w = tokens(text)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(w) - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + F.lit(j)) for j in range(k)]),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(w) >= k, sh).otherwise(empty)


def winnow_fingerprints(text: Column, k: int = 3, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash each positional k-shingle (same md5→60-bit base as
    MinHash), slide a window of ``w`` hashes, keep each window's
    minimum, dedup.  Guarantees any shared run of ≥ w+k-1 words between
    two documents shares a fingerprint — partial-overlap detection that
    whole-document hashes miss.  Pure higher-order expressions: the
    corpus pass is map-only; matching is then an equi-join on the
    exploded fingerprint (bounded, like the LSH band join)."""
    hs = F.transform(
        ordered_shingles(text, k),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )
    wins = F.transform(
        F.sequence(F.lit(1), F.size(hs) - F.lit(w - 1)),
        lambda i: F.array_min(F.slice(hs, i, w)),
    )
    empty = F.array().cast("array<long>")
    return F.array_distinct(F.when(F.size(hs) >= w, wins).otherwise(empty))
