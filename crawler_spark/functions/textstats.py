"""Text-analysis functions for large-scale training-data pipelines.

All pure JVM column expressions (whole-stage codegen, no Python) — language
ID, quality scoring, token counting, document fingerprinting over a
``documents(text STRING)`` table. Each has an exact ANSI-SQL equivalent used
as the DuckDB oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# n-gram-free stopword-vote language ID: tiny per-language function-word
# lists; the language with the most token hits wins (deterministic
# tie-break by fixed language order).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "fr": ("le", "la", "et", "de", "un"),
    "es": ("el", "los", "y", "de", "un"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string → empty array (not [''])."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# BPE-ish pre-tokenizer: contraction suffixes, letter runs, digit runs,
# punctuation runs — the GPT-2-style split WITHOUT the trailing-space
# lookahead (kept RE2-safe so the DuckDB oracle evaluates the identical
# pattern; ASCII classes for cross-engine parity).
BPE_ISH_PATTERN = r"'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_tokens(text: Column) -> Column:
    """Subword-style token pieces via one JVM regexp_extract_all."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


def _stop_hits(text: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens(text), lambda t: F.lower(t).isin(*words)))


def langid(text: Column) -> Column:
    """Stopword-vote language ID → 'en'|'fr'|'es'|'und'."""
    c_en = _stop_hits(text, LANG_STOPWORDS["en"])
    c_fr = _stop_hits(text, LANG_STOPWORDS["fr"])
    c_es = _stop_hits(text, LANG_STOPWORDS["es"])
    best = F.greatest(c_en, c_fr, c_es)
    return (
        F.when(best == 0, F.lit("und"))
        .when(c_en == best, F.lit("en"))
        .when(c_fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def stopword_ratio(text: Column) -> Column:
    n = token_count(text)
    hits = _stop_hits(
        text,
        LANG_STOPWORDS["en"] + LANG_STOPWORDS["fr"] + LANG_STOPWORDS["es"],
    )
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    n = F.size(toks)
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    n_punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n > 0, n_punct.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane token length,
    some-but-not-all stopwords, low punctuation noise."""
    n = token_count(text)
    len_ok = F.when(n >= 10, F.lit(1.0)).otherwise(n.cast("double") / 10.0)
    atl = avg_token_len(text)
    tok_ok = F.when((atl >= 3.0) & (atl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw = stopword_ratio(text)
    sw_ok = F.when((sw > 0.0) & (sw < 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_ok = F.when(punct_ratio(text) < 0.2, F.lit(1.0)).otherwise(F.lit(0.3))
    return (len_ok + tok_ok + sw_ok + punct_ok) / 4.0


def normalized(text: Column) -> Column:
    """Fingerprint normalization: lowercase + collapse whitespace + trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint over normalized text (md5 — portable to the
    DuckDB oracle; engine-internal paths use xxhash64 for speed)."""
    return F.md5(normalized(text).cast("binary"))


def fingerprint_xxh64(text: Column) -> Column:
    return F.xxhash64(normalized(text))
