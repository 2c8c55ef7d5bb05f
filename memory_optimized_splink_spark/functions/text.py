"""Text-analysis columns for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting. All native Spark SQL expressions
(codegen, no Python) so they compose into scans without breaking pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny per-language stopword marker lists for the n-gram/stopword heuristic;
# deterministic and dependency-free (real pipelines would plug fasttext here)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "pt": ["o", "a", "os", "de", "que", "uma", "para", "com"],
}

_EN_STOPWORDS = _LANG_MARKERS["en"] + ["a", "an", "was", "are", "on", "for"]


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.trim(F.lower(col)), r"\s+"),
                    lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish count: words + digits + punctuation runs (a cheap,
    deterministic stand-in for a BPE tokenizer's piece count)."""
    pieces = F.filter(
        F.split(col, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
        lambda t: F.trim(t) != F.lit(""),
    )
    return F.size(pieces)


def language_id(col: Column) -> Column:
    """Stopword-vote language classifier: argmax over marker-hit counts,
    'und' (undetermined) when nothing matches."""
    toks = tokens(col)
    scores = [
        (lang, F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in _LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # build reverse so earlier languages win ties
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / repetition features (the usual
    web-corpus quality filters)."""
    toks = tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    stop_hits = F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for w in _EN_STOPWORDS])))
    n_punct = n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(col, r"[0-9]", ""))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
        .cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars)
        .otherwise(F.lit(0.0)),
        "digit_ratio": F.when(n_chars > 0, n_digit.cast("double") / n_chars)
        .otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tok > 0, stop_hits.cast("double") / n_tok)
        .otherwise(F.lit(0.0)),
        "distinct_token_ratio": distinct_ratio,
        "mean_word_len": mean_word_len,
    }


def quality_score(col: Column) -> Column:
    """Composite 0-1 quality score from the features (hand-tuned linear
    gates, like C4/Gopher-style rules)."""
    f = quality_features(col)
    gates = [
        (f["n_tokens"] >= 5).cast("double"),
        (f["punct_ratio"] <= 0.3).cast("double"),
        (f["distinct_token_ratio"] >= 0.3).cast("double"),
        (f["mean_word_len"].between(2.0, 12.0)).cast("double"),
        (f["digit_ratio"] <= 0.3).cast("double"),
    ]
    total = gates[0]
    for g in gates[1:]:
        total = total + g
    return (total / F.lit(float(len(gates)))).alias("quality_score")


def poly31_hash(col: Column, modulus: int = 2147483647) -> Column:
    """Rolling polynomial hash (acc*31 + ascii(c)) mod 2^31-1 — the
    cross-engine hash family (identical in DuckDB via list_reduce). Per-char
    interpreted lambda: use only on SHORT strings (tokens/shingles) or in
    oracle-check paths; production hashing is codegen'd xxhash64."""
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars, F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(modulus))


def fingerprint_poly31(col: Column, window: int = 8) -> Column:
    """fingerprint64 with poly31 token hashes instead of xxhash64 — same
    winnowing structure, reproducible in DuckDB for oracle checks."""
    toks = tokens(col)
    # NB: transform passes (element, index); pin the 1-arg form
    hashes = F.transform(toks, lambda t: poly31_hash(t))
    n = F.size(hashes)
    n_win = F.greatest(n - F.lit(window - 1), F.lit(1))
    window_mins = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.array_min(F.slice(hashes, i, F.lit(window))),
    )
    selected = F.array_distinct(window_mins)
    return F.coalesce(
        F.aggregate(selected, F.lit(0).cast("long"),
                    lambda acc, h: acc.bitwiseXOR(h)),
        F.lit(0).cast("long"),
    )


def fingerprint64(col: Column, window: int = 8) -> Column:
    """Document fingerprint: xor of rolling-window token-hash minima
    (winnowing-style). One BIGINT per doc; equal fingerprints => very likely
    near-identical token streams."""
    toks = tokens(col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(hashes)
    n_win = F.greatest(n - F.lit(window - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n_win)
    window_mins = F.transform(
        idx,
        lambda i: F.array_min(F.slice(hashes, i, F.lit(window))),
    )
    # winnowing keeps each selected hash once: overlapping windows re-select
    # the same minimum, and xor of duplicates would cancel to 0
    selected = F.array_distinct(window_mins)
    return F.coalesce(
        F.aggregate(selected, F.lit(0).cast("long"),
                    lambda acc, h: acc.bitwiseXOR(h)),
        F.lit(0).cast("long"),
    )
