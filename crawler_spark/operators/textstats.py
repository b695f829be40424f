"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting — all native column
expressions over `documents(doc_id, text, ...)`.

The reference's text surface is extraction + truncation
(/root/reference/lib/crawler/crawler-engine.ts:1353-1487); these are
the standard corpus-curation extensions built on the same scalar
toolbox (E-series operators). Every function here has a DuckDB-SQL
twin in __spark_entry__.oracle_sql() — the semantics are pinned by
that cross-engine equality, not just by unit tests."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import tokens_col

# stopword marker sets for the n-gram-free language heuristic:
# tiny, deterministic, shared verbatim with the DuckDB oracle
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}

EN_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "it", "on", "for")


def _marker_hits(toks: Column, lang: str) -> Column:
    ms = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*ms)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language guess: argmax of marker-stopword hit counts
    (ties broken by fixed language order en>de>fr>es), 'unk' when no
    marker hits. Pure column expr — a groupless scalar classifier."""
    text = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(text, distinct=False)
    scores = [(lang, _marker_hits(toks, lang)) for lang in LANG_MARKERS]
    best = None
    for lang, s in scores:
        if best is None:
            best, best_s = F.lit(lang), s
        else:
            cond = s > best_s
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_s = F.when(cond, s).otherwise(best_s)
    return F.when(best_s > 0, best).otherwise(F.lit("unk"))


def token_count(text: Column | str) -> Column:
    """Whitespace-ish token count (the cheap budget estimator)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(tokens_col(text, distinct=False))


def subword_count(text: Column | str) -> Column:
    """BPE-ish subword count: alphanumeric runs + punctuation marks
    each count as a token (regex tokenizer — the deterministic
    approximation of a BPE vocab's pre-tokenizer)."""
    text = F.col(text) if isinstance(text, str) else text
    alnum = F.size(F.filter(F.split(F.lower(text), r"[^a-z0-9]+"),
                            lambda t: t != ""))
    punct = F.length(F.regexp_replace(F.lower(text), r"[a-z0-9\s]", ""))
    return alnum + punct


def quality_features(text: Column | str) -> dict[str, Column]:
    """Deterministic quality signals: char length, token count, mean
    token length, stopword ratio, punctuation ratio, uppercase ratio.
    Each an exact integer-ratio double (cross-engine bit-stable)."""
    text = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(text, distinct=False)
    n_tok = F.size(toks)
    n_char = F.length(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    mean_tok = F.when(n_tok > 0,
                      F.aggregate(toks, F.lit(0),
                                  lambda acc, t: acc + F.length(t))
                      / n_tok).otherwise(F.lit(0.0))
    return dict(
        n_chars=n_char,
        n_tokens=n_tok,
        mean_token_len=mean_tok,
        stopword_ratio=F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0),
        punct_ratio=F.when(n_char > 0, n_punct / n_char).otherwise(0.0),
        upper_ratio=F.when(n_char > 0, n_upper / n_char).otherwise(0.0),
    )


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score from the features: rewards
    mid-length docs with healthy stopword presence, penalizes
    punctuation soup. Weighted sum of clamped signals (the standard
    hand-rolled pre-filter before model-based scoring)."""
    f = quality_features(text)
    len_term = F.least(f["n_tokens"] / F.lit(200.0), F.lit(1.0))
    stop_term = F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 10.0)
    return F.round(0.4 * len_term + 0.3 * stop_term + 0.3 * punct_pen, 6)


def doc_fingerprint(text: Column | str) -> Column:
    """Canonical content fingerprint: md5 of the normalized text
    (lowercase, whitespace collapsed) — the exact-dedup key that both
    Spark and DuckDB compute byte-identically."""
    text = F.col(text) if isinstance(text, str) else text
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


def winnow_fingerprints(text: Column | str, k: int = 5,
                        window: int = 8) -> Column:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): rolling
    k-gram hashes, per-window minima, distinct+sorted. Returns
    array<bigint> — the plagiarism/near-dup sketch.

    Structured so no large subexpression is referenced twice: the
    k-gram hash array is materialized ONCE inside a single lambda
    scope via a wrapping transform-over-singleton (referencing a big
    expression tree from several places makes Catalyst re-expand it
    each time — quadratic analysis blowup at best)."""
    text = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(text, distinct=False)

    def kgrams(ts: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(ts) - k)
        return F.when(F.size(ts) >= k, F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(
                "_", *[F.element_at(ts, i + j + 1) for j in range(k)]))
        )).otherwise(F.array().cast("array<bigint>"))

    def window_mins(kh: Column) -> Column:
        widx = F.sequence(F.lit(0), F.size(kh) - window)
        return F.when(F.size(kh) >= window, F.transform(
            widx, lambda i: F.array_min(F.slice(kh, i + 1, window))
        )).otherwise(kh)

    # bind each stage once: wrap in transform over a 1-element array
    # so the lambda variable (a cheap reference) is what gets reused.
    staged = F.transform(
        F.array(toks),
        lambda ts: F.transform(F.array(kgrams(ts)),
                               lambda kh: window_mins(kh))[0])[0]
    return F.array_sort(F.array_distinct(staged))
