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
    (ties broken by fixed language order en>de>fr>es — array_position
    returns the FIRST index of the max, which is exactly the
    earlier-lang-wins-ties / later-must-strictly-exceed rule), 'unk'
    when no marker hits. Pure column expr — a groupless scalar
    classifier.

    Shape note: the token array and the per-language hit vector are
    each bound ONCE via a lambda scope (transform over a singleton).
    The previous when-chain argmax embedded the running best-score
    tree twice per level — the regex tokenization subtree ended up
    inlined ~2^|langs| times, and the corpus feature stage was
    allocation-bound on exactly that (79→120 s going 8→32 threads on
    one heap; see BASELINE.md round-5 corpus section)."""
    text = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(text, distinct=False)
    langs = F.array(*[F.lit(lang) for lang in LANG_MARKERS])

    def pick(ts: Column) -> Column:
        hits = F.array(*[
            F.size(F.filter(ts, lambda t: t.isin(*LANG_MARKERS[lang])))
            for lang in LANG_MARKERS])

        def argmax(hs: Column) -> Column:
            mx = F.array_max(hs)
            return F.when(
                mx > 0,
                F.element_at(langs,
                             F.array_position(hs, mx).cast("int"))
            ).otherwise(F.lit("unk"))

        return F.transform(F.array(hits), argmax)[0]

    return F.transform(F.array(toks), pick)[0]


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
    hand-rolled pre-filter before model-based scoring).

    The token array is bound ONCE via a lambda scope — going through
    quality_features() referenced the tokenization subtree ~6 times
    (n_tokens in three terms, the stopword filter, the ratio guards),
    and Catalyst inlines each reference. Formulas are kept
    term-for-term identical to quality_features' definitions, so the
    score is bit-stable vs the DuckDB oracle."""
    text = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(text, distinct=False)
    punct_ratio_num = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_char = F.length(text)

    def score(ts: Column) -> Column:
        n_tok = F.size(ts)
        n_stop = F.size(F.filter(ts, lambda t: t.isin(*EN_STOPWORDS)))
        stopword_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0)
        punct_ratio = F.when(n_char > 0,
                             punct_ratio_num / n_char).otherwise(0.0)
        len_term = F.least(n_tok / F.lit(200.0), F.lit(1.0))
        stop_term = F.least(stopword_ratio * 5.0, F.lit(1.0))
        punct_pen = F.greatest(F.lit(0.0),
                               F.lit(1.0) - punct_ratio * 10.0)
        return F.round(0.4 * len_term + 0.3 * stop_term
                       + 0.3 * punct_pen, 6)

    return F.transform(F.array(toks), score)[0]


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
