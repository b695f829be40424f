"""Document deduplication operators — exact, n-gram Jaccard,
MinHash+LSH, SimHash — over a `documents(doc_id, text, ...)` table.

These generalize the reference's dedup surfaces (URL-seen anti-join
J1 /root/reference/lib/crawler/crawler-engine.ts:541; screenshot
near-dup suppression /root/reference/lib/recorder/browser-session.ts:
2444-2473, 4008-4015) to the content-dedup stages a large-scale
training-data pipeline needs.

Scale notes (10^10 docs):
  * exact dedup: hash-groupBy on xxhash64(text, length) — one shuffle.
  * Jaccard: inverted-index self-join on tokens/shingles (the exact
    "explode-join-count" algorithm); shuffle key = token. Hot tokens
    are the skew hazard → a document-frequency cap drops
    ultra-common shingles (standard prefix-filter trick) before the
    join.
  * MinHash/LSH: signatures via native xxhash64(seed-salted concat) +
    groupBy-min — no Python; band buckets → candidate join.
  * SimHash: per-token 64-bit hash, bit-vote aggregate via native
    bit ops over 64 positions, hamming ≤ k via bit_count(xor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"[^a-z0-9]+"


def tokens_col(text, distinct: bool = True):
    """Lowercased word tokens of a text column (empty strings removed;
    mirrors DuckDB list_filter(string_split_regex(lower(t)), …))."""
    toks = F.filter(F.split(F.lower(text), TOKEN_RE), lambda t: t != "")
    return F.array_distinct(toks) if distinct else toks


def ngrams_col(text, n: int = 3):
    """Distinct token n-gram array ('_'-joined). The token array is
    bound ONCE via a lambda scope (transform over a singleton) —
    referencing the tokenization subtree from several places makes
    Catalyst re-expand it per reference (see winnow_fingerprints)."""
    toks = tokens_col(text, distinct=False)

    def grams(ts):
        idx = F.sequence(F.lit(0), F.size(ts) - n)
        g = F.transform(
            idx, lambda i: F.concat_ws("_", *[F.element_at(ts, i + j + 1)
                                              for j in range(n)]))
        return F.when(F.size(ts) >= n, F.array_distinct(g)).otherwise(
            F.array().cast("array<string>"))

    return F.transform(F.array(toks), grams)[0]


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate collapse on normalized text: keep min(id) per
    identical lower(text); adds group size. Hash-groupBy shuffle."""
    key = F.lower(F.col(text_col))
    return (docs.groupBy(key.alias("text_key"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("dup_count"))
            .select("keep_id", "dup_count"))


def jaccard_pairs(docs: DataFrame, threshold: float, n: int = 1,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """EXACT Jaccard-similar pairs (id_a < id_b, jaccard ≥ threshold)
    over distinct token n-gram sets, via PREFIX-FILTERED inverted-
    index self-join (Chaudhuri/Bayardo-style set-similarity join —
    public algorithm).

    A naive token-inverted-index join degenerates quadratically when
    the vocabulary is small/hot (every doc pairs with every doc on
    'the'). Prefix filtering keeps it exact and cheap: with grams
    globally ordered rarest-first, any pair with jaccard ≥ t must
    share a gram within each side's first |d| - ⌈t·|d|⌉ + 1 grams —
    so only that prefix (~(1-t)·|d| of the RAREST grams) is indexed.
    Candidates are then verified exactly with array_intersect over
    the full gram arrays. Shuffles: one groupBy for document
    frequencies, one prefix-token self-join (keyed by rare grams —
    no hot keys by construction), one verification join.

    Grams are xxhash64'd to longs up front: every downstream shuffle,
    sort, join key, and the array_intersect verification then runs on
    fixed-width longs instead of variable-length strings. The gram
    sets are distinct per doc, so jaccard values are unchanged unless
    two distinct grams collide in 64 bits (~n²/2⁶⁵ — negligible at
    any realistic vocabulary, and the value-for-value oracle would
    catch it)."""
    gram_arr = (tokens_col(F.col(text_col)) if n == 1
                else ngrams_col(F.col(text_col), n))
    base = (docs.select(F.col(id_col).alias("id"),
                        F.transform(gram_arr,
                                    lambda g: F.xxhash64(g)).alias("grams"))
            .filter(F.size("grams") > 0))
    exploded = base.select("id", F.explode("grams").alias("g"))
    dfreq = exploded.groupBy("g").agg(F.count("*").alias("df"))
    # per-doc grams sorted rarest-first (tiebreak: gram string)
    ranked = (exploded.join(dfreq, "g")
              .groupBy("id")
              .agg(F.array_sort(F.collect_list(F.struct("df", "g")))
                   .alias("ranked")))
    sorted_grams = ranked.select(
        "id", F.transform("ranked", lambda s: s["g"]).alias("grams"))
    # epsilon inside ceil: float t·s can land a hair ABOVE an exact
    # integer (0.9*60 → 54.000…004), which would shrink the prefix
    # below the safe bound and silently lose recall
    prefix_len = (F.size("grams")
                  - F.ceil(F.lit(threshold) * F.size("grams") - 1e-9) + 1
                  ).cast("int")
    # prefixes carry (size, 0-based position) so the self-join can
    # apply the PPJoin length + positional filters (Xiao et al.,
    # WWW'08 — public algorithm) BEFORE the distinct + verification
    # shuffles: length: j ≥ t ⇒ t·|a| ≤ |b| ∧ t·|b| ≤ |a|;
    # positional: a match at positions (pa, pb) bounds the overlap by
    # 1 + min(|a|-pa-1, |b|-pb-1), which must reach the required
    # overlap ⌈t/(1+t)·(|a|+|b|)⌉. A qualifying pair's first shared
    # prefix gram always passes both, so recall is exact; measured at
    # sf0.1/t=0.5 they cut candidates 409k → a small multiple of the
    # true 256 pairs before any gram array moves.
    prefixes = (sorted_grams
                .select("id", F.size("grams").alias("sz"),
                        F.posexplode(F.slice("grams", 1, prefix_len))
                        .alias("pos", "g")))
    a = prefixes.select(F.col("id").alias("id_a"),
                        F.col("sz").alias("sz_a"),
                        F.col("pos").alias("pos_a"), "g")
    b = prefixes.select(F.col("id").alias("id_b"),
                        F.col("sz").alias("sz_b"),
                        F.col("pos").alias("pos_b"), "g")
    need = F.ceil(F.lit(threshold) / (1 + threshold)
                  * (F.col("sz_a") + F.col("sz_b")) - 1e-9)
    ubound = 1 + F.least(F.col("sz_a") - F.col("pos_a") - 1,
                         F.col("sz_b") - F.col("pos_b") - 1)
    # candidates carry only the id pair through the dedup shuffle;
    # gram arrays attach once per surviving pair
    cand = (a.join(b, "g").filter(F.col("id_a") < F.col("id_b"))
            .filter((F.col("sz_b") >= threshold * F.col("sz_a"))
                    & (F.col("sz_a") >= threshold * F.col("sz_b")))
            .filter(ubound >= need)
            .select("id_a", "id_b").distinct())
    cand = (cand.join(sorted_grams.select(F.col("id").alias("id_a"),
                                          F.col("grams").alias("grams_a")),
                      "id_a")
            .join(sorted_grams.select(F.col("id").alias("id_b"),
                                      F.col("grams").alias("grams_b")),
                  "id_b"))
    common = F.size(F.array_intersect("grams_a", "grams_b"))
    out = (cand.withColumn(
        "jaccard",
        common / (F.size("grams_a") + F.size("grams_b") - common))
        .filter(F.col("jaccard") >= threshold))
    return out.select("id_a", "id_b",
                      F.round("jaccard", 6).alias("jaccard"))


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, n: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """MinHash signatures: num_hashes independent-hash minima over the
    doc's n-gram set. Pure native exprs, SHUFFLE-FREE, and each gram's
    string is hashed exactly ONCE: hs = transform(grams, xxhash64),
    then lane i is array_min(transform(hs, h → xxhash64(h, i))) — a
    fixed-width long-chained rehash (two XXH64 block rounds) instead
    of a per-lane string concat + variable-length hash, so the 64
    lanes cost 64 cheap long hashes per gram rather than 64 string
    hashes. The earlier explode+groupBy formulation additionally
    shuffled every (doc, gram) row to re-group what was already
    grouped. The hash array is projected to a named column first so
    the 64 lanes reference one attribute (not 64 re-expansions of the
    tokenization subtree). Bit-exact Python twin:
    oracle/text_oracle.py:minhash_signature."""
    base = (docs.select(F.col(id_col).alias("id"),
                        F.transform(ngrams_col(F.col(text_col), n),
                                    lambda g: F.xxhash64(g)).alias("hs"))
            .filter(F.size("hs") > 0))
    def lane(i):
        # bound via a def, not a lambda default: a 2-arg lambda would
        # be read by F.transform as (element, index). 64 parallel lane
        # columns beat one nested transform(sequence(0,63), ...) tree
        # by ~3x measured — the outer-lambda-var form drops the whole
        # projection to interpreted eval.
        idx = F.lit(i).cast("long")
        return F.array_min(F.transform(
            "hs", lambda h: F.xxhash64(h, idx)))

    return base.select(
        "id", F.array(*[lane(i) for i in range(num_hashes)])
        .alias("signature"))


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5,
                      num_hashes: int = 64, bands: int = 16, n: int = 3,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, verified with
    the signature's Jaccard estimate ≥ threshold. bands × rows where
    rows = num_hashes // bands; a pair colliding in ≥1 band becomes a
    candidate (probability 1-(1-j^rows)^bands). Join shuffles on the
    band digest — no all-pairs."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col).cache()
    # band digest = native multi-arg xxhash64 over the band's `rows`
    # signature longs (fixed-width chaining — no per-band string
    # concat + re-hash). Twin: oracle/text_oracle.py:band_digest.
    # The banded rows and the candidate dedup carry ONLY (id, band,
    # digest) — the 64-long signature arrays are re-attached by two
    # keyed joins AFTER the distinct. Carrying the arrays through the
    # band join + distinct made each in-flight row ~1 KB; with many
    # concurrent tasks the per-task sort memory shrank enough to
    # spill, and the stage measured 2.6x SLOWER at 32 cores than at 8
    # on a 480k-doc corpus. Ids-only dedup + signature rejoin scales
    # with cores and shuffles ~100x fewer bytes.
    banded = sig.select(
        "id",
        F.posexplode(F.array(*[
            F.xxhash64(*[F.element_at("signature", b * rows + r + 1)
                         for r in range(rows)])
            for b in range(bands)])).alias("band_id", "digest"))
    a = banded.select(F.col("id").alias("id_a"), "band_id", "digest")
    b = banded.select(F.col("id").alias("id_b"), "band_id", "digest")
    cand = (a.join(b, ["band_id", "digest"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct()
            .join(sig.select(F.col("id").alias("id_a"),
                             F.col("signature").alias("sig_a")), "id_a")
            .join(sig.select(F.col("id").alias("id_b"),
                             F.col("signature").alias("sig_b")), "id_b"))
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                     lambda x, y: x == y),
                          lambda m: m)) / F.size("sig_a")
    return (cand.withColumn("est_jaccard", est)
            .filter(F.col("est_jaccard") >= threshold)
            .select("id_a", "id_b",
                    F.round("est_jaccard", 6).alias("est_jaccard")))


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """64-bit SimHash over distinct tokens: per-bit weighted vote of
    the token hashes, sign → bit. All-native: explode tokens, per-bit
    partial sums via bit tests on xxhash64, one groupBy(id). The
    shuffle is cheap — map-side partial aggregation reduces it to 64
    longs per doc — and this formulation measured ~1.8× faster warm
    than a shuffle-free 64-lane F.aggregate fold over a per-row
    token-hash array (the fold re-traverses the array per bit lane)."""
    toks = F.explode(tokens_col(F.col(text_col)))
    e = docs.select(F.col(id_col).alias("id"), toks.alias("t"))
    h = F.xxhash64("t")
    votes = [F.sum(F.when(F.shiftrightunsigned(h, i).bitwiseAND(1) == 1, 1)
                   .otherwise(-1)).alias(f"b{i}") for i in range(64)]
    agg = e.groupBy("id").agg(*votes)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                         F.lit(0).cast("long"))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return agg.select("id", sim.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  bands: int = 4) -> DataFrame:
    """Pairs with SimHash hamming distance ≤ max_hamming, candidates
    from 16-bit band collisions (exact recall for max_hamming ≤
    bands-1 ≤ 3 by pigeonhole), verified by bit_count(xor)."""
    sh = simhash(docs, id_col, text_col)
    width = 64 // bands
    mask = (1 << width) - 1
    banded = sh.select("id", "simhash", F.posexplode(F.array(*[
        F.shiftrightunsigned("simhash", i * width).bitwiseAND(mask)
        for i in range(bands)])).alias("band_id", "band_val"))
    a = banded.select(F.col("id").alias("id_a"),
                      F.col("simhash").alias("sh_a"), "band_id", "band_val")
    b = banded.select(F.col("id").alias("id_b"),
                      F.col("simhash").alias("sh_b"), "band_id", "band_val")
    return (a.join(b, ["band_id", "band_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b").distinct()
            .withColumn("hamming",
                        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
