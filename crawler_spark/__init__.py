"""crawler_spark — a PySpark-native distributed crawl/analytics engine.

A brand-new rebuild (NOT a port) of the query and data-processing
capabilities of the reference crawler (rodenp/crawler, surveyed in
SURVEY.md): a distributed URL frontier + politeness-aware fetch
scheduler over tables of image+caption pairs, advancing in
micro-batches, checkpointed and resumable, reproducing the reference's
crawl ordering and URL-seen set — expressed Spark-first with the
DataFrame/SQL API, Catalyst-optimized plans, and vectorized
pandas/Arrow UDFs only where built-ins can't express the semantics.

Layout:
  core/       pure-Python kernel shared by the oracle simulator and the
              fixture generators (xxhash64, URL canonicalization, PNG
              codec, perceptual hash) — no Spark imports.
  functions/  Spark column-expression library (native F.* pipelines).
  operators/  composite DataFrame operators (dedup, similarity, as-of
              join, modal scoring, text analysis).
  sources/    table IO: parquet-backed Iceberg-style snapshot tables,
              testdata readers, fixture readers.
  engine/     the micro-batch frontier driver loop (scheduler,
              admission, politeness, checkpoint/resume).
  streaming/  batch-simulated streaming semantics (stateful modal
              tracking, dedup windows, as-of attribution).
  plans/      session builders and tuning profiles.
"""

__version__ = "0.1.0"
