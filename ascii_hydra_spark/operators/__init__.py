"""Operators — the engine's verb layer over DataFrames.

Each module is a family from SURVEY.md §2:

- :mod:`relational`  — joins (incl. broadcast-hinted star joins), top-k,
  set ops, dedup-free aggregation recipes (Tier A/B).
- :mod:`windows`     — ranking/analytic/frame window recipes (C11-C13).
- :mod:`dedup`       — exact, MinHash-LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-dup (C1-C2 + driver mandate).
- :mod:`similarity`  — cosine top-k and similarity self-join, exact +
  LSH-bucketed scale path (C3-C4).
- :mod:`text`        — text stats, tokenize/n-gram/TF-DF, language-ID,
  quality scoring, fingerprinting (C5-C8).
- :mod:`asof`        — as-of / range joins over event streams (C19).
- :mod:`multimodal`  — binary media columns: schema, metadata, decode
  plumbing via Arrow-batched mapInPandas (driver mandate).
"""

from ascii_hydra_spark.operators import (  # noqa: F401
    asof,
    dedup,
    multimodal,
    relational,
    similarity,
    text,
    windows,
)
