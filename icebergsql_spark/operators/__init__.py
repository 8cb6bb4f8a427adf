"""Training-data-pipeline operators (beyond-reference surface).

Modules: dedup (exact/MinHash+LSH/SimHash/Jaccard/embedding), similarity
(brute-force, sign-bit LSH, IVF, BLAS path), text (token stats, quality,
lang-ID, winnowing fingerprints), curation (splits, sampling, packing,
quality cascade, passage dedup), multimodal (binary payloads + stubs),
temporal (as-of / range joins), skew (salting), bucketed (co-located joins).
"""

from icebergsql_spark.operators import (  # noqa: F401
    bucketed,
    curation,
    dedup,
    multimodal,
    similarity,
    skew,
    temporal,
    text,
)
