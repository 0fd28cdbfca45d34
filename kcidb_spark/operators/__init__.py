"""Large-scale pipeline operators (beyond the reference's surface).

Reusable DataFrame transformations for training-data pipelines:
dedup (MinHash/LSH/SimHash), similarity search (brute-force +
LSH-bucketed ANN), text analysis, and multimodal column plumbing.
The oracle-checked query registry (kcidb_spark.queries.pipeline)
wraps these with concrete parameters.
"""

from kcidb_spark.operators.dedup import (  # noqa: F401
    jaccard_pairs,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash16,
)
from kcidb_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    hyperplane_buckets,
    hyperplanes,
)
from kcidb_spark.operators.multimodal import (  # noqa: F401
    MEDIA_SCHEMA,
    extract_features,
    to_media_table,
)
