"""DataFrame-level operators: extraction, dedup, similarity, text analysis,
multimodal plumbing. Everything here takes and returns DataFrames; Python
compute is Arrow-batched (mapInPandas / pandas_udf) — never per-row."""
