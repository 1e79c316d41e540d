"""block_crawler_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Zettafi/block-crawler.

Built from scratch on the public PySpark DataFrame/SQL API. The reference
(read-only at /root/reference) defines WHAT is computed (operators, query
semantics, data model — see SURVEY.md); the HOW here is idiomatic Spark:
declarative DataFrame plans optimized by Catalyst, version-guarded merges as
the universal sink semantic, and Arrow-batched pandas UDFs only where built-in
column expressions genuinely cannot express the semantics.

Layout:
    functions/  — column-level helpers: uint256/hex policy, keccak-256, ABI decode
    operators/  — dataflow operators: log decode, oracles, folds, merges, dedup, ANN
    sources/    — fixture/bronze table readers and synthetic chain-data generators
    plans/      — end-to-end query plans (crawl/load pipeline, analytics queries)
    streaming/  — incremental (tail) ingestion via foreachBatch
"""

__version__ = "0.1.0"
