"""Relational + extension operators. Each module documents the SURVEY §2
operator IDs it implements and the reference file:line it matches.

Persist lifecycle (the central statement of the per-site
"triangle_stats posture" comments — ADVICE r12):

Several operators ``persist(MEMORY_AND_DISK)`` a multi-consumer
intermediate and return a LAZY frame, so there is no post-action point
inside the operator at which the cache could be released. Memory
blocks are LRU-evictable, but evicted MEMORY_AND_DISK blocks spill to
local disk and are only freed on unpersist or session shutdown — a
long-lived session running many such queries accumulates disk usage
without bound. Callers that loop therefore have two release points:

- pass ``unpersist_handle=[]`` where the operator accepts it
  (semdedup.semantic_dedup, semdedup.prototypicality_prune,
  association.association_rules, retrieval.bigram_lm_scores,
  retrieval.kneser_ney_scores, classifier.hashed_linear_score,
  neardup.containment_pairs): the operator appends every frame it
  persisted, and the caller unpersists them once its action completes;
- or call ``spark.catalog.clearCache()`` between queries, which is
  what bench.py does (round 13) — it also stops Spark's CacheManager
  plan-fingerprint matching from silently serving one query's cold run
  from a sibling query's cache.
"""
