"""Custom operators the DataFrame API doesn't ship natively.

Each is a composition of built-in ops where semantics allow (SURVEY.md
§5: "custom work is algorithmic, not planner-level"), falling back to
Arrow-batched Pandas UDFs only where per-group imperative logic is
irreducible (FSM).
"""

from trembita_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from trembita_spark.operators.fsm import fsm_scan, sessionize, sessionize_fsm
from trembita_spark.operators.graph import (
    bfs,
    kcore_peel,
    label_propagation,
    pagerank,
    sssp,
    triangle_count,
)
from trembita_spark.operators.joins import asof_join, interval_overlap_join, range_join
from trembita_spark.operators.multimodal import attach_payload, extract_features
from trembita_spark.operators.ranking import ntile_exact
from trembita_spark.operators.stats import ks_2samp, mann_whitney_u
from trembita_spark.operators.similarity import (
    cosine_pairs_within,
    cosine_topk,
    ivf_topk,
    ivf_topk_refined,
)
from trembita_spark.operators.text import (
    canonical_url,
    fingerprint,
    lang_id,
    quality_features,
    tf_idf_ratio,
    token_counts,
    word_counts,
)

__all__ = [
    "bfs",
    "kcore_peel",
    "label_propagation",
    "pagerank",
    "sssp",
    "triangle_count",
    "fsm_scan",
    "sessionize",
    "sessionize_fsm",
    "asof_join",
    "interval_overlap_join",
    "ntile_exact",
    "ks_2samp",
    "mann_whitney_u",
    "range_join",
    "exact_dedup",
    "minhash_lsh_candidates",
    "simhash",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "cosine_pairs_within",
    "ivf_topk",
    "ivf_topk_refined",
    "word_counts",
    "tf_idf_ratio",
    "lang_id",
    "quality_features",
    "token_counts",
    "fingerprint",
    "canonical_url",
    "attach_payload",
    "extract_features",
]
