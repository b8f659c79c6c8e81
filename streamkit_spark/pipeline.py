"""End-to-end training-data curation pipeline — the composition the
north-star asks for: ingest → exact dedup → near-dedup → quality filter →
per-language stats.  One declarative plan end to end: Catalyst sees the
whole graph, so filters push below dedup joins, and nothing materializes
between stages unless asked.

At 100 TB this runs as: one pass for hashes/quality (map-only), one
shuffle for exact dedup, the LSH banding shuffles for near-dedup, one
final shuffle for stats — with the near-dup verify join always on the
small candidate side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamkit_spark.functions import dedup as D
from streamkit_spark.functions import text as TX


@dataclass(frozen=True)
class CurationConfig:
    ngram: int = 3
    jaccard_threshold: float = 0.8
    min_quality: float = 0.3
    min_tokens: int = 5
    use_lsh: bool = True  # False → exact shingle-join candidates (oracle-able)
    # near-dup drop policy.  False (default): drop every id_b of a
    # qualifying pair — conservative, keeps docs whose only similar
    # neighbours were already dropped.  True: collapse each CONNECTED
    # COMPONENT of the pair graph to its min-id representative (the
    # transitive policy of Lee et al. 2022, "Deduplicating Training Data
    # Makes Language Models Better") via dedup.duplicate_clusters.
    cluster_dedup: bool = False
    # additionally drop docs sharing long verbatim substrings (winnowing
    # pairs with >= substring_min_shared agreeing fingerprints — the
    # ExactSubstr stage of Lee et al. 2022; 0 disables)
    substring_min_shared: int = 0
    substring_k: int = 16
    substring_w: int = 8


def curate(docs: DataFrame, cfg: CurationConfig = CurationConfig()) -> DataFrame:
    """Returns the curated document set with quality metadata attached.

    Keep rules (all deterministic, min-doc_id wins):
      1. drop exact duplicates (normalized-text md5, keep min id);
      2. drop near-duplicates (jaccard ≥ threshold, keep the smaller id of
         each pair — i.e. drop any doc that appears as id_b);
      3. drop low-quality docs (quality < min_quality or too few tokens).
    """
    exact = D.dedup_exact(docs)
    if cfg.use_lsh:
        near_pairs = D.minhash_lsh_pairs(
            exact, ngram=cfg.ngram, threshold=cfg.jaccard_threshold
        )
    else:
        near_pairs = D.ngram_jaccard_pairs(
            exact, n=cfg.ngram, threshold=cfg.jaccard_threshold
        )
    if cfg.cluster_dedup:
        clusters = D.duplicate_clusters(near_pairs)
        kept = D.dedup_keep_canonical(exact, clusters)
    else:
        drop_ids = near_pairs.select(F.col("id_b").alias("doc_id")).distinct()
        kept = exact.join(drop_ids, "doc_id", "left_anti")
    if cfg.substring_min_shared > 0:
        sub_pairs = D.substring_dup_pairs(
            kept,
            k=cfg.substring_k,
            w=cfg.substring_w,
            min_shared=cfg.substring_min_shared,
        )
        sub_drop = sub_pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        kept = kept.join(sub_drop, "doc_id", "left_anti")
    scored = kept.withColumn("quality", F.round(TX.quality_score("text"), 4)).withColumn(
        "n_tokens", TX.token_count("text").cast("long")
    )
    return scored.filter(
        (F.col("quality") >= cfg.min_quality)
        & (F.col("n_tokens") >= cfg.min_tokens)
    )


def curation_report(docs: DataFrame, cfg: CurationConfig = CurationConfig()) -> DataFrame:
    """Per-language summary of the curated corpus."""
    out = curate(docs, cfg)
    return (
        out.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum(F.col("quality").cast("decimal(18,4)")).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_quality"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang")
    )
