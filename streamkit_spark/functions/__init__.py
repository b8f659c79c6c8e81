from streamkit_spark.functions import curation, dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "curation", "multimodal"]
