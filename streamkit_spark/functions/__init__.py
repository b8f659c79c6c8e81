from streamkit_spark.functions import dedup, similarity, text

__all__ = ["text", "dedup", "similarity"]
