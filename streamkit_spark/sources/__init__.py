from streamkit_spark.sources.registry import read_source, stream_source

__all__ = ["read_source", "stream_source"]
