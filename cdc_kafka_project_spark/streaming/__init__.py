"""Structured Streaming layer: the reference's producer/consumer loops
re-expressed as streaming DataFrames + foreachBatch sinks."""
