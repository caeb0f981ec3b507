"""Pure-Python per-document kernels.

These run inside Spark executors on Arrow record batches (one call per
batch of documents). They hold all per-document state (font tables, CMaps,
graphics-state machines) locally; only flat result columns leave the UDF.
"""
