"""Batched model-inference plumbing: decode math, backends, Spark stages.

The ONNX sessions themselves are per-executor-process singletons created
lazily inside the pandas-UDF closure (ref pattern: OrtInferSession,
lineless_table_rec/utils/utils.py:33-224); in this container onnxruntime is
absent, so a deterministic stub backend exercises the identical plumbing.
"""
