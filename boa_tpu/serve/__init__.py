"""Serving: batched study-stream execution (BASELINE config #5)."""

from boa_tpu.serve.stream import StreamRunner, StreamStats  # noqa: F401
