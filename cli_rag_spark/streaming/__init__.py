"""Structured Streaming surface (SURVEY §1.4, §2.c).

The reference has no streaming abstraction — its REPL is a driver
loop (multirag.c:394-456). The engine's streaming layer re-expresses
the time-series operators of the events pack as incremental plans:
watermarked windowed aggregation and custom stateful sessionization
(applyInPandasWithState). See ops.py.
"""
