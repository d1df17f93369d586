"""Scalar / string / similarity / scoring functions (SURVEY.md §2.7).

All hot-path functions are pure Column expressions (JVM-side, codegen'd);
pandas UDFs appear only where numpy batch math is genuinely needed
(embedding scoring) and are Arrow-batched, never per-row.
"""
