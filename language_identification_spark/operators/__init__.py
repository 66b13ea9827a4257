"""Spark operators: Arrow-batched pandas UDFs + native column expressions.

Every operator here follows the same contract: semantics are defined by the
pure functions in ``language_identification_spark.oracle`` and the Spark
realization must reproduce them byte-identically (tested in tests/test_parity.py).

Design rules (SURVEY.md §2.10, §4):
- Iterator-of-Series pandas UDFs so per-executor state (compiled regexes,
  broadcast models) is touched once per worker, not once per batch.
- Threshold comparisons / arithmetic over extracted stats are native Column
  expressions (JVM, whole-stage codegen) — only irreducibly-Python text work
  (unicode category scans, model scoring) runs in Python workers.
- No per-row Python UDFs anywhere (input_hint mandate).
"""
