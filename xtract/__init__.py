"""xtract — PySpark-native main-content extraction engine.

A from-scratch rebuild of the computed semantics of SunJINM/doc-ocr
(question-block splitting, layout classification, text↔image spatial
merge, structuring) over multi-turn transcript tables, designed for
10^12-turn scale: Arrow-batched per-turn kernels, zero-shuffle fused
plan, explicit turn-key partitioning, deterministic rule paths in
place of every external model call. See SURVEY.md for the operator
inventory and reference citations.
"""
__version__ = "0.1.0"
