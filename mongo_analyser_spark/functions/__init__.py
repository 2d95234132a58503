"""Scalar function library (SURVEY.md §2.8): conversion, display,
text analysis, vector math — all pure Column expressions (JVM-side,
whole-stage-codegen friendly); no row-at-a-time Python UDFs."""
