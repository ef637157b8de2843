"""Scalar function libraries — pure Column expressions (JVM-side,
whole-stage-codegen'd); Python/pandas UDFs only where built-ins cannot
express the semantics."""

from usajobs_etl_service_spark.functions import transforms, text, vectors  # noqa: F401
