"""Shared expression builders — see expressions.py."""

from bigarrays_jl_spark.functions.expressions import (  # noqa: F401
    cosine, dot, norm2, shingle_array, tokens)

__all__ = ["cosine", "dot", "norm2", "shingle_array", "tokens"]
