"""Shared expression builders — see expressions.py."""

from bigarrays_jl_spark.functions.expressions import (  # noqa: F401
    cosine, dot, fingerprint, guarded_cosine, moment_partials,
    moment_stats, norm2, norm_text, shingle_array, tokens)

__all__ = ["cosine", "dot", "fingerprint", "guarded_cosine",
           "moment_partials", "moment_stats", "norm2", "norm_text",
           "shingle_array", "tokens"]
