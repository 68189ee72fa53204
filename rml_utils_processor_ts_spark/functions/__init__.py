"""Scalar-function layer: FnO registry (the reference's UDF mechanism,
SURVEY.md §2.B10), IRI encoding, and text-analytics Column builders.

Everything here produces JVM-side Column expressions (whole-stage
codegen); pandas UDFs appear only where a builtin genuinely cannot
express the semantics.
"""

from .fno import compile_function, is_stateful_function  # noqa: F401
from .iri import iri_encode  # noqa: F401
