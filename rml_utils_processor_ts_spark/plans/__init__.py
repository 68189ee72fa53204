"""Driver-side mapping front-end: Turtle/RML/YARRRML parsing, the
MappingPlan dataclasses, and plan rewrites (IncRML/CDC expansion).

Everything in this package runs on the driver over tiny mapping
documents — the distributed work happens in ``operators``/``sources``.
"""

from .serializer import plan_to_rml, yarrrml2rml  # noqa: E402,F401
