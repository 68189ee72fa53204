"""IRI-safe encoding for template-produced IRIs.

RML template semantics require values interpolated into IRI templates to
be percent-encoded (the behavior RMLMapper applies to rr:template in IRI
position; exercised by the reference fixture templates, e.g.
``http://example.org/{@id}`` at /root/reference/test/rml.test.ts:42).

Implemented entirely with built-in JVM expressions: ``url_encode``
(application/x-www-form-urlencoded) post-fixed to RFC-3986 form
(space '+' -> '%20', '%7E' -> '~'), keeping the hot path inside
whole-stage codegen — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iri_encode(col: Column) -> Column:
    encoded = F.url_encode(col)
    encoded = F.regexp_replace(encoded, r"\+", "%20")
    encoded = F.regexp_replace(encoded, r"%7E", "~")
    return encoded
