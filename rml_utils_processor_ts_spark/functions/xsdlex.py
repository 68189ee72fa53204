"""XSD canonical lexical forms for datatyped literals (SURVEY.md §2.B6).

R2RML §10.2 / the RML literal-generation rule say the lexical form of a
typed literal SHOULD be the *canonical* lexical representation of the
value when the raw lexical form is in the datatype's lexical space
(RMLMapper parses the value into a typed Java object and re-serializes
it canonically — ``"20.0"^^xsd:double`` becomes ``2.0E1``,
``"1"^^xsd:boolean`` becomes ``true``, ``"05.10"^^xsd:decimal`` becomes
``5.1``). Values OUTSIDE the lexical space pass through unchanged (an
ill-typed literal is emitted as-is, matching RMLMapper's lenient mode).

Everything here is built-in-expression string surgery (regexp_extract /
regexp_replace / concat / when) so the object column stays inside
whole-stage codegen — no UDF, no higher-order function. The transforms
only attach to object maps that *statically* carry one of the four
canonicalizable datatypes (or a data-derived rml:datatypeMap, which
pays a runtime CASE over the four) — the overwhelmingly common untyped
/ xsd:string object map pays nothing.

Canonical rules implemented (XSD 1.1 §3.3):

- ``xsd:boolean``  — lexical space {true,false,1,0}; canonical {true,false}.
- ``xsd:integer``  — optional sign + digits; canonical drops '+', leading
  zeros, and normalizes -0 to 0.
- ``xsd:decimal``  — canonical requires a decimal point with at least one
  digit on each side, no leading/trailing zeros, no '+', -0.0 -> 0.0.
- ``xsd:double`` / ``xsd:float`` — canonical scientific mantissa E
  exponent with a single nonzero digit before the point (20.0 -> 2.0E1,
  0.005 -> 5.0E-3, 0 -> 0.0E0); INF/-INF/NaN pass through.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_BOOLEAN = _XSD + "boolean"
XSD_INTEGER = _XSD + "integer"
XSD_DECIMAL = _XSD + "decimal"
XSD_DOUBLE = _XSD + "double"
XSD_FLOAT = _XSD + "float"

_INT_LEX = r"^[+-]?[0-9]+$"
_DEC_LEX = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"
_DBL_LEX = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"


def canonical_boolean(c: Column) -> Column:
    """{1,true} -> true, {0,false} -> false; anything else untouched."""
    return (
        F.when(c == "1", F.lit("true"))
        .when(c == "0", F.lit("false"))
        .otherwise(c)
    )


def canonical_integer(c: Column) -> Column:
    neg = c.startswith("-")
    digits = F.regexp_replace(F.regexp_replace(c, r"^[+-]", ""), r"^0+", "")
    canon = F.when(digits == "", F.lit("0")).otherwise(
        F.when(neg, F.concat(F.lit("-"), digits)).otherwise(digits)
    )
    return F.when(c.rlike(_INT_LEX), canon).otherwise(c)


def canonical_decimal(c: Column) -> Column:
    neg = c.startswith("-")
    body = F.regexp_replace(c, r"^[+-]", "")
    ip = F.regexp_replace(F.regexp_extract(body, r"^([0-9]*)", 1), r"^0+", "")
    fp = F.regexp_replace(F.regexp_extract(body, r"\.([0-9]*)$", 1), r"0+$", "")
    ip2 = F.when(ip == "", F.lit("0")).otherwise(ip)
    fp2 = F.when(fp == "", F.lit("0")).otherwise(fp)
    nonzero = (ip2 != "0") | (fp2 != "0")
    sign = F.when(neg & nonzero, F.lit("-")).otherwise(F.lit(""))
    canon = F.concat(sign, ip2, F.lit("."), fp2)
    return F.when(c.rlike(_DEC_LEX), canon).otherwise(c)


def canonical_double(c: Column) -> Column:
    """Scientific canonical form. Digit-shift construction: concatenate
    all digits, locate the first nonzero one, put the point after it,
    and fold the shift into the exponent — pure string surgery, exact
    (no float round-trip)."""
    neg = c.startswith("-")
    body = F.regexp_replace(c, r"^[+-]", "")
    ip = F.regexp_extract(body, r"^([0-9]*)", 1)
    fp = F.regexp_extract(body, r"\.([0-9]*)", 1)
    exp0 = F.regexp_extract(body, r"[eE]([+-]?[0-9]+)$", 1)
    exp0i = F.when(exp0 == "", F.lit(0)).otherwise(exp0.cast("int"))
    digits = F.concat(ip, fp)
    stripped = F.regexp_replace(digits, r"^0+", "")
    lead_zeros = F.length(digits) - F.length(stripped)
    # exponent of the first significant digit: (digits before the point)
    # - (leading zeros) - 1, plus any explicit exponent
    exp = F.length(ip) - lead_zeros - 1 + exp0i
    md = F.regexp_replace(stripped, r"0+$", "")
    mant = F.when(F.length(md) <= 1, F.concat(md, F.lit(".0"))).otherwise(
        F.concat(F.substring(md, 1, 1), F.lit("."), F.substring(md, 2, 1000))
    )
    sign = F.when(neg, F.lit("-")).otherwise(F.lit(""))
    zero = F.concat(sign, F.lit("0.0E0"))
    canon = F.when(stripped == "", zero).otherwise(
        F.concat(sign, mant, F.lit("E"), exp.cast("string"))
    )
    return F.when(c.rlike(_DBL_LEX), canon).otherwise(c)


_CANON_BY_TYPE = {
    XSD_BOOLEAN: canonical_boolean,
    XSD_INTEGER: canonical_integer,
    XSD_DECIMAL: canonical_decimal,
    XSD_DOUBLE: canonical_double,
    XSD_FLOAT: canonical_double,
}


def canonicalize_typed(obj: Column, static_datatype: str | None, dtype_col: Column | None) -> Column:
    """Attach the canonical-form transform for a typed object column.

    ``static_datatype`` set (plan-time rr:datatype): the one matching
    transform compiles in, or the column passes through untouched for
    non-canonicalizable types. ``dtype_col`` set (data-derived
    rml:datatypeMap): a runtime CASE over the four canonicalizable
    datatype IRIs. Neither: identity.
    """
    if static_datatype is not None:
        fn = _CANON_BY_TYPE.get(static_datatype)
        return fn(obj.cast("string")) if fn is not None else obj
    if dtype_col is not None:
        s = obj.cast("string")
        out = s
        # chained CASE: Catalyst folds this into one CaseWhen
        expr = F.when(dtype_col == XSD_BOOLEAN, canonical_boolean(s))
        expr = expr.when(dtype_col == XSD_INTEGER, canonical_integer(s))
        expr = expr.when(dtype_col == XSD_DECIMAL, canonical_decimal(s))
        expr = expr.when(
            (dtype_col == XSD_DOUBLE) | (dtype_col == XSD_FLOAT), canonical_double(s)
        )
        return expr.otherwise(out)
    return obj
