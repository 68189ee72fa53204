"""Term-map -> Column compiler (SURVEY.md §2.B6-B8).

Every term map (constant | reference | template | function) compiles to a
single JVM-side Column expression; templates become concat chains with
IRI-encoding on interpolated values in IRI positions
(``http://example.org/{@id}`` -> ``concat(lit, iri_encode(col))``,
fixture at /root/reference/test/rml.test.ts:42). XPath string-concat
references (``('p0=' || @id || ...)``, the watched-property form built at
/root/reference/src/rml/incrml.ts:462-478) compile structurally to
``concat`` as well — no XPath engine in the hot path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.fno import compile_function
from ..functions.iri import iri_encode

# template_parts lives beside the TermMap model so that
# TermMap.references() and this compiler read templates identically
# (re-exported here for the executor and tests)
from ..plans.model import (
    FunctionCall,
    TermMap,
    parse_concat_reference,
    template_parts,
)

RefResolver = Callable[[str], Column]


def compile_template(template: str, resolve: RefResolver, iri_position: bool) -> Column:
    cols: list[Column] = []
    refs_seen: list[Column] = []
    for kind, val in template_parts(template):
        if kind == "lit":
            cols.append(F.lit(val))
        else:
            ref_col = resolve(val)
            refs_seen.append(ref_col)
            cols.append(iri_encode(ref_col) if iri_position else ref_col)
    expr = F.concat(*cols) if cols else F.lit("")
    # RML: a template with any null reference produces no term
    for rc in refs_seen:
        expr = F.when(rc.isNull(), F.lit(None)).otherwise(expr)
    return expr


def compile_reference(ref: str, resolve: RefResolver) -> Column:
    parts = parse_concat_reference(ref)
    if parts is None:
        return resolve(ref)
    # XPath '||' yields the empty string for a missing node (reference
    # stack semantics): coalesce each ref so one absent watched property
    # contributes an empty segment instead of nulling the whole
    # fingerprint and masking changes to the other properties.
    cols = [F.lit(v) if k == "lit" else F.coalesce(resolve(v), F.lit("")) for k, v in parts]
    return F.concat(*cols)


def compile_term_map(tm: TermMap, resolve: RefResolver, position: str) -> Column:
    """position in {'subject','predicate','object','graph','value','boolean'}."""
    iri_pos = effective_term_type(tm, position) == "IRI"
    if tm.constant is not None:
        if position == "boolean":
            return F.lit(tm.constant.lower() == "true")
        return F.lit(tm.constant)
    if tm.template is not None:
        return compile_template(tm.template, resolve, iri_pos and position != "value")
    if tm.reference is not None:
        col = compile_reference(tm.reference, resolve)
        if position == "boolean":
            return F.lower(col) == F.lit("true")
        return col
    if tm.function is not None:
        return compile_function(tm.function, lambda p, pos: compile_term_map(p, resolve, pos))
    raise ValueError("empty TermMap")


def compile_language(tm: TermMap, resolve: RefResolver) -> Column:
    """The o_lang column for an object term map: the static rr:language
    string, or a data-derived rml:languageMap (newer RML spec)."""
    if tm.language_map is not None:
        return compile_term_map(tm.language_map, resolve, "value")
    return F.lit(tm.language).cast("string")


def compile_datatype(tm: TermMap, resolve: RefResolver) -> Column:
    """The o_datatype column: static rr:datatype IRI, or a data-derived
    rml:datatypeMap (newer RML spec)."""
    if tm.datatype_map is not None:
        return compile_term_map(tm.datatype_map, resolve, "value")
    return F.lit(tm.datatype).cast("string")


def effective_term_type(tm: TermMap, position: str) -> str:
    """RML default term types: subject/predicate/graph are IRIs; an object
    is a Literal for references, an IRI for templates/IRI-constants unless
    rr:termType overrides (rr vocabulary, /root/reference/src/voc.ts:65)."""
    if tm.term_type is not None:
        return tm.term_type
    if position in ("subject", "predicate", "graph"):
        return "IRI"
    if position == "object":
        # R2RML §7.4.1: a term map carrying rr:language / rr:datatype
        # (or the data-derived rml:languageMap / rml:datatypeMap)
        # defaults to rr:Literal even when template/constant-valued
        if (
            tm.language is not None
            or tm.language_map is not None
            or tm.datatype is not None
            or tm.datatype_map is not None
        ):
            return "Literal"
        if tm.reference is not None:
            return "Literal"
        if tm.constant is not None:
            # the parser records the RDF term kind; a string literal that
            # merely starts with "http" stays a Literal (R2RML: constant
            # object maps take the term type of the constant itself)
            return "IRI" if tm.constant_is_iri else "Literal"
        if tm.function is not None:
            return "Literal"
        return "IRI"  # template
    return "Literal"


def stateful_subject_spec(tm: TermMap) -> FunctionCall | None:
    """Return the FunctionCall if this subject map is a stateful CDC
    function term map (idlab-fn:explicitCreate/implicitUpdate/implicitDelete)."""
    from ..functions.fno import is_stateful_function

    if tm.function is not None and is_stateful_function(tm.function):
        return tm.function
    return None
