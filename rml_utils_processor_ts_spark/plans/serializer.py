"""MappingPlan -> RML Turtle serializer.

Closes the reference's string-level processor contracts: ``js:Y2R``
emits RML *quads as text* (``/root/reference/src/yarrrml/yarrrml.ts:8-12``)
and ``js:IncRMLTransformer`` emits a rewritten RML *document*
(``/root/reference/src/rml/incrml.ts:67-79``) — our compilers produce
:class:`MappingPlan` dataclasses, and this module renders a plan back to
Turtle that :func:`plans.rml_parser.parse_mapping` re-parses to an
equivalent plan (round-trip asserted by ``plan_hash`` equality in
tests/test_serializer.py).

The emitted subset is exactly what the parser consumes: term maps
(constant/reference/template/function), nested FnO function values,
referencing object maps in the idlab-fn:equal + rr:parentTermMap form,
graph maps, classes, logical targets (incl. LDES blocks), and logical
sources (incl. rml:query / csvw dialect / kafka rmls blocks).
"""

from __future__ import annotations

from . import voc
from .model import (
    FunctionCall,
    LogicalSource,
    LogicalTarget,
    MappingPlan,
    PredicateObjectMap,
    SubjectMap,
    TermMap,
    TriplesMap,
)

_FORMULATION_IRI = {
    "xpath": voc.QL_XPATH,
    "jsonpath": voc.QL_JSONPATH,
    "csv": voc.QL_CSV,
    "table": voc.QL_TABLE,
    "pages": voc.QL_PAGES,
}


def _lit(s: str) -> str:
    """Turtle literal — long form when the value contains newlines or
    double quotes (how rml:query SQL survives unescaped). A carriage
    return is grammatically illegal raw inside a single-line quoted
    literal (STRING_LITERAL_QUOTE excludes #xD), so any \\r forces the
    fully-escaped short form with \\r ECHAR'd."""
    if "\n" in s or '"' in s or "\r" in s:
        # a backslash in long form would still ECHAR-decode on re-parse,
        # so backslash-bearing values take the fully-escaped short form
        if '"""' not in s and not s.endswith('"') and "\\" not in s and "\r" not in s:
            return f'"""{s}"""'
        body = (
            s.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )
        return f'"{body}"'
    return '"' + s.replace("\\", "\\\\") + '"'


def _iri(v: str) -> str:
    return f"<{v}>"


def _indent(block: str, pad: str) -> str:
    return "\n".join(pad + line if line else line for line in block.splitlines())


def _function_block(fn: FunctionCall) -> str:
    lines = [
        "fnml:functionValue [",
        f"  rr:predicateObjectMap [ rr:predicate {_iri(voc.FNO_EXECUTES)} ; "
        f"rr:objectMap [ rr:constant {_iri(fn.function_iri)} ] ] ;",
    ]
    for key, tm in fn.params.items():
        inner = _term_map_block(tm, object_position=True)
        lines.append(
            f"  rr:predicateObjectMap [ rr:predicate {_iri(key)} ; rr:objectMap [ {inner} ] ] ;"
        )
    lines[-1] = lines[-1].rstrip(";").rstrip() + ""
    lines.append("]")
    return "\n".join(lines)


def _term_map_block(tm: TermMap, object_position: bool = False) -> str:
    """Inner predicates of a term-map bnode (no surrounding brackets)."""
    parts: list[str] = []
    if tm.function is not None:
        parts.append("a fnml:FunctionTermMap")
        parts.append(_function_block(tm.function))
    elif tm.constant is not None:
        if tm.constant_is_iri:
            parts.append(f"rr:constant {_iri(tm.constant)}")
        else:
            parts.append(f"rr:constant {_lit(tm.constant)}")
    elif tm.template is not None:
        parts.append(f"rr:template {_lit(tm.template)}")
    elif tm.reference is not None:
        parts.append(f"rml:reference {_lit(tm.reference)}")
    if tm.term_type is not None:
        parts.append(f"rr:termType rr:{tm.term_type}")
    if tm.datatype is not None:
        parts.append(f"rr:datatype {_iri(tm.datatype)}")
    if tm.language is not None:
        parts.append(f"rr:language {_lit(tm.language)}")
    if tm.language_map is not None:
        parts.append(
            "rml:languageMap [ " + _term_map_block(tm.language_map).replace("\n", " ") + " ]"
        )
    if tm.datatype_map is not None:
        parts.append(
            "rml:datatypeMap [ " + _term_map_block(tm.datatype_map).replace("\n", " ") + " ]"
        )
    if tm.inverse_expression is not None:
        parts.append(f"rr:inverseExpression {_lit(tm.inverse_expression)}")
    return " ;\n".join(parts)


def _target_block(lt: LogicalTarget) -> str:
    kind = voc.RMLT_EVENT_STREAM_TARGET if lt.is_ldes else voc.RMLT_LOGICAL_TARGET
    lines = [f"{_iri(lt.target_id)} a {_iri(kind)} ;"]
    if lt.location is not None:
        lines.append(
            f"  {_iri(voc.RMLT_TARGET)} [ a {_iri(voc.VOID + 'Dataset')} ; "
            f"{_iri(voc.VOID_DATA_DUMP)} {_iri(lt.location)} ] ;"
        )
    if lt.serialization is not None:
        lines.append(f"  {_iri(voc.RMLT_SERIALIZATION)} {_iri(lt.serialization)} ;")
    if lt.ldes_timestamp_path or lt.ldes_version_of_path or lt.ldes_shape:
        inner = []
        if lt.ldes_timestamp_path:
            inner.append(f"{_iri(voc.LDES_TIMESTAMP_PATH)} {_iri(lt.ldes_timestamp_path)}")
        if lt.ldes_version_of_path:
            inner.append(f"{_iri(voc.LDES_VERSION_OF_PATH)} {_iri(lt.ldes_version_of_path)}")
        if lt.ldes_shape:
            inner.append(f"{_iri(voc.TREE_SHAPE)} {_iri(lt.ldes_shape)}")
        lines.append(f"  {_iri(voc.RMLT_LDES)} [ " + " ; ".join(inner) + " ] ;")
    if lt.ldes_immutable_iri:
        lines.append(f"  {_iri(voc.RMLT_LDES_GENERATE_IMMUTABLE_IRI)} \"true\" ;")
    if lt.ldes_base_iri:
        lines.append(f"  {_iri(voc.RMLT_LDES_BASE_IRI)} {_iri(lt.ldes_base_iri)} ;")
    lines[-1] = lines[-1].rstrip(" ;") + " ."
    return "\n".join(lines)


def _source_block(ls: LogicalSource) -> str:
    lines = ["rml:logicalSource [ a rml:LogicalSource ;"]
    if ls.options.get("kafka.bootstrap.servers") or ls.kind == "kafka":
        broker = ls.options.get("kafka.bootstrap.servers", "")
        topic = ls.options.get("subscribe", "")
        inner = [
            f"a {_iri(voc.RMLS + 'KafkaStream')}",
            f"{_iri(voc.RMLS_BROKER)} {_lit(broker)}",
            f"{_iri(voc.RMLS_TOPIC)} {_lit(topic)}",
        ]
        group = ls.options.get("kafka.group.id")
        if group:
            inner.append(f"{_iri(voc.RMLS_GROUP_ID)} {_lit(group)}")
        lines.append("  rml:source [ " + " ; ".join(inner) + " ] ;")
    elif ls.kind == "csv" and ls.delimiter != ",":
        lines.append(
            f"  rml:source [ {_iri(voc.CSVW + 'url')} {_lit(ls.source)} ; "
            f"{_iri(voc.CSVW + 'dialect')} [ {_iri(voc.CSVW + 'delimiter')} {_lit(ls.delimiter)} ] ] ;"
        )
    elif ls.options.get("table_name") and ls.query:
        lines.append(f"  rr:tableName {_lit(ls.options['table_name'])} ;")
    else:
        lines.append(f"  rml:source {_lit(ls.source)} ;")
    if ls.query:
        lines.append(f"  {_iri(voc.RML_QUERY)} {_lit(ls.query)} ;")
    if ls.iterator:
        lines.append(f"  rml:iterator {_lit(ls.iterator)} ;")
    ns_json = ls.options.get("xpath.namespaces")
    if ls.kind == "xpath" and ns_json:
        # RML-IO structured formulation: prefix map round-trips
        import json as _json

        ns_blocks = " ; ".join(
            f"{_iri(voc.RMLCORE_NAMESPACE)} [ "
            f"{_iri(voc.RMLCORE_NAMESPACE_PREFIX)} {_lit(pfx)} ; "
            f"{_iri(voc.RMLCORE_NAMESPACE_URL)} {_lit(url)} ]"
            for pfx, url in sorted(_json.loads(ns_json).items())
        )
        lines.append(
            f"  rml:referenceFormulation [ a {_iri(voc.RMLCORE_XPATH_REF_FORM)} ; "
            f"{ns_blocks} ] ;"
        )
    else:
        formulation = _FORMULATION_IRI.get(ls.kind)
        if formulation:
            lines.append(f"  rml:referenceFormulation {_iri(formulation)} ;")
    lines[-1] = lines[-1].rstrip(" ;")
    lines.append("]")
    return "\n".join(lines)


def _subject_block(sm: SubjectMap) -> str:
    parts = [_term_map_block(sm.term_map)]
    for cls in sm.classes:
        parts.append(f"rr:class {_iri(cls)}")
    if sm.graph_map is not None:
        parts.append("rr:graphMap [ " + _term_map_block(sm.graph_map).replace("\n", " ") + " ]")
    if sm.logical_target is not None:
        parts.append(f"rml:logicalTarget {_iri(sm.logical_target.target_id)}")
    return "rr:subjectMap [ a rr:SubjectMap ;\n" + _indent(" ;\n".join(parts), "  ") + "\n]"


def _join_blocks(pom: PredicateObjectMap) -> str:
    out = []
    for jc in pom.join_conditions:
        child = _term_map_block(jc.child, object_position=True).replace("\n", " ")
        parent = _term_map_block(jc.parent, object_position=True).replace("\n", " ")
        out.append(
            "rml:joinCondition [ fnml:functionValue [\n"
            f"  rr:predicateObjectMap [ rr:predicate {_iri(voc.FNO_EXECUTES)} ; "
            f"rr:objectMap [ rr:constant {_iri(voc.IDLAB_EQUAL)} ] ] ;\n"
            f"  rr:predicateObjectMap [ rr:predicate {_iri(voc.GREL_VALUE_PARAMETER)} ; "
            f"rr:objectMap [ {child} ] ] ;\n"
            f"  rr:predicateObjectMap [ rr:predicate {_iri(voc.GREL_VALUE_PARAMETER2)} ; "
            f"rr:objectMap [ rr:parentTermMap [ {parent} ] ] ]\n"
            "] ]"
        )
    return " ;\n".join(out)


def _pom_block(pom: PredicateObjectMap) -> str:
    pred = _term_map_block(pom.predicate).replace("\n", " ")
    lines = ["rr:predicateObjectMap [", f"  rr:predicateMap [ {pred} ] ;"]
    if pom.parent_triples_map is not None:
        obj = [f"rr:parentTriplesMap {_iri(pom.parent_triples_map)}"]
        joins = _join_blocks(pom)
        if joins:
            obj.append(joins)
        lines.append("  rr:objectMap [ a rr:ObjectMap ;\n" + _indent(" ;\n".join(obj), "    ") + "\n  ]")
    else:
        body = _term_map_block(pom.object, object_position=True)
        lines.append("  rr:objectMap [ a rr:ObjectMap ;\n" + _indent(body, "    ") + "\n  ]")
    if pom.logical_target is not None:
        lines[-1] += " ;"
        lines.append(f"  rml:logicalTarget {_iri(pom.logical_target.target_id)}")
    if pom.graph_map is not None:
        lines[-1] += " ;"
        lines.append(
            "  rr:graphMap [ " + _term_map_block(pom.graph_map).replace("\n", " ") + " ]"
        )
    lines.append("]")
    return "\n".join(lines)


def plan_to_rml(plan: MappingPlan) -> str:
    """Serialize a MappingPlan to RML Turtle the parser round-trips."""
    targets: dict[str, LogicalTarget] = {}

    def note_target(lt: LogicalTarget | None) -> None:
        if lt is not None:
            targets[lt.target_id] = lt

    chunks: list[str] = []
    for tm in plan.triples_maps:
        note_target(tm.subject_map.logical_target)
        for pom in tm.predicate_object_maps:
            note_target(pom.logical_target)
        body = [
            _source_block(tm.logical_source),
            _subject_block(tm.subject_map),
            *[_pom_block(p) for p in tm.predicate_object_maps],
        ]
        chunk = f"{_iri(tm.name)} a rr:TriplesMap ;\n" + _indent(" ;\n".join(body), "  ") + " ."
        if tm.label:
            chunk = chunk.replace(
                "a rr:TriplesMap ;", f"a rr:TriplesMap ;\n  rdfs:label {_lit(tm.label)} ;", 1
            )
        chunks.append(chunk)
    for lt in targets.values():
        chunks.append(_target_block(lt))
    return "\n\n".join(chunks) + "\n"


def yarrrml2rml(doc: str, source_bindings: dict[str, str] | None = None) -> str:
    """The reference's ``js:Y2R`` processor contract at string level:
    YARRRML document in, serialized RML document out
    (/root/reference/src/yarrrml/yarrrml.ts:5-22)."""
    from .yarrrml import yarrrml_to_plan

    return plan_to_rml(yarrrml_to_plan(doc, source_bindings))


def rml2incrml(rml_doc: str, config, source_bindings: dict[str, str] | None = None) -> str:
    """The reference's ``js:IncRMLTransformer`` contract at string
    level: RML document in, IncRML (CDC-expanded) RML document out
    (/root/reference/src/rml/incrml.ts:67-79) — parse, expand with
    :func:`plans.incrml.expand_to_incrml`, serialize."""
    from .incrml import expand_to_incrml
    from .rml_parser import parse_mapping

    return plan_to_rml(expand_to_incrml(parse_mapping(rml_doc, source_bindings), config))
