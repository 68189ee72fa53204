"""YARRRML front-end: compile the YAML mapping DSL directly to a
MappingPlan (the ``js:Y2R`` capability, /root/reference/src/yarrrml/yarrrml.ts
— the reference delegates to @rmlio/yarrrml-parser; we implement the
subset its fixtures and docs exercise natively).

Supported YARRRML surface (yarrrml.test.ts:8-22 + spec basics):
  * ``prefixes``; ``mappings`` (also ``mapping``);
  * ``sources`` entries ``["file~formulation", "iterator"]`` or mapping
    form {access, referenceFormulation, iterator}; formulations xpath /
    jsonpath / csv (+ our table/pages extensions);
  * ``s``/``subject`` templates with ``$(ref)`` and prefixed names;
  * ``po`` pairs ``[predicate, object]`` (object ``$(ref)``, template,
    constant, or ``[value, datatype]``), ``a`` for rdf:type;
  * ``graph``/``graphs`` on a mapping;
  * po objects referencing other mappings: {mapping: X, condition:
    {function: equal, parameters: [[str1, $(c)], [str2, $(p)]]}}
    -> referencing object map with join condition.
"""

from __future__ import annotations

import re

import yaml

from . import voc
from .model import (
    JoinCondition,
    LogicalSource,
    MappingPlan,
    PredicateObjectMap,
    SubjectMap,
    TermMap,
    TriplesMap,
)

_REF_RE = re.compile(r"\$\(([^)]+)\)")

_FORMULATIONS = {
    "xpath": "xpath",
    "jsonpath": "jsonpath",
    "csv": "csv",
    "table": "table",
    "pages": "pages",
}


class YarrrmlError(ValueError):
    pass


def _expand_prefixed(value: str, prefixes: dict[str, str]) -> str:
    if ":" in value and not value.startswith(("http://", "https://", "urn:", "file:")):
        pfx, _, local = value.partition(":")
        if pfx in prefixes:
            return prefixes[pfx] + local
    return value


def _to_template(value: str, prefixes: dict[str, str]) -> TermMap:
    """YARRRML value -> TermMap: $(x) refs become {x} template slots;
    no refs -> constant."""
    expanded = _expand_prefixed(value, prefixes)
    if _REF_RE.search(expanded):
        template = _REF_RE.sub(lambda m: "{" + m.group(1) + "}", expanded)
        # a bare $(x) is a reference, not a template
        if re.fullmatch(r"\{[^{}]+\}", template):
            return TermMap(reference=template[1:-1])
        return TermMap(template=template)
    return TermMap(constant=expanded, constant_is_iri=expanded.startswith(("http://", "https://", "urn:")))


def _parse_source(entry, name: str) -> LogicalSource:
    if isinstance(entry, list):
        access = entry[0]
        iterator = entry[1] if len(entry) > 1 else None
    elif isinstance(entry, dict):
        access = entry.get("access") or entry.get("source")
        iterator = entry.get("iterator")
        if "referenceFormulation" in entry:
            access = f"{access}~{entry['referenceFormulation'].lower().rsplit('#')[-1]}"
    else:
        access = str(entry)
        iterator = None
    if "~" in access:
        location, _, form = access.rpartition("~")
        kind = _FORMULATIONS.get(form.lower())
        if kind is None:
            raise YarrrmlError(f"mapping {name}: unknown formulation {form!r}")
    else:
        location, kind = access, "csv"
    return LogicalSource(source=location, kind=kind, iterator=iterator)


def _parse_po(entry, prefixes: dict[str, str], name: str) -> PredicateObjectMap:
    if isinstance(entry, dict):
        preds = entry.get("p") or entry.get("predicate") or entry.get("predicates")
        objs = entry.get("o") or entry.get("object") or entry.get("objects")
        pred_val = preds[0] if isinstance(preds, list) else preds
        obj_val = objs[0] if isinstance(objs, list) else objs
    elif isinstance(entry, list) and len(entry) >= 2:
        pred_val, obj_val = entry[0], entry[1]
        if len(entry) == 3:
            obj_val = [entry[1], entry[2]]
    else:
        raise YarrrmlError(f"mapping {name}: malformed po entry {entry!r}")

    if pred_val == "a":
        pred = TermMap(constant=voc.RDF_TYPE, constant_is_iri=True)
    else:
        pred = TermMap(constant=_expand_prefixed(str(pred_val), prefixes), constant_is_iri=True)

    # referencing object map: {mapping: other, condition: {...}}
    if isinstance(obj_val, dict) and "mapping" in obj_val:
        joins: list[JoinCondition] = []
        cond = obj_val.get("condition")
        if cond:
            params = {p[0]: p[1] for p in cond.get("parameters", [])}
            child = params.get("str1")
            parent = params.get("str2")
            if child is None or parent is None:
                raise YarrrmlError(f"mapping {name}: join condition needs str1 + str2")
            joins.append(
                JoinCondition(
                    child=_to_template(str(child), prefixes),
                    parent=_to_template(str(parent), prefixes),
                )
            )
        return PredicateObjectMap(
            predicate=pred,
            object=None,
            parent_triples_map=f"urn:yarrrml:{obj_val['mapping']}",
            join_conditions=joins,
        )

    datatype = None
    language = None
    if isinstance(obj_val, list):
        datatype = _expand_prefixed(str(obj_val[1]), prefixes) if len(obj_val) > 1 else None
        obj_val = obj_val[0]
        if datatype and datatype.startswith("~lang"):
            language, datatype = None, None
    obj = _to_template(str(obj_val), prefixes)
    if datatype:
        obj.datatype = datatype
    if language:
        obj.language = language
    if pred_val == "a":
        obj.term_type = "IRI"
    return PredicateObjectMap(predicate=pred, object=obj)


def yarrrml_to_plan(doc: str, source_bindings: dict[str, str] | None = None) -> MappingPlan:
    data = yaml.safe_load(doc)
    if not isinstance(data, dict):
        raise YarrrmlError("YARRRML document must be a YAML mapping")
    prefixes = {k: str(v) for k, v in (data.get("prefixes") or {}).items()}
    mappings = data.get("mappings") or data.get("mapping")
    if not mappings:
        raise YarrrmlError("YARRRML document has no mappings")
    bindings = source_bindings or {}

    tms: list[TriplesMap] = []
    for name, m in mappings.items():
        sources = m.get("sources") or m.get("source")
        if not sources:
            raise YarrrmlError(f"mapping {name}: no sources")
        if not isinstance(sources, list):
            sources = [sources]
        ls = _parse_source(sources[0], name)
        ls.source = bindings.get(ls.source, ls.source)

        subj_val = m.get("s") or m.get("subject") or m.get("subjects")
        if subj_val is None:
            raise YarrrmlError(f"mapping {name}: no subject")
        if isinstance(subj_val, list):
            subj_val = subj_val[0]
        subject = _to_template(str(subj_val), prefixes)

        graph_val = m.get("graph") or m.get("graphs")
        graph_map = None
        if graph_val is not None:
            if isinstance(graph_val, list):
                graph_val = graph_val[0]
            graph_map = _to_template(str(graph_val), prefixes)

        poms = [_parse_po(e, prefixes, name) for e in (m.get("po") or m.get("predicateobjects") or [])]
        tms.append(
            TriplesMap(
                name=f"urn:yarrrml:{name}",
                logical_source=ls,
                subject_map=SubjectMap(term_map=subject, graph_map=graph_map),
                predicate_object_maps=poms,
                label=str(name),
            )
        )
    return MappingPlan(triples_maps=tms, source_bindings=bindings)
