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
    function-valued subjects ``s: {function: ..., parameters: ...}``;
  * ``po`` pairs ``[predicate, object]`` (object ``$(ref)``, template,
    constant, or ``[value, datatype]``), ``a`` for rdf:type;
  * ``graph``/``graphs`` on a mapping;
  * po objects referencing other mappings: {mapping: X, condition:
    {function: equal, parameters: [[str1, $(c)], [str2, $(p)]]}}
    -> referencing object map with join condition;
  * document-level ``sources:`` sections referenced by name from
    mappings; mapping-level ``condition:`` blocks (compiled into the
    subject as trueCondition, like the IncRML conditional-subject
    embedding); ``inversepredicates`` on po entries (both plain and
    mapping-reference objects).
"""

from __future__ import annotations

import re
from dataclasses import replace

import yaml

from . import voc
from .model import (
    FunctionCall,
    JoinCondition,
    LogicalSource,
    LogicalTarget,
    MappingPlan,
    PredicateObjectMap,
    SubjectMap,
    TermMap,
    TriplesMap,
)

_REF_RE = re.compile(r"\$\(([^)]+)\)")

# yarrrml-parser ships these prefixes built in; docs may override
_BUILTIN_PREFIXES = {
    "grel": voc.GREL,
    "idlab-fn": voc.IDLAB_FN,
    "rdf": voc.RDF,
    "rdfs": voc.RDFS,
    "xsd": voc.XSD,
}

# yarrrml condition/function shorthands (the spec's bare names)
_FN_SHORTHAND = {
    "equal": voc.IDLAB_EQUAL,
    "notEqual": voc.IDLAB_NOT_EQUAL,
    "trueCondition": voc.IDLAB_TRUE_CONDITION,
    "strBoolean": voc.IDLAB_STR_BOOLEAN,
}
_PARAM_SHORTHAND = {
    "str1": voc.GREL_VALUE_PARAMETER,
    "str2": voc.GREL_VALUE_PARAMETER2,
    "value": voc.GREL_VALUE_PARAMETER,
    "a": voc.GREL_PARAM_A,
    "sep": voc.GREL_PARAM_STRING_SEP,
}

# yarrrml object ``type:`` shorthands -> rr:termType
_TERM_TYPES = {
    "iri": "IRI",
    "literal": "Literal",
    "blank": "BlankNode",
    "blanknode": "BlankNode",
}

# yarrrml serialization shorthands -> formats: IRIs
_SERIALIZATIONS = {
    "nquads": voc.FORMATS + "N-Quads",
    "n-quads": voc.FORMATS + "N-Quads",
    "ntriples": voc.FORMATS + "N-Triples",
    "n-triples": voc.FORMATS + "N-Triples",
    "turtle": voc.FORMATS + "Turtle",
    "ttl": voc.FORMATS + "Turtle",
}


def _parse_target(target_id: str, spec) -> LogicalTarget:
    """Document-level targets: entry -> LogicalTarget. Accepts the list
    shortcut ["access~type", "serialization"] and the mapping form
    {access, type, serialization} (yarrrml spec targets surface)."""
    serialization = None
    if isinstance(spec, list):
        access = str(spec[0])
        if len(spec) > 1:
            serialization = str(spec[1])
    elif isinstance(spec, dict):
        access = str(spec.get("access") or spec.get("location") or "")
        serialization = spec.get("serialization")
    else:
        access = str(spec)
    if "~" in access:
        access = access.rpartition("~")[0]
    ser_iri = None
    if serialization:
        key = str(serialization).lower()
        ser_iri = _SERIALIZATIONS.get(key, serialization if str(serialization).startswith("http") else None)
        if ser_iri is None:
            raise YarrrmlError(f"target {target_id}: unknown serialization {serialization!r}")
    return LogicalTarget(
        target_id=f"urn:yarrrml:target:{target_id}",
        location=access or None,
        serialization=ser_iri,
    )

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


_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
# document-level ``base:`` travels in the prefix dict under a key no
# YAML prefix name can legally collide with ('@' is not a PN_PREFIX char)
_BASE_KEY = "@base"


def _apply_base(tm: TermMap, prefixes: dict[str, str]) -> TermMap:
    """YARRRML document-level ``base:``: a relative template/constant in
    an IRI position resolves against the base (the @rmlio parser emits
    ``@base`` into its RML and RMLMapper resolves relative IRI terms per
    R2RML §7.4; we resolve the common prefix-concatenation form at
    compile time — data-dependent relative outputs from bare
    rml:reference terms are out of scope and drop at the engine's IRI
    validity filter)."""
    base = prefixes.get(_BASE_KEY)
    if not base:
        return tm
    if tm.template is not None and not _SCHEME_RE.match(tm.template):
        tm.template = base + tm.template
    elif tm.constant is not None and not _SCHEME_RE.match(tm.constant):
        tm.constant = base + tm.constant
        tm.constant_is_iri = True
    return tm


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


def _to_function(spec: dict, prefixes: dict[str, str], name: str) -> FunctionCall:
    """YARRRML function block {function: f, parameters: [[p, v], ...]} ->
    FunctionCall (the @rmlio/yarrrml-parser function surface the reference
    delegates to, /root/reference/src/yarrrml/yarrrml.ts:8-12)."""
    fn_name = spec.get("function") or spec.get("fn")
    if fn_name is None:
        raise YarrrmlError(f"mapping {name}: function block without 'function'")
    iri = _FN_SHORTHAND.get(str(fn_name)) or _expand_prefixed(str(fn_name), prefixes)
    params: dict[str, TermMap] = {}
    for p in spec.get("parameters") or []:
        if isinstance(p, list) and len(p) >= 2:
            pname, pval = p[0], p[1]
        elif isinstance(p, dict):
            pname, pval = p.get("parameter"), p.get("value")
        else:
            raise YarrrmlError(f"mapping {name}: malformed function parameter {p!r}")
        key = _PARAM_SHORTHAND.get(str(pname)) or _expand_prefixed(str(pname), prefixes)
        tm = (
            TermMap(function=_to_function(pval, prefixes, name))
            if isinstance(pval, dict)
            else _to_template(str(pval), prefixes)
        )
        if key in params:  # repeated params (array_join) keep position
            n = 1
            while f"{key}#{n}" in params:
                n += 1
            key = f"{key}#{n}"
        params[key] = tm
    return FunctionCall(function_iri=iri, params=params)


def _conditional_object(obj: TermMap, cond_spec: dict, prefixes: dict[str, str], name: str) -> TermMap:
    """po-level condition: emit the object only when the condition holds —
    compiles to trueCondition(strBoolean=<cond>, str=<object>) exactly as
    the IncRML rewriter embeds conditions (incrml.ts:391-412)."""
    cond_fn = _to_function(cond_spec, prefixes, name)
    wrapped = TermMap(
        function=FunctionCall(
            function_iri=voc.IDLAB_TRUE_CONDITION,
            params={
                voc.IDLAB_STR_BOOLEAN: TermMap(function=cond_fn),
                voc.IDLAB_STR: obj,
            },
        ),
        datatype=obj.datatype,
        language=obj.language,
    )
    # preserve the unwrapped object's effective term type (templates and
    # IRI constants default to IRI; a function object defaults to Literal)
    if obj.term_type is not None:
        wrapped.term_type = obj.term_type
    elif obj.template is not None or (obj.constant is not None and obj.constant_is_iri):
        wrapped.term_type = "IRI"
    return wrapped


def _parse_po(
    entry,
    prefixes: dict[str, str],
    name: str,
    doc_targets: dict[str, LogicalTarget] | None = None,
) -> list[PredicateObjectMap]:
    """One po entry -> POMs. Per the yarrrml spec, ``p``/``o`` may each
    be a LIST (multiple predicates x multiple objects = their cartesian
    product of POMs — the @rmlio parser's expansion); the compact list
    form stays ``[p, o]`` / ``[p, o, datatype-or-lang]``, and a list in
    its object slot means multiple objects. ``condition:`` and
    ``inversepredicates`` apply to every generated POM. PO-level
    ``targets:`` (also on an object dict) route the entry's quads to
    each named document target — one POM copy per target, the same
    per-target expansion the subject-level targets use; PO-level
    ``graph``/``graphs`` put them in each named graph (§9 union with
    the mapping graph, via PredicateObjectMap.graph_map)."""
    condition = None
    inverse_pred = None
    po_target_names: list[str] = []
    po_graph_vals: list = []
    if isinstance(entry, dict):
        preds = entry.get("p") or entry.get("predicate") or entry.get("predicates")
        objs = entry.get("o") or entry.get("object") or entry.get("objects")
        pred_vals = preds if isinstance(preds, list) else [preds]
        obj_vals = objs if isinstance(objs, list) else [objs]
        condition = entry.get("condition")
        raw_t = entry.get("targets") or []
        po_target_names = [raw_t] if isinstance(raw_t, str) else list(raw_t)
        gv = entry.get("graph") or entry.get("graphs") or entry.get("g")
        if gv is not None:
            po_graph_vals = gv if isinstance(gv, list) else [gv]
        inv_val = entry.get("inversepredicates") or entry.get("inversepredicate")
        if inv_val is not None:
            if isinstance(inv_val, list):
                inv_val = inv_val[0]
            inverse_pred = TermMap(
                constant=_expand_prefixed(str(inv_val), prefixes), constant_is_iri=True
            )
    elif isinstance(entry, list) and len(entry) >= 2:
        pred_vals = entry[0] if isinstance(entry[0], list) else [entry[0]]
        if len(entry) == 3:
            obj_vals = [[entry[1], entry[2]]]  # [p, value, datatype-or-lang]
        elif isinstance(entry[1], list):
            obj_vals = entry[1]
        else:
            obj_vals = [entry[1]]
    else:
        raise YarrrmlError(f"mapping {name}: malformed po entry {entry!r}")

    out: list[PredicateObjectMap] = []
    for pred_val in pred_vals:
        if pred_val == "a":
            pred = TermMap(constant=voc.RDF_TYPE, constant_is_iri=True)
        else:
            pred = _apply_base(
                TermMap(constant=_expand_prefixed(str(pred_val), prefixes), constant_is_iri=True),
                prefixes,
            )
        for obj_val in obj_vals:
            target_names = list(po_target_names)
            if isinstance(obj_val, dict) and obj_val.get("targets"):
                raw = obj_val["targets"]
                target_names += [raw] if isinstance(raw, str) else list(raw)
                obj_val = {k: v for k, v in obj_val.items() if k != "targets"}
            # a target id named at BOTH po level and on the object dict
            # is one routing declaration, not two POM copies (duplicate
            # quads under dedupe=False otherwise)
            target_names = list(dict.fromkeys(target_names))
            pom = _build_pom(pred, pred_val, obj_val, condition, inverse_pred, prefixes, name)
            pom_targets: list[LogicalTarget | None] = [None]
            if target_names:
                resolved_targets = []
                for tid in target_names:
                    if not doc_targets or tid not in doc_targets:
                        raise YarrrmlError(f"mapping {name}: unknown target {tid!r}")
                    resolved_targets.append(doc_targets[tid])
                pom_targets = resolved_targets
            pom_graphs: list[TermMap | None] = [None]
            if po_graph_vals:
                pom_graphs = [
                    _apply_base(_to_template(str(g), prefixes), prefixes)
                    for g in po_graph_vals
                ]
            for lt in pom_targets:
                for gm in pom_graphs:
                    out.append(
                        replace(pom, logical_target=lt, graph_map=gm)
                        if (lt is not None or gm is not None)
                        else pom
                    )
    return out


def _build_pom(
    pred: TermMap, pred_val, obj_val, condition, inverse_pred, prefixes: dict[str, str], name: str
) -> PredicateObjectMap:
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
            inverse_predicate=inverse_pred,
        )

    datatype = None
    language = None
    language_map = None
    term_type = None

    def _lang(val: str) -> None:
        # dynamic language maps: a reference-valued tag ($(col)~lang or
        # {language: $(col)}) compiles to rml:languageMap; a plain tag
        # stays the static rr:language (both supported by the RML side)
        nonlocal language, language_map
        if _REF_RE.search(val):
            language_map = _to_template(val, prefixes)
        else:
            language = val

    if isinstance(obj_val, list):
        annotation = str(obj_val[1]) if len(obj_val) > 1 else None
        obj_val = obj_val[0]
        if annotation and annotation.endswith("~lang"):
            # yarrrml language shorthand: [ex:name, $(name), en~lang]
            _lang(annotation[: -len("~lang")])
        elif annotation:
            datatype = _expand_prefixed(annotation, prefixes)
    if isinstance(obj_val, dict) and ("function" in obj_val or "fn" in obj_val):
        # FnO function object in po value position; the dict may carry
        # the same annotations a value dict does (datatype/language/type)
        obj = TermMap(function=_to_function(obj_val, prefixes, name))
        if obj_val.get("datatype"):
            datatype = _expand_prefixed(str(obj_val["datatype"]), prefixes)
        if obj_val.get("language"):
            _lang(str(obj_val["language"]))
        if obj_val.get("type"):
            term_type = _TERM_TYPES.get(str(obj_val["type"]).lower())
    elif isinstance(obj_val, dict) and "value" in obj_val:
        # spec object dict: {value: ..., datatype: ...} / {value, language}
        obj = _to_template(str(obj_val["value"]), prefixes)
        if obj_val.get("datatype"):
            datatype = _expand_prefixed(str(obj_val["datatype"]), prefixes)
        if obj_val.get("language"):
            _lang(str(obj_val["language"]))
        if obj_val.get("type"):
            term_type = _TERM_TYPES.get(str(obj_val["type"]).lower())
    else:
        obj = _to_template(str(obj_val), prefixes)
    if datatype:
        obj.datatype = datatype
    if language:
        obj.language = language
    if language_map is not None:
        obj.language_map = language_map
    if term_type:
        obj.term_type = term_type
        if term_type == "IRI":
            obj = _apply_base(obj, prefixes)
    if pred_val == "a":
        obj.term_type = "IRI"
        obj = _apply_base(obj, prefixes)
    if isinstance(condition, dict):
        obj = _conditional_object(obj, condition, prefixes, name)
    return PredicateObjectMap(predicate=pred, object=obj, inverse_predicate=inverse_pred)


def _substitute_externals(node, externals: dict[str, str]):
    """YARRRML external references: ``$(_name)`` slots are filled from
    caller-supplied parameters (the @rmlio parser's -p/--external
    surface), anywhere a string value appears. Unknown externals stay
    as-is (they become ``_name`` data references that null out)."""
    if isinstance(node, str):
        return _REF_RE.sub(
            lambda m: externals.get(m.group(1)[1:], m.group(0))
            if m.group(1).startswith("_")
            else m.group(0),
            node,
        )
    if isinstance(node, list):
        return [_substitute_externals(v, externals) for v in node]
    if isinstance(node, dict):
        return {k: _substitute_externals(v, externals) for k, v in node.items()}
    return node


def yarrrml_to_plan(
    doc: str,
    source_bindings: dict[str, str] | None = None,
    externals: dict[str, str] | None = None,
) -> MappingPlan:
    data = yaml.safe_load(doc)
    if not isinstance(data, dict):
        raise YarrrmlError("YARRRML document must be a YAML mapping")
    if externals:
        data = _substitute_externals(data, externals)
    prefixes = {**_BUILTIN_PREFIXES, **{k: str(v) for k, v in (data.get("prefixes") or {}).items()}}
    if data.get("base"):
        prefixes[_BASE_KEY] = str(data["base"])
    mappings = data.get("mappings") or data.get("mapping")
    if not mappings:
        raise YarrrmlError("YARRRML document has no mappings")
    bindings = source_bindings or {}
    targets = {
        tid: _parse_target(tid, spec)
        for tid, spec in (data.get("targets") or {}).items()
    }

    # document-level sources section: named entries a mapping references
    # by name (``sources: src1`` / ``sources: [src1, ...]``), per the
    # yarrrml spec surface the @rmlio parser accepts
    doc_sources = data.get("sources") if isinstance(data.get("sources"), dict) else {}

    tms: list[TriplesMap] = []
    by_map_name: dict[str, list[str]] = {}
    base_name_of: dict[str, str] = {}
    for name, m in mappings.items():
        sources = m.get("sources") or m.get("source")
        if not sources:
            raise YarrrmlError(f"mapping {name}: no sources")
        if not isinstance(sources, list):
            sources = [sources]
        resolved = []
        for s in sources:
            if isinstance(s, str):
                if s in doc_sources:
                    resolved.append(doc_sources[s])
                elif doc_sources and "~" not in s:
                    raise YarrrmlError(f"mapping {name}: unknown named source {s!r}")
                else:
                    resolved.append(s)
            else:
                resolved.append(s)
        sources = resolved

        subj_val = m.get("s") or m.get("subject") or m.get("subjects")
        if subj_val is None:
            raise YarrrmlError(f"mapping {name}: no subject")
        if isinstance(subj_val, list):
            subj_val = subj_val[0]
        subj_targets: list[str] = []
        subj_fn_spec = None
        if isinstance(subj_val, dict):
            # subject with targets: {value: ..., targets: [t1]} — or a
            # function-valued subject {function: ..., parameters: ...}
            raw_targets = subj_val.get("targets") or []
            subj_targets = [raw_targets] if isinstance(raw_targets, str) else list(raw_targets)
            if "function" in subj_val or "fn" in subj_val:
                subj_fn_spec = subj_val
            else:
                subj_val = subj_val.get("value")
                if subj_val is None:
                    raise YarrrmlError(f"mapping {name}: subject dict without value or function")
        subj_tm = (
            TermMap(function=_to_function(subj_fn_spec, prefixes, name))
            if subj_fn_spec is not None
            else _apply_base(_to_template(str(subj_val), prefixes), prefixes)
        )
        # mapping-level condition: the whole mapping emits only for
        # records satisfying it — embedded into the subject exactly as
        # the IncRML rewriter embeds conditional subjects
        # (trueCondition(strBoolean=<cond>, str=<subject>), incrml.ts:391-412)
        map_cond = m.get("condition")
        if isinstance(map_cond, dict):
            subj_tm = _conditional_object(subj_tm, map_cond, prefixes, name)
        tm_targets: list = []
        for tid in subj_targets:
            if tid not in targets:
                raise YarrrmlError(f"mapping {name}: unknown target {tid!r}")
            tm_targets.append(targets[tid])
        # a subject may declare several targets: one TriplesMap per
        # target (a LogicalTarget lives on the subject map); no target
        # -> one TM routed to the default sink
        logical_targets = tm_targets or [None]

        graph_val = m.get("graph") or m.get("graphs")
        # graphs lists mean the mapping's quads land in EACH graph
        # (spec semantics) — one TM per graph, not first-graph-wins
        graph_vals = graph_val if isinstance(graph_val, list) else [graph_val]

        # a mapping with N sources expands to N TriplesMaps over the same
        # subject/po definitions (the @rmlio/yarrrml-parser expansion);
        # M declared subject targets and G declared graphs expand again
        for i, src_entry in enumerate(sources):
            for j, logical_target in enumerate(logical_targets):
                for gidx, gv in enumerate(graph_vals):
                    ls = _parse_source(src_entry, name)
                    ls.source = bindings.get(ls.source, ls.source)
                    tm_name = f"urn:yarrrml:{name}"
                    if len(sources) > 1:
                        tm_name += f"_{i}"
                    if len(logical_targets) > 1:
                        tm_name += f"_t{j}"
                    if len(graph_vals) > 1:
                        tm_name += f"_g{gidx}"
                    poms = [
                        pom
                        for e in (m.get("po") or m.get("predicateobjects") or [])
                        for pom in _parse_po(e, prefixes, name, targets)
                    ]
                    tms.append(
                        TriplesMap(
                            name=tm_name,
                            logical_source=ls,
                            subject_map=SubjectMap(
                                term_map=subj_tm,
                                graph_map=_apply_base(_to_template(str(gv), prefixes), prefixes)
                                if gv is not None
                                else None,
                                logical_target=logical_target,
                            ),
                            predicate_object_maps=poms,
                            label=str(name),
                        )
                    )
                    by_map_name.setdefault(f"urn:yarrrml:{name}", []).append(tm_name)
                    base_name_of[tm_name] = f"urn:yarrrml:{name}"

    # yarrrml ``inversepredicates``: the po also states the INVERSE
    # relation (object, inv_pred, subject). Plain objects synthesize a
    # swapped TriplesMap over the same logical source — the executor's
    # same-source fusion keeps it in the one scan; mapping-reference
    # objects add a referencing POM on each parent TM pointing back at
    # the child mapping with the join condition swapped.
    tm_by_name = {tm.name: tm for tm in tms}
    extra_tms: list[TriplesMap] = []
    # a child mapping expanded to N TMs (multi-source/target/graph) must
    # add its inverse referencing POM to each parent ONCE per BASE
    # mapping, not once per expanded TM — N identical inverse POMs per
    # parent meant N^2 redundant joins and duplicate triples with
    # dedupe disabled (ADVICE r3)
    seen_inverse: set[tuple] = set()
    for tm in tms:
        for k, pom in enumerate(tm.predicate_object_maps):
            if pom.inverse_predicate is None:
                continue
            inv = pom.inverse_predicate
            if pom.parent_triples_map is not None:
                # TermMaps are plain dataclasses (unhashable); their
                # repr is a content signature
                jc_sig = tuple((repr(jc.parent), repr(jc.child)) for jc in pom.join_conditions)
                for parent_name in by_map_name.get(pom.parent_triples_map, []):
                    key = (parent_name, base_name_of[tm.name], repr(inv), jc_sig)
                    if key in seen_inverse:
                        continue
                    seen_inverse.add(key)
                    tm_by_name[parent_name].predicate_object_maps.append(
                        PredicateObjectMap(
                            predicate=inv,
                            object=None,
                            parent_triples_map=base_name_of[tm.name],
                            join_conditions=[
                                JoinCondition(child=jc.parent, parent=jc.child)
                                for jc in pom.join_conditions
                            ],
                        )
                    )
                continue
            if pom.object is None or pom.object.language or pom.object.datatype:
                raise YarrrmlError(
                    f"mapping {tm.label}: inversepredicates needs an IRI-valued object"
                )
            inv_subject = replace(pom.object, term_type="IRI")
            subj_as_object = replace(tm.subject_map.term_map, term_type="IRI")
            extra_tms.append(
                TriplesMap(
                    name=f"{tm.name}_inv{k}",
                    logical_source=tm.logical_source,
                    subject_map=SubjectMap(
                        term_map=inv_subject,
                        graph_map=tm.subject_map.graph_map,
                        logical_target=tm.subject_map.logical_target,
                    ),
                    predicate_object_maps=[
                        PredicateObjectMap(predicate=inv, object=subj_as_object)
                    ],
                    label=tm.label,
                )
            )
    tms.extend(extra_tms)

    # referencing object maps point at a MAPPING; a multi-source parent
    # fans out to one referencing POM per parent TriplesMap
    for tm in tms:
        expanded = []
        for pom in tm.predicate_object_maps:
            if pom.parent_triples_map is not None:
                for target in by_map_name.get(pom.parent_triples_map, [pom.parent_triples_map]):
                    expanded.append(
                        PredicateObjectMap(
                            predicate=pom.predicate,
                            object=None,
                            parent_triples_map=target,
                            join_conditions=pom.join_conditions,
                        )
                    )
            else:
                expanded.append(pom)
        tm.predicate_object_maps = expanded
    return MappingPlan(triples_maps=tms, source_bindings=bindings)
