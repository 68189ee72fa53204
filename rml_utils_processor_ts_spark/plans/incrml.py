"""IncRML expansion: rewrite a MappingPlan into its incremental/CDC form
(the ``js:IncRMLTransformer`` capability, /root/reference/src/rml/incrml.ts).

Plan-level rewrite, driver-side only:

  * group TriplesMaps by (subject expression, source+iterator, graph) —
    the reference's entity-merge key (incrml.ts:155-221); TMs without
    POMs are skipped (:195); subject expression precedence constant >
    template > reference > function (:172-189);
  * per group emit three TriplesMaps (create/update/delete,
    incrml.ts:124-141) whose subjects are stateful FunctionTermMaps:
    - idlab-fn:iri = the original subject expression; if every merged
      subject is a conditional FnO map, the condition embeds as the iri
      parameter (:391-412) — mixed conditional/unconditional errors;
    - idlab-fn:state = stateBasePath/md5(template+logSrc+graphMap)_
      {event}_state (:524-537) — state shared across TMs of one entity;
    - update gets idlab-fn:watchedProperty derived from every property
      expression used in any POM (recursing into nested FnO functions,
      :414-522): XPath string-concat form for XML sources, grel:array_join
      otherwise; empty reference when no properties;
  * rr:class consistency is validated across merged TMs (:356-368);
  * create/update copy all POMs; delete keeps only the first
    constant-predicate POM (the rdf:type one, :554-576) plus the
    lifecycle POM;
  * optional LDES logical target block per config (:303-338).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from . import voc
from .model import (
    FunctionCall,
    LogicalTarget,
    MappingPlan,
    PredicateObjectMap,
    SubjectMap,
    TermMap,
    TriplesMap,
)


@dataclass
class LifeCycleEvent:
    function: str
    type: str


@dataclass
class LifeCycleConfig:
    predicate: str = "http://ex.org/lifeCycleType"
    create: LifeCycleEvent = field(
        default_factory=lambda: LifeCycleEvent(voc.IDLAB_EXPLICIT_CREATE, voc.AS_CREATE)
    )
    update: LifeCycleEvent = field(
        default_factory=lambda: LifeCycleEvent(voc.IDLAB_IMPLICIT_UPDATE, voc.AS_UPDATE)
    )
    delete: LifeCycleEvent = field(
        default_factory=lambda: LifeCycleEvent(voc.IDLAB_IMPLICIT_DELETE, voc.AS_DELETE)
    )


@dataclass
class LDESTargetConfig:
    target_path: str
    timestamp_path: str | None = voc.DCT_MODIFIED
    version_of_path: str | None = voc.DCT_IS_VERSION_OF
    serialization: str = voc.FORMATS + "N-Quads"
    unique_iris: bool = True
    ldes_base_iri: str | None = None
    shape: str | None = None


@dataclass
class IncRMLConfig:
    state_base_path: str
    lifecycle: LifeCycleConfig = field(default_factory=LifeCycleConfig)
    target: LDESTargetConfig | None = None


class IncRMLError(ValueError):
    pass


class ConfigShapeError(ValueError):
    """SHACL-analog validation error (the reference validates processor
    configs against shapes, /root/reference/processors.ttl:191-301; here
    ill-typed IncRML/LDES configs fail upfront with the offending field
    named, instead of a deep ValueError mid-expansion)."""

    def __init__(self, field_name: str, message: str):
        self.field_name = field_name
        super().__init__(f"config shape violation at {field_name}: {message}")


def _shape_iri(field_name: str, value, *, optional: bool = False) -> None:
    if value is None:
        if optional:
            return
        raise ConfigShapeError(field_name, "required IRI is missing")
    if not isinstance(value, str) or not value.startswith(("http://", "https://", "urn:")):
        raise ConfigShapeError(field_name, f"expected an absolute IRI, got {value!r}")


def validate_incrml_config(config: IncRMLConfig) -> None:
    """Upfront shape validation of an IncRMLConfig (≙ the SHACL shapes
    sh:minCount/sh:datatype constraints on the IncRMLTransformer config,
    processors.ttl:191-301). Raises ConfigShapeError naming the field."""
    if not isinstance(config, IncRMLConfig):
        raise ConfigShapeError("config", f"expected IncRMLConfig, got {type(config).__name__}")
    if not isinstance(config.state_base_path, str) or not config.state_base_path.strip():
        raise ConfigShapeError(
            "state_base_path", f"required non-empty string, got {config.state_base_path!r}"
        )
    lc = config.lifecycle
    if not isinstance(lc, LifeCycleConfig):
        raise ConfigShapeError(
            "lifecycle", f"expected LifeCycleConfig, got {type(lc).__name__}"
        )
    _shape_iri("lifecycle.predicate", lc.predicate)
    for event in _EVENTS:
        ev = getattr(lc, event)
        if not isinstance(ev, LifeCycleEvent):
            raise ConfigShapeError(
                f"lifecycle.{event}", f"expected LifeCycleEvent, got {type(ev).__name__}"
            )
        _shape_iri(f"lifecycle.{event}.function", ev.function)
        _shape_iri(f"lifecycle.{event}.type", ev.type)
    t = config.target
    if t is None:
        return
    if not isinstance(t, LDESTargetConfig):
        raise ConfigShapeError("target", f"expected LDESTargetConfig, got {type(t).__name__}")
    if not isinstance(t.target_path, str) or not t.target_path.strip():
        raise ConfigShapeError(
            "target.target_path", f"required non-empty string, got {t.target_path!r}"
        )
    _shape_iri("target.timestamp_path", t.timestamp_path, optional=True)
    _shape_iri("target.version_of_path", t.version_of_path, optional=True)
    _shape_iri("target.serialization", t.serialization)
    if not isinstance(t.unique_iris, bool):
        raise ConfigShapeError("target.unique_iris", f"expected bool, got {t.unique_iris!r}")
    _shape_iri("target.ldes_base_iri", t.ldes_base_iri, optional=True)
    _shape_iri("target.shape", t.shape, optional=True)


_EVENTS = ("create", "update", "delete")


def expand_to_incrml(plan: MappingPlan, config: IncRMLConfig) -> MappingPlan:
    """The IncrementalizeRule: plan -> CDC plan. Validates the config
    shape upfront (ConfigShapeError names the offending field)."""
    validate_incrml_config(config)
    groups: dict[tuple[str, str, str], list[TriplesMap]] = {}
    order: list[tuple[str, str, str]] = []
    passthrough: list[TriplesMap] = []
    for tm in plan.triples_maps:
        if not tm.predicate_object_maps:
            # no POMs => not expanded, but KEPT as-is: join parents need
            # their original TriplesMap (reference expects 4 TMs for the
            # join fixture — 3 expanded + the parent,
            # /root/reference/test/incrml.test.ts:297-298)
            passthrough.append(tm)
            continue
        key = tm.group_key()
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(tm)

    out: list[TriplesMap] = list(passthrough)
    for counter, key in enumerate(order):
        template, log_src_key, graph_key = key
        tms = groups[key]
        for event in _EVENTS:
            out.append(
                _generate_event_tm(
                    event, counter, template, log_src_key, graph_key, tms, config
                )
            )
    if not out:
        raise IncRMLError("no TriplesMaps with predicate-object maps to expand")
    return MappingPlan(triples_maps=out, source_bindings=dict(plan.source_bindings))


def _merged_class(tms: list[TriplesMap]) -> str | None:
    classes = [c for tm in tms for c in tm.subject_map.classes]
    if not classes:
        return None
    if any(c != classes[0] for c in classes):
        raise IncRMLError(
            f"Different values of rr:class encountered for Triples Maps of the same entity: {sorted(set(classes))}"
        )
    return classes[0]


def _subject_iri_param(tms: list[TriplesMap], template: str) -> TermMap:
    fn_subjects = [tm.subject_map.term_map.function for tm in tms if tm.subject_map.term_map.function is not None]
    if fn_subjects:
        if len(fn_subjects) != len(tms):
            raise IncRMLError(
                "Found inconsistent Subject Maps for the same entity and logical source "
                "(mixed conditional FnO and plain subject maps)"
            )
        # conditional subject: embed the condition function as the iri param
        return TermMap(function=fn_subjects[0])
    first = tms[0].subject_map.term_map
    if first.template is not None:
        return TermMap(template=template)
    if first.constant is not None:
        return TermMap(constant=template, constant_is_iri=first.constant_is_iri)
    return TermMap(reference=template)


_TEMPLATE_VAR_RE = re.compile(r"[^{}]+(?=})")


def _collect_watched_properties(tms: list[TriplesMap]) -> list[str]:
    """Every property expression used in any POM; nested FnO functions are
    walked recursively (findPropertyRecursively, incrml.ts:581-606)."""
    props: list[str] = []
    seen: set[str] = set()

    def add(p: str) -> None:
        if p not in seen:
            seen.add(p)
            props.append(p)

    def walk_fn(fn: FunctionCall) -> None:
        for param in fn.params.values():
            if param.function is not None:
                walk_fn(param.function)
            elif param.reference is not None:
                add(param.reference)
            elif param.template is not None:
                for m in _TEMPLATE_VAR_RE.findall(param.template):
                    add(m)

    for tm in tms:
        for pom in tm.predicate_object_maps:
            om = pom.object
            if om is None:
                # referencing object map: join conditions are NOT watched
                # (the reference only inspects object-map value expressions,
                # incrml.ts:420-456 — asserted by the join fixture's
                # watched string at test/incrml.test.ts:307-312)
                continue
            if om.function is not None:
                walk_fn(om.function)
            elif om.template is not None:
                for m in _TEMPLATE_VAR_RE.findall(om.template):
                    add(m)
            elif om.reference is not None:
                add(om.reference)
    return props


def _watched_term_map(tms: list[TriplesMap], is_xpath: bool) -> TermMap:
    props = _collect_watched_properties(tms)
    if not props:
        return TermMap(reference="")
    if is_xpath:
        parts = [f"'prop{i}=' || {p}" for i, p in enumerate(props)]
        return TermMap(reference="(" + " || '&' || ".join(parts) + ")")
    fn = FunctionCall(
        function_iri=voc.GREL_ARRAY_JOIN,
        params={
            voc.GREL_PARAM_STRING_SEP: TermMap(constant="&"),
            **{
                # the reference rewriter emits the SHORT param name
                # (grel:param_a, incrml.ts:503) — match it so our IncRML
                # documents interchange with reference consumers
                f"{voc.GREL_PARAM_A_ALT}#{i}": TermMap(constant=f"prop{i}={p}")
                for i, p in enumerate(props)
            },
        },
    )
    return TermMap(function=fn)


def _state_path(config: IncRMLConfig, template: str, log_src_key: str, graph_key: str, event: str) -> str:
    # md5(template + logSrc + graphMap) — incrml.ts:524-537. Our log_src_key
    # is source+"\x00"+iterator+"\x00"+kind; use source+iterator to match the
    # reference's `${logSrcVal}${iterator}` form.
    src, it, _kind = (log_src_key.split("\x00") + ["", ""])[:3]
    digest = hashlib.md5((template + src + it + graph_key).encode()).hexdigest()
    return f"{config.state_base_path}/{digest}_{event}_state"


def _delete_pom(tms: list[TriplesMap]) -> PredicateObjectMap | None:
    """First POM with a constant predicate (the rdf:type carrier,
    incrml.ts:554-576)."""
    for tm in tms:
        for pom in tm.predicate_object_maps:
            if pom.predicate.constant is not None:
                return pom
    return None


def _generate_event_tm(
    event: str,
    counter: int,
    template: str,
    log_src_key: str,
    graph_key: str,
    tms: list[TriplesMap],
    config: IncRMLConfig,
) -> TriplesMap:
    lc_event: LifeCycleEvent = getattr(config.lifecycle, event)
    base = tms[0]
    fn_params: dict[str, TermMap] = {
        voc.IDLAB_IRI: _subject_iri_param(tms, template),
        voc.IDLAB_STATE: TermMap(
            constant=_state_path(config, template, log_src_key, graph_key, event),
            datatype=voc.XSD_STRING,
        ),
    }
    if event == "update" and lc_event.function == voc.IDLAB_IMPLICIT_UPDATE:
        fn_params[voc.IDLAB_WATCHED_PROPERTY] = _watched_term_map(
            tms, is_xpath=base.logical_source.kind == "xpath"
        )
    subject_fn = FunctionCall(function_iri=lc_event.function, params=fn_params)

    target: LogicalTarget | None = None
    if config.target is not None:
        t = config.target
        target = LogicalTarget(
            target_id=f"urn:incrml:ldes_lt:{counter}:{event}",
            location=t.target_path,
            serialization=t.serialization,
            is_ldes=True,
            ldes_timestamp_path=t.timestamp_path,
            ldes_version_of_path=t.version_of_path,
            ldes_base_iri=t.ldes_base_iri,
            ldes_immutable_iri=t.unique_iris,
            ldes_shape=t.shape,
        )

    lifecycle_pom = PredicateObjectMap(
        predicate=TermMap(constant=config.lifecycle.predicate, constant_is_iri=True),
        object=TermMap(constant=lc_event.type, constant_is_iri=True, term_type="IRI"),
    )
    if event == "delete":
        poms = [p for p in [_delete_pom(tms)] if p is not None] + [lifecycle_pom]
    else:
        poms = [pom for tm in tms for pom in tm.predicate_object_maps] + [lifecycle_pom]

    cls = _merged_class(tms)
    from copy import deepcopy

    return TriplesMap(
        name=f"urn:incrml:{event}_TM_{counter}",
        # own copy per event TM: sharing one LogicalSource object across
        # the three event TMs makes later per-TM rebinding (source
        # mutation) silently clobber siblings
        logical_source=deepcopy(base.logical_source),
        subject_map=SubjectMap(
            term_map=TermMap(function=subject_fn),
            classes=[cls] if cls else [],
            graph_map=base.subject_map.graph_map,
            logical_target=target,
        ),
        predicate_object_maps=poms,
        label=f"{base.label or base.name}-{event}",
    )
