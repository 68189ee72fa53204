"""Deliberately naive, spec-literal RML evaluator over dict records.

This is the INDEPENDENT half of the differential fuzz harness
(tests/test_diff_fuzz.py): it interprets a MappingSpec structure — the
same structure the fuzz renders to RML Turtle for the Spark engine —
directly against Python dict records, implementing the R2RML/RML term
generation rules (R2RML §§7-11, RML reference-formulation semantics)
from the spec text, NOT from the engine's code. A spec misreading must
therefore be made twice independently to escape both implementations.

Anchored to the reference processor's programmatic assertions
(/root/reference/test/rml.test.ts:419-431,480-498) for the base
semantics; spec choices where RMLMapper behavior is ambiguous and this
module mirrors the engine's documented decision are called out inline.

MappingSpec structure (plain dicts, hypothesis-friendly):

    spec = {
      "sources": {"s0": [ {record}, ... ]},
      "tms": [
        {"name": "tm0", "source": "s0",
         "subject": TermSpec, "classes": [iri, ...],
         "graph": TermSpec | None,
         "poms": [ {"predicate": TermSpec,
                    "object": TermSpec | None,   # None when join set
                    "graph": TermSpec | None,
                    "join": None | {"parent": tm_index,
                                    "conditions": [(child_ref, parent_ref), ...]}}
                 ]}
      ]}

    TermSpec = {"kind": "constant_iri" | "constant_lit" | "reference" | "template",
                "value": str,
                "termtype": None | "IRI" | "Literal" | "BlankNode",
                "datatype": None | iri, "language": None | tag,
                # data-derived variants (newer RML spec): reference names
                "language_map": None | ref, "datatype_map": None | ref}

    POMs may carry LISTS of predicates/objects (R2RML §6.3: the POM's
    triples are the m x n cross product) — single TermSpecs are treated
    as one-element lists.

Output: set of 9-tuples matching the engine's TRIPLE_COLUMNS —
(s, s_termtype, p, o, o_termtype, o_datatype, o_lang, g, target_id).
"""

from __future__ import annotations

import re

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_XSD = "http://www.w3.org/2001/XMLSchema#"

# RFC 3987 absolute-IRI shape: a scheme, then none of the characters
# excluded from every IRI production (controls, space, <>"{}|^`\)
_SCHEME_RX = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_BAD_RX = re.compile("[\x00-\x20<>\"{}|^`\\\\]")

# R2RML §7.3 template grammar: \\ \{ \} are literal, {name} is a placeholder
_TPL_TOKEN_RX = re.compile(r"\\([\\{}])|\{([^{}]+)\}")

# BCP47 language-tag shape (1-8 char subtags). The engine validates
# data-derived rml:languageMap values against this same production
# (plans/model.py LANGTAG_PATTERN) — R2RML only says rr:language must
# be a valid [BCP47] tag, so the 8-char subtag bound is the spec's,
# not an engine invention; implemented here from the BCP47 ABNF.
_LANGTAG_RX = re.compile(r"^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$")

_INT_RX = re.compile(r"^[+-]?[0-9]+$")
_DEC_RX = re.compile(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$")
_DBL_RX = re.compile(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$")


def json_value_str(v):
    """RML natural mapping of a JSON value to a lexical form."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def iri_safe(value: str) -> str:
    """R2RML IRI-safe percent-encoding of a template-interpolated value:
    every character NOT in RFC 3987 ``iunreserved`` is %-encoded as
    uppercase-hex UTF-8 octets. iunreserved = ALPHA / DIGIT / - . _ ~ /
    ucschar; ucschar starts at U+00A0 (so C1 controls U+0080-009F are
    encoded, accented/CJK characters stay raw)."""
    out: list[str] = []
    for ch in value:
        cp = ord(ch)
        if cp < 0x80:
            if ch.isalnum() or ch in "-._~":
                out.append(ch)
            else:
                out.append("%%%02X" % cp)
        elif 0x80 <= cp <= 0x9F:
            out.extend("%%%02X" % b for b in ch.encode("utf-8"))
        else:
            # ucschar (generation alphabet stays within U+00A0-U+D7FF
            # and the supplementary ranges, all iunreserved)
            out.append(ch)
    return "".join(out)


def valid_iri(value: str) -> bool:
    return bool(_SCHEME_RX.match(value)) and not _BAD_RX.search(value)


def template_tokens(template: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    buf: list[str] = []
    pos = 0
    for m in _TPL_TOKEN_RX.finditer(template):
        if m.start() > pos:
            buf.append(template[pos : m.start()])
        if m.group(1) is not None:
            buf.append(m.group(1))
        else:
            if buf:
                out.append(("lit", "".join(buf)))
                buf = []
            out.append(("ref", m.group(2)))
        pos = m.end()
    if pos < len(template):
        buf.append(template[pos:])
    if buf:
        out.append(("lit", "".join(buf)))
    return out


def effective_termtype(t: dict, position: str) -> str:
    """R2RML §7.4.1 / RML default term types."""
    if t.get("termtype"):
        return t["termtype"]
    if position in ("subject", "predicate", "graph"):
        return "IRI"
    if position == "object":
        # §7.4.1: a term map carrying language/datatype (static OR
        # data-derived map form) defaults to rr:Literal
        if (
            t.get("language")
            or t.get("datatype")
            or t.get("language_map")
            or t.get("datatype_map")
        ):
            return "Literal"
        k = t["kind"]
        if k == "reference" or k == "constant_lit":
            return "Literal"
        return "IRI"  # template or constant IRI
    return "Literal"  # join-condition "value" position


def eval_term(t: dict, rec: dict, position: str) -> str | None:
    """Generated RDF term VALUE, or None when generation fails."""
    tt = effective_termtype(t, position)
    k = t["kind"]
    if k in ("constant_iri", "constant_lit"):
        return t["value"]
    if k == "reference":
        return json_value_str(rec.get(t["value"]))
    # template
    parts: list[str] = []
    for kind, val in template_tokens(t["value"]):
        if kind == "lit":
            parts.append(val)
        else:
            v = json_value_str(rec.get(val))
            if v is None:
                return None  # any null reference -> no term
            parts.append(iri_safe(v) if (tt == "IRI" and position != "value") else v)
    return "".join(parts)


# ---- XSD 1.1 canonical lexical forms (independent implementations) --------


def canon_boolean(v: str) -> str:
    return {"1": "true", "0": "false"}.get(v, v)


def canon_integer(v: str) -> str:
    if not _INT_RX.match(v):
        return v
    neg = v.startswith("-")
    digits = v.lstrip("+-").lstrip("0")
    if not digits:
        return "0"
    return ("-" + digits) if neg else digits


def canon_decimal(v: str) -> str:
    if not _DEC_RX.match(v):
        return v
    neg = v.startswith("-")
    body = v.lstrip("+-")
    ip, _, fp = body.partition(".")
    ip = ip.lstrip("0") or "0"
    fp = fp.rstrip("0") or "0"
    sign = "-" if neg and (ip != "0" or fp != "0") else ""
    return f"{sign}{ip}.{fp}"


def canon_double(v: str) -> str:
    if not _DBL_RX.match(v):
        return v
    neg = v.startswith("-")
    body = v.lstrip("+-")
    m = re.match(r"^([0-9]*)(?:\.([0-9]*))?(?:[eE]([+-]?[0-9]+))?$", body)
    ip, fp, e = m.group(1) or "", m.group(2) or "", int(m.group(3) or 0)
    digits = ip + fp
    stripped = digits.lstrip("0")
    sign = "-" if neg else ""
    if stripped == "":
        return sign + "0.0E0"
    exp = len(ip) - (len(digits) - len(stripped)) - 1 + e
    md = stripped.rstrip("0")
    mant = md[0] + "." + (md[1:] or "0")
    return f"{sign}{mant}E{exp}"


_CANON = {
    _XSD + "boolean": canon_boolean,
    _XSD + "integer": canon_integer,
    _XSD + "decimal": canon_decimal,
    _XSD + "double": canon_double,
    _XSD + "float": canon_double,
}


def _term_or_drop(t: dict, rec: dict, position: str):
    """(value, termtype) or None — term generation + IRI data-error check
    (R2RML: a term map producing an invalid IRI is a data error; the
    triple is not generated)."""
    v = eval_term(t, rec, position)
    if v is None:
        return None
    tt = effective_termtype(t, position)
    if tt == "IRI" and not valid_iri(v):
        return None
    return v, tt


def _object_value(t: dict, rec: dict):
    """(o, o_termtype, o_datatype, o_lang) or None."""
    got = _term_or_drop(t, rec, "object")
    if got is None:
        return None
    v, tt = got
    dt = t.get("datatype")
    lang = t.get("language")
    if t.get("datatype_map"):
        # data-derived datatype: the record value IS o_datatype; null ->
        # plain literal (termtype stays Literal, set statically)
        dt = json_value_str(rec.get(t["datatype_map"]))
    if t.get("language_map"):
        # data-derived language tag: null -> plain literal; a non-null
        # ILL-FORMED tag is an R2RML data error -> the quad drops
        lang = json_value_str(rec.get(t["language_map"]))
        if lang is not None and not _LANGTAG_RX.match(lang):
            return None
    if tt == "Literal" and dt in _CANON:
        v = _CANON[dt](v)
    return v, tt, dt, lang


def _graphs_for(tm: dict, pom_graph: dict | None, rec: dict):
    """R2RML §11.1 target graphs of one POM's triples: union of subject
    graph maps and POM graph maps; empty set -> the default graph (g =
    None). A subject graph map evaluating to null contributes nothing
    (§11.1 literal reading: the empty union falls back to the default
    graph). A POM-level graph map that evaluates to null DROPS that
    graph copy while a subject-graph copy survives (the engine's
    choice, probed directly in r9 and exercised by the fuzz's template
    POM graphs). An invalid-IRI graph
    value is a data error -> that quad copy drops. Returns a list of
    graph values (None = default graph), or None when every copy
    dropped."""
    out: list[str | None] = []
    sg = tm.get("graph")
    sg_val: str | None = None
    if sg is not None:
        v = eval_term(sg, rec, "graph")
        if v is not None:
            if not valid_iri(v):
                sg_val = "__DROP__"
            else:
                sg_val = v
    if pom_graph is None:
        if sg_val == "__DROP__":
            return []
        return [sg_val]
    pg = eval_term(pom_graph, rec, "graph")
    graphs: list[str | None] = []
    if sg is not None:
        if sg_val != "__DROP__":
            graphs.append(sg_val)
        if pg is not None and valid_iri(pg):
            graphs.append(pg)
        return graphs
    if pg is None:
        return []  # engine data-error choice (constant-only in fuzz)
    if not valid_iri(pg):
        return []
    return [pg]


def evaluate(spec: dict) -> set[tuple]:
    """Run the MappingSpec over its sources; return the quad SET
    (RDF graphs are sets — duplicates collapse)."""
    quads: set[tuple] = set()
    tms = spec["tms"]
    for tm in tms:
        records = spec["sources"][tm["source"]]
        for rec in records:
            s_got = _term_or_drop(tm["subject"], rec, "subject")
            if s_got is None:
                continue
            s, s_tt = s_got
            for cls in tm.get("classes", ()):
                for g in _graphs_for(tm, None, rec):
                    quads.add((s, s_tt, RDF_TYPE, cls, "IRI", None, None, g, "default"))
            for pom in tm["poms"]:
                # §6.3: a POM's triples are predicates x objects; the
                # fuzz may pass a single "predicate"/"object" or lists
                pred_specs = pom.get("predicates") or [pom["predicate"]]
                p_vals = []
                for ps in pred_specs:
                    p_got = _term_or_drop(ps, rec, "predicate")
                    if p_got is not None:
                        p_vals.append(p_got[0])
                if not p_vals:
                    continue
                if pom.get("join"):
                    j = pom["join"]
                    parent = tms[j["parent"]]
                    parent_tt = effective_termtype(parent["subject"], "subject")
                    if not j["conditions"]:
                        # R2RML §11 condition-less form: same logical
                        # source, SAME-ROW evaluation
                        po_got = _term_or_drop(parent["subject"], rec, "subject")
                        if po_got is None:
                            continue
                        for g in _graphs_for(tm, pom.get("graph"), rec):
                            for p in p_vals:
                                quads.add((s, s_tt, p, po_got[0], parent_tt, None, None, g, "default"))
                        continue
                    ck = [
                        eval_term({"kind": "reference", "value": cr}, rec, "value")
                        for cr, _ in j["conditions"]
                    ]
                    if any(v is None for v in ck):
                        continue  # SQL equality: null joins nothing
                    for prec in spec["sources"][parent["source"]]:
                        pk = [
                            eval_term({"kind": "reference", "value": pr}, prec, "value")
                            for _, pr in j["conditions"]
                        ]
                        if any(v is None for v in pk) or pk != ck:
                            continue
                        po_got = _term_or_drop(parent["subject"], prec, "subject")
                        if po_got is None:
                            continue
                        for g in _graphs_for(tm, pom.get("graph"), rec):
                            for p in p_vals:
                                quads.add((s, s_tt, p, po_got[0], parent_tt, None, None, g, "default"))
                    continue
                obj_specs = pom.get("objects") or [pom["object"]]
                for os_ in obj_specs:
                    o_got = _object_value(os_, rec)
                    if o_got is None:
                        continue
                    o, o_tt, o_dt, o_lang = o_got
                    for g in _graphs_for(tm, pom.get("graph"), rec):
                        for p in p_vals:
                            quads.add((s, s_tt, p, o, o_tt, o_dt, o_lang, g, "default"))
    return quads
