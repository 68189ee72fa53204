"""Minimal Turtle parser for RML mapping documents (driver-side only).

The reference parses mapping docs with the N3.js ``Parser``
(``/root/reference/src/rml/rml.ts:6,153``); this container has no rdflib,
and mapping documents are tiny driver-side strings, so we implement the
Turtle subset those documents actually use:

  * ``@prefix`` declarations, IRIREFs ``<...>``, prefixed names
    (prefixes may contain ``-``, e.g. ``idlab-fn:``)
  * literals with ``\"...\"`` escapes, ``^^datatype``, ``@lang``
  * anonymous blank nodes ``[ ... ]`` (nested; tolerant of a trailing
    ``;`` before ``]`` as the reference fixtures contain, e.g.
    ``/root/reference/test/rml.test.ts:207``), labeled ``_:b`` nodes
  * predicate lists with ``;``, object lists with ``,``, ``a`` keyword
  * ``#`` comments

Output is a flat list of triples whose terms are :class:`Term`.
Collections ``( ... )`` are not used by any reference fixture and raise.
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
_RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
_RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"

_TOKEN_RE = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iriref><[^<>\s]*>)
    | (?P<string_long>"{3}(?:[^"\\]|\\.|"(?!"{2}))*"{3})
    | (?P<string_long_sq>'{3}(?:[^'\\]|\\.|'(?!'{2}))*'{3})
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<string_sq>'(?:[^'\\]|\\.)*')
    | (?P<prefix_decl>@prefix\b)
    | (?P<base_decl>@base\b)
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtype>\^\^)
    | (?P<bnode_label>_:[A-Za-z0-9_]+)
    | (?P<pname>[A-Za-z][\w.-]*:[\w.%-]*|:[\w.%-]+)
    | (?P<boolean>\b(?:true|false)\b)
    | (?P<kw_a>\ba\b)
    | (?P<punct>[\[\]();,.])
    | (?P<number>[+-]?\d+(?:\.\d+)?)
    | (?P<ws>\s+)
    """,
    re.VERBOSE,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}


@dataclass(frozen=True)
class Term:
    """An RDF term: kind in {'iri', 'bnode', 'literal'}."""

    kind: str
    value: str
    datatype: str | None = None
    lang: str | None = None

    def __repr__(self) -> str:  # compact debugging
        if self.kind == "iri":
            return f"<{self.value}>"
        if self.kind == "bnode":
            return f"_:{self.value}"
        suffix = f"^^<{self.datatype}>" if self.datatype else (f"@{self.lang}" if self.lang else "")
        return f'"{self.value}"{suffix}'


Triple = tuple[Term, Term, Term]


def _unescape(raw: str) -> str:
    out, i = [], 0
    while i < len(raw):
        ch = raw[i]
        if ch == "\\" and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt == "u" and i + 5 < len(raw):
                out.append(chr(int(raw[i + 2 : i + 6], 16)))
                i += 6
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


class _Tokens:
    def __init__(self, text: str):
        self.items: list[tuple[str, str]] = []
        pos = 0
        for m in _TOKEN_RE.finditer(text):
            if m.start() != pos:
                raise ValueError(f"turtle: unexpected character at {pos}: {text[pos:pos+40]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            self.items.append((kind, m.group()))
        if pos != len(text):
            raise ValueError(f"turtle: trailing garbage at {pos}: {text[pos:pos+40]!r}")
        self.i = 0

    def peek(self):
        return self.items[self.i] if self.i < len(self.items) else (None, None)

    def next(self):
        tok = self.peek()
        if tok[0] is None:
            raise ValueError("turtle: unexpected end of input")
        self.i += 1
        return tok


class TurtleParser:
    def __init__(self):
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self.triples: list[Triple] = []
        self._bnode_ids = itertools.count()

    def parse(self, text: str) -> list[Triple]:
        toks = _Tokens(text)
        while toks.peek()[0] is not None:
            kind, val = toks.peek()
            if kind == "prefix_decl":
                toks.next()
                pkind, pval = toks.next()
                if pkind != "pname" or not pval.endswith(":"):
                    raise ValueError(f"turtle: bad @prefix name {pval!r}")
                ikind, ival = toks.next()
                if ikind != "iriref":
                    raise ValueError("turtle: @prefix requires IRIREF")
                self.prefixes[pval[:-1]] = self._resolve_iri(ival[1:-1])
                self._expect(toks, ".")
            elif kind == "base_decl":
                toks.next()
                ikind, ival = toks.next()
                if ikind != "iriref":
                    raise ValueError("turtle: @base requires IRIREF")
                # nested @base resolves against the current base (RFC 3986)
                self.base = self._resolve_iri(ival[1:-1])
                self._expect(toks, ".")
            else:
                subj = self._parse_term(toks, as_subject=True)
                self._parse_predicate_object_list(toks, subj)
                self._expect(toks, ".")
        return self.triples

    def _expect(self, toks: _Tokens, punct: str):
        kind, val = toks.next()
        if kind != "punct" or val != punct:
            raise ValueError(f"turtle: expected {punct!r}, got {val!r}")

    def _new_bnode(self) -> Term:
        return Term("bnode", f"b{next(self._bnode_ids)}")

    def _resolve_iri(self, iri: str) -> str:
        """Resolve a (possibly relative) IRIREF against @base per RFC
        3986. Absolute IRIs (with a scheme) pass through untouched; a
        relative IRIREF without a declared @base stays relative (the
        executor's validity filter then treats it as a data error)."""
        if self.base is None or re.match(r"[A-Za-z][A-Za-z0-9+.\-]*:", iri):
            return iri
        from urllib.parse import urljoin

        return urljoin(self.base, iri)

    def _resolve_pname(self, pname: str) -> str:
        prefix, _, local = pname.partition(":")
        if prefix not in self.prefixes:
            raise ValueError(f"turtle: unknown prefix {prefix!r} in {pname!r}")
        return self.prefixes[prefix] + local

    def _parse_term(self, toks: _Tokens, as_subject: bool = False) -> Term:
        kind, val = toks.next()
        if kind == "iriref":
            return Term("iri", self._resolve_iri(val[1:-1]))
        if kind == "pname":
            return Term("iri", self._resolve_pname(val))
        if kind == "bnode_label":
            return Term("bnode", val[2:])
        if kind == "kw_a" and not as_subject:
            return Term("iri", _RDF_TYPE)
        if kind in ("string", "string_sq", "string_long", "string_long_sq"):
            # long forms (triple-quoted) may span lines — how a mapping
            # carries multi-line SQL in rml:query, or embedded quotes,
            # without escaping (Turtle long-string grammar)
            trim = 3 if kind.startswith("string_long") else 1
            lit = _unescape(val[trim:-trim])
            nk, nv = toks.peek()
            if nk == "dtype":
                toks.next()
                dt = self._parse_term(toks)
                return Term("literal", lit, datatype=dt.value)
            if nk == "langtag":
                toks.next()
                return Term("literal", lit, lang=nv[1:])
            return Term("literal", lit)
        if kind == "number":
            dt = "http://www.w3.org/2001/XMLSchema#" + ("decimal" if "." in val else "integer")
            return Term("literal", val, datatype=dt)
        if kind == "boolean":
            # Turtle short form: bare true/false ≙ "true"^^xsd:boolean
            return Term(
                "literal", val, datatype="http://www.w3.org/2001/XMLSchema#boolean"
            )
        if kind == "punct" and val == "[":
            bnode = self._new_bnode()
            if toks.peek() != ("punct", "]"):
                self._parse_predicate_object_list(toks, bnode, in_bnode=True)
            self._expect(toks, "]")
            return bnode
        if kind == "punct" and val == "(":
            # RDF collection: (a b c) desugars to the standard
            # rdf:first/rdf:rest bnode chain, () to rdf:nil
            items: list[Term] = []
            while toks.peek() != ("punct", ")"):
                items.append(self._parse_term(toks))
            toks.next()  # consume ')'
            if not items:
                return Term("iri", _RDF_NIL)
            head = self._new_bnode()
            node = head
            for i, item in enumerate(items):
                self.triples.append((node, Term("iri", _RDF_FIRST), item))
                rest = self._new_bnode() if i < len(items) - 1 else Term("iri", _RDF_NIL)
                self.triples.append((node, Term("iri", _RDF_REST), rest))
                node = rest
            return head
        raise ValueError(f"turtle: unexpected token {val!r}")

    def _parse_predicate_object_list(self, toks: _Tokens, subj: Term, in_bnode: bool = False):
        while True:
            kind, val = toks.peek()
            if kind == "kw_a":
                toks.next()
                pred = Term("iri", _RDF_TYPE)
            else:
                pred = self._parse_term(toks)
                if pred.kind != "iri":
                    raise ValueError(f"turtle: predicate must be IRI, got {pred!r}")
            while True:
                obj = self._parse_term(toks)
                self.triples.append((subj, pred, obj))
                if toks.peek() == ("punct", ","):
                    toks.next()
                    continue
                break
            if toks.peek() == ("punct", ";"):
                toks.next()
                # tolerate `;` immediately before `]` or `.` (reference fixtures)
                nk, nv = toks.peek()
                if nk == "punct" and nv in ("]", "."):
                    return
                # tolerate doubled `;`
                while toks.peek() == ("punct", ";"):
                    toks.next()
                continue
            return


def parse_turtle(text: str) -> list[Triple]:
    return TurtleParser().parse(text)


def parse_turtle_with_base(text: str) -> tuple[list[Triple], str | None]:
    p = TurtleParser()
    triples = p.parse(text)
    return triples, p.base


class Graph:
    """Tiny in-memory triple store with the N3.js-style pattern-match API
    the reference uses (``getQuads/getSubjects/getObjects``,
    ``/root/reference/src/rml/rml.ts:190-201``)."""

    def __init__(self, triples: list[Triple] | None = None, base: str | None = None):
        self.triples: list[Triple] = list(triples or [])
        # the document's @base, for relative rr:template resolution
        self.base = base

    @classmethod
    def from_turtle(cls, text: str) -> "Graph":
        triples, base = parse_turtle_with_base(text)
        return cls(triples, base)

    def match(self, s: Term | None = None, p: str | None = None, o: Term | None = None):
        for t in self.triples:
            if s is not None and t[0] != s:
                continue
            if p is not None and t[1].value != p:
                continue
            if o is not None and t[2] != o:
                continue
            yield t

    def objects(self, s: Term, p: str) -> list[Term]:
        return [t[2] for t in self.match(s, p)]

    def object(self, s: Term, p: str) -> Term | None:
        objs = self.objects(s, p)
        return objs[0] if objs else None

    def subjects(self, p: str | None = None, o: Term | None = None) -> list[Term]:
        seen, out = set(), []
        for t in self.match(None, p, o):
            if t[0] not in seen:
                seen.add(t[0])
                out.append(t[0])
        return out
