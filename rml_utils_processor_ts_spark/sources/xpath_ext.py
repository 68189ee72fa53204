"""Extended-XPath evaluator over stdlib ElementTree: the function/axis
long tail ElementTree's ``findall`` rejects with SyntaxError.

Covers, beyond ElementTree's own subset (which stays the fast path —
this module is only consulted on SyntaxError):

* function predicates: ``contains(A, 'v')``, ``starts-with(A, 'v')``,
  ``not(P)``, ``position() <op> n`` — where ``A`` is ``.``, ``text()``,
  ``@attr``, ``@*``, ``substring(A, s[, l])``, or a relative element
  path, and ``P`` is any supported non-positional predicate;
* numeric predicates (r6): ``number(A) <op> k``, ``A <op> k`` (implicit
  number() conversion, NaN fails every comparison),
  ``string-length(A) <op> k``;
* boolean connectives (r7): ``P1 and P2``, ``P1 or P2`` with XPath
  precedence (``or`` < ``and`` < ``not()``) and parenthesized groups
  ``(P1 or P2) and P3`` — splitting only at top level, so quoted
  literals and nested calls are opaque. ``position()``/``last()``
  remain whole-predicate only (not composable under connectives);
* non-child axes as steps: ``following-sibling::name``,
  ``preceding-sibling::name``, ``ancestor::name``, ``parent::name``
  (positions follow XPath proximity order: reverse axes count outward),
  plus (r6) ``self::``, ``descendant::``, ``descendant-or-self::``;
* everything composes with the predicates ElementTree already supports
  (``[n]``, ``[last()]``, ``[last()-k]``, ``[@a]``, ``[@a='v']``,
  ``[child]``, ``[child='v']``) and with ``//`` descendant steps.

The reference processor delegates complete XPath to Saxon inside its
Java jar (ql:XPath, /root/reference/src/voc.ts:83); this walker covers
the function/axis surface real mappings use without a native XPath
engine in the container. String value of an element is its complete
text content (``itertext``), matching both XPath 1.0 ``string()`` and
ElementTree's ``[tag='text']`` comparison semantics.

Scale note: this runs inside the Arrow ``mapInPandas`` slow path, per
XML document, only for iterators the JVM ``from_xml`` fast path and
ElementTree both decline — per-document work is linear in document
size per step, no cross-document state.
"""

from __future__ import annotations

import math
import re
import xml.etree.ElementTree as ET

_EXT_MARKERS = (
    "::", "contains(", "starts-with(", "position()", "not(",
    "number(", "string-length(", "substring(",
    " and ", " or ",
    "*:",  # namespace-wildcard name test (ElementTree can't parse it)
)

_POSITION_RE = re.compile(r"^position\(\)\s*(<=|>=|!=|<|>|=)\s*(\d+)$")
_LAST_RE = re.compile(r"^last\(\)(?:\s*-\s*(\d+))?$")
_FUNC2_RE = re.compile(r"^(contains|starts-with)\(\s*(.*?)\s*,\s*'([^']*)'\s*\)$")
_FUNC2_DQ_RE = re.compile(r'^(contains|starts-with)\(\s*(.*?)\s*,\s*"([^"]*)"\s*\)$')
_CMP_RE = re.compile(r"^(.*?)\s*(!=|=)\s*'([^']*)'$")
_CMP_DQ_RE = re.compile(r'^(.*?)\s*(!=|=)\s*"([^"]*)"$')
# numeric comparison: RHS is a number literal (position() handled first)
_NUMCMP_RE = re.compile(r"^(.+?)\s*(<=|>=|!=|<|>|=)\s*(-?\d+(?:\.\d+)?)$")
_SUBSTR_RE = re.compile(
    r"^substring\(\s*(.*?)\s*,\s*(-?\d+(?:\.\d+)?)\s*(?:,\s*(-?\d+(?:\.\d+)?)\s*)?\)$"
)
_STRLEN_RE = re.compile(r"^string-length\(\s*(.*?)\s*\)$")
_NUMBER_RE = re.compile(r"^number\(\s*(.*?)\s*\)$")
_AXES = (
    "following-sibling", "preceding-sibling", "ancestor", "parent",
    "descendant", "descendant-or-self", "self",
)


def _split_bool(pred: str, word: str) -> list[str] | None:
    """Split a predicate on the top-level boolean ``word`` (' and ' /
    ' or ' with surrounding whitespace, outside quotes and outside any
    paren/bracket nesting). Returns None when the word never occurs at
    top level, so callers fall through to the simple-predicate grammar."""
    token = f" {word} "
    parts, cur, depth, quote = [], [], 0, None
    i, n = 0, len(pred)
    while i < n:
        ch = pred[i]
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif depth == 0 and pred.startswith(token, i):
            parts.append("".join(cur))
            cur = []
            i += len(token)
            continue
        else:
            cur.append(ch)
        i += 1
    if not parts:
        return None
    parts.append("".join(cur))
    return parts


def _strip_group_parens(pred: str) -> str | None:
    """'(...)' -> '...' when the outer parens enclose the WHOLE
    predicate as one balanced group, else None."""
    if not (pred.startswith("(") and pred.endswith(")")):
        return None
    depth, quote = 0, None
    for i, ch in enumerate(pred):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0 and i < len(pred) - 1:
                return None  # closes before the end: not one group
    return pred[1:-1].strip()


def _xpath_round(x: float) -> int:
    """XPath 1.0 round(): half rounds toward +infinity (floor(x+0.5)),
    unlike Python's banker's rounding — substring('12345', 2.5) starts
    at position 3, not 2."""
    return math.floor(x + 0.5)


def _xpath_substring(v: str, start: float, length: float | None) -> str:
    """XPath 1.0 substring(): 1-based, round() semantics, position
    window [round(start), round(start)+round(length))."""
    s = _xpath_round(start)
    e = float("inf") if length is None else s + _xpath_round(length)
    return "".join(ch for i, ch in enumerate(v, 1) if i >= s and i < e)


_PREFIX_NAME_RE = re.compile(r"([A-Za-z_][\w.\-]*):(?!:)")


def expand_prefixes(path: str, namespaces: dict[str, str]) -> str:
    """Rewrite declared-prefix name tests to ElementTree Clark form:
    ``ex:item`` -> ``{http://...}item`` (quote-aware — prefixes inside
    comparison literals are untouched; ``::`` axis separators are
    excluded by the lookahead; undeclared prefixes pass through for the
    walker's literal-tag match to handle)."""

    def _sub(seg: str) -> str:
        return _PREFIX_NAME_RE.sub(
            lambda m: "{%s}" % namespaces[m.group(1)]
            if m.group(1) in namespaces
            else m.group(0),
            seg,
        )

    out: list[str] = []
    buf: list[str] = []
    quote = None
    for ch in path:
        if quote:
            out.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            out.append(_sub("".join(buf)))
            buf = []
            out.append(ch)
            quote = ch
        else:
            buf.append(ch)
    out.append(_sub("".join(buf)))
    return "".join(out)


def _tag_matches(tag: str, test: str) -> bool:
    """XPath name test against an ElementTree tag. ``*`` matches any
    element; ``*:name`` (XPath 2.0 namespace wildcard, also accepted by
    several 1.0 processors) matches any element whose LOCAL name is
    ``name`` regardless of namespace — ElementTree spells namespaced
    tags ``{uri}local``."""
    if test == "*":
        return True
    if test.startswith("*:"):
        local = test[2:]
        if tag == local:
            return True
        return tag.startswith("{") and tag.rpartition("}")[2] == local
    return tag == test


def _mask_quoted(path: str) -> str:
    """Replace quoted spans (including the quotes) with \\x00 filler of
    the same length, so substring marker checks can never fire on text
    INSIDE a comparison value — item[@v='black and white'] must not be
    routed to the restricted extension walker by its literal ' and '."""
    out: list[str] = []
    quote = None
    for ch in path:
        if quote:
            out.append("\x00")
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            out.append("\x00")
        else:
            out.append(ch)
    return "".join(out)


def has_extended_syntax(path: str) -> bool:
    masked = _mask_quoted(path)
    return any(m in masked for m in _EXT_MARKERS) or bool(split_union(path))


def split_union(path: str) -> list[str] | None:
    """Split a top-level union ('a | b') into branches, or None if the
    path has no union. ElementTree silently returns [] for unions (it
    reads 'a | b' as one tag name), so callers must pre-check with this
    rather than rely on a SyntaxError fallback."""
    parts, cur, depth, quote = [], [], 0, None
    for ch in path:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == "|" and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if not parts:
        return None
    parts.append("".join(cur).strip())
    return parts


def _string_value(el) -> str:
    return "".join(el.itertext())


def _split_steps(path: str) -> list[tuple[bool, str]]:
    """Split on '/' outside brackets/quotes/Clark-name braces; ''
    between slashes marks a descendant ('//') step. Clark names
    ('{http://uri/}local', produced by expand_prefixes) contain slashes
    inside the braces — those spans are opaque, never step boundaries.
    Returns [(descendant, step_text), ...]."""
    parts: list[str] = []
    cur, depth, brace, quote = [], 0, 0, None
    for ch in path:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "{":
            brace += 1
            cur.append(ch)
        elif ch == "}":
            brace -= 1
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == "/" and depth == 0 and brace == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))

    steps: list[tuple[bool, str]] = []
    desc = False
    for p in parts:
        if p == "":
            desc = True
            continue
        if p == ".":
            continue
        steps.append((desc, p))
        desc = False
    return steps


def _split_predicates(step: str) -> tuple[str, list[str]]:
    # first '[' outside quotes and outside Clark-name braces (an IPv6
    # namespace URI like {http://[::1]/ns} legally contains brackets)
    i, brace, quote = -1, 0, None
    for j, ch in enumerate(step):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "{":
            brace += 1
        elif ch == "}":
            brace -= 1
        elif ch == "[" and brace == 0:
            i = j
            break
    if i < 0:
        return step, []
    head = step[:i]
    preds, depth, brace, quote, cur = [], 0, 0, None, []
    for ch in step[i:]:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "{":
            brace += 1
            cur.append(ch)
        elif ch == "}":
            brace -= 1
            cur.append(ch)
        elif ch == "[" and brace == 0:
            depth += 1
            if depth > 1:
                cur.append(ch)
        elif ch == "]" and brace == 0:
            depth -= 1
            if depth == 0:
                preds.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        else:
            cur.append(ch)
    return head, preds


class _Walker:
    def __init__(self, root):
        self._root = root
        self._parent: dict[int, object] | None = None
        self._order: dict[int, int] | None = None

    def parent_of(self, el):
        if self._parent is None:
            self._parent = {}
            for p in self._root.iter():
                for c in p:
                    self._parent[id(c)] = p
        return self._parent.get(id(el))

    def doc_index(self, el) -> int:
        if self._order is None:
            self._order = {id(e): i for i, e in enumerate(self._root.iter())}
        return self._order.get(id(el), -1)

    # ---- string value of a predicate operand -------------------------
    def _operand_values(self, el, arg: str) -> list[str]:
        """All string values the operand selects from context el
        (XPath nodeset semantics: comparisons succeed if ANY matches)."""
        arg = arg.strip()
        if arg in (".", "text()", "string(.)"):
            return [_string_value(el)]
        m = _SUBSTR_RE.match(arg)
        if m:
            inner, start, length = m.groups()
            return [
                _xpath_substring(v, float(start), float(length) if length else None)
                for v in self._operand_values(el, inner)
            ]
        if arg == "@*":
            return list(el.attrib.values())
        if arg.startswith("@"):
            v = el.get(arg[1:])
            return [v] if v is not None else []
        # relative element path (may itself use extended syntax)
        return [_string_value(m) for m in self.findall(el, arg)]

    def _numeric_values(self, el, arg: str) -> list[float]:
        """Operand -> numbers, per the XPath number() conversion (non-
        numeric strings become NaN, which fails every comparison)."""
        arg = arg.strip()
        m = _STRLEN_RE.match(arg)
        if m:
            inner = m.group(1)
            vals = [_string_value(el)] if not inner else self._operand_values(el, inner)
            return [float(len(v)) for v in vals]
        m = _NUMBER_RE.match(arg)
        if m:
            arg = m.group(1) or "."
        out = []
        for v in self._operand_values(el, arg):
            try:
                out.append(float(v.strip()))
            except ValueError:
                pass  # NaN: comparisons always false, so just drop
        return out

    # ---- predicate evaluation ----------------------------------------
    def _filter(self, items: list, pred: str) -> list:
        pred = pred.strip()
        n = len(items)

        if pred.isdigit():
            k = int(pred)
            return [items[k - 1]] if 1 <= k <= n else []
        m = _LAST_RE.match(pred)
        if m:
            k = n - int(m.group(1) or 0)
            return [items[k - 1]] if 1 <= k <= n else []
        m = _POSITION_RE.match(pred)
        if m:
            op, k = m.group(1), int(m.group(2))
            ops = {"<": lambda i: i < k, "<=": lambda i: i <= k,
                   ">": lambda i: i > k, ">=": lambda i: i >= k,
                   "=": lambda i: i == k, "!=": lambda i: i != k}
            return [e for i, e in enumerate(items, 1) if ops[op](i)]

        return [e for e in items if self._bool_pred(e, pred)]

    def _bool_pred(self, el, pred: str) -> bool:
        pred = pred.strip()
        # XPath 1.0 boolean grammar, precedence or < and < not()/atoms
        # (r7, VERDICT missing #5): each connective splits only at top
        # level, so parenthesized groups and quoted literals are opaque
        parts = _split_bool(pred, "or")
        if parts is not None:
            return any(self._bool_pred(el, p) for p in parts)
        parts = _split_bool(pred, "and")
        if parts is not None:
            return all(self._bool_pred(el, p) for p in parts)
        inner = _strip_group_parens(pred)
        if inner is not None:
            return self._bool_pred(el, inner)
        if pred.startswith("not(") and pred.endswith(")"):
            return not self._bool_pred(el, pred[4:-1])
        m = _FUNC2_RE.match(pred) or _FUNC2_DQ_RE.match(pred)
        if m:
            fn, arg, lit = m.groups()
            vals = self._operand_values(el, arg)
            if fn == "contains":
                return any(lit in v for v in vals)
            return any(v.startswith(lit) for v in vals)
        m = _CMP_RE.match(pred) or _CMP_DQ_RE.match(pred)
        if m:
            arg, op, lit = m.groups()
            vals = self._operand_values(el, arg)
            if op == "=":
                return any(v == lit for v in vals)
            return any(v != lit for v in vals)
        m = _NUMCMP_RE.match(pred)
        if m:
            arg, op, lit = m.groups()
            k = float(lit)
            ops = {"<": lambda x: x < k, "<=": lambda x: x <= k,
                   ">": lambda x: x > k, ">=": lambda x: x >= k,
                   "=": lambda x: x == k, "!=": lambda x: x != k}
            return any(ops[op](x) for x in self._numeric_values(el, arg))
        if pred == "@*":
            return bool(el.attrib)
        if pred.startswith("@"):
            return el.get(pred[1:]) is not None
        # bare path existence
        return bool(self.findall(el, pred))

    # ---- axis candidate generation (document/proximity order) --------
    def _axis_candidates(self, el, axis: str, test: str) -> list:
        def ok(e):
            return _tag_matches(e.tag, test)

        if axis == "child":
            return [c for c in el if ok(c)]
        if axis == "parent":
            p = self.parent_of(el)
            return [p] if p is not None and p.tag != "__synthetic_root__" and ok(p) else []
        if axis == "ancestor":
            out, p = [], self.parent_of(el)
            while p is not None and p.tag != "__synthetic_root__":
                if ok(p):
                    out.append(p)  # proximity order: nearest first
                p = self.parent_of(p)
            return out
        if axis == "self":
            return [el] if ok(el) else []
        if axis == "descendant":
            return [e for e in el.iter() if e is not el and ok(e)]
        if axis == "descendant-or-self":
            return [e for e in el.iter() if ok(e)]
        if axis in ("following-sibling", "preceding-sibling"):
            p = self.parent_of(el)
            if p is None:
                return []
            sibs = list(p)
            i = next(j for j, s in enumerate(sibs) if s is el)
            if axis == "following-sibling":
                return [s for s in sibs[i + 1:] if ok(s)]
            return [s for s in reversed(sibs[:i]) if ok(s)]  # proximity
        return []

    # ---- step evaluation ---------------------------------------------
    def _eval_step(self, contexts: list, desc: bool, step: str) -> list:
        head, preds = _split_predicates(step)
        head = head.strip()
        if head == "..":
            axis, test = "parent", "*"
        elif "::" in head and not head.startswith("{"):
            # an axis separator can only precede the name test; a step
            # STARTING with a Clark name ({http://[::1]}x) has no axis
            axis, test = head.split("::", 1)
            axis = axis.strip()
            test = test.strip() or "*"
            if axis not in _AXES and axis != "child":
                return []
        else:
            axis, test = "child", head or "*"

        out, seen = [], set()
        for c in contexts:
            ctx_nodes = list(c.iter()) if desc else [c]
            for d in ctx_nodes:
                items = self._axis_candidates(d, axis, test)
                for p in preds:
                    items = self._filter(items, p)
                    if not items:
                        break
                for e in items:
                    if id(e) not in seen:
                        seen.add(id(e))
                        out.append(e)
        if desc and len(out) > 1:
            # per-context iteration groups results by PARENT; XPath (and
            # ElementTree) return descendant-step node-sets in DOCUMENT
            # order — e.g. .//c on <a><a><c/></a><c/></a> yields the
            # nested c first (positional predicates already applied
            # above, in their per-parent scope, before this reorder)
            out.sort(key=self.doc_index)
        return out

    def findall(self, start, path: str) -> list:
        steps = _split_steps(path.strip())
        nodes = [start]
        for desc, step in steps:
            if not nodes:
                return []
            nodes = self._eval_step(nodes, desc, step)
        return nodes


def findall_ext(root, path: str) -> list:
    """Drop-in for ``root.findall(path)`` on the extended surface.
    ``path`` uses the same relative conventions the callers already
    normalized to ('.//x', './x', or bare relative). Top-level unions
    evaluate each branch and merge first-seen-order with id-dedup."""
    branches = split_union(path) or [path]
    walker = _Walker(root)
    out, seen = [], set()
    for b in branches:
        p = b.strip()
        if p.startswith("./"):
            p = p[2:]
        for e in walker.findall(root, p):
            if id(e) not in seen:
                seen.add(id(e))
                out.append(e)
    return out
