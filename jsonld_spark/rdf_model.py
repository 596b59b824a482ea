"""RDF term/quad model + N-Quads serialization + canonical lexical forms.

The quad is the relational core of the engine: schema
``(subj, pred, obj, obj_is_literal, obj_datatype, obj_lang, graph)``
— exactly the columns of the Spark ``triples`` DataFrame (SURVEY.md §1).
IRIs and blank nodes are plain strings (bnodes carry the ``_:`` prefix);
literals keep lexical form + datatype IRI + language as separate fields
so W3C byte-level lexical checks survive (never round-trip through
typed Spark columns).

Canonicalization parity with /root/reference/lib/json/ld/to_rdf.rb:29-79
(double exponent form, JCS JSON literals).
"""

from __future__ import annotations

import json
import math
from typing import NamedTuple

from . import errors as err

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_JSON = RDF_NS + "JSON"
RDF_VALUE = RDF_NS + "value"
RDF_LANGUAGE = RDF_NS + "language"
RDF_DIRECTION = RDF_NS + "direction"
RDF_LANGSTRING = RDF_NS + "langString"
XSD_BOOLEAN = XSD_NS + "boolean"
XSD_INTEGER = XSD_NS + "integer"
XSD_DOUBLE = XSD_NS + "double"
XSD_STRING = XSD_NS + "string"
I18N_NS = "https://www.w3.org/ns/i18n#"


class Quad(NamedTuple):
    subj: str
    pred: str
    obj: str
    obj_is_literal: bool
    obj_datatype: str | None  # None for IRI/bnode objects
    obj_lang: str | None
    graph: str | None  # None = default graph


def is_bnode(term: str) -> bool:
    return term.startswith("_:")


# --- canonical lexical forms -------------------------------------------------


def canonical_double(value) -> str:
    """xsd:double canonical form: ``1.0E21``, ``5.5E0``, ``-2.0E-1``.

    Matches the reference's ``%1.15E`` + trailing-zero strip + ``E+``→``E``
    (to_rdf.rb:42-50 via RDF::Literal::Double canonicalize).
    """
    f = float(value)
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "INF" if f > 0 else "-INF"
    mantissa, _, exp = f"{f:.15E}".partition("E")
    int_part, _, frac = mantissa.partition(".")
    frac = frac.rstrip("0") or "0"
    return f"{int_part}.{frac}E{int(exp)}"


def canonical_integer(value) -> str:
    return str(int(value))


# --- JCS (RFC 8785) canonical JSON ------------------------------------------


def _es_number(x) -> str:
    """ECMAScript Number::toString — required by JCS for JSON numbers."""
    if isinstance(x, int) and not isinstance(x, bool):
        return str(x)
    f = float(x)
    if math.isnan(f) or math.isinf(f):
        raise err.InvalidJsonLiteral(repr(x))
    if f == 0.0:
        return "0"
    if f == int(f) and abs(f) < 1e21:
        return str(int(f))
    s = repr(f)  # shortest round-trip digits
    if "e" in s or "E" in s:
        mant, _, e = s.lower().partition("e")
        exp10 = int(e)
    else:
        mant, exp10 = s, 0
    neg = mant.startswith("-")
    mant = mant.lstrip("-")
    ip, _, fp = mant.partition(".")
    digits = (ip + fp).lstrip("0")
    # n: decimal point position relative to first significant digit
    lead_zeros = len(ip + fp) - len(digits)
    n = len(ip) - lead_zeros + exp10
    digits = digits.rstrip("0") or "0"
    k = len(digits)
    sign = "-" if neg else ""
    if k <= n <= 21:
        return sign + digits + "0" * (n - k)
    if 0 < n <= 21:
        return sign + digits[:n] + "." + digits[n:]
    if -6 < n <= 0:
        return sign + "0." + "0" * (-n) + digits
    # exponential form
    e = n - 1
    mant_s = digits[0] + ("." + digits[1:] if k > 1 else "")
    return f"{sign}{mant_s}e{'+' if e >= 0 else '-'}{abs(e)}"


def _jcs(value, out: list) -> None:
    if value is None:
        out.append("null")
    elif value is True:
        out.append("true")
    elif value is False:
        out.append("false")
    elif isinstance(value, str):
        out.append(json.dumps(value, ensure_ascii=False))
    elif isinstance(value, (int, float)):
        out.append(_es_number(value))
    elif isinstance(value, list):
        out.append("[")
        for i, v in enumerate(value):
            if i:
                out.append(",")
            _jcs(v, out)
        out.append("]")
    elif isinstance(value, dict):
        out.append("{")
        # sort keys by UTF-16 code units (RFC 8785) — byte-compare the
        # UTF-16-BE encoding so non-BMP keys order by surrogate pairs,
        # not code points
        keys = sorted(value, key=lambda k: list(k.encode("utf-16-be")))
        for i, k in enumerate(keys):
            if i:
                out.append(",")
            out.append(json.dumps(k, ensure_ascii=False))
            out.append(":")
            _jcs(value[k], out)
        out.append("}")
    else:
        raise err.InvalidJsonLiteral(repr(value))


def jcs_canonicalize(value) -> str:
    """RFC 8785 canonical JSON text (reference uses the
    json-canonicalization gem, to_rdf.rb:5,39)."""
    out: list[str] = []
    _jcs(value, out)
    return "".join(out)


# --- N-Quads -----------------------------------------------------------------

_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}


def _escape_literal(s: str) -> str:
    # named ECHARs, then \uXXXX for remaining C0 controls + DEL
    # (canonical N-Triples form)
    return "".join(
        _ESCAPES.get(c)
        or (f"\\u{ord(c):04X}" if ord(c) < 0x20 or ord(c) == 0x7F else c)
        for c in s
    )


def term_to_nquads(quad: Quad) -> str:
    """Serialize the object term of a quad."""
    if not quad.obj_is_literal:
        o = quad.obj
        if is_bnode(o) or o.startswith("<<"):
            return o
        return f"<{o}>"
    lex = _escape_literal(quad.obj)
    if quad.obj_lang:
        return f'"{lex}"@{quad.obj_lang}'
    if quad.obj_datatype and quad.obj_datatype != XSD_STRING:
        return f'"{lex}"^^<{quad.obj_datatype}>'
    return f'"{lex}"'


def _res_to_nquads(term: str) -> str:
    # quoted triples (N-Quads-star) and bnodes serialize bare
    if is_bnode(term) or term.startswith("<<"):
        return term
    return f"<{term}>"


def quad_to_nquads(quad: Quad) -> str:
    s = _res_to_nquads(quad.subj)
    p = quad.pred if is_bnode(quad.pred) else f"<{quad.pred}>"
    o = term_to_nquads(quad)
    if quad.graph is not None:
        g = quad.graph if is_bnode(quad.graph) else f"<{quad.graph}>"
        return f"{s} {p} {o} {g} ."
    return f"{s} {p} {o} ."


def quads_to_nquads(quads) -> str:
    return "".join(quad_to_nquads(q) + "\n" for q in quads)


# --- N-Quads parsing (for golden-file comparison in tests) -------------------

import re as _re

_NQ_IRI = r"<([^>]*)>"
_NQ_BNODE = r"(_:[A-Za-z0-9_.\-]+)"
_NQ_LIT = r'"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>|@([A-Za-z0-9\-]+))?'
# predicate admits a bnode: generalized N-Quads, which this module's own
# quad_to_nquads EMITS under produce_generalized_rdf (to_rdf keeps
# bnode predicates in that mode) — the parser must read its own output
_NQ_RE = _re.compile(
    rf"\A\s*(?:{_NQ_IRI}|{_NQ_BNODE})\s+(?:{_NQ_IRI}|{_NQ_BNODE})\s+"
    rf"(?:{_NQ_IRI}|{_NQ_BNODE}|{_NQ_LIT})\s*"
    rf"(?:(?:{_NQ_IRI}|{_NQ_BNODE})\s*)?\.\s*\Z"
)

_UNESC = {
    "\\\\": "\\",
    '\\"': '"',
    "\\n": "\n",
    "\\r": "\r",
    "\\t": "\t",
    "\\b": "\b",
    "\\f": "\f",
}


def _unescape(s: str) -> str:
    def sub(m):
        tok = m.group(0)
        if tok in _UNESC:
            return _UNESC[tok]
        if tok.startswith("\\u"):
            return chr(int(tok[2:], 16))
        if tok.startswith("\\U"):
            return chr(int(tok[2:], 16))
        return tok

    return _re.sub(r"\\U[0-9A-Fa-f]{8}|\\u[0-9A-Fa-f]{4}|\\.", sub, s)


def _uniri(s):
    """Resolve UCHAR (\\uXXXX / \\UXXXXXXXX) escapes inside an IRIREF —
    the only escapes the N-Quads grammar allows there (no ECHARs).  The
    writer never emits them, so round-trips are untouched; external .nq
    dumps may carry them.  Guarded: the common escape-free IRI pays one
    substring probe."""
    if s is None or "\\" not in s:
        return s
    return _re.sub(
        r"\\U[0-9A-Fa-f]{8}|\\u[0-9A-Fa-f]{4}",
        lambda m: chr(int(m.group(0)[2:], 16)),
        s,
    )


def _split_quoted(line: str):
    """If ``line`` starts with an N-Quads-star quoted term, return
    (quoted_term, rest); else None.  Nesting-aware and quote-aware
    (a literal inside the quoted term may contain '<<' / '>>')."""
    if not line.startswith("<<"):
        return None
    depth = 0
    i = 0
    in_str = False
    n = len(line)
    while i < n:
        c = line[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif line.startswith("<<", i):
            depth += 1
            i += 2
            continue
        elif line.startswith(">>", i):
            depth -= 1
            i += 2
            if depth == 0:
                return line[:i], line[i:].lstrip()
            continue
        i += 1
    raise ValueError(f"unbalanced quoted triple: {line!r}")


def _parse_star_line(line: str):
    """Parse one N-Quads-star line (quoted term in subject and/or object
    position); returns a Quad or None when the line has no quoted term."""
    sq = _split_quoted(line)
    if sq is not None:
        q_subj, rest = sq
        m = _re.match(rf"\A{_NQ_IRI}\s+", rest)
        if m is None:
            raise ValueError(f"bad N-Quads-star line: {line!r}")
        pred = m.group(1)
        rest = rest[m.end():]
        oq = _split_quoted(rest)
        if oq is not None:
            obj, tail = oq
            g = _parse_graph_tail(tail.strip(), line)
            return Quad(q_subj, pred, obj, False, None, None, g)
        inner = parse_nquads(f"_:q <{pred}> " + rest)[0]
        return Quad(
            q_subj, inner.pred, inner.obj, inner.obj_is_literal,
            inner.obj_datatype, inner.obj_lang, inner.graph,
        )
    idx = line.find(" <<")
    if idx != -1 and line[:idx].count('"') % 2 == 0:
        head = line[:idx].strip()
        hm = _re.match(rf"\A(?:{_NQ_IRI}|{_NQ_BNODE})\s+{_NQ_IRI}\s*\Z", head)
        if hm is not None:
            subj = hm.group(1) if hm.group(1) is not None else hm.group(2)
            pred = hm.group(3)
            obj, tail = _split_quoted(line[idx + 1:].lstrip())
            g = _parse_graph_tail(tail.strip(), line)
            return Quad(subj, pred, obj, False, None, None, g)
    return None


def _parse_graph_tail(tail: str, line: str):
    if tail == ".":
        return None
    gm = _re.match(rf"\A(?:{_NQ_IRI}|{_NQ_BNODE})\s*\.\s*\Z", tail)
    if gm is None:
        raise ValueError(f"bad N-Quads-star line: {line!r}")
    return gm.group(1) if gm.group(1) is not None else gm.group(2)


def parse_quoted_term(term: str) -> Quad:
    """Parse the inside of an N-Triples-star quoted term ``<< s p o >>``
    into a Quad (graph always None).  Nested quoting supported."""
    if not (term.startswith("<<") and term.endswith(">>")):
        raise ValueError(f"not a quoted term: {term!r}")
    inner = term[2:-2].strip() + " ."
    quads = parse_nquads(inner)
    if len(quads) != 1:
        raise ValueError(f"quoted term must hold one statement: {term!r}")
    return quads[0]


def parse_nquads(text: str) -> list[Quad]:
    quads = []
    # NOT str.splitlines(): it splits on \x1c-\x1e/\x85/  etc.,
    # which may appear (escaped or raw) inside literals
    for line in text.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        star = _parse_star_line(line)
        if star is not None:
            quads.append(star)
            continue
        m = _NQ_RE.match(line)
        if m is None:
            raise ValueError(f"bad N-Quads line: {line!r}")
        (s_iri, s_bn, p_iri, p_bn, o_iri, o_bn, o_lit, o_dt, o_lang, g_iri, g_bn) = (
            m.groups()
        )
        subj = _uniri(s_iri) if s_iri is not None else s_bn
        pred = _uniri(p_iri) if p_iri is not None else p_bn
        graph = _uniri(g_iri) if g_iri is not None else g_bn
        if o_lit is not None:
            lex = _unescape(o_lit)
            if o_lang:
                quads.append(Quad(subj, pred, lex, True, RDF_LANGSTRING, o_lang, graph))
            else:
                quads.append(
                    Quad(subj, pred, lex, True, _uniri(o_dt) or XSD_STRING, None, graph)
                )
        else:
            obj = _uniri(o_iri) if o_iri is not None else o_bn
            quads.append(Quad(subj, pred, obj, False, None, None, graph))
    return quads
