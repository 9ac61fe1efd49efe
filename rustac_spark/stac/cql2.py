"""CQL2 (text + JSON) → pyspark Column compiler.

Reference behavior being reimplemented (NOT ported — the reference
delegates to the external cql2 crate and DuckDB's SQL engine,
crates/duckdb/src/client.rs:386-394):

- Expr variants supported: Property, Float, Literal(str), Bool,
  Timestamp, Date, Array, Operation{op,args}
  (crates/core/src/api/filter.rs:11-70).
- Operators: = <> < <= > >= ; and/or/not ; IS [NOT] NULL ;
  [NOT] IN ; [NOT] LIKE ; BETWEEN ; casei() → lower() ;
  t_before/t_after/t_intersects on timestamps.
- Plan-time empty-result short-circuit: if any referenced property is
  not a column, the whole query returns empty
  (expr_properties_match, crates/duckdb/src/client.rs:433-455).

The compiler produces a ``pyspark.sql.Column`` tree so Catalyst can
push the predicate into the parquet scan — CQL2 filters cost the same
as native filters.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from pyspark.sql import functions as F

from .datetime_parse import parse_rfc3339


class Cql2Error(ValueError):
    pass


# ------------------------------------------------------------------ AST

@dataclass
class Prop:
    name: str


@dataclass
class Lit:
    value: Any  # str | float | int | bool | datetime


@dataclass
class Op:
    op: str
    args: list


# ------------------------------------------------------------- tokenizer

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<string>'(?:[^']|'')*')
    | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<ident>[A-Za-z_][A-Za-z0-9_:.]*|"[^"]+")
    | (?P<op><>|<=|>=|=|<|>)
    | (?P<punct>[(),])
    )""", re.VERBOSE)

_KEYWORDS = {"and", "or", "not", "is", "null", "in", "like", "between",
             "true", "false", "timestamp", "date", "casei"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        if text[pos].isspace():
            pos += 1
            continue
        m = _TOKEN.match(text, pos)
        if not m:
            raise Cql2Error(f"cql2-text: bad token at {text[pos:pos+20]!r}")
        pos = m.end()
        for kind in ("string", "number", "ident", "op", "punct"):
            v = m.group(kind)
            if v is not None:
                if kind == "ident" and v.lower() in _KEYWORDS:
                    out.append(("kw", v.lower()))
                else:
                    out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive-descent cql2-text parser (precedence: OR < AND < NOT
    < comparison)."""

    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v.lower() != val):
            raise Cql2Error(f"cql2-text: expected {val or kind}, got {v!r}")
        return v

    def parse(self):
        e = self.or_expr()
        if self.peek()[0] != "eof":
            raise Cql2Error(f"cql2-text: trailing input {self.peek()[1]!r}")
        return e

    def or_expr(self):
        e = self.and_expr()
        while self.peek() == ("kw", "or"):
            self.next()
            e = Op("or", [e, self.and_expr()])
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.peek() == ("kw", "and"):
            self.next()
            e = Op("and", [e, self.not_expr()])
        return e

    def not_expr(self):
        if self.peek() == ("kw", "not"):
            self.next()
            return Op("not", [self.not_expr()])
        return self.comparison()

    def comparison(self):
        left = self.primary()
        k, v = self.peek()
        if k == "op":
            self.next()
            return Op(v, [left, self.primary()])
        if k == "kw" and v == "is":
            self.next()
            negate = False
            if self.peek() == ("kw", "not"):
                self.next()
                negate = True
            self.expect("kw", "null")
            e = Op("isNull", [left])
            return Op("not", [e]) if negate else e
        negate = False
        if k == "kw" and v == "not":
            self.next()
            negate = True
            k, v = self.peek()
        if k == "kw" and v == "in":
            self.next()
            self.expect("punct", "(")
            vals = [self.primary()]
            while self.peek() == ("punct", ","):
                self.next()
                vals.append(self.primary())
            self.expect("punct", ")")
            e = Op("in", [left, vals])
        elif k == "kw" and v == "like":
            self.next()
            e = Op("like", [left, self.primary()])
        elif k == "kw" and v == "between":
            self.next()
            lo = self.primary()
            self.expect("kw", "and")
            hi = self.primary()
            e = Op("between", [left, lo, hi])
        else:
            if negate:
                raise Cql2Error("cql2-text: dangling NOT")
            return left
        return Op("not", [e]) if negate else e

    def primary(self):
        k, v = self.next()
        if k == "string":
            return Lit(v[1:-1].replace("''", "'"))
        if k == "number":
            return Lit(float(v) if ("." in v or "e" in v.lower()) else int(v))
        if k == "punct" and v == "(":
            e = self.or_expr()
            self.expect("punct", ")")
            return e
        if k == "kw" and v in ("true", "false"):
            return Lit(v == "true")
        if k == "kw" and v in ("timestamp", "date"):
            self.expect("punct", "(")
            s = self.expect("string")[1:-1]
            self.expect("punct", ")")
            if v == "date":
                s = s + "T00:00:00Z"
            return Lit(parse_rfc3339(s))
        if k == "kw" and v == "casei":
            self.expect("punct", "(")
            e = self.or_expr()
            self.expect("punct", ")")
            return Op("casei", [e])
        if k == "ident":
            name = v[1:-1] if v.startswith('"') else v
            if self.peek() == ("punct", "("):
                raise Cql2Error(f"cql2-text: unsupported function {name!r}")
            return Prop(name)
        raise Cql2Error(f"cql2-text: unexpected token {v!r}")


def parse_text(text: str):
    return _Parser(text).parse()


# ----------------------------------------------------------- json walker

_JSON_OPS = {"=", "<>", "<", "<=", ">", ">=", "and", "or", "not",
             "isNull", "in", "like", "between", "casei",
             "t_before", "t_after", "t_intersects"}


def parse_json(obj) -> Any:
    """cql2-json dict → AST (same node types as the text parser)."""
    if isinstance(obj, dict):
        if "property" in obj:
            return Prop(obj["property"])
        if "timestamp" in obj:
            return Lit(parse_rfc3339(obj["timestamp"]))
        if "date" in obj:
            return Lit(parse_rfc3339(obj["date"] + "T00:00:00Z"))
        if "op" in obj:
            op = obj["op"]
            if op not in _JSON_OPS:
                raise Cql2Error(f"cql2-json: unsupported op {op!r}")
            args = obj.get("args", [])
            if op == "in":
                return Op("in", [parse_json(args[0]),
                                 [parse_json(a) for a in args[1]]])
            return Op(op, [parse_json(a) for a in args])
        raise Cql2Error(f"cql2-json: unrecognized node {obj!r}")
    if isinstance(obj, (str, int, float, bool)):
        return Lit(obj)
    if isinstance(obj, list):
        return [parse_json(a) for a in obj]
    raise Cql2Error(f"cql2-json: unsupported literal {obj!r}")


def parse(filt) -> Any:
    """str → cql2-text; dict → cql2-json."""
    return parse_text(filt) if isinstance(filt, str) else parse_json(filt)


# ------------------------------------------------------------- compiler

def properties(ast) -> set[str]:
    """All property names referenced by the expression — drives the
    plan-time empty short-circuit (client.rs:433-455)."""
    out: set[str] = set()

    def walk(n):
        if isinstance(n, Prop):
            out.add(n.name)
        elif isinstance(n, Op):
            for a in n.args:
                walk(a)
        elif isinstance(n, list):
            for a in n:
                walk(a)

    walk(ast)
    return out


def _col(name: str):
    return F.col(f"`{name}`") if ("." in name or ":" in name) else F.col(name)


def to_column(ast):
    """AST → pyspark Column (pure Column tree — pushdown-friendly)."""
    if isinstance(ast, Prop):
        return _col(ast.name)
    if isinstance(ast, Lit):
        return F.lit(ast.value)
    if isinstance(ast, Op):
        op, a = ast.op, ast.args
        if op == "and":
            return to_column(a[0]) & to_column(a[1])
        if op == "or":
            return to_column(a[0]) | to_column(a[1])
        if op == "not":
            return ~to_column(a[0])
        if op == "=":
            return to_column(a[0]) == to_column(a[1])
        if op == "<>":
            return to_column(a[0]) != to_column(a[1])
        if op == "<":
            return to_column(a[0]) < to_column(a[1])
        if op == "<=" or op == "t_before":
            return to_column(a[0]) <= to_column(a[1])
        if op == ">":
            return to_column(a[0]) > to_column(a[1])
        if op == ">=" or op == "t_after":
            return to_column(a[0]) >= to_column(a[1])
        if op == "t_intersects":
            return to_column(a[0]) == to_column(a[1])
        if op == "isNull":
            return to_column(a[0]).isNull()
        if op == "in":
            vals = [v.value if isinstance(v, Lit) else v for v in a[1]]
            return to_column(a[0]).isin(vals)
        if op == "like":
            return to_column(a[0]).like(a[1].value)
        if op == "between":
            c = to_column(a[0])
            return (c >= to_column(a[1])) & (c <= to_column(a[2]))
        if op == "casei":
            return F.lower(to_column(a[0]))
        raise Cql2Error(f"unsupported op {op!r}")
    raise Cql2Error(f"cannot compile node {ast!r}")


def evaluate(ast, item: dict):
    """Row-level evaluation of a CQL2 expression against one flat item
    dict — the reference's single-item `expr.matches(flat_item_json)`
    (crates/core/src/item.rs:619-622, 706-713). SQL three-valued
    logic: missing/None propagates to None, filtered as non-match."""
    if isinstance(ast, Prop):
        return item.get(ast.name)
    if isinstance(ast, Lit):
        return ast.value
    op, a = ast.op, ast.args

    def ev(n):
        return evaluate(n, item)

    if op in ("and", "or"):
        l, r = ev(a[0]), ev(a[1])
        if op == "and":
            return (False if l is False or r is False
                    else None if l is None or r is None else True)
        return (True if l is True or r is True
                else None if l is None or r is None else False)
    if op == "not":
        v = ev(a[0])
        return None if v is None else not v
    if op == "isNull":
        return ev(a[0]) is None
    if op == "casei":
        v = ev(a[0])
        return v.lower() if isinstance(v, str) else v
    if op == "in":
        v = ev(a[0])
        if v is None:
            return None
        return v in [x.value if isinstance(x, Lit) else ev(x) for x in a[1]]
    if op == "like":
        import re as _re
        v = ev(a[0])
        if v is None:
            return None
        pat = "^" + _re.escape(a[1].value).replace("%", ".*") \
            .replace("_", ".") + "$"
        return bool(_re.match(pat, v))
    if op == "between":
        v, lo, hi = ev(a[0]), ev(a[1]), ev(a[2])
        if v is None or lo is None or hi is None:
            return None
        return lo <= v <= hi
    l, r = ev(a[0]), ev(a[1])
    if l is None or r is None:
        return None
    if op == "=" or op == "t_intersects":
        return l == r
    if op == "<>":
        return l != r
    if op == "<" :
        return l < r
    if op == "<=" or op == "t_before":
        return l <= r
    if op == ">":
        return l > r
    if op == ">=" or op == "t_after":
        return l >= r
    raise Cql2Error(f"cannot evaluate op {op!r}")


def matches(filt, item: dict) -> bool:
    """True iff the item matches the CQL2 filter (None → False)."""
    return evaluate(parse(filt), item) is True


def compile_filter(filt, columns: list[str]):
    """→ (Column | None, short_circuit: bool).

    short_circuit=True ⇒ a referenced property is not a column of the
    table: the whole query must return empty (plan-time anti-join
    against the schema, client.rs:386-394).
    """
    ast = parse(filt)
    missing = properties(ast) - set(columns)
    if missing:
        return None, True
    return to_column(ast), False
