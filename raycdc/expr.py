"""Restricted SQL-boolean predicate grammar for START WITH filters.

The reference passes the raw ``startWith`` string to Spark's ``Dataset.where``
(HierarchyFlattener.java:371-373); its tests only exercise equality
comparisons joined with OR (``"parent == 2 OR parent == 5"``,
HierarchyToRelationalTest.java:283). We implement the useful subset as a tiny
recursive-descent parser that compiles to a vectorized
``pyarrow.compute`` evaluator — no Python-per-row work.

Grammar (case-insensitive keywords)::

    expr    := or
    or      := and (OR and)*
    and     := not (AND not)*
    not     := NOT not | cmp
    cmp     := operand (op operand) | '(' expr ')'
              | operand IS [NOT] NULL
              | operand [NOT] IN '(' literal (',' literal)* ')'
              | operand [NOT] LIKE 'pattern'        # %/_ wildcards
              | operand BETWEEN literal AND literal
    op      := == | = | != | <> | <= | >= | < | >
    operand := identifier | number | 'string' | "string" | true | false | null

Type coercion: when a literal's type differs from the column's Arrow type the
literal is cast to the column type (so ``parent == 2`` works on a string
column, mirroring Spark's implicit cast in the reference test).
"""

from __future__ import annotations

import re
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)|
        (?P<op>==|!=|<>|<=|>=|=|<|>)|
        (?P<number>-?\d+\.\d+|-?\d+)|
        (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")|
        (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "is", "null", "true", "false", "in",
             "like", "between"}


def _tokenize(text: str) -> list[tuple[str, Any]]:
    tokens: list[tuple[str, Any]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            rest = text[pos:].strip()
            if not rest:
                break
            raise ValueError(f"Cannot parse predicate at: {rest!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "ident" and val.lower() in _KEYWORDS:
            tokens.append((val.lower(), val.lower()))
        elif kind == "number":
            tokens.append(("number", float(val) if "." in val else int(val)))
        elif kind == "string":
            tokens.append(("string", val[1:-1].replace("\\'", "'").replace('\\"', '"')))
        else:
            tokens.append((kind, val))
    tokens.append(("eof", None))
    return tokens


class _Node:
    pass


class _BoolOp(_Node):
    def __init__(self, op: str, parts: list[_Node]):
        self.op, self.parts = op, parts


class _Not(_Node):
    def __init__(self, part: _Node):
        self.part = part


class _Cmp(_Node):
    def __init__(self, op: str, left: tuple[str, Any], right: tuple[str, Any]):
        self.op, self.left, self.right = op, left, right


class _IsNull(_Node):
    def __init__(self, ident: str, negate: bool):
        self.ident, self.negate = ident, negate


class _In(_Node):
    def __init__(self, ident: str, values: list, negate: bool):
        self.ident, self.values, self.negate = ident, values, negate


class _Like(_Node):
    def __init__(self, ident: str, pattern: str, negate: bool):
        self.ident, self.pattern, self.negate = ident, pattern, negate


class _Between(_Node):
    def __init__(self, ident: str, lo, hi):
        self.ident, self.lo, self.hi = ident, lo, hi


class _Parser:
    def __init__(self, tokens: list[tuple[str, Any]]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> tuple[str, Any]:
        return self.tokens[self.i]

    def next(self) -> tuple[str, Any]:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def expect(self, kind: str) -> Any:
        tok = self.next()
        if tok[0] != kind:
            raise ValueError(f"Expected {kind}, got {tok}")
        return tok[1]

    def parse(self) -> _Node:
        node = self.parse_or()
        if self.peek()[0] != "eof":
            raise ValueError(f"Trailing tokens at {self.peek()}")
        return node

    def parse_or(self) -> _Node:
        parts = [self.parse_and()]
        while self.peek()[0] == "or":
            self.next()
            parts.append(self.parse_and())
        return parts[0] if len(parts) == 1 else _BoolOp("or", parts)

    def parse_and(self) -> _Node:
        parts = [self.parse_not()]
        while self.peek()[0] == "and":
            self.next()
            parts.append(self.parse_not())
        return parts[0] if len(parts) == 1 else _BoolOp("and", parts)

    def parse_not(self) -> _Node:
        if self.peek()[0] == "not":
            self.next()
            return _Not(self.parse_not())
        return self.parse_cmp()

    def parse_cmp(self) -> _Node:
        if self.peek()[0] == "lparen":
            self.next()
            node = self.parse_or()
            self.expect("rparen")
            return node
        left = self._operand()
        kind = self.peek()[0]
        negate = False
        if kind == "not":
            self.next()
            kind = self.peek()[0]
            if kind not in ("in", "like"):
                raise ValueError(f"Expected IN or LIKE after NOT, got {self.peek()}")
            negate = True
        if kind == "is":
            self.next()
            if self.peek()[0] == "not":
                self.next()
                negate = True
            self.expect("null")
            if left[0] != "ident":
                raise ValueError("IS NULL requires a column on the left")
            return _IsNull(left[1], negate)
        if kind == "in":
            self.next()
            self.expect("lparen")
            if left[0] != "ident":
                raise ValueError("IN requires a column on the left")
            values = [self._literal()]
            while self.peek()[0] != "rparen":
                if self.peek()[0] == "comma":
                    self.next()
                    continue
                values.append(self._literal())
            self.next()
            return _In(left[1], values, negate)
        if kind == "like":
            self.next()
            pat = self.next()
            if pat[0] != "string":
                raise ValueError("LIKE requires a string pattern")
            if left[0] != "ident":
                raise ValueError("LIKE requires a column on the left")
            return _Like(left[1], pat[1], negate)
        if kind == "between":
            self.next()
            lo = self._literal()
            self.expect("and")
            hi = self._literal()
            if left[0] != "ident":
                raise ValueError("BETWEEN requires a column on the left")
            return _Between(left[1], lo, hi)
        if kind != "op":
            raise ValueError(f"Expected comparison operator, got {self.peek()}")
        op = self.next()[1]
        right = self._operand()
        return _Cmp(op, left, right)

    def _literal(self):
        tok = self.next()
        if tok[0] in ("number", "string"):
            return tok[1]
        raise ValueError(f"Expected literal, got {tok}")

    def _operand(self) -> tuple[str, Any]:
        tok = self.next()
        if tok[0] in ("ident", "number", "string"):
            return tok
        if tok[0] in ("true", "false"):
            return ("bool", tok[0] == "true")
        if tok[0] == "null":
            return ("nullval", None)
        raise ValueError(f"Unexpected token {tok}")


_CMP_FNS = {
    "==": pc.equal,
    "=": pc.equal,
    "!=": pc.not_equal,
    "<>": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


def _resolve(operand: tuple[str, Any], table: pa.Table):
    kind, val = operand
    if kind == "ident":
        if val not in table.column_names:
            raise ValueError(f"Unknown column {val!r} in predicate")
        return table[val]
    return val  # python literal


def _coerce_literal(lit: Any, col_type: pa.DataType) -> pa.Scalar:
    """Cast a python literal to the column's Arrow type (Spark-style implicit
    cast: ``string_col == 2`` compares against "2")."""
    if pa.types.is_string(col_type) or pa.types.is_large_string(col_type):
        if isinstance(lit, float) and lit.is_integer():
            lit = int(lit)
        return pa.scalar(str(lit), col_type)
    return pa.scalar(lit).cast(col_type)


def _eval(node: _Node, table: pa.Table) -> pa.ChunkedArray:
    n = table.num_rows
    if isinstance(node, _BoolOp):
        parts = [_eval(p, table) for p in node.parts]
        # Kleene three-valued logic: true OR null == true, false AND null ==
        # false (SQL WHERE semantics; plain or_/and_ would propagate null and
        # drop rows SQL keeps).
        fn = pc.or_kleene if node.op == "or" else pc.and_kleene
        out = parts[0]
        for p in parts[1:]:
            out = fn(out, p)
        return out
    if isinstance(node, _Not):
        return pc.invert(_eval(node.part, table))
    if isinstance(node, _IsNull):
        arr = table[node.ident]
        return pc.is_valid(arr) if node.negate else pc.is_null(arr)
    if isinstance(node, _In):
        col = table[node.ident]
        vals = pa.array([_coerce_literal(v, col.type).as_py()
                         for v in node.values], col.type)
        # SQL three-valued logic: NULL [NOT] IN (...) is NULL. Keep the
        # null (is_in maps null → false, so re-null it) instead of coercing
        # to False here: an enclosing NOT must see NULL and keep it NULL —
        # eager False would resurrect null rows under "NOT x IN (...)".
        # The filter boundary drops nulls (Arrow filter default / flatten's
        # fill_null), matching SQL WHERE.
        res = pc.is_in(col, value_set=vals)
        res = pc.if_else(pc.is_valid(col), res, pa.scalar(None, pa.bool_()))
        return pc.invert(res) if node.negate else res
    if isinstance(node, _Like):
        col = table[node.ident]
        # match_like propagates nulls; keep them (same reasoning as _In)
        res = pc.match_like(col, node.pattern)
        return pc.invert(res) if node.negate else res
    if isinstance(node, _Between):
        col = table[node.ident]
        lo = _coerce_literal(node.lo, col.type)
        hi = _coerce_literal(node.hi, col.type)
        return pc.and_(pc.greater_equal(col, lo), pc.less_equal(col, hi))
    if isinstance(node, _Cmp):
        left = _resolve(node.left, table)
        right = _resolve(node.right, table)
        larr = isinstance(left, (pa.Array, pa.ChunkedArray))
        rarr = isinstance(right, (pa.Array, pa.ChunkedArray))
        if larr and not rarr and right is not None:
            right = _coerce_literal(right, left.type)
        elif rarr and not larr and left is not None:
            left = _coerce_literal(left, right.type)
        if not larr and not rarr:
            res = _CMP_FNS[node.op](pa.scalar(left), pa.scalar(right))
            return pa.chunked_array([pa.array([res.as_py()] * n, pa.bool_())])
        return _CMP_FNS[node.op](left, right)
    raise TypeError(f"Unknown node {node}")


def compile_predicate(text: str) -> Callable[[pa.Table], pa.ChunkedArray]:
    """Compile a predicate string to ``fn(table) -> boolean array``.

    Parsing happens once here; the returned closure does only vectorized
    pyarrow.compute work per batch. Null comparison results are treated as
    False by the caller (``Table.filter`` drops nulls), matching SQL WHERE.
    """
    node = _Parser(_tokenize(text)).parse()
    def evaluate(table: pa.Table) -> pa.ChunkedArray:
        return _eval(node, table)
    return evaluate


def filter_table(table: pa.Table, text: str) -> pa.Table:
    """One-shot helper: filter an Arrow table with the predicate grammar."""
    return table.filter(compile_predicate(text)(table))
