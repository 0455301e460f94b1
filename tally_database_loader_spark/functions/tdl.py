"""TDL-expression-subset → Catalyst ``Column`` compiler.

The reference embeds a typed expression language in its YAML field specs
(reference tally-export-config.yaml throughout; compiled into TDL XML at
src/tally.mts:649-685). This module compiles the same surface into Column
expressions evaluated by Spark instead of by the Tally server:

Constructs covered (citations = representative reference usages):

- ``$Field`` / ``$A.B`` / ``$A[2].B``   field refs + indexed access
  (tally-export-config.yaml:296 ``$StateWiseDetails[First].RateDetails[3].GstRate``)
- ``..Field``                           parent-scope access in nested walks
  (tally-export-config.yaml:318,341,571; regex at src/tally.mts:660)
- ``if C then A else B``                conditionals (yaml:13)
- ``NOT e`` / ``e AND e`` / ``e OR e``  boolean ops (filters, yaml:404-406)
- ``$$IsEqual:a:b``                     equality (yaml:13)
- ``$$IsEmpty:$x``                      emptiness (yaml:280-281)
- ``$$SysName:Primary``                 system-name literal (yaml:13)
- ``$$FullList:Path:$Field``            flatten-join of a nested list (yaml:65)
- ``$$StringFindAndReplace:$x:"a":"b"`` literal replace (yaml:222)
- ``$$IsDebit:$x`` / ``$$NumValue:$x``  sign helpers (src/tally.mts:669-670)
- ``$$IsInwards:$x``                    inward/outward sign (src/tally.mts:671-672)
- ``$$Number:$x``                       leading-numeric extraction ("5 nos" → 5)
- ``"literal"`` / bare numbers

Source-value conventions (how raw Tally XML dumps model into a nested
DataFrame): amounts carry Tally's raw sign (debit negative), so
``$$IsDebit:$x ≡ x < 0`` and ``$$NumValue:$x ≡ abs(x)``; quantities carry
inward positive, so ``$$IsInwards:$x ≡ x > 0``; quantity-with-unit strings
("5 nos") yield their leading numeral under ``$$Number``.

Anything outside the subset is declared ``type: custom`` in the spec and
passes through ``F.expr`` verbatim (reference behavior: the custom type
injects the expression string untranslated, src/tally.mts:675-679).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

Resolver = Callable[[str, bool], Column]
# resolve(field_path, parent_scope) -> Column for the current nesting level

_TOKEN = re.compile(r"""
    \s*(
        "(?:[^"\\]|\\.)*"      |   # string literal
        \$\$[A-Za-z_][\w]*     |   # $$Function
        \.\.[A-Za-z_][\w.\[\]]* |  # ..ParentField
        \$[A-Za-z_][\w.\[\]]*  |   # $Field / $A.B[2].C
        -?\d+(?:\.\d+)?        |   # number
        [A-Za-z_][\w]*         |   # bare word (if/then/else/NOT/AND/OR/SysName arg)
        :                      |
        [()<>=!]+
    )""", re.VERBOSE)


def tokenize(src: str) -> list[str]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            raise ValueError(f"TDL tokenize error at {src[pos:pos+20]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


class TdlCompiler:
    """Recursive-descent compiler; ``resolve`` maps field paths to Columns
    (supplied by the flatten operator, which knows the nesting context)."""

    def __init__(self, resolve: Resolver):
        self.resolve = resolve

    def compile(self, src: str) -> Column:
        self.toks = tokenize(src)
        self.pos = 0
        col = self._expr()
        if self.pos != len(self.toks):
            raise ValueError(f"trailing tokens in TDL expr: {self.toks[self.pos:]}")
        return col

    # --- grammar ---------------------------------------------------------

    def _peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def _next(self) -> str:
        tok = self.toks[self.pos]
        self.pos += 1
        return tok

    def _expect(self, tok: str) -> None:
        got = self._next()
        if got != tok:
            raise ValueError(f"expected {tok!r}, got {got!r}")

    def _expr(self) -> Column:
        if self._peek() == "if":
            self._next()
            cond = self._expr()
            self._expect("then")
            then = self._expr()
            self._expect("else")
            other = self._expr()
            return F.when(cond, then).otherwise(other)
        return self._or()

    def _or(self) -> Column:
        left = self._and()
        while self._peek() == "OR":
            self._next()
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._not()
        while self._peek() == "AND":
            self._next()
            left = left & self._not()
        return left

    def _not(self) -> Column:
        if self._peek() == "NOT":
            self._next()
            return ~self._to_bool(self._not())
        return self._primary()

    @staticmethod
    def _to_bool(c: Column) -> Column:
        return c.cast("boolean")

    def _args(self, n: int) -> list[Column]:
        out = []
        for _ in range(n):
            self._expect(":")
            out.append(self._primary())
        return out

    def _raw_arg(self) -> str:
        """Consume ``:token`` returning the raw token (for name-like args)."""
        self._expect(":")
        return self._next()

    def _primary(self) -> Column:
        tok = self._next()
        if tok.startswith('"'):
            return F.lit(tok[1:-1].replace('\\"', '"'))
        if re.fullmatch(r"-?\d+(\.\d+)?", tok):
            return F.lit(float(tok) if "." in tok else int(tok))
        if tok.startswith("$$"):
            return self._function(tok[2:])
        if tok.startswith(".."):
            return self.resolve(tok[2:], True)
        if tok.startswith("$"):
            return self.resolve(tok[1:], False)
        raise ValueError(f"unexpected TDL token {tok!r}")

    def _function(self, name: str) -> Column:
        if name == "IsEqual":
            a, b = self._args(2)
            return a == b
        if name == "IsEmpty":
            (a,) = self._args(1)
            return a.isNull() | (a.cast("string") == "")
        if name == "SysName":
            word = self._raw_arg()
            # system names resolve to their literal text ('' for Primary
            # roots is applied by the callers' if-expressions)
            return F.lit(word)
        if name == "FullList":
            path = self._raw_arg()
            self._expect(":")
            field = self._next()
            if not field.startswith("$"):
                raise ValueError("FullList needs a $Field second arg")
            arr = self.resolve(path, False)
            # join the nested collection's field values with ', ' — the
            # reference flattens multi-line addresses this way (yaml:65)
            return F.array_join(
                F.transform(arr, lambda s: s.getField(field[1:]).cast("string")), ", ")
        if name == "StringFindAndReplace":
            a, find, repl = self._args(3)
            return F.replace(a.cast("string"), find, repl)
        if name == "IsDebit":
            (a,) = self._args(1)
            return a.cast("double") < 0
        if name == "NumValue":
            (a,) = self._args(1)
            return F.abs(a.cast("double"))
        if name == "IsInwards":
            (a,) = self._args(1)
            return a.cast("double") > 0
        if name == "Number":
            (a,) = self._args(1)
            return F.regexp_extract(a.cast("string"), r"^(-?\d+(?:\.\d+)?)", 1)
        raise ValueError(f"unsupported TDL function $${name} — declare the "
                         f"field as type custom to pass Spark SQL through")


def make_struct_resolver(scopes: list[dict[str, str]]) -> Resolver:
    """Resolver over a stack of nesting scopes (outermost first, innermost
    last), each mapping field names to flat column refs.

    Lookup walks the context chain the way TDL does: ``$X`` starts at the
    innermost scope, ``..X`` at the enclosing one; both fall outward until
    a scope defines the name (so ``..Guid`` inside a 3-deep walk reaches
    the root Voucher). Paths with dots/indexes (``A.B[2].C``) descend
    through struct/array fields from the resolved head; ``[First]`` maps
    to index 0 (reference yaml:296 semantics)."""

    def resolve(path: str, parent: bool) -> Column:
        parts = re.findall(r"[A-Za-z_]\w*(?:\[\w+\])?", path)
        head = parts[0]
        head_name = re.match(r"[A-Za-z_]\w*", head).group(0)
        start = len(scopes) - (2 if parent else 1)
        col = None
        for i in range(start, -1, -1):
            if head_name in scopes[i]:
                col = F.col(scopes[i][head_name])
                break
        if col is None:
            raise KeyError(f"unknown field {head_name!r} in any enclosing "
                           f"scope ({'parent' if parent else 'current'} lookup)")
        col = _apply_index(col, head)
        for part in parts[1:]:
            name = re.match(r"[A-Za-z_]\w*", part).group(0)
            col = col.getField(name)
            col = _apply_index(col, part)
        return col

    def _apply_index(col: Column, part: str) -> Column:
        m = re.search(r"\[(\w+)\]", part)
        if not m:
            return col
        idx = m.group(1)
        return col.getItem(0 if idx.lower() == "first" else int(idx) - 1)

    return resolve
