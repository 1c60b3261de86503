"""Solr function queries — the ``bf`` / ``boost`` expression language.

Solr's (e)dismax exposes per-document scoring functions over stored
numeric fields: ``bf=recip(doclen,1,1000,1000)`` adds the function's
value to every match's score, ``boost=sqrt(doclen)`` multiplies the
whole query score.  The reference hands the full Solr query surface
through to the server (``/root/reference/README.md:259-260``;
``solrindexer/search.py:125-140``), which includes these parameters —
this module implements the expression language natively so the engine
can apply them vectorized over dense numpy columns.

Supported grammar (a practical subset of Solr's FunctionQParser)::

    expr   := NUMBER | FIELD | NAME '(' expr (',' expr)* ')'

Functions (Solr semantics; Java float math via numpy float64):

    sum(a, b, ...)     product(a, b, ...)   sub(a, b)    div(a, b)
    pow(a, b)          abs(a)               sqrt(a)
    log(a)   [base 10] ln(a)                exp(a)
    max(a, b, ...)     min(a, b, ...)
    recip(x, m, a, b)  = a / (m*x + b)
    map(x, lo, hi, target [, default])  = target where lo<=x<=hi,
                                          else default (default: x)
    field(name)        = the field's value (bare names work too)
    geodist(latcol, loncol, pt_lat, pt_lon)  = haversine km to the point
        (Solr's geodist(sfield, lat, lon) with the point split across
        two numeric columns; missing coords evaluate as 0,0)
    ms(a [, b])        = epoch milliseconds (timestamps already evaluate
        as epoch ms) or the difference a - b; pass NOW as a literal

Missing numeric values evaluate as 0.0 (Solr's default for absent
numeric DocValues); timestamp fields evaluate as epoch milliseconds
(Solr ``ms()`` convention).  ``scale()``/``query()``/``ord()`` are not
implemented — they need global passes or nested queries; callers get a
clear error.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["parse_func", "func_fields", "eval_func", "FuncQueryError"]


class FuncQueryError(ValueError):
    pass


_TOKEN = re.compile(
    r"\s*(?:(?P<num>-?\d+\.?\d*(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_.]*)"
    r"|(?P<punct>[(),]))"
)

#: name -> (min_arity, max_arity or None for variadic)
_ARITY = {
    "sum": (2, None),
    "product": (2, None),
    "mul": (2, None),
    "sub": (2, 2),
    "div": (2, 2),
    "pow": (2, 2),
    "abs": (1, 1),
    "sqrt": (1, 1),
    "log": (1, 1),
    "ln": (1, 1),
    "exp": (1, 1),
    "max": (2, None),
    "min": (2, None),
    "recip": (4, 4),
    "map": (4, 5),
    "field": (1, 1),
    "geodist": (4, 4),
    "ms": (1, 2),
}

_UNSUPPORTED = {"scale", "query", "ord", "rord", "norm", "docfreq",
                "idf", "tf"}


def _tokenize(s: str) -> list:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise FuncQueryError(
                f"bad function-query syntax at {s[pos:pos + 12]!r}"
            )
        pos = m.end()
        if m.group("num") is not None:
            out.append(("num", float(m.group("num"))))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        else:
            out.append(("punct", m.group("punct")))
    return out


def parse_func(expr: str):
    """Parse one function-query expression into an AST of nested tuples:
    ``('num', v)`` | ``('field', name)`` | ``('call', fname, [args])``."""
    toks = _tokenize(expr)
    if not toks:
        raise FuncQueryError("empty function-query expression")
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def parse_expr():
        nonlocal pos
        kind, val = peek()
        if kind == "num":
            pos += 1
            return ("num", val)
        if kind == "name":
            pos += 1
            if peek() == ("punct", "("):
                name = val.lower()
                if name in _UNSUPPORTED:
                    raise FuncQueryError(
                        f"function {name!r} is not supported (needs a "
                        "global pass or nested query)"
                    )
                if name not in _ARITY:
                    raise FuncQueryError(f"unknown function {name!r}")
                pos += 1  # '('
                args = [parse_expr()]
                while peek() == ("punct", ","):
                    pos += 1
                    args.append(parse_expr())
                if peek() != ("punct", ")"):
                    raise FuncQueryError(f"expected ')' in {expr!r}")
                pos += 1
                lo, hi = _ARITY[name]
                if len(args) < lo or (hi is not None and len(args) > hi):
                    raise FuncQueryError(
                        f"{name}() takes {lo}"
                        f"{'+' if hi is None else f'..{hi}'} args, "
                        f"got {len(args)}"
                    )
                if name == "field":
                    if args[0][0] != "field":
                        raise FuncQueryError("field() takes a field name")
                    return args[0]
                if name == "mul":
                    name = "product"
                return ("call", name, args)
            return ("field", val)
        raise FuncQueryError(f"bad function-query syntax in {expr!r}")

    node = parse_expr()
    if pos != len(toks):
        raise FuncQueryError(f"trailing input in function query {expr!r}")
    return node


def func_fields(node) -> set:
    """Every field name the AST references."""
    kind = node[0]
    if kind == "field":
        return {node[1]}
    if kind == "call":
        out = set()
        for a in node[2]:
            out |= func_fields(a)
        return out
    return set()


def eval_func(node, cols) -> np.ndarray:
    """Evaluate an AST over dense per-field columns.

    ``cols`` maps field name -> float64 array (all the same length);
    returns a float64 array of that length.  Numeric edge cases keep
    Java semantics via numpy: ``div`` by zero -> ±inf, ``log`` of a
    non-positive value -> -inf/nan (suppressed warnings)."""
    kind = node[0]
    if kind == "num":
        n = len(next(iter(cols.values()))) if cols else 1
        return np.full(n, node[1], dtype=np.float64)
    if kind == "field":
        return cols[node[1]]
    name, args = node[1], node[2]
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        if name == "sum":
            out = eval_func(args[0], cols).copy()
            for a in args[1:]:
                out += eval_func(a, cols)
            return out
        if name == "product":
            out = eval_func(args[0], cols).copy()
            for a in args[1:]:
                out *= eval_func(a, cols)
            return out
        if name == "sub":
            return eval_func(args[0], cols) - eval_func(args[1], cols)
        if name == "div":
            return eval_func(args[0], cols) / eval_func(args[1], cols)
        if name == "pow":
            return np.power(eval_func(args[0], cols),
                            eval_func(args[1], cols))
        if name == "abs":
            return np.abs(eval_func(args[0], cols))
        if name == "sqrt":
            return np.sqrt(eval_func(args[0], cols))
        if name == "log":
            return np.log10(eval_func(args[0], cols))
        if name == "ln":
            return np.log(eval_func(args[0], cols))
        if name == "exp":
            return np.exp(eval_func(args[0], cols))
        if name == "max":
            out = eval_func(args[0], cols)
            for a in args[1:]:
                out = np.maximum(out, eval_func(a, cols))
            return out
        if name == "min":
            out = eval_func(args[0], cols)
            for a in args[1:]:
                out = np.minimum(out, eval_func(a, cols))
            return out
        if name == "recip":
            x = eval_func(args[0], cols)
            m = eval_func(args[1], cols)
            a = eval_func(args[2], cols)
            b = eval_func(args[3], cols)
            return a / (m * x + b)
        if name == "ms":
            # Solr ms(): epoch-millisecond value (1-arg) or difference
            # ms(a,b) = a - b; timestamp columns already evaluate as
            # epoch ms, so recip(ms(NOW_MS,mtime),m,a,b) recency boosts
            # work with NOW shipped as a literal (no wall-clock reads
            # inside the engine — determinism keeps oracles exact)
            a = eval_func(args[0], cols)
            if len(args) == 1:
                return a
            return a - eval_func(args[1], cols)
        if name == "geodist":
            # geodist(latcol, loncol, pt_lat, pt_lon) -> km (haversine,
            # Solr's mean earth radius).  Solr spells this
            # geodist(sfield, lat, lon) with one point-typed field; our
            # spatial points live in two numeric columns, hence 4 args.
            lat = eval_func(args[0], cols)
            lon = eval_func(args[1], cols)
            plat = eval_func(args[2], cols)
            plon = eval_func(args[3], cols)
            la1, la2 = np.radians(plat), np.radians(lat)
            h = (np.sin(np.radians(lat - plat) / 2.0) ** 2
                 + np.cos(la1) * np.cos(la2)
                 * np.sin(np.radians(lon - plon) / 2.0) ** 2)
            return (2.0 * 6371.0087714150598
                    * np.arcsin(np.sqrt(np.minimum(h, 1.0))))
        if name == "map":
            x = eval_func(args[0], cols)
            lo = eval_func(args[1], cols)
            hi = eval_func(args[2], cols)
            target = eval_func(args[3], cols)
            default = eval_func(args[4], cols) if len(args) > 4 else x
            return np.where((x >= lo) & (x <= hi), target, default)
    raise FuncQueryError(f"unknown function {name!r}")  # pragma: no cover
