"""Solr Parallel SQL handler analogue (``/sql``): a SQL subset compiled
onto the engine's streaming machinery.

Solr's /sql handler parses SQL with Apache Calcite and rewrites it to a
STREAMING EXPRESSION executed by the /stream handler (search() exports,
rollup()/facet() aggregation, sort/limit) — this module is the same
two-stage design: :func:`parse_sql` produces a :class:`SelectStmt`,
:func:`execute_sql` lowers it onto the ``pipelines.streaming`` search
source (broadcast-match-mask /export shape — streams at corpus scale)
plus Ray Data ``groupby().aggregate`` / ``sort`` / ``limit``.  The
reference exposes Solr search through opaque params
(/root/reference/solrindexer/search.py:125-140); /sql is part of the
Solr surface its users reach the same way.

Supported subset (the core of Solr /sql's documented surface):

    SELECT [DISTINCT] <field[, ...] | agg(field)[ AS alias][, ...]>
    FROM <collection>
    [WHERE <pred> [AND <pred>]...]
    [GROUP BY f1[, f2 ...]]
    [HAVING <agg cmp number> [AND ...]]
    [ORDER BY key [ASC|DESC][, ...]]
    [LIMIT n [OFFSET m]]

Predicates: ``f = v`` / ``f <> v`` / ``f != v`` (equality on stored
fields; on the default text field ``=`` is a full-text query, Solr
semantics), ``f > v`` / ``>=`` / ``<`` / ``<=`` (ranges, exclusive
bounds via Lucene ``{}``), ``f BETWEEN a AND b``, ``f IN (v1, v2, ...)``.
Aggregates: ``count(*)``, ``count(f)``, ``sum``, ``min``, ``max``,
``avg``.  WHERE conjunctions lower to the engine's fq strings; the text
predicate becomes the scored ``q`` (empty = match-all, like ``*:*``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa

#: column names whose ``=`` predicate means a full-text query on the
#: default analyzed field (Solr: the field backing the search body)
TEXT_FIELDS = ("content", "text", "full_text", "_text_")

AGG_FUNCS = ("count", "sum", "min", "max", "avg")


class SqlError(ValueError):
    pass


_SQL_TOKEN = re.compile(
    r"\s*(?:(?P<str>'(?:[^']|'')*')"
    r"|(?P<num>-?\d+\.?\d*([eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_.]*|\*)"
    r"|(?P<op><>|!=|>=|<=|=|<|>)"
    r"|(?P<punct>[(),]))"
)


def _tokenize(sql: str) -> list:
    out, pos = [], 0
    s = sql.strip().rstrip(";")
    while pos < len(s):
        if s[pos:].strip() == "":
            break
        m = _SQL_TOKEN.match(s, pos)
        if m is None:
            raise SqlError(f"bad SQL syntax at {s[pos:pos + 24]!r}")
        pos = m.end()
        if m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("ident") is not None:
            out.append(("ident", m.group("ident")))
        elif m.group("op") is not None:
            out.append(("op", m.group("op")))
        else:
            out.append(("punct", m.group("punct")))
    return out


@dataclass
class SelectItem:
    func: str | None      # None = bare column; else an AGG_FUNCS name
    arg: str              # column name or "*"
    alias: str | None

    @property
    def out_name(self) -> str:
        if self.alias:
            return self.alias
        return self.arg if self.func is None else f"{self.func}({self.arg})"


@dataclass
class Pred:
    field: str
    op: str               # = <> > >= < <= in between
    value: object         # str | float | list


@dataclass
class SelectStmt:
    items: list
    collection: str
    where: list = dc_field(default_factory=list)
    group_by: list = dc_field(default_factory=list)
    having: list = dc_field(default_factory=list)   # (name, op, number)
    order_by: list = dc_field(default_factory=list)  # (name, asc)
    limit: int | None = None
    offset: int = 0
    distinct: bool = False


def parse_sql(sql: str) -> SelectStmt:
    toks = _tokenize(sql)
    pos = 0

    def peek(off=0):
        i = pos + off
        return toks[i] if i < len(toks) else (None, None)

    def kw(word) -> bool:
        kind, val = peek()
        return kind == "ident" and val.upper() == word

    def expect_kw(word):
        nonlocal pos
        if not kw(word):
            raise SqlError(f"expected {word}, got {peek()[1]!r}")
        pos += 1

    def take_ident() -> str:
        nonlocal pos
        kind, val = peek()
        if kind != "ident":
            raise SqlError(f"expected identifier, got {val!r}")
        pos += 1
        return val

    def take_value():
        nonlocal pos
        kind, val = peek()
        if kind == "str":
            pos += 1
            return val
        if kind == "num":
            pos += 1
            return float(val) if "." in val or "e" in val.lower() \
                else int(val)
        raise SqlError(f"expected a literal, got {val!r}")

    # ---- SELECT list --------------------------------------------------
    expect_kw("SELECT")
    distinct = False
    if kw("DISTINCT"):
        pos += 1
        distinct = True
    items = []
    while True:
        kind, val = peek()
        if kind != "ident":
            raise SqlError(f"expected select item, got {val!r}")
        if val.lower() in AGG_FUNCS and peek(1) == ("punct", "("):
            func = val.lower()
            pos += 2
            arg = take_ident()
            if peek() != ("punct", ")"):
                raise SqlError(f"expected ')' after {func}(")
            pos += 1
            if func != "count" and arg == "*":
                raise SqlError(f"{func}(*) is not valid SQL")
        else:
            func, arg = None, take_ident()
            pos += 0
        alias = None
        if kw("AS"):
            pos += 1
            alias = take_ident()
        items.append(SelectItem(func, arg, alias))
        if peek() == ("punct", ","):
            pos += 1
            continue
        break

    # ---- FROM ----------------------------------------------------------
    expect_kw("FROM")
    collection = take_ident()

    stmt = SelectStmt(items=items, collection=collection,
                      distinct=distinct)

    # ---- WHERE ----------------------------------------------------------
    if kw("WHERE"):
        pos += 1
        while True:
            fld = take_ident()
            kind, val = peek()
            if kind == "op":
                pos += 1
                stmt.where.append(Pred(fld, val, take_value()))
            elif kind == "ident" and val.upper() == "BETWEEN":
                pos += 1
                lo = take_value()
                expect_kw("AND")
                hi = take_value()
                stmt.where.append(Pred(fld, "between", [lo, hi]))
            elif kind == "ident" and val.upper() == "IN":
                pos += 1
                if peek() != ("punct", "("):
                    raise SqlError("expected '(' after IN")
                pos += 1
                vals = [take_value()]
                while peek() == ("punct", ","):
                    pos += 1
                    vals.append(take_value())
                if peek() != ("punct", ")"):
                    raise SqlError("expected ')' closing IN list")
                pos += 1
                stmt.where.append(Pred(fld, "in", vals))
            else:
                raise SqlError(f"expected predicate operator after "
                               f"{fld!r}, got {val!r}")
            if kw("AND"):
                pos += 1
                continue
            if kw("OR"):
                raise SqlError("only AND conjunctions are supported "
                               "(use IN for per-field disjunction)")
            break

    # ---- GROUP BY -------------------------------------------------------
    if kw("GROUP"):
        pos += 1
        expect_kw("BY")
        stmt.group_by.append(take_ident())
        while peek() == ("punct", ","):
            pos += 1
            stmt.group_by.append(take_ident())

    # ---- HAVING ----------------------------------------------------------
    if kw("HAVING"):
        pos += 1
        while True:
            kind, val = peek()
            if (kind == "ident" and val.lower() in AGG_FUNCS
                    and peek(1) == ("punct", "(")):
                func = val.lower()
                pos += 2
                arg = take_ident()
                if peek() != ("punct", ")"):
                    raise SqlError(f"expected ')' after {func}(")
                pos += 1
                name = f"{func}({arg})"
            else:
                name = take_ident()
            kind, op = peek()
            if kind != "op":
                raise SqlError(f"expected comparison in HAVING, got {op!r}")
            pos += 1
            stmt.having.append((name, op, take_value()))
            if kw("AND"):
                pos += 1
                continue
            break

    # ---- ORDER BY ---------------------------------------------------------
    if kw("ORDER"):
        pos += 1
        expect_kw("BY")
        while True:
            kind, val = peek()
            if (kind == "ident" and val.lower() in AGG_FUNCS
                    and peek(1) == ("punct", "(")):
                func = val.lower()
                pos += 2
                arg = take_ident()
                if peek() != ("punct", ")"):
                    raise SqlError(f"expected ')' after {func}(")
                pos += 1
                key = f"{func}({arg})"
            else:
                key = take_ident()
            asc = True
            if kw("ASC"):
                pos += 1
            elif kw("DESC"):
                pos += 1
                asc = False
            stmt.order_by.append((key, asc))
            if peek() == ("punct", ","):
                pos += 1
                continue
            break

    # ---- LIMIT ----------------------------------------------------------
    if kw("LIMIT"):
        pos += 1
        kind, val = peek()
        if kind != "num":
            raise SqlError(f"expected a number after LIMIT, got {val!r}")
        pos += 1
        stmt.limit = int(float(val))
        if kw("OFFSET"):
            pos += 1
            kind, val = peek()
            if kind != "num":
                raise SqlError(
                    f"expected a number after OFFSET, got {val!r}")
            pos += 1
            stmt.offset = int(float(val))

    if pos != len(toks):
        raise SqlError(f"trailing input after statement: "
                       f"{toks[pos][1]!r}")
    _validate(stmt)
    return stmt


def _validate(stmt: SelectStmt) -> None:
    has_agg = any(it.func for it in stmt.items)
    bare = [it for it in stmt.items if it.func is None]
    if stmt.group_by:
        if not has_agg:
            raise SqlError("GROUP BY requires at least one aggregate")
        extra = [it.arg for it in bare if it.arg not in stmt.group_by]
        if extra:
            raise SqlError(
                f"non-aggregated columns {extra} not in GROUP BY")
    elif has_agg and bare:
        raise SqlError("cannot mix bare columns and aggregates "
                       "without GROUP BY")
    if stmt.having and not has_agg:
        raise SqlError("HAVING requires aggregates")
    if stmt.distinct:
        if has_agg:
            raise SqlError("DISTINCT applies to plain projections")
        sel = {it.out_name for it in stmt.items} \
            | {it.arg for it in stmt.items}
        bad = [k for k, _ in stmt.order_by if k not in sel]
        if bad:
            raise SqlError(
                f"ORDER BY columns {bad} must appear in a DISTINCT "
                "select list")


# --------------------------------------------------------------------- #
# lowering: WHERE -> (q, fq)
# --------------------------------------------------------------------- #
def _fq_literal(v) -> str:
    if isinstance(v, str):
        if '"' in v:
            raise SqlError(
                "string literals containing double quotes are not "
                f"supported in predicates: {v!r}")
        # quote anything beyond plain word chars so the engine's query
        # parser can't misread it (slashes read as regex, etc.)
        return v if re.fullmatch(r"[\w.-]+", v) else f'"{v}"'
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def where_to_query(preds: list) -> tuple[str, list]:
    """Lower WHERE conjunctions to the engine's ``(q, fq)``: text-field
    equality becomes the scored main query (Solr /sql semantics),
    everything else a filter-query string."""
    q_parts, fqs = [], []
    for p in preds:
        if p.field in TEXT_FIELDS:
            if p.op != "=" or not isinstance(p.value, str):
                raise SqlError(
                    f"text field {p.field!r} supports only = 'query'")
            q_parts.append(p.value)
            continue
        if p.op == "=":
            fqs.append(f"{p.field}:{_fq_literal(p.value)}")
        elif p.op in ("<>", "!="):
            fqs.append(f"-{p.field}:{_fq_literal(p.value)}")
        elif p.op == ">":
            fqs.append(f"{p.field}:{{{_fq_literal(p.value)} TO *]")
        elif p.op == ">=":
            fqs.append(f"{p.field}:[{_fq_literal(p.value)} TO *]")
        elif p.op == "<":
            fqs.append(f"{p.field}:[* TO {_fq_literal(p.value)}}}")
        elif p.op == "<=":
            fqs.append(f"{p.field}:[* TO {_fq_literal(p.value)}]")
        elif p.op == "between":
            lo, hi = p.value
            fqs.append(
                f"{p.field}:[{_fq_literal(lo)} TO {_fq_literal(hi)}]")
        elif p.op == "in":
            ors = " OR ".join(
                f"{p.field}:{_fq_literal(v)}" for v in p.value)
            fqs.append(f"({ors})")
        else:  # pragma: no cover - parser emits only the ops above
            raise SqlError(f"unsupported predicate op {p.op!r}")
    if len(q_parts) > 1:
        # ANDed text predicates must intersect (SQL semantics); a single
        # free query string keeps the engine's default-OR behavior
        # (Solr /sql passes the search body through verbatim)
        return " AND ".join(f"({p})" for p in q_parts), fqs
    return (q_parts[0] if q_parts else ""), fqs


_CMP = {
    "=": lambda a, b: a == b, "<>": lambda a, b: a != b,
    "!=": lambda a, b: a != b, ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b, "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


# --------------------------------------------------------------------- #
# execution
# --------------------------------------------------------------------- #
def execute_sql(sql: str, collections, num_partitions: int = 8):
    """Run a /sql statement; returns a Ray Dataset (lazy where the plan
    allows).  ``collections``: name -> index dir (or one dir for any
    name), same contract as the /stream compiler."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    from solr_indexer_ray.pipelines.streaming import (
        Node,
        StreamCompiler,
    )

    stmt = parse_sql(sql)
    q, fqs = where_to_query(stmt.where)
    compiler = StreamCompiler(collections, num_partitions=num_partitions)

    if any(it.func is None and it.arg == "*" for it in stmt.items):
        # SELECT *: expand to the collection's stored fields (Solr /sql
        # returns all stored fields)
        from solr_indexer_ray.pipelines.search import SearchEngine

        eng = SearchEngine(compiler._index_dir(stmt.collection))
        star = [SelectItem(None, f, None) for f in eng.stored_fields]
        stmt.items = [
            x for it in stmt.items
            for x in (star if it.func is None and it.arg == "*"
                      else [it])
        ]

    aggs_items = [it for it in stmt.items if it.func is not None]
    # select-list alias -> source column (for ORDER BY resolution on
    # plain projections; aggregate aliases resolve via canon_names)
    alias_src = {it.alias: it.arg for it in stmt.items
                 if it.alias and it.func is None}

    def _src_key(k: str) -> str:
        return alias_src.get(k, k)

    # columns the source export must carry
    need_cols = sorted(
        {it.arg for it in stmt.items if it.func is None}
        | {it.arg for it in aggs_items if it.arg != "*"}
        | set(stmt.group_by)
        | ({_src_key(k) for k, _ in stmt.order_by}
           if not aggs_items else set())
    )
    search_kwargs = {
        "q": q,
        "fl": ",".join(["doc_id",
                        *[c for c in need_cols if c != "doc_id"]]),
    }
    if fqs:
        search_kwargs["fq"] = fqs
    src = Node("search", [stmt.collection], search_kwargs)

    if not aggs_items:
        # plain projection: /export stream + sort + limit
        if stmt.order_by and not stmt.distinct:
            search_kwargs["sort"] = ", ".join(
                f"{_src_key(k)} {'asc' if asc else 'desc'}"
                for k, asc in stmt.order_by
            )
        elif stmt.limit is not None and not stmt.order_by \
                and not stmt.distinct:
            # no ORDER BY: Solr /sql's LIMIT path ranks by score
            search_kwargs["rows"] = stmt.limit + stmt.offset
        ds = compiler.compile(src)
        out_cols = [it.out_name for it in stmt.items]
        sel_cols = [it.arg for it in stmt.items]
        ds = ds.select_columns(sel_cols)
        if sel_cols != out_cols:
            ds = _rename(ds, dict(zip(sel_cols, out_cols)))
        if stmt.distinct:
            # distributed row dedup: groupby the full select list (the
            # unique() stream shape), then re-apply ORDER BY — the
            # dedup shuffle does not preserve the export order.  Sort
            # keys resolve to OUTPUT names (the rename already ran).
            src_to_out = dict(zip(sel_cols, out_cols))
            key = out_cols[0] if len(out_cols) == 1 else out_cols
            ds = (ds.groupby(key)
                    .aggregate(Count(on=out_cols[0], alias_name="__c"))
                    .select_columns(out_cols))
            if stmt.order_by:
                keys = [k if k in out_cols else src_to_out.get(k, k)
                        for k, _ in stmt.order_by]
                ds = ds.sort(keys,
                             descending=[not asc
                                         for _, asc in stmt.order_by])
        return _page(ds, stmt)

    # aggregation: groupby (or global) over the streamed export
    ds = compiler.compile(src)
    ray_aggs, canon_names = [], {}
    for it in aggs_items:
        canon = f"{it.func}({it.arg})"
        if it.func == "count":
            # count(*) counts rows (doc_id is never null); count(f)
            # counts non-null f — SQL semantics.  An on= column is
            # also what makes the global (non-grouped) aggregate
            # reliable across block shapes.
            ray_aggs.append(Count(
                on="doc_id" if it.arg == "*" else it.arg,
                ignore_nulls=it.arg != "*", alias_name=canon,
            ))
        elif it.func == "sum":
            ray_aggs.append(Sum(it.arg, alias_name=canon))
        elif it.func == "min":
            ray_aggs.append(Min(it.arg, alias_name=canon))
        elif it.func == "max":
            ray_aggs.append(Max(it.arg, alias_name=canon))
        else:
            ray_aggs.append(Mean(it.arg, alias_name=canon))
        canon_names[canon] = it.out_name
    if stmt.group_by:
        agg_ds = ds.groupby(
            stmt.group_by[0] if len(stmt.group_by) == 1
            else stmt.group_by
        ).aggregate(*ray_aggs)
    else:
        row = ds.aggregate(*ray_aggs)  # driver scalar — one tuple
        import ray.data as rd

        agg_ds = rd.from_items([dict(row)])

    # HAVING: filter on canonical or aliased aggregate names
    alias_to_canon = {v: k for k, v in canon_names.items()}
    for name, op, num in stmt.having:
        col = name if name in canon_names else alias_to_canon.get(name)
        if col is None:
            raise SqlError(f"HAVING references unknown aggregate {name!r}")
        cmp = _CMP[op]
        agg_ds = agg_ds.filter(
            lambda r, _c=col, _f=cmp, _n=num: r[_c] is not None
            and _f(r[_c], _n)
        )

    # ORDER BY: aliases resolve to canonical aggregate columns
    if stmt.order_by:
        keys, desc = [], []
        for kname, asc in stmt.order_by:
            col = (kname if kname in set(stmt.group_by) | set(canon_names)
                   else alias_to_canon.get(kname))
            if col is None:
                raise SqlError(f"ORDER BY references unknown column "
                               f"{kname!r}")
            keys.append(col)
            desc.append(not asc)
        agg_ds = agg_ds.sort(keys, descending=desc)

    # final projection: SELECT order, aliases applied
    out_names = [it.out_name for it in stmt.items]
    src_names = [it.arg if it.func is None else f"{it.func}({it.arg})"
                 for it in stmt.items]
    agg_ds = agg_ds.select_columns(src_names)
    if src_names != out_names:
        agg_ds = _rename(agg_ds, dict(zip(src_names, out_names)))
    return _page(agg_ds, stmt)


def _page(ds, stmt: SelectStmt):
    """Apply LIMIT/OFFSET.  OFFSET materializes offset+limit rows on the
    driver — the page, which is exactly Solr deep-paging's cost."""
    if stmt.limit is None:
        return ds
    if not stmt.offset:
        return ds.limit(stmt.limit)
    import ray.data as rd

    rows = ds.limit(stmt.offset + stmt.limit).take_all()
    return rd.from_items(rows[stmt.offset:])


def _rename(ds, mapping: dict):
    def ren(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names]
        )

    return ds.map_batches(ren, batch_format="pyarrow")


def sql_to_table(sql: str, collections, num_partitions: int = 8) -> pa.Table:
    """``execute_sql`` materialized to one Arrow table (CLI/contract
    helper; results are LIMIT-bounded or aggregate-small by contract)."""
    ds = execute_sql(sql, collections, num_partitions=num_partitions)
    rows = ds.take_all()
    if not rows:
        return pa.table({})
    cols = list(rows[0].keys())
    return pa.table(
        {c: [r.get(c) for r in rows] for c in cols}
    )


__all__ = [
    "SqlError",
    "SelectStmt",
    "parse_sql",
    "where_to_query",
    "execute_sql",
    "sql_to_table",
]
