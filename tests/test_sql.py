"""Solr Parallel SQL handler analogue (pipelines/sql.py): parser,
WHERE lowering, and every statement shape vs pandas ground truth over
the session index."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from solr_indexer_ray.pipelines.search import SearchEngine
from solr_indexer_ray.pipelines.sql import (
    SqlError,
    parse_sql,
    sql_to_table,
    where_to_query,
)


class TestParser:
    def test_full_statement(self):
        s = parse_sql(
            "SELECT lang, count(*) AS n, avg(doclen) FROM docs "
            "WHERE content = 'spark fire' AND doclen >= 10 "
            "GROUP BY lang HAVING count(*) > 2 AND n <= 100 "
            "ORDER BY n DESC, lang ASC LIMIT 7;"
        )
        assert [it.out_name for it in s.items] == [
            "lang", "n", "avg(doclen)"]
        assert s.collection == "docs"
        assert [(p.field, p.op, p.value) for p in s.where] == [
            ("content", "=", "spark fire"), ("doclen", ">=", 10)]
        assert s.group_by == ["lang"]
        assert s.having == [("count(*)", ">", 2), ("n", "<=", 100)]
        assert s.order_by == [("n", False), ("lang", True)]
        assert s.limit == 7

    def test_between_and_in(self):
        s = parse_sql(
            "SELECT doc_id FROM c WHERE doclen BETWEEN 5 AND 9 "
            "AND lang IN ('en', 'de')"
        )
        assert s.where[0].op == "between"
        assert s.where[0].value == [5, 9]
        assert s.where[1].op == "in"
        assert s.where[1].value == ["en", "de"]

    def test_quoted_literal_escapes(self):
        s = parse_sql("SELECT a FROM c WHERE b = 'it''s'")
        assert s.where[0].value == "it's"

    def test_errors(self):
        with pytest.raises(SqlError, match="GROUP BY requires"):
            parse_sql("SELECT lang FROM c GROUP BY lang")
        with pytest.raises(SqlError, match="not in GROUP BY"):
            parse_sql("SELECT path, count(*) FROM c GROUP BY lang")
        with pytest.raises(SqlError, match="mix bare columns"):
            parse_sql("SELECT lang, count(*) FROM c")
        with pytest.raises(SqlError, match="only AND"):
            parse_sql("SELECT a FROM c WHERE a = 1 OR b = 2")
        with pytest.raises(SqlError, match="bad SQL syntax"):
            parse_sql("SELECT a FROM c WHERE a ~ 1")
        with pytest.raises(SqlError, match="HAVING requires"):
            parse_sql("SELECT a FROM c HAVING count(*) > 1")
        with pytest.raises(SqlError, match="trailing"):
            parse_sql("SELECT a FROM c LIMIT 5 WAT")

    def test_where_lowering(self):
        q, fqs = where_to_query(parse_sql(
            "SELECT doc_id FROM c WHERE content = 'a b' AND lang = 'en' "
            "AND doclen > 3 AND doclen <= 9 AND repo <> 'x/y' "
            "AND lang IN ('en', 'de')"
        ).where)
        assert q == "a b"
        assert fqs == [
            "lang:en", "doclen:{3 TO *]", "doclen:[* TO 9]",
            '-repo:"x/y"', "(lang:en OR lang:de)",
        ]


@pytest.fixture(scope="module")
def sql_env(built_index, small_corpus_path):
    idx, _ = built_index
    df = pq.read_table(small_corpus_path).to_pandas()
    df["doc_id"] = np.arange(len(df))
    eng = SearchEngine(idx)
    # doclen from the engine's stored docs table (authoritative)
    dl = eng._docs_ds.to_table(columns=["doc_id", "doclen"]).to_pandas()
    df = df.merge(dl, on="doc_id")
    return {"docs": idx}, df, eng


class TestExecution:
    def test_projection_order_limit(self, sql_env):
        colls, df, eng = sql_env
        t = sql_to_table(
            "SELECT doc_id, lang, doclen FROM docs WHERE lang = 'go' "
            "AND doclen >= 40 ORDER BY doclen DESC, doc_id ASC LIMIT 5",
            colls,
        )
        exp = (
            df[(df.lang == "go") & (df.doclen >= 40)]
            .sort_values(["doclen", "doc_id"], ascending=[False, True])
            .head(5)
        )
        assert t["doc_id"].to_pylist() == exp["doc_id"].tolist()
        assert t.column_names == ["doc_id", "lang", "doclen"]

    def test_text_query_where(self, sql_env):
        colls, df, eng = sql_env
        t = sql_to_table(
            "SELECT doc_id FROM docs WHERE content = 'def read' "
            "AND lang = 'python' ORDER BY doc_id ASC",
            colls,
        )
        ids = set(eng.match_ids("def read").tolist())
        exp = sorted(
            ids & set(df[df.lang == "python"]["doc_id"].tolist())
        )
        assert t["doc_id"].to_pylist() == exp

    def test_group_agg_having(self, sql_env):
        colls, df, eng = sql_env
        t = sql_to_table(
            "SELECT lang, count(*) AS n, sum(doclen) AS s, "
            "avg(doclen) AS a, min(doclen) AS lo, max(doclen) AS hi "
            "FROM docs WHERE doclen > 10 GROUP BY lang "
            "HAVING count(*) >= 3 ORDER BY n DESC, lang ASC",
            colls,
        )
        g = (
            df[df.doclen > 10].groupby("lang")["doclen"]
            .agg(n="count", s="sum", a="mean", lo="min", hi="max")
            .reset_index()
        )
        g = g[g.n >= 3].sort_values(["n", "lang"],
                                    ascending=[False, True])
        assert t["lang"].to_pylist() == g["lang"].tolist()
        assert t["n"].to_pylist() == g["n"].tolist()
        assert t["s"].to_pylist() == g["s"].tolist()
        assert t["a"].to_pylist() == pytest.approx(g["a"].tolist())
        assert t.column_names == ["lang", "n", "s", "a", "lo", "hi"]

    def test_global_aggregates(self, sql_env):
        colls, df, eng = sql_env
        t = sql_to_table(
            "SELECT count(*) AS n, max(doclen) AS mx FROM docs "
            "WHERE lang IN ('go', 'java')",
            colls,
        )
        sub = df[df.lang.isin(["go", "java"])]
        assert t.to_pylist() == [
            {"n": len(sub), "mx": int(sub.doclen.max())}]

    def test_multi_key_group_by(self, sql_env):
        colls, df, eng = sql_env
        t = sql_to_table(
            "SELECT repo, lang, count(*) AS n FROM docs "
            "GROUP BY repo, lang ORDER BY n DESC, repo ASC, lang ASC "
            "LIMIT 6",
            colls,
        )
        g = (
            df.groupby(["repo", "lang"]).size().reset_index(name="n")
            .sort_values(["n", "repo", "lang"],
                         ascending=[False, True, True]).head(6)
        )
        assert t["repo"].to_pylist() == g["repo"].tolist()
        assert t["n"].to_pylist() == g["n"].tolist()

    def test_between(self, sql_env):
        colls, df, eng = sql_env
        t = sql_to_table(
            "SELECT count(*) AS n FROM docs "
            "WHERE doclen BETWEEN 20 AND 60",
            colls,
        )
        exp = int(((df.doclen >= 20) & (df.doclen <= 60)).sum())
        assert t["n"].to_pylist() == [exp]

    def test_unknown_order_key_raises(self, sql_env):
        colls, _, _ = sql_env
        with pytest.raises(SqlError, match="ORDER BY references"):
            sql_to_table(
                "SELECT lang, count(*) AS n FROM docs GROUP BY lang "
                "ORDER BY nope DESC",
                colls,
            )

    def test_order_by_score(self, sql_env):
        colls, _, eng = sql_env
        t = sql_to_table(
            "SELECT doc_id FROM docs WHERE content = 'def read' "
            "ORDER BY score DESC, doc_id ASC LIMIT 5",
            colls,
        )
        exp = eng.search("def read", k=5, fl=["doc_id"])
        assert t["doc_id"].to_pylist() == exp["doc_id"].to_pylist()

    def test_distinct(self, sql_env):
        colls, df, _ = sql_env
        t = sql_to_table(
            "SELECT DISTINCT lang FROM docs WHERE doclen >= 40 "
            "ORDER BY lang ASC",
            colls,
        )
        exp = sorted(df[df.doclen >= 40]["lang"].unique())
        assert t["lang"].to_pylist() == exp
        t2 = sql_to_table(
            "SELECT DISTINCT repo, lang FROM docs "
            "ORDER BY repo ASC, lang ASC LIMIT 4",
            colls,
        )
        exp2 = (df[["repo", "lang"]].drop_duplicates()
                .sort_values(["repo", "lang"]).head(4))
        assert t2.to_pylist() == exp2.to_dict("records")
        with pytest.raises(SqlError, match="DISTINCT"):
            parse_sql("SELECT DISTINCT count(*) FROM c")
        with pytest.raises(SqlError, match="DISTINCT"):
            parse_sql("SELECT DISTINCT lang FROM c ORDER BY doclen")

    def test_limit_offset(self, sql_env):
        colls, df, _ = sql_env
        full = sql_to_table(
            "SELECT doc_id FROM docs WHERE lang = 'go' "
            "ORDER BY doc_id ASC LIMIT 10",
            colls,
        )["doc_id"].to_pylist()
        page = sql_to_table(
            "SELECT doc_id FROM docs WHERE lang = 'go' "
            "ORDER BY doc_id ASC LIMIT 4 OFFSET 3",
            colls,
        )["doc_id"].to_pylist()
        assert page == full[3:7]
        # grouped paging too
        g_full = sql_to_table(
            "SELECT lang, count(*) AS n FROM docs GROUP BY lang "
            "ORDER BY n DESC, lang ASC LIMIT 10",
            colls,
        )["lang"].to_pylist()
        g_page = sql_to_table(
            "SELECT lang, count(*) AS n FROM docs GROUP BY lang "
            "ORDER BY n DESC, lang ASC LIMIT 2 OFFSET 2",
            colls,
        )["lang"].to_pylist()
        assert g_page == g_full[2:4]

    def test_anded_text_predicates_intersect(self, sql_env):
        """Review r3: two content predicates must intersect (SQL AND),
        not union through the engine's default-OR free query."""
        colls, _, eng = sql_env
        t = sql_to_table(
            "SELECT doc_id FROM docs WHERE content = 'def' "
            "AND content = 'read' ORDER BY doc_id ASC",
            colls,
        )
        exp = sorted(set(eng.match_ids("def").tolist())
                     & set(eng.match_ids("read").tolist()))
        assert t["doc_id"].to_pylist() == exp

    def test_order_by_alias_projection(self, sql_env):
        colls, df, _ = sql_env
        t = sql_to_table(
            "SELECT doc_id, doclen AS d FROM docs WHERE lang = 'go' "
            "ORDER BY d DESC, doc_id ASC LIMIT 5",
            colls,
        )
        exp = (df[df.lang == "go"]
               .sort_values(["doclen", "doc_id"],
                            ascending=[False, True]).head(5))
        assert t["doc_id"].to_pylist() == exp["doc_id"].tolist()
        assert t.column_names == ["doc_id", "d"]
        # DISTINCT + aliased order key
        t2 = sql_to_table(
            "SELECT DISTINCT lang AS l FROM docs ORDER BY l ASC LIMIT 3",
            colls,
        )
        assert t2["l"].to_pylist() == sorted(df.lang.unique())[:3]

    def test_select_star(self, sql_env):
        colls, df, eng = sql_env
        t = sql_to_table(
            "SELECT * FROM docs WHERE lang = 'go' "
            "ORDER BY doc_id ASC LIMIT 2",
            colls,
        )
        assert t.column_names == list(eng.stored_fields)
        assert t.num_rows == 2

    def test_double_quote_literal_rejected(self, sql_env):
        colls, _, _ = sql_env
        with pytest.raises(SqlError, match="double quotes"):
            sql_to_table(
                "SELECT doc_id FROM docs WHERE repo = 'a\"b'", colls)
