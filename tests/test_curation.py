"""Curation operators: benchmark decontamination + deterministic mixture
sampling (`stages/curation.py`)."""

import json

import numpy as np
import pyarrow as pa
import pytest
import ray

from solr_indexer_ray.stages.curation import (
    accept_fraction,
    decontaminate,
    sample_mixture,
)


def _ds(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


ROWS = [
    {"doc_id": 0, "source": "a",
     "text": "the quick brown fox jumps over the lazy dog today"},
    {"doc_id": 1, "source": "a",
     "text": "completely different words about graph algorithms"},
    {"doc_id": 2, "source": "b",
     "text": "the quick brown fox jumps over the lazy dog again"},
    {"doc_id": 3, "source": "b", "text": "nothing in common with anything"},
    {"doc_id": 4, "source": "c", "text": ""},
]


class TestDecontaminate:
    def test_flags_overlap_with_benchmark(self):
        bench = _ds(ROWS[:1])          # doc 0 is the benchmark
        out = {
            r["doc_id"]: r
            for r in decontaminate(_ds(ROWS), bench, n=5).take_all()
        }
        assert out[0]["contaminated"]          # benchmark flags itself
        assert out[2]["contaminated"]          # shares 5-gram shingles
        assert not out[1]["contaminated"]
        assert not out[3]["contaminated"]
        assert not out[4]["contaminated"]      # empty doc
        assert out[2]["n_matched"] >= 1

    def test_min_matches_threshold(self):
        bench = _ds(ROWS[:1])
        strict = {
            r["doc_id"]: r["contaminated"]
            for r in decontaminate(
                _ds(ROWS), bench, n=5, min_matches=10**6
            ).take_all()
        }
        assert not any(strict.values())

    def test_drop_mode_returns_clean_rows(self):
        bench = _ds(ROWS[:1])
        kept = {
            r["doc_id"]
            for r in decontaminate(
                _ds(ROWS), bench, n=5, mode="drop"
            ).take_all()
        }
        assert kept == {1, 3, 4}

    def test_bad_mode(self):
        with pytest.raises(ValueError, match="mode"):
            decontaminate(_ds(ROWS), _ds(ROWS[:1]), mode="nope")


class TestSampleMixture:
    def test_rates_zero_and_one(self):
        out = sample_mixture(
            _ds(ROWS), {"a": 1.0, "b": 0.0, "c": 1.0}
        ).take_all()
        ids = {r["doc_id"] for r in out}
        assert ids == {0, 1, 4}   # all of a + c, none of b

    def test_deterministic_and_matches_formula(self):
        rates = {"a": 0.5, "b": 0.5, "c": 0.5}
        a = {r["doc_id"] for r in sample_mixture(_ds(ROWS), rates).take_all()}
        b = {r["doc_id"] for r in sample_mixture(_ds(ROWS), rates).take_all()}
        assert a == b
        want = {r["doc_id"] for r in ROWS
                if accept_fraction(r["doc_id"]) < 0.5}
        assert a == want

    def test_rate_converges_at_scale(self):
        n = 4000
        rows = [{"doc_id": i, "source": "x", "text": "t"} for i in range(n)]
        kept = sample_mixture(_ds(rows), {"x": 0.3}).count()
        assert abs(kept / n - 0.3) < 0.03

    def test_bad_rate(self):
        with pytest.raises(ValueError, match="rate"):
            sample_mixture(_ds(ROWS), {"a": 1.5})


def test_accept_fraction_uniformity():
    vals = np.array([accept_fraction(i) for i in range(2000)])
    assert 0.0 <= vals.min() and vals.max() < 1.0
    assert abs(vals.mean() - 0.5) < 0.02


class TestParagraphDedup:
    """C4-style global paragraph dedup: exact duplicate spans removed,
    first (doc_id, index) occurrence kept, short spans untouched."""

    ROWS = [
        {"doc_id": 0, "text": "alpha beta\ncommon line here\nuniq zero"},
        {"doc_id": 1, "text": "common line here\nuniq one"},
        {"doc_id": 2, "text": "zz\ncommon line here\nalpha beta"},
        {"doc_id": 3, "text": "common line here"},
        {"doc_id": 4, "text": ""},
    ]

    def _run(self, rows=None, **kw):
        from solr_indexer_ray.stages.curation import paragraph_dedup

        out = paragraph_dedup(_ds(rows or self.ROWS), **kw).take_all()
        return {r["doc_id"]: r for r in out}

    def test_first_occurrence_kept(self):
        out = self._run()
        assert out[0]["text"] == self.ROWS[0]["text"]  # first owner
        assert out[0]["n_dropped"] == 0
        assert out[1]["text"] == "uniq one"
        assert out[1]["n_dropped"] == 1
        assert out[2]["text"] == "zz"
        assert out[2]["n_dropped"] == 2
        assert out[3]["text"] == "" and out[3]["n_dropped"] == 1
        assert out[4]["text"] == "" and out[4]["n_paras"] == 1
        assert out[4]["n_dropped"] == 0  # empty span is short -> kept

    def test_same_doc_duplicates_drop(self):
        out = self._run([{"doc_id": 9, "text": "dup line\nx\ndup line"}])
        assert out[9]["text"] == "dup line\nx"
        assert out[9]["n_dropped"] == 1

    def test_min_chars_protects_short_spans(self):
        rows = [{"doc_id": 0, "text": "ab\nlong duplicate span"},
                {"doc_id": 1, "text": "ab\nlong duplicate span"}]
        out = self._run(rows, min_chars=5)
        assert out[1]["text"] == "ab"       # "ab" < 5 chars: kept twice
        assert out[1]["n_dropped"] == 1

    def test_idempotent(self):
        from solr_indexer_ray.stages.curation import paragraph_dedup

        once = paragraph_dedup(_ds(self.ROWS)).take_all()
        again = paragraph_dedup(
            _ds([{"doc_id": r["doc_id"], "text": r["text"]}
                 for r in once])
        ).take_all()
        assert all(r["n_dropped"] == 0 for r in again)
        assert ({r["doc_id"]: r["text"] for r in again}
                == {r["doc_id"]: r["text"] for r in once})

    def test_custom_separator(self):
        rows = [{"doc_id": 0, "text": "aa SEP bb"},
                {"doc_id": 1, "text": "bb SEP aa"}]
        out = self._run(rows, separator=" SEP ")
        assert out[0]["text"] == "aa SEP bb"
        assert out[1]["text"] == "" and out[1]["n_dropped"] == 2

    def test_join_and_broadcast_methods_agree(self):
        """The distributed-join default and the round-2 broadcast path
        must produce identical output on every corpus shape."""
        rows = self.ROWS + [
            {"doc_id": 5, "text": "uniq zero\ncommon line here\nzz"},
            {"doc_id": 6, "text": "only unique content here"},
        ]
        a = self._run(rows, method="join")
        b = self._run(rows, method="broadcast")
        assert a == b

    def test_join_method_no_duplicates_corpus(self):
        """Empty drop table short-circuits the join (Dataset.join
        rejects an empty build side)."""
        rows = [{"doc_id": 0, "text": "aa\nbb"},
                {"doc_id": 1, "text": "cc\ndd"}]
        out = self._run(rows, method="join")
        assert all(r["n_dropped"] == 0 for r in out.values())
        assert out[0]["text"] == "aa\nbb"

    def test_unknown_method_rejected(self):
        with pytest.raises(ValueError, match="method"):
            self._run(method="nope")

    def test_broadcast_overflow_guard(self):
        """Docs with >= 2^20 spans would alias the composite int64
        keeper key (ADVICE r2): the broadcast path must refuse, the
        join path must handle them."""
        from solr_indexer_ray.stages.curation import paragraph_keepers

        big = "\n".join(f"span {i}" for i in range((1 << 20) + 2))
        rows = [{"doc_id": 0, "text": big}]
        # the ValueError surfaces wrapped in ray.exceptions.RayTaskError
        with pytest.raises(Exception, match="2\\^20"):
            paragraph_keepers(_ds(rows))

    def test_cli_paradedup(self, tmp_path, capsys):
        import pyarrow.parquet as pq

        from solr_indexer_ray.cli import main

        src = str(tmp_path / "docs.parquet")
        pq.write_table(pa.Table.from_pylist(self.ROWS), src)
        dest = str(tmp_path / "dd")
        assert main(["paradedup", "-i", src, "--dest", dest]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rows"] == len(self.ROWS)
        assert out["paras_dropped"] == 4


class TestGopherQualityFilter:
    def test_rules_hand_computed(self):
        from solr_indexer_ray.stages.curation import (
            gopher_quality_filter,
        )

        rows = [
            {"doc_id": 0, "text": " ".join(f"word{i}" for i in range(60))},
            {"doc_id": 1, "text": "too short"},
            {"doc_id": 2, "text": " ".join(["spam"] * 80)},
            {"doc_id": 3, "text": " ".join(["1234 5678"] * 40)},
            {"doc_id": 4, "text": ""},
        ]
        out = {r["doc_id"]: r for r in gopher_quality_filter(
            _ds(rows)).take_all()}
        assert out[0]["keep"] and out[0]["violations"] == ""
        assert not out[1]["keep"]
        assert "n_tokens" in out[1]["violations"]
        assert not out[2]["keep"]  # one token repeated 80x
        assert "dup_frac" in out[2]["violations"]
        assert "top_frac" in out[2]["violations"]
        assert not out[3]["keep"]  # digit tokens: alpha_frac = 0
        assert "alpha_frac" in out[3]["violations"]
        assert out[2]["dup_frac"] == pytest.approx(1.0 - 1 / 80)
        assert out[2]["top_frac"] == pytest.approx(1.0)
        assert out[4]["n_tokens"] == 0 and not out[4]["keep"]

    def test_signals_match_textstats(self):
        from solr_indexer_ray.functions.textstats import repetition_stats
        from solr_indexer_ray.functions.tokenize import simple_analyzer
        from solr_indexer_ray.stages.curation import (
            gopher_quality_filter,
        )

        text = "the quick brown fox the quick dog jumps " * 10
        out = gopher_quality_filter(
            _ds([{"doc_id": 0, "text": text}])).take_all()[0]
        dup, top = repetition_stats(simple_analyzer(text))
        assert out["dup_frac"] == pytest.approx(dup)
        assert out["top_frac"] == pytest.approx(top)


class TestSplitAndShuffle:
    def test_split_deterministic_and_sized(self):
        from solr_indexer_ray.stages.curation import (
            accept_fraction,
            split_train_valid,
        )

        rows = [{"doc_id": i, "text": "x"} for i in range(400)]
        out = split_train_valid(_ds(rows), valid_frac=0.2).take_all()
        for r in out:
            exp = ("valid" if accept_fraction(r["doc_id"]) < 0.2
                   else "train")
            assert r["split"] == exp
        frac = sum(r["split"] == "valid" for r in out) / len(out)
        assert 0.1 < frac < 0.3
        # rerun identical
        again = split_train_valid(_ds(rows), valid_frac=0.2).take_all()
        assert ({r["doc_id"]: r["split"] for r in again}
                == {r["doc_id"]: r["split"] for r in out})

    def test_split_validates(self):
        from solr_indexer_ray.stages.curation import split_train_valid

        with pytest.raises(ValueError, match="valid_frac"):
            split_train_valid(_ds([{"doc_id": 0, "text": ""}]), 1.5)

    def test_shuffle_deterministic_order(self):
        import hashlib as hl

        from solr_indexer_ray.stages.curation import (
            shuffle_deterministic,
        )

        rows = [{"doc_id": i, "text": "x"} for i in range(200)]
        out = shuffle_deterministic(_ds(rows)).take_all()
        got = [r["doc_id"] for r in out]
        exp = sorted(range(200),
                     key=lambda i: hl.md5(str(i).encode()).hexdigest())
        assert got == exp
        assert got != list(range(200))  # actually permuted


class TestPackSequences:
    """Greedy contiguous sequence packing into fixed token budgets."""

    ROWS = [
        {"doc_id": 0, "text": "a b c"},        # 3 tokens
        {"doc_id": 1, "text": "d e"},          # 2 -> bin 0 (5/6)
        {"doc_id": 2, "text": "f g"},          # 2 -> overflow, bin 1
        {"doc_id": 3, "text": "h i j k l m n"},  # 7 > budget: own bin 2
        {"doc_id": 4, "text": "o"},            # bin 3 (7 filled bin 2)
        {"doc_id": 5, "text": ""},             # 0 tokens, stays bin 3
    ]

    @staticmethod
    def _packed(ds, **kw):
        """pack_sequences returns a streaming Dataset; collect sorted
        (doc_id, n_tokens, bin) triples for assertion."""
        from solr_indexer_ray.stages.curation import pack_sequences

        rows = pack_sequences(ds, **kw).take_all()
        rows.sort(key=lambda r: r["doc_id"])
        return [(r["doc_id"], r["n_tokens"], r["bin"]) for r in rows]

    def test_hand_packed(self):
        got = self._packed(_ds(self.ROWS), budget=6)
        assert got == [(0, 3, 0), (1, 2, 0), (2, 2, 1), (3, 7, 2),
                       (4, 1, 3), (5, 0, 3)]

    def test_bin_fills_never_exceed_budget_except_oversized(self):
        rows = [{"doc_id": i, "text": " ".join(["w"] * ((i * 7) % 11))}
                for i in range(60)]
        got = self._packed(_ds(rows), budget=16)
        fills: dict = {}
        for _, n, b in got:
            fills[b] = fills.get(b, 0) + n
        for b, f in fills.items():
            assert f <= 16 or f == max(n for _, n, bb in got if bb == b)
        # bins are contiguous and start at 0
        assert sorted(fills) == list(range(len(fills)))

    def test_budget_validation(self):
        from solr_indexer_ray.stages.curation import pack_sequences

        with pytest.raises(ValueError, match="budget"):
            pack_sequences(_ds(self.ROWS), budget=0)
        with pytest.raises(ValueError, match="shard_size"):
            pack_sequences(_ds(self.ROWS), budget=4, shard_size=0)

    def test_sharded_equals_sequential_reference(self):
        """The shard-parallel path (map_groups per shard + prefix-sum
        rebase) must be bit-equal to one sequential greedy scan that
        breaks bins at shard boundaries."""
        rng = [((i * 13) % 23) for i in range(97)]
        rows = [{"doc_id": i * 3, "text": " ".join(["w"] * n)}
                for i, n in enumerate(rng)]  # gappy ids
        budget, shard = 20, 50
        got = self._packed(_ds(rows), budget=budget, shard_size=shard)

        # independent sequential reference
        exp, b, fill, prev_shard = [], -1, 0, None
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            n = len(r["text"].split()) if r["text"] else 0
            s = r["doc_id"] // shard
            if prev_shard is None or s != prev_shard or fill + n > budget:
                b += 1
                fill = n
            else:
                fill += n
            prev_shard = s
            exp.append((r["doc_id"], n, b))
        assert got == exp

    def test_shard_boundary_forces_bin_break(self):
        rows = [{"doc_id": 9, "text": "a b"},
                {"doc_id": 10, "text": "c d"}]  # shard 0 | shard 1
        got = self._packed(_ds(rows), budget=100, shard_size=10)
        assert got == [(9, 2, 0), (10, 2, 1)]
        # one shard -> classic global greedy, same docs share a bin
        got = self._packed(_ds(rows), budget=100, shard_size=100)
        assert got == [(9, 2, 0), (10, 2, 0)]


class TestLmQualityScore:
    """CCNet-style bigram-LM quality signal: hand-computed counts on a
    tiny corpus, smoothing math, and the common-text > noise ordering."""

    ROWS = [
        {"doc_id": 0, "text": "a b a b"},
        {"doc_id": 1, "text": "a b c"},
        {"doc_id": 2, "text": "x"},          # < 2 tokens -> NULL score
        {"doc_id": 3, "text": ""},
    ]

    def test_counts(self):
        from solr_indexer_ray.stages.curation import train_bigram_counts

        uni, big = train_bigram_counts(_ds(self.ROWS))
        assert uni == {"a": 3, "b": 3, "c": 1, "x": 1}
        assert big == {"a b": 3, "b a": 1, "b c": 1}

    def test_scores_hand_computed(self):
        from solr_indexer_ray.stages.curation import lm_quality_score

        alpha, v = 0.5, 4
        out = {
            r["doc_id"]: r
            for r in lm_quality_score(
                _ds(self.ROWS), alpha=alpha
            ).take_all()
        }

        def lp(big_c, head_c):
            return np.log((big_c + alpha) / (head_c + alpha * v))

        # doc 0: "a b","b a","a b" over heads a,b,a
        exp0 = np.mean([lp(3, 3), lp(1, 3), lp(3, 3)])
        assert out[0]["n_bigrams"] == 3
        assert out[0]["avg_logp"] == pytest.approx(exp0, abs=1e-4)
        # doc 1: "a b","b c"
        exp1 = np.mean([lp(3, 3), lp(1, 3)])
        assert out[1]["avg_logp"] == pytest.approx(exp1, abs=1e-4)
        assert out[1]["ppl"] == pytest.approx(
            np.exp(-out[1]["avg_logp"]), rel=1e-9
        )
        # short / empty docs: no bigrams, NULL score
        assert out[2]["n_bigrams"] == 0 and out[2]["avg_logp"] is None
        assert out[3]["avg_logp"] is None

    def test_common_text_beats_noise(self):
        from solr_indexer_ray.stages.curation import lm_quality_score

        rows = [
            {"doc_id": i, "text": "the data the data the data"}
            for i in range(20)
        ] + [{"doc_id": 100, "text": "zq xv qk jw zz pq"}]
        out = {r["doc_id"]: r["avg_logp"]
               for r in lm_quality_score(_ds(rows)).take_all()}
        assert out[0] > out[100]

    def test_cli_lmscore(self, tmp_path, capsys):
        import pyarrow.parquet as pq

        from solr_indexer_ray.cli import main

        src = str(tmp_path / "docs.parquet")
        pq.write_table(pa.Table.from_pylist(self.ROWS), src)
        dest = str(tmp_path / "scored")
        assert main(["lmscore", "-i", src, "--dest", dest]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rows"] == len(self.ROWS)
        assert pq.read_table(dest).column("avg_logp").null_count == 2

    def test_sampled_training_matches_reference(self):
        """sample_rate trains on the deterministic md5 subset — the
        counts must equal a hand-filtered retrain."""
        from solr_indexer_ray.stages.curation import (
            accept_fraction,
            train_bigram_counts,
        )

        rows = [{"doc_id": i, "text": f"a b w{i % 5} a"}
                for i in range(40)]
        kept = [r for r in rows if accept_fraction(r["doc_id"]) < 0.5]
        assert 0 < len(kept) < len(rows)  # the sample really filters
        got = train_bigram_counts(_ds(rows), sample_rate=0.5)
        exp = train_bigram_counts(_ds(kept))
        assert got == exp

    def test_topk_pruning_by_count_then_key(self):
        from solr_indexer_ray.stages.curation import train_bigram_counts

        uni, big = train_bigram_counts(
            _ds(self.ROWS), max_unigrams=2, max_bigrams=1
        )
        # full counts: uni a:3 b:3 c:1 x:1; big "a b":3 "b a":1 "b c":1
        assert uni == {"a": 3, "b": 3}          # top-2 (ties -> key asc)
        assert big == {"a b": 3}

    def test_pruned_model_scores_with_backoff(self):
        """Pruned keys back off to count 0; V = retained unigram rows."""
        from solr_indexer_ray.stages.curation import lm_quality_score

        out = {
            r["doc_id"]: r
            for r in lm_quality_score(
                _ds(self.ROWS), max_unigrams=2, max_bigrams=1
            ).take_all()
        }
        alpha, v = 0.5, 2

        def lp(big_c, head_c):
            return np.log((big_c + alpha) / (head_c + alpha * v))

        # doc 1 "a b c": bigrams "a b"(kept c=3, head a kept c=3),
        # "b c"(pruned -> 0, head b kept c=3)
        exp1 = np.mean([lp(3, 3), lp(0, 3)])
        assert out[1]["avg_logp"] == pytest.approx(exp1, abs=1e-4)

    def test_empty_count_tables_back_off(self):
        """ADVICE r2: externally supplied empty count tables must score
        as pure smoothing backoff, not IndexError."""
        from solr_indexer_ray.stages.curation import lm_quality_score

        out = lm_quality_score(
            _ds([{"doc_id": 0, "text": "a b c"}]), counts=({}, {})
        ).take_all()[0]
        # c=0, head=0, V=1 -> ln(0.5 / 0.5) = 0
        assert out["avg_logp"] == pytest.approx(0.0, abs=1e-9)
        assert out["n_bigrams"] == 2

    def test_unseen_bigram_backoff(self):
        from solr_indexer_ray.stages.curation import (
            lm_quality_score,
            train_bigram_counts,
        )

        counts = train_bigram_counts(_ds(self.ROWS))
        # score a doc whose bigrams/heads the model never saw
        out = lm_quality_score(
            _ds([{"doc_id": 9, "text": "zz qq"}]), counts=counts
        ).take_all()[0]
        # c=0, head=0 -> ln(alpha / (alpha * V)) = -ln(V)
        assert out["avg_logp"] == pytest.approx(-np.log(4), abs=1e-4)
