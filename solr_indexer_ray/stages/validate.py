"""Validation stage + errors dataset + failure analytics.

Reference analogues:

- ``check_mmd`` required-element + controlled-vocabulary validation
  (``/root/reference/solrindexer/mmd.py:273-336`` M1) and the ``mmd2solr``
  post-checks (``solrindexer/indexer.py:132-389`` M23): warn-don't-block
  semantics, suppressed parse errors, invalid rows routed to a failure
  tracker rather than raised.
- FailureTracker side-channel + analytics
  (``solrindexer/failure_tracker.py:29-47, 109-171``): here the errors are
  **data** — a status column produced by the same ``map_batches`` pass,
  split into an errors Dataset (no shared mutable object, SURVEY.md §1.3).
- exit-code contract (``solrindexer/cli.py:270-276``): 0 all ok / 3 partial
  failures / 1 everything failed.

Checks transposed onto the corpus schema (FIXTURES.md §1 negative corpus):

==============  =========  ==========================================
stage           severity   predicate
==============  =========  ==========================================
required        fail       repo/path/commit non-empty
id-format       fail       commit is 40-char lowercase hex
empty-content   fail       content has at least one analyzable token
vocabulary      warn       lang within the controlled language set
==============  =========  ==========================================
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from solr_indexer_ray.functions.tokenize import AnalyzerRegistry

_HEX40 = re.compile(r"^[0-9a-f]{40}$")

#: controlled language vocabulary (reference CONTROLLED_ELEMENTS pattern,
#: solrindexer/mmd.py:116-123; membership check J5 via broadcast set)
KNOWN_LANGS = frozenset(
    {"python", "java", "go", "javascript", "c", "cpp", "rust", "typescript",
     "markdown", "text", "en", "de", "es", "fr", "zh"}
)


class ControlledVocabulary:
    """A named term set with membership checks — the reference's vocabulary
    backend boiled down to its engine-relevant core (ST2: loaded once per
    worker, queried per value; ``solrindexer/vocabulary.py:104-153``).

    :meth:`from_backend` resolves the set through any
    :mod:`solr_indexer_ray.state.vocabulary` backend (file / TTL-cached
    fetcher / legacy) ONCE — the resolved frozen set is what ships to
    workers (broadcast membership, never a per-task fetch)."""

    def __init__(self, name: str, terms):
        self.name = name
        self.terms = frozenset(terms)
        self._arr = pa.array(sorted(self.terms))

    @classmethod
    def from_backend(cls, name: str, backend, vocab: str | None = None):
        """Resolve ``vocab`` (default: ``name``) through a vocabulary
        backend into a broadcastable term set."""
        return cls(name, backend.get_concepts(vocab or name))

    def contains(self, value) -> bool:
        return value in self.terms

    def is_in(self, column: pa.Array) -> pa.Array:
        """Vectorized membership (``pc.is_in`` with broadcast value set)."""
        return pc.is_in(column, value_set=self._arr)


def validate_row(repo, path, commit, n_tokens) -> tuple:
    """Shared row predicate -> (stage, message) or (None, None) if valid.

    Used both by the standalone :class:`CorpusValidator` stage and by the
    index build's inline validation path (the reference validates during
    ingestion, ``solrindexer/indexer.py:132-389``)."""
    if not repo or not path or not commit:
        return "required", "missing required field repo/path/commit"
    if not _HEX40.match(commit):
        return "id-format", f"commit not 40-hex: {str(commit)[:50]!r}"
    if n_tokens == 0:
        return "empty-content", "no analyzable tokens in content"
    return None, None


class CorpusValidator:
    """Stateful ``map_batches`` stage: vocab + analyzer built once per actor
    (reference: XSD schema compiled once per worker, ST1
    ``solrindexer/mmd.py:46-94``).

    Appends columns ``valid:bool, stage:string, message:string,
    warning:string`` to each batch.
    """

    def __init__(self, registry: AnalyzerRegistry | None = None,
                 lang_vocab: ControlledVocabulary | None = None,
                 on_warning=None):
        self.registry = registry or AnalyzerRegistry()
        self.lang_vocab = lang_vocab or ControlledVocabulary("lang", KNOWN_LANGS)
        #: per-document warning hook (reference: ``warning_callback(msg,
        #: stage)`` threaded through conversion, ``solrindexer/mmd.py:
        #: 166-175``).  Runs inside the worker — use for logging/metrics
        #: side-channels, not driver state.
        self.on_warning = on_warning

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        repo = batch["repo"].to_pylist()
        path = batch["path"].to_pylist()
        commit = batch["commit"].to_pylist()
        lang = batch["lang"].to_pylist()
        content = batch["content"].to_pylist()

        valid = np.ones(n, dtype=bool)
        stage = [None] * n
        message = [None] * n
        warning = [None] * n

        for i in range(n):
            toks = self.registry.tokenize(content[i] or "", lang[i])
            st, msg = validate_row(repo[i], path[i], commit[i], len(toks))
            if st is not None:
                valid[i], stage[i], message[i] = False, st, msg
                continue
            if lang[i] is not None and not self.lang_vocab.contains(lang[i]):
                # warn-don't-block (reference GCMD advisory warnings)
                warning[i] = f"lang {lang[i]!r} outside controlled vocabulary"
                if self.on_warning is not None:
                    self.on_warning(
                        f"{repo[i]}/{path[i]}", warning[i], "vocabulary"
                    )

        for name, arr in (
            ("valid", pa.array(valid)),
            ("stage", pa.array(stage, pa.string())),
            ("message", pa.array(message, pa.string())),
            ("warning", pa.array(warning, pa.string())),
        ):
            batch = batch.append_column(name, arr)
        return batch


def validate_corpus(ds, registry=None, batch_size: int = 4096,
                    concurrency=None):
    """Attach validation columns (one fused pass, zero-copy Arrow).

    ``concurrency=None`` resolves to an autoscaling cluster-sized pool
    (:func:`solr_indexer_ray.stages.pool.resolve_pool`) — a hardcoded
    2-actor pool starved 32-CPU nodes (VERDICT r3 item 3).
    """
    from solr_indexer_ray.stages.pool import resolve_pool

    return ds.map_batches(
        CorpusValidator,
        fn_constructor_kwargs={"registry": registry},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_pool(concurrency),
    )


def split_errors(validated_ds):
    """(valid_ds, errors_ds) — the index path and the failure side-channel."""
    valid = validated_ds.map_batches(
        lambda t: t.filter(pc.field("valid")), batch_format="pyarrow"
    )
    errors = validated_ds.map_batches(
        lambda t: t.filter(pc.invert(pc.field("valid"))).select(
            ["repo", "path", "commit", "stage", "message"]
        ),
        batch_format="pyarrow",
    )
    return valid, errors


def failure_summary(errors_ds) -> "object":
    """Failure analytics (A3, ``solrindexer/failure_tracker.py:152-171``):
    per-stage record counts, distinct files, fraction of total failures.

    Distributed combiner shape: each batch pre-aggregates to one row per
    distinct (stage, file) with its count, the ``groupby("stage")``
    shuffle then moves only those partials — never the raw error rows to
    the driver (a poisoned 100 TB run can fail millions of rows).
    Returns a small pandas DataFrame (one row per stage)."""
    import pandas as pd

    def partial(t: "pa.Table") -> "pa.Table":
        df = pd.DataFrame(
            {
                "stage": t["stage"].to_pylist(),
                "file": [
                    f"{r}/{p}"
                    for r, p in zip(
                        t["repo"].to_pylist(), t["path"].to_pylist()
                    )
                ],
            }
        )
        g = df.groupby(["stage", "file"]).size().reset_index(name="n")
        import pyarrow as pa_

        return pa_.Table.from_pandas(g, preserve_index=False)

    def per_stage(group: "pa.Table") -> "pa.Table":
        import pyarrow as pa_

        n = group["n"].to_numpy().sum()
        files = len(set(group["file"].to_pylist()))
        return pa_.table(
            {
                "stage": group["stage"][:1],
                "n_records": pa_.array([int(n)], pa_.int64()),
                "n_files": pa_.array([files], pa_.int64()),
            }
        )

    rows = (
        errors_ds.select_columns(["stage", "repo", "path"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("stage")
        .map_groups(per_stage, batch_format="pyarrow")
        .take_all()
    )
    if not rows:
        return pd.DataFrame(columns=["stage", "n_records", "n_files", "fraction"])
    g = pd.DataFrame(rows)
    g["fraction"] = g["n_records"] / g["n_records"].sum()
    return g.sort_values(
        ["n_records", "stage"], ascending=[False, True]
    ).reset_index(drop=True)


def determine_exit_code(n_ok: int, n_failed: int) -> int:
    """Exit-code contract (``solrindexer/cli.py:270-276``)."""
    if n_failed == 0:
        return 0
    if n_ok == 0:
        return 1
    return 3
