"""ST4 thumbnail-analogue enrichment (VERDICT r4 item 5): broadcast-manifest
lookup join mirroring ``solrindexer/tools.py:334-385`` semantics, with the
reference test shape (``tests/test_tools.py:243-293``): a tmp_path manifest,
a hit sets thumbnail_url, a miss leaves the row untouched."""

import pyarrow as pa
import pytest
import ray
import ray.data as rd

from solr_indexer_ray.stages.enrich import (
    ThumbnailStage,
    build_thumbnail_manifest,
    pick_url,
    thumbnail_key,
)


class TestKeyConstruction:
    def test_s1_product_includes_mode(self):
        url = "https://x/S1A/2024/11/10/IW/prod_abc.zip"
        assert thumbnail_key(url) == (
            "S1A/2024/11/10/IW/ql/prod_abc/thumbnail.png"
        )

    def test_non_s1_omits_mode(self):
        url = "https://x/S2B/2024/01/02/granule.zip"
        assert thumbnail_key(url) == (
            "S2B/2024/01/02/ql/granule/thumbnail.png"
        )

    def test_s1_without_mode_keeps_reference_none_quirk(self):
        # reference f-string interpolates the unmatched mode group as the
        # literal "None" (tools.py:355-357) — kept verbatim
        url = "https://x/S1B/2024/11/10/prod.zip"
        assert thumbnail_key(url) == (
            "S1B/2024/11/10/None/ql/prod/thumbnail.png"
        )

    def test_no_match_returns_none(self):
        assert thumbnail_key("https://x/not-a-product.tar") is None
        assert thumbnail_key(None) is None

    def test_pick_url_list_rules(self):
        # [0] when it ends with .zip, else [1] (tools.py:341-343)
        assert pick_url(["a/S1A/x.zip", "b"]) == "a/S1A/x.zip"
        assert pick_url(["a/page.html", "b/S1A/x.zip"]) == "b/S1A/x.zip"
        assert pick_url("plain") == "plain"
        assert pick_url([]) is None
        assert pick_url(None) is None


@pytest.fixture()
def thumb_tree(tmp_path):
    hit = tmp_path / "S1A" / "2024" / "11" / "10" / "IW" / "ql" / "prod_a"
    hit.mkdir(parents=True)
    (hit / "thumbnail.png").write_bytes(b"png")
    hit2 = tmp_path / "S2B" / "2024" / "01" / "02" / "ql" / "gran_b"
    hit2.mkdir(parents=True)
    (hit2 / "thumbnail.png").write_bytes(b"png")
    return tmp_path


class TestThumbnailStage:
    def test_manifest_scan(self, thumb_tree):
        m = build_thumbnail_manifest(str(thumb_tree))
        assert m == frozenset(
            {
                "S1A/2024/11/10/IW/ql/prod_a/thumbnail.png",
                "S2B/2024/01/02/ql/gran_b/thumbnail.png",
            }
        )

    def test_hit_and_miss_rows(self, thumb_tree):
        stage = ThumbnailStage(
            base_url="https://thumbs.example/nbs/",
            base_path=str(thumb_tree),
            url_col="data_access_url_http",
        )
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "data_access_url_http": [
                    ["https://d/S1A/2024/11/10/IW/prod_a.zip"],   # hit
                    ["https://d/S2B/2024/01/02/gran_b.zip"],      # hit
                    ["https://d/S1A/2024/11/11/IW/prod_x.zip"],   # miss
                    [None],                                       # no url
                ],
            }
        )
        out = stage(batch)
        assert out.num_rows == 4  # row-count contract of the enricher hook
        assert out["thumbnail_url"].to_pylist() == [
            "https://thumbs.example/nbs/S1A/2024/11/10/IW/ql/prod_a/thumbnail.png",
            "https://thumbs.example/nbs/S2B/2024/01/02/ql/gran_b/thumbnail.png",
            None,
            None,
        ]

    def test_broadcast_manifest_actor_pool(self, ray_session, thumb_tree):
        """The scale shape: manifest scanned once on the driver, ray.put
        once, resolved per actor in __init__ — then a map_batches actor
        pool enriches a streaming Dataset."""
        manifest_ref = ray.put(build_thumbnail_manifest(str(thumb_tree)))
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(100), pa.int64()),
                    "data_access_url_http": pa.array(
                        [
                            f"https://d/S1A/2024/11/10/IW/prod_a.zip"
                            if i % 3 == 0
                            else f"https://d/S1A/2024/11/10/IW/other_{i}.zip"
                            for i in range(100)
                        ]
                    ),
                }
            )
        ).repartition(4)
        out = ds.map_batches(
            ThumbnailStage,
            fn_constructor_kwargs={
                "base_url": "https://thumbs.example",
                "manifest": manifest_ref,
            },
            concurrency=2,
            batch_format="pyarrow",
        )
        rows = out.take_all()
        hits = [r for r in rows if r["thumbnail_url"] is not None]
        assert len(hits) == 34  # i % 3 == 0 rows
        assert all(r["doc_id"] % 3 == 0 for r in hits)

    def test_unit_indexer_hook_integration(self, tmp_path, thumb_tree,
                                           ray_session):
        """as_doc_enricher() wires the stage into the build path (ST4's
        reference shape: thumbnail generator injected into index_record,
        solrindexer/mmd.py:1334-1390)."""
        import pyarrow.parquet as pq

        from solr_indexer_ray.config import IndexConfig
        from solr_indexer_ray.pipelines.build import build_index
        from solr_indexer_ray.sources.corpus import generate_corpus

        corpus = generate_corpus(30, seed=5, mean_tokens=20)
        urls = pa.array(
            [
                "https://d/S1A/2024/11/10/IW/prod_a.zip" if i % 2 == 0
                else "https://d/none.html"
                for i in range(corpus.num_rows)
            ]
        )
        corpus = corpus.append_column("data_access_url_http", urls)
        src = str(tmp_path / "c.parquet")
        pq.write_table(corpus, src)
        idx = str(tmp_path / "idx")
        stage = ThumbnailStage(
            base_url="https://thumbs.example",
            base_path=str(thumb_tree),
        )
        build_index(
            src, idx,
            config=IndexConfig(extra_stored=("data_access_url_http",)),
            doc_enricher=stage.as_doc_enricher(),
        )
        docs = pq.read_table(f"{idx}/docs")
        assert "thumbnail_url" in docs.column_names
        got = docs.sort_by("doc_id")["thumbnail_url"].to_pylist()
        # every even-index row got the hit URL (generate_corpus appends a
        # few edge rows beyond n_files, so derive the count)
        expected = (corpus.num_rows + 1) // 2
        assert sum(v is not None for v in got) == expected
