"""Spatial query filters: {!geofilt} (haversine radius), {!bbox}
(circumscribing rectangle), {!intersects} (ENVELOPE rectangle
intersection with dateline handling) over stored geo columns."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from solr_indexer_ray.config import IndexConfig
from solr_indexer_ray.pipelines.build import build_index
from solr_indexer_ray.pipelines.search import SearchEngine
from solr_indexer_ray.sources.corpus import generate_corpus

R = 6371.0087714150598


def _wrap_lon(x):
    return (x + 180.0) % 360.0 - 180.0


@pytest.fixture(scope="module")
def gidx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("geoidx")
    corpus = generate_corpus(150, seed=23, mean_tokens=30)
    n = corpus.num_rows
    lat = [((i * 37) % 1700) / 10.0 - 85.0 for i in range(n)]
    lon = [((i * 73) % 3600) / 10.0 - 180.0 for i in range(n)]
    lat[7] = None  # null-coordinate rows never match
    lon[11] = None
    bbox = [
        None if (la is None or lo is None) else
        f"ENVELOPE({_wrap_lon(lo - 5)}, {_wrap_lon(lo + 5)}, "
        f"{min(la + 5, 90.0)}, {max(la - 5, -90.0)})"
        for la, lo in zip(lat, lon)
    ]
    corpus = corpus.append_column("lat", pa.array(lat, pa.float64()))
    corpus = corpus.append_column("lon", pa.array(lon, pa.float64()))
    corpus = corpus.append_column("bbox", pa.array(bbox, pa.string()))
    pq.write_table(corpus, str(d / "c.parquet"), row_group_size=32)
    build_index(str(d / "c.parquet"), str(d / "idx"),
                config=IndexConfig(docs_per_range=64,
                                   extra_stored=("lat", "lon", "bbox")))
    ids = pa.array(range(n), pa.int64())
    return str(d / "idx"), corpus.append_column("doc_id", ids)


def haversine(plat, plon, lat, lon):
    la1, la2 = np.radians(plat), np.radians(lat)
    dla = np.radians(lat - plat)
    dlo = np.radians(lon - plon)
    a = (np.sin(dla / 2) ** 2
         + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2) ** 2)
    return 2 * R * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


def coords(corpus):
    la = np.array([np.nan if v is None else v
                   for v in corpus["lat"].to_pylist()])
    lo = np.array([np.nan if v is None else v
                   for v in corpus["lon"].to_pylist()])
    return la, lo


class TestGeofilt:
    @pytest.mark.parametrize("pt,d", [
        ((10.0, 20.0), 3000.0),
        ((-45.0, 170.0), 2500.0),
        ((80.0, 0.0), 1500.0),
        ((0.0, 0.0), 50.0),
    ])
    def test_vs_numpy(self, gidx, pt, d):
        idx, corpus = gidx
        la, lo = coords(corpus)
        with np.errstate(invalid="ignore"):
            exp = np.flatnonzero(haversine(pt[0], pt[1], la, lo) <= d)
        got = SearchEngine(idx).match_ids(
            f"{{!geofilt sfield=lat,lon pt={pt[0]},{pt[1]} d={d}}}"
        )
        assert got.tolist() == exp.tolist()

    def test_bbox_superset_of_geofilt(self, gidx):
        idx, _ = gidx
        eng = SearchEngine(idx)
        g = set(eng.match_ids(
            "{!geofilt sfield=lat,lon pt=10,20 d=2000}"))
        b = set(eng.match_ids("{!bbox sfield=lat,lon pt=10,20 d=2000}"))
        assert g <= b

    def test_bbox_dateline_wrap(self, gidx):
        idx, corpus = gidx
        eng = SearchEngine(idx)
        la, lo = coords(corpus)
        ids = eng.match_ids("{!bbox sfield=lat,lon pt=-58,179 d=2500}")
        assert ids.size > 0
        dlon = np.degrees(2500 / (R * np.cos(np.radians(-58.0))))
        for i in ids:
            dd = abs((lo[i] - 179.0 + 180.0) % 360.0 - 180.0)
            assert dd <= dlon + 1e-9
        # docs on BOTH sides of the dateline are reachable
        assert any(lo[i] < 0 for i in ids)
        assert any(lo[i] > 0 for i in ids)

    def test_null_coords_never_match(self, gidx):
        idx, _ = gidx
        ids = SearchEngine(idx).match_ids(
            "{!geofilt sfield=lat,lon pt=0,0 d=21000}")
        assert 7 not in ids and 11 not in ids

    def test_as_fq_keeps_scores(self, gidx):
        idx, _ = gidx
        eng = SearchEngine(idx)
        fqs = ["{!geofilt sfield=lat,lon pt=10,20 d=5000}"]
        allowed = set(eng.match_ids(fqs[0]))
        base = eng.search("def read", k=100, fl=["doc_id"])
        t = eng.search("def read", k=100, fl=["doc_id"], fq=fqs)
        bs = dict(zip(base["doc_id"].to_pylist(),
                      base["score"].to_pylist()))
        assert t.num_rows > 0
        for d_, s in zip(t["doc_id"].to_pylist(), t["score"].to_pylist()):
            assert d_ in allowed and s == bs[d_]

    def test_main_query_constant_score(self, gidx):
        idx, _ = gidx
        t = SearchEngine(idx).search(
            "{!geofilt sfield=lat,lon pt=10,20 d=5000}", k=5)
        assert set(t["score"].to_pylist()) <= {1.0}

    def test_errors(self, gidx):
        idx, _ = gidx
        eng = SearchEngine(idx)
        with pytest.raises(ValueError, match="requires d="):
            eng.match_ids("{!geofilt sfield=lat,lon pt=0,0}")
        with pytest.raises(ValueError, match="unknown spatial column"):
            eng.match_ids("{!geofilt sfield=nope,lon pt=0,0 d=1}")


class TestGeodistFunc:
    """geodist() as a bf/boost function query over the lat/lon stored
    columns — distance-based score shaping (Solr bf=recip(geodist..))."""

    BF = "recip(geodist(lat,lon,10,20),1,1000,1)"

    def test_bf_adds_distance_decay(self, gidx):
        idx, corpus = gidx
        eng = SearchEngine(idx)
        base = eng.search("def read", k=200, fl=["doc_id"])
        boosted = eng.search("def read", k=200, fl=["doc_id"],
                             bf=self.BF)
        bs = dict(zip(base["doc_id"].to_pylist(),
                      base["score"].to_pylist()))
        la, lo = coords(corpus)
        for d, s in zip(boosted["doc_id"].to_pylist(),
                        boosted["score"].to_pylist()):
            # missing coordinate components read as 0.0 (the numeric
            # DocValues default), per component
            dist = haversine(10.0, 20.0, np.nan_to_num(la[d]),
                             np.nan_to_num(lo[d]))
            assert s == pytest.approx(bs[d] + 1000.0 / (dist + 1.0),
                                      rel=1e-9)

    def test_distributed_identity(self, gidx):
        from solr_indexer_ray.pipelines.search import search_partitioned

        idx, _ = gidx
        single = SearchEngine(idx).search("def read", k=10,
                                          fl=["doc_id"], bf=self.BF)
        dist = search_partitioned(idx, "def read", k=10, bf=self.BF)
        assert single["doc_id"].to_pylist() == dist["doc_id"].to_pylist()
        assert single["score"].to_pylist() == dist["score"].to_pylist()


class TestIntersects:
    @pytest.mark.parametrize("env", [
        "ENVELOPE(-30, 30, 40, -40)",
        "ENVELOPE(150, -150, 20, -20)",   # query crosses the dateline
        "ENVELOPE(0, 1, 1, 0)",
    ])
    def test_vs_brute(self, gidx, env):
        from solr_indexer_ray.functions.spatial import (
            parse_envelope_to_bbox,
        )

        idx, corpus = gidx
        qw, qs, qe, qn = parse_envelope_to_bbox(env)

        def lon_hit(aw, ae, bw, be):
            a_parts = [(aw, ae)] if aw <= ae else [(aw, 180.0),
                                                   (-180.0, ae)]
            b_parts = [(bw, be)] if bw <= be else [(bw, 180.0),
                                                   (-180.0, be)]
            return any(
                x1 <= y2 and x2 >= y1
                for x1, x2 in a_parts for y1, y2 in b_parts
            )

        exp = []
        for i, v in enumerate(corpus["bbox"].to_pylist()):
            if v is None:
                continue
            w, s, e, n = parse_envelope_to_bbox(v)
            if s <= qn and n >= qs and lon_hit(qw, qe, w, e):
                exp.append(i)
        got = SearchEngine(idx).match_ids(
            f"{{!intersects sfield=bbox}}{env}"
        )
        assert got.tolist() == exp

    def test_bad_envelope(self, gidx):
        idx, _ = gidx
        from solr_indexer_ray.functions.spatial import SpatialError

        with pytest.raises(SpatialError):
            SearchEngine(idx).match_ids("{!intersects sfield=bbox}nope")
