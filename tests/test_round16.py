"""Round-5 hardening block: nullable-field significant_terms vs the
DuckDB oracle (the bg_tot / fg_tot null-bucket contract), snapshot
member path-safety, and the scan()/pinned regressions' sibling checks.
"""

import io
import os
import tarfile

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.oracles import significant_terms_sql
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.stages.build import IndexSpec, build_index
from opensearch_jvector_ray.state.manifest import (
    restore_index, snapshot_index,
)

CFG = EngineConfig(num_segments=3)

TEXTS = ["alpha beta sort merge", "alpha gamma merge sort",
         "beta gamma sort merge scan", "alpha beta gamma",
         "gamma delta sort", "alpha scan", "beta merge sort",
         "delta eps sort merge", "alpha delta merge", "beta delta"] * 4
N = len(TEXTS)
# nullable stored field: every 5th doc has NO source (and several of
# those match the query terms, exercising the fg null exclusion AND
# the bg_tot count(*) rule at once)
SOURCES = [None if i % 5 == 0 else ("web", "book", "code")[i % 3]
           for i in range(N)]


def _corpus() -> pa.Table:
    return pa.table({
        "doc_id": pa.array(list(range(N)), type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string()),
        "source": pa.array(SOURCES, type=pa.string()),
    })


@pytest.fixture(scope="module")
def idx(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r16") / "idx")
    build_index(rd.from_arrow(_corpus()), out, CFG,
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=("source",), ts_col=""))
    return out


QUERIES = {"q1": "alpha merge", "q2": "delta sort"}
MS = 1e-9


def test_significant_terms_nullable_field_oracle(idx):
    # the engine excludes NULL-valued matched docs from fg buckets and
    # fg_tot (pyarrow only_valid counts) but keeps them in bg_tot (the
    # corpus row count via count_all); the generated oracle must agree
    # on BOTH rules — this was latent JLH drift while every gate field
    # was non-null
    s = IndexSearcher(idx)
    got = s.significant_terms_agg(QUERIES, field="source",
                                  min_score=MS, size=10)
    assert not got.empty
    assert got["source"].notna().all()          # no NULL bucket rows
    con = duckdb.connect()
    con.register("docs", _corpus())
    sql = significant_terms_sql(QUERIES, MS, "source", 10, CFG,
                                table="docs", id_col="doc_id",
                                text_col="text")
    exp = con.sql(sql).df()
    g = got.sort_values(["query_id", "source"]).reset_index(drop=True)
    e = exp.sort_values(["query_id", "source"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["query_id", "source", "doc_count", "bg_count", "score"]],
        e[["query_id", "source", "doc_count", "bg_count", "score"]],
        check_dtype=False, atol=0, rtol=0)
    # bg_tot sanity straight from the engine's background partial:
    # must equal the TRUE corpus row count, nulls included
    bg = s._field_value_counts("source")
    assert int(bg["bg_count"].sum()) == N


def test_pii_filter_sibling_of_scrub():
    # pii_filter drops docs by TOTAL hit count under the same
    # sequential-pattern counting rule pii_scrub_stage (and its DuckDB
    # oracle) uses; everything else passes through untouched
    from opensearch_jvector_ray.pipelines.textstats import (
        pii_filter, pii_scrub_stage,
    )
    texts = ["mail a.b+c@ex-ample.co.uk and x@y.io",
             "ip 10.0.0.1 call +1 415 555 1234",
             "clean text 1.2.3 +123",
             "edge 999.999.999.999 a@b.c"]
    tbl = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl)
    scrub = pii_scrub_stage("doc_id", "text")(tbl).to_pandas()
    totals = sum(scrub[c] for c in scrub.columns
                 if c.startswith("n_"))
    kept = pii_filter(ds).to_pandas()
    assert sorted(kept["doc_id"]) == \
        sorted(scrub["doc_id"][totals == 0])
    assert list(kept.columns) == ["doc_id", "text"]   # untouched rows
    kept2 = pii_filter(ds, max_pii=1).to_pandas()
    assert sorted(kept2["doc_id"]) == \
        sorted(scrub["doc_id"][totals <= 1])
    # NULL text = zero hits = KEPT (count_substring propagates null
    # through the comparison; an unfilled mask would silently DROP it)
    nds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["a@b.co leak", None], type=pa.string())}))
    nkept = pii_filter(nds).to_pandas()
    assert nkept["doc_id"].tolist() == [1]


def _tar_with_member(path: str, name: str, mode: int = 0o644,
                     typ=tarfile.REGTYPE) -> None:
    with tarfile.open(path, "w") as tf:
        meta = b'{"segments": [], "files": []}'
        ti = tarfile.TarInfo("_SNAPSHOT.json")
        ti.size = len(meta)
        tf.addfile(ti, io.BytesIO(meta))
        ti = tarfile.TarInfo(name)
        ti.type = typ
        if typ == tarfile.REGTYPE:
            ti.size = 3
            tf.addfile(ti, io.BytesIO(b"abc"))
        else:
            ti.linkname = "/etc/passwd"
            tf.addfile(ti)


@pytest.mark.parametrize("member,typ", [
    ("../evil.bin", tarfile.REGTYPE),
    ("/abs/evil.bin", tarfile.REGTYPE),
    ("seg=0/link", tarfile.SYMTYPE),
])
def test_restore_rejects_unsafe_members(tmp_path, member, typ):
    snap = str(tmp_path / "bad.tar")
    _tar_with_member(snap, member, typ=typ)
    with pytest.raises(ValueError, match="unsafe snapshot member"):
        restore_index(snap, str(tmp_path / "out"))


def _lowdim_vecs(n: int, dim: int = 64, d_lat: int = 16,
                 seed: int = 11) -> np.ndarray:
    """Realistic embedding shape: ambient ``dim`` with intrinsic
    dimension ``d_lat`` (latent gaussian x fixed random projection +
    5% ambient noise) — the published geometry of real descriptor sets
    (SIFT-128 intrinsic dim ~12-16), NOT the IID-uniform adversarial
    floor where beam search measures concentration-of-measure."""
    g = np.random.default_rng(seed)
    proj = g.standard_normal((d_lat, dim)) / np.sqrt(d_lat)
    return (g.standard_normal((n, d_lat)) @ proj
            + 0.05 * g.standard_normal((n, dim))).astype(np.float32)


def test_graph_merge_keeps_recall_on_realistic_embeddings(tmp_path):
    """The reference's headline merge property (incremental merge keeps
    recall — README.md:137-148; floor gate RecallTestsIT.java:101,150)
    demonstrated on a realistic low-intrinsic-dim corpus: pre-merge
    partitioned recall >= 0.9 and the 4-way incrementally-merged graph
    holds >= 0.75 at the reference's own floor."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    from opensearch_jvector_ray.pipelines import knn as knn_pl
    n, dim, k = 12000, 64, 10
    vecs = _lowdim_vecs(n, dim)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1)), dim).cast(
                pa.list_(pa.float32())),
    })
    rng = np.random.default_rng(5)
    picks = rng.choice(n, 30, replace=False)
    queries = {f"q{i:02d}": (vecs[s]
                             + 0.1 * rng.standard_normal(dim)
                             .astype(np.float32))
               for i, s in enumerate(picks)}
    ds = rd.from_arrow(tbl)
    truth_df = knn_pl.brute_force_topk(ds, queries, k)
    truth = {q: set(g["vec_id"])
             for q, g in truth_df.groupby("query_id")}

    def recall(df) -> float:
        got = df.groupby("query_id")["vec_id"].apply(set)
        return float(np.mean([
            len(got.get(q, set()) & truth[q]) / k for q in truth]))

    gdir = str(tmp_path / "graph")
    graph_pl.build_graph_index(ds, gdir, num_parts=4)
    pre = recall(graph_pl.graph_topk(gdir, queries, k, ef_search=100))
    assert pre >= 0.9, pre
    mdir = str(tmp_path / "merged")
    graph_pl.merge_graph_index(gdir, mdir, merge_factor=4,
                               mode="incremental")
    post = recall(graph_pl.graph_topk(mdir, queries, k, ef_search=100))
    assert post >= 0.75, (pre, post)


def test_scan_randomized_tiling(idx):
    """Seeded randomized scan: random page sizes and query mixes with
    wildly different ranking lengths must tile the full ranking exactly
    — no duplicates, no gaps (the round-5 mixed-exhaustion fix under
    randomized shapes)."""
    s = IndexSearcher(idx)
    rng = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "scan",
             "merge", "sort"]
    for trial in range(6):
        qs = {f"q{j}": " ".join(rng.choice(vocab,
                                           size=rng.integers(1, 4),
                                           replace=False))
              for j in range(int(rng.integers(1, 4)))}
        page = int(rng.integers(1, 9))
        pages = list(s.scan(qs, page_size=page))
        assert all(len(p.groupby("query_id")) <= len(qs) for p in pages)
        stitched = (pd.concat(pages, ignore_index=True)
                    if pages else pd.DataFrame(
                        columns=["query_id", "doc_id", "score"]))
        for qid, text in qs.items():
            got = stitched[stitched["query_id"] == qid]
            full = s.search({qid: text}, k=N)
            assert not got["doc_id"].duplicated().any(), (trial, qid)
            assert list(got["doc_id"]) == list(full["doc_id"]), \
                (trial, qid, page)
            assert list(got["score"]) == list(full["score"])


def test_significant_terms_randomized_null_fractions(tmp_path):
    """Seeded randomized nullable-field JLH: random null fractions and
    corpus shapes, engine vs DuckDB oracle value-exact every draw."""
    rng = np.random.default_rng(31)
    for trial in range(3):
        n = int(rng.integers(60, 140)) * 2
        words = ["alpha", "beta", "gamma", "delta", "merge", "sort"]
        texts = [" ".join(rng.choice(words, size=6))
                 for _ in range(n)]
        null_frac = float(rng.uniform(0.05, 0.5))
        srcs = [None if rng.random() < null_frac
                else str(rng.choice(["web", "book", "code"]))
                for _ in range(n)]
        tbl = pa.table({
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "source": pa.array(srcs, type=pa.string()),
        })
        out = str(tmp_path / f"sig{trial}")
        build_index(rd.from_arrow(tbl), out, CFG,
                    IndexSpec(text_col="text", key_cols=("doc_id",),
                              store_cols=("source",), ts_col=""))
        s = IndexSearcher(out)
        got = s.significant_terms_agg({"q": "alpha merge"},
                                      field="source", min_score=MS,
                                      size=10)
        con = duckdb.connect()
        con.register("docs", tbl)
        exp = con.sql(significant_terms_sql(
            {"q": "alpha merge"}, MS, "source", 10, CFG, table="docs",
            id_col="doc_id", text_col="text")).df()
        g = got.sort_values(["query_id", "source"]).reset_index(drop=True)
        e = exp.sort_values(["query_id", "source"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            g[["query_id", "source", "doc_count", "bg_count", "score"]],
            e[["query_id", "source", "doc_count", "bg_count", "score"]],
            check_dtype=False, atol=0, rtol=0)
        assert int(s._field_value_counts("source")["bg_count"].sum()) \
            == n, trial


def test_resume_invalidates_on_spec_change(tmp_path):
    """Segment fingerprints cover the SPEC, not just the config: a
    re-run into the same dir with a different text_col must REBUILD
    (resume finds no matching segments) — it used to silently reuse
    postings built over the other column while config.json advertised
    the new spec."""
    from opensearch_jvector_ray.query import IndexSearcher
    out = str(tmp_path / "idx")
    tbl = pa.table({
        "doc_id": pa.array(list(range(30)), type=pa.int64()),
        "text": pa.array(["alpha beta"] * 30),
        "summary": pa.array(["gamma delta"] * 30),
    })
    build_index(rd.from_arrow(tbl), out, CFG,
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=(), ts_col=""))
    res = build_index(rd.from_arrow(tbl), out, CFG,
                      IndexSpec(text_col="summary",
                                key_cols=("doc_id",),
                                store_cols=(), ts_col=""))
    assert res.segments_built > 0          # NOT a skipped resume
    s = IndexSearcher(out)
    assert len(s.search({"q": "gamma"}, min_score=0.0)) == 30
    assert len(s.search({"q": "alpha"}, min_score=0.0)) == 0


def test_deletes_apply_to_float_and_timestamp_keys(tmp_path):
    """Tombstone keys route through the SAME Arrow cast as the table
    side: str(1.0)='1.0' vs Arrow '1' used to make deletes silently
    no-ops on non-string/int key columns."""
    from opensearch_jvector_ray.query import IndexSearcher
    out = str(tmp_path / "fidx")
    tbl = pa.table({
        "fkey": pa.array([float(i) for i in range(20)],
                         type=pa.float64()),
        "text": pa.array(["alpha beta"] * 20),
    })
    build_index(rd.from_arrow(tbl), out, CFG,
                IndexSpec(text_col="text", key_cols=("fkey",),
                          store_cols=(), ts_col=""),
                deletes=[(3.0,), (7.0,)])
    hits = IndexSearcher(out).search({"q": "alpha"}, min_score=0.0)
    assert len(hits) == 18
    assert 3.0 not in set(hits["fkey"]) and 7.0 not in set(hits["fkey"])


def test_plan_merge_groups_enforces_member_cap():
    from opensearch_jvector_ray.stages.merge import plan_merge_groups

    class M:                                  # manifest stub
        def __init__(self, n):
            self.num_docs = n

    sizes = {0: 9_000_000, **{i: 1_000 for i in range(1, 16)}}
    groups = plan_merge_groups({k: M(v) for k, v in sizes.items()},
                               merge_factor=4)
    assert all(len(g) <= 4 for g in groups), groups
    assert sorted(s for g in groups for s in g) == sorted(sizes)


def test_merge_resume_rejects_stale_grouping(tmp_path):
    """A dst dir holding segments merged under a DIFFERENT grouping
    (source appended / merge_factor changed between runs) must refuse
    instead of silently mixing old-grouping outputs into the published
    stats and dictionary."""
    from opensearch_jvector_ray.stages.merge import merge_index
    src = str(tmp_path / "src")
    build_index(rd.from_arrow(_corpus()), src, CFG,
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=(), ts_col=""))
    dst = str(tmp_path / "dst")
    merge_index(src, dst, merge_factor=2)
    # same dst, different factor -> every done gid's membership differs
    with pytest.raises(ValueError, match="DIFFERENT grouping"):
        merge_index(src, dst, merge_factor=3)
    # re-running the SAME plan stays a clean no-op resume
    merge_index(src, dst, merge_factor=2)


def test_minhash_dedup_string_ids():
    """The whole dedup family must accept string doc ids — the distinct
    pair path used to crash on a hardcoded int64 structured dtype."""
    from opensearch_jvector_ray.pipelines import dedup as dd
    texts = ["alpha beta gamma delta epsilon zeta"] * 3 + \
            ["eta theta iota kappa lambda mu"] * 3 + \
            ["nu xi omicron pi rho sigma"]
    tbl = pa.table({"url": pa.array([f"u{i:03d}" for i in range(7)]),
                    "text": pa.array(texts)})
    out = dd.minhash_lsh_dedup(rd.from_arrow(tbl), CFG, "url", "text",
                               threshold=0.9)
    got = dict(zip(out["url"], out["cluster_id"]))
    assert got == {"u000": "u000", "u001": "u000", "u002": "u000",
                   "u003": "u003", "u004": "u003", "u005": "u003"}
    with pytest.raises(ValueError, match="divisible"):
        dd.minhash_lsh_dedup(rd.from_arrow(tbl), CFG, "url", "text",
                             num_perm=64, bands=12)


def test_parser_validation_round16():
    from opensearch_jvector_ray.analyze import (
        parse_boosted_query, parse_prefix_query,
    )
    from opensearch_jvector_ray.query_dsl import parse_query
    with pytest.raises(ValueError, match="non-finite"):
        parse_boosted_query("fast^nan merge", CFG)
    with pytest.raises(ValueError, match="non-finite"):
        parse_boosted_query("fast^inf", CFG)
    # structured bool terms round-trip through the +/- text syntax:
    # whitespace or leading +/- would silently change clause membership
    for bad in (["-foo"], ["+foo"], ["new york"], [" x"], [""]):
        with pytest.raises(ValueError, match="bare term"):
            parse_query({"bool": {"must": bad}})
    # prefix stems respect cfg.lowercase (case-sensitive configs)
    cs = EngineConfig(num_segments=1, lowercase=False)
    tw, prefixes = parse_prefix_query("Serv* data", cs)
    assert prefixes == ["Serv"]
    tw, prefixes = parse_prefix_query("Serv* data", CFG)
    assert prefixes == ["serv"]


def test_alias_concurrent_mutations_keep_both(tmp_path, idx):
    """put_alias is read-modify-write under a file lock: interleaved
    mutators must not lose each other's aliases."""
    from opensearch_jvector_ray.aliases import get_aliases, put_alias
    for i in range(4):
        put_alias(idx, f"a{i}")
    assert set(get_aliases(idx)) >= {"a0", "a1", "a2", "a3"}


def test_build_rejects_unknown_mode(tmp_path):
    # an unknown mode used to fall through every physical-plan branch
    # and "finish" an EMPTY index — must fail eagerly instead
    with pytest.raises(ValueError, match="unknown build mode"):
        build_index(rd.from_arrow(_corpus()), str(tmp_path / "x"),
                    CFG, IndexSpec(text_col="text", key_cols=("doc_id",),
                                   store_cols=(), ts_col=""),
                    mode="fragment")


def test_serve_respawns_dead_shard_actor(idx):
    """Replica-recovery analog: ray.kill a shard actor, the next search
    transparently respawns it from the recorded per-actor segment
    assignment and returns frames identical to the healthy service
    (cold caches, same ranking)."""
    import ray

    from opensearch_jvector_ray.serve import SearchService
    svc = SearchService(idx, num_shards=2, request_cache_size=0)
    before = svc.search(QUERIES, k=8)
    ray.kill(svc.actors[0])
    after = svc.search(QUERIES, k=8)
    pd.testing.assert_frame_equal(before, after)
    assert svc.respawns == 1
    # aggregations fan out through the same retry path
    ray.kill(svc.actors[1])
    facet = svc.agg.facet_counts(QUERIES, "source", MS)
    assert svc.respawns == 2
    assert not facet.empty
    svc.shutdown()


def _vec_table_r16(vecs: np.ndarray, ids=None) -> pa.Table:
    n = len(vecs)
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    })


def test_graph_update_delete_then_readd_revives(tmp_path):
    """update = delete + insert must really work on the graph index: a
    tombstoned id re-added with a NEW vector becomes searchable with
    the new vector's ranking (the dead row is physically compacted
    out, the tombstone clears) — it used to be silently dropped by the
    idempotence check and stay masked forever."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    from opensearch_jvector_ray.pipelines import knn as knn_pl
    rng = np.random.default_rng(41)
    vecs = rng.standard_normal((120, 16)).astype(np.float32)
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(rd.from_arrow(_vec_table_r16(vecs)), idx,
                               num_parts=3, m_degree=8,
                               ef_construction=32)
    victim = 7
    graph_pl.delete_from_graph_index(idx, [victim])
    new_vec = rng.standard_normal(16).astype(np.float32)
    graph_pl.add_to_graph_index(
        rd.from_arrow(_vec_table_r16(new_vec[None, :], ids=[victim])),
        idx)
    vecs2 = vecs.copy()
    vecs2[victim] = new_vec
    queries = {"q0": new_vec.astype(np.float64),
               "q1": vecs[40].astype(np.float64)}
    exact = knn_pl.brute_force_topk(
        rd.from_arrow(_vec_table_r16(vecs2)), queries, 10,
        metric="cosine", round_decimals=6)
    got = graph_pl.graph_topk(idx, queries, 10, ef_search=len(vecs2),
                              round_decimals=6)
    pd.testing.assert_frame_equal(got, exact)
    # the revived id ranks FIRST for its own vector (not masked)
    assert got[got.query_id == "q0"].iloc[0]["vec_id"] == victim
    # tombstone sidecar cleared
    from opensearch_jvector_ray.pipelines.knn import _load_tombstones
    t = _load_tombstones(idx, "vec_id")
    assert t is None or victim not in set(t.tolist())


def test_graph_add_after_merge_no_duplicates(tmp_path):
    """A merge changes num_parts, so the add path cannot trust the
    hash route for idempotence: re-adding ids that already live in the
    merged index must be a global no-op (it used to duplicate them in
    a different partition)."""
    import glob

    import pyarrow.parquet as pq_mod

    from opensearch_jvector_ray.pipelines import graph as graph_pl
    from opensearch_jvector_ray.pipelines import knn as knn_pl
    rng = np.random.default_rng(43)
    vecs = rng.standard_normal((160, 16)).astype(np.float32)
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(rd.from_arrow(_vec_table_r16(vecs)), idx,
                               num_parts=4, m_degree=8,
                               ef_construction=32)
    merged = str(tmp_path / "m")
    graph_pl.merge_graph_index(idx, merged, merge_factor=2,
                               mode="incremental")
    # re-add an overlapping slice (an interrupted-ingest replay)
    graph_pl.add_to_graph_index(
        rd.from_arrow(_vec_table_r16(vecs[30:60],
                                     ids=np.arange(30, 60))), merged)
    all_ids = []
    for f in glob.glob(os.path.join(merged, "part=*", "graph.parquet")):
        all_ids.extend(pq_mod.read_table(
            f, columns=["vec_id"])["vec_id"].to_pylist())
    assert len(all_ids) == len(set(all_ids)) == len(vecs)
    queries = {"q": vecs[31].astype(np.float64)}
    exact = knn_pl.brute_force_topk(
        rd.from_arrow(_vec_table_r16(vecs)), queries, 10,
        metric="cosine", round_decimals=6)
    got = graph_pl.graph_topk(merged, queries, 10,
                              ef_search=len(vecs), round_decimals=6)
    pd.testing.assert_frame_equal(got, exact)


def test_graph_service_refresh_sees_added_rows(tmp_path):
    """GraphSearchService actors decode graphs at open; refresh()
    re-opens at the current on-disk state so post-open adds become
    visible (deletes were already live via the tombstone re-read)."""
    from opensearch_jvector_ray.pipelines import graph as graph_pl
    rng = np.random.default_rng(47)
    vecs = rng.standard_normal((90, 16)).astype(np.float32)
    idx = str(tmp_path / "g")
    graph_pl.build_graph_index(
        rd.from_arrow(_vec_table_r16(vecs[:60])), idx, num_parts=2,
        m_degree=8, ef_construction=32)
    svc = graph_pl.GraphSearchService(idx, num_shards=2)
    try:
        queries = {"q": vecs[70].astype(np.float64)}
        before = svc.search(queries, 5, ef_search=90)
        graph_pl.add_to_graph_index(
            rd.from_arrow(_vec_table_r16(vecs[60:],
                                         ids=np.arange(60, 90))), idx)
        stale = svc.search(queries, 5, ef_search=90)
        pd.testing.assert_frame_equal(stale, before)   # documented
        svc.refresh()
        fresh = svc.search(queries, 5, ef_search=90)
        direct = graph_pl.graph_topk(idx, queries, 5, ef_search=90)
        pd.testing.assert_frame_equal(fresh, direct)
        assert int(fresh.iloc[0]["vec_id"]) == 70
        with pytest.raises(ValueError, match="radial"):
            svc.search(queries, None, ef_search=90)
    finally:
        svc.shutdown()


def test_snapshot_restore_roundtrip_still_works(idx, tmp_path):
    snap = str(tmp_path / "snap.tar")
    snapshot_index(idx, snap)
    out = str(tmp_path / "restored")
    res = restore_index(snap, out)
    assert res["ok"]
    s0, s1 = IndexSearcher(idx), IndexSearcher(out)
    a = s0.search(QUERIES, k=10)
    b = s1.search(QUERIES, k=10)
    pd.testing.assert_frame_equal(a, b)
