"""Round-4 operators: unigram-LM cross-entropy scoring (pipelines/lm.py),
conversation assembly and turn-level exact dedup over the input_hint
transcript shape (pipelines/transcripts.py).

The driver-gate parity of all three vs DuckDB is covered by
minidriver/oracle entries; these tests cover what SQL can't: the LM's
out-of-vocabulary path (train on A, score B), model reuse, and the
structural invariants of the transcript operators against brute-force
pandas references.
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from opensearch_jvector_ray.config import EngineConfig
from opensearch_jvector_ray.pipelines import lm as lm_pl
from opensearch_jvector_ray.pipelines import transcripts as tr_pl

CFG = EngineConfig()


def _docs(texts: list[str]) -> "rd.Dataset":
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


def _brute_xent(texts: list[str], train_texts: list[str]) -> list[float]:
    toks = [t.lower().split() for t in train_texts]
    counts: dict[str, int] = {}
    for ts in toks:
        for w in ts:
            counts[w] = counts.get(w, 0) + 1
    T, V = sum(counts.values()), len(counts)
    denom = float(T) + float(V)
    q = {w: math.floor(math.log((c + 1.0) / denom) * 1e6)
         for w, c in counts.items()}
    q_oov = math.floor(math.log(1.0 / denom) * 1e6)
    out = []
    for t in texts:
        ws = t.lower().split()
        if not ws:
            out.append(0.0)
            continue
        micro = sum(q.get(w, q_oov) for w in ws)
        out.append(-float(micro) / (len(ws) * 1e6))
    return out


def test_lm_xent_self_matches_brute():
    texts = ["data model data", "agent tool agent tool agent",
             "data", "", "model model model model"]
    got = lm_pl.lm_xent(_docs(texts), CFG, "doc_id", "text") \
               .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = _brute_xent(texts, texts)
    assert got["xent"].tolist() == exp
    assert got["n_tokens_all"].tolist() == [3, 5, 1, 0, 4]
    # rarer tokens -> higher xent; the all-head-term doc scores lowest
    assert got["xent"][4] < got["xent"][1]


def test_lm_xent_oov_scores_held_out_split():
    train = ["data model data model", "agent tool data"]
    held = ["data zebra", "zebra nebula quantum"]  # all-OOV last doc
    lm = lm_pl.train_unigram_lm(_docs(train), CFG, "text")
    assert lm.total_tokens == 7 and lm.vocab_size == 4
    got = lm_pl.lm_xent(_docs(held), CFG, "doc_id", "text", lm=lm) \
               .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = _brute_xent(held, train)
    assert got["xent"].tolist() == exp
    # the all-OOV doc must score exactly -q_oov/1e6 per token
    assert got["xent"][1] == -float(lm.q_oov) / 1e6
    # and strictly worse than the in-vocab-heavy doc
    assert got["xent"][1] > got["xent"][0]


def _turns(rows) -> "rd.Dataset":
    conv, idx, role, text = zip(*rows)
    return rd.from_arrow(pa.table({
        "conv_id": pa.array(conv, type=pa.string()),
        "turn_idx": pa.array(idx, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": pa.array(text, type=pa.string()),
    }))


def test_assemble_conversations_orders_and_joins():
    # out-of-order input: assembly must sort by (conv_id, turn_idx)
    ds = _turns([
        ("conv-0000002", 1, "assistant", "two b"),
        ("conv-0000001", 0, "user", "one a"),
        ("conv-0000002", 0, "user", "two a"),
        ("conv-0000001", 1, "assistant", "one b"),
        ("conv-0000001", 2, "tool", "one c"),
    ])
    got = tr_pl.assemble_conversations(ds, num_parts=4).to_pandas() \
               .sort_values("conv_id").reset_index(drop=True)
    assert got["conv_id"].tolist() == ["conv-0000001", "conv-0000002"]
    assert got["n_turns"].tolist() == [3, 2]
    assert got["conv_text"][0] == "user: one a\nassistant: one b\ntool: one c"
    assert got["conv_text"][1] == "user: two a\nassistant: two b"


def test_turn_dedup_flags_planted_copies():
    base = [
        ("conv-0000000", 0, "user", "alpha beta"),
        ("conv-0000000", 1, "assistant", "gamma delta"),  # plant target
        ("conv-0000097", 0, "user", "epsilon zeta"),
        ("conv-0000097", 1, "assistant", "eta theta"),    # plant target
        ("conv-0000001", 0, "user", "alpha beta"),        # natural dup of turn 0
    ]
    aug = tr_pl.plant_duplicate_turns(_turns(base))
    got = tr_pl.turn_dedup(aug, CFG, num_parts=4).to_pandas() \
               .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(base) + 2  # two planted copies
    by = dict(zip(got["doc_id"], got["keep"]))
    # planted copies keep=0, originals keep=1
    assert by["dupe-0000000:0000000001"] == 0 and by["conv-0000000:0000000001"] == 1
    assert by["dupe-0000097:0000000001"] == 0 and by["conv-0000097:0000000001"] == 1
    # natural dup: min doc key wins
    assert by["conv-0000000:0000000000"] == 1 and by["conv-0000001:0000000000"] == 0
    # hashes agree between original and planted copy
    h = dict(zip(got["doc_id"], got["text_hash"]))
    assert h["dupe-0000000:0000000001"] == h["conv-0000000:0000000001"]


def test_turn_dedup_normalizes_punctuation_and_case():
    ds = _turns([
        ("conv-0000000", 0, "user", "Alpha, Beta!"),
        ("conv-0000003", 0, "user", "alpha beta"),
    ])
    got = tr_pl.turn_dedup(ds, CFG, num_parts=2).to_pandas() \
               .sort_values("doc_id").reset_index(drop=True)
    assert got["keep"].tolist() == [1, 0]
    assert got["text_hash"][0] == got["text_hash"][1]


def test_mix_sources_rates_and_determinism():
    from opensearch_jvector_ray.pipelines import corpus as corpus_pl
    n = 2000
    tbl = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "source": pa.array(["full", "half", "none", "other"][0:4] * (n // 4)),
    })
    rates = {"full": 1.0, "half": 0.5, "none": 0.0}
    got = corpus_pl.mix_sources(rd.from_arrow(tbl), "doc_id", "source",
                                rates, salt="t", default_rate=0.25) \
                   .to_pandas().sort_values("doc_id").reset_index(drop=True)
    by = got.groupby("source").size().to_dict()
    assert by.get("full") == n // 4            # rate>=1 keeps everything
    assert "none" not in by                    # rate 0 drops everything
    assert 0.35 * n / 4 < by.get("half", 0) < 0.65 * n / 4
    assert 0.10 * n / 4 < by.get("other", 0) < 0.40 * n / 4  # default rate
    # determinism: a second run is bit-identical
    again = corpus_pl.mix_sources(rd.from_arrow(tbl), "doc_id", "source",
                                  rates, salt="t", default_rate=0.25) \
                     .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again)
    # independence: a different salt draws a different sample
    other = corpus_pl.mix_sources(rd.from_arrow(tbl), "doc_id", "source",
                                  rates, salt="u", default_rate=0.25) \
                     .to_pandas()
    assert set(other.doc_id) != set(got.doc_id)


def test_bpe_count_stage_edges():
    from opensearch_jvector_ray.pipelines.textstats import bpe_count_stage
    texts = ["don't stop", "hello,world!!", "a1b2 c3", "", "   ",
             "it's we'll they've I'd"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    got = bpe_count_stage("doc_id", "text")(tbl).to_pandas()
    # don't -> don / 't / stop ; hello,world!! -> hello , world !!
    assert got["n_bpe_tokens"].tolist() == [3, 4, 6, 0, 0, 8]
    assert got["n_ws_tokens"].tolist() == [2, 1, 2, 0, 0, 4]


def test_cli_corpus_ops(tmp_path):
    import json as _json
    import os
    import subprocess
    import sys
    env = {**os.environ, "PYTHONPATH": "/root/repo"}

    def run(*argv):
        r = subprocess.run([sys.executable, "-m", "opensearch_jvector_ray",
                            *argv], capture_output=True, text=True, env=env,
                           cwd="/root/repo", timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    docs = "/root/testdata/sf0.001/documents.parquet"
    out = run("corpus", "--input", docs, "--op", "sample",
              "--rate", "0.25", "--salt", "s1",
              "--out", str(tmp_path / "sample"))
    assert 0 < out["rows"] < 500
    out2 = run("corpus", "--input", docs, "--op", "mix",
               "--mix", "src0=1.0,src1=0.5", "--default-rate", "0.0",
               "--out", str(tmp_path / "mix"))
    assert 25 <= out2["rows"] <= 40  # src0 fully kept, src1 halved
    out3 = run("corpus", "--input", docs, "--op", "lm-score",
               "--out", str(tmp_path / "lm"))
    assert out3["rows"] == 500


def test_gopher_filter_stage_rules():
    from opensearch_jvector_ray.pipelines.textstats import gopher_filter_stage
    texts = [
        "the data model is good and the test will pass for sure",  # 12 toks
        "",                                                 # empty
        "word",                                             # single token
        "spam spam spam spam spam spam",                    # repetitive
        "the of and a b c d e f g h i j",                   # short tokens
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    fn = gopher_filter_stage(CFG, "doc_id", "text", min_tokens=5,
                             max_tokens=100, min_mean_len=2.0,
                             max_mean_len=10.0, min_stop_hits=2,
                             min_alpha_ratio=0.8,
                             max_dup_token_ratio=0.5,
                             max_dup_bigram_ratio=0.9)
    got = fn(tbl).to_pandas()
    assert got["keep"].tolist()[0] == 1 and got["fail_mask"][0] == 0
    # empty doc: token count + mean-len + stop + alpha + (not dup: 0.0)
    assert got["fail_mask"][1] & 1 and got["fail_mask"][1] & 2
    assert got["fail_mask"][1] & 4 and got["fail_mask"][1] & 8
    assert not (got["fail_mask"][1] & 16)
    # single token: under min count, no stop hits
    assert got["fail_mask"][2] & 1 and got["fail_mask"][2] & 4
    # repetitive: dup-token ratio 1 - 1/6 > 0.5
    assert got["fail_mask"][3] & 16
    # short tokens: mean length (12+11 single chars)/13 < 2.0
    assert got["fail_mask"][4] & 2


def test_tool_usage_stats_brute():
    import datetime
    rows = []
    base = datetime.datetime(2024, 1, 1)
    for c in range(6):
        for t in range(4):
            tool = "search_tool" if (c + t) % 3 == 0 else \
                   ("code_tool" if t == 2 else "")
            rows.append({"conv_id": f"conv-{c:07d}", "turn_idx": t,
                         "role": "user", "text": "x",
                         "tool": tool,
                         "ts": base + datetime.timedelta(seconds=c * 10 + t)})
    df = pd.DataFrame(rows)
    got = tr_pl.tool_usage_stats(rd.from_pandas(df))
    ref = df[df.tool != ""].groupby("tool").agg(
        n_calls=("turn_idx", "size"),
        n_convs=("conv_id", "nunique"),
        mean_turn_idx=("turn_idx", "mean"),
        first_ts=("ts", "min"), last_ts=("ts", "max")).reset_index() \
        .sort_values("tool").reset_index(drop=True)
    assert got["tool"].tolist() == ref["tool"].tolist()
    assert got["n_calls"].tolist() == ref["n_calls"].tolist()
    assert got["n_convs"].tolist() == ref["n_convs"].tolist()
    assert got["mean_turn_idx"].tolist() == ref["mean_turn_idx"].tolist()
    assert (got["first_ts"].astype("datetime64[us]").tolist()
            == ref["first_ts"].astype("datetime64[us]").tolist())


def test_brute_radial_dataset_variant_matches_pandas():
    from opensearch_jvector_ray.pipelines import knn as knn_pl
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(range(300), type=pa.int64()),
                    "embedding": pa.array(list(vecs.tolist()))})
    q = {"q0": vecs[5].astype(np.float64)}
    df = knn_pl.brute_force_topk(rd.from_arrow(tbl), q, None,
                                 metric="cosine", round_decimals=6,
                                 min_score=0.2)
    stream = knn_pl.brute_force_topk(rd.from_arrow(tbl), q, None,
                                     metric="cosine", round_decimals=6,
                                     min_score=0.2, as_dataset=True)
    got = stream.to_pandas().sort_values("vec_id").reset_index(drop=True)
    exp = df.sort_values("vec_id").reset_index(drop=True)
    assert got["vec_id"].tolist() == exp["vec_id"].tolist()
    assert got["score"].tolist() == exp["score"].tolist()
    assert len(got) > 0


def test_lm_xent_zero_token_corpus_does_not_crash():
    # review repro: Sum over the empty counts dataset returns None and
    # _build_lut used to concat zero tables
    out = lm_pl.lm_xent(_docs(["", "   "]), CFG, "doc_id", "text") \
               .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["xent"].tolist() == [0.0, 0.0]
    assert out["n_tokens_all"].tolist() == [0, 0]


def test_self_overlap_brute():
    from opensearch_jvector_ray.pipelines import dedup as dedup_pl
    texts = [
        "alpha beta gamma delta",       # shares 'alpha beta gamma' w/ doc1
        "alpha beta gamma epsilon",
        "zeta eta theta iota",          # no shared windows
        "xy",                           # < k tokens: absent from output
    ]
    ds = _docs(texts)
    got = dedup_pl.self_overlap(ds, CFG, "doc_id", "text") \
                  .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [0, 1, 2]   # doc 3 has no windows
    assert got["n_shingles"].tolist() == [2, 2, 2]
    assert got["n_hits"].tolist() == [1, 1, 0]
    assert got["has_overlap"].tolist() == [1, 1, 0]


def test_matched_positions_highlight(tmp_path):
    import ray.data as rd_
    from opensearch_jvector_ray.stages.build import IndexSpec, build_index
    from opensearch_jvector_ray.query import IndexSearcher
    texts = [
        "zebra the zebra jumps",     # zebra at pre-stop positions 0 and 2
        "nothing relevant here",
        "jumps over the lazy zebra", # zebra at 4, jumps at 0 (stop 'the'
                                     # and 'over'? 'over' is not a stopword)
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    idx = str(tmp_path / "hidx")
    build_index(rd_.from_arrow(tbl), idx, EngineConfig(num_segments=2),
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=(), ts_col=""))
    out = IndexSearcher(idx).matched_positions({"q": "zebra jumps"}, k=3)
    got = {(r.doc_id, r.term): [] for r in out.itertuples()}
    for r in out.itertuples():
        got[(r.doc_id, r.term)].append(r.pos)
    assert got[(0, "zebra")] == [0, 2]
    assert got[(0, "jumps")] == [3]
    assert got[(2, "zebra")] == [4]
    assert got[(2, "jumps")] == [0]
    assert (1, "zebra") not in got and (1, "jumps") not in got


def test_more_like_this_selects_rare_terms(tmp_path):
    import ray.data as rd_
    from opensearch_jvector_ray.stages.build import IndexSpec, build_index
    from opensearch_jvector_ray.query import IndexSearcher
    # 'common' is in every doc (low idf); 'quetzal' only in docs 0 and 3
    texts = [
        "common quetzal nebula",
        "common filler words here",
        "common other text entirely",
        "common quetzal nebula again",
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    idx = str(tmp_path / "mltidx")
    build_index(rd_.from_arrow(tbl), idx, EngineConfig(num_segments=2),
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=(), ts_col=""))
    s = IndexSearcher(idx)
    # limit to 2 terms: the rare pair (quetzal, nebula) must win over
    # the ubiquitous 'common'
    out = s.more_like_this({"m": texts[0]}, k=4, max_query_terms=2)
    assert out.iloc[0]["doc_id"] in (0, 3)
    hit_ids = set(out["doc_id"])
    assert {0, 3} <= hit_ids
    assert 1 not in hit_ids and 2 not in hit_ids  # 'common' not selected


def test_query_dsl_more_like_this(tmp_path):
    import ray.data as rd_
    from opensearch_jvector_ray.query import IndexSearcher
    from opensearch_jvector_ray.query_dsl import execute_query, parse_query
    from opensearch_jvector_ray.stages.build import IndexSpec, build_index
    import pytest
    with pytest.raises(ValueError):
        parse_query({"more_like_this": {"like": ""}})
    with pytest.raises(ValueError):
        parse_query({"more_like_this": {"like": "x", "bogus": 1}})
    texts = ["common quetzal nebula", "common filler words here",
             "common other text entirely", "common quetzal nebula again"]
    tbl = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    idx = str(tmp_path / "didx")
    build_index(rd_.from_arrow(tbl), idx, EngineConfig(num_segments=2),
                IndexSpec(text_col="text", key_cols=("doc_id",),
                          store_cols=(), ts_col=""))
    s = IndexSearcher(idx)
    via_dsl = execute_query(
        {"more_like_this": {"like": texts[0], "k": 4,
                            "max_query_terms": 2}}, searcher=s)
    direct = s.more_like_this({"q": texts[0]}, k=4, max_query_terms=2)
    assert via_dsl["doc_id"].tolist() == direct["doc_id"].tolist()
    assert via_dsl["score"].tolist() == direct["score"].tolist()


def _brute_dsir(source: list[str], target: list[str]) -> list[float]:
    def fit(texts):
        counts: dict[str, int] = {}
        for t in texts:
            for w in t.lower().split():
                counts[w] = counts.get(w, 0) + 1
        denom = float(sum(counts.values())) + float(len(counts))
        q = {w: math.floor(math.log((c + 1.0) / denom) * 1e6)
             for w, c in counts.items()}
        return q, math.floor(math.log(1.0 / denom) * 1e6)
    qt, oov_t = fit(target)
    qs, oov_s = fit(source)
    out = []
    for t in source:
        ws = t.lower().split()
        if not ws:
            out.append(0.0)
            continue
        micro = sum(qt.get(w, oov_t) - qs.get(w, oov_s) for w in ws)
        out.append(float(micro) / 1e6)
    return out


def test_dsir_weights_matches_brute():
    target = ["data model data model data", "model query data"]
    source = ["data model",          # target-like -> high weight
              "zebra nebula zebra",  # source-only tokens -> low weight
              "data zebra", ""]
    got = lm_pl.dsir_weights(_docs(source), _docs(target), CFG,
                             "doc_id", "text") \
               .to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = _brute_dsir(source, target)
    assert got["log_weight"].tolist() == exp
    assert got["n_tokens_all"].tolist() == [2, 3, 2, 0]
    # the target-like doc outranks the source-only doc (per token too)
    assert got["log_weight"][0] / 2 > got["log_weight"][1] / 3
