"""DuckDB-verified rank identity for the FLAGSHIP transcript corpus (the
driver only registers the star-schema tables, so this check lives here):
the synthetic transcripts are registered as a view with a zero-padded
composite doc key and scored with the same generated BM25 SQL used for
the documents oracle."""

import duckdb
import numpy as np
import pandas as pd

from opensearch_jvector_ray.oracles import bm25_sql, phrase_sql
from opensearch_jvector_ray.query import IndexSearcher
from opensearch_jvector_ray.sources.tables import (
    TRANSCRIPTS_CFG, transcripts_index, transcripts_path,
)

SF = "/root/testdata/sf0.001"
QUERIES = {"t1": "zebra quantum nebula", "t2": "data model search index",
           "t3": "checkpoint lineage metric", "t4": "the data of stream"}


def _padded_key(df: pd.DataFrame) -> pd.Series:
    return df["conv_id"] + ":" + df["turn_idx"].astype(int).astype(str).str.zfill(10)


def _oracle_con():
    path = transcripts_path(SF)
    con = duckdb.connect()
    con.sql(f"""
CREATE VIEW transcripts AS
SELECT conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0') AS doc_id,
       text
FROM read_parquet('{path}/*.parquet')""")
    return con


def test_transcripts_bm25_matches_duckdb():
    idx = transcripts_index(SF)
    out = IndexSearcher(idx).search(QUERIES, k=15)
    out = out.assign(doc_id=_padded_key(out),
                     score=np.round(out["score"].astype(np.float64), 6))
    got = out[["query_id", "rank", "doc_id", "score"]].reset_index(drop=True)
    con = _oracle_con()
    sql = bm25_sql(QUERIES, 15, TRANSCRIPTS_CFG, table="transcripts",
                   id_col="doc_id")
    exp = con.sql(sql).df()
    exp["rank"] = exp["rank"].astype(np.int64)
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        exp.sort_values(["query_id", "rank"]).reset_index(drop=True),
        check_dtype=False)


def test_transcripts_phrase_matches_duckdb():
    idx = transcripts_index(SF)
    q = {"p1": "zebra quantum nebula", "p2": "data model"}
    out = IndexSearcher(idx).search(q, k=12, mode="phrase")
    out = out.assign(doc_id=_padded_key(out),
                     score=np.round(out["score"].astype(np.float64), 6))
    got = out[["query_id", "rank", "doc_id", "score"]].reset_index(drop=True)
    con = _oracle_con()
    sql = phrase_sql(q, 12, TRANSCRIPTS_CFG, table="transcripts",
                     id_col="doc_id")
    exp = con.sql(sql).df()
    exp["rank"] = exp["rank"].astype(np.int64)
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        exp.sort_values(["query_id", "rank"]).reset_index(drop=True),
        check_dtype=False)
