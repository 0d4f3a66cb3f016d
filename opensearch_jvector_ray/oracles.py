"""DuckDB oracle-SQL generators.

Each generator mirrors one engine pipeline symbol-for-symbol:
  - identical tokenization (same RE2 split pattern — DuckDB's regex engine
    is also RE2 — same lowercase, same stop list),
  - identical BM25 formula (Lucene form, float64),
  - identical rounding (round(x, 6) on reported scores only; ranking
    happens on unrounded values on both sides),
  - identical tie-breaks (score desc, id asc).

The query terms embedded in the SQL are produced by the engine's own
analyzer (`analyze.query_term_weights`), so query-side analysis can never
drift between the two implementations.
"""

from __future__ import annotations

from opensearch_jvector_ray.analyze import query_term_weights
from opensearch_jvector_ray.config import EngineConfig


def sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def stoplist_sql(cfg: EngineConfig) -> str:
    return "[" + ", ".join(sql_quote(w) for w in cfg.stopwords) + "]"


def toks_cte(cfg: EngineConfig, table: str = "documents",
             id_col: str = "doc_id", text_col: str = "text") -> str:
    """Shared CTE prefix: tok0 (all non-empty tokens) and toks
    (post-stop, then optionally stemmed — analyze.tokenize's exact
    stop->stem chain order, STEM_PATTERN shared verbatim)."""
    from opensearch_jvector_ray.analyze import STEM_PATTERN
    pat = sql_quote(cfg.split_pattern)
    stop = stoplist_sql(cfg)
    term_expr = "term"
    if cfg.stemmer == "minimal_english":
        term_expr = (f"regexp_replace(term, {sql_quote(STEM_PATTERN)}, "
                     f"'\\1')")
    return f"""
tok0 AS (
  SELECT {id_col}, unnest(regexp_split_to_array(lower({text_col}), {pat})) AS term
  FROM {table}
),
toks AS (
  SELECT {id_col}, {term_expr} AS term FROM tok0
  WHERE term <> '' AND NOT list_contains({stop}, term)
)"""


def norm_text_expr(cfg: EngineConfig, text_col: str = "text") -> str:
    """Normalized text: space-joined non-empty lowered tokens (stop kept)."""
    pat = sql_quote(cfg.split_pattern)
    return (f"array_to_string(list_filter(regexp_split_to_array("
            f"lower({text_col}), {pat}), x -> x <> ''), ' ')")


def bm25_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
             table: str = "documents", id_col: str = "doc_id",
             text_col: str = "text", filter_sql: str | None = None,
             min_score: float | None = None,
             prefix_cte: str | None = None,
             qt_cte: str | None = None,
             emit_raw: bool = False,
             score_mul_sql: str | None = None,
             score_add_sql: str | None = None,
             sort_field: str | None = None,
             sort_order: str = "desc") -> str:
    """Top-k (or radial, if min_score given) BM25 oracle.

    ``emit_raw`` appends the unrounded ``score__raw`` column — for outer
    queries that re-rank (top_hits) with the engine's raw-order rule.

    Output columns: query_id, rank, {id_col}, score — identical names to
    the engine output (driver compares by sorted column names).
    Filter semantics match the engine's pre-filter: candidates restricted,
    global df/N/avgdl UNALTERED.  ``qt_cte``, when given, REPLACES the
    static VALUES query-term block with SQL computing qt(query_id, term,
    w) — the more-like-this path, where the query terms themselves come
    from the corpus.

    ``score_mul_sql`` (function_score oracle): an expression over the
    source row (alias ``__b``) multiplied into score__raw AFTER the
    per-doc sum — exactly where the engine applies its doc boost; docs
    whose product is <= 0 are dropped (the engine's score>0 match
    predicate).  ``sort_field`` (sort-by-field oracle): ranks on
    (``__b.{sort_field}`` {sort_order}, key asc) instead of score, and
    emits the field column.
    """
    qt_rows = []
    for qid, text in sorted(queries.items()):
        for term, w in query_term_weights(text, cfg):
            qt_rows.append(f"({sql_quote(qid)}, {sql_quote(term)}, {float(w)!r})")
    qt_values = ",\n       ".join(qt_rows) if qt_rows else "('__none__', '__none__', 0.0)"
    flt = f"JOIN {table} __f ON __f.{id_col} = tf.{id_col} AND ({filter_sql})" \
        if filter_sql else ""
    limit_clause = f"WHERE rank <= {k}" if min_score is None else \
        f"WHERE score__raw >= {min_score!r}"
    pre = f"{prefix_cte},\n" if prefix_cte else ""
    qt_block = qt_cte if qt_cte is not None else \
        f"qt(query_id, term, w) AS (VALUES {qt_values})"
    assert not (score_mul_sql and score_add_sql)
    inner_name = "scores0" if (score_mul_sql or score_add_sql) \
        else "scores"
    boost_cte = f""",
scores AS (
  SELECT s.query_id, s.{id_col},
         s.score__raw * ({score_mul_sql}) AS score__raw
  FROM scores0 s JOIN {table} __b ON __b.{id_col} = s.{id_col}
  WHERE s.score__raw * ({score_mul_sql}) > 0
)""" if score_mul_sql else ""
    if score_add_sql:
        # rank_feature / distance_feature: a non-negative expression
        # over the source row (alias __b) ADDED to score__raw after the
        # per-doc sum — exactly where the engine adds its per-doc
        # feature contribution (one add per matching doc)
        boost_cte = f""",
scores AS (
  SELECT s.query_id, s.{id_col},
         s.score__raw + ({score_add_sql}) AS score__raw
  FROM scores0 s JOIN {table} __b ON __b.{id_col} = s.{id_col}
)"""
    if sort_field is not None:
        assert sort_order in ("asc", "desc")
        ranked_cte = f"""
ranked AS (
  SELECT s.query_id,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY __b.{sort_field} {sort_order.upper()},
                                     s.{id_col} ASC) AS rank,
         s.{id_col}, s.score__raw, __b.{sort_field} AS {sort_field}
  FROM scores s JOIN {table} __b ON __b.{id_col} = s.{id_col}
)"""
        extra_col = f", {sort_field}"
    else:
        ranked_cte = f"""
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)"""
        extra_col = ""
    return f"""
WITH {pre}{toks_cte(cfg, table, id_col, text_col)},
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
{qt_block},
df AS (
  SELECT term, count(DISTINCT {id_col})::DOUBLE AS df FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term
),
tf AS (
  SELECT {id_col}, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY {id_col}, term
),
{inner_name} AS (
  SELECT qt.query_id, tf.{id_col},
         -- ORDER BY inside the aggregate pins the fp summation order:
         -- without it DuckDB's parallel aggregation adds contributions in
         -- a run-dependent order, so two docs with IDENTICAL contribution
         -- multisets can differ by 1 ulp and dodge the tie-break
         sum(qt.w * ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf / (tf.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / stats.avgdl)))
             ORDER BY qt.term
            ) AS score__raw
  FROM qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.{id_col} = tf.{id_col}
  CROSS JOIN stats
  {flt}
  GROUP BY qt.query_id, tf.{id_col}
){boost_cte},{ranked_cte}
SELECT query_id, rank, {id_col}{extra_col}, round(score__raw, 6) AS score{
    ", score__raw" if emit_raw else ""}
FROM ranked {limit_clause}
ORDER BY query_id, rank
"""


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return sql_quote(v)
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return repr(float(v)) if isinstance(v, float) else repr(int(v))


def filter_spec_sql(spec: dict, alias: str = "__f") -> str:
    """SQL predicate GENERATED from the same structured-filter spec the
    engine compiles to a pyarrow expression (query_dsl.compile_filter) —
    one spec object, two backends, zero drift."""
    (kind, body), = spec.items()
    if kind == "term":
        (f, v), = body.items()
        return f"{alias}.{f} = {_sql_lit(v)}"
    if kind == "terms":
        (f, vs), = body.items()
        vals = ", ".join(_sql_lit(v) for v in vs)
        return f"{alias}.{f} IN ({vals})"
    if kind == "range":
        (f, bounds), = body.items()
        ops = {"gte": ">=", "gt": ">", "lte": "<=", "lt": "<"}
        parts = [f"{alias}.{f} {ops[b]} {_sql_lit(v)}"
                 for b, v in sorted(bounds.items()) if b in ops]
        if not parts:
            raise ValueError("[range] needs at least one bound")
        return "(" + " AND ".join(parts) + ")"
    if kind == "exists":
        return f"{alias}.{body['field']} IS NOT NULL"
    if kind == "bool":
        parts = []
        for sub in body.get("must", []):
            parts.append(filter_spec_sql(sub, alias))
        for sub in body.get("must_not", []):
            parts.append(f"NOT ({filter_spec_sql(sub, alias)})")
        should = [filter_spec_sql(sub, alias)
                  for sub in body.get("should", [])]
        if should:
            parts.append("(" + " OR ".join(should) + ")")
        if not parts:
            raise ValueError("[bool] filter needs must/must_not/should")
        return "(" + " AND ".join(parts) + ")"
    raise ValueError(f"unknown filter clause {kind!r}")


def function_score_mul_sql(spec: dict, is_ts: bool = False) -> str:
    """Multiplier expression over the source row (alias ``__b``)
    GENERATED from the engine's score_fn spec (query._doc_boost) —
    identical arithmetic, identical precomputed constants (the Python
    floats are embedded via repr, so e.g. linear's s = scale/(1-decay)
    is the SAME double on both sides).  sqrt / linear are IEEE-bit-exact
    across numpy and DuckDB; log1p / exp / gauss are libm-dependent
    (pytest-gated engine-side, not used by the hard driver oracles)."""
    field = spec["field"]
    v = f"epoch_us(__b.{field})::DOUBLE" if is_ts else \
        f"__b.{field}::DOUBLE"
    if spec["kind"] == "field_value_factor":
        missing = float(spec.get("missing", 1.0))
        v = f"coalesce({v}, {missing!r})"
        modifier = spec.get("modifier", "none")
        body = {"none": v, "sqrt": f"sqrt({v})",
                "log1p": f"ln(1.0 + {v})"}[modifier]
        return f"{float(spec.get('factor', 1.0))!r} * {body}"
    assert spec["kind"] == "decay"
    origin = float(spec["origin"])
    scale = float(spec["scale"])
    offset = float(spec.get("offset", 0.0))
    decay = float(spec.get("decay", 0.5))
    dist = f"greatest(abs({v} - {origin!r}) - {offset!r}, 0.0)"
    fn = spec.get("decay_fn", "gauss")
    if fn == "linear":
        s = scale / (1.0 - decay)
        return f"greatest(0.0, ({s!r} - {dist}) / {s!r})"
    if fn == "exp":
        import math
        lam = math.log(decay) / scale
        return f"exp({lam!r} * {dist})"
    import math
    sigma2 = -(scale * scale) / (2.0 * math.log(decay))
    return f"exp(-({dist} * {dist}) / (2.0 * {sigma2!r}))"


def boosted_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    """Oracle for IndexSearcher.boosted_search: qt weights come from the
    engine's own ``parse_boosted_query`` (``term^2.5`` syntax), so boost
    parsing can never drift; the rest is the shared BM25 CTE."""
    from opensearch_jvector_ray.analyze import parse_boosted_query
    rows = []
    for qid, text in sorted(queries.items()):
        for t, w in parse_boosted_query(text, cfg):
            rows.append(f"({sql_quote(qid)}, {sql_quote(t)}, {float(w)!r})")
    values = ",\n       ".join(rows) if rows else \
        "('__none__', '__none__', 0.0)"
    qt_cte = f"qt(query_id, term, w) AS (VALUES {values})"
    return bm25_sql({}, k, cfg, table=table, id_col=id_col,
                    text_col=text_col, qt_cte=qt_cte)


def synonym_sql(queries: dict[str, str], synonyms: dict[str, list[str]],
                k: int, cfg: EngineConfig, table: str = "documents",
                id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for IndexSearcher.synonym_search [Lucene SynonymQuery]:
    per group, tf = SUM of member tfs per doc, df = MAX of member dfs;
    groups sum in gid order (the engine's query order) — the ordered
    aggregate pins the fp summation exactly like bm25_sql."""
    from opensearch_jvector_ray.analyze import analyze_query
    rows = []
    for qid, text in sorted(queries.items()):
        gid = 0
        for t, c in query_term_weights(text, cfg):
            members = [t]
            for s in synonyms.get(t, []):
                for x in analyze_query(s, cfg):
                    if x not in members:
                        members.append(x)
            for m in members:
                rows.append(f"({sql_quote(qid)}, {gid}, {sql_quote(m)}, "
                            f"{float(c)!r})")
            gid += 1
    values = ",\n       ".join(rows) if rows else \
        "('__none__', 0, '__none__', 0.0)"
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
qt(query_id, gid, term, w) AS (VALUES {values}),
df AS (
  SELECT term, count(DISTINCT {id_col})::DOUBLE AS df FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term
),
-- group df = MAX of member dfs (members with df 0 drop in the join,
-- exactly the engine's live-member rule)
gdf AS (
  SELECT qt.query_id, qt.gid, max(df.df) AS df, max(qt.w) AS w
  FROM qt JOIN df USING (term)
  GROUP BY qt.query_id, qt.gid
),
tf AS (
  SELECT {id_col}, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY {id_col}, term
),
-- group tf = SUM of member tfs per doc (integer-exact on both sides)
gtf AS (
  SELECT qt.query_id, qt.gid, tf.{id_col}, sum(tf.tf) AS tf
  FROM qt JOIN tf USING (term)
  GROUP BY qt.query_id, qt.gid, tf.{id_col}
),
scores AS (
  SELECT g.query_id, gt.{id_col},
         sum(g.w * ln(1.0 + (stats.n - g.df + 0.5) / (g.df + 0.5))
             * (gt.tf / (gt.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / stats.avgdl)))
             ORDER BY g.gid
            ) AS score__raw
  FROM gdf g
  JOIN gtf gt ON gt.query_id = g.query_id AND gt.gid = g.gid
  JOIN dl ON dl.{id_col} = gt.{id_col}
  CROSS JOIN stats
  GROUP BY g.query_id, gt.{id_col}
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)}
ORDER BY query_id, rank
"""


def _vocab_cte(id_col: str) -> str:
    """Global term dictionary reconstructed from the corpus — identical
    by construction to the engine's dictionary (df = distinct docs)."""
    return (f"vocab AS (\n  SELECT term, count(DISTINCT {id_col})::BIGINT "
            f"AS df FROM toks GROUP BY term\n)")


def prefix_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
               max_expansions: int = 50, table: str = "documents",
               id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for IndexSearcher.prefix_search: trailing-``*`` chunks
    expand to the top ``max_expansions`` vocabulary terms with that
    prefix (df DESC, term ASC — the engine's exact cap rule); literal
    chunks analyze normally; weights for the same term ADD.  The parse
    is the engine's own ``parse_prefix_query``, so clause splitting can
    never drift."""
    from opensearch_jvector_ray.analyze import parse_prefix_query
    lit_rows, pfx_rows = [], []
    for qid, text in sorted(queries.items()):
        lits, prefixes = parse_prefix_query(text, cfg)
        for t, c in lits:
            lit_rows.append(f"({sql_quote(qid)}, {sql_quote(t)}, {float(c)!r})")
        for p in prefixes:
            pfx_rows.append(f"({sql_quote(qid)}, {sql_quote(p)})")
    lit_values = ",\n       ".join(lit_rows) if lit_rows else \
        "('__none__', '__none__', 0.0)"
    pfx_values = ",\n       ".join(pfx_rows) if pfx_rows else \
        "('__none__', '¤¤')"
    qt_cte = f"""{_vocab_cte(id_col)},
pq0(query_id, pfx) AS (VALUES {pfx_values}),
px AS (
  SELECT query_id, term FROM (
    SELECT p.query_id, v.term,
           row_number() OVER (PARTITION BY p.query_id, p.pfx
                              ORDER BY v.df DESC, v.term ASC) AS rn
    FROM pq0 p JOIN vocab v ON starts_with(v.term, p.pfx))
  WHERE rn <= {int(max_expansions)}
),
lit(query_id, term, w) AS (VALUES {lit_values}),
qt AS (
  SELECT query_id, term, sum(w)::DOUBLE AS w FROM (
    SELECT query_id, term, 1.0 AS w FROM px
    UNION ALL SELECT query_id, term, w FROM lit
  ) GROUP BY query_id, term
)"""
    return bm25_sql({}, k, cfg, table=table, id_col=id_col,
                    text_col=text_col, qt_cte=qt_cte)


def fuzzy_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
              max_edits: int = 1, prefix_length: int = 0,
              max_expansions: int = 50, table: str = "documents",
              id_col: str = "doc_id", text_col: str = "text",
              transpositions: bool = False) -> str:
    """Oracle for IndexSearcher.fuzzy_search: each analyzed query term
    expands to vocabulary terms within ``max_edits`` unit-cost edits
    (DuckDB ``levenshtein`` == the engine's vectorized DP: insert/
    delete/substitute; ``transpositions=True`` switches both sides to
    TRUE Damerau-Levenshtein — DuckDB ``damerau_levenshtein`` == the
    engine's Lowrance-Wagner DP), ordered (distance ASC, df
    DESC, term ASC), capped; an expansion inherits the source term's
    occurrence count as weight, weights for the same term ADD."""
    fq_rows = []
    for qid, text in sorted(queries.items()):
        for t, c in query_term_weights(text, cfg):
            fq_rows.append(f"({sql_quote(qid)}, {sql_quote(t)}, {float(c)!r})")
    fq_values = ",\n       ".join(fq_rows) if fq_rows else \
        "('__none__', '__none__', 0.0)"
    pl = int(prefix_length)
    pl_sql = (f"\n     AND substr(v.term, 1, {pl}) = substr(f.ft, 1, {pl})"
              if pl > 0 else "")
    ed = "damerau_levenshtein" if transpositions else "levenshtein"
    qt_cte = f"""{_vocab_cte(id_col)},
fq0(query_id, ft, w) AS (VALUES {fq_values}),
fx AS (
  SELECT query_id, term, w FROM (
    SELECT f.query_id, v.term, f.w,
           row_number() OVER (PARTITION BY f.query_id, f.ft
                              ORDER BY {ed}(v.term, f.ft) ASC,
                                       v.df DESC, v.term ASC) AS rn
    FROM fq0 f JOIN vocab v
      ON {ed}(v.term, f.ft) <= {int(max_edits)}{pl_sql})
  WHERE rn <= {int(max_expansions)}
),
qt AS (
  SELECT query_id, term, sum(w)::DOUBLE AS w FROM fx
  GROUP BY query_id, term
)"""
    return bm25_sql({}, k, cfg, table=table, id_col=id_col,
                    text_col=text_col, qt_cte=qt_cte)


def regexp_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
               max_expansions: int = 50, wildcard: bool = False,
               table: str = "documents", id_col: str = "doc_id",
               text_col: str = "text") -> str:
    """Oracle for IndexSearcher.regexp_search / wildcard_search: vocab
    terms fully matching the pattern (DuckDB regexp_full_match — RE2 on
    both sides; wildcard patterns translate through the engine's own
    ``wildcard_to_regex``), capped (df DESC, term ASC), weight 1."""
    from opensearch_jvector_ray.analyze import wildcard_to_regex
    rows = []
    for qid, pat in sorted(queries.items()):
        rx = wildcard_to_regex(pat) if wildcard else pat
        rows.append(f"({sql_quote(qid)}, {sql_quote(rx)})")
    values = ",\n       ".join(rows) if rows else "('__none__', '¤¤')"
    qt_cte = f"""{_vocab_cte(id_col)},
rx0(query_id, pat) AS (VALUES {values}),
qt AS (
  SELECT query_id, term, 1.0 AS w FROM (
    SELECT r.query_id, v.term,
           row_number() OVER (PARTITION BY r.query_id, r.pat
                              ORDER BY v.df DESC, v.term ASC) AS rn
    FROM rx0 r JOIN vocab v ON regexp_full_match(v.term, r.pat))
  WHERE rn <= {int(max_expansions)}
)"""
    return bm25_sql({}, k, cfg, table=table, id_col=id_col,
                    text_col=text_col, qt_cte=qt_cte)


def facet_sql(queries: dict[str, str], min_score: float, facet_col: str,
              cfg: EngineConfig, size: int | None = None,
              table: str = "documents", id_col: str = "doc_id",
              text_col: str = "text", include: str | None = None,
              exclude: str | None = None,
              min_doc_count: int = 1,
              min_doc_count_sql: str | None = None) -> str:
    """Oracle for IndexSearcher.facet_counts: per-query doc counts per
    facet value over the radial (score >= min_score) match set, ordered
    (doc_count DESC, value ASC), optionally capped at ``size``.
    include/exclude = regexp_full_match on the bucket value (RE2, same
    anchored pattern the engine wraps); min_doc_count = HAVING over the
    merged counts, applied before the size cap like the engine."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    conds = []
    if include is not None:
        conds.append(f"regexp_full_match(d.{facet_col}, "
                     f"{sql_quote(include)})")
    if exclude is not None:
        conds.append(f"NOT regexp_full_match(d.{facet_col}, "
                     f"{sql_quote(exclude)})")
    where = f"  WHERE {' AND '.join(conds)}\n" if conds else ""
    if min_doc_count_sql is not None:
        # scale-relative threshold embedded as a scalar subquery (the
        # rare_terms trick: oracle strings are generated once for all
        # scales, so the threshold must be computed IN SQL)
        having = f"  HAVING count(*) >= ({min_doc_count_sql})\n"
    else:
        having = (f"  HAVING count(*) >= {int(min_doc_count)}\n"
                  if min_doc_count > 1 else "")
    body = f"""
  SELECT h.query_id, d.{facet_col} AS {facet_col},
         count(*)::BIGINT AS doc_count
  FROM ({inner}) h JOIN {table} d USING ({id_col})
{where}  GROUP BY h.query_id, d.{facet_col}
{having}"""
    if size is None:
        return (f"SELECT query_id, {facet_col}, doc_count FROM ({body}) "
                f"ORDER BY query_id, doc_count DESC, {facet_col}")
    return f"""
SELECT query_id, {facet_col}, doc_count FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY doc_count DESC, {facet_col} ASC
                              ) AS rn
  FROM ({body})
) WHERE rn <= {int(size)}
ORDER BY query_id, doc_count DESC, {facet_col}
"""


def suggest_sql(prefixes: dict[str, str], n: int, cfg: EngineConfig,
                table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    """Oracle for IndexSearcher.suggest_prefix: top-n vocabulary terms
    per prefix, (df DESC, term ASC)."""
    rows = ",\n       ".join(
        f"({sql_quote(sid)}, {sql_quote(p)})"
        for sid, p in sorted(prefixes.items()))
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
{_vocab_cte(id_col)},
s(suggest_id, pfx) AS (VALUES {rows})
SELECT suggest_id, term, df FROM (
  SELECT s.suggest_id, v.term, v.df,
         row_number() OVER (PARTITION BY s.suggest_id
                            ORDER BY v.df DESC, v.term ASC) AS rn
  FROM s JOIN vocab v ON starts_with(v.term, s.pfx))
WHERE rn <= {int(n)}
ORDER BY suggest_id, df DESC, term
"""


def fuzzy_suggest_sql(typos: dict[str, str], n: int, max_edits: int,
                      cfg: EngineConfig, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for IndexSearcher.suggest_fuzzy: top-n vocabulary terms
    within max_edits, (dist ASC, df DESC, term ASC)."""
    rows = ",\n       ".join(
        f"({sql_quote(sid)}, {sql_quote(t)})"
        for sid, t in sorted(typos.items()))
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
{_vocab_cte(id_col)},
s(suggest_id, typo) AS (VALUES {rows})
SELECT suggest_id, term, dist, df FROM (
  SELECT s.suggest_id, v.term,
         levenshtein(v.term, s.typo)::BIGINT AS dist, v.df,
         row_number() OVER (PARTITION BY s.suggest_id
                            ORDER BY levenshtein(v.term, s.typo) ASC,
                                     v.df DESC, v.term ASC) AS rn
  FROM s JOIN vocab v ON levenshtein(v.term, s.typo) <= {int(max_edits)})
WHERE rn <= {int(n)}
ORDER BY suggest_id, dist, df DESC, term
"""


def phrase_suggest_sql(texts: dict[str, str], max_edits: int,
                       cfg: EngineConfig, table: str = "documents",
                       id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Oracle for IndexSearcher.suggest_phrase: per analyzed token (the
    SAME analyzer produces the token list at generation time), keep if
    in vocab else the top (dist asc, df desc, term asc) correction."""
    from opensearch_jvector_ray.analyze import analyze_query
    arms = []
    for sid, text in sorted(texts.items()):
        toks = analyze_query(text, cfg)
        parts = []
        for t in toks:
            lit = sql_quote(t)
            parts.append(f"""CASE WHEN EXISTS (SELECT 1 FROM vocab WHERE term = {lit})
  THEN {lit}
  ELSE coalesce((SELECT term FROM vocab v
                 WHERE levenshtein(v.term, {lit}) <= {int(max_edits)}
                 ORDER BY levenshtein(v.term, {lit}) ASC, v.df DESC,
                          v.term ASC LIMIT 1), {lit}) END""")
        joined = " || ' ' || ".join(parts) if parts else "''"
        arms.append(f"SELECT {sql_quote(sid)} AS suggest_id, "
                    f"{joined} AS suggestion")
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
{_vocab_cte(id_col)}
{body}
ORDER BY suggest_id
"""


def stats_agg_sql(queries: dict[str, str], min_score: float,
                  value_col: str, cfg: EngineConfig,
                  table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Oracle for IndexSearcher.stats_agg: integer count/sum/min/max over
    the radial match set + ONE final avg division (bit-equal double)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
SELECT h.query_id, count(*)::BIGINT AS doc_count,
       sum(d.{value_col})::BIGINT AS v_sum,
       min(d.{value_col})::BIGINT AS v_min,
       max(d.{value_col})::BIGINT AS v_max,
       sum(d.{value_col})::BIGINT::DOUBLE / count(*) AS v_avg
FROM ({inner}) h JOIN {table} d USING ({id_col})
GROUP BY h.query_id ORDER BY h.query_id
"""


def histogram_sql(queries: dict[str, str], min_score: float,
                  value_col: str, interval: float, cfg: EngineConfig,
                  table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Oracle for IndexSearcher.histogram_agg: counts per
    floor(v/interval)*interval bucket (DOUBLE floor — exact for
    |v| < 2^53, the engine's shared rule)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    bexpr = (f"CAST(floor(d.{value_col}::DOUBLE / {float(interval)!r}) "
             f"* {float(interval)!r} AS BIGINT)")
    return f"""
SELECT h.query_id, {bexpr} AS bucket, count(*)::BIGINT AS doc_count
FROM ({inner}) h JOIN {table} d USING ({id_col})
GROUP BY h.query_id, bucket
ORDER BY h.query_id, bucket
"""


def range_agg_sql(queries: dict[str, str], min_score: float,
                  value_col: str,
                  ranges: list[tuple[str, float | None, float | None]],
                  cfg: EngineConfig, table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for IndexSearcher.range_agg: zero-filled query x range grid
    of doc counts over the radial match set, [lo, hi) with open ends,
    caller-supplied range keys shared verbatim with the engine."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    q_rows = ",\n       ".join(f"({sql_quote(q)})" for q in sorted(queries))
    r_rows = ",\n       ".join(
        f"({sql_quote(rk)}, "
        f"{'NULL::DOUBLE' if lo is None else repr(float(lo))}, "
        f"{'NULL::DOUBLE' if hi is None else repr(float(hi))})"
        for rk, lo, hi in ranges)
    return f"""
WITH qs(query_id) AS (VALUES {q_rows}),
rg(range_key, lo, hi) AS (VALUES {r_rows}),
j AS (
  SELECT h.query_id, d.{value_col}::DOUBLE AS v
  FROM ({inner}) h JOIN {table} d USING ({id_col})
)
SELECT qs.query_id, rg.range_key, count(j.v)::BIGINT AS doc_count
FROM qs CROSS JOIN rg
LEFT JOIN j ON j.query_id = qs.query_id
           AND (rg.lo IS NULL OR j.v >= rg.lo)
           AND (rg.hi IS NULL OR j.v < rg.hi)
GROUP BY qs.query_id, rg.range_key
ORDER BY qs.query_id, rg.range_key
"""


def date_histogram_sql(queries: dict[str, str], min_score: float,
                       calendar_interval: str, cfg: EngineConfig,
                       arms: list[tuple[str, int]],
                       pipeline: str | None = None,
                       pipeline_window: int = 3,
                       pipeline_lag: int = 1,
                       selector_op: str = "gte",
                       selector_value: int = 1,
                       sort_from: int = 0,
                       sort_size: int = 5,
                       pipeline_percent: float = 0.5,
                       rate_unit: str = "hour") -> str:
    """Oracle for IndexSearcher.date_histogram_agg over the transcripts
    index (the ts-bearing corpus): doc counts per date_trunc bucket of
    the radial match set.  The transcript parquet is scale-selected by
    the lineitem row count (see transcripts_arms_cte).  ``pipeline``
    (cumulative_sum | derivative) mirrors the engine's window column
    over the PRESENT buckets in order."""
    prefix = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, text")
    inner = bm25_sql(queries, 0, cfg, table="transcripts", id_col="doc_id",
                     prefix_cte=prefix, min_score=min_score)
    outer = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, ts")
    pipe_col = ""
    if pipeline == "cumulative_sum":
        pipe_col = (",\n       sum(doc_count) OVER (PARTITION BY "
                    "query_id ORDER BY bucket)::BIGINT "
                    "AS cumulative_sum")
    elif pipeline == "derivative":
        pipe_col = (",\n       (doc_count - lag(doc_count) OVER ("
                    "PARTITION BY query_id ORDER BY bucket))::BIGINT "
                    "AS derivative")
    elif pipeline == "moving_avg":
        # trailing window INCLUDING the current bucket, partial windows
        # averaged over present rows — sum and count are exact integers,
        # the ONE division mirrors the engine's fp rule bit-for-bit
        w = (f"OVER (PARTITION BY query_id ORDER BY bucket ROWS BETWEEN "
             f"{int(pipeline_window) - 1} PRECEDING AND CURRENT ROW)")
        pipe_col = (f",\n       sum(doc_count) {w}::DOUBLE"
                    f" / count(*) {w}::DOUBLE AS moving_avg")
    elif pipeline in ("moving_max", "moving_min", "moving_sum"):
        # moving_fn max/min/sum: trailing window incl. the current
        # bucket — pure BIGINT window aggregate, bit-exact vs the engine
        fn = pipeline.split("_")[1]
        w = (f"OVER (PARTITION BY query_id ORDER BY bucket ROWS BETWEEN "
             f"{int(pipeline_window) - 1} PRECEDING AND CURRENT ROW)")
        pipe_col = (f",\n       {fn}(doc_count) {w}::BIGINT"
                    f" AS {pipeline}")
    elif pipeline == "normalize":
        # rescale_0_1: integer diffs, ONE division; max == min -> 0.0
        w = "OVER (PARTITION BY query_id)"
        pipe_col = (f",\n       CASE WHEN max(doc_count) {w} = "
                    f"min(doc_count) {w} THEN 0.0 ELSE "
                    f"(doc_count - min(doc_count) {w})::DOUBLE / "
                    f"(max(doc_count) {w} - min(doc_count) {w})::DOUBLE "
                    f"END AS normalize")
    elif pipeline == "serial_diff":
        pipe_col = (f",\n       (doc_count - lag(doc_count, "
                    f"{int(pipeline_lag)}) OVER (PARTITION BY query_id "
                    f"ORDER BY bucket))::BIGINT AS serial_diff")
    elif pipeline == "bucket_script":
        # percent-of-total: numerator and denominator are exact BIGINTs
        # cast to DOUBLE, the ONE division mirrors the engine bit-exact
        pipe_col = (",\n       doc_count::DOUBLE / (sum(doc_count) OVER "
                    "(PARTITION BY query_id))::DOUBLE AS bucket_script")
    elif pipeline == "moving_percentiles":
        # exact discrete quantile of the trailing window's doc_count
        # (quantile_disc OVER ROWS == the engine's _qdisc rule)
        w = (f"OVER (PARTITION BY query_id ORDER BY bucket ROWS BETWEEN "
             f"{int(pipeline_window) - 1} PRECEDING AND CURRENT ROW)")
        pipe_col = (f",\n       quantile_disc(doc_count, "
                    f"{float(pipeline_percent)!r}) {w}::DOUBLE "
                    f"AS moving_percentiles")
    elif pipeline == "rate":
        # doc-count rate: exact BIGINT count, ONE division by the
        # fixed unit factor (mirrors query._RATE_FACTORS)
        factors = {("day", "hour"): 24.0, ("day", "minute"): 1440.0,
                   ("hour", "minute"): 60.0, ("hour", "second"): 3600.0}
        f = factors[(calendar_interval, rate_unit)]
        pipe_col = (f",\n       doc_count::DOUBLE / {f!r} AS rate")
    if pipeline == "bucket_sort":
        # sort + truncate: ranks (from, from+size] by (doc_count DESC,
        # bucket ASC) — the 1-based rank is part of the row set
        return f"""
WITH {outer},
b AS (
  SELECT h.query_id,
         date_trunc({sql_quote(calendar_interval)}, d.ts) AS bucket,
         count(*)::BIGINT AS doc_count
  FROM ({inner}) h JOIN transcripts d USING (doc_id)
  GROUP BY h.query_id, bucket
),
r AS (
  SELECT query_id, bucket, doc_count,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY doc_count DESC, bucket ASC)
           ::BIGINT AS sort_rank
  FROM b
)
SELECT query_id, bucket, doc_count, sort_rank
FROM r
WHERE sort_rank > {int(sort_from)}
  AND sort_rank <= {int(sort_from) + int(sort_size)}
ORDER BY query_id, sort_rank
"""
    where = ""
    if pipeline == "bucket_selector":
        op = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<=",
              "eq": "="}[selector_op]
        where = f"\nWHERE doc_count {op} {int(selector_value)}"
    return f"""
WITH {outer},
b AS (
  SELECT h.query_id,
         date_trunc({sql_quote(calendar_interval)}, d.ts) AS bucket,
         count(*)::BIGINT AS doc_count
  FROM ({inner}) h JOIN transcripts d USING (doc_id)
  GROUP BY h.query_id, bucket
)
SELECT query_id, bucket, doc_count{pipe_col}
FROM b{where} ORDER BY query_id, bucket
"""


def bucket_metric_sql(queries: dict[str, str], min_score: float,
                      calendar_interval: str, metric: str,
                      cfg: EngineConfig,
                      arms: list[tuple[str, int]]) -> str:
    """Oracle for IndexSearcher.bucket_metric_agg: the sibling pipeline
    aggregations (sum/avg/min/max/stats_bucket) reducing the
    date_histogram buckets to ONE row per query.  Shares the bucket CTE
    with date_histogram_sql; fp rules mirror the engine (int64
    sums/extremes, avg = the single sum/count division; min/max_bucket's
    bucket_key = the SMALLEST bucket ts among the extremes)."""
    prefix = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, text")
    inner = bm25_sql(queries, 0, cfg, table="transcripts", id_col="doc_id",
                     prefix_cte=prefix, min_score=min_score)
    outer = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, ts")
    b_cte = f"""b AS (
  SELECT h.query_id,
         date_trunc({sql_quote(calendar_interval)}, d.ts) AS bucket,
         count(*)::BIGINT AS doc_count
  FROM ({inner}) h JOIN transcripts d USING (doc_id)
  GROUP BY h.query_id, bucket
)"""
    if metric == "sum_bucket":
        body = ("SELECT query_id, sum(doc_count)::BIGINT AS value\n"
                "FROM b GROUP BY query_id ORDER BY query_id")
    elif metric == "avg_bucket":
        body = ("SELECT query_id, sum(doc_count)::BIGINT::DOUBLE"
                " / count(*)::BIGINT::DOUBLE AS value\n"
                "FROM b GROUP BY query_id ORDER BY query_id")
    elif metric == "stats_bucket":
        body = ("SELECT query_id, count(*)::BIGINT AS bucket_count,\n"
                "       min(doc_count)::BIGINT AS v_min,\n"
                "       max(doc_count)::BIGINT AS v_max,\n"
                "       sum(doc_count)::BIGINT AS v_sum,\n"
                "       sum(doc_count)::BIGINT::DOUBLE"
                " / count(*)::BIGINT::DOUBLE AS v_avg\n"
                "FROM b GROUP BY query_id ORDER BY query_id")
    elif metric in ("min_bucket", "max_bucket"):
        direction = "ASC" if metric == "min_bucket" else "DESC"
        body = f"""SELECT query_id, value, bucket_key FROM (
  SELECT query_id, doc_count AS value, bucket AS bucket_key,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY doc_count {direction}, bucket ASC
                           ) AS rn
  FROM b) WHERE rn = 1
ORDER BY query_id"""
    else:
        raise ValueError(f"unknown bucket metric {metric!r}")
    return f"WITH {outer},\n{b_cte}\n{body}\n"


def multi_terms_sql(queries: dict[str, str], min_score: float,
                    fields: list[str], cfg: EngineConfig,
                    size: int | None = None, table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for IndexSearcher.multi_terms_agg: doc counts per
    composite bucket of several stored columns over the radial match
    set, docs missing ANY key field skipped (IS NOT NULL mirrors the
    engine's drop_null), ordered (doc_count DESC, values ASC)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    fl = ", ".join(f"d.{f} AS {f}" for f in fields)
    gl = ", ".join(f"d.{f}" for f in fields)
    ol = ", ".join(f"{f} ASC" for f in fields)
    nn = " AND ".join(f"d.{f} IS NOT NULL" for f in fields)
    body = f"""
  SELECT h.query_id, {fl}, count(*)::BIGINT AS doc_count
  FROM ({inner}) h JOIN {table} d USING ({id_col})
  WHERE {nn}
  GROUP BY h.query_id, {gl}
"""
    sel = ", ".join(fields)
    if size is None:
        return (f"SELECT query_id, {sel}, doc_count FROM ({body}) "
                f"ORDER BY query_id, doc_count DESC, {ol}")
    return f"""
SELECT query_id, {sel}, doc_count FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY doc_count DESC, {ol}) AS rn
  FROM ({body})
) WHERE rn <= {int(size)}
ORDER BY query_id, doc_count DESC, {ol}
"""


def rare_terms_sql(queries: dict[str, str], min_score: float,
                   field: str, max_doc_count: int | str,
                   cfg: EngineConfig,
                   table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """Oracle for IndexSearcher.rare_terms_agg: the long-tail buckets
    (global match-set doc_count <= max_doc_count), ordered
    (doc_count ASC, value ASC).  ``max_doc_count`` may be a SQL
    expression string (e.g. a corpus-relative scalar subquery) so the
    same scale-proportional rule stays non-trivial at every sf — the
    engine side computes the identical integer from the table row
    count."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    thr = max_doc_count if isinstance(max_doc_count, str) \
        else str(int(max_doc_count))
    return f"""
SELECT h.query_id, d.{field} AS {field}, count(*)::BIGINT AS doc_count
FROM ({inner}) h JOIN {table} d USING ({id_col})
GROUP BY h.query_id, d.{field}
HAVING count(*) <= ({thr})
ORDER BY h.query_id, doc_count ASC, {field} ASC
"""


def extended_stats_sql(queries: dict[str, str], min_score: float,
                       value_col: str, cfg: EngineConfig,
                       sigma: float = 2.0, table: str = "documents",
                       id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Oracle for IndexSearcher.extended_stats_agg: integer
    count/sum/min/max/sum-of-squares + the engine's PINNED float chain
    (avg = sum/n; variance = sos/n - avg*avg; std = sqrt(variance);
    bounds = avg +/- sigma*std) — every op appears once in the same
    order, so the doubles are bit-equal."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    s = repr(float(sigma))
    return f"""
WITH g AS (
  SELECT h.query_id, count(*)::BIGINT AS doc_count,
         sum(d.{value_col})::BIGINT AS v_sum,
         min(d.{value_col})::BIGINT AS v_min,
         max(d.{value_col})::BIGINT AS v_max,
         sum(d.{value_col} * d.{value_col})::BIGINT AS v_sos
  FROM ({inner}) h JOIN {table} d USING ({id_col})
  GROUP BY h.query_id
), f AS (
  SELECT *, v_sum::DOUBLE / doc_count::DOUBLE AS v_avg,
         v_sos::DOUBLE / doc_count::DOUBLE
           - (v_sum::DOUBLE / doc_count::DOUBLE)
             * (v_sum::DOUBLE / doc_count::DOUBLE) AS v_variance
  FROM g
)
SELECT query_id, doc_count, v_sum, v_min, v_max, v_sos, v_avg,
       v_variance, sqrt(v_variance) AS v_std,
       v_avg + {s} * sqrt(v_variance) AS std_upper,
       v_avg - {s} * sqrt(v_variance) AS std_lower
FROM f ORDER BY query_id
"""


def weighted_avg_sql(queries: dict[str, str], min_score: float,
                     value_col: str, weight_col: str, cfg: EngineConfig,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Oracle for IndexSearcher.weighted_avg_agg: integer
    sum(value x weight) and sum(weight) over the radial match set + the
    single division (bit-equal double)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
SELECT h.query_id, sum(d.{weight_col})::BIGINT AS w_sum,
       sum(d.{value_col} * d.{weight_col})::BIGINT::DOUBLE
         / sum(d.{weight_col})::BIGINT::DOUBLE AS weighted_avg
FROM ({inner}) h JOIN {table} d USING ({id_col})
GROUP BY h.query_id ORDER BY h.query_id
"""


def dis_max_sql(queries: dict[str, list[str]], k: int,
                tie_breaker: float, cfg: EngineConfig,
                table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    """Oracle for IndexSearcher.dis_max: one radial BM25 CTE per
    (query, subquery), FULL-OUTER-joined per query on the doc key,
    combined with the engine's formula in the engine's
    SEQUENTIAL-subquery-index fp chain (greatest + left-assoc sum),
    ranked (score__raw DESC, key ASC), round-6 output."""
    ctes, per_gid = [], []
    for g, (gid, subs) in enumerate(sorted(queries.items())):
        aliases = []
        for i, text in enumerate(subs):
            alias = f"g{g}s{i}"
            inner = bm25_sql({gid: text}, 0, cfg, table=table,
                             id_col=id_col, text_col=text_col,
                             min_score=1e-300, emit_raw=True)
            ctes.append(f"{alias} AS ({inner})")
            aliases.append(alias)
        joined = (f"SELECT {aliases[0]}.query_id AS query_id, "
                  f"{aliases[0]}.{id_col} AS {id_col}, "
                  f"coalesce({aliases[0]}.score__raw, 0.0) AS s0 "
                  f"FROM {aliases[0]}")
        for i in range(1, len(aliases)):
            prev = ", ".join(f"coalesce(j.s{jj}, 0.0) AS s{jj}"
                             for jj in range(i))
            joined = f"""SELECT coalesce(j.query_id, {aliases[i]}.query_id) AS query_id,
       coalesce(j.{id_col}, {aliases[i]}.{id_col}) AS {id_col},
       {prev},
       coalesce({aliases[i]}.score__raw, 0.0) AS s{i}
FROM ({joined}) j FULL OUTER JOIN {aliases[i]}
  ON j.query_id = {aliases[i]}.query_id
 AND j.{id_col} = {aliases[i]}.{id_col}"""
        svars = [f"s{i}" for i in range(len(subs))]
        total = " + ".join(svars)    # the engine's sequential chain
        best = (f"greatest({', '.join(svars)})" if len(svars) > 1
                else svars[0])
        score = (f"({best} + {float(tie_breaker)!r} "
                 f"* (({total}) - {best}))")
        per_gid.append(
            f"SELECT query_id, {id_col}, {score} AS score__raw "
            f"FROM ({joined})")
    cte_block = ",\n".join(ctes)
    scored = "\n  UNION ALL\n".join(per_gid)
    return f"""
WITH {cte_block},
scored AS (
{scored}
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC
                           ) AS rank,
         {id_col}, score__raw
  FROM scored
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)}
ORDER BY query_id, rank
"""


def adjacency_matrix_sql(queries: dict[str, str], min_score: float,
                         filters: dict[str, dict], cfg: EngineConfig,
                         table: str = "documents",
                         id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """Oracle for IndexSearcher.adjacency_matrix_agg: per named filter
    the match-set count, per sorted filter pair the "a&b" intersection
    count; empty buckets omitted (GROUP BY arms only emit nonzero
    counts), ordered (query_id, filter_key)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    names = sorted(filters)
    arm_specs = [(n, filter_spec_sql(filters[n], "d")) for n in names]
    arm_specs += [
        (f"{a}&{b}",
         f"({filter_spec_sql(filters[a], 'd')}) "
         f"AND ({filter_spec_sql(filters[b], 'd')})")
        for i, a in enumerate(names) for b in names[i + 1:]]
    arms = "\n  UNION ALL\n".join(
        f"  SELECT h.query_id, {sql_quote(key)} AS filter_key,\n"
        f"         count(*)::BIGINT AS doc_count\n"
        f"  FROM hits h JOIN {table} d USING ({id_col})\n"
        f"  WHERE {pred}\n"
        f"  GROUP BY h.query_id"
        for key, pred in arm_specs)
    return f"""
WITH hits AS ({inner})
SELECT query_id, filter_key, doc_count FROM (
{arms}
) ORDER BY query_id, filter_key
"""


def string_stats_sql(queries: dict[str, str], min_score: float,
                     field: str, cfg: EngineConfig,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Oracle for IndexSearcher.string_stats_agg (the SQL-safe columns:
    count / min / max / sum of unicode lengths + the single avg
    division; the libm entropy column is pytest-gated and excluded
    here).  Nulls excluded on both sides (count(col) / the engine's
    drop_null); a query whose whole match set is NULL-valued emits NO
    row on either side (HAVING count > 0 == the engine's empty-partial
    omission)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
SELECT h.query_id, count(d.{field})::BIGINT AS doc_count,
       min(length(d.{field}))::BIGINT AS len_min,
       max(length(d.{field}))::BIGINT AS len_max,
       sum(length(d.{field}))::BIGINT AS len_sum,
       sum(length(d.{field}))::BIGINT::DOUBLE
         / count(d.{field})::BIGINT::DOUBLE AS avg_length
FROM ({inner}) h JOIN {table} d USING ({id_col})
GROUP BY h.query_id
HAVING count(d.{field}) > 0
ORDER BY h.query_id
"""


def matrix_stats_sql(queries: dict[str, str], min_score: float,
                     x_col: str, y_col: str, cfg: EngineConfig,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Oracle for IndexSearcher.matrix_stats_agg: six integer moments +
    the engine's PINNED float chain (mean = sum/n; var = sos/n -
    mean*mean; cov = sxy/n - mean_x*mean_y; corr = cov /
    (sqrt(var_x) * sqrt(var_y))) — every op appears once in the same
    order, so the doubles are bit-equal."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
WITH g AS (
  SELECT h.query_id, count(*)::BIGINT AS doc_count,
         sum(d.{x_col})::BIGINT AS x_sum,
         sum(d.{y_col})::BIGINT AS y_sum,
         sum(d.{x_col} * d.{x_col})::BIGINT AS xx_sum,
         sum(d.{y_col} * d.{y_col})::BIGINT AS yy_sum,
         sum(d.{x_col} * d.{y_col})::BIGINT AS xy_sum
  FROM ({inner}) h JOIN {table} d USING ({id_col})
  GROUP BY h.query_id
), f AS (
  SELECT *, x_sum::DOUBLE / doc_count::DOUBLE AS x_mean,
         y_sum::DOUBLE / doc_count::DOUBLE AS y_mean,
         xx_sum::DOUBLE / doc_count::DOUBLE
           - (x_sum::DOUBLE / doc_count::DOUBLE)
             * (x_sum::DOUBLE / doc_count::DOUBLE) AS x_variance,
         yy_sum::DOUBLE / doc_count::DOUBLE
           - (y_sum::DOUBLE / doc_count::DOUBLE)
             * (y_sum::DOUBLE / doc_count::DOUBLE) AS y_variance,
         xy_sum::DOUBLE / doc_count::DOUBLE
           - (x_sum::DOUBLE / doc_count::DOUBLE)
             * (y_sum::DOUBLE / doc_count::DOUBLE) AS covariance
  FROM g
)
SELECT query_id, doc_count, x_mean, y_mean, x_variance, y_variance,
       covariance,
       covariance / (sqrt(x_variance) * sqrt(y_variance)) AS correlation
FROM f ORDER BY query_id
"""


def date_range_sql(queries: dict[str, str], min_score: float,
                   ranges: list[tuple[str, str | None, str | None]],
                   cfg: EngineConfig,
                   arms: list[tuple[str, int]]) -> str:
    """Oracle for IndexSearcher.date_range_agg over the transcripts
    index: zero-filled query x range grid, [lo, hi) on exact TIMESTAMP
    bounds (the engine compares the identical epoch-us integers)."""
    prefix = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, text")
    inner = bm25_sql(queries, 0, cfg, table="transcripts", id_col="doc_id",
                     prefix_cte=prefix, min_score=min_score)
    outer = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, ts")
    q_rows = ",\n       ".join(f"({sql_quote(q)})" for q in sorted(queries))
    r_rows = ",\n       ".join(
        f"({sql_quote(rk)}, "
        f"{'NULL::TIMESTAMP' if lo is None else 'TIMESTAMP ' + sql_quote(lo)}, "
        f"{'NULL::TIMESTAMP' if hi is None else 'TIMESTAMP ' + sql_quote(hi)})"
        for rk, lo, hi in ranges)
    return f"""
WITH {outer},
qs(query_id) AS (VALUES {q_rows}),
rg(range_key, lo, hi) AS (VALUES {r_rows}),
j AS (
  SELECT h.query_id, d.ts AS v
  FROM ({inner}) h JOIN transcripts d USING (doc_id)
)
SELECT qs.query_id, rg.range_key, count(j.v)::BIGINT AS doc_count
FROM qs CROSS JOIN rg
LEFT JOIN j ON j.query_id = qs.query_id
           AND (rg.lo IS NULL OR j.v >= rg.lo)
           AND (rg.hi IS NULL OR j.v < rg.hi)
GROUP BY qs.query_id, rg.range_key
ORDER BY qs.query_id, rg.range_key
"""


def top_hits_sql(queries: dict[str, str], min_score: float,
                 group_col: str, n: int, cfg: EngineConfig,
                 table: str = "documents", id_col: str = "doc_id",
                 text_col: str = "text") -> str:
    """Oracle for IndexSearcher.top_hits_agg: per (query, bucket) top-n
    hits of the radial match set by the engine's global (RAW score desc,
    key asc) rule; output score rounded to 6dp like every hit list."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score,
                     emit_raw=True)
    return f"""
SELECT query_id, {group_col}, bucket_rank, {id_col},
       round(score__raw, 6) AS score
FROM (
  SELECT h.query_id, d.{group_col} AS {group_col}, h.{id_col},
         h.score__raw,
         row_number() OVER (PARTITION BY h.query_id, d.{group_col}
                            ORDER BY h.score__raw DESC, h.{id_col} ASC
                           ) AS bucket_rank
  FROM ({inner}) h JOIN {table} d USING ({id_col})
)
WHERE bucket_rank <= {int(n)}
ORDER BY query_id, {group_col}, bucket_rank
"""


def percolate_sql(queries: dict[str, str], cfg: EngineConfig,
                  match_mode: str = "any", table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for pipelines.percolate: (doc, query) match pairs from the
    same analyzed term sets — any = shared-term EXISTS, all =
    distinct-shared-term count equals the query's term count, phrase =
    EXISTS an adjacent occurrence of the analyzed sequence on the
    PRE-stopword token list (phrase_sql's adjacency predicate as a
    boolean)."""
    from opensearch_jvector_ray.pipelines.percolate import (
        compile_queries,
    )
    assert match_mode in ("any", "all", "phrase")
    if match_mode == "phrase":
        pat = sql_quote(cfg.split_pattern)
        compiled = compile_queries(queries, cfg, phrase=True)
        arms = []
        for qid, words in compiled.items():
            conds = [f"toks[i] = {sql_quote(words[0])}",
                     f"i + {len(words) - 1} <= len(toks)"]
            conds += [f"toks[i + {j}] = {sql_quote(w)}"
                      for j, w in enumerate(words[1:], start=1)]
            arms.append(f"""
SELECT {id_col}, {sql_quote(qid)} AS query_id FROM tokpos
WHERE len(list_filter(range(1, len(toks) + 1),
          i -> {' AND '.join(conds)})) > 0""")
        union = "\nUNION ALL\n".join(arms) if arms else \
            f"SELECT {id_col}, '' AS query_id FROM tokpos WHERE false"
        return f"""
WITH tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
)
SELECT {id_col}, query_id FROM ({union})
ORDER BY {id_col}, query_id
"""
    compiled = compile_queries(queries, cfg)
    rows = [f"({sql_quote(qid)}, {sql_quote(t)})"
            for qid, terms in compiled.items() for t in terms]
    qt_values = ",\n       ".join(rows) if rows else \
        "('__none__', '__none__')"
    if match_mode == "any":
        body = f"""
SELECT DISTINCT t.{id_col}, q.query_id
FROM toks t JOIN qt q ON q.term = t.term"""
    else:
        body = f"""
SELECT m.{id_col}, m.query_id
FROM (
  SELECT DISTINCT t.{id_col}, q.query_id, q.term
  FROM toks t JOIN qt q ON q.term = t.term
) m JOIN qn ON qn.query_id = m.query_id
GROUP BY m.{id_col}, m.query_id, qn.n
HAVING count(*) = qn.n"""
    order = f"{id_col}, query_id" if match_mode == "any" else \
        f"m.{id_col}, m.query_id"
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
qt(query_id, term) AS (VALUES {qt_values}),
qn AS (SELECT query_id, count(*) AS n FROM qt GROUP BY query_id)
{body}
ORDER BY {order}
"""


def constant_score_sql(queries: dict[str, str], k: int, boost: float,
                       cfg: EngineConfig, table: str = "documents",
                       id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Oracle for search(const_score=): every doc matching any analyzed
    query term scores exactly ``boost``; ranking is the key-asc tie
    order (all scores equal)."""
    qt_rows = []
    for qid, text in sorted(queries.items()):
        for term, _ in query_term_weights(text, cfg):
            qt_rows.append(f"({sql_quote(qid)}, {sql_quote(term)})")
    qt_values = ",\n       ".join(qt_rows) if qt_rows else \
        "('__none__', '__none__')"
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
qt(query_id, term) AS (VALUES {qt_values}),
hits AS (
  SELECT DISTINCT qt.query_id, toks.{id_col}
  FROM qt JOIN toks ON toks.term = qt.term
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {id_col} ASC) AS rank,
         {id_col}
  FROM hits
)
SELECT query_id, rank, {id_col},
       {round(float(boost), 6)!r} AS score
FROM ranked WHERE rank <= {int(k)}
ORDER BY query_id, rank
"""


def boosting_query_sql(queries: dict[str, str],
                       negatives: dict[str, str], k: int,
                       negative_boost: float, cfg: EngineConfig,
                       table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Oracle for search(negative=): the shared BM25 CTE over the
    positive clause, with docs matching any analyzed negative term
    demoted by negative_boost (multiply; non-matching docs multiply by
    exactly 1.0 — an IEEE identity, so positives stay bit-equal)."""
    arms = []
    for qid in sorted(queries):
        terms = sorted({t for t, _ in
                        query_term_weights(negatives.get(qid, ""), cfg)})
        if not terms:
            continue
        in_list = ", ".join(sql_quote(t) for t in terms)
        arms.append(
            f"WHEN {sql_quote(qid)} THEN (CASE WHEN EXISTS ("
            f"SELECT 1 FROM toks tk WHERE tk.{id_col} = __b.{id_col} "
            f"AND tk.term IN ({in_list})) "
            f"THEN {float(negative_boost)!r} ELSE 1.0 END)")
    mul = ("CASE s.query_id " + " ".join(arms) + " ELSE 1.0 END") \
        if arms else "1.0"
    return bm25_sql(queries, k, cfg, table=table, id_col=id_col,
                    text_col=text_col, score_mul_sql=mul)


def multi_match_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                    fields: list[str], match_type: str = "best_fields",
                    tie_breaker: float = 0.0,
                    table: str = "documents",
                    id_col: str = "doc_id") -> str:
    """Oracle for query.multi_match: one radial BM25 CTE per field (the
    field column IS that index's text), FULL-OUTER-joined on
    (query_id, id), absent fields coalesced to exactly 0, combined with
    the engine's formula in the engine's SORTED-FIELD fp chain."""
    assert match_type in ("best_fields", "most_fields")
    fields = sorted(fields)
    ctes, aliases = [], []
    for i, f in enumerate(fields):
        alias = f"f{i}"
        inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                         text_col=f, min_score=1e-300, emit_raw=True)
        ctes.append(f"{alias} AS ({inner})")
        aliases.append(alias)
    # chain FULL OUTER JOINs, coalescing the key as we go
    joined = f"SELECT {aliases[0]}.query_id AS query_id, " \
             f"{aliases[0]}.{id_col} AS {id_col}, " \
             f"coalesce({aliases[0]}.score__raw, 0.0) AS s0 " \
             f"FROM {aliases[0]}"
    for i in range(1, len(aliases)):
        prev_cols = ", ".join(f"coalesce(j.s{jj}, 0.0) AS s{jj}"
                              for jj in range(i))
        joined = f"""SELECT coalesce(j.query_id, {aliases[i]}.query_id) AS query_id,
       coalesce(j.{id_col}, {aliases[i]}.{id_col}) AS {id_col},
       {prev_cols},
       coalesce({aliases[i]}.score__raw, 0.0) AS s{i}
FROM ({joined}) j FULL OUTER JOIN {aliases[i]}
  ON j.query_id = {aliases[i]}.query_id
 AND j.{id_col} = {aliases[i]}.{id_col}"""
    svars = [f"s{i}" for i in range(len(fields))]
    total = " + ".join(svars)          # the engine's sorted-field chain
    if match_type == "most_fields":
        score = f"({total})"
    else:
        best = f"greatest({', '.join(svars)})" if len(svars) > 1 \
            else svars[0]
        score = f"({best} + {float(tie_breaker)!r} * (({total}) - {best}))"
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
j AS ({joined}),
scored AS (
  SELECT query_id, {id_col}, {score} AS score__raw FROM j
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC
                           ) AS rank,
         {id_col}, score__raw
  FROM scored
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)}
ORDER BY query_id, rank
"""


def _qids_cte(queries: dict[str, str]) -> str:
    rows = ",\n       ".join(f"({sql_quote(q)})" for q in sorted(queries))
    return f"qids(query_id) AS (VALUES {rows})"


def cardinality_sql(queries: dict[str, str], min_score: float,
                    field: str, cfg: EngineConfig,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Oracle for IndexSearcher.cardinality_agg: exact distinct count of
    a stored column over the radial match set, zero-filled per query."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
WITH {_qids_cte(queries)},
c AS (
  SELECT h.query_id, count(DISTINCT d.{field})::BIGINT AS cardinality
  FROM ({inner}) h JOIN {table} d USING ({id_col})
  GROUP BY h.query_id
)
SELECT q.query_id, coalesce(c.cardinality, 0)::BIGINT AS cardinality
FROM qids q LEFT JOIN c USING (query_id)
ORDER BY q.query_id
"""


def percentiles_sql(queries: dict[str, str], min_score: float,
                    value_col: str, percents: tuple, cfg: EngineConfig,
                    is_ts: bool = False,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Oracle for IndexSearcher.percentiles_agg: exact discrete
    percentiles of a stored column over the radial match set — the
    quantile_disc selection rule the engine mirrors (value at cum count
    >= max(1, ceil(q*n))).  ``is_ts`` mirrors the engine's timestamp
    handling (values reported as float epoch in the stored unit — us,
    DuckDB's epoch_us; TIMESTAMP itself can't cast to DOUBLE)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    vexpr = f"epoch_us(d.{value_col})" if is_ts else f"d.{value_col}"
    arms = "\n  UNION ALL\n".join(
        f"  SELECT h.query_id, {float(q)!r}::DOUBLE AS quantile,\n"
        f"         quantile_disc({vexpr}, {float(q)!r})::DOUBLE"
        f" AS value\n"
        f"  FROM hits h JOIN {table} d USING ({id_col})\n"
        f"  GROUP BY h.query_id"
        for q in percents)
    return f"""
WITH hits AS ({inner})
SELECT query_id, quantile, value FROM (
{arms}
) ORDER BY query_id, quantile
"""


def significant_terms_sql(queries: dict[str, str], min_score: float,
                          field: str, size: int, cfg: EngineConfig,
                          table: str = "documents",
                          id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    """Oracle for IndexSearcher.significant_terms_agg: JLH-scored
    over-representation of match-set values vs the whole corpus.  The
    score expression is the engine's exact chain of double ops over
    integer counts (bit-exact), ranked on the RAW score then rounded."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
WITH hits AS ({inner}),
fg AS (
  -- NULL-valued matched docs are excluded from fg buckets AND fg_tot:
  -- the engine's foreground partial counts only_valid (pyarrow count),
  -- so a doc missing the field contributes to neither (it still counts
  -- in bg_tot — the corpus row count)
  SELECT h.query_id, d.{field} AS {field}, count(*)::BIGINT AS doc_count
  FROM hits h JOIN {table} d USING ({id_col})
  WHERE d.{field} IS NOT NULL
  GROUP BY h.query_id, d.{field}
),
fgt AS (
  SELECT query_id, sum(doc_count)::BIGINT AS fg_tot FROM fg
  GROUP BY query_id
),
bg AS (
  SELECT {field}, count(*)::BIGINT AS bg_count FROM {table}
  GROUP BY {field}
),
bgt AS (SELECT count(*)::DOUBLE AS bg_tot FROM {table}),
scored AS (
  SELECT fg.query_id, fg.{field}, fg.doc_count, bg.bg_count,
         ((fg.doc_count::DOUBLE / fgt.fg_tot)
            - (bg.bg_count::DOUBLE / bgt.bg_tot))
         * ((fg.doc_count::DOUBLE / fgt.fg_tot)
            / (bg.bg_count::DOUBLE / bgt.bg_tot)) AS score__raw
  FROM fg JOIN fgt USING (query_id) JOIN bg USING ({field})
  CROSS JOIN bgt
)
SELECT query_id, {field}, doc_count, bg_count,
       round(score__raw, 6) AS score
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score__raw DESC, {field} ASC
                              ) AS rn
  FROM scored
) WHERE rn <= {int(size)}
ORDER BY query_id, rn
"""


def significant_text_sql(queries: dict[str, str], min_score: float,
                         size: int, cfg: EngineConfig,
                         table: str = "documents",
                         id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """Oracle for IndexSearcher.significant_text_agg: JLH-scored
    over-representation of ANALYZED TERMS in the match set vs the whole
    corpus (fg = distinct matched docs containing the term, bg = global
    df, fg_tot = matched docs, bg_tot = all docs).  The score expression
    is the engine's exact chain of double ops over integer counts
    (bit-exact), ranked on the RAW score then rounded."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
WITH hits AS ({inner}),
{toks_cte(cfg, table, id_col, text_col)},
fg AS (
  SELECT h.query_id, t.term,
         count(DISTINCT t.{id_col})::BIGINT AS doc_count
  FROM hits h JOIN toks t ON t.{id_col} = h.{id_col}
  GROUP BY h.query_id, t.term
),
fgt AS (
  SELECT query_id, count(*)::BIGINT AS fg_tot FROM hits
  GROUP BY query_id
),
bg AS (
  SELECT term, count(DISTINCT {id_col})::BIGINT AS bg_count FROM toks
  GROUP BY term
),
bgt AS (SELECT count(*)::DOUBLE AS bg_tot FROM {table}),
scored AS (
  SELECT fg.query_id, fg.term, fg.doc_count, bg.bg_count,
         ((fg.doc_count::DOUBLE / fgt.fg_tot)
            - (bg.bg_count::DOUBLE / bgt.bg_tot))
         * ((fg.doc_count::DOUBLE / fgt.fg_tot)
            / (bg.bg_count::DOUBLE / bgt.bg_tot)) AS score__raw
  FROM fg JOIN fgt USING (query_id) JOIN bg USING (term)
  CROSS JOIN bgt
)
SELECT query_id, term, doc_count, bg_count,
       round(score__raw, 6) AS score
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score__raw DESC, term ASC
                              ) AS rn
  FROM scored
) WHERE rn <= {int(size)}
ORDER BY query_id, rn
"""


def filters_agg_sql(queries: dict[str, str], min_score: float,
                    filters: dict[str, dict], cfg: EngineConfig,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Oracle for IndexSearcher.filters_agg: per named structured-filter
    spec (the SAME spec objects the engine compiles), the match-set doc
    count, zero-filled over the query x filter grid."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    arms = "\n  UNION ALL\n".join(
        f"  SELECT h.query_id, {sql_quote(fkey)} AS filter_key,\n"
        f"         count(*)::BIGINT AS doc_count\n"
        f"  FROM hits h JOIN {table} d USING ({id_col})\n"
        f"  WHERE {filter_spec_sql(spec, 'd')}\n"
        f"  GROUP BY h.query_id"
        for fkey, spec in sorted(filters.items()))
    fkeys = ",\n       ".join(f"({sql_quote(fk)})" for fk in sorted(filters))
    return f"""
WITH hits AS ({inner}),
{_qids_cte(queries)},
fkeys(filter_key) AS (VALUES {fkeys}),
c AS (
{arms}
)
SELECT q.query_id, f.filter_key,
       coalesce(c.doc_count, 0)::BIGINT AS doc_count
FROM qids q CROSS JOIN fkeys f
LEFT JOIN c ON c.query_id = q.query_id AND c.filter_key = f.filter_key
ORDER BY q.query_id, f.filter_key
"""


def terms_stats_sql(queries: dict[str, str], min_score: float,
                    group_col: str, value_col: str, cfg: EngineConfig,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Oracle for IndexSearcher.terms_stats_agg: per-bucket integer
    (count, sum, min, max) + one final avg division."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
SELECT h.query_id, d.{group_col} AS {group_col},
       count(*)::BIGINT AS doc_count,
       sum(d.{value_col})::BIGINT AS v_sum,
       min(d.{value_col})::BIGINT AS v_min,
       max(d.{value_col})::BIGINT AS v_max,
       sum(d.{value_col})::BIGINT::DOUBLE / count(*)::BIGINT AS v_avg
FROM ({inner}) h JOIN {table} d USING ({id_col})
GROUP BY h.query_id, d.{group_col}
ORDER BY h.query_id, d.{group_col}
"""


def composite_sql(queries: dict[str, str], min_score: float, field: str,
                  size: int, cfg: EngineConfig, after=None,
                  table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Oracle for IndexSearcher.composite_agg: ascending bucket pages of
    ``size``, resuming strictly after the ``after`` bucket key."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    after_sql = f"WHERE d.{field} > {_sql_lit(after)}" \
        if after is not None else ""
    return f"""
SELECT query_id, {field}, doc_count FROM (
  SELECT h.query_id, d.{field} AS {field},
         count(*)::BIGINT AS doc_count,
         row_number() OVER (PARTITION BY h.query_id
                            ORDER BY d.{field} ASC) AS rn
  FROM ({inner}) h JOIN {table} d USING ({id_col})
  {after_sql}
  GROUP BY h.query_id, d.{field}
) WHERE rn <= {int(size)}
ORDER BY query_id, {field}
"""


def page_sql(queries: dict[str, str], k: int, page: int,
             cfg: EngineConfig, table: str = "documents",
             id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for search_after deep pagination: page N of size k is
    global ranks (N-1)*k+1 .. N*k, re-ranked 1..k within the page — the
    engine's boundary-pushdown result must equal the window of the full
    ranking."""
    off = int(k) * (int(page) - 1)
    inner = bm25_sql(queries, int(k) * int(page), cfg, table=table,
                     id_col=id_col, text_col=text_col)
    return (f"SELECT query_id, rank - {off} AS rank, {id_col}, score "
            f"FROM ({inner}) WHERE rank > {off} ORDER BY query_id, rank")


def mlt_sql(seeds: dict[str, int], k: int, max_query_terms: int,
            cfg: EngineConfig, table: str = "documents",
            id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for IndexSearcher.more_like_this: the query terms are the
    seed doc's top ``max_query_terms`` post-stopword terms by tf*idf
    (row_number ORDER BY tf*idf DESC, term ASC — the engine's exact
    selection rule; tf*idf is BIGINT * the shared ln idf, bit-equal on
    both sides), each with weight 1; the rest is the shared BM25 CTE."""
    seed_rows = ",\n       ".join(
        f"({sql_quote(qid)}, {int(sid)})" for qid, sid in sorted(seeds.items()))
    qt_cte = f"""seeds(query_id, sid) AS (VALUES {seed_rows}),
st AS (
  SELECT s.query_id, t.term, count(*)::BIGINT AS tf
  FROM toks t JOIN seeds s ON t.{id_col} = s.sid
  GROUP BY s.query_id, t.term
),
sdf AS (
  SELECT term, count(DISTINCT {id_col})::DOUBLE AS df FROM toks
  WHERE term IN (SELECT DISTINCT term FROM st) GROUP BY term
),
qt AS (
  SELECT query_id, term, 1.0 AS w FROM (
    SELECT st.query_id, st.term,
           row_number() OVER (
             PARTITION BY st.query_id
             ORDER BY st.tf * ln(1.0 + (stats.n - sdf.df + 0.5)
                                 / (sdf.df + 0.5)) DESC,
                      st.term ASC) AS rn
    FROM st JOIN sdf USING (term) CROSS JOIN stats
  ) WHERE rn <= {int(max_query_terms)}
)"""
    return bm25_sql({}, k, cfg, table=table, id_col=id_col,
                    text_col=text_col, qt_cte=qt_cte)


def highlight_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                  table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Oracle for IndexSearcher.matched_positions: top-k hits from the
    shared BM25 oracle (nested WITH), joined to every occurrence of each
    analyzed query term in the hit doc.  Positions are 0-based indices
    on the non-empty token stream BEFORE stopword removal — exactly the
    axis the index's pos_enc sidecar stores."""
    pat = sql_quote(cfg.split_pattern)
    qt_rows = []
    for qid, text in sorted(queries.items()):
        for term, _ in query_term_weights(text, cfg):
            qt_rows.append(f"({sql_quote(qid)}, {sql_quote(term)})")
    qt_values = ",\n       ".join(qt_rows) if qt_rows else \
        "('__none__', '__none__')"
    inner = bm25_sql(queries, k, cfg, table, id_col, text_col)
    return f"""
WITH hits AS ({inner}),
ht AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS tk
  FROM {table}
),
u AS (
  SELECT {id_col}, unnest(tk) AS term,
         unnest(range(len(tk))) AS pos
  FROM ht
),
hqt(query_id, term) AS (VALUES {qt_values})
SELECT h.query_id, h.{id_col}, u.term, CAST(u.pos AS BIGINT) AS pos
FROM hits h
JOIN hqt ON hqt.query_id = h.query_id
JOIN u ON u.{id_col} = h.{id_col} AND u.term = hqt.term
ORDER BY h.query_id, h.{id_col}, u.term, pos
"""


def explain_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    """Oracle for IndexSearcher.explain: per-(hit, term) BM25 breakdown
    from the same token/df/dl CTEs the score oracle uses; contribution
    is the identical product chain (bit-exact before the round-6)."""
    qt_rows = []
    for qid, text in sorted(queries.items()):
        for term, w in query_term_weights(text, cfg):
            qt_rows.append(f"({sql_quote(qid)}, {sql_quote(term)}, "
                           f"{float(w)!r})")
    qt_values = ",\n       ".join(qt_rows) if qt_rows else \
        "('__none__', '__none__', 0.0)"
    inner = bm25_sql(queries, k, cfg, table, id_col, text_col)
    idf = ("ln(1.0 + ((SELECT n FROM stats) - df.df + 0.5) "
           "/ (df.df + 0.5))")
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
qt(query_id, term, w) AS (VALUES {qt_values}),
df AS (
  SELECT term, count(DISTINCT {id_col})::DOUBLE AS df FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term
),
tf AS (
  SELECT {id_col}, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY {id_col}, term
),
hits AS ({inner})
SELECT h.query_id, h.{id_col}, tf.term,
       CAST(tf.tf AS BIGINT) AS tf,
       CAST(df.df AS BIGINT) AS df,
       round({idf}, 6) AS idf,
       round(qt.w * {idf}
             * (tf.tf / (tf.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))),
             6) AS contribution
FROM hits h
JOIN qt ON qt.query_id = h.query_id
JOIN tf ON tf.{id_col} = h.{id_col} AND tf.term = qt.term
JOIN df ON df.term = qt.term
JOIN dl ON dl.{id_col} = h.{id_col}
ORDER BY h.query_id, h.{id_col}, tf.term
"""


def rank_eval_sql(queries: dict[str, str], ratings: dict[str, dict],
                  k: int, cfg: EngineConfig, metric: str = "precision",
                  rating_rule_sql: str | None = None,
                  table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Oracle for IndexSearcher.rank_eval (precision | mrr): the shared
    BM25 top-k CTE joined to the ratings (a VALUES table, or — when
    ``rating_rule_sql`` is given, e.g. "d.doc_id % 3 = 0" — a rule over
    the source table, rating 1; the entry derives its engine-side dict
    from the SAME rule).  Both metrics are one integer division
    (bit-exact)."""
    assert metric in ("precision", "mrr")
    if rating_rule_sql is not None:
        rat_block = (f"rat(query_id, {id_col}, rating) AS (\n"
                     f"  SELECT q.query_id, d.{id_col}, 1\n"
                     f"  FROM qids q CROSS JOIN {table} d\n"
                     f"  WHERE {rating_rule_sql})")
    else:
        rows = [f"({sql_quote(qid)}, {int(d)}, {int(r)})"
                for qid, rd_ in sorted(ratings.items())
                for d, r in sorted(rd_.items())]
        rat_values = ",\n       ".join(rows) if rows else \
            "('__none__', -1, 0)"
        rat_block = (f"rat(query_id, {id_col}, rating) AS "
                     f"(VALUES {rat_values})")
    inner = bm25_sql(queries, k, cfg, table, id_col, text_col)
    if metric == "precision":
        expr = (f"round(count(*) FILTER (r.rating > 0)::DOUBLE "
                f"/ {int(k)}, 6)")
        agg = f"""
  SELECT h.query_id, {expr} AS metric_score
  FROM hits h LEFT JOIN rat r
    ON r.query_id = h.query_id AND r.{id_col} = h.{id_col}
  GROUP BY h.query_id"""
    else:
        agg = f"""
  SELECT h.query_id,
         round(coalesce(1.0 / min(h.rank) FILTER (r.rating > 0), 0.0),
               6) AS metric_score
  FROM hits h LEFT JOIN rat r
    ON r.query_id = h.query_id AND r.{id_col} = h.{id_col}
  GROUP BY h.query_id"""
    return f"""
WITH hits AS ({inner}),
{_qids_cte(queries)},
{rat_block},
m AS ({agg})
SELECT q.query_id, coalesce(m.metric_score, 0.0) AS metric_score
FROM qids q LEFT JOIN m USING (query_id)
ORDER BY q.query_id
"""


def highlight_frag_sql(queries: dict[str, str], k: int,
                       cfg: EngineConfig, window: int = 5,
                       table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Oracle for IndexSearcher.highlight_fragments: min matched
    position per hit, then the +-window token slice of the lowered
    pre-stopword token list (1-based inclusive DuckDB slice ==
    the engine's 0-based [p-window, p+window])."""
    pat = sql_quote(cfg.split_pattern)
    qt_rows = []
    for qid, text in sorted(queries.items()):
        for term, _ in query_term_weights(text, cfg):
            qt_rows.append(f"({sql_quote(qid)}, {sql_quote(term)})")
    qt_values = ",\n       ".join(qt_rows) if qt_rows else \
        "('__none__', '__none__')"
    inner = bm25_sql(queries, k, cfg, table, id_col, text_col)
    lower = f"lower({text_col})" if cfg.lowercase else text_col
    return f"""
WITH hits AS ({inner}),
ht AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array({lower}, {pat}),
                     x -> x <> '') AS tk
  FROM {table}
),
u AS (
  SELECT {id_col}, unnest(tk) AS term,
         unnest(range(len(tk))) AS pos
  FROM ht
),
hqt(query_id, term) AS (VALUES {qt_values}),
first AS (
  SELECT h.query_id, h.{id_col}, min(u.pos) AS p
  FROM hits h
  JOIN hqt ON hqt.query_id = h.query_id
  JOIN u ON u.{id_col} = h.{id_col} AND u.term = hqt.term
  GROUP BY h.query_id, h.{id_col}
)
SELECT f.query_id, f.{id_col}, CAST(f.p AS BIGINT) AS first_pos,
       array_to_string(ht.tk[greatest(f.p + 1 - {int(window)}, 1)
                             : f.p + 1 + {int(window)}], ' ')
         AS fragment
FROM first f JOIN ht ON ht.{id_col} = f.{id_col}
ORDER BY f.query_id, f.{id_col}
"""


def boolean_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text", msm: int | None = None) -> str:
    """Boolean (+must / -must_not / should) BM25 oracle [Lucene
    BooleanQuery public semantics: MUST filters AND scores, SHOULD scores,
    MUST_NOT only filters].  Clause parsing comes from the engine's own
    ``parse_boolean_query`` so clause analysis can never drift.

    ``msm`` mirrors IndexSearcher.search(minimum_should_match=): a doc
    qualifies only with >= msm DISTINCT should terms matched."""
    from opensearch_jvector_ray.analyze import parse_boolean_query
    qt_rows, m_rows, n_rows, s_rows = [], [], [], []
    for qid, text in sorted(queries.items()):
        should, must, must_not = parse_boolean_query(text, cfg)
        counts: dict[str, int] = {}
        order = []
        for t in should + must:
            if t not in counts:
                order.append(t)
            counts[t] = counts.get(t, 0) + 1
        for t in order:
            qt_rows.append(f"({sql_quote(qid)}, {sql_quote(t)}, "
                           f"{float(counts[t])!r})")
        for t in must:
            m_rows.append(f"({sql_quote(qid)}, {sql_quote(t)})")
        for t in must_not:
            n_rows.append(f"({sql_quote(qid)}, {sql_quote(t)})")
        for t in dict.fromkeys(should):
            s_rows.append(f"({sql_quote(qid)}, {sql_quote(t)})")
    qt_values = ",\n       ".join(qt_rows) or "('__none__', '__none__', 0.0)"
    m_values = ",\n       ".join(m_rows) or "('__none__', '__none__')"
    n_values = ",\n       ".join(n_rows) or "('__none__', '__none__')"
    s_values = ",\n       ".join(s_rows) or "('__none__', '__none__')"
    msm_cte = f",\nsq(query_id, term) AS (VALUES {s_values})" \
        if msm is not None else ""
    msm_filter = f"""
    AND (SELECT count(DISTINCT sq.term) FROM sq
         JOIN toks t ON t.term = sq.term AND t.{id_col} = s.{id_col}
         WHERE sq.query_id = s.query_id) >= {int(msm)}""" \
        if msm is not None else ""
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
qt(query_id, term, w) AS (VALUES {qt_values}),
mq(query_id, term) AS (VALUES {m_values}),
nq(query_id, term) AS (VALUES {n_values}){msm_cte},
df AS (
  SELECT term, count(DISTINCT {id_col})::DOUBLE AS df FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term
),
tf AS (
  SELECT {id_col}, term, count(*)::DOUBLE AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY {id_col}, term
),
scores AS (
  SELECT qt.query_id, tf.{id_col},
         sum(qt.w * ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf / (tf.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / stats.avgdl)))
             ORDER BY qt.term
            ) AS score__raw
  FROM qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.{id_col} = tf.{id_col}
  CROSS JOIN stats
  GROUP BY qt.query_id, tf.{id_col}
),
filtered AS (
  SELECT s.query_id, s.{id_col}, s.score__raw FROM scores s
  WHERE NOT EXISTS (                               -- every MUST term hits
      SELECT 1 FROM mq
      WHERE mq.query_id = s.query_id
        AND NOT EXISTS (SELECT 1 FROM toks t
                        WHERE t.{id_col} = s.{id_col}
                          AND t.term = mq.term))
    AND NOT EXISTS (                               -- no MUST_NOT term hits
      SELECT 1 FROM nq
      JOIN toks t ON t.term = nq.term AND t.{id_col} = s.{id_col}
      WHERE nq.query_id = s.query_id){msm_filter}
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM filtered
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""


def simple_query_string_sql(queries: dict[str, str], k: int,
                            cfg: EngineConfig, max_expansions: int = 50,
                            table: str = "documents",
                            id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    """Oracle for IndexSearcher.simple_query_string: the clause
    structure comes from the ENGINE's own parse
    (analyze.parse_simple_query_string — one parse, two backends).
    Each clause renders as a radial raw-score CTE (term chunks:
    bm25_sql; phrases: phrase_sql(radial_raw); prefixes: bm25_sql over
    the (df DESC, term ASC)-capped vocabulary expansion).  Positive
    clauses FULL-OUTER-join per query on the doc key and sum as the
    engine's SEQUENTIAL clause-index chain (left-assoc COALESCE sums);
    MUST clauses require their score column > 0, MUST_NOT clauses LEFT
    JOIN and require absence.  Ranked (raw DESC, key ASC), round-6."""
    from opensearch_jvector_ray.analyze import parse_simple_query_string
    ctes, per_gid = [], []
    for g, (gid, text) in enumerate(sorted(queries.items())):
        clauses = parse_simple_query_string(text, cfg)
        pos_aliases, pos_must, neg_aliases = [], [], []
        for i, cl in enumerate(clauses):
            alias = f"q{g}c{i}"
            if cl["kind"] == "phrase":
                inner = phrase_sql({gid: " ".join(cl["words"])}, 0, cfg,
                                   table=table, id_col=id_col,
                                   text_col=text_col, radial_raw=True)
            elif cl["kind"] == "prefix":
                qt_cte = f"""{_vocab_cte(id_col)},
pq0(query_id, pfx) AS (VALUES ({sql_quote(gid)}, {sql_quote(cl["prefix"])})),
px AS (
  SELECT query_id, term FROM (
    SELECT p.query_id, v.term,
           row_number() OVER (PARTITION BY p.query_id, p.pfx
                              ORDER BY v.df DESC, v.term ASC) AS rn
    FROM pq0 p JOIN vocab v ON starts_with(v.term, p.pfx))
  WHERE rn <= {int(max_expansions)}
),
qt AS (
  SELECT query_id, term, 1.0 AS w FROM px
)"""
                inner = bm25_sql({}, 0, cfg, table=table, id_col=id_col,
                                 text_col=text_col, qt_cte=qt_cte,
                                 min_score=1e-300, emit_raw=True)
            else:
                chunk = " ".join(t for t, w in cl["tw"]
                                 for _ in range(int(w)))
                inner = bm25_sql({gid: chunk}, 0, cfg, table=table,
                                 id_col=id_col, text_col=text_col,
                                 min_score=1e-300, emit_raw=True)
            ctes.append(f"{alias} AS ({inner})")
            if cl["occur"] == "must_not":
                neg_aliases.append(alias)
            else:
                pos_aliases.append(alias)
                pos_must.append(cl["occur"] == "must")
        if not pos_aliases:
            continue          # only must_not clauses: engine emits nothing
        joined = (f"SELECT {pos_aliases[0]}.query_id AS query_id, "
                  f"{pos_aliases[0]}.{id_col} AS {id_col}, "
                  f"coalesce({pos_aliases[0]}.score__raw, 0.0) AS s0 "
                  f"FROM {pos_aliases[0]}")
        for i in range(1, len(pos_aliases)):
            prev = ", ".join(f"coalesce(j.s{jj}, 0.0) AS s{jj}"
                             for jj in range(i))
            joined = f"""SELECT coalesce(j.query_id, {pos_aliases[i]}.query_id) AS query_id,
       coalesce(j.{id_col}, {pos_aliases[i]}.{id_col}) AS {id_col},
       {prev},
       coalesce({pos_aliases[i]}.score__raw, 0.0) AS s{i}
FROM ({joined}) j FULL OUTER JOIN {pos_aliases[i]}
  ON j.query_id = {pos_aliases[i]}.query_id
 AND j.{id_col} = {pos_aliases[i]}.{id_col}"""
        conds = [f"p.s{i} > 0.0"
                 for i, m in enumerate(pos_must) if m]
        neg_joins = "".join(
            f"\nLEFT JOIN {na} ON {na}.query_id = p.query_id "
            f"AND {na}.{id_col} = p.{id_col}" for na in neg_aliases)
        conds += [f"{na}.{id_col} IS NULL" for na in neg_aliases]
        where = ("WHERE " + " AND ".join(conds)) if conds else ""
        total = " + ".join(f"p.s{i}" for i in range(len(pos_aliases)))
        per_gid.append(
            f"SELECT p.query_id, p.{id_col}, ({total}) AS score__raw "
            f"FROM ({joined}) p{neg_joins}\n{where}")
    if not per_gid:
        return (f"SELECT '' AS query_id, 0 AS rank, "
                f"CAST(NULL AS BIGINT) AS {id_col}, 0.0 AS score "
                f"WHERE FALSE")
    cte_block = ",\n".join(ctes)
    scored = "\n  UNION ALL\n".join(per_gid)
    return f"""
WITH {cte_block},
scored AS (
{scored}
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC
                           ) AS rank,
         {id_col}, score__raw
  FROM scored
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} AND score__raw > 0.0
ORDER BY query_id, rank
"""


def phrase_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
               table: str = "documents", id_col: str = "doc_id",
               text_col: str = "text", radial_raw: bool = False) -> str:
    """Exact-phrase BM25 oracle [Lucene PhraseQuery public semantics].

    Positions are indices into the PRE-stopword token list (the engine's
    position axis), so a stopword between phrase words breaks adjacency on
    both sides identically.  tf = occurrence count (overlaps included),
    idf = sum of member-term idfs over phrase positions.

    ``radial_raw`` skips ranking and emits every match as
    (query_id, {id_col}, score__raw) — the clause-CTE form the
    simple_query_string oracle composes.
    """
    from opensearch_jvector_ray.analyze import analyze_query
    pat = sql_quote(cfg.split_pattern)
    per_query = []
    for qid, text in sorted(queries.items()):
        words = analyze_query(text, cfg)
        conds = [f"toks[i] = {sql_quote(words[0])}",
                 f"i + {len(words) - 1} <= len(toks)"]
        conds += [f"toks[i + {j}] = {sql_quote(w)}"
                  for j, w in enumerate(words[1:], start=1)]
        idf_terms = " + ".join(
            f"(SELECT idf FROM idf WHERE term = {sql_quote(w)})" for w in words)
        per_query.append(f"""
SELECT {sql_quote(qid)} AS query_id, p.{id_col},
       ({idf_terms})
       * (p.tf / (p.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))) AS score__raw
FROM (
  SELECT {id_col}, count(*)::DOUBLE AS tf
  FROM (SELECT {id_col}, toks, unnest(range(1, len(toks) + 1)) AS i
        FROM tokpos) u
  WHERE {' AND '.join(conds)}
  GROUP BY {id_col}
) p JOIN dl ON dl.{id_col} = p.{id_col}""")
    union = "\nUNION ALL\n".join(per_query)
    tail = (f"SELECT query_id, {id_col}, score__raw FROM scores"
            if radial_raw else f"""SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank""")
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
),
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
idf AS (
  SELECT term,
         ln(1.0 + ((SELECT n FROM stats) - count(DISTINCT {id_col}) + 0.5)
                  / (count(DISTINCT {id_col}) + 0.5)) AS idf
  FROM toks GROUP BY term
),
scores AS ({union}),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)
{tail}
"""


def span_near_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                  slop: int = 0, table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    """Unordered-proximity BM25 oracle (query.SegmentSearcher._span_near
    mirror): with W = n_distinct_terms + slop, tf = number of start
    positions i in [2-W, len(toks)] whose width-W window (clamped at the
    list ends) contains every distinct query term; score = idf_sum *
    tf/(tf + k1*norm) — the phrase scorer with windowed containment.
    Positions are PRE-stopword indices on both sides."""
    from opensearch_jvector_ray.analyze import analyze_query
    pat = sql_quote(cfg.split_pattern)
    per_query = []
    for qid, text in sorted(queries.items()):
        words = list(dict.fromkeys(analyze_query(text, cfg)))
        w_n = len(words) + int(slop)
        conds = [f"list_contains(toks[greatest(i, 1) : i + {w_n - 1}], "
                 f"{sql_quote(w)})" for w in words]
        idf_terms = " + ".join(
            f"(SELECT idf FROM idf WHERE term = {sql_quote(w)})"
            for w in words)
        per_query.append(f"""
SELECT {sql_quote(qid)} AS query_id, p.{id_col},
       ({idf_terms})
       * (p.tf / (p.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))) AS score__raw
FROM (
  SELECT {id_col}, count(*)::DOUBLE AS tf
  FROM (SELECT {id_col}, toks,
               unnest(range({2 - w_n}, len(toks) + 1)) AS i
        FROM tokpos) u
  WHERE {' AND '.join(conds)}
  GROUP BY {id_col}
) p JOIN dl ON dl.{id_col} = p.{id_col}""")
    union = "\nUNION ALL\n".join(per_query)
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
),
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
idf AS (
  SELECT term,
         ln(1.0 + ((SELECT n FROM stats) - count(DISTINCT {id_col}) + 0.5)
                  / (count(DISTINCT {id_col}) + 0.5)) AS idf
  FROM toks GROUP BY term
),
scores AS ({union}),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""


def span_or_near_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                     slop: int = 0, table: str = "documents",
                     id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Oracle for search(mode='span_or')
    (query.SegmentSearcher._span_or_near mirror): clauses separated by
    whitespace, '|'-separated alternative members inside a clause; a
    width-W (W = n_clauses + slop) window must contain >= 1 occurrence
    of SOME member of EVERY clause; clause idf = idf of the MAX member
    df (the SynonymQuery-blended rule); idf_sum in clause order."""
    from opensearch_jvector_ray.analyze import analyze_query
    pat = sql_quote(cfg.split_pattern)
    per_query = []
    for qid, text in sorted(queries.items()):
        clauses = []
        for clause in text.split():
            members: list[str] = []
            for m in clause.split("|"):
                members.extend(analyze_query(m, cfg))
            clauses.append(sorted(set(members)))
        w_n = len(clauses) + int(slop)
        conds = []
        idf_parts = []
        for members in clauses:
            any_member = " OR ".join(
                f"list_contains(toks[greatest(i, 1) : i + {w_n - 1}], "
                f"{sql_quote(m)})" for m in members)
            conds.append(f"({any_member})")
            in_list = ", ".join(sql_quote(m) for m in members)
            # clause idf: idf of the member with the LARGEST df —
            # dffull carries per-term df so max(df) picks the member,
            # then its idf (idf is monotone decreasing in df)
            idf_parts.append(
                f"(SELECT min(idf) FROM dffull WHERE term IN ({in_list})"
                f" AND df = (SELECT max(df) FROM dffull WHERE term IN "
                f"({in_list})))")
        idf_sum = " + ".join(idf_parts)
        per_query.append(f"""
SELECT {sql_quote(qid)} AS query_id, p.{id_col},
       ({idf_sum})
       * (p.tf / (p.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))) AS score__raw
FROM (
  SELECT {id_col}, count(*)::DOUBLE AS tf
  FROM (SELECT {id_col}, toks,
               unnest(range({2 - w_n}, len(toks) + 1)) AS i
        FROM tokpos) u
  WHERE {' AND '.join(conds)}
  GROUP BY {id_col}
) p JOIN dl ON dl.{id_col} = p.{id_col}""")
    union = "\nUNION ALL\n".join(per_query)
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
),
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
dffull AS (
  SELECT term, count(DISTINCT {id_col})::DOUBLE AS df,
         ln(1.0 + ((SELECT n FROM stats) - count(DISTINCT {id_col}) + 0.5)
                  / (count(DISTINCT {id_col}) + 0.5)) AS idf
  FROM toks GROUP BY term
),
scores AS ({union}),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} ORDER BY query_id, rank
"""


def span_multi_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                   slop: int = 0, max_expansions: int = 50,
                   table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """Oracle for IndexSearcher.span_multi_search [Lucene
    SpanMultiTermQueryWrapper(PrefixQuery) in SpanNearQuery]: clauses
    separated by whitespace; a trailing-``*`` clause expands to the top
    ``max_expansions`` vocabulary terms with that prefix (df DESC, term
    ASC — the engine's expand_prefix cap rule, the phrase_prefix px
    CTE); containment and blended clause idf are exactly
    span_or_near_sql's rules with the prefix clause's member set drawn
    from px."""
    from opensearch_jvector_ray.analyze import analyze_query
    pat = sql_quote(cfg.split_pattern)
    pfx_rows: list[str] = []
    per_query = []
    for qid, text in sorted(queries.items()):
        clauses: list[tuple[str, list[str] | None]] = []
        for j, clause in enumerate(text.split()):
            if clause.endswith("*") and len(clause) > 1:
                toks = analyze_query(clause[:-1], cfg)
                assert len(toks) == 1, \
                    f"span_multi prefix clause {clause!r}: {toks}"
                pfx_rows.append(f"({sql_quote(qid)}, {j}, "
                                f"{sql_quote(toks[0])})")
                clauses.append((str(j), None))
            else:
                members: list[str] = []
                for m in clause.split("|"):
                    members.extend(analyze_query(m, cfg))
                clauses.append((str(j), sorted(set(members))))
        w_n = len(clauses) + int(slop)
        conds = []
        idf_parts = []
        for j, members in clauses:
            if members is None:
                px_terms = (f"SELECT term FROM px WHERE query_id = "
                            f"{sql_quote(qid)} AND cl = {j}")
                conds.append(
                    f"EXISTS (SELECT 1 FROM px WHERE px.query_id = "
                    f"{sql_quote(qid)} AND px.cl = {j} AND list_contains("
                    f"toks[greatest(i, 1) : i + {w_n - 1}], px.term))")
                idf_parts.append(
                    f"(SELECT min(idf) FROM dffull WHERE term IN "
                    f"({px_terms}) AND df = (SELECT max(df) FROM dffull "
                    f"WHERE term IN ({px_terms})))")
            else:
                any_member = " OR ".join(
                    f"list_contains(toks[greatest(i, 1) : i + {w_n - 1}], "
                    f"{sql_quote(m)})" for m in members)
                conds.append(f"({any_member})")
                in_list = ", ".join(sql_quote(m) for m in members)
                idf_parts.append(
                    f"(SELECT min(idf) FROM dffull WHERE term IN "
                    f"({in_list}) AND df = (SELECT max(df) FROM dffull "
                    f"WHERE term IN ({in_list})))")
        idf_sum = " + ".join(idf_parts)
        per_query.append(f"""
SELECT {sql_quote(qid)} AS query_id, p.{id_col},
       ({idf_sum})
       * (p.tf / (p.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))) AS score__raw
FROM (
  SELECT {id_col}, count(*)::DOUBLE AS tf
  FROM (SELECT {id_col}, toks,
               unnest(range({2 - w_n}, len(toks) + 1)) AS i
        FROM tokpos) u
  WHERE {' AND '.join(conds)}
  GROUP BY {id_col}
) p JOIN dl ON dl.{id_col} = p.{id_col}""")
    union = "\nUNION ALL\n".join(per_query)
    pfx_values = ",\n       ".join(pfx_rows) if pfx_rows else \
        "('__none__', 0, '¤¤')"
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
),
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
{_vocab_cte(id_col)},
pq0(query_id, cl, pfx) AS (VALUES {pfx_values}),
px AS (
  SELECT query_id, cl, term FROM (
    SELECT p.query_id, p.cl, v.term,
           row_number() OVER (PARTITION BY p.query_id, p.cl
                              ORDER BY v.df DESC, v.term ASC) AS rn
    FROM pq0 p JOIN vocab v ON starts_with(v.term, p.pfx))
  WHERE rn <= {int(max_expansions)}
),
dffull AS (
  SELECT term, count(DISTINCT {id_col})::DOUBLE AS df,
         ln(1.0 + ((SELECT n FROM stats) - count(DISTINCT {id_col}) + 0.5)
                  / (count(DISTINCT {id_col}) + 0.5)) AS idf
  FROM toks GROUP BY term
),
scores AS ({union}),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} ORDER BY query_id, rank
"""


def span_not_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                 pre: int = 0, post: int = 0, table: str = "documents",
                 id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for search(mode='span_not')
    (query.SegmentSearcher._span_not mirror): an include-term position
    p survives unless an exclude-term position q has
    q - pre <= p <= q + post (both on the 1-based pre-stopword list
    axis — translation-invariant vs the engine's 0-based rule); tf =
    survivors, score = idf(include) * tf-part."""
    from opensearch_jvector_ray.analyze import analyze_query
    pat = sql_quote(cfg.split_pattern)
    per_query = []
    for qid, text in sorted(queries.items()):
        toks = analyze_query(text, cfg)
        assert len(toks) == 2, f"span_not query {qid!r}: {toks}"
        inc, exc = toks
        per_query.append(f"""
SELECT {sql_quote(qid)} AS query_id, p.{id_col},
       (SELECT idf FROM idf WHERE term = {sql_quote(inc)})
       * (p.tf / (p.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))) AS score__raw
FROM (
  SELECT {id_col},
         len(list_filter(
           list_filter(range(1, len(toks) + 1),
                       i -> toks[i] = {sql_quote(inc)}),
           i -> len(list_filter(
                  list_filter(range(1, len(toks) + 1),
                              j -> toks[j] = {sql_quote(exc)}),
                  j -> i >= j - {int(pre)} AND i <= j + {int(post)}))
                = 0))::DOUBLE AS tf
  FROM tokpos
) p JOIN dl ON dl.{id_col} = p.{id_col}
WHERE p.tf > 0""")
    union = "\nUNION ALL\n".join(per_query)
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
),
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
idf AS (
  SELECT term,
         ln(1.0 + ((SELECT n FROM stats) - count(DISTINCT {id_col}) + 0.5)
                  / (count(DISTINCT {id_col}) + 0.5)) AS idf
  FROM toks GROUP BY term
),
scores AS ({union}),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} ORDER BY query_id, rank
"""


def span_first_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                   end: int, table: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for search(mode='span_first')
    (query.SegmentSearcher._span_first mirror): a term occurrence
    counts only inside the document's first ``end`` PRE-stopword tokens
    (engine positions 0..end-1 == SQL list slice toks[1:end]); per term
    tf_first drives the standard match-query contribution, summed in
    analyzed first-appearance order (ordered aggregate == the engine's
    sequential term loop).  Terms/weights come from the engine's own
    ``query_term_weights``."""
    from opensearch_jvector_ray.analyze import query_term_weights
    pat = sql_quote(cfg.split_pattern)
    per_query = []
    for qid, text in sorted(queries.items()):
        tw = query_term_weights(text, cfg)
        arms = []
        for j, (t, w) in enumerate(tw):
            arms.append(f"""
  SELECT p.{id_col}, {j} AS term_idx,
         {float(w)!r} * (SELECT idf FROM idf WHERE term = {sql_quote(t)})
         * (p.tf / (p.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))) AS contrib
  FROM (
    SELECT {id_col}, count(*)::DOUBLE AS tf
    FROM (SELECT {id_col}, unnest(toks[1:{int(end)}]) AS tok
          FROM tokpos) u
    WHERE tok = {sql_quote(t)}
    GROUP BY {id_col}
  ) p JOIN dl ON dl.{id_col} = p.{id_col}""")
        arm_union = "\n  UNION ALL\n".join(arms)
        per_query.append(f"""
SELECT {sql_quote(qid)} AS query_id, x.{id_col},
       sum(x.contrib ORDER BY x.term_idx) AS score__raw
FROM (
{arm_union}
) x GROUP BY x.{id_col}""")
    union = "\nUNION ALL\n".join(per_query)
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
),
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
idf AS (
  SELECT term,
         ln(1.0 + ((SELECT n FROM stats) - count(DISTINCT {id_col}) + 0.5)
                  / (count(DISTINCT {id_col}) + 0.5)) AS idf
  FROM toks GROUP BY term
),
scores AS ({union}),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} ORDER BY query_id, rank
"""


def span_ordered_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                     slop: int = 0, table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for search(mode='span_ordered')
    (query.SegmentSearcher._span_ordered mirror): with W =
    n_sequence_terms + slop, tf = number of first-term positions p1
    (1-based list axis) for which a strictly increasing chain
    p1 < p2 < ... < pn of the remaining sequence terms exists inside
    [p1, p1+W-1] — expressed as nested window-bounded existentials
    (each level scans only range(p_{i-1}+1, p1+W), so the check is
    occurrence x window-sized, not doc-length-cubed); score = idf_sum
    (sequence order, duplicates counted) * tf-part."""
    from opensearch_jvector_ray.analyze import analyze_query
    pat = sql_quote(cfg.split_pattern)
    per_query = []
    for qid, text in sorted(queries.items()):
        words = analyze_query(text, cfg)
        assert words, f"span_ordered query {qid!r} analyzes to nothing"
        w_n = len(words) + int(slop)

        def _chain(i: int) -> str:
            # existential for sequence slot i (1-based; p1 is bound by
            # the outer tf list_filter)
            if i > len(words):
                return "true"
            inner = _chain(i + 1)
            cond = f"toks[p{i}] = {sql_quote(words[i - 1])}"
            if inner != "true":
                cond += f" AND {inner}"
            return (f"len(list_filter(range(p{i - 1} + 1, p1 + {w_n}), "
                    f"p{i} -> {cond})) > 0")

        chain = _chain(2) if len(words) > 1 else "true"
        idf_terms = " + ".join(
            f"(SELECT idf FROM idf WHERE term = {sql_quote(w)})"
            for w in words)
        per_query.append(f"""
SELECT {sql_quote(qid)} AS query_id, p.{id_col},
       ({idf_terms})
       * (p.tf / (p.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))) AS score__raw
FROM (
  SELECT {id_col},
         len(list_filter(
           list_filter(range(1, len(toks) + 1),
                       p1 -> toks[p1] = {sql_quote(words[0])}),
           p1 -> {chain}))::DOUBLE AS tf
  FROM tokpos
) p JOIN dl ON dl.{id_col} = p.{id_col}
WHERE p.tf > 0""")
    union = "\nUNION ALL\n".join(per_query)
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
),
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
idf AS (
  SELECT term,
         ln(1.0 + ((SELECT n FROM stats) - count(DISTINCT {id_col}) + 0.5)
                  / (count(DISTINCT {id_col}) + 0.5)) AS idf
  FROM toks GROUP BY term
),
scores AS ({union}),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} ORDER BY query_id, rank
"""


def span_containing_sql(queries: dict[str, str], k: int,
                        cfg: EngineConfig, slop: int = 0,
                        table: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """Oracle for search(mode='span_containing')
    (query.SegmentSearcher._span_containing mirror): query analyzes to
    (little, big...); with W = n_distinct_big + slop, tf = number of
    window starts i whose width-W window contains every big term AND
    >= 1 little occurrence (span_near over big+little with big-width W);
    score = idf_sum(BIG terms only, appearance-order '+'-chain) *
    tf-part — the big span is what's scored."""
    from opensearch_jvector_ray.analyze import analyze_query
    pat = sql_quote(cfg.split_pattern)
    per_query = []
    for qid, text in sorted(queries.items()):
        toks = analyze_query(text, cfg)
        assert len(toks) >= 2, f"span_containing query {qid!r}: {toks}"
        little, big = toks[0], list(dict.fromkeys(toks[1:]))
        w_n = len(big) + int(slop)
        conds = [f"list_contains(toks[greatest(i, 1) : i + {w_n - 1}], "
                 f"{sql_quote(w)})" for w in [*big, little]]
        idf_terms = " + ".join(
            f"(SELECT idf FROM idf WHERE term = {sql_quote(w)})"
            for w in big)
        per_query.append(f"""
SELECT {sql_quote(qid)} AS query_id, p.{id_col},
       ({idf_terms})
       * (p.tf / (p.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))) AS score__raw
FROM (
  SELECT {id_col}, count(*)::DOUBLE AS tf
  FROM (SELECT {id_col}, toks,
               unnest(range({2 - w_n}, len(toks) + 1)) AS i
        FROM tokpos) u
  WHERE {' AND '.join(conds)}
  GROUP BY {id_col}
) p JOIN dl ON dl.{id_col} = p.{id_col}""")
    union = "\nUNION ALL\n".join(per_query)
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
),
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
idf AS (
  SELECT term,
         ln(1.0 + ((SELECT n FROM stats) - count(DISTINCT {id_col}) + 0.5)
                  / (count(DISTINCT {id_col}) + 0.5)) AS idf
  FROM toks GROUP BY term
),
scores AS ({union}),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} ORDER BY query_id, rank
"""


def span_within_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                    slop: int = 0, table: str = "documents",
                    id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Oracle for search(mode='span_within')
    (query.SegmentSearcher._span_within mirror): query analyzes to
    (little, big...); with W = n_distinct_big + slop, a little-term
    position pl (1-based list axis) qualifies iff SOME window start i
    in [pl-W+1, pl] has its width-W window toks[max(i,1) : i+W-1]
    contain every big term (i.e. a valid big window covers pl); tf =
    qualifying little positions; score = idf(little) * tf-part — the
    little span is what's scored."""
    from opensearch_jvector_ray.analyze import analyze_query
    pat = sql_quote(cfg.split_pattern)
    per_query = []
    for qid, text in sorted(queries.items()):
        toks = analyze_query(text, cfg)
        assert len(toks) >= 2, f"span_within query {qid!r}: {toks}"
        little, big = toks[0], list(dict.fromkeys(toks[1:]))
        w_n = len(big) + int(slop)
        big_conds = " AND ".join(
            f"list_contains(toks[greatest(i, 1) : i + {w_n - 1}], "
            f"{sql_quote(w)})" for w in big)
        per_query.append(f"""
SELECT {sql_quote(qid)} AS query_id, p.{id_col},
       (SELECT idf FROM idf WHERE term = {sql_quote(little)})
       * (p.tf / (p.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))) AS score__raw
FROM (
  SELECT {id_col},
         len(list_filter(
           list_filter(range(1, len(toks) + 1),
                       pl -> toks[pl] = {sql_quote(little)}),
           pl -> len(list_filter(range(pl - {w_n - 1}, pl + 1),
                     i -> {big_conds})) > 0))::DOUBLE AS tf
  FROM tokpos
) p JOIN dl ON dl.{id_col} = p.{id_col}
WHERE p.tf > 0""")
    union = "\nUNION ALL\n".join(per_query)
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
),
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
idf AS (
  SELECT term,
         ln(1.0 + ((SELECT n FROM stats) - count(DISTINCT {id_col}) + 0.5)
                  / (count(DISTINCT {id_col}) + 0.5)) AS idf
  FROM toks GROUP BY term
),
scores AS ({union}),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} ORDER BY query_id, rank
"""


def phrase_prefix_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                      max_expansions: int = 50, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for IndexSearcher.phrase_prefix_search [Lucene
    MultiPhraseQuery]: the last analyzed token expands against the
    vocabulary (df DESC, term ASC, capped — the CAPPED set matches, as
    in Lucene); the last phrase slot accepts any expansion via IN;
    idf_sum = literal '+'-chain (position order) + ONE ordered-aggregate
    sum over the expansion idfs (term ASC) — the engine pins the same fp
    grouping."""
    from opensearch_jvector_ray.analyze import analyze_query
    pat = sql_quote(cfg.split_pattern)
    pfx_rows, per_query = [], []
    for qid, text in sorted(queries.items()):
        words = analyze_query(text, cfg)
        if not words:
            continue
        lits, pfx = words[:-1], words[-1]
        pfx_rows.append(f"({sql_quote(qid)}, {sql_quote(pfx)})")
        n_lit = len(lits)
        in_px = (f"IN (SELECT term FROM px WHERE query_id = "
                 f"{sql_quote(qid)})")
        conds = [f"i + {n_lit} <= len(toks)"] if n_lit else []
        conds += [f"toks[i + {j}] = {sql_quote(w)}" if j else
                  f"toks[i] = {sql_quote(w)}"
                  for j, w in enumerate(lits)]
        conds.append((f"toks[i + {n_lit}] {in_px}") if n_lit
                     else f"toks[i] {in_px}")
        idf_parts = [f"(SELECT idf FROM idf WHERE term = {sql_quote(w)})"
                     for w in lits]
        idf_parts.append(
            f"(SELECT sum(idf ORDER BY term) FROM idf WHERE term "
            f"{in_px})")
        per_query.append(f"""
SELECT {sql_quote(qid)} AS query_id, p.{id_col},
       ({' + '.join(idf_parts)})
       * (p.tf / (p.tf + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r} * dl.dl / (SELECT avgdl FROM stats)))) AS score__raw
FROM (
  SELECT {id_col}, count(*)::DOUBLE AS tf
  FROM (SELECT {id_col}, toks, unnest(range(1, len(toks) + 1)) AS i
        FROM tokpos) u
  WHERE {' AND '.join(conds)}
  GROUP BY {id_col}
) p JOIN dl ON dl.{id_col} = p.{id_col}""")
    union = "\nUNION ALL\n".join(per_query) if per_query else \
        "SELECT '__none__' AS query_id, NULL, 0.0 WHERE false"
    pfx_values = ",\n       ".join(pfx_rows) if pfx_rows else \
        "('__none__', '¤¤')"
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tokpos AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
),
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
),
{_vocab_cte(id_col)},
pq0(query_id, pfx) AS (VALUES {pfx_values}),
px AS (
  SELECT query_id, term FROM (
    SELECT p.query_id, v.term,
           row_number() OVER (PARTITION BY p.query_id, p.pfx
                              ORDER BY v.df DESC, v.term ASC) AS rn
    FROM pq0 p JOIN vocab v ON starts_with(v.term, p.pfx))
  WHERE rn <= {int(max_expansions)}
),
idf AS (
  SELECT term,
         ln(1.0 + ((SELECT n FROM stats) - count(DISTINCT {id_col}) + 0.5)
                  / (count(DISTINCT {id_col}) + 0.5)) AS idf
  FROM toks GROUP BY term
),
scores AS ({union}),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores WHERE score__raw > 0.0
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} ORDER BY query_id, rank
"""


def term_stats_sql(terms: list[str], cfg: EngineConfig,
                   table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    tlist = "(" + ", ".join(sql_quote(t) for t in sorted(terms)) + ")"
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)}
SELECT term,
       count(DISTINCT {id_col})::BIGINT AS df,
       count(*)::BIGINT AS cf
FROM toks WHERE term IN {tlist}
GROUP BY term ORDER BY term
"""


def term_vectors_sql(doc_ids: list, cfg: EngineConfig,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Oracle for IndexSearcher.term_vectors: per-(doc, term) analyzed
    term frequency of the selected docs, joined to the corpus-global
    doc_freq (distinct docs) and ttf (total occurrences) — the
    dictionary's df/cf definitions (term_stats_sql)."""
    dlist = "(" + ", ".join(
        sql_quote(d) if isinstance(d, str) else repr(int(d))
        for d in sorted(doc_ids)) + ")"
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tf AS (
  SELECT {id_col} AS doc_id, term, count(*)::BIGINT AS term_freq
  FROM toks WHERE {id_col} IN {dlist}
  GROUP BY {id_col}, term
),
g AS (
  SELECT term, count(DISTINCT {id_col})::BIGINT AS doc_freq,
         count(*)::BIGINT AS ttf
  FROM toks GROUP BY term
)
SELECT tf.doc_id, tf.term, tf.term_freq, g.doc_freq, g.ttf
FROM tf JOIN g USING (term)
ORDER BY tf.doc_id, tf.term
"""


def analyze_api_sql(doc_ids: list, cfg: EngineConfig,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Oracle for analyze.analyze_api: the surviving (post-stop, post-
    stem) token of every pre-stopword position of the selected docs —
    position = 0-based index on the non-empty token stream BEFORE
    stopword removal (highlight_sql's axis)."""
    from opensearch_jvector_ray.analyze import STEM_PATTERN
    pat = sql_quote(cfg.split_pattern)
    stop = stoplist_sql(cfg)
    dlist = "(" + ", ".join(
        sql_quote(d) if isinstance(d, str) else repr(int(d))
        for d in sorted(doc_ids)) + ")"
    term_expr = "term"
    if cfg.stemmer == "minimal_english":
        term_expr = (f"regexp_replace(term, {sql_quote(STEM_PATTERN)}, "
                     f"'\\1')")
    return f"""
WITH ht AS (
  SELECT {id_col} AS doc_id,
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS tk
  FROM {table} WHERE {id_col} IN {dlist}
),
u AS (
  SELECT doc_id, unnest(tk) AS term, unnest(range(len(tk))) AS pos
  FROM ht
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, {term_expr} AS token
FROM u WHERE NOT list_contains({stop}, term)
ORDER BY doc_id, pos
"""


def collection_stats_sql(cfg: EngineConfig, table: str = "documents",
                         id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
dl AS (SELECT {id_col}, count(*) AS dl FROM toks GROUP BY {id_col})
SELECT (SELECT count(*) FROM {table})::BIGINT AS n_docs,
       (SELECT count(*) FROM dl)::BIGINT AS n_docs_indexed,
       (SELECT coalesce(sum(dl), 0) FROM dl)::BIGINT AS total_tokens,
       round((SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM dl), 6) AS avgdl,
       (SELECT count(DISTINCT term) FROM toks)::BIGINT AS n_terms
"""


def token_count_sql(cfg: EngineConfig, table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
dl AS (SELECT {id_col}, count(*) AS n FROM toks GROUP BY {id_col})
SELECT d.{id_col}, coalesce(dl.n, 0)::BIGINT AS n_tokens
FROM {table} d LEFT JOIN dl ON dl.{id_col} = d.{id_col}
ORDER BY d.{id_col}
"""


def bpe_count_sql(pattern: str, table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for bpe_count_stage: DuckDB's regexp_extract_all compiles
    the SAME RE2 pattern string, so match counts are engine-identical."""
    return f"""
SELECT {id_col},
       len(regexp_extract_all({text_col}, '\\S+'))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all({text_col}, {sql_quote(pattern)}))::BIGINT
         AS n_bpe_tokens
FROM {table} ORDER BY {id_col}
"""


def bpe_merges_sql(pattern: str, top_k: int,
                   table: str = "documents",
                   text_col: str = "text") -> str:
    """Oracle for corpus.bpe_merge_candidates: adjacent char pairs
    inside every pre-token (regexp_extract_all shares the engine's
    pattern string verbatim; substring is character-based like the
    engine's utf-32 view), counted corpus-wide, ranked (count DESC,
    pair ASC — binary collation == codepoint order), top_k."""
    return f"""
WITH pt AS (
  SELECT unnest(regexp_extract_all({text_col}, {sql_quote(pattern)}))
    AS t
  FROM {table}
),
pairs AS (
  SELECT substring(t, i, 2) AS pair
  FROM (SELECT t, unnest(range(1, length(t))) AS i FROM pt) u
)
SELECT pair, count(*)::BIGINT AS cnt
FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair ASC
LIMIT {int(top_k)}
"""


def fingerprint_sql(cfg: EngineConfig, table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
SELECT {id_col}, md5({norm_text_expr(cfg, text_col)}) AS fingerprint
FROM {table} ORDER BY {id_col}
"""


def exact_dedup_sql(cfg: EngineConfig, table: str = "documents",
                    id_col: str = "doc_id", text_col: str = "text",
                    id_cast: "str | None" = "BIGINT") -> str:
    cast = f"::{id_cast}" if id_cast else ""
    return f"""
SELECT md5({norm_text_expr(cfg, text_col)}) AS text_hash,
       min({id_col}){cast} AS canonical_id,
       count(*)::BIGINT AS n_dups
FROM {table} GROUP BY 1 ORDER BY text_hash
"""


def quality_sql(cfg: EngineConfig, table: str = "documents",
                id_col: str = "doc_id", text_col: str = "text") -> str:
    pat = sql_quote(cfg.split_pattern)
    stop = stoplist_sql(cfg)
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
), f AS (
  SELECT {id_col},
         len(toks)::BIGINT AS total,
         len(list_filter(toks, x -> list_contains({stop}, x)))::DOUBLE AS nstop,
         coalesce(list_aggregate(list_transform(toks, x -> strlen(x)), 'sum'), 0)::DOUBLE AS sumlen
  FROM t
)
SELECT {id_col},
       total AS n_tokens_all,
       round(nstop / greatest(total, 1), 6) AS stop_ratio,
       round(sumlen / greatest(total, 1), 6) AS mean_token_len
FROM f ORDER BY {id_col}
"""


def repetition_sql(cfg: EngineConfig, table: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """Gopher-style repetition signals (engine: repetition_stage).
    Bigram = term || ' ' || next term — injective because tokens match
    [a-z0-9]+ (no spaces); parallel unnest zips (term, pos)."""
    pat = sql_quote(cfg.split_pattern)
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
), u AS (
  SELECT {id_col}, unnest(toks) AS term,
         unnest(range(len(toks))) AS pos
  FROM t
), b AS (
  SELECT {id_col}, term,
         lead(term) OVER (PARTITION BY {id_col} ORDER BY pos) AS nxt
  FROM u
), g AS (
  SELECT {id_col},
         count(*)::BIGINT AS nt,
         count(DISTINCT term)::BIGINT AS dt,
         count(nxt)::BIGINT AS nb,
         count(DISTINCT term || ' ' || nxt)::BIGINT AS db
  FROM b GROUP BY {id_col}
)
SELECT d.{id_col},
       coalesce(round(1.0 - g.dt / nullif(g.nt, 0), 6), 0.0) AS dup_token_ratio,
       coalesce(round(1.0 - g.db / nullif(g.nb, 0), 6), 0.0) AS dup_bigram_ratio
FROM {table} d LEFT JOIN g ON g.{id_col} = d.{id_col}
ORDER BY d.{id_col}
"""


def gopher_filter_sql(cfg: EngineConfig, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text",
                      **rules) -> str:
    """Oracle for gopher_filter_stage: same six rules, same bit layout.
    Every ratio is one IEEE division of exact integers (no rounding), so
    comparisons are bit-identical to the engine.  Thresholds default
    from the ENGINE's GOPHER_DEFAULTS (shared constant — cannot drift)."""
    from opensearch_jvector_ray.pipelines.textstats import GOPHER_DEFAULTS
    unknown = sorted(set(rules) - set(GOPHER_DEFAULTS))
    if unknown:
        raise TypeError(f"unknown gopher rule(s) {unknown}; valid: "
                        f"{sorted(GOPHER_DEFAULTS)}")
    p = {**GOPHER_DEFAULTS, **rules}
    min_tokens, max_tokens = p["min_tokens"], p["max_tokens"]
    min_mean_len, max_mean_len = p["min_mean_len"], p["max_mean_len"]
    min_stop_hits = p["min_stop_hits"]
    min_alpha_ratio = p["min_alpha_ratio"]
    max_dup_token_ratio = p["max_dup_token_ratio"]
    max_dup_bigram_ratio = p["max_dup_bigram_ratio"]
    pat = sql_quote(cfg.split_pattern)
    stop = stoplist_sql(cfg)
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
), u AS (
  SELECT {id_col}, unnest(toks) AS term,
         unnest(range(len(toks))) AS pos
  FROM t
), b AS (
  SELECT {id_col}, term,
         lead(term) OVER (PARTITION BY {id_col} ORDER BY pos) AS nxt
  FROM u
), g AS (
  SELECT {id_col},
         count(*)::BIGINT AS nt,
         sum(len(term))::BIGINT AS sum_len,
         count(CASE WHEN list_contains({stop}, term) THEN 1 END)::BIGINT
           AS n_stop,
         count(CASE WHEN regexp_matches(term, '[a-z]') THEN 1 END)::BIGINT
           AS n_alpha,
         count(DISTINCT term)::BIGINT AS dt,
         count(nxt)::BIGINT AS nb,
         count(DISTINCT term || ' ' || nxt)::BIGINT AS db
  FROM b GROUP BY {id_col}
), m AS (
  SELECT d.{id_col},
         coalesce(g.nt, 0) AS nt, coalesce(g.sum_len, 0) AS sum_len,
         coalesce(g.n_stop, 0) AS n_stop,
         coalesce(g.n_alpha, 0) AS n_alpha,
         coalesce(g.dt, 0) AS dt, coalesce(g.nb, 0) AS nb,
         coalesce(g.db, 0) AS db
  FROM {table} d LEFT JOIN g ON g.{id_col} = d.{id_col}
), f AS (
  SELECT {id_col}, nt,
    (CASE WHEN nt < {min_tokens} OR nt > {max_tokens} THEN 1 ELSE 0 END
     + CASE WHEN (CAST(sum_len AS DOUBLE) / greatest(nt, 1))
                   < {min_mean_len!r}
              OR (CAST(sum_len AS DOUBLE) / greatest(nt, 1))
                   > {max_mean_len!r} THEN 2 ELSE 0 END
     + CASE WHEN n_stop < {min_stop_hits} THEN 4 ELSE 0 END
     + CASE WHEN (CAST(n_alpha AS DOUBLE) / greatest(nt, 1))
                   < {min_alpha_ratio!r} THEN 8 ELSE 0 END
     + CASE WHEN (CASE WHEN nt > 0
                       THEN 1.0 - CAST(dt AS DOUBLE) / greatest(nt, 1)
                       ELSE 0.0 END) > {max_dup_token_ratio!r}
            THEN 16 ELSE 0 END
     + CASE WHEN (CASE WHEN nb > 0
                       THEN 1.0 - CAST(db AS DOUBLE) / greatest(nb, 1)
                       ELSE 0.0 END) > {max_dup_bigram_ratio!r}
            THEN 32 ELSE 0 END)::BIGINT AS fail_mask
  FROM m
)
SELECT {id_col}, nt AS n_tokens_all, fail_mask,
       (CASE WHEN fail_mask = 0 THEN 1 ELSE 0 END)::BIGINT AS keep
FROM f ORDER BY {id_col}
"""


def lang_id_sql(cfg: EngineConfig, threshold: float = 0.1,
                table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    pat = sql_quote(cfg.split_pattern)
    stop = stoplist_sql(cfg)
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
)
SELECT {id_col},
       CASE WHEN round(len(list_filter(toks, x -> list_contains({stop}, x)))::DOUBLE
                 / greatest(len(toks), 1), 6) >= {threshold!r}
            THEN 'en' ELSE 'other' END AS pred_lang
FROM t ORDER BY {id_col}
"""


def pii_aug_expr(n_plant: int, id_col: str = "doc_id",
                 text_col: str = "text") -> str:
    """Deterministic PII planting shared with the engine entry: the first
    ``n_plant`` docs get an email, an IPv4 and a phone number appended
    (the natural corpus has none — without planting the driver gate would
    validate an all-zero frame)."""
    return (f"CASE WHEN {id_col} < {n_plant} THEN {text_col} || "
            f"' contact user' || CAST({id_col} AS VARCHAR) || "
            f"'@example.com node 10.20.30.40 call +1 415 555 ' || "
            f"CAST({id_col} + 1000 AS VARCHAR) ELSE {text_col} END")


def pii_scrub_sql(patterns, n_plant: int, table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    """Mirrors ``textstats.pii_scrub_stage``: the SAME RE2 pattern strings
    (DuckDB's regex engine is also RE2), applied in the SAME sequence,
    each count taken on the text as it stood before that replace."""
    aug = pii_aug_expr(n_plant, id_col, text_col)
    ctes = [f"s0 AS (SELECT {id_col}, {aug} AS t FROM {table})"]
    prev, seen = "s0", []
    for i, (name, pat, repl) in enumerate(patterns, 1):
        p = sql_quote(pat)
        carry = "".join(f"n_{n}, " for n in seen)
        ctes.append(
            f"s{i} AS (SELECT {id_col}, {carry}"
            f"len(regexp_extract_all(t, {p}))::BIGINT AS n_{name}, "
            f"regexp_replace(t, {p}, {sql_quote(repl)}, 'g') AS t "
            f"FROM {prev})")
        prev, seen = f"s{i}", seen + [name]
    sel = ", ".join(f"n_{n}" for n in seen)
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT {id_col}, {sel}, t AS clean_text FROM {prev} "
            f"ORDER BY {id_col}")


def pii_filter_sql(patterns, n_plant: int, max_pii: int = 0,
                   table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """Mirrors ``textstats.pii_filter``: survivors (total PII hits <=
    ``max_pii``) of the SAME planted augmentation under the SAME
    sequential counting rule as pii_scrub_sql; NULL text counts zero
    hits and survives (COALESCE mirrors the engine's fill_null)."""
    aug = pii_aug_expr(n_plant, id_col, text_col)
    ctes = [f"s0 AS (SELECT {id_col}, {aug} AS t FROM {table})"]
    prev, seen = "s0", []
    for i, (name, pat, repl) in enumerate(patterns, 1):
        p = sql_quote(pat)
        carry = "".join(f"n_{n}, " for n in seen)
        ctes.append(
            f"s{i} AS (SELECT {id_col}, {carry}"
            f"len(regexp_extract_all(t, {p}))::BIGINT AS n_{name}, "
            f"regexp_replace(t, {p}, {sql_quote(repl)}, 'g') AS t "
            f"FROM {prev})")
        prev, seen = f"s{i}", seen + [name]
    total = " + ".join(f"COALESCE(n_{n}, 0)" for n in seen)
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT {id_col} FROM {prev} "
            f"WHERE ({total}) <= {int(max_pii)} "
            f"ORDER BY {id_col}")


def decontaminate_sql(cfg: EngineConfig, modulus: int, residue: int,
                      shingle_k: int = 3, table: str = "documents",
                      id_col: str = "doc_id", text_col: str = "text") -> str:
    """Mirrors ``dedup.decontaminate``: benchmark docs are
    ``id % modulus == residue``; a doc is contaminated iff it shares any
    word ``shingle_k``-gram (same token stream as the minhash pipeline:
    lowered non-empty tokens, stopwords kept) with a benchmark doc.
    Counts are DISTINCT-shingle counts.  Engine matches on 64-bit stable
    hashes of the same shingle strings — engine == oracle verified on the
    fixed fixture at all three scales."""
    if shingle_k != 3:
        raise ValueError("the SQL shingle expression is written for k=3")
    pat = sql_quote(cfg.split_pattern)
    bench = f"({id_col} % {modulus} = {residue})"
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS tk
  FROM {table}
), s AS (
  SELECT {id_col},
         unnest(list_distinct(
           CASE WHEN len(tk) >= {shingle_k} THEN
             list_transform(range(1, len(tk) - {shingle_k - 2}),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
           ELSE [] END)) AS sh
  FROM t
), b AS (
  SELECT DISTINCT sh FROM s WHERE {bench.replace(id_col, 's.' + id_col)}
), g AS (
  SELECT s.{id_col},
         count(*)::BIGINT AS n_shingles,
         count(b.sh)::BIGINT AS n_hits
  FROM s LEFT JOIN b ON b.sh = s.sh
  GROUP BY s.{id_col}
)
SELECT d.{id_col},
       coalesce(g.n_shingles, 0)::BIGINT AS n_shingles,
       coalesce(g.n_hits, 0)::BIGINT AS n_hits,
       CASE WHEN {bench.replace(id_col, 'd.' + id_col)} THEN 1 ELSE 0 END::BIGINT AS is_benchmark,
       CASE WHEN coalesce(g.n_hits, 0) > 0
                 AND NOT {bench.replace(id_col, 'd.' + id_col)}
            THEN 1 ELSE 0 END::BIGINT AS contaminated
FROM {table} d LEFT JOIN g ON g.{id_col} = d.{id_col}
ORDER BY d.{id_col}
"""


def self_overlap_sql(cfg: EngineConfig, shingle_k: int = 3,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Mirrors ``dedup.self_overlap``: per-doc DISTINCT word shingles, a
    shingle is 'shared' iff >= 2 docs contain it; docs shorter than
    shingle_k carry no windows and are absent on both sides.  Engine
    matches on 64-bit hashes of the same shingle strings (equality up
    to hash collisions — the decontaminate rule)."""
    if shingle_k != 3:
        raise ValueError("the SQL shingle expression is written for k=3")
    pat = sql_quote(cfg.split_pattern)
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS tk
  FROM {table}
), s AS (
  SELECT {id_col},
         unnest(list_distinct(
           CASE WHEN len(tk) >= {shingle_k} THEN
             list_transform(range(1, len(tk) - {shingle_k - 2}),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
           ELSE [] END)) AS sh
  FROM t
), g AS (
  SELECT sh, count(*)::BIGINT AS m FROM s GROUP BY sh
)
SELECT s.{id_col},
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN g.m >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_hits,
       (CASE WHEN sum(CASE WHEN g.m >= 2 THEN 1 ELSE 0 END) > 0
             THEN 1 ELSE 0 END)::BIGINT AS has_overlap
FROM s JOIN g USING (sh)
GROUP BY s.{id_col} ORDER BY s.{id_col}
"""


def grouped_best_sql(query_text: str, cfg: EngineConfig,
                     group_col: str = "source", table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text") -> str:
    """Best-scoring doc per group for ONE query (the nested/parent
    diversification analog J3/D4: one hit per parent).  The per-group
    winner is chosen on the UNROUNDED score with the (score desc, id asc)
    tie-break — same as the engine."""
    inner = bm25_sql({"q": query_text}, 10 ** 9, cfg, table=table,
                     id_col=id_col, text_col=text_col)
    return f"""
WITH hits AS ({inner}),
best AS (
  SELECT d.{group_col}, h.{id_col}, h.score,
         row_number() OVER (PARTITION BY d.{group_col} ORDER BY h.rank) AS rn
  FROM hits h JOIN {table} d USING ({id_col})
)
SELECT {group_col}, {id_col}, score FROM best WHERE rn = 1
ORDER BY {group_col}
"""


def _knn_score_expr(metric: str, vec_col: str) -> str:
    """Rounded (6dp) Lucene-ordered score expression — RANKING happens on
    this rounded value on BOTH sides (the engine rounds before top-k
    selection too: one tie rule, no sub-5e-7 rank drift)."""
    if metric == "cosine":
        return (f"round((1.0 + list_cosine_similarity("
                f"CAST(e.{vec_col} AS DOUBLE[]), CAST(q.{vec_col} AS DOUBLE[]))) / 2.0, 6)")
    if metric == "l2":
        return (f"round(1.0 / (1.0 + power(list_distance("
                f"CAST(e.{vec_col} AS DOUBLE[]), CAST(q.{vec_col} AS DOUBLE[])), 2)), 6)")
    if metric == "hamming":
        return (f"round(1.0 / (1.0 + len(list_filter(list_zip("
                f"CAST(e.{vec_col} AS DOUBLE[]), CAST(q.{vec_col} AS DOUBLE[])), "
                f"z -> (z[1] > 0) <> (z[2] > 0)))), 6)")
    if metric == "innerproduct":
        ip = (f"list_dot_product(CAST(e.{vec_col} AS DOUBLE[]), "
              f"CAST(q.{vec_col} AS DOUBLE[]))")
        # SpaceType.INNER_PRODUCT translation: ip>=0 -> ip+1, else 1/(1-ip)
        return (f"round(CASE WHEN {ip} >= 0 THEN {ip} + 1.0 "
                f"ELSE 1.0 / (1.0 - {ip}) END, 6)")
    if metric in ("l1", "linf"):
        agg = "sum" if metric == "l1" else "max"
        d = (f"list_aggregate(list_transform(list_zip("
             f"CAST(e.{vec_col} AS DOUBLE[]), CAST(q.{vec_col} AS DOUBLE[])), "
             f"z -> abs(z[1] - z[2])), '{agg}')")
        return f"round(1.0 / (1.0 + {d}), 6)"
    raise ValueError(metric)


def grouped_expand_sql(query_text: str, n_groups: int, cfg: EngineConfig,
                       group_col: str = "source", table: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text") -> str:
    """Expand-nested oracle (ExpandNestedDocsQuery analog): the top
    ``n_groups`` groups by their best hit, then ALL matching docs of those
    groups, ranked within each group.  Winner ties are impossible (global
    ranks are unique); within-group order is the global (score desc, id
    asc) order."""
    inner = bm25_sql({"q": query_text}, 10 ** 9, cfg, table=table,
                     id_col=id_col, text_col=text_col)
    return f"""
WITH hits AS ({inner}),
joined AS (
  SELECT d.{group_col}, h.{id_col}, h.score, h.rank
  FROM hits h JOIN {table} d USING ({id_col})
),
winners AS (
  SELECT {group_col} FROM (
    SELECT {group_col},
           row_number() OVER (ORDER BY min(rank), {group_col}) AS grp_rn
    FROM joined GROUP BY {group_col}
  ) WHERE grp_rn <= {n_groups}
)
SELECT j.{group_col}, j.{id_col}, j.score,
       row_number() OVER (PARTITION BY j.{group_col}
                          ORDER BY j.rank) AS group_rank
FROM joined j JOIN winners USING ({group_col})
ORDER BY j.{group_col}, group_rank
"""


def knn_sql(metric: str, query_vec_ids: list[int], k: int,
            table: str = "embeddings", id_col: str = "vec_id",
            vec_col: str = "embedding", filter_sql: str | None = None,
            min_score: float | None = None) -> str:
    """Exact top-k (or radial / pre-filtered) vector search oracle; DOUBLE[]
    casts force float64 math to match the numpy kernels.  ``filter_sql``
    restricts candidates (alias ``e``) — the engine's pre-filter; with
    ``min_score`` the rank cap is replaced by a score threshold (radial)."""
    score = _knn_score_expr(metric, vec_col)
    qids = ", ".join(str(int(v)) for v in query_vec_ids)
    flt = f"WHERE ({filter_sql})" if filter_sql else ""
    limit_clause = f"WHERE rank <= {k}" if min_score is None else \
        f"WHERE score >= {min_score!r}"
    return f"""
WITH q AS (SELECT {id_col} AS qvid, {vec_col} FROM {table}
           WHERE {id_col} IN ({qids})),
scored AS (
  SELECT 'vq' || q.qvid AS query_id, e.{id_col}, {score} AS score
  FROM {table} e CROSS JOIN q
  {flt}
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, {id_col} ASC) AS rank,
         {id_col}, score
  FROM scored
)
SELECT query_id, rank, {id_col}, score FROM ranked
{limit_clause} ORDER BY query_id, rank
"""


def hybrid_rrf_sql(queries: dict[str, tuple[str, int]], k: int,
                   window: int, k0: float, cfg: EngineConfig,
                   metric: str = "cosine", table: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text",
                   vec_table: str = "embeddings",
                   vec_id_col: str = "vec_id") -> str:
    """Oracle for pipelines.hybrid.hybrid_search: RRF over the shared
    BM25 CTE and the shared kNN CTE (both already rank-identical to the
    engine); fused score = COALESCE(1/(k0+b.rank),0) +
    COALESCE(1/(k0+v.rank),0) — the engine's pinned two-addend order.
    Assumes vec_id == doc_id (one embedding per document)."""
    b_inner = bm25_sql({qid: t for qid, (t, _) in queries.items()},
                       window, cfg, table=table, id_col=id_col,
                       text_col=text_col)
    v_inner = knn_sql(metric, [vid for _, (_, vid) in queries.items()],
                      window, table=vec_table, id_col=vec_id_col)
    m_rows = ",\n       ".join(
        f"({sql_quote(qid)}, {sql_quote('vq' + str(int(vid)))})"
        for qid, (_, vid) in sorted(queries.items()))
    return f"""
WITH b AS ({b_inner}),
v0 AS ({v_inner}),
m(query_id, vqid) AS (VALUES {m_rows}),
v AS (
  SELECT m.query_id, v0.{vec_id_col} AS {id_col}, v0.rank
  FROM v0 JOIN m ON v0.query_id = m.vqid
),
fused AS (
  SELECT COALESCE(b.query_id, v.query_id) AS query_id,
         COALESCE(b.{id_col}, v.{id_col}) AS {id_col},
         COALESCE(1.0 / ({float(k0)!r} + b.rank), 0.0)
         + COALESCE(1.0 / ({float(k0)!r} + v.rank), 0.0) AS score__raw
  FROM b FULL OUTER JOIN v
    ON b.query_id = v.query_id AND b.{id_col} = v.{id_col}
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM fused
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} ORDER BY query_id, rank
"""


def hybrid_linear_sql(queries: dict[str, tuple[str, int]], k: int,
                      window: int, weights: tuple[float, float],
                      cfg: EngineConfig, metric: str = "cosine",
                      table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text",
                      vec_table: str = "embeddings",
                      vec_id_col: str = "vec_id") -> str:
    """Oracle for pipelines.hybrid.hybrid_linear_search: min-max
    normalization per (query, retriever) over the ROUND-6 retriever
    scores (both CTEs emit the engine-identical rounded doubles), then
    the weighted two-addend sum in the engine's pinned order.
    max == min -> 1.0; missing doc -> 0.0."""
    b_inner = bm25_sql({qid: t for qid, (t, _) in queries.items()},
                       window, cfg, table=table, id_col=id_col,
                       text_col=text_col)
    v_inner = knn_sql(metric, [vid for _, (_, vid) in queries.items()],
                      window, table=vec_table, id_col=vec_id_col)
    m_rows = ",\n       ".join(
        f"({sql_quote(qid)}, {sql_quote('vq' + str(int(vid)))})"
        for qid, (_, vid) in sorted(queries.items()))
    wb, wv = float(weights[0]), float(weights[1])
    return f"""
WITH b0 AS ({b_inner}),
v0 AS ({v_inner}),
m(query_id, vqid) AS (VALUES {m_rows}),
bn AS (
  SELECT query_id, {id_col},
         CASE WHEN mx > mn THEN (score - mn) / (mx - mn)
              ELSE 1.0 END AS n
  FROM (SELECT query_id, {id_col}, score,
               min(score) OVER (PARTITION BY query_id) AS mn,
               max(score) OVER (PARTITION BY query_id) AS mx
        FROM b0)
),
v1 AS (
  SELECT m.query_id, v0.{vec_id_col} AS {id_col},
         round(v0.score, 6) AS score
  FROM v0 JOIN m ON v0.query_id = m.vqid
),
vn AS (
  SELECT query_id, {id_col},
         CASE WHEN mx > mn THEN (score - mn) / (mx - mn)
              ELSE 1.0 END AS n
  FROM (SELECT query_id, {id_col}, score,
               min(score) OVER (PARTITION BY query_id) AS mn,
               max(score) OVER (PARTITION BY query_id) AS mx
        FROM v1)
),
fused AS (
  SELECT COALESCE(bn.query_id, vn.query_id) AS query_id,
         COALESCE(bn.{id_col}, vn.{id_col}) AS {id_col},
         COALESCE({wb!r} * bn.n, 0.0)
         + COALESCE({wv!r} * vn.n, 0.0) AS score__raw
  FROM bn FULL OUTER JOIN vn
    ON bn.query_id = vn.query_id AND bn.{id_col} = vn.{id_col}
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM fused
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)} ORDER BY query_id, rank
"""


def corpus_clean_sql(cfg: EngineConfig, min_tokens: int,
                     stop_threshold: float, table: str = "documents",
                     id_col: str = "doc_id", text_col: str = "text") -> str:
    """Composite cleaning-chain oracle (quality -> language ->
    exact-dedup canonical): same split pattern, stop list, 6dp ratio
    rounding and min-id tie rule as pipelines/corpus.clean_corpus."""
    pat = sql_quote(cfg.split_pattern)
    stop = stoplist_sql(cfg)
    return f"""
WITH t AS (
  SELECT {id_col}, {text_col},
         list_filter(regexp_split_to_array(lower({text_col}), {pat}),
                     x -> x <> '') AS toks
  FROM {table}
), f AS (
  SELECT {id_col}, {text_col},
         len(toks)::BIGINT AS total,
         round(len(list_filter(toks, x -> list_contains({stop}, x)))::DOUBLE
               / greatest(len(toks), 1), 6) AS stop_ratio
  FROM t
), k AS (
  SELECT * FROM f
  WHERE total >= {min_tokens} AND stop_ratio >= {stop_threshold!r}
)
SELECT min({id_col})::BIGINT AS {id_col},
       min(total)::BIGINT AS n_tokens
FROM k GROUP BY md5({norm_text_expr(cfg, text_col)})
ORDER BY {id_col}
"""


def byte_knn_sql(metric: str, query_vec_ids: list[int], k: int,
                 scale: int = 64, table: str = "embeddings",
                 id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """byte (int8) vector oracle: both sides quantize the float fixture
    with floor(x * scale) clamped to [-128, 127] — floor has identical
    semantics in numpy and DuckDB (unlike round's half-even vs
    half-away), and the integral results are exact in float64, so the
    byte path's scores hash-match the SQL bit for bit."""
    score = _knn_score_expr(metric, vec_col)
    qids = ", ".join(str(int(v)) for v in query_vec_ids)
    quant = (f"list_transform(CAST({vec_col} AS DOUBLE[]), "
             f"x -> greatest(-128.0, least(127.0, floor(x * {scale}))))")
    return f"""
WITH be AS (
  SELECT {id_col}, {quant} AS {vec_col} FROM {table}
),
q AS (SELECT {id_col} AS qvid, {vec_col} FROM be
      WHERE {id_col} IN ({qids})),
scored AS (
  SELECT 'vq' || q.qvid AS query_id, e.{id_col}, {score} AS score
  FROM be e CROSS JOIN q
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, {id_col} ASC) AS rank,
         {id_col}, score
  FROM scored
)
SELECT query_id, rank, {id_col}, score FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def embedding_dups_sql(threshold: float, n_planted: int,
                       id_offset: int, table: str = "embeddings",
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> str:
    """Embedding near-dup oracle over the entry's augmented table (base
    rows UNION exact duplicates of the ``n_planted`` lowest ids shifted by
    ``id_offset``): ALL pairs with raw cosine >= threshold, cosine
    reported rounded 6dp (the engine's verify rule).  Exactness holds
    because identical vectors match every LSH band with probability 1 and
    the fixture's natural max pairwise cosine (~0.60) is far below the
    threshold — candidate recall is not part of the contract."""
    return f"""
WITH aug AS (
  SELECT {id_col}, {vec_col} FROM {table}
  UNION ALL
  SELECT {id_col} + {id_offset}, {vec_col} FROM {table}
  WHERE {id_col} < {n_planted}
),
pairs AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
         list_cosine_similarity(CAST(a.{vec_col} AS DOUBLE[]),
                                CAST(b.{vec_col} AS DOUBLE[])) AS rawcos
  FROM aug a JOIN aug b ON a.{id_col} < b.{id_col}
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       round(rawcos, 6) AS cosine
FROM pairs WHERE rawcos >= {threshold!r}
ORDER BY id_a, id_b
"""


def ivf_fixed_sql(metric: str, query_vec_ids: list[int], k: int,
                  centroid_ids: list[int], n_probe: int,
                  table: str = "embeddings", id_col: str = "vec_id",
                  vec_col: str = "embedding") -> str:
    """IVF oracle with FIXED data-row coarse centers (pipelines.knn.
    fixed_centroids): cell = argmin squared-L2 to the centers (ties ->
    lower cell), probe = n_probe nearest cells per query (same tie rule),
    exact metric ranking within the probed cells.  Deterministic and fully
    SQL-expressible — the hard driver gate for the IVF machinery."""
    score = _knn_score_expr(metric, vec_col)
    qids = ", ".join(str(int(v)) for v in query_vec_ids)
    cids = ", ".join(str(int(v)) for v in sorted(centroid_ids))
    return f"""
WITH centi AS (
  SELECT row_number() OVER (ORDER BY {id_col}) - 1 AS cell,
         CAST({vec_col} AS DOUBLE[]) AS cvec
  FROM {table} WHERE {id_col} IN ({cids})
),
assign AS (
  SELECT {id_col}, cell FROM (
    SELECT e.{id_col}, c.cell,
           row_number() OVER (PARTITION BY e.{id_col}
                              ORDER BY power(list_distance(
                                CAST(e.{vec_col} AS DOUBLE[]), c.cvec), 2) ASC,
                              c.cell ASC) AS rn
    FROM {table} e CROSS JOIN centi c
  ) WHERE rn = 1
),
q AS (SELECT {id_col} AS qvid, {vec_col} FROM {table}
      WHERE {id_col} IN ({qids})),
qprobe AS (
  SELECT qvid, cell FROM (
    SELECT q.qvid, c.cell,
           row_number() OVER (PARTITION BY q.qvid
                              ORDER BY power(list_distance(
                                CAST(q.{vec_col} AS DOUBLE[]), c.cvec), 2) ASC,
                              c.cell ASC) AS rn
    FROM q CROSS JOIN centi c
  ) WHERE rn <= {n_probe}
),
scored AS (
  SELECT 'vq' || q.qvid AS query_id, e.{id_col}, {score} AS score
  FROM q
  JOIN qprobe ON qprobe.qvid = q.qvid
  JOIN assign ON assign.cell = qprobe.cell
  JOIN {table} e ON e.{id_col} = assign.{id_col}
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, {id_col} ASC) AS rank,
         {id_col}, score
  FROM scored
)
SELECT query_id, rank, {id_col}, score FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def semdedup_sql(centroid_ids: list[int], threshold: float,
                 n_planted: int, plant_offset: int,
                 table: str = "embeddings", id_col: str = "vec_id",
                 vec_col: str = "embedding") -> str:
    """Oracle for pipelines.knn.semdedup over the planted-duplicate
    fixture: fixed-row coarse assignment (the ivf_fixed tie rule:
    dist asc, cell asc) + the min-id keep rule — a vector is dropped iff
    a smaller-id same-cell vector is cosine >= threshold.  Robust to
    cross-side cosine ulp because planted duplicates are IDENTICAL
    vectors (cos = 1) and the fixture's natural max pair is far below
    the threshold (the embedding_near_dups invariant)."""
    cids = ", ".join(str(int(v)) for v in sorted(centroid_ids))
    return f"""
WITH base AS (
  SELECT {id_col}, {vec_col} FROM {table}
  UNION ALL
  SELECT {id_col} + {int(plant_offset)} AS {id_col}, {vec_col}
  FROM {table} WHERE {id_col} < {int(n_planted)}
),
centi AS (
  SELECT row_number() OVER (ORDER BY {id_col}) - 1 AS cell,
         CAST({vec_col} AS DOUBLE[]) AS cvec
  FROM base WHERE {id_col} IN ({cids})
),
assign AS (
  SELECT {id_col}, cell FROM (
    SELECT e.{id_col}, c.cell,
           row_number() OVER (PARTITION BY e.{id_col}
                              ORDER BY power(list_distance(
                                CAST(e.{vec_col} AS DOUBLE[]), c.cvec), 2) ASC,
                              c.cell ASC) AS rn
    FROM base e CROSS JOIN centi c
  ) WHERE rn = 1
)
SELECT b.{id_col}, a.cell,
       CAST(NOT EXISTS (
         SELECT 1 FROM base b2 JOIN assign a2 ON a2.{id_col} = b2.{id_col}
         WHERE a2.cell = a.cell AND b2.{id_col} < b.{id_col}
           AND list_cosine_similarity(CAST(b2.{vec_col} AS DOUBLE[]),
                                      CAST(b.{vec_col} AS DOUBLE[]))
               >= {float(threshold)!r}
       ) AS BIGINT) AS keep
FROM base b JOIN assign a ON a.{id_col} = b.{id_col}
ORDER BY b.{id_col}
"""


def simhash_sql(cfg: EngineConfig, max_hamming: int = 3,
                table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    """EXACT all-pairs simhash oracle (O(n^2) is fine at oracle scale; the
    engine's 4x16-bit chunk blocking is exact for max_hamming<=3, so the
    distributed result must equal this).  Token bits come from md5 — the
    one hash family both numpy and DuckDB reproduce bit-for-bit."""
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
tf AS (
  SELECT {id_col}, term, count(*)::BIGINT AS tf FROM toks
  GROUP BY {id_col}, term
),
th AS (
  SELECT DISTINCT term,
         ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h
  FROM toks
),
votes AS (
  SELECT tf.{id_col}, i.i,
         sum(tf.tf * (CASE WHEN (th.h >> i.i) & 1 = 1 THEN 1 ELSE -1 END)) AS v
  FROM tf JOIN th USING (term) CROSS JOIN (SELECT unnest(range(64)) AS i) i
  GROUP BY tf.{id_col}, i.i
),
sim0 AS (
  SELECT {id_col},
         CAST(sum(CASE WHEN v > 0 THEN (1::UBIGINT << i) ELSE 0::UBIGINT END)
              AS UBIGINT) AS sh
  FROM votes GROUP BY {id_col}
),
sim AS (
  SELECT d.{id_col}, coalesce(s.sh, 0::UBIGINT) AS sh
  FROM {table} d LEFT JOIN sim0 s USING ({id_col})
)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       bit_count(xor(a.sh, b.sh))::INT AS hamming
FROM sim a JOIN sim b ON a.{id_col} < b.{id_col}
WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
ORDER BY id_a, id_b
"""


def transcripts_bm25_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                         arms: list[tuple[str, int]]) -> str:
    """Flagship transcript-corpus BM25 oracle.

    The driver registers only the star-schema views, and the synthetic
    transcript corpus is scale-dependent — so the oracle reads the
    (deterministic, cached) transcript parquet directly, choosing the arm
    whose scale matches via the lineitem view's row count (unique per sf).
    ``arms`` = [(transcript_parquet_dir, lineitem_rowcount), ...]; every
    listed dir must exist (read_parquet binds eagerly).  Keys are the
    zero-padded composite (conv_id:turn_idx) string, whose lexicographic
    order equals the engine's (conv_id, turn_idx) tie order.
    """
    prefix = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, text")
    return bm25_sql(queries, k, cfg, table="transcripts", id_col="doc_id",
                    prefix_cte=prefix)


def transcripts_fscore_sql(queries: dict[str, str], k: int,
                           cfg: EngineConfig,
                           arms: list[tuple[str, int]],
                           score_fn: dict) -> str:
    """function_score oracle over the transcript corpus: the shared BM25
    CTE with the multiplier expression generated from the ENGINE's
    score_fn spec (ts fields go through epoch_us — the same int64-us
    view the engine's _doc_boost takes)."""
    prefix = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, text, ts")
    mul = function_score_mul_sql(score_fn, is_ts=True)
    return bm25_sql(queries, k, cfg, table="transcripts", id_col="doc_id",
                    prefix_cte=prefix, score_mul_sql=mul)


def has_child_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                  arms: list[tuple[str, int]],
                  score_mode: str = "max") -> str:
    """Oracle for IndexSearcher.has_child_search over the transcript
    corpus: conversations ranked by an aggregate of their matching
    turns' BM25 scores.  Cross-side fp rule (mirrors the engine's
    combiner-first partials): sum/avg quantize each child's raw score
    to floor(score * 1e6) BIGINT before summation — integer sums are
    order-free, so neither side needs an ordered aggregate and the
    engine's per-segment grouping is invisible — and emit the exact
    double sum_micro / 1e6 (avg: / (count * 1e6)) UNROUNDED (round-6
    of the avg ratio lands on decimal half-ties whenever count divides
    sum_micro).  max/count stay ROUND-6 (parents span segments)."""
    assert score_mode in ("max", "sum", "avg", "count")
    prefix = transcripts_arms_cte(
        arms, "conv_id, conv_id || ':' || "
              "lpad(CAST(turn_idx AS VARCHAR), 10, '0') AS doc_id, text")
    inner = bm25_sql(queries, 0, cfg, table="transcripts",
                     id_col="doc_id", prefix_cte=prefix,
                     min_score=1e-300, emit_raw=True)
    micro = "sum(CAST(floor(h.score__raw * 1e6) AS BIGINT))"
    expr = {
        "max": "round(max(h.score__raw), 6)",
        "sum": f"{micro} / 1000000.0",
        "avg": f"{micro} / (count(*) * 1000000.0)",
        "count": "round(count(*)::DOUBLE, 6)",
    }[score_mode]
    return f"""
WITH hits AS ({inner}),
agg AS (
  SELECT h.query_id, t.conv_id, {expr} AS score
  FROM hits h JOIN (SELECT DISTINCT conv_id, doc_id
                    FROM ({_transcripts_conv_map(arms)})) t
    USING (doc_id)
  GROUP BY h.query_id, t.conv_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, conv_id ASC) AS rank,
         conv_id, score
  FROM agg
)
SELECT query_id, rank, conv_id, score
FROM ranked WHERE rank <= {int(k)}
ORDER BY query_id, rank
"""


def _transcripts_conv_map(arms: list[tuple[str, int]]) -> str:
    sel = "\n  UNION ALL\n".join(
        f"  SELECT conv_id, conv_id || ':' || "
        f"lpad(CAST(turn_idx AS VARCHAR), 10, '0') AS doc_id\n"
        f"  FROM read_parquet('{path}/*.parquet')\n"
        f"  WHERE (SELECT count(*) FROM lineitem) = {int(n)}"
        for path, n in arms)
    return sel


def transcripts_arms_cte(arms: list[tuple[str, int]],
                         select_exprs: str) -> str:
    """Multi-scale transcript CTE: one read_parquet arm per known test
    scale, selected at SQL runtime by the lineitem view's row count
    (unique per sf).  Every listed dir must exist (read_parquet binds
    eagerly)."""
    sel = "\n  UNION ALL\n".join(
        f"  SELECT {select_exprs}\n"
        f"  FROM read_parquet('{path}/*.parquet')\n"
        f"  WHERE (SELECT count(*) FROM lineitem) = {int(n)}"
        for path, n in arms)
    return f"transcripts AS (\n{sel}\n)"


def conversation_sql(arms: list[tuple[str, int]]) -> str:
    """Oracle for assemble_conversations: ordered string_agg is DuckDB's
    sequential left-to-right concat — identical to the engine's
    lexsort + binary_join per conversation."""
    cte = transcripts_arms_cte(arms, "conv_id, turn_idx, role, text")
    return f"""
WITH {cte}
SELECT conv_id, count(*)::BIGINT AS n_turns,
       string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
         AS conv_text
FROM transcripts GROUP BY conv_id ORDER BY conv_id
"""


def context_pairs_sql(arms: list[tuple[str, int]],
                      max_context_turns: int) -> str:
    """Oracle for transcripts.context_response_pairs: the context window
    is POSITIONAL (row_number order within the conversation), expressed
    as a windowed string_agg with a ROWS BETWEEN K PRECEDING AND 1
    PRECEDING frame — DuckDB aggregates the frame in ascending frame
    order, the engine's turn order."""
    K = int(max_context_turns)
    cte = transcripts_arms_cte(arms, "conv_id, turn_idx, role, text")
    return f"""
WITH {cte},
ordered AS (
  SELECT conv_id, turn_idx, role, text,
         string_agg(role || ': ' || text, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN {K} PRECEDING AND 1 PRECEDING) AS context,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY turn_idx) AS rn
  FROM transcripts
)
SELECT conv_id, turn_idx::BIGINT AS turn_idx, context,
       text AS response
FROM ordered
WHERE role = 'assistant' AND rn > 1
ORDER BY conv_id, turn_idx
"""


def response_novelty_sql(arms: list[tuple[str, int]], cfg: EngineConfig,
                         max_context_turns: int) -> str:
    """Oracle for transcripts.response_novelty: per assistant turn past
    the conversation start, distinct analyzed response tokens absent
    from the preceding-K-turns token sets.  The per-turn token list is
    the toks_cte rule as a LIST expression (lower -> split -> drop
    empty/stopwords -> optional stem -> distinct); the context union is
    a windowed list() with the context_pairs_sql ROWS frame; novelty =
    ONE division of the two exact integer counts."""
    from opensearch_jvector_ray.analyze import STEM_PATTERN
    K = int(max_context_turns)
    pat = sql_quote(cfg.split_pattern)
    stop = stoplist_sql(cfg)
    toks_expr = (f"list_filter(regexp_split_to_array(lower(text), {pat}),"
                 f" x -> x <> '' AND NOT list_contains({stop}, x))")
    if cfg.stemmer == "minimal_english":
        toks_expr = (f"list_transform({toks_expr}, x -> regexp_replace("
                     f"x, {sql_quote(STEM_PATTERN)}, '\\1'))")
    toks_expr = f"list_distinct({toks_expr})"
    cte = transcripts_arms_cte(arms, "conv_id, turn_idx, role, text")
    return f"""
WITH {cte},
tt AS (
  SELECT conv_id, turn_idx, role, {toks_expr} AS toks
  FROM transcripts
),
win AS (
  SELECT conv_id, turn_idx, role, toks,
         flatten(list(toks) OVER (PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN {K} PRECEDING AND 1 PRECEDING)) AS ctx_toks,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY turn_idx) AS rn
  FROM tt
)
SELECT conv_id, turn_idx::BIGINT AS turn_idx,
       len(toks)::BIGINT AS resp_distinct,
       len(list_filter(toks, t -> NOT list_contains(ctx_toks, t)))::BIGINT
         AS novel_distinct,
       len(list_filter(toks, t -> NOT list_contains(ctx_toks, t)))::DOUBLE
         / len(toks)::DOUBLE AS novelty
FROM win
WHERE role = 'assistant' AND rn > 1 AND len(toks) > 0
ORDER BY conv_id, turn_idx
"""


def validate_conversations_sql(arms: list[tuple[str, int]]) -> str:
    """Oracle for transcripts.validate_conversations: lag window +
    bool_or (NULL prev_role on a conversation's first row is ignored by
    bool_or, matching the engine's ~new mask)."""
    cte = transcripts_arms_cte(arms, "conv_id, turn_idx, role")
    return f"""
WITH {cte},
ordered AS (
  SELECT conv_id, role,
         row_number() OVER w AS rn,
         lag(role) OVER w AS prev_role
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       bool_or(rn = 1 AND role = 'user') AS starts_user,
       bool_or(role = 'assistant') AS has_assistant,
       NOT coalesce(bool_or(role = prev_role), false) AS no_role_repeat,
       (bool_or(rn = 1 AND role = 'user')
        AND bool_or(role = 'assistant')
        AND NOT coalesce(bool_or(role = prev_role), false)) AS valid
FROM ordered GROUP BY conv_id ORDER BY conv_id
"""


def turn_dedup_sql(arms: list[tuple[str, int]], cfg: EngineConfig,
                   plant_every: int | None = None) -> str:
    """Oracle for plant_duplicate_turns >> turn_dedup: same planting rule
    ('dupe-' || zero-padded id of turn 1 of every plant_every-th
    conversation; 'conv-' < 'dupe-' keeps originals canonical), same
    normalized-text md5, same min-doc-key keep rule.  The stride
    defaults from the ENGINE's shared constant."""
    if plant_every is None:
        from opensearch_jvector_ray.synth import PLANT_EVERY
        plant_every = PLANT_EVERY
    cte = transcripts_arms_cte(arms, "conv_id, turn_idx, text")
    return f"""
WITH {cte},
aug AS (
  SELECT conv_id, turn_idx, text FROM transcripts
  UNION ALL
  SELECT 'dupe-' || substr(conv_id, 6) AS conv_id, turn_idx, text
  FROM transcripts
  WHERE CAST(substr(conv_id, 6) AS BIGINT) % {plant_every} = 0
    AND turn_idx = 1
),
h AS (
  SELECT conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')
           AS doc_id,
         md5({norm_text_expr(cfg)}) AS text_hash
  FROM aug
)
SELECT doc_id, text_hash,
       CAST(doc_id = min(doc_id) OVER (PARTITION BY text_hash) AS BIGINT)
         AS keep
FROM h ORDER BY doc_id
"""


def tool_usage_sql(arms: list[tuple[str, int]]) -> str:
    """Oracle for tool_usage_stats: straight grouped aggregates; the
    mean is one integer division (bit-exact vs the engine)."""
    cte = transcripts_arms_cte(arms, "conv_id, turn_idx, tool, ts")
    return f"""
WITH {cte}
SELECT tool,
       count(*)::BIGINT AS n_calls,
       count(DISTINCT conv_id)::BIGINT AS n_convs,
       CAST(sum(turn_idx) AS DOUBLE) / count(*) AS mean_turn_idx,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM transcripts WHERE tool <> ''
GROUP BY tool ORDER BY tool
"""


def lm_xent_transfer_sql(cfg: EngineConfig,
                         arms: list[tuple[str, int]],
                         train_table: str = "documents",
                         train_id: str = "doc_id",
                         train_text: str = "text") -> str:
    """Oracle for the LM train-on-A-score-B path: unigram LM trained on
    ``train_table``, scoring the transcript corpus — unseen terms take
    q_oov = floor(ln(1/(T+V))*1e6) via a LEFT JOIN fallback.  Same
    integer-micro exactness as lm_xent_sql."""
    from opensearch_jvector_ray.pipelines.lm import MICRO
    pat = sql_quote(cfg.split_pattern)
    cte = transcripts_arms_cte(arms, "conv_id, turn_idx, text")
    return f"""
WITH {cte},
tu AS (
  SELECT term FROM (
    SELECT unnest(regexp_split_to_array(lower({train_text}), {pat})) AS term
    FROM {train_table}
  ) WHERE term <> ''
),
voc AS (SELECT term, count(*)::BIGINT AS cw FROM tu GROUP BY term),
tot AS (SELECT CAST(sum(cw) AS DOUBLE) + CAST(count(*) AS DOUBLE) AS denom
        FROM voc),
q AS (SELECT term,
             CAST(floor(ln((cw + 1.0) / denom) * {MICRO!r}) AS BIGINT) AS qm
      FROM voc, tot),
docs AS (
  SELECT conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')
           AS doc_id, text
  FROM transcripts
),
su AS (
  SELECT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), {pat})) AS term
    FROM docs
  ) WHERE term <> ''
),
cnt AS (SELECT doc_id, term, count(*)::BIGINT AS c
        FROM su GROUP BY doc_id, term),
s AS (SELECT cnt.doc_id,
             sum(cnt.c * coalesce(q.qm,
                 CAST(floor(ln(1.0 / tot.denom) * {MICRO!r}) AS BIGINT))
                )::BIGINT AS micro,
             sum(cnt.c)::BIGINT AS n
      FROM cnt LEFT JOIN q ON q.term = cnt.term CROSS JOIN tot
      GROUP BY cnt.doc_id)
SELECT d.doc_id,
       coalesce(s.n, 0)::BIGINT AS n_tokens_all,
       coalesce(-(CAST(s.micro AS DOUBLE)) / (s.n * {MICRO!r}),
                0.0) AS xent
FROM docs d LEFT JOIN s ON s.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def dsir_weights_sql(cfg: EngineConfig,
                     arms: list[tuple[str, int]],
                     target_table: str = "documents",
                     target_text: str = "text") -> str:
    """Oracle for lm.dsir_weights (source = the transcript corpus,
    target = ``target_table``): per source doc,
    sum(c * (q_t - q_s)) / MICRO with q_X = floor(ln((c_X+1)/denom_X)
    * 1e6) and per-side OOV fallbacks — the lm_xent_transfer integer-
    micro machinery applied to the DIFFERENCE of two LMs."""
    from opensearch_jvector_ray.pipelines.lm import MICRO
    pat = sql_quote(cfg.split_pattern)
    cte = transcripts_arms_cte(arms, "conv_id, turn_idx, text")
    return f"""
WITH {cte},
tu AS (
  SELECT term FROM (
    SELECT unnest(regexp_split_to_array(lower({target_text}), {pat}))
      AS term
    FROM {target_table}
  ) WHERE term <> ''
),
voc_t AS (SELECT term, count(*)::BIGINT AS cw FROM tu GROUP BY term),
tot_t AS (SELECT CAST(sum(cw) AS DOUBLE) + CAST(count(*) AS DOUBLE)
            AS denom FROM voc_t),
q_t AS (SELECT term,
             CAST(floor(ln((cw + 1.0) / denom) * {MICRO!r}) AS BIGINT)
               AS qm
        FROM voc_t, tot_t),
docs AS (
  SELECT conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')
           AS doc_id, text
  FROM transcripts
),
su AS (
  SELECT doc_id, term FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), {pat})) AS term
    FROM docs
  ) WHERE term <> ''
),
voc_s AS (SELECT term, count(*)::BIGINT AS cw FROM su GROUP BY term),
tot_s AS (SELECT CAST(sum(cw) AS DOUBLE) + CAST(count(*) AS DOUBLE)
            AS denom FROM voc_s),
q_s AS (SELECT term,
             CAST(floor(ln((cw + 1.0) / denom) * {MICRO!r}) AS BIGINT)
               AS qm
        FROM voc_s, tot_s),
cnt AS (SELECT doc_id, term, count(*)::BIGINT AS c
        FROM su GROUP BY doc_id, term),
s AS (SELECT cnt.doc_id,
             sum(cnt.c * (
               coalesce(q_t.qm,
                 CAST(floor(ln(1.0 / tot_t.denom) * {MICRO!r}) AS BIGINT))
               - coalesce(q_s.qm,
                 CAST(floor(ln(1.0 / tot_s.denom) * {MICRO!r}) AS BIGINT))
             ))::BIGINT AS micro,
             sum(cnt.c)::BIGINT AS n
      FROM cnt LEFT JOIN q_t ON q_t.term = cnt.term
               LEFT JOIN q_s ON q_s.term = cnt.term
      CROSS JOIN tot_t CROSS JOIN tot_s
      GROUP BY cnt.doc_id)
SELECT d.doc_id,
       coalesce(s.n, 0)::BIGINT AS n_tokens_all,
       coalesce(CAST(s.micro AS DOUBLE) / {MICRO!r}, 0.0) AS log_weight
FROM docs d LEFT JOIN s ON s.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def lm_xent_sql(cfg: EngineConfig, table: str = "documents",
                id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for lm_xent (pipelines/lm.py): add-one unigram LM trained on
    the same corpus, per-term log-probs quantized to integer micro units
    BEFORE the per-doc sum — integer aggregation is order-free, so no
    float summation-order pinning is needed (unlike BM25).  floor() has
    no round-half hazard; the only shared float ops are the single
    ln/div per vocab term and one final UNROUNDED division per doc
    (identical integer inputs -> bit-equal doubles; round(,6) would hit
    the decimal half-tie hazard).  The micro scale is the ENGINE's
    shared lm.MICRO constant."""
    from opensearch_jvector_ray.pipelines.lm import MICRO
    pat = sql_quote(cfg.split_pattern)
    return f"""
WITH u AS (
  SELECT {id_col}, term FROM (
    SELECT {id_col},
           unnest(regexp_split_to_array(lower({text_col}), {pat})) AS term
    FROM {table}
  ) WHERE term <> ''
),
voc AS (SELECT term, count(*)::BIGINT AS cw FROM u GROUP BY term),
tot AS (SELECT CAST(sum(cw) AS DOUBLE) + CAST(count(*) AS DOUBLE) AS denom
        FROM voc),
q AS (SELECT term,
             CAST(floor(ln((cw + 1.0) / denom) * {MICRO!r}) AS BIGINT) AS qm
      FROM voc, tot),
cnt AS (SELECT {id_col}, term, count(*)::BIGINT AS c
        FROM u GROUP BY {id_col}, term),
s AS (SELECT cnt.{id_col}, sum(cnt.c * q.qm)::BIGINT AS micro,
             sum(cnt.c)::BIGINT AS n
      FROM cnt JOIN q USING (term) GROUP BY cnt.{id_col})
SELECT d.{id_col},
       coalesce(s.n, 0)::BIGINT AS n_tokens_all,
       coalesce(-(CAST(s.micro AS DOUBLE)) / (s.n * {MICRO!r}),
                0.0) AS xent
FROM {table} d LEFT JOIN s ON s.{id_col} = d.{id_col}
ORDER BY d.{id_col}
"""


def events_window_sql() -> str:
    """Tumbling daily windows per event type; integer-cents money math."""
    return """
SELECT event_type,
       date_trunc('day', ts) AS window_start,
       count(*)::BIGINT AS n_events,
       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
FROM events
GROUP BY event_type, date_trunc('day', ts)
ORDER BY event_type, window_start
"""


def events_asof_orders_sql() -> str:
    """As-of oracle WITHOUT native ASOF (whose duplicate-timestamp pick is
    unspecified): explicit row_number with the deterministic
    (o_orderdate desc, o_orderkey desc) tie rule used by the engine."""
    return """
SELECT event_id, user_id, ts, o_orderkey, o_orderdate
FROM (
  SELECT e.event_id, e.user_id, e.ts,
         o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id
               AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
)
WHERE rn = 1 ORDER BY event_id
"""


def revenue_by_nation_sql() -> str:
    """Broadcast-join oracle (integer-cents money math)."""
    return """
SELECT n.n_name,
       count(*)::BIGINT AS n_orders,
       round(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS total_revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name ORDER BY n.n_name
"""


def revenue_by_region_brand_sql() -> str:
    """Star-join oracle (four broadcast dims; pricing_summary integer
    money math on both sides)."""
    return """
SELECT r.r_name, p.p_brand,
       count(*)::BIGINT AS n_items,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
             / 10000.0, 4) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name, p.p_brand
ORDER BY r.r_name, p.p_brand
"""


def events_sessionize_sql(gap_minutes: int = 30) -> str:
    """Session-window oracle via lag + running sum of new-session flags."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM e
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events
FROM s GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def top_order_revenue_sql(k: int = 10,
                          orderdate_before: str = "1998-01-01") -> str:
    """Big-big join oracle; integer-cents revenue (price_c*(100-disc_c)
    summed as BIGINT then /10000) so sums are exact; (revenue desc,
    o_orderkey asc) tie rule."""
    return f"""
SELECT o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0,
             4) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '{orderdate_before} 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT {k}
"""


def events_lww_sql() -> str:
    return """
SELECT user_id, ts, event_type, value FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
"""


def pricing_summary_sql(cutoff: str = "1998-09-02") -> str:
    """TPC-H-Q1-flavoured aggregate; money summed as exact integer cents
    (both sides) so the oracle compare is fp-noise-free."""
    return f"""
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sum_qty,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0,
             4) AS sum_disc_price,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def hash_sample_sql(rate: float, salt: str = "", table: str = "documents",
                    id_col: str = "doc_id") -> str:
    """Deterministic-sample oracle: the THRESHOLD comes from the engine's
    own ``sample_threshold_hex`` (shared code — the rule cannot drift);
    fixed-width lowercase hex makes the lexical compare numeric."""
    from opensearch_jvector_ray.pipelines.corpus import sample_threshold_hex
    thresh = sample_threshold_hex(rate)
    return f"""
SELECT {id_col}
FROM {table}
WHERE substr(md5({sql_quote(salt)} || {id_col}::VARCHAR), 1, 4)
      < {sql_quote(thresh)}
ORDER BY {id_col}
"""


def mix_sources_sql(rates: dict[str, float], salt: str = "",
                    default_rate: float = 0.0, table: str = "documents",
                    id_col: str = "doc_id",
                    source_col: str = "source") -> str:
    """Dataset-mixing oracle: per-source CASE ladder over the SAME
    ``sample_threshold_hex`` thresholds the engine uses (shared code —
    the rule cannot drift); rate >= 1.0 keeps everything."""
    from opensearch_jvector_ray.pipelines.corpus import sample_threshold_hex
    arms = []
    for s in sorted(rates):
        r = rates[s]
        cond = ("TRUE" if r >= 1.0 else
                f"substr(md5({sql_quote(salt)} || {id_col}::VARCHAR), 1, 4)"
                f" < {sql_quote(sample_threshold_hex(r))}")
        arms.append(f"WHEN {sql_quote(s)} THEN {cond}")
    default = ("TRUE" if default_rate >= 1.0 else
               f"substr(md5({sql_quote(salt)} || {id_col}::VARCHAR), 1, 4)"
               f" < {sql_quote(sample_threshold_hex(min(default_rate, 1.0)))}")
    ladder = "\n        ".join(arms)
    return f"""
SELECT {id_col}, {source_col}
FROM {table}
WHERE CASE {source_col}
        {ladder}
        ELSE {default}
      END
ORDER BY {id_col}
"""


def hash_split_sql(splits: dict[str, float], salt: str = "",
                   table: str = "documents", id_col: str = "doc_id",
                   out_col: str = "split") -> str:
    """Split-assignment oracle: the same ascending CASE ladder over the
    engine-shared hash-range edges as ``hash_split``."""
    from opensearch_jvector_ray.pipelines.corpus import sample_threshold_hex
    labels = sorted(splits)
    acc = 0.0
    arms = []
    pref = f"substr(md5({sql_quote(salt)} || {id_col}::VARCHAR), 1, 4)"
    for lab in labels[:-1]:
        acc += float(splits[lab])
        if acc >= 1.0:
            # full-coverage arm claims everything left — mirrors the
            # engine's edge=None rule ('pref < ffff' would leak hash
            # prefix 'ffff' rows past a 100%-covering label)
            arms.append(f"WHEN TRUE THEN {sql_quote(lab)}")
            continue
        edge = sample_threshold_hex(acc)
        arms.append(f"WHEN {pref} < {sql_quote(edge)} "
                    f"THEN {sql_quote(lab)}")
    case = ("CASE " + " ".join(arms) +
            f" ELSE {sql_quote(labels[-1])} END")
    return f"""
SELECT {id_col}, {case} AS {out_col}
FROM {table}
ORDER BY {id_col}
"""


def pack_chunks_sql(cfg: EngineConfig, budget: int,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Sequence-packing oracle: the same post-stopword token counts as
    token_count_sql, then a window prefix-sum in id order — pack_id =
    exclusive-prefix // budget, pack_offset = prefix % budget."""
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
dl AS (SELECT {id_col}, count(*) AS n FROM toks GROUP BY {id_col}),
c AS (
  SELECT d.{id_col}, coalesce(dl.n, 0)::BIGINT AS n_tokens
  FROM {table} d LEFT JOIN dl ON dl.{id_col} = d.{id_col}
),
o AS (
  SELECT {id_col}, n_tokens,
         coalesce(sum(n_tokens) OVER (
             ORDER BY {id_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0)::BIGINT AS off
  FROM c
)
SELECT {id_col}, n_tokens,
       (off // {budget})::BIGINT AS pack_id,
       (off % {budget})::BIGINT AS pack_offset
FROM o ORDER BY {id_col}
"""


def minhash_exact_sql(n_plant: int, offset: int, shingle_k: int = 3,
                      table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """Degenerate-exact minhash oracle (threshold=1.0): clusters are the
    equivalence classes of IDENTICAL word-shingle SETS (whitespace split,
    case kept, the verify stage's rule; docs shorter than k get one
    all-tokens shingle).  The corpus is augmented with ``n_plant``
    planted copies of the lowest ids re-keyed to id+offset — identical
    texts have identical shingle sets AND identical minhash signatures
    in every band, so the LSH candidate stage finds them with
    probability 1 and the exact verify keeps exactly these clusters."""
    if shingle_k != 3:
        raise ValueError("the SQL window join is written for shingle_k=3")
    return f"""
WITH aug AS (
  SELECT {id_col}, {text_col} FROM {table}
  UNION ALL
  SELECT {id_col} + {offset}, {text_col} FROM {table}
  WHERE {id_col} < {n_plant}
), t AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array({text_col}, '\\s+'),
                     x -> x <> '') AS tk
  FROM aug
), s AS (
  SELECT {id_col},
    CASE WHEN len(tk) >= {shingle_k} THEN
      list_transform(range(1, len(tk) - {shingle_k - 2}),
                     i -> {" || ' ' || ".join(f"tk[i+{j}]" for j in range(3))})
    WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
    ELSE [] END AS sh
  FROM t
), f AS (
  SELECT {id_col},
         md5(array_to_string(list_sort(list_distinct(sh)), chr(31))) AS fp
  FROM s WHERE len(sh) > 0
), g AS (
  SELECT fp, min({id_col}) AS cluster_id, count(*) AS n
  FROM f GROUP BY fp
)
SELECT f.{id_col}, g.cluster_id
FROM f JOIN g USING (fp) WHERE g.n > 1
ORDER BY f.{id_col}
"""


def ngram_exact_sql(n_plant: int, offset: int, n: int = 5,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Degenerate-exact char-n-gram Jaccard oracle (threshold=1.0): the
    qualifying PAIRS are exactly those with IDENTICAL char-n-gram SETS
    (jaccard == 1.0; texts shorter than n contribute one whole-text
    gram).  The corpus is augmented with ``n_plant`` planted copies of
    the lowest ids re-keyed to id+offset.

    Soundness note (why a hard oracle is valid for an LSH-blocked
    pipeline): planted copies have identical word-shingle sets, hence
    identical minhash signatures in EVERY band — candidates with
    probability 1.  The synthetic corpus additionally contains a few
    natural pairs whose char-n-gram sets are identical but whose
    word-shingle sets differ by one trailing repeated token; their
    word-shingle Jaccard is ~0.97, so a band collision is certain for
    the fixed seed — verified empirically: engine == this oracle at
    sf0.001, sf0.01 AND sf0.1 (11 / 10 / 19 pairs)."""
    return f"""
WITH aug AS (
  SELECT {id_col}, {text_col} FROM {table}
  UNION ALL
  SELECT {id_col} + {offset}, {text_col} FROM {table}
  WHERE {id_col} < {n_plant}
), s AS (
  SELECT {id_col},
    CASE WHEN len({text_col}) >= {n} THEN
      list_transform(range(1, len({text_col}) - {n - 2}),
                     i -> substr({text_col}, i, {n}))
    WHEN len({text_col}) > 0 THEN [{text_col}]
    ELSE [] END AS ng
  FROM aug
), f AS (
  SELECT {id_col},
         md5(array_to_string(list_sort(list_distinct(ng)), chr(31))) AS fp
  FROM s WHERE len(ng) > 0
)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, 1.0::DOUBLE AS jaccard
FROM f a JOIN f b ON a.fp = b.fp AND a.{id_col} < b.{id_col}
ORDER BY id_a, id_b
"""


def range_join_sql(days: int = 90, table: str = "orders") -> str:
    """Interval self-join oracle: for every order, all strictly-earlier
    orders of the same customer within ``days`` days (the engine's
    orders_range_join semantics: 0 < gap <= days)."""
    return f"""
SELECT a.o_orderkey, a.o_custkey, a.o_orderdate,
       b.o_orderkey AS prev_orderkey, b.o_orderdate AS prev_orderdate,
       date_diff('day', b.o_orderdate, a.o_orderdate)::BIGINT AS day_gap
FROM {table} a JOIN {table} b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate < a.o_orderdate
 AND b.o_orderdate >= a.o_orderdate - INTERVAL {days} DAY
ORDER BY a.o_orderkey, prev_orderkey
"""


def quantile_sql(qs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99),
                 table: str = "lineitem",
                 col: str = "l_extendedprice") -> str:
    """Exact discrete-quantile oracle; selection rule is DuckDB's
    quantile_disc (value at cumulative count >= ceil(q*n)), which the
    engine's quantile_summary reproduces from merged value counts."""
    arms = " UNION ALL ".join(
        f"SELECT {q}::DOUBLE AS quantile, "
        f"quantile_disc({col}, {q})::DOUBLE AS value FROM {table}"
        for q in qs)
    return f"{arms} ORDER BY quantile"


def percentile_ranks_sql(queries: dict[str, str], min_score: float,
                         value_col: str, values: list[float],
                         cfg: EngineConfig, table: str = "documents",
                         id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """Oracle for IndexSearcher.percentile_ranks_agg: per given value,
    count(x <= v) / n over the radial match set — two exact BIGINTs,
    ONE division.  NULL values are excluded on both sides (the
    CASE/count(col) pair == the engine's null-dropping value counts); a
    query whose whole match set is NULL-valued emits NO row (HAVING ==
    the engine's empty-value-counts skip)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    v_rows = ",\n       ".join(f"({float(v)!r})" for v in sorted(values))
    return f"""
WITH hits AS ({inner}),
vals(value) AS (VALUES {v_rows})
SELECT h.query_id, v.value,
       sum(CASE WHEN d.{value_col} <= v.value THEN 1 ELSE 0 END)
         ::BIGINT::DOUBLE
         / count(d.{value_col})::BIGINT::DOUBLE AS pct_rank
FROM hits h JOIN {table} d USING ({id_col}) CROSS JOIN vals v
GROUP BY h.query_id, v.value
HAVING count(d.{value_col}) > 0
ORDER BY h.query_id, v.value
"""


def mad_sql(queries: dict[str, str], min_score: float, value_col: str,
            cfg: EngineConfig, table: str = "documents",
            id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for IndexSearcher.mad_agg: median(|x - median(x)|) over
    the radial match set — two nested quantile_disc selections over
    exact integers (the engine's _qdisc rule == DuckDB quantile_disc).
    NULL values are excluded on both sides; an all-NULL match set
    emits no row (quantile_disc over zero values is NULL, dropped by
    the vals CTE join)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
WITH hits AS ({inner}),
vals AS (
  SELECT h.query_id, d.{value_col} AS v
  FROM hits h JOIN {table} d USING ({id_col})
  WHERE d.{value_col} IS NOT NULL
),
med AS (
  SELECT query_id, quantile_disc(v, 0.5) AS m
  FROM vals GROUP BY query_id
)
SELECT v.query_id, m.m::DOUBLE AS median,
       quantile_disc(abs(v.v - m.m), 0.5)::DOUBLE AS mad
FROM vals v JOIN med m ON v.query_id = m.query_id
GROUP BY v.query_id, m.m
ORDER BY v.query_id
"""


def boxplot_sql(queries: dict[str, str], min_score: float,
                value_col: str, cfg: EngineConfig,
                table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    """Oracle for IndexSearcher.boxplot_agg: min / q1 / q2 / q3 / max
    of an integer stored column over the radial match set — quartiles
    by the quantile_disc selection rule.  NULL values excluded; an
    all-NULL match set emits no row (HAVING count(v) > 0)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
WITH hits AS ({inner})
SELECT h.query_id,
       min(d.{value_col})::DOUBLE AS v_min,
       quantile_disc(d.{value_col}, 0.25)::DOUBLE AS q1,
       quantile_disc(d.{value_col}, 0.5)::DOUBLE AS q2,
       quantile_disc(d.{value_col}, 0.75)::DOUBLE AS q3,
       max(d.{value_col})::DOUBLE AS v_max
FROM hits h JOIN {table} d USING ({id_col})
GROUP BY h.query_id
HAVING count(d.{value_col}) > 0
ORDER BY h.query_id
"""


def t_test_sql(queries: dict[str, str], min_score: float,
               value_col: str, filter_a: dict, filter_b: dict,
               cfg: EngineConfig, table: str = "documents",
               id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for IndexSearcher.t_test_agg (Welch unpaired t): the two
    filter predicates are GENERATED from the same structured specs the
    engine compiles (filter_spec_sql — one spec, two backends), the
    six integer sums are exact BIGINTs, and the float chain mirrors
    the engine's pinned op order symbol-for-symbol (avg = sum/n;
    var = (sos - avg*sum)/(n-1); t = (avg_a-avg_b)/sqrt(va/na+vb/nb)).
    Sides with n <= 1 drop the row (variance undefined)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    fa = filter_spec_sql(filter_a, alias="d")
    fb = filter_spec_sql(filter_b, alias="d")
    col = f"d.{value_col}"
    return f"""
WITH hits AS ({inner}),
s AS (
  SELECT h.query_id,
         count(CASE WHEN {fa} THEN 1 END)::BIGINT AS n_a,
         coalesce(sum(CASE WHEN {fa} THEN {col} END), 0)::BIGINT AS sum_a,
         coalesce(sum(CASE WHEN {fa} THEN {col} * {col} END), 0)::BIGINT
           AS sos_a,
         count(CASE WHEN {fb} THEN 1 END)::BIGINT AS n_b,
         coalesce(sum(CASE WHEN {fb} THEN {col} END), 0)::BIGINT AS sum_b,
         coalesce(sum(CASE WHEN {fb} THEN {col} * {col} END), 0)::BIGINT
           AS sos_b
  FROM hits h JOIN {table} d USING ({id_col})
  GROUP BY h.query_id
)
SELECT query_id, n_a, n_b,
       sum_a::DOUBLE / n_a::DOUBLE AS avg_a,
       sum_b::DOUBLE / n_b::DOUBLE AS avg_b,
       ((sum_a::DOUBLE / n_a::DOUBLE) - (sum_b::DOUBLE / n_b::DOUBLE))
       / sqrt(((sos_a::DOUBLE
                - (sum_a::DOUBLE / n_a::DOUBLE) * sum_a::DOUBLE)
               / (n_a - 1)::DOUBLE) / n_a::DOUBLE
              + ((sos_b::DOUBLE
                  - (sum_b::DOUBLE / n_b::DOUBLE) * sum_b::DOUBLE)
                 / (n_b - 1)::DOUBLE) / n_b::DOUBLE) AS t_value
FROM s
WHERE n_a > 1 AND n_b > 1
ORDER BY query_id
"""


def top_metrics_sql(queries: dict[str, str], min_score: float,
                    sort_col: str, metric_cols: list[str], size: int,
                    sort_order: str, cfg: EngineConfig,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Oracle for IndexSearcher.top_metrics_agg: metric values of the
    ``size`` best match-set docs by (sort column dir, doc key asc)."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    direction = "DESC" if sort_order == "desc" else "ASC"
    ml = ", ".join(f"d.{m} AS {m}" for m in metric_cols)
    ml_out = ", ".join(metric_cols)
    return f"""
SELECT query_id, rank, {id_col}, {sort_col}, {ml_out} FROM (
  SELECT h.query_id,
         row_number() OVER (PARTITION BY h.query_id
                            ORDER BY d.{sort_col} {direction},
                                     d.{id_col} ASC) AS rank,
         d.{id_col} AS {id_col}, d.{sort_col} AS {sort_col}, {ml}
  FROM ({inner}) h JOIN {table} d USING ({id_col})
) WHERE rank <= {int(size)}
ORDER BY query_id, rank
"""


def combined_fields_sql(queries: dict[str, str], k: int,
                        cfg: EngineConfig,
                        field_a: str, field_b: str,
                        w_a: int = 1, w_b: int = 1,
                        table: str = "documents",
                        id_col: str = "doc_id") -> str:
    """Oracle for query.combined_fields (two-field form): term-centric
    BM25F with shared statistics — tf/dl are EXACT integer weighted
    sums across fields, df is the union document frequency, avgdl is
    ONE division of two integers, and the per-doc score sums in sorted
    term order (the engine's rule).  Integer weights keep every
    pre-BM25 quantity exact, so the compare is bit-level."""
    qt_rows = []
    for qid, text in sorted(queries.items()):
        for term, qw in query_term_weights(text, cfg):
            qt_rows.append(f"({sql_quote(qid)}, {sql_quote(term)}, "
                           f"{float(qw)!r})")
    qt_values = ",\n       ".join(qt_rows) if qt_rows else \
        "('__none__', '__none__', 0.0)"
    pat = sql_quote(cfg.split_pattern)
    stop = stoplist_sql(cfg)

    def tok(name: str, col: str) -> str:
        return f"""
{name}0 AS (
  SELECT {id_col}, unnest(regexp_split_to_array(lower({col}), {pat}))
    AS term
  FROM {table}
),
{name} AS (
  SELECT {id_col}, term FROM {name}0
  WHERE term <> '' AND NOT list_contains({stop}, term)
)"""

    return f"""
WITH {tok("tka", field_a)},{tok("tkb", field_b)},
qt(query_id, term, w) AS (VALUES {qt_values}),
tfa AS (
  SELECT {id_col}, term, count(*)::BIGINT AS tf FROM tka
  WHERE term IN (SELECT DISTINCT term FROM qt)
  GROUP BY {id_col}, term
),
tfb AS (
  SELECT {id_col}, term, count(*)::BIGINT AS tf FROM tkb
  WHERE term IN (SELECT DISTINCT term FROM qt)
  GROUP BY {id_col}, term
),
tfc AS (
  SELECT coalesce(a.{id_col}, b.{id_col}) AS {id_col},
         coalesce(a.term, b.term) AS term,
         (coalesce(a.tf, 0) * {int(w_a)}
          + coalesce(b.tf, 0) * {int(w_b)})::BIGINT AS tf
  FROM tfa a FULL OUTER JOIN tfb b
    ON a.{id_col} = b.{id_col} AND a.term = b.term
),
dla AS (SELECT {id_col}, count(*)::BIGINT AS dl FROM tka
        GROUP BY {id_col}),
dlb AS (SELECT {id_col}, count(*)::BIGINT AS dl FROM tkb
        GROUP BY {id_col}),
dlc AS (
  SELECT d.{id_col},
         (coalesce(dla.dl, 0) * {int(w_a)}
          + coalesce(dlb.dl, 0) * {int(w_b)})::BIGINT AS dl
  FROM {table} d
  LEFT JOIN dla USING ({id_col}) LEFT JOIN dlb USING ({id_col})
),
stats AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS dlsum FROM dlc
),
dfc AS (
  SELECT term, count(DISTINCT {id_col})::DOUBLE AS df
  FROM (SELECT {id_col}, term FROM tka
        UNION SELECT {id_col}, term FROM tkb) u
  WHERE term IN (SELECT DISTINCT term FROM qt)
  GROUP BY term
),
scores AS (
  SELECT qt.query_id, tfc.{id_col},
         sum(qt.w * ln(1.0 + (stats.n::DOUBLE - dfc.df + 0.5)
                             / (dfc.df + 0.5))
             * (tfc.tf::DOUBLE / (tfc.tf::DOUBLE
                + {cfg.k1!r} * (1.0 - {cfg.b!r} + {cfg.b!r}
                   * dlc.dl::DOUBLE
                   / (stats.dlsum::DOUBLE / stats.n::DOUBLE))))
             ORDER BY qt.term
            ) AS score__raw
  FROM qt
  JOIN tfc ON tfc.term = qt.term
  JOIN dfc ON dfc.term = qt.term
  JOIN dlc ON dlc.{id_col} = tfc.{id_col}
  CROSS JOIN stats
  WHERE tfc.tf > 0
  GROUP BY qt.query_id, tfc.{id_col}
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC)
           AS rank,
         {id_col}, score__raw
  FROM scores
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {int(k)}
ORDER BY query_id, rank
"""


def rank_feature_add_sql(spec: dict, is_ts: bool = False) -> str:
    """SQL expression (over source-row alias ``__b``) GENERATED from the
    engine's rank_feature/distance_feature spec — the same object
    `_doc_addend` consumes; constants embedded via repr from the same
    Python floats, op chain identical (division/multiply, no libm)."""
    field = spec["field"]
    col = f"epoch_us(__b.{field})::DOUBLE" if is_ts \
        else f"__b.{field}::DOUBLE"
    boost = repr(float(spec.get("boost", 1.0)))
    if spec["kind"] == "saturation":
        pivot = repr(float(spec["pivot"]))
        return f"{boost} * ({col} / ({col} + {pivot}))"
    if spec["kind"] == "distance":
        pivot = repr(float(spec["pivot"]))
        origin = repr(float(spec["origin"]))
        return (f"{boost} * ({pivot} / ({pivot} + "
                f"abs({col} - {origin})))")
    raise ValueError(f"unknown rank_feature kind {spec['kind']!r}")


def matched_queries_sql(queries: dict[str, dict[str, str]], k: int,
                        cfg: EngineConfig, table: str = "documents",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """Oracle for IndexSearcher.matched_queries_search: top-k BM25 over
    the union of the named clauses' distinct analyzed terms (weight 1,
    sorted), each hit annotated with the comma-joined sorted names of
    clauses having >= 1 term in the doc."""
    from opensearch_jvector_ray.analyze import analyze_query
    texts = {}
    ct_rows = []
    for qid, clauses in sorted(queries.items()):
        all_terms: set[str] = set()
        for name, txt in sorted(clauses.items()):
            terms = sorted(set(analyze_query(txt, cfg)))
            all_terms.update(terms)
            for t in terms:
                ct_rows.append(f"({sql_quote(qid)}, {sql_quote(name)}, "
                               f"{sql_quote(t)})")
        texts[qid] = " ".join(sorted(all_terms))
    inner = bm25_sql(texts, k, cfg, table=table, id_col=id_col,
                     text_col=text_col)
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
hits AS ({inner}),
ct(query_id, name, term) AS (VALUES {", ".join(ct_rows)}),
cm AS (
  SELECT h.query_id, h.{id_col}, c.name
  FROM hits h JOIN ct c ON c.query_id = h.query_id
  WHERE EXISTS (SELECT 1 FROM toks t
                WHERE t.{id_col} = h.{id_col} AND t.term = c.term)
  GROUP BY h.query_id, h.{id_col}, c.name
)
SELECT h.query_id, h.rank, h.{id_col}, h.score,
       string_agg(cm.name, ',' ORDER BY cm.name) AS matched_queries
FROM hits h JOIN cm ON cm.query_id = h.query_id
                   AND cm.{id_col} = h.{id_col}
GROUP BY h.query_id, h.rank, h.{id_col}, h.score
ORDER BY h.query_id, h.rank
"""


def pinned_sql(queries: dict[str, str], pinned: dict[str, list],
               k: int, cfg: EngineConfig, table: str = "documents",
               id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for IndexSearcher.pinned_search: existing pinned ids
    first in their GIVEN order with the -1.0 sentinel score, organic
    BM25 hits (pinned excluded) after, first k rows.  The sentinel (not
    NULL) is deliberate: a NULL on the SQL side vs NaN on the engine
    side survives a pandas value compare but not an Arrow-level hash
    (null mask vs NaN payload) — the round-4 driver gate caught exactly
    that.  Position is the contract either way."""
    max_p = max((len(v) for v in pinned.values()), default=0)
    inner = bm25_sql(queries, k + max_p, cfg, table=table,
                     id_col=id_col, text_col=text_col)
    rows = []
    for qid in sorted(queries):
        for pos, i in enumerate(pinned.get(qid, ())):
            rows.append(f"({sql_quote(qid)}, {pos}, {int(i)})")
    if not rows:
        rows.append("('__none__', -1, -1)")
    return f"""
WITH hits AS ({inner}),
pins(query_id, pos, {id_col}) AS (VALUES {", ".join(rows)}),
pe AS (
  SELECT p.query_id, p.pos, p.{id_col}
  FROM pins p JOIN {table} d USING ({id_col})
  WHERE p.pos >= 0
),
org AS (
  SELECT h.query_id, h.rank, h.{id_col}, h.score
  FROM hits h LEFT JOIN pe ON pe.query_id = h.query_id
                          AND pe.{id_col} = h.{id_col}
  WHERE pe.{id_col} IS NULL
),
u AS (
  SELECT query_id, 0 AS grp, pos AS ord1, {id_col},
         -1.0::DOUBLE AS score
  FROM pe
  UNION ALL
  SELECT query_id, 1, rank, {id_col}, score FROM org
),
r AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY grp, ord1) AS rank,
         {id_col}, score
  FROM u
)
SELECT query_id, rank, {id_col}, score
FROM r WHERE rank <= {int(k)}
ORDER BY query_id, rank
"""


def terms_set_sql(queries: dict[str, str], k: int, cfg: EngineConfig,
                  arms: list[tuple[str, int]],
                  required_field: str = "turn_idx") -> str:
    """Oracle for search(terms_set=) over the transcripts index: a doc
    qualifies iff it matches >= greatest(1, least(n_query_terms,
    required_field)) DISTINCT query terms; qualifying docs rank by the
    standard BM25 sum.  n_query_terms per query is computed from the
    SAME analyzer the engine uses and embedded as values."""
    prefix = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, text")
    inner = bm25_sql(queries, 0, cfg, table="transcripts",
                     id_col="doc_id", prefix_cte=prefix,
                     min_score=1e-300, emit_raw=True)
    outer = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              f" AS doc_id, text, {required_field}")
    qt_rows, nt_rows = [], []
    for qid, text in sorted(queries.items()):
        terms = sorted({t for t, _ in query_term_weights(text, cfg)})
        nt_rows.append(f"({sql_quote(qid)}, {len(terms)})")
        for t in terms:
            qt_rows.append(f"({sql_quote(qid)}, {sql_quote(t)})")
    return f"""
WITH {outer},
{toks_cte(cfg, "transcripts", "doc_id", "text")},
qt2(query_id, term) AS (VALUES {", ".join(qt_rows)}),
nt(query_id, n_terms) AS (VALUES {", ".join(nt_rows)}),
nm AS (
  SELECT q.query_id, t.doc_id,
         count(DISTINCT t.term)::BIGINT AS nm
  FROM toks t JOIN qt2 q ON q.term = t.term
  GROUP BY q.query_id, t.doc_id
),
hits AS ({inner}),
qual AS (
  SELECT h.query_id, h.doc_id, h.score__raw
  FROM hits h
  JOIN nm ON nm.query_id = h.query_id AND nm.doc_id = h.doc_id
  JOIN nt ON nt.query_id = h.query_id
  JOIN transcripts d ON d.doc_id = h.doc_id
  WHERE nm.nm >= greatest(1, least(nt.n_terms, d.{required_field}))
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, doc_id ASC)
           AS rank,
         doc_id, round(score__raw, 6) AS score
  FROM qual
)
SELECT query_id, rank, doc_id, score
FROM ranked WHERE rank <= {int(k)}
ORDER BY query_id, rank
"""


def cumulative_cardinality_sql(queries: dict[str, str],
                               min_score: float,
                               calendar_interval: str, field: str,
                               cfg: EngineConfig,
                               arms: list[tuple[str, int]]) -> str:
    """Oracle for IndexSearcher.cumulative_cardinality_agg over the
    transcripts index: per date bucket, the match-set doc count plus
    the running distinct count of ``field`` — each value attributed to
    its FIRST bucket, first-appearance counts cumsummed over present
    buckets (exactly the engine's min-bucket rule; NULLs excluded from
    the distinct count, included in doc_count)."""
    prefix = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, text")
    inner = bm25_sql(queries, 0, cfg, table="transcripts",
                     id_col="doc_id", prefix_cte=prefix,
                     min_score=min_score)
    outer = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              f" AS doc_id, ts, {field}")
    return f"""
WITH {outer},
b AS (
  SELECT h.query_id,
         date_trunc({sql_quote(calendar_interval)}, d.ts) AS bucket,
         d.{field} AS v
  FROM ({inner}) h JOIN transcripts d USING (doc_id)
),
bc AS (
  SELECT query_id, bucket, count(*)::BIGINT AS doc_count
  FROM b GROUP BY query_id, bucket
),
fs AS (
  SELECT query_id, v, min(bucket) AS bucket
  FROM b WHERE v IS NOT NULL GROUP BY query_id, v
),
fc AS (
  SELECT query_id, bucket, count(*)::BIGINT AS n_first
  FROM fs GROUP BY query_id, bucket
)
SELECT bc.query_id, bc.bucket, bc.doc_count,
       sum(coalesce(fc.n_first, 0)) OVER (
         PARTITION BY bc.query_id ORDER BY bc.bucket
       )::BIGINT AS cumulative_cardinality
FROM bc LEFT JOIN fc USING (query_id, bucket)
ORDER BY bc.query_id, bc.bucket
"""


def missing_agg_sql(queries: dict[str, str], min_score: float,
                    field: str, cfg: EngineConfig,
                    arms: list[tuple[str, int]]) -> str:
    """Oracle for IndexSearcher.missing_agg over the transcripts index:
    per query, the match-set docs whose ``field`` is absent — NULL or
    '' (the engine's string-sidecar absent sentinel), zero-filled per
    query like the engine's always-present missing bucket."""
    prefix = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, text")
    inner = bm25_sql(queries, 0, cfg, table="transcripts",
                     id_col="doc_id", prefix_cte=prefix,
                     min_score=min_score)
    outer = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              f" AS doc_id, {field}")
    return f"""
WITH {outer},
{_qids_cte(queries)},
c AS (
  SELECT h.query_id, count(*)::BIGINT AS doc_count
  FROM ({inner}) h JOIN transcripts d USING (doc_id)
  WHERE d.{field} IS NULL OR d.{field} = ''
  GROUP BY h.query_id
)
SELECT q.query_id, coalesce(c.doc_count, 0)::BIGINT AS doc_count
FROM qids q LEFT JOIN c USING (query_id)
ORDER BY q.query_id
"""


def vw_histogram_sql(queries: dict[str, str], min_score: float,
                     value_col: str, buckets: int, cfg: EngineConfig,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """Oracle for IndexSearcher.variable_width_histogram_agg: distinct
    match-set values split at the (buckets - 1) largest adjacent gaps
    ((gap DESC, boundary value ASC) ties); per bucket min / max /
    doc_count / centroid, centroid = ONE division of two exact
    integers."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
WITH hits AS ({inner}),
vals AS (
  SELECT h.query_id, d.{value_col} AS v,
         count(*)::BIGINT AS c
  FROM hits h JOIN {table} d USING ({id_col})
  WHERE d.{value_col} IS NOT NULL
  GROUP BY h.query_id, d.{value_col}
),
gaps AS (
  SELECT query_id, v, c,
         v - lag(v) OVER (PARTITION BY query_id ORDER BY v) AS gap
  FROM vals
),
rk AS (
  SELECT query_id, v,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY gap DESC, v ASC) AS rn
  FROM gaps WHERE gap IS NOT NULL
),
marked AS (
  SELECT g.query_id, g.v, g.c,
         CASE WHEN r.rn IS NOT NULL AND r.rn <= {int(buckets) - 1}
              THEN 1 ELSE 0 END AS brk
  FROM gaps g LEFT JOIN rk r
    ON r.query_id = g.query_id AND r.v = g.v
),
bucketed AS (
  SELECT query_id, v, c,
         sum(brk) OVER (PARTITION BY query_id ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS bid
  FROM marked
)
SELECT query_id,
       min(v)::DOUBLE AS v_min,
       max(v)::DOUBLE AS v_max,
       sum(c)::BIGINT AS doc_count,
       sum(v * c)::BIGINT::DOUBLE / sum(c)::BIGINT::DOUBLE AS centroid
FROM bucketed
GROUP BY query_id, bid
ORDER BY query_id, v_min
"""


def value_count_sql(queries: dict[str, str], min_score: float,
                    field: str, cfg: EngineConfig,
                    arms: list[tuple[str, int]]) -> str:
    """Oracle for IndexSearcher.value_count_agg over the transcripts
    index: per query, the match-set docs whose ``field`` is present —
    NOT NULL and not '' (the complement of missing_agg's rule),
    zero-filled per query like the engine's always-present row."""
    prefix = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, text")
    inner = bm25_sql(queries, 0, cfg, table="transcripts",
                     id_col="doc_id", prefix_cte=prefix,
                     min_score=min_score)
    outer = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              f" AS doc_id, {field}")
    return f"""
WITH {outer},
{_qids_cte(queries)},
c AS (
  SELECT h.query_id, count(*)::BIGINT AS value_count
  FROM ({inner}) h JOIN transcripts d USING (doc_id)
  WHERE d.{field} IS NOT NULL AND d.{field} <> ''
  GROUP BY h.query_id
)
SELECT q.query_id, coalesce(c.value_count, 0)::BIGINT AS value_count
FROM qids q LEFT JOIN c USING (query_id)
ORDER BY q.query_id
"""


def global_stats_sql(value_col: str, table: str = "documents") -> str:
    """Oracle for IndexSearcher.global_stats_agg: integer stats over
    ALL rows (the query-ignoring global bucket); avg = ONE division of
    the two exact integers, matching the engine's fp rule."""
    return f"""
SELECT count(*)::BIGINT AS doc_count,
       sum({value_col})::BIGINT AS v_sum,
       min({value_col})::BIGINT AS v_min,
       max({value_col})::BIGINT AS v_max,
       sum({value_col})::BIGINT::DOUBLE / count(*)::BIGINT::DOUBLE
         AS v_avg
FROM {table}
"""


def sampler_sql(queries: dict[str, str], min_score: float, field: str,
                shard_size: int, cfg: EngineConfig,
                table: str = "documents", id_col: str = "doc_id",
                text_col: str = "text") -> str:
    """Oracle for IndexSearcher.sampler_agg: terms counts over the best
    ``shard_size`` radial hits by (raw score desc, key asc).  The
    radial inner query's rank column is computed over the full score
    order, and the min_score filter keeps a prefix of it, so
    rank <= shard_size IS the sample."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score)
    return f"""
WITH hits AS ({inner}),
samp AS (SELECT * FROM hits WHERE rank <= {int(shard_size)})
SELECT s.query_id, d.{field} AS {field}, count(*)::BIGINT AS doc_count
FROM samp s JOIN {table} d USING ({id_col})
GROUP BY s.query_id, d.{field}
ORDER BY s.query_id, doc_count DESC, {field} ASC
"""


def diversified_sampler_sql(queries: dict[str, str], min_score: float,
                            field: str, div_field: str,
                            max_docs_per_value: int, shard_size: int,
                            cfg: EngineConfig, table: str = "documents",
                            id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    """Oracle for IndexSearcher.diversified_sampler_agg: walk the
    radial hits in (raw score desc, key asc) order keeping at most
    ``max_docs_per_value`` per ``div_field`` value (row_number within
    the value partition), take the first ``shard_size`` kept, count
    ``field`` values."""
    inner = bm25_sql(queries, 0, cfg, table=table, id_col=id_col,
                     text_col=text_col, min_score=min_score,
                     emit_raw=True)
    return f"""
WITH hits AS ({inner}),
dv AS (
  SELECT h.query_id, h.{id_col}, h.score__raw,
         d.{div_field} AS __dv, d.{field} AS __tf,
         row_number() OVER (PARTITION BY h.query_id, d.{div_field}
                            ORDER BY h.score__raw DESC,
                                     h.{id_col} ASC) AS rn
  FROM hits h JOIN {table} d USING ({id_col})
  WHERE d.{div_field} IS NOT NULL
),
kept AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score__raw DESC,
                                        {id_col} ASC) AS krank
  FROM dv WHERE rn <= {int(max_docs_per_value)}
)
SELECT query_id, __tf AS {field}, count(*)::BIGINT AS doc_count
FROM kept WHERE krank <= {int(shard_size)}
GROUP BY query_id, __tf
ORDER BY query_id, doc_count DESC, {field} ASC
"""


def auto_date_histogram_sql(queries: dict[str, str], min_score: float,
                            target_buckets: int, cfg: EngineConfig,
                            arms: list[tuple[str, int]]) -> str:
    """Oracle for IndexSearcher.auto_date_histogram_agg over the
    transcripts index: per query the smallest (hour, day, month)
    interval whose present-bucket count is <= ``target_buckets``
    (month otherwise), and that interval's histogram — the CASE
    chooser verifies the interval CHOICE itself, not just the chosen
    histogram."""
    prefix = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, text")
    inner = bm25_sql(queries, 0, cfg, table="transcripts",
                     id_col="doc_id", prefix_cte=prefix,
                     min_score=min_score)
    outer = transcripts_arms_cte(
        arms, "conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 10, '0')"
              " AS doc_id, ts")
    t = int(target_buckets)
    return f"""
WITH {outer},
{_qids_cte(queries)},
b0 AS (
  SELECT h.query_id, d.ts
  FROM ({inner}) h JOIN transcripts d USING (doc_id)
),
bh AS (
  SELECT query_id, date_trunc('hour', ts) AS bucket,
         count(*)::BIGINT AS doc_count
  FROM b0 GROUP BY query_id, bucket
),
bd AS (
  SELECT query_id, date_trunc('day', ts) AS bucket,
         count(*)::BIGINT AS doc_count
  FROM b0 GROUP BY query_id, bucket
),
bmn AS (
  SELECT query_id, date_trunc('month', ts) AS bucket,
         count(*)::BIGINT AS doc_count
  FROM b0 GROUP BY query_id, bucket
),
choice AS (
  SELECT q.query_id,
         CASE WHEN (SELECT count(*) FROM bh
                    WHERE bh.query_id = q.query_id) <= {t} THEN 'hour'
              WHEN (SELECT count(*) FROM bd
                    WHERE bd.query_id = q.query_id) <= {t} THEN 'day'
              ELSE 'month' END AS cal_interval
  FROM qids q
),
u AS (
  SELECT 'hour' AS cal_interval, * FROM bh
  UNION ALL SELECT 'day', * FROM bd
  UNION ALL SELECT 'month', * FROM bmn
)
SELECT u.query_id, u.cal_interval, u.bucket, u.doc_count
FROM u JOIN choice ON choice.query_id = u.query_id
                  AND choice.cal_interval = u.cal_interval
ORDER BY u.query_id, u.bucket
"""


def keyword_sql(k: int, cfg: EngineConfig, table: str = "documents",
                id_col: str = "doc_id", text_col: str = "text") -> str:
    """Oracle for pipelines.textstats.extract_keywords: per doc the top
    ``k`` post-stopword terms by tf * idf (row_number ORDER BY tf*idf
    DESC, term ASC — the engine's exact rule; tf is the integer term
    count, idf the shared ln formula over the corpus df/N, ONE
    multiply).  Ranking is on the ROUND-6 score with term-asc ties on
    BOTH sides (the repo's vector-entry rule) — numpy log and libm ln
    can differ in the last ulp, so a raw rank would be probabilistic at
    the k boundary; the rounded rank is exact by construction whenever
    the rounded values agree."""
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
dl AS (
  SELECT {id_col}, count(*)::DOUBLE AS dl FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*)::DOUBLE AS n FROM dl
),
tf AS (
  SELECT {id_col}, term, count(*)::BIGINT AS tf FROM toks
  GROUP BY {id_col}, term
),
df AS (
  SELECT term, count(DISTINCT {id_col})::DOUBLE AS df FROM toks
  GROUP BY term
),
scored AS (
  SELECT tf.{id_col}, tf.term,
         tf.tf::DOUBLE * ln(1.0 + ((SELECT n FROM stats) - df.df + 0.5)
                                  / (df.df + 0.5)) AS score
  FROM tf JOIN df USING (term)
),
ranked AS (
  SELECT {id_col},
         row_number() OVER (PARTITION BY {id_col}
                            ORDER BY round(score, 6) DESC, term ASC
                           ) AS kw_rank,
         term, round(score, 6) AS score
  FROM scored
)
SELECT {id_col}, kw_rank, term, score
FROM ranked WHERE kw_rank <= {int(k)}
ORDER BY {id_col}, kw_rank
"""


def chunk_sql(chunk_tokens: int, overlap: int,
              table: str = "documents", id_col: str = "doc_id",
              text_col: str = "text") -> str:
    """Oracle for pipelines.corpus.chunk_documents: whitespace tokens
    (the shared \\s+ RE2 split) windowed into chunks of ``chunk_tokens``
    with ``overlap`` carried between consecutive chunks; integer
    chunk-count rule shared verbatim with the engine; chunk text is the
    space-joined token slice (byte-identical)."""
    stride = int(chunk_tokens) - int(overlap)
    c, s = int(chunk_tokens), stride
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array({text_col}, '\\s+'),
                     x -> x <> '') AS toks
  FROM {table}
),
n AS (
  SELECT {id_col}, toks, len(toks)::BIGINT AS ntok FROM t
  WHERE len(toks) > 0
),
x AS (
  SELECT {id_col}, toks, ntok,
         unnest(range(0, CASE WHEN ntok <= {c} THEN 1
                              ELSE 1 + (ntok - {c} + {s} - 1) // {s}
                         END)) AS chunk_idx
  FROM n
)
SELECT {id_col}, chunk_idx,
       least(chunk_idx * {s} + {c}, ntok) - chunk_idx * {s} AS n_tokens,
       array_to_string(toks[chunk_idx * {s} + 1
                            : least(chunk_idx * {s} + {c}, ntok)],
                       ' ') AS chunk_text
FROM x ORDER BY {id_col}, chunk_idx
"""


def sparse_vector_sql(queries: "dict[str, list[tuple[str, float]]]",
                      k: int, cfg: EngineConfig,
                      table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """sparse_vector / neural_sparse oracle: score = sum over the query's
    (token, weight) pairs of weight * tf(token, doc) — the engine's
    linear_tf kernel (no idf, no length norm).  Tokens are literal
    post-analysis vocabulary forms (no query analysis on either side);
    weights must be > 0, and the sum is ORDERED BY term to match the
    engine's token-sorted summation (the pinned-summation rule —
    integer weights are exact regardless, fractional ones need the
    shared order)."""
    qt_rows = [f"({sql_quote(qid)}, {sql_quote(t)}, {float(w)!r})"
               for qid, tws in sorted(queries.items()) for t, w in tws]
    qt_values = ",\n       ".join(qt_rows)
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)},
qt(query_id, term, w) AS (VALUES {qt_values}),
tf AS (
  SELECT {id_col}, term, count(*) AS tf FROM toks GROUP BY {id_col}, term
),
scores AS (
  SELECT qt.query_id, tf.{id_col},
         sum(qt.w * tf.tf ORDER BY qt.term) AS score__raw
  FROM qt JOIN tf USING (term)
  GROUP BY qt.query_id, tf.{id_col}
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score__raw DESC, {id_col} ASC) AS rank,
         {id_col}, score__raw
  FROM scores WHERE score__raw > 0
)
SELECT query_id, rank, {id_col}, round(score__raw, 6) AS score
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def geo_distance_sql(queries: "dict[str, tuple[float, float]]", k: int,
                     lat_expr: str, lon_expr: str,
                     table: str = "events", id_col: str = "event_id",
                     radius_km: float | None = None) -> str:
    """geo_distance query + distance sort oracle: the haversine with the
    ENGINE'S pinned operation order (pipelines/geo.haversine_km —
    half-angle sines squared, cos-lat product, 2*R*asin(sqrt(a))),
    round(6) BEFORE ranking on both sides (the vector-entry fp rule).
    ``lat_expr``/``lon_expr`` are SQL expressions over the table row —
    the gate derives coordinates from integer ids so the derivation is
    exact on both sides."""
    q_rows = ", ".join(
        f"({sql_quote(qid)}, {float(la)!r}, {float(lo)!r})"
        for qid, (la, lo) in sorted(queries.items()))
    rad = f"WHERE distance_km <= {float(radius_km)!r}" \
        if radius_km is not None else ""
    return f"""
WITH pts AS (
  SELECT {id_col}, {lat_expr} AS lat, {lon_expr} AS lon FROM {table}
),
q(query_id, qlat, qlon) AS (VALUES {q_rows}),
d AS (
  SELECT q.query_id, pts.{id_col},
         round(2 * 6371.0 * asin(sqrt(
             pow(sin(radians(pts.lat - q.qlat) / 2), 2)
             + cos(radians(q.qlat)) * cos(radians(pts.lat))
               * pow(sin(radians(pts.lon - q.qlon) / 2), 2)
         )), 6) AS distance_km
  FROM q CROSS JOIN pts
),
r AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY distance_km ASC, {id_col} ASC)
             AS rank,
         {id_col}, distance_km
  FROM d {rad}
)
SELECT query_id, rank, {id_col}, distance_km
FROM r WHERE rank <= {k}
ORDER BY query_id, rank
"""


def response_latency_sql(arms: "list[tuple[str, int]]") -> str:
    """Oracle for transcripts.response_latency: lag window over
    (conv_id, turn_idx); a turn qualifies iff its previous turn's role
    is 'user' (the first turn's NULL prev_role never qualifies —
    matching the engine's same-conversation mask); latency = exact
    integer microsecond delta on both sides."""
    cte = transcripts_arms_cte(arms, "conv_id, turn_idx, role, ts")
    return f"""
WITH {cte},
ordered AS (
  SELECT conv_id, turn_idx, role,
         lag(role) OVER w AS prev_role,
         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS latency_us
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
       CAST(latency_us AS BIGINT) AS latency_us
FROM ordered WHERE prev_role = 'user'
ORDER BY conv_id, turn_idx
"""


def percolate_filtered_sql(queries: dict[str, str],
                           filters: "dict[str, dict]",
                           cfg: EngineConfig,
                           table: str = "documents",
                           id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """Oracle for pipelines.percolate with filter-context clauses
    (match_mode='any'): per query, shared-term EXISTS ANDed with the
    SAME structured filter spec's SQL predicate (filter_spec_sql — ONE
    spec drives both sides, the M7 rule); a query with no surviving
    text terms is a pure-filter arm."""
    from opensearch_jvector_ray.pipelines.percolate import (
        compile_queries,
    )
    compiled = compile_queries(queries, cfg)
    arms = []
    for qid in sorted(queries):
        terms = compiled.get(qid)
        spec = filters.get(qid)
        conds = []
        if terms:
            tl = ", ".join(sql_quote(t) for t in terms)
            conds.append(
                f"EXISTS (SELECT 1 FROM toks t WHERE "
                f"t.{id_col} = __f.{id_col} AND t.term IN ({tl}))")
        if spec is not None:
            conds.append(f"({filter_spec_sql(spec)})")
        if not conds:
            continue                  # no text, no filter: matches nothing
        arms.append(f"SELECT {id_col}, {sql_quote(qid)} AS query_id "
                    f"FROM {table} __f WHERE "
                    f"{' AND '.join(conds)}")
    union = "\nUNION ALL\n".join(arms) if arms else \
        f"SELECT {id_col}, '' AS query_id FROM {table} WHERE false"
    return f"""
WITH {toks_cte(cfg, table, id_col, text_col)}
SELECT {id_col}, query_id FROM (
{union}
)
ORDER BY {id_col}, query_id
"""


def tool_transitions_sql(arms: "list[tuple[str, int]]") -> str:
    """Oracle for transcripts.tool_transitions: lag over the
    tool-bearing subsequence per conversation (non-tool turns are
    SKIPPED, not chain breaks — the filtered-window rule), counts per
    (prev_tool, tool)."""
    cte = transcripts_arms_cte(arms, "conv_id, turn_idx, tool")
    return f"""
WITH {cte},
toolseq AS (
  SELECT conv_id, turn_idx, tool,
         lag(tool) OVER (PARTITION BY conv_id
                         ORDER BY turn_idx) AS prev_tool
  FROM transcripts
  WHERE tool IS NOT NULL AND tool <> ''
)
SELECT prev_tool, tool, count(*)::BIGINT AS n_transitions
FROM toolseq WHERE prev_tool IS NOT NULL
GROUP BY prev_tool, tool
ORDER BY prev_tool, tool
"""



def geo_bbox_sql(boxes: "dict[str, tuple[float, float, float, float]]",
                 lat_expr: str, lon_expr: str,
                 table: str = "events", id_col: str = "event_id") -> str:
    """geo_bounding_box oracle: inclusive-edge box membership with the
    engine's dateline rule (left > right -> lon >= left OR lon <= right,
    pipelines/geo.geo_bounding_box) — exact comparisons only."""
    preds = []
    for qid, (top, left, bottom, right) in sorted(boxes.items()):
        lon_pred = (f"(lon >= {float(left)!r} AND lon <= {float(right)!r})"
                    if left <= right else
                    f"(lon >= {float(left)!r} OR lon <= {float(right)!r})")
        preds.append(
            f"SELECT {sql_quote(qid)} AS query_id, {id_col} FROM pts\n"
            f"  WHERE lat <= {float(top)!r} AND lat >= {float(bottom)!r}"
            f" AND {lon_pred}")
    un = "\n  UNION ALL\n".join(preds)
    return f"""
WITH pts AS (
  SELECT {id_col}, {lat_expr} AS lat, {lon_expr} AS lon FROM {table}
)
SELECT query_id, {id_col} FROM (
  {un}
)
ORDER BY query_id, {id_col}"""


def geo_polygon_sql(polygons: "dict[str, list[tuple[float, float]]]",
                    lat_expr: str, lon_expr: str,
                    table: str = "events",
                    id_col: str = "event_id") -> str:
    """geo_polygon oracle: the engine's DIVISION-FREE crossing-parity
    test unrolled per edge (pipelines/geo.geo_polygon — cond on the
    y-straddle, sign of the cross product vs edge direction), summed
    and reduced mod 2.  Every arithmetic step is one IEEE double op in
    the engine's exact order, so membership is bit-identical."""
    parts = []
    for qid, verts in sorted(polygons.items()):
        vs = [(float(la), float(lo)) for la, lo in verts]
        n_v = len(vs)
        edges = []
        for i in range(n_v):
            y1, x1 = vs[i]
            y2, x2 = vs[(i + 1) % n_v]
            edges.append(
                f"(CASE WHEN (({y1!r} > lat) <> ({y2!r} > lat)) AND "
                f"((((lon - {x1!r}) * ({y2!r} - {y1!r}) "
                f"- (lat - {y1!r}) * ({x2!r} - {x1!r})) < 0) "
                f"= ({y2!r} > {y1!r})) THEN 1 ELSE 0 END)")
        total = "\n       + ".join(edges)
        parts.append(
            f"SELECT {sql_quote(qid)} AS query_id, {id_col} FROM pts\n"
            f"  WHERE ({total}) % 2 = 1")
    un = "\n  UNION ALL\n".join(parts)
    return f"""
WITH pts AS (
  SELECT {id_col}, {lat_expr} AS lat, {lon_expr} AS lon FROM {table}
)
SELECT query_id, {id_col} FROM (
  {un}
)
ORDER BY query_id, {id_col}"""


def geotile_grid_sql(zoom: int, size: int, lat_expr: str, lon_expr: str,
                     table: str = "events") -> str:
    """geotile_grid oracle: the OSM slippy-tile formulas in the
    ENGINE'S exact op order (pipelines/geo.geotile_grid) — (lon+180)
    /360*2^z and (1 - ln(tan(r) + 1/cos(r))/pi)/2*2^z through the same
    libm, clamped to [0, 2^z-1], mercator-bound filter, (doc_count
    desc, tile asc) top ``size``."""
    z = int(zoom)
    f = float(1 << z)
    return f"""
WITH pts AS (
  SELECT {lat_expr} AS lat, {lon_expr} AS lon FROM {table}
),
tiles AS (
  SELECT {z} || '/' ||
         CAST(LEAST(GREATEST(floor((lon + 180.0) / 360.0 * {f!r}),
                             0.0), {f!r} - 1.0) AS BIGINT) || '/' ||
         CAST(LEAST(GREATEST(floor((1.0 - ln(tan(lat * 0.017453292519943295)
                             + 1.0 / cos(lat * 0.017453292519943295)) / pi())
                             / 2.0 * {f!r}), 0.0), {f!r} - 1.0)
              AS BIGINT) AS tile
  FROM pts WHERE abs(lat) <= 85.0511287798066
)
SELECT tile, count(*) AS doc_count FROM tiles
GROUP BY tile
ORDER BY doc_count DESC, tile ASC
LIMIT {int(size)}"""


def geohash_grid_sql(precision: int, size: int, lat_expr: str,
                     lon_expr: str, table: str = "events") -> str:
    """geohash_grid oracle: the engine's integer bit-interleave unrolled
    (pipelines/geo.geohash_grid — binary subdivision, longitude-first
    MSB interleave, base32 chars).  Integer math only, so exact."""
    p = int(precision)
    n_bits = 5 * p
    n_x = (n_bits + 1) // 2
    n_y = n_bits // 2
    fx, fy = float(1 << n_x), float(1 << n_y)
    bits = []
    for j in range(n_bits):
        if j % 2 == 0:
            src, sh = "xq", n_x - 1 - j // 2
        else:
            src, sh = "yq", n_y - 1 - (j - 1) // 2
        bits.append(f"(({src} >> {sh}) & 1) * {1 << (n_bits - 1 - j)}")
    code = "\n         + ".join(bits)
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = " || ".join(
        f"substr('{alphabet}', CAST(((code >> {5 * (p - 1 - g)}) & 31) "
        f"AS INTEGER) + 1, 1)" for g in range(p))
    return f"""
WITH pts AS (
  SELECT {lat_expr} AS lat, {lon_expr} AS lon FROM {table}
),
q AS (
  SELECT CAST(LEAST(GREATEST(floor((lon + 180.0) / 360.0 * {fx!r}),
                             0.0), {fx!r} - 1.0) AS BIGINT) AS xq,
         CAST(LEAST(GREATEST(floor((lat + 90.0) / 180.0 * {fy!r}),
                             0.0), {fy!r} - 1.0) AS BIGINT) AS yq
  FROM pts
),
codes AS (
  SELECT ({code}) AS code FROM q
),
hashes AS (
  SELECT {chars} AS geohash FROM codes
)
SELECT geohash, count(*) AS doc_count FROM hashes
GROUP BY geohash
ORDER BY doc_count DESC, geohash ASC
LIMIT {int(size)}"""


def geo_centroid_sql(lat_expr: str, lon_expr: str,
                     table: str = "events", decimals: int = 2) -> str:
    """geo_centroid oracle: the engine's scaled-int64 exact summation
    (pipelines/geo.geo_centroid — integer adds are associative, so no
    ordered aggregate is needed) with ONE final division, round(6)."""
    scale = float(10 ** int(decimals))
    return f"""
WITH pts AS (
  SELECT {lat_expr} AS lat, {lon_expr} AS lon FROM {table}
)
SELECT round(CAST(SUM(CAST(round(lat * {scale!r}) AS BIGINT)) AS DOUBLE)
             / ({scale!r} * count(*)), 6) AS lat,
       round(CAST(SUM(CAST(round(lon * {scale!r}) AS BIGINT)) AS DOUBLE)
             / ({scale!r} * count(*)), 6) AS lon,
       count(*) AS "count"
FROM pts"""
