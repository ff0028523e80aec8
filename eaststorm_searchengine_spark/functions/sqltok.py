"""SQL-expressible tokenizer + BM25, kept textually parallel between
Spark (Column expressions) and DuckDB (oracle SQL strings).

For *plain text* input (no HTML tags), the reference pipeline
``jobs/Indexer.java:83-141`` reduces to: lowercase → strip
``https?://\\S+`` URLs → non-[a-z0-9] runs → space → trim → split →
keep ``[a-z]+`` tokens of length ≤ 30.  (Steps 1–3 — script/style
removal, block extraction, tag strip — are no-ops on tag-free text, and
the ``\\s+`` collapse is subsumed by the non-alnum collapse.)  That
restriction is exactly SQL-expressible, which is what makes the driver's
DuckDB correctness gate able to check the whole index/BM25 pipeline
end-to-end on the ``documents`` table.

Java ``\\S`` is ASCII-only, so the URL pattern spells the class out:
``[^ \\t\\n\\x0B\\f\\r]`` — supported by both Java regex (Spark) and
RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

URL_CLASS = r"https?://[^ \t\n\x0B\f\r]+"
NON_ALNUM = "[^a-z0-9]+"
TOKEN_OK = "^[a-z]+$"

# BM25 constants per BASELINE.json north_star
K1 = 1.2
B = 0.75


def tokens_col(text: Column | str) -> Column:
    """Spark: plain text → array<string> of reference tokens.  NULL
    text tokenizes as empty (the engine's textproc.tokenize(None) → []
    semantics)."""
    c = F.col(text) if isinstance(text, str) else text
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), URL_CLASS, " "),
            NON_ALNUM,
            " ",
        )
    )
    arr = F.split(cleaned, " ")
    return F.filter(arr, lambda t: t.rlike(TOKEN_OK) & (F.length(t) <= 30))


def tokens_py(text: str | None) -> list[str]:
    """Pure-Python mirror of :func:`tokens_col` /
    :func:`duckdb_tokens_sql` — used by the query analyzer so that a
    punctuated query ('hash-join', "spark's") tokenizes exactly like
    indexed text and like the oracle's query tokenizer."""
    import re

    s = (text or "").lower()
    s = re.sub(r"https?://[^ \t\n\x0B\f\r]+", " ", s)
    s = re.sub(r"[^a-z0-9]+", " ", s)
    return [t for t in s.split(" ") if t and re.fullmatch(r"[a-z]+", t) and len(t) <= 30]


def duckdb_tokens_sql(expr: str) -> str:
    """DuckDB: the same tokenizer as a SQL expression string."""
    return (
        "list_filter(string_split(trim(regexp_replace(regexp_replace("
        f"lower(coalesce({expr}, '')), 'https?://[^ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), "
        "'[^a-z0-9]+', ' ', 'g')), ' '), "
        "t -> regexp_matches(t, '^[a-z]+$') AND length(t) <= 30)"
    )


def idf_col(df_: Column, n_docs: Column) -> Column:
    """Lucene-style non-negative BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return F.log(F.lit(1.0) + (n_docs - df_ + F.lit(0.5)) / (df_ + F.lit(0.5)))


def duckdb_idf_sql(df_expr: str, n_expr: str) -> str:
    return f"ln(1.0 + ({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))"


def tf_norm_col(tf: Column, dl: Column, avgdl: Column) -> Column:
    """BM25 tf saturation: tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))."""
    return (tf * F.lit(K1 + 1.0)) / (
        tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / avgdl)
    )


def duckdb_tf_norm_sql(tf_expr: str, dl_expr: str, avgdl_expr: str) -> str:
    return (
        f"({tf_expr} * {K1 + 1.0}) / "
        f"({tf_expr} + {K1} * ({1.0 - B} + {B} * {dl_expr} / {avgdl_expr}))"
    )


def duckdb_bm25_topk_sql(
    queries: list[tuple[int, str]],
    k: int,
    corpus: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    score_round: int = 4,
) -> str:
    """Full BM25 top-k oracle as one DuckDB query.

    Output columns: query_id, rank, doc_id, score (rounded).  Tie-break
    score desc, doc_id asc — identical to the engine (FIXTURES.md §3).
    """
    qvals = ", ".join(f"({qid}, '{q}')" for qid, q in queries)
    toks = duckdb_tokens_sql(text_col)
    qtoks = duckdb_tokens_sql("query")
    return f"""
WITH corpus_tok AS (
  SELECT {id_col} AS doc_id, {toks} AS tokens FROM {corpus}
),
doclen AS (
  SELECT doc_id, len(tokens) AS dl FROM corpus_tok
),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen
),
tf AS (
  SELECT doc_id, unnest(tokens) AS term FROM corpus_tok
),
tfc AS (
  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term
),
dfc AS (
  SELECT term, count(*) AS df FROM tfc GROUP BY term
),
qry(query_id, query) AS (VALUES {qvals}),
qterm AS (
  SELECT DISTINCT query_id, unnest({qtoks}) AS term FROM qry
),
scored AS (
  SELECT qt.query_id, t.doc_id,
         sum({duckdb_idf_sql('d.df', '(SELECT n_docs FROM stats)')}
             * {duckdb_tf_norm_sql('t.tf', 'l.dl', '(SELECT avgdl FROM stats)')}) AS score
  FROM qterm qt
  JOIN dfc d ON d.term = qt.term
  JOIN tfc t ON t.term = qt.term
  JOIN doclen l ON l.doc_id = t.doc_id
  GROUP BY qt.query_id, t.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, round(score, {score_round}) AS score
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def duckdb_phrase_topk_sql(
    phrases: list[tuple[int, str]],
    k: int,
    corpus: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    score_round: int = 4,
) -> str:
    """Phrase-search oracle: docs where the phrase tokens occur at
    consecutive positions, BM25-ranked over the phrase's distinct
    terms.  Positions come from DuckDB's lockstep unnest."""
    import re as _re

    toks = duckdb_tokens_sql(text_col)
    parts = []
    for qid, phrase in phrases:
        terms = [
            t
            for t in _re.split(r"[ \t\n\x0b\f\r]+", phrase.lower())
            if _re.fullmatch(r"[a-z]+", t) and len(t) <= 30
        ]
        if not terms:
            continue
        joins = ["FROM pos t0"]
        conds = [f"t0.term = '{terms[0]}'"]
        for i, t in enumerate(terms[1:], 1):
            joins.append(
                f"JOIN pos t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.p = t0.p + {i}"
            )
            conds.append(f"t{i}.term = '{t}'")
        match_sql = (
            "SELECT DISTINCT t0.doc_id "
            + " ".join(joins)
            + " WHERE "
            + " AND ".join(conds)
        )
        terms_in = ", ".join(f"'{t}'" for t in sorted(set(terms)))
        parts.append(
            f"""
            SELECT {qid} AS query_id, m.doc_id,
                   sum({duckdb_idf_sql('d.df', '(SELECT n_docs FROM stats)')}
                       * {duckdb_tf_norm_sql('t.tf', 'l.dl', '(SELECT avgdl FROM stats)')}) AS score
            FROM ({match_sql}) m
            JOIN tfc t ON t.doc_id = m.doc_id AND t.term IN ({terms_in})
            JOIN dfc d ON d.term = t.term
            JOIN doclen l ON l.doc_id = m.doc_id
            GROUP BY m.doc_id
            """
        )
    union = " UNION ALL ".join(parts)
    return f"""
WITH corpus_tok AS (
  SELECT {id_col} AS doc_id, {toks} AS tokens FROM {corpus}
),
doclen AS (SELECT doc_id, len(tokens) AS dl FROM corpus_tok),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
pos AS (
  SELECT doc_id, unnest(tokens) AS term,
         unnest(range(1, len(tokens)+1)) AS p
  FROM corpus_tok
),
tfc AS (
  SELECT doc_id, term, count(*) AS tf FROM
  (SELECT doc_id, unnest(tokens) AS term FROM corpus_tok) GROUP BY doc_id, term
),
dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
scored AS ({union}),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored)
SELECT query_id, rank, doc_id, round(score, {score_round}) AS score
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""
