"""ANSI-SQL (DuckDB) oracle templates for the driver correctness gate.

Every SQL string here recomputes an engine operator from first
principles on the raw parquet views — independent of the Spark code
paths — so the driver's row-count / schema / value-hash comparison is
a genuine oracle, not a mirror.

Conventions (driver contract):
- column names identical to the Spark DataFrame's aliases;
- float columns rounded to 4 dp on BOTH sides (collapses engine FP
  noise; ordering keys use the rounded value + deterministic
  tie-breaks so LIMIT cutoffs agree).
"""

from __future__ import annotations

from .functions.scoring import B, K1

# Tokenizer CTE — semantics pinned to functions/tokenize.py (lower →
# split on [^a-z0-9]+ → drop empties → 0-based positions).
TOKENS_CTE = """
tokens AS (
  SELECT doc_id,
         unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS toks
        FROM documents)
)
""".strip()


def sql_term_stats() -> str:
    return f"""
WITH {TOKENS_CTE}
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
FROM tokens GROUP BY term
""".strip()


def sql_corpus_stats() -> str:
    return f"""
WITH {TOKENS_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id)
SELECT count(*) AS n_docs, sum(dl) AS total_tokens,
       round(avg(dl), 4) AS avgdl
FROM dl
""".strip()


def sql_doc_lengths() -> str:
    return f"""
WITH {TOKENS_CTE}
SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id
""".strip()


def sql_top_terms(k: int = 20) -> str:
    return f"""
WITH {TOKENS_CTE}
SELECT term, count(*) AS cf FROM tokens GROUP BY term
ORDER BY cf DESC, term ASC LIMIT {k}
""".strip()


def _sql_terms_list(terms: list[str]) -> str:
    inner = ", ".join(f"'{t}'" for t in terms)
    return f"({inner})"


def sql_postings(terms: list[str]) -> str:
    return f"""
WITH {TOKENS_CTE}
SELECT term, doc_id, count(*) AS tf,
       min(pos) AS first_pos, max(pos) AS last_pos
FROM tokens WHERE term IN {_sql_terms_list(terms)}
GROUP BY term, doc_id
""".strip()


def sql_bm25_topk(terms: list[str], k: int = 10,
                  k1: float = K1, b: float = B) -> str:
    tl = _sql_terms_list(terms)
    return f"""
WITH {TOKENS_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
cs AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tstats AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tokens
  WHERE term IN {tl} GROUP BY term),
hits AS (
  SELECT term, doc_id, count(*) AS tf FROM tokens
  WHERE term IN {tl} GROUP BY term, doc_id),
scored AS (
  SELECT h.doc_id,
         ln(1 + (cs.n_docs - s.df + 0.5) / (s.df + 0.5))
           * (h.tf * ({k1} + 1.0))
           / (h.tf + {k1} * (1.0 - {b} + {b} * d.dl / cs.avgdl)) AS contrib
  FROM hits h
  JOIN tstats s ON h.term = s.term
  JOIN dl d ON h.doc_id = d.doc_id
  CROSS JOIN cs)
SELECT doc_id, round(sum(contrib), 4) AS score
FROM scored GROUP BY doc_id
ORDER BY round(sum(contrib), 4) DESC, doc_id ASC LIMIT {k}
""".strip()
