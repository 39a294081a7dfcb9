"""Shared DuckDB-oracle SQL fragments — a LEAF module (no intra-package
imports) so any queries_r* module can be imported as the root without
tripping the registry's bottom-of-queries.py import cycle (r9 lesson:
queries_r9 needs r8's BM25 build CTEs at decoration time, but when
queries_r8 itself is the root import its constants don't exist yet when
queries.py's bottom reaches queries_r9).

Contents: the canonical text normalization (the tokenizer contract every
text gate shares with operators/textops.normalize_text_expr), the fixed
BM25 query workload, and the BM25 index-build CTE template
(tf/dl/corpus-stats/df/score CTEs mirroring operators/retrieval token
for token — literals 2.2/1.2/0.25/0.75 are the exact doubles of k1+1,
k1, 1−b, b at k1=1.2, b=0.75).
"""

from __future__ import annotations

_NORM_SQL = "trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'))"

#: fixed query workload for the BM25-family gates: three queries mixing
#: the one rare discriminative term in the synthetic vocabulary ("dup",
#: df≈5%) with common terms, so idf spread is actually exercised
_BM25_QUERIES = [
    (0, "dup"), (0, "merge"), (0, "batch"),
    (1, "spark"), (1, "window"), (1, "join"),
    (2, "vector"), (2, "stream"), (2, "key"),
]

def _bm25_score_ctes(qname: str = "q", suffix: str = "") -> str:
    """The df/contribution/score CTE triple of the BM25 scorer over an
    arbitrary (query_id, term, self_excl) CTE ``qname`` — reusable for
    multi-pass oracles (pseudo-relevance feedback re-scores with the
    expanded query set as ``qname='q2', suffix='2'``). Assumes tf/dl/
    stats CTEs are already in scope (from :func:`_bm25_build_cte`)."""
    return f"""
    dfreq{suffix} AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
              WHERE term IN (SELECT DISTINCT term FROM {qname})
              GROUP BY term),
    contrib{suffix} AS (
      SELECT {qname}.query_id, tf.doc_id,
             CAST(FLOOR(
               LN((CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
                  / (CAST(d.df AS DOUBLE) + 0.5) + 1.0)
               * ((CAST(tf.tf AS DOUBLE) * 2.2)
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                         / (CAST(s.total_tokens AS DOUBLE)
                            / CAST(s.n_docs AS DOUBLE))))))
               * 1000000.0 + 0.5) AS BIGINT) AS units
      FROM tf
      JOIN {qname} ON tf.term = {qname}.term
                  AND tf.doc_id != {qname}.self_excl
      JOIN dfreq{suffix} d ON d.term = tf.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    ),
    scores{suffix} AS (
      SELECT query_id, doc_id, CAST(SUM(units) AS BIGINT) AS score_units
      FROM contrib{suffix} GROUP BY query_id, doc_id
    )"""


_BM25_BUILD_TEMPLATE = f"""
    toks AS (
      SELECT doc_id, UNNEST(regexp_split_to_array({_NORM_SQL}, ' ')) AS term
      FROM documents WHERE {{doc_where}}
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
    {_bm25_score_ctes()}
"""


def _bm25_build_cte(doc_where: str = "TRUE") -> str:
    """BM25 build CTEs over ``documents WHERE doc_where`` — corpus stats
    (tf/dl/df/N/avgdl) come from the FILTERED corpus, mirroring a Spark
    side that passes the filtered DataFrame to bm25_topk."""
    return _BM25_BUILD_TEMPLATE.format(doc_where=doc_where)
