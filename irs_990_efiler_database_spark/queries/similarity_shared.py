"""Shared IVF oracle SQL template for the similarity query family
(round-11: extracted so similarity_ops and similarity_pq both import
it with no circular module edge — either sub-family module is
directly importable in any order). Pure helper, no @register calls.
"""

from __future__ import annotations

_SQL_IVF = """
  cent AS (
    SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
  ),
  ascore AS (
    SELECT e.vec_id, c.cid,
           round(CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE)
                               * CAST(c.cv[i] AS DOUBLE)
                               AS DECIMAL(30,15))) AS DOUBLE)
             / (sqrt(CAST(SUM(CAST(CAST(e.embedding[i] AS DOUBLE)
                                   * CAST(e.embedding[i] AS DOUBLE)
                                   AS DECIMAL(30,15))) AS DOUBLE))
                * sqrt(CAST(SUM(CAST(CAST(c.cv[i] AS DOUBLE)
                                     * CAST(c.cv[i] AS DOUBLE)
                                     AS DECIMAL(30,15))) AS DOUBLE))), 6) AS cos
    FROM embeddings e
    CROSS JOIN cent c,
    unnest(generate_series(1, len(e.embedding))) AS t(i)
    GROUP BY e.vec_id, c.cid
  ),
  assign AS (
    SELECT vec_id, cid AS centroid_id FROM (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid) AS rn
      FROM ascore
    ) WHERE rn = 1
  ),
  probe AS (
    SELECT vec_id AS query_id, cid AS centroid_id FROM (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid) AS rn
      FROM ascore WHERE vec_id < 5
    ) WHERE rn <= 2
  ),
  cand AS (
    SELECT p.query_id, a.vec_id AS neighbor_id, a.centroid_id
    FROM probe p
    JOIN assign a ON a.centroid_id = p.centroid_id
                 AND a.vec_id <> p.query_id
  ),
  rdots AS (
    SELECT d.query_id, d.neighbor_id, d.centroid_id,
           SUM(CAST(CAST(q.embedding[i] AS DOUBLE)
                    * CAST(n.embedding[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS dot,
           SUM(CAST(CAST(q.embedding[i] AS DOUBLE)
                    * CAST(q.embedding[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS qq,
           SUM(CAST(CAST(n.embedding[i] AS DOUBLE)
                    * CAST(n.embedding[i] AS DOUBLE)
                    AS DECIMAL(30,15))) AS nn
    FROM cand d
    JOIN embeddings q ON q.vec_id = d.query_id
    JOIN embeddings n ON n.vec_id = d.neighbor_id,
    unnest(generate_series(1, len(q.embedding))) AS t(i)
    GROUP BY d.query_id, d.neighbor_id, d.centroid_id
  )
"""
