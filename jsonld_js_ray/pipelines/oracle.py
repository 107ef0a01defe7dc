"""DuckDB oracle SQL mirrors of the Ray pipelines.

The flagship transcript→triples mapping is deterministic and relational,
so the oracle can rebuild the exact quad table in SQL: same subjects
(conv/turn IRIs), predicates (conv# vocabulary), literal lexical forms
(xsd:integer via CAST, xsd:dateTime via strftime '%Y-%m-%dT%H:%M:%S.%f'),
and column names as the engine's Arrow output. The driver hashes sorted
columns, so names and value forms must match exactly.
"""

from __future__ import annotations

from ..sources.transcripts import TRANSCRIPTS_SQL
from ..stages.assemble import CONV_ID_NS, CONV_VOCAB, ROLE_NS

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

_BASE_CTES = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL}),
t AS (
  SELECT *,
         '{CONV_ID_NS}' || conv_id AS c_iri,
         '{CONV_ID_NS}' || conv_id || '/t/' || CAST(turn_idx AS VARCHAR)
             AS t_iri
  FROM transcripts
),
conv AS (
  SELECT conv_id, '{CONV_ID_NS}' || conv_id AS c_iri,
         count(*) AS n_turns
  FROM transcripts GROUP BY conv_id
)
"""

TRANSCRIPTS_ORACLE_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL})
SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts
"""

KG_QUADS_ORACLE_SQL = _BASE_CTES + f"""
SELECT subj, pred, obj_kind, obj_value, obj_datatype, obj_lang, graph,
       conv_id
FROM (
  SELECT c_iri AS subj, '{RDF_TYPE}' AS pred, 'iri' AS obj_kind,
         '{CONV_VOCAB}Conversation' AS obj_value,
         CAST(NULL AS VARCHAR) AS obj_datatype,
         CAST(NULL AS VARCHAR) AS obj_lang,
         '@default' AS graph, conv_id
  FROM conv
  UNION ALL
  SELECT c_iri, '{CONV_VOCAB}turnCount', 'literal',
         CAST(n_turns AS VARCHAR), '{XSD}integer', NULL, '@default', conv_id
  FROM conv
  UNION ALL
  SELECT c_iri, '{CONV_VOCAB}hasTurn', 'iri', t_iri, NULL, NULL,
         '@default', conv_id
  FROM t
  UNION ALL
  SELECT t_iri, '{RDF_TYPE}', 'iri', '{CONV_VOCAB}Message', NULL, NULL,
         '@default', conv_id
  FROM t
  UNION ALL
  SELECT t_iri, '{CONV_VOCAB}position', 'literal',
         CAST(turn_idx AS VARCHAR), '{XSD}integer', NULL, '@default',
         conv_id
  FROM t
  UNION ALL
  SELECT t_iri, '{CONV_VOCAB}role', 'iri', '{ROLE_NS}' || role, NULL, NULL,
         '@default', conv_id
  FROM t
  UNION ALL
  SELECT t_iri, '{CONV_VOCAB}text', 'literal', text, '{XSD}string', NULL,
         '@default', conv_id
  FROM t WHERE text IS NOT NULL
  UNION ALL
  SELECT t_iri, '{CONV_VOCAB}tool', 'literal', tool, '{XSD}string', NULL,
         '@default', conv_id
  FROM t WHERE tool IS NOT NULL
  UNION ALL
  SELECT t_iri, '{CONV_VOCAB}ts', 'literal',
         strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), '{XSD}dateTime', NULL,
         '@default', conv_id
  FROM t WHERE ts IS NOT NULL
  UNION ALL
  SELECT t_iri, '{CONV_VOCAB}partOf', 'iri', c_iri, NULL, NULL,
         '@default', conv_id
  FROM t
)
"""

MENTION_QUADS_ORACLE_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL}),
m AS (
  SELECT conv_id, turn_idx,
         lower(unnest(regexp_extract_all(text, '[A-Za-z]{{3,}}')))
             AS surface
  FROM transcripts
)
SELECT DISTINCT
       '{CONV_ID_NS}' || conv_id || '/t/' || CAST(turn_idx AS VARCHAR)
           AS subj,
       '{CONV_VOCAB}mentions' AS pred,
       'iri' AS obj_kind,
       'https://w3id.org/conv/entity/' || surface AS obj_value,
       CAST(NULL AS VARCHAR) AS obj_datatype,
       CAST(NULL AS VARCHAR) AS obj_lang,
       '@default' AS graph,
       conv_id
FROM m
"""

ENTITIES_ORACLE_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL}),
m AS (
  SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z]{{3,}}')))
             AS surface
  FROM transcripts
)
SELECT surface, CAST(count(*) AS BIGINT) AS n_mentions
FROM m GROUP BY surface
"""

TRIPLE_STATS_ORACLE_SQL = f"""
SELECT pred, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT subj) AS BIGINT) AS n_subj
FROM ({KG_QUADS_ORACLE_SQL}) GROUP BY pred
"""



KG_QUADS_WITH_MENTIONS_ORACLE_SQL = (
    "SELECT * FROM (" + KG_QUADS_ORACLE_SQL + ") "
    "UNION ALL SELECT * FROM (" + MENTION_QUADS_ORACLE_SQL + ")"
)


# 2-hop BGP join: ?conv :hasTurn ?turn . ?turn :mentions ?entity
CONV_ENTITY_MENTIONS_ORACLE_SQL = f"""
WITH q AS ({KG_QUADS_WITH_MENTIONS_ORACLE_SQL}),
h AS (SELECT subj AS conv, obj_value AS turn FROM q
      WHERE pred = '{CONV_VOCAB}hasTurn'),
m AS (SELECT subj AS turn, obj_value AS entity FROM q
      WHERE pred = '{CONV_VOCAB}mentions')
SELECT h.conv, m.entity, CAST(count(*) AS BIGINT) AS n_mentions
FROM h JOIN m ON h.turn = m.turn
GROUP BY h.conv, m.entity
"""
