#!/usr/bin/env python3
"""Prototype the LLM-pipeline DuckDB oracle SQLs at sf0.001 (dev aid)."""
import duckdb, sys

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
con = duckdb.connect()
for t in ['documents', 'embeddings', 'events']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

SQLS = {}

# --- text analysis -----------------------------------------------------------
SQLS['text_tokens'] = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_alnum_tokens,
       ROUND(length(text) * 1.0 / len(regexp_extract_all(text, '[A-Za-z0-9]+')), 4) AS chars_per_token
FROM documents
"""

STOP = {
  'en': ('the','and','of','to','a','in','is','it'),
  'de': ('der','die','und','das','ist','nicht','mit','ein'),
  'es': ('el','la','de','los','que','y','en','un'),
  'fr': ('le','la','les','et','des','que','une','dans'),
}
def hits(lang):
    lst = ','.join(f"'{w}'" for w in STOP[lang])
    return f"len(list_filter(string_split(lower(text), ' '), w -> w IN ({lst})))"

SQLS['text_langid'] = f"""
WITH h AS (
  SELECT doc_id,
         {hits('de')} AS h_de, {hits('en')} AS h_en,
         {hits('es')} AS h_es, {hits('fr')} AS h_fr
  FROM documents)
SELECT doc_id, h_de, h_en, h_es, h_fr,
       CASE WHEN h_de >= GREATEST(h_en, h_es, h_fr) THEN 'de'
            WHEN h_en >= GREATEST(h_es, h_fr) THEN 'en'
            WHEN h_es >= h_fr THEN 'es'
            ELSE 'fr' END AS lang_guess
FROM h
"""

SQLS['text_quality'] = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       ROUND(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 1.0 / length(text), 4) AS punct_ratio,
       ROUND({hits('en')} * 1.0 / len(string_split(lower(text), ' ')), 4) AS stopword_ratio,
       ROUND(length(text) * 1.0 / len(string_split(text, ' ')), 4) AS avg_word_len,
       ROUND(LEAST(1.0, len(string_split(text, ' ')) / 100.0)
             * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) * 1.0 / length(text))
             * LEAST(1.0, 4.0 * {hits('en')} / len(string_split(lower(text), ' ')) + 0.5), 4) AS quality
FROM documents
"""

SQLS['text_fingerprint'] = """
SELECT doc_id,
       (SELECT MIN(md5(substr(text, i, 12))) FROM UNNEST(range(1, length(text) - 10)) AS t(i)) AS fingerprint
FROM documents
"""

# --- dedup -------------------------------------------------------------------
SQLS['dedup_exact'] = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
FROM documents GROUP BY 1
"""

SHINGLES = """
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       UNNEST(range(1, len(ws) - 1)) AS t(i)
"""

SQLS['dedup_ngram_jaccard'] = f"""
WITH sh AS ({SHINGLES}),
p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1)
SELECT p.a, p.b, ROUND(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
FROM p JOIN sz sa ON p.a = sa.doc_id JOIN sz sb ON p.b = sb.doc_id
WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
"""

# minhash: 8 lexicographic-min md5 "permutations", bands of 2 -> 4 band keys
MINHASH = f"""
  SELECT doc_id,
         {', '.join(f"MIN(md5('{k}:' || s)) AS mh{k}" for k in range(8))}
  FROM ({SHINGLES}) GROUP BY doc_id
"""
SQLS['dedup_minhash_lsh'] = f"""
WITH mh AS ({MINHASH}),
bands AS (
  SELECT doc_id, b, key FROM mh, LATERAL (VALUES
    (0, mh0 || mh1), (1, mh2 || mh3), (2, mh4 || mh5), (3, mh6 || mh7)) AS v(b, key)),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT cand.a, cand.b,
       ROUND(((x.mh0 = y.mh0)::INT + (x.mh1 = y.mh1)::INT + (x.mh2 = y.mh2)::INT
            + (x.mh3 = y.mh3)::INT + (x.mh4 = y.mh4)::INT + (x.mh5 = y.mh5)::INT
            + (x.mh6 = y.mh6)::INT + (x.mh7 = y.mh7)::INT) / 8.0, 4) AS est_jaccard
FROM cand JOIN mh x ON cand.a = x.doc_id JOIN mh y ON cand.b = y.doc_id
"""

# simhash: 32-bit from word-md5 hex digits (digit value d at hexpos p -> 4 bits)
SQLS['dedup_simhash'] = """
WITH words AS (
  SELECT DISTINCT doc_id, w, md5(w) AS h
  FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM documents)),
bits AS (
  SELECT doc_id, i,
         SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, 1 + i // 4, 1)) - 1) // POWER(2, i % 4)::INT) % 2 = 1
                  THEN 1 ELSE -1 END) AS bal
  FROM words, UNNEST(range(32)) AS t(i)
  GROUP BY 1, 2),
sh AS (
  SELECT doc_id, string_agg(CASE WHEN bal > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS simhash
  FROM bits GROUP BY doc_id)
SELECT a.doc_id AS a, b.doc_id AS b,
       length(replace(
         (SELECT string_agg(CASE WHEN substr(a.simhash, j, 1) = substr(b.simhash, j, 1) THEN '0' ELSE '1' END, '')
          FROM UNNEST(range(1, 33)) AS u(j)), '0', '')) AS hamming
FROM sh a JOIN sh b ON substr(a.simhash, 1, 16) = substr(b.simhash, 1, 16) AND a.doc_id < b.doc_id
WHERE length(replace(
         (SELECT string_agg(CASE WHEN substr(a.simhash, j, 1) = substr(b.simhash, j, 1) THEN '0' ELSE '1' END, '')
          FROM UNNEST(range(1, 33)) AS u(j)), '0', '')) <= 6
"""

# --- embeddings --------------------------------------------------------------
COS = """
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         ROUND(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(d.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(d.embedding AS DOUBLE[]), CAST(d.embedding AS DOUBLE[])))), 4) AS sim
  FROM embeddings q JOIN embeddings d ON q.vec_id < 5 AND d.vec_id != q.vec_id
"""
SQLS['embed_knn'] = f"""
WITH c AS ({COS}),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM c)
SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
"""

for name, sql in SQLS.items():
    try:
        df = con.execute(sql).df()
        print(f"OK   {name}: {len(df)} rows; cols={list(df.columns)}")
        print(df.head(3).to_string())
    except Exception as e:
        print(f"FAIL {name}: {e}")
