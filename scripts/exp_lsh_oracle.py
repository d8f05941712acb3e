"""Feasibility probe: can the LSH entries get GENUINE DuckDB oracles?

An LSH query can share its exact counterpart's oracle iff its recall
on the (deterministic, seeded) sf0.01 data is exactly 1.0 and the
verified values hash-match. This script compares, at sf0.01:

  minhash_pairs      vs exact all-pairs 3-shingle Jaccard >= 0.8
  lsh_topk           vs knn_bruteforce (exact top-5)
  cosine_neardup_lsh vs cosine_neardup (exact all-pairs >= 0.99)

Run: python scripts/exp_lsh_oracle.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

ALLPAIRS_J = r"""
WITH docs AS (
  SELECT * FROM read_parquet('{sf}/documents.parquet')
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
  FROM read_parquet('{sf}/documents.parquet') WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM docs WHERE text IS NOT NULL),
g AS (SELECT doc_id,
             list_distinct(list_transform(range(1, len(ws) - 1),
                                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
      FROM w WHERE len(ws) >= 3),
j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(len(list_intersect(a.sh, b.sh)) * 1.0
                   / nullif(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 0), 6) AS jaccard
      FROM g a JOIN g b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY id_a, id_b
"""

KNN = """
SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine,
       CAST(row_number() OVER (PARTITION BY q.vec_id
            ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
                     c.vec_id) AS INT) AS rank
FROM read_parquet('{sf}/embeddings.parquet') q
JOIN read_parquet('{sf}/embeddings.parquet') c ON q.vec_id <> c.vec_id
WHERE q.vec_id < 5
QUALIFY rank <= 5 ORDER BY query_id, rank
"""

NEARDUP = """
WITH aug AS (
  SELECT * FROM read_parquet('{sf}/embeddings.parquet')
  UNION ALL
  SELECT vec_id + 10000 AS vec_id, embedding, label
  FROM read_parquet('{sf}/embeddings.parquet') WHERE vec_id % 25 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM aug a JOIN aug b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.99
ORDER BY id_a, id_b
"""


def cmp(name, spark_rows, oracle_rows):
    s, o = set(map(tuple, spark_rows)), set(map(tuple, oracle_rows))
    print(f"{name}: spark={len(s)} oracle={len(o)} match={s == o}")
    if s != o:
        print("  only-spark:", sorted(s - o)[:10])
        print("  only-oracle:", sorted(o - s)[:10])
    return s == o


def main():
    from data_check_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("exp-lsh", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    Q = E.queries()
    res = {}

    mh = [(r.id_a, r.id_b, float(r.jaccard)) for r in Q["minhash_pairs"](spark, SF).collect()]
    omh = [(a, b, float(j)) for a, b, j in duckdb.sql(ALLPAIRS_J.format(sf=SF)).fetchall()]
    res["minhash_pairs"] = cmp("minhash_pairs(b=8,r=4)", mh, omh)

    lt = [(r.query_id, r.neighbor_id, float(r.cosine), r.rank) for r in Q["lsh_topk"](spark, SF).collect()]
    olt = [(q, n, float(c), k) for q, n, c, k in duckdb.sql(KNN.format(sf=SF)).fetchall()]
    res["lsh_topk"] = cmp("lsh_topk(p=16,b=4)", lt, olt)

    if not res["lsh_topk"]:
        from data_check_spark.operators.similarity import lsh_topk
        from pyspark.sql import functions as F
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = e.filter(F.col("vec_id") < 5)
        lt8 = [(r.query_id, r.neighbor_id, float(r.cosine), r.rank)
               for r in lsh_topk(e, q, dim=64, k=5, n_planes=16, bands=8).collect()]
        res["lsh_topk_b8"] = cmp("lsh_topk(p=16,b=8)", lt8, olt)

    cn = [(r.id_a, r.id_b, float(r.cosine)) for r in Q["cosine_neardup_lsh"](spark, SF).collect()]
    ocn = [(a, b, float(c)) for a, b, c in duckdb.sql(NEARDUP.format(sf=SF)).fetchall()]
    res["cosine_neardup_lsh"] = cmp("cosine_neardup_lsh(p=16,b=4)", cn, ocn)

    print("RESULT", res)
    spark.stop()


if __name__ == "__main__":
    main()
