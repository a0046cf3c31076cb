#!/usr/bin/env python3
"""10x scale probe for the dedup/text family: replicate the sf0.1
documents corpus 10-fold with copy-disjoint vocabularies (every token
prefixed with its copy index — identical WITHIN-copy duplicate
structure, zero cross-copy gram overlap), then time each query at 1x vs
10x. Sub-linear-to-linear ratios mean no hidden quadratic stage or
shuffle cliff; anything well above 10x is a scale bug.

Measured on local[32] (2026-08-13, round 3):

    dedup_exact            1x= 0.52s  10x= 1.08s  ratio= 2.1
    dedup_ngram_jaccard    1x= 4.19s  10x= 7.25s  ratio= 1.7
    dedup_minhash_lsh      1x= 1.99s  10x= 7.10s  ratio= 3.6
    dedup_simhash          1x= 3.71s  10x= 3.99s  ratio= 1.1
    dedup_span_census      1x= 1.18s  10x= 2.82s  ratio= 2.4
    dedup_span_flags       1x= 1.52s  10x= 3.27s  ratio= 2.2
    text_quality_stats     1x= 0.54s  10x= 3.92s  ratio= 7.2
    corpus_shuffle_shards  1x= 0.23s  10x= 0.29s  ratio= 1.3

Embeddings family (10x corpus built from per-copy sign masks —
within-copy cosines preserved exactly):

    lsh_topk (multi-probe)   1x= 1.15s  10x=   1.59s  ratio=  1.4
    cosine_neardup (mp=1)    1x= 3.41s  10x= 253.06s  ratio= 74.1
      -> NOT an engine cliff: the OUTPUT grew 106x (882 -> 93,436
         pairs). At dim=64 random-pair cosine sigma ~ 0.125, so the
         0.4 threshold is ~3.2 sigma and the O(N^2) random tail
         dominates as the corpus grows — runtime per output pair is
         sub-linear. See the threshold-vs-dimension caveat on
         cosine_neardup_pairs.

Usage: python scripts/scale_probe.py [copies]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1/documents.parquet"
BASE = "/tmp/scale_probe"
QUERIES = [
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_span_census", "dedup_span_flags",
    "text_quality_stats", "corpus_shuffle_shards",
]


def build(copies: int) -> tuple[str, str]:
    import duckdb

    one, many = f"{BASE}/x1", f"{BASE}/x{copies}"
    os.makedirs(one, exist_ok=True)
    os.makedirs(many, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}')) "
                f"TO '{one}/documents.parquet' (FORMAT parquet)")
    con.execute(f"""
    COPY (
      SELECT doc_id + k * 10000000 AS doc_id,
             array_to_string(list_transform(string_split(text, ' '),
                                            w -> 'k' || k || w), ' ')
               AS text,
             lang, source,
             length(array_to_string(list_transform(string_split(text, ' '),
                                    w -> 'k' || k || w), ' ')) AS n_chars
      FROM read_parquet('{SRC}'),
           (SELECT unnest(range({copies})) AS k)
    ) TO '{many}/documents.parquet' (FORMAT parquet)
    """)
    return one, many


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    one, many = build(copies)

    from g1_etl_spark.plans import REGISTRY
    from g1_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        for r in spark.sparkContext._jsc.getPersistentRDDs().values():
            r.unpersist()
        return dt

    for q in QUERIES:
        run(q, one)  # absorb plan/codegen warmup
        t1, tn = run(q, one), run(q, many)
        print(f"{q:24s} 1x={t1:6.2f}s  {copies}x={tn:7.2f}s  "
              f"ratio={tn / t1:5.1f}")


if __name__ == "__main__":
    main()
