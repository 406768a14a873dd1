"""Materialize the rich (Zipf-Markov text + clustered-embedding) fixture.

Writes documents.parquet and embeddings.parquet as SINGLE FILES (the
/root/testdata layout, so selfcheck's DuckDB view registration and
load_table both work unchanged) under the output dir.

Usage: python tools/make_rich_fixture.py [out_dir] [n_docs] [n_vecs] [seed]
                                          [replica_pct]
Defaults: /tmp/rich_fixture/sf0.01  500 docs  500 vecs  seed 12  0% replicas
(sf0.1-equivalent: n_docs=5000 n_vecs=5000; replica_pct > 0 adds
near-dup replicas for dedup ground truth.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rich_fixture/sf0.01"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    replica_pct = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    import pyarrow.parquet as pq

    from presto_truffle_spark.session import get_spark
    from presto_truffle_spark.sources.rich_fixture import (
        clustered_embeddings,
        zipf_documents,
    )

    spark = get_spark("rich-fixture", cpus="8")
    os.makedirs(out, exist_ok=True)
    docs = zipf_documents(spark, n_docs, seed, replica_pct).toArrow()
    emb = clustered_embeddings(spark, n_vecs, seed).toArrow()
    pq.write_table(docs, os.path.join(out, "documents.parquet"))
    pq.write_table(emb, os.path.join(out, "embeddings.parquet"))
    print(
        f"wrote {docs.num_rows} docs, {emb.num_rows} vecs, seed {seed},"
        f" replica_pct {replica_pct} -> {out}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
