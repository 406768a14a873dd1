"""Hybrid-retrieval (RRF) input-list characterization on the fixture.

What `search_hybrid_rrf` fuses, measured (deterministic — DuckDB over
the same parquet tables, the oracle formulas):

  * top-20 overlap between the BM25 lexical list and the cosine
    semantic list — on this fixture the embeddings are a separate
    synthetic modality, NOT text encodings (see bm25_study.py), so the
    expected overlap is the hypergeometric baseline of two independent
    20-of-N draws, and measuring it verifies the fusion is exercising
    the disjoint-lists code path (rank 0 on one side), not the
    easy both-lists path;
  * the RRF interleaving pattern: with disjoint lists and equal
    damping, lex_r and sem_r carry the SAME fused score 1/(60+r), so
    the fused order is rank-PAIRS — positions (2k, 2k+1) hold the two
    rank-(k+1) docs — with doc_id ordering WITHIN each pair (not strict
    L/S alternation; whichever member has the smaller doc_id leads its
    pair). The study verifies the pair property exactly.

Usage: python tools/hybrid_study.py [sf_dir]   — prints one JSON line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    import __spark_entry__ as entry
    from presto_truffle_spark.operators.text import _FUSE_N

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    # the registered oracle IS the ground-truth spelling of both lists
    fused = con.execute(entry.oracle_sql()["search_hybrid_rrf"]).fetchall()
    # (doc_id, lex_rank, sem_rank, rrf)
    lex_docs = {r[0] for r in fused if r[1] > 0}
    sem_docs = {r[0] for r in fused if r[2] > 0}
    both = {r[0] for r in fused if r[1] > 0 and r[2] > 0}
    n_corpus = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    expected_overlap = _FUSE_N * _FUSE_N / n_corpus  # hypergeometric mean
    # interleaving check: disjoint lists must alternate lex/sem
    ordered = sorted(fused, key=lambda r: (-r[3], r[0]))
    pattern = "".join(
        ("B" if r[1] > 0 and r[2] > 0 else "L" if r[1] > 0 else "S")
        for r in ordered
    )
    # disjoint-lists pair property: positions (2k, 2k+1) are the two
    # rank-(k+1) docs (one from each list), smaller doc_id first
    pairs_ok = None
    if "B" not in pattern:
        pairs_ok = True
        for k in range(len(ordered) // 2):
            a, b = ordered[2 * k], ordered[2 * k + 1]
            ra = a[1] or a[2]
            rb = b[1] or b[2]
            if not (ra == rb == k + 1 and pattern[2 * k] != pattern[2 * k + 1]
                    and a[0] < b[0]):
                pairs_ok = False
    out = {
        "metric": "hybrid_rrf_study",
        "sf_dir": SF_DIR,
        "fused_topk": len(fused),
        "from_lex_only": len(lex_docs - both),
        "from_sem_only": len(sem_docs - both),
        "in_both_lists": len(both),
        "expected_overlap_if_independent": round(expected_overlap, 3),
        "fused_pattern": pattern,
        "rank_pairs_property": pairs_ok,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
