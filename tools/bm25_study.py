"""BM25 vs tf-idf vs raw-tf ranking characterization on the fixture.

What the registered ``text_bm25_search`` buys over simpler lexical
scorers, measured (deterministic — DuckDB over the fixture corpus, the
same formulas as the query oracles):

  * top-20 overlap between the three scorers for the fixture query;
  * Spearman rank correlation of each scorer's top-50 with document
    LENGTH — the failure mode BM25's b-normalization exists to fix:
    under raw tf (and partially under tf-idf) long documents win simply
    by containing more tokens.

NOTE the fixture's embeddings table is NOT text-aligned (vec_id is a
separate synthetic modality), so a lexical-vs-semantic comparison is not
meaningful here; this study stays within lexical scorers.

Usage: python tools/bm25_study.py [sf_dir]   — prints one JSON line.
"""

from __future__ import annotations

import json
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TERMS = ("stream", "table", "hash")  # text.py _PHRASE
K1, B = 1.2, 0.75
TOP = 20


def _spearman(xs: list[float], ys: list[float]) -> float:
    n = len(xs)
    if n < 2:
        return 0.0

    def ranks(v):
        order = sorted(range(n), key=lambda i: v[i])
        r = [0.0] * n
        for rank, i in enumerate(order):
            r[i] = rank
        return r

    rx, ry = ranks(xs), ranks(ys)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx) ** 0.5
    vy = sum((b - my) ** 2 for b in ry) ** 0.5
    return cov / (vx * vy) if vx and vy else 0.0


def main() -> None:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    terms = ", ".join(f"'{t}'" for t in TERMS)
    rows = con.execute(f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token,
                   len(string_split(text, ' ')) AS dl
            FROM documents
        ), tf AS (
            SELECT doc_id, token, dl, count(*) AS tf FROM toks
            WHERE token IN ({terms}) GROUP BY doc_id, token, dl
        ), stats AS (
            SELECT count(*) AS n_docs,
                   avg(len(string_split(text, ' '))) AS avgdl
            FROM documents
        ), df AS (SELECT token, count(*) AS df FROM tf GROUP BY token)
        SELECT tf.doc_id, any_value(tf.dl) AS dl,
               sum(tf.tf) AS raw_tf,
               sum(tf.tf * ln(stats.n_docs * 1.0 / df.df)) AS tfidf,
               sum(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
                   * tf.tf * ({K1} + 1)
                   / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / stats.avgdl)))
                   AS bm25
        FROM tf JOIN df USING (token) CROSS JOIN stats
        GROUP BY tf.doc_id
    """).fetchall()

    def topk(idx):
        return [
            r[0]
            for r in sorted(rows, key=lambda r: (-round(r[idx], 9), r[0]))[:TOP]
        ]

    t_raw, t_tfidf, t_bm25 = topk(2), topk(3), topk(4)
    top50 = sorted(rows, key=lambda r: (-round(r[4], 9), r[0]))[:50]
    out = {
        "metric": "bm25_ranking_characterization",
        "n_scored_docs": len(rows),
        "overlap_bm25_vs_tfidf": len(set(t_bm25) & set(t_tfidf)) / TOP,
        "overlap_bm25_vs_rawtf": len(set(t_bm25) & set(t_raw)) / TOP,
        "len_rank_corr": {
            "raw_tf": round(_spearman([r[2] for r in top50], [r[1] for r in top50]), 3),
            "tfidf": round(_spearman([r[3] for r in top50], [r[1] for r in top50]), 3),
            "bm25": round(_spearman([r[4] for r in top50], [r[1] for r in top50]), 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
