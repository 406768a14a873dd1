"""Quantized-retrieval quality study: intN top-k vs exact-cosine top-k.

The registered ``ann_int8_retrieval`` ranks candidates by the dequantized
integer dot product of absmax-scaled codes. This study measures what that
quantization costs in retrieval quality — the same honest-measurement
discipline as tools/pq_study.py / tools/ivfpq_study.py — by sweeping the
code width (int4 / int8 / int16 ⇒ absmax levels 7 / 127 / 32767) on the
fixture embeddings and on a higher-dimensional Gaussian control, and
reporting mean top-10 overlap with exact float cosine plus the mean
relative dot-product error.

Expectations (and the machinery fingerprint): overlap rises monotonically
with width and hits 1.0 by int16 on both corpora; int8 should be near-
indistinguishable from exact on realistic dims (the reason int8 is the
production default), while int4 visibly degrades.

Everything is deterministic (seeded generator, fixed fixture).

Usage: python tools/int8_recall_study.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_QUERIES = 5
TOP_K = 10


def _quantize(v: np.ndarray, levels: int) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-vector absmax quantization, matching the registered
    query's floor(x/scale + 0.5) convention."""
    absmax = np.abs(v).max(axis=1)
    scale = np.where(absmax > 0, absmax / levels, 1.0)
    q = np.floor(v / scale[:, None] + 0.5)
    return q, scale


def _topk_sets(scores: np.ndarray, k: int) -> list[set]:
    # ties broken by ascending candidate index, matching the query's
    # ORDER BY score DESC, cid
    order = np.lexsort((np.arange(scores.shape[1])[None, :].repeat(
        scores.shape[0], 0), -scores), axis=1)
    return [set(order[i, :k]) for i in range(scores.shape[0])]


def _study(vecs: np.ndarray) -> dict:
    q, c = vecs[:N_QUERIES], vecs[N_QUERIES:]
    # ground truth is the exact float DOT product — the score the
    # quantized estimator approximates (the registered query ranks by
    # dequantized dot, i.e. MIPS, not normalized cosine) — so the study
    # isolates quantization error from metric choice
    truth = _topk_sets(q @ c.T, TOP_K)
    out = {}
    for name, levels in (("int4", 7), ("int8", 127), ("int16", 32767)):
        qq, qs = _quantize(q, levels)
        cq, cs = _quantize(c, levels)
        deq = (qq @ cq.T) * qs[:, None] * cs[None, :]
        approx = _topk_sets(deq, TOP_K)
        overlap = np.mean([
            len(truth[i] & approx[i]) / TOP_K for i in range(len(truth))
        ])
        true_dot = q @ c.T
        nz = np.abs(true_dot) > 1e-12
        rel_err = float(np.mean(np.abs((deq - true_dot))[nz] / np.abs(true_dot)[nz]))
        out[name] = {
            "mean_overlap_at_10": round(float(overlap), 4),
            "mean_rel_dot_err": round(rel_err, 6),
        }
    return out


def main() -> None:
    import duckdb

    rows = duckdb.sql(
        f"SELECT embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    fixture = np.array([r[0] for r in rows], dtype=np.float64)

    rng = np.random.default_rng(7)
    control = rng.normal(size=(2000, 512))

    print(json.dumps({
        "metric": "int8_retrieval_quality",
        "fixture": {"shape": list(fixture.shape), **_study(fixture)},
        "gaussian_512d": {"shape": list(control.shape), **_study(control)},
    }))


if __name__ == "__main__":
    main()
