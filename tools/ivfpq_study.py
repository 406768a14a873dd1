"""End-to-end IVF-PQ retrieval-quality study on a CLUSTERED fixture.

The registered ``ann_ivfpq_retrieval`` query (similarity.py) proves the
*plan*: broadcast model, probed-cells-only candidates, integer-exact ADC,
shortlist re-rank — oracle-checked against DuckDB. This study measures the
*retrieval quality* of that exact pipeline shape where it is meaningful:
the repo's synthetic `embeddings` fixture is isotropic (no cluster
structure), so recall there ≈ fraction-of-corpus-probed, the theoretical
floor (tools/recall_study.py documents this honestly). Real embedding
corpora are clustered — this study builds one (seeded Gaussian mixture),
TRAINS the coarse quantizer and per-subspace PQ codebooks with Lloyd
iterations (the same step ``ann_kmeans_iteration`` registers), and runs
the full numpy twin of the pipeline: coarse probe → ADC over probed cells
→ shortlist → exact re-rank → recall@10 vs exact L2 top-10.

Numbers recorded in BASELINE.md (r7).

Usage: python tools/ivfpq_study.py
"""

from __future__ import annotations

import numpy as np

N, D, N_CLUSTERS, NQ = 20_000, 64, 16, 50
K_COARSE = 16
PQ_M, PQ_K = 4, 16
SUBDIM = D // PQ_M
TOPK, SHORTLIST = 10, 100
LLOYD_ITERS = 10


def lloyd(x: np.ndarray, k: int, iters: int, seed_rows: np.ndarray) -> np.ndarray:
    c = x[seed_rows].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for j in range(k):
            m = a == j
            if m.any():
                c[j] = x[m].mean(0)
    return c


def main() -> int:
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1, (N_CLUSTERS, D))
    assign_true = rng.integers(0, N_CLUSTERS, N)
    corpus = centers[assign_true] + rng.normal(0, 0.3, (N, D))
    q_assign = rng.integers(0, N_CLUSTERS, NQ)
    queries = centers[q_assign] + rng.normal(0, 0.3, (NQ, D))

    # ground truth: exact L2 top-k
    d2_exact = ((queries[:, None, :] - corpus[None, :, :]) ** 2).sum(-1)
    truth = np.argsort(d2_exact, axis=1, kind="stable")[:, :TOPK]

    # train coarse centroids (Lloyd, seeded)
    seed_rows = rng.choice(N, K_COARSE, replace=False)
    coarse = lloyd(corpus, K_COARSE, LLOYD_ITERS, seed_rows)
    cell = ((corpus[:, None, :] - coarse[None, :, :]) ** 2).sum(-1).argmin(1)

    qc_d2 = ((queries[:, None, :] - coarse[None, :, :]) ** 2).sum(-1)
    probe_order = np.argsort(qc_d2, axis=1, kind="stable")

    def train_pq(base: np.ndarray, m: int):
        """Per-subspace Lloyd codebooks + codes over `base` vectors."""
        sd = D // m
        books, codes = [], []
        for seg in range(m):
            sub = base[:, seg * sd : (seg + 1) * sd]
            sb = lloyd(sub, PQ_K, LLOYD_ITERS, rng.choice(N, PQ_K, replace=False))
            books.append(sb)
            codes.append(((sub[:, None, :] - sb[None, :, :]) ** 2).sum(-1).argmin(1))
        return books, np.stack(codes, axis=1)

    def run(tag: str, m: int, residual: bool, nprobe: int):
        sd = D // m
        base = corpus - coarse[cell] if residual else corpus
        books, codes = train_pq(base, m)
        hits = scanned = 0
        for qi in range(NQ):
            cand_all, adc_all = [], []
            for ci in probe_order[qi, :nprobe]:
                cand = np.where(cell == ci)[0]
                if not len(cand):
                    continue
                # ADC LUT: residual ADC subtracts the PROBED centroid from
                # the query (IVFADC, Jegou et al. TPAMI'11) so codes and
                # query live in the same residual space.
                qv = queries[qi] - (coarse[ci] if residual else 0.0)
                lut = np.stack(
                    [
                        ((qv[seg * sd : (seg + 1) * sd][None, :] - books[seg]) ** 2).sum(-1)
                        for seg in range(m)
                    ]
                )
                cand_all.append(cand)
                adc_all.append(lut[np.arange(m)[None, :], codes[cand]].sum(1))
            cand = np.concatenate(cand_all)
            adc = np.concatenate(adc_all)
            scanned += len(cand)
            short = cand[np.argsort(adc, kind="stable")[:SHORTLIST]]
            rer = short[np.argsort(d2_exact[qi, short], kind="stable")[:TOPK]]
            hits += len(set(rer) & set(truth[qi]))
        print(
            f"  {tag:<28} nprobe={nprobe}: recall@{TOPK} = "
            f"{hits / (NQ * TOPK):.3f} (scanned {scanned / (NQ * N):.1%}/query)"
        )

    print(
        f"fixture: N={N} d={D} clusters={N_CLUSTERS} | coarse k={K_COARSE} "
        f"| PQ k={PQ_K}/subspace | shortlist k'={SHORTLIST}, top-{TOPK}"
    )
    for m, residual in ((4, False), (4, True), (8, True)):
        tag = f"m={m} {'residual (IVFADC)' if residual else 'raw-vector PQ'}"
        for nprobe in (1, 2):
            run(tag, m, residual, nprobe)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
