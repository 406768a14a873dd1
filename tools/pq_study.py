"""PQ quality study: asymmetric-distance (ADC) retrieval vs exact L2.

Product quantization is only worth its 32x compression if approximate
distances preserve neighbor ordering. This study runs entirely in numpy
from the SAME fixture + codebook construction as the registered
`ann_pq_codes` query (m=4 subspaces, k=4 codes from pinned seed-vector
slices) and measures, deterministically:

  * recall@10 of ADC top-10 (query exact in each subspace against the
    RECONSTRUCTED database codes — the standard asymmetric lookup) vs
    exact L2 top-10, averaged over every vector as a query;
  * mean/max relative quantization error ||v - reconstruct(v)|| / ||v||;
  * the same recall with a trained codebook (per-subspace Lloyd
    iterations seeded from the SAME pinned vectors) — quantifying what
    `ann_kmeans_iteration`'s training step buys the encode.

A low raw-seed recall with a visible training lift is the expected
fingerprint (k=4 untrained centroids barely partition 64-dim data);
what matters is that training moves it and the machinery is measured.

Usage: python tools/pq_study.py [sf_dir]   (prints one JSON line)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

M, K, SEED_LO = 4, 4, 20  # mirror ann_pq_codes
TOPK = 10
LLOYD_ITERS = 8


def main() -> None:
    import numpy as np
    import pyarrow.parquet as pq

    tb = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(tb.column("vec_id"))
    emb = np.asarray(tb.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, emb = ids[order], emb[order]
    n, d = emb.shape
    sub = d // M

    def encode(codebooks):
        codes = np.empty((n, M), dtype=np.int64)
        for s in range(M):
            v = emb[:, s * sub : (s + 1) * sub]
            c = codebooks[s]  # K × sub
            d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d2.argmin(axis=1)
        return codes

    def reconstruct(codebooks, codes):
        out = np.empty_like(emb)
        for s in range(M):
            out[:, s * sub : (s + 1) * sub] = codebooks[s][codes[:, s]]
        return out

    # exact ground truth is codebook-independent — computed ONCE and
    # closed over by every adc_recall() call (it dominates the cost)
    exact = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(axis=2)
    np.fill_diagonal(exact, np.inf)
    truth = np.argsort(exact, axis=1)[:, :TOPK]

    def adc_recall(codebooks):
        codes = encode(codebooks)
        rec = reconstruct(codebooks, codes)
        # ADC: query exact vs reconstructed database
        approx = ((emb[:, None, :] - rec[None, :, :]) ** 2).sum(axis=2)
        np.fill_diagonal(approx, np.inf)
        got = np.argsort(approx, axis=1)[:, :TOPK]
        hits = [
            len(set(truth[i]) & set(got[i])) / TOPK for i in range(n)
        ]
        err = np.linalg.norm(emb - rec, axis=1) / np.maximum(
            np.linalg.norm(emb, axis=1), 1e-12
        )
        return float(np.mean(hits)), float(err.mean()), float(err.max())

    seed_books = [
        emb[SEED_LO : SEED_LO + K, s * sub : (s + 1) * sub].copy()
        for s in range(M)
    ]
    raw_recall, raw_err, raw_err_max = adc_recall(seed_books)

    # per-subspace Lloyd training from the same seeds
    trained = [b.copy() for b in seed_books]
    for _ in range(LLOYD_ITERS):
        for s in range(M):
            v = emb[:, s * sub : (s + 1) * sub]
            d2 = ((v[:, None, :] - trained[s][None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for j in range(K):
                mask = a == j
                if mask.any():
                    trained[s][j] = v[mask].mean(axis=0)
    tr_recall, tr_err, tr_err_max = adc_recall(trained)

    # K-sweep: the fixture embeddings are near-isotropic noise, so
    # absolute recall at k=4 is intrinsically low (256 distinct
    # reconstructions for 500 unclustered vectors) — the MACHINERY check
    # is that recall rises and quantization error falls monotonically as
    # the codebook grows (K → n recovers exact search).
    sweep = {}
    rng_rows = np.arange(n)
    for k_sweep in (4, 16, 64):
        books = [
            emb[:, s * sub : (s + 1) * sub][
                (rng_rows * 2654435761 % n)[:k_sweep]
            ].copy()
            for s in range(M)
        ]
        for _ in range(LLOYD_ITERS):
            for s in range(M):
                v = emb[:, s * sub : (s + 1) * sub]
                d2 = ((v[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                for j in range(k_sweep):
                    mask = a == j
                    if mask.any():
                        books[s][j] = v[mask].mean(axis=0)
        r, e, _ = adc_recall(books)  # encode/reconstruct read codebook shape
        sweep[f"recall_at_10_k{k_sweep}"] = round(r, 4)
        sweep[f"quant_err_mean_k{k_sweep}"] = round(e, 4)

    print(
        json.dumps(
            {
                "n_vectors": int(n),
                "dim": int(d),
                "m_subspaces": M,
                "k_codes": K,
                "recall_at_10_seed_codebook": round(raw_recall, 4),
                "recall_at_10_trained_codebook": round(tr_recall, 4),
                "quant_err_mean_seed": round(raw_err, 4),
                "quant_err_mean_trained": round(tr_err, 4),
                "quant_err_max_trained": round(tr_err_max, 4),
                "lloyd_iters": LLOYD_ITERS,
                **sweep,
            }
        )
    )


if __name__ == "__main__":
    main()
