"""CI pins for the r12 measured dedup/ANN recall numbers (VERDICT r12 #2).

BASELINE.md's r12 rows record the first honest recall measurements on
STRUCTURED near-dups (the rich fixture's replica mode: localized-edit
near-duplicates whose mutations push pairs toward the 0.5 Jaccard
threshold) and on clustered embeddings:

  * MinHash-LSH pair recall 53/56 = 0.946, 0 false positives;
  * sorted-neighborhood single-pass 50/56 = 0.893 vs multipass 56/56
    = 1.000 (head edits break first-24-char sort adjacency; the
    rotated suffix/mid keys recover);
  * IVF recall@10 at nprobe=1 = 1.00 on the 16-cluster GMM embeddings
    (vs the 0.22 isotropic floor).

Those numbers lived only in `tools/` study scripts — a future edit to
`dedup.py` banding or `similarity.py` probing could silently degrade
them (the exact failure mode `test_bucket_resolution_pin.py` exists to
prevent for the bucketed-rank twins). These tests regenerate the seeded
500-doc replica fixture in-process and fail if:

  * LSH recall < 0.90, or any false positive appears;
  * SNM multipass recall < 1.0 (single-pass is pinned to its own
    measured band — it dropping to multipass-level would mean the keys
    no longer rotate; it collapsing would mean the sort broke);
  * IVF recall@10 at nprobe=1 < 0.95.

Ground truth is ALL-PAIRS exact Jaccard over the op's own shingle sets
— test-only, never a production path (SCALING.md "What we do NOT do").
Everything is hash-deterministic (seed 12), so these are exact
replays, not flaky samples.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def replica_dir(spark, tmp_path_factory) -> str:
    """Single-file-parquet fixture dir: 500 docs at 12% replicas + 500
    clustered embeddings (the exact r12 study shape), /root/testdata
    layout so load_table/_lsh_tables work unchanged."""
    import pyarrow.parquet as pq

    from presto_truffle_spark.sources.rich_fixture import (
        clustered_embeddings,
        zipf_documents,
    )

    out = str(tmp_path_factory.mktemp("replica_fixture"))
    docs = zipf_documents(spark, 500, seed=12, replica_pct=12).toArrow()
    emb = clustered_embeddings(spark, 500, seed=12).toArrow()
    pq.write_table(docs, os.path.join(out, "documents.parquet"))
    pq.write_table(emb, os.path.join(out, "embeddings.parquet"))
    return out


def _truth_pairs(spark, sf_dir: str) -> set[tuple[int, int]]:
    """Brute-force Jaccard >= threshold pairs over the SAME shingle sets
    the LSH/SNM ops consume (so recall isolates the candidate stage)."""
    from presto_truffle_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        _lsh_tables,
    )

    sh = _lsh_tables(spark, sf_dir)["sh"]
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    truth = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(inter / union >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
    )
    return {(r.doc_a, r.doc_b) for r in truth.collect()}


@pytest.fixture(scope="module")
def truth(spark, replica_dir) -> set[tuple[int, int]]:
    pairs = _truth_pairs(spark, replica_dir)
    # Fixture-integrity guard: the r13 chain-pure generator (a doc only
    # becomes a replica of a NON-replica src — ADVICE r12) measures
    # exactly 55 truth pairs at (500 docs, seed 12, replica_pct 12),
    # re-measured from the r12 study's 56. A different count means the
    # GENERATOR changed — re-measure and re-pin deliberately rather
    # than letting the recall bands drift to a new denominator.
    assert len(pairs) == 55, (
        f"replica-fixture truth-pair count changed: {len(pairs)} != 55 — "
        "rich_fixture generation changed; re-run the recall study "
        "and re-pin (BASELINE.md r13 row)"
    )
    return pairs


def test_replica_lineage_is_subset_of_truth(spark, replica_dir, truth):
    """Chain-purity check (ADVICE r12): the pre-r13 generator let a
    replica sample a src that was itself a replica, making it a
    near-dup of no materialized doc. Post-fix, every replica's src is
    materialized from its own streams; note the subset relation below
    is NOT a theorem — the 5% mutation rate can legitimately push a
    short doc below the 0.5 Jaccard threshold (observed: 1 of 550
    lineage pairs at 5000 docs) — but at this exact 500-doc seed-12
    shape all 50 lineage pairs sit inside truth, deterministically."""
    from presto_truffle_spark.sources.rich_fixture import (
        document_quality_labels,
    )

    lab = document_quality_labels(spark, 500, seed=12, replica_pct=12)
    lineage = {
        (min(r.src_doc_id, r.doc_id), max(r.src_doc_id, r.doc_id))
        for r in lab.filter("is_rep").collect()
    }
    assert len(lineage) == 50
    assert lineage <= truth, (
        f"replica lineage pairs missing from Jaccard truth: "
        f"{sorted(lineage - truth)[:5]}"
    )


def test_minhash_lsh_recall_pin(spark, replica_dir, truth):
    from presto_truffle_spark.operators.dedup import dedup_minhash_lsh

    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, replica_dir).collect()
    }
    false_pos = lsh - truth
    recall = len(lsh & truth) / len(truth)
    assert not false_pos, f"LSH emitted unverified pairs: {sorted(false_pos)[:5]}"
    assert recall >= 0.90, (
        f"MinHash-LSH recall {recall:.3f} < 0.90 (r12 measured 0.946) — "
        "banding/shingling regression"
    )


def test_snm_multipass_recall_pin(spark, replica_dir, truth):
    from presto_truffle_spark.operators.dedup import (
        dedup_snm_multipass,
        dedup_sorted_neighborhood,
    )

    single = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in dedup_sorted_neighborhood(spark, replica_dir).collect()
    }
    multi = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in dedup_snm_multipass(spark, replica_dir).collect()
    }
    r_single = len(single & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi == 1.0, (
        f"SNM multipass recall {r_multi:.3f} < 1.0 (r12 measured 1.000) — "
        "rotated-key union regression"
    )
    # Single-pass sits in its measured band: head edits MUST break some
    # first-24-char adjacency (== 1.0 would mean the fixture lost its
    # head-edit structure), but the sort itself must still work.
    assert 0.80 <= r_single < 1.0, (
        f"SNM single-pass recall {r_single:.3f} outside [0.80, 1.0) "
        "(r12 measured 0.893)"
    )
    assert not (single - truth) and not (multi - truth), "SNM emitted unverified pairs"


def test_ivf_recall_pin(spark, replica_dir):
    from presto_truffle_spark.operators.similarity import (
        _ivf_topk,
        ann_cosine_topk,
    )

    by_q_exact: dict[int, set[int]] = {}
    for r in ann_cosine_topk(spark, replica_dir).collect():
        by_q_exact.setdefault(r.qid, set()).add(r.cid)
    by_q_ivf: dict[int, set[int]] = {}
    for r in _ivf_topk(spark, replica_dir, nprobe=1).collect():
        by_q_ivf.setdefault(r.qid, set()).add(r.cid)
    per_q = [
        len(by_q_exact[q] & by_q_ivf.get(q, set())) / len(by_q_exact[q])
        for q in by_q_exact
    ]
    recall = sum(per_q) / len(per_q)
    assert recall >= 0.95, (
        f"IVF recall@10 at nprobe=1 is {recall:.3f} < 0.95 on clustered "
        "embeddings (r12 measured 1.00 vs 0.22 isotropic floor) — "
        "coarse-quantizer/probe regression"
    )


def test_dedup_stack_operating_points(spark, replica_dir, truth):
    """Whole-stack recall, each member against ITS OWN contract (r13 —
    extends the r12 LSH/SNM story to the rest of the dedup family):

      * winnowing (>=2 shared fingerprints) is the LOOSE candidate
        generator — recall must be total (55/55; 4.5k candidates is
        the price, verified downstream);
      * chunk_fingerprint is a per-DOC containment signal — every
        flagged doc must belong to the replica-or-source set (zero
        spurious flags) and coverage of that set stays high (89/95
        measured: the missed docs are replicas whose mutations break
        every exact 16-token run);
      * simhash_hamming (<=3 of 48 bits) is the TIGHT operating point
        — low candidate count (33), partial Jaccard recall (0.582
        measured; band-pinned), occasional beyond-Jaccard pair (it
        approximates cosine, not Jaccard);
      * ngram_jaccard at >= 0.5 on its de-slice contract is exact
        Jaccard — lossless there (18/18, 0 fp)."""
    from presto_truffle_spark.catalog import load_table
    from presto_truffle_spark.operators import dedup as D
    from presto_truffle_spark.sources.rich_fixture import (
        document_quality_labels,
    )

    wi = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in D.dedup_winnowing(spark, replica_dir).collect()
    }
    assert len(wi & truth) == len(truth), "winnowing lost a true pair"

    lab = document_quality_labels(spark, 500, seed=12, replica_pct=12)
    reps = lab.filter("is_rep").collect()
    involved = {r.doc_id for r in reps} | {r.src_doc_id for r in reps}
    flagged = {
        r.doc_id
        for r in D.dedup_chunk_fingerprint(spark, replica_dir).collect()
        if r.n_dup_chunks > 0
    }
    assert not (flagged - involved), "chunk fingerprint flagged a non-replica doc"
    assert len(flagged) >= 0.85 * len(involved), (len(flagged), len(involved))

    sh = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in D.dedup_simhash_hamming(spark, replica_dir).collect()
    }
    r_sh = len(sh & truth) / len(truth)
    assert 0.45 <= r_sh <= 0.80, f"simhash band moved: {r_sh:.3f} (measured 0.582)"
    assert len(sh - truth) <= 3, f"simhash beyond-Jaccard pairs grew: {len(sh - truth)}"

    lang = {
        r.doc_id: r.lang
        for r in load_table(spark, replica_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    de_truth = {p for p in truth if lang[p[0]] == "de" and lang[p[1]] == "de"}
    ng = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in D.dedup_ngram_jaccard(spark, replica_dir).collect()
        if r.jaccard >= 0.5
    }
    assert ng & de_truth == de_truth and not (ng - de_truth), (
        len(ng & de_truth),
        len(de_truth),
    )
