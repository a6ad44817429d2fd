#!/usr/bin/env python
"""sf10 (100× the bench SF) spot-proof of the dedup/ANN families.

The scale question each family must answer at 100 TB is "does any
stage grow with corpus² instead of with the real workload size
(candidates / true pairs / rows)?". This tool answers it empirically at
100× the driver's bench scale on the families VERDICT r4 flagged:

- **MinHash-LSH (q27 family)** — ``minhash_candidates`` runs COMPLETE
  at the catalog scale parameters (48 hashes × 24 bands) over 500k documents built
  as 5 000 planted 100-way near-dup clusters (24.75M planted pairs,
  LSH's worst case). Measured: candidate count (must be ~planted, not
  ~corpus²/2 = 125 B) and candidate recall against the planted truth.
  Exact verification is NOT run in full here: its shuffle volume is
  output-size-bound (it carries both shingle sets per surviving pair —
  ~150 GB for 24.75M pairs of ~1 KB docs, beyond this container's
  disk), so a deterministic 1%-of-planted sample is verified exactly
  instead, confirming the planted pairs really are ≥-threshold pairs.
- **SimHash (q28 family)** — slim end to end (verification compares two
  int64 signatures), so the FULL operator runs at the catalog's
  pigeonhole-exact parameters (max_hamming=3 < n_blocks=4, recall must
  be 1.0 — not probabilistic); measured against exact per-planted-pair
  hamming computed from the signature table (slim join, no text
  re-scan).
- **Embedding LSH (q35 family)** — the FULL operator (6-table
  hyperplane LSH + exact cosine verification) over 200k vectors in
  2 000 planted 100-way clusters; recall against exact per-planted-pair
  cosine. This is the family whose table-count scaling law
  (similarity.py) predicted <1 expected miss through sf10 — verified
  here.
- **Clustering (q60 family)** — ``connected_components`` forced down
  the distributed hash-min + pointer-jumping path (driver_threshold=0)
  over the 24.75M-edge planted pair graph; must converge in O(log)
  rounds and return exactly 5 000 components.
- **Global row numbering (q61 family)** — full run over 60M lineitem
  rows; verified by count / min / max of the assigned ids (dense
  numbering ⇒ ids are exactly 1..n).

Usage: python tools/sf10_proof.py [--sf-dir /root/repo/testdata_sf10]
Writes SF10_PROOF.json next to the repo root.

Generate the data first (documents/embeddings/lineitem only):
    python tools/scale_testdata.py --factor 100 \
        --out /root/repo/testdata_sf10 --tables documents embeddings lineitem
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

FACTOR = 100


def planted_pairs(spark, src_ids_df, stride: int, factor: int = FACTOR):
    """All intra-cluster pairs: (c1*stride+s, c2*stride+s), c1 < c2."""
    copies = spark.range(factor).select(F.col("id").alias("c1"))
    copies2 = spark.range(factor).select(F.col("id").alias("c2"))
    return (
        src_ids_df.crossJoin(copies)
        .crossJoin(copies2)
        .filter(F.col("c1") < F.col("c2"))
        .select(
            (F.col("c1") * stride + F.col("s")).alias("id_a"),
            (F.col("c2") * stride + F.col("s")).alias("id_b"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/testdata_sf10")
    ap.add_argument("--out", default="/root/repo/SF10_PROOF.json")
    ap.add_argument(
        "--families",
        nargs="*",
        default=None,
        choices=["minhash", "simhash", "embedding", "inc_embedding", "cc", "rownum", "dupwin", "semdedup", "editsalt", "contam", "retractsoak"],
        help="subset to (re)run; merges into an existing --out report",
    )
    args = ap.parse_args()
    fam = set(
        args.families
        or ["minhash", "simhash", "embedding", "inc_embedding", "cc", "rownum", "dupwin", "semdedup", "editsalt", "contam", "retractsoak"]
    )

    # 100x-scale shuffles (24-band candidate stream ≈ 600M slim rows
    # pre-dedup) need a real heap: the 8g test default OOMs the shared
    # local-mode JVM at stage granularity, while the container has
    # 128 GiB. On a cluster this is per-executor memory, not driver.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")

    from evm_indexer_spark.operators import dedup, graph, order, similarity
    from evm_indexer_spark.session import get_spark

    spark = get_spark("sf10-proof")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"sf": "testdata_sf10 (100x bench SF)", "factor": FACTOR}
    if args.families and os.path.exists(args.out):
        with open(args.out) as f:
            report = {**json.load(f), **report}

    doc = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    li = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))

    doc_stride = 5000
    emb_stride = 2000
    doc_src = doc.filter(F.col("doc_id") < doc_stride).select(
        F.col("doc_id").alias("s")
    )
    emb_src = emb.filter(F.col("vec_id") < emb_stride).select(
        F.col("vec_id").alias("s")
    )

    planted_doc = planted_pairs(spark, doc_src, doc_stride)

    # ---- 1. MinHash candidates at scale params ------------------------
    if "minhash" in fam:
        t0 = time.perf_counter()
        cand = dedup.minhash_candidates(doc, "doc_id", "text", num_hashes=48, bands=24)
        n_cand = cand.count()
        cand_secs = time.perf_counter() - t0

        n_planted = planted_doc.count()
        t0 = time.perf_counter()
        n_hit = cand.join(planted_doc, ["id_a", "id_b"], "left_semi").count()
        recall_secs = time.perf_counter() - t0

        # exact Jaccard on a deterministic ~1% planted sample: proves the
        # planted pairs are genuinely >= threshold (true positives)
        sample = planted_doc.filter(
            F.pmod(F.xxhash64("id_a", "id_b"), F.lit(100)) == 0
        )
        docs_in_sample = (
            sample.select(F.col("id_a").alias("doc_id"))
            .union(sample.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        sub = doc.join(docs_in_sample, "doc_id", "left_semi")
        t0 = time.perf_counter()
        verified = (
            dedup.jaccard_prefix_join(
                sub, "doc_id", "text", threshold=0.4, strategy="prefix"
            )
            .join(sample, ["id_a", "id_b"], "left_semi")
            .count()
        )
        n_sample = sample.count()
        report["minhash_lsh"] = {
            "docs": doc.count(),
            "planted_pairs": n_planted,
            "candidates": n_cand,
            "candidate_recall": round(n_hit / n_planted, 6),
            "candidates_secs": round(cand_secs, 2),
            "recall_join_secs": round(recall_secs, 2),
            "sample_pairs_verified_exact": verified,
            "sample_pairs": n_sample,
            "sample_verify_secs": round(time.perf_counter() - t0, 2),
            "note": "full exact verification is output-size-bound "
            "(~150GB set-carry shuffle for 24.75M near-dup pairs); "
            "candidates + sampled exactness is the scale-relevant proof",
        }
        print("minhash:", report["minhash_lsh"], flush=True)

    # ---- 2. SimHash FULL at scale params ------------------------------
    if "simhash" in fam:
        t0 = time.perf_counter()
        sh_pairs = dedup.simhash_near_duplicates(
            doc, "doc_id", "text", max_hamming=3, n_blocks=4
        )
        n_sh = sh_pairs.count()
        sh_secs = time.perf_counter() - t0

        sigs = dedup.simhash_signatures(doc, "doc_id", "text")
        truth = (
            planted_doc.join(
                sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
                "id_a",
            )
            .join(
                sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
                "id_b",
            )
            .withColumn("hamming", dedup.hamming64(F.col("sig_a"), F.col("sig_b")))
            .filter(F.col("hamming") <= 3)
            .select("id_a", "id_b")
        )
        n_truth = truth.count()
        n_sh_hit = sh_pairs.join(truth, ["id_a", "id_b"], "left_semi").count()
        report["simhash"] = {
            "pairs_found": n_sh,
            "planted_within_hamming3": n_truth,
            "recall_on_planted": round(n_sh_hit / max(n_truth, 1), 6),
            "full_run_secs": round(sh_secs, 2),
        }
        print("simhash:", report["simhash"], flush=True)

    # ---- 3. Embedding LSH FULL --------------------------------------
    if "embedding" in fam:
        t0 = time.perf_counter()
        # n_tables sized by the OR-construction miss law against THIS
        # corpus's angle spread: the generator's per-copy dim-0 offset
        # grows with copy index, so factor-100 worst pairs sit at
        # θ≈0.1 rad — per-table collision (1-θ/π)^12 ≈ 0.68, so 6
        # tables leave 0.32^6·pairs ≈ 10^3 misses (0.999862 measured);
        # 12 tables push the worst-θ expected misses below 1.
        found = similarity.embedding_near_duplicates(
            emb, "vec_id", "embedding", min_cosine=0.99, n_tables=12, dim=64
        ).select("id_a", "id_b")
        n_found = found.count()
        emb_secs = time.perf_counter() - t0

        planted_emb = planted_pairs(spark, emb_src, emb_stride)
        v = emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        pv = (
            planted_emb.join(
                v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("v_a")),
                "id_a",
            )
            .join(
                v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("v_b")),
                "id_b",
            )
        )
        dot = F.aggregate(
            F.zip_with("v_a", "v_b", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nrm = lambda c: F.sqrt(  # noqa: E731
            F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        emb_truth = pv.filter(
            dot / (nrm(F.col("v_a")) * nrm(F.col("v_b"))) >= 0.99
        ).select("id_a", "id_b")
        n_emb_truth = emb_truth.count()
        n_emb_hit = found.join(emb_truth, ["id_a", "id_b"], "left_semi").count()
        report["embedding_lsh"] = {
            "vectors": emb.count(),
            "pairs_found": n_found,
            "planted_above_cosine": n_emb_truth,
            "recall_on_planted": round(n_emb_hit / max(n_emb_truth, 1), 6),
            "full_run_secs": round(emb_secs, 2),
        }
        print("embedding:", report["embedding_lsh"], flush=True)

    # ---- 3b. Incremental embedding dedup (arrival path) ---------------
    if "inc_embedding" in fam:
        # The 100-TB claim under proof: when a batch arrives against an
        # indexed corpus, ONLY the batch is re-bucketed (one O(batch)
        # Arrow matmul); the historical side contributes its slim
        # (id, bucket) rows to the flagged join — no corpus re-scan.
        # Setup: copies 0-49 (100k vectors) are the indexed history,
        # copies 50-99 (100k vectors) arrive; truth = planted pairs
        # with exact cosine >= 0.99 touching the arrival.
        split = 50 * emb_stride
        v = emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        old_v = v.filter(F.col("vec_id") < split)
        new_v = v.filter(F.col("vec_id") >= split)
        t0 = time.perf_counter()
        index_path = os.path.join(args.sf_dir, "_inc_embedding_index")
        # PERSIST the index and read it back before timing the arrival:
        # counting the lazy DataFrame would leave the bucket build in
        # the lineage and silently re-execute it inside the incremental
        # pass (the round-8 review finding) — the persisted table is
        # also exactly what EmbeddingBucketIndex stores in production
        similarity.embedding_buckets(
            old_v, "vec_id", "v", n_tables=12, dim=64
        ).write.mode("overwrite").parquet(index_path)
        index_secs = time.perf_counter() - t0
        index = spark.read.parquet(index_path)
        index_rows = index.count()
        t0 = time.perf_counter()
        inc = similarity.incremental_embedding_pairs(
            new_v, index, v, "vec_id", "v",
            min_cosine=0.99, n_tables=12, dim=64,
        ).select("id_a", "id_b")
        n_inc = inc.count()
        inc_secs = time.perf_counter() - t0

        planted_emb2 = planted_pairs(spark, emb_src, emb_stride)
        pv2 = (
            planted_emb2.filter(F.col("id_b") >= split)
            .join(
                v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("v_a")),
                "id_a",
            )
            .join(
                v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("v_b")),
                "id_b",
            )
        )
        dot2 = F.aggregate(
            F.zip_with("v_a", "v_b", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nrm2 = lambda c: F.sqrt(  # noqa: E731
            F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        truth2 = pv2.filter(
            dot2 / (nrm2(F.col("v_a")) * nrm2(F.col("v_b"))) >= 0.99
        ).select("id_a", "id_b")
        n_truth2 = truth2.count()
        n_hit2 = inc.join(truth2, ["id_a", "id_b"], "left_semi").count()
        report["incremental_embedding"] = {
            "indexed_vectors": split,
            "arriving_vectors": split,
            "index_bucket_rows": index_rows,
            "pairs_found": n_inc,
            "planted_truth_touching_arrival": n_truth2,
            "recall_on_planted": round(n_hit2 / max(n_truth2, 1), 6),
            "index_build_secs": round(index_secs, 2),
            "incremental_secs": round(inc_secs, 2),
            "note": "arrival re-buckets ONLY the batch (one Arrow "
            "matmul over 100k vectors); history contributes slim "
            "(id,bucket) rows — the O(batch+collisions) shape "
            "streaming/embed_stream.EmbeddingBucketIndex persists",
        }
        print("inc_embedding:", report["incremental_embedding"], flush=True)

    # ---- 4. Connected components, distributed path -------------------
    if "cc" in fam:
        t0 = time.perf_counter()
        cc = graph.connected_components(
            planted_doc, "id_a", "id_b", driver_threshold=0
        )
        n_comp = cc.select("component").distinct().count()
        cc_secs = time.perf_counter() - t0
        graph.release_cached(cc)
        report["connected_components"] = {
            "edges": planted_doc.count(),
            "components": n_comp,
            "expected_components": doc_stride,
            "distributed_secs": round(cc_secs, 2),
        }
        print("cc:", report["connected_components"], flush=True)

    # ---- 5. Global row numbering over 60M rows ------------------------
    if "rownum" in fam:
        rows = li.select("l_orderkey", "l_linenumber")
        t0 = time.perf_counter()
        numbered = order.global_row_number(rows, ["l_orderkey", "l_linenumber"])
        agg = numbered.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("row_id").alias("mn"),
            F.max("row_id").alias("mx"),
        ).collect()[0]
        rn_secs = time.perf_counter() - t0
        report["global_row_number"] = {
            "rows": agg["n"],
            "min_id": agg["mn"],
            "max_id": agg["mx"],
            "dense": agg["mn"] == 1 and agg["mx"] == agg["n"],
            "full_run_secs": round(rn_secs, 2),
        }
        print("row_number:", report["global_row_number"], flush=True)

    # ---- editdist hot-gram salting (q63 family, round 11) -------------
    if "editsalt" in fam:
        # Adversarial SHARED-VOCABULARY corpus: every doc drawn from a
        # 6-word vocabulary, so the prefix join's gram keys concentrate
        # into a few huge buckets — the regime the r9 proof documented
        # as saturation. The question here is the JOIN-TASK bound: with
        # triangle-salting, the widest per-(e, s) bucket (task width)
        # must collapse from the unsalted per-e width, while the
        # candidate count stays EXACTLY equal and planted recall holds.
        import random

        rng = random.Random(63)
        vocab = [f"w{i}" for i in range(6)]
        n_docs = 60_000
        rows = []
        for i in range(n_docs):
            words = rng.randint(12, 90)
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(words))))
        planted = []
        for j in range(100):  # (base, base+1M): 3 substitutions, ed<=3
            bid, txt = rows[j * 17]
            mut = list(txt)
            for km in (5, 11, 17):
                mut[km] = "z"
            planted.append((bid + 1_000_000, "".join(mut)))
        corpus = spark.createDataFrame(
            rows + planted, "doc_id long, text string"
        ).repartition(64)
        hot = 512
        base = corpus.select(
            F.col("doc_id").alias("id"), F.col("text").alias("t"),
            F.length("text").alias("len"),
        )
        pref = dedup._editdist_prefix(
            base, max_dist=8, qgram=4, hot_gram_rows=hot, salt_max=64
        )
        widths = (
            pref.withColumn(
                "s", F.pmod(F.xxhash64("id"), F.col("gsalt")).cast("int")
            )
            .groupBy("e", "s")
            .agg(F.count(F.lit(1)).alias("b"), F.first("gsalt").alias("g"))
        )
        per_e = pref.groupBy("e").count()
        max_e = per_e.agg(F.max("count")).collect()[0][0]
        wrow = widths.agg(
            F.max("b").alias("max_b"), F.max("g").alias("max_g")
        ).collect()[0]
        t0 = time.perf_counter()
        salted_n = dedup.editdist_candidates(
            corpus, "doc_id", "text", max_dist=8,
            hot_gram_rows=hot, salt_max=64,
        ).count()
        salted_secs = time.perf_counter() - t0
        t0 = time.perf_counter()
        unsalted_n = dedup.editdist_candidates(
            corpus, "doc_id", "text", max_dist=8, hot_gram_rows=10**9,
        ).count()
        unsalted_secs = time.perf_counter() - t0
        cand = dedup.editdist_candidates(
            corpus, "doc_id", "text", max_dist=8,
            hot_gram_rows=hot, salt_max=64,
        )
        planted_df = spark.createDataFrame(
            [(r[0] - 1_000_000, r[0]) for r in planted], "ia long, ib long"
        )
        found = cand.join(planted_df, ["ia", "ib"], "left_semi").count()
        report["editdist_hot_gram_salting"] = {
            "n_docs": n_docs + len(planted),
            "vocab_words": len(vocab),
            "hot_gram_rows": hot,
            "unsalted_max_gram_bucket": max_e,
            "salted_max_task_bucket": wrow["max_b"],
            "max_salt_width": wrow["max_g"],
            "task_width_shrink": round(max_e / max(1, wrow["max_b"]), 1),
            "candidates_salted": salted_n,
            "candidates_unsalted": unsalted_n,
            "counts_equal": salted_n == unsalted_n,
            "planted": len(planted),
            "planted_found": found,
            "salted_secs": round(salted_secs, 1),
            "unsalted_secs": round(unsalted_secs, 1),
            "note": (
                "triangle-salted self-join on hot gram keys: per-task "
                "width bounded near hot_gram_rows, candidate set "
                "identical by construction, replication paid only by "
                "hot grams"
            ),
        }
        print("editsalt:", report["editdist_hot_gram_salting"], flush=True)

    # ---- 6. Duplicated-window spans (q73/q76 family) ------------------
    if "dupwin" in fam:
        from evm_indexer_spark.operators.corpus import (
            _window_hashes,
            duplicate_window_spans,
            incremental_dup_window_stats,
        )

        n_win = 8
        # full batch operator over 500k docs (~45M windows). The corpus
        # is 100 suffix-perturbed copies of 5k base docs, so every
        # window except (at most) the one containing the per-copy
        # suffix token is duplicated corpus-wide — a sharp full-output
        # invariant checked on EVERY row, not a sample.
        t0 = time.perf_counter()
        batch_out = duplicate_window_spans(doc, "doc_id", "text", n_win)
        stats = batch_out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_windows").alias("tot_win"),
            F.sum("dup_windows").alias("tot_dup"),
            F.sum(
                (
                    (F.col("n_windows") >= 1)
                    & (
                        (F.col("dup_windows") < F.col("n_windows") - 1)
                        | (F.col("covered_tokens") < F.col("n_tokens") - 1)
                    )
                ).cast("long")
            ).alias("invariant_violations"),
        ).collect()[0]
        batch_secs = time.perf_counter() - t0

        # incremental: copies 0-98 (495k docs) are the indexed history,
        # copy 99 (5k docs, 1% of the corpus) arrives. The index is
        # PERSISTED and read back before timing (the round-8 lesson:
        # a lazy index silently re-executes inside the timed pass).
        split = 99 * doc_stride
        hist_docs = doc.filter(F.col("doc_id") < split)
        new_docs = doc.filter(F.col("doc_id") >= split)
        t0 = time.perf_counter()
        index_path = os.path.join(args.sf_dir, "_dupwin_index")
        (
            _window_hashes(hist_docs, "doc_id", "text", n_win)
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("occ"))
            .write.mode("overwrite")
            .parquet(index_path)
        )
        index_secs = time.perf_counter() - t0
        index_df = spark.read.parquet(index_path)
        t0 = time.perf_counter()
        inc = incremental_dup_window_stats(
            new_docs, index_df, "doc_id", "text", n_win
        )
        n_inc = inc.count()
        inc_secs = time.perf_counter() - t0

        # arrival-time verdicts must equal the batch truth restricted
        # to the arriving ids — exact set equality, full 5k rows
        restricted = batch_out.filter(F.col("doc_id") >= split)
        diff = inc.exceptAll(restricted).count() + restricted.exceptAll(inc).count()
        report["dup_window_spans"] = {
            "docs": stats["rows"],
            "total_windows": stats["tot_win"],
            "dup_windows": stats["tot_dup"],
            "invariant_violations": stats["invariant_violations"],
            "batch_secs": round(batch_secs, 2),
            "indexed_docs": split,
            "arriving_docs": n_inc,
            "incremental_equals_batch_restricted": diff == 0,
            "index_build_secs": round(index_secs, 2),
            "incremental_secs": round(inc_secs, 2),
            "note": "incremental pass hashes ONLY the 1% arrival and "
            "joins slim (h,occ) counters; batch truth recomputed for "
            "the equality check only",
        }
        print("dupwin:", report["dup_window_spans"], flush=True)

    # ---- 7. Semantic dedup (q77 family) -------------------------------
    if "semdedup" in fam:
        from evm_indexer_spark.operators.similarity import semantic_dedup

        # the sf10 embeddings ARE a planted SemDeDup workload: 100
        # copies of each of 2000 base vectors (dim 0 nudged 1e-3 per
        # copy -> intra-base cosine ~0.99999, cross-base max ~0.55), so
        # the EXACT expected verdict for every row is computable from
        # the assignments: dropped iff a lower-id same-base member
        # shares the cluster (cross-base drops are impossible below
        # the 0.95 threshold).
        k_clusters = max(8, (2 * emb_stride * FACTOR) // 1000)
        t0 = time.perf_counter()
        out = semantic_dedup(
            emb, "vec_id", "embedding", k=k_clusters, iters=2,
            threshold=0.95,
        )
        got = out.select("id", "cluster", "is_dropped")
        got.persist().count()
        sd_secs = time.perf_counter() - t0
        from pyspark.sql.window import Window as W

        base = F.col("id") % emb_stride
        w_min = F.min("id").over(W.partitionBy(F.col("cluster"), base))
        expect = got.withColumn("exp_drop", F.col("id") > w_min)
        mismatches = expect.filter(
            F.col("is_dropped") != F.col("exp_drop")
        ).count()
        n_drop = got.filter("is_dropped").count()
        n_rows = got.count()
        got.unpersist()
        # co-clustering rate: ideal dedup keeps exactly one row per
        # (base, cluster) group; perfect co-clustering keeps 2000
        kept = n_rows - n_drop
        report["semantic_dedup"] = {
            "vectors": n_rows,
            "clusters": k_clusters,
            "dropped": n_drop,
            "kept": kept,
            "ideal_kept": emb_stride,
            "verdict_mismatches_vs_exact_truth": mismatches,
            "full_run_secs": round(sd_secs, 2),
            "note": "every verdict checked against the closed-form "
            "truth (lower-id same-base member in-cluster); kept > "
            "ideal_kept measures copies split across cluster "
            "boundaries, the documented SemDeDup failure mode",
        }
        print("semdedup:", report["semantic_dedup"], flush=True)

    # ---- 10. decontamination-on-arrival (q80 family / contam stream) --
    if "contam" in fam:
        import tempfile

        from evm_indexer_spark.operators import corpus as corpus_ops
        from evm_indexer_spark.streaming.contam_stream import EvalGramIndex

        ev = doc.filter(F.col("doc_id") % 10 == 0)  # ~50k eval docs
        idx = EvalGramIndex(
            spark, os.path.join(tempfile.mkdtemp(), "eg"), n=8
        )
        t0 = time.perf_counter()
        idx.append(ev, "text", batch_id=0)  # O(eval grams), one pass
        build_secs = time.perf_counter() - t0
        gram_rows = idx.partials().count()
        # one arrival batch: ~1% of the train split — scoring must cost
        # O(batch + index probe), never O(train corpus): the other 445k
        # train docs are never touched (nothing else is even scanned)
        batch = doc.filter(
            (F.col("doc_id") % 10 != 0)
            & (F.pmod(F.xxhash64("doc_id"), F.lit(100)) == 0)
        )
        n_batch = batch.count()
        t0 = time.perf_counter()
        got = idx.contamination_for(batch, "doc_id", "text").persist()
        n_scored = got.count()
        score_secs = time.perf_counter() - t0
        n_contam = got.filter("contaminated").count()
        # exact equality with the batch operator over the same
        # (batch, eval) inputs — the incremental == batch identity,
        # held at 100x bench scale with the shuffle-routed (big-eval)
        # probe regime engaged
        want = corpus_ops.ngram_contamination(
            batch, ev, "doc_id", "text", n=8, eval_small=False
        )
        diffs = got.exceptAll(want).count() + want.exceptAll(got).count()
        got.unpersist()
        report["contamination_on_arrival"] = {
            "eval_docs": ev.count(),
            "eval_gram_rows": gram_rows,
            "index_build_secs": round(build_secs, 2),
            "arrival_batch_docs": n_batch,
            "scored_rows": n_scored,
            "contaminated_in_batch": n_contam,
            "batch_vs_incremental_diffs": diffs,
            "score_secs": round(score_secs, 2),
            "note": "50k-doc eval suite indexed once (summed gram "
            "partials); a 1%-of-train arrival batch scores in O(batch "
            "+ probe) with the shuffle-hash big-eval regime engaged "
            "(eval occurrences > 2M), and the rows equal "
            "ngram_contamination run batch-side on identical inputs. "
            "The 99% of train text not in the batch is never scanned — "
            "the property that makes eval-suite changes O(changed "
            "grams) instead of a 100 TB re-scan.",
        }
        print("contam:", report["contamination_on_arrival"], flush=True)

    # ---- 11. retraction-ledger soak at sf10 concurrency ---------------
    # The _retraction_guard contract (dedup_stream.py) is pinned at unit
    # scale; this leg soaks it at 500k docs with REAL concurrency: two
    # summed-counter stores driven from separate threads (concurrent
    # Spark job submission), retract-on-one-while-compacting-the-other
    # interleaving (the per-store single-writer contract is respected —
    # concurrency is ACROSS stores, where the partial-file timing is
    # real), the double-retract rejection, the ledgered-crash retry
    # path, the non-negativity backstop through compaction, and final
    # exact equality of folded totals against a batch recomputation
    # over the surviving documents.
    if "retractsoak" in fam:
        import tempfile
        import threading

        from evm_indexer_spark.operators.corpus import _ngram_counts_pandas
        from evm_indexer_spark.streaming.contam_stream import EvalGramIndex
        from evm_indexer_spark.streaming.corpus_stream import NgramStatsStore
        from evm_indexer_spark.streaming.dedup_stream import _retraction_guard

        root = tempfile.mkdtemp(prefix="retractsoak_")
        store = NgramStatsStore(spark, os.path.join(root, "ng"))
        idx = EvalGramIndex(spark, os.path.join(root, "eg"), n=8)
        errs: list = []

        def part_for(d):
            return _ngram_counts_pandas(d, "text", 3).select(
                "ngram",
                F.col("n_occurrences").alias("occ"),
                F.col("n_docs").alias("docs"),
            )

        slices = [
            doc.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
            for i in range(4)
        ]
        ev = doc.filter(F.col("doc_id") % 10 == 0)
        ev_slices = [
            ev.filter(F.pmod(F.col("doc_id") / 10, F.lit(4)).cast("int") == i)
            for i in range(4)
        ]

        def run(label, fn):
            try:
                fn()
            except Exception as e:  # surfaced below — a soak must not hang
                errs.append((label, repr(e)))

        t0 = time.perf_counter()
        ta = threading.Thread(
            target=run,
            args=("appendA", lambda: [
                store.append(part_for(s), batch_id=i)
                for i, s in enumerate(slices)
            ]),
        )
        tb = threading.Thread(
            target=run,
            args=("appendB", lambda: [
                idx.append(s, "text", batch_id=i)
                for i, s in enumerate(ev_slices)
            ]),
        )
        ta.start(); tb.start(); ta.join(); tb.join()
        append_secs = time.perf_counter() - t0

        # interleave: retract on A while B compacts, then swap
        t0 = time.perf_counter()
        t1 = threading.Thread(
            target=run,
            args=("retractA", lambda: store.retract(
                part_for(slices[1]), slices[1].select("doc_id"),
                retraction_id=0,
            )),
        )
        t2 = threading.Thread(target=run, args=("compactB", idx.compact))
        t1.start(); t2.start(); t1.join(); t2.join()
        t3 = threading.Thread(
            target=run,
            args=("retractB", lambda: idx.retract(
                ev_slices[2], "text", retraction_id=0
            )),
        )
        t4 = threading.Thread(target=run, args=("compactA", store.compact))
        t3.start(); t4.start(); t3.join(); t4.join()
        maint_secs = time.perf_counter() - t0

        # contract edge 1: double retract of slice 1 must raise and
        # leave the sums untouched (125k ids against the ledger)
        before = store.totals().agg(F.sum("n_occurrences")).first()[0]
        double_raised = False
        try:
            store.retract(part_for(slices[1]), slices[1].select("doc_id"))
        except ValueError:
            double_raised = True
        after = store.totals().agg(F.sum("n_occurrences")).first()[0]

        # contract edge 2: ledgered crash (guard writes the ledger, the
        # negated partial never lands) — a fresh-id retry is rejected,
        # the SAME-id retry completes and cancels exactly once
        _retraction_guard(
            spark, idx.path, ev_slices[3].select("doc_id"), retraction_id=7
        )
        fresh_rejected = False
        try:
            idx.retract(ev_slices[3], "text", retraction_id=None)
        except ValueError:
            fresh_rejected = True
        idx.retract(ev_slices[3], "text", retraction_id=7)  # the retry

        # final compaction passes the non-negativity backstop over the
        # full retraction history, then totals equal batch recomputes
        folded_a = store.compact()
        folded_b = idx.compact()
        surviving_a = doc.filter(F.pmod(F.col("doc_id"), F.lit(4)) != 1)
        want_a = part_for(surviving_a).select(
            "ngram",
            F.col("occ").alias("n_occurrences"),
            F.col("docs").alias("n_docs"),
        )
        got_a = store.totals().filter(
            (F.col("n_occurrences") != 0) | (F.col("n_docs") != 0)
        )
        diffs_a = got_a.exceptAll(want_a).count() + want_a.exceptAll(
            got_a
        ).count()
        surviving_b = ev_slices[0].unionByName(ev_slices[1])
        from evm_indexer_spark.streaming.contam_stream import mode_keys

        want_b = mode_keys(surviving_b, "text", 8, "ngram").select(
            "gram"
        ).distinct()
        got_b = idx.grams()
        diffs_b = got_b.exceptAll(want_b).count() + want_b.exceptAll(
            got_b
        ).count()

        report["retraction_soak"] = {
            "docs": doc.count(),
            "eval_docs": ev.count(),
            "concurrent_append_secs": round(append_secs, 2),
            "interleaved_retract_compact_secs": round(maint_secs, 2),
            "thread_errors": errs,
            "double_retract_raised": double_raised,
            "sum_unchanged_after_rejected_retract": bool(before == after),
            "ledgered_crash_fresh_id_rejected": fresh_rejected,
            "compact_folded_dirs": [folded_a, folded_b],
            "totals_vs_batch_diffs": diffs_a,
            "grams_vs_batch_diffs": diffs_b,
            "note": "two summed-counter stores driven from concurrent "
            "threads at 500k docs; retract-while-the-other-compacts "
            "interleaving; double-retract rejected with sums intact; "
            "a ledgered-crash retry converges only under its own "
            "retraction_id; compaction's non-negativity backstop "
            "passes over the full history and the folded totals equal "
            "batch recomputation over the surviving documents.",
        }
        print("retractsoak:", report["retraction_soak"], flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
