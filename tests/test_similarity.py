"""ANN operator recall: hyperplane-LSH and IVF against exact brute force
on the driver embeddings table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.operators import similarity
from evm_indexer_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def query(emb):
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]


@pytest.fixture(scope="module")
def exact10(emb, query):
    return [r["vec_id"] for r in similarity.cosine_topk(emb, "vec_id", "embedding", query, k=10).collect()]


def test_bruteforce_self_first(exact10):
    assert exact10[0] == 0  # the query vector itself, cosine 1.0


def test_ivf_recall(emb, query, exact10):
    got = [
        r["id"]
        for r in similarity.ivf_topk(
            emb, "vec_id", "embedding", query, k=10, n_lists=8, nprobe=3
        ).collect()
    ]
    # nprobe=3/8 cells must still retrieve most true neighbors
    assert len(set(got) & set(exact10)) >= 6
    assert got[0] == 0


def test_ivf_full_probe_is_exact(emb, query, exact10):
    assigned, centroids = similarity.ivf_build(emb, "vec_id", "embedding", n_lists=8)
    got = [
        r["id"]
        for r in similarity.ivf_cosine_topk(
            assigned, centroids, query, k=10, nprobe=8
        ).collect()
    ]
    assert got == exact10  # probing every cell degenerates to brute force


def test_ivf_deterministic(emb, query):
    a = [r["id"] for r in similarity.ivf_topk(emb, "vec_id", "embedding", query, k=5).collect()]
    b = [r["id"] for r in similarity.ivf_topk(emb, "vec_id", "embedding", query, k=5).collect()]
    assert a == b


def test_lsh_recall(emb, query, exact10):
    got = [
        r["vec_id"]
        for r in similarity.lsh_cosine_topk(
            emb, "vec_id", "embedding", query, k=10, max_probe_hamming=2
        ).collect()
    ]
    assert got[0] == 0
    assert len(set(got) & set(exact10)) >= 6  # 4-table OR-construction


def test_ivf_written_index_prunes_partitions(spark, emb, query, exact10, tmp_path):
    import io
    from contextlib import redirect_stdout

    assigned, centroids = similarity.ivf_build(emb, "vec_id", "embedding", n_lists=8)
    similarity.ivf_write(assigned, centroids, str(tmp_path / "ivf"))
    loaded, cents = similarity.ivf_load(spark, str(tmp_path / "ivf"))
    df = similarity.ivf_cosine_topk(loaded, cents, query, k=10, nprobe=3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the IN-list on list_id must reach the scan as a partition filter
    assert "PartitionFilters" in plan
    assert "list_id" in plan.split("PartitionFilters", 1)[1][:200], plan
    got = [r["id"] for r in df.collect()]
    assert got[0] == 0 and len(set(got) & set(exact10)) >= 6


def test_embedding_near_dup_planted_recall(spark, emb):
    """Planted-pair recall: every vector unioned with a perturbed copy
    (first element + 0.01 → cosine ≈ 0.9999) must be recovered by the
    multi-table LSH pipeline — full recall, no false positives (the
    driver embeddings have no natural pairs above cosine 0.51)."""
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    planted = base.select(
        (F.col("id") + 10000).alias("id"),
        F.concat(
            F.array(F.get(F.col("v"), 0) + F.lit(0.01)),
            F.slice(F.col("v"), 2, 10**6),
        ).alias("v"),
    )
    n = base.count()
    pairs = similarity.embedding_near_duplicates(
        base.unionByName(planted), "id", "v", min_cosine=0.99
    ).collect()
    assert len(pairs) == n
    assert all(r["id_b"] == r["id_a"] + 10000 for r in pairs)
    assert all(r["cosine"] >= 0.99 for r in pairs)


def test_embedding_near_dup_no_natural_pairs(emb):
    """At a 0.8 threshold the raw driver corpus has zero near-dups —
    the operator must report none (precision: exact verify gates LSH
    bucket noise)."""
    out = similarity.embedding_near_duplicates(
        emb, "vec_id", "embedding", min_cosine=0.8
    )
    assert out.count() == 0


# -- deterministic grid k-means + SemDeDup -----------------------------------


def _kmeans_reference(vecs: dict[int, list[float]], k, iters, scale=1000):
    """Pure-Python twin of similarity.kmeans_grid (same quantization,
    md5 seed order, integer distances, first-min tie-break, exact
    integer centroid rounding, empty-cluster carry-over)."""
    import hashlib

    def q(v):
        # numpy round is banker's at .5; the engines round half away —
        # mirror the engine rule exactly
        out = []
        for x in v:
            m = float(x) * scale
            import math
            out.append(int(math.floor(m + 0.5)) if m >= 0 else -int(math.floor(-m + 0.5)))
        return out

    qv = {i: q(v) for i, v in vecs.items()}
    order = sorted(qv, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [list(qv[i]) for i in order[:k]]

    def assign():
        a = {}
        for i, v in qv.items():
            best = min(
                (sum((x - c[d]) ** 2 for d, x in enumerate(v)), j)
                for j, c in enumerate(cents)
            )
            a[i] = best[1]
        return a

    for _ in range(iters):
        a = assign()
        for j in range(len(cents)):
            members = [qv[i] for i in a if a[i] == j]
            if not members:
                continue
            n = len(members)
            new = []
            for d in range(len(cents[j])):
                s = sum(m[d] for m in members)
                mag = (2 * abs(s) + n) // (2 * n)
                new.append(mag if s >= 0 else -mag)
            cents[j] = new
    return assign()


def test_kmeans_grid_matches_reference(spark, emb):
    sample = emb.limit(120)
    got = {
        r["id"]: r["cluster"]
        for r in similarity.kmeans_grid(
            sample, "vec_id", "embedding", k=5, iters=2
        ).collect()
    }
    vecs = {r["vec_id"]: list(r["embedding"]) for r in sample.collect()}
    assert got == _kmeans_reference(vecs, k=5, iters=2)
    # distributed tier, forced — must be bit-identical to the driver
    # tier (same integer kernels on both paths)
    dist = {
        r["id"]: r["cluster"]
        for r in similarity.kmeans_grid(
            sample, "vec_id", "embedding", k=5, iters=2, driver_below=0
        ).collect()
    }
    assert dist == got


def test_kmeans_grid_deterministic_across_runs(spark, emb):
    a = similarity.kmeans_grid(emb, "vec_id", "embedding", k=8, iters=2)
    b = similarity.kmeans_grid(emb, "vec_id", "embedding", k=8, iters=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmeans_more_clusters_than_rows(spark):
    rows = [(i, [float(i), 0.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.kmeans_grid(df, "vec_id", "embedding", k=8, iters=2)
    assert out.count() == 3  # empty seeds keep their centroids; no crash


def test_semantic_dedup_drops_planted_twins(spark, emb):
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    twins = base.select(
        (F.col("id") + 10_000).alias("id"),
        F.concat(
            F.array(F.get("v", 0) + F.lit(0.01)), F.slice("v", 2, 10_000)
        ).alias("v"),
    )
    corpus = base.unionByName(twins)
    out = similarity.semantic_dedup(
        corpus, "id", "v", k=8, iters=2, threshold=0.95
    ).collect()
    # distributed tier, forced — identical verdicts row for row
    dist = similarity.semantic_dedup(
        corpus, "id", "v", k=8, iters=2, threshold=0.95, driver_below=0
    ).collect()
    assert sorted(map(tuple, dist)) == sorted(map(tuple, out))
    n = base.count()
    by_id = {r["id"]: r for r in out}
    assert len(out) == 2 * n
    # no original is ever dropped (its twin has the HIGHER id)
    assert not any(by_id[i]["is_dropped"] for i in by_id if i < 10_000)
    dropped_twins = sum(1 for i in by_id if i >= 10_000 and by_id[i]["is_dropped"])
    # a twin survives only by straddling a cluster boundary — rare
    assert dropped_twins >= 0.95 * n
    # every dropped twin sits in its original's cluster (the rule is
    # within-cluster only)
    for i in by_id:
        if i >= 10_000 and by_id[i]["is_dropped"]:
            assert by_id[i]["cluster"] == by_id[i - 10_000]["cluster"]


# -- product quantization ------------------------------------------------------


def test_pq_codes_deterministic_and_identical_for_duplicates(spark, emb):
    books = similarity.pq_train(emb, "vec_id", "embedding", n_subspaces=8)
    books2 = similarity.pq_train(emb, "vec_id", "embedding", n_subspaces=8)
    assert (books == books2).all()
    enc = similarity.pq_encode(emb, "vec_id", "embedding", books)
    a = {r["id"]: list(r["codes"]) for r in enc.collect()}
    b = {
        r["id"]: list(r["codes"])
        for r in similarity.pq_encode(emb, "vec_id", "embedding", books).collect()
    }
    assert a == b
    # an exact duplicate vector must get the exact same codes
    dup = emb.limit(1).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding"
    )
    dcodes = similarity.pq_encode(dup, "vec_id", "embedding", books).collect()
    src_id = emb.limit(1).collect()[0]["vec_id"]
    assert list(dcodes[0]["codes"]) == a[src_id]


def test_pq_adc_finds_planted_twin(spark, emb):
    # plant a near-identical twin for vec 0; PQ top-k from vec 0's own
    # embedding must surface both vec 0 (dist 0-ish) and the twin
    base = emb.limit(50)
    twin = base.limit(1).select(
        (F.col("vec_id") + 77_000).alias("vec_id"),
        F.concat(
            F.array(F.get(F.transform("embedding", lambda x: x.cast("double")), 0) + F.lit(0.0001)),
            F.slice(F.transform("embedding", lambda x: x.cast("double")), 2, 10_000),
        ).alias("embedding"),
    )
    corpus = base.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionByName(twin)
    books = similarity.pq_train(corpus, "vec_id", "embedding", n_subspaces=8)
    enc = similarity.pq_encode(corpus, "vec_id", "embedding", books)
    query = [
        float(x) for x in base.limit(1).collect()[0]["embedding"]
    ]
    top = similarity.pq_topk(enc, books, query, k=5).collect()
    ids = [r["id"] for r in top]
    q_id = base.limit(1).collect()[0]["vec_id"]
    assert ids[0] == q_id  # the query vector itself is nearest
    assert top[0]["adc_dist"] == 0 or top[0]["adc_dist"] < top[-1]["adc_dist"]
    assert q_id + 77_000 in ids  # the twin shares codes -> same cell


def test_pq_adc_self_distance_equals_reconstruction(spark, emb):
    # ADC(query=x, codes(x)) must equal the squared quantization error
    # of x under the codebooks — the defining PQ identity
    books = similarity.pq_train(emb, "vec_id", "embedding", n_subspaces=8)
    row = emb.limit(1).collect()[0]
    import numpy as np

    x = similarity._quantize_query_half_up(
        [float(v) for v in row["embedding"]], 1000
    )
    d = x.size // 8
    recon = np.concatenate(
        [
            books[s][
                ((x[s * d : (s + 1) * d] - books[s]) ** 2).sum(axis=1).argmin()
            ]
            for s in range(8)
        ]
    )
    expect = int(((x - recon) ** 2).sum())
    enc = similarity.pq_encode(
        emb.filter(F.col("vec_id") == row["vec_id"]), "vec_id", "embedding", books
    )
    got = similarity.pq_topk(
        enc, books, [float(v) for v in row["embedding"]], k=1
    ).collect()[0]
    assert got["adc_dist"] == expect


def test_pq_guardrails(spark, emb):
    with pytest.raises(ValueError, match="divisible"):
        similarity.pq_train(emb, "vec_id", "embedding", n_subspaces=7)
    df = spark.createDataFrame([("a", [0.1, 0.2])], "vec_id string, embedding array<double>")
    with pytest.raises(ValueError, match="integral"):
        similarity.pq_train(df, "vec_id", "embedding", n_subspaces=2)


def _next_job_id(spark) -> int:
    return int(str(spark._jsc.sc().dagScheduler().nextJobId()))


def test_ivf_serving_index_zero_build_jobs(spark, emb, query, exact10, tmp_path):
    """The round-8 directive: an index you rebuild per query is not an
    index. After one build, loading + planning a query must launch ZERO
    Spark jobs (driver-side JSON reads, stored schema, centroid math on
    the loaded list), and results must be identical call to call."""
    path = str(tmp_path / "ivf")
    similarity.IvfServingIndex.build(emb, "vec_id", "embedding", path, n_lists=8)

    idx = similarity.IvfServingIndex.load(spark, path)
    before = _next_job_id(spark)
    df = idx.topk(query, k=10, nprobe=8)
    assert _next_job_id(spark) == before  # zero jobs at plan build
    got = [(r["id"], r["score"]) for r in df.collect()]
    assert [i for i, _ in got] == exact10  # full probe == exact top-k

    # second query call: still zero build jobs, identical results
    before = _next_job_id(spark)
    df2 = idx.topk(query, k=10, nprobe=8)
    assert _next_job_id(spark) == before
    assert [(r["id"], r["score"]) for r in df2.collect()] == got

    # the probe scan prunes list_id partition DIRECTORIES
    plan = idx.topk(query, k=10, nprobe=2)._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_ivf_serving_index_append_and_guard(spark, emb, query, tmp_path):
    path = str(tmp_path / "ivf")
    idx = similarity.IvfServingIndex.build(
        emb, "vec_id", "embedding", path, n_lists=8
    )
    base_n = idx.vectors().count()
    twin = emb.limit(1).select(
        (F.col("vec_id") + 50_000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    # arrivals are assigned to existing cells; epoch re-delivery
    # overwrites its own batch dir (converges, never doubles), and the
    # write coerces to the index's physical vector type
    idx.append(twin, "vec_id", "embedding", batch_id=1)
    assert idx.vectors().count() == base_n + 1
    idx.append(twin, "vec_id", "embedding", batch_id=1)
    assert idx.vectors().count() == base_n + 1
    found = [r["id"] for r in idx.topk(query, k=3, nprobe=8).collect()]
    assert 50_000 in found  # the twin of vec 0 lands in the top-3

    # parameter stamp pins the quantizer for the index lifetime
    with pytest.raises(ValueError, match="parameters"):
        similarity.IvfServingIndex(
            spark, path, idx.centroids, idx.n_lists + 8, idx.seed, idx.dim,
            idx._schema_json,
        )
    # rebuilding in place over appended batches would file batch=1's
    # rows under stale cell assignments — refused, not silently mixed
    with pytest.raises(ValueError, match="appended batches"):
        similarity.IvfServingIndex.build(
            emb, "vec_id", "embedding", path, n_lists=8
        )


def test_ivfpq_serving_exhaustive_equals_exact(spark, emb, query, exact10, tmp_path):
    """IVF-PQ: ADC over STORED codes in probed cells + exact re-rank.
    Exhaustive parameters (nprobe = n_lists, n_candidates = corpus)
    provably degenerate to the exact cosine top-k; the query plan must
    launch zero build jobs and the ADC stage's scan must read ONLY
    (id, codes) — the raw vector column stays on disk until the
    re-rank (parquet column pruning composing with cell pruning)."""
    path = str(tmp_path / "ivfpq")
    similarity.IvfServingIndex.build(
        emb, "vec_id", "embedding", path, n_lists=8, pq_subspaces=8
    )
    idx = similarity.IvfServingIndex.load(spark, path)
    assert idx.codebooks is not None and idx.codebooks.shape[0] == 8

    n = emb.count()
    before = _next_job_id(spark)
    df = idx.topk_pq(query, k=10, nprobe=8, n_candidates=n)
    assert _next_job_id(spark) == before  # zero jobs at plan build
    got = [(r["id"], r["score"]) for r in df.collect()]
    assert [i for i, _ in got] == exact10

    plan = df._jdf.queryExecution().toString()
    # one scan reads codes WITHOUT v (the ADC stage)...
    assert "struct<id:bigint,codes:array<int>>" in plan.replace(" ", "").replace(
        "ReadSchema:", ""
    ) or "codes:array<int>>" in plan
    adc_scans = [
        seg for seg in plan.split("ReadSchema: ")[1:]
        if seg.startswith("struct<") and "codes" in seg.split(">")[0]
        and ",v:" not in seg.split(">\n")[0].split("struct<")[1][:80]
    ]
    assert adc_scans, plan

    # selective serving regime: recall holds and the self-match leads
    sel = [
        r["id"] for r in idx.topk_pq(query, k=10, nprobe=8, n_candidates=60).collect()
    ]
    assert sel[0] == 0
    assert len(set(sel) & set(exact10)) >= 7


def test_ivfpq_append_carries_codes(spark, emb, query, tmp_path):
    path = str(tmp_path / "ivfpq")
    idx = similarity.IvfServingIndex.build(
        emb, "vec_id", "embedding", path, n_lists=8, pq_subspaces=8
    )
    twin = emb.limit(1).select(
        (F.col("vec_id") + 60_000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    idx.append(twin, "vec_id", "embedding", batch_id=1)
    n = idx.vectors().count()
    # the appended twin is reachable through the PQ path (codes stored)
    found = [
        r["id"]
        for r in idx.topk_pq(query, k=3, nprobe=8, n_candidates=n).collect()
    ]
    assert 60_000 in found
    # plain-IVF index refuses the PQ path loudly
    plain = similarity.IvfServingIndex.build(
        emb, "vec_id", "embedding", str(tmp_path / "plain"), n_lists=8
    )
    with pytest.raises(ValueError, match="codebooks"):
        plain.topk_pq(query, k=3)


def test_ivf_serving_index_load_missing_pieces_fail_fast(spark, emb, tmp_path):
    with pytest.raises(ValueError, match="sidecar"):
        similarity.IvfServingIndex.load(spark, str(tmp_path / "nowhere"))
    path = str(tmp_path / "ivf")
    similarity.IvfServingIndex.build(emb, "vec_id", "embedding", path, n_lists=8)
    import os

    os.remove(os.path.join(path, "_params"))
    # a deleted stamp must be a clear error, not a retry-loop hang
    # followed by int('') noise
    with pytest.raises(ValueError, match="stamp"):
        similarity.IvfServingIndex.load(spark, path)


def test_pq_quantization_matches_spark_round(spark):
    """The query-vector quantizer must follow F.round's exact semantics
    (BigDecimal.valueOf(Double.toString) + HALF_UP). Discriminating
    inputs: exact-.5 grid values (ties away from zero, where np.rint's
    half-to-even failed) AND a double one ulp below a .5 tie, where the
    floor(|s|+0.5) trick fails the other way (s + 0.5 IEEE-rounds UP to
    1.0 while the decimal string 0.49999999999999994 rounds to 0).
    Corpus-side encoding needs no mirror at all — it quantizes through
    the same Spark expression training used (_spark_quantize)."""
    vals = [24.5, -24.5, 3.5, -7.5, 0.5, -0.5, 101.5, 24.4999, -3.49]
    assert all((m / 1000.0) * 1000.0 == m for m in vals if m == int(m) + 0.5)
    xs = [m / 1000.0 for m in vals]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    spark_side = [
        r["q"]
        for r in df.select(
            F.round(F.col("x") * 1000).cast("long").alias("q")
        ).collect()
    ]
    driver_side = similarity._quantize_query_half_up(xs, 1000).tolist()
    assert driver_side == spark_side

    ulp = 0.49999999999999994  # 0.5 - 2^-54: floor(|s|+0.5) says 1
    one_ulp = spark.createDataFrame([(ulp,)], "x double").select(
        F.round(F.col("x") * 1).cast("long").alias("q")
    ).collect()[0]["q"]
    assert one_ulp == 0
    assert similarity._quantize_query_half_up([ulp], 1).tolist() == [0]


def test_quantize_total_on_hostile_values(spark):
    """The grid quantizer is TOTAL (round-14 adversarial embeddings
    find: a single NaN dimension crashed q77/q79 under ANSI casts):
    NaN → 0, ±Inf and out-of-range magnitudes clamp to ±GRID_CLAMP —
    and the Spark expression and the numpy driver-tier kernel agree
    exactly on every hostile class."""
    import math

    import numpy as np

    from evm_indexer_spark.operators import similarity

    hostile = [
        float("nan"), float("inf"), float("-inf"),
        1e308, -1e308, 2e3, -2e3, 0.0, -0.0, 1e-42, 0.4995,
        similarity.GRID_CLAMP / 1000.0 + 1.0,  # just past the clamp
    ]
    df = spark.createDataFrame(
        [([float(x) for x in hostile],)], "v array<double>"
    )
    spark_side = df.select(
        similarity._spark_quantize(F.col("v"), 1000).alias("q")
    ).collect()[0]["q"]
    driver_side = similarity._quantize_query_half_up(
        np.array(hostile), 1000
    ).tolist()
    assert spark_side == driver_side
    B = similarity.GRID_CLAMP
    assert spark_side[0] == 0                      # NaN
    assert spark_side[1] == B and spark_side[2] == -B  # Inf clamps
    assert spark_side[3] == B and spark_side[4] == -B  # overflow clamps
    assert spark_side[5] == B and spark_side[6] == -B  # 2e3*1000 > B
    # in-range values are untouched by totalization
    assert spark_side[7] == 0 and spark_side[10] == 500
    # every grid distance term stays exact at the extremes:
    # 64 * (2B)^2 < 2^53
    assert 64 * (2 * B) ** 2 < 2**53


def test_quantize_hostile_values_emit_no_numpy_warning():
    """Round-14 VERDICT nit: ±Inf inputs made the HALF_UP kernel's
    ``f - fl`` evaluate inf−inf → a numpy "invalid value" RuntimeWarning
    per batch — benign (the clamp resolves it) but log-flooding at
    100-TB batch counts. The kernel must now be silent on every hostile
    class."""
    import warnings

    import numpy as np

    from evm_indexer_spark.operators import similarity

    hostile = np.array(
        [float("nan"), float("inf"), float("-inf"), 1e308, -1e308, 0.5]
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = similarity._quantize_half_up_np(hostile)
    B = similarity.GRID_CLAMP
    assert out.tolist() == [0, B, -B, B, -B, 1]


def test_quantize_vectorized_kernel_equals_decimal_reference():
    """The vectorized HALF_UP kernel (production: q77/q79 driver tiers)
    must agree with the Decimal-string reference (the pinned
    BigDecimal.valueOf twin) on EVERY double — discriminating inputs:
    exact .5 grid ties (both signs), ulp-neighbors of ties in both
    directions at several magnitudes, zero, subnormal-adjacent, and a
    broad random sweep."""
    import numpy as np

    from evm_indexer_spark.operators import similarity

    adversarial = [0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 24.5, -24.5]
    for k in (0.5, 1.5, 24.5, 1023.5, 2.0**30 + 0.5):
        for sign in (1.0, -1.0):
            v = sign * k
            adversarial += [v, np.nextafter(v, 0), np.nextafter(v, v * 2)]
    adversarial += [0.49999999999999994, -0.49999999999999994,
                    5e-324, -5e-324, 1e-300, 0.25, -0.75]
    rng = np.random.default_rng(13)
    rand = np.concatenate([
        rng.uniform(-100, 100, 20000),
        rng.uniform(-1, 1, 20000),
        np.floor(rng.uniform(-50, 50, 5000)) + 0.5,  # dense exact ties
    ])
    for scale in (1, 1000):
        vals = np.concatenate([np.array(adversarial), rand])
        fast = similarity._quantize_query_half_up(vals, scale)
        ref = similarity._quantize_half_up_decimal(vals.tolist(), scale)
        mism = np.flatnonzero(fast != ref)
        assert mism.size == 0, (
            f"scale={scale}: {[(vals[i], fast[i], ref[i]) for i in mism[:5]]}"
        )


def test_pq_train_sample_cap_hash_equal_below_cap(spark, emb):
    # q79's gate entry trains with sample_rows=20_000; at every gate SF
    # the corpus is smaller than the cap, so the deterministic
    # (md5(id), id)-ordered sample is the WHOLE corpus under both the
    # gate cap and the 50k library default — the codebooks must be
    # bit-identical. (Above the cap the entry's answer is codebook-
    # independent: the selective regime is closed-form for any codebook
    # and the total regime is exact by the degeneration theorem /
    # exact-scan route.)
    capped = similarity.pq_train(
        emb, "vec_id", "embedding", n_subspaces=8, sample_rows=20_000
    )
    default = similarity.pq_train(emb, "vec_id", "embedding", n_subspaces=8)
    assert capped.shape == default.shape
    assert (capped == default).all()


def test_pq_train_sample_cap_binds_above_cap(spark):
    # sanity on the cap mechanism itself: with corpus > sample_rows the
    # sample is a strict (deterministic) subset, and pq_train still
    # produces a full-shape codebook from it
    rows = [(i, [float((i * 37) % 101), float((i * 53) % 97)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    small = similarity.pq_train(
        df, "vec_id", "embedding", n_subspaces=2, n_centroids=4, sample_rows=16
    )
    again = similarity.pq_train(
        df, "vec_id", "embedding", n_subspaces=2, n_centroids=4, sample_rows=16
    )
    assert small.shape == (2, 4, 1)
    assert (small == again).all()  # deterministic under the cap


def test_pq_train_truncates_short_sample(spark):
    # a sample smaller than n_centroids must yield a TRUNCATED codebook,
    # not zero-padded phantom centroids near the origin
    import numpy as np

    rows = [
        (i, [float(i + 1)] * 4 + [0.0] * 4) for i in range(5)
    ]  # 5 vectors, all far from the origin in subspace 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = similarity.pq_train(
        df, "vec_id", "embedding", n_subspaces=2, n_centroids=16
    )
    assert books.shape == (2, 5, 4)
    # near-origin query: with phantom zero rows it would take code >= 5
    enc = similarity.pq_encode(df, "vec_id", "embedding", books)
    assert all(
        max(r["codes"]) < 5 for r in enc.collect()
    )
    near_zero = spark.createDataFrame(
        [(99, [0.001] * 8)], "vec_id long, embedding array<double>"
    )
    codes = similarity.pq_encode(near_zero, "vec_id", "embedding", books).collect()
    assert max(codes[0]["codes"]) < 5


def test_pq_refine_exhaustive_equals_exact(emb, query, exact10):
    # n_candidates >= corpus size -> provably-total shortlist -> output
    # equals exact cosine top-k (the q79 gate regime)
    n = emb.count()
    books = similarity.pq_train(emb, "vec_id", "embedding", n_subspaces=8)
    got = similarity.pq_refine_topk(
        emb, "vec_id", "embedding", books, query, k=10, n_candidates=n
    ).collect()
    assert [r["vec_id"] for r in got] == exact10
    exact = similarity.cosine_topk(
        emb, "vec_id", "embedding", query, k=10
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in exact
    ]


def test_pq_refine_selective_recall(emb, query, exact10):
    # the honest serving regime: 4k-wide ADC shortlist, exact re-rank —
    # recall against exact top-10 must stay high and the self-match first
    books = similarity.pq_train(emb, "vec_id", "embedding", n_subspaces=8)
    # measured on the 500-vector sf0.001 corpus (natural neighbors all
    # sit near cosine 0.5, the hard regime for a 16-centroid quantizer):
    # recall@10 = 4/6/8/8 at shortlist widths 20/40/60/80 — monotone in
    # width, exactly the ADC contract
    recall = {}
    for nc in (40, 60):
        got = [
            r["vec_id"]
            for r in similarity.pq_refine_topk(
                emb, "vec_id", "embedding", books, query, k=10, n_candidates=nc
            ).collect()
        ]
        assert got[0] == 0
        recall[nc] = len(set(got) & set(exact10))
    assert recall[40] >= 5
    assert recall[60] >= 7
    assert recall[60] >= recall[40]
    with pytest.raises(ValueError, match="n_candidates"):
        similarity.pq_refine_topk(
            emb, "vec_id", "embedding", books, query, k=10, n_candidates=3
        )


def test_pq_planted_selective_is_closed_form(emb, query):
    """q79's selective_planted regime: 10 exact query copies at ids
    -10..-1 must survive a shortlist 40 wide at ANY corpus size — their
    codes achieve the global ADC minimum and their ids sort first, so
    the provable answer is exactly ids -10..-1 at score 1.0. A wrong
    ADC table, tie-break, or shortlist drop breaks this."""
    books = similarity.pq_train(emb, "vec_id", "embedding", n_subspaces=8)
    planted = emb.sparkSession.createDataFrame(
        [(i, query) for i in range(-10, 0)],
        schema="vec_id long, embedding array<double>",
    ).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    aug = emb.select("vec_id", "embedding").unionByName(planted)
    n_aug = aug.count()
    assert n_aug > 40, "fixture must make the 40-wide shortlist selective"
    got = similarity.pq_refine_topk(
        aug, "vec_id", "embedding", books, query,
        k=10, n_candidates=40, round_digits=4,
    ).collect()
    assert [r["vec_id"] for r in got] == list(range(-10, 0))
    assert all(r["score"] == 1.0 for r in got)


def test_ivf_serving_delete_tombstones_and_compact(spark, emb, query, exact10, tmp_path):
    """Round-11 retraction path: delete() masks ids from serving
    immediately (broadcast anti-join, no cell rewrite), compact() folds
    live rows into a base generation and clears tombstones, and an
    undeleted index pays ZERO extra plan nodes."""
    path = str(tmp_path / "ivf")
    idx = similarity.IvfServingIndex.build(
        emb, "vec_id", "embedding", path, n_lists=8, pq_subspaces=8
    )
    assert idx.tombstones() is None  # no tombstones -> None fast path
    # delete the top-2 exact neighbors: both probe paths must stop
    # serving them and backfill from the remaining corpus
    dead = exact10[:2]
    idx.delete(dead)
    got = [r["id"] for r in idx.topk(query, k=10, nprobe=8).collect()]
    assert got[:8] == [i for i in exact10 if i not in dead]
    assert len(got) == 10 and not set(dead) & set(got)
    got_pq = [
        r["id"]
        for r in idx.topk_pq(query, k=10, nprobe=8, n_candidates=1000).collect()
    ]
    assert got_pq == got  # exhaustive PQ degenerates to the same set
    # a reopened index sees the same tombstones (they live on disk)
    again = similarity.IvfServingIndex.load(spark, path)
    assert not set(dead) & {
        r["id"] for r in again.topk(query, k=10, nprobe=8).collect()
    }

    # compact: physical fold — rows gone, tombstones cleared, results
    # identical, and the folded layout serves through the same plan
    n_live = idx.vectors().count() - len(dead)
    folded = idx.compact()
    assert folded >= 1
    assert idx.tombstones() is None
    assert idx.vectors().count() == n_live
    assert [
        r["id"] for r in idx.topk(query, k=10, nprobe=8).collect()
    ] == got
    # resurrection order: delete -> compact -> append serves again
    back = emb.filter(F.col("vec_id") == dead[0]).select(
        "vec_id", "embedding"
    )
    idx.append(back, "vec_id", "embedding", batch_id=7)
    assert dead[0] in {
        r["id"] for r in idx.topk(query, k=10, nprobe=8).collect()
    }


def test_ivf_compact_heals_crash_copies_but_rejects_divergence(
    spark, emb, query, exact10, tmp_path
):
    """Crash duplication (a fold that renamed its base but died before
    deleting the source dirs => every row exists twice, byte-identical)
    must HEAL on re-compaction: full-row dedupe collapses exact copies.
    Divergent payloads under one id are a contract violation — compact
    must refuse loudly rather than freeze an arbitrary pick."""
    import shutil

    path = str(tmp_path / "ivf")
    idx = similarity.IvfServingIndex.build(
        emb, "vec_id", "embedding", path, n_lists=8, pq_subspaces=8
    )
    n = idx.vectors().count()
    # simulate the crash: duplicate the whole batch=0 dir as batch=1
    shutil.copytree(f"{path}/vectors/batch=0", f"{path}/vectors/batch=1")
    assert idx.vectors().count() == 2 * n
    assert idx.compact() >= 1
    assert idx.vectors().count() == n  # healed, not frozen
    got = [r["id"] for r in idx.topk(query, k=10, nprobe=8).collect()]
    assert got == exact10

    # divergent payload: same id, different vector, appended as a new
    # batch — compact must raise, state left unfolded
    bad = emb.filter(F.col("vec_id") == exact10[0]).select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") + F.lit(0.5)
        ).alias("embedding"),
    )
    idx.append(bad, "vec_id", "embedding", batch_id=9)
    with pytest.raises(ValueError, match="divergent payloads"):
        idx.compact()


def test_pq_train_local_sample_bit_identical(spark, emb):
    """pq_train's driver-local sample path (footer-gated pyarrow read,
    the q79 tier) must produce codebooks BIT-IDENTICAL to the Spark
    sample path: same (md5(str(id)), id) ordering, same half-up grid
    (_quantize_query_half_up is the pinned twin of _spark_quantize)."""
    rows = [(r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb.collect()]
    via_spark = similarity.pq_train(emb, "vec_id", "embedding", n_subspaces=8)
    via_local = similarity.pq_train(
        emb, "vec_id", "embedding", n_subspaces=8, local_sample=rows
    )
    assert via_spark.shape == via_local.shape
    assert (via_spark == via_local).all()
    # the cap binds identically on both paths
    capped_s = similarity.pq_train(
        emb, "vec_id", "embedding", n_subspaces=8, sample_rows=50
    )
    capped_l = similarity.pq_train(
        emb, "vec_id", "embedding", n_subspaces=8, sample_rows=50,
        local_sample=rows,
    )
    assert (capped_s == capped_l).all()
    import pytest

    with pytest.raises(ValueError, match="empty"):
        similarity.pq_train(
            emb, "vec_id", "embedding", n_subspaces=8, local_sample=[]
        )


def test_semantic_dedup_local_corpus_bit_identical(spark, emb):
    """semantic_dedup's driver-local corpus path (footer-gated pyarrow
    read, the q77 tier) must equal the Spark probe tier byte-for-byte
    — including the q77 perturbed-twin construction, whose +0.01 on
    dim 0 is the same IEEE double op in numpy and the JVM."""
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    perturbed = base.select(
        (F.col("id") + 1000000).alias("id"),
        F.concat(
            F.array(F.get(F.col("v"), 0) + F.lit(0.01)),
            F.slice(F.col("v"), 2, 1000000),
        ).alias("v"),
    )
    corpus = base.unionByName(perturbed)
    rows = [(r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb.collect()]
    local = rows + [(i + 1000000, [v[0] + 0.01] + v[1:]) for i, v in rows]
    via_spark = sorted(
        map(tuple, similarity.semantic_dedup(
            corpus, "id", "v", k=8, iters=2, threshold=0.95
        ).collect())
    )
    via_local = sorted(
        map(tuple, similarity.semantic_dedup(
            corpus, "id", "v", k=8, iters=2, threshold=0.95,
            local_corpus=local,
        ).collect())
    )
    assert via_spark == via_local
    import pytest

    with pytest.raises(ValueError, match="empty"):
        similarity.semantic_dedup(corpus, "id", "v", local_corpus=[])


def test_embedding_pairs_onetask_matches_distributed(spark, emb):
    """The one-Arrow-task tier (the q35/q67 small-corpus routing) must
    equal the distributed slim-bucket pipeline pair-for-pair — same
    seeded hyperplanes, same candidate set, same verify arithmetic,
    rounding applied in the JVM on both tiers. Covers the plain and
    flagged (incremental, ≥ 1 arriving member) forms."""
    base = emb.select(
        F.col("vec_id").alias("id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    perturbed = base.select(
        (F.col("id") + 1000000).alias("id"),
        F.concat(
            F.array(F.get(F.col("v"), 0) + F.lit(0.01)),
            F.slice(F.col("v"), 2, 1000000),
        ).alias("v"),
    )
    corpus = base.unionByName(perturbed)
    dist = sorted(map(tuple, similarity.embedding_near_duplicates(
        corpus, "id", "v", min_cosine=0.99, n_tables=6, dim=64
    ).collect()))
    one = sorted(map(tuple, similarity.embedding_pairs_onetask(
        corpus, "id", "v", min_cosine=0.99, n_tables=6, dim=64
    ).collect()))
    assert dist == one and len(one) > 0

    flagged = corpus.withColumn("is_new", F.col("id") >= 1000000)
    inc = sorted(map(tuple, similarity.incremental_embedding_pairs(
        perturbed,
        similarity.embedding_buckets(base, "id", "v", n_tables=6, dim=64),
        corpus, "id", "v", min_cosine=0.99, n_tables=6, dim=64,
    ).collect()))
    one_f = sorted(map(tuple, similarity.embedding_pairs_onetask(
        flagged, "id", "v", min_cosine=0.99, n_tables=6, dim=64,
        new_flag_col="is_new",
    ).collect()))
    assert inc == one_f and len(one_f) > 0


def _q79_distributed(spark, emb, query):
    """The q79 distributed two-regime construction, verbatim."""
    books = similarity.pq_train(
        emb, "vec_id", "embedding", n_subspaces=8, sample_rows=20_000
    )
    planted = spark.range(-10, 0, 1, 1).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in query])
        .cast("array<float>")
        .alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(planted).coalesce(1)
    enc = similarity.pq_encode(aug, "vec_id", "embedding", books)
    tot = similarity.cosine_topk(
        aug.filter(F.col("vec_id") >= 0), "vec_id", "embedding", query,
        k=10, round_digits=4,
    ).select(F.lit("total").alias("regime"), "vec_id", "score")
    sel = similarity.pq_refine_topk(
        aug, "vec_id", "embedding", books, query,
        k=10, n_candidates=40, round_digits=4, encoded=enc,
    ).select(F.lit("selective_planted").alias("regime"), "vec_id", "score")
    return sel.unionByName(tot)


def test_pq_ann_onetask_matches_distributed(spark):
    # float-typed vectors (the fixture schema) so the planted literal
    # cast exercises the same float32 truncation as the entry
    emb = load_table(spark, SF_DIR, "embeddings")
    query = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    one = similarity.pq_ann_onetask(
        emb, "vec_id", "embedding", query,
        k=10, n_candidates=40, sample_rows=20_000, round_digits=4,
    ).orderBy("regime", "vec_id").collect()
    dist = (
        _q79_distributed(spark, emb, query)
        .orderBy("regime", "vec_id")
        .collect()
    )
    assert [tuple(r) for r in one] == [tuple(r) for r in dist]


def test_pq_ann_onetask_matches_distributed_on_hostile_vectors(spark):
    import math

    base = load_table(spark, SF_DIR, "embeddings").limit(50)
    dim = len(base.first()["embedding"])
    hostile = spark.createDataFrame(
        [
            (900, [float("nan")] * dim),
            (901, [float("inf")] * dim),
            (902, [0.0] * dim),
            (903, [-float("inf")] + [1.0] * (dim - 1)),
        ],
        f"vec_id long, embedding array<float>",
    )
    emb = base.select("vec_id", "embedding").unionByName(hostile)
    query = [
        float(x)
        for x in base.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    one = similarity.pq_ann_onetask(
        emb, "vec_id", "embedding", query,
        k=10, n_candidates=40, sample_rows=20_000, round_digits=4,
    ).orderBy("regime", "vec_id").collect()
    dist = (
        _q79_distributed(spark, emb, query)
        .orderBy("regime", "vec_id")
        .collect()
    )
    assert [tuple(r) for r in one] == [tuple(r) for r in dist]
