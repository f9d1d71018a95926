"""k-means + SemDeDup semantics (the gate checks cross-engine exactness)."""

from __future__ import annotations

import pytest

from dq.clustering import kmeans_assign, semdedup_keep


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def two_blobs(spark):
    # ids 0..3 near (1, 0, ...), ids 50..53 near (0, 1, ...); seeds (id%50==0)
    # are 0 and 50 — one per blob.
    def v(axis, eps):
        out = [0.0] * 8
        out[axis] = 1.0
        out[axis + 2] = eps
        return out

    rows = [(i, v(0, 0.01 * i)) for i in range(4)]
    rows += [(50 + i, v(1, 0.01 * i)) for i in range(4)]
    return _emb(spark, rows)


def test_kmeans_separates_planted_blobs(two_blobs):
    got = {r["vec_id"]: r["cluster_id"] for r in kmeans_assign(two_blobs).collect()}
    assert {got[i] for i in range(4)} == {0}
    assert {got[50 + i] for i in range(4)} == {50}


def test_kmeans_zero_distance_for_centroid_of_identical_blob(spark):
    # all members identical -> centroid equals them -> sq_dist 0 for all
    emb = _emb(spark, [(i, [0.5] * 8) for i in [0, 1, 2]])
    for r in kmeans_assign(emb).collect():
        assert r["cluster_id"] == 0 and r["sq_dist"] == 0


def test_semdedup_keeps_lowest_id_per_dup_group(two_blobs, spark):
    # append exact copies of ids 1 and 51 at higher ids: copies must drop,
    # originals and everything else keep.
    extra = _emb(
        spark,
        [(90, [0.0, 0.0] + [0.0] * 6), (91, [0.0, 0.0] + [0.0] * 6)],
    )
    rows = two_blobs.union(
        _emb(spark, [(60, [1.0, 0.0, 0.01, 0.0, 0.0, 0.0, 0.0, 0.0])])
    )  # exact copy of vec 1's direction
    got = {r["vec_id"]: r["keep_semantic"] for r in semdedup_keep(rows).collect()}
    assert got[60] is False  # near-dup of a lower-id member of its cluster
    assert got[0] and got[50]
    del extra  # zero-vector edge exercised separately below


def test_semdedup_zero_vectors_never_drop(spark):
    # dot == 0 fails the strict > 0 guard: zero vectors are incomparable,
    # both survive.
    emb = _emb(spark, [(0, [0.0] * 8), (1, [0.0] * 8)])
    got = {r["vec_id"]: r["keep_semantic"] for r in semdedup_keep(emb).collect()}
    assert got[0] and got[1]


def test_kmeans_and_semdedup_dim_path_bit_identical(two_blobs):
    # the unrolled known-dim distance/dot must not change a single row
    a = sorted(map(tuple, kmeans_assign(two_blobs).collect()))
    b = sorted(map(tuple, kmeans_assign(two_blobs, dim=8).collect()))
    assert a == b
    c = sorted(map(tuple, semdedup_keep(two_blobs).collect()))
    d = sorted(map(tuple, semdedup_keep(two_blobs, dim=8).collect()))
    assert c == d


# ---- cluster-size bound (VERDICT r4 wrong-#2) -------------------------------


def test_semdedup_mega_cluster_is_sub_split(spark):
    """A planted mega-cluster (200 identical-direction vectors -> ONE
    k-means cell) with max_cluster_size=20 sub-splits into ceil(200/20)=10
    vec_id-residue groups, so the pairwise join fans out per key at ~cap^2
    instead of c^2. Observable contract: each residue group keeps exactly
    its lowest id -> 10 survivors {0..9}; uncapped keeps only vec 0. The
    capped keep set is a strict SUPERSET (splitting only removes
    comparisons, never adds drops)."""
    emb = _emb(spark, [(i, [1.0, 2.0, 0.0, 0.0]) for i in range(200)])
    capped = {
        r["vec_id"]: r["keep_semantic"]
        for r in semdedup_keep(emb, max_cluster_size=20).collect()
    }
    uncapped = {
        r["vec_id"]: r["keep_semantic"]
        for r in semdedup_keep(emb, max_cluster_size=None).collect()
    }
    assert {v for v, k in uncapped.items() if k} == {0}
    assert {v for v, k in capped.items() if k} == set(range(10))
    assert {v for v, k in uncapped.items() if k} <= {v for v, k in capped.items() if k}
    # the residue groups the join keys on are exactly cap-sized here
    import collections

    sizes = collections.Counter(i % 10 for i in range(200))
    assert max(sizes.values()) == 20


def test_semdedup_cap_identity_below_threshold(two_blobs):
    """Clusters under the cap take the EXACT uncapped join (n_sub == 1) —
    the gate/oracle regime: output bit-identical with and without the cap
    (the DuckDB oracle encodes the uncapped form)."""
    a = sorted(map(tuple, semdedup_keep(two_blobs).collect()))
    b = sorted(map(tuple, semdedup_keep(two_blobs, max_cluster_size=None).collect()))
    assert a == b


def test_cluster_purity_matches_python_reference(spark, tmp_path):
    """queries.cluster_purity == a pandas recomputation from the (already
    twin-verified) kmeans assignment joined to labels: majority label with
    (count DESC, label ASC) tie-break, purity_bp = 10000*top//n."""
    from collections import Counter

    from dq.clustering import kmeans_assign
    from dq.queries import EMB_DIM, cluster_purity

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    asg = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_assign(emb, dim=EMB_DIM).collect()
    }
    per_cluster: dict[int, Counter] = {}
    for vid, cid in asg.items():
        per_cluster.setdefault(cid, Counter())[labels[vid]] += 1
    expect = {}
    for cid, cnts in per_cluster.items():
        top_label, top_n = min(cnts.items(), key=lambda kv: (-kv[1], kv[0]))
        n = sum(cnts.values())
        expect[cid] = (n, top_label, top_n, 10000 * top_n // n)

    got = {
        r["cluster_id"]: (
            r["n_members"], r["top_label"], r["top_label_n"], r["purity_bp"]
        )
        for r in cluster_purity(spark, sf).collect()
    }
    assert got == expect
    assert all(0 <= v[3] <= 10000 for v in got.values())
