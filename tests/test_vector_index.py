"""Persisted vector-index artifacts (operators/vector_index.py):
save/load round-trips, probe-vs-in-session equivalence, delta
admission under frozen quantizers, and the DataFrame-resident Lloyd
path's bit-for-bit equivalence with the driver-resident trainer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import similarity as sim
from e_commerce_lakehouse_spark.operators import vector_index as vx
from e_commerce_lakehouse_spark.sources import load_table, snapshots as S

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return load_table(spark, SF, "embeddings")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_kmeans_distributed_equals_driver_path(spark, emb):
    """The DataFrame-resident Lloyd loop returns the exact centroids of
    the driver-resident loop — same seeding, tie-breaking, empty-cell
    drop, and floor(mean) — at several (k, iters)."""
    v = sim._kmeans_prep(emb)
    for k, iters in [(4, 1), (8, 2), (5, 3)]:
        cells, cent = sim._kmeans_train(v, k, iters)
        got = (
            sim.kmeans_train_distributed(v.select("vec_id", "vec"), k, iters)
            .orderBy("centroid_id")
            .collect()
        )
        assert [int(r.centroid_id) for r in got] == cells, (k, iters)
        assert [[int(x) for x in r.c_vec] for r in got] == cent, (k, iters)


def test_driver_state_ceiling_delegates(spark, emb, monkeypatch):
    """Above KMEANS_DRIVER_STATE_MAX, _kmeans_train trains via the
    DataFrame path (pinned by monkeypatching the ceiling down) and
    still returns identical state."""
    v = sim._kmeans_prep(emb)
    want = sim._kmeans_train(v, 6, 2)
    monkeypatch.setattr(sim, "KMEANS_DRIVER_STATE_MAX", 1)
    got = sim._kmeans_train(v, 6, 2)
    assert got == want


def test_ivf_train_probe_admit(spark, emb, tmp_path):
    """probe(persisted IVF) == ivf_topk over the same corpus with the
    same trained centroids; delta admission equals training the codes
    over the full corpus under the SAME frozen quantizer."""
    root = str(tmp_path / "ivf")
    keep = (F.col("vec_id") % 4 != 3) | (F.col("vec_id") < 5)
    first = emb.filter(keep)
    rest = emb.filter(~keep)
    vx.train_ivf(first, root, n_centroids=8, iters=2)

    # save/load round-trip: centroid artifact is readable + typed
    cent = S.read_snapshot(spark, f"{root}/centroids")
    assert set(cent.columns) == {"centroid_id", "c_vec"}
    assert cent.count() <= 8

    queries = emb.filter(F.col("vec_id") < 5)
    got = vx.probe_ivf(queries, root, nprobe=2, k=5)
    want = sim.ivf_topk(
        first, nprobe=2, query_max_id=5, k=5, centroids=cent
    )
    assert _rows(got) == _rows(want)

    # delta admission: frozen centroids, append-only codes
    before = S._load(f"{root}/codes")["current"]
    vx.admit_ivf(rest, root)
    entry = S._entry(S._load(f"{root}/codes"), before + 1)
    assert entry["op"] == "append"
    got2 = vx.probe_ivf(queries, root, nprobe=2, k=5)
    want2 = sim.ivf_topk(emb, nprobe=2, query_max_id=5, k=5, centroids=cent)
    assert _rows(got2) == _rows(want2)


def test_pq_train_probe_admit(spark, emb, tmp_path):
    root = str(tmp_path / "pq")
    first = emb.filter(F.col("vec_id") % 4 != 3)
    rest = emb.filter(F.col("vec_id") % 4 == 3)
    vx.train_pq(first, root, m=8, ks=16, iters=2)

    cb = S.read_snapshot(spark, f"{root}/codebooks")
    assert set(cb.columns) == {"sub", "cell", "c_vec"}
    meta = S._entry(
        S._load(f"{root}/codebooks"), S._load(f"{root}/codebooks")["current"]
    )["meta"]
    assert meta["kind"] == "pq" and meta["m"] == 8

    queries = emb.filter(F.col("vec_id") < 5)
    got = vx.probe_pq(queries, root, k=5)
    # reference: in-session pq_index on the same corpus — the trained
    # codebooks differ only if training differed; compare via the
    # persisted path's own encode on the full prep (frozen codebooks)
    vx.admit_pq(rest, root)
    got2 = vx.probe_pq(queries, root, k=5)
    # admitted rows participate: neighbor set now spans the full corpus
    n_before = got.select("neighbor_id").distinct().count()
    assert got2.count() == got.count() == 5 * 5
    # probe determinism across loads
    assert _rows(vx.probe_pq(queries, root, k=5)) == _rows(got2)
    assert n_before > 0


def test_pq_probe_matches_in_session_index(spark, emb, tmp_path):
    """Same corpus, same params: the persisted-index probe returns the
    in-session pq_index topk exactly (training is deterministic)."""
    root = str(tmp_path / "pq_eq")
    vx.train_pq(emb, root, m=8, ks=16, iters=2)
    queries = emb.filter(F.col("vec_id") < 10)
    got = vx.probe_pq(queries, root, k=5)
    _, want = sim.pq_index(emb, query_max_id=10, k=5, m=8, ks=16, iters=2)
    assert _rows(got) == _rows(want)


def test_sq8_train_probe_admit_with_clamp(spark, emb, tmp_path):
    root = str(tmp_path / "sq8")
    keep = (F.col("vec_id") % 4 != 3) | (F.col("vec_id") < 10)
    first = emb.filter(keep)
    rest = emb.filter(~keep)
    vx.train_sq8(first, root)
    queries = emb.filter(F.col("vec_id") < 10)
    got = vx.probe_sq8(queries, root, corpus=first, k=5, rerank=4)
    _, want = sim.sq8_index(first, query_max_id=10, k=5, rerank=4)
    assert _rows(got) == _rows(want)

    # delta admission under FROZEN bounds: out-of-range components
    # clamp into [0, 255], codes stay valid bytes
    vx.admit_sq8(rest, root)
    codes = S.read_snapshot(spark, f"{root}/codes")
    mm = codes.select(
        F.min(F.array_min("sq_codes")).alias("lo"),
        F.max(F.array_max("sq_codes")).alias("hi"),
    ).first()
    assert mm.lo >= 0 and mm.hi <= 255
    got2 = vx.probe_sq8(queries, root, corpus=emb, k=5, rerank=4)
    assert got2.count() == 10 * 5


def test_delete_vectors_dv_lifecycle(spark, tmp_path):
    """Deleted vectors vanish from probes with zero codes-file
    rewrites; later admission still works (appends carry the DV); a
    purge clears the sidecars and results are unchanged."""
    import os

    from e_commerce_lakehouse_spark.operators import vector_index as VI
    from e_commerce_lakehouse_spark.sources import deletes as D

    root = str(tmp_path / "ivf")
    emb = load_table(spark, SF, "embeddings")
    VI.train_ivf(emb.filter("vec_id < 80"), root, n_centroids=4)
    VI.admit_ivf(emb.filter("vec_id >= 80 and vec_id < 100"), root)
    q = emb.filter("vec_id < 3")
    before = {
        (r.query_id, r.neighbor_id)
        for r in VI.probe_ivf(q, root, nprobe=4, k=5).collect()
    }
    victims = sorted({n for _, n in before})[:3]
    codes_root = root + "/codes"
    files_before = {
        d: sorted(os.listdir(os.path.join(codes_root, d)))
        for d in os.listdir(codes_root)
        if d.startswith("snap-") and "-dv" not in d
        and os.path.isdir(os.path.join(codes_root, d))
    }
    VI.delete_vectors(spark, root, victims)
    after = {
        (r.query_id, r.neighbor_id)
        for r in VI.probe_ivf(q, root, nprobe=4, k=5).collect()
    }
    assert not {n for _, n in after} & set(victims)
    for d, fs in files_before.items():  # no codes file rewritten
        assert sorted(
            f for f in os.listdir(os.path.join(codes_root, d))
        ) == fs
    # delta admission on top of the DV keeps both effects
    VI.admit_ivf(emb.filter("vec_id >= 100 and vec_id < 110"), root)
    again = {
        r.neighbor_id
        for r in VI.probe_ivf(q, root, nprobe=4, k=50).collect()
    }
    assert not again & set(victims)
    # purge: same probe results, DVs gone
    D.rewrite_deletes(spark, codes_root)
    assert "dvs" not in S._entry(
        S._load(codes_root), S._load(codes_root)["current"]
    )
    purged = {
        r.neighbor_id
        for r in VI.probe_ivf(q, root, nprobe=4, k=50).collect()
    }
    assert purged == again
