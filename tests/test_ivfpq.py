"""IVF-PQ (FAISS IndexIVFPQ / IVFADC analog; the reference stores one
flat IndexFlatL2, build_faiss.py:30 — IVFPQ is what FAISS ships for the
same search at billion scale).  Contracts pinned here:

* The stored index is a pure function of (data, params): two builds
  write byte-identical quantizers and identical code assignments.
* Stored codes == a full numpy replay of the residual-encode pipeline.
* The stored search == a numpy replay of probe -> residual LUT -> ADC
  shortlist -> exact cosine refine (exact pipeline parity, so the test
  does not ride on recall).
* Recall documentation vs brute force at a generous shortlist.
* Plan shapes: the probe is partition pruning over a codes-only scan
  (PartitionFilters on cluster, no float vector column read).
"""

import numpy as np
import pytest

from beetle_search_engine_spark.operators.ml import (
    _np_assign_codes,
    _pq_luts_np,
    fit_ivfpq_np,
    ivfpq_search_stored,
    write_ivfpq_index,
)
from beetle_search_engine_spark.plans.knn import knn_cosine

SF = "/root/testdata/sf0.001"
EMB = f"{SF}/embeddings.parquet"
PARAMS = dict(n_clusters=8, m=8, ksub=16, seed=42, iters=20, train_sample=2048)


@pytest.fixture(scope="module")
def xnp():
    import pyarrow.dataset as ds

    t = ds.dataset(EMB, format="parquet").to_table(columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    X = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], X[order]


@pytest.fixture(scope="module")
def idx_path(spark, xnp, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    write_ivfpq_index(spark.read.parquet(EMB), p, **PARAMS)
    return p


def _np_replay(xnp):
    """Full numpy replay of the build: (coarse C, codebooks, clusters,
    codes) for every vector, training on the 2048 lowest ids."""
    ids, X = xnp
    C, cbs = fit_ivfpq_np(X[:2048], 8, 8, 16, 42, 20)
    D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    cl = D.argmin(axis=1)
    codes = _np_assign_codes(X - C[cl], [np.asarray(cb) for cb in cbs])
    return C, cbs, cl, codes


def test_stored_codes_match_numpy_replay(spark, xnp, idx_path):
    ids, X = xnp
    _C, _cbs, cl, codes = _np_replay(xnp)
    got = {
        r.vec_id: (r.cluster, list(r.codes))
        for r in spark.read.parquet(f"{idx_path}/codes").collect()
    }
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[int(vid)] == (int(cl[i]), list(codes[i])), int(vid)


def test_build_is_deterministic(spark, idx_path, tmp_path):
    p2 = str(tmp_path / "idx2")
    write_ivfpq_index(spark.read.parquet(EMB), p2, **PARAMS)
    a = sorted(
        (r.vec_id, r.cluster, tuple(r.codes))
        for r in spark.read.parquet(f"{idx_path}/codes").collect()
    )
    b = sorted(
        (r.vec_id, r.cluster, tuple(r.codes))
        for r in spark.read.parquet(f"{p2}/codes").collect()
    )
    assert a == b
    ca = spark.read.parquet(f"{idx_path}/centroids").collect()
    cb = spark.read.parquet(f"{p2}/centroids").collect()
    assert sorted((r.cluster, tuple(r.center)) for r in ca) == sorted(
        (r.cluster, tuple(r.center)) for r in cb
    )


def test_stored_search_matches_numpy_replay(spark, xnp, idx_path):
    ids, X = xnp
    C, cbs, cl, codes = _np_replay(xnp)
    q = X[ids.tolist().index(0)]
    # numpy replay of the query: probe, per-cluster residual LUT, ADC,
    # shortlist (adc, id) asc, exact cosine refine (score, -id) desc
    cd = np.linalg.norm(C - q, axis=1)
    probe = sorted(range(len(C)), key=lambda c: (cd[c], c))[:4]
    luts = {c: np.asarray(_pq_luts_np(q - C[c], [np.asarray(x) for x in cbs])) for c in probe}
    cand = [i for i in range(len(ids)) if cl[i] in probe and ids[i] != 0]
    adc = {
        int(ids[i]): float(sum(luts[cl[i]][j][codes[i, j]] for j in range(8)))
        for i in cand
    }
    short = sorted(adc, key=lambda v: (adc[v], v))[:100]
    qn = np.linalg.norm(q)
    want = sorted(
        (
            (
                round(
                    float(X[ids.tolist().index(v)] @ q)
                    / float(np.linalg.norm(X[ids.tolist().index(v)]) * qn),
                    4,
                ),
                v,
            )
            for v in short
        ),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = [
        (r.score, r.vec_id)
        for r in ivfpq_search_stored(spark, idx_path, EMB, 0, 10, nprobe=4).collect()
    ]
    assert got == want


def test_recall_documentation(spark, idx_path):
    # generous probe+shortlist on the 500-vector near-random test corpus
    got = {
        r.vec_id
        for r in ivfpq_search_stored(
            spark, idx_path, EMB, 0, 10, nprobe=8, shortlist=250
        ).collect()
    }
    brute = {r.vec_id for r in knn_cosine(spark.read.parquet(EMB), 0, 10).collect()}
    assert len(got & brute) >= 8  # residual PQ beats raw PQ here


def test_plan_shapes(spark, idx_path):
    """Two plans to pin: the SHORTLIST scan (partition-pruned, codes-only,
    TakeOrderedAndProject) and the REFINE fetch (literal isin pushed into
    the raw-vector scan as PushedFilters: In — the row-group-skipping
    shape the stored layout exists for)."""
    import re

    from beetle_search_engine_spark.operators.ml import (
        _ivfpq_shortlist,
        _nearest_clusters,
        _read_codebooks,
        _read_query_vec_np,
    )

    crows = spark.read.parquet(f"{idx_path}/centroids").collect()
    C = {int(r.cluster): np.asarray(r.center, dtype=np.float64) for r in crows}
    cbs = _read_codebooks(spark, idx_path)
    q = np.asarray(_read_query_vec_np(EMB, 0), dtype=np.float64)
    probe = _nearest_clusters(q, [(c, list(v)) for c, v in C.items()], 2)
    short = _ivfpq_shortlist(spark, idx_path, q, C, cbs, probe, 0, 100, "vec_id")
    splan = short._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan
    scans = [s for s in splan.split("+-") if "/codes" in s and "FileScan" in s]
    assert scans, splan
    assert any(
        "PartitionFilters" in s and re.search(r"cluster#\d+ IN", s) for s in scans
    ), scans
    assert any("ReadSchema: struct<vec_id:bigint,codes:array<smallint>>" in s for s in scans), scans

    df = ivfpq_search_stored(spark, idx_path, EMB, 0, 10, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(vec_id" in plan, plan
    assert "EvalPython" not in plan  # refine stays JVM-side too


def test_deterministic_inline_matches_stored(spark, tmp_path):
    """ivfpq_search_deterministic (the driver-oracle inline variant) and
    ivfpq_search_stored over an index built with the same params return
    identical (vec_id, score) rankings — the inline twin exists only so
    the DuckDB oracle can prove the composition; the stored layout is
    the at-scale path."""
    from beetle_search_engine_spark.operators.ml import (
        ivfpq_search_deterministic,
    )

    p = str(tmp_path / "idx_det")
    write_ivfpq_index(
        spark.read.parquet(EMB), p,
        n_clusters=8, m=8, ksub=16, seed=42, iters=20, train_sample=1024,
    )
    det = ivfpq_search_deterministic(
        spark, EMB, query_id=3, top_k=10, n_clusters=8, m=8, ksub=16,
        train_sample=1024, nprobe=4, shortlist=100,
    ).collect()
    sto = ivfpq_search_stored(
        spark, p, EMB, query_id=3, top_k=10, nprobe=4, shortlist=100,
    ).collect()
    assert [(r.vec_id, r.score) for r in det] == [(r.vec_id, r.score) for r in sto]
