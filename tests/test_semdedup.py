"""SemDeDup (semantic dedup over embeddings) vs a pure-Python replay:
same deterministic k-means centroids, numpy assignment, within-cell
pairing, union-find closure, farthest-from-centroid winner."""

import math

import numpy as np
import pytest

from graphforge_spark.operators.similarity import ivf_train, semdedup_keep_list


def _unit(v):
    n = np.linalg.norm(v)
    return v / max(n, 1e-12)


def _py_semdedup(ids, vecs, centroids, threshold, keep="far"):
    c = np.array([_unit(np.asarray(x, dtype=np.float64)) for x in centroids])
    m = np.array([_unit(np.asarray(v, dtype=np.float64)) for v in vecs])
    cells = np.argmax(m @ c.T, axis=1)
    csim = {i: float(m[k] @ c[cells[k]]) for k, i in enumerate(ids)}
    # union-find over within-cell pairs clearing the threshold
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if cells[a] != cells[b]:
                continue
            cos = float(m[a] @ m[b])
            if cos >= threshold:
                ra, rb = find(ids[a]), find(ids[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for i in ids:
        clusters.setdefault(find(i), []).append(i)
    out = {}
    for rep, members in clusters.items():
        rep_id = min(members)
        if keep == "far":
            winner = min(members, key=lambda i: (csim[i], i))
        else:
            winner = min(members, key=lambda i: (-csim[i], i))
        for i in members:
            out[i] = (rep_id, i == winner)
    return out, csim


@pytest.fixture(scope="module")
def corpus(spark):
    # three well-separated directions; duplicates = tiny perturbations
    base = {
        "x": [1.0, 0.05, 0.0, 0.0],
        "y": [0.0, 1.0, 0.05, 0.0],
        "z": [0.0, 0.0, 0.1, 1.0],
    }
    rows = []
    for k, (name, v) in enumerate(base.items()):
        for j in range(4):
            vec = [x + 0.01 * j * ((i + k) % 3) for i, x in enumerate(v)]
            rows.append((f"{name}{j}", [float(x) for x in vec]))
    # one genuinely distinct member per cell (off-direction mix)
    rows.append(("xq", [0.7, 0.7, 0.0, 0.0]))
    rows.append(("zq", [0.0, 0.0, 0.7, 0.7]))
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    return rows, df


def test_semdedup_matches_python_replay(spark, corpus):
    rows, df = corpus
    ids = [r[0] for r in rows]
    vecs = [r[1] for r in rows]
    cents = ivf_train(df, n_centroids=3, iters=3, seed=42)
    got = {
        r.vec_id: (r.rep_id, r.keep, r.centroid_sim)
        for r in semdedup_keep_list(
            df, threshold=0.98, n_centroids=3, centroids=cents
        ).collect()
    }
    expect, csim = _py_semdedup(ids, vecs, cents, 0.98)
    assert set(got) == set(expect)
    for i, (rep, keepflag) in expect.items():
        assert got[i][0] == rep, i
        assert got[i][1] == keepflag, i
        assert got[i][2] == pytest.approx(csim[i], abs=1e-9), i
    # sanity: something actually deduped, and exactly one keeper per group
    groups = {}
    for i, (rep, keepflag, _) in got.items():
        groups.setdefault(rep, []).append(keepflag)
    assert any(len(v) > 1 for v in groups.values())
    assert all(sum(v) == 1 for v in groups.values())


def test_semdedup_keep_near_variant(spark, corpus):
    rows, df = corpus
    ids = [r[0] for r in rows]
    vecs = [r[1] for r in rows]
    cents = ivf_train(df, n_centroids=3, iters=3, seed=42)
    got = {
        r.vec_id: (r.rep_id, r.keep)
        for r in semdedup_keep_list(
            df, threshold=0.98, n_centroids=3, centroids=cents, keep="near"
        ).collect()
    }
    expect, _ = _py_semdedup(ids, vecs, cents, 0.98, keep="near")
    assert got == expect


def test_semdedup_no_duplicates_above_one(spark, corpus):
    rows, df = corpus
    cents = ivf_train(df, n_centroids=3, iters=3, seed=42)
    out = semdedup_keep_list(df, threshold=1.000001, n_centroids=3, centroids=cents)
    rows_out = out.collect()
    assert all(r.keep and r.rep_id == r.vec_id for r in rows_out)
    assert len(rows_out) == len(rows)


def test_semdedup_rejects_bad_keep(spark, corpus):
    _, df = corpus
    with pytest.raises(ValueError, match="keep must be"):
        semdedup_keep_list(df, keep="middle")
