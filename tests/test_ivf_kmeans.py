"""Fitted IVF codebook: the sampled spherical k-means fit is
deterministic, and embedding_cosine_dups with the fitted codebook keeps
FULL recall vs an independent numpy brute force on the planted
structure."""

import numpy as np
import pytest

from logfowd2_spark.plans.trainingdata import (
    IVF_CENTROIDS,
    embedding_cosine_dups,
    fit_ivf_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def base(spark):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )


def test_fit_is_deterministic_and_normalized(base):
    c1 = fit_ivf_centroids(base)
    c2 = fit_ivf_centroids(base)
    assert c1 == c2  # bit-for-bit reproducible (hash-gate + fixed init)
    assert len(c1) == IVF_CENTROIDS
    for c in c1:
        assert abs(np.linalg.norm(c) - 1.0) < 1e-9


def test_fit_improves_kmeans_objective_over_first_k(base):
    """The fit genuinely optimizes: mean cosine to the assigned
    centroid (the spherical k-means objective Lloyd ascends) is higher
    with the fitted codebook than with the arbitrary first-k vectors."""
    rows = base.orderBy("vec_id").collect()
    X = np.stack([np.asarray(r["e"], dtype=np.float64) for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    def objective(C):
        return float(np.max(Xn @ np.asarray(C).T, axis=1).mean())

    first_k = [list(v / np.linalg.norm(v)) for v in X[:IVF_CENTROIDS]]
    assert objective(fit_ivf_centroids(base)) > objective(first_k)


def test_cosine_dups_full_recall_with_fitted_codebook(spark, base):
    """Recall assertion vs brute force: the IVF-bucketed pipeline with
    the FITTED codebook returns exactly the ground-truth pairs >= 0.9
    (planted copies at cosine 1.0 plus any true high-cosine pair)."""
    rows = base.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.stack([np.asarray(r["e"], dtype=np.float64) for r in rows])
    # replicate the planted augmentation (vec_id % 10 == 0 -> copy)
    mask = ids % 10 == 0
    ids_aug = np.concatenate([ids, ids[mask] + 100000])
    X_aug = np.vstack([X, X[mask] * 1.001])
    Xn = X_aug / np.linalg.norm(X_aug, axis=1, keepdims=True)
    S = Xn @ Xn.T
    iu, ju = np.triu_indices(len(ids_aug), k=1)
    keep = np.round(S[iu, ju], 4) >= 0.9
    truth = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ids_aug[iu[keep]], ids_aug[ju[keep]])
    }
    assert truth  # the planted pairs exist

    got = {
        (r["a_id"], r["b_id"])
        for r in embedding_cosine_dups(spark, SF).collect()
    }
    assert got == truth  # full recall AND no spurious pairs