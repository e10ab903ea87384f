"""Power-iteration PCA (operators/pca) vs numpy's dense eigendecomposition."""

import numpy as np


def test_top_component_matches_numpy_and_is_partition_invariant(spark):
    from knowledge_extraction_pipeline_spark.operators.pca import (
        top_component,
    )
    rng = np.random.RandomState(7)
    # anisotropic cloud: dominant direction along a known axis mix
    base = rng.randn(300, 8).astype(np.float32)
    base[:, 2] *= 6.0
    base[:, 5] *= 3.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(base)],
        "vec_id long, embedding array<float>")

    got = top_component(df, n_iters=12).collect()
    w = np.zeros(8)
    for r in got:
        w[r["dim_idx"]] = r["loading_e6"] / 1e6
    lam = got[0]["eigenvalue_e6"] / 1e6

    x = base.astype(np.float64)
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / len(xc)
    evals, evecs = np.linalg.eigh(cov)
    top_val, top_vec = evals[-1], evecs[:, -1]
    # direction: |cosine| ~ 1 against numpy's eigenvector
    cos = abs(w @ top_vec) / (np.linalg.norm(w) * np.linalg.norm(top_vec))
    assert cos > 0.999
    # eigenvalue via the Rayleigh quotient (fixed-point dust tolerance)
    assert abs(lam - top_val) / top_val < 0.01
    # exact integer output => bit-identical under repartitioning
    got7 = sorted((r["dim_idx"], r["loading_e6"], r["eigenvalue_e6"])
                  for r in top_component(df.repartition(7),
                                         n_iters=12).collect())
    assert got7 == sorted((r["dim_idx"], r["loading_e6"],
                           r["eigenvalue_e6"]) for r in got)
    # empty input yields an empty frame, not a crash
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert top_component(empty).count() == 0
