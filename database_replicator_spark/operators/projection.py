"""Linear dimension reduction for embedding columns: distributed Gram
matrix → driver-side eigendecomposition → broadcast projection.

The production use is shrinking `array<float>` embeddings before the ANN /
near-dup tiers (similarity.py): a dim→k projection cuts every downstream
matmul, bucket signature, and index byte by dim/k, and PCA keeps more
neighborhood structure per kept dimension than truncation or random
projection.

Scale shape (the part that must distribute):

  * The Gram matrix Σ xᵀx accumulates as one dim×dim float64 block PER
    ARROW BATCH inside ``mapInPandas`` — the corpus streams through BLAS
    and each task emits only its partial (dim² doubles). The driver
    collects O(num_batches) partials, not rows — bounded by task count,
    never by corpus size (same bounded-collect contract as
    ``similarity.collect_unit_matrix``, documented there).
  * The eigendecomposition runs on the driver on a dim×dim symmetric
    matrix (dim ≤ a few thousand — microseconds; this is not the scaling
    axis).
  * Projection is map-only: the dim×k component matrix broadcasts and
    each batch does one ``block @ W`` matmul.

Why there is NO DuckDB oracle gate for this operator: the Gram sums are
float64 accumulated in partition order, so the bottom bits depend on the
physical plan (≈1e-15 relative — documented, not hidden), and eigenvector
computation is LAPACK-implementation-specific. Tests pin the invariants
instead: orthonormality, spectral ordering, exact equality with a local
numpy PCA on the same data up to tolerance, and reconstruction-error
dominance over truncation/random projection. This is the one operator
family where the house bit-exactness rules genuinely do not apply.

Reference: standard PCA; the deployment pattern follows the IVF/PQ
pipeline in similarity.py (train on a sample, apply everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_and_mean(df: DataFrame, vec_col: str, dim: int):
    """(Σ xᵀx, Σ x, n) accumulated distributively: one partial per Arrow
    batch, summed on the driver. Returns (gram [dim×dim], mean [dim], n)."""
    import numpy as np

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            g = mat.T @ mat
            s = mat.sum(axis=0)
            yield pd.DataFrame(
                {
                    "gram": [g.ravel().tolist()],
                    "vsum": [s.tolist()],
                    "n": [len(mat)],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema="gram array<double>, vsum array<double>, n long")
        .collect()
    )
    if not rows:
        raise ValueError("empty input — nothing to decompose")
    gram = np.zeros((dim, dim))
    vsum = np.zeros(dim)
    n = 0
    for r in rows:
        gram += np.array(r["gram"]).reshape(dim, dim)
        vsum += np.array(r["vsum"])
        n += r["n"]
    return gram, vsum / n, n


def pca_components(gram, mean, n, k: int):
    """Top-k principal components from (Σ xᵀx, mean, n): covariance
    C = Σxᵀx/n − meanᵀmean, eigh, descending eigenvalue order, and a
    deterministic sign convention (largest-|coordinate| entry positive)
    so repeated runs and different LAPACK builds agree on direction.
    Returns (components [dim×k], explained_variance [k])."""
    import numpy as np

    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    for j in range(comps.shape[1]):
        i = int(np.abs(comps[:, j]).argmax())
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    return comps, vals[order]


def fit_pca(df: DataFrame, k: int, vec_col: str = "embedding", dim: int = 64):
    """One-call fit: distributed Gram pass + driver eigh. Returns
    (components [dim×k], mean [dim], explained_variance [k])."""
    gram, mean, n = gram_and_mean(df, vec_col, dim)
    comps, var = pca_components(gram, mean, n, k)
    return comps, mean, var


def project_vectors(
    df: DataFrame,
    components,
    mean,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Map-only projection: (x − mean) @ components per Arrow batch with
    the component matrix broadcast. Output schema (id, out_col array)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (components.astype("float64"), mean.astype("float64"))
    )

    def proj(batches):
        import numpy as np
        import pandas as pd

        comps, mu = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out = (mat - mu) @ comps
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), out_col: list(out)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        proj, schema=f"{id_col} long, {out_col} array<double>"
    )
