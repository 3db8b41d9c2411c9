"""Product quantization (PQ) — the compression path for ANN at 100 TB.

IVF (similarity/ann.py, kmeans.py) prunes WHICH vectors to score; PQ
shrinks WHAT is stored and scored: the vector column is replaced by m
one-byte codes (here m=4 subspaces of a 64-dim embedding), a 16-64x
footprint cut, and query scoring becomes an asymmetric-distance (ADC)
TABLE LOOKUP — no original vectors touched. This is the standard
billion-vector recipe (IVF-PQ): at 10^12 embeddings the raw float corpus
is ~256 TB while the 4-byte PQ codes are ~4 TB, the difference between
"cannot even scan" and one columnar pass.

Scale shape: codebooks are m x k x (dim/m) — a few KB, fit driver-side
exactly like the IVF centroids (kmeans_fit returns plain lists), and the
encode is ONE map-only pass of JVM argmin expressions (array_min over
(dist, idx) structs — identical tie discipline to assign_clusters). ADC
scoring is a literal-array lookup + m-term add, also map-only; the only
wide operation anywhere is kmeans_fit's per-round (cluster, dim) combine
shuffle, paid once at index-build time.

Determinism: codebooks use kmeans_fit(portable=True) — md5-seeded init,
fixed rounds, portable-rounded centroids — so the ENTIRE fit-encode-score
trajectory is restatable in ANSI SQL and the driver row is value-checked
(the same discipline that upgraded ann_ivf_kmeans in r3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codebased_spark.dedup.embedding import _as_double
from codebased_spark.similarity.kmeans import _sq_dist, kmeans_fit
from codebased_spark.util import round_stable


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    n_iter: int = 3,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = True,
    driver_threshold: int = 0,
) -> list[list[list[float]]]:
    """Per-subspace codebooks: m independent k-means fits over the
    sliced vectors. Same seed for every subspace — the md5 init order is
    id-based, so each subspace inits from the same example vectors.

    Under `driver_threshold` (portable mode) the sample is collected ONCE
    and sliced driver-side — slicing commutes with the fit, so this is
    byte-identical to m separate collects at a quarter of the job count
    (pinned in tests/test_kmeans_driver.py::test_pq_topk_identical...)."""
    sub = dim // m
    if portable and driver_threshold:
        from codebased_spark.similarity.kmeans import _kmeans_fit_driver

        rows = (
            emb.select(id_col, _as_double(vec_col).alias("v"))
            .limit(driver_threshold + 1)
            .collect()
        )
        if len(rows) <= driver_threshold:
            sample = [(r[0], list(r[1])) for r in rows]
            return [
                _kmeans_fit_driver(
                    [(i, v[s * sub : (s + 1) * sub]) for i, v in sample],
                    k=k, max_iter=n_iter, seed=seed, round_decimals=6,
                )
                for s in range(m)
            ]
    return [
        kmeans_fit(
            emb.select(
                id_col, F.slice(_as_double(vec_col), s * sub + 1, sub).alias("embedding")
            ),
            k=k,
            max_iter=n_iter,
            seed=seed,
            portable=portable,
            driver_threshold=driver_threshold,
        )
        for s in range(m)
    ]


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code_0..code_{m-1}): per-subspace argmin over the codebook —
    one map-only select, low-index tie-break (array_min over structs)."""
    m = len(codebooks)
    sub = dim // m
    v = _as_double(vec_col)
    cols = []
    for s, book in enumerate(codebooks):
        vs = F.slice(v, s * sub + 1, sub)
        scored = F.array(
            *[
                F.struct(_sq_dist(vs, c).alias("d"), F.lit(i).alias("i"))
                for i, c in enumerate(book)
            ]
        )
        cols.append(F.array_min(scored)["i"].alias(f"code_{s}"))
    return emb.select(F.col(id_col), *cols)


def ann_pq_topk(
    emb: DataFrame,
    query_id: int = 0,
    topk: int = 10,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    n_iter: int = 3,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    driver_threshold: int = 0,
) -> DataFrame:
    """ADC top-k: each candidate's distance is the sum of m table lookups
    keyed by its codes — the original vectors never enter the query scan.

    Output (vec_id, pq_code, adc_dist): adc_dist ascending (then id),
    portable-rounded so the cross-engine hash gate can be exact.
    """
    from codebased_spark.similarity.ann import _query_vec

    books = pq_fit(
        emb, m=m, k=k, dim=dim, n_iter=n_iter, seed=seed,
        id_col=id_col, vec_col=vec_col, driver_threshold=driver_threshold,
    )
    codes = pq_encode(emb, books, dim=dim, id_col=id_col, vec_col=vec_col)
    qv = _query_vec(emb, query_id, id_col, vec_col)
    return _adc_rank(codes, books, qv, dim, id_col, query_id, topk)


def _adc_rank(codes, books, qv, dim, id_col, query_id, topk):
    """Shared ADC scoring tail: m x k squared query-to-codeword distance
    tables shipped as literal arrays; per-row distance is m lookups + an
    add, ranked ascending with id tie-break."""
    m = len(books)
    sub = dim // m
    dist = F.lit(0.0)
    for s, book in enumerate(books):
        qs = qv[s * sub : (s + 1) * sub]
        table = [
            sum((a - b) * (a - b) for a, b in zip(qs, c)) for c in book
        ]
        lut = F.array(*[F.lit(float(x)) for x in table])
        dist = dist + F.element_at(lut, F.col(f"code_{s}") + 1)
    return (
        codes.where(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            F.concat_ws(
                "-", *[F.col(f"code_{s}").cast("string") for s in range(m)]
            ).alias("pq_code"),
            round_stable(dist).alias("adc_dist"),
        )
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(topk)
    )


def ann_ivfpq_topk(
    emb: DataFrame,
    query_id: int = 0,
    topk: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k: int = 8,
    dim: int = 64,
    n_iter: int = 3,
    n_iter_cells: int = 4,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    driver_threshold: int = 0,
) -> DataFrame:
    """The composed IVF-PQ stack — the standard billion-vector serving
    architecture: an IVF coarse quantizer (kmeans_fit portable) prunes
    the scan to the n_probe cells nearest the query, and PQ ADC lookups
    score only those members. At 10^12 vectors the scan touches
    n_probe/n_cells of the code table (itself 64x smaller than the float
    corpus); both fits are index-build-time and sample-trainable
    (driver_threshold). Same output contract as ann_pq_topk.
    """
    from codebased_spark.similarity.ann import _query_vec
    from codebased_spark.similarity.kmeans import assign_clusters

    cells = kmeans_fit(
        emb, k=n_cells, max_iter=n_iter_cells, seed=seed, portable=True,
        id_col=id_col, vec_col=vec_col, driver_threshold=driver_threshold,
    )
    qv = _query_vec(emb, query_id, id_col, vec_col)
    dists = [sum((a - b) ** 2 for a, b in zip(qv, c)) for c in cells]
    probes = sorted(range(len(dists)), key=lambda i: (dists[i], i))[:n_probe]
    cand = assign_clusters(emb, cells, vec_col=vec_col).where(
        F.col("cluster").isin(probes)
    )
    books = pq_fit(
        emb, m=m, k=k, dim=dim, n_iter=n_iter, seed=seed,
        id_col=id_col, vec_col=vec_col, driver_threshold=driver_threshold,
    )
    codes = pq_encode(cand, books, dim=dim, id_col=id_col, vec_col=vec_col)
    return _adc_rank(codes, books, qv, dim, id_col, query_id, topk)
