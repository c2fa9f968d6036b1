

# ----------------------------------------------------------- persistence --
def test_index_save_load_roundtrip(spark, tmp_path):
    """Every index family reloads to an object that answers queries
    identically — train once, probe from any later job."""
    import pytest as _pytest

    from flink_rtcef_spark.operators.similarity import (
        IVFIndex,
        ProductQuantizer,
        RandomHyperplaneLSH,
        load_index,
        save_index,
    )
    from flink_rtcef_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim = len(emb.first()["embedding"])
    q = [float((i * 7) % 5 - 2) for i in range(dim)]

    ivf = IVFIndex(n_cells=4, n_iter=3).fit(emb)
    save_index(ivf, str(tmp_path / "ivf.pkl"))
    ivf2 = load_index(str(tmp_path / "ivf.pkl"), expect=IVFIndex)
    assert (ivf2.centroids == ivf.centroids).all()
    got = [r["vec_id"] for r in ivf2.ann_topk(emb, q, k=5).collect()]
    want = [r["vec_id"] for r in ivf.ann_topk(emb, q, k=5).collect()]
    assert got == want

    pq = ProductQuantizer(m=4, k=8, n_iter=3).fit(emb)
    save_index(pq, str(tmp_path / "pq.pkl"))
    pq2 = load_index(str(tmp_path / "pq.pkl"), expect=ProductQuantizer)
    assert (pq2.codebooks == pq.codebooks).all()

    lsh = RandomHyperplaneLSH(dim=dim, n_planes=4, n_tables=2)
    save_index(lsh, str(tmp_path / "lsh.pkl"))
    lsh2 = load_index(str(tmp_path / "lsh.pkl"), expect=RandomHyperplaneLSH)
    a = {r["vec_id"] for r in lsh2.bucketize(emb).select("vec_id").collect()}
    b = {r["vec_id"] for r in lsh.bucketize(emb).select("vec_id").collect()}
    assert a == b
    assert lsh2.probe_buckets(q) == lsh.probe_buckets(q)

    # envelope guards: class mismatch and non-index files fail loudly
    with _pytest.raises(TypeError):
        load_index(str(tmp_path / "ivf.pkl"), expect=ProductQuantizer)
    import pickle

    (tmp_path / "junk.pkl").write_bytes(pickle.dumps([1, 2]))
    with _pytest.raises(TypeError):
        load_index(str(tmp_path / "junk.pkl"))


# ------------------------------------------------------- trainer routing --
def test_fit_routes_distributed_above_sample_bound(spark):
    """Corpora over the sample bound must train DISTRIBUTED by default
    (VERDICT r3 item 7): the centroids equal kmeans_fit_distributed's,
    driver_sample=True keeps the sampled path, and a missing id column
    fails fast instead of silently collecting an unbounded corpus."""
    import numpy as np
    import pytest

    from flink_rtcef_spark.operators.similarity import (
        IVFIndex,
        ProductQuantizer,
        kmeans_fit_distributed,
        pq_fit_distributed,
    )

    rows = [
        (i, [float((i * 13 + j * 7) % 11 - 5) for j in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    routed = IVFIndex(n_cells=4, n_iter=3).fit(df, sample=10)
    want = kmeans_fit_distributed(df, k=4, n_iter=3)
    assert np.allclose(routed.centroids, want.centroids)

    sampled = IVFIndex(n_cells=4, n_iter=3).fit(df, sample=10, driver_sample=True)
    assert sampled.centroids.shape == (4, 8)

    with pytest.raises(ValueError, match="driver_sample"):
        IVFIndex(n_cells=4).fit(df.select("embedding"), sample=10)

    routed_pq = ProductQuantizer(m=4, k=4, n_iter=3).fit(df, sample=10)
    want_pq = pq_fit_distributed(df, m=4, k=4, n_iter=3)
    assert np.allclose(routed_pq.codebooks, want_pq.codebooks)

    with pytest.raises(ValueError, match="driver_sample"):
        ProductQuantizer(m=4, k=4).fit(df.select("embedding"), sample=10)
