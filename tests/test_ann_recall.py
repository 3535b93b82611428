"""ANN quality instrumentation (tools/ann_recall.py): the measurement
harness runs, and the recall/candidate tradeoff moves the right way —
more probes must never lose recall or shrink the candidate pool."""

from tools.ann_recall import measure

SF_DIR = "/root/testdata/sf0.001"


def test_recall_measurement_and_tradeoff_monotonicity():
    m = measure(SF_DIR, k=3)
    assert m["n"] > 0
    assert 0.0 <= m["lsh"]["recall_at_k"] <= 1.0
    probes = m["ivf"]["nprobe"]
    r1, r2, r4 = (probes[p]["recall_at_k"] for p in ("1", "2", "4"))
    c1, c2, c4 = (probes[p]["avg_candidates"] for p in ("1", "2", "4"))
    assert r1 <= r2 <= r4
    assert c1 <= c2 <= c4
    # multi-probe must buy real recall on this corpus (measured ~4x)
    assert r4 > r1
    # and still scan far fewer candidates than brute force
    assert c4 < m["n"]


def test_recall_bars_at_correctness_sf():
    """Both approximate-search recall paths must hold recall@3 >= 0.8 on
    the driver's correctness corpus (sf0.01) under FAITHFUL accounting
    (index side indexed exactly as the queries index it):
      - q_embedding_ann_lsh_mt (16-table OR-amplified sign-LSH): 0.90
      - q_embedding_ann_ivf_mp (probe=6/index=2 over trained k-means
        centroids): 0.85
    Amplification must also dominate the structures it amplifies, and
    both must remain genuine pruning structures, not brute force.
    """
    m = measure("/root/testdata/sf0.01", k=3)
    assert m["lsh_mt"]["recall_at_k"] >= 0.8, m["lsh_mt"]
    assert m["lsh_mt"]["recall_at_k"] > m["lsh"]["recall_at_k"]
    assert m["lsh_mt"]["avg_candidates"] < m["n"]
    # multi-probe (4 tables x 4 probes) must hold the same bar as the
    # 16-table build it replaces on the scale path (measured 0.913 vs
    # 0.903) while indexing a quarter of the rows
    assert m["lsh_mp"]["recall_at_k"] >= 0.8, m["lsh_mp"]
    assert m["lsh_mp"]["recall_at_k"] >= m["lsh_mt"]["recall_at_k"] - 0.05
    assert m["lsh_mp"]["avg_candidates"] < m["n"]
    mp = m["ivf"]["nprobe"]["6"]
    assert mp["recall_at_k"] >= 0.8, mp
    assert mp["recall_at_k"] > m["ivf"]["single_probe_single_index"]["recall_at_k"]
    assert mp["avg_candidates"] < m["n"]
