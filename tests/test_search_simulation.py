"""IVF-style ANN simulation: exactness at full probe, sane partial recall."""
from tvretrieval_tpu.profiling.search_simulation import simulate


def test_ivf_exact_at_full_probe():
    res = simulate(n_videos=1200, n_queries=10, dim=16, n_clusters=8, nprobe=8)
    assert res["ivf_recall_at_topk"] == 1.0


def test_ivf_partial_probe_recall_reasonable():
    res = simulate(n_videos=1200, n_queries=10, dim=16, n_clusters=8, nprobe=2)
    assert 0.1 < res["ivf_recall_at_topk"] <= 1.0
