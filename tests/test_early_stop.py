"""EarlyStopper semantics: reference-parity at min_delta=0 (train.py:211-236)
plus the min-delta patience rule."""
from tvretrieval_tpu.training.early_stop import EarlyStopper


def run(scores, **kw):
    st = EarlyStopper(**kw)
    out = []
    for s in scores:
        is_best, stop = st.update(s)
        out.append((is_best, stop))
        if stop:
            break
    return st, out


def test_reference_behavior_min_delta_zero():
    # strict improvement resets patience; ties/declines count toward stop
    st, out = run([1.0, 2.0, 2.0, 1.5, 2.5], max_es_cnt=10)
    assert [b for b, _ in out] == [True, True, False, False, True]
    assert st.best == 2.5 and st.es_cnt == 0


def test_stop_after_patience():
    scores = [5.0] + [4.0] * 11
    st, out = run(scores, max_es_cnt=10)
    assert out[-1][1] is True          # stops when es_cnt exceeds max
    assert len(out) == 12              # 1 best + 11 non-improving epochs


def test_disabled_with_minus_one():
    _, out = run([1.0] + [0.0] * 50, max_es_cnt=-1)
    assert not any(stop for _, stop in out)


def test_min_delta_noise_does_not_reset_patience():
    # plateau crawling upward by 0.01 quanta: every epoch is a new best
    # (checkpoint updates), but patience keeps counting and stops
    scores = [100.0] + [100.0 + 0.01 * i for i in range(1, 15)]
    st, out = run(scores, max_es_cnt=5, min_delta=0.5)
    assert all(b for b, _ in out)      # each tick IS a new best
    assert out[-1][1] is True          # ...yet the run stops
    assert len(out) == 7               # 1 material + 6 immaterial epochs
    assert st.best == scores[6]        # best tracked through the crawl


def test_min_delta_material_improvement_resets():
    st, out = run([100.0, 100.2, 101.0, 100.9], max_es_cnt=5, min_delta=0.5)
    # 100.2 is immaterial (es->1) but still raises best; 101.0 clears
    # best+delta and resets; 100.9 is immaterial again
    assert [st_.es_cnt for st_ in [st]] == [1]
    assert st.best == 101.0
