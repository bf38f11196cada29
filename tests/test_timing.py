"""robust_diff_time: the bench's differential stage timer must never report
a negative per-iteration time, even under remote-tunnel dispatch jitter
(VERDICT r3 item 4 — BENCH_r03 recorded ``encode=-11.47ms`` from a
min-of-batches differential when one batch caught a ~10 ms spike)."""

import numpy as np

from mast3r_slam_tpu.utils.timing import robust_diff_time


def _make_run(base_s, overhead_s, rng, jitter_s=0.0, p_spike=0.0):
    """Simulated fenced batch: n*base + fixed overhead + random spikes."""

    def run(n):
        t = n * base_s + overhead_s
        if jitter_s and rng.random() < p_spike:
            t += rng.random() * jitter_s
        return t

    return run


def test_accurate_without_jitter():
    rng = np.random.default_rng(0)
    run = _make_run(5e-3, 10e-3, rng)
    dt, ub = robust_diff_time(run, n1=5, n2=15, reps=3)
    assert not ub
    assert abs(dt - 5e-3) < 1e-9  # exact: overhead cancels in the slope


def test_positive_under_10ms_jitter():
    # 10 ms spikes against a 5 ms signal, every spike pattern over many seeds:
    # the r3 failure mode (negative differential) must be impossible
    for seed in range(200):
        rng = np.random.default_rng(seed)
        run = _make_run(5e-3, 10e-3, rng, jitter_s=10e-3, p_spike=0.5)
        dt, _ = robust_diff_time(run, n1=5, n2=15, reps=3)
        assert dt > 0.0, seed
        assert np.isfinite(dt)
        # clamped by the fastest whole-batch average: can never exceed the
        # per-iteration cost including all overhead and a full spike
        assert dt <= (15 * 5e-3 + 10e-3 + 10e-3) / 15


def test_adversarial_all_spikes_falls_back_to_upper_bound():
    # every n1 batch spiked, no n2 batch spiked -> raw differential would be
    # negative; estimator must fall back to the (positive) batch average
    calls = {"i": 0}

    def run(n):
        calls["i"] += 1
        t = n * 2e-3 + 5e-3
        if n == 5:  # poison only the small batches
            t += 50e-3
        return t

    dt, ub = robust_diff_time(run, n1=5, n2=15, reps=3)
    assert dt > 0.0
    assert ub  # flagged as an upper bound
    assert abs(dt - (15 * 2e-3 + 5e-3) / 15) < 1e-12
