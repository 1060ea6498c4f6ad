"""Analytic HBM footprint model (utils/hbm.py) — ordering + the known
r3 OOM prediction (VERDICT r3 #6)."""

from tsxcount_tpu.utils.hbm import estimate_hbm, preflight_check

V5E_MB = 15.75 * 1024


def test_known_good_configs_fit():
    for kw in (
        dict(k=14, l=24, batch_words=602112),
        dict(k=31, l=24, batch_words=602112),
        dict(k=63, l=25, batch_words=602112),
        dict(k=127, l=25, batch_words=602112),
        dict(k=14, l=26, batch_words=602112, backend="table"),
    ):
        est = estimate_hbm(**kw)
        assert preflight_check(est, capacity_mb=V5E_MB) is None, kw


def test_r3_oom_case_predicted():
    """k=127 l=25 hash-first with the compiled cond fallback OOMed at
    18.4/15.75 GB on the v5e (bench_results/report.md r3); the model must
    flag it — and must NOT flag the r4 flag-mode replacement."""
    cond = estimate_hbm(k=127, l=25, batch_words=602112, hash_first=True,
                        collide_mode="cond")
    assert preflight_check(cond, capacity_mb=V5E_MB) is not None
    flag = estimate_hbm(k=127, l=25, batch_words=602112, hash_first=True,
                        collide_mode="flag")
    assert flag.total_mb < cond.total_mb


def test_monotonic_in_l_and_k():
    base = estimate_hbm(k=31, l=22, batch_words=602112).total_mb
    assert estimate_hbm(k=31, l=26, batch_words=602112).total_mb > base
    assert estimate_hbm(k=63, l=22, batch_words=602112).total_mb > base
    assert estimate_hbm(
        k=31, l=22, batch_words=602112 * 2
    ).total_mb > base


def test_sharded_models_per_device_state():
    one = estimate_hbm(k=31, l=26, batch_words=602112, n_shards=1)
    eight = estimate_hbm(k=31, l=26, batch_words=602112, n_shards=8)
    assert eight.state_mb < one.state_mb  # the table splits across shards
