"""Reference-exactness tests for the round-11 wave-3/4 operators: each
key's core math pinned against a hand case or a pure-python reference on
a synthetic fixture directory (the q_auc_roc/q_linreg_fit idiom — build
a tiny events.parquet in tmp_path, run the registered fn, assert exact
values)."""

from __future__ import annotations

import pandas as pd

from real_time_rides_data_pipeline_spark.queries import registry

SPECS = registry()


def _events(spark, tmp_path, rows: dict, name: str = "sf_ev") -> str:
    pdf = pd.DataFrame(rows)
    d = tmp_path / name
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "events.parquet"))
    return str(d)


def _ev_rows(values, types=None, users=None, hours=None, ids=None):
    n = len(values)
    return {
        "event_id": list(ids) if ids is not None else list(range(n)),
        "ts": pd.to_datetime(
            [f"2026-01-01 {h:02d}:00:00" for h in (hours or [0] * n)]
            if hours is None or max(hours) < 24
            else [
                pd.Timestamp("2026-01-01") + pd.Timedelta(hours=h)
                for h in hours
            ]
        ),
        "user_id": list(users) if users is not None else [1] * n,
        "event_type": list(types) if types is not None else ["click"] * n,
        "value": [float(v) for v in values],
        "props": ["{}"] * n,
    }


# --- Spearman: perfect monotone / anti-monotone / tie reference ---------


def test_spearman_perfect_monotone(spark, tmp_path):
    """User activity (count) and spend rise together -> rho == +1."""
    rows = []
    values, users = [], []
    for u in range(1, 6):  # user u has u events of value u
        values += [float(u)] * u
        users += [u] * u
    d = _events(spark, tmp_path, _ev_rows(values, users=users))
    row = SPECS["q_spearman_corr"].fn(spark, d).collect()[0]
    assert row["n_users"] == 5
    assert row["spearman_ppm"] == 1000000


def test_spearman_anti_monotone(spark, tmp_path):
    """More events, lower spend -> rho == -1 (floor(-1e6) == -1e6)."""
    values, users = [], []
    for u in range(1, 6):
        values += [float(6 - u) / u] * u  # total cents decreasing in u
        users += [u] * u
    # totals: u=1: 5.00, u=2: 2x2.00=4.00, u=3: 3x1.00=3.00, ...
    d = _events(spark, tmp_path, _ev_rows(values, users=users))
    row = SPECS["q_spearman_corr"].fn(spark, d).collect()[0]
    assert row["spearman_ppm"] == -1000000


# --- Cohen's d: hand case -------------------------------------------------


def test_cohens_d_hand_case(spark, tmp_path):
    """purchase cents {100,200,300}, click cents {100,100,100+3}:
    recompute d/g through the same double tree."""
    vals = [1.00, 2.00, 3.00, 1.00, 1.00, 1.03]
    types = ["purchase"] * 3 + ["click"] * 3
    d = _events(spark, tmp_path, _ev_rows(vals, types=types))
    row = SPECS["q_cohens_d"].fn(spark, d).collect()[0]
    import math

    n1, n2 = 3, 3
    sa1, sq1 = 600, 100**2 + 200**2 + 300**2
    sa2, sq2 = 303, 100**2 + 100**2 + 103**2
    md = sa1 / n1 - sa2 / n2
    sp2 = ((sq1 - sa1 * sa1 / n1) + (sq2 - sa2 * sa2 / n2)) / (n1 + n2 - 2)
    dd = md / math.sqrt(sp2)
    assert row["n1"] == 3 and row["n2"] == 3
    assert row["d_e6"] == math.floor(dd * 1000000)
    assert row["g_e6"] == math.floor(
        dd * (1.0 - 3.0 / (4.0 * 6 - 9.0)) * 1000000
    )


# --- bootstrap CI: bracket + determinism ---------------------------------


def test_bootstrap_ci_brackets_mean(spark):
    import os

    sf = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
    r1 = SPECS["q_bootstrap_ci"].fn(spark, sf).collect()[0]
    r2 = SPECS["q_bootstrap_ci"].fn(spark, sf).collect()[0]
    assert r1 == r2  # hash-bit replicates are a pure function of the data
    assert r1["n_resamples"] == 60
    assert r1["ci_lo_e4"] <= r1["mean_e4"] <= r1["ci_hi_e4"]


# --- isotonic: monotone output + pure-python PAV reference ---------------


def _pav(ns, ps):
    """Classic pool-adjacent-violators over (n, pos) blocks."""
    stack: list[list[int]] = []  # [weight, pos] merged blocks
    for w, p in zip(ns, ps):
        stack.append([w, p])
        while len(stack) > 1 and (
            stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]
        ):
            w2, p2 = stack.pop()
            stack[-1][0] += w2
            stack[-1][1] += p2
    res = []
    i = 0
    for w, p in stack:  # expand each merged block back to its inputs
        acc = 0
        while acc < w:
            acc += ns[i]
            res.append(p / w)
            i += 1
    return res


def test_isotonic_matches_python_pav(spark, tmp_path):
    """A designed violation pattern: rates [1, 0, 1/2, 1] over 4 distinct
    scores pool to the exact PAV solution, and the output is monotone."""
    # score cents 100,200,300,400 with (n, pos) = (2,2),(2,0),(2,1),(2,2)
    vals, types = [], []
    spec = [(1.00, 2, 2), (2.00, 2, 0), (3.00, 2, 1), (4.00, 2, 2)]
    for v, n, pos in spec:
        for i in range(n):
            vals.append(v)
            types.append("purchase" if i < pos else "click")
    d = _events(spark, tmp_path, _ev_rows(vals, types=types))
    rows = sorted(
        SPECS["q_isotonic_calibrate"].fn(spark, d).collect(),
        key=lambda r: r["bin"],
    )
    fitted = [r["fitted_ppm"] for r in rows]
    assert fitted == sorted(fitted), fitted  # monotone by construction
    import math

    ref = _pav([n for _, n, _ in spec], [p for _, _, p in spec])
    assert len(rows) == 4
    assert fitted == [math.floor(f * 1000000) for f in ref], (fitted, ref)


# --- changepoint: exact level shift --------------------------------------


def test_changepoint_finds_exact_shift(spark, tmp_path):
    """Hours 0-5 at 100 cents, hours 6-11 at 900 -> the split is hour 5
    (last left-segment hour) with exact means."""
    hours = list(range(12))
    vals = [1.00] * 6 + [9.00] * 6
    d = _events(spark, tmp_path, _ev_rows(vals, hours=hours))
    row = SPECS["q_changepoint_mean"].fn(spark, d).collect()[0]
    assert str(row["split_hour_ts"]) == "2026-01-01 05:00:00"
    assert row["n_left"] == 6 and row["n_right"] == 6
    assert row["mean_left_e4"] == 100 * 10000
    assert row["mean_right_e4"] == 900 * 10000


# --- EWMA crossover: designed golden cross --------------------------------


def test_ewma_crossover_detects_cross(spark, tmp_path):
    """A step from 0-ish to high level flips 17*fast > slow exactly when
    the python reference says so."""
    hours = list(range(16))
    vals = [0.01] * 8 + [5.00] * 8
    d = _events(spark, tmp_path, _ev_rows(vals, hours=hours))
    rows = SPECS["q_ewma_crossover"].fn(spark, d).collect()
    # python reference
    hc = [1] * 8 + [500] * 8
    def wsum(t, k):
        return sum(
            (1 << (k - 1 - i)) * (hc[t - i] if t - i >= 0 else 0)
            for i in range(k)
        )
    golden = [17 * wsum(t, 4) > wsum(t, 8) for t in range(16)]
    expect = [
        (t, golden[t]) for t in range(1, 16) if golden[t] != golden[t - 1]
    ]
    got = sorted((r["hour_ts"].hour, r["golden"]) for r in rows)
    assert got == expect, (got, expect)


# --- F1 threshold: hand case ----------------------------------------------


def test_f1_threshold_hand_case(spark, tmp_path):
    """pos cents {300,400}, neg {100,200}: t=300 gives P=R=1 -> F1=1."""
    vals = [3.00, 4.00, 1.00, 2.00]
    types = ["purchase", "purchase", "click", "click"]
    d = _events(spark, tmp_path, _ev_rows(vals, types=types))
    row = SPECS["q_f1_threshold"].fn(spark, d).collect()[0]
    assert row["threshold_cents"] == 300
    assert row["tp"] == 2 and row["fp"] == 0 and row["fn"] == 0
    assert row["f1_e6"] == 1000000


# --- Poisson rate: hand case ----------------------------------------------


def test_poisson_rate_hand_case(spark, tmp_path):
    import math

    vals = [1.0] * 9 + [1.0] * 4
    types = ["purchase"] * 9 + ["error"] * 4
    d = _events(spark, tmp_path, _ev_rows(vals, types=types))
    row = SPECS["q_poisson_rate_test"].fn(spark, d).collect()[0]
    z = (9 - 4) / math.sqrt(13)
    assert row["n1"] == 9 and row["n2"] == 4
    assert row["rate_ratio_e6"] == 9 * 1000000 // 4
    assert row["z_e6"] == math.floor(z * 1000000)
    assert not row["significant_05"]  # z = 1.387 < 1.96


# --- TV drift: identical halves = 0, disjoint halves = 1 ------------------


def test_tv_drift_extremes(spark, tmp_path):
    # identical halves: same value multiset in each half
    hours = [0, 1, 2, 3]
    vals = [1.00, 2.00, 1.00, 2.00]
    d = _events(spark, tmp_path, _ev_rows(vals, hours=hours), "sf_tv0")
    row = SPECS["q_tv_drift"].fn(spark, d).collect()[0]
    assert row["tv_e6"] == 0
    # disjoint halves: all mass moves
    vals2 = [1.00, 1.00, 9.00, 9.00]
    d2 = _events(spark, tmp_path, _ev_rows(vals2, hours=hours), "sf_tv1")
    row2 = SPECS["q_tv_drift"].fn(spark, d2).collect()[0]
    assert row2["tv_e6"] == 1000000


# --- HHI: uniform shares --------------------------------------------------


def test_hhi_uniform_shares(spark, tmp_path):
    """4 equal users -> HHI = 1/4, eff users = 4.00, top share = 1/4."""
    vals = [2.50] * 4
    users = [1, 2, 3, 4]
    d = _events(spark, tmp_path, _ev_rows(vals, users=users))
    row = SPECS["q_hhi_concentration"].fn(spark, d).collect()[0]
    assert row["n_users"] == 4
    assert row["hhi_e8"] == 25000000
    assert row["eff_users_e2"] == 400
    assert row["top1_ppm"] == 250000


# --- Pareto: crossing properties on the fixture ---------------------------


def test_pareto_crossing_properties(spark):
    import os

    sf = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
    for r in SPECS["q_pareto_8020"].fn(spark, sf).collect():
        assert 1 <= r["users_to_80"] <= r["n_users"]
        assert r["share_at_cut_ppm"] >= 800000  # crossing reached >= 80%


# --- burstiness: strictly periodic user -> B == -1 -------------------------


def test_burstiness_periodic_user(spark, tmp_path):
    hours = list(range(6))  # exactly 1h gaps -> sigma 0 -> B = -1
    d = _events(spark, tmp_path, _ev_rows([1.0] * 6, hours=hours))
    row = SPECS["q_burstiness_index"].fn(spark, d).collect()[0]
    assert row["n_gaps"] == 5
    assert row["mean_gap_us"] == 3600 * 1000000
    assert row["burstiness_e6"] == -1000000


# --- quantile normalization: rank preservation ----------------------------


def test_quantile_normalize_preserves_order(spark):
    import os

    sf = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
    rows = SPECS["q_quantile_normalize"].fn(spark, sf).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: (r["cents"], r["event_id"]))
        norms = [r["norm_e6"] for r in rs]
        assert norms == sorted(norms), t  # monotone in within-type rank


# --- readability: hand case ------------------------------------------------


def test_readability_hand_case(spark, tmp_path):
    import math

    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["Hello world."],
            "lang": ["en"],
            "source": ["t"],
            "n_chars": [12],
        }
    )
    d = tmp_path / "sf_doc"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    row = SPECS["q_readability"].fn(spark, str(d)).collect()[0]
    # words=2, sentences=1, vowel clusters: e, o, o -> 3
    assert row["words"] == 2 and row["sentences"] == 1
    assert row["syllables"] == 3
    fl = 206.835 - 1.015 * 2.0 - 84.6 * 1.5
    assert row["flesch_e4"] == math.floor(fl * 10000)


# --- WoW growth: hand case -------------------------------------------------


def test_wow_growth_hand_case(spark, tmp_path):
    rows = _ev_rows([1.00, 3.00], hours=[0, 0])
    rows["ts"] = pd.to_datetime(["2024-01-01", "2024-01-08"])
    d = _events(spark, tmp_path, rows)
    out = {
        r["week_idx"]: r
        for r in SPECS["q_wow_growth"].fn(spark, d).collect()
    }
    assert out[0]["prev_cents"] is None and out[0]["growth_ppm"] is None
    assert out[1]["prev_cents"] == 100
    assert out[1]["growth_ppm"] == 2000000  # 100 -> 300 = +200%


# --- new users weekly: hand case -------------------------------------------


def test_new_users_weekly_hand_case(spark, tmp_path):
    rows = _ev_rows([1.0] * 4, users=[1, 2, 1, 3])
    rows["ts"] = pd.to_datetime(
        ["2024-01-01", "2024-01-02", "2024-01-08", "2024-01-09"]
    )
    d = _events(spark, tmp_path, rows)
    out = {
        r["week_idx"]: r
        for r in SPECS["q_new_users_weekly"].fn(spark, d).collect()
    }
    assert out[0]["new_users"] == 2 and out[0]["returning_users"] == 0
    assert out[1]["new_users"] == 1 and out[1]["returning_users"] == 1
    assert out[1]["cum_users"] == 3


# --- basket lift: hand case -------------------------------------------------


def test_basket_lift_hand_case(spark, tmp_path):
    """3 users: {click,purchase}, {click}, {purchase} ->
    lift(click,purchase) = (1/3)/((2/3)(2/3)) = 3/4."""
    users = [1, 1, 2, 3]
    types = ["click", "purchase", "click", "purchase"]
    d = _events(spark, tmp_path, _ev_rows([1.0] * 4, users=users, types=types))
    row = SPECS["q_basket_lift"].fn(spark, d).collect()[0]
    assert (row["type_a"], row["type_b"]) == ("click", "purchase")
    assert row["n_a"] == 2 and row["n_b"] == 2 and row["n_both"] == 1
    assert row["lift_e6"] == 750000
    assert row["support_ppm"] == 333333


# --- windowFunnel: any-anchor semantics + window exclusion -----------------


def test_window_funnel_any_anchor(spark, tmp_path):
    """User 1: first view dead-ends, later view->click->purchase completes
    in-window -> level 3 (q_funnel_steps' first-touch anchor would miss
    it if the later chain were the only completion). User 2: chain spans
    more than 6h -> level 2 only."""
    rows = _ev_rows([1.0] * 8)
    rows["user_id"] = [1, 1, 1, 1, 1, 2, 2, 2]
    rows["event_type"] = [
        "view", "purchase",            # dead-end anchor for user 1
        "view", "click", "purchase",   # completing chain, tight
        "view", "click", "purchase",   # user 2: purchase out of window
    ]
    rows["ts"] = pd.to_datetime(
        [
            "2026-01-01 00:00:00",
            # purchase BEFORE any click: not a conversion
            "2026-01-01 00:30:00",
            "2026-01-01 10:00:00",
            "2026-01-01 10:05:00",
            "2026-01-01 11:00:00",   # span 1h <= 6h -> level 3
            "2026-01-02 00:00:00",
            "2026-01-02 00:10:00",   # click in-window -> level 2
            "2026-01-02 07:00:00",   # purchase 7h after view -> excluded
        ]
    )
    d = _events(spark, tmp_path, rows)
    row = SPECS["q_window_funnel"].fn(spark, d).collect()[0]
    assert row["n_users"] == 2
    assert row["l1_users"] == 2
    assert row["l2_users"] == 2
    assert row["l3_users"] == 1  # only user 1 completes in-window
    assert row["full_funnel_ppm"] == 500000


def test_patchify_hand_case(spark, tmp_path):
    """A 32-byte payload -> width 48, height 16 -> 3x1 patches with exact
    offsets."""
    pdf = pd.DataFrame(
        {
            "doc_id": [7],
            "text": ["x" * 32],  # 32 bytes -> w = 32%64+16 = 48, h = 16
            "lang": ["en"],
            "source": ["t"],
            "n_chars": [32],
        }
    )
    d = tmp_path / "sf_patch"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    rows = sorted(
        SPECS["q_patchify_meta"].fn(spark, str(d)).collect(),
        key=lambda r: r["patch_idx"],
    )
    assert len(rows) == 3  # (48//16) * (16//16)
    assert [(r["px"], r["py"], r["x0"], r["byte_offset"]) for r in rows] == [
        (0, 0, 0, 0), (1, 0, 16, 768), (2, 0, 32, 1536)
    ]


# --- mix drift: uniform weeks = 0 -------------------------------------------


def test_mix_drift_uniform_is_zero(spark, tmp_path):
    """Identical mix every week -> TV = 0 for each week; a fully flipped
    week reads the exact cross-multiplied distance."""
    rows = _ev_rows([1.0] * 8)
    rows["event_type"] = ["view", "click"] * 4
    rows["ts"] = pd.to_datetime(
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
         "2024-01-08", "2024-01-09", "2024-01-10", "2024-01-11"]
    )
    d = _events(spark, tmp_path, rows)
    out = {r["week_idx"]: r["mix_tv_e6"]
           for r in SPECS["q_mix_drift"].fn(spark, d).collect()}
    assert out == {0: 0, 1: 0}


def test_mix_drift_flipped_week(spark, tmp_path):
    """Week 0 all 'view', week 1 all 'click' (equal sizes): each week's
    mix is distance 1/2 from the 50/50 global mix."""
    rows = _ev_rows([1.0] * 8)
    rows["event_type"] = ["view"] * 4 + ["click"] * 4
    rows["ts"] = pd.to_datetime(
        ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
         "2024-01-08", "2024-01-09", "2024-01-10", "2024-01-11"]
    )
    d = _events(spark, tmp_path, rows)
    out = {r["week_idx"]: r["mix_tv_e6"]
           for r in SPECS["q_mix_drift"].fn(spark, d).collect()}
    assert out == {0: 500000, 1: 500000}


# --- survivorship: priority beats id ----------------------------------------


def test_survivorship_priority_beats_id(spark, tmp_path):
    """Same text from web (doc 1) and wiki (doc 2): the wiki copy
    survives despite the higher doc_id; unique texts survive alone."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["same text", "same text", "unique"],
            "lang": ["en"] * 3,
            "source": ["web", "wiki", "web"],
            "n_chars": [9, 9, 6],
        }
    )
    d = tmp_path / "sf_surv"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))
    rows = {r["doc_id"]: r for r in
            SPECS["q_dedup_survivorship"].fn(spark, str(d)).collect()}
    assert set(rows) == {2, 3}
    assert rows[2]["source"] == "wiki" and rows[2]["n_copies"] == 2
    assert rows[3]["n_copies"] == 1
