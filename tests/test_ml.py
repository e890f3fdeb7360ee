"""Tests for the round-8 model-evaluation / feature-engineering surface
(queries_ml.py + operators/pca.py).

The registry-parametrized smoke + oracle tests in test_oracle.py already
cover every key at sf0.01; this file pins the claims an oracle can't:
PCA exactness vs numpy, grid-join completeness vs brute force, AUC's
closed-form identity on a hand-computable input, and the plan shapes.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_rides_data_pipeline_spark.operators.pca import (
    fit_top2_gramian,
    gramian,
)
from real_time_rides_data_pipeline_spark.registry import registry

SF = "/root/testdata/sf0.001"
SPECS = registry()


# --- PCA: distributed gramian + driver eigh ≡ numpy on the same data ----


def _np_embeddings(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    x = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, x


def test_gramian_matches_numpy(spark):
    _, x = _np_embeddings(spark)
    g = np.asarray(gramian(spark.read.parquet(f"{SF}/embeddings.parquet")))
    assert g.shape == (x.shape[1], x.shape[1])
    # float-add order differs across partitions → allclose, not equality
    np.testing.assert_allclose(g, x.T @ x, rtol=1e-9, atol=1e-6)


def test_pca_components_match_numpy(spark):
    _, x = _np_embeddings(spark)
    v1, v2 = fit_top2_gramian(spark.read.parquet(f"{SF}/embeddings.parquet"))
    evals, evecs = np.linalg.eigh(x.T @ x)
    # same eigenvector up to sign; sign-fix makes it exactly comparable
    for got, idx in ((v1, -1), (v2, -2)):
        ref = evecs[:, idx]
        ref = -ref if ref[int(np.argmax(np.abs(ref)))] < 0 else ref
        assert abs(abs(np.dot(got, ref)) - 1.0) < 1e-8
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-8)
    # orthonormal pair
    assert abs(np.dot(v1, v2)) < 1e-8
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-10


def test_pca_projection_matches_numpy(spark):
    ids, x = _np_embeddings(spark)
    out = {
        r["vec_id"]: (r["pc1_e6"], r["pc2_e6"])
        for r in SPECS["q_pca_project"].fn(spark, SF).collect()
    }
    v1, v2 = fit_top2_gramian(spark.read.parquet(f"{SF}/embeddings.parquet"))
    p1 = x @ np.asarray(v1)
    p2 = x @ np.asarray(v2)
    for i, vid in enumerate(ids):
        got1, got2 = out[vid]
        # floor(1e6·x) can differ by 1 ulp-flip at the boundary; allow ±1
        assert abs(got1 - np.floor(p1[i] * 1e6)) <= 1
        assert abs(got2 - np.floor(p2[i] * 1e6)) <= 1
    # variance along pc1 ≥ variance along pc2 (top eigenvalue first)
    assert np.sum(p1 * p1) >= np.sum(p2 * p2)


# --- grid-radius join ≡ brute force on the fixture -----------------------


def test_grid_join_matches_brute_force(spark):
    df = SPECS["q_grid_join_radius"].fn(spark, SF)
    got = {(r["id_a"], r["id_b"]): r["dist2"] for r in df.collect()}
    pts = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderkey") % 23 == 0)
        .select("o_orderkey", "o_custkey")
        .collect()
    )
    K = 2654435761
    coords = [
        (
            r["o_orderkey"],
            (r["o_orderkey"] % 1009) * (K % 1009) % 1009,
            (r["o_custkey"] % 1013) * (K % 1013) % 1013,
        )
        for r in pts
    ]
    want = {}
    for i in range(len(coords)):
        for j in range(i + 1, len(coords)):
            a, b = coords[i], coords[j]
            d2 = (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
            if d2 <= 1024:
                key = (min(a[0], b[0]), max(a[0], b[0]))
                want[key] = d2
    assert got == want  # complete AND duplicate-free


# --- AUC: rank-sum identity on a hand-computable input -------------------


def test_auc_identity_hand_case(spark, tmp_path):
    """scores [1,2,3,4], labels [0,0,1,1] → AUC = 1; add a tie pair
    (score 5 for one pos and one neg) → U = 2*2 + ... verify exactly."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": pd.to_datetime(["2026-01-01"] * 6),
            "user_id": [1] * 6,
            "event_type": ["view", "view", "purchase", "purchase",
                           "purchase", "view"],
            "value": [0.01, 0.02, 0.03, 0.04, 0.05, 0.05],
            "props": ["{}"] * 6,
        }
    )
    d = tmp_path / "sf_auc"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "events.parquet"))
    row = SPECS["q_auc_roc"].fn(spark, str(d)).collect()[0]
    # pos scores {3,4,5}, neg {1,2,5}: U = 2 + 2 + 2.5 = 6.5 → 2U = 13
    assert row["n_pos"] == 3 and row["n_neg"] == 3
    assert row["auc_num2"] == 13 and row["auc_den2"] == 18
    assert row["auc_ppm"] == 13 * 1000000 // 18


# --- linreg: closed form on a perfectly linear input ---------------------


def test_linreg_exact_line(spark, tmp_path):
    """y = 200·x + 300 cents exactly → slope_num/slope_den == 200 and
    icept_num/slope_den == 300 as exact rationals."""
    import pandas as pd

    xs = [0, 1, 2, 3, 4, 5]
    pdf = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": pd.to_datetime([f"2026-01-01 {h:02d}:00:00" for h in xs]),
            "user_id": [1] * 6,
            "event_type": ["click"] * 6,
            "value": [(200 * h + 300) / 100.0 for h in xs],
            "props": ["{}"] * 6,
        }
    )
    d = tmp_path / "sf_lr"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "events.parquet"))
    row = SPECS["q_linreg_fit"].fn(spark, str(d)).collect()[0]
    assert row["slope_num"] == 200 * row["slope_den"]
    assert row["icept_num"] == 300 * row["slope_den"]


# --- BPE training ≡ pure-python reference --------------------------------


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference BPE (Sennrich et al.): overlap-counted pair stats,
    (freq DESC, pair ASC) argmax, greedy left-to-right merge."""
    segs = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, n_merges + 1):
        freq: dict[tuple[str, str], int] = {}
        for w, seg in segs.items():
            for i in range(len(seg) - 1):
                p = (seg[i], seg[i + 1])
                freq[p] = freq.get(p, 0) + word_counts[w]
        if not freq:
            break
        (l, r), f = min(freq.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, l + r, f))
        for w, seg in segs.items():
            out, i = [], 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == l and seg[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark):
    rows = SPECS["q_bpe_train"].fn(spark, SF).collect()
    got = [(r["step"], r["left"], r["right"], r["merged"], r["freq"]) for r in rows]
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    counts: dict[str, int] = {}
    for r in docs:
        for w in r["text"].strip().split():
            counts[w] = counts.get(w, 0) + 1
    assert got == _py_bpe(counts, 4)
    assert len(got) == 4 and all(f > 0 for *_, f in got)


def test_bpe_greedy_merge_fold(spark):
    """The JVM fold handles the overlap case exactly like reference BPE:
    merging (a,a) in 'aaaa' → [aa, aa]; in 'aaa' → [aa, a]."""
    from real_time_rides_data_pipeline_spark.operators.bpe import (
        chars_of,
        merge_pair,
    )

    df = spark.createDataFrame([("aaaa",), ("aaa",), ("a",)], "word string")
    out = {
        r["word"]: r["m"]
        for r in df.select(
            "word", merge_pair(chars_of("word"), "a", "a").alias("m")
        ).collect()
    }
    assert out == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"], "a": ["a"]}


# --- plan shapes ----------------------------------------------------------


def test_knn_broadcasts_query_side(spark):
    plan = SPECS["q_knn_classify"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_grid_join_is_equi_join_not_cartesian(spark):
    plan = SPECS["q_grid_join_radius"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


@pytest.mark.parametrize(
    "key", ["q_score_lift", "q_calibration_bins", "q_target_encode", "q_linreg_fit", "q_auc_roc"]
)
def test_scalar_stat_keys_scan_events_once(spark, key):
    """The lift/calibration/encoding/OLS/AUC keys derive max/totals from
    windows over DOMAIN-COMPRESSED tables — the fact table is scanned
    exactly once (no scalar-subquery second pass)."""
    plan = SPECS[key].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1


def test_rolling_median_single_shuffle_on_user(spark):
    plan = SPECS["q_rolling_median"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_ohlc_single_scan_single_shuffle(spark):
    plan = SPECS["q_ohlc_bars"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_rfm_ntiles_are_range_partitioned(spark):
    """RFM's three quintile passes must come from global_ntile's two-phase
    rank: each pass windows per __pid run (hashpartitioning(__pid) — the
    range shuffle itself is behind the eager localCheckpoint), and the only
    SinglePartition exchanges feed the P-row offset aggregates, never a
    data-sized window."""
    plan = SPECS["q_rfm_segments"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(__pid") >= 3


def test_gramian_contract_violations_fail_loudly(spark):
    """ADVICE r8: a null embedding row used to DROP values inside Arrow
    flatten() and surface as an opaque numpy reshape error (or a wrong
    gramian when the drop count divided the width); an empty input reached
    eigh as a 0x0 matrix. Both must fail with the real cause named."""
    import pytest as _pytest

    good = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],)], "embedding array<double>"
    )
    with_null = good.unionAll(
        spark.createDataFrame([(None,)], "embedding array<double>")
    )
    with _pytest.raises(Exception, match="null vector"):
        gramian(with_null)
    with _pytest.raises(ValueError, match="empty input"):
        gramian(good.filter("embedding[0] > 99"))
    ragged = good.unionAll(
        spark.createDataFrame([([5.0, 6.0, 7.0],)], "embedding array<double>")
    )
    with _pytest.raises(Exception, match="ragged|width changed"):
        gramian(ragged.coalesce(1))


# --- round-14 experimentation family: closed-form vs python reference ----


def test_srm_and_did_match_python_reference(spark, tmp_path):
    """q_srm_check / q_diff_in_diff / q_ipw_ate pinned against a plain
    python computation of the same hash assignment and closed forms on a
    synthetic events table (beyond the oracle: an independent
    implementation, not the same SQL on a second engine)."""
    import hashlib

    import pandas as pd

    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                pd.Timestamp("2024-01-0%d 12:00:00" % (1 + i % 9)),
                i % 37,
                "click" if i % 2 == 0 else "view",
                (i % 13) + 0.25,
                "{}",
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "sf_srm"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "events.parquet"))

    def arm(uid: int) -> int:
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2

    # SRM reference
    want = {}
    for et in ("click", "view"):
        sub = [r for r in rows if r[3] == et]
        n0 = sum(1 for r in sub if arm(r[2]) == 0)
        n1 = len(sub) - n0
        chi2 = (n0 - n1) * (n0 - n1) * 1000000 // (n0 + n1)
        want[et] = (n0, n1, chi2, chi2 > 3841459)
    got = {
        r["event_type"]: (r["n_arm0"], r["n_arm1"], r["chi2_e6"], r["srm_flag"])
        for r in SPECS["q_srm_check"].fn(spark, str(d)).collect()
    }
    assert got == want, (got, want)

    # DiD reference
    cut = pd.Timestamp("2024-01-08")
    want_did = {}
    for et in ("click", "view"):
        cells = {}
        for a in (0, 1):
            for p in (0, 1):
                sub = [
                    round(r[4] * 100)
                    for r in rows
                    if r[3] == et and arm(r[2]) == a and (r[1] >= cut) == bool(p)
                ]
                cells[(a, p)] = (len(sub), sum(sub))

        def mean_e6(c):
            n, s = c
            return s * 1000000 // n if n else None

        did = (mean_e6(cells[(1, 1)]) - mean_e6(cells[(1, 0)])) - (
            mean_e6(cells[(0, 1)]) - mean_e6(cells[(0, 0)])
        )
        want_did[et] = (
            cells[(1, 1)][0],
            cells[(1, 0)][0],
            cells[(0, 1)][0],
            cells[(0, 0)][0],
            did,
        )
    got_did = {
        r["event_type"]: (
            r["n_t_post"],
            r["n_t_pre"],
            r["n_c_post"],
            r["n_c_pre"],
            r["did_cents_e6"],
        )
        for r in SPECS["q_diff_in_diff"].fn(spark, str(d)).collect()
    }
    assert got_did == want_did, (got_did, want_did)

    # IPW reference
    want_ipw = {}
    for et in ("click", "view"):
        sub = [r for r in rows if r[3] == et]
        nt = sum(1 for r in sub if arm(r[2]) == 1)
        yt = sum(round(r[4] * 100) for r in sub if arm(r[2]) == 1)
        yc = sum(round(r[4] * 100) for r in sub if arm(r[2]) == 0)
        nc = len(sub) - nt
        ate = (yt * 1000000 // nt if nt else None) - (
            yc * 1000000 // nc if nc else None
        )
        want_ipw[et] = (len(sub), nt, yt, yc, ate)
    got_ipw = {
        r["event_type"]: (
            r["n_total"],
            r["n_treat"],
            r["y_treat_cents"],
            r["y_control_cents"],
            r["ate_cents_e6"],
        )
        for r in SPECS["q_ipw_ate"].fn(spark, str(d)).collect()
    }
    assert got_ipw == want_ipw, (got_ipw, want_ipw)


def test_power_mde_matches_python_reference(spark, tmp_path):
    """q_power_mde against plain python floats (math.sqrt is the same
    correctly-rounded IEEE op) on a synthetic events table."""
    import math

    import pandas as pd

    rows = [(i, pd.Timestamp("2024-01-05"), i, "click", (i % 7) + 0.5, "{}")
            for i in range(60)]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "sf_mde"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "events.parquet"))
    ys = [round(r[4] * 100) for r in rows]
    n, s1, s2 = len(ys), sum(ys), sum(y * y for y in ys)
    var = (n * s2 - s1 * s1) / (n * (n - 1))
    mde = 2.8015852107170867 * math.sqrt((4.0 * var) / n)
    want = (n, s1, math.floor(mde * 1000000.0))
    row = SPECS["q_power_mde"].fn(spark, str(d)).collect()[0]
    assert (row["n"], row["sum_cents"], row["mde_cents_e6"]) == want, (row, want)


def test_power_mde_single_event_stratum_is_null_on_both_engines(spark, tmp_path):
    """ADVICE r14: a 1-event stratum has var_den = n*(n-1) = 0; without the
    nullif guard Spark's non-ANSI float path floors Infinity to
    Long.MaxValue while DuckDB's CAST raises. Both legs must degrade to
    NULL instead (the q_ipw_ate / q_cuped_adjust discipline)."""
    import duckdb
    import pandas as pd

    rows = [(0, pd.Timestamp("2024-01-05"), 0, "lonely", 3.25, "{}")] + [
        (i, pd.Timestamp("2024-01-05"), i, "click", (i % 7) + 0.5, "{}")
        for i in range(1, 40)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "sf_mde_degen"
    d.mkdir()
    spark.createDataFrame(pdf).write.parquet(str(d / "events.parquet"))

    got = {
        r["event_type"]: r["mde_cents_e6"]
        for r in SPECS["q_power_mde"].fn(spark, str(d)).collect()
    }
    assert got["lonely"] is None
    assert got["click"] is not None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )
    oracle = {
        et: mde
        for et, mde in con.execute(
            f"SELECT event_type, mde_cents_e6 FROM ({SPECS['q_power_mde'].oracle})"
        ).fetchall()
    }
    assert oracle == got, (oracle, got)


def test_fit_helpers_have_no_memo():
    """Round-15 optimization-phase rule: no module-level memo of
    data-derived results — every bench/oracle invocation must compute from
    the parquet inputs. The former FitCache-backed fit memos (_BPE_CACHE,
    _PCA_CACHE, _CENTROID_CACHE, _QUERY_VEC_CACHE, _BIGRAM_VOCAB_CACHE)
    and the staged pair graphs (_PAIRS_STAGE, _MINHASH_PAIRS_STAGE) were
    removed; this test pins the removal."""
    import real_time_rides_data_pipeline_spark.queries_curate as qc
    import real_time_rides_data_pipeline_spark.queries_ext as qe
    import real_time_rides_data_pipeline_spark.queries_ml as qm
    import real_time_rides_data_pipeline_spark.scratch as scratch

    for mod in (qe, qm, qc):
        banned = [
            n for n in vars(mod) if n.endswith(("_CACHE", "_STAGE"))
        ]
        assert not banned, f"{mod.__name__} regrew result memos: {banned}"
    assert not hasattr(scratch, "FitCache")
