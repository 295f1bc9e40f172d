"""Analytic window / ranking operators (fsst_ray.functions.analytics)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fsst_ray.functions.analytics import (
    _prune_topn,
    running_totals,
    top_n_per_group,
)


def test_running_totals_order_and_ties(ray_session):
    """Running rank/sum follow (ts, event_id) order, including ts ties,
    and the cents cast is floor-exact."""
    import ray.data as rd

    t0 = 1_700_000_000_000_000  # µs
    tbl = pa.table(
        {
            "event_id": pa.array([5, 1, 2, 9, 7], type=pa.int64()),
            # user 1: two events share a ts -> event_id breaks the tie
            "ts": pa.array([t0 + 10, t0 + 10, t0, t0 + 5, t0 + 1]).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            "value": pa.array([1.5, 2.999, 10.0, 0.01, 7.2], type=pa.float64()),
        }
    )
    out = (
        running_totals(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .sort_values(["user_id", "rn"])
        .reset_index(drop=True)
    )
    # user 1 order: eid 2 (ts+0), then ts+10 tie -> eid 1 before eid 5
    assert out["event_id"].tolist() == [2, 1, 5, 7, 9]
    assert out["rn"].tolist() == [1, 2, 3, 1, 2]
    cents = [int(np.floor(v * 100.0)) for v in (10.0, 2.999, 1.5, 7.2, 0.01)]
    assert out["cum_cents"].tolist() == [
        cents[0],
        cents[0] + cents[1],
        cents[0] + cents[1] + cents[2],
        cents[3],
        cents[3] + cents[4],
    ]


def test_prune_topn_keeps_at_most_n_per_group():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 5, size=1000)
    score = rng.integers(0, 100, size=1000)
    order = np.lexsort((-score, codes))
    keep = _prune_topn(codes, order, 4)
    # bound: <= 4 rows per group survive
    _, counts = np.unique(codes[keep], return_counts=True)
    assert counts.max() <= 4
    # the survivors per group are exactly that group's 4 best scores
    for g in range(5):
        got = np.sort(score[keep][codes[keep] == g])[::-1]
        want = np.sort(score[codes == g])[::-1][:4]
        assert (got == want).all()


def test_top_n_per_group_exact_across_blocks(ray_session):
    """Global top-n per group is exact regardless of how rows are split
    into blocks, with (n_chars DESC, doc_id ASC) tie-breaks."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 4000
    src = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, size=n)]
    # few distinct lengths -> many exact ties exercise the doc_id break
    nch = rng.integers(90, 100, size=n).astype(np.int64)
    tbl = pa.table(
        {
            "source": pa.array(src, type=pa.string()),
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "n_chars": pa.array(nch, type=pa.int64()),
        }
    )
    got = (
        top_n_per_group(rd.from_arrow(tbl).repartition(16), n=5)
        .to_pandas()
        .sort_values(["source", "rnk"])
        .reset_index(drop=True)
    )
    # reference: plain lexsort per source
    for g in "abcd":
        m = src == g
        order = np.lexsort((np.arange(n)[m], -nch[m]))[:5]
        sub = got[got["source"] == g]
        assert sub["doc_id"].tolist() == np.arange(n)[m][order].tolist()
        assert sub["n_chars"].tolist() == nch[m][order].tolist()
        assert sub["rnk"].tolist() == [1, 2, 3, 4, 5]


def test_distinctive_terms_df_and_rank(ray_session):
    """df counts sources containing the word; rank = (tf DESC, df ASC,
    word) and survives block splits."""
    import ray.data as rd

    from fsst_ray.functions.textstats import distinctive_terms

    tbl = pa.table(
        {
            "source": pa.array(["a", "a", "b", "b"], type=pa.string()),
            "text": pa.array(
                [
                    "x x y shared",   # a: x=2, y=1, shared=1
                    "y shared",       # a totals: x=2, y=2, shared=2
                    "z z z shared",
                    "shared",
                ],
                type=pa.string(),
            ),
        }
    )
    got = (
        distinctive_terms(rd.from_arrow(tbl).repartition(4), k=2)
        .to_pandas()
        .sort_values(["source", "rnk"])
        .reset_index(drop=True)
    )
    # source a: x(tf2,df1) ties y(tf2,df1)? y appears only in a (df 1),
    # shared in both (df 2). tf=2 for x,y,shared -> order: x, y (word
    # tie-break after df: x df1, y df1, shared df2)
    a = got[got["source"] == "a"]
    assert list(zip(a["word"], a["tf"], a["df"], a["rnk"])) == [
        ("x", 2, 1, 1),
        ("y", 2, 1, 2),
    ]
    b = got[got["source"] == "b"]
    assert list(zip(b["word"], b["tf"], b["df"], b["rnk"])) == [
        ("z", 3, 1, 1),
        ("shared", 2, 2, 2),
    ]


def test_funnel_stages_semantics(ray_session):
    import ray.data as rd

    from fsst_ray.functions.analytics import funnel_stages

    us = 1_000_000
    rows = []
    # user 1: full funnel in order
    rows += [(1, 10, "view"), (1, 20, "click"), (1, 30, "purchase")]
    # user 2: purchase BEFORE click -> stage 2 only
    rows += [(2, 10, "view"), (2, 30, "click"), (2, 20, "purchase")]
    # user 3: only other event types -> stage 0
    rows += [(3, 10, "error"), (3, 20, "signup")]
    # user 4: click at the same ts as view (>= is inclusive), purchase
    # outside the window -> stage 2
    rows += [(4, 10, "view"), (4, 10, "click"), (4, 1000, "purchase")]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] * us for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = (
        funnel_stages(rd.from_arrow(t), window_us=100 * us)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert dict(zip(out["user_id"], out["stage"])) == {1: 3, 2: 2, 3: 0, 4: 2}
    r1 = out[out.user_id == 1].iloc[0]
    assert (r1.t1_us, r1.t2_us, r1.t3_us) == (10 * us, 20 * us, 30 * us)
    r3 = out[out.user_id == 3].iloc[0]
    assert r3.t1_us != r3.t1_us  # NaN: stage-0 user kept via sentinel


def test_retention_cohorts_dedups_cross_block_pairs(ray_session):
    import ray.data as rd

    from fsst_ray.functions.analytics import retention_cohorts

    us = 1_000_000
    week = 7 * 24 * 3600 * us
    rows = []
    # user 1: cohort week 0, active weeks 0,1,3; duplicate events for
    # the same (user, week) spread across partitions
    for w in (0, 0, 1, 3, 3):
        rows.append((1, w * week + 5 * us))
    # user 2: cohort week 1, active weeks 1,2
    for w in (1, 2):
        rows.append((2, w * week + 5 * us))
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
        }
    )
    # many partitions force cross-block duplicate (user, week) pairs
    out = retention_cohorts(rd.from_arrow(t).repartition(5)).to_pandas()
    got = {
        (r.cohort_week, r.week_offset): r.n_users for r in out.itertuples()
    }
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 1): 1}


def test_windowed_ops_have_no_per_group_dispatch(ray_session):
    """running_totals and session_windows must be sort + one vectorized
    per-block pass, never `groupby(user_id).map_groups` — that shape
    dispatches the group fn once per user (10^8 Python calls at 10^8
    users; VERDICT r4 item 2). Guard: the executed plan contains no
    MapGroups/Aggregate operator, and many-users-few-blocks output is
    exact."""
    import ray.data as rd

    from fsst_ray.functions.analytics import running_totals
    from fsst_ray.functions.windows import session_windows

    n_users, per_user = 500, 4
    t0 = 1_700_000_000_000_000
    uid = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
    seq = np.tile(np.arange(per_user, dtype=np.int64), n_users)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(len(uid), dtype=np.int64)),
            "ts": pa.array(t0 + seq * 60_000_000 + uid).cast(pa.timestamp("us")),
            "user_id": pa.array(uid),
            "value": pa.array(np.full(len(uid), 1.0)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)

    rt = running_totals(ds).materialize()
    assert "MapGroups" not in rt.stats() and "Aggregate" not in rt.stats()
    df = rt.to_pandas().sort_values(["user_id", "rn"]).reset_index(drop=True)
    assert len(df) == n_users * per_user
    assert df["rn"].tolist() == list(np.tile(np.arange(1, per_user + 1), n_users))
    assert df["cum_cents"].tolist() == list(np.tile(np.arange(1, per_user + 1) * 100, n_users))

    sw = session_windows(ds, gap_minutes=30).materialize()
    assert "MapGroups" not in sw.stats() and "Aggregate" not in sw.stats()
    sdf = sw.to_pandas()
    # 1-minute spacing, 30-minute gap -> exactly one session per user
    assert len(sdf) == n_users
    assert sorted(sdf["user_id"].tolist()) == list(range(n_users))
    assert (sdf["n_events"] == per_user).all()


def test_session_windows_gap_split_across_users(ray_session):
    """Gap splits are per-user even when two users' streams interleave
    in one block: adjacent rows from DIFFERENT users never merge, and a
    within-user gap > threshold opens a new session."""
    import ray.data as rd

    from fsst_ray.functions.windows import session_windows

    us = 1_000_000
    t0 = 1_700_000_000 * us
    gap = 30 * 60 * us
    rows = [
        # user 1: two sessions (second starts after a 31-min gap)
        (1, t0),
        (1, t0 + 60 * us),
        (1, t0 + 60 * us + gap + us),
        # user 2: starts 2 h after user 1 ends - must NOT merge with u1
        (2, t0 + 2 * 3600 * us),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
        }
    )
    out = (
        session_windows(rd.from_arrow(tbl).repartition(2))
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["session_start"].tolist() == [
        t0 // us,
        (t0 + 60 * us + gap + us) // us,
        (t0 + 2 * 3600 * us) // us,
    ]


def test_pivot_counts_semantics(ray_session):
    import ray.data as rd
    from fsst_ray.functions.analytics import pivot_counts

    t = pa.table(
        {
            "k": pa.array([1, 1, 2, 2, 2, 3], type=pa.int64()),
            "typ": pa.array(["a", "b", "a", "a", "c", "c"]),
        }
    )
    got = (
        pivot_counts(rd.from_arrow(t).repartition(4), "k", "typ", ["a", "b", "c"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 2, 3]
    assert got["a"].tolist() == [1, 2, 0]
    assert got["b"].tolist() == [1, 0, 0]
    assert got["c"].tolist() == [0, 1, 1]
    assert all(str(got[c].dtype) == "int64" for c in ("a", "b", "c"))


def test_pivot_counts_guards(ray_session):
    import ray.data as rd
    from fsst_ray.functions.analytics import pivot_counts

    t = pa.table({"k": pa.array([1], type=pa.int64()), "typ": pa.array(["zz"])})
    with pytest.raises(Exception, match="not in the declared categories"):
        pivot_counts(rd.from_arrow(t), "k", "typ", ["a"]).to_pandas()
    with pytest.raises(ValueError, match="non-empty"):
        pivot_counts(rd.from_arrow(t), "k", "typ", [])
    with pytest.raises(ValueError, match="collides"):
        pivot_counts(rd.from_arrow(t), "k", "typ", ["k"])


def test_pivot_counts_no_map_groups(ray_session):
    import ray.data as rd
    from fsst_ray.functions.analytics import pivot_counts

    t = pa.table({"k": pa.array([1], type=pa.int64()), "typ": pa.array(["a"])})
    plan = repr(pivot_counts(rd.from_arrow(t), "k", "typ", ["a"]))
    assert "MapGroups" not in plan


def test_event_deltas_lag_semantics(ray_session):
    import ray.data as rd
    from fsst_ray.functions.analytics import event_deltas

    us = 1_000_000
    t0 = 1_700_000_000 * us
    # user 1: ts tie broken by event_id (eid 4 precedes eid 9)
    rows = [(7, 1, t0 + 5), (4, 1, t0 + 10), (9, 1, t0 + 10), (2, 2, t0)]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows]).cast(pa.timestamp("us")),
        }
    )
    out = (
        event_deltas(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("event_id")
        .set_index("event_id")
    )
    assert out.loc[7].isna()["gap_us"] and out.loc[2].isna()["gap_us"]
    assert out.loc[4, "prev_event_id"] == 7 and out.loc[4, "gap_us"] == 5
    assert out.loc[9, "prev_event_id"] == 4 and out.loc[9, "gap_us"] == 0
    plan = repr(event_deltas(rd.from_arrow(t)))
    assert "MapGroups" not in plan and "Aggregate" not in plan


def test_moving_sums_reference_and_plan(ray_session):
    """Randomized parity vs a per-user python reference; plan free of
    MapGroups/Aggregate; frame shorter/longer than groups; k guard."""
    import ray.data as rd

    from fsst_ray.functions.analytics import moving_sums

    rng = np.random.default_rng(23)
    n = 6000
    uid = rng.integers(0, 400, n).astype(np.int64)
    ts_us = 1_700_000_000_000_000 + rng.integers(0, 10**9, n)
    val = rng.random(n) * 50
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_us).cast(pa.timestamp("us")),
            "user_id": pa.array(uid),
            "value": pa.array(val),
        }
    )
    ds = rd.from_arrow(tbl).repartition(11)
    for k in (1, 4, 10_000):
        out = moving_sums(ds, k=k).materialize()
        assert "MapGroups" not in out.stats() and "Aggregate" not in out.stats()
        df = out.to_pandas().set_index("event_id")
        cents = np.floor(val * 100.0).astype(np.int64)
        for u in np.unique(uid):
            sel = np.flatnonzero(uid == u)
            order = np.lexsort((sel, ts_us[sel]))
            ids = sel[order]
            c = cents[ids]
            for i, eid in enumerate(ids):
                lo = max(0, i - k + 1)
                assert df.loc[eid, "win_cents"] == int(c[lo : i + 1].sum())
                assert df.loc[eid, "win_n"] == i + 1 - lo
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        moving_sums(ds, k=0)


def test_unpivot_roundtrip_and_guards(ray_session):
    """pivot -> unpivot reproduces the long counts (zeros explicit);
    NULL value and name-collision guards raise."""
    import ray.data as rd

    from fsst_ray.functions.analytics import pivot_counts, unpivot

    rng = np.random.default_rng(3)
    n = 4000
    uid = rng.integers(0, 50, n).astype(np.int64)
    cats = ["a", "b", "c"]
    ev = np.array(cats)[rng.integers(0, 3, n)]
    tbl = pa.table({"user_id": pa.array(uid), "event_type": pa.array(ev)})
    wide = pivot_counts(rd.from_arrow(tbl).repartition(6), "user_id",
                        "event_type", cats)
    long = unpivot(wide, "user_id", cats, "event_type", "n").to_pandas()
    assert len(long) == 50 * 3
    got = {(r.user_id, r.event_type): r.n for r in long.itertuples()}
    for u in range(50):
        for c in cats:
            assert got[(u, c)] == int(((uid == u) & (ev == c)).sum())

    with pytest.raises(ValueError, match="non-empty"):
        unpivot(wide, "user_id", [])
    with pytest.raises(ValueError, match="collision"):
        unpivot(wide, "user_id", cats, var_name="a")
    bad = pa.table(
        {"user_id": pa.array([1], pa.int64()), "a": pa.array([None], pa.int64())}
    )
    with pytest.raises((ValueError, Exception), match="NULL"):
        unpivot(rd.from_arrow(bad), "user_id", ["a"]).take_all()


def test_moment_stats_reference_and_corr(ray_session):
    """Partition-invariant exact sums; corr_from_moments matches
    np.corrcoef; bound violations and exactness overflow raise."""
    import ray as _ray
    import ray.data as rd

    from fsst_ray.functions.analytics import corr_from_moments, moment_stats

    rng = np.random.default_rng(99)
    n = 9000
    g = np.array(["p", "q"])[rng.integers(0, 2, n)]
    x = rng.integers(-30, 31, n).astype(np.int64)
    y = (x // 2 + rng.integers(-5, 6, n)).astype(np.int64)  # correlated
    tbl = pa.table({"g": pa.array(g), "x": pa.array(x), "y": pa.array(y)})

    def collect(ds):
        ts = [_ray.get(r) for r in ds.to_arrow_refs()]
        return pa.concat_tables([t for t in ts if t.num_columns])

    out = collect(
        moment_stats(rd.from_arrow(tbl).repartition(13), "x", "y", "g",
                     x_bound=31, y_bound=21)
    )
    rows = {r["g"]: r for r in out.to_pylist()}
    for grp in ("p", "q"):
        sel = g == grp
        assert rows[grp]["n"] == int(sel.sum())
        assert rows[grp]["sum_x"] == int(x[sel].sum())
        assert rows[grp]["sum_xy"] == int((x[sel] * y[sel]).sum())
        assert rows[grp]["sum_y2"] == int((y[sel] ** 2).sum())
    corr = corr_from_moments(out)
    for grp in ("p", "q"):
        sel = g == grp
        assert abs(corr[grp] - np.corrcoef(x[sel], y[sel])[0, 1]) < 1e-12
    # bound violation raises
    with pytest.raises((ValueError, Exception), match="bounds"):
        collect(moment_stats(rd.from_arrow(tbl), "x", "y", "g",
                             x_bound=5, y_bound=21))
    # exactness overflow: tiny corpus, absurd declared bound
    with pytest.raises((ValueError, Exception), match="2\\^62"):
        collect(moment_stats(rd.from_arrow(tbl), "x", "y", "g",
                             x_bound=2**31, y_bound=2**31))


def test_group_concat_matches_pandas_reference(ray_session):
    """Ordered string_agg parity across many blocks, interleaved keys,
    multi-column ordering; MapGroups-free plan."""
    import ray.data as rd

    from fsst_ray.functions.analytics import group_concat

    rng = np.random.default_rng(909)
    n, nkeys = 3000, 87
    keys = rng.integers(0, nkeys, n)
    a = rng.integers(0, 50, n)
    b = rng.permutation(n)  # tie-breaker: unique
    vals = np.array([f"v{x}" for x in rng.integers(0, 30, n)])
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "v": pa.array(vals, pa.string()),
            }
        )
    ).repartition(11)
    out = group_concat(ds, "k", "v", ["a", "b"], sep="|").materialize()
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    import pandas as pd

    ref = (
        pd.DataFrame({"k": keys, "a": a, "b": b, "v": vals})
        .sort_values(["k", "a", "b"])
        .groupby("k")
        .agg(n=("v", "size"), concat=("v", lambda s: "|".join(s)))
        .reset_index()
    )
    assert df["k"].tolist() == ref["k"].tolist()
    assert df["n"].tolist() == ref["n"].tolist()
    assert df["concat"].tolist() == ref["concat"].tolist()
    assert "MapGroups" not in out.stats()
    with pytest.raises(ValueError, match="order_cols"):
        group_concat(ds, "k", "v", [])


def test_grouped_quantiles_matches_duckdb_semantics(ray_session):
    """ceil(n*q) 1-based rank (PERCENTILE_DISC) parity vs DuckDB's
    quantile_disc on randomized groups, including q=0 and q=1."""
    import duckdb
    import ray.data as rd

    from fsst_ray.functions.analytics import grouped_quantiles

    rng = np.random.default_rng(31337)
    n, nkeys = 4000, 61
    keys = rng.integers(0, nkeys, n)
    vals = rng.integers(-500, 500, n)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    ).repartition(9)
    qs = [("q0", 0, 1), ("q25", 1, 4), ("q50", 1, 2), ("q90", 9, 10), ("q100", 1, 1)]
    out = (
        grouped_quantiles(ds, "k", "v", qs)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"k": keys, "v": vals}))
    ref = con.execute(
        "SELECT k, CAST(COUNT(*) AS BIGINT) AS n, "
        "quantile_disc(v, 0.0) AS q0, quantile_disc(v, 0.25) AS q25, "
        "quantile_disc(v, 0.5) AS q50, quantile_disc(v, 0.9) AS q90, "
        "quantile_disc(v, 1.0) AS q100 FROM t GROUP BY k ORDER BY k"
    ).df()
    for c in ["k", "n", "q0", "q25", "q50", "q90", "q100"]:
        assert out[c].tolist() == ref[c].tolist(), c
    # singleton groups: every quantile is the lone value
    one = grouped_quantiles(
        rd.from_arrow(
            pa.table({"k": pa.array([7], pa.int64()), "v": pa.array([42], pa.int64())})
        ),
        "k",
        "v",
        qs,
    ).to_pandas()
    assert one.iloc[0][["q0", "q25", "q50", "q90", "q100"]].tolist() == [42] * 5
    with pytest.raises(ValueError, match="bad quantile"):
        grouped_quantiles(ds, "k", "v", [("x", 3, 2)])
    with pytest.raises(ValueError, match="non-empty"):
        grouped_quantiles(ds, "k", "v", [])


def test_grouped_mode_matches_reference(ray_session):
    """Deterministic mode (max count, tie -> min value) vs a pandas
    reference on randomized string values across many blocks, including
    forced exact ties; MapGroups-free plan."""
    import pandas as pd
    import ray.data as rd

    from fsst_ray.functions.analytics import grouped_mode

    rng = np.random.default_rng(112)
    n, nkeys = 5000, 73
    keys = rng.integers(0, nkeys, n)
    vals = np.array(["w%d" % x for x in rng.integers(0, 6, n)])
    # force exact ties in some keys: key 0 gets one of each value
    keys = np.concatenate([keys, np.zeros(6, np.int64) - 1])
    vals = np.concatenate([vals, np.array(["w%d" % i for i in range(6)])])
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.string())})
    ).repartition(13)
    out = grouped_mode(ds, "k", "v").materialize()
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    ref = (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby(["k", "v"])
        .size()
        .reset_index(name="cnt")
        .sort_values(["k", "cnt", "v"], ascending=[True, False, True])
        .groupby("k")
        .first()
        .reset_index()
    )
    assert df["k"].tolist() == ref["k"].tolist()
    assert df["mode_val"].tolist() == ref["v"].tolist()
    assert df["cnt"].tolist() == ref["cnt"].tolist()
    # the forced-tie key resolves to the smallest value
    assert df[df["k"] == -1]["mode_val"].iloc[0] == "w0"
    assert "MapGroups" not in out.stats()


def test_grouped_mad_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from fsst_ray.functions.analytics import grouped_mad

    rng = np.random.default_rng(777)
    n, nkeys = 4000, 41
    keys = rng.integers(0, nkeys, n)
    vals = rng.integers(-10_000, 10_000, n)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    ).repartition(9)
    out = (
        grouped_mad(ds, "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys, "v": vals}))
    ref = con.execute(
        "WITH m AS (SELECT k, quantile_disc(v, 0.5) AS med FROM t GROUP BY k) "
        "SELECT t.k, CAST(COUNT(*) AS BIGINT) AS n, m.med AS median, "
        "quantile_disc(ABS(t.v - m.med), 0.5) AS mad "
        "FROM t JOIN m ON t.k = m.k GROUP BY t.k, m.med ORDER BY t.k"
    ).df()
    for c in ["k", "n", "median", "mad"]:
        assert out[c].tolist() == ref[c].tolist(), c
    with pytest.raises(ValueError, match="broadcast_rows"):
        grouped_mad(ds, "k", "v", broadcast_rows=2)
