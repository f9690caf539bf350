"""Hypothesis brute-force parity for the round-5 event operators.

The DuckDB twin gate proves Spark == DuckDB, but NOT that the shared
algorithm is right — both engines could encode the same mistake.
These tests close that blind spot: hypothesis generates small random
event tables, the REGISTERED ORACLE SQL (the exact text the driver
runs) executes on DuckDB, and the result is compared against an
independent O(n²)/naive Python implementation of the operator's
mathematical definition.  DuckDB-only — no Spark session — so the
property loop is fast enough for dozens of examples.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from distributedmapreduce_spark.plans.core import registry

_DUR_MOD_S = 3540
_ATTRIB_WINDOW_US = 86_400_000_000

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user bucket
        st.sampled_from(["click", "view", "purchase"]),
        st.integers(min_value=0, max_value=400_000),  # seconds offset
        st.integers(min_value=1, max_value=49_000),  # cents
    ),
    min_size=1,
    max_size=40,
)


def _events_df(rows):
    base = 1_704_067_200_000_000  # 2024-01-01 UTC in µs
    recs = []
    for i, (u, ty, sec, cents) in enumerate(rows):
        recs.append(
            {
                "event_id": i + 1,
                "ts": pd.Timestamp(base + sec * 1_000_000, unit="us"),
                "user_id": u + 1,
                "event_type": ty,
                "value": cents / 100.0,
                "props": "{}",
            }
        )
    return pd.DataFrame(recs)


def _oracle(name: str, pdf: pd.DataFrame):
    sql = registry()[name].oracle
    assert sql, name
    con = duckdb.connect()
    con.register("events", pdf)
    return con.execute(sql).fetchall()


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_interval_max_concurrency_matches_brute_force(rows):
    pdf = _events_df(rows)
    got = {
        r[0]: (r[1], r[2]) for r in _oracle("interval_max_concurrency", pdf)
    }
    # brute force: per type, max over candidate instants (all interval
    # starts) of the number of open half-open intervals
    base = 1_704_067_200_000_000
    by_type: dict[str, list[tuple[int, int, int]]] = {}
    for i, (u, ty, sec, cents) in enumerate(rows):
        s = base + sec * 1_000_000
        e = s + ((cents % _DUR_MOD_S) + 60) * 1_000_000
        by_type.setdefault(ty, []).append((s, e, i + 1))
    for ty, ivs in by_type.items():
        best, best_t = 0, None
        for s0, _, _ in sorted(ivs, key=lambda x: (x[0], x[2])):
            n = sum(1 for s, e, _ in ivs if s <= s0 < e)
            if n > best:
                best, best_t = n, s0
        assert got[ty][0] == best, (ty, got[ty], best)
        assert got[ty][1] == best_t, (ty, got[ty], best_t)


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_attribution_conservation_and_shares_brute_force(rows):
    pdf = _events_df(rows)
    out = _oracle("attribution_linear_touch", pdf)
    base = 1_704_067_200_000_000
    purchases = [
        (i + 1, u + 1, base + sec * 1_000_000, cents)
        for i, (u, ty, sec, cents) in enumerate(rows)
        if ty == "purchase"
    ]
    clicks = [
        (i + 1, u + 1, base + sec * 1_000_000)
        for i, (u, ty, sec, cents) in enumerate(rows)
        if ty == "click"
    ]
    if not purchases:
        assert out == []
        return
    # conservation: attributed == total purchase cents
    assert sum(r[1] for r in out) == sum(p[3] for p in purchases)
    # brute-force expected per-hour totals
    expected: dict[object, int] = {}
    touches: dict[object, int] = {}
    for pid, pu, pts, cents in purchases:
        cs = [
            (cts, cid)
            for cid, cu, cts in clicks
            if cu == pu and pts - _ATTRIB_WINDOW_US <= cts < pts
        ]
        if not cs:
            expected[None] = expected.get(None, 0) + cents
            touches[None] = touches.get(None, 0) + 1
            continue
        k = len(cs)
        share = cents // k
        last = max(cs)
        for cts, cid in cs:
            hour = (cts // 3_600_000_000) * 3_600_000_000
            amt = share + (cents - k * share if (cts, cid) == last else 0)
            expected[hour] = expected.get(hour, 0) + amt
            touches[hour] = touches.get(hour, 0) + 1
    got = {r[0]: (r[1], r[2]) for r in out}
    assert got == {h: (expected[h], touches[h]) for h in expected}


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_streaks_match_brute_force(rows):
    pdf = _events_df(rows)
    got = {r[0]: (r[1], r[2]) for r in _oracle("grouped_map_streaks", pdf)}
    base = 1_704_067_200_000_000
    by_type: dict[str, list[tuple[int, int, int]]] = {}
    for i, (u, ty, sec, cents) in enumerate(rows):
        by_type.setdefault(ty, []).append(
            (base + sec * 1_000_000, i + 1, cents)
        )
    for ty, evs in by_type.items():
        seq = [c for _, _, c in sorted(evs)]
        runs, cur = [], 1
        for a, b in zip(seq, seq[1:]):
            if b > a:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert got[ty] == (max(runs), len(runs)), (ty, got[ty], runs)


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_ohlc_matches_brute_force(rows):
    pdf = _events_df(rows)
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5], r[6])
        for r in _oracle("ohlc_resample", pdf)
    }
    base = 1_704_067_200_000_000
    cells: dict[tuple, list[tuple[int, int, int]]] = {}
    for i, (u, ty, sec, cents) in enumerate(rows):
        us = base + sec * 1_000_000
        cells.setdefault((ty, us // 3_600_000_000), []).append(
            (us, i + 1, cents)
        )
    exp = {}
    for key, evs in cells.items():
        evs.sort()
        cs = [c for _, _, c in evs]
        exp[key] = (cs[0], max(cs), min(cs), cs[-1], len(cs))
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_twa_matches_brute_force(rows):
    pdf = _events_df(rows)
    got = {r[0]: (r[1], r[2], r[3], r[4]) for r in _oracle("time_weighted_average", pdf)}
    base = 1_704_067_200_000_000
    by_type: dict[str, list[tuple[int, int, int]]] = {}
    for i, (u, ty, sec, cents) in enumerate(rows):
        by_type.setdefault(ty, []).append((base + sec * 1_000_000, i + 1, cents))
    for ty, evs in by_type.items():
        evs.sort()
        scd = sd = n = 0
        for (u0, _, c0), (u1, _, _) in zip(evs, evs[1:]):
            dur = u1 - u0
            if dur <= 0:  # holds are strictly positive by definition
                continue
            scd += c0 * dur
            sd += dur
            n += 1
        if sd == 0:
            # no elapsed time for this type -> no TWA row at all
            assert ty not in got
            continue
        assert got[ty] == (sd, n, scd // sd, ((scd % sd) * 1_000_000) // sd)


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_cusum_matches_brute_force(rows):
    pdf = _events_df(rows)
    got = {r[0]: (r[1], r[2]) for r in _oracle("cusum_changepoint", pdf)}
    base = 1_704_067_200_000_000
    by_type: dict[str, dict[int, int]] = {}
    for i, (u, ty, sec, cents) in enumerate(rows):
        hb = (base + sec * 1_000_000) // 3_600_000_000
        by_type.setdefault(ty, {}).setdefault(hb, 0)
        by_type[ty][hb] += 1
    for ty, grid in by_type.items():
        nb, tot = len(grid), sum(grid.values())
        cus, best, best_hb = 0, None, None
        for hb in sorted(grid):
            cus += grid[hb] * nb - tot
            if best is None or abs(cus) > best:
                best, best_hb = abs(cus), hb
        assert got[ty] == (best, best_hb), (ty, got[ty], (best, best_hb))


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_seasonal_backtest_matches_brute_force(rows):
    pdf = _events_df(rows)
    got = {r[0]: (r[1], r[2], r[3]) for r in _oracle("seasonal_naive_backtest", pdf)}
    base = 1_704_067_200_000_000
    grids: dict[str, dict[int, int]] = {}
    for i, (u, ty, sec, cents) in enumerate(rows):
        hb = (base + sec * 1_000_000) // 3_600_000_000
        grids.setdefault(ty, {}).setdefault(hb, 0)
        grids[ty][hb] += cents
    exp = {}
    for ty, g in grids.items():
        errs = [
            abs(g[hb] - g[hb - 24]) for hb in g if (hb - 24) in g
        ]
        if errs:
            exp[ty] = (len(errs), sum(errs), sum(errs) // len(errs))
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_session_paths_match_brute_force(rows):
    pdf = _events_df(rows)
    got = [(r[0], r[1]) for r in _oracle("session_top_paths", pdf)]
    base = 1_704_067_200_000_000
    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for i, (u, ty, sec, cents) in enumerate(rows):
        by_user.setdefault(u + 1, []).append(
            (base + sec * 1_000_000, i + 1, ty)
        )
    paths: dict[str, int] = {}
    for u, evs in by_user.items():
        evs.sort()
        sess: list[list[str]] = []
        prev = None
        for us, _, ty in evs:
            if prev is None or us - prev > 1_800_000_000:
                sess.append([])
            sess[-1].append(ty)
            prev = us
        for s in sess:
            p = ">".join(s[:8])
            paths[p] = paths.get(p, 0) + 1
    exp = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == exp


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_rfm_thirds_match_brute_force(rows):
    pdf = _events_df(rows)
    got = {
        r[0]: (r[1], r[2], r[3], r[4], r[5], r[6], r[7])
        for r in _oracle("rfm_user_segments", pdf)
    }
    base = 1_704_067_200_000_000
    per: dict[int, list[tuple[int, int]]] = {}
    for i, (u, ty, sec, cents) in enumerate(rows):
        if ty == "purchase":
            per.setdefault(u + 1, []).append((base + sec * 1_000_000, cents))
    if not per:
        assert got == {}
        return
    gmax = max(us for evs in per.values() for us, _ in evs)
    pu = {
        u: (
            (gmax - max(us for us, _ in evs)) // 86_400_000_000,
            len(evs),
            sum(c for _, c in evs),
        )
        for u, evs in per.items()
    }
    n = len(pu)

    def third(metric_idx):
        order = sorted(pu, key=lambda u: (pu[u][metric_idx], u))
        return {u: 1 + (rn * 3) // n for rn, u in enumerate(order)}

    r_s, f_s, m_s = third(0), third(1), third(2)
    exp = {
        u: (
            pu[u][0], pu[u][1], pu[u][2],
            r_s[u], f_s[u], m_s[u],
            r_s[u] * 100 + f_s[u] * 10 + m_s[u],
        )
        for u in pu
    }
    assert got == exp


baskets_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # customer
        st.lists(
            st.integers(min_value=0, max_value=14),  # part ids
            min_size=1,
            max_size=6,
        ),
    ),
    min_size=1,
    max_size=25,
)


def _orders_lineitem(baskets):
    orders, items = [], []
    for oi, (cust, parts) in enumerate(baskets):
        okey = oi + 1
        orders.append(
            {
                "o_orderkey": okey,
                "o_custkey": cust + 1,
                "o_orderstatus": "O",
                "o_totalprice": 1.0,
                "o_orderdate": pd.Timestamp("2024-01-01"),
                "o_orderpriority": "1-URGENT",
            }
        )
        for ln, p in enumerate(parts):
            items.append(
                {
                    "l_orderkey": okey,
                    "l_partkey": p + 1,
                    "l_suppkey": 1,
                    "l_linenumber": ln + 1,
                    "l_quantity": 1.0,
                    "l_extendedprice": 1.0,
                    "l_discount": 0.0,
                    "l_tax": 0.0,
                    "l_returnflag": "N",
                    "l_linestatus": "O",
                    "l_shipdate": pd.Timestamp("2024-01-02"),
                }
            )
    return pd.DataFrame(orders), pd.DataFrame(items)


def _oracle_tables(name: str, tables: dict):
    sql = registry()[name].oracle
    assert sql, name
    con = duckdb.connect()
    for tname, pdf in tables.items():
        con.register(tname, pdf)
    return con.execute(sql).fetchall()


@settings(max_examples=40, deadline=None)
@given(baskets_strategy)
def test_itempairs_match_brute_force(baskets):
    od, li = _orders_lineitem(baskets)
    got = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in _oracle_tables("frequent_itempairs", {"lineitem": li})
    }
    basket_sets = [set(p + 1 for p in parts) for _, parts in baskets]
    n_orders = len(basket_sets)
    from collections import Counter

    pc = Counter(p for s in basket_sets for p in s)
    sup = Counter()
    for s in basket_sets:
        ss = sorted(s)
        for i, p1 in enumerate(ss):
            for p2 in ss[i + 1:]:
                sup[(p1, p2)] += 1
    exp = {}
    for (p1, p2), s in sup.items():
        if s >= 2:
            exp[(p1, p2)] = (
                s,
                (s * n_orders * 1_000_000) // (pc[p1] * pc[p2]),
                (s * 1_000_000) // pc[p1],
            )
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(baskets_strategy)
def test_triangles_match_brute_force(baskets):
    od, li = _orders_lineitem(baskets)
    got = {
        r[0]: r[1]
        for r in _oracle_tables(
            "triangle_count_copurchase", {"orders": od, "lineitem": li}
        )
    }
    # rebuild the projected graph with the same degree cap
    cp = set()
    for cust, parts in baskets:
        for p in parts:
            cp.add((cust + 1, p + 1))
    from collections import Counter, defaultdict

    deg = Counter(p for _, p in cp)
    edges = set()
    by_part = defaultdict(list)
    for c, p in cp:
        by_part[p].append(c)
    for p, cs in by_part.items():
        if deg[p] <= 15:
            cs = sorted(set(cs))
            for i, u in enumerate(cs):
                for v in cs[i + 1:]:
                    edges.add((u, v))
    nodes = sorted({n for e in edges for n in e})
    count = Counter()
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in edges:
                continue
            for c in nodes:
                if c <= b:
                    continue
                if (b, c) in edges and (a, c) in edges:
                    count[a] += 1
                    count[b] += 1
                    count[c] += 1
    assert got == dict(count)


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["key", "agg", "row", "scan", "slow", "fast",
                         "table", "value", "part", "hash"]),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=15,
)


def _docs_df(docs):
    return pd.DataFrame(
        {
            "doc_id": range(1, len(docs) + 1),
            "text": [" ".join(ws) for ws in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(" ".join(ws)) for ws in docs],
        }
    )


def _md5_u32_py(tag: str, val: str) -> int:
    import hashlib

    return int(hashlib.md5(f"{tag}:{val}".encode()).hexdigest()[:8], 16)


@settings(max_examples=30, deadline=None)
@given(docs_strategy)
def test_cms_matches_brute_force(docs):
    from collections import Counter

    pdf = _docs_df(docs)
    got = {
        r[0]: (r[1], r[2])
        for r in _oracle_tables("count_min_heavy_estimates", {"documents": pdf})
    }
    wc = Counter(w for ws in docs for w in ws if w)
    if not wc:
        assert got == {}
        return
    # independent pure-python CMS (same md5 family, D=4 x W=16)
    sketch = [[0] * 16 for _ in range(4)]
    for w, n in wc.items():
        for d in range(4):
            sketch[d][_md5_u32_py(f"cms{d}", w) % 16] += n
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    exp = {
        w: (n, min(sketch[d][_md5_u32_py(f"cms{d}", w) % 16] for d in range(4)))
        for w, n in top
    }
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60))
def test_hll_state_matches_brute_force(custkeys):
    rows = [
        {
            "o_orderkey": i + 1,
            "o_custkey": c,
            "o_orderstatus": "O",
            "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": "1-URGENT",
        }
        for i, c in enumerate(custkeys)
    ]
    got = _oracle_tables(
        "approx_distinct_hll_portable", {"orders": pd.DataFrame(rows)}
    )[0]
    regs = {}
    for c in set(custkeys):
        h = _md5_u32_py("hll", str(c))
        bkt, w = h % 64, h // 64
        rho = 27 if w == 0 else (27 - w.bit_length())
        regs[bkt] = max(regs.get(bkt, 0), rho)
    s_pow = sum(2 ** (27 - m) for m in regs.values()) + (64 - len(regs)) * 2 ** 27
    assert (got[0], got[1], got[2], got[3]) == (
        64, s_pow, 64 - len(regs), len(set(custkeys))
    )


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=80))
def test_kmv_state_matches_brute_force(custkeys):
    rows = [
        {
            "o_orderkey": i + 1,
            "o_custkey": c,
            "o_orderstatus": "O",
            "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": "1-URGENT",
        }
        for i, c in enumerate(custkeys)
    ]
    got = _oracle_tables(
        "approx_distinct_kmv_portable", {"orders": pd.DataFrame(rows)}
    )[0]
    hs = sorted(_md5_u32_py("kmv", str(c)) for c in set(custkeys))
    top = hs[:32]
    kth, n = max(top), len(top)
    if n < 32:
        est = n
    elif kth == 0:
        est = 0
    else:
        est = 31 * 4_294_967_296 // kth
    assert got == (32, n, kth, est, len(set(custkeys)))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # custkey
            st.integers(min_value=1, max_value=6),  # partkey
        ),
        min_size=1,
        max_size=60,
    )
)
def test_kcore_matches_brute_force(pairs):
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(1, len(pairs) + 1)),
            "o_custkey": [c for c, _ in pairs],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": list(range(1, len(pairs) + 1)),
            "l_partkey": [p for _, p in pairs],
        }
    )
    got = sorted(
        _oracle_tables(
            "kcore_copurchase", {"orders": orders, "lineitem": lineitem}
        )
    )
    # independent naive peel (k=3, T=4 rounds) on the same blocking
    cp = set(pairs)
    buyers = {}
    for c, p in cp:
        buyers.setdefault(p, set()).add(c)
    edges = set()
    for p, cs in buyers.items():
        if len(cs) <= 15:
            for a in cs:
                for b in cs:
                    if a != b:
                        edges.add((a, b))
    alive = {u for u, _ in edges}
    for _ in range(4):
        deg = {}
        for u, v in edges:
            if u in alive and v in alive:
                deg[u] = deg.get(u, 0) + 1
        alive = {u for u, d in deg.items() if d >= 3}
    fin = {}
    for u, v in edges:
        if u in alive and v in alive:
            fin[u] = fin.get(u, 0) + 1
    assert got == sorted(fin.items())


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # custkey
            st.integers(min_value=1, max_value=6),  # partkey
        ),
        min_size=1,
        max_size=60,
    )
)
def test_bfs_hop_census_matches_brute_force(pairs):
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(1, len(pairs) + 1)),
            "o_custkey": [c for c, _ in pairs],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": list(range(1, len(pairs) + 1)),
            "l_partkey": [p for _, p in pairs],
        }
    )
    got = sorted(
        _oracle_tables(
            "bfs_hop_census", {"orders": orders, "lineitem": lineitem}
        )
    )
    # independent naive BFS on the same blocking
    cp = set(pairs)
    buyers = {}
    for c, p in cp:
        buyers.setdefault(p, set()).add(c)
    nbrs: dict[int, set[int]] = {}
    for p, cs in buyers.items():
        if len(cs) <= 15:
            for a in cs:
                for b in cs:
                    if a != b:
                        nbrs.setdefault(a, set()).add(b)
    if not nbrs:
        assert got == []
        return
    hub = max(nbrs, key=lambda u: (len(nbrs[u]), -u))
    level = {hub: 0}
    frontier = [hub]
    for h in range(1, 5):
        nxt = []
        for u in frontier:
            for v in nbrs[u]:
                if v not in level:
                    level[v] = h
                    nxt.append(v)
        frontier = nxt
    census: dict[int, tuple[int, int]] = {}
    for node, h in level.items():
        n, mn = census.get(h, (0, 1 << 60))
        census[h] = (n + 1, min(mn, node))
    assert got == sorted((h, n, mn) for h, (n, mn) in census.items())


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_shapley_matches_brute_force_permutations(rows):
    from itertools import permutations

    pdf = _events_df(rows)
    got = {r[0]: r[1] for r in _oracle("shapley_channel_attribution", pdf)}
    # independent definition: per-user pre-first-purchase channel
    # masks, then the PERMUTATION form of the Shapley value (average
    # marginal contribution over all 4! channel orderings) — a
    # different formula from the oracle's coalition-weight sum.
    base = 1_704_067_200_000_000
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, ty, sec, cents in rows:
        by_user.setdefault(u + 1, []).append((base + sec * 1_000_000, ty))
    masks = []
    for u, evs in by_user.items():
        pts = [us for us, ty in evs if ty == "purchase"]
        if not pts:
            continue
        fp = min(pts)
        m = 0
        for us, ty in evs:
            if us < fp and ty != "purchase":
                m |= bits[ty]
        if m:
            masks.append(m)

    def v(s: int) -> int:
        return sum(1 for m in masks if (m & s) == m)

    x24 = {name: 0 for name in bits}
    for perm in permutations(bits.values()):
        s = 0
        for b in perm:
            name = next(k for k, v_ in bits.items() if v_ == b)
            x24[name] += v(s | b) - v(s)
            s |= b
    assert got == x24
    # efficiency axiom: total attribution == 24 * v(full universe)
    assert sum(x24.values()) == 24 * v(15)


@settings(max_examples=30, deadline=None)
@given(docs_strategy)
def test_ndcg_matches_brute_force(docs):
    import math

    pdf = _docs_df(docs)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in _oracle_tables("ndcg_at_10", {"documents": pdf})
    }
    disc = [round(1e6 / math.log2(r + 1)) for r in range(1, 11)]
    queries = {1: ["scan", "fast"], 2: ["merge", "batch"],
               3: ["hash", "value"], 4: ["slow", "table"]}
    exp = {}
    for qid, terms in queries.items():
        cands = []
        for doc_id, ws in enumerate(docs, start=1):
            score = sum(1 for w in ws if w in terms)
            gain = len({w for w in ws if w in terms})
            if score > 0:
                cands.append((doc_id, score, gain))
        if not cands:
            continue
        by_score = sorted(cands, key=lambda c: (-c[1], c[0]))[:10]
        dcg = sum(g * disc[r] for r, (_, _, g) in enumerate(by_score))
        by_gain = sorted(cands, key=lambda c: (-c[2], c[0]))[:10]
        idcg = sum(g * disc[r] for r, (_, _, g) in enumerate(by_gain))
        exp[qid] = (dcg, idcg, dcg * 1_000_000 // idcg)
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_markov_removal_matches_brute_force(rows):
    pdf = _events_df(rows)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in _oracle_tables("markov_attribution_removal",
                                {"events": pdf})
    }
    # independent absorbing-chain replay: build journeys, count
    # transitions, run the SAME K=8 value iteration in pure Python
    # (removal = forcing x(channel) to 0 each step).
    base = 1_704_067_200_000_000
    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for i, (u, ty, sec, cents) in enumerate(rows):
        by_user.setdefault(u + 1, []).append(
            (base + sec * 1_000_000, i + 1, ty)
        )
    from collections import Counter

    tr: Counter = Counter()
    for u, evs in by_user.items():
        pts = [us for us, eid, ty in evs if ty == "purchase"]
        fp = min(pts) if pts else None
        touches = sorted(
            (us, eid, ty)
            for us, eid, ty in evs
            if ty != "purchase" and (fp is None or us < fp)
        )
        if not touches:
            if fp is not None:
                tr[("START", "CONV")] += 1
            continue
        prev = "START"
        for _, _, ty in touches:
            tr[(prev, ty)] += 1
            prev = ty
        tr[(prev, "CONV" if fp is not None else "DROP")] += 1
    if not tr:
        assert got == {}
        return
    out: Counter = Counter()
    for (s, _), n in tr.items():
        out[s] += n
    p = {(s, d): n / out[s] for (s, d), n in tr.items()}
    channels = ["click", "error", "signup", "view"]
    states = channels + ["START"]

    def iterate(removed):
        x = {s: 0.0 for s in states}
        for _ in range(8):
            nx = {}
            for s in states:
                if s == removed:
                    nx[s] = 0.0
                    continue
                nx[s] = p.get((s, "CONV"), 0.0) + sum(
                    p.get((s, t), 0.0) * x[t] for t in channels
                )
            x = nx
        return x["START"]

    p_full = iterate(None)
    exp = {}
    for c in channels:
        p_rm = iterate(c)
        re_ = 1.0 - p_rm / p_full if p_full > 0 else 0.0
        exp[c] = (p_full, p_rm, re_)
    # compare the oracle's published 6dp value against the UNROUNDED
    # replay: a correct round sits within 5e-7 of the true value, so
    # the bound tolerates dyadic-rational ties (0.6640625 rounds
    # half-AWAY in both engines but half-EVEN in Python's round() —
    # hypothesis found exactly that example) while still failing on
    # any real algorithmic divergence (those show up at >= 1e-6).
    assert set(got) == set(exp)
    for c in exp:
        for a, b in zip(got[c], exp[c]):
            assert abs(a - b) < 5.01e-7, (c, got[c], exp[c])


orders_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # customer bucket
        st.integers(min_value=1, max_value=5_000_000),  # cents
        st.integers(min_value=0, max_value=2000),  # days after 1995-01-01
        st.integers(min_value=0, max_value=2),  # priority idx
        st.integers(min_value=0, max_value=1),  # status idx
    ),
    min_size=1,
    max_size=40,
)

_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
_STATS = ["O", "F"]


def _orders_df(rows):
    return pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [c + 1 for c, *_ in rows],
            "o_orderstatus": [_STATS[s] for *_, s in rows],
            "o_totalprice": [cents / 100.0 for _, cents, *_ in rows],
            "o_orderdate": [
                pd.Timestamp("1995-01-01") + pd.Timedelta(days=d)
                for _, _, d, _, _ in rows
            ],
            "o_orderpriority": [_PRIOS[p] for *_, p, _ in rows],
        }
    )


@settings(max_examples=40, deadline=None)
@given(orders_strategy)
def test_psi_matches_brute_force(rows):
    import math

    pdf = _orders_df(rows)
    got = {r[0]: (r[1], r[2], r[3])
           for r in _oracle_tables("psi_feature_drift", {"orders": pdf})}
    split = pd.Timestamp("1998-01-01")
    nr = [0] * 10
    nc = [0] * 10
    for _, cents, d, _, _ in rows:
        b = min(cents // 5_000_000, 9)
        if pd.Timestamp("1995-01-01") + pd.Timedelta(days=d) < split:
            nr[b] += 1
        else:
            nc[b] += 1
    sna = sum(nr) + 10
    sma = sum(nc) + 10
    exp = {}
    for b in range(10):
        na, ma = nr[b] + 1, nc[b] + 1
        term = ((na * sma - ma * sna) / (sna * sma)) * (
            math.log(na * sma) - math.log(ma * sna)
        )
        exp[b] = (nr[b], nc[b], round(term, 6))
    assert set(got) == set(exp)
    for b in exp:
        assert got[b][:2] == exp[b][:2]
        assert abs(got[b][2] - exp[b][2]) < 1e-9, (b, got[b], exp[b])


@settings(max_examples=40, deadline=None)
@given(orders_strategy)
def test_chi2_matches_brute_force(rows):
    from collections import Counter

    pdf = _orders_df(rows)
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in _oracle_tables("chi2_independence_audit", {"orders": pdf})
    }
    cells = Counter((_PRIOS[p], _STATS[s]) for *_, p, s in rows)
    rt = Counter()
    ct = Counter()
    for (p, s), n in cells.items():
        rt[p] += n
        ct[s] += n
    n_tot = sum(cells.values())
    exp = {}
    for (p, s), obs in cells.items():
        d = obs * n_tot - rt[p] * ct[s]
        exp[(p, s)] = (obs, round((d * d) / (n_tot * rt[p] * ct[s]), 6))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) < 1e-9, (k, got[k], exp[k])


@settings(max_examples=40, deadline=None)
@given(orders_strategy)
def test_target_encode_loo_matches_brute_force(rows):
    pdf = _orders_df(rows)
    # keys 1..40 never hit the % 199 output sample; stretch half of
    # them onto the sampled lattice so the property exercises both
    # published and unpublished rows
    pdf["o_orderkey"] = [
        k * 199 if k % 2 == 0 else k for k in pdf["o_orderkey"]
    ]
    customer = pd.DataFrame(
        {
            "c_custkey": range(1, 7),
            "c_name": [f"c{i}" for i in range(6)],
            "c_nationkey": [i % 3 for i in range(6)],
            "c_acctbal": [0.0] * 6,
            "c_mktsegment": ["B"] * 6,
        }
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in _oracle_tables(
            "target_encode_loo", {"orders": pdf, "customer": customer}
        )
    }
    nation_of = {i + 1: i % 3 for i in range(6)}
    recs = [
        (int(pdf["o_orderkey"][ok]), nation_of[c + 1], cents)
        for ok, (c, cents, *_rest) in enumerate(rows)
    ]
    from collections import defaultdict

    gs = defaultdict(int)
    gn = defaultdict(int)
    for _, nat, cents in recs:
        gs[nat] += cents
        gn[nat] += 1
    sa = sum(cents for *_, cents in recs)
    na = len(recs)
    exp = {}
    for ok, nat, cents in recs:
        if ok % 199 != 0 or na <= 1:
            continue
        if gn[nat] > 1:
            enc = (gs[nat] - cents) // (gn[nat] - 1)
        else:
            enc = (sa - cents) // (na - 1)
        exp[ok] = (nat, cents, enc)
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_kaplan_meier_matches_brute_force(rows):
    import math

    pdf = _events_df(rows)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in _oracle("kaplan_meier_survival", pdf)
    }
    base = 1_704_067_200_000_000
    day_us = 86_400_000_000
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, ty, sec, cents in rows:
        by_user.setdefault(u + 1, []).append((base + sec * 1_000_000, ty))
    durs = []
    for u, evs in by_user.items():
        first = min(us for us, _ in evs)
        last = max(us for us, _ in evs)
        pts = [us for us, ty in evs if ty == "purchase"]
        if pts:
            durs.append(((min(pts) - first) // day_us, 1))
        else:
            durs.append(((last - first) // day_us, 0))
    days = sorted({d for d, _ in durs})
    exp = {}
    s = 1.0
    lsum = 0.0
    dead = False
    for day in days:
        d_ev = sum(1 for d, e in durs if d == day and e == 1)
        n_risk = sum(1 for d, _ in durs if d >= day)
        if d_ev > 0 and n_risk > d_ev:
            lsum += math.log(n_risk - d_ev) - math.log(n_risk)
        if d_ev >= n_risk:
            dead = True
        if d_ev > 0:
            s = 0.0 if dead else math.exp(lsum)
            exp[day] = (n_risk, d_ev, round(s, 6))
    assert set(got) == set(exp)
    for day in exp:
        assert got[day][:2] == exp[day][:2]
        assert abs(got[day][2] - exp[day][2]) < 1e-9, (day, got[day], exp[day])


# wide-span event strategy: second offsets up to ~18 days so the
# trailing-7d window and the day-ordered HLL merge see real day
# boundaries (the shared events_strategy only spans ~5 days)
wide_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # user bucket
        st.integers(min_value=0, max_value=1_600_000),  # seconds offset
    ),
    min_size=1,
    max_size=60,
)

_BASE_US = 1_704_067_200_000_000
_DAY_US = 86_400_000_000


def _wide_events_df(rows):
    recs = []
    for i, (u, sec) in enumerate(rows):
        recs.append(
            {
                "event_id": i + 1,
                "ts": pd.Timestamp(_BASE_US + sec * 1_000_000, unit="us"),
                "user_id": u + 1,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
        )
    return pd.DataFrame(recs)


@settings(max_examples=40, deadline=None)
@given(wide_events_strategy)
def test_trailing_7d_matches_brute_force(rows):
    pdf = _wide_events_df(rows)
    got = {r[0]: (r[1], r[2]) for r in _oracle("trailing_7d_distinct_users", pdf)}
    du = {( (_BASE_US + sec * 1_000_000) // _DAY_US, u + 1) for u, sec in rows}
    days = sorted({d for d, _ in du})
    exp = {}
    for d in days:
        d1 = len({u for dd, u in du if dd == d})
        d7 = len({u for dd, u in du if d - 6 <= dd <= d})
        exp[d] = (d1, d7)
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(wide_events_strategy)
def test_hll_merge_daily_matches_brute_force(rows):
    pdf = _wide_events_df(rows)
    got = {r[0]: (r[1], r[2], r[3]) for r in _oracle("hll_merge_daily_users", pdf)}
    du = {((_BASE_US + sec * 1_000_000) // _DAY_US, u + 1) for u, sec in rows}
    days = sorted({d for d, _ in du})
    exp = {}
    for d in days:
        seen = {u for dd, u in du if dd <= d}
        regs: dict[int, int] = {}
        for u in seen:
            h = _md5_u32_py("hlld", str(u))
            bkt, w = h % 64, h // 64
            rho = 27 if w == 0 else (27 - w.bit_length())
            regs[bkt] = max(regs.get(bkt, 0), rho)
        s_pow = sum(2 ** (27 - m) for m in regs.values()) + (
            64 - len(regs)
        ) * 2**27
        exp[d] = (s_pow, 64 - len(regs), len(seen))
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=30),  # l_partkey
        min_size=1,
        max_size=80,
    )
)
def test_ams_f2_matches_brute_force(keys):
    from collections import Counter

    pdf = pd.DataFrame({"l_partkey": keys})
    got = _oracle_tables("ams_f2_selfjoin_size", {"lineitem": pdf})[0]
    cnt = Counter(keys)
    f2 = sum(n * n for n in cnt.values())
    sum_z2 = 0
    for r in range(16):
        z = sum(
            (1 - 2 * (_md5_u32_py(f"ams{r}", str(k)) % 2)) * n
            for k, n in cnt.items()
        )
        sum_z2 += z * z
    assert got == (len(cnt), f2, sum_z2, sum_z2 // 16)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=40_000_000),  # cents
        min_size=1,
        max_size=80,
    )
)
def test_ddsketch_matches_brute_force(cents):
    pdf = pd.DataFrame({"o_totalprice": [c / 100.0 for c in cents]})
    got = {r[0]: r[1:] for r in _oracle_tables("ddsketch_pow2_quantiles", {"orders": pdf})}
    n = len(cents)
    sv = sorted(cents)
    exp = {}
    for q in (50, 90, 99):
        rk = (q * n + 99) // 100
        # sketch readout: bucket of the rank-rk value
        b = sv[rk - 1].bit_length()
        lo, hi = 1 << (b - 1), (1 << b) - 1
        exp[q] = (n, rk, b, lo, hi, (lo + hi) // 2)
        # the DDSketch guarantee: true quantile inside [lo, hi]
        assert lo <= sv[rk - 1] <= hi
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=120),  # user
            st.sampled_from(["click", "purchase"]),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_kmv_intersection_matches_brute_force(rows):
    recs = [
        {
            "event_id": i + 1,
            "ts": pd.Timestamp(1_704_067_200_000_000 + i * 1_000_000, unit="us"),
            "user_id": u,
            "event_type": ty,
            "value": 1.0,
            "props": "{}",
        }
        for i, (u, ty) in enumerate(rows)
    ]
    got = _oracle_tables("kmv_set_intersection", {"events": pd.DataFrame(recs)})[0]
    K, TWO32 = 32, 4_294_967_296
    ua = {u for u, ty in rows if ty == "click"}
    ub = {u for u, ty in rows if ty == "purchase"}
    sa = sorted({_md5_u32_py("kmvi", str(u)) for u in ua})[:K]
    sb = sorted({_md5_u32_py("kmvi", str(u)) for u in ub})[:K]
    su = sorted(set(sa) | set(sb))[:K]
    kth_u, got_u = (max(su), len(su)) if su else (None, 0)
    n_common = len({h for h in set(sa) & set(sb) if h <= kth_u}) if su else 0
    if got_u < K:
        est_union = got_u
    elif kth_u == 0:
        est_union = 0
    else:
        est_union = (K - 1) * TWO32 // kth_u
    est_inter = n_common if got_u < K else (n_common * est_union) // K
    exact = len(ua & ub)
    assert got == (K, got_u, kth_u, n_common, est_union, est_inter, exact)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10),  # order
            st.integers(min_value=1, max_value=8),  # part
        ),
        min_size=1,
        max_size=60,
    )
)
def test_item_cf_matches_brute_force(pairs):
    from collections import Counter
    from itertools import permutations

    pdf = pd.DataFrame(
        {"l_orderkey": [o for o, _ in pairs], "l_partkey": [p for _, p in pairs]}
    )
    got = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in _oracle_tables("item_cf_similarity_topk", {"lineitem": pdf})
    }
    cp = set(pairs)
    pc = Counter(p for _, p in cp)
    baskets = {}
    for o, p in cp:
        baskets.setdefault(o, set()).add(p)
    sup = Counter()
    for items in baskets.values():
        for a, b in permutations(sorted(items), 2):
            sup[(a, b)] += 1
    exp = {}
    per_item = {}
    for (a, b), s in sup.items():
        if s < 2:
            continue
        cos2 = (s * s * 1_000_000) // (pc[a] * pc[b])
        per_item.setdefault(a, []).append((-cos2, -s, b))
    for a, lst in per_item.items():
        for rnk, (negc, negs, b) in enumerate(sorted(lst)[:5], start=1):
            exp[(a, b)] = (-negs, -negc, rnk)
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["src0", "src1"]),
            st.text(
                alphabet=["a", "é", "語", " "], min_size=0, max_size=40
            ),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_file_compaction_matches_brute_force(rows):
    recs = [
        {"doc_id": i * 7, "text": txt, "lang": "en", "source": src,
         "n_chars": len(txt)}
        for i, (src, txt) in enumerate(rows)
    ]
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in _oracle_tables("file_compaction_plan", {"documents": pd.DataFrame(recs)})
    }
    TARGET = 65_536
    by_src = {}
    for r in recs:
        by_src.setdefault(r["source"], []).append(r)
    exp = {}
    for src, docs in by_src.items():
        pre = 0
        for d in sorted(docs, key=lambda d: d["doc_id"]):
            b = len(d["text"].encode("utf-8"))
            grp = pre // TARGET
            key = (src, grp)
            n, tot, mn, mx = exp.get(key, (0, 0, d["doc_id"], d["doc_id"]))
            exp[key] = (n + 1, tot + b, min(mn, d["doc_id"]), max(mx, d["doc_id"]))
            pre += b
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["join", "filter", "window", "the", "a"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_rrf_matches_brute_force(docs):
    recs = [
        {"doc_id": i + 1, "text": " ".join(ws), "lang": "en",
         "source": "src0", "n_chars": len(" ".join(ws))}
        for i, ws in enumerate(docs)
    ]
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in _oracle_tables("reciprocal_rank_fusion", {"documents": pd.DataFrame(recs)})
    }
    exp = {}
    for term in ("join", "filter", "window"):
        cand = []
        for i, ws in enumerate(docs):
            tf = sum(1 for w in ws if w == term)
            if tf > 0:
                cand.append((i + 1, tf, len(ws)))
        ra = {d: r for r, (d, _, _) in enumerate(
            sorted(cand, key=lambda c: (-c[1], c[0]))[:20], start=1)}
        rb = {d: r for r, (d, _, _) in enumerate(
            sorted(cand, key=lambda c: (-((c[1] * 1_000_000) // c[2]), c[0]))[:20],
            start=1)}
        fused = []
        for d in set(ra) | set(rb):
            s = 0
            if d in ra:
                s += 1_000_000 // (60 + ra[d])
            if d in rb:
                s += 1_000_000 // (60 + rb[d])
            fused.append((d, s))
        for rnk, (d, s) in enumerate(
            sorted(fused, key=lambda x: (-x[1], x[0]))[:10], start=1
        ):
            exp[(term, d)] = (s, rnk)
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),  # orderkey
            st.sampled_from(["O", "F", "P"]),
            st.integers(min_value=0, max_value=400),  # order day offset
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),  # orderkey ref
            st.integers(min_value=1, max_value=900_000),  # cents
            st.integers(min_value=0, max_value=400),  # ship day offset
        ),
        min_size=1,
        max_size=40,
    ),
)
def test_ivm_join_delta_matches_brute_force(orders, lines):
    base = pd.Timestamp("2000-06-01")
    opdf = pd.DataFrame(
        [
            {"o_orderkey": k, "o_orderstatus": s,
             "o_orderdate": base + pd.Timedelta(days=d)}
            for k, s, d in orders
        ]
    )
    lpdf = pd.DataFrame(
        [
            {"l_orderkey": k, "l_extendedprice": c / 100.0,
             "l_shipdate": base + pd.Timedelta(days=d)}
            for k, c, d in lines
        ]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables(
            "ivm_join_delta", {"orders": opdf, "lineitem": lpdf}
        )
    }
    cut = pd.Timestamp("2001-01-01")
    okeys = {k: (s, base + pd.Timedelta(days=d) >= cut) for k, s, d in orders}
    exp = {}
    for k, c, d in lines:
        if k not in okeys:
            continue
        s, od = okeys[k]
        ld = base + pd.Timedelta(days=d) >= cut
        bb, bd, db, dd, tot, n = exp.get(k_s := s, (None, 0, 0, 0, 0, 0))
        term = (
            "bb" if not od and not ld
            else "bd" if not od
            else "db" if not ld
            else "dd"
        )
        # terms: bb may be NULL (None) when absent, others coalesce 0
        vals = {"bb": bb, "bd": bd, "db": db, "dd": dd}
        vals[term] = (vals[term] or 0) + c
        exp[k_s] = (vals["bb"], vals["bd"], vals["db"], vals["dd"],
                    tot + c, n + 1)
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["Brand#1", "Brand#2"]),
            st.integers(min_value=0, max_value=20),  # week
            st.integers(min_value=1, max_value=500_000),  # cents
        ),
        min_size=2,
        max_size=40,
    )
)
def test_theil_sen_matches_brute_force(rows):
    parts, lines = {}, []
    for i, (brand, w, c) in enumerate(rows):
        parts[i + 1] = brand
        lines.append(
            {"l_partkey": i + 1, "l_extendedprice": c / 100.0,
             "l_shipdate": pd.Timestamp("1995-01-01")
             + pd.Timedelta(days=7 * w)}
        )
    ppdf = pd.DataFrame(
        [{"p_partkey": k, "p_brand": b} for k, b in parts.items()]
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in _oracle_tables(
            "theil_sen_trend",
            {"lineitem": pd.DataFrame(lines), "part": ppdf},
        )
    }
    wk = {}
    for i, (brand, w, c) in enumerate(rows):
        wk[(brand, w)] = wk.get((brand, w), 0) + c
    exp = {}
    by_brand = {}
    for (brand, w), rev in wk.items():
        by_brand.setdefault(brand, []).append((w, rev))
    for brand, pts in by_brand.items():
        slopes = []
        for wi, yi in pts:
            for wj, yj in pts:
                if wi < wj:
                    num = (yj - yi) * 1_000_000
                    gap = wj - wi
                    q = abs(num) // gap * (1 if num >= 0 else -1)
                    slopes.append(q)
        if not slopes:
            continue
        slopes.sort()
        exp[brand] = (
            len(pts),
            len(slopes),
            slopes[(len(slopes) + 1) // 2 - 1],
        )
    # brands with a single week produce no pairs and no output row
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(wide_events_strategy)
def test_cohort_ltv_matches_brute_force(rows):
    recs = [
        {
            "event_id": i + 1,
            "ts": pd.Timestamp(_BASE_US + sec * 1_000_000, unit="us"),
            "user_id": u + 1,
            "event_type": "purchase",
            "value": ((i * 37) % 5000 + 1) / 100.0,
            "props": "{}",
        }
        for i, (u, sec) in enumerate(rows)
    ]
    got = {
        (r[0], r[1]): r[2:]
        for r in _oracle_tables("cohort_ltv_curve", {"events": pd.DataFrame(recs)})
    }
    WEEK = 7 * 86_400 * 1_000_000
    per_user = {}
    for i, (u, sec) in enumerate(rows):
        wkn = (_BASE_US + sec * 1_000_000) // WEEK
        cents = (i * 37) % 5000 + 1
        per_user.setdefault(u + 1, []).append((wkn, cents))
    cohorts = {u: min(w for w, _ in evs) for u, evs in per_user.items()}
    csize = {}
    for u, cw in cohorts.items():
        csize[cw] = csize.get(cw, 0) + 1
    rev = {}
    for u, evs in per_user.items():
        cw = cohorts[u]
        for w, c in evs:
            key = (cw, w - cw)
            rev[key] = rev.get(key, 0) + c
    exp = {}
    for cw in {k[0] for k in rev}:
        cum = 0
        for age in sorted(a for c, a in rev if c == cw):
            cum += rev[(cw, age)]
            exp[(cw, age)] = (
                csize[cw],
                rev[(cw, age)],
                cum,
                cum // csize[cw],
            )
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),  # custkey
            st.integers(min_value=1, max_value=3_000_000),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_pct_of_parent_matches_brute_force(orders):
    cust = pd.DataFrame(
        [{"c_custkey": c, "c_nationkey": c % 4} for c in range(1, 9)]
    )
    nat = pd.DataFrame(
        [
            {"n_nationkey": n, "n_name": f"N{n}", "n_regionkey": n % 2}
            for n in range(4)
        ]
    )
    reg = pd.DataFrame(
        [{"r_regionkey": r, "r_name": f"R{r}"} for r in range(2)]
    )
    opdf = pd.DataFrame(
        [
            {"o_orderkey": i + 1, "o_custkey": c, "o_totalprice": cents / 100.0}
            for i, (c, cents) in enumerate(orders)
        ]
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in _oracle_tables(
            "pct_of_parent_rollup",
            {"orders": opdf, "customer": cust, "nation": nat, "region": reg},
        )
    }
    nrev = {}
    for c, cents in orders:
        n = c % 4
        nrev[n] = nrev.get(n, 0) + cents
    rrev = {}
    for n, v in nrev.items():
        rrev[n % 2] = rrev.get(n % 2, 0) + v
    g = sum(rrev.values())
    exp = {}
    for n, v in nrev.items():
        r = n % 2
        exp[(f"R{r}", f"N{n}")] = (
            v,
            rrev[r],
            v * 10000 // rrev[r],
            rrev[r] * 10000 // g,
        )
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=49_002),  # cents
        min_size=1,
        max_size=80,
    )
)
def test_stream_ddsketch_hist_matches_brute_force(cents):
    recs = [
        {
            "event_id": i + 1,
            "ts": pd.Timestamp(1_704_067_200_000_000 + i, unit="us"),
            "user_id": 1,
            "event_type": "view",
            "value": c / 100.0,
            "props": "{}",
        }
        for i, c in enumerate(cents)
    ]
    got = _oracle_tables(
        "stream_ddsketch_value_hist", {"events": pd.DataFrame(recs)}
    )[0]
    from collections import Counter

    hist = Counter(c.bit_length() for c in cents)
    bkts = sorted(hist)
    # The oracle serializes the parallel lists to comma-joined strings
    # (the repo's oracle-hashing convention, plans/textq.py:77).
    assert (got[0], got[1], got[2]) == (
        ",".join(str(b) for b in bkts),
        ",".join(str(hist[b]) for b in bkts),
        len(cents),
    )


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10),  # custkey
            st.integers(min_value=1, max_value=6),  # partkey
        ),
        min_size=1,
        max_size=40,
    )
)
def test_link_prediction_matches_brute_force(pairs):
    from itertools import combinations

    opdf = pd.DataFrame(
        [
            {"o_orderkey": i + 1, "o_custkey": c}
            for i, (c, _) in enumerate(pairs)
        ]
    )
    lpdf = pd.DataFrame(
        [
            {"l_orderkey": i + 1, "l_partkey": p}
            for i, (_, p) in enumerate(pairs)
        ]
    )
    got = [
        tuple(r)
        for r in _oracle_tables(
            "graph_jaccard_link_prediction",
            {"orders": opdf, "lineitem": lpdf},
        )
    ]
    buyers = {}
    for c, p in set(pairs):
        buyers.setdefault(p, set()).add(c)
    edges = set()
    for p, cs in buyers.items():
        if len(cs) <= 15:
            for a, b in combinations(sorted(cs), 2):
                edges.add((a, b))
    nbr = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    cand = {}
    for m, ns in nbr.items():
        for x in ns:
            for z in ns:
                if x < z and (x, z) not in edges:
                    cand[(x, z)] = len(nbr[x] & nbr[z])
    scored = [
        (x, z, cn, cn * 1_000_000 // (len(nbr[x]) + len(nbr[z]) - cn))
        for (x, z), cn in cand.items()
    ]
    scored.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    assert got == scored[:50]


def _shingles_py(text: str):
    ws = [w for w in text.lower().split(" ") if w]
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=3,
            max_size=10,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_containment_matches_brute_force(docs):
    recs = [
        {"doc_id": i + 1, "text": " ".join(ws), "lang": "en",
         "source": "src0", "n_chars": 0}
        for i, ws in enumerate(docs)
    ]
    got = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in _oracle_tables(
            "dedup_containment_prefix", {"documents": pd.DataFrame(recs)}
        )
    }
    sets = {i + 1: _shingles_py(" ".join(ws)) for i, ws in enumerate(docs)}
    exp = {}
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b or not sb:
                continue
            inter = len(sa & sb)
            if inter * 4 >= 3 * len(sa):
                exp[(a, b)] = (
                    len(sa),
                    inter,
                    inter * 10000 // len(sa),
                )
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=15),  # user
            st.sampled_from(["click", "view"]),
        ),
        min_size=5,
        max_size=120,
    )
)
def test_wilson_matches_brute_force(rows):
    import math

    recs = [
        {
            "event_id": i + 1,
            "ts": pd.Timestamp(1_704_067_200_000_000 + i, unit="us"),
            "user_id": u,
            "event_type": ty,
            "value": 1.0,
            "props": "{}",
        }
        for i, (u, ty) in enumerate(rows)
    ]
    got = [
        tuple(r)
        for r in _oracle_tables("ctr_wilson_ranking", {"events": pd.DataFrame(recs)})
    ]
    stats = {}
    for u, ty in rows:
        c, n = stats.get(u, (0, 0))
        stats[u] = (c + (ty == "click"), n + 1)
    scored = []
    for u, (c, n) in stats.items():
        if n < 5:
            continue
        p = c / n
        lb = (p + 3.8416 / (2 * n)
              - 1.96 * math.sqrt(((p * (1 - p)) + 3.8416 / (4 * n)) / n)
              ) / (1 + 3.8416 / n)
        scored.append((u, c, n, lb))
    scored.sort(key=lambda r: (-r[3], r[0]))
    top = scored[:20]
    assert [(r[0], r[1], r[2]) for r in got] == [
        (r[0], r[1], r[2]) for r in top
    ]
    for g, e in zip(got, top):
        assert abs(g[3] - round(e[3], 6)) < 1e-9


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user bucket
            st.sampled_from(["click", "view", "purchase"]),
            st.integers(min_value=1, max_value=40_000),  # cents
        ),
        min_size=1,
        max_size=60,
    )
)
def test_clamped_balance_matches_literal_recursion(rows):
    recs = [
        {
            "event_id": i + 1,
            "ts": pd.Timestamp(1_704_067_200_000_000 + i * 1_000_000, unit="us"),
            "user_id": u + 1,
            "event_type": ty,
            "value": c / 100.0,
            "props": "{}",
        }
        for i, (u, ty, c) in enumerate(rows)
    ]
    got = {
        r[0]: r[1:]
        for r in _oracle_tables(
            "clamped_running_balance", {"events": pd.DataFrame(recs)}
        )
    }
    per_user = {}
    for i, (u, ty, c) in enumerate(rows):
        per_user.setdefault(u + 1, []).append(
            (i, c if ty == "purchase" else -c)
        )
    exp = {}
    for u, evs in per_user.items():
        s = b = peak = 0
        for _, d in evs:  # the LITERAL recursion the closed form must equal
            s += d
            b = max(0, b + d)
            peak = max(peak, b)
        exp[u] = (len(evs), s, b, peak)
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=400_000),  # cents, may be <= 0
            st.sampled_from(["O", "F", "P", "X"]),
            st.sampled_from(["1-URGENT", "5-LOW", "9-BAD"]),
            st.integers(min_value=1980, max_value=2020),  # year
        ),
        min_size=1,
        max_size=40,
    )
)
def test_expectations_audit_matches_brute_force(rows):
    recs = [
        {
            "o_orderkey": i + 1,
            "o_custkey": i + 1,
            "o_orderstatus": s,
            "o_totalprice": c / 100.0,
            "o_orderdate": pd.Timestamp(f"{y}-06-01"),
            "o_orderpriority": p,
        }
        for i, (c, s, p, y) in enumerate(rows)
    ]
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in _oracle_tables("expectations_audit", {"orders": pd.DataFrame(recs)})
    }
    n = len(rows)
    v = {
        "price_positive": sum(1 for c, *_ in rows if c <= 0),
        "status_domain": sum(1 for _, s, *_ in rows if s not in "OFP"),
        "priority_regex": sum(
            1 for *_, p, _y in [(r[0], r[1], r[2], r[3]) for r in rows]
            if not (p[0] in "12345" and p[1] == "-")
        ),
        "custkey_notnull": 0,
        "orderdate_range": sum(
            1 for *_, y in rows if y < 1990 or y >= 2010
        ),
    }
    exp = {k: (n, c, int(c == 0)) for k, c in v.items()}
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # nation
            st.sampled_from(["AUTOMOBILE", "BUILDING"]),
            st.integers(min_value=-99_999, max_value=999_999),  # bal cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_l_diversity_matches_brute_force(rows):
    pdf = pd.DataFrame(
        [
            {"c_custkey": i + 1, "c_nationkey": n, "c_mktsegment": s,
             "c_acctbal": c / 100.0}
            for i, (n, s, c) in enumerate(rows)
        ]
    )
    got = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in _oracle_tables("l_diversity_audit", {"customer": pdf})
    }
    groups = {}
    for n, s, c in rows:
        # both engines truncate integer division toward zero
        band = abs(c) // 200_000 * (1 if c >= 0 else -1)
        groups.setdefault((n, s), []).append(band)
    exp = {
        k: (len(v), len(set(v)), int(len(set(v)) < 3))
        for k, v in groups.items()
    }
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # week
            st.integers(min_value=1, max_value=900_000),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_wow_change_matches_brute_force(rows):
    base = pd.Timestamp("1995-01-01")
    pdf = pd.DataFrame(
        [
            {"o_orderkey": i + 1,
             "o_orderdate": base + pd.Timedelta(days=7 * w + i % 7),
             "o_totalprice": c / 100.0}
            for i, (w, c) in enumerate(rows)
        ]
    )
    got = {r[0]: r[1:] for r in _oracle_tables("revenue_wow_change", {"orders": pdf})}
    wk = {}
    for w, c in rows:
        n, r = wk.get(w, (0, 0))
        wk[w] = (n + 1, r + c)
    exp = {}
    for w, (n, r) in wk.items():
        if w - 1 in wk:
            pr = wk[w - 1][1]
            d = r - pr
            exp[w] = (n, r, pr, d, abs(d) * 10000 // pr * (1 if d >= 0 else -1))
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # nation
            st.integers(min_value=0, max_value=6),  # order count
        ),
        min_size=1,
        max_size=30,
    )
)
def test_gini_matches_brute_force(rows):
    cust = pd.DataFrame(
        [
            {"c_custkey": i + 1, "c_nationkey": n}
            for i, (n, _) in enumerate(rows)
        ]
    )
    orders = pd.DataFrame(
        [
            {"o_orderkey": 1000 * i + j, "o_custkey": i + 1}
            for i, (_, x) in enumerate(rows)
            for j in range(x)
        ],
        columns=["o_orderkey", "o_custkey"],
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in _oracle_tables(
            "gini_order_concentration",
            {"customer": cust, "orders": orders},
        )
    }
    by_nation: dict[int, list[int]] = {}
    for n, x in rows:
        by_nation.setdefault(n, []).append(x)
    exp = {}
    for n, xs in by_nation.items():
        xs.sort()
        cn, s = len(xs), sum(xs)
        if s == 0:
            continue
        two_ix = 2 * sum((i + 1) * x for i, x in enumerate(xs))
        exp[n] = (cn, s, (two_ix - (cn + 1) * s) * 1_000_000 // (cn * s))
    assert got == exp


two_sample_strategy = st.tuples(
    st.lists(st.integers(min_value=1, max_value=400), min_size=1,
             max_size=30),
    st.lists(st.integers(min_value=1, max_value=400), min_size=1,
             max_size=30),
)


def _two_sample_orders(samples):
    g0, g1 = samples
    recs = []
    for i, c in enumerate(g0):
        recs.append({"o_orderkey": i + 1, "o_orderpriority": "1-URGENT",
                     "o_totalprice": c / 100.0})
    for i, c in enumerate(g1):
        recs.append({"o_orderkey": 1000 + i, "o_orderpriority": "5-LOW",
                     "o_totalprice": c / 100.0})
    return pd.DataFrame(recs)


@settings(max_examples=40, deadline=None)
@given(two_sample_strategy)
def test_ks_two_sample_matches_brute_force(samples):
    g0, g1 = samples
    (row,) = _oracle_tables(
        "ks_two_sample_exact", {"orders": _two_sample_orders(samples)}
    )
    n0, n1 = len(g0), len(g1)
    vals = sorted(set(g0) | set(g1))
    best = None
    for v in vals:
        c0 = sum(1 for x in g0 if x <= v)
        c1 = sum(1 for x in g1 if x <= v)
        dn = abs(c0 * n1 - c1 * n0)
        if best is None or dn > best[1]:
            best = (v, dn)
    at_v, d_num = best
    assert row[:5] == (n0, n1, at_v, d_num, n0 * n1)
    # published ks_d: compare the engine's 6dp round against the
    # UNROUNDED exact ratio (round-tie discipline, see markov note)
    assert abs(row[5] - d_num / (n0 * n1)) < 5.01e-7


@settings(max_examples=40, deadline=None)
@given(two_sample_strategy)
def test_mann_whitney_matches_brute_force(samples):
    g0, g1 = samples
    (row,) = _oracle_tables(
        "mann_whitney_u_exact", {"orders": _two_sample_orders(samples)}
    )
    n0, n1 = len(g0), len(g1)
    allv = sorted(g0 + g1)
    # literal tie-average ranks: avg of 1-based positions of the value
    pos: dict[int, list[int]] = {}
    for i, v in enumerate(allv):
        pos.setdefault(v, []).append(i + 1)
    rank2 = {v: sum(ps) * 2 // len(ps) for v, ps in pos.items()}
    r1_x2 = sum(rank2[v] for v in g1)
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    u0_x2 = 2 * n0 * n1 - u1_x2
    assert row[:5] == (n0, n1, r1_x2, u1_x2, u0_x2)
    assert abs(row[5] - u1_x2 / (2 * n0 * n1)) < 5.01e-7


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=20),  # day
        ),
        min_size=1,
        max_size=40,
    )
)
def test_fano_matches_brute_force(rows):
    base = 1_704_067_200_000_000
    pdf = pd.DataFrame(
        [
            {
                "event_id": i + 1,
                "ts": pd.Timestamp(
                    base + d * 86_400_000_000 + (i % 1000) * 1_000_000,
                    unit="us",
                ),
                "user_id": u + 1,
            }
            for i, (u, d) in enumerate(rows)
        ]
    )
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in _oracle_tables("user_burstiness_fano", {"events": pdf})
    }
    days = [d for _, d in rows]
    span = max(days) - min(days) + 1
    per_user: dict[int, dict[int, int]] = {}
    for u, d in rows:
        per_user.setdefault(u + 1, {})
        per_user[u + 1][d] = per_user[u + 1].get(d, 0) + 1
    exp = {}
    for u, dd in per_user.items():
        kk = sum(dd.values())
        k2 = sum(k * k for k in dd.values())
        exp[u] = (
            kk,
            len(dd),
            span,
            (span * k2 - kk * kk) * 10_000 // (span * kk),
        )
    assert got == exp


import math

_nb_words = ["aa", "bb", "cc", "dd"]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.lists(st.sampled_from(_nb_words), min_size=1,
                     max_size=6),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_naive_bayes_matches_brute_force(docs):
    pdf = pd.DataFrame(
        [
            {"doc_id": i + 1, "lang": lang, "text": " ".join(ws)}
            for i, (lang, ws) in enumerate(docs)
        ]
    )
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in _oracle_tables(
            "naive_bayes_lang_predict", {"documents": pdf}
        )
    }
    # independent replay of the smoothed multinomial NB
    langs = sorted({lang for lang, _ in docs})
    model: dict[tuple[str, str], int] = {}
    tot: dict[str, int] = {}
    dcount: dict[str, int] = {}
    for lang, ws in docs:
        dcount[lang] = dcount.get(lang, 0) + 1
        for w in ws:
            model[(lang, w)] = model.get((lang, w), 0) + 1
            tot[lang] = tot.get(lang, 0) + 1
    v = len({w for _, w in model})
    d = len(docs)
    for i, (true_lang, ws) in enumerate(docs):
        scores = {}
        for lang in langs:
            s = math.log(dcount[lang]) - math.log(d)
            for w in ws:
                s += math.log(model.get((lang, w), 0) + 1)
            s -= len(ws) * math.log(tot[lang] + v)
            scores[lang] = s
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0])
        )
        pred, top = ranked[0]
        second = ranked[1][1] if len(ranked) > 1 else None
        gl, gs, gm, gc = got[i + 1]
        assert abs(gs - top) < 5.01e-7, (i, gs, top)
        if second is not None:
            assert abs(gm - (top - second)) < 1.01e-6
            # prediction must match unless the top two are tied
            # within publication noise (then either is legitimate)
            if top - second > 2e-6:
                assert gl == pred
                assert gc == int(pred == true_lang)
        else:
            assert gl == pred


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.sampled_from(["w%d" % i for i in range(8)]),
        min_size=4,
        max_size=60,
    ).filter(lambda ws: len(set(ws)) >= 2)
)
def test_zipf_slope_matches_brute_force(words):
    pdf = pd.DataFrame([{"doc_id": 1, "text": " ".join(words)}])
    (row,) = _oracle_tables("zipf_slope_top_vocab", {"documents": pdf})
    freq: dict[str, int] = {}
    for w in words:
        freq[w] = freq.get(w, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    m = len(top)
    xs = [math.log(i + 1) for i in range(m)]
    ys = [math.log(n) for _, n in top]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    icpt = (sy - slope * sx) / m
    vary = m * syy - sy * sy
    r2 = (
        (m * sxy - sx * sy) ** 2 / ((m * sxx - sx * sx) * vary)
        if vary > 0
        else None
    )
    assert row[0] == m
    # engine publishes floor(x*1eK+0.5)/1eK; compare against the
    # UNROUNDED replay within half a tick + noise
    assert abs(row[1] - slope) < 5.1e-5
    assert abs(row[2] - icpt) < 5.1e-5
    if r2 is not None:
        assert abs(row[3] - r2) < 5.1e-7


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["AUTOMOBILE", "BUILDING"]),
            st.booleans(),  # treated
            st.integers(min_value=1, max_value=900_000),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_stratified_ate_matches_brute_force(rows):
    cust = pd.DataFrame(
        [
            {"c_custkey": i + 1, "c_mktsegment": seg}
            for i, (seg, _, _) in enumerate(rows)
        ]
    )
    orders = pd.DataFrame(
        [
            {
                "o_orderkey": i + 1,
                "o_custkey": i + 1,
                "o_orderpriority": "1-URGENT" if tr else "5-LOW",
                "o_totalprice": c / 100.0,
            }
            for i, (_, tr, c) in enumerate(rows)
        ]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables(
            "stratified_ate_by_segment",
            {"customer": cust, "orders": orders},
        )
    }
    agg: dict[str, list[int]] = {}
    for seg, tr, c in rows:
        n, t_, s1, s0 = agg.get(seg, [0, 0, 0, 0])
        agg[seg] = [n + 1, t_ + tr, s1 + c * tr, s0 + c * (not tr)]
    exp = {}
    for seg, (n, t_, s1, s0) in agg.items():
        if t_ == 0 or n - t_ == 0:
            continue
        m1 = s1 * 100 // t_
        m0 = s0 * 100 // (n - t_)
        exp[seg] = (n, t_, m1, m0, m1 - m0)
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(events_strategy)
def test_simpson_diversity_matches_brute_force(rows):
    pdf = _events_df(rows)
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("user_type_diversity_simpson",
                                {"events": pdf})
    }
    per: dict[int, dict[str, int]] = {}
    for u, ty, _, _ in rows:
        per.setdefault(u + 1, {})
        per[u + 1][ty] = per[u + 1].get(ty, 0) + 1
    exp = {}
    for u, dd in per.items():
        n = sum(dd.values())
        if n < 2:
            continue
        same = sum(k * (k - 1) for k in dd.values())
        exp[u] = (
            n,
            len(dd),
            (n * (n - 1) - same) * 1_000_000 // (n * (n - 1)),
        )
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(events_strategy)
def test_funnel_stage_matches_brute_force(rows):
    pdf = _events_df(rows)
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("stream_funnel_stage", {"events": pdf})
    }
    base = 1_704_067_200_000_000
    first: dict[int, dict[str, int]] = {}
    for u, ty, sec, _ in rows:
        us = base + sec * 1_000_000
        d = first.setdefault(u + 1, {})
        if ty not in d or us < d[ty]:
            d[ty] = us
    exp = {}
    for u, d in first.items():
        tv = d.get("view", -1)
        tc = d.get("click", -1)
        tp = d.get("purchase", -1)
        if tv == -1:
            s = 0
        elif tc == -1 or tc < tv:
            s = 1
        elif tp == -1 or tp < tc:
            s = 2
        else:
            s = 3
        exp[u] = (tv, tc, tp, s)
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # nation
            st.integers(min_value=0, max_value=3),  # supplier slot
            st.integers(min_value=1, max_value=900_000),  # cents
        ),
        min_size=1,
        max_size=30,
    )
)
def test_hhi_matches_brute_force(rows):
    sup = pd.DataFrame(
        [
            {"s_suppkey": n * 10 + s, "s_nationkey": n}
            for n in range(3)
            for s in range(4)
        ]
    )
    li = pd.DataFrame(
        [
            {"l_orderkey": i + 1, "l_suppkey": n * 10 + s,
             "l_extendedprice": c / 100.0}
            for i, (n, s, c) in enumerate(rows)
        ]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables(
            "hhi_supplier_concentration",
            {"supplier": sup, "lineitem": li},
        )
    }
    rev: dict[int, dict[int, int]] = {}
    for n, s, c in rows:
        rev.setdefault(n, {})
        rev[n][s] = rev[n].get(s, 0) + c
    exp = {}
    for n, d in rev.items():
        tot = sum(d.values())
        hhi = sum((v / tot) ** 2 for v in d.values())
        exp[n] = (len(d), tot, hhi)
    assert set(got) == set(exp)
    for n in exp:
        assert got[n][:2] == exp[n][:2]
        assert abs(got[n][2] - exp[n][2]) < 5.01e-7


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["view", "purchase", "click"]),
            st.integers(min_value=0, max_value=12),  # day
        ),
        min_size=2,
        max_size=40,
    )
)
def test_ccf_matches_brute_force(rows):
    base = 1_704_067_200_000_000
    pdf = pd.DataFrame(
        [
            {
                "event_id": i + 1,
                "ts": pd.Timestamp(
                    base + d * 86_400_000_000 + i * 1_000_000, unit="us"
                ),
                "user_id": 1,
                "event_type": ty,
            }
            for i, (ty, d) in enumerate(rows)
        ]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("ccf_view_purchase_daily",
                                {"events": pdf})
    }
    days = [d for _, d in rows]
    mn, mx = min(days), max(days)
    grid = list(range(mn, mx + 1))
    x = [sum(1 for ty, d in rows if ty == "view" and d == g)
         for g in grid]
    y = [sum(1 for ty, d in rows if ty == "purchase" and d == g)
         for g in grid]
    nd = len(grid)
    xm, ym = sum(x) // nd, sum(y) // nd
    dx = [v - xm for v in x]
    dy = [v - ym for v in y]
    denx = sum(v * v for v in dx)
    deny = sum(v * v for v in dy)
    for k in range(-3, 4):
        pairs = [
            (dx[t], dy[t + k])
            for t in range(nd)
            if 0 <= t + k < nd
        ]
        num = sum(a * b for a, b in pairs)
        gnp, gdx, gdy, gc = got[k]
        assert (gnp, gdx, gdy) == (len(pairs), denx, deny)
        if not pairs:
            # |lag| >= series length: SUM over zero rows is NULL in
            # both engines — the honest "no pairs" answer
            assert gc is None
        elif denx > 0 and deny > 0:
            assert abs(gc - num / (denx * deny) ** 0.5) < 5.1e-5


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # quantity
            st.integers(min_value=1, max_value=3_000_000),  # cents
        ),
        min_size=2,
        max_size=30,
    )
)
def test_kendall_tau_matches_brute_force(rows):
    li = pd.DataFrame(
        [
            {"l_orderkey": i + 1, "l_quantity": float(q),
             "l_extendedprice": c / 100.0}
            for i, (q, c) in enumerate(rows)
        ]
    )
    (row,) = _oracle_tables("kendall_tau_qty_price", {"lineitem": li})
    pts = [(q, c // 1_000_000) for q, c in rows]
    n = len(pts)
    cc = dd = 0
    for i in range(n):
        for j in range(i + 1, n):
            (q1, p1), (q2, p2) = pts[i], pts[j]
            if (q1 - q2) * (p1 - p2) > 0:
                cc += 1
            elif (q1 - q2) * (p1 - p2) < 0:
                dd += 1
    from collections import Counter

    tq = sum(v * (v - 1) // 2 for v in Counter(q for q, _ in pts).values())
    tp = sum(v * (v - 1) // 2 for v in Counter(p for _, p in pts).values())
    assert row[:5] == (n, cc, dd, tq, tp)
    n0 = n * (n - 1) // 2
    if n0 > tq and n0 > tp:
        tau = (cc - dd) / ((n0 - tq) * (n0 - tp)) ** 0.5
        assert abs(row[5] - tau) < 5.1e-7


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.integers(min_value=1, max_value=3_000_000),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_trimmed_mean_matches_brute_force(rows):
    li = pd.DataFrame(
        [
            {"l_orderkey": i + 1, "l_returnflag": fl,
             "l_extendedprice": c / 100.0}
            for i, (fl, c) in enumerate(rows)
        ]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("trimmed_mean_price", {"lineitem": li})
    }
    groups: dict[str, list[int]] = {}
    for fl, c in rows:
        groups.setdefault(fl, []).append(c)
    exp = {}
    for fl, vs in groups.items():
        vs.sort()
        n = len(vs)
        lo = n * 5 // 100
        kept = vs[lo: n - lo]
        if kept:
            exp[fl] = (n, lo, sum(kept) * 100 // len(kept))
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=5),  # hour slot
        ),
        min_size=1,
        max_size=40,
    )
)
def test_mutual_info_matches_brute_force(rows):
    base = 1_704_067_200_000_000
    pdf = pd.DataFrame(
        [
            {
                "event_id": i + 1,
                "ts": pd.Timestamp(base + h * 3_600_000_000, unit="us"),
                "user_id": 1,
                "event_type": ty,
            }
            for i, (ty, h) in enumerate(rows)
        ]
    )
    (row,) = _oracle_tables("mutual_info_type_hour", {"events": pdf})
    from collections import Counter

    cells = Counter(rows)
    rowm = Counter(ty for ty, _ in rows)
    colm = Counter(h for _, h in rows)
    n = len(rows)
    mi = sum(
        (c / n) * math.log(c * n / (rowm[ty] * colm[h]))
        for (ty, h), c in cells.items()
    )
    assert row[:2] == (n, len(cells))
    assert abs(row[2] - mi) < 5.01e-7


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.booleans(),  # treated segment
            st.booleans(),  # post period
            st.integers(min_value=1, max_value=900_000),  # cents
        ),
        min_size=4,
        max_size=40,
    ).filter(
        lambda rs: all(
            any(t == a and p == b for t, p, _ in rs)
            for a in (False, True)
            for b in (False, True)
        )
    )
)
def test_did_matches_brute_force(rows):
    cust = pd.DataFrame(
        [
            {
                "c_custkey": i + 1,
                "c_mktsegment": "BUILDING" if tr else "MACHINERY",
            }
            for i, (tr, _, _) in enumerate(rows)
        ]
    )
    orders = pd.DataFrame(
        [
            {
                "o_orderkey": i + 1,
                "o_custkey": i + 1,
                "o_orderdate": pd.Timestamp(
                    "1995-07-01" if post else "1995-01-01"
                ).date(),
                "o_totalprice": c / 100.0,
            }
            for i, (_, post, c) in enumerate(rows)
        ]
    )
    (row,) = _oracle_tables(
        "difference_in_differences",
        {"customer": cust, "orders": orders},
    )
    cellsum: dict[tuple[bool, bool], list[int]] = {}
    for tr, post, c in rows:
        s, n = cellsum.get((tr, post), (0, 0))
        cellsum[(tr, post)] = (s + c, n + 1)
    m = {
        k: s * 100 // n for k, (s, n) in cellsum.items()
    }
    t1, t0 = m[(True, True)], m[(True, False)]
    c1, c0 = m[(False, True)], m[(False, False)]
    assert row == (len(rows), t0, t1, c0, c1, (t1 - t0) - (c1 - c0))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # order
            st.integers(min_value=0, max_value=3),  # brand slot
        ),
        min_size=3,
        max_size=40,
    )
)
def test_assoc_rules_match_brute_force(pairs):
    li = pd.DataFrame(
        [
            {"l_orderkey": ok + 1, "l_partkey": br + 1,
             "l_linenumber": i}
            for i, (ok, br) in enumerate(pairs)
        ]
    )
    part = pd.DataFrame(
        [{"p_partkey": b + 1, "p_brand": f"B{b}"} for b in range(4)]
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in _oracle_tables(
            "assoc_rules_lift", {"lineitem": li, "part": part}
        )
    }
    baskets: dict[int, set] = {}
    for ok, br in pairs:
        baskets.setdefault(ok + 1, set()).add(f"B{b}" if False else f"B{br}")
    nn = len(baskets)
    sup: dict[str, int] = {}
    for items in baskets.values():
        for it in items:
            sup[it] = sup.get(it, 0) + 1
    from collections import Counter

    pc: Counter = Counter()
    for items in baskets.values():
        for a in items:
            for b in items:
                if a != b:
                    pc[(a, b)] += 1
    exp = {}
    for (a, b), nab in pc.items():
        if nab >= 3:
            exp[(a, b)] = (
                nab,
                sup[a],
                sup[b],
                nn,
                nab * 10000 // sup[a],
                (nab * nn) * 10000 // (sup[a] * sup[b]),
            )
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["AUTOMOBILE", "BUILDING", "MACHINERY"]),
            st.integers(min_value=1, max_value=400),  # cents spend
        ),
        min_size=1,
        max_size=30,
    )
)
def test_quantile_normalize_matches_brute_force(rows):
    cust = pd.DataFrame(
        [
            {"c_custkey": i + 1, "c_mktsegment": seg}
            for i, (seg, _) in enumerate(rows)
        ]
    )
    orders = pd.DataFrame(
        [
            {"o_orderkey": i + 1, "o_custkey": i + 1,
             "o_totalprice": c / 100.0}
            for i, (_, c) in enumerate(rows)
        ]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables(
            "quantile_normalize_spend",
            {"customer": cust, "orders": orders},
        )
    }
    pooled = sorted(
        (c, i + 1) for i, (_, c) in enumerate(rows)
    )  # (value, ck): pooled order with key tiebreak
    nn = len(rows)
    groups: dict[str, list[tuple[int, int]]] = {}
    for i, (seg, c) in enumerate(rows):
        groups.setdefault(seg, []).append((c, i + 1))
    exp = {}
    for seg, vs in groups.items():
        vs.sort()
        ng = len(vs)
        for r0, (c, ck) in enumerate(vs):
            r = r0 + 1
            tgt = (r * nn + ng - 1) // ng
            exp[ck] = (seg, c, r, ng, tgt, pooled[tgt - 1][0])
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),  # qty
            st.integers(min_value=100, max_value=120_000),  # dollars
        ),
        min_size=3,
        max_size=30,
    ).filter(
        lambda rs: len({q for q, _ in rs}) >= 2
        and len({y for _, y in rs}) >= 2
    )
)
def test_mahalanobis_matches_brute_force(rows):
    li = pd.DataFrame(
        [
            {"l_orderkey": i + 1, "l_linenumber": 1,
             "l_quantity": float(q), "l_extendedprice": float(y)}
            for i, (q, y) in enumerate(rows)
        ]
    )
    got = _oracle_tables(
        "mahalanobis_outliers_qty_price", {"lineitem": li}
    )
    n = len(rows)
    sx = sum(q for q, _ in rows)
    sy = sum(y for _, y in rows)
    mx, my = sx // n, sy // n
    sxx = sum((q - mx) ** 2 for q, _ in rows)
    sxy = sum((q - mx) * (y - my) for q, y in rows)
    syy = sum((y - my) ** 2 for _, y in rows)
    det = sxx * syy - sxy * sxy
    if det == 0:
        return  # degenerate: collinear sample, d2 undefined
    exp = sorted(
        (
            -(syy * (q - mx) ** 2 - 2 * sxy * (q - mx) * (y - my)
              + sxx * (y - my) ** 2) / det * (n - 1),
            i + 1,
        )
        for i, (q, y) in enumerate(rows)
    )[:50]
    assert [r[0] for r in got] == [k for _, k in exp]
    for r, (negd2, _) in zip(got, exp):
        assert abs(r[4] - (-negd2)) < 5.01e-7


@settings(max_examples=30, deadline=None)
@given(events_strategy)
def test_markov_next_accuracy_matches_brute_force(rows):
    pdf = _events_df(rows)
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("markov_next_event_accuracy",
                                {"events": pdf})
    }
    base = 1_704_067_200_000_000
    by_user: dict[int, list] = {}
    for i, (u, ty, sec, _) in enumerate(rows):
        by_user.setdefault(u, []).append(
            (base + sec * 1_000_000, i + 1, ty)
        )
    from collections import Counter

    tr: Counter = Counter()
    for evs in by_user.values():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            tr[(a[2], b[2])] += 1
    exp = {}
    curs = {c for c, _ in tr}
    for c in curs:
        succ = {d: n for (cc, d), n in tr.items() if cc == c}
        pred = min(succ, key=lambda d: (-succ[d], d))
        total = sum(succ.values())
        correct = succ[pred]
        exp[c] = (pred, total, correct, correct * 10_000 // total)
    assert got == exp


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=500),  # cents
            st.integers(min_value=0, max_value=60),  # day
        ),
        min_size=1,
        max_size=30,
    )
)
def test_skyline_matches_brute_force(rows):
    import datetime

    base = datetime.date(1992, 1, 1)
    orders = pd.DataFrame(
        [
            {"o_orderkey": i + 1, "o_totalprice": c / 100.0,
             "o_orderdate": base + datetime.timedelta(days=d)}
            for i, (c, d) in enumerate(rows)
        ]
    )
    got = sorted(
        r[0] for r in _oracle_tables("skyline_orders_pareto",
                                     {"orders": orders})
    )
    # brute-force dominance with the duplicate tiebreak: an exact
    # (price, day) twin with a SMALLER key dominates its sibling
    exp = []
    for i, (c, d) in enumerate(rows):
        dominated = any(
            (c2 > c and d2 <= d)
            or (c2 == c and d2 < d)
            or (c2 == c and d2 == d and j < i)
            for j, (c2, d2) in enumerate(rows)
            if j != i
        )
        if not dominated:
            exp.append(i + 1)
    assert got == sorted(exp)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.sampled_from(["alpha beta", "gamma delta", "alpha  beta ",
                         "  ALPHA BETA", "epsilon"]),
        min_size=1,
        max_size=25,
    )
)
def test_dup_cluster_histogram_matches_brute_force(texts):
    pdf = pd.DataFrame(
        [{"doc_id": i + 1, "text": t_} for i, t_ in enumerate(texts)]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("dup_cluster_size_histogram",
                                {"documents": pdf})
    }
    import re as _re
    from collections import Counter

    fp = Counter(
        _re.sub(" +", " ", t_).strip().lower() for t_ in texts
    )
    hist = Counter(fp.values())
    exp = {
        sz: (k, sz * k, (sz - 1) * k) for sz, k in hist.items()
    }
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),  # brand slot
            st.integers(min_value=1, max_value=900_000),  # cents
            st.integers(min_value=0, max_value=9),  # order slot
        ),
        min_size=2,
        max_size=30,
    )
)
def test_rbo_matches_brute_force(rows):
    li = pd.DataFrame(
        [
            {"l_orderkey": ok + 1, "l_partkey": b + 1,
             "l_extendedprice": c / 100.0, "l_linenumber": i}
            for i, (b, c, ok) in enumerate(rows)
        ]
    )
    part = pd.DataFrame(
        [{"p_partkey": b + 1, "p_brand": f"B{b}"} for b in range(8)]
    )
    (row,) = _oracle_tables(
        "rbo_brand_rankings", {"lineitem": li, "part": part}
    )
    rev: dict[str, int] = {}
    cnt: dict[str, set] = {}
    for b, c, ok in rows:
        it = f"B{b}"
        rev[it] = rev.get(it, 0) + c
        cnt.setdefault(it, set()).add(ok)
    ra = [
        it for it, _ in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:20]
    rb = [
        it
        for it, _ in sorted(
            cnt.items(), key=lambda kv: (-len(kv[1]), kv[0])
        )
    ][:20]
    rbo = 0.0
    for d in range(1, 21):
        o = len(set(ra[:d]) & set(rb[:d]))
        rbo += 0.1 * (0.9 ** (d - 1)) * o / d
    assert row[0] == 20
    assert row[1] == len(set(ra[:20]) & set(rb[:20]))
    assert abs(row[2] - rbo) < 5.01e-7


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # customer
            st.integers(min_value=0, max_value=4),  # part
        ),
        min_size=2,
        max_size=25,
    )
)
def test_assortativity_matches_brute_force(pairs):
    orders = pd.DataFrame(
        [
            {"o_orderkey": i + 1, "o_custkey": c + 1}
            for i, (c, _) in enumerate(pairs)
        ]
    )
    li = pd.DataFrame(
        [
            {"l_orderkey": i + 1, "l_partkey": p + 1}
            for i, (_, p) in enumerate(pairs)
        ]
    )
    got = _oracle_tables(
        "degree_assortativity_copurchase",
        {"orders": orders, "lineitem": li},
    )
    cp = {(c + 1, p + 1) for c, p in pairs}
    from collections import Counter

    nc = Counter(p for _, p in cp)
    edges = {
        (a, b)
        for a, pa in cp
        for b, pb in cp
        if pa == pb and a < b and nc[pa] <= 15
    }
    deg: Counter = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    pts = [(deg[u], deg[v]) for u, v in edges] + [
        (deg[v], deg[u]) for u, v in edges
    ]
    m = len(pts)
    if m == 0:
        assert got == []
        return
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    vx, vy = m * sxx - sx * sx, m * syy - sy * sy
    if vx <= 0 or vy <= 0:
        assert got == []
        return
    r = (m * sxy - sx * sy) / (vx * vy) ** 0.5
    (row,) = got
    assert row[0] == m
    assert abs(row[1] - r) < 5.1e-7


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_heaps_law_matches_brute_force(docs):
    pdf = pd.DataFrame(
        [
            {"doc_id": i + 1, "text": " ".join(ws)}
            for i, ws in enumerate(docs)
        ]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("heaps_law_vocab_growth",
                                {"documents": pdf})
    }
    nd = len(docs)
    exp = {}
    for dec in range(1, 11):
        k = dec * nd // 10
        if k == 0:
            exp[dec] = (None, 0, None)
            continue
        cutoff = k  # doc_ids are 1..nd in order
        seen = set()
        tot = 0
        for i, ws in enumerate(docs[:cutoff]):
            seen.update(ws)
            tot += len(ws)
        exp[dec] = (cutoff, len(seen), tot)
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # part slot
            st.integers(min_value=1, max_value=900_000),  # cents
        ),
        min_size=1,
        max_size=30,
    )
)
def test_abc_matches_brute_force(rows):
    li = pd.DataFrame(
        [
            {"l_orderkey": i + 1, "l_partkey": p + 1,
             "l_extendedprice": c / 100.0}
            for i, (p, c) in enumerate(rows)
        ]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("abc_inventory_classification",
                                {"lineitem": li})
    }
    rev: dict[int, int] = {}
    for p, c in rows:
        rev[p + 1] = rev.get(p + 1, 0) + c
    ordered = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    tc = sum(rev.values())
    cum = 0
    agg: dict[str, list[int]] = {}
    for pk, v in ordered:
        cum += v
        k = "A" if cum <= tc * 80 // 100 else (
            "B" if cum <= tc * 95 // 100 else "C"
        )
        n, s = agg.get(k, (0, 0))
        agg[k] = (n + 1, s + v)
    exp = {
        k: (n, s, s * 10_000 // tc) for k, (n, s) in agg.items()
    }
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.booleans(),  # urgent
            st.integers(min_value=0, max_value=40),  # day
        ),
        min_size=5,
        max_size=60,
    )
)
def test_sprt_matches_brute_force(rows):
    import datetime

    base = datetime.date(1992, 1, 1)
    orders = pd.DataFrame(
        [
            {
                "o_orderkey": i + 1,
                "o_orderpriority": "1-URGENT" if u else "3-MEDIUM",
                "o_orderdate": base + datetime.timedelta(days=d),
                "o_totalprice": 1.0,
            }
            for i, (u, d) in enumerate(rows)
        ]
    )
    got = _oracle_tables("sprt_first_crossing", {"orders": orders})
    daily: dict[int, list[int]] = {}
    for u, d in rows:
        n1, n = daily.get(d, (0, 0))
        daily[d] = (n1 + u, n + 1)
    l1 = math.log(0.22 / 0.18)
    l0 = math.log(0.78 / 0.82)
    c1 = cn = 0
    exp = None
    for d in sorted(daily):
        c1 += daily[d][0]
        cn += daily[d][1]
        s = c1 * l1 + (cn - c1) * l0
        if s >= 2.944:
            exp = (d, c1, cn, "accept_h1", s)
            break
        if s <= -2.944:
            exp = (d, c1, cn, "accept_h0", s)
            break
    if exp is None:
        assert got == []
        return
    (row,) = got
    assert row[:3] == exp[:3]
    assert row[4] == exp[3]
    assert abs(row[3] - exp[4]) < 5.01e-7


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=1,
                     max_size=5),
        ),
        min_size=3,
        max_size=12,
    ).filter(lambda ds: len({s for s, _ in ds}) >= 2)
)
def test_burrows_delta_matches_brute_force(docs):
    pdf = pd.DataFrame(
        [
            {"doc_id": i + 1, "source": s, "text": " ".join(ws)}
            for i, (s, ws) in enumerate(docs)
        ]
    )
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in _oracle_tables("burrows_delta_sources",
                                {"documents": pdf})
    }
    from collections import Counter

    wc: Counter = Counter()
    stot: Counter = Counter()
    for s, ws in docs:
        for w in ws:
            wc[(s, w)] += 1
            stot[s] += 1
    gn: Counter = Counter()
    for (s, w), n in wc.items():
        gn[w] += n
    top = [w for w, _ in sorted(gn.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:50]]
    sources = sorted(stot)
    z: dict[tuple, float] = {}
    for w in top:
        fs = {s: wc.get((s, w), 0) * 1000.0 / stot[s] for s in sources}
        mu = sum(fs.values()) / len(sources)
        sd = (sum((f - mu) ** 2 for f in fs.values())
              / len(sources)) ** 0.5
        if sd > 0:
            for s in sources:
                z[(w, s)] = (fs[s] - mu) / sd
    exp = {}
    words_with_z = {w for w, _ in z}
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            dzs = [abs(z[(w, a)] - z[(w, b)]) for w in words_with_z]
            if dzs:
                exp[(a, b)] = (len(dzs), sum(dzs) / len(dzs))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) < 5.01e-7


@settings(max_examples=30, deadline=None)
@given(
    st.tuples(
        st.lists(st.integers(min_value=1, max_value=900_000),
                 min_size=2, max_size=30),
        st.lists(st.integers(min_value=1, max_value=900_000),
                 min_size=2, max_size=30),
    )
)
def test_cohens_d_matches_brute_force(samples):
    g0, g1 = samples
    (row,) = _oracle_tables(
        "cohens_d_effect_size", {"orders": _two_sample_orders(samples)}
    )
    # $100-unit quantization: both engines round() half-AWAY-from-zero
    # (exact .5 ties only occur at odd multiples of 5000 cents, which
    # ARE dyadic-exact doubles) — replicate with integer arithmetic
    def q(c):
        whole, rem = divmod(c, 10_000)
        return whole + 1 if rem >= 5_000 else whole

    y0 = [q(c) for c in g0]
    y1 = [q(c) for c in g1]
    n0, n1 = len(y0), len(y1)
    m0, m1 = sum(y0) / n0, sum(y1) / n1
    ss0 = sum(v * v for v in y0) - sum(y0) ** 2 / n0
    ss1 = sum(v * v for v in y1) - sum(y1) ** 2 / n1
    sd = ((ss0 + ss1) / (n0 + n1 - 2)) ** 0.5
    if sd == 0:
        return
    d = (m1 - m0) / sd
    assert row[:2] == (n0, n1)
    assert abs(row[2] - d) < 5.1e-7


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "fff"]),
        min_size=1,
        max_size=40,
    )
)
def test_chao1_matches_brute_force(words):
    pdf = pd.DataFrame([{"doc_id": 1, "text": " ".join(words)}])
    (row,) = _oracle_tables("chao1_vocab_estimate", {"documents": pdf})
    from collections import Counter

    c = Counter(words)
    d = len(c)
    ntok = len(words)
    f1 = sum(1 for v in c.values() if v == 1)
    f2 = sum(1 for v in c.values() if v == 2)
    chao1 = d + (f1 * f1 // (2 * f2) if f2 > 0 else f1 * (f1 - 1) // 2)
    assert row == (d, ntok, f1, f2, chao1, f1 * 1_000_000 // ntok)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.lists(st.sampled_from(["a", "bb", "ccc"]), min_size=1,
                     max_size=6),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_token_length_hist_matches_brute_force(docs):
    pdf = pd.DataFrame(
        [
            {"doc_id": i + 1, "lang": lang, "text": " ".join(ws)}
            for i, (lang, ws) in enumerate(docs)
        ]
    )
    got = {
        (r[0], r[1]): r[2]
        for r in _oracle_tables("token_length_histogram",
                                {"documents": pdf})
    }
    from collections import Counter

    exp = Counter(
        (lang, len(w)) for lang, ws in docs for w in ws
    )
    assert got == dict(exp)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # day
            st.integers(min_value=1, max_value=900_000),  # cents
        ),
        min_size=4,
        max_size=40,
    )
)
def test_runs_test_matches_brute_force(rows):
    import datetime

    base = datetime.date(1992, 1, 1)
    orders = pd.DataFrame(
        [
            {"o_orderkey": i + 1,
             "o_orderdate": base + datetime.timedelta(days=d),
             "o_totalprice": c / 100.0}
            for i, (d, c) in enumerate(rows)
        ]
    )
    got = _oracle_tables("runs_test_daily_revenue", {"orders": orders})
    daily: dict[int, int] = {}
    for d, c in rows:
        daily[d] = daily.get(d, 0) + c
    days = sorted(daily)
    signs = []
    for a, b in zip(days, days[1:]):
        dx = daily[b] - daily[a]
        if dx != 0:
            signs.append(1 if dx > 0 else -1)
    n_up = signs.count(1)
    n_down = signs.count(-1)
    if (n_up == 0 or n_down == 0
            or 2 * n_up * n_down <= n_up + n_down):
        assert got == []
        return
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n = n_up + n_down
    mu = 1.0 + 2.0 * n_up * n_down / n
    var = (2.0 * n_up * n_down * (2.0 * n_up * n_down - n)
           / (n * n * (n - 1.0)))
    (row,) = got
    assert row[:3] == (runs, n_up, n_down)
    assert abs(row[3] - (runs - mu) / var ** 0.5) < 5.1e-7


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=900_000),
        min_size=1,
        max_size=30,
    )
)
def test_lorenz_matches_brute_force(spends):
    orders = pd.DataFrame(
        [
            {"o_orderkey": i + 1, "o_custkey": i + 1,
             "o_totalprice": c / 100.0}
            for i, c in enumerate(spends)
        ]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("lorenz_curve_deciles",
                                {"orders": orders})
    }
    ordered = sorted(spends)
    n = len(ordered)
    tv = sum(ordered)
    agg: dict[int, list[int]] = {}
    for r0, v in enumerate(ordered):
        dec = ((r0 + 1) * 10 - 1) // n + 1
        cnt, s = agg.get(dec, (0, 0))
        agg[dec] = (cnt + 1, s + v)
    exp = {}
    cum = 0
    for dec in sorted(agg):
        cnt, s = agg[dec]
        cum += s
        exp[dec] = (cnt, s, cum * 10_000 // tv)
    assert got == exp


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # priority index
            st.integers(min_value=1, max_value=400),  # cents
        ),
        min_size=5,
        max_size=40,
    ).filter(lambda rs: len({g for g, _ in rs}) == 5)
)
def test_ks_pairwise_matches_brute_force(rows):
    groups = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
    orders = pd.DataFrame(
        [
            {"o_orderkey": i + 1, "o_orderpriority": groups[g],
             "o_totalprice": c / 100.0}
            for i, (g, c) in enumerate(rows)
        ]
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in _oracle_tables("ks_pairwise_priorities",
                                {"orders": orders})
    }
    samples = {g: [c for gi, c in rows if gi == g] for g in range(5)}
    vals = sorted({c for _, c in rows})
    for a in range(5):
        for b in range(a + 1, 5):
            na, nb = len(samples[a]), len(samples[b])
            dn = max(
                abs(
                    sum(1 for x in samples[a] if x <= v) * nb
                    - sum(1 for x in samples[b] if x <= v) * na
                )
                for v in vals
            )
            r = got[(groups[a], groups[b])]
            assert r[:4] == (na, nb, dn, na * nb)
            assert abs(r[4] - dn / (na * nb)) < 5.01e-7


@settings(max_examples=30, deadline=None)
@given(events_strategy)
def test_interarrival_cv_matches_brute_force(rows):
    pdf = _events_df(rows)
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("user_interarrival_cv",
                                {"events": pdf})
    }
    per: dict[int, list[int]] = {}
    for u, _, sec, _ in rows:
        per.setdefault(u + 1, []).append(sec)
    exp = {}
    for u, secs in per.items():
        secs.sort()
        gaps = [b - a for a, b in zip(secs, secs[1:])]
        n = len(gaps)
        sg = sum(gaps)
        if n < 2 or sg <= 0:
            continue
        sgg = sum(x * x for x in gaps)
        cv = (max(n * sgg - sg * sg, 0)) ** 0.5 / sg
        exp[u] = (n, sg, cv)
    assert set(got) == set(exp)
    for u in exp:
        assert got[u][:2] == exp[u][:2]
        assert abs(got[u][2] - exp[u][2]) < 5.1e-5


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de"]),
            st.lists(st.sampled_from(_nb_words), min_size=1,
                     max_size=6),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_naive_bayes_eval_matches_predictions(docs):
    """The eval table must be EXACTLY the confusion-matrix arithmetic
    of the predict query's own output — run both oracles on the same
    corpus and recompute P/R/F1 from the predictions."""
    pdf = pd.DataFrame(
        [
            {"doc_id": i + 1, "lang": lang, "text": " ".join(ws)}
            for i, (lang, ws) in enumerate(docs)
        ]
    )
    preds = {
        r[0]: r[1]
        for r in _oracle_tables(
            "naive_bayes_lang_predict", {"documents": pdf}
        )
    }
    got = {
        r[0]: r[1:]
        for r in _oracle_tables(
            "naive_bayes_lang_eval", {"documents": pdf}
        )
    }
    true = {i + 1: lang for i, (lang, _) in enumerate(docs)}
    langs = set(true.values()) | set(preds.values())
    exp = {}
    for l_ in langs:
        tp = sum(
            1 for d in preds if preds[d] == l_ and true[d] == l_
        )
        fp = sum(
            1 for d in preds if preds[d] == l_ and true[d] != l_
        )
        fn = sum(
            1 for d in preds if true[d] == l_ and preds[d] != l_
        )
        exp[l_] = (
            tp,
            fp,
            fn,
            tp * 10_000 // (tp + fp) if tp + fp else 0,
            tp * 10_000 // (tp + fn) if tp + fn else 0,
            2 * tp * 10_000 // (2 * tp + fp + fn)
            if 2 * tp + fp + fn
            else 0,
        )
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=27),  # day offset
        min_size=1,
        max_size=40,
    )
)
def test_weekday_chi2_matches_brute_force(days):
    import datetime

    base = datetime.date(1992, 1, 1)
    orders = pd.DataFrame(
        [
            {"o_orderkey": i + 1,
             "o_orderdate": base + datetime.timedelta(days=d),
             "o_totalprice": 1.0}
            for i, d in enumerate(days)
        ]
    )
    (row,) = _oracle_tables("weekday_uniformity_chi2",
                            {"orders": orders})
    from collections import Counter

    # chi2 is invariant to which label each weekday bin gets, so the
    # replay only needs the bin STRUCTURE; the published statistic
    # sums over OBSERVED bins (each zero bin would add exactly n/7 —
    # observed_days lets the reader apply that correction, and at any
    # real scale all 7 bins are populated)
    c = Counter(
        (base + datetime.timedelta(days=d)).isoweekday()
        for d in days
    )
    n = len(days)
    chi2_obs = sum((7 * o - n) ** 2 for o in c.values()) / (7 * n)
    assert row[:3] == (7, n, len(c))
    assert abs(row[3] - chi2_obs) < 5.1e-5


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.sampled_from(["en", "de", "fr"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_source_lang_purity_matches_brute_force(rows):
    pdf = pd.DataFrame(
        [
            {"doc_id": i + 1, "source": s, "lang": l_, "text": "x"}
            for i, (s, l_) in enumerate(rows)
        ]
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in _oracle_tables("source_lang_purity",
                                {"documents": pdf})
    }
    from collections import Counter

    c = Counter(rows)
    ns = Counter(s for s, _ in rows)
    nmax = {}
    for (s, _), n in c.items():
        nmax[s] = max(nmax.get(s, 0), n)
    exp = {
        (s, l_): (n, n * 10_000 // ns[s], int(n == nmax[s]))
        for (s, l_), n in c.items()
    }
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["view", "click"]),
            st.integers(min_value=0, max_value=40),  # hour
        ),
        min_size=1,
        max_size=40,
    )
)
def test_peak_to_mean_matches_brute_force(rows):
    base = 1_704_067_200_000_000
    pdf = pd.DataFrame(
        [
            {
                "event_id": i + 1,
                "ts": pd.Timestamp(base + h * 3_600_000_000,
                                   unit="us"),
                "user_id": 1,
                "event_type": ty,
            }
            for i, (ty, h) in enumerate(rows)
        ]
    )
    got = {
        r[0]: r[1:]
        for r in _oracle_tables("hourly_peak_to_mean",
                                {"events": pdf})
    }
    from collections import Counter

    c = Counter(rows)
    exp = {}
    for ty in {t_ for t_, _ in rows}:
        hours = {h: n for (t_, h), n in c.items() if t_ == ty}
        nh = len(hours)
        tot = sum(hours.values())
        pk = max(hours.values())
        exp[ty] = (nh, tot, pk, pk * nh * 10_000 // tot)
    assert got == exp


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # brand slot
            st.integers(min_value=100, max_value=200_000),  # cents
        ),
        min_size=4,
        max_size=40,
    ).filter(lambda rs: len({b for b, _ in rs}) >= 2)
)
def test_anova_matches_brute_force(rows):
    part = pd.DataFrame(
        [
            {"p_partkey": i + 1, "p_brand": f"B{b}",
             "p_retailprice": c / 100.0}
            for i, (b, c) in enumerate(rows)
        ]
    )
    got = _oracle_tables("anova_retailprice_by_brand", {"part": part})
    groups: dict[int, list[int]] = {}
    for b, c in rows:
        groups.setdefault(b, []).append(c)
    k = len(groups)
    nn = len(rows)
    tsy = sum(c for _, c in rows)
    tsyy = sum(c * c for _, c in rows)
    gss = sum(sum(v) ** 2 / len(v) for v in groups.values())
    ssb = gss - tsy * tsy / nn
    ssw = tsyy - gss
    if nn <= k or ssw <= 0:
        assert got == []
        return
    f_ = (ssb / (k - 1)) / (ssw / (nn - k))
    (row,) = got
    assert row[:2] == (k, nn)
    assert abs(row[2] - f_) < max(5.1e-5, abs(f_) * 1e-9)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["view", "purchase"]),
            st.integers(min_value=0, max_value=25),  # day
        ),
        min_size=2,
        max_size=50,
    )
)
def test_rolling_corr_matches_brute_force(rows):
    base = 1_704_067_200_000_000
    pdf = pd.DataFrame(
        [
            {
                "event_id": i + 1,
                "ts": pd.Timestamp(base + d * 86_400_000_000,
                                   unit="us"),
                "user_id": 1,
                "event_type": ty,
            }
            for i, (ty, d) in enumerate(rows)
        ]
    )
    got = {
        r[0]: r[1]
        for r in _oracle_tables("rolling_corr_view_purchase",
                                {"events": pdf})
    }
    days = [d for _, d in rows]
    mn, mx = min(days), max(days)
    grid = list(range(mn, mx + 1))
    x = [sum(1 for ty, d in rows if ty == "view" and d == g)
         for g in grid]
    y = [sum(1 for ty, d in rows if ty == "purchase" and d == g)
         for g in grid]
    exp = {}
    for i in range(13, len(grid)):
        xs, ys = x[i - 13: i + 1], y[i - 13: i + 1]
        n = 14
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx > 0 and vy > 0:
            # published day is the ABSOLUTE epoch day
            epoch0 = base // 86_400_000_000
            exp[epoch0 + grid[i]] = (
                (n * sxy - sx * sy) / (vx * vy) ** 0.5
            )
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 5.1e-7
