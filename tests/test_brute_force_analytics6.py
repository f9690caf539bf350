"""Hypothesis brute-force parity for the round-6 analytics battery
#10 (plans/analytics6.py): the REGISTERED DuckDB oracle runs on tiny
random tables and is compared against an independent naive-Python
implementation of each operator's mathematical definition.  The
Spark==oracle leg is covered by tools/check_oracle.py at sf0.01 and
the replicas.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from distributedmapreduce_spark.plans.analytics6 import (
    _BOOT_CDF,
    _BOOT_R,
    _PERM_P,
    _TC_BUCKETS,
    _TC_T_E6,
)
from distributedmapreduce_spark.plans.core import registry


def _oracle(name: str, tables: dict):
    sql = registry()[name].oracle
    assert sql, name
    con = duckdb.connect()
    for tname, pdf in tables.items():
        con.register(tname, pdf)
    return con.execute(sql).fetchall()


def _md5_u32(tag: str, v: int) -> int:
    return int(
        hashlib.md5(f"{tag}:{v}".encode()).hexdigest()[:8], 16
    )


# --- Spearman ---------------------------------------------------------

sp_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # brand bucket
        st.integers(min_value=1, max_value=8),  # quantity
        st.integers(min_value=100, max_value=5000),  # price cents
    ),
    min_size=2,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(sp_strategy)
def test_spearman_matches_brute_force(rows):
    li = pd.DataFrame(
        {
            "l_partkey": list(range(len(rows))),
            "l_quantity": [q for _, q, _ in rows],
            "l_extendedprice": [pc / 100.0 for _, _, pc in rows],
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": list(range(len(rows))),
            "p_brand": [f"Brand#{b}" for b, _, _ in rows],
        }
    )
    got = sorted(
        _oracle("spearman_rho_qty_price", {"lineitem": li, "part": part})
    )

    def r2map(vals):
        cnt = Counter(vals)
        below, out = 0, {}
        for v in sorted(cnt):
            out[v] = 2 * below + cnt[v] + 1
            below += cnt[v]
        return out

    exp = []
    by_brand = defaultdict(list)
    for b, q, pc in rows:
        by_brand[f"Brand#{b}"].append((q, pc))
    for brand, pts in by_brand.items():
        rx = r2map([q for q, _ in pts])
        ry = r2map([pc for _, pc in pts])
        n = len(pts)
        sx = sum(rx[q] for q, _ in pts)
        sy = sum(ry[pc] for _, pc in pts)
        sxx = sum(rx[q] ** 2 for q, _ in pts)
        syy = sum(ry[pc] ** 2 for _, pc in pts)
        sxy = sum(rx[q] * ry[pc] for q, pc in pts)
        den = math.sqrt(float(n) * sxx - float(sx) * sx) * math.sqrt(
            float(n) * syy - float(sy) * sy
        )
        rho = (
            0
            if den == 0
            else math.floor(
                (float(n) * sxy - float(sx) * sy) / den * 1_000_000
            )
        )
        exp.append((brand, n, rho))
    assert got == sorted(exp)


# --- t-closeness ------------------------------------------------------

tc_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # nation
        st.sampled_from(["SEG_A", "SEG_B"]),  # segment
        st.integers(min_value=-99999, max_value=999999),  # acctbal cents
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(tc_strategy)
def test_t_closeness_matches_brute_force(rows):
    cust = pd.DataFrame(
        {
            "c_nationkey": [n for n, _, _ in rows],
            "c_mktsegment": [s for _, s, _ in rows],
            "c_acctbal": [c / 100.0 for _, _, c in rows],
        }
    )
    got = sorted(_oracle("t_closeness_audit", {"customer": cust}))
    buckets = [(n, s, (c + 100000) // 100000) for n, s, c in rows]
    total = len(buckets)
    gcnt = Counter(b for _, _, b in buckets)
    exp = []
    for cl in sorted({(n, s) for n, s, _ in buckets}):
        cc = Counter(b for n, s, b in buckets if (n, s) == cl)
        ncl = sum(cc.values())
        cum_c = cum_g = 0
        acc = 0
        for b in range(_TC_BUCKETS - 1):
            cum_c += cc.get(b, 0)
            cum_g += gcnt.get(b, 0)
            acc += abs(
                cum_c * 1_000_000 // ncl - cum_g * 1_000_000 // total
            )
        emd = acc // (_TC_BUCKETS - 1)
        exp.append((cl[0], cl[1], ncl, emd, 1 if emd > _TC_T_E6 else 0))
    assert got == sorted(exp)


# --- local clustering coefficient ------------------------------------

g_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),  # customer
        st.integers(min_value=0, max_value=5),  # part
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=40, deadline=None)
@given(g_strategy)
def test_lcc_matches_brute_force(pairs):
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(len(pairs))),
            "o_custkey": [c for c, _ in pairs],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": list(range(len(pairs))),
            "l_partkey": [p for _, p in pairs],
        }
    )
    got = sorted(
        _oracle("local_clustering_coeff", {"orders": orders, "lineitem": li})
    )
    cp = {(c, p) for c, p in pairs}
    buyers = defaultdict(set)
    for c, p in cp:
        buyers[p].add(c)
    edges = set()
    for p, cs in buyers.items():
        if len(cs) <= 15:
            for a in cs:
                for b in cs:
                    if a < b:
                        edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    exp = []
    for v, nb in adj.items():
        deg = len(nb)
        if deg < 2:
            continue
        tri = sum(
            1
            for a in nb
            for b in nb
            if a < b and (min(a, b), max(a, b)) in edges
        )
        exp.append((v, deg, tri, 2 * tri * 1_000_000 // (deg * (deg - 1))))
    assert got == sorted(exp)


# --- SAX weekly symbolization -----------------------------------------

sax_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),  # epoch day
        st.integers(min_value=100, max_value=900000),  # cents
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(sax_strategy)
def test_sax_matches_brute_force(rows):
    orders = pd.DataFrame(
        {
            "o_orderdate": [
                pd.Timestamp("1970-01-01") + pd.Timedelta(days=d)
                for d, _ in rows
            ],
            "o_totalprice": [c / 100.0 for _, c in rows],
        }
    )
    got = sorted(_oracle("sax_weekly_revenue", {"orders": orders}))
    day_c = defaultdict(int)
    for d, c in rows:
        day_c[d] += c
    wk = defaultdict(lambda: [0, 0])  # wk -> [n_days, sum]
    for d, c in day_c.items():
        wk[d // 7][0] += 1
        wk[d // 7][1] += c
    paa = {k: (nd, s // nd) for k, (nd, s) in wk.items()}
    ordered = sorted(paa.items(), key=lambda kv: (kv[1][1], kv[0]))
    n = len(ordered)
    qs = [
        ordered[(k * n + 3) // 4 - 1][1][1] if (k * n + 3) // 4 >= 1 else None
        for k in (1, 2, 3)
    ]
    exp = []
    for k, (nd, p) in paa.items():
        sym = 3 if p > qs[2] else 2 if p > qs[1] else 1 if p > qs[0] else 0
        exp.append((k, nd, p, sym))
    assert got == sorted(exp)


# --- Poisson bootstrap -------------------------------------------------

boot_strategy = st.lists(
    st.integers(min_value=100, max_value=900000),  # cents
    min_size=1,
    max_size=30,
)


@settings(max_examples=30, deadline=None)
@given(boot_strategy)
def test_bootstrap_matches_brute_force(cents):
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(1, len(cents) + 1)),
            "o_totalprice": [c / 100.0 for c in cents],
        }
    )
    got = _oracle("bootstrap_revenue_ci", {"orders": orders})
    boots = []
    for rep in range(_BOOT_R):
        tot = 0
        for ok, c in zip(range(1, len(cents) + 1), cents):
            u = _md5_u32("boot", ok * _BOOT_R + rep)
            w = 6
            for k, thr in enumerate(_BOOT_CDF):
                if u < thr:
                    w = k
                    break
            tot += w * c
        boots.append(tot)
    boots.sort()
    exp = (
        len(cents),
        sum(cents),
        boots[0],
        boots[_BOOT_R // 2 - 1],
        boots[-1],
    )
    assert got == [exp]


# --- permutation test --------------------------------------------------

perm_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=9),  # user
        st.integers(min_value=100, max_value=50000),  # cents
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=30, deadline=None)
@given(perm_strategy)
def test_permutation_matches_brute_force(rows):
    ev = pd.DataFrame(
        {
            "event_id": list(range(len(rows))),
            "ts": [pd.Timestamp("2024-01-01")] * len(rows),
            "user_id": [u for u, _ in rows],
            "event_type": ["purchase"] * len(rows),
            "value": [c / 100.0 for _, c in rows],
            "props": ["{}"] * len(rows),
        }
    )
    got = _oracle("permutation_test_spend", {"events": ev})
    y = defaultdict(int)
    for u, c in rows:
        y[u] += c

    def stat(labels):
        s1 = sum(v for u, v in y.items() if labels[u] == 1)
        n1 = sum(1 for u in y if labels[u] == 1)
        s0 = sum(v for u, v in y.items() if labels[u] == 0)
        n0 = len(y) - n1
        if n1 == 0 or n0 == 0:
            return 0
        return abs(s1 * 10000 // n1 - s0 * 10000 // n0)

    obs = stat({u: u % 2 for u in y})
    n_ge = 0
    for p in range(1, _PERM_P + 1):
        labels = {
            u: _md5_u32("perm", u * (_PERM_P + 1) + p) % 2 for u in y
        }
        if stat(labels) >= obs:
            n_ge += 1
    exp = (
        len(y),
        obs,
        n_ge,
        (1 + n_ge) * 1_000_000 // (_PERM_P + 1),
    )
    assert got == [exp]


# --- walk-count centrality ---------------------------------------------


@settings(max_examples=40, deadline=None)
@given(g_strategy)
def test_walk_counts_match_brute_force(pairs):
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(len(pairs))),
            "o_custkey": [c for c, _ in pairs],
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": list(range(len(pairs))),
            "l_partkey": [p for _, p in pairs],
        }
    )
    got = sorted(
        _oracle("walk_count_centrality", {"orders": orders, "lineitem": li})
    )
    cp = {(c, p) for c, p in pairs}
    buyers = defaultdict(set)
    for c, p in cp:
        buyers[p].add(c)
    adj = defaultdict(set)
    for p, cs in buyers.items():
        if len(cs) <= 15:
            for a in cs:
                for b in cs:
                    if a < b:
                        adj[a].add(b)
                        adj[b].add(a)
    w = {v: len(nb) for v, nb in adj.items()}
    w2 = {v: sum(w[u] for u in nb) for v, nb in adj.items()}
    w3 = {v: sum(w2[u] for u in nb) for v, nb in adj.items()}
    exp = sorted((v, w[v], w2[v], w3[v]) for v in adj)
    assert got == exp


# --- Hilbert clustering key --------------------------------------------

from datetime import date, timedelta  # noqa: E402

from distributedmapreduce_spark.plans.analytics import _H_BITS  # noqa: E402


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x // s) % 2 == 1 else 0
        ry = 1 if (y // s) % 2 == 1 else 0
        d += s * s * (ry if rx == 0 else 3 - ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_bijective_and_adjacent():
    """The Python replay of the registered algorithm is a TRUE
    Hilbert curve on the full grid: bijective onto [0, n²) and every
    consecutive pair of indices maps to grid-adjacent cells."""
    n = 1 << _H_BITS
    # exhaustive check on the full 256x256 grid (_H_BITS=8): all 65k
    # cells checked bijective AND every consecutive pair adjacent
    cells = {(x, y): _xy2d(n, x, y) for x in range(n) for y in range(n)}
    assert sorted(cells.values()) == list(range(n * n))
    inv = {d: xy for xy, d in cells.items()}
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(n * n - 1)
    )


hil_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**9),  # custkey
        st.integers(min_value=0, max_value=20000),  # epoch day
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(hil_strategy)
def test_hilbert_matches_brute_force(rows):
    n = 1 << _H_BITS
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(len(rows))),
            "o_custkey": [c for c, _ in rows],
            "o_orderdate": [
                date(1970, 1, 1) + timedelta(days=d) for _, d in rows
            ],
        }
    )
    got = sorted(_oracle("hilbert_cluster_orders", {"orders": orders}))
    exp = sorted(
        (i, _xy2d(n, c % n, d % n)) for i, (c, d) in enumerate(rows)
    )
    assert got == exp


# --- RAKE keyword scores -----------------------------------------------

from distributedmapreduce_spark.plans.textq import (  # noqa: E402
    _RAKE_TOPK,
    _STOPWORDS,
)

_RAKE_VOCAB = list(_STOPWORDS[:4]) + ["scan", "join", "agg", "sort", "row"]

rake_strategy = st.lists(
    st.lists(st.sampled_from(_RAKE_VOCAB), min_size=1, max_size=15),
    min_size=1,
    max_size=8,
)


@settings(max_examples=40, deadline=None)
@given(rake_strategy)
def test_rake_matches_brute_force(docs):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(len(docs))),
            "text": [" ".join(ws) for ws in docs],
        }
    )
    got = _oracle("rake_keyword_scores", {"documents": pdf})
    freq = Counter()
    deg = Counter()
    for ws in docs:
        phrase: list[str] = []
        for w in ws + [None]:
            if w is None or w in _STOPWORDS:
                for pw in phrase:
                    freq[pw] += 1
                    deg[pw] += len(phrase)
                phrase = []
            else:
                phrase.append(w)
    scored = sorted(
        (w, freq[w], deg[w], deg[w] * 10000 // freq[w]) for w in freq
    )
    exp = sorted(scored, key=lambda r: (-r[3], r[0]))[:_RAKE_TOPK]
    assert sorted(got) == sorted(exp)


# --- group-median imputation -------------------------------------------

from distributedmapreduce_spark.plans.analytics6 import (  # noqa: E402
    _CR_W,
    _IMP_MISS_MOD,
)

imp_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # flag bucket
        st.integers(min_value=100, max_value=90000),  # cents
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(imp_strategy)
def test_impute_matches_brute_force(rows):
    li = pd.DataFrame(
        {
            "l_orderkey": list(range(len(rows))),
            "l_linenumber": [1] * len(rows),
            "l_returnflag": ["AR"[f] for f, _ in rows],
            "l_extendedprice": [c / 100.0 for _, c in rows],
        }
    )
    got = sorted(_oracle("impute_group_median", {"lineitem": li}))
    exp = []
    for fl in sorted({"AR"[f] for f, _ in rows}):
        vals = []
        for i, (f, c) in enumerate(rows):
            if "AR"[f] != fl:
                continue
            miss = _md5_u32("na", i * 8 + 1) % _IMP_MISS_MOD == 0
            vals.append((c, miss))
        present = sorted(c for c, m in vals if not m)
        if not present:
            continue  # group drops out (no median joins back)
        # lower median: smallest value with 2*cum >= total
        tw, cum, med = len(present), 0, None
        for v in present:
            cum += 1
            if 2 * cum >= tw:
                med = v
                break
        n_imp = sum(1 for _, m in vals if m)
        total = sum(med if m else c for c, m in vals)
        exp.append((fl, len(present), n_imp, med, total))
    assert got == sorted(exp)


# --- Mann-Kendall -------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(sax_strategy)
def test_mann_kendall_matches_brute_force(rows):
    orders = pd.DataFrame(
        {
            "o_orderdate": [
                date(1970, 1, 1) + timedelta(days=d) for d, _ in rows
            ],
            "o_totalprice": [c / 100.0 for _, c in rows],
        }
    )
    got = _oracle("mann_kendall_trend", {"orders": orders})
    day_c = defaultdict(int)
    for d, c in rows:
        day_c[d] += c
    xs = [x for _, x in sorted(day_c.items())]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_term = sum(
        t * (t - 1) * (2 * t + 5)
        for t in Counter(xs).values()
        if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    if var18 == 0:
        z = 0
    else:
        corr = 1 if s > 0 else -1 if s < 0 else 0
        z = math.floor(
            (float(s) - corr) / math.sqrt(var18 / 18.0) * 1_000_000
        )
    assert got == [(n, s, var18, z)]


# --- weighted percentiles ----------------------------------------------

wp_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # flag bucket
        st.integers(min_value=100, max_value=90000),  # cents
        st.integers(min_value=1, max_value=9),  # quantity weight
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(wp_strategy)
def test_weighted_percentiles_match_brute_force(rows):
    li = pd.DataFrame(
        {
            "l_orderkey": list(range(len(rows))),
            "l_linenumber": [1] * len(rows),
            "l_returnflag": ["AR"[f] for f, _, _ in rows],
            "l_extendedprice": [c / 100.0 for _, c, _ in rows],
            "l_quantity": [q for _, _, q in rows],
        }
    )
    got = sorted(
        _oracle("weighted_percentiles_price", {"lineitem": li})
    )
    exp = []
    for fl in sorted({"AR"[f] for f, _, _ in rows}):
        pts = sorted(
            (c, q) for f, c, q in rows if "AR"[f] == fl
        )
        tw = sum(q for _, q in pts)
        qs = {}
        for k in (1, 2, 3):
            cum = 0
            for c, q in pts:
                cum += q
                if 4 * cum >= k * tw:
                    qs[k] = c
                    break
        exp.append((fl, tw, qs[1], qs[2], qs[3]))
    assert got == sorted(exp)


# --- Croston ------------------------------------------------------------

cr_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # part bucket
        st.integers(min_value=0, max_value=60),  # epoch day
        st.integers(min_value=1, max_value=9),  # quantity
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(cr_strategy)
def test_croston_matches_brute_force(rows):
    li = pd.DataFrame(
        {
            "l_partkey": [p for p, _, _ in rows],
            "l_shipdate": [
                date(1970, 1, 1) + timedelta(days=d) for _, d, _ in rows
            ],
            "l_quantity": [q for _, _, q in rows],
        }
    )
    got = sorted(_oracle("croston_demand_forecast", {"lineitem": li}))
    wk = defaultdict(int)
    for p, d, q in rows:
        wk[(p, d // 7)] += q
    exp = []
    for p in sorted({p for p, _ in wk}):
        occ = sorted((w, z) for (pp, w), z in wk.items() if pp == p)
        if len(occ) < 2:
            continue
        zs = [z for _, z in occ]
        ivs = [occ[i][0] - occ[i - 1][0] for i in range(1, len(occ))]
        z_w = sum(
            zs[-1 - a] * _CR_W[a] for a in range(min(8, len(zs)))
        )
        p_w = sum(
            ivs[-1 - a] * _CR_W[a] for a in range(min(8, len(ivs)))
        )
        # each EWMA normalized by its ACTUAL truncated weight sum
        # (256 - 2^(8-m)); for >= 9 occasions both are 255 and the
        # ratio reduces to the unnormalized z_w*1e4 // p_w exactly
        ws_z = sum(_CR_W[: min(8, len(zs))])
        ws_p = sum(_CR_W[: min(8, len(ivs))])
        exp.append(
            (p, len(occ), z_w, p_w, z_w * ws_p * 10000 // (p_w * ws_z))
        )
    assert got == sorted(exp)


# --- BH-FDR across brand permutation tests ------------------------------

from distributedmapreduce_spark.plans.analytics6 import (  # noqa: E402
    _BH_ALPHA_E1,
    _BH_P,
)

bh_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # brand bucket
        st.integers(min_value=1, max_value=6),  # orderkey
        st.integers(min_value=100, max_value=50000),  # cents
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=30, deadline=None)
@given(bh_strategy)
def test_bh_fdr_matches_brute_force(rows):
    li = pd.DataFrame(
        {
            "l_partkey": list(range(len(rows))),
            "l_orderkey": [o for _, o, _ in rows],
            "l_extendedprice": [c / 100.0 for _, _, c in rows],
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": list(range(len(rows))),
            "p_brand": [f"Brand#{b}" for b, _, _ in rows],
        }
    )
    got = sorted(
        _oracle("bh_fdr_brand_tests", {"lineitem": li, "part": part})
    )
    y = defaultdict(int)
    for b, o, c in rows:
        y[(f"Brand#{b}", o)] += c

    def stat(brand, labels):
        s1 = sum(v for (bb, o), v in y.items() if bb == brand and labels[o])
        n1 = sum(1 for (bb, o) in y if bb == brand and labels[o])
        s0 = sum(
            v for (bb, o), v in y.items() if bb == brand and not labels[o]
        )
        n0 = sum(1 for (bb, o) in y if bb == brand and not labels[o])
        if n1 == 0 or n0 == 0:
            return 0
        return abs(s1 * 10000 // n1 - s0 * 10000 // n0)

    brands = sorted({b for b, _ in y})
    pvals = {}
    for brand in brands:
        okeys = {o for bb, o in y if bb == brand}
        obs = stat(brand, {o: o % 2 == 1 for o in okeys})
        n_ge = 0
        for p in range(1, _BH_P + 1):
            labels = {
                o: _md5_u32("bh", o * (_BH_P + 1) + p) % 2 == 1
                for o in okeys
            }
            if stat(brand, labels) >= obs:
                n_ge += 1
        pvals[brand] = (1 + n_ge) * 1_000_000 // (_BH_P + 1)
    m = len(brands)
    ranked = sorted(pvals.items(), key=lambda kv: (kv[1], kv[0]))
    kmax = 0
    for i, (_, p) in enumerate(ranked, start=1):
        if p * m * 10 <= i * 1_000_000 * _BH_ALPHA_E1:
            kmax = i
    exp = sorted(
        (b, p, i, 1 if i <= kmax else 0)
        for i, (b, p) in enumerate(ranked, start=1)
    )
    assert got == exp


# --- mixture effective sample size ---------------------------------------

ess_strategy = st.lists(
    st.tuples(
        st.sampled_from(["web", "books", "code"]),  # source
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=30, deadline=None)
@given(ess_strategy)
def test_mixture_ess_matches_brute_force(rows):
    docs = pd.DataFrame(
        {
            "doc_id": list(range(len(rows))),
            "source": [s for (s,) in rows],
        }
    )
    got = _oracle("mixture_effective_sample_size", {"documents": docs})
    ns = Counter(s for (s,) in rows)
    ws = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in ns.items()}
    total = len(rows)
    sw = sum(n * ws[s] for s, n in ns.items())
    sw2 = sum(n * ws[s] ** 2 for s, n in ns.items())
    ess = math.floor(float(sw) * float(sw) / float(sw2))
    ratio = math.floor(
        float(sw) * float(sw) / float(sw2) / float(total) * 1_000_000
    )
    assert got == [(total, ess, ratio)]


# --- Gini split gain ------------------------------------------------------

from distributedmapreduce_spark.plans.analytics6 import _STUMP_BW  # noqa: E402

stump_strategy = st.lists(
    st.tuples(
        st.integers(min_value=100, max_value=300000),  # cents
        st.booleans(),  # label R?
    ),
    min_size=2,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(stump_strategy)
def test_gini_split_gain_matches_brute_force(rows):
    li = pd.DataFrame(
        {
            "l_extendedprice": [c / 100.0 for c, _ in rows],
            "l_returnflag": ["R" if r else "A" for _, r in rows],
        }
    )
    got = sorted(_oracle("gini_split_gain_price", {"lineitem": li}))
    h = defaultdict(lambda: [0, 0])
    for c, r in rows:
        h[c // _STUMP_BW][0 if r else 1] += 1
    P = sum(p for p, _ in h.values())
    N = sum(n for _, n in h.values())
    raw = []
    pl = nl = 0
    for b in sorted(h):
        if 0 < pl + nl < P + N:
            gain = (
                2 * P * N * 1_000_000 // (P + N)
                - 2 * pl * nl * 1_000_000 // (pl + nl)
                - 2 * (P - pl) * (N - nl) * 1_000_000
                // (P + N - pl - nl)
            )
            raw.append((b, pl, nl, gain))
        pl += h[b][0]
        nl += h[b][1]
    best = max((g for *_, g in raw), default=None)
    exp = sorted(
        (b, pl, nl, g, 1 if g == best else 0) for b, pl, nl, g in raw
    )
    assert got == exp
