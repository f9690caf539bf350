"""Hypothesis brute-force parity for the round-6 operators (and the
round-6 REWRITES whose oracles kept their global-window form).

Same discipline as test_brute_force_parity.py: tiny random tables,
the REGISTERED oracle SQL runs on DuckDB (no Spark — fast loop), and
the result is compared against an independent naive-Python
implementation of the mathematical definition, closing the
both-engines-wrong-the-same-way blind spot.  The Spark==oracle leg is
covered by tools/check_oracle.py at sf0.01/10x/100x.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from distributedmapreduce_spark.plans.core import registry

_WEEK_US = 7 * 86_400 * 1_000_000
_7D_US = 7 * 86_400 * 1_000_000
_BASE = 1_704_067_200_000_000  # 2024-01-01 UTC µs


def _oracle_tables(name: str, tables: dict):
    sql = registry()[name].oracle
    assert sql, name
    con = duckdb.connect()
    for tname, pdf in tables.items():
        con.register(tname, pdf)
    return con.execute(sql).fetchall()


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user bucket
        st.sampled_from(["click", "view", "purchase"]),
        st.integers(min_value=0, max_value=4_000_000),  # seconds offset
        st.integers(min_value=1, max_value=49_000),  # cents
    ),
    min_size=1,
    max_size=40,
)


def _events_df(rows):
    recs = []
    for i, (u, ty, sec, cents) in enumerate(rows):
        recs.append(
            {
                "event_id": i + 1,
                "ts": pd.Timestamp(_BASE + sec * 1_000_000, unit="us"),
                "user_id": u + 1,
                "event_type": ty,
                "value": cents / 100.0,
                "props": "{}",
            }
        )
    return pd.DataFrame(recs)


def _purchases(rows):
    out = []
    for i, (u, ty, sec, cents) in enumerate(rows):
        if ty == "purchase":
            out.append((u + 1, i + 1, _BASE + sec * 1_000_000, cents))
    return out


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_retention_cohorts_weekly_brute_force(rows):
    got = {
        (r[0], r[1]): r[2]
        for r in _oracle_tables("retention_cohorts_weekly", {"events": _events_df(rows)})
    }
    weeks = defaultdict(set)
    for u, _eid, us, _c in _purchases(rows):
        weeks[u].add(us // _WEEK_US)
    exp = Counter()
    for u, wks in weeks.items():
        cw = min(wks)
        for wk in wks:
            exp[(cw, wk - cw)] += 1
    assert got == dict(exp)


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_funnel_conversion_brute_force(rows):
    got = {r[0]: (r[1], r[2]) for r in _oracle_tables("funnel_conversion", {"events": _events_df(rows)})}
    ev = defaultdict(list)
    for i, (u, ty, sec, _c) in enumerate(rows):
        ev[u + 1].append((ty, _BASE + sec * 1_000_000))
    n1 = n2 = n3 = 0
    for u, es in ev.items():
        views = [t for ty, t in es if ty == "view"]
        if not views:
            continue
        n1 += 1
        t1 = min(views)
        clicks = [t for ty, t in es if ty == "click" and t >= t1]
        if not clicks:
            continue
        n2 += 1
        t2 = min(clicks)
        if any(ty == "purchase" and t >= t2 for ty, t in es):
            n3 += 1
    assert got == {1: ("view", n1), 2: ("click", n2), 3: ("purchase", n3)}


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_rolling_7d_spend_brute_force(rows):
    got = sorted(
        (r[0], r[1], r[2])
        for r in _oracle_tables("rolling_7d_user_spend", {"events": _events_df(rows)})
    )
    ps = _purchases(rows)
    exp = sorted(
        (
            u,
            eid,
            sum(
                c2
                for u2, _e2, us2, c2 in ps
                if u2 == u and us - _7D_US <= us2 <= us
            ),
        )
        for u, eid, us, _c in ps
    )
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_decile_lift_gains_brute_force(rows):
    got = sorted(
        _oracle_tables("decile_lift_gains", {"events": _events_df(rows)})
    )
    spend = Counter()
    for u, _eid, _us, c in _purchases(rows):
        spend[u] += c
    if not spend:
        assert got == []
        return
    ranked = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))
    n = len(ranked)
    per_decile = defaultdict(lambda: [0, 0])
    for rn, (_u, mon) in enumerate(ranked, start=1):
        d = 1 + ((rn - 1) * 10) // n
        per_decile[d][0] += 1
        per_decile[d][1] += mon
    tot = sum(m for _, m in ranked)
    exp, cum = [], 0
    for d in sorted(per_decile):
        nu, rev = per_decile[d]
        cum += rev
        exp.append((d, nu, rev, (cum * 1_000_000) // tot))
    assert got == sorted(exp)


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_event_value_quantiles_brute_force(rows):
    got = sorted(
        _oracle_tables("event_value_quantiles_exact", {"events": _events_df(rows)})
    )
    by_type = defaultdict(list)
    for i, (u, ty, sec, cents) in enumerate(rows):
        by_type[ty].append((cents / 100.0, i + 1))
    exp = []
    for ty, vs in by_type.items():
        vs.sort()
        n = len(vs)
        for q in (50, 90, 99):
            rank = -((-q * n) // 100)  # ceil(q*n/100)
            exp.append((ty, q, vs[rank - 1][0]))
    assert got == sorted(exp)


lineitem_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "N", "R"]),  # returnflag
        st.integers(min_value=1, max_value=900_000),  # price cents
        st.integers(min_value=1, max_value=50),  # quantity
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(lineitem_strategy)
def test_weighted_median_brute_force(rows):
    li = pd.DataFrame(
        {
            "l_returnflag": [f for f, _, _ in rows],
            "l_extendedprice": [c / 100.0 for _, c, _ in rows],
            "l_quantity": [float(q) for _, _, q in rows],
            "l_orderkey": list(range(1, len(rows) + 1)),
            "l_linenumber": [1] * len(rows),
        }
    )
    got = sorted(
        _oracle_tables("weighted_median_price", {"lineitem": li})
    )
    by_flag = defaultdict(list)
    for ok, (f, c, q) in enumerate(rows, start=1):
        by_flag[f].append((c, ok, q))
    exp = []
    for f, vs in by_flag.items():
        vs.sort()
        tw = sum(q for _, _, q in vs)
        cw = 0
        for c, _ok, q in vs:
            cw += q
            if 2 * cw >= tw:
                exp.append((f, tw, c))
                break
    assert got == sorted(exp)


docs_strategy = st.lists(
    st.integers(min_value=0, max_value=3),  # source bucket
    min_size=1,
    max_size=40,
)


@settings(max_examples=40, deadline=None)
@given(docs_strategy)
def test_source_mixture_balance_brute_force(sources):
    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, len(sources) + 1)),
            "source": [f"src{s}" for s in sources],
        }
    )
    got = sorted(
        _oracle_tables("source_mixture_balance", {"documents": docs})
    )

    def u(doc_id):
        h = hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[:8]
        return int(h, 16) / 2**32

    by_src = defaultdict(list)
    for i, s in enumerate(sources):
        by_src[f"src{s}"].append(i + 1)
    m = min(len(v) for v in by_src.values())
    exp = []
    for s, ids in by_src.items():
        ids.sort(key=lambda d: (u(d), d))
        exp.extend((d, s) for d in ids[:m])
    assert got == sorted(exp)


baskets_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # customer
        st.lists(
            st.integers(min_value=0, max_value=14), min_size=1, max_size=5
        ),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=30, deadline=None)
@given(baskets_strategy)
def test_connected_components_brute_force(baskets):
    orders, items = [], []
    for oi, (cust, parts) in enumerate(baskets):
        orders.append({"o_orderkey": oi + 1, "o_custkey": cust + 1})
        for ln, p in enumerate(parts):
            items.append(
                {"l_orderkey": oi + 1, "l_partkey": p + 1,
                 "l_linenumber": ln + 1}
            )
    got = sorted(
        _oracle_tables(
            "connected_components_hashmin",
            {
                "orders": pd.DataFrame(orders),
                "lineitem": pd.DataFrame(items),
            },
        )
    )
    cp = {(c + 1, p + 1) for c, parts in baskets for p in parts}
    deg = Counter(p for _, p in cp)
    by_part = defaultdict(set)
    for c, p in cp:
        if deg[p] <= 15:
            by_part[p].add(c)
    nbrs = defaultdict(set)
    nodes = set()
    for cs in by_part.values():
        cs = sorted(cs)
        for i, a in enumerate(cs):
            for b in cs[i + 1:]:
                nbrs[a].add(b)
                nbrs[b].add(a)
                nodes |= {a, b}
    if not nodes:
        assert got == []
        return
    lbl = {v: v for v in nodes}
    for _ in range(4):  # fixed K, matching the query
        lbl = {
            v: min([lbl[v]] + [lbl[w] for w in nbrs[v]]) for v in nodes
        }
    census = defaultdict(list)
    for v, c in lbl.items():
        census[c].append(v)
    exp = sorted((c, len(vs), min(vs)) for c, vs in census.items())
    assert got == exp


emb_strategy = st.lists(
    st.lists(
        st.floats(
            min_value=-1.0,
            max_value=1.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=3,
        max_size=3,
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=40, deadline=None)
@given(emb_strategy)
def test_embedding_quantize_brute_force(vecs):
    import math

    emb = pd.DataFrame(
        {
            "vec_id": list(range(1, len(vecs) + 1)),
            "embedding": vecs,
            "label": [0] * len(vecs),
        }
    )
    got = sorted(
        _oracle_tables("embedding_int8_quantize", {"embeddings": emb})
    )
    dims = defaultdict(list)
    for v in vecs:
        for d, x in enumerate(v):
            dims[d].append(math.floor(x * 1e7))
    exp = []
    for d, xs in dims.items():
        mn, mx = min(xs), max(xs)
        errs = []
        for xi in xs:
            code = 0 if mx == mn else ((xi - mn) * 255) // (mx - mn)
            recon = mn + (code * (mx - mn)) // 255
            errs.append(abs(xi - recon))
        exp.append((d, mn, mx, sum(errs), max(errs)))
    assert got == sorted(exp)


pii_docs_strategy = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from(["alpha", "beta", "user@mailx.com", "10.1.2.3",
                             "555-1234x", "gamma"]),
            min_size=0,
            max_size=6,
        ),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=40, deadline=None)
@given(pii_docs_strategy)
def test_pii_detect_redact_brute_force(rows):
    """Oracle vs Python `re` on text that already CONTAINS pii-shaped
    (and near-miss) tokens, on top of the doc_id-injected spans — the
    regex semantics themselves are the thing under test."""
    import re as _re

    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, len(rows) + 1)),
            "text": [" ".join(ws) for (ws,) in rows],
        }
    )
    got = sorted(_oracle_tables("pii_detect_redact", {"documents": docs}))
    email = _re.compile(r"[a-z0-9]+@[a-z0-9]+\.com")
    phone = _re.compile(r"555-[0-9]{4}")
    ip = _re.compile(r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")
    exp = []
    for d, (ws,) in enumerate(rows, start=1):
        t = " ".join(ws)
        if d % 4 < 3:
            t += f" contact user{d}@mail{d % 7}.com"
        if d % 3 == 0:
            t += f" call 555-{1000 + d % 9000}"
        if d % 5 == 0:
            t += f" host 10.{d % 256}.{(d * 7) % 256}.{(d * 13) % 256}"
        # counts are over the ORIGINAL text for all three classes
        # (matching the oracle and the Spark plan); only the
        # redaction chains class over class
        n_e = len(email.findall(t))
        n_p = len(phone.findall(t))
        n_i = len(ip.findall(t))
        red = ip.sub("<IP>", phone.sub("<PHONE>", email.sub("<EMAIL>", t)))
        exp.append(
            (d, n_e, n_p, n_i, hashlib.md5(red.encode()).hexdigest())
        )
    assert got == sorted(exp)


_DAY_US = 86_400_000_000


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_ewma_pow2_brute_force(rows):
    got = sorted(
        _oracle_tables("ewma_pow2_user_spend", {"events": _events_df(rows)})
    )
    daily = defaultdict(int)
    for u, _eid, us, cents in _purchases(rows):
        daily[(u, us // _DAY_US)] += cents
    exp = []
    for (u, day) in daily:
        e = sum(
            daily.get((u, day - a), 0) * (128 >> a) for a in range(8)
        )
        exp.append((u, day, e))
    assert got == sorted(exp)


docs_lang_strategy = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "zh"]),
        st.lists(
            st.sampled_from(["the", "der", "data", "spark", "ja", ""]),
            min_size=0,
            max_size=8,
        ),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=40, deadline=None)
@given(docs_lang_strategy)
def test_keyness_brute_force(docs):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, len(docs) + 1)),
            "text": [" ".join(ws) for _, ws in docs],
            "lang": [lang for lang, _ in docs],
            "source": ["src0"] * len(docs),
            "n_chars": [len(" ".join(ws)) for _, ws in docs],
        }
    )
    got = _oracle_tables("keyness_lang_drift", {"documents": pdf})
    c_en, c_ot = Counter(), Counter()
    for lang, ws in docs:
        for w in ws:
            if w:
                (c_en if lang == "en" else c_ot)[w] += 1
    t_en, t_ot = sum(c_en.values()), sum(c_ot.values())
    exp = []
    for w in set(c_en) | set(c_ot):
        r_en = 0 if t_en == 0 else c_en[w] * 1_000_000 // t_en
        r_ot = 0 if t_ot == 0 else c_ot[w] * 1_000_000 // t_ot
        exp.append((w, c_en[w], c_ot[w], r_en - r_ot))
    exp.sort(key=lambda r: (-abs(r[3]), r[0]))
    assert got == exp[:50]


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_churn_training_set_brute_force(rows):
    got = sorted(
        _oracle_tables("churn_training_set", {"events": _events_df(rows)})
    )
    ps = _purchases(rows)
    if not ps:
        assert got == []
        return
    cutoff = max(us for _, _, us, _ in ps) - 28 * _DAY_US
    feat = {}
    for u, _eid, us, cents in ps:
        if us <= cutoff:
            mx, n, m = feat.get(u, (None, 0, 0))
            mx = us if mx is None else max(mx, us)
            feat[u] = (mx, n + 1, m + cents)
    lab = {
        u
        for u, _eid, us, _c in ps
        if cutoff < us <= cutoff + 14 * _DAY_US
    }
    exp = sorted(
        (u, (cutoff - mx) // _DAY_US, n, m, 1 if u in lab else 0)
        for u, (mx, n, m) in feat.items()
    )
    assert got == exp
