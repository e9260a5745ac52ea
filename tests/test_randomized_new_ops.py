"""Randomized brute-force oracles for the newest operators: each test
rebuilds the expected answer in pure Python (sets / dicts / loops — no
SQL, no Spark) on a seeded random corpus whose small vocabulary forces
hash-key collisions, shared spans, and co-occurrence structure."""

import math
import random
from itertools import combinations

VOCAB = [f"w{i}" for i in range(12)]


def _random_docs(seed, n_docs=24, lo=5, hi=60, dup_every=5):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        if i % dup_every == dup_every - 1 and rows:
            # replant an earlier doc's text -> guaranteed shared spans
            rows.append((i, rows[rng.randrange(len(rows))][1]))
        else:
            rows.append(
                (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(lo, hi))))
            )
    return rows


def _tokens(text):
    return [t for t in text.lower().split(" ") if t != ""]


def test_span_dedup_matches_bruteforce(spark):
    from ontology_loader_spark.operators.dedup import SPAN_STRIDE, SPAN_W, span_dedup

    rows = _random_docs(seed=3, lo=SPAN_W, hi=80)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pos"]): (r["is_dup"], r["is_canonical"])
        for r in span_dedup(docs).collect()
    }

    occ = {}
    for doc_id, text in rows:
        ts = _tokens(text)
        if len(ts) < SPAN_W:
            continue
        for pos in range(1, len(ts) - SPAN_W + 2, SPAN_STRIDE):
            key = " ".join(ts[pos - 1 : pos - 1 + SPAN_W])
            occ.setdefault(key, []).append((doc_id, pos))
    want = {}
    for key, places in occ.items():
        canon = min(places)
        for place in places:
            want[place] = (len(places) > 1, place == canon)
    assert got == want


def test_containment_matches_bruteforce_on_all_pairs(spark):
    """Feed ALL pairs as candidates: every containment value must equal
    the pure-set-arithmetic answer, direction included."""
    from ontology_loader_spark.operators.dedup import SHINGLE_N, containment_dedup

    rows = _random_docs(seed=5, n_docs=12, lo=SHINGLE_N, hi=40)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ids = [r[0] for r in rows]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in combinations(sorted(ids), 2)], "a long, b long"
    )
    got = {
        (r["contained"], r["container"]): r["containment"]
        for r in containment_dedup(docs, pairs=pairs, threshold=0.0).collect()
    }

    sh = {}
    for doc_id, text in rows:
        ts = _tokens(text)
        sh[doc_id] = {
            " ".join(ts[i : i + SHINGLE_N]) for i in range(len(ts) - SHINGLE_N + 1)
        }
    want = {}
    for a, b in combinations(sorted(ids), 2):
        if not sh.get(a) or not sh.get(b):
            continue  # too short to shingle -> operator drops it too
        inter = len(sh[a] & sh[b])
        c = inter / min(len(sh[a]), len(sh[b]))
        if (len(sh[a]), a) <= (len(sh[b]), b):
            want[(a, b)] = c
        else:
            want[(b, a)] = c
    assert got == want


def test_triangle_counts_matches_bruteforce(spark):
    from ontology_loader_spark.operators.graph import (
        CODOC_PCT,
        triangle_counts,
    )

    rows = _random_docs(seed=7, n_docs=20, lo=3, hi=10)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["node"]: r["triangles"] for r in triangle_counts(docs).collect()}

    n_docs_with = len({d for d, t in rows if _tokens(t)})
    codoc = {}
    for _, text in rows:
        for u, v in combinations(sorted(set(_tokens(text))), 2):
            codoc[(u, v)] = codoc.get((u, v), 0) + 1
    edges = {p for p, c in codoc.items() if c * 100 >= CODOC_PCT * n_docs_with}
    nodes = sorted({n for e in edges for n in e})
    tri = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if (
            ((a, b) in edges)
            and ((b, c) in edges)
            and ((a, c) in edges)
        ):
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    assert got == tri


def test_group_quantiles_matches_bruteforce(spark):
    from ontology_loader_spark.operators.text import QUANTILE_PCTS, group_quantiles

    rng = random.Random(11)
    rows = [
        (i, " ".join("t" for _ in range(rng.randint(1, 30))), f"s{i % 4}")
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: tuple(r[f"p{p}_tokens"] for p in QUANTILE_PCTS)
        for r in group_quantiles(docs).collect()
    }

    by_src = {}
    for _, text, src in rows:
        by_src.setdefault(src, []).append(len(_tokens(text)))
    want = {}
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        picks = []
        for p in QUANTILE_PCTS:
            # least v with cdf*100 >= p*n == value at index ceil(p*n/100)-1
            idx = math.ceil(p * n / 100) - 1
            picks.append(vals[idx])
        want[src] = tuple(picks)
    assert got == want


def test_rolling_active_users_matches_bruteforce(spark):
    import datetime as dt

    from ontology_loader_spark.operators.events import WAU_DAYS, rolling_active_users

    rng = random.Random(13)
    epoch = dt.datetime(1970, 1, 1)
    rows = [
        (rng.randrange(9), epoch + dt.timedelta(days=rng.randrange(25), hours=1))
        for _ in range(300)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day_epoch"]: (r["dau"], r["wau"])
        for r in rolling_active_users(ev).collect()
    }

    active = {(u, (ts - epoch).days) for u, ts in rows}
    days = sorted({d for _, d in active})
    want = {}
    for d in days:
        dau = len({u for u, day in active if day == d})
        wau = len({u for u, day in active if d - (WAU_DAYS - 1) <= day <= d})
        want[d] = (dau, wau)
    assert got == want


def test_char_entropy_matches_bruteforce(spark):
    from ontology_loader_spark.operators.text import LM_MICRO, char_entropy

    rows = _random_docs(seed=17, n_docs=15, lo=1, hi=40)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chars_counted"], r["entropy_micro"])
        for r in char_entropy(docs).collect()
    }

    want = {}
    for doc_id, text in rows:
        hist = {}
        for ch in text.lower():
            hist[ch] = hist.get(ch, 0) + 1
        n = sum(hist.values())
        s = sum(c * math.floor(math.log(c) * LM_MICRO) for c in hist.values())
        want[doc_id] = (n, math.floor(math.log(n) * LM_MICRO) - s // n)
    assert got == want


def test_bigram_lm_score_matches_bruteforce(spark):
    from ontology_loader_spark.operators.text import LM_MICRO, bigram_lm_score

    rows = _random_docs(seed=19, n_docs=15, lo=2, hi=40)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logprob_micro"])
        for r in bigram_lm_score(docs).collect()
    }

    # corpus bigram + head counts
    cp, ch = {}, {}
    per_doc = {}
    for doc_id, text in rows:
        ts = _tokens(text)
        bgs = [(ts[i], ts[i + 1]) for i in range(len(ts) - 1)]
        per_doc[doc_id] = bgs
        for bg in bgs:
            cp[bg] = cp.get(bg, 0) + 1
            ch[bg[0]] = ch.get(bg[0], 0) + 1
    lp = {bg: math.floor(math.log(c / ch[bg[0]]) * LM_MICRO) for bg, c in cp.items()}
    want = {
        doc_id: (len(bgs), sum(lp[bg] for bg in bgs))
        for doc_id, bgs in per_doc.items()
        if bgs
    }
    assert got == want


def test_engagement_ratios_matches_bruteforce(spark):
    import datetime as dt

    from ontology_loader_spark.operators.events import (
        MAU_DAYS,
        WAU_DAYS,
        engagement_ratios,
    )

    rng = random.Random(29)
    epoch = dt.datetime(1970, 1, 1)
    rows = [
        (rng.randrange(8), epoch + dt.timedelta(days=rng.randrange(40), hours=2))
        for _ in range(400)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["day_epoch"]: (r["dau"], r["wau"], r["mau"], r["stickiness_ppm"])
        for r in engagement_ratios(ev).collect()
    }

    active = {(u, (ts - epoch).days) for u, ts in rows}
    want = {}
    for d in sorted({day for _, day in active}):
        dau = len({u for u, day in active if day == d})
        wau = len({u for u, day in active if d - (WAU_DAYS - 1) <= day <= d})
        mau = len({u for u, day in active if d - (MAU_DAYS - 1) <= day <= d})
        want[d] = (dau, wau, mau, dau * 10**6 // mau)
    assert got == want


def test_quality_percentile_matches_bruteforce(spark):
    from ontology_loader_spark.operators.text import LM_MICRO, quality_percentile

    rng = random.Random(31)
    rows = [
        (i, " ".join("t" for _ in range(rng.randint(1, 25))))
        for i in range(150)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["cdf_ppm"])
        for r in quality_percentile(docs).collect()
    }

    vals = {doc_id: len(_tokens(text)) for doc_id, text in rows}
    n = len(vals)
    want = {
        doc_id: (v, sum(1 for u in vals.values() if u <= v) * LM_MICRO // n)
        for doc_id, v in vals.items()
    }
    assert got == want


def test_shuffle_order_matches_bruteforce_and_is_permutation(spark):
    import hashlib

    from ontology_loader_spark.operators.corpus import SHUFFLE_SALT, shuffle_order

    ids = list(range(0, 400, 3))
    docs = spark.createDataFrame([(i, "t") for i in ids], "doc_id long, text string")
    got = {
        r["doc_id"]: r["shuffle_pos"]
        for r in shuffle_order(docs.repartition(7)).collect()
    }
    order = sorted(
        ids, key=lambda i: hashlib.md5(f"{SHUFFLE_SALT}{i}".encode()).hexdigest()
    )
    want = {doc_id: pos + 1 for pos, doc_id in enumerate(order)}
    assert got == want
    assert sorted(got.values()) == list(range(1, len(ids) + 1))


def test_shuffle_order_partitioning_invariant(spark):
    from ontology_loader_spark.operators.corpus import shuffle_order

    docs = spark.createDataFrame(
        [(i, "t") for i in range(250)], "doc_id long, text string"
    )
    one = sorted(map(tuple, shuffle_order(docs.coalesce(1), 4).collect()))
    many = sorted(map(tuple, shuffle_order(docs.repartition(13), 32).collect()))
    assert one == many
