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


def test_semantic_dedup_matches_bruteforce(spark):
    """Pure-Python re-derivation of semantic_dedup: quantize, run the
    identical first-k-seed Lloyd iterations, assign, md5-cap the
    candidate side, min-id dup marking — on seeded random embeddings
    with planted duplicate directions."""
    import hashlib

    from ontology_loader_spark.operators.similarity import (
        IVF_ITERS,
        QUANT,
        semantic_dedup,
    )

    rng = random.Random(17)
    dim, n, cells, max_cell, threshold = 6, 40, 4, 8, 0.6
    rows = []
    for i in range(n):
        if i % 7 == 6 and rows:
            base = rows[rng.randrange(len(rows))][1]
            rows.append((i, [v * rng.uniform(0.9, 1.1) for v in base]))
        else:
            rows.append((i, [rng.uniform(-1, 1) for _ in range(dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # ---- brute force (float32 cast first, like the parquet column)
    import struct as _st

    def f32(v):
        return _st.unpack("f", _st.pack("f", v))[0]

    q = {i: [math.floor(f32(v) * QUANT) for v in vec] for i, vec in rows}

    def idot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def cos(a, b):
        return idot(a, b) / math.sqrt(idot(a, a) * idot(b, b))

    cents = {c: list(q[c]) for c in range(cells)}
    for _ in range(IVF_ITERS):
        members = {}
        for i in sorted(q):
            best = max(
                sorted(cents), key=lambda c: (cos(q[i], cents[c]), -c)
            )
            members.setdefault(best, []).append(i)
        cents = {
            c: [
                math.floor(sum(q[i][p] for i in ms) / len(ms))
                for p in range(dim)
            ]
            for c, ms in members.items()
        }
    assign = {
        i: max(sorted(cents), key=lambda c: (cos(q[i], cents[c]), -c))
        for i in sorted(q)
    }
    by_cell = {}
    for i, c in assign.items():
        by_cell.setdefault(c, []).append(i)
    want = {}
    for c, ms in by_cell.items():
        cand = sorted(
            ms, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )[:max_cell]
        for b in ms:
            dups = [a for a in cand if a < b and cos(q[a], q[b]) >= threshold]
            want[b] = (c, min(dups) if dups else None)

    got = {
        r["vec_id"]: (r["cell"], r["dup_of"])
        for r in semantic_dedup(
            emb, threshold=threshold, cells=cells, max_cell=max_cell
        ).collect()
    }
    assert got == want
    assert any(d is not None for _, d in got.values())  # planted dups found


def test_mention_ancestors_matches_bruteforce(spark):
    """Pure-Python re-derivation: substring mention detection, longest-
    surface top-1 per turn, BFS ancestors over the raw edge graph with
    the F1 emission filter — on a seeded random transcript corpus."""
    import datetime

    from ontology_loader_spark.pipeline import mention_ancestor_triples
    from ontology_loader_spark.schemas import (
        EDGE_SCHEMA,
        TERM_DICT_SCHEMA,
        TRANSCRIPT_SCHEMA,
    )

    rng = random.Random(29)
    names = ["alpha", "beta", "gamma", "alphabet", "delta"]
    terms = [(f"P:{n}", n) for n in names]
    base = datetime.datetime(2026, 6, 1)
    turns = []
    for ci in range(12):
        for ti in range(rng.randint(1, 4)):
            words = [rng.choice(names + VOCAB) for _ in range(rng.randint(2, 8))]
            turns.append((f"c{ci}", ti, "user", " ".join(words), None, base))
    # random DAG over P-terms plus a foreign hop
    nodes = [f"P:{n}" for n in names] + ["Q:x"]
    edges = []
    for i in range(1, len(nodes)):
        for j in rng.sample(range(i), min(2, i)):
            edges.append((nodes[i], "rdfs:subClassOf", nodes[j]))
    edges.append(("P:delta", "rdfs:seeAlso", "P:alpha"))  # ignored pred

    tr = spark.createDataFrame(turns, TRANSCRIPT_SCHEMA)
    md = spark.createDataFrame(terms, "id string, name string")
    td = spark.createDataFrame(
        [(f"P:{n}", n, "", [], False, None) for n in names]
        + [("P:extra", "extra", "", [], False, None)],
        TERM_DICT_SCHEMA,
    )
    ed = spark.createDataFrame(edges, EDGE_SCHEMA)

    # ---- brute force
    adj = {}
    for s, p, o in edges:
        if p in ("rdfs:subClassOf", "BFO:0000050"):
            adj.setdefault(s, set()).add(o)

    def ancestors(t):
        seen, stack = {t}, [t]
        while stack:
            u = stack.pop()
            for v in adj.get(u, ()):  # traverse through foreign nodes
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        return {a for a in seen if a.startswith("P:")}  # F1 on emission

    want = set()
    for conv_id, turn_idx, _role, text, _tool, _ts in turns:
        hits = [(tid, nm) for tid, nm in terms if nm in text]
        if not hits:
            continue
        tid, _ = min(hits, key=lambda h: (-len(h[1]), h[0]))
        for a in ancestors(tid):
            want.add((conv_id, turn_idx, tid, a))

    got = {
        (r["conv_id"], r["turn_idx"], r["term_id"], r["ancestor"])
        for r in mention_ancestor_triples(spark, tr, md, ed, td, "p").collect()
    }
    assert got == want
    assert len(got) > 20  # non-trivial corpus actually linked
