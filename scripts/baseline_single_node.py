"""Measured single-node baseline for BENCH comparisons (BASELINE.md promise).

Each headline query re-implemented as an optimized SINGLE-PROCESS numpy/pandas
program over the same parquet inputs — the "what would a competent engineer do
on one core without Spark" number. shapely/GeoPandas are absent from this
runtime (see BASELINE.md), so geometry work uses the same closed-form
derivations the queries are built on; the text/embedding pipelines use plain
hashlib/numpy, the same algorithms as the engine.

Writes BASELINE_MEASURED.json at the repo root:
    {"sf": ..., "queries": {name: seconds}, "method": "..."}

Usage: python scripts/baseline_single_node.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time

import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


REPS = int(os.environ.get("BASELINE_FLOOR_REPS", "3"))


def timed(fn):
    """Median of REPS runs (default 3) — symmetric with the engine's
    queries_median3 so the vs_floor ratios compare median to median, not
    median to a single shot (round-5 verdict: the single-shot floor's p1
    term was the one place floor noise moved the headline ratio)."""
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    timed.last_reps = ts
    return sorted(ts)[len(ts) // 2]


def li_rects() -> pd.DataFrame:
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_linenumber"])
    li["x0"] = ((li.l_linenumber - 1) % 7) * 5.0
    li["y0"] = (li.l_suppkey % 3) * 1.0
    li["x1"] = li.x0 + 4.0
    li["y1"] = li.y0 + 4.0
    return li


def nation_rects() -> pd.DataFrame:
    n = pd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey"])
    n["x0"] = (n.n_nationkey % 5) * 20.0
    n["y0"] = (n.n_nationkey // 5) * 20.0
    n["x1"] = n.x0 + 18.0
    n["y1"] = n.y0 + 18.0
    return n


def cust_pts() -> pd.DataFrame:
    c = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    c["x"] = (c.c_custkey % 97) + 0.5
    c["y"] = ((c.c_custkey * 7) % 89) + 0.5
    return c


def b1(li: pd.DataFrame) -> None:
    w = li.x1.values - li.x0.values
    h = li.y1.values - li.y0.values
    (w * h).sum()
    (2 * (w + h)).sum()


def b2(li: pd.DataFrame, nat: pd.DataFrame) -> None:
    nat5 = nat[nat.n_nationkey < 5]
    total = 0
    for _, r in nat5.iterrows():
        m = (li.x0.values <= r.x1) & (r.x0 <= li.x1.values) & \
            (li.y0.values <= r.y1) & (r.y0 <= li.y1.values)
        total += int(m.sum())


def b3(li: pd.DataFrame) -> None:
    # union of disjoint 4x4 slot rects per suppkey = 16 * distinct slots
    slots = ((li.l_linenumber - 1) % 7)
    df = pd.DataFrame({"s": li.l_suppkey, "slot": slots})
    (df.groupby("s")["slot"].nunique() * 16.0).sum()


def b4(cust: pd.DataFrame, nat: pd.DataFrame) -> None:
    xs, ys = cust.x.values, cust.y.values
    out = []
    for _, r in nat.iterrows():
        idx = np.nonzero((xs > r.x0) & (xs < r.x1) & (ys > r.y0) & (ys < r.y1))[0]
        out.append(idx)
    sum(len(i) for i in out)


def b5() -> None:
    s = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    s["x0"] = s.s_suppkey * 1.5
    s["y0"] = (s.s_suppkey % 3) * 0.5
    s["x1"] = s.x0 + 4.0
    s["y1"] = s.y0 + 4.0
    g = s.groupby("s_nationkey").agg(x0=("x0", "max"), y0=("y0", "max"),
                                     x1=("x1", "min"), y1=("y1", "min"))
    w = np.maximum(0.0, g.x1 - g.x0)
    h = np.maximum(0.0, g.y1 - g.y0)
    (w * h).sum()


_WS = re.compile(r"\s+")


def _doc_sigs(texts, k=16, bands=4, n=3):
    rows = k // bands
    sigs, band_hashes, doc_sh = [], [], []
    bases = [hashlib.md5(f"{i}:".encode()) for i in range(k)]
    for t in texts:
        toks = _WS.split(t.strip().lower())
        if len(toks) >= n:
            sh = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        else:
            sh = [" ".join(toks)]
        sh = list(dict.fromkeys(sh))
        doc_sh.append(set(sh))
        sig = []
        for i in range(k):
            base = bases[i]
            best = None
            for x in sh:
                m = base.copy()
                m.update(x.encode())
                v = int.from_bytes(m.digest()[:4], "big")
                if best is None or v < best:
                    best = v
            sig.append(best)
        sigs.append(sig)
        band_hashes.append([
            hashlib.md5(",".join(str(v) for v in sig[b * rows:(b + 1) * rows]).encode()).hexdigest()
            for b in range(bands)
        ])
    return doc_sh, band_hashes


def p1(docs: pd.DataFrame) -> None:
    doc_sh, band_hashes = _doc_sigs(docs.text.tolist())
    ids = docs.doc_id.tolist()
    buckets: dict[tuple, list[int]] = {}
    for i, bh in enumerate(band_hashes):
        for b, h in enumerate(bh):
            buckets.setdefault((b, h), []).append(i)
    cands = set()
    for members in buckets.values():
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                i, j = members[a], members[b]
                cands.add((i, j) if ids[i] < ids[j] else (j, i))
    n_pairs = 0
    for i, j in cands:
        inter = len(doc_sh[i] & doc_sh[j])
        union = len(doc_sh[i] | doc_sh[j])
        if union and inter / union >= 0.05:
            n_pairs += 1


def p2(emb: pd.DataFrame) -> None:
    mat = np.vstack(emb.embedding.values).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    q = mat[emb.vec_id.values < 20]
    qn = norms[emb.vec_id.values < 20]
    cos = (q @ mat.T) / np.outer(qn, norms)
    np.argsort(-cos, axis=1)[:, 1:11]


_STOP = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
}
_PUNCT = re.compile(r"[^.,;:!?'\"()-]")


def p3(docs: pd.DataFrame) -> None:
    stopsets = {k: set(v) for k, v in _STOP.items()}
    langs = sorted(stopsets)
    n_tok_sum = 0
    qual_sum = 0.0
    for t in docs.text:
        toks = _WS.split(t.strip().lower())
        n = len(toks)
        n_tok_sum += n
        hits = {lang: sum(1 for x in toks if x in s) for lang, s in stopsets.items()}
        max(hits.items(), key=lambda kv: (kv[1], -langs.index(kv[0])))
        ln = len(t)
        len_score = 1.0 if 50 <= ln <= 10000 else (ln / 50.0 if ln < 50 else 0.5)
        stop_ratio = hits["en"] / n if n else 0.0
        punct = len(_PUNCT.sub("", t)) / ln if ln else 0.0
        qual_sum += max(min(len_score * 0.5 + min(stop_ratio * 5.0, 1.0) * 0.5
                            - min(punct * 2.0, 0.5), 1.0), 0.0)


def p5(docs: pd.DataFrame) -> None:
    """Hygiene floor: Gopher signals + C4 line dedup + 6-gram decontamination
    in one process (Counter/dict/set — no framework overhead)."""
    from collections import Counter

    sub = re.compile(r" (data|table|row) ")
    stop = set(_STOP["en"])
    bench_grams: set = set()
    # benchmark = doc_id % 97 == 0 (same as the bench variant)
    texts = list(zip(docs.doc_id, docs.text))
    for i, t in texts:
        if i % 97 == 0:
            toks = _WS.split(t.strip().lower())
            bench_grams.update(" ".join(toks[j:j + 6]) for j in range(len(toks) - 5))
    first_seen: dict = {}
    n_contam = 0
    for i, t in texts:
        mt = sub.sub("\n", t)
        ls = [x for x in mt.split("\n") if x.strip()]
        toks = _WS.split(mt.strip().lower())
        # dup-line fracs
        if ls:
            (len(ls) - len(set(ls))) / len(ls)
            tot = sum(map(len, ls))
            (tot - sum(map(len, set(ls)))) / tot if tot else 0.0
        # top-2gram char frac
        if toks:
            grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)] or [mt]
            c = Counter(grams)
            max(cnt * len(g) for g, cnt in c.items()) / max(len(mt), 1)
            sum(map(len, toks)) / len(toks)
            sum(1 for w in toks if any(ch.isalpha() for ch in w)) / len(toks)
            len(set(toks) & stop)
        # line dedup (corpus-wide first-occurrence)
        for j, line in enumerate(ls):
            first_seen.setdefault(line, (i, j))
        # decontamination
        g6 = {" ".join(toks[j:j + 6]) for j in range(len(toks) - 5)}
        if g6 & bench_grams:
            n_contam += 1


def p6(cust: pd.DataFrame, nat: pd.DataFrame) -> None:
    """Nearest-join floor: vectorized point-rectangle distances (n_pts × 25
    matrix), top-2 within 9.0."""
    px = cust.x.to_numpy()[:, None]
    py = cust.y.to_numpy()[:, None]
    dx = np.maximum(np.maximum(nat.x0.to_numpy()[None, :] - px,
                               px - nat.x1.to_numpy()[None, :]), 0.0)
    dy = np.maximum(np.maximum(nat.y0.to_numpy()[None, :] - py,
                               py - nat.y1.to_numpy()[None, :]), 0.0)
    d = np.hypot(dx, dy)
    d[d > 9.0] = np.inf
    part = np.argpartition(d, 1, axis=1)[:, :2]
    int((np.take_along_axis(d, part, axis=1) < np.inf).sum())


def p7(docs: pd.DataFrame) -> None:
    """TF-IDF + BM25 floor: Counter term counts, doc-frequency dict, smoothed
    IDF, BM25 for a 2-term query."""
    import math
    from collections import Counter

    n = len(docs)
    dfreq: Counter = Counter()
    percounts = []
    dls = []
    for t in docs.text:
        toks = _WS.split(t.strip().lower())
        c = Counter(toks)
        percounts.append(c)
        dls.append(len(toks))
        dfreq.update(c.keys())
    for c in percounts:
        for term, tf in c.items():
            tf * (math.log((n + 1) / (dfreq[term] + 1)) + 1.0)
    avgdl = sum(dls) / n
    q = ["data", "table"]
    bdf = {t: sum(1 for c in percounts if t in c) for t in q}
    scores = []
    for c, dl in zip(percounts, dls):
        s = 0.0
        for t in q:
            tf = c.get(t, 0)
            if tf:
                idf = math.log(1 + (n - bdf[t] + 0.5) / (bdf[t] + 0.5))
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        scores.append(s)
    sorted(scores, reverse=True)[:10]


def p9(emb: pd.DataFrame) -> None:
    """SemDeDup floor: numpy Lloyd's (k=8, 3 rounds) + per-cluster gram
    matrix with the greedy lower-id rule — the identical FLOP shape to the
    engine's kmeans_fit + semantic_dedup, single process."""
    x = np.array(list(emb.embedding), dtype=np.float64)
    ids = emb.vec_id.to_numpy()
    cents = x[:8].copy()
    for it in range(4):  # 3 update rounds + final assignment
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        if it == 3:
            break
        for t in range(8):
            m = x[a == t]
            if len(m):
                cents[t] = m.mean(axis=0)
    total = 0
    for t in range(8):
        sel = np.nonzero(a == t)[0]
        sel = sel[np.argsort(ids[sel])]
        xx = x[sel]
        norms = np.linalg.norm(xx, axis=1)
        norms[norms == 0] = 1.0
        u = xx / norms[:, None]
        sims = u @ u.T
        total += int(np.tril(sims >= 0.9, -1).any(axis=1).sum())


def p10(docs: pd.DataFrame) -> None:
    """Curation-sweep floor: dict-based shingle ownership + borrowed-frac
    filter, then the md5 temperature gate — same algorithms, one process."""
    import hashlib
    import math

    ids = docs.doc_id.to_numpy()
    owner: dict = {}
    shingle_sets = []
    for i, t in zip(ids, docs.text):
        toks = _WS.split(t.strip().lower())
        if len(toks) >= 5:
            sh = {" ".join(toks[j:j + 5]) for j in range(len(toks) - 4)}
        else:
            sh = {" ".join(toks)}
        shingle_sets.append(sh)
        for s_ in sh:
            o = owner.get(s_)
            if o is None or i < o:
                owner[s_] = i
    keep_mask = []
    for i, sh in zip(ids, shingle_sets):
        borrowed = sum(1 for s_ in sh if owner[s_] != i)
        keep_mask.append(borrowed / len(sh) < 0.5)
    kd = docs[np.array(keep_mask)]
    counts = kd.lang.value_counts().to_dict()
    total = sum(counts.values())
    rr = {g: math.sqrt(nn / total) / nn for g, nn in counts.items()}
    mx = max(rr.values())
    n_kept = 0
    for i, g in zip(kd.doc_id, kd.lang):
        u = int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:8], 16) / 2**32
        if u < rr[g] / mx:
            n_kept += 1


def main() -> None:
    li = li_rects()
    nat = nation_rects()
    cust = cust_pts()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")

    queries = {}
    queries_reps = {}

    def run(name, fn, into=None):
        (into if into is not None else queries)[name] = timed(fn)
        queries_reps[name] = timed.last_reps

    run("b1_elementwise", lambda: b1(li))
    run("b2_predicate", lambda: b2(li, nat))
    run("b3_grouped_union", lambda: b3(li))
    run("b4_sjoin", lambda: b4(cust, nat))
    run("b5_flagship", b5)
    run("p1_minhash_dedup", lambda: p1(docs))
    run("p2_knn", lambda: p2(emb))
    run("p3_textstats", lambda: p3(docs))
    # floors for the bench VARIANTS (recorded under a separate key so the
    # headline floor set stays comparable across rounds)
    variants = {}
    run("p5_hygiene", lambda: p5(docs), into=variants)
    run("p6_nearest_join", lambda: p6(cust, nat), into=variants)
    run("p7_tfidf_bm25", lambda: p7(docs), into=variants)
    run("p9_semdedup", lambda: p9(emb), into=variants)
    run("p10_curation", lambda: p10(docs), into=variants)
    out = {
        "sf": SF.rstrip("/").rsplit("sf", 1)[-1],
        "queries": queries,
        "queries_reps": queries_reps,
        "floor_reps": REPS,
        "variant_floors": variants,
        "total": round(sum(queries.values()), 3),
        "method": "single-process numpy/pandas, closed-form geometry on the "
                  "derived columns, same hash/text algorithms as the engine "
                  "(shapely unavailable in runtime — see BASELINE.md); "
                  "per-query value is the MEDIAN of floor_reps runs",
    }
    # atomic replace: bench.py may kill this process on timeout, and a
    # truncated BASELINE_MEASURED.json must never shadow the committed one
    path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
