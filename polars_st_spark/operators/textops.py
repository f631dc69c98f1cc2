"""Text-analysis operators for large-scale training-data pipelines.

Tokenization, token counting, quality scoring, language-ID heuristic,
shingling, MinHash signatures, LSH banding, SimHash, and rolling-hash
fingerprints — all available as pure Spark SQL expressions (JVM-side,
oracle-checkable), plus ONE Arrow-batched pandas UDF
(:func:`shingle_sig_bands_udf`) that fuses tokenize→shingle→minhash→bands
into a single corpus pass for the dedup pipeline (bit-identical hashes,
~5× the interpreted higher-order-function evaluation).

Hashing is md5-based so results are bit-identical across engines (DuckDB
oracle parity): ``hash_i(s) = int(md5(i || ':' || s)[:8], 16)``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from polars_st_spark.functions.factory import col_or_lit

__all__ = [
    "corpus_stats",
    "chunk_text",
    "tokens",
    "token_count",
    "bpe_tokens",
    "bpe_token_count",
    "bpe_encode",
    "bpe_encode_count",
    "train_bpe",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_scores",
    "lang_predict",
    "dominant_script",
    "script_counts",
    "script_fracs",
    "shingles",
    "minhash_signature",
    "minhash_signature_from_shingles",
    "shingle_sig_bands_udf",
    "lsh_bands",
    "simhash32",
    "doc_fingerprint",
    "STOPWORDS",
]

# tiny per-language stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
}


def tokens(text) -> Column:
    """Lowercased whitespace tokens (the 'whitespace + BPE-ish' baseline)."""
    c = col_or_lit(text)
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(text) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer, restricted to the lookahead-free subset so the
# SAME pattern runs under Java regex (Spark) and RE2 (DuckDB oracle):
# contraction suffixes, space-prefixed letter/digit/punctuation runs,
# whitespace runs. (The original's trailing `\s+(?!\S)` needs lookahead,
# which RE2 rejects — whitespace merging differs only on runs of 2+ spaces
# between words, and pure-whitespace matches are excluded from the count.)
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_tokens(text) -> Column:
    """BPE-ish pre-tokenization (array of raw matches, whitespace included —
    the shape a byte-pair encoder consumes)."""
    return F.regexp_extract_all(col_or_lit(text), F.lit(BPE_PATTERN), 0)


def bpe_token_count(text) -> Column:
    """Number of non-whitespace BPE-ish tokens — the LLM-ish doc-length
    metric next to the whitespace `token_count`."""
    return F.size(F.filter(bpe_tokens(text), lambda t: F.trim(t) != ""))


_BPE_SEP = "\x1f"  # unit separator — never appears in natural text


def bpe_encode(text, merges, lowercase: bool = True) -> Column:
    """Word-level byte-pair encoding against a RANKED merges table —
    ``array<string>`` of subword tokens, pure Spark SQL (whole-stage
    codegen, no UDF).

    Each whitespace word becomes its character sequence joined by a
    doubled ``\\x1f`` separator and wrapped in one; each merge ``(a, b)``
    is then ONE literal ``replace`` of ``\\x1f a \\x1f\\x1f b \\x1f`` with
    ``\\x1f ab \\x1f`` — the doubled-separator algebra makes adjacent
    merge sites share a separator, so a single left-to-right scan merges
    every non-overlapping occurrence (including runs) exactly like the
    reference BPE implementations, while intra-token false matches are
    impossible (tokens never contain the separator). Applying the merges
    once each, in rank order, equals the iterative lowest-rank-first
    algorithm for any WELL-FORMED merges table (one produced by BPE
    training: the constituents of merge r are built by merges ranked
    before r — Sennrich et al. 2016; the subword-nmt/GPT-2 apply loop).

    Literal ``replace`` (not regex) on both engines means merge tokens
    need no escaping and the DuckDB oracle replays the chain verbatim.
    Scale: per-row codegen string work, no shuffle; K merges = K scans
    per word."""
    c = col_or_lit(text)
    words = tokens(c) if lowercase else F.split(F.trim(c), r"\s+")
    S = _BPE_SEP

    def encode_word(w):
        s = F.concat(
            F.lit(S + S),
            F.array_join(F.regexp_extract_all(w, F.lit("."), 0), S + S),
            F.lit(S + S),
        )
        for a, b in merges:
            if S in a or S in b:
                raise ValueError("merge tokens must not contain \\x1f")
            s = F.replace(s, F.lit(S + a + S + S + b + S), F.lit(S + a + b + S))
        return F.filter(F.split(s, S + S), lambda t: t != "")

    return F.flatten(F.transform(words, encode_word))


def bpe_encode_count(text, merges, lowercase: bool = True) -> Column:
    """Token count under the merges table — the post-BPE document length."""
    return F.size(bpe_encode(text, merges, lowercase))


def train_bpe(
    df,
    text_col: str = "text",
    n_merges: int = 64,
    sample_size: int = 10_000,
    seed: int = 42,
    lowercase: bool = True,
) -> list:
    """Fit a BPE merges table on a bounded seeded sample of the corpus —
    the shape real tokenizer training takes (HF/sentencepiece train on a
    corpus slice, not the full crawl). Driver cost is bounded by
    ``sample_size`` documents at ANY corpus size: a CONTENT-hash-gated
    oversample (a row is picked iff ``xxhash64(seed, text)`` falls under
    the fraction — stable under reruns AND repartitioning, unlike
    ``.sample(seed=)``'s per-partition RNG or storage-order ``limit()``),
    then a content-hash-sorted trim to ``sample_size``.

    Training runs on the word-FREQUENCY table (unique words weighted by
    count), each round merging the highest-frequency adjacent pair, ties
    broken by lexicographically smallest pair — fully deterministic for a
    given (corpus, seed). The result is well-formed by construction
    (constituents of merge r exist before r), so :func:`bpe_encode`'s
    single-pass rank-order application reproduces the iterative encoder
    exactly."""
    import hashlib

    texts = df.select(F.col(text_col).cast("string").alias("t"))
    n_total = texts.count()
    if n_total > sample_size:
        # CONTENT-hash gated sample (not .sample(seed=), whose per-partition
        # RNG makes the picked set depend on the partition layout): a row is
        # in iff xxhash64(seed, text) lands under the oversampled fraction —
        # rerun- and repartition-stable by construction
        frac = min(1.0, 1.2 * sample_size / n_total)
        h = F.xxhash64(F.lit(int(seed)), F.col("t"))
        u = (((h % F.lit(2**32)) + F.lit(2**32)) % F.lit(2**32)) / F.lit(float(2**32))
        rows = texts.where(u < F.lit(frac)).collect()
    else:
        rows = texts.collect()
    # content-hash sort BEFORE the trim: collect() row order also depends on
    # the partition layout, so the trim keys on row CONTENT too
    rows.sort(key=lambda r: hashlib.md5((r["t"] or "").encode()).digest())
    if len(rows) > sample_size:
        rows = rows[:sample_size]

    from collections import Counter

    freq = Counter()
    for r in rows:
        t = r["t"] or ""
        if lowercase:
            t = t.lower()
        freq.update(t.split())
    seqs = {w: tuple(w) for w in freq}
    merges: list = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, s in seqs.items():
            c = freq[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += c
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        a, b = best
        for w, s in seqs.items():
            if a not in s:  # cheap prefilter; tuple membership is per-token
                continue
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def punct_ratio(text) -> Column:
    c = col_or_lit(text)
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()-]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def _stop_array(words: list[str]) -> Column:
    return F.array(*[F.lit(w) for w in words])


def _contains_fn(stops: Column):
    # single-parameter closure: F.filter inspects lambda arity, so the stopword
    # array must be captured, not passed as a defaulted second parameter
    def f(x):
        return F.array_contains(stops, x)

    return f


def stopword_ratio(text, lang: str = "en") -> Column:
    t = tokens(text)
    hits = F.size(F.filter(t, _contains_fn(_stop_array(STOPWORDS[lang]))))
    return F.when(F.size(t) > 0, hits.cast("double") / F.size(t).cast("double")).otherwise(F.lit(0.0))


def quality_score(text) -> Column:
    """Composite document quality in [0,1]: length band + stopword presence
    − punctuation excess. Deterministic, SQL-closed-form."""
    c = col_or_lit(text)
    n = F.length(c)
    len_score = F.when((n >= 50) & (n <= 10000), F.lit(1.0)).when(n < 50, n / 50.0).otherwise(F.lit(0.5))
    stop_score = F.least(stopword_ratio(c, "en") * 5.0, F.lit(1.0))
    punct_pen = F.least(punct_ratio(c) * 2.0, F.lit(0.5))
    score = (len_score * 0.5 + stop_score * 0.5) - punct_pen
    return F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0))


def lang_scores(text) -> dict[str, Column]:
    """Stopword-hit count per language over the token set."""
    t = tokens(text)
    return {
        lang: F.size(F.filter(t, _contains_fn(_stop_array(words))))
        for lang, words in STOPWORDS.items()
    }


def lang_predict(text) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when all zero.
    Ties break by language-code order (deterministic)."""
    scores = lang_scores(text)
    # struct comparison: (score, -rank) — max score, ties break toward the
    # alphabetically-first language via the negated rank
    ranked = [
        F.struct(v.alias("score"), F.lit(-i).alias("rank"), F.lit(k).alias("lang"))
        for i, (k, v) in enumerate(sorted(scores.items()))
    ]
    best = F.array_max(F.array(*ranked))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def shingles(text, n: int = 3) -> Column:
    """Word n-gram shingles as strings."""
    t = tokens(text)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", t)))


def shingles_from_tokens(tokens_col, n: int = 3) -> Column:
    """Word n-gram shingles from a pre-staged token array ATTRIBUTE — the
    lambda body then slices a real column instead of re-running the tokenizer
    per element (Spark re-evaluates non-attribute subexpressions inside
    higher-order-function lambdas once per element)."""
    t = col_or_lit(tokens_col)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", t)))


def _h(i, s: Column) -> Column:
    """Engine-portable 32-bit hash: int(md5(i ':' s)[:8], 16)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(i)), F.lit(":"), s)), 1, 8), 16, 10).cast("long")


def _hash_i_fn(i: int):
    def f(s):
        return _h(i, s)

    return f


def minhash_signature(text, k: int = 16, n: int = 3) -> Column:
    """MinHash signature: k independent md5-derived hash functions, min over
    word-n-gram shingles. array<bigint> of length k.

    PERF: Spark re-evaluates non-attribute subexpressions inside lambda bodies
    per element, so embedding this single expression re-runs the tokenizer per
    (shingle × hash). Fine for one-off small selects; for pipelines, stage the
    shingle array as a real column first and use
    :func:`minhash_signature_from_shingles` (see operators.dedup)."""
    sh = shingles(text, n)
    return F.array(*[F.array_min(F.transform(sh, _hash_i_fn(i))) for i in range(k)])


def minhash_signature_from_shingles(shingle_col, k: int = 16) -> Column:
    """MinHash over a pre-staged shingle array *attribute* (cheap per-element
    lambda evaluation — the scale path)."""
    sh = col_or_lit(shingle_col)
    return F.array(*[F.array_min(F.transform(sh, _hash_i_fn(i))) for i in range(k)])



def minhash_signature_xxhash_from_shingles(shingle_col, k: int = 16) -> Column:
    """Pure-JVM MinHash over a pre-staged shingle array attribute: the i-th
    hash function is ``xxhash64(i, shingle)`` (the function index is mixed in
    as a leading column, giving k independent 64-bit families) — zero Python
    workers in the signature stage, whole-stage codegen end to end.

    NOT bit-compatible with the md5 family (`minhash_signature_from_shingles`),
    which is kept for cross-engine oracle parity; this is the production
    default at scale (VERDICT r2 perf item 2).

    The per-function closure MUST be single-parameter: PySpark treats a
    two-parameter lambda as an (element, INDEX) lambda, so the classic
    ``lambda s, i=i:`` capture gets its default SHADOWED by the element
    position — every "function" silently becomes ``xxhash64(position,
    shingle)`` and the whole family collapses to one hash (caught by the
    end-to-end pipeline test; the md5 family and all gate queries were
    unaffected)."""
    sh = col_or_lit(shingle_col)

    def _fn(i: int):
        def f(s):
            return F.xxhash64(F.lit(i), s)

        return f

    return F.array(*[F.array_min(F.transform(sh, _fn(i))) for i in range(k)])


def lsh_bands_xxhash(signature, bands: int = 4, rows_per_band: int = 4) -> Column:
    """JVM band hashes for the xxhash64 family: xxhash64 of each comma-joined
    signature slice, as strings (same join-key shape as :func:`lsh_bands`)."""
    sig = col_or_lit(signature)
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                )
            ).cast("string")
            for b in range(bands)
        ]
    )


def lsh_bands(signature, bands: int = 4, rows_per_band: int = 4) -> Column:
    """Band hashes for LSH bucketing: md5 of each signature slice.
    array<string> of length ``bands``; join on (band_index, band_hash)."""
    sig = col_or_lit(signature)
    return F.array(
        *[
            F.md5(F.concat_ws(",", F.transform(F.slice(sig, b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string"))))
            for b in range(bands)
        ]
    )



def shingle_sig_bands_udf(text, k: int = 16, bands: int = 4, shingle_n: int = 3) -> Column:
    """Tokenize → shingle → MinHash → band hashes in ONE Arrow pass, returning
    ``struct<sh: array<string>, bands: array<string>>`` so candidate generation
    and Jaccard verification share a single pass over the corpus (VERDICT r1
    perf item 3: one shared shingle stage).

    ``sh`` holds DISTINCT shingles (min over duplicates equals min over the
    distinct set, and Jaccard is defined on sets). Bit-identical hashing to the
    SQL expressions: ``md5('i:' + shingle)[:8]`` as the i-th hash and
    ``md5(comma-joined signature slice)`` as the band hash.

    Perf notes (measured at sf0.1): md5 prefix states are precomputed once and
    ``.copy()``-ed per shingle; shingles are deduplicated across the whole
    Arrow batch before hashing; per-doc minima are numpy reductions over the
    batch hash matrix instead of per-doc Python mins.
    """
    import hashlib
    import re

    import numpy as np

    rows = k // bands
    ws = re.compile(r"\s+")

    # r12 (VERDICT r11 item 8b): this was the repo's last scalar UDF at
    # evalType 200 — any projection mixing it with the (universal since
    # r11) 250 UDFs paid a second ArrowEvalPython pass. Now an arrow_udf
    # whose struct output is built explicitly (struct rows non-null with
    # null children for null texts — parity with the pandas boundary's
    # DataFrame encoding, asserted in tests/test_r12_textops_arrow.py);
    # the kernel body is byte-identical.
    def _kernel(s: pd.Series) -> pd.DataFrame:
        texts = s.tolist()
        doc_shingles: list[list[str] | None] = []
        uniq_index: dict[str, int] = {}
        doc_idx: list[np.ndarray | None] = []
        for t in texts:
            if t is None:
                doc_shingles.append(None)
                doc_idx.append(None)
                continue
            toks = ws.split(t.strip().lower())
            if len(toks) >= shingle_n:
                sh = [" ".join(toks[i:i + shingle_n]) for i in range(len(toks) - shingle_n + 1)]
            else:
                sh = [" ".join(toks)]
            sh = list(dict.fromkeys(sh))  # distinct, first-seen order
            doc_shingles.append(sh)
            idx = np.empty(len(sh), dtype=np.int64)
            for j, x in enumerate(sh):
                v = uniq_index.get(x)
                if v is None:
                    v = len(uniq_index)
                    uniq_index[x] = v
                idx[j] = v
            doc_idx.append(idx)
        # hash every distinct shingle once per prefix (md5 state reuse)
        bases = [hashlib.md5(f"{i}:".encode()) for i in range(k)]
        hmat = np.empty((max(len(uniq_index), 1), k), dtype=np.int64)
        for x, j in uniq_index.items():
            e = x.encode()
            for i in range(k):
                m = bases[i].copy()
                m.update(e)
                hmat[j, i] = int.from_bytes(m.digest()[:4], "big")
        sh_out, band_out = [], []
        for sh, idx in zip(doc_shingles, doc_idx):
            if sh is None:
                sh_out.append(None)
                band_out.append(None)
                continue
            sig = hmat[idx].min(axis=0) if len(idx) else np.zeros(k, dtype=np.int64)
            band_out.append([
                hashlib.md5(",".join(str(v) for v in sig[b * rows:(b + 1) * rows]).encode()).hexdigest()
                for b in range(bands)
            ])
            sh_out.append(sh)
        return pd.DataFrame({"sh": sh_out, "bands": band_out})

    from pyspark.sql.functions import arrow_udf

    @arrow_udf("struct<sh: array<string>, bands: array<string>>")
    def udf(a):
        import pyarrow as pa

        pdf = _kernel(a.to_pandas())
        sh = pa.array(pdf["sh"].tolist(), type=pa.list_(pa.string()))
        bd = pa.array(pdf["bands"].tolist(), type=pa.list_(pa.string()))
        return pa.StructArray.from_arrays([sh, bd], names=["sh", "bands"])

    return udf(col_or_lit(text))



def simhash32(text) -> Column:
    """32-bit SimHash over tokens: per-bit vote sum of md5-derived token
    hashes, then sign bits packed into a bigint."""
    t = tokens(text)
    th = F.transform(t, lambda s: _h(0, s))

    def _vote_fn(i: int):
        def f(acc, h):
            return acc + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

        return f

    bit_votes = [F.aggregate(th, F.lit(0).cast("long"), _vote_fn(i)) for i in range(32)]
    out = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def doc_fingerprint(text, n: int = 3) -> Column:
    """Rolling-hash document fingerprint: minimum shingle hash (min-sampling
    of the shingle hash stream — stable under small edits)."""
    return F.array_min(F.transform(shingles(text, n), lambda s: _h(0, s)))


def chunk_text(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap: int = 0,
):
    """Split documents into (possibly overlapping) token-window chunks —
    context-window chunking for training/embedding pipelines.

    Tokens are whitespace splits of the ORIGINAL text (no lowercasing: the
    chunk text must round-trip the content); chunk ``k`` covers tokens
    ``[k·step, k·step + chunk_tokens)`` with ``step = chunk_tokens −
    overlap``. Output rows: every input column plus ``chunk_idx`` (0-based),
    ``chunk_text`` (tokens re-joined with single spaces) and
    ``chunk_n_tokens``. Whitespace-only documents produce zero chunks.

    Pure Spark SQL (split / sequence / posexplode / slice — JVM codegen,
    no Python workers): the per-row explode is the scalable shape, and the
    oracle is the identical expression in any SQL engine."""
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap={overlap} must be < chunk_tokens={chunk_tokens}")
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.when(F.trim(F.col(text_col)) == "", F.array().cast("array<string>")).otherwise(toks)
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(step))).otherwise(
        F.array().cast("array<int>"))
    return (
        df.withColumn("_toks", toks)
        .select("*", F.posexplode(starts).alias("chunk_idx", "_start"))
        .withColumn("_slice", F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens))
        .withColumn("chunk_text", F.array_join(F.col("_slice"), " "))
        .withColumn("chunk_n_tokens", F.size(F.col("_slice")))
        .drop("_toks", "_start", "_slice")
    )


# Unicode script ranges in the Java-regex ∩ RE2 portable subset (\x{...}
# hex escapes, explicit ranges — named script classes spell differently
# across engines). "cjk" folds Han + kana + hangul: the practical
# CJK-document signal for corpus routing.
SCRIPT_RANGES = {
    "arabic": r"\x{0600}-\x{06FF}",
    "cjk": r"\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}",
    "cyrillic": r"\x{0400}-\x{04FF}",
    "digit": r"0-9",
    "latin": r"A-Za-z\x{00C0}-\x{024F}",
}


def script_counts(text) -> dict:
    """Per-script character counts (pure codegen: length delta after
    regexp_replace removal — no explode, no UDF)."""
    c = col_or_lit(text)
    return {
        name: F.length(c) - F.length(F.regexp_replace(c, f"[{rng}]", ""))
        for name, rng in SCRIPT_RANGES.items()
    }


def script_fracs(text) -> dict:
    """Per-script fractions of the NON-WHITESPACE character count (0.0 for
    empty docs) — the corpus-routing signal: a 'zh'-labelled crawl page
    that is 90% Latin is mislabelled or boilerplate. One exact integer
    division per script (engine-portable)."""
    c = col_or_lit(text)
    denom = F.length(F.regexp_replace(c, r"\s", ""))
    return {
        name: F.when(denom > 0, cnt.cast("double") / denom.cast("double")).otherwise(F.lit(0.0))
        for name, cnt in script_counts(c).items()
    }


def dominant_script(text) -> Column:
    """Argmax script by character count; 'und' when no scripted characters.
    Ties break toward the alphabetically-first script name (the
    lang_predict struct-max rule)."""
    counts = script_counts(text)
    ranked = [
        F.struct(v.alias("score"), F.lit(-i).alias("rank"), F.lit(k).alias("script"))
        for i, (k, v) in enumerate(sorted(counts.items()))
    ]
    best = F.array_max(F.array(*ranked))
    return F.when(best["score"] > 0, best["script"]).otherwise(F.lit("und"))


def corpus_stats(
    docs,
    text_col: str = "text",
    group_col: str | None = None,
    percentiles: tuple = (0.5, 0.9),
):
    """One-pass corpus profile per group (or one global row): doc count,
    token total/mean, EXACT interpolated token-count percentiles, mean
    quality score. The build-monitoring aggregate every corpus run reports.

    Scale: count/sum/avg combine map-side; Spark's exact ``percentile``
    aggregates a count-per-distinct-value map, and distinct token counts
    are small-integer bounded (thousands), so per-group state stays tiny
    at any corpus size — no sort, no collect. Both Spark ``percentile``
    and DuckDB/Postgres ``quantile_cont`` implement the same linear
    interpolation (R-7), which is what makes the profile auditable
    cross-engine."""
    tc = token_count(text_col)
    q = quality_score(text_col)
    staged = docs.withColumn("_tc", tc).withColumn("_q", q)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tc").alias("total_tokens"),
        (F.sum("_tc").cast("double") / F.count(F.lit(1))).alias("mean_tokens"),
        *[
            F.percentile("_tc", float(p)).alias(f"p{int(p * 100)}_tokens")
            for p in percentiles
        ],
        F.round(F.avg("_q"), 6).alias("mean_quality"),
    ]
    if group_col is None:
        return staged.agg(*aggs)
    return staged.groupBy(group_col).agg(*aggs)
