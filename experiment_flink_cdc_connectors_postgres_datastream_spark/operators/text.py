"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token counting, quality scoring, language ID, document
fingerprinting.

All pure column expressions (whole-stage codegen; zero Python in the
hot path, zero shuffles — every operator here is a narrow map over the
documents scan). Generalizes the reference's only text operator, the
word-count Splitter flatMap (StreamingJob.java:105-112).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: whitespace tokenizer (lowercased)
def tokens(col: Column) -> Column:
    return F.split(F.lower(col), r"\s+")


def bigrams(toks: Column) -> Column:
    """Adjacent-token bigram strings from a token array (codegen'd
    transform over an index sequence; empty array below 2 tokens —
    Spark's ``sequence`` would otherwise count DOWN from 0 to -1)."""
    bg = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    return F.when(F.size(toks) >= 2, bg).otherwise(F.array().cast("array<string>"))


def exploded_bigrams(df: DataFrame, text_col: str = "text", keys: list[str] | None = None, out_col: str = "bigram") -> DataFrame:
    """One output row per adjacent-token bigram — value-identical to
    ``explode(bigrams(tokens(text)))`` but built from ``arrays_zip`` of
    adjacent slices with the string concat OUTSIDE any array lambda:
    slice/zip/explode are native codegen'd operators, whereas a
    ``transform()`` lambda evaluates interpreted per element (A/B at
    sf0.1: 0.42 s vs 5.11 s for the corpus bigram count — a 12× win
    that holds at any scale since the lambda cost is per-element).
    Docs below 2 tokens contribute zero-length zips and vanish at the
    explode, matching ``bigrams``'s empty-array contract."""
    keys = list(keys or [])
    toks = tokens(F.col(text_col))
    # alias both slices so arrays_zip emits EXPLICIT struct field
    # names — the positional '0'/'1' names it assigns to anonymous
    # expressions are an undocumented detail that has shifted across
    # Spark releases
    z = F.arrays_zip(
        F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
        F.slice(toks, 2, F.size(toks) - 1).alias("w2"),
    )
    return df.select(*keys, F.explode(z).alias("_p")).select(
        *keys, F.concat_ws(" ", F.col("_p.w1"), F.col("_p.w2")).alias(out_col)
    )


#: BPE-ish pre-token pattern: letter runs, digit runs, single symbols.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny per-language stopword marker sets for the n-gram/stopword
#: language-ID heuristic (deterministic, shared with the SQL oracle).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "et", "les", "des"],
}

EN_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "that"]


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts per document."""
    t = F.col(text_col)
    return df.withColumn("n_ws_tokens", F.size(tokens(t))).withColumn(
        "n_bpe_tokens", F.size(F.regexp_extract_all(t, F.lit(BPE_PATTERN), 0))
    )


def _count_in(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda w: w.isin(words)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, token stats, punctuation and
    stopword ratios, and a linear quality score.

    Deliberately UNROUNDED raw doubles: per-row arithmetic with a fixed
    operation order is bit-reproducible across engines, whereas
    `round(double, n)` is not (Spark rounds the shortest decimal repr,
    DuckDB a 15-significant-digit repr — they disagree at midpoints).
    No transcendental functions for the same reason."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_stop = _count_in(toks, EN_STOPWORDS)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), 0))
    df = (
        df.withColumn("n_chars_calc", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn("n_stop", n_stop)
        .withColumn("stop_ratio", n_stop.cast("double") / n_tok)
        .withColumn("punct_ratio", n_punct.cast("double") / F.length(t))
    )
    score = (
        F.lit(0.5) * F.least(F.col("n_tokens").cast("double") / F.lit(64.0), F.lit(1.0))
        + F.lit(0.3) * F.least(F.col("stop_ratio") * F.lit(10.0), F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.col("punct_ratio") * F.lit(5.0), F.lit(1.0)))
    )
    return df.withColumn("quality_score", score)


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language marker-hit counts + deterministic argmax prediction
    (fixed en>de>es>fr tie order, mirrored exactly in the SQL oracle)."""
    toks = tokens(F.col(text_col))
    for lang, markers in LANG_MARKERS.items():
        df = df.withColumn(f"s_{lang}", _count_in(toks, markers))
    s = {lang: F.col(f"s_{lang}") for lang in LANG_MARKERS}
    pred = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), F.lit("en"))
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), F.lit("de"))
        .when(s["es"] >= s["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return df.withColumn("pred_lang", pred)


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text
    (stable across engines; md5 chosen over xxhash64 because the
    DuckDB oracle has it too)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn(out_col, F.md5(F.trim(norm)))


#: Gopher-rule stopword markers (Rae et al. 2021, "Scaling Language
#: Models: ... Gopher" §A1.1 — the published quality-filter word set).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: Gopher rule thresholds (§A1.1), shared by the keep conjunction in
#: :func:`gopher_quality` and the funnel predicates in
#: queries/pipeline_ops.py — one source of truth on the Spark side
#: (the SQL oracles repeat the literals by design: oracle text must
#: be self-contained).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_TOP1_FRAC = 0.2


def gopher_quality(
    df: DataFrame, text_col: str = "text", min_stop_hits: int = 2
) -> DataFrame:
    """Gopher-style per-document quality-rule battery (Rae et al. 2021
    §A1.1, public): word-count bounds, mean word length, symbol-to-word
    ratio (# and ellipsis), alphabetic-word fraction, stopword presence,
    and mode-token concentration, plus the conjunction `keep_gopher`.

    All pure column expressions over one tokenization — zero Python,
    zero shuffles, a narrow codegen'd map over the documents scan (the
    100-TB shape: this runs at scan speed next to any filter).
    Ratios are UNROUNDED doubles: int/int division with a fixed operand
    order is bit-reproducible across engines (see quality_features).
    The mode-token count is a per-row sorted run-length fold (O(n log n)
    within a row — never a shuffle).
    """
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda a, w: a + F.length(w))
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    )
    # mode-token count as a sorted run-length fold: O(n log n) per row
    # vs the naive O(distinct·n) transform-over-distinct (A/B at sf0.1:
    # 0.38 s vs 1.62 s — higher-order lambdas evaluate interpreted, so
    # the element count is the cost driver)
    run = lambda acc, w: F.when(w == acc.cur, acc.run + F.lit(1)).otherwise(F.lit(1))  # noqa: E731
    top1_cnt = F.aggregate(
        F.array_sort(toks),
        F.struct(F.lit("").alias("cur"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, w: F.struct(
            w.alias("cur"),
            run(acc, w).alias("run"),
            F.greatest(acc.best, run(acc, w)).alias("best"),
        ),
        lambda acc: acc.best,
    )
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), 0))
    nd = n.cast("double")
    df = (
        df.withColumn("n_words", n)
        .withColumn("mean_word_len", sum_len.cast("double") / nd)
        .withColumn("alpha_frac", n_alpha.cast("double") / nd)
        .withColumn("stop_hits", stop_hits)
        .withColumn("top1_frac", top1_cnt.cast("double") / nd)
        .withColumn(
            "symbol_ratio", (n_hash + n_ellipsis).cast("double") / nd
        )
    )
    keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
        & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC)
        & (F.col("stop_hits") >= min_stop_hits)
        & (F.col("top1_frac") <= GOPHER_MAX_TOP1_FRAC)
    )
    return df.withColumn("keep_gopher", keep)


def repetition_features(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Repeated-n-gram ratio per document — the repetition quality
    signal (a high ratio marks boilerplate/degenerate text): 1 -
    distinct_ngrams/total_ngrams, 0.0 for docs shorter than n tokens.
    Pure column expressions, zero shuffles."""
    toks = tokens(F.col(text_col))
    # sequence(1, 0) would generate a DESCENDING range: clamp to 1 and
    # blank out short docs below
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])  # noqa: E731
    grams = F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    ratio = F.when(
        total > 0, F.lit(1.0) - distinct.cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))
    return df.withColumn("n_ngrams", total).withColumn(
        "n_distinct_ngrams", distinct
    ).withColumn("repetition_ratio", F.round(ratio, 6))


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Canonical text cleanup for dedup/fingerprint pipelines:
    lowercase, strip non-printable-ASCII, collapse whitespace runs,
    trim. Zero shuffles; regexes restricted to a dialect both Java
    (Spark) and RE2 (the DuckDB oracle) interpret identically."""
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, r"[^\x20-\x7e]", " ")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return df.withColumn(out_col, t)


def build_vocab(df: DataFrame, text_col: str = "text", size: int = 100) -> DataFrame:
    """Corpus vocabulary: the ``size`` most frequent whitespace tokens,
    assigned dense ids 1..size by (count desc, term asc) — id 0 is
    reserved for OOV.

    Two-phase top-k: one grouped count (map-side partials), then
    ``ORDER BY … LIMIT size`` — Catalyst plans TakeOrderedAndProject,
    a per-partition top-k merged on the driver, so at a 100-TB corpus
    with billions of distinct terms NO task ever sorts the full term
    table (the previous global unpartitioned Window did exactly that).
    The ranking window that assigns dense ids runs on the ≤ ``size``
    survivors only."""
    from pyspark.sql.window import Window

    term_counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    topk = term_counts.orderBy(F.desc("cnt"), F.asc("term")).limit(size)
    # (cnt desc, term asc) is a total order (term is unique), so the
    # limit + re-rank is equivalent to rank-then-filter.
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return topk.select("term", "cnt", F.row_number().over(w).alias("token_id"))


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode each document as its token-id sequence (OOV → 0),
    preserving token order — the text→ints step in front of any
    sequence model. posexplode keeps positions; the vocab join is
    broadcast (vocab is ~1e5 rows at most by construction); the
    re-assembly sorts (pos, id) structs inside one aggregation."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    ).filter(F.col("term") != "")
    encoded = toks.join(F.broadcast(vocab.select("term", "token_id")), "term", "left")
    return (
        encoded.groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("pos"), F.coalesce("token_id", F.lit(0)).alias("tid"))
                    )
                ),
                lambda s: s.getField("tid"),
            ).alias("token_ids")
        )
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text", top_k: int = 20) -> DataFrame:
    """Adjacent-symbol pair statistics at the character stage of BPE
    tokenizer training: the pair with the highest corpus-weighted
    count is the next merge a BPE trainer would perform.

    The classic scale trick makes this corpus-size-independent after
    one pass: reduce the corpus to the DISTINCT-word frequency table
    first (map-side-combined count, one shuffle on word), then expand
    each distinct word into its len-1 adjacent character pairs — a
    table bounded by vocabulary size, not corpus size — and weight
    pair counts by word frequency. Everything is codegen'd column
    expressions; top-k is TakeOrderedAndProject (no global sort).

    Output: pair, pair_count (occurrences across the corpus),
    n_words (distinct words containing the pair), top-k by count with
    a deterministic pair tie-break."""
    words = df.select(F.explode(tokens(F.col(text_col))).alias("word")).filter(
        F.length("word") > 0
    )
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.filter(F.length("word") >= 2).select(
        "word",
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").alias("pair_count"),
            F.count_distinct("word").alias("n_words"),
        )
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(top_k)
    )


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> list[tuple[int, str, str, int]]:
    """BPE tokenizer training: learn the first ``n_merges`` merge rules
    (Sennrich et al., "Neural Machine Translation of Rare Words with
    Subword Units", ACL 2016). Returns [(rank, left, right,
    pair_count)] in merge order.

    Spark shape — the same iterative-algorithm discipline as
    connected components (bounded driver work per round, lineage
    truncated per round):

    - the corpus collapses ONCE to the distinct-word frequency table
      (one shuffle; every later round is vocabulary-bounded, flat in
      corpus size — the classic BPE trainer trick);
    - per round: adjacent symbol pairs explode from the token arrays
      (codegen'd transform/sequence), pair counts are map-side-combined
      weighted sums, and ONLY the argmax row (1 row, deterministic
      count-desc/pair-asc tie-break) is collected to the driver;
    - the winning pair is folded into every word's token array by a
      higher-order ``aggregate`` (greedy left-to-right, exactly the
      reference algorithm's scan), a narrow zero-shuffle map;
    - ``localCheckpoint`` per round keeps the plan from growing with
      the merge count.
    """
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split("word", "").alias("toks"), "freq")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pair_struct = F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at("toks", i).alias("l"),
                    F.element_at("toks", i + 1).alias("r"),
                ),
            )
        )
        top = (
            words.filter(F.size("toks") >= 2)
            .select("freq", pair_struct.alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        merged = left + right
        fold = F.aggregate(
            F.col("toks"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.select(fold.alias("toks"), "freq").localCheckpoint(eager=False)
    return merges
