"""Text analysis over a documents/pages table — all JVM-side column math.

Language-ID (stopword-hit heuristic), quality scoring, token counting, and
document fingerprinting. No Python UDFs: tokenization, n-grams and hashing
use built-in functions (split / transform / xxhash64 / aggregate), so the
whole stage stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "fr": ["le", "la", "les", "de", "des", "et", "en", "un", "une", "est"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
    "de": ["der", "die", "das", "und", "von", "zu", "mit", "ist", "den", "ein"],
    "zh": ["de", "shi", "zai", "le", "he", "wo", "you", "ren", "zhe", "ge"],
}


# the Java/RE2 \s set — btrim with this set strips ALL edge whitespace,
# where plain trim() strips only ' ' and leaves leading/trailing
# tabs/newlines to produce phantom empty tokens (split keeps leading
# empties, and Spark's limit=-1 keeps trailing ones too: real crawl
# text ends in '\n', so every such doc would count one token too many)
_WS_CHARS = " \t\n\x0b\x0c\r"


def tokens(text_col) -> Column:
    """Whitespace tokenization; empty/whitespace-only text -> empty array."""
    t = F.btrim(text_col, F.lit(_WS_CHARS))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text_col) -> Column:
    return F.size(tokens(text_col))


def add_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_chars, avg token length."""
    toks = tokens(F.col(text_col))
    return df.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_chars_actual", F.length(F.col(text_col))
    ).withColumn(
        "avg_token_len",
        F.when(
            F.size(toks) > 0,
            F.aggregate(toks, F.lit(0.0), lambda acc, x: acc + F.length(x))
            / F.size(toks),
        ).otherwise(F.lit(0.0)),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features + composite score in [0, 1].

    Features: token count band, punctuation ratio, stopword(en) ratio,
    alpha ratio. The composite is a fixed linear blend — the point is the
    plumbing (a 100TB-scannable, codegen-only scorer), not the weights.
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    sw_hits = F.size(F.array_intersect(toks, sw))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tok > 0, sw_hits / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.1) * F.least(sw_ratio * 5, F.lit(1.0))
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("stopword_ratio", sw_ratio)
        .withColumn("quality", score)
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language guess (deterministic tie-break by lang code)."""
    toks = tokens(F.col(text_col))
    hits = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits.append(F.struct(F.size(F.array_intersect(toks, arr)).alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*hits))
    return df.withColumn(
        "lang_pred", F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def word_shingles(text_col, k: int = 3) -> Column:
    """Word k-gram shingles as an array of strings (built-ins only).

    Built by folding ``zip_with`` over k-1 shifted views of the token
    array (k-1 linear passes, one string concat per gram) instead of a
    ``transform`` whose lambda sliced a fresh k-element sub-array per gram
    (O(n*k) with a per-gram array allocation — measured 5.7x slower at
    sf0.1). ``zip_with`` pads the shorter shifted view with nulls, which
    ``concat_ws`` skips, so the trailing partial grams are well-formed and
    the closing slice drops them; output is byte-identical to the old
    form (verified element-wise over the corpus)."""
    toks = tokens(text_col)
    n = F.size(toks)
    arr = toks
    for j in range(1, k):
        arr = F.zip_with(
            arr,
            F.slice(toks, j + 1, F.greatest(n - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.slice(arr, 1, F.greatest(n - (k - 1), F.lit(0)))
    )


def shingle_hashes(text_col, k: int = 3) -> Column:
    """Word k-gram shingle hashes WITHOUT building shingle strings.

    Tokens are hashed once (xxhash64, full 64 bits), then each shingle hash
    is an order-sensitive combination of the k consecutive token hashes via
    per-position bit rotations + XOR — one pass over the token array
    instead of per-shingle slice+concat string building (the dominant cost
    of the string path at scale). Bitwise rotate/XOR never overflows under
    ANSI long arithmetic, keeps the full 64-bit entropy of each token hash
    (distinct shingles collide with ~2^-64 probability, comparable to
    xxhash64 over shingle strings), and distinct rotations make the
    combination order-sensitive. Downstream exact-Jaccard verification
    operates on sets of these hashes, so reported similarity values are
    exact over the hashed shingle space.
    """
    rots = [13, 29, 41, 7, 23, 53, 3, 47]  # per-position rotation, k <= 8
    toks = tokens(text_col)
    ht = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(ht)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1)))

    def comb(i):
        s = None
        for j in range(k):
            h = F.element_at(ht, i + F.lit(j + 1))
            r = rots[j]
            rot = F.shiftleft(h, r).bitwiseOR(F.shiftrightunsigned(h, 64 - r))
            s = rot if s is None else s.bitwiseXOR(rot)
        return s

    return F.when(n < k, F.array().cast("array<bigint>")).otherwise(
        F.transform(idx, comb)
    )


def fingerprint(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Document fingerprints: full-text hash + min-shingle-hash (winnowing-
    style representative) — both 64-bit, built-in xxhash64."""
    sh = word_shingles(F.col(text_col), k)
    return df.withColumn("text_hash", F.xxhash64(F.col(text_col))).withColumn(
        "min_shingle_hash",
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s))),
    )


def fingerprint_md5(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """md5 variant of :func:`fingerprint` — same plumbing, but the hash is
    reproducible in ANSI SQL (DuckDB ``md5``), so this one carries a full
    value-level oracle. Hex-string min = lexicographic min (both engines
    emit lowercase hex)."""
    sh = word_shingles(F.col(text_col), k)
    return df.withColumn("text_md5", F.md5(F.col(text_col))).withColumn(
        "min_shingle_md5",
        F.array_min(F.transform(sh, lambda s: F.md5(s))),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style per-document repetition filters (Rae et al. 2021 §A1.1),
    adapted to word n-gram space.

    Emits per document:
      - ``n_tokens``
      - ``dup_token_frac``      (n_tokens - n_distinct_tokens) / n_tokens
      - ``dup_3gram_frac``      (n_3grams - n_distinct_3grams) / n_3grams
      - ``top_2gram_char_frac`` chars covered by the most frequent word
        2-gram: count * len(gram incl. separator) / len(text); ties broken
        by the lexicographically smallest gram.

    Scale notes: the two dup fractions are pure per-row array math (no
    shuffle at all). The 2-gram mode uses explode -> two-level hash
    aggregate keyed by (doc, gram) then doc — the scalable
    mode-of-ngram shape; a per-row nested-loop count would be O(len²)
    per document and blow up on book-length docs. Both aggregations get
    map-side partial combine; nothing leaves whole-stage codegen.
    """
    toks = tokens(F.col(text_col))
    g3 = word_shingles(F.col(text_col), 3)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("double").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.when(
            F.size(toks) > 0,
            (F.size(toks) - F.size(F.array_distinct(toks)))
            / F.size(toks).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
        F.when(
            F.size(g3) > 0,
            (F.size(g3) - F.size(F.array_distinct(g3))) / F.size(g3).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
    )
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), 2)).alias("gram"),
    )
    # min of (-count, gram) == max count with smallest-gram tie-break,
    # computed as a plain two-stage hash aggregate (no window function).
    top = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("gram").alias("g"))).alias("t"))
        .select(
            "doc_id",
            (-F.col("t.nc")).alias("top_c"),
            F.length(F.col("t.g")).alias("top_len"),
        )
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_token_frac",
        "dup_3gram_frac",
        F.when(
            F.col("top_c").isNotNull() & (F.col("n_chars") > 0),
            F.col("top_c") * F.col("top_len") / F.col("n_chars"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_2gram_char_frac"),
    )


def corpus_dup_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-passage detection (RefinedWeb-style): for
    each document, the fraction of its distinct word ``k``-gram shingles
    that also occur in at least ``min_docs - 1`` OTHER documents.

    Shape at 100 TB: per-doc distinct shingles (row-local), one shuffle
    keyed by shingle string for the document-frequency count (map-side
    partial combine absorbs hot boilerplate shingles), one shuffle back to
    doc_id for the per-doc fraction. Returns
    (doc_id, n_shingles, n_shared, shared_frac) for every input document —
    documents shorter than ``k`` tokens get (0, 0, 0.0).
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("s"),
    )
    # shingles are distinct per doc, so count(*) per shingle == doc frequency
    freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_"))
    per_doc = (
        sh.join(freq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df_") >= min_docs).cast("long")).alias("n_shared"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.when(
                F.col("n_shingles") > 0,
                F.col("n_shared") / F.col("n_shingles").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("shared_frac"),
        )
    )


def split_assignment(id_col: str = "doc_id"):
    """Column expr: deterministic md5 train/val/test split of an id.

    First hex digit of md5(id-as-string): '0'-'b' train (12/16),
    'c'-'d' val (2/16), 'e'-'f' test (2/16) — stable under re-runs,
    resharding and cluster size."""
    c = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return (
        F.when(c.isin(*"0123456789ab"), F.lit("train"))
        .when(c.isin("c", "d"), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def contamination_check(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix: int | None = None,
) -> DataFrame:
    """Train/val/test contamination: duplicate texts that span split
    boundaries — the eval-hygiene gate a training pipeline runs before
    trusting held-out metrics (leaked eval docs inflate them).

    Documents are keyed by ``md5(text)`` (or ``md5(substring(text, 1,
    prefix))`` when ``prefix`` is set — a deterministic stand-in for the
    normalize-then-hash canonicalization real pipelines apply first) and
    assigned their split by the same md5-digit rule as ``hash_split``.
    Returns one row per contaminated group: ``(group_hash, n_docs,
    n_splits, splits, min_doc_id)`` with ``splits`` a sorted csv.

    Scale: pure codegen — md5 + one hash aggregate keyed by the text
    hash (map-side partial collect_set over ≤3 split labels), then a
    post-agg filter. Same shuffle shape as exact dedup; no joins.
    """
    t = F.col(text_col) if prefix is None else F.substring(F.col(text_col), 1, prefix)
    d = df.select(
        F.md5(t).alias("group_hash"),
        split_assignment(id_col).alias("split"),
        F.col(id_col),
    )
    return (
        d.groupBy("group_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("split").alias("n_splits"),
            F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
            F.min(id_col).alias("min_doc_id"),
        )
        .filter(F.col("n_splits") > 1)
    )


def hash_split(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic md5 train/val/test split with per-split stats.

    The split key is the first hex digit of md5(id-as-string): '0'-'b'
    train (12/16), 'c'-'d' val (2/16), 'e'-'f' test (2/16) — stable under
    re-runs, resharding and cluster size, which is the property a training
    pipeline needs (a random() split is neither reproducible nor
    consistent across retries). Pure codegen: md5 + substring + one
    hash aggregate.
    """
    return (
        df.select(
            split_assignment(id_col).alias("split"),
            token_count(F.col(text_col)).alias("nt"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens_total"),
        )
    )


# GPT-2-style pre-tokenizer pattern, lookahead-free so the SAME pattern
# runs under Java regex (Spark codegen) and RE2 (DuckDB oracle): an
# optional leading space followed by a letter run, digit run, or
# punctuation run. The full GPT-2 pattern's contraction alternatives and
# trailing-space lookahead are dropped — they need backtracking, which
# RE2 rejects — but the token-count statistics this feeds (fertility,
# tokens/doc budgeting) are insensitive to those merges.
BPE_PRETOKEN_PATTERN = r" ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(text_col) -> Column:
    """Subword-style pre-tokenization as a pure codegen Column (no UDF)."""
    return F.regexp_extract_all(text_col, F.lit(BPE_PRETOKEN_PATTERN), 0)


def bpe_token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token budget under BOTH tokenizations a training
    pipeline quotes: whitespace words and a BPE-ish pre-tokenizer
    (GPT-2-style letter/digit/punct runs), plus fertility =
    bpe/whitespace — the ratio used to convert corpus word counts into
    model token budgets. Row-local whole-stage codegen: one projection,
    no shuffle, scales linearly at 100 TB."""
    ws = token_count(F.col(text_col))
    bp = F.size(bpe_tokens(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("n_ws_tokens"),
        bp.alias("n_bpe_tokens"),
        F.when(ws > 0, bp.cast("double") / ws).otherwise(F.lit(0.0)).alias("fertility"),
    )


def token_frequency(df: DataFrame, text_col: str = "text", top_n: int = 100) -> DataFrame:
    """Corpus-level token frequency, top ``top_n`` by (count desc, token asc).

    Explode -> hash aggregate (map-side combine collapses each partition to
    its distinct vocabulary before the shuffle) -> distributed top-k
    (TakeOrderedAndProject — each partition keeps only top_n candidates, the
    driver merges top_n * n_partitions rows, never the full vocabulary)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(top_n)
    )


def host_stats(pages: DataFrame) -> DataFrame:
    """Per-host aggregation over a crawl ``pages`` table (url, text, lang):
    page count, distinct languages, total extracted tokens. The host-level
    rollup every crawl pipeline needs for domain blocklists and sampling
    weights. regexp_extract + one hash aggregate; lang cardinality is tiny
    so count(distinct) is a cheap two-phase expand."""
    host = F.regexp_extract(F.col("url"), r"^https?://([^/]+)/", 1)
    return (
        pages.select(
            host.alias("host"),
            F.col("lang"),
            token_count(F.col("text")).alias("nt"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("nt").alias("n_tokens_total"),
        )
    )


def corpus_length_quantiles(
    df: DataFrame,
    by_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus length distribution report: doc count plus exact
    token-count quantiles (p10/p50/p90/p99) and char-length quantiles
    (p50/p99) — the distribution sheet every curation run prints before
    choosing truncation and packing lengths.

    Uses Spark's EXACT ``percentile`` aggregate (linear interpolation,
    value-identical to DuckDB ``quantile_cont``, so the driver oracle
    pins real values, not an approx sketch). Exact percentile sorts
    per-group — at 100 TB swap in ``approx_percentile`` (t-digest,
    mergeable, one pass) for the same report shape; at report
    granularity (groups = languages/sources) the exact sort is one
    shuffle keyed by a low-cardinality column, with per-group data
    parallelized by the range exchange inside the aggregate.
    """
    base = df.select(
        F.col(by_col).alias("grp"),
        token_count(F.col(text_col)).cast("double").alias("nt"),
        F.length(F.col(text_col)).cast("double").alias("nc"),
    )
    q = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("percentile(nt, array(0.1, 0.5, 0.9, 0.99))").alias("tq"),
        F.expr("percentile(nc, array(0.5, 0.99))").alias("cq"),
    )
    return q.select(
        F.col("grp").alias(by_col),
        "n_docs",
        F.round(F.col("tq")[0], 6).alias("tokens_p10"),
        F.round(F.col("tq")[1], 6).alias("tokens_p50"),
        F.round(F.col("tq")[2], 6).alias("tokens_p90"),
        F.round(F.col("tq")[3], 6).alias("tokens_p99"),
        F.round(F.col("cq")[0], 6).alias("chars_p50"),
        F.round(F.col("cq")[1], 6).alias("chars_p99"),
    )


def simhash32_md5(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash with md5-derived bits, emitted as a '0'/'1' string.

    Bit b of a token = high bit of hex digit b of md5(token) (1 iff the
    digit is in 8..f) — 32 independent bits per token, all built-in column
    math, reproducible bit-for-bit in DuckDB for the oracle. The production
    simhash (operators/dedup.simhash) uses xxhash64 over 64 bits; this md5
    twin exists to put the *algorithm* (per-position bit votes -> sign
    vector) under a value-level oracle.

    Returns (id, simhash_bits); tokenless documents get the all-zero
    signature.
    """
    high = [c for c in "89abcdef"]
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    h = toks.withColumn("th", F.md5("tok"))
    votes = [
        F.sum(
            F.when(F.substring("th", b + 1, 1).isin(high), 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(32)
    ]
    agg = h.groupBy("id").agg(*votes)
    sig = F.concat(
        *[F.when(F.col(f"v{b}") > 0, F.lit("1")).otherwise(F.lit("0")) for b in range(32)]
    )
    signed = agg.select("id", sig.alias("simhash_bits"))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(signed, "id", "left")
        .select("id", F.coalesce("simhash_bits", F.lit("0" * 32)).alias("simhash_bits"))
    )


# PII patterns chosen to parse identically under Java regex (Spark codegen)
# and RE2 (DuckDB): character classes, bounded quantifiers, no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"[0-9]{7,}"


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails and long digit runs (>= 7 digits — phone/account
    numbers) from a text column; returns ``(id, n_emails, n_phones,
    text_redacted)``. Emails are replaced first so their digit parts are
    not double-counted as phones.

    The standard pre-training scrub pass. Pure whole-stage codegen —
    ``regexp_extract_all`` for the counts, two ``regexp_replace`` for the
    rewrite — so redaction rides inside the scan stage of whatever
    pipeline consumes the text (zero extra passes at 100 TB); the regexes
    use only syntax with identical semantics in Java regex and RE2,
    keeping the DuckDB oracle value-exact.
    """
    t = F.col(text_col)
    emails_gone = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0)).alias("n_emails"),
        F.size(
            F.regexp_extract_all(emails_gone, F.lit(PII_PHONE_RE), 0)
        ).alias("n_phones"),
        F.regexp_replace(emails_gone, PII_PHONE_RE, "<PHONE>").alias(
            "text_redacted"
        ),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    ``score = tf * (ln((N + 1) / (df + 1)) + 1)`` (sklearn's smoothed
    idf), ties broken lexicographically. Returns
    ``(id, term, tf, score, rank)``.

    The keyword-extraction pass of a curation pipeline (near-dup
    explanations, topic sampling sheets). Plan shape: one explode +
    (doc, term) count, a term-keyed df aggregation joined back (term
    vocabulary << corpus, and only distinct (doc,term) pairs flow into
    it), the N scalar via a broadcast crossJoin, and a per-doc window
    top-k whose sort is bounded by the doc's distinct-term count. All
    codegen; ln() replays exactly in DuckDB.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "id",
            "term",
            "tf",
            (
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "score", "rank")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval (Robertson-Sparck Jones probabilistic ranking):
    score every document against a fixed bag of ``query_terms`` and
    return the top ``k``. Per matching term,

        idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)          (Lucene form)
        w(t, d) = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len_d / avg_len))

    Returns ``(id, matched_terms, score, rank)``; ties broken by doc id.
    The query-side index of a corpus-curation pipeline (topic probes,
    eval-set retrieval, "find documents about X" sampling sheets).

    Scale shape: the corpus is tokenized into per-document term counts
    exactly TWICE — once for the (N, avg_dl) scalar aggregate and once
    for the scoring chain — never once per downstream consumer (Spark
    re-executes a shared subplan per DAG branch, so the naive
    tf/df/doclen join graph pays 4 full-corpus explodes; this form keeps
    it at 2 by deriving doc length and per-term doc frequency from the
    SAME (doc, term) frame via window aggregates instead of re-joined
    groupBys). The window partitions are (id) then (term): the id
    window runs on per-doc distinct-term rows and the term window only
    on rows matching the query's term list. The scalar table is
    broadcast; the final top-k is one row_number over matching docs.
    No UDFs anywhere; ln() replays exactly in DuckDB.
    """
    from pyspark.sql import Window

    qt = [t for t in query_terms]
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tfall = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # doc length attached by window (no self-join => no subtree re-run)
    with_dl = tfall.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("id"))
    )
    n_avg = (
        tfall.groupBy("id")
        .agg(F.sum("tf").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avg_dl"))
    )
    tfq = with_dl.filter(F.col("term").isin(qt)).withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    scored = (
        tfq.crossJoin(F.broadcast(n_avg))
        .select(
            "id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avg_dl"))
                )
            ).alias("w"),
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("matched_terms"), F.sum("w").alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "matched_terms", "score", "rank")
    )


def pmi_pairs(
    df: DataFrame,
    min_pair_docs: int = 5,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` token pairs by document-level pointwise mutual
    information (Church & Hanks 1990):

        pmi(a, b) = ln(c_ab * N / (c_a * c_b))

    over DISTINCT-per-document occurrences: c_a = #docs containing a,
    c_ab = #docs containing both, N = #docs. Only pairs co-occurring in
    >= ``min_pair_docs`` documents are scored (the classic low-count PMI
    explosion guard). Returns ``(a, b, pair_docs, pmi, rank)`` with
    a < b, ties broken lexicographically.

    Collocation mining for corpus analysis (multi-word expressions,
    boilerplate phrase discovery). Scale shape: distinct (doc, term) is
    one explode + aggregate; the pair join is a per-document self-join
    whose fan-out is (distinct terms per doc)^2 / 2 — for web documents
    after dedup that is bounded by document length, not corpus size, and
    the groupBy that follows combines map-side. Doc frequencies join
    broadcast (vocabulary << corpus). Pure codegen; ln() replays exactly
    in DuckDB.
    """
    from pyspark.sql import Window

    dt = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).distinct()
    cterm = dt.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    pairs = (
        dt.select("id", F.col("term").alias("a"))
        .join(dt.select("id", F.col("term").alias("b")), "id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("pair_docs"))
        .filter(F.col("pair_docs") >= min_pair_docs)
    )
    scored = (
        pairs.join(
            F.broadcast(cterm.withColumnRenamed("term", "a").withColumnRenamed("c", "ca")),
            "a",
        )
        .join(
            F.broadcast(cterm.withColumnRenamed("term", "b").withColumnRenamed("c", "cb")),
            "b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            "pair_docs",
            F.log(
                F.col("pair_docs").cast("double")
                * F.col("n_docs")
                / (F.col("ca") * F.col("cb"))
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("a"), F.asc("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("a", "b", "pair_docs", "pmi", "rank")
    )


def unigram_kl(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document KL divergence from the corpus unigram distribution:

        kl(d) = sum_t p_d(t) * ln(p_d(t) / q(t))

    with p_d the document's token distribution and q the whole-corpus
    token distribution. Returns ``(id, n_tokens, kl)``; empty documents
    get kl = NULL. Every document term is by definition in the corpus
    distribution, so no smoothing is needed and the sum is exact.

    A standard distributional quality/outlier signal for corpus curation
    (gibberish and template pages sit far from the corpus distribution;
    Wenzek et al. 2020 use the same construction with an external LM).
    Scale shape: one explode + (doc, term) count, a broadcast join
    against the term-marginal table (vocabulary << corpus), one per-doc
    aggregation. Pure codegen; ln() replays exactly in DuckDB.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doclen = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    marg = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = marg.agg(F.sum("ct").alias("n_total"))
    kl = (
        tf.join(F.broadcast(marg), "term")
        .join(doclen, "id")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            (
                (F.col("tf") / F.col("dl"))
                * F.log(
                    (F.col("tf") / F.col("dl"))
                    / (F.col("ct") / F.col("n_total"))
                )
            ).alias("term_kl"),
        )
        .groupBy("id")
        .agg(F.sum("term_kl").alias("kl"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(doclen, "id", "left")
        .join(kl, "id", "left")
        .select("id", F.coalesce("dl", F.lit(0)).alias("n_tokens"), "kl")
    )


def doc_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document cross-entropy and perplexity under the corpus unigram
    MLE language model:

        ce(d) = -(1/|d|) * sum_t tf_d(t) * ln(ct(t) / n_total)
        ppl(d) = exp(ce(d))

    The classic perplexity-filter signal of LLM data curation (CCNet /
    Wenzek et al. 2020 rank documents by LM perplexity; the corpus-MLE
    unigram model is its self-contained form — no external model, every
    doc term has corpus support so ce is finite). High ppl = rare-token
    outliers (gibberish, codes); LOW ppl = repetitive boilerplate. Empty
    documents get NULLs. Returns ``(id, n_tokens, cross_entropy, ppl)``.

    Same two-exchange shape as :func:`unigram_kl`: one (doc, term)
    count, a broadcast join against the term marginal, one per-doc sum.
    Pure codegen; ln()/exp() replay exactly in DuckDB.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    marg = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = marg.agg(F.sum("ct").alias("n_total"))
    ce = (
        tf.join(F.broadcast(marg), "term")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            "tf",
            (-F.col("tf") * F.log(F.col("ct") / F.col("n_total"))).alias("nll"),
        )
        .groupBy("id")
        .agg(
            F.sum("tf").alias("dl"),
            (F.sum("nll") / F.sum("tf")).alias("cross_entropy"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(ce, "id", "left")
        .select(
            "id",
            F.coalesce("dl", F.lit(0)).alias("n_tokens"),
            "cross_entropy",
            F.exp("cross_entropy").alias("ppl"),
        )
    )


def dsir_log_ratio(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance-resampling weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): per
    document, the log-likelihood ratio between a TARGET unigram LM and
    the corpus unigram LM::

        log_ratio(d)    = sum_t tf_d(t) * (ln p(t) - ln q(t))
        avg_log_ratio(d)= log_ratio(d) / |d|

    ``q`` is the corpus MLE (every doc term has corpus support, so ln q
    is finite); ``p`` is the target-subset LM with add-one smoothing over
    the CORPUS vocabulary, ``p(t) = (ct_target(t)+1) / (n_target + V)``,
    so target-absent terms get finite mass instead of -inf. Documents
    with high ``avg_log_ratio`` look like the target domain; sampling
    proportional to ``exp(log_ratio)`` is the DSIR recipe. ``target`` is
    a one-column DataFrame of target doc ids (its first column is used).
    Empty documents get NULL ratios. Returns
    ``(id, n_tokens, log_ratio, avg_log_ratio)``.

    Scale: one (doc, term) count over the corpus; the term marginal and
    the target marginal are vocabulary-sized broadcast sides; the three
    scalars (n_target, n_corpus, V) ride one broadcast row. Same
    two-exchange shape as :func:`unigram_kl`; pure codegen, ln() replays
    exactly in DuckDB.
    """
    tgt = target.select(F.col(target.columns[0]).alias("id")).distinct()
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    marg_q = tf.groupBy("term").agg(F.sum("tf").alias("ct_q"))
    marg_p = (
        tf.join(tgt, "id", "left_semi")
        .groupBy("term")
        .agg(F.sum("tf").alias("ct_p"))
    )
    scal = (
        marg_q.join(marg_p, "term", "left")
        .agg(
            F.sum("ct_q").alias("n_q"),
            F.coalesce(F.sum("ct_p"), F.lit(0)).alias("n_p"),
            F.count(F.lit(1)).alias("v"),
        )
    )
    term_lr = (
        marg_q.join(marg_p, "term", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "term",
            (
                F.log(
                    (F.coalesce(F.col("ct_p"), F.lit(0)) + F.lit(1))
                    / (F.col("n_p") + F.col("v"))
                )
                - F.log(F.col("ct_q") / F.col("n_q"))
            ).alias("lr"),
        )
    )
    per_doc = (
        tf.join(F.broadcast(term_lr), "term")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("dl"),
            F.sum(F.col("tf") * F.col("lr")).alias("log_ratio"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("dl", F.lit(0)).alias("n_tokens"),
            "log_ratio",
            (F.col("log_ratio") / F.col("dl")).alias("avg_log_ratio"),
        )
    )


def ngram_contamination(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    max_train_df: int = 10,
) -> DataFrame:
    """GPT-3-style n-gram decontamination report (Brown et al. 2020,
    App. C): a val/test document is contaminated when it shares ANY word
    ``n``-gram with the training split. Complements the exact-prefix
    (:func:`contamination_check`) and MinHash (near-dup) gates with the
    exact-overlap form the big-model reports actually use (n=13 there).

    ``max_train_df`` drops n-grams occurring in more than that many
    TRAIN documents before matching — the published recipe likewise
    ignores ubiquitous boilerplate n-grams; at web scale this is also the
    hub-key guard that keeps the shingle join's fan-out bounded. Returns
    one row per non-train document: ``(doc_id, split, n_shingles,
    n_contaminated, contaminated_frac, is_contaminated)``; documents
    shorter than ``n`` tokens have 0 shingles and are clean by
    definition.

    Scale: per-doc distinct shingles (row-local), one shuffle keyed by
    shingle for the train doc-frequency (map-side combine absorbs hot
    boilerplate before the cap drops it), one eval-shingle/train-shingle
    join on the capped key space, one per-doc rollup. Eval splits are
    ~1/4 of the corpus so the join's left side is a fraction of a full
    self-join.
    """
    d = df.select(
        F.col(id_col).alias("id"),
        split_assignment(id_col).alias("split"),
        F.array_distinct(word_shingles(F.col(text_col), n)).alias("sh"),
    )
    train_sh = (
        d.filter(F.col("split") == "train")
        .select(F.explode("sh").alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("tdf"))
        .filter(F.col("tdf") <= max_train_df)
        .select("s")
    )
    ev = d.filter(F.col("split") != "train")
    hits = (
        ev.select("id", F.explode("sh").alias("s"))
        .join(train_sh, "s", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        ev.select("id", "split", F.size("sh").alias("n_shingles"))
        .join(hits, "id", "left")
        .select(
            F.col("id"),
            "split",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.when(
                F.col("n_shingles") > 0,
                F.coalesce("n_contaminated", F.lit(0))
                / F.col("n_shingles").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("contaminated_frac"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )
