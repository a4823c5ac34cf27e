"""Corpus filtering: the composed keep/drop gate of an LLM training-data
pipeline, plus deterministic hash sampling.

``document_filter`` composes the engine's per-document signals —
Gopher-style repetition fractions (textstats.repetition_stats), quality
ratios (textstats.quality_score), stopword language id
(textstats.language_id) — into one (doc_id, keep, reasons) verdict table,
the artifact a curation run actually materializes (RefinedWeb §3, Gopher
§A1). Every rule is named, so downstream audits can ask "how many docs
died to each rule" with one groupBy on ``reasons``.

``hash_sample`` is reproducible Bernoulli sampling keyed on content ids:
keep iff the first 8 md5 hex digits of the key, read as a fraction of
2^32, fall below ``rate``. Unlike ``df.sample()`` it is stable under
re-runs, retries, resharding and cluster size — the property a training
pipeline needs for "sample 10% of host X" decisions that must reproduce.

Shape at 100 TB: quality/lang/dup-token rules are row-local codegen; the
2-gram/3-gram repetition stats shuffle once per doc (textstats docstring);
the final verdict is a doc_id-keyed join of per-doc aggregates — no
cross-document state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import language_id, quality_score, repetition_stats

DEFAULT_RULES = {
    "min_tokens": 12,
    "max_dup_token_frac": 0.3,
    "max_dup_3gram_frac": 0.25,
    "max_top_2gram_char_frac": 0.2,
    "min_alpha_ratio": 0.5,
    "max_punct_ratio": 0.1,
    "allowed_langs": ("en",),
}


def document_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **overrides,
) -> DataFrame:
    """Returns ``(doc_id, n_tokens, lang_pred, keep, reasons)`` where
    ``reasons`` is the comma-joined sorted list of failed rule names
    ('' when the document passes everything) and ``keep = reasons == ''``.
    """
    cfg = {**DEFAULT_RULES, **overrides}
    # quality_score and language_id are row-local withColumn transforms, so
    # they ride ONE projection over the input; the only shuffle in the
    # whole verdict is repetition_stats' per-doc top-2-gram aggregation,
    # joined back on doc_id (one shuffle join, not three)
    local = (
        language_id(
            quality_score(
                docs.select(F.col(id_col).alias("doc_id"), text_col), text_col
            ),
            text_col,
        )
        .select("doc_id", "alpha_ratio", "punct_ratio", "lang_pred")
    )
    rep = repetition_stats(docs, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("doc_id"),
        "n_tokens",
        "dup_token_frac",
        "dup_3gram_frac",
        "top_2gram_char_frac",
    )
    j = rep.join(local, "doc_id")
    rules = [
        ("too_short", F.col("n_tokens") < cfg["min_tokens"]),
        ("dup_tokens", F.col("dup_token_frac") > cfg["max_dup_token_frac"]),
        ("dup_3grams", F.col("dup_3gram_frac") > cfg["max_dup_3gram_frac"]),
        ("top_2gram", F.col("top_2gram_char_frac") > cfg["max_top_2gram_char_frac"]),
        ("low_alpha", F.col("alpha_ratio") < cfg["min_alpha_ratio"]),
        ("high_punct", F.col("punct_ratio") > cfg["max_punct_ratio"]),
        ("lang", ~F.col("lang_pred").isin(*cfg["allowed_langs"])),
    ]
    # sorted rule names -> deterministic reasons string
    reason_arr = F.array_compact(
        F.array(
            *[
                F.when(cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in sorted(rules)
            ]
        )
    )
    return j.select(
        "doc_id",
        "n_tokens",
        "lang_pred",
        (F.size(reason_arr) == 0).alias("keep"),
        F.array_join(reason_arr, ",").alias("reasons"),
    )


def hash_fraction(key) -> F.Column:
    """Deterministic uniform fraction in [0, 1) from a key column: first
    8 md5 hex digits / 2^32. Reproducible in any engine with md5."""
    k = key if not isinstance(key, str) else F.col(key)
    return F.conv(F.substring(F.md5(k.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float | None = None,
    rates: DataFrame | None = None,
    stratum_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Reproducible Bernoulli sample: keep rows with
    ``hash_fraction(salt || key) < rate``.

    Uniform mode (``rate``): one codegen filter, no shuffle, fully
    pushdown-compatible. Stratified mode (``rates`` = (stratum, rate)
    DataFrame + ``stratum_col``): per-stratum rates arrive via a
    broadcast join — the "sample host X at 10%, host Y at 1%" shape of
    crawl curation. ``salt`` decorrelates independent samples over the
    same keys."""
    frac = hash_fraction(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    if rates is not None:
        if stratum_col is None:
            raise ValueError("hash_sample: rates DataFrame requires stratum_col")
        return (
            df.join(F.broadcast(rates), stratum_col, "left")
            .filter(frac < F.coalesce(F.col("rate"), F.lit(0.0)))
            .drop("rate")
        )
    if rate is None:
        raise ValueError("hash_sample: pass rate or rates")
    return df.filter(frac < F.lit(float(rate)))


def pack_documents(
    df: DataFrame,
    budget: int,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic sequence packing for LLM training: assign every
    document to a fixed-token-budget bin. Returns
    ``(id, bucket, bin_id, n_tokens, offset)`` where ``offset`` is the
    token position the doc would start at inside its bucket's stream.

    Packing is inherently sequential (a doc's bin depends on everything
    packed before it), which is why naive implementations sort the corpus
    globally and stream it through one process. The scalable form used
    here: shard docs into ``n_buckets`` independent streams by a
    deterministic md5 bucket of the id, order each stream by id, and run
    the greedy "next bin when the budget is crossed" rule per stream via
    a window cumulative sum — ``bin_id = floor(exclusive_cumsum /
    budget)``. Each bucket's window is an independent partition, so the
    only shuffle is the bucket hash partitioning and parallelism =
    n_buckets regardless of corpus size (set n_buckets ~ cluster cores at
    100 TB). Every assignment is a pure function of (id set, budget,
    n_buckets): re-runs, retries, and cluster resizes reproduce the same
    packing — the property that makes packed-corpus checkpoints
    resumable. Replayable exactly in ANSI SQL (same md5 arithmetic as
    :func:`hash_fraction`, same window frame), so the driver oracle pins
    every bin assignment.

    Docs longer than ``budget`` still get a bin (their own cumsum span);
    a training loader would chunk them downstream — chunking is a
    row-local explode, packing is the cross-row part that needs this
    operator.
    """
    from .textstats import token_count

    if budget < 1:
        raise ValueError(f"pack_documents: budget must be >= 1, got {budget}")
    from pyspark.sql import Window

    idc = F.col(id_col)
    bucket = (
        F.conv(F.substring(F.md5(idc.cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).alias("bucket")
    base = df.select(
        idc.alias("id"), bucket, token_count(F.col(text_col)).alias("n_tokens")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.select(
        "id",
        "bucket",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("offset"),
    ).withColumn("bin_id", (F.col("offset") / F.lit(int(budget))).cast("long"))


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Reproducible weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-Res): each row gets priority ``-ln(u) / w`` with
    ``u`` the deterministic md5 uniform of (salt || key); the k smallest
    priorities ARE a weight-proportional sample. The data-mixing
    primitive of training pipelines ("sample 1M docs proportional to
    quality") — deterministic across re-runs, resharding and cluster
    sizes, unlike ``DataFrame.sample``.

    Rows with non-positive weight are excluded (they have zero inclusion
    probability). Ties are broken by key for exact reproducibility.
    Returns the sampled rows with their ``priority`` attached.

    Scale: priority is one codegen projection; selection is a global
    top-k (TakeOrderedAndProject — per-partition heap then one k-row
    merge, never a full sort/shuffle of the corpus).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = hash_fraction(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    # u in [0,1): guard u=0 (md5 prefix 00000000) -> ln(0); substitute the
    # smallest representable step so the row gets maximal priority value
    safe_u = F.greatest(u, F.lit(1.0 / 4294967296.0 / 2.0))
    pri = -F.log(safe_u) / F.col(weight_col)
    out = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", pri)
        .orderBy(F.asc("priority"), F.asc(key_col))
        .limit(k)
    )
    return out


def curation_funnel(docs: DataFrame, contamination_prefix: int = 40) -> DataFrame:
    """The end-to-end corpus-curation funnel report: document and token
    survival through each pipeline stage —

        input -> exact dedup -> quality filter -> decontaminated

    where decontamination drops TRAIN members of duplicate-prefix groups
    that span split boundaries (GPT-3-style: clean the training split,
    leave eval untouched). Returns
    ``(stage, stage_order, n_docs, n_tokens)``, one row per stage — the
    first sheet every curation run prints ("where did the tokens go?").

    Scale shape: every stage reuses an already-shipped operator (exact
    md5 dedup window, the row-local filter verdict, the prefix-group
    contamination aggregate); stage memberships are id-only joins and
    the report itself is four 1-row aggregates unioned — nothing beyond
    the dedup/contamination shuffles the stages already cost, and no
    stage result is ever collected.
    """
    from .dedup import exact_dedup
    from .textstats import split_assignment, token_count

    tok = docs.select(
        F.col("doc_id"), token_count(F.col("text")).alias("nt")
    )
    ded = exact_dedup(docs).filter("is_survivor").select("doc_id")
    kept = (
        document_filter(docs)
        .filter("keep")
        .select("doc_id")
        .join(ded, "doc_id")
    )
    spl = kept.join(
        docs.select(
            "doc_id",
            F.md5(F.substring("text", 1, contamination_prefix)).alias("gh"),
        ),
        "doc_id",
    ).withColumn("split", split_assignment("doc_id"))
    bad = (
        spl.groupBy("gh")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("gh")
    )
    fin = spl.join(bad.withColumn("contaminated", F.lit(True)), "gh", "left").filter(
        ~((F.col("split") == "train") & F.col("contaminated").isNotNull())
    ).select("doc_id")

    # ONE pass: stage memberships become flags on the token table, the
    # report is a single 8-scalar aggregate unpivoted to 4 rows — four
    # separate per-stage aggregates would re-evaluate the shared
    # dedup/filter lineage once each (4 corpus passes instead of 1).
    j = (
        tok.join(ded.withColumn("_d", F.lit(1)), "doc_id", "left")
        .join(kept.withColumn("_k", F.lit(1)), "doc_id", "left")
        .join(fin.withColumn("_f", F.lit(1)), "doc_id", "left")
    )
    one = j.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("nt").alias("t0"),
        F.count("_d").alias("n1"),
        F.sum(F.col("nt") * F.col("_d")).alias("t1"),
        F.count("_k").alias("n2"),
        F.sum(F.col("nt") * F.col("_k")).alias("t2"),
        F.count("_f").alias("n3"),
        F.sum(F.col("nt") * F.col("_f")).alias("t3"),
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(name).alias("stage"),
                F.lit(order).alias("stage_order"),
                F.col(n).alias("n_docs"),
                F.coalesce(F.col(t), F.lit(0)).cast("long").alias("n_tokens"),
            )
            for name, order, n, t in [
                ("input", 1, "n0", "t0"),
                ("exact_dedup", 2, "n1", "t1"),
                ("quality_filter", 3, "n2", "t2"),
                ("decontaminated", 4, "n3", "t3"),
            ]
        ]
    )
    return one.select(F.explode(stages).alias("s")).select(
        "s.stage", "s.stage_order", "s.n_docs", "s.n_tokens"
    )
