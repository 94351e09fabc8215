"""Corpus curation operators for training-data pipelines.

Four operators a large-scale LLM data pipeline runs between raw crawl and
tokenizer, all expressed as declarative DataFrame plans (no UDFs — every
expression is JVM-side and whole-stage-codegen'd):

* :func:`corpus_mix` — re-weight the source mixture to target proportions
  (the "data recipe" step: N parts web, M parts code, ...).
* :func:`decontaminate` — flag training documents sharing any word n-gram
  with an evaluation/benchmark set (leakage scrub).
* :func:`pack_sequences` — assign documents to fixed-token-budget training
  sequences (greedy concat-then-chop packing, the GPT-style batcher).
* :func:`repetition_metrics` — Gopher-style repetition quality signals
  (duplicate-word fraction, top-word fraction).

All decisions key on the portable md5 content hash (see
:mod:`procurement_data_pipeline_spark.llm_ops.sampling`) so every output is
deterministic across engines, retries, and corpus growth — and therefore
oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from procurement_data_pipeline_spark.llm_ops.sampling import hash_key
from procurement_data_pipeline_spark.llm_ops.text import words

_PREFIX_LEN = 8
_HEX = "0123456789abcdef"


def corpus_mix(
    df: DataFrame,
    weights: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    on_missing: str = "error",
) -> DataFrame:
    """Downsample each source so the output matches the target mixture.

    ``weights`` is a tiny (source, weight) relation — the data recipe. With
    n_s docs in source s and target weight w_s, the keep-rate is
    ``min(1, C·w_s/n_s)`` where ``C = min_s(n_s/w_s)``: the output hits the
    target proportions exactly while keeping ALL of the scarcest source (the
    max-size solution with no upsampling). Per-row keep/drop is the md5-hash
    filter, so the sampled subset is deterministic and engine-portable.

    A source present in the corpus but absent from the recipe is a curation
    decision someone must make, not a silent drop: ``on_missing='error'``
    (default) raises listing the unlisted sources (one tiny driver-side
    aggregate at build time — same bounded contract as the ANN trainers);
    ``on_missing='drop'`` excludes them knowingly.

    Scale: one tiny per-source count (shuffled on ~#sources keys), a 1-row
    global min broadcast, a broadcast join of rates onto the corpus, then a
    pure filter — the 100 TB cost is one scan.
    """
    if on_missing not in ("error", "drop"):
        raise ValueError(f"on_missing must be error|drop, got {on_missing}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    if on_missing == "error":
        # A NULL source can never match the inner rate join below (SQL null
        # semantics), so it MUST surface here too — groupBy keeps the NULL
        # group and the anti-join flags it unlisted; sort with key=str so a
        # None among strings still renders the intended error.
        unlisted = [
            r[0]
            for r in counts.join(weights, source_col, "left_anti")
            .select(source_col)
            .collect()
        ]
        if unlisted:
            raise ValueError(
                f"corpus sources missing from the weights recipe: "
                f"{sorted(unlisted, key=lambda s: (s is None, str(s)))} — "
                f"add them or pass on_missing='drop' "
                f"(NULL source rows always count as unlisted)"
            )
    rated = counts.join(F.broadcast(weights), source_col)
    scale = rated.agg(
        F.min(F.col("_n").cast("double") / F.col("weight")).alias("_c")
    )
    rates = (
        rated.crossJoin(F.broadcast(scale))  # 1-row scalar broadcast
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                F.col("_c") * F.col("weight") / F.col("_n").cast("double"),
            ).alias("keep_rate"),
        )
    )
    # Threshold hex string per source: floor(rate · 2^32) as %08x. rate=1
    # would need 9 hex chars, so full-keep sources short-circuit the filter.
    thresh = F.format_string(
        "%08x", F.floor(F.col("keep_rate") * F.lit(4294967296.0)).cast("bigint")
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(
            (F.col("keep_rate") >= 1.0)
            | (F.substring(hash_key(key_col, salt), 1, _PREFIX_LEN) < thresh)
        )
        .select(*df.columns)  # sampled subset, schema untouched
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per train document: how many of its distinct word ``n``-grams appear
    anywhere in the evaluation set (0 → clean). The standard benchmark
    decontamination scrub — eval text must not leak into training data.

    Plan shape: both sides explode to DISTINCT (doc, gram) inverted-index
    rows, equi-join on the gram, count per train doc, left-join the counts
    back so clean docs keep an explicit 0. Never a cross join; skew is
    bounded by the gram document-frequency, and the eval side is typically
    the small side (AQE broadcasts it when it fits).

    The join key is a 16-hex-char md5 prefix of the gram, not the raw
    ``n``-word string: the distinct + join shuffles then carry 16 bytes per
    gram instead of ~8 words (~4× less shuffle traffic at this n). md5 is
    bit-identical across engines, so an oracle applying the same prefix
    agrees EXACTLY — including on the ~2⁻⁶⁴-probability collisions.
    """
    from procurement_data_pipeline_spark.llm_ops.text import word_ngrams, words as _words

    grams = word_ngrams(text_col, n) if n > 1 else _words(text_col)
    # Hash inside the array BEFORE explode + distinct, so no shuffle ever
    # carries a raw gram string.
    hashed = F.explode(
        F.transform(grams, lambda g: F.substring(F.md5(g), 1, 16))
    )

    def _hashed(df_side: DataFrame) -> DataFrame:
        return df_side.select(
            F.col(id_col).alias("_id"), hashed.alias("w")
        ).distinct()

    tr = _hashed(train)
    ev = _hashed(eval_df).select("w").distinct()
    hits = (
        tr.join(ev, "w")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        train.select(F.col(id_col))
        .join(hits.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_ngrams", F.lit(0))
            .cast("bigint")
            .alias("n_contaminated_ngrams"),
        )
        .withColumn("contaminated", F.col("n_contaminated_ngrams") > 0)
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
    n_buckets: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence:
    deterministically order documents, concatenate, chop every ``seq_len``
    tokens (greedy concat-then-chop packing). Output per document: its
    packing bucket, the sequence index its first token lands in, its token
    count, and its start offset within that sequence.

    Distribution: a single global ordering would serialize the window, so
    documents first hash-route to ``n_buckets`` independent packing streams
    (bucket = first md5 hex char's index — engine-portable), and the running
    token sum is a window per bucket. At 100 TB, n_buckets scales with the
    cluster (each bucket's window is one sorted partition); determinism is
    preserved because both the routing and the intra-bucket order are pure
    functions of the content hash. Up to 65,536 buckets are supported (a
    4-hex-char route); at ~1.5 GB of window state per bucket that covers
    ~100 TB of text before a two-level (bucket → sub-bucket with offset
    stitching) scheme is needed.
    """
    if not 1 <= n_buckets <= 65536:
        raise ValueError(f"n_buckets must be in [1, 65536], got {n_buckets}")
    h = hash_key(id_col, salt)
    tok = F.size(words(text_col))

    # Engine-portable bucket: leading md5 hex chars, mod n_buckets
    # (strpos/instr of each char in the hex alphabet — both engines agree;
    # no hex→int cast needed). Two chars route ≤256 buckets — kept as its
    # own arm so existing bucket assignments (and oracle hashes) are
    # byte-stable at the defaults; four chars extend the route to 65,536.
    def _hexval(n_chars: int):
        val = F.lit(0)
        for i in range(1, n_chars + 1):
            val = val * 16 + (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1)
        return val

    hexval = _hexval(2 if n_buckets <= 256 else 4)
    bucketed = df.select(
        F.col(id_col),
        (hexval % n_buckets).alias("bucket"),
        h.alias("_h"),
        tok.cast("bigint").alias("tok_count"),
    )
    # Pin the ROWS frame explicitly: the default RANGE frame makes peer rows
    # (possible if id_col ever repeats) share one cumulative sum, silently
    # double-counting offsets — and diverging from the ROWS-framed oracle.
    # tok_count joins the sort so duplicate-id rows order deterministically
    # too: any rows still tied after it are byte-identical outputs, so the
    # assignment is reproducible for EVERY input, not just unique-id ones.
    w = (
        Window.partitionBy("bucket")
        .orderBy("_h", id_col, "tok_count")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("tok_count").over(w) - F.col("tok_count")
    return bucketed.select(
        id_col,
        "bucket",
        "tok_count",
        F.floor(start / F.lit(seq_len)).cast("bigint").alias("seq_index"),
        (start % F.lit(seq_len)).cast("bigint").alias("seq_offset"),
    )


def pack_sequences_two_level(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
    n_buckets: int = 16,
    n_sub: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Sequence packing whose longest serial step is O(n_buckets·n_sub)
    rows — the 100 TB form of :func:`pack_sequences`.

    One-level packing sorts each bucket in a single window task, so a
    bucket's whole token stream must fit one task. Here each bucket splits
    into ``n_sub`` independent sub-streams (next two md5 hex chars):

    1. a window per (bucket, sub) computes the LOCAL running token sum —
       n_buckets·n_sub concurrent sorts, each 1/(b·s) of the corpus;
    2. per-(bucket, sub) token totals (a tiny aggregate) take an exclusive
       prefix sum over ``sub`` within the bucket — b·s rows, broadcast back;
    3. a document's global start = its sub-stream's base offset + its local
       start. seq_index/seq_offset derive from the global start as before.

    The stitched result is EXACTLY the one-level packing under the total
    order (sub, _h, id, tok) — concatenating sub-streams in sub order IS
    that cumulative sum — which is what the DuckDB oracle checks with a
    single window. Determinism: routing and order are pure md5 functions.
    """
    if not 1 <= n_buckets <= 65536:
        raise ValueError(f"n_buckets must be in [1, 65536], got {n_buckets}")
    if not 1 <= n_sub <= 256:
        raise ValueError(f"n_sub must be in [1, 256], got {n_sub}")
    h = hash_key(id_col, salt)
    tok = F.size(words(text_col))

    def _hexval(start: int, n_chars: int):
        val = F.lit(0)
        for i in range(start, start + n_chars):
            val = val * 16 + (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1)
        return val

    bucketed = df.select(
        F.col(id_col),
        (_hexval(1, 2 if n_buckets <= 256 else 4) % n_buckets).alias("bucket"),
        (_hexval(5, 2) % n_sub).alias("sub"),
        h.alias("_h"),
        tok.cast("bigint").alias("tok_count"),
    )
    local_w = (
        Window.partitionBy("bucket", "sub")
        .orderBy("_h", id_col, "tok_count")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.withColumn(
        "_local_start", F.sum("tok_count").over(local_w) - F.col("tok_count")
    )
    # Tiny relation: one row per (bucket, sub). The exclusive prefix over
    # sub within each bucket is the stitching offset.
    base_w = (
        Window.partitionBy("bucket")
        .orderBy("sub")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = (
        bucketed.groupBy("bucket", "sub")
        .agg(F.sum("tok_count").alias("_sub_tok"))
        .withColumn("_base", F.sum("_sub_tok").over(base_w) - F.col("_sub_tok"))
        .select("bucket", "sub", "_base")
    )
    start = F.col("_base") + F.col("_local_start")
    return local.join(F.broadcast(bases), ["bucket", "sub"]).select(
        id_col,
        "bucket",
        "tok_count",
        F.floor(start / F.lit(seq_len)).cast("bigint").alias("seq_index"),
        (start % F.lit(seq_len)).cast("bigint").alias("seq_offset"),
    )


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_threshold: float = 0.8,
    top_threshold: float = 0.3,
) -> DataFrame:
    """Gopher-style repetition signals per document — ZERO shuffles:

    * ``dup_word_frac`` — fraction of word occurrences that are repeats of
      an earlier word (1 − distinct/total); plain array expressions.
    * ``top_word_frac`` — the most frequent word's share of the document.
      The obvious plan (explode → per-(doc, word) count → per-doc max)
      shuffles the ENTIRE token stream twice; instead, the max frequency is
      the longest run in the SORTED token array, computed by one
      ``F.aggregate`` lambda carrying (prev, run, best) state — per-row
      JVM work proportional to document length, nothing leaves the row.
    * ``repetitive`` — either signal past its threshold (the filterable
      quality flag).

    The whole operator is a narrow projection: at 100 TB it pipelines with
    the scan, where the explode form would shuffle ~the corpus token count.
    """
    ws = words(text_col)
    sorted_ws = F.sort_array(ws)
    run_state = F.aggregate(
        sorted_ws,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return df.select(
        F.col(id_col),
        F.size(ws).cast("double").alias("_total"),
        F.size(F.array_distinct(ws)).cast("double").alias("_distinct"),
        run_state.cast("double").alias("_top"),
    ).select(
        id_col,
        # Raw IEEE doubles, not rounded: both engines run the identical
        # division on identical ints, so the bits (and the driver's
        # repr-based value hash) match exactly.
        (F.lit(1.0) - F.col("_distinct") / F.col("_total")).alias("dup_word_frac"),
        (F.col("_top") / F.col("_total")).alias("top_word_frac"),
    ).withColumn(
        "repetitive",
        (F.col("dup_word_frac") > dup_threshold)
        | (F.col("top_word_frac") > top_threshold),
    )


__all__ = [
    "corpus_mix",
    "decontaminate",
    "pack_sequences",
    "pack_sequences_two_level",
    "repetition_metrics",
    "temperature_weights",
    "quality_weighted_sample",
]


def temperature_weights(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Data-recipe weights from the corpus itself: ``weight_s = n_s ** alpha``
    (unnormalized — :func:`corpus_mix` normalizes via its keep-rate scale).

    alpha < 1 flattens the natural source distribution toward uniform — the
    exponentiated-smoothing / temperature sampling used for multilingual and
    multi-domain training mixes (alpha = 1/T). The default alpha=0.5 is
    square-root sampling, computed with sqrt() — IEEE correctly-rounded on
    every engine, so the downstream hash thresholds are bit-portable and the
    whole mix stays oracle-checkable. Other alphas go through pow(), whose
    last-ulp behavior is libm-specific: fine for production, excluded from
    hash-graded oracles.

    Cost: one tiny per-source aggregate (#sources rows) — the corpus scan
    itself happens later, inside corpus_mix.
    """
    n = F.count(F.lit(1)).cast("double")
    w = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(alpha))
    return df.groupBy(source_col).agg(w.alias("weight"))


def quality_weighted_sample(
    df: DataFrame,
    score_col: str = "quality_score",
    key_col: str = "doc_id",
    tiers: list[tuple[float, float]] | None = None,
    salt: str = "qsample",
) -> DataFrame:
    """Quality-weighted data selection: documents are kept with a
    probability that steps by quality tier — the soft form of hard quality
    filtering (a hard cutoff discards every mid-quality document; stepped
    rates keep a deterministic, reproducible sample of each tier, the
    DCLM/FineWeb-style recipe).

    ``tiers`` is a descending list of (min_score, keep_rate); a row's rate
    is the first tier whose threshold its score meets, and the FINAL tier
    is the unconditional catch-all (its min_score is not evaluated): rows
    below every listed threshold — including NULL scores, which no >=
    comparison can admit — take the last tier's rate rather than being
    silently dropped. This matches the SQL CASE ... ELSE form the oracle
    uses. Default: >=0.8 -> 1.0, >=0.5 -> 0.5, else 0.125. Per-row
    keep/drop is the portable md5-hash filter on ``key_col`` —
    deterministic across engines, retries, and corpus growth, and the
    rates are constants, so the whole selection is oracle-checkable.
    Cost: one scan, zero shuffles, zero joins (the score is a row-local
    expression).
    """
    if tiers is None:
        tiers = [(0.8, 1.0), (0.5, 0.5), (0.0, 0.125)]
    if not tiers:
        raise ValueError("at least one tier required")
    if sorted(tiers, key=lambda t: -t[0]) != tiers:
        raise ValueError("tiers must be sorted by descending min_score")
    rate = None
    for min_score, keep_rate in tiers[:-1]:
        cond = F.col(score_col) >= F.lit(min_score)
        rate = (
            F.when(cond, F.lit(keep_rate))
            if rate is None
            else rate.when(cond, F.lit(keep_rate))
        )
    last_rate = F.lit(float(tiers[-1][1]))
    rate = last_rate if rate is None else rate.otherwise(last_rate)
    thresh = F.format_string(
        "%08x", F.floor(rate * F.lit(4294967296.0)).cast("bigint")
    )
    return df.filter(
        (rate >= 1.0)
        | (F.substring(hash_key(key_col, salt), 1, _PREFIX_LEN) < thresh)
    )
