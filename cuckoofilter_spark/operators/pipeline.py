"""Training-data pipeline operators beyond the reference surface.

Four operators a large-scale (100 TB) LLM-corpus pipeline needs that
neither the reference (a membership-set library) nor stock Spark provides
directly, each built Spark-first on the engine's existing primitives:

- :func:`decontaminate` — benchmark n-gram decontamination: flag training
  documents that share any word n-gram with a held-out evaluation set.
  The cuckoo filter (this library's core object) is the scale lever: the
  benchmark gram set is compiled into a ~2-byte-per-gram broadcast filter
  and the *entire* training gram stream is pruned by a narrow map before
  the exact verification join ever shuffles a row.
- :func:`prefix_sum` — distributed exclusive prefix sum over a global
  ordering, the building block Spark lacks (a bare window over
  ``ORDER BY`` collapses to one partition).  Two-phase: sketch-balanced
  range bucketing, per-bucket totals (tiny collect), then per-bucket
  local cumsum with the bucket offset added.
- :func:`pack_sequences` — token-level sequence packing (concat-and-chunk
  into fixed context windows), expressed on top of :func:`prefix_sum`.
- :func:`stratified_sample` — deterministic per-stratum hash sampling
  (md5-threshold), reproducible across runs/engines and shuffle-free.
- :func:`quantile_buckets` — KLL-sketch-derived balanced range bucketing
  (the distributed analog of ``repartitionByRange`` with *inspectable,
  deterministic* bounds), shared by :func:`prefix_sum`.

Reference tie-in: the decontamination probe is exactly the reference's
``containsElement`` contract (CF/cuckoo_filter.h:278-301 — no false
negatives, bounded false positives) lifted to a corpus-scale anti-join;
the gram window is the FASTA k-mer slide (FASTA/fasta_reader.cpp:67-75)
over words instead of bases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuckoofilter_spark.operators.build import build_filter
from cuckoofilter_spark.operators.dedup import shingles
from cuckoofilter_spark.operators.membership import cf_contains_udf
from cuckoofilter_spark.params import CuckooParams


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def decontaminate(spark: SparkSession, train: DataFrame, bench: DataFrame,
                  n: int = 5, text_col: str = "text",
                  params: CuckooParams | None = None) -> DataFrame:
    """Benchmark decontamination: ``(doc_id, n_overlap)`` for every
    training document sharing at least one word *n*-gram with *bench*.

    Plan (and why it survives 100 TB):

    1. ``shingles`` hashes each side's distinct per-doc n-grams to 64-bit
       longs inside the row (shuffle-free, 8-byte keys downstream).
    2. The benchmark gram set is compiled into a broadcast cuckoo filter
       (~2 bytes/gram at f=16 — 10^8 benchmark grams ≈ 200 MB, far under
       what a broadcast *hash join* of the same set would need).
    3. The training gram stream is pruned by the filter in a narrow map.
       No false negatives (CF/cuckoo_filter.h:278-301) ⇒ no missed
       contamination; survivors ≈ true overlaps + ε·|train grams|.
    4. Only the surviving sliver is exactly verified with a semi join
       against the benchmark grams (kills the ε false positives), then
       counted per document.  The expensive corpus-wide shuffle the naive
       gram join would do never happens.
    """
    from pyspark import StorageLevel

    # The distinct benchmark gram set has three consumers (sizing count,
    # filter build, exact verify join).  Persist it across the two eager
    # ones and RELEASE it before returning — the verify join in the
    # returned lazy plan recomputes the (small, benchmark-sized) distinct
    # once at execution, which beats pinning it in the block manager for
    # the session lifetime (the query layer fixed this same leak pattern
    # in 12f0ac9; the operator must not reintroduce it).
    bench_grams = shingles(bench, n=n, text_col=text_col).select("gram").distinct()
    cached = bench_grams.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if params is None:
            ndv = cached.count()  # exact NDV — it IS the distinct set
            params = CuckooParams(max_table_size=max(1024, 2 * ndv),
                                  bits_per_fp=16)
        filt = build_filter(cached, "gram", params, num_partitions=8)
    finally:
        cached.unpersist()
    contains = cf_contains_udf(spark, filt)

    train_grams = shingles(train, n=n, text_col=text_col)
    survivors = train_grams.filter(contains(F.col("gram")))
    # Exact verify: plain (non-broadcast) semi join — by this point the
    # left side is the pruned sliver, so the shuffle moves almost nothing.
    confirmed = survivors.join(bench_grams, "gram", "left_semi")
    return confirmed.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_overlap"))


# ---------------------------------------------------------------------------
# sketch-balanced range bucketing + distributed prefix sum
# ---------------------------------------------------------------------------

def quantile_buckets(df: DataFrame, col: str, num_buckets: int,
                     k: int = 512) -> "tuple[list[float], DataFrame, object]":
    """Assign each row a range bucket ``0..num_buckets-1`` over *col*
    using boundary quantiles read off one merged KLL sketch.

    This is ``repartitionByRange`` re-expressed with the library's own
    quantile sketch: the bounds are deterministic (fixed seeds, fixed
    data), inspectable, and reusable across jobs — where Spark's
    ``RangePartitioner`` re-samples per run.  One narrow pass builds the
    sketch (bounded state, merge-associative), bucket assignment is a
    narrow map; nothing shuffles.

    Returns ``(bounds, df_with_bucket, sketch)`` where ``bounds`` has
    ``num_buckets - 1`` ascending split points, ``bucket`` counts the
    bounds ≤ value (so ties go to the right bucket deterministically),
    and ``sketch`` is the merged KLL (exposes ``rank_error`` so callers
    can gate how balanced the buckets are guaranteed to be).
    """
    from cuckoofilter_spark.operators.sketch_build import build_sketch
    from cuckoofilter_spark.sketches.kll import KLLSketch

    assert "bucket" not in df.columns, \
        "quantile_buckets writes a 'bucket' column; rename the caller's"
    sk = build_sketch(df.select(F.col(col).cast("double").alias(col)), col,
                      lambda pid: KLLSketch(k=k, seed=11), values="float")
    qs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = [float(sk.quantile(q)) for q in qs]
    bounds = sorted(bounds)  # sketch quantiles are monotone; be explicit
    v = F.col(col).cast("double")
    bucket = None
    for b in bounds:
        term = (v >= F.lit(b)).cast("int")
        bucket = term if bucket is None else bucket + term
    bucket = F.lit(0) if bucket is None else bucket
    return bounds, df.withColumn("bucket", bucket.cast("int")), sk


def prefix_sum(df: DataFrame, order_col: str, weight_col: str,
               num_buckets: int = 32, out_col: str = "offset",
               tiebreak: tuple[str, ...] = ()) -> DataFrame:
    """Exclusive prefix sum of *weight_col* over the global ordering of
    *order_col* — without ever sorting globally or collapsing to one
    partition (the trap of ``sum().over(Window.orderBy(...))`` with no
    ``partitionBy``, which Spark executes single-task).

    Phase 1: KLL-balanced range buckets over *order_col* (narrow).
    Phase 2: per-bucket totals — ``num_buckets`` rows to the driver.
    Phase 3: per-bucket sorted cumsum via ``applyInPandas`` with the
    bucket's exclusive global offset folded in.  Each task holds one
    bucket ≈ n/num_buckets rows (bounded by the sketch's rank error), so
    the operator scales by raising ``num_buckets`` with the data.

    The global ordering is ``(order_col, *tiebreak)``; ties in
    *order_col* are safe (bucket assignment is a function of the value,
    so tied rows always land in the same bucket) as long as the full key
    is unique.  Weights are summed as int64.
    """
    import pandas as pd

    _, bucketed, _ = quantile_buckets(df, order_col, num_buckets)
    totals = {
        r["bucket"]: r["total"]
        for r in bucketed.groupBy("bucket")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("total"))
        .collect()
    }
    base, offsets = 0, {}
    for b in range(num_buckets):
        offsets[b] = base
        base += int(totals.get(b, 0))

    schema_out = bucketed.drop("bucket").schema.add(out_col, "long")
    cols = [f.name for f in schema_out.fields]

    sort_cols = [order_col, *tiebreak]

    def cumsum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        w = pdf[weight_col].astype("int64")
        start = offsets[int(pdf["bucket"].iloc[0])]
        pdf[out_col] = w.cumsum() - w + start
        return pdf[cols]

    return bucketed.groupBy("bucket").applyInPandas(cumsum, schema_out)


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(docs: DataFrame, seq_len: int,
                   order_col: str = "doc_id",
                   weight_col: str = "n_tok",
                   num_buckets: int = 32) -> DataFrame:
    """Token-level sequence packing: documents are concatenated in
    *order_col* order into one global token stream and cut into fixed
    ``seq_len`` context windows (the standard LLM pre-training layout —
    no padding, documents may straddle chunk boundaries).

    Output per document: its global token ``offset``, the first/last
    chunk ids it lands in, and how many chunks it spans.  Downstream, a
    writer groups by chunk id to emit the packed sequences; this operator
    is the placement computation, which is all prefix-sum.
    """
    placed = prefix_sum(docs, order_col, weight_col,
                        num_buckets=num_buckets, out_col="offset")
    w = F.col(weight_col).cast("long")
    first = (F.col("offset") / seq_len).cast("long")
    last = ((F.col("offset") + F.greatest(w, F.lit(1)) - 1) / seq_len) \
        .cast("long")
    return placed.select(
        order_col, w.alias(weight_col), "offset",
        first.alias("chunk_first"), last.alias("chunk_last"),
        (last - first + 1).alias("n_chunks"))


def pack_chunks(docs: DataFrame, seq_len: int,
                order_col: str = "doc_id", text_col: str = "text",
                num_buckets: int = 32,
                tokens_col: str | None = None) -> DataFrame:
    """Materialize the packed training sequences: concatenate documents'
    whitespace tokens in *order_col* order into one global stream and
    emit one row per ``seq_len``-token chunk with the chunk's token
    count and an md5 digest of the joined token text (the content-level
    proof of correct packing; a writer would emit the tokens themselves).

    With ``tokens_col`` set, packing runs over PRE-TOKENIZED sequences
    (the input_hint table's ``tokens:array<int32>``) instead of splitting
    text — token ids are stringified only inside the per-chunk digest.

    Plan: per-doc token arrays (narrow) → global offsets via
    :func:`prefix_sum` (two tiny jobs) → posexplode to
    ``(global_pos, token)`` (narrow — the corpus is materialized exactly
    once, the inherent cost of writing packed sequences) → ONE shuffle
    on ``chunk_id`` → in-row sort + join.  At 100 TB the shuffle moves
    each token once, chunk sizes are fixed at ``seq_len``, and skew is
    impossible by construction (every chunk is the same size).
    """
    if tokens_col is None:
        arr = F.split(F.col(text_col), " ")
    else:
        arr = F.transform(F.col(tokens_col),
                          lambda t: t.cast("string"))
    ws = docs.select(order_col, arr.alias("_ws"))
    # offsets are computed on the SLIM (order, weight) relation — the
    # token payload never rides through the prefix-sum's Python stage;
    # it rejoins JVM-side by key (co-partitioned shuffle at scale)
    slim = ws.select(order_col, F.size("_ws").cast("long").alias("_n"))
    offsets = prefix_sum(slim, order_col, "_n", num_buckets=num_buckets,
                         out_col="_off").select(order_col, "_off")
    tok = (ws.join(offsets, order_col)
           .select("_off", F.posexplode("_ws").alias("_p", "w"))
           .select((F.col("_off") + F.col("_p")).alias("pos"), "w"))
    chunked = tok.select((F.col("pos") / seq_len).cast("long").alias("chunk_id"),
                         "pos", "w")
    assembled = (
        chunked.groupBy("chunk_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "w"))).alias("_sw"))
        .select(
            "chunk_id",
            F.size("_sw").cast("long").alias("n_tok"),
            F.md5(F.encode(
                F.array_join(F.transform("_sw", lambda s: s["w"]), " "),
                "UTF-8")).alias("chunk_md5"),
        )
    )
    return assembled


# ---------------------------------------------------------------------------
# deterministic corpus shuffle
# ---------------------------------------------------------------------------

def shuffle_rank(df: DataFrame, key_col: str = "doc_id", salt: str = "shuf1",
                 num_buckets: int = 32, out_col: str = "shuffle_rank") -> DataFrame:
    """Deterministic global corpus shuffle for training-order
    randomization: rank every row by the md5 of its key (salted, so each
    epoch's permutation differs by salt alone).  Content-hash ordering
    makes the permutation reproducible across runs, engines and
    partitionings — unlike ``orderBy(rand())``.

    The global rank is :func:`prefix_sum` with unit weights over the
    hash order — a row's rank is the count of rows hashing before it —
    so no single-task global sort happens; ties in the 60-bit hash
    prefix (~n²/2⁶¹) are broken by the key itself.
    """
    assert not {"_h", "_one"} & set(df.columns), \
        "shuffle_rank uses temp columns _h/_one; rename the caller's"
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"),
                           F.lit("|" + salt))), 1, 15),
        16, 10).cast("long")
    with_h = df.withColumn("_h", h).withColumn("_one", F.lit(1).cast("long"))
    ranked = prefix_sum(with_h, "_h", "_one", num_buckets=num_buckets,
                        out_col=out_col, tiebreak=(key_col,))
    return ranked.drop("_h", "_one")


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

def _hex_threshold(rate: float) -> str:
    """8-hex-digit threshold: keep a row iff the first 8 md5 hex digits of
    its key compare below this (≈ rate·2^32 of the uniform hash space)."""
    t = min(int(rate * 2 ** 32), 2 ** 32 - 1)
    return format(t, "08x")


def stratified_sample(docs: DataFrame, stratum_col: str,
                      rates: dict[str, float], key_col: str = "doc_id",
                      salt: str = "v1") -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``md5(key || '|' || salt)``'s first 8 hex digits fall below the
    stratum's threshold.  Properties the usual ``df.sampleBy`` lacks:

    - reproducible across runs, engines and partitionings (content-hash,
      not RNG state) — the oracle recomputes the identical sample in SQL;
    - stable under corpus growth: a doc's keep/drop never flips when
      other rows arrive (critical for incremental corpus rebuilds);
    - shuffle-free: a broadcast map join on the stratum plus a narrow
      filter.

    Unknown strata are dropped (rate 0).
    """
    spark = docs.sparkSession
    thr = spark.createDataFrame(
        [(s, _hex_threshold(r)) for s, r in sorted(rates.items())],
        f"{stratum_col} string, _thr string")
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|" + salt))),
        1, 8)
    return (docs.join(F.broadcast(thr), stratum_col)
            .filter(h < F.col("_thr"))
            .drop("_thr"))


def mix_sources(docs: DataFrame, stratum_col: str = "source",
                key_col: str = "doc_id", salt: str = "mix1") -> DataFrame:
    """Temperature-weighted source mixing (α = 0.5): downsample each
    source so sampled counts are ∝ √n_s — the standard multilingual /
    multi-source pretraining re-balancing (e.g. the mixture rule in XLM-R
    and mT5: p_s ∝ n_s^α flattens the head so big crawls don't drown
    small sources).  The smallest source keeps ~everything; a source 100×
    larger keeps ~10× the rows (not 100×).

    Every quantity is INTEGER, so the sample is bit-reproducible across
    engines (the oracle recomputes it in SQL): with
    ``q_s = floor(√n_s)`` and ``h`` the first 8 md5 hex digits of
    ``key || '|' || salt`` as a uint32, a row survives iff

        ``h · q_s  <  2^32 · min_s q_s``

    i.e. per-source keep rate ``q_min / q_s`` applied as a pure-integer
    comparison on a content hash — stable under reruns, partitioning
    changes and (unlike RNG sampling) corpus growth within a source.

    Plan shape at 100 TB: one tiny per-source count aggregate (|sources|
    rows), broadcast back, then a narrow filter on the scan — no data
    shuffle.  floor(√n) on a BIGINT count is exact in IEEE double for
    n < 2^52 (√ is correctly rounded and non-squares never round onto an
    integer), which covers any per-source count a real corpus can reach.
    """
    counts = (docs.groupBy(stratum_col).count()
              .select(F.col(stratum_col),
                      F.floor(F.sqrt(F.col("count"))).cast("long").alias("_q")))
    qmin = counts.agg(F.min("_q")).collect()[0][0]
    if qmin is None:  # empty input: empty output, not a TypeError
        return docs
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|" + salt))),
            1, 8),
        16, 10).cast("long")
    return (docs.join(F.broadcast(counts), stratum_col)
            .filter(h * F.col("_q") < F.lit((1 << 32) * int(qmin)))
            .drop("_q"))


# ---------------------------------------------------------------------------
# corpus-level rarity (perplexity-filter analog)
# ---------------------------------------------------------------------------

def rare_bigrams(docs: DataFrame, rare_max: int = 2,
                 text_col: str = "text") -> DataFrame:
    """Corpus-conditioned rarity signal — the integer-exact analog of
    CCNet-style perplexity filtering: per document, the share of word
    bigrams whose CORPUS frequency is ≤ ``rare_max``.  A document whose
    bigrams the rest of the corpus never repeats is either novel or noise;
    either way it is what an LM-based quality filter keys on, computed
    here from the corpus itself (no external model).

    Output: (doc_id, n_bigrams, n_rare, rare_ratio_x1e4) — integer-scaled,
    engine-reproducible.

    Scale design: bigrams are hashed in-row to 8-byte longs (bound-split
    projection — see the quadratic hazard on ``word_ngrams``), so the two
    shuffles move longs only: (1) a map-side-combinable ``groupBy(gram)``
    count, (2) the gram→count join back (uniform hash keys; a hot bigram
    is one build-side row replicated by the join, and AQE splits any
    skewed probe partition) followed by a per-doc re-aggregation.  Nothing
    materializes gram strings off-row."""
    from cuckoofilter_spark.operators.text import word_ngrams, words

    pre = docs.select("doc_id", words(F.col(text_col)).alias("_ws"))
    ws = F.col("_ws")
    grams = F.transform(word_ngrams(ws, 2), lambda g: F.xxhash64(g))
    # explode_outer: see dedup.shingles — the size >= 2 filter guarantees
    # non-empty gram arrays, and the outer variant dodges
    # InferFiltersFromGenerate's whole-expression filter pushdown
    ex = pre.filter(F.size(ws) >= 2).select(
        "doc_id", F.explode_outer(grams).alias("g"))
    counts = ex.groupBy("g").agg(F.count("*").alias("cnt"))
    return (
        ex.join(counts, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("_n"),
             F.sum(F.when(F.col("cnt") <= rare_max, 1).otherwise(0))
             .alias("_r"))
        .select("doc_id",
                F.col("_n").cast("long").alias("n_bigrams"),
                F.col("_r").cast("long").alias("n_rare"),
                F.floor(F.col("_r") * 10000 / F.col("_n")).cast("long")
                .alias("rare_ratio_x1e4"))
    )
