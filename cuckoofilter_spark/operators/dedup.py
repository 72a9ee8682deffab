"""Deduplication operators for training-data pipelines: exact dedup,
word-n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the 100 TB story):
- Exact dedup is one hash-groupBy on a 16-byte digest — the shuffle moves
  (digest, doc_id), never text.  With AQE on, skew on pathological digest
  collisions is split automatically.
- MinHash signatures are computed with ONE shuffle: explode distinct
  shingles → ``groupBy(doc_id)`` with k partial-``min`` aggregates
  (map-side combine makes the shuffle k·8 bytes per doc, independent of
  doc length).  Hashing stays JVM-side (``xxhash64``), no Python.
- LSH banding turns all-pairs O(n²) into a self-join on (band, band_hash)
  buckets — the join key is uniform by construction (hash values), so the
  shuffle is skew-free; candidate verification joins back to shingles only
  for the candidate set.
- SimHash is the same shape: 64 conditional-sum aggregates → sign bits →
  chunk-banding join for Hamming-distance candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuckoofilter_spark.operators.text import word_ngrams, words


# -- exact dedup -------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group by content digest; keep the smallest doc_id per group.
    Returns (fingerprint, keep_id, cnt) — one row per distinct content."""
    h = F.md5(F.encode(F.col(text_col), "UTF-8"))
    return (
        docs.select(h.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("cnt"))
    )


# -- shingles + exact n-gram Jaccard ----------------------------------------

def shingle_arrays(docs: DataFrame, n: int = 3,
                   text_col: str = "text") -> DataFrame:
    """(doc_id, grams: array<bigint>) — the in-row stage of `shingles`:
    distinct 64-bit word-n-gram hashes per document, NOT yet exploded.
    Keeping the per-doc gram set in-row lets per-doc reductions over it
    (MinHash signatures, set sizes) run as narrow projections with ZERO
    shuffle; only pair-finding genuinely needs the exploded form.

    64-bit hashing of grams is deterministic and collision-safe at corpus
    gram cardinalities (~n²/2⁶⁵ merge probability), and all downstream
    semantics (Jaccard counts, minhash mins, simhash bits) are hash-based
    anyway — the oracle gate cross-checks the string-side computation end
    to end."""
    # The split array MUST be materialized behind a projection boundary
    # before word_ngrams indexes into it: an inline `split(text)` is
    # re-evaluated by every `element_at(ws, i)` inside the transform
    # lambda — O(words²) splits per document (measured: 1 doc × 20k words
    # = 125 s inline vs 0.6 s materialized).  Binding it to an attribute
    # makes codegen evaluate it once per row.
    pre = docs.select("doc_id", words(F.col(text_col)).alias("_ws"))
    ws = F.col("_ws")
    hashed = F.array_distinct(
        F.transform(word_ngrams(ws, n), lambda g: F.xxhash64(g)))
    return pre.filter(F.size(ws) >= n).select("doc_id", hashed.alias("grams"))


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, gram) — the
    exploded form of :func:`shingle_arrays`, still shuffle-FREE (the
    per-doc dedup happens in-row; doc_id is unique per row, so per-doc
    distinct ≡ the old global ``.distinct()``, which shuffled the entire
    exploded corpus — at 100 TB the single largest shuffle in the dedup
    family).  Every downstream shuffle/join/aggregate moves 8-byte longs
    instead of gram strings.

    ``explode_outer``, deliberately: plain ``explode`` triggers
    ``InferFiltersFromGenerate``, whose derived ``size(grams) > 0 AND
    isnotnull(grams)`` predicates substitute the ENTIRE gram expression
    through the projections and get pushed below any upstream exchange —
    measured on decontaminate: the full split+n-gram+hash pipeline
    evaluated twice per row in the pre-repartition scan task (2×5.8 s
    single-task stages), tripling scan-side gram cpu at every scale.
    The outer variant is exempt from that rule, and ``shingle_arrays``
    guarantees non-empty arrays (``size >= n`` filter + in-expression
    guard), so the row sets are identical."""
    return shingle_arrays(docs, n, text_col).select(
        "doc_id", F.explode_outer("grams").alias("gram"))


def jaccard_pairs(sh: DataFrame, tau_x1e4: int) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle.

    Output (d1, d2, inter, union_, jaccard_x1e4) for pairs with
    floor(1e4·J) ≥ tau_x1e4.  Integer-exact → engine-reproducible.

    The self-join key is the shingle string; at corpus scale stop-gram
    skew is the hazard — mitigations: drop shingles with document
    frequency above a cap (hot grams carry no discrimination power) before
    joining, and AQE skew-join handles the rest.  Here the shingle DF is modest.
    """
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("nb"))
    j = (
        inter.join(sa, "d1").join(sb, "d2")
        .withColumn("union_", F.col("na") + F.col("nb") - F.col("inter"))
        .withColumn("jaccard_x1e4",
                    F.floor(F.col("inter") * 10000 / F.col("union_")).cast("long"))
        .filter(F.col("jaccard_x1e4") >= tau_x1e4)
        .select("d1", "d2", F.col("inter").cast("long").alias("inter"),
                F.col("union_").cast("long").alias("union_"), "jaccard_x1e4")
    )
    return j


#: default hot-gram document-frequency cap for prefix candidate generation:
#: bounds every uncapped posting list entering the candidate self-join.
#: Output is provably UNCHANGED at any cap value (see jaccard_pairs_prefix);
#: the cap only partitions the join so per-gram join fan-out is bounded.
DEFAULT_DF_CAP = 65536


def prefix_index(sh: DataFrame, tau_x1e4: int,
                 sizes: DataFrame | None = None) -> DataFrame:
    """PPJoin prefix index: for each doc, the first
    ``|A| - ceil(τ·|A|) + 1`` grams under the global (document-frequency
    asc, gram) order — the rarest grams.  Returns
    (doc_id, gram, n_sh, gram_df); ``gram_df`` rides along so candidate
    generation can partition by hotness.  Pass a precomputed per-doc
    ``sizes`` relation to share the aggregate with the verify tail."""
    tau = tau_x1e4 / 10000.0
    from pyspark.sql import Window

    if sizes is None:
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    gdf = sh.groupBy("gram").agg(F.count("*").alias("gram_df"))
    return (
        sh.join(gdf, "gram")
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("doc_id").orderBy("gram_df", "gram")))
        .join(sizes, "doc_id")
        .filter(F.col("rn") <= F.col("n_sh") - F.ceil(F.lit(tau) * F.col("n_sh")) + 1)
        .select("doc_id", "gram", "n_sh", "gram_df")
    )


#: hard ceiling on the per-gram salt factor (replication is ≤ salt+1 per
#: posting entry, paid only by grams over the df-cap)
MAX_SALT = 16


def _prefix_self_join(ranked: DataFrame, tau: float, df_cap: int) -> DataFrame:
    """Candidate pairs sharing a prefix gram, with the PPJoin length
    filter (τ·|A| ≤ |B| ≤ |A|/τ) — SALTED by gram hotness so no single
    task ever materializes a hot gram's full posting-list self-product.

    Each gram gets a salt factor ``s = min(ceil(gram_df / df_cap),
    MAX_SALT)`` (1 for everything under the cap — zero replication on the
    common path).  Posting entries hash into ``s`` buckets by doc_id and
    the unordered bucket pair (u ≤ v) joins the key: the left side sits
    at its own bucket ``u`` replicated to every ``v ≥ u``, the right side
    at its own bucket ``v`` replicated to every ``u ≤ v``.  A cross-bucket
    pair therefore meets in exactly one task — (min-bucket doc on the
    left, max-bucket doc on the right) — and the within-bucket diagonal
    (u = v) dedups on ``doc_id`` order; ``least``/``greatest`` restore the
    canonical d1 < d2.  Output is provably identical to the unsalted join
    while per-task fan-in drops from ``m`` to ``~m/s`` for a hot gram
    with ``m`` prefix postings."""
    s = F.least(F.ceil(F.col("gram_df") / F.lit(df_cap)),
                F.lit(MAX_SALT)).cast("int")
    b = F.pmod(F.xxhash64("doc_id", F.lit(7)), s).cast("int")
    base = ranked.withColumn("sb", b).withColumn("ss", s)
    left = base.select(
        "doc_id", "gram", "n_sh", F.col("sb").alias("u"),
        F.explode(F.sequence(F.col("sb"), F.col("ss") - 1)).alias("v"))
    right = base.select(
        "doc_id", "gram", "n_sh", F.col("sb").alias("v"),
        F.explode(F.sequence(F.lit(0), F.col("sb"))).alias("u"))
    a, c = left.alias("a"), right.alias("b")
    return (
        a.join(c, (F.col("a.gram") == F.col("b.gram"))
               & (F.col("a.u") == F.col("b.u")) & (F.col("a.v") == F.col("b.v"))
               # off-diagonal tasks pair distinct buckets (hence distinct
               # docs); the diagonal orders by doc_id to emit each pair once
               & ((F.col("a.u") < F.col("a.v"))
                  | (F.col("a.doc_id") < F.col("b.doc_id")))
               & (F.col("b.n_sh") >= F.ceil(F.lit(tau) * F.col("a.n_sh")))
               & (F.col("a.n_sh") >= F.ceil(F.lit(tau) * F.col("b.n_sh"))))
        .select(F.least("a.doc_id", "b.doc_id").alias("d1"),
                F.greatest("a.doc_id", "b.doc_id").alias("d2"))
    )


def jaccard_pairs_prefix(sh: DataFrame, tau_x1e4: int,
                         df_cap: int = DEFAULT_DF_CAP) -> DataFrame:
    """EXACT Jaccard self-join with prefix filtering (PPJoin-style) —
    identical output to `jaccard_pairs`, asymptotically far cheaper.

    Principle: under any global total order of grams, two sets with
    J ≥ τ must share a gram within each set's first
    ``|A| - ceil(τ·|A|) + 1`` grams.  Ordering by (document frequency asc,
    gram) puts the *rarest* grams in the prefix, so the candidate join hits
    tiny posting lists instead of the full gram table — this is what keeps
    the self-join from exploding on stop-grams at corpus scale.  A length
    filter (τ·|A| ≤ |B| ≤ |A|/τ) prunes further.  Candidates are then
    exactly verified on the full shingle sets.

    Hot-gram df-cap (``df_cap``): two mechanisms keep stop-grams from
    concentrating the candidate join, with output UNCHANGED at any cap:

    - *Analytic*: the df-ascending prefix order makes hot grams
      self-evicting — a gram with document frequency ``m`` sorts after
      every rarer gram in every document, so it reaches a document's
      prefix only when that document's grams are ≥ τ hot overall (the
      boilerplate "spill set").  A corpus-wide stop-gram therefore enters
      the prefix index with a posting list of spill-set size, not ``m``
      (asserted by the stop-gram pytest).
    - *Physical*: any gram still over the cap is SALTED in the self-join
      (``_prefix_self_join``) — posting entries bucket by doc_id and the
      bucket pair joins the key, bounding per-task fan-in to ~df_cap
      with exactly-once pair generation.

    Exactness: salting only re-routes which task generates each pair, and
    verification runs on full shingle sets — output is byte-identical to
    the naive all-pairs join."""
    tau = tau_x1e4 / 10000.0
    from pyspark import StorageLevel

    # The shingle relation feeds five consumers (df-rank, prefixes, both
    # verify sides, sizes) — materialize it once instead of re-exploding
    # the corpus per consumer.  NOTE: a lazy operator can never unpersist,
    # so this pins one MEMORY_AND_DISK relation per call for the session
    # lifetime (a no-op if the caller already persisted `sh`).  Acceptable
    # here because this is the bounded/oracle tool invoked once per corpus
    # (the query layer caches its output in `_PAIRS_CACHE`); the unbounded
    # scale path (`minhash_near_dups`) takes pre-persisted arrays instead.
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    cand = (_prefix_self_join(prefix_index(sh, tau_x1e4, sizes=sizes),
                              tau, df_cap)
            .distinct())
    return verify_jaccard_pairs(sh, cand, tau_x1e4, sizes=sizes)


def verify_jaccard_pairs(sh: DataFrame, cand: DataFrame, tau_x1e4: int,
                         sizes: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard restricted to a candidate pair set (d1, d2): compute
    intersections only where a candidate exists — the shared verification
    tail of prefix-filter and MinHash-LSH joins.  Output schema identical
    to `jaccard_pairs`."""
    if sizes is None:
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    s1 = sh.select(F.col("doc_id").alias("d1"), "gram")
    s2 = sh.select(F.col("doc_id").alias("d2"), "gram")
    inter = (
        cand.join(s1, "d1").join(s2, ["d2", "gram"])
        .groupBy("d1", "d2").agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "d1").join(sb, "d2")
        .withColumn("union_", F.col("na") + F.col("nb") - F.col("inter"))
        .withColumn("jaccard_x1e4",
                    F.floor(F.col("inter") * 10000 / F.col("union_")).cast("long"))
        .filter(F.col("jaccard_x1e4") >= tau_x1e4)
        .select("d1", "d2", F.col("inter").cast("long").alias("inter"),
                F.col("union_").cast("long").alias("union_"), "jaccard_x1e4")
    )


# -- MinHash + LSH -----------------------------------------------------------

def minhash_signatures(sh: DataFrame, num_hashes: int = 64) -> DataFrame:
    """k-component MinHash signature per doc from an EXPLODED (doc_id,
    gram) relation, in one shuffle: h_i(gram) = xxhash64(gram, i);
    sig_i = min over grams.  Partial mins combine map-side, so shuffle
    volume is k·8 B/doc.  When the gram sets are still in-row
    (`shingle_arrays`), prefer :func:`minhash_signatures_inrow` — same
    values, zero shuffle."""
    aggs = [F.min(F.xxhash64(F.col("gram"), F.lit(i))).alias(f"mh{i}")
            for i in range(num_hashes)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures_inrow(arrays: DataFrame,
                             num_hashes: int = 64) -> DataFrame:
    """SHUFFLE-FREE MinHash over (doc_id, grams array) rows:
    sig_i = array_min(transform(grams, g → xxhash64(g, i))) — a narrow
    projection, value-identical to `minhash_signatures` over the exploded
    relation (same hash expression, min over the same distinct gram set;
    pytest-gated), with zero Exchange where the grouped form pays an
    explode + 64-column hash-aggregate round trip (measured ~8 s cpu →
    ~1 s at sf0.1).  The transform lambda binds ELEMENTS, not an indexed
    array, so the O(n²) codegen re-evaluation hazard does not apply."""
    def mh(i: int):
        # NB: the lambda must be unary — pyspark's `transform` inspects
        # lambda arity and a second parameter would be bound to the array
        # INDEX, silently replacing the hash seed
        return F.array_min(F.transform(
            F.col("grams"), lambda g: F.xxhash64(g, F.lit(i)))).alias(f"mh{i}")

    return arrays.select("doc_id", *[mh(i) for i in range(num_hashes)])


def band_buckets(sig: DataFrame, bands: int = 16, rows: int = 4) -> DataFrame:
    """(doc_id, band, bh) — each doc's LSH band buckets: the signature is
    scanned ONCE (one projection + posexplode, not a `bands`-way union)
    and the bucket key (band, bucket-hash) is uniform by construction.
    This relation IS the reusable LSH index: persist/store it per corpus
    and `incremental_near_dups` joins each incoming batch against it."""
    num = bands * rows
    cols = [f"mh{i}" for i in range(num)]
    assert all(c in sig.columns for c in cols), "signature too narrow for banding"
    band_hashes = F.array(*[
        F.xxhash64(*[F.col(c) for c in cols[b * rows:(b + 1) * rows]])
        for b in range(bands)
    ])
    return sig.select("doc_id", F.posexplode(band_hashes).alias("band", "bh"))


def lsh_candidate_pairs(sig: DataFrame, bands: int = 16, rows: int = 4) -> DataFrame:
    """Band the signature (bands × rows = num_hashes); docs sharing any
    band bucket become candidate pairs (d1 < d2, distinct).  The
    self-join shuffle key is skew-free (see :func:`band_buckets`)."""
    buckets = band_buckets(sig, bands, rows)
    a, b_ = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(b_, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


def minhash_near_dups(docs: DataFrame, tau_x1e4: int = 7000, n: int = 3,
                      num_hashes: int = 64, bands: int = 16, rows: int = 4,
                      text_col: str = "text",
                      sh: DataFrame | None = None,
                      arrays: DataFrame | None = None) -> DataFrame:
    """MinHash LSH candidates, then EXACT Jaccard verification — output
    matches `jaccard_pairs` restricted to LSH-found candidates.  For
    τ = 1.0 (identical shingle sets) recall is exact: identical sets ⇒
    identical signatures ⇒ same buckets.

    Default path: build the IN-ROW gram-array relation, so signatures and
    set sizes are shuffle-free narrow projections and only pair-finding
    (bucket join + candidate verify) touches the exploded form.  The
    relation is NOT persisted here (a lazy operator can never unpersist,
    so an internal persist would leak a session-lifetime cached subtree
    per invocation — ADVICE r4); the plan references it 3× (signatures,
    explode, sizes), so callers running this more than once or caring
    about the 3× narrow-map recompute should pass a pre-persisted
    ``arrays`` (:func:`shingle_arrays`) and own its unpersist.  A
    pre-persisted exploded ``sh`` (e.g. the token-table path) selects the
    grouped-signature formulation — all three produce identical output."""
    if sh is not None:
        cand = lsh_candidate_pairs(minhash_signatures(sh, num_hashes),
                                   bands, rows)
        # exact verification only over candidates — never the all-pairs join
        return verify_jaccard_pairs(sh, cand, tau_x1e4)
    if arrays is None:
        arrays = shingle_arrays(docs, n, text_col)
    sig = minhash_signatures_inrow(arrays, num_hashes)
    # explode_outer: dodge InferFiltersFromGenerate's whole-expression
    # pushdown (see `shingles`); arrays rows are non-empty by construction
    sh_x = arrays.select("doc_id", F.explode_outer("grams").alias("gram"))
    sizes = arrays.select("doc_id", F.size("grams").cast("long").alias("n_sh"))
    cand = lsh_candidate_pairs(sig, bands, rows)
    return verify_jaccard_pairs(sh_x, cand, tau_x1e4, sizes=sizes)


def incremental_near_dups(corpus: DataFrame, new_docs: DataFrame,
                          tau_x1e4: int = 7000, n: int = 3,
                          num_hashes: int = 64, bands: int = 16,
                          rows: int = 4, text_col: str = "text",
                          corpus_buckets: DataFrame | None = None,
                          new_arrays: DataFrame | None = None,
                          corpus_arrays: DataFrame | None = None) -> DataFrame:
    """Near-dups INTRODUCED by an incoming batch: every pair (d1 < d2,
    exact Jaccard ≥ τ) over corpus ∪ batch where at least one side is a
    batch doc — identical to ``minhash_near_dups`` over the union
    restricted to batch-touching pairs (the restriction is driver-gated
    against the full exact pair set).

    This is the continuous-ingestion form of the dedup family, and the
    distributed analog of the reference's incremental-growth semantics
    (DCF/dynamic_cuckoo_filter.h:333-363 — new elements absorb into a
    structure that only grows): per ingest, the engine computes shingle
    arrays and signatures for the BATCH ONLY and joins its band buckets
    against the corpus's stored bucket index (pass ``corpus_buckets`` —
    e.g. a persisted/Iceberg-backed :func:`band_buckets` relation — to
    skip recomputing it).

    Exact verification is IN-ROW: candidates join the per-doc gram-array
    relations and Jaccard is ``size(array_intersect(g1, g2))`` — no
    exploded-shingle shuffle, no corpus text re-shingle, and the
    candidate subtree is referenced exactly ONCE (an earlier left-semi
    formulation referenced it three times, tripling the bucket-join cpu —
    the unmaterialized-subtree re-execution trap in CLAUDE.md).  Per
    ingest the moving data is batch bands + colliding index buckets +
    candidate-joined arrays, never corpus-sized.  Doc ids must be unique
    across corpus ∪ batch.  All three relation inputs are overridable
    (``corpus_buckets``, ``new_arrays``, ``corpus_arrays``) so callers
    holding a stored index / shared gram-array cache avoid recomputation —
    per-doc shingling commutes with row filters, so a filtered slice of a
    cached array relation is exact."""
    if new_arrays is None:
        new_arrays = shingle_arrays(new_docs, n, text_col)
    if corpus_arrays is None:
        corpus_arrays = shingle_arrays(corpus, n, text_col)
    new_buckets = band_buckets(
        minhash_signatures_inrow(new_arrays, num_hashes), bands, rows)
    if corpus_buckets is None:
        corpus_buckets = band_buckets(
            minhash_signatures_inrow(corpus_arrays, num_hashes), bands, rows)
    all_buckets = corpus_buckets.unionByName(new_buckets)
    a, b_ = new_buckets.alias("a"), all_buckets.alias("b")
    cand = (
        a.join(b_, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.doc_id") != F.col("b.doc_id")))
        .select(F.least("a.doc_id", "b.doc_id").alias("d1"),
                F.greatest("a.doc_id", "b.doc_id").alias("d2"))
        .distinct()
    )
    ar = corpus_arrays.unionByName(new_arrays)
    a1 = ar.select(F.col("doc_id").alias("d1"), F.col("grams").alias("g1"))
    a2 = ar.select(F.col("doc_id").alias("d2"), F.col("grams").alias("g2"))
    inter = F.size(F.array_intersect("g1", "g2")).cast("long")
    na, nb = F.size("g1").cast("long"), F.size("g2").cast("long")
    return (
        cand.join(a1, "d1").join(a2, "d2")
        .select("d1", "d2", inter.alias("inter"),
                (na + nb - inter).alias("union_"))
        .withColumn("jaccard_x1e4",
                    F.floor(F.col("inter") * 10000 / F.col("union_"))
                    .cast("long"))
        .filter(F.col("jaccard_x1e4") >= tau_x1e4)
    )


# -- SimHash ----------------------------------------------------------------

def simhash(sh: DataFrame, nbits: int = 64) -> DataFrame:
    """Per-doc SimHash: sum ±1 per bit of each shingle's 64-bit hash, take
    signs.  One groupBy with nbits conditional sums (map-side combined)."""
    h = F.xxhash64(F.col("gram"))
    aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(nbits)
    ]
    per_bit = sh.groupBy("doc_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(nbits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        )
    return per_bit.select("doc_id", sig.alias("simhash"))


def simhash_inrow(arrays: DataFrame, nbits: int = 64) -> DataFrame:
    """SHUFFLE-FREE SimHash over (doc_id, grams array) rows — value-
    identical to :func:`simhash` over the exploded relation (pytest-
    gated): per bit, sign of (ones − zeros) = 2·|{g : bit set}| − |grams|.
    Each gram is re-hashed ONCE behind a projection boundary (`_hs`), then
    the nbits sign tests are `size(filter(...))` passes over the bound
    array — narrow projections, zero Exchange, no per-bit re-hashing."""
    pre = arrays.select(
        "doc_id", F.size("grams").alias("_n"),
        F.transform("grams", lambda g: F.xxhash64(g)).alias("_hs"))
    hs, n = F.col("_hs"), F.col("_n")

    def bit(i: int):
        ones = F.size(F.filter(
            hs, lambda h: F.shiftrightunsigned(h, i)
            .bitwiseAND(F.lit(1)) == 1))
        return F.when(2 * ones - n > 0,
                      F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)

    sig = F.lit(0).cast("long")
    for i in range(nbits):
        sig = sig.bitwiseOR(bit(i))
    return pre.select("doc_id", sig.alias("simhash"))


def simhash_candidates(sig: DataFrame, max_hamming: int = 3,
                       chunks: int = 4) -> DataFrame:
    """Near-dup candidates by Hamming distance: band the 64-bit simhash
    into `chunks` 16-bit pieces; distance ≤ chunks-1 guarantees one exact
    chunk match (pigeonhole) → join per chunk, then exact popcount filter.
    Single-scan posexplode, same shape as `lsh_candidate_pairs`."""
    width = 64 // chunks
    mask = (1 << width) - 1
    piece_arr = F.array(*[
        F.shiftrightunsigned("simhash", c * width).bitwiseAND(F.lit(mask))
        for c in range(chunks)
    ])
    parts = sig.select("doc_id", F.col("simhash"),
                       F.posexplode(piece_arr).alias("chunk", "piece"))
    a, b = parts.alias("a"), parts.alias("b")
    cand = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.piece") == F.col("b.piece"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"),
                F.col("a.simhash").alias("s1"), F.col("b.simhash").alias("s2"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("d1", "d2", F.col("hamming").cast("long").alias("hamming"))
    )


# -- passage-level dedup ------------------------------------------------------

def passage_dedup(docs: DataFrame, passage_words: int = 10,
                  min_count: int = 2, text_col: str = "text") -> DataFrame:
    """Cross-document PASSAGE dedup (RefinedWeb/CCNet line-dedup analog at
    a fixed word granularity): cut every document into consecutive
    ``passage_words``-word passages, find passages occurring ≥
    ``min_count`` times corpus-wide, and rebuild each document with those
    boilerplate passages removed.  Complements whole-doc dedup (exact /
    MinHash) — it strips repeated fragments (headers, license blocks,
    navigation chrome) out of otherwise-unique documents.

    Output: (doc_id, n_passages, n_dup, cleaned_digest) where
    ``cleaned_digest`` is the md5 of the surviving passages joined in
    original order — a value-exact proof of the cleaned text without
    shipping it.

    Scale design (100 TB story):
    - Passage construction is NARROW and in-row (``slice`` over a bound
      split column — see the quadratic-split hazard note on
      ``word_ngrams``); nothing is exploded until passages are hashed.
    - Duplicate discovery is ONE map-side-combinable count on the 8-byte
      ``xxhash64`` passage digest — the shuffle moves (long, count)
      pairs, never passage text, and hash keys are uniform so the
      aggregation is skew-free by construction.
    - The per-doc duplicate-set join keys on the digest; the duplicate
      table is the output of a HAVING-count aggregate (boilerplate ≪
      corpus), so AQE broadcasts it on the common path.  The final
      doc_id join attaches each doc's (tiny) dup-digest array back to
      the original row, and the rebuild is again in-row: text re-enters
      no shuffle when the dup side broadcasts.
    - 64-bit digest collisions merge distinct passages with probability
      ~n²/2⁶⁵ (same argument as ``shingles``); the oracle gate
      cross-checks the string-side computation end to end.
    """
    pre = docs.select("doc_id", words(F.col(text_col)).alias("_ws"))
    ws = F.col("_ws")
    npass = F.ceil(F.size(ws) / F.lit(passage_words)).cast("int")
    pl = F.transform(
        F.sequence(F.lit(1), npass),
        lambda i: F.array_join(
            F.slice(ws, (i - 1) * passage_words + 1, passage_words), " "))
    pre = pre.select("doc_id", pl.alias("_pl"))

    exploded = pre.select(
        "doc_id",
        F.explode(F.transform("_pl", lambda p: F.xxhash64(p))).alias("digest"))
    dup = (exploded.groupBy("digest").agg(F.count("*").alias("cnt"))
           .filter(F.col("cnt") >= min_count).select("digest"))
    doc_dups = (exploded.join(dup, "digest")
                .groupBy("doc_id")
                .agg(F.collect_set("digest").alias("_dup")))

    joined = pre.join(doc_dups, "doc_id", "left")
    kept = F.filter(
        F.col("_pl"),
        lambda p: ~F.coalesce(
            F.array_contains(F.col("_dup"), F.xxhash64(p)), F.lit(False)))
    staged = joined.select(
        "doc_id", F.size("_pl").cast("long").alias("n_passages"),
        kept.alias("_kept"))
    return staged.select(
        "doc_id", "n_passages",
        (F.col("n_passages") - F.size("_kept")).cast("long").alias("n_dup"),
        F.md5(F.encode(F.array_join("_kept", " "), "UTF-8"))
        .alias("cleaned_digest"))


# -- token-sequence shingles (input_hint table) -------------------------------

def token_shingle_arrays(df: DataFrame, n: int = 3,
                         tokens_col: str = "tokens",
                         id_col: str = "doc_id") -> DataFrame:
    """(doc_id, grams: array<bigint>) over the north-rule token table
    ``(doc_id, tokens:array<int32>, ...)`` — the token-ID analog of
    :func:`shingle_arrays`: distinct in-row token-n-gram hashes, not yet
    exploded, so MinHash signatures and set sizes stay shuffle-free.

    ``gram`` is ``xxhash64(t_i, …, t_{i+n-1})`` computed in-row over a
    BOUND tokens column (see the quadratic re-evaluation hazard on
    ``word_ngrams``), deduped narrow via ``array_distinct``."""
    pre = df.select(id_col, F.col(tokens_col).alias("_ts"))
    ts = F.col("_ts")
    idx = F.sequence(F.lit(1), F.size(ts) - (n - 1))
    raw = F.array_distinct(F.transform(
        idx, lambda i: F.xxhash64(*[F.element_at(ts, i + j) for j in range(n)])))
    # short-row guard MUST live inside the expression, not just in the
    # relational filter below: InferFiltersFromGenerate copies
    # size(grams) > 0 next to the size(ts) >= n conjunct when the array
    # is later exploded, and codegen subexpression elimination evaluates
    # it on UNFILTERED rows — where sequence(1, 0) DESCENDS to [1, 0]
    # (not an empty range) and element_at walks out of bounds.  Same
    # guard shape as text.word_ngrams.
    grams = F.when(F.size(ts) >= n, raw).otherwise(
        F.array().cast("array<bigint>"))
    return pre.filter(F.size(ts) >= n).select(id_col, grams.alias("grams"))


def token_shingles(df: DataFrame, n: int = 3, tokens_col: str = "tokens",
                   id_col: str = "doc_id") -> DataFrame:
    """Exploded (doc_id, gram) form of :func:`token_shingle_arrays` —
    feeds the same MinHash / LSH / verify machinery as text dedup so
    near-dup detection runs directly on pre-tokenized training sequences
    (no text detour); shuffle-free, downstream joins move 8-byte longs.
    ``explode_outer`` for the same InferFiltersFromGenerate pushdown
    reason as :func:`shingles` (arrays non-empty by construction)."""
    return token_shingle_arrays(df, n, tokens_col, id_col).select(
        id_col, F.explode_outer("grams").alias("gram"))
