"""Deduplication operators for web-scale corpora.

Exact dedup is a hash-groupBy; near-dup families are MinHash+LSH, SimHash,
and n-gram Jaccard. All signature computation stays JVM-side (built-in
array/hash functions over shingle arrays — no Python UDFs); candidate
generation uses LSH band-bucket joins so the pairwise comparison is
O(collisions), never O(n^2) — at 10^10 documents the banded self-join is
the only feasible shape, and each band bucket is a shuffle key, so skewed
buckets are handled by AQE skew-join.

The reference has no dedup operators (its distinct() is plain DISTINCT,
/root/reference/src/datachain/query/dataset.py:1793-1805); these are the
training-data-pipeline extensions the build brief requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 2^31-1: keeps a*h+b far below int64 overflow under ANSI mode while
# leaving minhash collision probability ~1/2^31 per permutation
MERSENNE = (1 << 31) - 1


def normalize_for_dedup(text: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Signature computation is CPU-bound, and Spark gives a scan only as
    many tasks as input splits — a small corpus in one parquet file would
    run the whole shingling/hashing stage on ONE core. Spread by key when
    the scan has fewer partitions than the cluster's parallelism; the one
    extra shuffle of raw text is noise next to per-shingle hashing (and at
    real scale the scan already has thousands of splits, so this is a
    no-op: the condition is partition-count metadata, no job)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *cols)
    return df


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per identical (normalized) text.
    One hash-shuffle on the fingerprint; partial aggregation map-side."""
    fp = F.md5(normalize_for_dedup(F.col(text_col)))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__fp", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def sliding_ngrams(toks: Column, n: int, k: Column) -> Column:
    """Space-joined word n-grams of a token array (`k` = size(toks)-(n-1),
    must be >= 1), extracted by ONE codegen regex pass over the
    space-joined token string: the lookahead captures each overlapping
    n-token window while consuming a single token per match, yielding
    exactly the size-n+1 n-grams in order. PRECONDITION: tokens are
    non-empty and whitespace-free — true of every construction path in
    this package (regex token classes exclude ``\\s``; the split paths
    split a trimmed single-space-collapsed string), making
    ``array_join(toks, ' ')`` a reversible encoding.

    This replaces a chain of n zip_with over shifted slices: higher-order
    functions are CodegenFallback, so the chain ran its concat lambda
    through interpreted expression trees per element and allocated n
    intermediate arrays per row. Corpus-wide exact array equality was
    verified for n in {2,3,5,13,50} before adopting; the n-gram-heavy
    queries sped up where shingling dominates (minhash 0.62s -> 0.46s at
    the 10x profile replica) and none regressed. (The earlier trap still
    documented for history: NEVER capture `toks` inside a transform
    lambda — an outer expression captured in a higher-order-function
    lambda is re-evaluated PER ELEMENT, measured 6.7x slower.)"""
    if n == 1:
        return F.slice(toks, 1, k)
    pat = r"(?=((?:\S+ ){%d}\S+))\S+" % (n - 1)
    return F.regexp_extract_all(F.array_join(toks, " "), F.lit(pat), 1)


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct), JVM-side via slice/zip_with.
    Documents with fewer than n tokens yield an empty array — the guard
    matters because Spark's sequence(1, 0) DESCENDS to [1, 0] and
    slice(_, 0, _) throws."""
    toks = F.split(normalize_for_dedup(text), " ")
    k = F.size(toks) - (n - 1)
    empty = F.array().cast("array<string>")
    return F.when(k >= 1, F.array_distinct(sliding_ngrams(toks, n, k))).otherwise(empty)


def _base_hash(s: Column, hash_mode: str) -> Column:
    """Per-shingle/token hash in [0, MERSENNE). `xxhash64` is the fast
    production path; `md5` (first 15 hex chars as int) is bit-identical in
    DuckDB — CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) — so the driver
    oracle can recompute signatures from first principles."""
    if hash_mode == "xxhash64":
        return F.pmod(F.xxhash64(s), F.lit(MERSENNE))
    if hash_mode == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"), F.lit(MERSENNE)
        )
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def minhash_from_base(base: Column, num_hashes: int = 32) -> Column:
    """MinHash signature from a materialized base-hash array: per
    permutation i, min over (a_i * h + b_i) mod M. The a/b constants are
    fixed odd integers so signatures are deterministic everywhere."""
    sigs = []
    for i in range(num_hashes):
        a = 2 * i + 1  # odd
        b = 104729 * (i + 1)
        sigs.append(
            F.coalesce(
                F.array_min(F.transform(base, lambda h: F.pmod(h * a + b, F.lit(MERSENNE)))),
                F.lit(MERSENNE),
            )
        )
    return F.array(*sigs)


def minhash_signature(
    text: Column, num_hashes: int = 32, n: int = 3, hash_mode: str = "xxhash64"
) -> Column:
    """MinHash signature straight from text. NOTE: when used in a single
    projection this recomputes the shingle array per permutation (Catalyst
    does not CSE across higher-order functions) — prefer materializing the
    base hashes in a separate projection (see minhash_lsh_pairs, which is
    32x faster that way)."""
    sh = shingles(text, n)
    base = F.transform(sh, lambda s: _base_hash(s, hash_mode))
    return minhash_from_base(base, num_hashes)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.6,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH over MinHash.

    rows/bands hashes per band; a pair collides if any band matches.
    Verified pairs carry `n_match` (matching minhash components, an exact
    int) and the estimated Jaccard. Self-join is on (band_id, band_hash) —
    never all-pairs.

    Oracle-equivalence guarantee (what makes this DuckDB-verifiable): when
    (1 - threshold) * num_hashes < bands, any pair with est_jaccard >=
    threshold has fewer mismatching components than bands, so by
    pigeonhole at least one band matches completely and the pair is
    ALWAYS a candidate — the banded output equals brute-force all-pairs
    filtered by threshold, exactly. With hash_mode='md5' the signatures
    themselves are DuckDB-reproducible, closing the loop."""
    rows_per_band = num_hashes // bands
    # two projection stages: materialize the per-shingle base hashes ONCE,
    # then take the 32 permutation-mins over that array — Catalyst does not
    # CSE subexpressions across higher-order functions, so a single-stage
    # formulation recomputes shingling per permutation (measured 10x slower)
    base = _spread(df, id_col).select(
        F.col(id_col).alias("id"),
        F.transform(shingles(F.col(text_col), n), lambda s: _base_hash(s, hash_mode)).alias("_base"),
    )
    sig = base.select("id", minhash_from_base(F.col("_base"), num_hashes).alias("sig"))
    # band key = variadic xxhash64 over the band's signature components
    # indexed directly — no transform/cast-to-string/array_join tree (the
    # old string fold was ~3x the expression cost; any collision only adds
    # a CANDIDATE, which the exact n_match verification below filters, so
    # the pigeonhole oracle-equivalence is unaffected)
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows_per_band + j] for j in range(rows_per_band)]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.bh")
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    n_match = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda x: x)
    )
    return (
        cand.withColumn("n_match", n_match)
        .withColumn("est_jaccard", F.col("n_match") / F.lit(float(num_hashes)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "n_match", "est_jaccard")
    )


def simhash(text: Column, bits: int = 64, n: int = 1, hash_mode: str = "xxhash64") -> Column:
    """SimHash: sign-sum of token-hash bits. Computed JVM-side by summing
    (+1/-1) per bit over the token array with aggregate(). With
    hash_mode='md5' the token hash has 60 random bits (15 md5 hex chars);
    pass bits=60 so every voted bit is meaningful — hamming distances are
    then DuckDB-reproducible from first principles."""
    toks = F.array_distinct(F.split(normalize_for_dedup(text), " "))
    if hash_mode == "md5":
        hashes = F.transform(
            toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        )
    else:
        hashes = F.transform(toks, lambda t: F.xxhash64(t))
    out = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        # JVM shiftleft(1L, 63) wraps to Long.MIN_VALUE — exactly the bit we want
        out = out.bitwiseOR(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return out


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 16-bit chunks (a pair within
    hamming distance 3 must agree on at least one chunk — pigeonhole), then
    verify exact hamming distance with bit_count(xor). Because max_hamming
    < number of chunks, blocking has 100% recall: the output is EXACTLY
    all pairs with hamming <= max_hamming, so a brute-force oracle
    (DuckDB all-pairs over the same signatures, hash_mode='md5') matches
    value-for-value."""
    bits = 60 if hash_mode == "md5" else 64
    df = _spread(df, id_col)
    h = df.select(
        F.col(id_col).alias("id"),
        simhash(F.col(text_col), bits=bits, hash_mode=hash_mode).alias("sh"),
    )
    chunks = h.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("sh", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("id", "sh", "ck.chunk", "ck.cv")
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs by iterative min-label
    propagation: every node starts labeled with itself; each round a node
    takes the minimum label in its neighborhood; converged when no label
    changes. Returns (id, component) with component = min node id of the
    cluster.

    Scale shape: each iteration is one equi-join + one min-aggregation
    over the EDGE list — O(E) shuffle, no all-pairs, no driver-side graph.
    Iteration count is bounded by the cluster diameter, and near-dup
    clusters are shallow (dozens of docs, diameter a handful), so this
    converges in a few rounds at any corpus size; localCheckpoint per
    round truncates the lineage so plans stay flat. (The alternating
    large-star/small-star variant halves rounds on pathological chains;
    plain min-propagation is the right trade for near-dup graphs.)"""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("new_component") != F.col("component")).count()
        labels = updated.select("id", F.col("new_component").alias("component"))
        if changed == 0:
            break
    else:
        # exhausted max_iters with labels still moving: the labels are WRONG
        # (a component of diameter > max_iters is still split); surface it
        # loudly rather than silently keeping extra "duplicates".
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iters} iterations "
            f"({changed} labels still changing); returned components are split. "
            "Raise max_iters (diameter-bounded) for long near-dup chains.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def near_dup_cluster_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The full near-dup DEDUP (not just pair finding): MinHash+LSH pairs
    -> connected components -> keep the minimum-id document per cluster
    (plus every unpaired document). This is the operator a 100 TB corpus
    pipeline actually runs; pairs alone are an intermediate."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, threshold=threshold, hash_mode=hash_mode)
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 1000,
    algo: str = "index",
) -> DataFrame:
    """Exact n-gram Jaccard over LSH-free inverted-index candidates:
    explode shingles, self-join on shingle (the inverted index), count
    shared shingles per pair, then |A∩B| / (|A|+|B|-|A∩B|).

    `max_df` drops shingles appearing in more than that many documents
    BEFORE the self-join — the standard stop-shingle cap. Without it one
    ubiquitous shingle ("in the of" at corpus scale) yields a quadratic
    posting-list join: df docs sharing a shingle produce df^2/2 joined
    rows. Dropped hot shingles only LOWER a pair's computed intersection
    (denominator still uses full sizes), so the result under-reports
    similarity driven purely by boilerplate shingles — the accepted
    trade-off of the technique. Candidate set is bounded by
    sum(df_g^2) over kept shingles, never all-pairs.

    Plan shape: shingles join by their 64-bit xxhash64, not the string —
    the shuffles ship 8 bytes/row and the join compares longs (collision
    odds ~|shingles|^2/2^64, immaterial for counting). The exploded rows
    shuffle exactly once (by shingle, for the self-join); per-doc set
    sizes aggregate with map-side combine and join onto the tiny PAIRS
    output, and AQE broadcasts the stop-shingle side when it is small.

    `algo` picks the candidate generator:
    - 'index' (default): plain inverted-index self-join over every kept
      shingle + count of shared shingles per pair. Fewer stages; measured
      ~2x faster at sf0.1 (6-11s cold vs 14-20s) where the corpus is small
      enough that prefix filtering's extra shuffle chain (doc_freq join,
      rare-first sort, candidate distinct, verify joins) costs more than
      the join rows it saves.
    - 'prefix': PPJoin-style prefix filtering (Xiao et al.,
      WWW'08; Vernica et al., SIGMOD'10 for the MapReduce shape). Each
      kept set is put in a global rare-first canonical order (ascending
      document frequency, ties by hash); for threshold t only the first
      |A| - ceil(t*|A|) + 1 elements of each set are exploded into the
      inverted index — two sets with J >= t MUST share a prefix element,
      so the self-join output shrinks from sum(df_g^2) over ALL shingles
      to the rare prefix only. A length filter (min size >= ceil(t*max
      size), valid because inter >= t*max(|A'|,|B'|)) prunes inside the
      join condition, and survivors are verified exactly with one
      array_intersect over the two sorted kept arrays — exact, not
      approximate. The win appears at corpus scale where posting lists
      are long and sum(df_g^2) dominates; use it there.
    Both return identical results; the exactness tests run both."""
    # Shape notes (re-measured this round, warm best-of-4 at sf0.1):
    # - per-doc sizes come from a map-side-combined groupBy(id) and join
    #   onto the TINY pairs output at the end — the exploded rows shuffle
    #   exactly once (by g, for the self-join). Broadcasting sizes onto
    #   the exploded rows before the join (the previous shape) forces an
    #   eager extra pass over the explode AND cannot scale: |sizes| =
    #   |docs|, and you can't broadcast a billion doc sizes. 0.95s vs
    #   2.5s here, and strictly better at corpus scale.
    # - no forced F.broadcast on the stop-shingle anti join: AQE picks
    #   broadcast when the hot side is small; forcing it serializes an
    #   extra eager job (3.5s vs 2.5s).
    # - rejected: size(arr)+explode(arr) in one projection (re-evaluates
    #   the interpreted shingle expr per output row, 3.3s) and window
    #   count-by-g doc freq (one viral shingle's rows land on one task —
    #   skew-unsafe at corpus scale).
    sh0 = _spread(df, id_col).select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), n)).alias("g")
    ).select("id", F.xxhash64("g").alias("g"))
    sizes = sh0.groupBy("id").agg(F.count("*").alias("sz"))
    doc_freq = sh0.groupBy("g").agg(F.count("*").alias("__df"))
    sh = sh0
    if max_df is not None:
        sh = sh.join(doc_freq.filter(F.col("__df") > max_df), "g", "left_anti")

    if algo == "prefix":
        inter = _prefix_filtered_intersections(
            sh.join(sizes, "id"), doc_freq, threshold
        )
    elif algo == "index":
        l, r = sh.alias("l"), sh.alias("r")
        inter = (
            l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
            .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .agg(F.count("*").alias("inter"))
            .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
            .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        )
    else:
        raise ValueError(f"algo must be 'prefix' or 'index', got {algo!r}")
    return (
        inter.withColumn(
            "jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _prefix_filtered_intersections(
    sh: DataFrame, doc_freq: DataFrame, threshold: float
) -> DataFrame:
    """Candidate pairs via prefix filtering + exact array_intersect verify.

    Soundness (so the result is EXACT, matching the full inverted index):
    for kept sets A', B' with J'(A',B') >= t, inter >= t*(|A|+|B|-inter)
    >= t*|A'| and likewise >= t*|B'| (full sizes |A|>=|A'|). Hence
    (1) inter >= ceil(t*max(|A'|,|B'|)) — so min(|A'|,|B'|) >=
        ceil(t*max(...)): the length filter in the join condition;
    (2) A' must contribute one of its first |A'| - ceil(t*|A'|) + 1
        elements in ANY global total order shared with B' (the classic
        prefix lemma) — the rare-first order (ascending doc frequency)
        makes those contributed elements the LOW-df ones, so the
        self-join's sum(prefix_df^2) collapses.
    Verification is one O(|A'|+|B'|) array_intersect per surviving pair,
    JVM-side. The doc_freq join for the canonical order is plain (AQE
    broadcasts it when the vocabulary is small; at corpus scale it is a
    shuffle join on the 8-byte shingle hash)."""
    karr = (
        sh.join(doc_freq, "g")
        .groupBy("id", "sz")
        .agg(F.sort_array(F.collect_list(F.struct("__df", "g"))).alias("sg"))
        .select(
            "id",
            "sz",
            F.transform("sg", lambda s: s["g"]).alias("kept"),
            F.size("sg").alias("ksz"),
        )
    )
    plen = F.col("ksz") - F.ceil(F.lit(threshold) * F.col("ksz")).cast("int") + F.lit(1)
    pref = karr.select(
        "id", "ksz", F.explode(F.slice("kept", F.lit(1), plen)).alias("g")
    )
    l, r = pref.alias("l"), pref.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.g") == F.col("r.g"))
            & (F.col("l.id") < F.col("r.id"))
            & (F.col("l.ksz") >= F.ceil(F.lit(threshold) * F.col("r.ksz")))
            & (F.col("r.ksz") >= F.ceil(F.lit(threshold) * F.col("l.ksz"))),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    ka = karr.select(
        F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), F.col("kept").alias("__ka")
    )
    kb = karr.select(
        F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), F.col("kept").alias("__kb")
    )
    return (
        cand.join(ka, "id_a")
        .join(kb, "id_b")
        .select(
            "id_a",
            "sz_a",
            "id_b",
            "sz_b",
            F.size(F.array_intersect("__ka", "__kb")).alias("inter"),
        )
    )


def incremental_dedup(
    new_df: DataFrame,
    registry_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    update: bool = True,
    job_id: str = "incremental_dedup",
    batch_id: int | None = None,
) -> DataFrame:
    """Streaming-corpus exact dedup: drop documents whose (normalized)
    content fingerprint already exists in a persistent FINGERPRINT
    REGISTRY, and register the survivors — the op a CDC-fed training
    corpus runs on every ingest batch.

    The registry is a bucketed LakeTable keyed by the 8-byte xxhash64
    fingerprint (16 bytes/doc — ~1.6 TB of registry for 10^11 docs, vs
    re-scanning a 100 TB corpus per batch). The check is bucket-pruned:
    the batch's fingerprints touch at most num_buckets buckets, and only
    THOSE registry buckets are read for the anti-join — batch-sized work,
    not corpus-sized. Within-batch duplicates keep the lowest id (one
    fingerprint shuffle). With `job_id`/`batch_id`, registry updates ride
    the lake's exactly-once ledger: replaying a committed batch re-filters
    (idempotent reads) but never double-registers.
    """
    from datachain_spark.lake.table import LakeTable

    spark = new_df.sparkSession
    fp_schema = T.StructType([T.StructField("fp", T.LongType(), False)])
    if LakeTable.exists(registry_root):
        reg = LakeTable(registry_root)
    else:
        reg = LakeTable.create(
            registry_root, fp_schema, key_cols=["fp"], num_buckets=num_buckets
        )

    fp = F.xxhash64(normalize_for_dedup(F.col(text_col)))
    batch = new_df.withColumn("_fp", fp)
    # within-batch keep-first: one shuffle on the fingerprint
    w = Window.partitionBy("_fp").orderBy(id_col)
    firsts = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # bucket-pruned registry read: collect() is bounded by num_buckets ints
    touched = [
        r[0]
        for r in firsts.select(
            F.pmod("_fp", F.lit(reg.num_buckets)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    ]
    # raw segment read (no LWW window): anti-join needs fp EXISTENCE only,
    # and duplicate fps on the build side of a left_anti are free — the
    # resolve pass would add a window shuffle per batch for nothing.
    # A REPLAYED committed batch time-travels to the registry state just
    # before its own commit, so resume returns the SAME survivors it
    # returned the first time instead of filtering them against themselves.
    snap = reg.snapshot()
    if batch_id is not None and reg.batch_committed(job_id, batch_id):
        for v in reg.versions():
            led = reg.snapshot(v).ledger
            if led and led.get("job_id") == job_id and led.get("batch_id") == batch_id:
                snap = reg.snapshot(v - 1) if v > reg.versions()[0] else None
                break
        if snap is None:  # this batch made the very first commit
            return firsts.drop("_fp")
    known = reg._read_raw(
        spark, snap, [b for b in touched if b in snap.buckets]
    ).select("fp")
    survivors = firsts.join(known, firsts["_fp"] == known["fp"], "left_anti")
    if update:
        # the registry write below is one action and the caller's read is
        # another — persist so the scan+hash+anti-join runs once per batch
        survivors = survivors.persist()

    if update and not (
        batch_id is not None and reg.batch_committed(job_id, batch_id)
    ):
        import os
        import uuid

        out_dir = reg.data_dir(f"dedup={uuid.uuid4().hex[:8]}")
        (
            survivors.select(F.col("_fp").alias("fp"))
            .withColumn("__bucket", F.pmod("fp", F.lit(reg.num_buckets)).cast("int"))
            .repartition("__bucket")
            .write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(out_dir)
        )
        appends: dict[int, list[str]] = {}
        for d in sorted(os.listdir(out_dir)):
            if not d.startswith("__bucket="):
                continue
            b = int(d.split("=")[1])
            appends[b] = [
                os.path.relpath(os.path.join(out_dir, d, f), reg.root)
                for f in sorted(os.listdir(os.path.join(out_dir, d)))
                if f.endswith(".parquet")
            ]
        ledger = (
            {"job_id": job_id, "batch_id": int(batch_id)}
            if batch_id is not None
            else None
        )
        if appends:
            reg.commit(append_bucket_files=appends, ledger=ledger)
        elif ledger:
            reg.commit(ledger=ledger)
    return survivors.drop("_fp")


def run_dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    registry_root: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: T.StructType,
    text_col: str = "text",
    id_col: str = "doc_id",
    job_id: str = "dedup_stream",
    max_files_per_trigger: int = 4,
) -> list[dict]:
    """Streaming corpus ingest with exactly-once dedup: a file-source
    stream of document batches flows through incremental_dedup per
    microbatch; survivors land in epoch-keyed parquet dirs. Restarting
    with the same checkpoint resumes where it left off — already-ingested
    documents stay deduped because the REGISTRY persists across runs,
    and a replayed epoch is safe end-to-end: Structured Streaming
    re-delivers the identical file set, incremental_dedup time-travels to
    its pre-commit registry state (same survivors), and the epoch-keyed
    overwrite makes the output write idempotent. Run-to-exhaustion
    (availableNow); returns per-epoch metrics."""
    import os

    metrics: list[dict] = []

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        surv = incremental_dedup(
            batch_df,
            registry_root,
            text_col=text_col,
            id_col=id_col,
            job_id=job_id,
            batch_id=epoch_id,
        )
        surv.drop("_fp", "__bucket").write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )
        n = surv.count()
        surv.unpersist()
        metrics.append({"epoch_id": epoch_id, "survivors": n})

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return metrics


def dedup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
) -> DataFrame:
    """Span-level (substring) dedup: remove every repeated k-token window
    from all but its first occurrence across the WHOLE corpus — the
    "Deduplicating Training Data Makes Language Models Better" rule
    (Lee et al. 2021, k=50), the only dedup level that catches boilerplate
    embedded inside otherwise-unique documents. Completes the family:
    exact (doc), MinHash/SimHash/Jaccard (near-doc), C4 lines, spans.
    Returns (id, text_kept, n_removed, n_tokens).

    Distributed shape (the paper's suffix array is a single-machine
    structure; this is the shuffle-native equivalent):
      1. window hashes per doc — ONE codegen transform over the token
         array, posexploded to O(total_tokens) 8-byte rows (same regime
         as the vocabulary / ngram-index ops, never all-pairs);
      2. first occurrence per window = min(struct(id,pos)) — a
         partial-combining agg, so a boilerplate span repeated 10^6 times
         collapses map-side instead of flooding one reducer;
      3. later occurrences join back on the 8-byte hash and group into
         per-doc deletion offset lists — only DUPLICATED occurrences
         survive to this shuffle, typically a tiny fraction. The window
         subtree is deliberately COMPUTED TWICE (once into the agg, once
         into the join): recomputing a codegen scan+transform is cheaper
         at corpus scale than caching O(total_tokens) rows, and the
         min-struct agg keeps map-side combine that the one-pass
         row_number-window alternative would lose — a viral span repeated
         10^6 times would land 10^6 raw rows on one reducer there;
      4. rebuild — a per-doc filter((tok,i) -> no deletion covers i)
         higher-order expression: O(len·dels) inside codegen, bounded by
         document length, zero Python.

    Overlapping deleted windows merge implicitly via the coverage test.
    A later in-doc repeat of a span is deleted too (one global copy
    survives, exactly the paper's semantics). Hash collisions (xxhash64,
    ~1/2^64) can only over-delete a colliding span, never corrupt
    reassembly — offsets come from the doc's own rows.
    """
    toks = F.split(normalize_for_dedup(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col).alias("__id"),
        toks.alias("__t"),
        F.size(toks).alias("__n"),
    )
    # zip_with-chain windows (sliding_ngrams), NOT slice(__t, i+1, k)
    # inside a transform lambda: ProjectCollapse substitutes __t back to
    # the tokenization expression, and a captured outer expression in a
    # higher-order lambda re-evaluates PER ELEMENT — the whole regex split
    # once per window position. Guard: empty window list when n < k.
    whashes = F.when(
        F.col("__n") >= k,
        F.transform(
            sliding_ngrams(F.col("__t"), k, F.col("__n") - k + 1),
            lambda s: F.xxhash64(s),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    win = base.select("__id", F.posexplode(whashes).alias("__pos", "__h"))
    firsts = (
        win.groupBy("__h")
        .agg(F.min(F.struct("__id", "__pos")).alias("__w"), F.count("*").alias("__c"))
        .filter(F.col("__c") > 1)
        .select("__h", "__w")
    )
    dels = (
        win.join(firsts, "__h")
        .filter(
            (F.col("__id") != F.col("__w.__id")) | (F.col("__pos") != F.col("__w.__pos"))
        )
        .groupBy("__id")
        .agg(F.collect_list("__pos").alias("__dels"))
    )
    out = base.join(dels, "__id", "left").withColumn(
        "__dels", F.coalesce(F.col("__dels"), F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.col("__t"),
        lambda t, i: ~F.exists(F.col("__dels"), lambda p: (i >= p) & (i < p + k)),
    )
    return out.select(
        F.col("__id").alias(id_col),
        F.array_join(kept, " ").alias("text_kept"),
        (F.col("__n") - F.size(kept)).cast("long").alias("n_removed"),
        F.col("__n").cast("long").alias("n_tokens"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    'Winnowing: Local Algorithms for Document Fingerprinting', SIGMOD —
    the MOSS algorithm, public): hash every word k-gram, slide a window of
    `w` consecutive hashes, and record the window minimum — RIGHTMOST
    occurrence on ties, the paper's robust-winnowing rule — with its
    global k-gram position. Guarantees any shared substring of
    >= w + k - 1 words produces at least one shared (hash) fingerprint,
    while keeping only ~2/(w+1) of all k-gram hashes — the
    position-robust overlap primitive exact-hash dedup lacks and
    dedup_spans' fixed-k windows don't localize.

    One explode is the only data movement; all per-doc work is codegen:
    the window minima/rightmost-argmin are zip_with chains over SHIFTED
    SLICES of the hash array — the hash expression is re-evaluated once
    per zip_with ARGUMENT (2w slices, O(w·n) hashing per doc, w is small),
    never per element, and nothing references an intermediate column from
    inside a lambda (both HOF traps documented in
    operators/transcripts.py). Output: (id_col, pos, fp) — pos is the
    1-based k-gram index the fingerprint hash came from.

    hash_mode='md5' makes every hash bit-reproducible in DuckDB (the
    _base_hash oracle recipe); 'xxhash64' is the fast production path."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    toks = F.split(normalize_for_dedup(F.col(text_col)), " ")
    n_grams = F.size(toks) - (k - 1)
    grams = F.when(n_grams >= 1, sliding_ngrams(toks, k, n_grams)).otherwise(
        F.array().cast("array<string>")
    )
    hashes = F.transform(grams, lambda g: _base_hash(g, hash_mode))
    n_win = F.size(hashes) - (w - 1)

    # per-window rightmost argmin as a zip_with chain: state struct
    # (h = current min, j = its 1-based offset in the window); `<=` makes
    # a later equal hash win the tie — the rightmost rule
    best = F.transform(
        F.slice(hashes, 1, n_win),
        lambda h: F.struct(h.alias("h"), F.lit(1).alias("j")),
    )
    def _take_if_leq(j: int):
        # closure (not a default arg: pyspark reads the lambda's arity)
        return lambda b, x: F.when(
            x <= b["h"], F.struct(x.alias("h"), F.lit(j).alias("j"))
        ).otherwise(b)

    for j in range(2, w + 1):
        best = F.zip_with(best, F.slice(hashes, j, n_win), _take_if_leq(j))
    # global position = window start (0-based element index) + offset
    fps = F.transform(
        best,
        lambda b, i: F.struct((i + b["j"]).alias("pos"), b["h"].alias("fp")),
    )
    sel = F.when(n_win >= 1, F.array_distinct(fps)).otherwise(
        F.array().cast("array<struct<pos:int,fp:long>>")
    )
    return (
        df.select(F.col(id_col), F.explode(sel).alias("s"))
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
    )
