"""Deduplication suite — exact, normalized, MinHash+LSH, SimHash, Jaccard.

The reference's dedup is a JSON dict of seen hashes with four namespaces
(deduplicator.py:45-141); at engine scale each variant becomes a relational
op (SURVEY §2.6 D1-D6 plus the training-data near-dup family):

- exact (D1): sha256 of bytes → dropDuplicates / left-anti vs seen_hashes;
- normalized text (D2): sha256 of lower+ws-collapsed text;
- MinHash+LSH: char-shingles → k min-hashes → banded signatures →
  bucket-join → candidate pairs. Two hash flavors:
    * `sha` — engine-portable (identical in the DuckDB oracle),
    * `xx`  — xxhash64, JVM codegen, the throughput path at scale;
- SimHash: per-token hash bits, weighted majority per bit position;
- n-gram Jaccard: exact pairwise similarity for candidate verification.

Scale notes: LSH turns the O(n²) all-pairs problem into groupBy(band) —
shuffle keyed on band hashes (uniform), each bucket small; the final
pair-join is only over bucket collisions. Exact variants are one shuffle on
the hash (or none when bucketed storage pre-partitions by hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# token_ngrams_expr lives in functions/ (the canonical home of the
# zip-shift gram-fold idiom, shared with the repetition family and the
# quality classifier) — re-exported here for the existing import sites.
from ..functions import (  # noqa: F401
    normalized_text_expr,
    normalized_text_hash_expr,
    token_ngrams_expr,
)


# --- exact -------------------------------------------------------------------

def exact_dedup(df: DataFrame, content_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """D1/D2: keep one row per normalized-content hash (deterministic winner:
    min id) — reference 'skip if hash seen', main.py:43-46."""
    h = normalized_text_hash_expr(F.col(content_col)).alias("content_sha")
    withh = df.withColumn("content_sha", h)
    first_key = withh.groupBy("content_sha").agg(
        F.min(id_col).alias(id_col)
    )
    return withh.join(first_key, ["content_sha", id_col], "left_semi")


def anti_join_seen(df: DataFrame, seen: DataFrame, hash_col: Column,
                   kind: str, broadcast: bool | None = None) -> DataFrame:
    """J2/F7: drop rows whose hash is registered in seen_hashes (the
    reference's dedup-gate, deduplicator.py:114-141).

    `broadcast`: the caller knows which regime it is in — True forces a
    broadcast hint (small registry), False forces shuffle (at 10^12 scale
    the seen table is bucketed by hash so the anti-join is shuffle-free
    anyway), None (default) leaves the decision to AQE /
    autoBroadcastJoinThreshold. No driver-side count() fires during plan
    construction in any mode."""
    s = seen.where(F.col("kind") == kind).select(F.col("hash").alias("__h"))
    if broadcast:
        s = F.broadcast(s)
    return (
        df.withColumn("__h", hash_col)
        .join(s, "__h", "left_anti")
        .drop("__h")
    )


def register_hashes(seen_path: str, new_hashes: DataFrame) -> None:
    """D6: insert-if-new registration (deduplicator.py:143-161) — append the
    batch's hashes to the seen_hashes table. At 10^12 scale this is an
    Iceberg MERGE on a table bucketed by hash; parquet append + the anti-join
    gate gives the same semantics here (duplicate registrations are harmless:
    the gate is a semi-join, not a counter)."""
    new_hashes.select("hash", "kind", "source").dropDuplicates(["hash", "kind"]) \
        .write.mode("append").parquet(seen_path)


def dedup_stats(seen: DataFrame) -> DataFrame:
    """A5: counts per namespace (deduplicator.py:318-326)."""
    return seen.groupBy("kind").agg(F.count("*").alias("n_hashes"))


# --- MinHash + LSH -------------------------------------------------------------

def minhash_signature(df: DataFrame, text_col: str = "text", n: int = 5,
                      num_perm: int = 8, flavor: str = "xx",
                      shingle: str = "char") -> DataFrame:
    """Signature table: non-text columns of `df` + mh0..mh{k-1} minhash
    components from n-gram shingles (the text column is consumed).

    flavor='xx': xxhash64(shingle, seed=j) — JVM codegen, fast path.
    flavor='sha': lexicographic min of sha256(shingle||'#'||j) — portable to
    the DuckDB oracle (same strings both engines).

    shingle='char' (default): character n-grams of the normalized text —
    the robust-to-tokenization config. shingle='word': token n-grams
    (whitespace words of the normalized text) — the published
    training-data dedup recipe shape (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" / RefinedWeb use word
    n-gram MinHash). A doc with no tokens contributes one empty-string
    shingle, mirroring the char path's greatest(len,1) guard, so every doc
    keeps a signature row.
    """
    # Shape notes (measured at sf0.1, 32 cores):
    # - explode the INDEX SEQUENCE and take substrings AFTER the Generate;
    #   exploding a materialized per-row string ARRAY (transform+substring
    #   inside the row) measured 37x slower (15.8 s -> 0.43 s for the
    #   signature) — Generate copies the whole array per output row, and
    #   array_distinct adds nothing (min over repeated shingles == min over
    #   distinct shingles; signatures verified identical).
    # - hash-aggregate with k primitive min()s: map-side partial aggregation
    #   collapses each doc to ONE k-wide row per task before the shuffle
    #   (shuffle volume = ids x k, independent of text size). Hashing is
    #   nearly free next to the Generate.
    if shingle not in ("char", "word"):
        raise ValueError(f"shingle must be 'char' or 'word', got {shingle!r}")
    # the shingle Generate + k-hash min-agg is CPU-bound, not byte-bound:
    # spread a pathologically under-parallel input (single-row-group
    # file ⇒ one scan task) before it — no-op at scan scale (spread.py)
    from .spread import ensure_parallelism

    df = ensure_parallelism(df)
    id_cols = [c for c in df.columns if c != text_col] or [text_col]
    pre = df.select(*id_cols,
                    normalized_text_expr(F.col(text_col)).alias("__t"))
    if shingle == "char":
        idx = F.sequence(F.lit(1),
                         F.greatest(F.length("__t") - (n - 1), F.lit(1)))
        sh = pre.select(*id_cols, "__t", F.explode(idx).alias("__i")).select(
            *id_cols,
            F.substring(F.col("__t"), F.col("__i"), F.lit(n)).alias("__g")
        )
    else:
        # word shingles have no substring-after-Generate equivalent (no O(1)
        # addressing of the i-th token), so the gram array IS materialized —
        # built by the zip-shift fold (O(tokens), no HOF O(n²)). For the xx
        # flavor the 37×-Generate-copy cost is dodged the same way as hashed
        # decontamination: hash each gram to int64 IN the row projection and
        # explode 8-byte longs, never the gram strings. The sha flavor
        # (oracle config, bounded inputs) explodes the strings.
        # explode_outer + coalesce, NOT a when(size>0) guard: the guard
        # would reference the fold in both predicate and then-branch, and
        # Spark does not hoist conditional-branch subexpressions — the
        # optimized plan carried TWO full copies of the fold per row
        # (r4 review finding). explode_outer emits one null row for the
        # empty array; coalescing it to the ''-shingle (or its hash)
        # reproduces the guard's semantics with ONE fold evaluation.
        grams = token_ngrams_expr(F.col("__t"), n, pre_normalized=True)
        if flavor == "xx":
            sh = pre.select(
                *id_cols,
                F.explode_outer(F.transform(grams, lambda g: F.xxhash64(g)))
                .alias("__gh0"),
            ).select(
                *id_cols,
                F.coalesce(F.col("__gh0"), F.xxhash64(F.lit("")))
                .alias("__gh"),
            )
            aggs = [F.min(F.xxhash64(F.col("__gh"), F.lit(j))).alias(f"mh{j}")
                    for j in range(num_perm)]
            return sh.groupBy(*id_cols).agg(*aggs)
        sh = pre.select(
            *id_cols, F.explode_outer(grams).alias("__g0")
        ).select(*id_cols,
                 F.coalesce(F.col("__g0"), F.lit("")).alias("__g"))
    if flavor == "xx":
        aggs = [F.min(F.xxhash64(F.col("__g"), F.lit(j))).alias(f"mh{j}")
                for j in range(num_perm)]
    else:
        aggs = [
            F.min(F.sha2(F.concat(F.col("__g"), F.lit(f"#{j}")), 256)).alias(f"mh{j}")
            for j in range(num_perm)
        ]
    return sh.groupBy(*id_cols).agg(*aggs)


def lsh_buckets(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", n: int = 5, num_perm: int = 8,
                bands: int = 4, flavor: str = "xx",
                shingle: str = "char") -> DataFrame:
    """(id, band, bucket) rows — one per band per doc; the shared candidate
    index for batch pair generation (`lsh_candidate_pairs`) and the
    streaming seen-store (`streaming.minhash`)."""
    rows = num_perm // bands
    sig = minhash_signature(df.select(id_col, text_col), text_col, n,
                            num_perm, flavor, shingle)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{j}").cast("string")
                for j in range(b * rows, (b + 1) * rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     F.sha2(F.concat_ws("|", *cols), 256).alias("bucket"))
        )
    return sig.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("id", "bk.band", "bk.bucket")


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5, num_perm: int = 8,
                        bands: int = 4, flavor: str = "xx",
                        max_bucket: int | None = None,
                        shingle: str = "char") -> DataFrame:
    """MinHash-LSH near-dup candidates: band the signature, hash each band,
    self-join rows sharing any band bucket → distinct (a < b) pairs.

    `max_bucket` is the LSH skew guard for corpus scale: a bucket of m
    near-identical docs fans out m² candidate pairs, and one boilerplate
    template shared by millions of pages would melt the pair join. Buckets
    larger than `max_bucket` are dropped from candidate generation (their
    members are effectively exact dups — the cheaper exact/normalized dedup
    lane catches them; this is the standard guard in large-scale MinHash
    dedup pipelines). None = uncapped (exact semantics, the oracle-checked
    configuration).

    Shape note (measured at sf0.1, 870,708 pairs): the equi-SELF-JOIN is
    the right formulation even though it computes the signature pipeline
    twice (no ReusedExchange across the broadcast build side; 3.6 s total).
    The tempting alternatives both lose: localCheckpoint-then-join pays the
    materialization sync (4.6 s), and groupBy(collect_list) + nested
    transform/slice pair expansion materializes each bucket's full O(m²)
    struct array in memory before the Generate copies it per output row —
    the 37× Generate-copy trap in another costume (8.1 s, 2.3× slower).
    The join streams pairs without ever materializing a bucket."""
    buckets = lsh_buckets(df, id_col, text_col, n, num_perm, bands, flavor,
                          shingle)
    if max_bucket is not None:
        sizes = buckets.groupBy("band", "bucket").agg(
            F.count("*").alias("__bsz"))
        buckets = buckets.join(
            sizes.where(F.col("__bsz") <= max_bucket), ["band", "bucket"]
        ).drop("__bsz")
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


# --- SimHash ---------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """SimHash over whitespace tokens: per-token 64-bit hash, per-bit
    weighted majority, reassembled fingerprint. Fully native: explode-free —
    bit b contribution via shiftright/&1 and aggregate over the token array."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    # All `bits` votes in ONE aggregate pass over the token-hash array
    # (inside the merge lambda, `h` is a bound variable — referencing it per
    # bit is an attribute read, not a re-hash). A per-bit aggregate would
    # re-walk (and re-hash) the token array `bits` times.
    one = F.lit(1).cast("long")
    init = F.array(*[F.lit(0).cast("long")] * bits)
    merge = lambda acc, h: F.array(*[  # noqa: E731
        F.element_at(acc, b + 1)
        + F.when(F.shiftright(h, b).bitwiseAND(one) == 1, F.lit(1))
        .otherwise(F.lit(-1)).cast("long")
        for b in range(bits)
    ])
    votes = F.aggregate(hashes, init, merge)
    # Fingerprint assembly folded into a SECOND aggregate whose *argument* is
    # the votes array: a higher-order function evaluates its argument exactly
    # once per row, so the expensive vote aggregate runs once even though 64
    # bits read it — no CollapseProject duplication, hence no materialization
    # barrier and ZERO shuffle for the whole fingerprint pass. (An earlier
    # revision used a repartition() barrier here, which at corpus scale
    # shuffled the full text column just to stop re-evaluation.)
    # Bit values come from a literal array (1L << b, with b=63 the
    # two's-complement -(2^63) the signed fingerprint needs).
    bitvals = F.array(*[
        F.lit(2 ** b if b < 63 else -(2 ** 63)).cast("long") for b in range(bits)
    ])
    fingerprint = F.aggregate(
        votes,
        F.struct(F.lit(0).cast("long").alias("fp"), F.lit(0).alias("b")),
        lambda acc, v: F.struct(
            (acc["fp"] + F.when(
                v > 0, F.element_at(bitvals, acc["b"] + 1)
            ).otherwise(F.lit(0).cast("long"))).alias("fp"),
            (acc["b"] + 1).alias("b"),
        ),
        lambda acc: acc["fp"],
    )
    return df.withColumn("simhash", fingerprint)


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash fingerprints via bit_count."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", bands: int = 4,
                           max_hamming: int = 3, bits: int = 64,
                           max_bucket: int | None = None) -> DataFrame:
    """SimHash near-dup PAIRS at corpus scale via banded blocking (Manku,
    Jain & Sarma 2007, "Detecting near-duplicates for web crawling"): split
    the `bits`-bit fingerprint into `bands` contiguous chunks; by
    pigeonhole, two fingerprints within Hamming distance <= bands-1 agree
    EXACTLY on at least one chunk, so an equi-self-join on (band, chunk
    value) finds every such pair with recall 1.0 — no all-pairs scan. The
    exact `bit_count(xor) <= max_hamming` predicate then verifies
    candidates (default 3 = bands-1, the lossless configuration; a larger
    max_hamming with the same bands trades recall for cost exactly as in
    the paper).

    Shuffle ∝ corpus × bands on uniformly-distributed 16-bit chunk keys;
    `max_bucket` is the same boilerplate-mega-bucket skew guard as
    `lsh_candidate_pairs` (a chunk value shared by m docs fans out m²
    candidates — cap it and let the cheaper exact-dedup lane own those).
    """
    if bits % bands != 0:
        raise ValueError(f"bands={bands} must divide bits={bits}")
    width = bits // bands
    # width == bits (bands=1, the degenerate all-pairs-on-one-key config):
    # 2^64-1 does not fit a LongType literal — all-ones is -1 in two's
    # complement (r4 ADVICE finding).
    mask = (F.lit(-1).cast("long") if width == bits
            else F.lit((1 << width) - 1).cast("long"))
    sig = simhash(df.select(id_col, text_col), text_col, bits).select(
        F.col(id_col).alias("id"), "simhash")
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            # shiftright is arithmetic (sign-extends the top band) — the
            # mask normalizes chunks to unsigned values
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(mask)
            .alias("bv"),
        )
        for b in range(bands)
    ]
    bk = sig.select(
        "id", "simhash", F.explode(F.array(*entries)).alias("k")
    ).select("id", "simhash", "k.band", "k.bv")
    if max_bucket is not None:
        sizes = bk.groupBy("band", "bv").agg(F.count("*").alias("__bsz"))
        bk = bk.join(sizes.where(F.col("__bsz") <= max_bucket),
                     ["band", "bv"]).drop("__bsz")
    left, right = bk.alias("l"), bk.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .where(simhash_hamming(F.col("l.simhash"), F.col("r.simhash"))
               <= max_hamming)
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


# --- Jaccard -----------------------------------------------------------------------

def jaccard_size_bound_expr(sz_a: Column, sz_b: Column,
                            threshold: float) -> Column:
    """Keep-predicate of the verify prefilter: J(A,B) ≤ min/max, and the
    reported jaccard is round-half-up-6, so the downstream ≥ threshold
    gate keeps any pair with true J ≥ threshold − 5e-7. A pair can
    therefore be safely dropped only when min < (threshold − slack)·max;
    the 1e-6 slack doubles the rounding window, which also absorbs the
    float error of the multiplication itself (exactly-on-the-window
    products like 0.7999995·2_000_000 land on either side of the integer
    depending on rounding of the literal). Over-admission is harmless —
    survivors carry their exact jaccard and the caller's gate drops them."""
    return F.least(sz_a, sz_b) >= (threshold - 1e-6) * F.greatest(sz_a, sz_b)


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 5,
                        shingle: str = "char",
                        min_jaccard: float | None = None,
                        broadcast_bytes: int = 256 << 20) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (id_a, id_b): explode distinct
    shingles, equi-join on shingle, |∩| / (|A|+|B|-|∩|).

    `min_jaccard` switches on the size-bound prefilter for the
    dedup-verify workload: J(A,B) ≥ t requires min(|A|,|B|)/max(|A|,|B|)
    ≥ t (|A∩B| ≤ min and |A∪B| ≥ max), so pairs whose size ratio falls
    below t − 1e-6 are PROVABLY below the rounded ≥ t gate (the reported
    jaccard is round-half-up to 6 digits; the 1e-6 slack covers the
    rounding window) and are dropped BEFORE the gram fan-out — the
    returned pairs still carry their exact Jaccard, and every pair whose
    ROUNDED jaccard reaches t survives; only provably-sub-threshold
    pairs vanish from the output. The fan-out this avoids is the verify
    stage's whole cost: each surviving pair costs O(|A|+|B|) joined gram
    rows, and an LSH candidate set over a template-heavy corpus is
    dominated by low-J banding collisions (measured at sf0.1, recall-first
    (8,4) banding: 870,708 candidates, 99.9% at J<0.3, 256 true pairs at
    t=0.8 — the bound drops 57% of the pairs before the fan-out and cuts
    the verify stage 80.1 → 46.7 s; BENCH.md "dedup_corpus stage
    profile"). None (default) = every input pair reported, the
    oracle-checked contract.

    NOT a lazy plan builder: the candidate docs' gram-array table is
    eagerly materialized at CALL time (one small Spark job — a
    load-bearing lineage cut, see the inline comment). Callers that only
    want to inspect the plan pay that job.

    shingle='char' (default, the oracle-checked config): character n-grams
    as per-doc DISTINCT STRING arrays (no 64-bit hashing — a hash
    collision would change the exact count the DuckDB oracle checks).
    shingle='word': TOKEN n-grams — the similarity space that word-shingle
    MinHash-LSH approximates, so a word-config `dedup_corpus` verifies in
    the same space its candidates came from (r4 ADVICE finding: verifying
    word-LSH candidates with char-gram Jaccard thresholds a different
    metric). Gram construction is identical to `minhash_signature`'s word/xx
    path (zip-shift fold, empty doc → one ''-shingle, grams hashed to
    int64 — set sizes and intersections over the hashes equal those over
    the grams up to 64-bit collisions).

    Shape (r7 rewrite, guide §2.3/§2.4 — shuffle fewer bytes / remove the
    fan-out shuffle): the former formulation exploded every candidate
    doc's grams and computed |A∩B| with a pairs⨝grams equi-join — the
    joined row count was Σ_pairs(|A|+|B|) (64M rows at sf0.1), all of it
    shuffled on (id_b, gram). Now each candidate doc carries ONE row with
    its sorted-free distinct-gram ARRAY; pairs pick up both arrays via
    two small joins (AQE broadcasts the materialized gram table when it
    fits) and |A∩B| = size(array_intersect(...)) is computed IN-ROW by
    codegen — per-pair cost is the same O(|A|+|B|) hash-set build, but no
    64M-row exchange exists at all. Measured at sf0.1 (212k surviving
    pairs): verify stage 27.9 → ~3 s. Per-row memory is O(doc grams),
    bounded by the pipeline's MAX_HTML_BYTES-capped doc sizes."""
    if shingle not in ("char", "word"):
        raise ValueError(f"shingle must be 'char' or 'word', got {shingle!r}")
    # PRECONDITION (same discipline as dedup_lines_corpus): `id_col` must
    # uniquely key `df`. The former exploded-gram formulation silently
    # UNIONED the grams of duplicate-id rows; the array formulation would
    # instead emit one output row per duplicate — don't feed it dup ids
    # (every in-repo caller dedups or reads uniquely-keyed tables first).
    #
    # spread a single-task doc scan before the gram-array build (the
    # same §2.5 guard as the pair side below; no-op for exchange-bearing
    # or well-partitioned inputs)
    from .spread import ensure_parallelism

    df = ensure_parallelism(df)
    # restrict the doc side to ids appearing in SOME candidate pair before
    # any text work: a doc in no pair cannot reach the output (every
    # downstream join is inner on pair ids), and at corpus scale the
    # candidate docs are a vanishing fraction of the input — without this
    # the gram-array build runs over the WHOLE corpus only for the pair
    # joins to drop it. The r6 eager checkpoint here is GONE (one job
    # barrier less per call): it guarded against the caller's candidate
    # plan being spliced into the doc lineage and re-executed per
    # gram-explode reference — but the gram table below is materialized
    # exactly ONCE now, so the splice executes once by construction.
    ids = (pairs.select(F.col("id_a").alias(id_col))
           .unionByName(pairs.select(F.col("id_b").alias(id_col)))
           .distinct())
    # spread the per-pair work across the cluster BEFORE the heavy phase:
    # candidate-pair lists arrive from materialization points whose
    # partitioning reflects their (tiny) byte size, not their CPU cost —
    # AQE's byte-based coalescing leaves a 460k-pair verify on 1-3 tasks
    # (measured at sf0.1: the whole verify ran on ONE core). Hash-spread
    # by the pair key at the session's shuffle-partition width (the
    # scale-config knob); the shuffle itself is a few bytes per pair.
    # Explicit-N repartition so AQE cannot re-coalesce it (guide §2.5:
    # under-parallel input → repartition right after it).
    n_spread = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    pairs = pairs.repartition(n_spread, "id_a", "id_b")
    pre = df.join(ids, id_col, "left_semi").select(
        F.col(id_col).alias("id"),
        normalized_text_expr(F.col(text_col)).alias("__t"))
    if shingle == "word":
        grams = token_ngrams_expr(F.col("__t"), n, pre_normalized=True)
        raw = F.transform(grams, lambda g: F.xxhash64(g))
    else:
        idx = F.sequence(F.lit(1),
                         F.greatest(F.length("__t") - (n - 1), F.lit(1)))
        raw = F.transform(idx, lambda i: F.col("__t").substr(i, F.lit(n)))
    # materialized ONCE (one row per candidate doc, a few KB each): the
    # pair joins below reference it twice (id_a / id_b sides) and the
    # prefilter twice more — without the checkpoint each reference
    # re-runs the semi-join + normalize + gram build, and AQE would not
    # see the (small) true size that lets it pick broadcast joins.
    gtab = pre.select("id", F.array_distinct(raw).alias("__gs0")) \
        .localCheckpoint(eager=True)
    if shingle == "word":
        # empty doc → one ''-shingle, exactly like the explode_outer +
        # coalesce of minhash_signature. Applied ON TOP of the
        # materialized column so the conditional's double reference
        # cannot duplicate the gram-build expression (the r4
        # CollapseProject finding).
        gs = F.when(F.size("__gs0") > 0, F.col("__gs0")) \
            .otherwise(F.array(F.xxhash64(F.lit(""))))
    else:
        gs = F.col("__gs0")
    gtab = gtab.select("id", gs.alias("__gs"))
    sizes = gtab.select("id", F.size("__gs").alias("sz"))
    if min_jaccard is not None:
        pairs = (
            pairs.join(sizes.select(F.col("id").alias("id_a"),
                                    F.col("sz").alias("__sa")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"),
                               F.col("sz").alias("__sb")), "id_b")
            # slack bound: the unrounded min >= t*max would drop a
            # boundary pair (J in [t-5e-7, t), reachable only at
            # >=1e6-shingle docs — exactly the corpus-scale regime) that
            # the round-half-up-6 gate keeps, making output depend on
            # whether the prefilter is on — see jaccard_size_bound_expr
            .where(jaccard_size_bound_expr(
                F.col("__sa"), F.col("__sb"), min_jaccard))
            .select("id_a", "id_b")
        )
    # Join-strategy pick (guide §3.1), decided from a MEASURED bound, not
    # an estimate: a candidate set big enough to miss the 10 MB
    # auto-broadcast threshold silently flips both array joins to
    # sort-merge, and an SMJ ships a full gram ARRAY per PAIR through the
    # id_b exchange — measured 10× the gram-table bytes at a 50k-doc
    # corpus. One cheap agg over the materialized gram table bounds its
    # broadcast size; under `broadcast_bytes` (default 256 MB — guide:
    # a few hundred MB broadcast is fine; both sides broadcast, so the
    # executor cost is ~2×) the pairs stream through two BroadcastHash
    # joins and NO array ever crosses an exchange. Above the bound the
    # SMJ fallback stands (at warehouse scale, slice the pair list and
    # broadcast per slice — documented, not implemented).
    # measured in BYTES, not characters (a CJK-heavy corpus is 3× bigger
    # than its char count): payload via octet_length, + 16 B/element of
    # array/offset overhead. One small job over the materialized table.
    if shingle == "char":
        elem_bytes = F.aggregate(
            F.col("__gs"), F.lit(0).cast("long"),
            lambda a, x: a + F.coalesce(F.octet_length(x), F.lit(0))
            .cast("long"))
    else:
        elem_bytes = (F.size("__gs") * F.lit(8)).cast("long")
    stats_row = gtab.agg(F.sum(elem_bytes).alias("b"),
                         F.sum(F.size("__gs")).alias("c")).collect()[0]
    est_bytes = (stats_row["b"] or 0) + 16 * (stats_row["c"] or 0)
    fits = est_bytes <= broadcast_bytes
    ga = gtab.select(F.col("id").alias("id_a"), F.col("__gs").alias("__ga"))
    gb = gtab.select(F.col("id").alias("id_b"), F.col("__gs").alias("__gb"))
    if fits:
        ga, gb = F.broadcast(ga), F.broadcast(gb)
    # two-step projection: __ni is referenced twice by the jaccard
    # formula, and size(array_intersect) is non-cheap — staging it as an
    # attribute keeps CollapseProject from inlining (and thus evaluating)
    # the intersection twice per row (the repetition-chain staging rule).
    # array_compact strips the NULL gram a NULL-text doc carries (its
    # array is exactly [NULL] — substr of a NULL string): the former
    # equi-join could never match a NULL gram, so two NULL-text docs
    # reported jaccard 0.0, while array_intersect treats NULL elements
    # as equal and would report 1.0 (r7 review finding). Sizes keep
    # counting the NULL gram, exactly like the old relational count.
    staged = (
        pairs.join(ga, "id_a").join(gb, "id_b")
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect(F.array_compact("__ga"),
                                     F.array_compact("__gb"))).alias("__ni"),
            (F.size("__ga") + F.size("__gb")).alias("__sab"),
        )
    )
    return staged.select(
        "id_a", "id_b",
        F.round(F.col("__ni") / (F.col("__sab") - F.col("__ni")), 6)
        .alias("jaccard"),
    )


def dedup_lines_corpus(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       min_repeat: int = 2) -> DataFrame:
    """C4-style CORPUS-level line deduplication (Raffel et al. 2020 §2.2
    'we discarded all but one of any three-sentence span occurring more than
    once' — here at line granularity, the common web-pipeline variant):
    drop every line whose exact text occurs >= `min_repeat` times across
    the whole corpus (boilerplate: nav text, cookie banners, repeated
    section stubs), reassemble each document's remaining lines in order.

    Blank lines are never counted or dropped (they'd trivially repeat).

    Scale shape (100 TB): Generate (no shuffle) → hash-aggregate on line
    (shuffle ∝ distinct non-blank lines, map-side partial counts) →
    LEFT ANTI join lines⟕dup_lines (shuffle on line; boilerplate keys are
    the HOT keys but anti-join distributes BY line so each hot line's
    occurrences co-locate and are dropped locally) → per-doc reassembly
    (shuffle ∝ surviving lines) → join back to the docs table on id.
    Returns the input columns + text_deduped, n_lines_kept, n_lines_dropped.

    PRECONDITION: `id_col` must uniquely key `docs` rows (use the url, not
    a content hash — duplicate ids would merge documents in the reassembly
    groupBy). Same contract-documentation discipline as asof_join's
    tiebreak (SURVEY §7.4.1).
    """
    # NOTE (r7): deliberately NOT ensure_parallelism-guarded — the line
    # split/posexplode is byte-cheap next to the gram folds, and the
    # added repartition measured a net LOSS at sf0.1 (0.77 → 1.22 s).
    lines = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("__pos", "__line"),
    )
    dup_lines = (
        lines.where(F.length("__line") > 0)
        .groupBy("__line").agg(F.count("*").alias("__c"))
        .where(F.col("__c") >= min_repeat)
        .select("__line")
    )
    survivors = lines.join(dup_lines, "__line", "left_anti")
    rebuilt = survivors.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias("text_deduped"),
        F.count("*").alias("n_lines_kept"),
    )
    n_total = F.size(F.split(F.col(text_col), "\n", -1))
    return (
        docs.join(rebuilt, docs[id_col] == rebuilt["__id"], "left")
        .drop("__id")
        .withColumn("text_deduped", F.coalesce("text_deduped", F.lit("")))
        .withColumn("n_lines_kept",
                    F.coalesce("n_lines_kept", F.lit(0)).cast("int"))
        .withColumn("n_lines_dropped",
                    (n_total - F.col("n_lines_kept")).cast("int"))
    )


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 20,
                         driver_edges: int = 200_000) -> DataFrame:
    """Connected components over a near-duplicate pair list → (id,
    component) with component = MIN node id in the cluster. The tail stage
    of every dedup pipeline: LSH/phash emit PAIRS, but dropping duplicates
    needs CLUSTERS (keep one canonical doc per component).

    Spark-first: iterative min-label propagation — each round joins the
    (undirected) edge list against current labels and takes the min label
    over {self} ∪ neighbors. Rounds needed = graph diameter; near-dup
    clusters are shallow (template families — diameter ≤ ~3), so this
    converges in a handful of rounds; `max_iter` bounds pathological
    chains. Convergence is detected by a per-round changed-count — one
    driver-side scalar per round (control plane only, never row data).

    At 10^12 scale each round is one shuffle of |E| on node id; for very
    large graphs swap in alternating large-star/small-star (Kiveris et al.
    2014) — same join primitive, fewer rounds on long chains.

    `driver_edges` (r7): SMALL-GRAPH FAST PATH. Near-dup pair lists are
    usually tiny next to the corpus (a few true pairs per thousand docs),
    and each propagation round of the loop costs a join + shuffle +
    localCheckpoint + a count job — pure scheduling overhead when |E| is
    small (measured ~2 s for a 241-edge graph at sf0.1). When a BOUNDED
    probe (`limit(driver_edges+1).count()` — never an unbounded collect)
    shows the edge list fits, solve with a driver-side union-find instead:
    identical min-label output (union-find tracks the min id per root;
    Python's str ordering equals Spark's UTF8 binary ordering because
    UTF-8 preserves code-point order), bounded memory (~50 B/edge, ≤10 MB
    at the default). 0 disables (always distribute); at corpus scale a
    big pair list simply exceeds the bound and takes the loop.
    """
    # ONE bounded job decides the path AND fetches the edges (a separate
    # count-then-collect would execute the caller's pair plan twice):
    # len == driver_edges+1 ⇒ the graph exceeds the bound, discard and
    # take the distributed loop.
    rows = (pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
            .limit(driver_edges + 1).collect()) if driver_edges else None
    if rows is not None and any(
            r["a"] is None or r["b"] is None for r in rows):
        # NULL ids would crash Python's `<` in union-by-min; the
        # distributed loop tolerates null edges (a null key never joins),
        # so odd inputs keep their pre-r7 behavior instead of raising
        rows = None
    if rows is not None and len(rows) <= driver_edges:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for r in rows:
            a, b = r["a"], r["b"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min: the min id becomes the root, so the root
                # IS the component label (same semantics as the loop)
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = [(x, find(x)) for x in parent]
        spark = pairs.sparkSession
        f = pairs.schema[id_a]
        from pyspark.sql.types import StructField, StructType
        schema = StructType([StructField("id", f.dataType, f.nullable),
                             StructField("comp", f.dataType, f.nullable)])
        return spark.createDataFrame(out, schema)
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("comp", F.col("id"))
    )
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    # max_iter propagation rounds + 1 certification round: convergence is
    # certified by a zero-change round, so a graph converging in EXACTLY
    # max_iter rounds still certifies (and returns) rather than raising.
    for _ in range(max_iter + 1):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src").agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"],
                        "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nmin", F.col("comp")))
                .alias("comp"),
                (F.col("nmin") < F.col("comp")).alias("__changed"),
            )
        )
        # localCheckpoint TRUNCATES LINEAGE — without it each round nests
        # the whole previous plan and Catalyst re-analysis blows up
        # super-linearly with iteration count (the standard iterative-Spark
        # trap). On a real cluster use reliable checkpoint() instead so a
        # lost executor can't lose label state.
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.where(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    else:
        # exhausting max_iter with changes still flowing means a component
        # of diameter > max_iter got SPLIT labels — wrong answers that look
        # converged. Fail loudly instead (raise the bound or switch to
        # large-star/small-star for long-chain graphs).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); component diameter exceeds "
            "max_iter — raise it or use star-contraction for chain graphs"
        )
    return labels.select("id", "comp")


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id", id_a: str = "id_a",
                         id_b: str = "id_b") -> DataFrame:
    """Keep exactly one document per near-dup component (the MIN id — a
    deterministic canonical pick) plus every unpaired document. The
    components table is usually tiny next to the corpus (only paired docs
    appear in it), so the join back is broadcast-friendly."""
    comp = connected_components(pairs, id_a, id_b)
    drop = comp.where(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col))
    return docs.join(drop, id_col, "left_anti")




def dedup_corpus(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", jaccard_threshold: float = 0.8,
                 n: int = 5, num_perm: int = 32, bands: int = 8,
                 shingle: str = "char",
                 max_bucket: int | None = 10_000) -> DataFrame:
    """The COMPLETE near-duplicate removal pipeline in one call — the
    published training-data recipe (Lee et al. 2022 / RefinedWeb) composed
    from this module's tested stages:

        exact/normalized dedup            (hash groupBy, min-id winner)
      → MinHash-LSH candidate pairs       (banded bucket join, skew-capped)
      → exact n-gram Jaccard VERIFY       (drop false LSH candidates)
      → connected components              (pairs → clusters, min-label)
      → keep-canonical                    (min id per cluster + unpaired)

    Verification matters: LSH banding includes low-similarity collisions;
    the Jaccard gate at `jaccard_threshold` makes the drop decision exact
    — and it runs in the SAME shingle space (`shingle`/`n` are passed
    through) that the LSH stage approximated, as the published recipes
    require. `max_bucket` caps boilerplate mega-buckets (their members
    are exact dups — the exact lane upstream already collapsed those).

    Default signature config is (num_perm=32, bands=8) — r=4 rows/band,
    S-curve midpoint (1/b)^(1/r) ≈ 0.59. Versus the pair-generation
    operator's recall-first (8, 4): identical recall at the 0.8 threshold
    (1-(1-J^4)^8 = 0.985 at J=0.8 vs 0.983 — and measured at sf0.1 the
    two configs find the IDENTICAL 256 true pairs) with sharply fewer
    low-J banding collisions (theory: 12× at J=0.2; measured on this
    template-heavy corpus: 870,708 → 464,414 candidates, 1.9× — the
    surviving collision mass sits near the r=4 S-curve crossover at
    J≈0.3-0.5, where the pigeonhole gap narrows). Combined with the exact
    size-bound prefilter the recipe's end-to-end cost at sf0.1 drops
    172 → 62.5 s (BENCH.md "dedup_corpus stage profile"). Signatures cost
    4× more hashes — embarrassingly parallel, the side of the trade you
    WANT to pay at 100 TB (Lee et al. spend 9,000 hashes per doc for
    exactly this reason).

    Scale shape: every stage is the scale-safe formulation documented on
    its function; the Jaccard verify is candidate-pair-bounded. Returns
    the deduplicated corpus (all input columns).

    The exact-dedup result is MATERIALIZED (localCheckpoint) before the
    fan-out: four downstream subplans consume it (both sides of the LSH
    self-join, the Jaccard shingle table, the final anti-join), and unlike
    the pure-projection signature pipeline (see lsh_candidate_pairs's
    measured note) it CONTAINS A SHUFFLE (hash groupBy + semi-join) that
    would otherwise execute four times. On a real cluster use persist
    (DISK) or a staging table at this point.
    """
    # The materialization is REPARTITIONED by id at the session's
    # shuffle-partition width (the scale knob) — a production staging
    # table bucketed by id. Without it the checkpoint inherits the
    # byte-coalesced partitioning of the exact-dedup aggregate (ONE
    # partition at sf0.1 — single-file scan + AQE byte-based coalescing),
    # and every CPU-heavy consumer below (signature Generate + hashing ×2
    # for the LSH self-join, the verify gram build) runs single-core
    # (guide §2.5: under-parallel input → repartition right after it).
    n_spread = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    out = exact_dedup(docs, text_col, id_col).drop("content_sha") \
        .repartition(n_spread, id_col) \
        .localCheckpoint(eager=True)
    # materialize the candidate pairs: the verify stage references them
    # four times (pair-id restriction, size prefilter, intersection count,
    # zero-overlap left join) and each reference would otherwise re-run
    # the banding self-join; the pair set is bounded (max_bucket caps the
    # per-bucket quadratic blowup)
    cands = lsh_candidate_pairs(out, id_col=id_col, text_col=text_col,
                                n=n, num_perm=num_perm, bands=bands,
                                shingle=shingle, max_bucket=max_bucket) \
        .localCheckpoint(eager=True)
    # materialized: dedup_keep_canonical's component pass executes its
    # pair input twice (bounded fetch + fallback) and the final anti-join
    # references it again — without the checkpoint each execution re-runs
    # the whole verify. True pairs only, so the materialization is tiny.
    verified = ngram_jaccard_pairs(out, cands, id_col=id_col,
                                   text_col=text_col, n=n, shingle=shingle,
                                   min_jaccard=jaccard_threshold) \
        .where(F.col("jaccard") >= jaccard_threshold) \
        .select("id_a", "id_b").localCheckpoint(eager=True)
    return dedup_keep_canonical(out, verified, id_col)


def dedup_corpus_incremental(increment: DataFrame, store_dir: str,
                             canon_dir: str, id_col: str = "doc_id",
                             text_col: str = "text",
                             jaccard_threshold: float = 0.8, n: int = 5,
                             num_perm: int = 32, bands: int = 8,
                             shingle: str = "char",
                             max_bucket: int | None = 10_000,
                             store_partitions: int | None = None,
                             stats: dict | None = None) -> DataFrame:
    """INCREMENTAL near-dedup (r4 verdict #4): admit a new batch against the
    accumulated canonical corpus WITHOUT re-shingling it. `dedup_corpus`
    recomputes signatures over the full corpus every run; a daily increment
    at 100 TB must instead pair new docs against a PERSISTED bucket index:

        1. full `dedup_corpus` recipe WITHIN the increment (exact → LSH →
           Jaccard verify → components → canonical),
        2. increment survivors' buckets probe the store — read PRUNED to
           the batch's bp partitions (the streaming store's layout,
           streaming/minhash.py: bp = pmod(xxhash64(band,bucket), P));
           bucket collisions yield (new doc, canonical doc) candidates,
        3. candidates are VERIFIED with the same-shingle-space Jaccard gate
           (canonical texts fetched from `canon_dir` by a semi-join on the
           hit ids only — at warehouse scale an id-bucketed Iceberg table
           makes this a pruned read),
        4. admitted docs' (band, bucket, id, bp) rows are appended to the
           store FIRST, then the docs to `canon_dir` — the crash-safe
           order. An ORPHAN bucket row (id absent from canon) is
           semantically inert: a collision with it never verifies (the
           Jaccard stage finds no canonical text, and a pair that cannot
           verify never drops anything), so a crash between the two
           appends costs nothing — the retried increment collides with
           its own orphan buckets only as SELF-pairs, which are excluded
           from verification (id_a == id_b proves a prior attempt by this
           very doc, not a duplicate), so it is admitted exactly once.
           The REVERSE order is the silent-loss shape: canon rows with no
           index entries would let every future near-duplicate of them
           probe, miss, and be admitted forever. A COMPLETED run is
           retry-idempotent through resume semantics: ids already present
           in `canon_dir` are anti-joined out of the increment up front
           (same id ⇒ already admitted — the pipeline's manifest-resume
           rule), which also guarantees batch and canonical ids are
           disjoint so a non-self candidate pair is always a genuine
           cross-corpus pair.

    The whole run holds the writer lease on the STORE's parent directory
    (plans/lease.py — the same lock the store's maintenance job
    `compact_batch_lsh_store` takes; the membership-only
    `compact_lsh_store` REFUSES this id-bearing store, see
    plans/maintenance.py): two concurrent increments would each probe
    before the other appends and both admit near-duplicates of the
    other's admissions.
    Co-locate `canon_dir` under the same parent so one lease covers both
    tables.

    The store schema extends the streaming gate's (band, bucket, bp) with
    the OWNER id — the verify stage needs to know which canonical doc a
    collision points at; the signature config rides the store meta and is
    validated on every run (a different n/num_perm/bands/shingle would
    make bucket values incomparable and silently admit every duplicate).

    Semantics are FIRST-SEEN GREEDY, the standard incremental trade-off:
    equal to one-shot `dedup_corpus` over the accumulated corpus except
    (a) earlier batches' canonicals never retract (a later batch cannot
    merge two already-admitted components), and (b) a new doc whose only
    similarity path to the corpus runs through a DROPPED (non-canonical)
    document is admitted — the store indexes canonical survivors only.
    Both are the documented behavior of production dedup services built on
    a seen-store (the reference's persistent dedup DB has the same
    property, deduplicator.py:45-65).

    Returns the ADMITTED docs (also appended to `canon_dir`). When a
    `stats` dict is passed it is filled IN PLACE with
    ``{"n_already_admitted": <int>}`` — the count of increment ids removed
    by the resume anti-join, measured UNDER the writer lease against the
    same canon snapshot the dedup reads (a caller counting it before
    acquisition races a concurrent increment's commit and skews the split
    between already-admitted and dedup-dropped — r5 verdict #6).
    """
    import os as _os

    from ..plans.lease import WriterLease

    spark = increment.sparkSession
    with WriterLease(_os.path.dirname(store_dir.rstrip("/")) or ".") \
            as lease:
        return _dedup_corpus_incremental_locked(
            spark, increment, store_dir, canon_dir, id_col, text_col,
            jaccard_threshold, n, num_perm, bands, shingle, max_bucket,
            store_partitions, lease, stats)


def _dedup_corpus_incremental_locked(spark, increment, store_dir, canon_dir,
                                     id_col, text_col, jaccard_threshold, n,
                                     num_perm, bands, shingle, max_bucket,
                                     store_partitions, lease,
                                     stats=None) -> DataFrame:
    import os as _os

    from ..plans.maintenance import recover_store
    from ..streaming.minhash import (
        STORE_PARTITIONS,
        _resolve_store_partitions,
        read_store_meta,
        read_store_pruned,
        store_partition_expr,
        write_store_meta,
    )

    recover_store(store_dir)
    recover_store(canon_dir)
    n_parts = _resolve_store_partitions(store_dir,
                                        store_partitions or STORE_PARTITIONS)
    cfg = {"lsh_n": n, "lsh_num_perm": num_perm, "lsh_bands": bands,
           "lsh_shingle": shingle}
    meta = read_store_meta(store_dir)
    if meta is not None and any(k in meta and meta[k] != v
                                for k, v in cfg.items()):
        raise ValueError(
            f"batch LSH index at {store_dir} was written with "
            f"{ {k: meta.get(k) for k in cfg} }, but { cfg } was "
            "requested — bucket values under different signature configs "
            "are incomparable and every seen duplicate would be silently "
            "re-admitted. Rebuild the index to change the config.")

    # resume semantics (retry of a COMPLETED run): an id already in the
    # canonical corpus is already admitted — anti-join it out up front.
    # This also makes batch and canonical ids provably disjoint, so the
    # only same-id candidate pairs below are orphan self-collisions.
    has_canon = _os.path.isdir(canon_dir) and any(
        f.endswith(".parquet") for f in _os.listdir(canon_dir))
    if has_canon:
        canon_ids = spark.read.parquet(canon_dir).select(id_col)
        if stats is not None:
            # measured here, under the lease, against the exact snapshot
            # the anti-join reads — see the docstring's `stats` contract
            stats["n_already_admitted"] = increment.join(
                canon_ids, id_col, "left_semi").count()
        increment = increment.join(canon_ids, id_col, "left_anti")
    elif stats is not None:
        stats["n_already_admitted"] = 0

    batch = dedup_corpus(increment, id_col=id_col, text_col=text_col,
                         jaccard_threshold=jaccard_threshold, n=n,
                         num_perm=num_perm, bands=bands, shingle=shingle,
                         max_bucket=max_bucket).localCheckpoint(eager=True)
    buckets = (
        lsh_buckets(batch, id_col, text_col, n, num_perm, bands, "xx",
                    shingle)
        .withColumn("bp", store_partition_expr(F.col("band"),
                                               F.col("bucket"), n_parts))
        .localCheckpoint(eager=True)
    )

    has_store = _os.path.isdir(store_dir) and any(
        d.startswith("bp=") for d in _os.listdir(store_dir))
    # `has_store and not has_canon` is the FIRST-EVER batch retried after a
    # crash between the two appends: every store row is an orphan (no
    # canonical text exists anywhere), so a collision can never verify and
    # the probe branch would only crash on the canon_dir read
    # (PATH_NOT_FOUND) — skip it and admit the batch (ADVICE r5). But the
    # same state also describes a LOST or mispointed canon table (review
    # finding: silently admitting every near-dup of a mature store would
    # be far worse than the crash the guard removes), so the orphan
    # hypothesis is VERIFIED first: in the crash window every store row's
    # owner id comes from this very increment. Any foreign id ⇒ refuse
    # loudly. The check reads the store once — in the genuine crash state
    # that store is one batch's worth of rows.
    if has_store and not has_canon:
        foreign = (
            spark.read.parquet(store_dir).select("id")
            .join(increment.select(F.col(id_col).alias("id")),
                  "id", "left_anti")
            .limit(1).count())
        if foreign:
            raise ValueError(
                f"LSH store at {store_dir} carries owner ids that are not "
                f"in this increment, but canon_dir {canon_dir} has no "
                "data — the store references canonical documents that do "
                "not exist (lost or mispointed canon table?). Refusing to "
                "probe-skip: that would silently admit every near-"
                "duplicate of the indexed corpus. Restore canon_dir or "
                "rebuild the store.")
    if has_store and has_canon:
        # control-plane scalars: at most n_parts ints, never row data
        bps = [r["bp"] for r in buckets.select("bp").distinct().collect()]
        seen = read_store_pruned(spark, store_dir, bps)
        cands = (
            buckets.join(seen.select("band", "bucket",
                                     F.col("id").alias("id_b")),
                         ["band", "bucket"])
            # id_a == id_b can only be an ORPHAN self-collision (batch and
            # canon ids are disjoint after the resume anti-join): a prior
            # crashed attempt indexed this doc's buckets but never
            # published its text — that is this doc's own history, not a
            # duplicate, so it must not count against admission
            .where(F.col("id") != F.col("id_b"))
            .select(F.col("id").alias("id_a"), "id_b").distinct()
            # materialized for the same reason as dedup_corpus's cands:
            # referenced by the canon-text semi-join and four times inside
            # the verify, each of which would otherwise re-read the store
            # and re-run the probe join; bounded by the candidate pairs
            .localCheckpoint(eager=True)
        )
        canon_hit = (
            spark.read.parquet(canon_dir)
            .join(cands.select(F.col("id_b").alias(id_col)).distinct(),
                  id_col, "left_semi")
            .select(id_col, text_col)
        )
        texts = batch.select(id_col, text_col).unionByName(canon_hit)
        # materialized (tiny — dropped ids only): BOTH consumers below
        # (admitted docs, admitted buckets) reference it, and each
        # checkpoint would otherwise re-run the whole cross-store verify
        dropped = (
            ngram_jaccard_pairs(texts, cands, id_col=id_col,
                                text_col=text_col, n=n, shingle=shingle,
                                min_jaccard=jaccard_threshold)
            .where(F.col("jaccard") >= jaccard_threshold)
            .select(F.col("id_a").alias(id_col)).distinct()
            .localCheckpoint(eager=True)
        )
        admitted = batch.join(dropped, id_col, "left_anti")
        admitted_buckets = buckets.join(
            dropped.withColumnRenamed(id_col, "id"), "id", "left_anti")
    else:
        admitted, admitted_buckets = batch, buckets
    # NO eager checkpoint here (r7 — two job barriers removed): the
    # cache-invalidation hazard the former checkpoints guarded against
    # (plans read canon_dir / store_dir which the appends below mutate)
    # cannot occur any more, because every path into `admitted` /
    # `admitted_buckets` is lineage-cut ABOVE any store/canon read:
    # `batch` derives from dedup_corpus's checkpointed staging table (the
    # resume anti-join's canon read is beneath that checkpoint),
    # `buckets` and `dropped` are checkpointed right where the store
    # probe / cross-verify results land, and the components table of the
    # fast path is driver-local. If a future edit re-introduces a
    # canon/store read below those cuts, restore the checkpoints.
    # commit-point validation before publishing (same rule as the
    # pipeline): a stolen-stale lease must abort here, not interleave its
    # appends with the new owner's
    lease.assert_held()
    lease.touch()
    # BUCKETS FIRST, canon second — the crash-safe order (see docstring
    # step 4: orphan bucket rows are inert; canon rows without index
    # entries would silently admit every future near-dup of them)
    write_store_meta(store_dir, n_parts, extra=cfg)
    # repartition by bp before the partitioned write: a W-partition
    # DataFrame written partitionBy("bp") emits up to W×n_parts files per
    # append (guide §6 small-files — every future pruned read pays the
    # listing+open cost). Keyed by bp the append writes ≤ n_parts files.
    (admitted_buckets.select("band", "bucket", "id", "bp")
     .repartition(n_parts, "bp")
     .write.mode("append").partitionBy("bp").parquet(store_dir))
    admitted.write.mode("append").parquet(canon_dir)
    return admitted


def decontaminate_flags(docs: DataFrame, benchmark_grams: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 13, hashed: bool = False) -> DataFrame:
    """Eval-set DECONTAMINATION (the training-data hygiene op: drop
    documents that contain any n-gram from the benchmark/eval corpus —
    cf. GPT-3 §C / PaLM app. training-set filtering): per-doc token
    n-grams joined against the benchmark gram set; returns docs +
    n_hits + contaminated flag.

    `benchmark_grams` must have a `gram` string column (small — broadcast).

    `hashed=False`: explode the gram STRINGS and equi-join — the
    bounded-correctness formulation (exact, oracle-checked) whose Generate
    copies ~13× the text volume per doc.
    `hashed=True`: the corpus-scale formulation — xxhash64 each gram INSIDE
    the row projection (the gram array never leaves the row), explode the
    resulting int64 array, join on longs. Identical flags up to 64-bit
    hash collisions (verified flag-identical over the sf0.01 corpus in
    tests/test_dedup_similarity.py).

    When it pays (BENCH.md has both measured at sf0.1): in the BROADCAST
    regime both formulations pipeline Generate → join → partial-agg in one
    stage with no materialization, so they bench within noise of each
    other — the gram fold dominates. The hashed path is the one that
    SURVIVES leaving that regime: when the benchmark set outgrows the
    broadcast threshold (full eval-suite decontamination) the join
    becomes a shuffle whose exchanged bytes are 8/gram instead of ~80
    (13-gram strings), and long equality beats string equality in the
    join hash table either way.
    """
    from .spread import ensure_parallelism

    # the 13-gram fold + explode is CPU-bound (measured 3.0 → 0.6 s at
    # sf0.1 once spread) — guard against single-task scans (spread.py)
    docs = ensure_parallelism(docs)
    if hashed:
        gh = F.transform(token_ngrams_expr(F.col(text_col), n),
                         lambda g: F.xxhash64(g))
        grams = docs.select(F.col(id_col).alias("__id"),
                            F.explode_outer(gh).alias("__gh"))
        bench = (benchmark_grams.select(F.xxhash64("gram").alias("__gh"))
                 .distinct())
        hits = (
            grams.join(F.broadcast(bench), "__gh")
            .groupBy("__id").agg(F.count("*").alias("n_hits"))
        )
    else:
        grams = docs.select(
            F.col(id_col).alias("__id"),
            F.explode_outer(token_ngrams_expr(F.col(text_col), n))
            .alias("gram"))
        hits = (
            grams.join(F.broadcast(benchmark_grams.select("gram").distinct()),
                       "gram")
            .groupBy("__id").agg(F.count("*").alias("n_hits"))
        )
    return (
        docs.join(hits, docs[id_col] == hits["__id"], "left").drop("__id")
        .withColumn("n_hits",
                    F.coalesce("n_hits", F.lit(0)).cast("int"))
        .withColumn("contaminated", F.col("n_hits") > 0)
    )
