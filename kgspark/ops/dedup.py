"""Document deduplication: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All fingerprints are built from `md5` (hex string) rather than engine-native
hashes so results are portable across engines (the DuckDB oracle computes
the identical signatures — and at cluster scale md5 is still JVM-side,
whole-stage-codegen'd). Everything below is pure column expressions: no
Python UDFs, no driver-side loops.

Scale notes per operator:
- exact: one shuffle on the 32-hex digest; group sizes are tiny (true dups).
- minhash-lsh: explode to (doc, band) rows -> equi-join on band key. The
  classic shingle->minhash->band->bucket-join. Bucket skew (boilerplate
  shingles) is bounded because band keys combine R minhashes; AQE skew-join
  covers the residue.
- ngram-jaccard: candidate generation via shared *rare* shingles (document
  frequency cap) — the blocking trick that keeps the self-join linear-ish;
  verify with exact Jaccard on shingle sets.
- simhash: 16-bit majority-vote signature; near-dup = equal signature, or
  Hamming<=k retrieval via nibble banding (`simhash_hamming_pairs`): with
  the 16 bits split into 4 bands, any pair within Hamming distance 3 shares
  at least one whole band (pigeonhole), so one equi-join on (band, nibble)
  retrieves ALL such pairs — exact recall, no cross-join.
- embedding cosine: see simsearch.py (shares the blocked-pair machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- shared shingling -------------------------------------------------------


def word_tokens(col: str):
    return F.split(F.lower(F.col(col)), r"\s+")


def word_shingles(col: str, n: int = 5):
    """Distinct word n-gram shingles as strings (space-joined).

    NOTE (r7): prefer the two-step ``word_tokens`` projection +
    ``word_shingles_from`` at call sites — inlined like this, Catalyst
    re-evaluates the split() subtree for every transform element
    (measured ~2x on the shingle build over the bench corpus)."""
    toks = word_tokens(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def word_shingles_from(tokens_col, n: int = 5):
    """word_shingles, but over a pre-split token array COLUMN: the same
    expression tree with the split factored into its own projection, so it
    is evaluated once per row (CollapseProject keeps the boundary because
    the token column is referenced more than once). Output identical to
    word_shingles by construction (shared lambda shape; pinned by test)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(tokens_col) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(tokens_col, i + 1, n), " "),
        )
    )


# --- exact dedup -------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the
    canonical (min) id and the duplicate count."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# --- MinHash-LSH -------------------------------------------------------------


def minhash_signature(docs: DataFrame, id_col: str, text_col: str,
                      n_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """(id, mh0..mhK-1): engine-portable minhash, mh as BIGINT.

    Hash families are 8-hex-char substrings of md5(shingle) (families 0-3)
    and md5(shingle || '#') (families 4-7): two md5 invocations per shingle
    instead of eight, identical in DuckDB (`substring(md5(s), k*8+1, 8)`).
    Capped at 8 families; widen with more salts if a caller ever asks.

    The 8-hex-char slice is parsed to a uint32-valued BIGINT before the
    min-aggregation (r7, guide §2.3 narrower types): parsing is bijective
    on fixed-width hex and preserves order (lexicographic min over
    lowercase fixed-width hex == numeric min), so signatures are the same
    minhashes the hex form carried — but min(BIGINT) aggregates in a
    HashAggregate with partial map-side combine, where min(STRING) forced
    a SortAggregate with a full Sort of the exploded shingle stream on
    both sides of the shuffle (measured in the r6 plan)."""
    if n_hashes > 8:
        raise ValueError("portable signature supports n_hashes <= 8")
    # Null AND blank/whitespace-only docs are dropped here, NOT at the
    # banding join: they have no shingles (similarity undefined; empty-doc
    # dedup belongs to exact_dedup), and left in they collapse to one
    # signature (null mh -> md5("") band keys; blank text -> every shingle
    # is "") -> O(n^2) spurious pairs (round-3/round-4 advice). The
    # length(trim(..)) > 0 predicate is null-rejecting, so it covers both.
    # Filtering the SIGNATURE frame instead is 9x slower: Catalyst pushes
    # a predicate on mh0 through the projection chain and re-evaluates the
    # shingle/hash expressions for the filter (measured on sf0.1).
    sh = (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), word_tokens(text_col).alias("_toks"))
        .select(F.col(id_col), word_shingles_from(F.col("_toks"), shingle_n).alias("sh"))
    )
    # explode -> hash once per shingle row -> 8 map-side-combined mins.
    # An array-transform formulation keeps everything shuffle-free but
    # Catalyst's CollapseProject inlines the md5 struct into each of the 8
    # array_min consumers, re-hashing every shingle 8x (measured 20% SLOWER
    # than the naive form); as separate projection columns the two md5s are
    # computed once per shingle, and the min-agg shuffle carries only
    # 8 x 8-hex-char strings per doc.
    hashed = sh.select(F.col(id_col), F.explode(F.col("sh")).alias("s")).select(
        F.col(id_col),
        F.md5(F.col("s")).alias("h1"),
        F.md5(F.concat(F.col("s"), F.lit("#"))).alias("h2"),
    )

    def slot(k: int):
        field, off = ("h1", k) if k < 4 else ("h2", k - 4)
        return (
            F.conv(F.substring(F.col(field), off * 8 + 1, 8), 16, 10)
            .cast("bigint")
            .alias(f"v{k}")
        )

    numeric = hashed.select(F.col(id_col), *[slot(k) for k in range(n_hashes)])
    return numeric.groupBy(id_col).agg(
        *[F.min(f"v{k}").alias(f"mh{k}") for k in range(n_hashes)]
    )


def minhash_signature_fast(docs: DataFrame, id_col: str, text_col: str,
                           n_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """Engine-native minhash — the signature the ENGINE should use at crawl
    scale. Not oracle-portable (DuckDB has no xxhash64), so the md5 variant
    stays as the oracle-paired query; near-dup recall properties are
    identical (both are uniform hash families).

    Two cost levers vs the portable signature:
    - shingles are never materialized as strings: each word n-gram is
      hashed directly from its token columns (xxhash64 is variadic), so no
      slice/array_join allocations;
    - the k hash families reuse the one string-level hash: family k is
      xxhash64(shingle_hash, k) over a LONG, not a re-hash of the string.
    min() is duplicate-insensitive, so skipping array_distinct changes
    nothing. Null-text docs have no shingles and therefore NO signature
    row (similarity is undefined for them; empty-doc dedup belongs to
    exact_dedup).
    """
    toks = word_tokens(text_col)
    # F.get (0-based) returns null past the end instead of raising under
    # ANSI mode (docs shorter than the shingle width hash a null-padded
    # window — deterministic on both variants' terms)
    def window_hash(i):
        return F.xxhash64(*[F.get(F.col("toks"), i + j) for j in range(shingle_n)])

    # Null AND blank-text docs are dropped BEFORE the signature is built:
    # xxhash64 over an all-null window is a seed constant (and
    # greatest(null, 0) swallows the null size), and a whitespace-only doc
    # tokenizes to a constant window too — unguarded, each cohort shares
    # one signature and the banding join emits O(n^2) spurious pairs
    # (round-3/round-4 advice). length(trim(..)) > 0 is null-rejecting, so
    # one pushdown-friendly filter covers both. A plain filter rather than
    # a F.when guard around the transform: a conditional branch defeats
    # common-subexpression elimination and recomputes the tokenizer split
    # for every F.get reference in the window hash (measured 10x slower).
    base = docs.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), toks.alias("toks")
    ).select(
        F.col(id_col),
        F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.size(F.col("toks")) - shingle_n, F.lit(0))
            ),
            window_hash,
        ).alias("hs"),
    )

    def mh(k: int):
        seed = F.lit(k)
        return F.array_min(
            F.transform(F.col("hs"), lambda h: F.xxhash64(h, seed))
        ).alias(f"mh{k}")

    return base.select(F.col(id_col), *[mh(k) for k in range(n_hashes)])


def _banded_pairs_from_signature(sig: DataFrame, id_col: str, n_hashes: int,
                                 n_bands: int) -> DataFrame:
    """(a < b) candidate pairs from any mh0..mhK-1 signature frame: band
    keys combine R minhashes, one equi-join on (band, band_key)."""
    r = n_hashes // n_bands
    # Precondition: `sig` carries no null mh columns (both signature
    # builders drop null-text docs upstream — xxhash64 SKIPS null inputs,
    # so null signatures here would all collapse to the identical
    # seed-only band key and emit O(n^2) spurious pairs; and filtering
    # HERE is 9x slower, see minhash_signature).
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col(f"mh{b * r + i}") for i in range(r)])
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    left = banded.select(F.col(id_col).alias("a"), "band", "band_key")
    right = banded.select(F.col(id_col).alias("b"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      n_hashes: int = 8, n_bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs (a < b) via banded MinHash-LSH (portable
    md5 signature — same pairs as the DuckDB oracle's md5 band keys).

    r7 restructure (guide §2.4/§3): the previous band-key SELF-JOIN made
    Catalyst compute the whole shingle->md5->signature subtree TWICE (once
    per join side — both visible in the r6 plan); grouping doc ids per
    bucket computes the signature ONCE and generates pairs inside each
    bucket. Bucket membership is keyed on the R minhash values themselves
    (a struct) rather than md5(mh0||'|'||mh1): the '|' join makes the
    concat injective, so two docs share a band key iff they share the R
    minhash values — the identical pair set without hashing. Bucket sizes
    are bounded (band keys combine R minhashes), so collect_list stays
    small; the where(size > 1) drops the singleton buckets (the vast
    majority) before any pair is generated."""
    sig = minhash_signature(docs, id_col, text_col, n_hashes, shingle_n)
    r = n_hashes // n_bands
    # null-text docs already dropped inside minhash_signature (see there)
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        *[F.col(f"mh{b * r + i}").alias(f"k{i}") for i in range(r)]
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    return (
        buckets.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_lsh_pairs_fast(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", n_hashes: int = 8,
                           n_bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs via the xxhash64 signature — the crawl-scale
    fast path (same banding plan, integer band keys, no string md5)."""
    sig = minhash_signature_fast(docs, id_col, text_col, n_hashes, shingle_n)
    return _banded_pairs_from_signature(sig, id_col, n_hashes, n_bands)


# --- n-gram Jaccard ----------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        shingle_n: int = 5, threshold: float = 0.5,
                        max_df: int = 20) -> DataFrame:
    """Near-dup pairs by exact word-shingle Jaccard >= threshold.

    Candidate generation: self-join on shared shingles whose document
    frequency <= max_df (rare-shingle blocking — drops boilerplate shingles
    that would otherwise explode the join quadratically)."""
    sh = docs.select(F.col(id_col), word_tokens(text_col).alias("_toks")).select(
        F.col(id_col), word_shingles_from(F.col("_toks"), shingle_n).alias("sh")
    )
    sizes = sh.select(F.col(id_col), F.size("sh").alias("n_sh"))
    exploded = sh.select(F.col(id_col), F.explode("sh").alias("shingle"))
    rare = (
        exploded.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("shingle")
    )
    blocked = exploded.join(rare, "shingle")
    l = blocked.select(F.col(id_col).alias("a"), "shingle")
    rgt = blocked.select(F.col(id_col).alias("b"), "shingle")
    shared = (
        l.join(rgt, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.countDistinct("shingle").alias("n_shared"))
    )
    sz_a = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sz_a, "a")
        .join(sz_b, "b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_shared"))
        # integer-exact threshold: n_shared/union >= t  <=>  n_shared >= t*union
        .where(F.col("n_shared") >= threshold * F.col("n_union"))
        .withColumn(
            "jaccard_e6",
            F.floor(F.col("n_shared") / F.col("n_union") * 1000000.0).cast("long"),
        )
        .select("a", "b", "jaccard_e6")
    )


# --- SimHash ------------------------------------------------------------------


def simhash_bits(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 n_bits: int = 16) -> DataFrame:
    """n-bit SimHash over word tokens, engine-portable (n_bits <= 60).

    Bit j of token t = bit j of the first ceil(n/4) hex chars of md5(t);
    the signature bit is the majority vote weighted +1/-1 over DISTINCT
    tokens. 16 bits is the oracle-checkable toy width; a CC-scale dedup
    wants 60 (fewer random collisions per band — same banding machinery).
    60, not 64: the value must fit a positive BIGINT in both engines."""
    if n_bits > 60:
        raise ValueError("n_bits <= 60 (positive BIGINT range in both engines)")
    hex_chars = (n_bits + 3) // 4
    toks = docs.select(
        F.col(id_col), F.explode(F.array_distinct(word_tokens(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    toks = toks.withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, hex_chars), 16, 10).cast("long")
    )
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(n_bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_cols)
    sig = None
    for j in range(n_bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash16(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash (the oracle-paired width)."""
    return simhash_bits(docs, id_col, text_col, n_bits=16)


def simhash_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of documents with identical 16-bit simhash (near-dup buckets)."""
    return (
        simhash16(docs, id_col, text_col)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("canonical_id"))
        .where(F.col("n_docs") > 1)
    )


def simhash_hamming_pairs(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 3,
                          n_bands: int = 4, n_bits: int = 16) -> DataFrame:
    """All pairs (a < b) with Hamming(simhash_a, simhash_b) <= k.

    Banding on (n_bits/n_bands)-bit nibbles: a pair within Hamming distance
    k < n_bands must agree exactly on >=1 band (pigeonhole), so the
    (band, nibble) equi-join has EXACT recall — this is the CC-crawl-scale
    plan (one shuffle, bucket fan-out bounded by band cardinality), not an
    approximation. Verification is a JVM-side popcount on the XOR.
    n_bits=16 is the oracle-paired toy width (its Hamming<=3 ball is loose,
    so the output itself is large on a similar-topic corpus); a production
    crawl dedup uses n_bits=60, n_bands=4 — 15-bit bands, tight ball, same
    plan (test-pinned against brute force at both widths).

    Reference analog (what, not how): duplicate-title collapse in the
    reference's entity merge (SURVEY.md §2 A-family); re-expressed as the
    standard simhash banding retrieval."""
    if k >= n_bands:
        raise ValueError("exact recall needs k < n_bands")
    if n_bits % n_bands:
        raise ValueError("n_bits must divide evenly into n_bands")
    sig = simhash_bits(docs, id_col, text_col, n_bits=n_bits)
    bits = n_bits // n_bands
    mask = (1 << bits) - 1
    banded = sig.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * bits).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "nib"),
    )
    left = banded.select(
        F.col(id_col).alias("a"), F.col("simhash").alias("sig_a"), "band", "nib"
    )
    right = banded.select(
        F.col(id_col).alias("b"), F.col("simhash").alias("sig_b"), "band", "nib"
    )
    return (
        left.join(right, ["band", "nib"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .distinct()
        .select(
            "a",
            "b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("int")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= k)
    )


# --- corpus-level span dedup (C4-style) --------------------------------------


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 10,
) -> DataFrame:
    """Global span-level dedup, the C4 move (Raffel et al. 2020 discard
    repeated three-sentence spans corpus-wide; here the span unit is a
    fixed token window since the corpus has no sentence boundaries):
    split each doc into consecutive `chunk_tokens`-token chunks, keep
    only the FIRST occurrence of each distinct chunk corpus-wide (first =
    lowest (doc_id, chunk_idx)), and reassemble the surviving text.

    Returns (id_col, n_chunks, n_kept, text_deduped).

    Scale shape (r7, guide §8 "decide with small rows, move big rows
    once" — here ZERO times): the exploded stream that shuffles carries
    only (id, chunk_idx, md5) — never the chunk text. The winner per
    chunk hash is a groupBy min-struct (partial aggregate combines
    map-side, so a billion-copy boilerplate chunk reduces before the
    wire); the join back rides the same hashpartitioning (ReusedExchange)
    and yields just the DROPPED (id, chunk_idx) positions — a set bounded
    by the duplicate occurrences, tiny on real corpora. Reassembly then
    happens MAP-SIDE on the un-shuffled base table: re-derive the chunks
    (pure function of text) and filter out the dropped positions, so the
    corpus text itself crosses the wire exactly zero times (the old form
    shuffled the full text twice: once into the hash join, once back on
    doc_id). The drop-set join broadcasts when small; a pathological
    all-duplicates corpus degrades to ONE text-free shuffle of positions.
    """
    # two-step split -> chunk (r7): inlined, the split() subtree was
    # re-evaluated for every transform element (see word_shingles_from)
    tc = F.col("_toks")
    n_chunks = F.ceil(F.size(tc) / F.lit(chunk_tokens)).cast("int")
    base = docs.select(id_col, text_col).where(F.col(text_col).isNotNull())
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(tc, i * chunk_tokens + 1, chunk_tokens), " "),
    )
    chunked = base.select(
        id_col, F.split(F.col(text_col), r"\s+").alias("_toks")
    ).select(
        id_col,
        F.posexplode(chunk_arr).alias("chunk_idx", "chunk"),
    ).select(id_col, "chunk_idx", F.md5(F.col("chunk")).alias("_h"))
    # two consumers (winner agg + join back) share one Exchange(_h):
    # ReusedExchange computes the chunk build once. No localCheckpoint
    # here — cutting the lineage would also cut the REBUILD branch off the
    # shared corpus subtree and re-derive the (round-robin-spread) corpus
    # a second time; with the plan intact, every branch reuses both the
    # corpus exchange and the _h exchange (verified in the committed plan).
    winners = chunked.groupBy("_h").agg(
        F.min(F.struct(id_col, "chunk_idx")).alias("_first")
    )
    dropped = (
        chunked.join(winners, "_h")
        .where(
            (F.col(f"_first.{id_col}") != F.col(id_col))
            | (F.col("_first.chunk_idx") != F.col("chunk_idx"))
        )
        .groupBy(id_col)
        .agg(F.collect_list("chunk_idx").alias("_dropped"))
    )
    # map-side rebuild: same chunk derivation as above (byte-identical by
    # construction), minus the dropped positions, in original order —
    # filter's index lambda sees exactly the chunk_idx posexplode emitted
    drop_set = F.coalesce(F.col("_dropped"), F.expr("array()").cast("array<int>"))
    return (
        base.join(dropped, id_col, "left")
        .select(
            id_col,
            F.split(F.col(text_col), r"\s+").alias("_toks"),
            drop_set.alias("_drop"),
        )
        .select(
            id_col,
            n_chunks.cast("long").alias("n_chunks"),
            (n_chunks.cast("long") - F.size("_drop")).alias("n_kept"),
            F.array_join(
                F.filter(
                    chunk_arr,
                    lambda _c, i: ~F.array_contains(F.col("_drop"), i),
                ),
                " ",
            ).alias("text_deduped"),
        )
    )


def near_dup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end near-dup resolution — the full training-data dedup
    pass, not just candidate pairs: MinHash-LSH pairs -> connected
    components over the near-dup graph -> one canonical survivor per
    cluster (lowest id). Returns every doc with its cluster id, cluster
    size, and keep flag, so `WHERE keep` IS the deduplicated corpus.

    Transitivity is deliberate (A~B, B~C merges all three even if A,C
    never paired — the standard corpus-dedup semantics, same clustering
    the reference applies to entity surface forms,
    /root/reference/scripts/assign_canonical_names_simple.py:118-151).

    Scale shape: pairs are the banded equi-join (minhash_lsh_pairs);
    components are pointer-doubled min-label propagation, O(log diameter)
    rounds — and near-dup graphs are almost all tiny cliques, so the
    frontier empties after round 1; singletons ride through the left
    anti pattern below as their own cluster."""
    from pyspark.sql import Window

    from ..canonicalize import connected_components

    pairs = minhash_lsh_pairs(
        docs, id_col=id_col, text_col=text_col,
        n_hashes=n_hashes, n_bands=n_bands, shingle_n=shingle_n,
    )
    nodes = docs.select(F.col(id_col).alias("node"))
    comp = connected_components(
        nodes, pairs.select(F.col("a"), F.col("b")), max_iter=25
    )
    w_sz = F.count("*").over(Window.partitionBy("component"))
    return (
        comp.select(F.col("node").alias(id_col), "component")
        .withColumn("cluster_size", w_sz.cast("long"))
        .withColumn("keep", F.col(id_col) == F.col("component"))
    )
