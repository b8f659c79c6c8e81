"""Deduplication operators for LLM-data pipelines, designed for 100 TB.

Strategies, cheapest first:

* **exact** — md5(normalized text) groupBy.  One shuffle of (hash, id);
  map-side combine makes the shuffle proportional to distinct hashes.
* **ngram-jaccard** — exact Jaccard over word-shingle sets via prefix
  filtering (AllPairs/PPJoin): candidates only need to share a shingle in
  their df-ordered prefixes, so the join keys are the RARE shingles —
  exact results without the hot-shingle quadratic blowup.
* **minhash LSH** — the scale path: per-doc signature of P minhashes
  (xxhash64 with P salts, all JVM-side), banded into B buckets; only
  same-bucket pairs are verified with exact Jaccard.  Shuffle volume is
  O(docs × B) small rows instead of O(docs × shingles).
* **simhash** — 64-bit near-dup fingerprint (hamming ≤ k); band join on
  16-bit chunks for candidates.
* **embedding cosine** — near-dup by embedding similarity; random-hyperplane
  LSH buckets then exact cosine verify (see similarity.py).

Every function returns a DataFrame builder (lazy); nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from streamkit_spark.functions.text import normalized_text, tokens, word_ngrams
from streamkit_spark.functions.util import (
    BROADCAST_ROW_LIMIT,
    maybe_broadcast,
    pairs_from_sorted_groups,
)


def _lc(text_col: str) -> Column:
    """Dedup operates case-insensitively: shingles come from lowercased
    text (the oracle SQL mirrors with lower(text))."""
    return F.lower(F.col(text_col))


from streamkit_spark.functions.util import spread as _spread  # noqa: E402
# (hoisted to functions/util.py in r8 so zorder_stats and future
# expression-heavy folds share ONE definition; dedup call sites keep
# the historical _spread name)


# ---------------------------------------------------------------- exact

def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents.
    Returns (text_hash, n_docs, keep_id) for groups with n_docs > 1."""
    h = F.md5(normalized_text(text_col))
    return (
        df.select(h.alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("text_hash")
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id document per identical normalized text.

    Implemented as a partial-aggregable min_by groupBy (NOT a window —
    a window would sort whole partitions; min_by combines map-side)."""
    h = F.md5(normalized_text(text_col))
    row = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(F.min_by(row, F.col(id_col)).alias("__r"))
        .select("__r.*")
    )


# ---------------------------------------------------------- ngram jaccard

def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) exploded distinct word n-grams."""
    return _spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(_lc(text_col), n)).alias("shingle"),
    )


def _verified_pair_arrays(
    df: DataFrame, cand: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Exact-verification join shared by the pair operators whose
    candidate sets are SMALL (LSH banding, signature fidelity):
    candidate (id_a, id_b) pairs joined to the map-only distinct
    shingle STRING arrays recomputed straight from the docs scan
    (cheap — no dfreq pipeline), returning ``(id_a, id_b, __sa, __sb)``.

    Sibling: :func:`_verified_pair_ids` serves the CANDIDATE-HEAVY
    operators (prefix-filter jaccard/overlap/containment, ~10⁵+ pairs
    at sf0.1) where per-candidate string hashing dominates — there the
    dense-long-id arrays win big; HERE the id pipeline's fixed cost
    (vocab distinct + rank window + checkpoint + per-doc collect)
    LOSES to it (r12 interleaved A/B: minhash_lsh 2.15 → 3.06 s,
    fidelity 1.42 → 2.70 s WORSE on ids; jaccard 5.75 → 4.72 s better).

    cand is normally tiny next to the shingle arrays, but its size is
    corpus-dependent (a boilerplate-heavy corpus can explode it) and
    its pipeline is too expensive for a count probe — it stays
    un-hinted (maybe_broadcast) so AQE broadcasts from the measured
    runtime size and the pathological case shuffles instead of OOMing.
    ONE copy per regime: the r6 review found three dedup oracles
    diverging on tokenization that only the shared-helper discipline
    prevents."""
    arrays = _spread(df).select(
        F.col(id_col).alias("doc_id"), word_ngrams(_lc(text_col), n).alias("sh")
    )
    va = arrays.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("__sa"))
    vb = arrays.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("__sb"))
    return va.join(maybe_broadcast(cand), "id_a").join(vb, "id_b")


def _verified_pair_ids(
    df: DataFrame, cand: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Exact-verification join for the CANDIDATE-HEAVY pair operators
    (prefix-filter jaccard / overlap / containment): same contract as
    :func:`_verified_pair_arrays` — ``(id_a, id_b, __sa, __sb)``, with
    downstream code reading only ``F.size`` and ``F.array_intersect``
    sizes — but the arrays carry dense LONG shingle ids instead of the
    ~25-byte shingle strings.

    The id map is a BIJECTION, so every set size and intersection size
    is IDENTICAL to the string computation (proven by exceptAll both
    ways on all five verify consumers at two SFs); only the hash work
    per candidate element changes.  Ids are a bucketed dense rank,
    ``pmod(xxhash64(shingle), 2^16) · 2^43 + row_number within the
    bucket`` — injective while each bucket holds < 2^31 shingles
    (row_number is INT-typed; with 2^16 buckets that is ~1.4e14
    distinct shingles total) with no single-partition global window at
    any vocabulary size.  The id table is localCheckpoint'ed — an
    EAGER job at plan-construction time, which is why logical-plan-only
    contexts (the SQL view registry) must route through the string
    sibling.  The per-doc vector table built on it is referenced by
    both array sides and re-planned per side (the join+collect runs
    ≤2×; the measured wins below INCLUDE that cost — checkpointing the
    vectors too would trade more eager materialization for the saved
    re-plan and is left unmeasured).

    PRECONDITION (both siblings): ``id_col`` must be unique per doc.
    The candidate stages already MERGE duplicate-id rows (their df
    counts and per-doc rank windows key on doc_id), so duplicate ids
    are incoherent upstream of the verify; this helper's per-doc
    groupBy additionally concatenates duplicate rows' id arrays where
    the string sibling would emit one (duplicated) row per input row —
    neither behavior is meaningful, fix the input.

    Measured at sf0.1: dedup_containment 5.59 → 4.77 s (32 cores) and
    8.06 → 4.79 s (8 cores, where string hashing was the compute
    floor); dedup_ngram_jaccard 5.75 → 4.72 s; effective_tokens
    6.49 → 5.85 s.  For SMALL candidate sets the fixed id-pipeline cost
    dominates — use the string sibling there (numbers in its
    docstring)."""
    sh = shingle_table(df, text_col, id_col, n)
    bucket = F.pmod(F.xxhash64("shingle"), F.lit(1 << 16))
    wid = Window.partitionBy("__b").orderBy("shingle")
    ids = (
        sh.select("shingle")
        .distinct()
        .select("shingle", bucket.alias("__b"))
        .select(
            "shingle",
            (
                F.col("__b").cast("long") * F.lit(1 << 43).cast("long")
                + F.row_number().over(wid)
            ).alias("__sid"),
        )
        .localCheckpoint()
    )
    vec = (
        sh.join(ids, "shingle")
        .groupBy("doc_id")
        .agg(F.collect_list("__sid").alias("__sv"))
    )
    va = vec.select(F.col("doc_id").alias("id_a"), F.col("__sv").alias("__sa"))
    vb = vec.select(F.col("doc_id").alias("id_b"), F.col("__sv").alias("__sb"))
    return va.join(maybe_broadcast(cand), "id_a").join(vb, "id_b")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    verify: str = "ids",
) -> DataFrame:
    """Exact n-gram Jaccard pairs via prefix filtering (the AllPairs /
    PPJoin family — Bayardo, Ma & Srikant, "Scaling Up All Pairs
    Similarity Search", WWW'07).  Output: (id_a, id_b, jaccard) with
    id_a < id_b and jaccard ≥ threshold — identical to the naive
    all-candidates computation, but without its hot-shingle skew.

    ``verify``: ``"ids"`` (default — the dense-long-id verify, fastest
    on this operator's large candidate sets, but its id table runs an
    EAGER localCheckpoint job at plan-construction time) or
    ``"arrays"`` (the string-array verify, fully LAZY — required by
    logical-plan-only contexts like the SQL view registry, which must
    not run jobs at registration).  Both produce byte-identical output
    (the id map is a bijection).

    Why this scales where the raw shingle self-join doesn't: joining on
    every shingle explodes quadratically on common shingles ("the end of"
    appearing in D docs → D² candidate rows on one shuffle key).  Prefix
    filtering orders each doc's shingles by ascending global document
    frequency and emits only the first ``|A| - ⌈t·|A|⌉ + 1`` of them; any
    pair with J ≥ t provably shares a prefix shingle (|A∩B| ≥ ⌈t·|A|⌉
    elements can't all hide in the ⌈t·|A|⌉-1 suffix positions), so
    candidate recall is exactly 1 — while the join keys are now the RARE
    shingles, removing the skew by construction.  Candidates are verified
    with exact jaccard over the full shingle arrays (broadcast, as in
    :func:`minhash_lsh_pairs`).

    The prefix length uses integer arithmetic (``⌈t·n⌉`` via a rational
    t), never float ceil — a float ulp upward would shorten the prefix
    and silently lose pairs.
    """
    # The exploded (doc, shingle) table has TWO consumers (the df
    # aggregate and the ranked join's probe side).  r12 MEASURED a
    # localCheckpoint here (VERDICT r11 item #4) and REJECTED it:
    # interleaved A/B at sf0.1 gave old 6.92 vs new 7.67 s (runs=4) then
    # 6.52 vs 6.50 (runs=6) — materializing ~25-byte shingle strings
    # costs at least what the second map-only tokenize pass saves, and
    # AQE exchange reuse already dedupes the shuffle when it fires.
    # Keep the double map-side derivation; at 100 TB the shingle table
    # would be materialized at ingest anyway.
    sh = shingle_table(df, text_col, id_col, n)
    # threshold as a rational t_num/t_den so every bound below is exact
    # integer arithmetic
    t_num, t_den = int(round(threshold * 1_000_000)), 1_000_000
    # per-doc (global df asc, shingle) rank via ONE window over the
    # doc-partitioned rows — the same total order the prefix theorem
    # needs, WITHOUT materializing per-doc sorted arrays and re-exploding
    # them (the old collect_list + array_sort + slice + posexplode shape
    # buffered every group as an array and paid per-element struct churn;
    # the sort-based window streams it — measured 5.25 -> 4.63 s median
    # on the threshold-0.6 pipeline, identical candidates).  The window
    # is also a materialization barrier with a single downstream
    # consumer, so nothing re-derives it.  Scale bound (VERDICT r11 #6):
    # partitionBy(doc_id) holds ONE DOC's shingle set per task — the
    # same O(doc length) bound the old collect_list shape had, and the
    # order the in-row shingle-array expressions elsewhere already hold
    # per row; the window input is the spread shingle table (plan
    # contract: test_r12_prefix_window_shapes).
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    wrk = Window.partitionBy("doc_id").orderBy("df", "shingle")
    wct = Window.partitionBy("doc_id")
    ranked = sh.join(dfreq, "shingle").select(
        "doc_id",
        "shingle",
        F.row_number().over(wrk).alias("rk1"),
        F.count("*").over(wct).alias("nsh"),
    )
    # prefix = first n - ceil(t*n) + 1 shingles; carry set size and prefix
    # position for the PPJoin length/position filters
    # ceil multiply in BIGINT: nsh is INT/LONG and n * t_num overflows an
    # INT32 past ~⌈2^31/t_num⌉ ≈ 3.6k distinct shingles (ANSI crash /
    # silent wrap)
    plen = F.expr(
        f"cast(nsh - ((cast(nsh as bigint) * {t_num}"
        f" + {t_den - 1}) div {t_den}) + 1 as int)"
    )
    prefix = ranked.filter(F.col("rk1") <= plen).select(
        "doc_id",
        F.col("nsh").cast("int").alias("nsh"),
        (F.col("rk1") - 1).alias("rk"),
        "shingle",
    )
    # Candidate generation WITHOUT a self-join: group prefix rows by
    # shingle and enumerate in-group pairs.  A self-join would instantiate
    # the whole dfreq+sort pipeline twice (observed: Catalyst plans 4
    # copies of it across prefix(a), prefix(b) and the two verify
    # branches, each independently broadcast — bimodal 3 s/24 s runtimes
    # depending on whether AQE reuses the exchanges).  Grouping keeps ONE
    # reference; group sizes are bounded because prefixes hold the RARE
    # shingles.
    grouped = prefix.groupBy("shingle").agg(
        F.collect_list(F.struct("doc_id", "nsh", "rk")).alias("ds")
    )
    pair = grouped.filter(F.size("ds") > 1).select(
        F.explode(
            F.flatten(
                F.transform(
                    "ds",
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + 2, F.size("ds")),
                        lambda y: F.struct(x.alias("x"), y.alias("y")),
                    ),
                )
            )
        ).alias("p")
    )
    # overlap requirement α = ceil(t/(1+t) · (|A|+|B|)); a shared prefix
    # shingle at 0-based ranks (i, j) bounds the overlap by
    # min(|A|-i, |B|-j), and the pair's globally-smallest common shingle
    # always yields a passing row, so the filters lose no qualifying pair
    # (both filters are symmetric in x/y, so pair order is irrelevant)
    xa, ya = F.col("p.x"), F.col("p.y")
    # every size × t_num/t_den product runs in BIGINT: INT32 nsh times a
    # ~10^6 literal overflows at ~2.1k distinct shingles (ANSI crash /
    # silent wrap breaking exact recall) — the plen bug class
    alpha = F.expr(
        f"((cast(p.x.nsh as bigint) + p.y.nsh) * {t_num}"
        f" + {t_num + t_den - 1}) div {t_num + t_den}"
    )
    cand = (
        pair.filter(
            # length filter: t·|A| ≤ |B| ≤ |A|/t
            (ya["nsh"].cast("long") * t_den >= xa["nsh"].cast("long") * t_num)
            & (xa["nsh"].cast("long") * t_den >= ya["nsh"].cast("long") * t_num)
            # position filter
            & (
                F.least(xa["nsh"] - xa["rk"], ya["nsh"] - ya["rk"]) >= alpha
            )
        )
        .select(
            F.least(xa["doc_id"], ya["doc_id"]).alias("id_a"),
            F.greatest(xa["doc_id"], ya["doc_id"]).alias("id_b"),
        )
        .distinct()
    )
    # exact-jaccard verify on candidates (shared helper).  |A∪B| =
    # |A| + |B| − |A∩B| (word_ngrams arrays are distinct sets), so the
    # union array is never materialized — same two exact integers, the
    # identical double division.
    if verify not in ("ids", "arrays"):
        raise ValueError(f"unknown verify mode: {verify!r} (ids|arrays)")
    _verify = _verified_pair_ids if verify == "ids" else _verified_pair_arrays
    inter = F.size(F.array_intersect("__sa", "__sb"))
    return (
        _verify(df, cand, text_col, id_col, n)
        .select(
            "id_a",
            "id_b",
            (
                inter.cast("double")
                / (F.size("__sa") + F.size("__sb") - inter)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .orderBy("id_a", "id_b")
    )


def overlap_coefficient_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int = 64,
) -> DataFrame:
    """Near-dup pairs by overlap coefficient (Szymkiewicz–Simpson):
    |A∩B| / min(|A|,|B|) ≥ threshold — the asymmetric-containment
    companion to Jaccard that catches a short document wholly embedded in
    a long one (quote inclusion, page-in-site), which Jaccard misses
    because the union is dominated by the long side.

    Candidate generation: group-and-enumerate docs sharing a shingle with
    document frequency ≤ ``max_df``, then verify the exact coefficient
    over the full shingle sets.  Unlike Jaccard, containment admits NO
    exact prefix filter (a tiny doc inside a huge one constrains neither
    side's prefix — the reason containment joins are the hard case in the
    AllPairs literature), so the df-cut is the recall contract: a pair
    sharing ONLY boilerplate shingles (df > max_df) is missed.  That is
    the same deliberate trade :func:`substring_dup_pairs` makes, and the
    oracle mirrors the cut exactly.

    Output: (id_a, id_b, overlap) with id_a < id_b, overlap rounded 4dp.
    """
    # word_ngrams is per-doc distinct already, so shingle_table rows are
    # unique (doc, shingle) pairs — no distinct pass needed
    sh = shingle_table(df, text_col, id_col, n)
    cand = pairs_from_sorted_groups(
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_df))
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    denom = F.least(F.size("__sa"), F.size("__sb"))  # arrays are distinct
    return (
        _verified_pair_ids(df, cand, text_col, id_col, n)
        .select("id_a", "id_b", (inter / denom).alias("overlap"))
        .filter(F.col("overlap") >= F.lit(threshold))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------- minhash LSH

def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    ngram: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig array<long>[num_hashes]) MinHash signatures.

    Implementation note: a pure map-only fold (``aggregate`` + ``zip_with``
    over the shingle array) benches 2× faster *in isolation*, but Catalyst
    projection-collapse inlines such a derived array expression into every
    downstream reference — the 64 per-band ``sig[i]`` lookups each
    re-evaluated the whole fold (observed 8× pipeline blow-up).  The
    explode + groupBy(min...) formulation keeps an Aggregate node between
    the signature and its consumers, which is a natural materialization
    barrier: sig is computed exactly once.  Shuffle carries one
    (id, 64 longs) row per doc — independent of document length."""
    sh = _spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(_lc(text_col), ngram)).alias("shingle"),
    )
    # ONE expr literal for all hashes (the hyperplane_bucket/lit_vec
    # lesson): 64 per-hash Column chains cost ~200 py4j round-trips of
    # plan construction; a single SQL string parses JVM-side in one.
    # `seed + i` stays an INT literal exactly as F.lit produced (xxhash64
    # hashes value AND type).
    if hash_fn == "xxhash64":
        slots = ", ".join(
            f"min(xxhash64(shingle, {seed + i}))" for i in range(num_hashes)
        )
    elif hash_fn == "md5":
        # oracle path (the bloom/bootstrap precedent): 24-bit md5 head
        # per slot — DuckDB reconstructs the value nibble-wise.  Same
        # min-over-shingles semantics; the narrower hash adds a
        # negligible within-doc collision mass (~|shingles|²/2²⁵)
        slots = ", ".join(
            "min(cast(conv(substring(md5(concat("
            f"'mh:{seed}:{i}:', shingle)), 1, 6), 16, 10) as bigint))"
            for i in range(num_hashes)
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64 | md5)")
    sig_expr = f"array({slots}) as sig"
    return sh.groupBy("doc_id").agg(F.expr(sig_expr))


def band_row_table(sig: DataFrame, bands: int, num_hashes: int) -> DataFrame:
    """(doc_id, band, bucket) rows from a signature table: bucket =
    xxhash64 over the band's slice of the signature.  B small fixed-width
    rows per doc — the only thing the LSH equi-join ever shuffles."""
    rows_per_band = num_hashes // bands
    # one expr literal for the bands×rows struct array (py4j trim; the
    # per-slot expressions are byte-identical to the Column-chain form)
    structs = ", ".join(
        "struct({b} as band, xxhash64(concat_ws(',', {slots})) as bucket)".format(
            b=b,
            slots=", ".join(
                f"cast(sig[{b * rows_per_band + r}] as string)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return sig.select(
        "doc_id", F.expr(f"explode(array({structs}))").alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")


def sig_jaccard_estimate(sig_a: Column, sig_b: Column) -> Column:
    """MinHash Jaccard estimate = fraction of agreeing signature slots.
    Unbiased, std ≈ sqrt(j(1-j)/P) (~0.05 at P=64) — the verify step when
    shingle sets are no longer on hand (e.g. checking against a persisted
    signature index)."""
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return agree.cast("double") / F.size(sig_a)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH, verified with exact
    Jaccard.  Output: (id_a, id_b, jaccard), id_a < id_b, jaccard ≥ threshold.

    B bands of R=num_hashes/B rows: candidate probability ≈
    1-(1-j^R)^B — at 64/16 the S-curve knees near j≈0.6, comfortably
    below the 0.8 default threshold (high recall), and the exact-Jaccard
    verify removes false positives, so the result equals
    :func:`ngram_jaccard_pairs` on any corpus where LSH recall holds.
    """
    assert num_hashes % bands == 0
    sig = minhash_signature(df, text_col, id_col, num_hashes, ngram, seed)
    band_rows = band_row_table(sig, bands, num_hashes)
    # Group-and-enumerate same-bucket pairs instead of a band_rows⋈band_rows
    # self-join: the self-join plans the signature pipeline (shingle explode
    # + 64-way min aggregate, the expensive part) once per branch, and AQE
    # exchange reuse is not guaranteed (observed bimodal runtimes in the
    # jaccard operator).  Grouping keeps exactly ONE signature computation;
    # bucket group sizes are duplicate-cluster-sized, so the in-row pair
    # enumeration is bounded.
    cand = pairs_from_sorted_groups(
        band_rows.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    # exact-Jaccard verify on candidates only — the shared int-id verify
    # join (r12: the inline string-array copy folded into the ONE helper;
    # maybe_broadcast rationale and the union-free |A∪B| identity live
    # there)
    inter = F.size(F.array_intersect("__sa", "__sb"))
    return (
        _verified_pair_arrays(df, cand, text_col, id_col, ngram)
        .select(
            "id_a",
            "id_b",
            (
                inter.cast("double")
                / (F.size("__sa") + F.size("__sb") - inter)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .orderBy("id_a", "id_b")
    )


def minhash_fidelity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    round_digits: int = 4,
) -> DataFrame:
    """Signature-fidelity audit of the MinHash estimator — the recall-
    audit discipline (ivf/lsh/pq/ivfadc_recall) applied to DEDUP's
    approximation: for every LSH candidate pair, the signature-agreement
    Jaccard estimate next to the exact shingle Jaccard.  dedup_minhash_lsh
    verifies candidates exactly before dropping, so estimator error never
    corrupts its output — this measures the estimator itself (std ≈
    √(j(1−j)/P), ~0.06 at P=64), which is what a pipeline trusting raw
    signatures (e.g. a persisted signature index, streaming/neardup)
    actually runs on.

    Output: (id_a, id_b, agree_n, j_est, j_exact, abs_err) per candidate
    pair, id_a < id_b.

    Plan shape: the signature aggregate is localCheckpoint'ed — band
    rows + both pair-side joins reference it (3 references; the derived-
    table re-planning hazard).  Band buckets here are the RAW
    concatenated slot strings, not xxhash64 of them (band_row_table's
    fixed-width optimization) — grouping is identical modulo hash
    collisions and the oracle replays the string key exactly.  Candidate
    enumeration is the shared group-and-enumerate; shingle arrays join
    only against candidates."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be a multiple of bands")
    rows_per_band = num_hashes // bands
    sig = minhash_signature(
        df, text_col, id_col, num_hashes, ngram, seed, hash_fn=hash_fn
    ).localCheckpoint()
    structs = ", ".join(
        "struct({b} as band, concat_ws(',', {slots}) as bucket)".format(
            b=b,
            slots=", ".join(
                f"cast(sig[{b * rows_per_band + r}] as string)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    band_rows = sig.select(
        "doc_id", F.expr(f"explode(array({structs}))").alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    cand = pairs_from_sorted_groups(
        band_rows.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb"))
    # the exact side rides the ONE shared verify join (r8 extraction —
    # a tokenization tweak cannot fork from the other detectors)
    verified = _verified_pair_arrays(df, cand, text_col, id_col, ngram)
    agree = F.aggregate(
        F.zip_with("sa", "sb", lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    j_est = agree.cast("double") / F.lit(num_hashes)
    # |A∪B| = |A| + |B| − |A∩B| over distinct shingle arrays (no union
    # array materialized; identical exact integers → identical double)
    _fid_inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    j_exact = _fid_inter.cast("double") / (
        F.size(F.col("__sa")) + F.size(F.col("__sb")) - _fid_inter
    )
    return (
        verified.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            agree.cast("long").alias("agree_n"),
            F.round(j_est, round_digits).alias("j_est"),
            F.round(j_exact, round_digits).alias("j_exact"),
            F.round(F.abs(j_est - j_exact), round_digits).alias("abs_err"),
        )
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------- simhash

def _md5_bit_sign(b: int) -> Column:
    """±1 contribution of bit ``b`` (0..63) of the token's 64-bit md5-prefix
    hash: hex nibble ``b // 4`` of md5(tok) (column ``h``), little-endian
    within the nibble.  Chosen because md5 is byte-identical in Spark and
    DuckDB, so a simhash built from it is oracle-reproducible (xxhash64,
    the fast default, exists only in Spark)."""
    nib = F.expr(f"locate(substr(h, {b // 4 + 1}, 1), '0123456789abcdef') - 1")
    return F.when(F.shiftright(nib, b % 4).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash long) — 64-bit SimHash over whitespace tokens.

    Per bit b: sign of Σ_tokens (bit_b(hash(token)) ? +1 : -1).
    Implemented as one explode + 64 conditional-sum aggregates (all JVM);
    the shuffle carries one row of 64 ints per doc.

    ``hash_fn``: ``"xxhash64"`` (default, fastest — JVM intrinsic) or
    ``"md5"`` (first 16 hex nibbles of md5 — identical in DuckDB, used by
    the declared-query corpus so the oracle can mirror the fingerprints).
    """
    tok = _spread(df).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(_lc(text_col))).alias("tok")
    )
    if hash_fn == "xxhash64":
        tok = tok.withColumn("h", F.xxhash64("tok"))
        bit_sums = [
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    elif hash_fn == "md5":
        tok = tok.withColumn("h", F.md5("tok"))
        bit_sums = [F.sum(_md5_bit_sign(b)).alias(f"b{b}") for b in range(64)]
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseXOR(term)  # disjoint bits: XOR == OR
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Candidates via the pigeonhole band trick: split 64 bits into
    (max_hamming+1) chunks; any pair within the radius shares ≥1 exact
    chunk → equi-join on (chunk_idx, chunk_value), then verify hamming.
    Unlike MinHash banding this candidate step is EXACT (pigeonhole, not
    probabilistic): the output equals all-pairs hamming ≤ k for the same
    fingerprints — which is what the DuckDB oracle computes."""
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    fp = simhash64(df, text_col, id_col, hash_fn=hash_fn)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.ci", "c.cv")
    # Group-and-enumerate same-chunk pairs instead of a chunks⋈chunks
    # self-join: the self-join would instantiate the 64-aggregate simhash
    # pipeline once per branch (the minhash/jaccard lesson — AQE exchange
    # reuse is not guaranteed).  Grouping keeps exactly ONE simhash
    # computation; each group carries (doc_id, simhash) structs so the
    # hamming verify happens in-row, no join back.  array_sort on the
    # struct orders by doc_id (first field), giving id_a < id_b.
    cand = (
        chunks.groupBy("ci", "cv")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "simhash"))
            ).alias("ds")
        )
        .filter(F.size("ds") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ds",
                        lambda x, i: F.transform(
                            F.slice(F.col("ds"), i + 2, F.size("ds")),
                            lambda y: F.struct(
                                x.getField("doc_id").alias("id_a"),
                                y.getField("doc_id").alias("id_b"),
                                F.bit_count(
                                    x.getField("simhash").bitwiseXOR(
                                        y.getField("simhash")
                                    )
                                ).alias("hamming"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.hamming")
        .distinct()
    )
    return (
        cand.filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------------- duplicate clusters

def pair_source_matrix(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Cross-group duplication matrix: count near-dup PAIRS by the
    (group_a, group_b) of their endpoints — "which crawl copies from
    which?"  ``dup_rate_by_source`` answers how much of EACH source is
    duplicated; this answers WHERE the duplicates point: a hot
    off-diagonal cell is one source mirroring another (or a shared
    upstream), a hot diagonal cell is within-source boilerplate.
    Output ``(group_a, group_b, n_pairs)`` with group_a <= group_b.

    Scale: two broadcast-size joins of the pair table against the
    (id, group) projection (|pairs| ≪ corpus after blocking), then a
    groups²-bounded aggregate."""
    g = docs.select(
        F.col(id_col).alias("__pid"), F.col(group_col).alias("__pg")
    )
    j = (
        pairs.select("id_a", "id_b")
        .join(
            g.select(
                F.col("__pid").alias("id_a"), F.col("__pg").alias("__ga")
            ),
            "id_a",
        )
        .join(
            g.select(
                F.col("__pid").alias("id_b"), F.col("__pg").alias("__gb")
            ),
            "id_b",
        )
    )
    return (
        j.select(
            F.least("__ga", "__gb").alias("group_a"),
            F.greatest("__ga", "__gb").alias("group_b"),
        )
        .groupBy("group_a", "group_b")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        # NULLS LAST on both engines (Spark defaults NULLS FIRST on ASC,
        # DuckDB NULLS LAST): a NULL source group must not reorder rows
        # differently per engine
        .orderBy(
            F.col("group_a").asc_nulls_last(),
            F.col("group_b").asc_nulls_last(),
        )
    )


def substring_exposure(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
    min_shared: int = 2,
    max_df: int | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document memorization-risk exposure from the winnowing pair
    table (:func:`substring_dup_pairs`): for every document in at least
    one qualifying pair, how many OTHER documents share long verbatim
    substrings with it and how many fingerprint agreements in total —
    ``(doc_id, n_partners, shared_fps_total)``.  The ranking Lee et
    al. 2022's memorization analysis acts on: a doc whose spans recur
    across many partners is the one a model will regurgitate.

    Scale: the pair table is the expensive part and is built once; the
    exposure report is one union (both pair directions) + one doc-keyed
    aggregate over |pairs| rows."""
    pairs = substring_dup_pairs(
        df,
        text_col=text_col,
        id_col=id_col,
        k=k,
        w=w,
        min_shared=min_shared,
        max_df=max_df,
        hash_fn=hash_fn,
    ).localCheckpoint(eager=False)  # feeds both direction branches
    both = pairs.select(
        F.col("doc_a").alias("doc_id"), F.col("shared_fps")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("doc_id"), F.col("shared_fps"))
    )
    return (
        both.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_partners"),
            F.sum("shared_fps").cast("long").alias("shared_fps_total"),
        )
        .orderBy("doc_id")
    )


def union_pair_edges(*pair_tables: DataFrame) -> DataFrame:
    """Union several near-dup pair tables into ONE (id_a, id_b) edge set
    for :func:`duplicate_clusters` / ``curation.cluster_safe_split`` —
    the detectors are complementary (Jaccard misses quote-inclusion
    pairs containment catches; containment misses interleaved rewrites
    Jaccard catches), so the cluster graph should see the union of
    their edges (VERDICT r8 item #6; Lee et al. 2022 §5 semantics —
    a leaked pair is a leaked pair whichever detector found it).

    Each input needs ``id_a``/``id_b`` columns (extra columns such as
    ``jaccard``/``containment`` are dropped); endpoints are normalized
    to id_a < id_b and the union deduplicated, so a pair found by two
    detectors contributes one edge."""
    if not pair_tables:
        raise ValueError("union_pair_edges needs at least one pair table")
    norm = [
        p.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        for p in pair_tables
    ]
    out = norm[0]
    for p in norm[1:]:
        out = out.unionByName(p)
    return out.distinct()


def duplicate_clusters(
    pairs: DataFrame,
    max_iter: int = 20,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Connected components of a near-duplicate pair graph.

    Input: (id_a, id_b) candidate/verified pairs (any extra columns are
    ignored).  Output: (doc_id, cluster_id) for every doc appearing in at
    least one pair, where cluster_id = min(doc_id) of its component —
    i.e. the canonical representative every member should dedup to.

    Algorithm: below ``small_graph_threshold`` edges, a driver-side
    union-find (the edge list of a near-dup graph is tiny next to its
    corpus; a bounded collect beats distributed-round overhead).  Above
    it, hash-to-min label propagation with pointer-jumping shortcuts
    (the MapReduce CC family of Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14).  Each round:

    1. every node takes min(own label, neighbours' labels) — one shuffle
       join (edges ⋈ labels) + one map-side-combined groupBy(min);
    2. labels follow their own pointer one extra hop
       (label := label(label)), halving path lengths, so convergence is
       O(log diameter) rounds, not O(diameter).

    Near-duplicate components are near-cliques (diameter ≤ 3 in
    practice), so 2–3 rounds converge even at corpus scale.  Per-round
    shuffle volume is O(|edges|) fixed-width rows — independent of
    document size, and |edges| ≪ |docs| after LSH banding.  Lineage is
    truncated every round with localCheckpoint (iterative plans otherwise
    grow exponentially in Catalyst); on a real cluster prefer
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` so the cut
    survives executor loss.

    Reference parity: the reference engine (a KV event store) has no graph
    dedup; this is a north-star LLM-curation operator (SURVEY §2 note on
    dedup as a first-class extension).
    """
    edges = pairs.select(
        F.col("id_a").cast("long").alias("src"), F.col("id_b").cast("long").alias("dst")
    )
    # checkpoint BEFORE the symmetrize union: its two branches are two
    # references to the pair table, and an un-checkpointed expensive pair
    # pipeline (exact-jaccard, containment) executes once PER BRANCH
    # inside the eager job below (the derived-table self-join hazard,
    # union edition — measured 15.4 -> ~8.5s on effective_tokens at
    # sf0.1).  |pairs| rows of two longs — the materialization is free.
    edges = edges.localCheckpoint(eager=False)
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Hybrid (the GraphFrames/GraphX practice): a near-dup pair graph is
    # tiny next to its corpus (|edges| ≪ |docs| after LSH) — below the
    # threshold the edge list fits trivially on the driver and a
    # union-find beats 3-4 distributed rounds of fixed job overhead.
    # The distributed loop below is the ≥threshold path (and is covered
    # by tests passing small_graph_threshold=0).
    if edges.count() <= small_graph_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edges.collect():  # bounded by small_graph_threshold
            a, b = r["src"], r["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp_min: dict[int, int] = {}
        for v in parent:
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        rows = [(v, comp_min[find(v)]) for v in sorted(parent)]
        return pairs.sparkSession.createDataFrame(
            rows, "doc_id long, cluster_id long"
        )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("id"), "label")
            .union(labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: label := label(label)
        ptr = neigh.select(
            F.col("id").alias("p_id"), F.col("label").alias("p_label")
        )
        jumped = (
            neigh.join(ptr, neigh["label"] == ptr["p_id"], "left")
            .select("id", F.coalesce("p_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def dedup_keep_canonical(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    broadcast_limit: int | None = BROADCAST_ROW_LIMIT,
) -> DataFrame:
    """The deduplicated corpus: drop every clustered doc except its
    canonical representative (cluster_id == doc_id); singletons (docs in
    no pair) pass through untouched.

    The anti-join side is size-gated: a bounded count probe (cheap —
    ``duplicate_clusters`` output is checkpointed or driver-built)
    broadcast-hints the losers only when ≤ ``broadcast_limit`` rows.
    Web-scale corpora run 20-50% duplicates, so at 100 TB the losers can
    be billions of ids — above the limit this degrades to a shuffle
    anti-join on the id instead of OOMing the executors."""
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return df.join(
        maybe_broadcast(losers, broadcast_limit),
        df[id_col] == losers["doc_id"],
        "left_anti",
    )


# ------------------------------------------------- substring (winnowing)

def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Distinct winnowing fingerprints per document — (doc_id, fp).

    Winnowing (Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms
    for Document Fingerprinting", SIGMOD'03, the MOSS algorithm): hash
    every k-char gram of the lowercased text, then keep the MINIMUM hash
    of each window of ``w`` consecutive grams.  Detection guarantee (not
    probabilistic): two documents sharing an exact substring of at least
    ``k + w - 1`` characters select at least one identical fingerprint,
    because the shared region contains a full window of identical gram
    hashes whose minimum is position-independent.  Expected density is
    ~2/(w+1) fingerprints per character — the scale lever exact-substring
    dedup needs (Lee et al., "Deduplicating Training Data Makes Language
    Models Better", ACL'22, builds suffix arrays for this; winnowing gets
    the same ≥L-match detection with a per-partition streaming pass).

    Plan shape: ONE map-only in-row pass, no exchange — gram hashing,
    per-window minima (``transform`` over window starts + ``array_min``
    over w-slices of the gram array) and the per-doc fingerprint-set
    ``array_distinct`` all evaluate inside the row before the explode
    (the r11 rewrite; see the inline comment for the measured numbers).

    ``hash_fn``: ``"xxhash64"`` (default — JVM intrinsic over the k-char
    gram, one long per gram; ~2× the whole operator's speed vs md5, which
    digests AND hex-encodes 32 chars per text position) or ``"md5"``
    (byte-identical in DuckDB, used by the declared query so the oracle
    can mirror the fingerprints).  NOTE the two paths do NOT select the
    same fingerprint POSITIONS — which gram wins a window-min depends on
    the hash values — so borderline pair sets (few shared fps) can differ
    between hash functions.  What IS hash-agnostic is the detection
    guarantee: any pair sharing an exact substring of ≥ k+w-1 chars shares
    ≥1 fingerprint under EITHER hash (asserted per-path by
    test_winnowing_hash_paths_honor_guarantee and the driver-checked
    ``dedup_substring_fast_recall`` query).
    """
    txt = _lc(text_col)
    n_grams = F.greatest(F.length(txt) - F.lit(k - 1), F.lit(1))
    if hash_fn == "xxhash64":
        gram_hash = lambda i: F.xxhash64(txt.substr(i, F.lit(k)))  # noqa: E731
    elif hash_fn == "md5":
        gram_hash = lambda i: F.md5(txt.substr(i, F.lit(k)))  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    grams = F.transform(F.sequence(F.lit(1), n_grams), gram_hash)
    # Window minima IN-ROW: window i (0-based) spans grams [i, i+w-1]
    # (slice clamps at the array end, so the single window of a short
    # doc spans every gram — the same clamping the old explode shape
    # applied via win_lo/win_hi), and array_distinct gives the per-doc
    # fingerprint set before anything leaves the row.  The previous
    # formulation exploded every gram into its w window memberships and
    # shuffled them through a (doc, win) groupBy(min) — w× row
    # expansion + a hash aggregate for minima that are computable from
    # the gram array directly.  Measured 1.7 -> 0.83 s (xxhash64) /
    # 2.2 -> 0.79 s (md5) at sf0.1, identical fingerprint sets on both
    # hash paths; the whole operator is now ONE map-only pass, no
    # exchange at any scale.  Per-row memory is O(doc length) for the
    # gram array — the same order the shingle/winnow array expressions
    # elsewhere already hold in-row.
    base = _spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"greatest(length(lower({text_col})) - {k - 1}, 1)").alias("ng"),
        grams.alias("__gr"),
    )
    return base.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(F.col("ng") - F.lit(w), F.lit(0)),
                    ),
                    lambda i: F.array_min(F.slice(F.col("__gr"), i + 1, w)),
                )
            )
        ).alias("fp"),
    )


def substring_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
    min_shared: int = 2,
    max_df: int | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Document pairs sharing long exact substrings, by winnowing
    fingerprint agreement: (doc_a, doc_b, shared_fps) with doc_a < doc_b
    and ≥ ``min_shared`` distinct shared fingerprints.

    ``max_df`` drops fingerprints present in more than that many documents
    before the join — the document-frequency cut that removes boilerplate
    strings (license headers, navigation chrome) which would otherwise be
    quadratic hot keys, exactly the skew control ngram_jaccard_pairs gets
    from prefix filtering.  At 100 TB the join is then keyed on rare
    fingerprints only; everything upstream is map-side.

    ``hash_fn`` is forwarded to :func:`winnow_fingerprints` —
    ``"xxhash64"`` for production, ``"md5"`` for the oracle-checkable
    declared query.
    """
    fp = winnow_fingerprints(df, text_col, id_col, k=k, w=w, hash_fn=hash_fn)
    # Group-and-enumerate instead of a fp⋈fp self-join: a self-join would
    # instantiate the whole fingerprint pipeline twice (the ngram_jaccard
    # lesson — Catalyst plans each branch independently), and grouping
    # also gives the df-cut for free: fingerprints in > max_df documents
    # (boilerplate strings — quadratic hot keys) are dropped before any
    # pair is emitted.
    grouped = fp.groupBy("fp").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ds")
    )
    sized = grouped.filter(F.size("ds") > 1)
    if max_df is not None:
        sized = sized.filter(F.size("ds") <= max_df)
    pairs = sized.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ds",
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + 2, F.size("ds")),
                        lambda y: F.struct(
                            x.alias("doc_a"), y.alias("doc_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b")
        )
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int = 64,
    ngram: int = 1,
) -> DataFrame:
    """Lexical near-dup pairs by TF-IDF cosine over an inverted index:
    (doc_a, doc_b, n_shared, cosine) with doc_a < doc_b and cosine ≥
    ``threshold``, computed on the df-pruned vocabulary.

    ``ngram=1`` weights whole words by tf·idf; ``ngram≥2`` switches the
    term unit to word n-gram shingles (per-doc distinct, so tf is
    binary — idf-weighted shingle cosine), the right unit when the word
    vocabulary is small relative to the corpus.

    The missing strategy between n-gram Jaccard (set overlap — ignores
    term weighting) and embedding cosine (needs a model): classic sparse
    cosine catches template/boilerplate rewrites where rare-term WEIGHT
    agreement matters more than shingle identity.

    Scale shape (the jaccard/minhash playbook):

    * one corpus-sized (doc, term) count — map-side combined;
    * document frequencies via a vocab-sized groupBy, joined back (AQE
      splits the hot-term skew; same shape the prefix filter uses);
    * the ``df ≤ max_df`` cut drops high-df terms BEFORE any pair work —
      they carry near-zero idf anyway, and per-term candidate fan-out is
      then bounded by ``max_df²`` by construction (no quadratic hot key);
    * weights are unit-normalized per doc (w/‖w‖) so the pair dot product
      IS the cosine — no norms join on the pair table;
    * pairs come from group-and-enumerate per term (in-row pair explode —
      never a self-join of the derived postings pipeline).

    Determinism (oracle-replayable): tf and df are exact longs; the
    per-doc norm folds w² over terms in ascending term order, and the
    pair dot folds shared-term products in ascending term order
    (array_sort + aggregate — DuckDB replays both with
    ``list_sum(list(x ORDER BY k))``).  The threshold compares the
    UNROUNDED fold on both engines; rounding happens once on output.
    """
    unit = tokens(_lc(text_col)) if ngram <= 1 else word_ngrams(_lc(text_col), ngram)
    tok = _spread(df).select(
        F.col(id_col).alias("doc_id"), F.explode(unit).alias("term")
    )
    if ngram <= 1:
        tf = tok.groupBy("doc_id", "term").agg(
            F.count("*").cast("long").alias("tf")
        )
    else:
        # word_ngrams is array_distinct per doc, so (doc, term) rows are
        # already unique and tf ≡ 1 — the groupBy would be an identity
        # aggregate costing a full shuffle of the shingle table.  The
        # downstream weight 1·log(n/df) is IEEE-identical to log(n/df).
        tf = tok.select("doc_id", "term", F.lit(1).cast("long").alias("tf"))
    # tf has TWO consumers (the df aggregate and the tfd join probe).
    # r12 measured-and-rejected a localCheckpoint here: interleaved A/B
    # at sf0.1 (ngram=3 shape) showed no win in the minima (3.49 vs
    # 3.59 s) and a worse median under load — same verdict as the
    # jaccard/editdist probes (materialization ≥ the saved re-derivation;
    # AQE exchange reuse covers the fast case).
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    ndocs = df.agg(F.count("*").cast("long").alias("n_docs"))
    tfd = (
        tf.join(dfreq.where(F.col("df") <= max_df), "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("wgt"),
        )
    )
    # per-doc vector: sorted (term, wgt) array is both the norm-fold input
    # and the postings source — the aggregate is the materialization
    # barrier that keeps the expensive pipeline single-planned
    vec = (
        tfd.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("term", "wgt"))).alias("tv"))
        .withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    "tv",
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x.getField("wgt") * x.getField("wgt"),
                )
            ),
        )
        .where(F.col("nrm") > 0)
    )
    post = vec.select(
        "doc_id", "nrm", F.explode("tv").alias("t")
    ).select(
        F.col("t.term").alias("term"),
        "doc_id",
        (F.col("t.wgt") / F.col("nrm")).alias("uw"),
    )
    cand = (
        post.groupBy("term")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "uw"))).alias("ps"))
        .where(F.size("ps") >= 2)
    )
    # in-row pair enumeration (two-param HOF lambda is (element, index))
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) ->"
        " transform(slice(ps, i + 2, size(ps)),"
        " y -> struct(x.doc_id AS a, y.doc_id AS b,"
        "             x.uw * y.uw AS prod))))"
    )
    pairs = cand.select("term", F.explode(pair_expr).alias("p")).select(
        "term", "p.a", "p.b", "p.prod"
    )
    dot = (
        pairs.groupBy("a", "b")
        .agg(
            F.array_sort(F.collect_list(F.struct("term", "prod"))).alias("tp")
        )
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            F.size("tp").cast("long").alias("n_shared"),
            F.aggregate(
                "tp",
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x.getField("prod"),
            ).alias("c_raw"),
        )
    )
    return (
        dot.where(F.col("c_raw") >= threshold)
        .select("doc_a", "doc_b", "n_shared", F.round("c_raw", 4).alias("cosine"))
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------------------------- edit distance

def editdist_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int = 64,
    prefix_chars: int = 512,
    rarest_k: int = 8,
) -> DataFrame:
    """Near-dup pairs by normalized edit similarity: 1 − lev(a,b)/max(|a|,|b|)
    ≥ ``threshold`` over the first ``prefix_chars`` characters of the
    lowercased texts — the character-level verifier that catches small
    in-place edits (typo fixes, template slot changes) which set-based
    Jaccard scores leniently and winnowing scores harshly.

    Shape (the reason this scales where a naive all-pairs Levenshtein is
    hopeless — the DP is O(|a|·|b|) PER PAIR):

    1. candidates: group-and-enumerate docs sharing one of their
       ``rarest_k`` RAREST word shingles with df ≤ ``max_df`` — the
       per-record prefix idea of the AllPairs/PPJoin family (Bayardo
       WWW'07, as in :func:`ngram_jaccard_pairs`) applied to blocking.
       Each doc joins at most ``rarest_k`` blocks of size ≤ ``max_df``,
       so candidates are ≤ rarest_k·max_df·N/2 — LINEAR in corpus size.
       Share-any-rare-shingle blocking (the r5 shape) measured
       candidates ≈ 0.045·N² on the small-vocabulary documents fixture
       (1.13M pairs at 5000 docs): every shingle's df grows with N, so
       block sizes — and pair counts — grow quadratically until the df
       cut silently zeroes recall.  Rarest-k keeps the rare-shingle
       recall contract (near-identical prefixes have near-identical
       rarest-shingle lists, so top-k sets intersect for edit distances
       small relative to k·n words) while pinning the candidate bound
       to the corpus size; the oracle mirrors the cut.
    2. cheap length prefilter: lev ≥ |len(a) − len(b)|, so any qualifying
       pair satisfies (L − l) · t_den ≤ (t_den − t_num) · L with
       L = max, l = min of the capped lengths — exact integer arithmetic,
       no float ceil.
    3. exact verify: Spark's bounded ``levenshtein(..., threshold=B)``
       with the static bound B = ⌊(1−t) · prefix_chars⌋ (distance can
       never exceed that for a qualifying pair since both strings are
       ≤ prefix_chars); the early-exit bound turns the worst-case DP into
       a banded one.  −1 (bound exceeded) rows are dropped.

    The prefix cap bounds per-pair cost at 100 TB (a 100 KB document pair
    would otherwise cost 10^10 DP cells); it makes the measure "prefix
    edit similarity", which the oracle mirrors with the same substr.

    Output: (id_a, id_b, editsim) with id_a < id_b, editsim rounded 4dp.
    """
    t_num, t_den = int(round(threshold * 1_000_000)), 1_000_000
    # r12 measured-and-rejected a localCheckpoint here (two consumers:
    # df aggregate + join probe): old med 5.36 s with fast 2.65/3.12 s
    # runs when AQE exchange reuse fired vs new tight-at-5.5 s — the
    # materialization sets a FLOOR at the slow level and removes the
    # reuse upside (interleaved A/B, runs=6, sf0.1)
    sh = shingle_table(df, text_col, id_col, n)
    # df-filter BEFORE the join back so hot shingles never fan out
    dfreq = (
        sh.groupBy("shingle")
        .agg(F.count("*").cast("long").alias("__df"))
        .filter(F.col("__df") <= max_df)
    )
    # per doc: the rarest_k (df asc, shingle asc — total order) shingles
    # via ONE row_number window (same set as the old collect_list +
    # array_sort + slice + explode, without per-doc array churn — the
    # ngram_jaccard_pairs rewrite)
    wrk = Window.partitionBy("doc_id").orderBy("__df", "shingle")
    keyed = (
        sh.join(dfreq, "shingle")
        .select("doc_id", "shingle", F.row_number().over(wrk).alias("__rk"))
        .filter(F.col("__rk") <= rarest_k)
        .select("shingle", "doc_id")
    )
    cand = pairs_from_sorted_groups(
        keyed.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    texts = _spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.substring(_lc(text_col), 1, prefix_chars).alias("__t"),
    )
    ta = texts.select(F.col("doc_id").alias("id_a"), F.col("__t").alias("__ta"))
    tb = texts.select(F.col("doc_id").alias("id_b"), F.col("__t").alias("__tb"))
    la, lb = F.length("__ta"), F.length("__tb")
    big, small = F.greatest(la, lb), F.least(la, lb)
    bound = int((t_den - t_num) * prefix_chars // t_den)
    lev = F.levenshtein("__ta", "__tb", bound)
    sim = F.lit(1.0) - lev.cast("double") / big.cast("double")
    return (
        ta.join(maybe_broadcast(cand), "id_a")
        .join(tb, "id_b")
        # length prefilter: (L - l) / L > (1 - t) already fails on the
        # |len| lower bound of lev — integer form, no float comparison
        # BIGINT products (the plen bug class): length() is INT32 and a
        # large prefix_chars times t_den could overflow
        .filter(
            (big - small).cast("long") * t_den
            <= F.lit(t_den - t_num) * big.cast("long")
        )
        .select("id_a", "id_b", lev.alias("__lev"), sim.alias("__sim"))
        .filter((F.col("__lev") >= 0) & (F.col("__sim") >= F.lit(threshold)))
        .select("id_a", "id_b", F.round("__sim", 4).alias("editsim"))
        .orderBy("id_a", "id_b")
    )


def jaccard_threshold_sweep(
    df: DataFrame,
    thresholds: tuple[float, ...] = (0.5, 0.6, 0.7, 0.8, 0.9),
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Dedup tuning curve: pair counts and corpus impact at several
    Jaccard thresholds from ONE candidate computation —
    ``(threshold, n_pairs, n_docs, dup_rate)`` per threshold, where
    ``n_docs`` is how many distinct documents sit in at least one
    qualifying pair and ``dup_rate`` = n_docs / corpus size.  This is
    the plot a dedup engineer reads before picking a production
    threshold: where the pair count explodes is where near-dup turns
    into topical-similarity.

    The expensive pipeline (PPJoin-filtered pair generation +
    verification at the LOWEST threshold) runs ONCE and is
    localCheckpoint'ed; each threshold then filters the tiny verified
    pair table — the UNROUNDED exact-ratio jaccard compares against the
    threshold literal exactly as :func:`ngram_jaccard_pairs` does, so
    the sweep at t equals an independent run at t.  Thresholds with no
    qualifying pairs still emit (t, 0, 0, 0.0) rows.

    Scale: inherits the PPJoin bounds; the sweep adds one
    thresholds × pairs pass over a table that near-dup semantics keeps
    small.
    """
    ths = sorted({float(t) for t in thresholds})
    if not ths:
        raise ValueError("thresholds must be non-empty")
    pairs = ngram_jaccard_pairs(
        df, n=n, threshold=ths[0], text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=False)
    spark = df.sparkSession
    tdf = spark.createDataFrame(
        [(t,) for t in ths], "threshold double"
    )
    q = pairs.crossJoin(F.broadcast(tdf)).filter(
        F.col("jaccard") >= F.col("threshold")
    )
    stats = q.groupBy("threshold").agg(
        F.count("*").cast("long").alias("n_pairs")
    )
    docs_t = (
        q.select(
            "threshold",
            F.explode(F.array("id_a", "id_b")).alias("d"),
        )
        .groupBy("threshold")
        .agg(F.countDistinct("d").cast("long").alias("n_docs"))
    )
    total = df.filter(F.col(id_col).isNotNull()).agg(
        F.countDistinct(id_col).cast("long").alias("n_total")
    )
    return (
        tdf.join(F.broadcast(stats), "threshold", "left")
        .join(F.broadcast(docs_t), "threshold", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.round(
                F.coalesce("n_docs", F.lit(0)).cast("double")
                / F.col("n_total").cast("double"),
                round_digits,
            ).alias("dup_rate"),
        )
        .orderBy("threshold")
    )


def containment_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """The PPJoin-prefix candidate stage of :func:`containment_pairs`,
    exposed so the df×prefix fan-out can be MEASURED directly
    (tools/probe_containment_growth.py — the r6 editdist blocking-probe
    discipline): distinct ``(id_a, id_b)`` candidate pairs BEFORE the
    exact verify.  One source of truth — containment_pairs composes
    this; see its docstring for the recall argument and the honest
    scale note."""
    # sh itself stays un-checkpointed (the jaccard/editdist r12 probes:
    # materializing shingle strings ≥ the saved map-only re-derivation);
    # the RANKED table below is the one with two consumers whose
    # re-derivation would repeat the dfreq join + window — it is
    # checkpointed (interleaved A/B: 6.63 s median with an sh checkpoint
    # added vs 6.44 s without it, identical output).
    sh = shingle_table(df, text_col, id_col, n)
    t_num, t_den = int(round(threshold * 1_000_000)), 1_000_000
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    # per-doc (df asc, shingle asc) rank via ONE window — the same prefix
    # set as the old collect_list + array_sort + slice + posexplode shape
    # without materializing per-doc arrays (the ngram_jaccard_pairs
    # rewrite); the df column riding along turns the max_df cut into a
    # plain filter instead of a second dfreq join
    wrk = Window.partitionBy("doc_id").orderBy("df", "shingle")
    wct = Window.partitionBy("doc_id")
    ranked = (
        sh.join(dfreq, "shingle")
        .select(
            "doc_id",
            "shingle",
            "df",
            (F.row_number().over(wrk) - 1).alias("rk"),
            F.count("*").over(wct).alias("nsh"),
        )
        .localCheckpoint()
    )
    # BIGINT ceil multiply — see ngram_jaccard_pairs: INT32 n * t_num
    # overflows past ~3.6k distinct shingles.  0-based rank: rk ≤ plen-1.
    plen = F.expr(
        f"cast(nsh - ((cast(nsh as bigint) * {t_num}"
        f" + {t_den - 1}) div {t_den}) + 1 as int)"
    )
    prefix = ranked.filter(F.col("rk") < plen)
    if max_df is not None:
        prefix = prefix.filter(F.col("df") <= max_df)
    prefix = prefix.select(
        F.col("doc_id").alias("p_doc"),
        "shingle",
        F.col("rk").alias("p_rk"),
        F.col("nsh").alias("p_nsh"),
    )
    psh = prefix.groupBy("shingle").agg(
        F.collect_list(F.struct("p_doc", "p_rk", "p_nsh")).alias("ps")
    )
    # PPJoin POSITIONAL filter (VERDICT r11 item #1): a shared shingle at
    # 0-based ranks (i, j) in the two docs' (df asc, shingle asc) orders
    # bounds the intersection by min(|P|-i, |F|-j) — every common shingle
    # ranks at-or-after the pair's globally-smallest common shingle in
    # BOTH docs.  A qualifying pair (inter ≥ ⌈t·min⌉) always survives via
    # that smallest common shingle's row: min(|P|-i*, |F|-j*) ≥ inter ≥
    # ⌈t·min⌉, and i* is inside the smaller side's prefix (the recall
    # argument in containment_pairs) — so recall stays exactly 1 while
    # candidates whose suffixes provably can't reach the overlap never
    # pay the full-array intersect in the verify stage.  Integer compare:
    # x ≥ ⌈a·t_num/t_den⌉  ⟺  x·t_den ≥ a·t_num, in BIGINT (the plen
    # overflow class).
    p = F.col("p")
    keep = (
        F.least(
            p["p_nsh"].cast("long") - p["p_rk"],
            F.col("nsh").cast("long") - F.col("rk"),
        )
        * t_den
        >= F.least(p["p_nsh"].cast("long"), F.col("nsh").cast("long")) * t_num
    )
    return (
        ranked.join(psh, "shingle")
        .select(
            F.col("doc_id").alias("f_doc"),
            "rk",
            "nsh",
            F.explode("ps").alias("p"),
        )
        .filter((p["p_doc"] != F.col("f_doc")) & keep)
        .select(
            F.least(p["p_doc"], F.col("f_doc")).alias("id_a"),
            F.greatest(p["p_doc"], F.col("f_doc")).alias("id_b"),
        )
        .distinct()
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram MAX-CONTAINMENT pairs: C_max(A, B) =
    |A∩B| / min(|A|, |B|) ≥ threshold, with id_a < id_b — the
    asymmetric near-dup detector Jaccard misses when sizes differ: a
    short document quoted whole inside a long one has tiny
    inter/union but containment 1 (Broder's "containment" from the
    original resemblance paper, SEQUENCES'97).  Output
    ``(id_a, id_b, inter, containment, contained_id)`` —
    ``contained_id`` is the smaller-shingle-set endpoint (equal sizes
    tie to id_b), the side a drop policy should remove: these pairs are
    size-asymmetric, and dropping by id order could delete the superset
    document's unique content.

    Candidate generation with EXACT recall, no self-join: if
    C_max ≥ t then the smaller side A shares ≥ ⌈t·|A|⌉ shingles, so
    its ``|A| − ⌈t·|A|⌉ + 1`` globally-RAREST shingles cannot all
    avoid the intersection (the PPJoin prefix bound applied to the
    overlap ⌈t·|A|⌉) — but the CONTAINING side can be arbitrarily
    large, so the partner emits its full shingle set: candidates =
    prefix(doc) × full(doc') grouped per shingle.  The threshold
    compare in the verify is exact integer arithmetic
    (inter·t_den ≥ min·t_num), never a float ceil.

    r12: the PPJoin POSITIONAL filter now runs at candidate time — both
    sides carry their 0-based (df asc, shingle asc) rank, and a
    candidate row survives only if min(|P|−i, |F|−j) ≥ ⌈t·min(|P|,|F|)⌉
    (the suffix bound on the intersection).  Recall stays exactly 1:
    the pair's globally-smallest common shingle always passes (see
    containment_candidates), but pairs whose suffixes provably cannot
    reach the overlap no longer pay the full-array intersect in the
    verify stage.

    Scale, honestly: the per-shingle fan-out is df(shingle) ×
    |prefix-docs(shingle)| — "rare" is relative to each DOC, so a
    boilerplate-only document puts globally-common shingles in its
    prefix and each such shingle emits df (corpus-scale) candidate rows
    on one shuffle key.  On corpora where that bites, pass ``max_df``
    to drop shingles with global df > max_df from CANDIDATE GENERATION
    — then a pair sharing ONLY boilerplate shingles is missed (the
    :func:`substring_dup_pairs` ``max_df`` recall trade, documented
    there); verification stays exact either way.  The df-cut HEURISTIC
    sibling of this operator is :func:`overlap_coefficient_pairs`
    (same statistic, blocking on all shingles with df ≤ max_df);
    this one is the exact-recall path.

    Measured (r10, tools/probe_containment_growth.py): on the synthetic
    fixtures candidates grow ~N^2.47 — but that corpus has a CLOSED
    shingle vocabulary (27k distinct 3-grams at 5000 docs, max df 25,
    median 9), so every shingle's df grows ∝N and max_df has nothing to
    cut; most of the growth tracks the answer itself (verified pairs
    also grow ~N², candidates-per-pair drifts only ~N^0.57).  On an
    open-vocabulary corpus (Heaps' law) median df stays O(1) and the
    df tail — which max_df cuts — governs.
    """
    cand = containment_candidates(df, text_col, id_col, n, threshold, max_df)
    t_num, t_den = int(round(threshold * 1_000_000)), 1_000_000
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("long")
    mins = F.least(F.size("__sa"), F.size("__sb")).cast("long")
    # the CONTAINED (smaller-shingle-set) side: containment pairs are
    # size-asymmetric, so a drop policy must know which endpoint is the
    # subset — dropping by id order could delete the superset document's
    # unique content (equal sizes tie to id_b, the jaccard convention)
    contained = F.when(
        F.size("__sa") < F.size("__sb"), F.col("id_a")
    ).otherwise(F.col("id_b"))
    return (
        _verified_pair_ids(df, cand, text_col, id_col, n)
        .select(
            "id_a",
            "id_b",
            inter.alias("inter"),
            mins.alias("__min"),
            contained.alias("contained_id"),
        )
        .filter(
            (F.col("__min") > 0)
            & (F.col("inter") * t_den >= F.col("__min") * t_num)
        )
        .select(
            "id_a",
            "id_b",
            "inter",
            F.round(
                F.col("inter").cast("double") / F.col("__min").cast("double"),
                4,
            ).alias("containment"),
            "contained_id",
        )
        .orderBy("id_a", "id_b")
    )


def detector_agreement(pair_tables: dict[str, DataFrame]) -> DataFrame:
    """Pairwise AGREEMENT matrix between near-dup detectors: for every
    detector pair, the Jaccard of their normalized ``(id_a, id_b)``
    pair SETS — the audit that tells a curation owner whether two
    detectors are redundant (agreement ≈ 1, drop the expensive one) or
    complementary (agreement ≈ 0, union their edges — the
    :func:`union_pair_edges` rationale made measurable).

    Input: {detector_name: pair table with id_a/id_b columns} (extra
    columns ignored).  Output one row per unordered detector pair
    (lexicographic det_a < det_b over ALL input names, so empty
    detectors still appear): ``(det_a, det_b, n_a, n_b, n_both,
    agreement)``; agreement = n_both / (n_a + n_b − n_both), NULL when
    both sets are empty.  All counts exact integers; one double
    division rounded 4dp.

    Scale: pair endpoints are normalized and tagged in ONE union, the
    union is checkpointed (it feeds both the per-detector counts and
    the per-pair grouping — the derived-table hazard), and detector
    co-occurrence is enumerated IN-ROW per pair via
    pairs_from_sorted_groups over the ≤|detectors| tag array — never a
    pair-table self-join."""
    if len(pair_tables) < 2:
        raise ValueError("detector_agreement needs at least two detectors")
    names = sorted(pair_tables)
    tagged = None
    for name, p in sorted(pair_tables.items()):
        t = p.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.lit(name).alias("det"),
        ).distinct()
        tagged = t if tagged is None else tagged.unionByName(t)
    tagged = tagged.localCheckpoint(eager=False)
    per = tagged.groupBy("det").agg(F.count("*").cast("long").alias("n"))
    ds = tagged.groupBy("id_a", "id_b").agg(
        F.array_sort(F.collect_set("det")).alias("ds")
    )
    both = (
        pairs_from_sorted_groups(ds, "ds", distinct=False)
        .groupBy(F.col("id_a").alias("det_a"), F.col("id_b").alias("det_b"))
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    spark = tagged.sparkSession
    spine = spark.createDataFrame(
        [(a, b) for i, a in enumerate(names) for b in names[i + 1:]],
        "det_a string, det_b string",
    )
    na = per.select(F.col("det").alias("det_a"), F.col("n").alias("n_a"))
    nb = per.select(F.col("det").alias("det_b"), F.col("n").alias("n_b"))
    denom = F.col("n_a") + F.col("n_b") - F.col("n_both")
    return (
        spine.join(maybe_broadcast(na), "det_a", "left")
        .join(maybe_broadcast(nb), "det_b", "left")
        .join(maybe_broadcast(both), ["det_a", "det_b"], "left")
        .select(
            "det_a",
            "det_b",
            F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
            F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
            F.coalesce("n_both", F.lit(0)).cast("long").alias("n_both"),
        )
        .select(
            "det_a",
            "det_b",
            "n_a",
            "n_b",
            "n_both",
            F.when(
                denom > 0,
                F.round(
                    F.col("n_both").cast("double") / denom.cast("double"), 4
                ),
            ).alias("agreement"),
        )
        .orderBy("det_a", "det_b")
    )
