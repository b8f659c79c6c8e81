"""Corpus-curation operators (functions/curation.py): quality rules,
contamination, stratified sampling, mixing plan, sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from streamkit_spark import tables
from streamkit_spark.functions import curation as C
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load(spark, SF_DIR, "documents")


# ---------------------------------------------------------------------------
# quality rules
# ---------------------------------------------------------------------------

def test_quality_rules_metrics_match_python(spark, docs):
    rows = C.quality_rules(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert len(rows) == len(texts)
    for r in rows[:50]:
        toks = texts[r["doc_id"]].strip().split()
        assert r["n_words"] == len(toks)
        assert r["mean_word_len"] == pytest.approx(
            sum(map(len, toks)) / len(toks), abs=1e-4
        )
        assert r["frac_unique_words"] == pytest.approx(
            len(set(toks)) / len(toks), abs=1e-4
        )
        bigrams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        top = max((bigrams.count(b) for b in set(bigrams)), default=0)
        assert r["top_bigram_frac"] == pytest.approx(
            2 * top / len(toks) if toks else 0.0, abs=1e-4
        )


def test_quality_rules_passes_is_rule_conjunction(spark, docs):
    out = C.quality_rules(docs)
    bad = out.filter(
        F.col("passes")
        != (
            (F.col("n_words") >= 30)
            & (F.col("n_words") <= 100_000)
            & (F.col("mean_word_len") >= 2.0)
            & (F.col("mean_word_len") <= 12.0)
            & (F.col("frac_unique_words") >= 0.30)
            & (F.col("stopword_hits") >= 1)
            & (F.col("top_bigram_frac") <= 0.10)
        )
    )
    assert bad.count() == 0


def test_quality_rules_custom_thresholds(spark, docs):
    none_pass = C.quality_rules(docs, rules={"min_words": 10**9})
    assert none_pass.filter("passes").count() == 0


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------

def test_contamination_finds_planted_overlap(spark, docs):
    # plant: re-keyed copies of 3 benchmark docs must be flagged with the
    # full shingle overlap of their source
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    copies = bench.limit(3).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    corpus = docs.unionByName(copies)
    out = C.contamination_report(corpus, bench, n=4)
    flagged = {r["doc_id"] for r in out.collect()}
    for r in copies.select("doc_id").collect():
        assert r["doc_id"] in flagged


def test_contamination_excludes_self_matches(spark, docs):
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = C.contamination_report(bench, bench, n=4)
    # a benchmark doc matching ONLY itself must not appear
    ids = {r["doc_id"] for r in out.collect()}
    solo = {
        r["doc_id"]
        for r in bench.select("doc_id").collect()
        if r["doc_id"] not in ids
    }
    # sanity: self-join of the benchmark with itself minus self-matches is
    # small (only genuinely shared shingles between distinct docs)
    assert len(solo) >= 1


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def test_stratified_sample_deterministic_and_nested(spark, docs):
    lo = C.stratified_sample(docs, {"en": 0.2}, default_rate=0.0)
    hi = C.stratified_sample(docs, {"en": 0.6}, default_rate=0.0)
    lo_ids = {r["doc_id"] for r in lo.select("doc_id").collect()}
    hi_ids = {r["doc_id"] for r in hi.select("doc_id").collect()}
    assert lo_ids <= hi_ids  # nested: raising the rate only adds rows
    again = {
        r["doc_id"]
        for r in C.stratified_sample(docs, {"en": 0.2}, default_rate=0.0)
        .select("doc_id")
        .collect()
    }
    assert again == lo_ids  # deterministic across runs


def test_stratified_sample_rate_is_approximate(spark, docs):
    n_en = docs.filter("lang = 'en'").count()
    got = C.stratified_sample(docs, {"en": 0.5}, default_rate=0.0).count()
    # md5 buckets are uniform; allow generous slack on a small fixture
    assert 0.25 * n_en <= got <= 0.75 * n_en


def test_stratified_sample_salt_changes_selection(spark, docs):
    a = {
        r["doc_id"]
        for r in C.stratified_sample(docs, {"en": 0.5}, salt="a")
        .select("doc_id")
        .collect()
    }
    b = {
        r["doc_id"]
        for r in C.stratified_sample(docs, {"en": 0.5}, salt="b")
        .select("doc_id")
        .collect()
    }
    assert a != b


# ---------------------------------------------------------------------------
# mixing plan
# ---------------------------------------------------------------------------

def test_mixing_plan_targets_and_rates(spark, docs):
    plan = C.mixing_plan(docs, {"src0": 3.0, "src1": 1.0}, 1000)
    rows = {r["source"]: r for r in plan.collect()}
    assert rows["src0"]["target_tokens"] == 750
    assert rows["src1"]["target_tokens"] == 250
    for r in rows.values():
        if r["source"] not in ("src0", "src1"):
            assert r["rate"] == 0.0 and r["target_tokens"] == 0
        else:
            expected = min(1.0, r["target_tokens"] / max(r["n_tokens"], 1))
            assert r["rate"] == pytest.approx(expected, abs=1e-4)


def test_mixing_plan_feeds_stratified_sample(spark, docs):
    plan = C.mixing_plan(docs, {"src0": 1.0}, 500)
    rates = {r["source"]: r["rate"] for r in plan.collect()}
    sampled = C.stratified_sample(docs, rates, stratum_col="source")
    assert 0 < sampled.count() < docs.count()


# ---------------------------------------------------------------------------
# prefix sum / packing
# ---------------------------------------------------------------------------

def test_prefix_sum_matches_naive_global_window(spark, docs):
    df = docs.select("doc_id", F.length("text").cast("long").alias("v"))
    fast = C.prefix_sum(df, "doc_id", "v", bucket_width=16)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = df.withColumn("offset", F.coalesce(F.sum("v").over(w), F.lit(0)))
    assert (
        fast.select("doc_id", "offset")
        .exceptAll(naive.select("doc_id", "offset"))
        .count()
        == 0
    )
    assert fast.count() == naive.count()


def test_prefix_sum_bucket_width_invariance(spark, docs):
    df = docs.select("doc_id", F.length("text").cast("long").alias("v"))
    a = C.prefix_sum(df, "doc_id", "v", bucket_width=7)
    b = C.prefix_sum(df, "doc_id", "v", bucket_width=5000)
    assert a.select("doc_id", "offset").exceptAll(b.select("doc_id", "offset")).count() == 0


def test_pack_sequences_invariants(spark, docs):
    out = C.pack_sequences(docs, budget=256, bucket_width=32).collect()
    # offsets are the exclusive prefix sum in doc_id order
    running = 0
    for r in sorted(out, key=lambda r: r["doc_id"]):
        assert r["offset"] == running
        assert r["pack_id"] == r["offset"] // 256
        assert r["pack_pos"] == r["offset"] % 256
        assert r["straddles"] == (r["pack_pos"] + r["n_tokens"] > 256)
        running += r["n_tokens"]


def test_prefix_sum_full_data_window_is_bucket_partitioned(spark, docs):
    """The per-row window must partition by the bucket key; the only
    unpartitioned window allowed is the one over the (tiny) bucket-totals
    table.  Guard: the physical plan's unpartitioned window sits above an
    aggregate, never above the raw scan."""
    df = docs.select("doc_id", F.length("text").cast("long").alias("v"))
    plan = (
        C.prefix_sum(df, "doc_id", "v", bucket_width=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(__bkt" in plan  # row-level window: bucketed


# ---------------------------------------------------------------------------
# unigram LM scoring / PII
# ---------------------------------------------------------------------------

def test_unigram_logprob_orders_ood_docs_low(spark, docs):
    from pyspark.sql import Row

    # a doc made of corpus-frequent tokens must outscore one of unseen tokens
    common = docs.limit(1).select("text").first()["text"]
    weird = "zxqv jkwpy qqqzz mmvvk " * 8
    extra = spark.createDataFrame(
        [Row(doc_id=900001, text=common), Row(doc_id=900002, text=weird)]
    )
    corpus = docs.select("doc_id", "text").unionByName(extra)
    out = {r["doc_id"]: r["logprob"] for r in C.unigram_logprob(corpus).collect()}
    assert out[900001] > out[900002]


def test_unigram_logprob_is_mean_of_token_logprobs(spark, docs):
    import math

    sample = docs.limit(30).select("doc_id", "text")
    rows = sample.collect()
    toks = {r["doc_id"]: r["text"].strip().split() for r in rows}
    from collections import Counter

    counts = Counter(t for ts in toks.values() for t in ts)
    N, V = sum(counts.values()), len(counts)
    out = {r["doc_id"]: r for r in C.unigram_logprob(sample).collect()}
    for did, ts in toks.items():
        want = sum(math.log((counts[t] + 1) / (N + V)) for t in ts) / len(ts)
        assert out[did]["logprob"] == pytest.approx(want, abs=1e-3)
        assert out[did]["n_tokens"] == len(ts)


def test_pii_detection_and_redaction(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail bob@x.io or call +1-555-123-4567"),
            Row(doc_id=2, text="server 192.168.0.1 docs https://ex.org/a b"),
            Row(doc_id=3, text="nothing sensitive here"),
        ]
    )
    out = {r["doc_id"]: r for r in C.pii_report(df).collect()}
    assert set(out) == {1, 2}  # doc 3 clean -> absent
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] >= 1
    assert out[2]["n_ipv4"] == 1 and out[2]["n_url"] == 1
    redacted = df.select("doc_id", C.redact_pii("text").alias("r")).collect()
    joined = " ".join(r["r"] for r in redacted)
    assert "bob@x.io" not in joined
    assert "192.168.0.1" not in joined
    assert "https://ex.org/a" not in joined
    assert "<PII>" in joined
    assert "nothing sensitive here" in joined  # clean text untouched


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------

def test_temperature_sample_flattens_and_is_deterministic(spark, docs):
    out = C.temperature_sample(docs, alpha=0.5, budget_docs=400)
    n = out.count()
    assert 320 <= n <= 480  # expected 400 ± binomial spread
    base = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # alpha < 1 boosts low-resource strata relative to the dominant one
    dominant = max(base, key=base.get)
    smallest = min(base, key=base.get)
    assert kept[smallest] / base[smallest] > kept[dominant] / base[dominant]
    # md5-bucket decisions: same call → identical sample, no rand()
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {
        r["doc_id"]
        for r in C.temperature_sample(docs, alpha=0.5, budget_docs=400).collect()
    }
    assert ids1 == ids2


def test_temperature_alpha_one_is_proportional(spark, docs):
    """alpha=1 collapses to uniform rate budget/N for every stratum."""
    total = docs.count()
    out = C.temperature_sample(docs, alpha=1.0, budget_docs=total)
    assert out.count() == total  # rate clamps to 1 everywhere


def test_decontaminate_removes_overlapping_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "unrelated words entirely here now folks"),
        (3, "the benchmark alpha beta gamma delta question"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    kept = {
        r["doc_id"]
        for r in C.decontaminate(docs, bench, n=4, max_shared=0).collect()
    }
    assert kept == {2}  # 1 and 3 share a 4-gram with the benchmark
    # tolerance: doc 3 shares exactly one distinct 4-gram
    kept1 = {
        r["doc_id"]
        for r in C.decontaminate(docs, bench, n=4, max_shared=1).collect()
    }
    assert 3 in kept1 and 1 not in kept1


def test_dsir_weights_prefer_target_like_docs(spark):
    """Importance weights rank documents resembling the target
    distribution above off-distribution ones (DSIR's selection property),
    and weights are deterministic."""
    style_a = "spark query engine shuffle partition broadcast join plan"
    style_b = "garden flower bloom petal sunshine meadow butterfly bee"
    rows = (
        [(i, f"{style_a} doc {i} " + style_a) for i in range(10)]
        + [(100 + i, f"{style_b} doc {i} " + style_b) for i in range(10)]
    )
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, style_a + f" target {i}") for i in range(5)],
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r["log_w"] for r in C.dsir_weights(corpus, target).collect()}
    a_mean = sum(w[i] for i in range(10)) / 10
    b_mean = sum(w[100 + i] for i in range(10)) / 10
    assert a_mean > b_mean
    w2 = {r["doc_id"]: r["log_w"] for r in C.dsir_weights(corpus, target).collect()}
    assert w == w2


def test_ngram_novelty_first_seen_by_doc_order(spark):
    from streamkit_spark.functions import curation as C

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),          # grams: abg, bgd — all first
            (2, "alpha beta gamma delta"),          # exact echo: novelty 0
            (3, "alpha beta gamma epsilon zeta"),   # abg old; bge, gez new
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in C.ngram_novelty(docs, n=3).collect()}
    assert got[1]["novelty"] == 1.0 and got[1]["n_grams"] == 2
    assert got[2]["novelty"] == 0.0 and got[2]["novel_grams"] == 0
    assert got[3]["n_grams"] == 3 and got[3]["novel_grams"] == 2
    assert got[3]["novelty"] == round(2 / 3, 4)


def test_perplexity_buckets_partition_and_order(spark):
    from streamkit_spark.functions import curation as C

    # 8 docs: common-word docs score high (head), rare-word docs low (tail)
    rows = [(i, "common words common words common") for i in range(1, 5)]
    rows += [(i, f"rare{i}a rare{i}b rare{i}c rare{i}d rare{i}e") for i in range(5, 9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in C.perplexity_buckets(docs).collect()}
    assert set(out) <= {"head", "middle", "tail"}
    assert sum(r["n_docs"] for r in out.values()) == 8
    if "head" in out and "tail" in out:
        assert out["head"]["avg_logprob"] > out["tail"]["avg_logprob"]


def test_cap_per_group_nested_and_bounded(spark):
    from streamkit_spark.functions.curation import cap_per_group

    from streamkit_spark import tables
    from tests.conftest import SF_DIR

    docs = tables.load(spark, SF_DIR, "documents")
    small = {r["doc_id"] for r in cap_per_group(docs, "source", k=5).collect()}
    big = {r["doc_id"] for r in cap_per_group(docs, "source", k=10).collect()}
    assert small <= big, "larger cap must keep a superset"
    per_group = (
        cap_per_group(docs, "source", k=5)
        .groupBy("source")
        .count()
        .collect()
    )
    assert all(r["count"] <= 5 for r in per_group)
    again = {r["doc_id"] for r in cap_per_group(docs, "source", k=5).collect()}
    assert small == again, "cap must be deterministic"


def test_pmi_planted_collocation_ranks_first(spark):
    from streamkit_spark.functions.text import pmi_pairs

    rows = []
    # "zaa zbb" always co-occur (only with each other); filler tokens are
    # spread independently across docs
    for i in range(10):
        rows.append((i, "zaa zbb"))
    for i in range(10, 40):
        rows.append((i, f"w{i % 3} w{3 + i % 5} w{8 + i % 7}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pmi_pairs(df, min_pair_count=5, top_n=10).collect()
    assert got, "planted collocation should survive the count cut"
    assert (got[0]["a"], got[0]["b"]) == ("zaa", "zbb")
    # PMI of an exclusive pair = ln(N / n_pair) with n_a = n_b = n_ab
    import math

    assert got[0]["pmi"] == round(math.log(40 / 10), 4)


def test_cluster_safe_split_keeps_near_dups_together(spark):
    """Every member of a near-dup cluster gets the SAME split, keyed by
    the cluster representative; unclustered docs split exactly as
    assign_split would on their own id."""
    from streamkit_spark.functions.curation import assign_split, cluster_safe_split

    text = "alpha beta gamma delta epsilon zeta eta theta " * 5
    rows = [(i, text) for i in range(3)]  # exact near-dup cluster 0,1,2
    rows += [(100 + i, f"unique doc {i} " + " ".join(
        f"w{i}{j}" for j in range(20))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from streamkit_spark.functions.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(df, threshold=0.6)
    out = cluster_safe_split(df, pairs).select(
        "doc_id", "split_key", "split"
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 33
    # the cluster: one shared key (min id = 0), one shared split
    assert {by_id[i]["split_key"] for i in (0, 1, 2)} == {0}
    assert len({by_id[i]["split"] for i in (0, 1, 2)}) == 1
    # unclustered docs: key = own id, split = plain assign_split
    plain = {
        r["doc_id"]: r["split"]
        for r in assign_split(df.filter(F.col("doc_id") >= 100)).collect()
    }
    for i in range(100, 130):
        assert by_id[i]["split_key"] == i
        assert by_id[i]["split"] == plain[i]


def test_cluster_safe_split_string_ids_keep_assign_split_fixed_point(spark):
    """With STRING ids, unclustered docs must hash their original id
    ('007', not '7') — the split_key coalesce casts cluster_id to the
    id's type, never the id to long (r7 review fix)."""
    from streamkit_spark.functions.curation import assign_split, cluster_safe_split

    df = spark.createDataFrame(
        [("007", "x"), ("7", "y"), ("doc-9", "z")], "doc_id string, text string"
    )
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = {r["doc_id"]: r for r in cluster_safe_split(df, empty_pairs).collect()}
    plain = {r["doc_id"]: r["split"] for r in assign_split(df).collect()}
    for d in ("007", "7", "doc-9"):
        assert out[d]["split_key"] == d
        assert out[d]["split"] == plain[d]


def test_split_leakage_report_zero_by_construction(spark):
    """The cluster-keyed split leaks ZERO near-dup pairs while the
    id-hash baseline leaks some (with enough planted clusters, the
    ~4% expected straddle rate at 98/1/1 weights materializes)."""
    from streamkit_spark.functions.curation import split_leakage_report
    from streamkit_spark.functions.dedup import minhash_lsh_pairs

    rows = []
    for c in range(40):  # 40 planted pairs of near-identical docs
        text = f"cluster {c} " + " ".join(f"tok{c}_{j}" for j in range(30))
        rows.append((2 * c, text))
        rows.append((2 * c + 1, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, threshold=0.6)
    assert pairs.count() >= 40
    # weights that make straddling likely for the id-hash baseline
    r = split_leakage_report(
        df, pairs, weights={"train": 0.5, "test": 0.5}
    ).collect()[0]
    assert r["n_pairs"] == pairs.count()
    assert r["leaked_cluster_hash"] == 0
    # ~half the pairs straddle under independent 50/50 id hashing
    assert r["leaked_id_hash"] > 5


def test_llr_matches_python_2x2_reference(spark):
    from streamkit_spark.functions.text import llr_pairs

    rows = []
    # zaa/zbb exclusive to 10 docs; zcc co-occurs with them in 5 of
    # those plus 5 fillers (a weaker, non-exclusive association)
    for i in range(10):
        rows.append((i, "zaa zbb" + (" zcc" if i < 5 else "")))
    for i in range(10, 40):
        extra = " zcc" if i < 15 else ""
        rows.append((i, f"w{i % 3} w{3 + i % 5} w{8 + i % 7}{extra}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = llr_pairs(df, min_pair_count=5, top_n=10).collect()
    assert got, "planted collocation should survive the count cut"
    top = {(r["a"], r["b"]): r for r in got}
    assert ("zaa", "zbb") in top
    # the exclusive pair out-scores the weaker planted one
    assert (got[0]["a"], got[0]["b"]) == ("zaa", "zbb")
    assert top[("zaa", "zbb")]["llr"] > top.get(
        ("zaa", "zcc"), got[-1]
    )["llr"]
    import math

    def ref_llr(k11, n_a, n_b, n):
        k12, k21 = n_a - k11, n_b - k11
        k22 = n - n_a - n_b + k11
        out = 0.0
        for k, r, c in (
            (k11, n_a, n_b),
            (k12, n_a, n - n_b),
            (k21, n - n_a, n_b),
            (k22, n - n_a, n - n_b),
        ):
            if k > 0:
                out += k * math.log(k * n / (r * c))
        return 2 * out

    r = top[("zaa", "zbb")]
    # zaa and zbb each appear in exactly the 10 planted docs of 40
    assert r["n_ab"] == 10
    assert r["llr"] == pytest.approx(ref_llr(10, 10, 10, 40), abs=1e-3)
    # an exclusive pair carries more evidence than independent fillers:
    # every other surviving pair scores strictly lower than a planted
    # pair with disjoint support
    rows2 = [(i, "xaa xbb") for i in range(10)] + [
        (i, f"w{i % 3} w{3 + i % 5}") for i in range(10, 40)
    ]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    got2 = llr_pairs(df2, min_pair_count=5, top_n=10).collect()
    assert (got2[0]["a"], got2[0]["b"]) == ("xaa", "xbb")


def test_bigram_logprob_prefers_common_phrases(spark):
    from streamkit_spark.functions.curation import bigram_logprob

    # 9 docs repeat the same phrase; one doc uses the same TOKENS in a
    # never-seen order → its bigrams are all unseen, so it must score
    # lower despite an identical unigram profile
    phrase = "the quick brown fox jumps"
    rows = [(i, phrase) for i in range(9)]
    rows.append((99, "jumps brown the fox quick"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert len(got) == 10
    assert all(r["n_bigrams"] == 4 for r in got.values())
    assert got[99]["logprob"] < got[0]["logprob"]


def test_assign_split_stable_under_corpus_growth(spark):
    from streamkit_spark.functions.curation import assign_split

    from streamkit_spark import tables
    from tests.conftest import SF_DIR

    docs = tables.load(spark, SF_DIR, "documents")
    full = {r["doc_id"]: r["split"] for r in assign_split(docs).collect()}
    assert set(full.values()) <= {"train", "val", "test"}
    # the dominant split dominates
    n = len(full)
    assert sum(1 for s in full.values() if s == "train") > 0.9 * n
    # id-keyed: a doc keeps its split when the corpus shrinks/grows
    half = {r["doc_id"]: r["split"]
            for r in assign_split(docs.limit(200)).collect()}
    for did, s in half.items():
        assert full[did] == s
    # custom weights route through the same buckets
    w = {"a": 0.5, "b": 0.5}
    ab = {r["doc_id"]: r["split"]
          for r in assign_split(docs, w, salt="s2").collect()}
    assert set(ab.values()) == {"a", "b"}


def test_weighted_sample_deterministic_and_weight_monotone(spark):
    import math

    from streamkit_spark.functions.curation import (
        N_SAMPLE_BUCKETS,
        weighted_sample,
    )

    from streamkit_spark import tables
    from tests.conftest import SF_DIR

    docs = tables.load(spark, SF_DIR, "documents")
    got = weighted_sample(docs, "n_chars", k=20).collect()
    assert len(got) == 20
    again = weighted_sample(docs, "n_chars", k=20).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in again]
    # larger k extends the sample (keys are per-row, independent of k)
    bigger = {r["doc_id"] for r in weighted_sample(docs, "n_chars", k=40).collect()}
    assert {r["doc_id"] for r in got} <= bigger
    # python replication of the exact key formula
    from streamkit_spark.functions.curation import sample_bucket  # noqa: F401
    import hashlib

    def key(doc_id, w):
        b = int(hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:4], 16)
        return math.log((b + 0.5) / N_SAMPLE_BUCKETS) / w

    for r in got:
        assert abs(r["skey"] - key(r["doc_id"], r["n_chars"])) < 1e-12
    # doubling a row's weight with the same u can only improve its key
    for r in got:
        assert key(r["doc_id"], 2 * r["n_chars"]) >= key(r["doc_id"], r["n_chars"])


def test_weighted_sample_grouped(spark):
    from streamkit_spark.functions.curation import weighted_sample

    from streamkit_spark import tables
    from tests.conftest import SF_DIR

    docs = tables.load(spark, SF_DIR, "documents")
    got = weighted_sample(docs, "n_chars", k=3, group_col="source").collect()
    per = {}
    for r in got:
        per.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) <= 3 for v in per.values())
    assert len(per) == docs.select("source").distinct().count()
    # grouped draw restricted to one group == global draw over that group
    one = docs.filter("source = 'src0'")
    solo = {r["doc_id"] for r in weighted_sample(one, "n_chars", k=3).collect()}
    assert set(per["src0"]) == solo


# -------------------------------------------------------------- mixture plan

def test_mixture_plan_arithmetic(spark):
    from streamkit_spark.functions.curation import mixture_plan

    df = spark.createDataFrame(
        [("a", "one two three four"), ("a", "five six"),
         ("b", "just three tokens"), ("c", "ignored source")],
        "source string, text string",
    )
    got = {r["source"]: r for r in
           mixture_plan(df, {"a": 3.0, "b": 1.0}, 12).collect()}
    # weights normalize to 0.75 / 0.25; a has 6 tokens, b has 3
    assert set(got) == {"a", "b"}
    a, b = got["a"], got["b"]
    assert (a["available_tokens"], a["target_tokens"]) == (6, 9)
    assert a["rate"] == 1.0 and a["deficit"] == 3 and a["epochs"] == 2
    assert (b["available_tokens"], b["target_tokens"]) == (3, 3)
    assert b["rate"] == 1.0 and b["deficit"] == 0 and b["epochs"] == 1


def test_mixture_plan_weight_normalization_invariant(spark):
    from streamkit_spark.functions.curation import mixture_plan

    df = spark.createDataFrame(
        [("a", "w " * 50), ("b", "w " * 20)], "source string, text string"
    )
    p1 = mixture_plan(df, {"a": 1.0, "b": 1.0}, 40).collect()
    p2 = mixture_plan(df, {"a": 7.0, "b": 7.0}, 40).collect()
    assert [tuple(r) for r in p1] == [tuple(r) for r in p2]
    got = {r["source"]: r for r in p1}
    assert got["a"]["target_tokens"] == 20 and got["a"]["rate"] == 0.4
    assert got["b"]["target_tokens"] == 20 and got["b"]["deficit"] == 0


def test_apply_mixture_plan_materializes_epochs(spark):
    from streamkit_spark.functions.curation import (
        apply_mixture_plan,
        mixture_plan,
    )

    # a: 6 tokens, target 9 -> 1 full epoch + rem 3/6 fractional copies
    # b: 3 tokens, target 3 -> exactly 1 epoch, no fractional
    df = spark.createDataFrame(
        [(1, "a", "one two three four"), (2, "a", "five six"),
         (3, "b", "just three tokens")],
        "doc_id long, source string, text string",
    )
    out = apply_mixture_plan(df, {"a": 3.0, "b": 1.0}, 12).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # every a-doc appears at least once (full epoch), b exactly once
    assert sorted(by_doc[3]) == [0]
    assert all(sorted(v) == list(range(len(v))) for v in by_doc.values())
    assert 1 <= len(by_doc[1]) <= 2 and 1 <= len(by_doc[2]) <= 2
    # determinism: identical output on a second run
    again = apply_mixture_plan(df, {"a": 3.0, "b": 1.0}, 12).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_apply_mixture_plan_tracks_token_targets(spark):
    """Kept tokens per source land near the plan's target (md5 buckets
    approximate the fractional rate; full epochs are exact)."""
    from streamkit_spark.functions.curation import (
        apply_mixture_plan,
        mixture_plan,
    )
    from streamkit_spark.functions.text import token_count

    docs = tables.load(spark, SF_DIR, "documents")
    weights = {f"src{i}": float((i % 5) + 1) for i in range(20)}
    budget = 30000
    plan = {r["source"]: r for r in
            mixture_plan(docs, weights, budget).collect()}
    kept = {
        r["source"]: r["kept"]
        for r in apply_mixture_plan(docs, weights, budget)
        .groupBy("source")
        .agg(F.sum(token_count("text")).alias("kept"))
        .collect()
    }
    for s, p in plan.items():
        # fractional sampling noise is bounded by the largest doc span;
        # full epochs contribute exactly available_tokens each
        assert abs(kept[s] - p["target_tokens"]) <= 0.35 * p["available_tokens"], (
            s, kept[s], p["target_tokens"],
        )


def test_effective_token_report_collapses_clusters(spark):
    rows = [
        # s1: docs 1, 2, 3 form one near-dup component (rep = 1);
        # s2: doc 4 unclustered, doc 5 clustered with rep in s1
        (1, "a b c d e", "s1"),
        (2, "a b c d e f", "s1"),
        (3, "a b c d e g", "s1"),
        (4, "x y z", "s2"),
        (5, "a b c d e h", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 5)], "id_a long, id_b long"
    )
    got = {r["source"]: r for r in C.effective_token_report(df, pairs).collect()}
    s1, s2 = got["s1"], got["s2"]
    # s1: 3 docs, only rep 1 kept (5 tokens of 5+6+6)
    assert (s1["n_docs"], s1["n_kept"]) == (3, 1)
    assert (s1["total_tokens"], s1["effective_tokens"]) == (17, 5)
    assert s1["effective_ratio"] == round(5 / 17, 4)
    # s2: doc 4 kept (unclustered), doc 5 dropped (cluster rep is 1)
    assert (s2["n_docs"], s2["n_kept"]) == (2, 1)
    assert (s2["total_tokens"], s2["effective_tokens"]) == (9, 3)
    assert s2["effective_ratio"] == round(3 / 9, 4)


def test_effective_token_report_no_pairs_is_identity(spark):
    rows = [(1, "a b", "s1"), (2, "c d e", "s1")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    r = C.effective_token_report(df, pairs).collect()[0]
    assert (r["n_docs"], r["n_kept"]) == (2, 2)
    assert r["total_tokens"] == r["effective_tokens"] == 5
    assert r["effective_ratio"] == 1.0
