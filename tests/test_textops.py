"""Training-data operators: dedup (exact/minhash/simhash), text stats,
ANN — verified against independent Python oracles."""

import itertools

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rustac_spark.textops.minhash import (
    minhash_signature, near_dup_pairs, shingles,
)
from rustac_spark.textops.ngram import jaccard_pairs
from rustac_spark.textops.simhash import near_dup_pairs_simhash, simhash64
from rustac_spark.textops.basic import exact_dedup_groups, with_text_stats
from rustac_spark.ml.ann import knn_bruteforce, knn_lsh


BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest to find some food for its cubs")


def _corpus():
    """40 docs: 10 clusters of 2 near-dups (word-5-gram jaccard ~0.88
    within, ~0 across — far enough above the 0.7 threshold that the
    16x4 banding recall is deterministic in practice) + 20 distinct."""
    rows = []
    i = 0
    for c in range(10):
        doc = " ".join(f"cluster{c}word{j}token{c * 31 + j}" for j in range(80))
        rows.append((i, doc)); i += 1
        rows.append((i, doc.replace(f"cluster{c}word3", "REPLACED", 1)))
        i += 1
    for c in range(20):
        rows.append((i, " ".join(f"unique{c}w{j}x{c*j}" for j in range(30))))
        i += 1
    return pd.DataFrame(rows, columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(_corpus())
    df.cache().count()
    return df


def _exact_jaccard_pairs(pdf, threshold):
    sets = {r.doc_id: shingles(r.text) for r in pdf.itertuples()}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        u = len(sets[a] | sets[b])
        if u and len(sets[a] & sets[b]) / u >= threshold:
            out.add((a, b))
    return out


def test_minhash_signature_deterministic():
    s1 = minhash_signature("hello world this is a test")
    s2 = minhash_signature("hello world this is a test")
    assert (s1 == s2).all() and len(s1) == 64


def test_minhash_similar_texts_share_signature_slots():
    a = minhash_signature(BASE)
    b = minhash_signature(BASE.replace("quick", "swift", 1))
    c = minhash_signature("completely different text entirely")
    assert (a == b).mean() > 0.5
    assert (a == c).mean() < 0.2


def test_near_dup_pairs_precision_and_recall(spark, corpus):
    got = {(r["a"], r["b"])
           for r in near_dup_pairs(corpus, threshold=0.7).collect()}
    exact = _exact_jaccard_pairs(_corpus(), 0.7)
    # precision 1 by construction (exact verify step)
    assert got <= exact
    # recall: every true pair ≥ 0.7 found (16 bands × 4 rows is sensitive
    # down to ~0.55 jaccard with high probability)
    assert got == exact
    assert len(got) == 10  # the 10 constructed near-dup pairs


def test_simhash_blocking_exact_for_small_distance(spark, corpus):
    got = {(r["a"], r["b"], r["dist"])
           for r in near_dup_pairs_simhash(corpus, max_distance=3).collect()}
    # independent oracle: all-pairs hamming over driver-side simhashes
    pdf = _corpus()
    hs = {r.doc_id: simhash64(r.text) for r in pdf.itertuples()}
    exp = set()
    for a, b in itertools.combinations(sorted(hs), 2):
        d = bin(hs[a] ^ hs[b]).count("1")
        if d <= 3:
            exp.add((a, b, d))
    assert got == exp
    assert len(got) > 0


def test_minhash_verify_never_touches_text(spark, corpus):
    # the verify path must join shingle-hash arrays, not the corpus
    # text: one Python pass, no second text shuffle (VERDICT r01 #5)
    out = near_dup_pairs(corpus, threshold=0.7, persist=False)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "text_a" not in plan and "text_b" not in plan
    # with persist (the default) the one Python pass is computed once
    # and every branch reads the InMemoryRelation
    cached = near_dup_pairs(corpus, threshold=0.7)
    cplan = cached._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in cplan


def test_ngram_max_df_cap_bounds_skew(spark):
    # every doc shares the viral shingle "zzz"; rare shingles pair up
    # only docs 0 and 1. With the cap, the viral bucket never joins,
    # but the emitted pair's jaccard is still the exact uncapped value.
    rows = [(i, "zzz" + f"unique{i:04d}text{i:04d}") for i in range(2, 50)]
    rows += [(0, "zzzsharedcontenthere"), (1, "zzzsharedcontenthere")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = jaccard_pairs(df, threshold=0.9, max_df=5)
    got = {(r["a"], r["b"]): r["jaccard"] for r in capped.collect()}
    assert got == {(0, 1): 1.0}
    # uncapped finds the same pairs at this threshold
    uncapped = {(r["a"], r["b"]): r["jaccard"]
                for r in jaccard_pairs(df, threshold=0.9,
                                       max_df=None).collect()}
    assert got == uncapped
    # a pair sharing ONLY the viral shingle is dropped by the cap —
    # the documented (and intended) approximation
    lonely = spark.createDataFrame(
        [(0, "zzzAAABBB"), (1, "zzzCCCDDD")], ["doc_id", "text"])
    assert jaccard_pairs(lonely, threshold=0.01, max_df=1).count() == 0
    assert jaccard_pairs(lonely, threshold=0.01, max_df=None).count() == 1


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa")], ["doc_id", "text"])
    rows = {r["fingerprint"][:8]: (r["keep_id"], r["n_copies"])
            for r in exact_dedup_groups(df).collect()}
    assert sorted(rows.values()) == [(1, 3), (2, 1)]


def test_text_stats_columns(spark):
    df = spark.createDataFrame(
        [(0, BASE), (1, "der hund und die katze ist nicht da"),
         (2, "zz9 qq8 xx7")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in with_text_stats(df).collect()}
    assert out[0]["lang_pred"] == "en" and out[0]["n_tokens"] > 20
    assert out[1]["lang_pred"] == "de"
    assert out[2]["lang_pred"] == "und"
    assert all(0.0 <= out[i]["quality"] <= 1.0 for i in out)


def test_ann_ivf_recall_vs_bruteforce(spark):
    import numpy as np
    from rustac_spark.ml.ann import knn_ivf
    rng = [(i, [float(x) for x in np.sin(np.arange(16) * (i + 1) * 0.7)])
           for i in range(200)]
    vec = spark.createDataFrame(rng, ["vec_id", "embedding"])
    q = (vec.where(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec")))
    exact = {(r["query_id"], r["vec_id"])
             for r in knn_bruteforce(vec, q, k=3).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in knn_ivf(vec, q, k=3, n_centroids=8, n_probe=3,
                               dim=16).collect()}
    assert len(approx & exact) / len(exact) >= 0.5


def test_ann_ivf_kmeans_improves_or_matches_random(spark):
    import numpy as np
    from rustac_spark.ml.ann import kmeans_centroids, knn_ivf
    rng = [(i, [float(x) for x in np.sin(np.arange(16) * (i + 1) * 0.7)])
           for i in range(200)]
    vec = spark.createDataFrame(rng, ["vec_id", "embedding"])
    q = (vec.where(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec")))
    exact = {(r["query_id"], r["vec_id"])
             for r in knn_bruteforce(vec, q, k=3).collect()}

    cents = kmeans_centroids(vec, n_centroids=8, dim=16, iters=4)
    # spherical k-means invariants: unit-norm centroids, deterministic
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    cents2 = kmeans_centroids(vec, n_centroids=8, dim=16, iters=4)
    assert np.allclose(cents, cents2)

    fitted = {(r["query_id"], r["vec_id"])
              for r in knn_ivf(vec, q, k=3, n_centroids=8, n_probe=3,
                               dim=16, centroids=cents).collect()}
    random_ = {(r["query_id"], r["vec_id"])
               for r in knn_ivf(vec, q, k=3, n_centroids=8, n_probe=3,
                                dim=16).collect()}
    rec_fit = len(fitted & exact) / len(exact)
    rec_rand = len(random_ & exact) / len(exact)
    # fitted lists must not be worse than unfitted, and decent overall
    assert rec_fit >= rec_rand
    assert rec_fit >= 0.6


def test_embedding_near_dup_lsh_blocking(spark):
    import numpy as np
    from rustac_spark.ml.ann import near_dup_pairs_cosine
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 16))
    rows = []
    i = 0
    for b in base:  # each base vector + a tiny perturbation = near-dup
        rows.append((i, [float(x) for x in b])); i += 1
        rows.append((i, [float(x) for x in b + rng.normal(0, 0.01, 16)]))
        i += 1
    vec = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r["a"], r["b"]) for r in near_dup_pairs_cosine(
        vec, threshold=0.99, block_col=None).collect()}
    lsh = {(r["a"], r["b"]) for r in near_dup_pairs_cosine(
        vec, threshold=0.99, block_col=None, lsh_bits=6, dim=16).collect()}
    # similarities are exact, so LSH output ⊆ exhaustive output
    assert lsh <= exact
    # multi-probe 1-bit-flip blocking keeps recall high on near-dups
    assert len(exact) >= 20
    assert len(lsh) / len(exact) >= 0.9


def test_semdedup_block_col_vs_python_oracle(spark):
    """Label-blocked SemDeDup must equal the NOT EXISTS rule: drop a
    row iff a smaller-id same-label row has cosine >= threshold."""
    import numpy as np
    from rustac_spark.ml.ann import semdedup
    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 16))
    rows = []
    i = 0
    for gi, b in enumerate(base):
        label = f"g{gi % 3}"
        for _ in range(3):  # 3 near-identical members per base vector
            rows.append((i, [float(x)
                             for x in b + rng.normal(0, 0.005, 16)],
                         label))
            i += 1
    vec = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])

    def cos(u, v):
        u, v = np.asarray(u), np.asarray(v)
        return round(float(u @ v / (np.linalg.norm(u)
                                    * np.linalg.norm(v))), 6)

    thr = 0.99
    expect = sorted(
        r[0] for r in rows
        if not any(o[0] < r[0] and o[2] == r[2]
                   and cos(o[1], r[1]) >= thr for o in rows))
    got = sorted(r.vec_id for r in
                 semdedup(vec, threshold=thr, block_col="label").collect())
    assert got == expect
    # two bases share each label, so every label keeps >= 2 reps
    assert len(got) >= 6
    # original schema preserved
    assert semdedup(vec, threshold=thr, block_col="label").columns == \
        ["vec_id", "embedding", "label"]


def test_semdedup_centroid_mode_drops_twins(spark):
    import numpy as np
    from rustac_spark.ml.ann import semdedup
    rng = np.random.default_rng(11)
    base = rng.normal(size=(25, 16))
    rows = []
    i = 0
    for b in base:  # each base vector + a tiny perturbation = near-dup
        rows.append((i, [float(x) for x in b])); i += 1
        rows.append((i, [float(x) for x in b + rng.normal(0, 0.005, 16)]))
        i += 1
    vec = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kept = sorted(r.vec_id for r in
                  semdedup(vec, threshold=0.99, n_centroids=4,
                           dim=16).collect())
    # a twin pair is separated only if the two land in different
    # clusters; with a 0.005 perturbation that is rare — most twins
    # collapse to their min-id member
    assert len(kept) <= 25 + 5
    assert all(k in {r[0] for r in rows} for k in kept)
    # deterministic
    kept2 = sorted(r.vec_id for r in
                   semdedup(vec, threshold=0.99, n_centroids=4,
                            dim=16).collect())
    assert kept == kept2


def test_semdedup_over_cap_cluster_left_undeduped(spark):
    import numpy as np
    from rustac_spark.ml.ann import semdedup
    rng = np.random.default_rng(13)
    b = rng.normal(size=16)
    rows = [(i, [float(x) for x in b + rng.normal(0, 0.001, 16)], "big")
            for i in range(5)]
    rows += [(10, [float(x) for x in rng.normal(size=16)], "small"),
             (11, rows[0][1], "small")]
    vec = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    kept = sorted(r.vec_id for r in
                  semdedup(vec, threshold=0.99, block_col="label",
                           max_cluster=3).collect())
    # the 5-member cluster exceeds max_cluster=3 -> retained whole;
    # the small cluster (2 dissimilar members) also keeps both
    assert kept == [0, 1, 2, 3, 4, 10, 11]


def test_ann_lsh_recall_vs_bruteforce(spark):
    import numpy as np
    rng = [(i, [float(x) for x in np.sin(np.arange(16) * (i + 1) * 0.7)])
           for i in range(200)]
    vec = spark.createDataFrame(rng, ["vec_id", "embedding"])
    q = (vec.where(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec")))
    exact = {(r["query_id"], r["vec_id"])
             for r in knn_bruteforce(vec, q, k=3).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in knn_lsh(vec, q, k=3, nbits=4, dim=16).collect()}
    # multi-probe LSH over 4 bits: recall should be high on this set
    assert len(approx & exact) / len(exact) >= 0.6


def test_hll_accuracy_and_mergeability(spark):
    """From-scratch HyperLogLog: within 3σ (σ=1.04/√m≈0.81%) of the
    exact distinct count, and per-slice sketches merge to exactly the
    whole-data sketch."""
    from pyspark.sql import functions as F

    from rustac_spark.textops.sketches import (
        M, approx_distinct, hll_estimate, hll_registers, merge_registers,
    )

    df = spark.range(0, 200_000).select(
        F.concat(F.lit("url-"), (F.col("id") % 50_000).cast("string"))
        .alias("u"))
    exact = 50_000
    est = approx_distinct(df, "u")
    assert abs(est - exact) / exact < 3 * 1.04 / (M ** 0.5)

    # mergeability: sketch(A) ⊕ sketch(B) == sketch(A ∪ B), exactly
    a = df.where(F.col("u") < "url-3")
    b = df.where(F.col("u") >= "url-3")
    merged = merge_registers(hll_registers(a, "u"),
                             hll_registers(b, "u"))
    whole = hll_registers(df, "u")
    ma = {(r["register"], r["max_rank"]) for r in merged.collect()}
    mw = {(r["register"], r["max_rank"]) for r in whole.collect()}
    assert ma == mw
    assert hll_estimate(merged) == hll_estimate(whole)

    # small-range correction: tiny cardinalities are near-exact
    tiny = spark.range(0, 37).select(F.col("id").cast("string").alias("u"))
    assert abs(approx_distinct(tiny, "u") - 37) < 2

    # the register table never exceeds m rows — the shuffle is bounded
    assert whole.count() <= M


def test_count_min_sketch_bounds_and_heavy_hitters(spark):
    """CMS guarantees: est ≥ true always; est ≤ true + εN in practice;
    heavy_hitters surfaces exactly the zipf-hot domains."""
    from pyspark.sql import functions as F

    from rustac_spark.textops.sketches import (
        CMS_WIDTH, cms_lookup, cms_merge, cms_table, heavy_hitters,
    )
    from rustac_spark.synth import gen_pages

    pages = gen_pages(spark, 20_000, partitions=8)
    dom = pages.select(
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("domain"))
    dom.cache().count()
    exact = {r["domain"]: r["n"] for r in
             dom.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    n = sum(exact.values())

    table = cms_table(dom, "domain")
    assert table.count() <= 4 * CMS_WIDTH
    items = spark.createDataFrame([(d,) for d in list(exact)[:200]],
                                  ["domain"])
    est = {r["item"]: r["est_count"] for r in
           cms_lookup(table, items, "domain").collect()}
    for d, e in est.items():
        assert e >= exact[d]                     # never undercounts
        assert e - exact[d] <= 2.72 * n / CMS_WIDTH + 1

    # merge: two half-sketches sum to the whole sketch exactly
    h1 = dom.where(F.crc32("domain") % 2 == 0)
    h2 = dom.where(F.crc32("domain") % 2 == 1)
    merged = cms_merge(cms_table(h1, "domain"), cms_table(h2, "domain"))
    mm = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    ww = {(r["row"], r["bucket"]): r["cnt"] for r in table.collect()}
    assert mm == ww

    hh = {r["item"]: r["est_count"]
          for r in heavy_hitters(dom, "domain", min_share=0.02).collect()}
    true_heavy = {d for d, c in exact.items() if c >= 0.02 * n}
    assert true_heavy <= set(hh)                 # no false negatives
    # no wild false positives: everything reported is within CMS slack
    for d, e in hh.items():
        assert exact.get(d, 0) + 2.72 * n / CMS_WIDTH + 1 >= 0.02 * n
    dom.unpersist()


# ------------------------------------------------ quality rules (Gopher)

def test_quality_rules_exact_vs_python(spark):
    from collections import Counter
    from rustac_spark.textops.quality_rules import with_quality_rules

    texts = [
        "a a a a b",                      # heavy word repetition
        "x y x y x y x y",                # dominant bigram "x y"
        " ".join(f"w{j}" for j in range(30)),  # clean, long enough
                                               # that gram fracs are low
        "solo",                           # < 2 tokens: gram fracs 0
        "p q",                            # exactly 2 tokens
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in with_quality_rules(df).collect()}

    for i, t in enumerate(texts):
        toks = t.split()
        grams2 = [" ".join(toks[j:j+2]) for j in range(len(toks)-1)]
        grams3 = [" ".join(toks[j:j+3]) for j in range(len(toks)-2)]
        def top(g):
            return 0.0 if not g else Counter(g).most_common(1)[0][1] / len(g)
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert abs(r["dup_word_frac"]
                   - (1 - len(set(toks)) / len(toks))) < 1e-6
        assert abs(r["top_word_frac"] - top(toks)) < 1e-6
        assert abs(r["top_bigram_frac"] - top(grams2)) < 1e-6
        assert abs(r["top_trigram_frac"] - top(grams3)) < 1e-6

    assert got[2]["gopher_pass"] == 1     # clean doc passes
    assert got[1]["gopher_pass"] == 0     # "x y" bigram = 7/7 > 0.20


# ------------------------------------------------------------ TF-IDF

def test_tfidf_top_terms(spark):
    import math
    from rustac_spark.textops.tfidf import top_terms

    df = spark.createDataFrame(
        [(0, "apple apple banana common"),
         (1, "banana cherry common"),
         (2, "cherry cherry cherry common")],
        ["doc_id", "text"])
    out = top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: apple tf=2 df=1 → 2·ln3 ≈ 2.197 wins; banana tf=1 df=2
    top0 = sorted(by_doc[0], key=lambda r: r["rk"])
    assert top0[0]["term"] == "apple"
    assert abs(top0[0]["score"] - 2 * math.log(3)) < 1e-5
    assert top0[1]["term"] == "banana"
    # 'common' (df = N) scores exactly 0 everywhere and never outranks
    for rows in by_doc.values():
        for r in rows:
            if r["term"] == "common":
                assert r["score"] == 0.0
    # doc 2: cherry 3·ln(3/2) ≈ 1.216 beats common 0
    top2 = sorted(by_doc[2], key=lambda r: r["rk"])
    assert top2[0]["term"] == "cherry"


# ----------------------------------------------- deterministic sampling

def test_sampling_matches_sha256_oracle(spark):
    import hashlib
    from rustac_spark.textops.sampling import (
        deterministic_sample, stratified_sample)

    rows = [(i, ["en", "de", "fr", "zz"][i % 4]) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])

    def bucket(key, salt):
        h = hashlib.sha256(f"{key}:{salt}".encode()).hexdigest()
        return int(h[:15], 16) % 1_000_000

    got = {r["doc_id"] for r in
           deterministic_sample(df, "doc_id", 0.25, salt="s").collect()}
    want = {i for i, _ in rows if bucket(i, "s") < 250_000}
    assert got == want

    rates = {"en": 0.5, "de": 0.1}
    got2 = {r["doc_id"] for r in stratified_sample(
        df, "doc_id", "lang", rates, default_rate=0.02, salt="s").collect()}
    want2 = {i for i, lg in rows
             if bucket(i, "s") < int(rates.get(lg, 0.02) * 1_000_000)}
    assert got2 == want2
    # determinism: re-run is identical
    got3 = {r["doc_id"] for r in stratified_sample(
        df, "doc_id", "lang", rates, default_rate=0.02, salt="s").collect()}
    assert got3 == got2


def test_c4_line_filters(spark):
    from rustac_spark.textops.quality_rules import with_c4_filters

    texts = [
        # 2 good lines, 1 short, 1 no-punct
        "This is a good sentence.\nno\nAnother full line here!\n"
        "trailing words without punctuation",
        "only lorem ipsum filler text here.",     # marker → dropped
        "word",                                   # nothing survives
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in with_c4_filters(df).collect()}

    assert got[0]["clean_text"] == \
        "This is a good sentence.\nAnother full line here!"
    assert got[0]["n_lines_total"] == 4
    assert got[0]["n_lines_kept"] == 2
    assert got[0]["c4_keep"] == 1
    assert got[1]["n_lines_kept"] == 1 and got[1]["c4_keep"] == 0
    assert got[2]["n_lines_kept"] == 0 and got[2]["c4_keep"] == 0


def test_quality_rules_streaming_safe(spark, tmp_path):
    """The Column-only quality/C4 signals run unchanged under
    Structured Streaming (no stateful op, narrow map)."""
    from rustac_spark.textops.quality_rules import (
        with_c4_filters, with_quality_rules)

    src = str(tmp_path / "in")
    df = spark.createDataFrame(
        [(1, "One good line here.\nshort"), (2, "a a a a a")],
        ["doc_id", "text"])
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = with_c4_filters(with_quality_rules(stream))
    q = (out.writeStream.format("memory").queryName("qr_stream")
         .outputMode("append").start())
    q.processAllAvailable(); q.stop()
    rows = {r["doc_id"]: r for r in
            spark.sql("select * from qr_stream").collect()}
    assert rows[1]["n_lines_kept"] == 1
    assert rows[2]["dup_word_frac"] > 0.7


def test_bpe_token_count(spark):
    from rustac_spark.textops.basic import bpe_token_count
    df = spark.createDataFrame(
        [(0, "hello world"),       # 2 letter runs
         (1, "abc123!?x"),         # abc | 123 | !? | x
         (2, "don't stop"),        # don | ' | t | _stop
         (3, "")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    assert out == {0: 2, 1: 4, 2: 4, 3: 0}


def test_chunk_tokens_overlap_and_coverage(spark):
    from rustac_spark.textops.basic import chunk_tokens

    words = [f"w{i}" for i in range(25)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(chunk_tokens(df, chunk_size=10, overlap=3).collect(),
                  key=lambda r: r["chunk_start"])
    # stride 7: starts 0,7,14,21
    assert [r["chunk_start"] for r in rows] == [0, 7, 14, 21]
    assert rows[0]["chunk_text"].split() == words[0:10]
    assert rows[1]["chunk_text"].split() == words[7:17]
    assert rows[3]["chunk_text"].split() == words[21:25]  # short tail
    assert rows[3]["n_chunk_tokens"] == 4
    # consecutive chunks share exactly `overlap` tokens
    assert rows[0]["chunk_text"].split()[-3:] == \
        rows[1]["chunk_text"].split()[:3]
    # every token is covered
    got = set()
    for r in rows:
        got.update(r["chunk_text"].split())
    assert got == set(words)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_tokens(df, chunk_size=5, overlap=5)


def test_ivf_prebuilt_index_equivalence(spark):
    import numpy as np
    from rustac_spark.ml.ann import (build_ivf_index, kmeans_centroids,
                                     knn_ivf)
    rng = [(i, [float(x) for x in np.sin(np.arange(16) * (i + 1) * 0.7)])
           for i in range(200)]
    vec = spark.createDataFrame(rng, ["vec_id", "embedding"])
    q = (vec.where(F.col("vec_id") < 5)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qvec")))
    cents = kmeans_centroids(vec, n_centroids=8, dim=16, iters=2)
    idx = build_ivf_index(vec, cents)
    with_idx = {(r["query_id"], r["rank"], r["vec_id"]) for r in
                knn_ivf(vec, q, k=3, n_probe=3, centroids=cents,
                        index=idx).collect()}
    without = {(r["query_id"], r["rank"], r["vec_id"]) for r in
               knn_ivf(vec, q, k=3, n_probe=3,
                       centroids=cents).collect()}
    assert with_idx == without and len(with_idx) == 15


def test_pii_scrub_redacts_and_counts(spark):
    from rustac_spark.textops.basic import with_pii_scrub

    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-1.org and admin@sub.ex.co twice"),
         (2, "server at 192.168.0.1 port 80, call +4915512345678"),
         (3, "clean text, no pii at all"),
         (4, "not-an-ip 1.2.3 and not-a-phone +12 stay put")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_pii_scrub(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) \
        == (2, 0, 0)
    assert out[1]["scrubbed_text"] == "mail <EMAIL> and <EMAIL> twice"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) \
        == (0, 1, 1)
    assert out[2]["scrubbed_text"] == \
        "server at <IP> port 80, call <PHONE>"
    assert out[3]["scrubbed_text"] == out[3]["text"]
    # under-threshold lookalikes are untouched (no over-redaction of
    # short digit runs / non-dotted-quad numbers)
    assert out[4]["scrubbed_text"] == out[4]["text"]


def test_dup_ngram_spans_exact_and_hashed(spark):
    """Span detector: maximal duplicated-token-run reporting matches a
    hand-computed oracle; the hashed (8-byte shuffle key) variant
    agrees with the exact string-keyed one."""
    from rustac_spark.textops.ngram import dup_ngram_spans

    shared = "the quick brown fox jumps over the lazy dog again"  # 10 toks
    docs = spark.createDataFrame(
        [(1, f"A B C {shared} X Y Z"),
         (2, f"P Q {shared} R S T"),
         (3, "totally unique text with no repeated runs at all here")],
        "doc_id long, text string")
    out = {(r["doc_id"]): (r["span_start"], r["span_end"],
                           r["n_dup_grams"])
           for r in dup_ngram_spans(docs, n=10, min_count=2,
                                    hashed=False).collect()}
    # doc1: shared block = tokens 3..12 → single 10-gram at pos 3
    assert out[1] == (3, 12, 1)
    # doc2: shared block = tokens 2..11 → single 10-gram at pos 2
    assert out[2] == (2, 11, 1)
    assert 3 not in out
    hashed = {(r["doc_id"]): (r["span_start"], r["span_end"],
                              r["n_dup_grams"])
              for r in dup_ngram_spans(docs, n=10, min_count=2,
                                       hashed=True).collect()}
    assert hashed == out


def test_dup_ngram_spans_merges_adjacent_runs(spark):
    from rustac_spark.textops.ngram import dup_ngram_spans

    # 6 shared tokens with n=3 → grams at pos 0..3 in doc1 (4 grams,
    # one maximal span 0..5) — adjacency merging, not per-gram rows
    docs = spark.createDataFrame(
        [(1, "a b c d e f tail1 only1"),
         (2, "pre a b c d e f tail2")],
        "doc_id long, text string")
    rows = dup_ngram_spans(docs, n=3, min_count=2,
                           hashed=False).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert len(rows) == 2
    assert (by_doc[1]["span_start"], by_doc[1]["span_end"],
            by_doc[1]["n_dup_grams"]) == (0, 5, 4)
    assert (by_doc[2]["span_start"], by_doc[2]["span_end"],
            by_doc[2]["n_dup_grams"]) == (1, 6, 4)


def test_dup_ngram_spans_random_corpus_vs_bruteforce(spark):
    """Randomized cross-check: tiny alphabet forces many accidental
    duplicate n-grams; spans must equal an independent Python
    brute-force oracle exactly (starts, ends, gram counts)."""
    import random
    from collections import Counter

    from rustac_spark.textops.ngram import dup_ngram_spans

    rng = random.Random(42)
    n, min_count = 3, 2
    corpus = {i: [rng.choice("abcdef") for _ in range(rng.randint(1, 30))]
              for i in range(40)}

    grams = Counter()
    for toks in corpus.values():
        for p in range(len(toks) - n + 1):
            grams[" ".join(toks[p:p + n])] += 1
    expected = set()
    for did, toks in corpus.items():
        dup_pos = [p for p in range(len(toks) - n + 1)
                   if grams[" ".join(toks[p:p + n])] >= min_count]
        runs, start = [], None
        for i, p in enumerate(dup_pos):
            if start is None:
                start = p
            if i + 1 == len(dup_pos) or dup_pos[i + 1] != p + 1:
                expected.add((did, start, p + n - 1, p - start + 1))
                start = None

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()],
        "doc_id long, text string")
    got = {(r["doc_id"], r["span_start"], r["span_end"],
            r["n_dup_grams"])
           for r in dup_ngram_spans(docs, n=n, min_count=min_count,
                                    hashed=False).collect()}
    assert got == expected


def test_canonical_url_and_dedup(spark):
    from rustac_spark.textops.basic import (canonical_url,
                                            dedup_by_canonical_url)

    rows = [
        (1, "HTTPS://Example.COM:443/a/b/?utm_source=x&id=3#frag"),
        (2, "https://example.com/a/b?id=3"),       # same canonical
        (3, "https://example.com/a/b?id=4"),       # different query
        (4, "http://other.org/"),
        (5, "http://other.org"),                   # same canonical
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", canonical_url(F.col("url")).alias("c")).collect()}
    assert got[1] == got[2] == "https://example.com/a/b?id=3"
    assert got[3] == "https://example.com/a/b?id=4"
    assert got[4] == got[5]
    kept = {r["doc_id"] for r in dedup_by_canonical_url(df).collect()}
    assert len(kept) == 3
    assert 3 in kept                      # distinct query survives
    assert len({1, 2} & kept) == 1 and len({4, 5} & kept) == 1


def test_dup_span_fraction(spark):
    from rustac_spark.textops.ngram import with_dup_span_fraction

    shared = " ".join(f"w{i}" for i in range(10))   # 10 shared tokens
    docs = spark.createDataFrame(
        [(1, f"{shared} u1a u1b u1c u1d u1e u1f u1g u1h u1i u1j"),
         (2, f"u2a u2b u2c u2d u2e u2f u2g u2h u2i u2j {shared}"),
         (3, "all unique tokens here nothing repeats in this doc x y")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["dup_span_fraction"], r["n_tokens_total"])
           for r in with_dup_span_fraction(docs, n=10, hashed=False)
           .collect()}
    assert out[1] == (0.5, 20) and out[2] == (0.5, 20)
    assert out[3] == (0.0, 11)


def test_canonical_url_idempotent(spark):
    """canonical_url is a normal form: applying it twice equals once
    (checked over a batch of adversarial URLs in one pass)."""
    from rustac_spark.textops.basic import canonical_url

    urls = [
        "HTTP://A.B:80/", "https://x.y:443/p/?utm_a=1&utm_b=2",
        "https://x.y/p?a=1&utm_c=3&b=2#z", "http://h/p/q/",
        "https://h", "http://h/?gclid=abc", "http://h/p?&",
        "ftp://H.I/Z?fbclid=1&keep=2",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonical_url(F.col("url")).alias("c1")
    out = df.select(once).select(
        F.col("c1"), canonical_url(F.col("c1")).alias("c2")).collect()
    for r in out:
        assert r["c1"] == r["c2"], r


def test_dup_span_fraction_overlapping_runs_merge(spark):
    """Dup positions with gaps of 2..n-1 yield SEPARATE runs whose
    n-token ranges overlap; coverage must come from merged intervals,
    never exceed 1.0 (round-4 advice: raw run-length summing gave
    20/12 for n=10, dup positions {0,2})."""
    from rustac_spark.textops.ngram import with_dup_span_fraction

    g = [f"g{i}" for i in range(12)]
    doc_a = " ".join(g)                       # grams at pos 0,1,2
    # doc B repeats A's pos-0 gram (g0..g9) and pos-2 gram (g2..g11)
    # but never A's pos-1 gram (g1..g10): A's dup positions are {0,2}
    doc_b = " ".join(g[0:10] + ["X"] + g[2:12])
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string")
    out = {r["doc_id"]: (r["dup_span_fraction"], r["n_tokens_total"])
           for r in with_dup_span_fraction(docs, n=10, hashed=False)
           .collect()}
    # A: merged([0,9],[2,11]) = [0,11] → 12/12, NOT 20/12
    assert out[1] == (1.0, 12)
    # B: dup at pos 0 ([0,9]) and pos 11 ([11,20]) — disjoint, 20/21
    assert out[2] == (round(20 / 21, 6), 21)


def test_canonical_url_port_strip_anchored_to_authority(spark):
    """':80'/':443' is only a default port in the AUTHORITY —
    occurrences in a path segment or query value must survive
    (round-4 advice: the unanchored pattern conflated distinct
    URLs)."""
    from rustac_spark.textops.basic import canonical_url

    rows = [
        (1, "http://h/p:80/q"),          # path segment, keep
        (2, "http://h:80/p:443/x"),      # authority strips, path keeps
        (3, "https://h:443"),            # bare authority, strip
        (4, "http://h/p?next=a:80"),     # query value, keep
        (5, "http://h:8080/p"),          # non-default port, keep
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", canonical_url(F.col("url")).alias("c")).collect()}
    assert got[1] == "http://h/p:80/q"
    assert got[2] == "http://h/p:443/x"
    assert got[3] == "https://h"
    assert got[4] == "http://h/p?next=a:80"
    assert got[5] == "http://h:8080/p"


def test_decontaminate_drops_overlapping_docs(spark):
    from rustac_spark.textops.ngram import (contaminated_gram_counts,
                                            decontaminate)
    bench_q = " ".join(f"benchq{j}" for j in range(8))
    rows = [
        (0, "clean " + " ".join(f"safe{j}" for j in range(12))),
        # verbatim benchmark question embedded mid-document
        (1, "prefix words " + bench_q + " suffix words here"),
        # shares only 7 of the 8 benchmark tokens contiguously
        (2, " ".join(f"benchq{j}" for j in range(7)) + " divergent tail"),
        # two separate full matches -> two contaminated gram positions
        (3, bench_q + " mid " + bench_q),
        (4, ""),  # empty doc: no grams, never contaminated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(bench_q,)], "text string")

    counts = {r.doc_id: r.n_contam_grams
              for r in contaminated_gram_counts(docs, bench, n=8).collect()}
    assert counts == {1: 1, 3: 2}

    kept = sorted(r.doc_id for r in
                  decontaminate(docs, bench, n=8).collect())
    assert kept == [0, 2, 4]

    flagged = {r.doc_id: (r.contaminated, r.n_contam_grams)
               for r in decontaminate(docs, bench, n=8,
                                      mode="flag").collect()}
    assert flagged == {0: (False, 0), 1: (True, 1), 2: (False, 0),
                       3: (True, 2), 4: (False, 0)}
    with pytest.raises(ValueError):
        decontaminate(docs, bench, n=8, mode="purge")


def test_decontaminate_vs_python_oracle(spark, corpus):
    """Corpus vs a brute-force Python oracle: benchmark = every 7th
    doc's text; any doc sharing a token 6-gram with one of them must
    be dropped, everything else kept."""
    from rustac_spark.textops.ngram import decontaminate
    pdf = _corpus()
    bench_pdf = pdf[pdf.doc_id % 7 == 0]
    n = 6

    def grams(text):
        tks = text.split()
        return {" ".join(tks[i:i + n]) for i in range(len(tks) - n + 1)}

    bench_grams = set().union(*(grams(t) for t in bench_pdf.text))
    expect_kept = sorted(
        r.doc_id for r in pdf.itertuples()
        if not (grams(r.text) & bench_grams))

    bench = spark.createDataFrame(bench_pdf[["text"]])
    kept = sorted(r.doc_id for r in
                  decontaminate(corpus, bench, n=n).collect())
    assert kept == expect_kept
    # benchmark members trivially self-overlap -> all dropped
    assert all(d not in kept for d in pdf.doc_id[pdf.doc_id % 7 == 0])


class TestPacking:
    def test_pack_matches_reference(self, spark):
        """Greedy token-budget packing matches the driver-side
        reference on a multi-group input with an oversized doc."""
        import random

        from rustac_spark.textops.packing import (pack_documents,
                                                  pack_documents_py)
        rng = random.Random(11)
        rows = [(f"s{rng.randrange(3)}", i, rng.randrange(10, 400))
                for i in range(200)]
        rows.append(("s0", 9999, 5000))  # oversized: own pack
        df = spark.createDataFrame(
            rows, "source string, doc_id long, n_tokens long")
        got = {(r["source"], r["doc_id"]): (r["pack_id"], r["pack_pos"])
               for r in pack_documents(df.repartition(7), 1024).collect()}
        exp = {(g, i): (p, q)
               for g, i, _, p, q in pack_documents_py(rows, 1024)}
        assert got == exp
        # the oversized doc sits alone in its own pack
        over = got[("s0", 9999)]
        assert over[1] == 0
        assert [k for k, v in got.items()
                if k[0] == "s0" and v[0] == over[0]] == [("s0", 9999)]

    def test_pack_budget_invariants(self, spark):
        """No pack of 2+ docs exceeds the budget, packs are dense
        (0..max consecutive per group) and positions are in doc order."""
        from rustac_spark.textops.packing import pack_documents
        df = spark.range(300).select(
            (F.col("id") % 4).cast("string").alias("source"),
            F.col("id").alias("doc_id"),
            (F.col("id") % 97 + 5).alias("n_tokens"))
        out = pack_documents(df, 200).collect()
        by_pack: dict = {}
        for r in out:
            by_pack.setdefault((r["source"], r["pack_id"]), []).append(r)
        for (_, _), rs in by_pack.items():
            rs.sort(key=lambda r: r["pack_pos"])
            assert [r["pack_pos"] for r in rs] == list(range(len(rs)))
            assert [r["doc_id"] for r in rs] == sorted(
                r["doc_id"] for r in rs)
            if len(rs) > 1:
                assert sum(r["n_tokens"] for r in rs) <= 200
        for src in {r["source"] for r in out}:
            pids = sorted({r["pack_id"] for r in out
                           if r["source"] == src})
            assert pids == list(range(len(pids)))

    def test_pack_rejects_bad_budget(self, spark):
        from rustac_spark.textops.packing import pack_documents
        df = spark.createDataFrame(
            [("a", 1, 2)], "source string, doc_id long, n_tokens long")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            pack_documents(df, 0)


class TestPackingBucketed:
    def test_bucketed_single_group_parallel_and_deterministic(self, spark):
        """A ONE-group input (the round-6 verdict's straggler shape)
        packs across many (group, bucket) keys, and assignments equal
        the sequential per-bucket reference with cumulative-doc-count
        offsets — deterministic under any input partitioning."""
        from rustac_spark.textops.packing import (pack_documents,
                                                  pack_documents_py)
        n, nb, budget = 240, 8, 64
        rows = [("s", i, 10 + i % 7) for i in range(n)]
        df = spark.createDataFrame(
            rows, "source string, doc_id long, n_tokens long")
        got = {r["doc_id"]: (r["pack_id"], r["pack_pos"])
               for r in pack_documents(df.repartition(5), budget,
                                       buckets=nb).collect()}
        # reference: same deterministic bucket expression, greedy per
        # bucket via the driver reference, offsets = cumulative doc
        # counts of earlier buckets
        bmap = {r["doc_id"]: r["b"] for r in df.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(nb))
            .cast("long").alias("b")).collect()}
        assert len(set(bmap.values())) >= nb // 2  # real spread
        ref = pack_documents_py(
            [(bmap[i], i, t) for _, i, t in rows], budget)
        counts: dict = {}
        for _, i, t in rows:
            counts[bmap[i]] = counts.get(bmap[i], 0) + 1
        offs, acc = {}, 0
        for b in sorted(counts):
            offs[b] = acc
            acc += counts[b]
        exp = {i: (p + offs[g], q) for g, i, _, p, q in ref}
        assert got == exp
        # repartitioning the input does not change assignments
        got2 = {r["doc_id"]: (r["pack_id"], r["pack_pos"])
                for r in pack_documents(df.repartition(2), budget,
                                        buckets=nb).collect()}
        assert got2 == got

    def test_bucketed_budget_and_id_uniqueness(self, spark):
        """Bucketed packs respect the token budget (beyond oversized
        singletons), pack ids are unique per (group, pack) and
        ascending, positions dense in doc order."""
        from rustac_spark.textops.packing import pack_documents
        df = spark.range(500).select(
            (F.col("id") % 2).cast("string").alias("source"),
            F.col("id").alias("doc_id"),
            (F.col("id") % 97 + 5).alias("n_tokens"))
        out = pack_documents(df, 200, buckets=4).collect()
        by_pack: dict = {}
        for r in out:
            by_pack.setdefault((r["source"], r["pack_id"]), []).append(r)
        for rs in by_pack.values():
            rs.sort(key=lambda r: r["pack_pos"])
            assert [r["pack_pos"] for r in rs] == list(range(len(rs)))
            assert [r["doc_id"] for r in rs] == sorted(
                r["doc_id"] for r in rs)
            if len(rs) > 1:
                assert sum(r["n_tokens"] for r in rs) <= 200
