"""Corpus curation ops (textops/corpus.py): decontamination, repetition
signals, deterministic shuffle rank."""

import hashlib

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dygiepp_ray.textops import corpus


def _docs_ds(rows):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
    )


def test_doc_ngrams_hand_case():
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b c d", "x y", "  "]})
    g = corpus._doc_ngrams(df, 2, "text", "doc_id")
    got = sorted(map(tuple, g.to_numpy()))
    assert got == [(1, "a b"), (1, "b c"), (1, "c d"), (2, "x y")]
    g3 = corpus._doc_ngrams(df, 3, "text", "doc_id")
    assert sorted(g3["gram"]) == ["a b c", "b c d"]


def test_doc_ngrams_no_cross_document_grams():
    # adjacent docs must not produce grams spanning their boundary
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["p q", "r s"]})
    g = corpus._doc_ngrams(df, 2, "text", "doc_id")
    assert "q r" not in set(g["gram"])


def test_decontaminate_flags_overlap(ray_session):
    # doc 0 is the eval set (0 % 23 == 0); doc 5 shares its 4-gram,
    # doc 7 does not, doc 9 is too short to have any 4-gram.
    ds = _docs_ds(
        [
            (0, "the quick brown fox jumps"),
            (5, "xx the quick brown fox yy"),
            (7, "совершенно other words here entirely"),
            (9, "too short"),
        ]
    )
    out = (
        corpus.decontaminate(ds, concurrency=None)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "is_eval"] == 1 and out.loc[0, "contaminated"] == 0
    # eval doc hits its own grams: "the quick brown fox" + "quick brown fox jumps"
    assert out.loc[0, "n_hits"] == 2
    assert out.loc[5, "contaminated"] == 1 and out.loc[5, "n_hits"] == 1
    assert out.loc[7, "contaminated"] == 0 and out.loc[7, "n_hits"] == 0
    assert out.loc[9, "contaminated"] == 0


def test_fuzzy_decontaminate_matches_brute_force(ray_session):
    """Engine pairs == brute-force all-pairs Jaccard (eval_mod path),
    incl. the inclusive boundary and self-exclusion of eval members."""
    from dygiepp_ray.textops.dedup import _shingle_hashes

    texts = {
        0: "the quick brown fox jumps over dog",      # eval (0 % 23 == 0)
        23: "p q r s t u v w",                        # eval
        5: "the quick brown fox jumps over cat",      # near-dup of 0
        7: "entirely different content here now ok",  # clean
        9: "p q r s t u v w",                         # exact dup of 23
        11: "",                                       # empty
    }
    ds = _docs_ds(list(texts.items()))
    out = corpus.fuzzy_decontaminate(
        ds, threshold_num=1, threshold_den=2, concurrency=None
    ).to_pandas()
    got = set(map(tuple, out[["doc_id", "eval_id"]].to_numpy()))

    sets = {i: set(_shingle_hashes(t.split(), 3).tolist()) for i, t in texts.items()}
    exp = set()
    for c in texts:
        if c % 23 == 0:
            continue
        for e in texts:
            if e % 23 != 0:
                continue
            u = sets[c] | sets[e]
            if u and 2 * len(sets[c] & sets[e]) >= len(u):
                exp.add((c, e))
    assert got == exp
    assert (9, 23) in got  # exact dup found
    assert int(out.set_index(["doc_id", "eval_id"]).loc[(9, 23), "jac_pct"]) == 100
    assert (5, 0) in got   # near-dup found
    assert all(out["doc_id"] % 23 != 0)  # eval members never on corpus side


def test_fuzzy_decontaminate_external_eval_ds(ray_session):
    """External eval_ds: disjoint inputs, every corpus doc checked
    (eval_mod ignored), actor-pool path."""
    corpus_ds = _docs_ds(
        [(0, "alpha beta gamma delta eps"), (1, "totally unrelated words here")]
    )
    eval_ds = _docs_ds([(100, "alpha beta gamma delta zeta")])
    out = corpus.fuzzy_decontaminate(
        corpus_ds, threshold_num=1, threshold_den=2, eval_ds=eval_ds,
        concurrency=2,
    ).to_pandas()
    # doc 0 (eval_mod would exclude it) IS checked against eval_id 100
    assert set(map(tuple, out[["doc_id", "eval_id"]].to_numpy())) == {(0, 100)}


def test_decontaminate_counts_distinct_grams(ray_session):
    # the contaminated gram occurs twice in doc 3 but counts once
    ds = _docs_ds(
        [(0, "a b c d"), (3, "a b c d z a b c d")]
    )
    out = corpus.decontaminate(ds, concurrency=None).to_pandas().set_index("doc_id")
    assert out.loc[3, "n_hits"] == 1


def test_duplicated_ngram_fraction_hand_case(ray_session):
    """Planted corpus, n=2: doc 1 'a b c d' (grams ab,bc,cd), doc 2
    'a b x' (ab,bx), doc 3 'c d y c d' (cd,dy,yc — dc? no: grams cd,dy,
    yc,cd -> distinct cd,dy,yc).  Cross-doc duplicated grams: ab (docs
    1,2), cd (docs 1,3).  Fractions: doc1 2/3, doc2 1/2, doc3 1/3."""
    docs = pd.DataFrame(
        {"doc_id": np.int64([1, 2, 3]),
         "text": ["a b c d", "a b x", "c d y c d"]}
    )
    out = (
        corpus.duplicated_ngram_fraction(rd.from_pandas(docs), n=2, num_buckets=4)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_grams"].tolist() == [3, 2, 3]
    assert out["n_dup"].tolist() == [2, 1, 1]
    assert out["dup_fraction_x1e6"].tolist() == [666666, 500000, 333333]


def test_duplicated_ngram_fraction_fingerprint_equivalent(ray_session):
    """The 64-bit-fingerprint exchange key (the 100-TB shuffle-bytes
    lever) must reproduce the exact-string result at collision-free
    scale — here on the real sf0.001 documents table."""
    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    docs2 = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    exact = (
        corpus.duplicated_ngram_fraction(docs, num_buckets=4)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    fp = (
        corpus.duplicated_ngram_fraction(docs2, num_buckets=4, fingerprint=True)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert len(exact) > 0
    pd.testing.assert_frame_equal(exact, fp)


def test_duplicated_ngram_fraction_short_docs_absent(ray_session):
    """Documents shorter than n tokens emit no row (SQL-twin parity)."""
    docs = pd.DataFrame(
        {"doc_id": np.int64([1, 2]), "text": ["a", "a b c a b"]}
    )
    out = corpus.duplicated_ngram_fraction(
        rd.from_pandas(docs), n=3, num_buckets=2
    ).to_pandas()
    assert out["doc_id"].tolist() == [2]
    assert out["n_dup"].tolist() == [0]


def test_repetition_scores_hand_case(ray_session):
    ds = _docs_ds(
        [
            # 2-grams: "a b" x2, "b a" x1, "b b" x1 -> top2 = ("a b", 2)
            # 3-grams: "a b b","b b a","b a b","a b a"? tokens: a b b a b
            (1, "a b b a b"),
            # tie between "x y" and "y x" (1 each) -> lexicographically
            # smallest wins: "x y"
            (2, "x y x"),
            (3, "solo"),
        ]
    )
    out = corpus.repetition_scores(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "top2_count"] == 2 and out.loc[1, "top2_gram"] == "a b"
    assert out.loc[2, "top2_count"] == 1 and out.loc[2, "top2_gram"] == "x y"
    assert out.loc[3, "top2_count"] == 0 and out.loc[3, "top2_gram"] == ""
    # doc 1 3-grams: "a b b", "b b a", "b a b" — all distinct
    assert out.loc[1, "dup3_occurrences"] == 0 and out.loc[1, "n_3grams"] == 3
    assert out.loc[3, "n_3grams"] == 0


def test_repetition_dup3_counts_occurrences(ray_session):
    # "a b c" occurs twice -> dup3_occurrences counts BOTH occurrences
    ds = _docs_ds([(1, "a b c a b c")])
    out = corpus.repetition_scores(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "dup3_occurrences"] == 2
    assert out.loc[1, "n_3grams"] == 4


def _expected_rank(ids):
    keyed = sorted((hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids)
    return {i: pos for pos, (_h, i) in enumerate(keyed)}


@pytest.mark.parametrize("prefix_bytes", [1, 2])
def test_shuffle_rank_matches_global_sort(ray_session, prefix_bytes):
    ids = list(range(200))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids})).repartition(7)
    out = (
        corpus.shuffle_rank(ds, prefix_bytes=prefix_bytes)
        .to_pandas()
        .set_index("doc_id")["shuffle_pos"]
    )
    exp = _expected_rank(ids)
    assert len(out) == len(ids)
    assert sorted(out) == list(range(len(ids)))  # a permutation
    for i in ids:
        assert out[i] == exp[i]


def test_decontaminate_with_separate_eval_ds(ray_session):
    corpus_ds = _docs_ds([(1, "w x y z tail"), (2, "none of these")])
    eval_ds = _docs_ds([(100, "w x y z")])
    out = (
        corpus.decontaminate(corpus_ds, concurrency=None, eval_ds=eval_ds)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "n_hits"] == 1 and out.loc[1, "contaminated"] == 1
    assert out.loc[2, "n_hits"] == 0 and out.loc[2, "contaminated"] == 0


# ---------------------------------------------------------------------------
# property-based: _doc_ngrams vs brute force (Ray-free)
# ---------------------------------------------------------------------------

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.lists(
    st.sampled_from(["a", "b", "cc", "ddd"]), min_size=0, max_size=12
)
_corpora = st.lists(_words, min_size=1, max_size=5)


def _brute_ngrams(tokens, n):
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


@given(_corpora, st.integers(2, 4))
@settings(max_examples=60, deadline=None)
def test_doc_ngrams_matches_brute_force(docs, n):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(docs), dtype=np.int64),
            "text": [" ".join(t) for t in docs],
        }
    )
    got = corpus._doc_ngrams(df, n, "text", "doc_id")
    got_counts = Counter(map(tuple, got.to_numpy()))
    exp = Counter(
        (i, g) for i, toks in enumerate(docs) for g in _brute_ngrams(toks, n)
    )
    assert got_counts == exp


@given(st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=60, unique=True))
@settings(max_examples=30, deadline=None)
def test_shuffle_rank_offsets_partition_the_hash_space(ids):
    # Ray-free check of the range/offset arithmetic: ranks restricted to
    # any hash range must form a contiguous block starting at its offset
    keyed = sorted((hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids)
    pos = {i: p for p, (_h, i) in enumerate(keyed)}
    by_range = {}
    for h, i in keyed:
        by_range.setdefault(int(h[:2], 16), []).append(pos[i])
    start = 0
    for r in sorted(by_range):
        block = sorted(by_range[r])
        assert block == list(range(start, start + len(block)))
        start += len(block)


def test_frequent_ngrams_global_topk(ray_session):
    # gram "p q r" x3 across docs; "a b c" x2; many singletons
    ds = _docs_ds(
        [
            (1, "p q r s p q r"),
            (2, "p q r a b c"),
            (3, "a b c d e f"),
        ]
    ).repartition(3)
    out = corpus.frequent_ngrams(ds, n=3, k=4, num_buckets=4)
    assert list(out.columns) == ["gram", "n_occurrences"]
    assert out.iloc[0]["gram"] == "p q r" and out.iloc[0]["n_occurrences"] == 3
    assert out.iloc[1]["gram"] == "a b c" and out.iloc[1]["n_occurrences"] == 2
    # remaining slots: count-1 ties resolve to lexicographically smallest
    brute = Counter()
    for _d, text in [(1, "p q r s p q r"), (2, "p q r a b c"), (3, "a b c d e f")]:
        toks = text.split()
        for i in range(len(toks) - 2):
            brute[" ".join(toks[i : i + 3])] += 1
    exp = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(map(tuple, out.to_numpy())) == exp


def test_doc_ngrams_duplicate_doc_id_rows_stay_row_local():
    # same doc_id in two rows separated by another doc: no gram may span rows
    df = pd.DataFrame(
        {"doc_id": [1, 2, 1], "text": ["a b", "z", "c d"]}
    )
    g = corpus._doc_ngrams(df, 3, "text", "doc_id")
    assert len(g) == 0  # no row has 3 tokens; nothing may leak across rows
    g2 = corpus._doc_ngrams(df, 2, "text", "doc_id")
    assert sorted(g2["gram"]) == ["a b", "c d"]


def test_decontaminate_eval_ds_ignores_eval_mod(ray_session):
    # doc 23 (a multiple of EVAL_MOD) must still be flagged when the
    # eval set is a separate input
    corpus_ds = _docs_ds([(23, "w x y z tail"), (24, "none of these")])
    eval_ds = _docs_ds([(0, "w x y z")])
    out = (
        corpus.decontaminate(corpus_ds, concurrency=None, eval_ds=eval_ds)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[23, "is_eval"] == 0 and out.loc[23, "contaminated"] == 1
    assert out.loc[24, "contaminated"] == 0


def test_prepare_training_set_end_to_end(ray_session):
    # docs: 0 = eval (mod 23); 5 = contaminated by doc 0's grams;
    # 30/31 = exact dups (31 dropped); 7 = too short (quality);
    # the rest kept.  Long texts to pass the 20-token quality gate.
    base = " ".join(f"tok{i}" for i in range(25))
    other = " ".join(f"w{i}" for i in range(25))
    rows = [
        (0, "the quick brown fox " + base),
        (5, "xx the quick brown fox " + other),
        (7, "too short"),
        (30, other + " tail"),
        (31, other + " tail"),
        (8, " ".join(f"a{i}" for i in range(30))),
        (9, " ".join(f"b{i}" for i in range(30))),
    ]
    df = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = (
        corpus.prepare_training_set(ds, pack_budget=150, concurrency=None)
        .to_pandas()
        .set_index("doc_id")
        .sort_values("shuffle_pos")
    )
    assert set(out.index) == {30, 8, 9}  # kept: dup-rep 30, clean 8, 9
    assert sorted(out["shuffle_pos"]) == [0, 1, 2]
    # shuffle order matches md5 rank over the kept set
    exp = _expected_rank([30, 8, 9])
    for i in out.index:
        assert out.loc[i, "shuffle_pos"] == exp[i]
    # pack ids: prefix chars in shuffle order // budget, non-decreasing
    chars = df.set_index("doc_id")["n_chars"]
    prefix = 0
    for i in out.index:  # already sorted by shuffle_pos
        assert out.loc[i, "pack_id"] == prefix // 150
        prefix += chars[i]


def test_prepare_training_set_empty_corpus(ray_session):
    ds = _docs_ds([(7, "too short")])  # nothing survives the gate
    ds = ds.map_batches(
        lambda df: df.assign(n_chars=df["text"].str.len()), batch_format="pandas"
    )
    out = corpus.prepare_training_set(ds, concurrency=None).to_pandas()
    assert len(out) == 0


def test_rare_bigram_scores_hand_case(ray_session):
    # "a b" dominates; with k=1 only "a b" is in-vocab
    ds = _docs_ds(
        [
            (1, "a b a b a b"),   # bigrams: ab,ba,ab,ba,ab -> 3 in-vocab, 2 rare
            (2, "z z"),           # 1 bigram, rare
            (3, "solo"),          # none
        ]
    )
    out = (
        corpus.rare_bigram_scores(ds, k=1)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "n_bigrams"] == 5 and out.loc[1, "n_rare"] == 2
    assert out.loc[2, "n_bigrams"] == 1 and out.loc[2, "n_rare"] == 1
    assert out.loc[3, "n_bigrams"] == 0 and out.loc[3, "n_rare"] == 0


def test_unigram_surprisal_hand_case(ray_session):
    # corpus: a x3, b x1, c x1 -> N=5; surprisal a=5//3=1, b=c=5
    ds = _docs_ds([(1, "a a b"), (2, "a c"), (3, "")])
    out = (
        corpus.unigram_surprisal_scores(ds)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "n_tokens"] == 3
    assert out.loc[1, "surprisal_sum"] == 1 + 1 + 5
    assert out.loc[1, "surprisal_avg_x1e6"] == (1_000_000 * 7) // 3
    assert out.loc[2, "surprisal_sum"] == 1 + 5
    assert out.loc[2, "surprisal_avg_x1e6"] == 3_000_000
    assert (out.loc[3] == 0).all()  # blank doc: zeros, not NaN


def test_unigram_surprisal_cap_clips(ray_session):
    # cap=2 clips b/c (raw 5) down to 2; a stays at 1
    ds = _docs_ds([(1, "a a b"), (2, "a c")])
    out = (
        corpus.unigram_surprisal_scores(ds, cap=2)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "surprisal_sum"] == 1 + 1 + 2
    assert out.loc[2, "surprisal_sum"] == 1 + 2


def test_mixture_sample_quotas_and_caps(ray_session):
    # availability: a=4 docs, b=2, c=3 (c not in mixture)
    df = pd.DataFrame(
        {"doc_id": np.arange(9, dtype=np.int64),
         "source": ["a"] * 4 + ["b"] * 2 + ["c"] * 3}
    )
    ds = rd.from_pandas(df)
    # parts a:3 b:1 (sum 4), total 8 -> quota a = 8*3//4 = 6 -> capped 4;
    # quota b = 8*1//4 = 2
    out = corpus.mixture_sample(ds, {"a": 3, "b": 1}, total=8).to_pandas()
    got = out.groupby("source").size().to_dict()
    assert got == {"a": 4, "b": 2}
    assert "c" not in set(out["source"])
    # within-source selection = smallest md5(str(id)), rank contiguous
    a = out[out["source"] == "a"].sort_values("rk")
    expect = sorted(range(4), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert a["doc_id"].tolist() == expect
    assert a["rk"].tolist() == [1, 2, 3, 4]


def test_mixture_sample_subsampling_quota(ray_session):
    # plenty available: quotas bind, not availability
    df = pd.DataFrame(
        {"doc_id": np.arange(100, dtype=np.int64),
         "source": ["a"] * 50 + ["b"] * 50}
    )
    out = corpus.mixture_sample(
        rd.from_pandas(df), {"a": 2, "b": 1}, total=30
    ).to_pandas()
    got = out.groupby("source").size().to_dict()
    assert got == {"a": 20, "b": 10}


def test_train_split_fences_and_totals(ray_session):
    # membership is a pure function of the key: recompute expected
    # folds with the same md5-first-byte fences and compare aggregates
    n = 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": ["s" + str(i % 3) for i in range(n)],
            "n_chars": np.arange(n, dtype=np.int64) * 7 + 1,
        }
    )
    got = corpus.train_split(rd.from_pandas(df)).to_pandas()
    b = df["doc_id"].map(lambda k: hashlib.md5(str(k).encode()).hexdigest()[:2])
    exp_split = np.where(b < "cc", "train", np.where(b < "e6", "val", "test"))
    exp = (
        df.assign(split=exp_split)
        .groupby(["source", "split"])
        .agg(n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        .reset_index()
    )
    m = got.sort_values(["source", "split"]).reset_index(drop=True)
    e = exp.sort_values(["source", "split"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        m[["source", "split", "n_docs", "sum_chars"]],
        e.astype({"n_docs": np.int64, "sum_chars": np.int64}),
    )
    # the fences actually produce a ~80/10/10 split on 200 uniform keys
    frac = m.groupby("split")["n_docs"].sum() / n
    assert 0.6 < frac["train"] < 0.95 and frac["val"] < 0.25 and frac["test"] < 0.25


def test_cap_docs_per_source_binds_and_is_deterministic(ray_session):
    """Sources above the cap keep exactly k smallest-md5 docs; sources
    below keep all; two runs agree (hash order, not arrival order)."""
    import hashlib

    df = pd.DataFrame(
        {
            "doc_id": np.arange(30, dtype=np.int64),
            "source": ["big"] * 25 + ["small"] * 5,
        }
    )
    import ray.data as rd

    out1 = corpus.cap_docs_per_source(
        rd.from_pandas(df).repartition(4), k=10, num_buckets=4
    ).to_pandas()
    out2 = corpus.cap_docs_per_source(
        rd.from_pandas(df.sample(frac=1.0, random_state=1)), k=10, num_buckets=4
    ).to_pandas()
    for out in (out1, out2):
        counts = out.groupby("source").size()
        assert counts["big"] == 10 and counts["small"] == 5
    a = out1.sort_values(["source", "rk"], ignore_index=True)
    b = out2.sort_values(["source", "rk"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    # kept "big" ids are the 10 smallest by md5(str(id))
    big = df[df.source == "big"]["doc_id"]
    want = set(sorted(big, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:10])
    assert set(out1[out1.source == "big"]["doc_id"]) == want


def test_bpe_learn_hand_computed(ray_session):
    """Hand-traced BPE merges: corpus = 'low low lower', so pass 1
    word counts are {low: 2, lower: 1}.  Round 1 pairs: (l,o)=3,
    (o,w)=3, (w,e)=1, (e,r)=1 -> tie at 3 broken lexicographically to
    (l,o).  Round 2: (lo,w)=3 wins.  Round 3: (low,e)=1 vs (e,r)=1 ->
    (e,r).  Round 4: (low,er)=1."""
    ds = rd.from_pandas(
        pd.DataFrame({"text": ["low low", "lower"]})
    ).repartition(2)
    out = corpus.bpe_learn(ds, n_merges=4)
    got = list(out.itertuples(index=False, name=None))
    assert got == [
        (1, "l", "o", 3),
        (2, "lo", "w", 3),
        (3, "e", "r", 1),
        (4, "low", "er", 1),
    ]


def test_bpe_learn_identical_run_semantics(ray_session):
    """The documented non-overlapping left-to-right replace on an
    identical-symbol run: 'aaa' -> pairs (a,a)=2 choose (a,a); replace
    ' a a '->' aa ' consumes the separator, leaving 'aa a' -> next
    round pair (aa,a)."""
    ds = rd.from_pandas(pd.DataFrame({"text": ["aaa"]}))
    out = corpus.bpe_learn(ds, n_merges=2)
    got = list(out.itertuples(index=False, name=None))
    assert got == [(1, "a", "a", 2), (2, "aa", "a", 1)]


def test_bpe_learn_empty(ray_session):
    out = corpus.bpe_learn(
        rd.from_pandas(pd.DataFrame({"text": pd.Series(dtype=object)}))
    )
    assert len(out) == 0
    assert list(out.columns) == ["merge_rank", "left_sym", "right_sym", "freq"]


def test_bpe_segment_hand_computed(ray_session):
    """Corpus 'low low / lower': the 4 merges are (l,o), (lo,w),
    (e,r), (low,er), so low -> 'low' (1 subtoken) and lower ->
    'lower' (1).  Doc 0 (two words) -> 2 subtokens; doc 1 -> 1.
    Whitespace-only doc -> zeros."""
    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.int64([0, 1, 2]), "text": ["low low", "lower", "  "]}
        )
    ).repartition(2)
    out = corpus.bpe_segment(ds, n_merges=4).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    assert out["n_words"].tolist() == [2, 1, 0]
    assert out["n_bpe_tokens"].tolist() == [2, 1, 0]
