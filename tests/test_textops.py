"""Training-data operators: dedup (exact / minhash-LSH / simhash),
similarity search, quality/langid/fingerprints, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dygiepp_ray.textops import ann, dedup, multimodal, quality


@pytest.fixture()
def dup_docs(ray_session):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy dog again and once"
    other = "completely different content about spark and tables here now"
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [base, base, near, other, other, "unique snowflake text"],
        }
    )
    return rd.from_pandas(df), df


def test_exact_dedup(dup_docs):
    ds, df = dup_docs
    out = dedup.exact_dedup(ds).to_pandas()
    assert len(out) == 4  # base, near, other, unique
    by_hash = out.set_index("text_hash")
    import hashlib

    h = hashlib.md5(df.text[0].encode()).hexdigest()
    assert by_hash.loc[h, "rep_id"] == 0 and by_hash.loc[h, "n_dups"] == 2


def test_minhash_lsh_finds_near_dups(dup_docs):
    ds, df = dup_docs
    sigs = dedup.minhash_signatures(ds)
    pairs = dedup.lsh_candidate_pairs(sigs, num_buckets=4)
    verified = dedup.ngram_jaccard_verify(pairs, ds, threshold=0.5).to_pandas()
    got = set(map(tuple, verified[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in got or (1, 0) in got          # exact dup pair
    assert any({a, b} == {3, 4} for a, b in got)   # identical pair
    near = [j for (a, b), j in zip(got, verified["jaccard"]) if {a, b} == {0, 1}]
    assert all(verified.loc[(verified.id_a == 0) & (verified.id_b == 1), "jaccard"] == 1.0)


def test_prefix_near_dups_exact_recall(ray_session):
    """Prefix-filter join must equal the brute-force all-pairs join —
    including a pair sitting EXACTLY on the threshold boundary
    (J(0,1)=1/2: shingles {abc,bcd,cde} vs {abc,bcd,cdf})."""
    texts = [
        "a b c d e",                          # 0
        "a b c d f",                          # 1  J(0,1) = 2/4 exactly
        "a b c d e",                          # 2  exact dup of 0
        "x y",                                # 3  short (<k tokens)
        "",                                   # 4  empty
        "p q r s t u v w",                    # 5
        "p q r s t u v w",                    # 6  dup of 5
        "completely different words here ok",  # 7
    ]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    out = dedup.prefix_near_dups(
        rd.from_pandas(df), threshold_num=1, threshold_den=2, num_buckets=4
    ).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))

    sets = {
        i: set(dedup._shingle_hashes(t.split(), 3).tolist())
        for i, t in enumerate(texts)
    }
    exp = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            u = sets[i] | sets[j]
            if u and 2 * len(sets[i] & sets[j]) >= len(u):
                exp.add((i, j))
    assert got == exp
    assert (0, 1) in got  # boundary pair must be recalled (inclusive >=)
    assert int(out.set_index(["id_a", "id_b"]).loc[(0, 1), "jac_pct"]) == 50
    assert int(out.set_index(["id_a", "id_b"]).loc[(0, 2), "jac_pct"]) == 100


def test_prefix_filter_pairs_superset_of_truth(ray_session):
    """Candidate generation alone (before verify) must contain every
    qualifying pair — the full-recall guarantee the LSH paths lack."""
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(40)]
    texts += [texts[0], texts[1] + " extra"]  # planted dup + near-dup
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    cand = dedup.prefix_filter_pairs(
        rd.from_pandas(df), threshold_num=1, threshold_den=2, num_buckets=4
    ).to_pandas()
    got = set(map(tuple, cand[["id_a", "id_b"]].to_numpy()))
    sets = {
        i: set(dedup._shingle_hashes(t.split(), 3).tolist())
        for i, t in enumerate(texts)
    }
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            u = sets[i] | sets[j]
            if u and len(sets[i] & sets[j]) / len(u) >= 0.5:
                assert (i, j) in got, (i, j)


def test_prefix_length_integer_ceiling():
    """The prefix cut must use the exact integer ceiling: float
    np.ceil(t*n) overshoots for many rational thresholds (e.g.
    t=9/11, n=77: float gives 64, exact is 63), which would shorten
    the prefix by one and silently break full recall."""
    num, den, n = 9, 11, 77
    exact = (num * n + den - 1) // den
    assert exact == 63
    assert int(np.ceil((num / den) * n)) == 64  # the float trap
    # plen convention: n - ceil(t*n) + 1
    assert n - exact + 1 == 15


def test_minhash_jaccard_estimate_quality(ray_session):
    # signature agreement rate approximates true jaccard
    m = dedup.MinHasher(n_perm=128, shingle_k=3)
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10".split()
    b = "w1 w2 w3 w4 w5 w6 w7 w8 xx yy".split()
    sa, sb = m.signature(a), m.signature(b)
    est = (sa == sb).mean()
    ha = set(dedup._shingle_hashes(a, 3).tolist())
    hb = set(dedup._shingle_hashes(b, 3).tolist())
    true = len(ha & hb) / len(ha | hb)
    assert abs(est - true) < 0.25


def test_connected_components(ray_session):
    edges = rd.from_pandas(
        pd.DataFrame({"id_a": [1, 2, 10, 11], "id_b": [2, 3, 11, 12]})
    )
    out = dedup.connected_components(edges, num_buckets=2).to_pandas()
    comp = dict(zip(out["node"], out["component"]))
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == comp[12] == 10


def test_connected_components_random_graph_vs_union_find(ray_session):
    # property check: distributed min-label propagation == plain union-find
    rs = np.random.RandomState(7)
    edges = rs.randint(0, 80, size=(120, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    df = pd.DataFrame({"id_a": edges[:, 0], "id_b": edges[:, 1]})
    out = dedup.connected_components(rd.from_pandas(df), num_buckets=4).to_pandas()
    got = dict(zip(out["node"], out["component"]))

    parent = list(range(80))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        assert got[a] == got[b]
    expect = {}
    for n in set(edges.ravel().tolist()):
        expect.setdefault(find(n), set()).add(n)
    got_groups = {}
    for n, c in got.items():
        got_groups.setdefault(c, set()).add(n)
    assert set(map(frozenset, expect.values())) == set(map(frozenset, got_groups.values()))


def test_simhash_near_dups(dup_docs):
    ds, df = dup_docs
    sigs = dedup.simhash_signatures(ds)
    pairs = dedup.simhash_near_dups(sigs, max_hamming=10, num_buckets=4).to_pandas()
    got = {frozenset((a, b)) for a, b in pairs[["id_a", "id_b"]].to_numpy()}
    assert frozenset((0, 1)) in got   # identical docs: hamming 0
    assert frozenset((3, 4)) in got


def test_simhash_deterministic():
    t = "spark join table".split()
    assert dedup.SimHasher.simhash(t) == dedup.SimHasher.simhash(list(t))
    assert dedup.SimHasher.simhash(t) != dedup.SimHasher.simhash(["other"])


def test_ann_brute_force_matches_numpy(ray_session):
    rs = np.random.RandomState(0)
    vecs = rs.normal(size=(50, 8))
    df = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64), "embedding": list(vecs)})
    ds = rd.from_pandas(df)
    out = ann.brute_force_topk(ds, [0, 1], k=3)
    # oracle: full cosine matrix
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = n @ n.T
    for qid in (0, 1):
        order = np.argsort(-sims[qid])
        expect = [i for i in order if i != qid][:3]
        got = out[out.query_id == qid].sort_values("rank")["vec_id"].tolist()
        assert got == expect


def test_ann_brute_force_tied_scores_break_by_vec_id(ray_session):
    # k+2 identical vectors tie at the k-th boundary: the per-batch
    # selection must keep the LOWEST vec_ids (sim DESC, vec_id ASC),
    # not an arbitrary argpartition subset (reader review r3)
    base = np.array([1.0, 0.0, 0.0, 0.0])
    vecs = np.tile(base, (8, 1))  # all cosine 1.0 with each other
    df = pd.DataFrame(
        {"vec_id": np.arange(8, dtype=np.int64), "embedding": list(vecs)}
    )
    out = ann.brute_force_topk(rd.from_pandas(df), [7], k=3)
    got = out[out.query_id == 7].sort_values("rank")["vec_id"].tolist()
    assert got == [0, 1, 2]


def test_ann_lsh_recall(ray_session):
    rs = np.random.RandomState(1)
    vecs = rs.normal(size=(200, 16))
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64), "embedding": list(vecs)})
    ds = rd.from_pandas(df)
    exact = ann.brute_force_topk(ds, [0, 1, 2], k=5)
    approx = ann.lsh_topk(ds, [0, 1, 2], k=5, n_planes=4)
    # approximate: just demand non-trivial recall and valid shape
    e = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    a = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    assert len(a) > 0
    assert len(e & a) / len(e) >= 0.2


def test_quality_scores(ray_session):
    df = pd.DataFrame({"doc_id": [0], "text": ["the cat and the hat"]})
    out = quality.quality_scores(rd.from_pandas(df)).to_pandas().iloc[0]
    assert out.n_tokens == 5
    assert out.n_stopwords == 3  # the, and, the
    assert out.n_distinct == 4
    assert out.mean_token_len_x100 == (3 + 3 + 3 + 3 + 3) * 100 // 5


def test_lang_id_heuristic(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["the quick brown fox is in the garden there", "这是一个中文句子测试"],
        }
    )
    out = quality.lang_id(rd.from_pandas(df)).to_pandas()
    langs = dict(zip(out.doc_id, out.lang_pred))
    assert langs[1] == "zh"
    assert langs[0] in ("en", "de", "fr", "es")  # latin profile fired


def test_fingerprint_order_sensitive(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "c b a"]})
    out = quality.fingerprints(rd.from_pandas(df)).to_pandas()
    assert out.fingerprint[0] != out.fingerprint[1]


def test_multimodal_plumbing(ray_session):
    media = rd.from_arrow(multimodal.synth_media(32))
    feats = multimodal.decode_features(media).to_pandas()
    assert len(feats) == 32
    assert all(len(f) == multimodal.FEATURE_DIM for f in feats["features"])
    # deterministic: same payload -> same features
    f2 = multimodal.decode_features(rd.from_arrow(multimodal.synth_media(32))).to_pandas()
    a = feats.sort_values("media_id")["features"].map(tuple).tolist()
    b = f2.sort_values("media_id")["features"].map(tuple).tolist()
    assert a == b


def test_multimodal_frame_sample(ray_session):
    media = rd.from_arrow(multimodal.synth_media(32))
    frames = multimodal.frame_sample(media, every_ms=2000).to_pandas()
    videos = multimodal.synth_media(32).to_pandas()
    vids = videos[videos.kind == "video"]
    expect = int(sum(-(-int(d) // 2000) if d > 0 else 0 for d in vids.duration_ms))
    assert len(frames) == expect


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError):
        multimodal.RealDecoder()


def test_bpe_token_counter_punctuation(ray_session):
    df = pd.DataFrame(
        {"doc_id": [0], "text": ["the cat's hat isn't 42 big-deal!!"]}
    )
    out = quality.bpe_token_counts(rd.from_pandas(df)).to_pandas()
    import re

    expect = len(re.findall(quality.BPE_PATTERN, df.text[0]))
    assert out.n_bpe_tokens[0] == expect == 11


def test_bucketed_jaccard_matches_broadcast(dup_docs):
    """The default (bucketed-exchange) verify must equal the explicit
    broadcast opt-in bit for bit."""
    ds, df = dup_docs
    sigs = dedup.minhash_signatures(ds)
    pairs = dedup.lsh_candidate_pairs(sigs, num_buckets=4)
    a = dedup.ngram_jaccard_verify_broadcast(pairs, ds, threshold=0.5).to_pandas()
    sigs2 = dedup.minhash_signatures(ds)
    pairs2 = dedup.lsh_candidate_pairs(sigs2, num_buckets=4)
    b = dedup.ngram_jaccard_verify(pairs2, ds, threshold=0.5).to_pandas()
    ka = {(r.id_a, r.id_b): round(r.jaccard, 9) for r in a.itertuples()}
    kb = {(r.id_a, r.id_b): round(r.jaccard, 9) for r in b.itertuples()}
    assert ka == kb


def test_ivf_exhaustive_probe_equals_brute_force(ray_session):
    """nprobe == nlist scans every inverted list -> provably exact."""
    rs = np.random.RandomState(21)
    vecs = rs.normal(size=(300, 24))
    df = pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64), "embedding": list(vecs)})
    qids = [0, 5, 17, 123]
    bf = ann.brute_force_topk(rd.from_pandas(df), qids, k=5)
    ivf = ann.ivf_topk(rd.from_pandas(df), qids, k=5, nlist=6, nprobe=6, iters=3)
    pd.testing.assert_frame_equal(
        bf.sort_values(["query_id", "rank"], ignore_index=True),
        ivf.sort_values(["query_id", "rank"], ignore_index=True),
    )


def test_ivf_partial_probe_recall(ray_session):
    """nprobe < nlist is approximate; recall vs brute force stays high
    (clustered corpus, queries probe their own clusters first)."""
    rs = np.random.RandomState(8)
    centers = rs.normal(scale=5.0, size=(4, 16))
    vecs = np.concatenate([c + rs.normal(size=(80, 16)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": list(vecs)})
    qids = [0, 80, 160, 240]
    bf = ann.brute_force_topk(rd.from_pandas(df), qids, k=5)
    ivf = ann.ivf_topk(rd.from_pandas(df), qids, k=5, nlist=8, nprobe=3, iters=4)
    bf_set = set(zip(bf["query_id"], bf["vec_id"]))
    ivf_set = set(zip(ivf["query_id"], ivf["vec_id"]))
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.8


def test_kmeans_centroids_deterministic(ray_session):
    rs = np.random.RandomState(4)
    vecs = rs.normal(size=(100, 8))
    df = pd.DataFrame({"vec_id": np.arange(100, dtype=np.int64), "embedding": list(vecs)})
    c1 = ann.kmeans_centroids(rd.from_pandas(df), k=5, iters=3)
    c2 = ann.kmeans_centroids(rd.from_pandas(df), k=5, iters=3)
    assert np.array_equal(c1, c2)
    assert c1.shape == (5, 8)


def test_content_flags(ray_session):
    df = pd.DataFrame(
        {"doc_id": np.arange(3, dtype=np.int64),
         "text": ["clean text here", "evil drop table users", "has lorem ipsum filler"]}
    )
    out = quality.content_flags(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert list(out["flagged"]) == [0, 1, 1]


def test_curate_composite(ray_session):
    """Curation composite: quality gate x exact dedup x near dedup —
    planted cases hit every branch."""
    from dygiepp_ray.textops.curation import curate

    long_a = " ".join(f"w{i}" for i in range(40))          # diverse, long
    near_a = " ".join(f"w{i}" for i in range(39)) + " zz"  # near-dup of long_a
    rows = [
        (0, long_a),                 # kept: representative of the near-dup pair
        (1, near_a),                 # dropped: near-dup, not component min
        (2, long_a),                 # wait: exact dup of 0? no — same text as 0
        (3, "short text"),           # dropped: quality (too short)
        (4, " ".join(["rep"] * 50)), # dropped: diversity (1 distinct / 50)
        (5, " ".join(f"v{i}" for i in range(30))),  # kept: clean
    ]
    df = pd.DataFrame({"doc_id": np.array([r[0] for r in rows], dtype=np.int64),
                       "text": [r[1] for r in rows]})
    out = curate(rd.from_pandas(df), num_buckets=4).to_pandas().set_index("doc_id")
    assert out.loc[0, "kept"] == 1
    assert out.loc[1, "kept"] == 0 and out.loc[1, "near_rep"] == 0
    # doc 2 is an exact duplicate of doc 0 -> not the exact representative
    assert out.loc[2, "exact_rep"] == 0 and out.loc[2, "kept"] == 0
    assert out.loc[3, "kept"] == 0 and out.loc[3, "quality_ok"] == 0
    assert out.loc[4, "quality_ok"] == 0
    assert out.loc[5, "kept"] == 1
    assert len(out) == 6


def test_pack_sequences_contiguous(ray_session):
    from dygiepp_ray.relational import pack_training_sequences
    out = pack_training_sequences("/root/testdata/sf0.001").to_pandas()
    out = out.sort_values(["source", "doc_id"], ignore_index=True)
    # pack ids are nondecreasing within each source and start at 0
    for _, g in out.groupby("source"):
        p = g["pack_id"].to_numpy()
        assert p[0] == 0
        assert (np.diff(p) >= 0).all()


# ---------------------------------------------------------------------------
# LSH bucket cap: planted mega-buckets must yield bounded pair streams
# ---------------------------------------------------------------------------


def _mega_expect(n: int, cap: int) -> int:
    # all-pairs among cap smallest + one star edge per overflow member
    return cap * (cap - 1) // 2 + (n - cap)


def test_lsh_mega_bucket_bounded(ray_session):
    """10k-identical-doc boilerplate bucket: O(cap^2 + n) pairs, not
    O(n^2); every member stays reachable for components."""
    n, cap = 2000, 64
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["the same boilerplate navigation text everywhere"] * n,
        }
    )
    sigs = dedup.minhash_signatures(rd.from_pandas(df))
    pairs = dedup.lsh_candidate_pairs(
        sigs, num_buckets=4, bucket_cap=cap
    ).to_pandas()
    assert len(pairs) == _mega_expect(n, cap)
    assert len(set(pairs["id_a"]) | set(pairs["id_b"])) == n


def test_simhash_mega_bucket_bounded(ray_session):
    n, cap = 1000, 32
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["identical boilerplate body for simhash"] * n,
        }
    )
    sigs = dedup.simhash_signatures(rd.from_pandas(df))
    pairs = dedup.simhash_near_dups(
        sigs, num_buckets=4, bucket_cap=cap
    ).to_pandas()
    assert len(pairs) == _mega_expect(n, cap)  # hamming 0 keeps every pair
    assert len(set(pairs["id_a"]) | set(pairs["id_b"])) == n


def test_embedding_mega_bucket_bounded(ray_session):
    n, cap = 400, 32
    vec = np.ones(8) / np.sqrt(8)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [vec.copy() for _ in range(n)],
        }
    )
    pairs = ann.embedding_near_dups(
        rd.from_pandas(df), threshold=0.99, bucket_cap=cap
    )
    assert len(pairs) == _mega_expect(n, cap)  # cosine 1.0 keeps every pair
    assert len(set(pairs["id_a"]) | set(pairs["id_b"])) == n


# ---------------------------------------------------------------------------
# chunking + tf-idf (textops/chunks.py)
# ---------------------------------------------------------------------------

def test_chunk_documents_hand_computed(ray_session):
    import pandas as pd
    import ray.data as rd

    from dygiepp_ray.textops.chunks import chunk_documents

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                " ".join(f"t{i}" for i in range(10)),  # 10 toks: 1 chunk
                " ".join(f"t{i}" for i in range(33)),  # 33: chunks at 0,24
                " ".join(f"t{i}" for i in range(80)),  # 80: 0,24,48
                "   ",                                 # blank: none
            ],
        }
    )
    got = chunk_documents(
        rd.from_pandas(docs), window=32, stride=24
    ).to_pandas().sort_values(["doc_id", "chunk_ix"], ignore_index=True)
    want = pd.DataFrame(
        [
            (1, 0, 0, 10),
            (2, 0, 0, 32), (2, 1, 24, 9),
            (3, 0, 0, 32), (3, 1, 24, 32), (3, 2, 48, 32),
        ],
        columns=["doc_id", "chunk_ix", "chunk_start", "chunk_len"],
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_chunks_and_tfidf_match_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from dygiepp_ray.textops.chunks import (
        SQL_CHUNK_DOCUMENTS,
        SQL_TFIDF_TOP_TERMS,
        q_chunk_documents,
        q_tfidf_top_terms,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    for fn, sql in [
        (q_chunk_documents, SQL_CHUNK_DOCUMENTS),
        (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    ]:
        got = fn(sf).to_pandas()
        got = got[sorted(got.columns)].sort_values(
            sorted(got.columns), ignore_index=True
        )
        want = con.execute(sql).fetchdf()
        want = want[sorted(want.columns)].sort_values(
            sorted(want.columns), ignore_index=True
        )
        for c in got.columns:
            if str(got[c].dtype).startswith("int"):
                got[c] = got[c].astype("int64")
                want[c] = want[c].astype("int64")
        assert len(got) > 0
        pd.testing.assert_frame_equal(got, want)


def test_wav_synth_is_real_riff_and_decoder_matches_numpy(ray_session):
    import io
    import wave

    import numpy as np
    import ray.data as rd

    from dygiepp_ray.textops import multimodal as M

    tbl = M.synth_wav(8)
    # payloads are genuine RIFF/WAV containers the stdlib can open
    p0 = tbl["payload"][0].as_py()
    assert p0[:4] == b"RIFF" and p0[8:12] == b"WAVE"
    with wave.open(io.BytesIO(p0), "rb") as w:
        assert w.getframerate() == M.WAV_RATE
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    out = (
        M.wav_features(rd.from_arrow(tbl))
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert out.loc[0, "sample_rate"] == M.WAV_RATE
    assert out.loc[0, "n_samples"] == len(pcm)
    assert out.loc[0, "sum_abs"] == int(np.abs(pcm.astype(np.int64)).sum())
    assert len(out) == 8


def test_ppm_synth_is_real_p6_and_decoder_matches_numpy(ray_session):
    import numpy as np
    import ray.data as rd

    from dygiepp_ray.textops import multimodal as M

    tbl = M.synth_ppm(6)
    p0 = tbl["payload"][0].as_py()
    assert p0.startswith(b"P6\n")
    w, h, px = M._parse_ppm(p0)
    assert px.shape == (w * h, 3)
    out = (
        M.ppm_features(rd.from_arrow(tbl))
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert len(out) == 6
    assert out.loc[0, "width"] == w and out.loc[0, "height"] == h
    sums = px.astype(np.int64).sum(axis=0)
    assert out.loc[0, "sum_r"] == sums[0]
    assert out.loc[0, "sum_g"] == sums[1]
    assert out.loc[0, "sum_b"] == sums[2]


def test_ppm_resize_nearest_matches_reference(ray_session):
    import numpy as np

    from dygiepp_ray.textops import multimodal as M

    tbl = M.synth_ppm(4)
    for payload in tbl["payload"].to_pylist():
        w, h, px = M._parse_ppm(payload)
        for factor in (2, 3):
            small = M.resize_nearest(payload, factor)
            nw, nh, npx = M._parse_ppm(small)
            # reference: explicit index_select on the full image
            img = px.reshape(h, w, 3)
            rows = list(range(0, h, factor))
            cols = list(range(0, w, factor))
            ref = img[np.ix_(rows, cols)].reshape(-1, 3)
            assert (nh, nw) == (len(rows), len(cols))
            assert np.array_equal(npx, ref)


def test_term_search_and_semantics_and_ranking(ray_session):
    """Boolean AND (docs missing any term excluded), rank by total tf,
    ties by doc_id, global top-k across blocks."""
    from dygiepp_ray.textops.chunks import term_search

    df = pd.DataFrame(
        {
            "doc_id": np.int64([1, 2, 3, 4, 5]),
            "text": [
                "join hash scan join",        # tf 4
                "join hash",                  # missing scan -> excluded
                "scan hash join scan scan",   # tf 5
                "join join hash scan",        # tf 4 (tie -> doc 1 first)
                "",
            ],
        }
    )
    out = term_search(
        rd.from_pandas(df).repartition(3), ("join", "hash", "scan"), k=2
    ).to_pandas()
    assert out["doc_id"].tolist() == [3, 1]
    assert out["tf"].tolist() == [5, 4]


def test_redact_terms_counts_and_rewrites(ray_session):
    """Non-overlapping left-to-right replacement; multi-word terms;
    null text tolerated."""
    df = pd.DataFrame(
        {
            "doc_id": np.int64([1, 2, 3]),
            "text": ["a drop table b drop table", "clean text here", None],
        }
    )
    out = quality.redact_terms(
        rd.from_pandas(df), terms=("drop table",), replacement="[X]",
        concurrency=None,
    ).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_redactions"] == 2
    assert out.loc[1, "clean_len"] == len("a [X] b [X]")
    assert out.loc[2, "n_redactions"] == 0
    assert out.loc[3, "n_redactions"] == 0 and out.loc[3, "clean_len"] == 0


def test_incremental_exact_dedup_planted(ray_session):
    """New shard vs already-ingested corpus: re-crawled old content is
    dropped (even via the Bloom-positive exact path), shard-internal
    dups keep only the min id, fresh content passes."""
    old = rd.from_pandas(
        pd.DataFrame({"doc_id": np.int64([0, 2]), "text": ["seen one", "seen two"]})
    )
    new = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.int64([11, 13, 15, 17]),
                "text": ["seen one", "fresh a", "fresh a", "fresh b"],
            }
        )
    )
    out = dedup.incremental_exact_dedup(new, old, num_buckets=4).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [13, 17]


def test_label_centroids_fixed_point_exact(ray_session):
    """Fixed-point component sums equal brute force regardless of
    partitioning; counts per label correct."""
    rng = np.random.RandomState(2)
    vecs = rng.normal(size=(30, 4)).astype(np.float32)
    labels = np.array(["a", "b", "a"] * 10)
    df = pd.DataFrame({"embedding": list(vecs), "label": labels})
    out = ann.label_centroids(
        rd.from_pandas(df).repartition(5), num_buckets=2
    ).to_pandas().set_index(["label", "dim"]).sort_index()
    for lab in ("a", "b"):
        sub = vecs[labels == lab].astype(np.float64)
        want = np.floor(sub * 1_000_000.0).astype(np.int64).sum(axis=0)
        for d in range(4):
            assert out.loc[(lab, d), "sum_x1e6"] == want[d]
            assert out.loc[(lab, d), "n"] == len(sub)


def test_keep_best_per_component_hand_computed(ray_session):
    """Components {0,1,2} (label 0) and {5,6} (label 5); doc 9 is a
    singleton.  Doc 1 has the best score in its cluster; docs 5 and 6
    tie, which breaks to the LOWEST id (5); doc 9 keeps itself."""
    comps = rd.from_pandas(pd.DataFrame(
        {"node": np.int64([0, 1, 2, 5, 6]),
         "component": np.int64([0, 0, 0, 5, 5])}
    )).repartition(2)
    scores = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.int64([0, 1, 2, 5, 6, 9]),
         "n_distinct": np.int64([3, 7, 5, 4, 4, 1])}
    )).repartition(3)
    out = (
        dedup.keep_best_per_component(scores, comps, num_buckets=4)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    assert out["component"].tolist() == [0, 0, 0, 5, 5, 9]
    assert out["kept"].tolist() == [0, 1, 0, 1, 0, 1]


def test_embedding_gram_hand_computed(ray_session):
    """X^T X, column sums and count in fixed point, one merge exchange."""
    import numpy as np
    import pandas as pd

    import ray

    from dygiepp_ray.textops.ann import embedding_gram

    # q = floor(x*1000 + 0.5): rows (1, 2), (3, -4) -> q (1000, 2000),
    # (3000, -4000).  G = [[1e7, -1e7], [-1e7, 2e7]]; sums (4000, -2000)
    emb = ray.data.from_pandas(pd.DataFrame(
        {"embedding": [np.array([1.0, 2.0], np.float32),
                       np.array([3.0, -4.0], np.float32)]}
    ))
    out = embedding_gram(emb).to_pandas().set_index(["i", "j"])["val"]
    assert out.loc[(0, 0)] == 1000 * 1000 + 3000 * 3000
    assert out.loc[(0, 1)] == 1000 * 2000 + 3000 * -4000
    assert out.loc[(1, 1)] == 2000 * 2000 + 4000 * 4000
    assert out.loc[(0, -1)] == 4000
    assert out.loc[(1, -1)] == -2000
    assert out.loc[(-1, -1)] == 2
    assert len(out) == 6
    # covariance numerator derivable from the sufficient statistics
    n = out.loc[(-1, -1)]
    cov01 = n * out.loc[(0, 1)] - out.loc[(0, -1)] * out.loc[(1, -1)]
    q = np.array([[1000, 2000], [3000, -4000]], np.int64)
    expect = len(q) * (q[:, 0] * q[:, 1]).sum() - q[:, 0].sum() * q[:, 1].sum()
    assert cov01 == expect


def test_embedding_gram_int64_fallback_matches_float_path(ray_session):
    """Past the 2^53 dot-product bound the int64 matmul path must give
    the same sums the float path gives on an equivalent smaller input."""
    import numpy as np
    import pandas as pd

    import ray

    from dygiepp_ray.textops.ann import embedding_gram

    n = 16384  # q=1e6 per component -> q^2*n > 2^53: int64 branch
    emb = ray.data.from_pandas(pd.DataFrame(
        {"embedding": [np.array([1000.0, -1000.0], np.float32)] * n}
    ))
    out = embedding_gram(emb).to_pandas().set_index(["i", "j"])["val"]
    q = 1_000_000
    assert out.loc[(0, 0)] == n * q * q
    assert out.loc[(0, 1)] == -n * q * q
    assert out.loc[(0, -1)] == n * q
    assert out.loc[(-1, -1)] == n


def test_phrase_search_hand_computed(ray_session):
    """Adjacency, multiplicity, and boolean-AND-but-not-adjacent
    rejection."""
    import pandas as pd

    import ray

    from dygiepp_ray.textops.chunks import phrase_search

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4],
         "text": ["a b c a b", "b a", "a x b", "  "]}
    )
    out = (
        phrase_search(ray.data.from_pandas(df), ("a", "b"))
        .to_pandas().set_index("doc_id")["n_hits"].to_dict()
    )
    # doc 1: two adjacent occurrences; doc 2 reversed; doc 3 has both
    # tokens but not adjacent; doc 4 blank
    assert out == {1: 2}


def test_compression_ratio_scores_pinned(ray_session):
    """Deterministic zlib fixed-point ratios; repetitive text scores
    far below high-entropy text."""
    import zlib

    import pandas as pd

    import ray

    from dygiepp_ray.textops.quality import compression_ratio_scores

    rep = "spam " * 200
    rnd = "k9#qZ1!vB7@xW3$eR5^tY2&uI8*oP4(aS6)dF0-gH"
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [rep, rnd, ""]})
    out = (
        compression_ratio_scores(ray.data.from_pandas(df))
        .to_pandas().set_index("doc_id")
    )
    for i, t in [(1, rep), (2, rnd)]:
        raw = len(t.encode())
        want = 1_000_000 * len(zlib.compress(t.encode(), 6)) // raw
        assert int(out.loc[i, "ratio_x1e6"]) == want
        assert int(out.loc[i, "raw_len"]) == raw
    assert int(out.loc[3, "ratio_x1e6"]) == 0
    assert out.loc[1, "ratio_x1e6"] < out.loc[2, "ratio_x1e6"] / 5


def test_label_gram_consistent_with_global(ray_session):
    """Per-label gram partials must sum exactly to the global gram."""
    import numpy as np

    import ray

    from dygiepp_ray.textops.ann import embedding_gram, label_gram

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["embedding", "label"],
    )
    per = label_gram(emb).to_pandas()
    summed = per.groupby(["i", "j"], as_index=False)["val"].sum()
    emb2 = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["embedding"]
    )
    glob = embedding_gram(emb2).to_pandas()
    m = summed.merge(glob, on=["i", "j"], suffixes=("_sum", "_glob"))
    assert len(m) == len(glob)
    assert (m["val_sum"].to_numpy() == m["val_glob"].to_numpy()).all()


def test_bmp_parse_hand_computed(ray_session):
    """Hand-built 2x2 24-bpp BMP: stride padding skipped, bottom-up
    flip recovered (top_row_sum = the LAST stored row)."""
    import struct

    import pandas as pd

    import ray

    from dygiepp_ray.textops.multimodal import bmp_features

    w, h = 2, 2
    top = bytes([1, 2, 3, 4, 5, 6])        # logical row 0 (BGR x2)
    bottom = bytes([10, 20, 30, 40, 50, 60])  # logical row 1
    pad = b"\x00\x00"                      # stride 8 = 6 + 2 pad
    body = bottom + pad + top + pad        # bottom-up storage
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    media = ray.data.from_pandas(
        pd.DataFrame({"media_id": [7], "payload": [header + dib + body]})
    )
    r = bmp_features(media).to_pandas().iloc[0]
    assert (int(r["width"]), int(r["height"])) == (2, 2)
    assert int(r["top_row_sum"]) == sum(top)       # flip happened
    assert int(r["sum_b"]) == 1 + 4 + 10 + 40      # pad bytes excluded
    assert int(r["sum_g"]) == 2 + 5 + 20 + 50
    assert int(r["sum_r"]) == 3 + 6 + 30 + 60


def test_png_parse_hand_computed(ray_session):
    """Hand-built 2x2 RGB PNG: row 0 unfiltered, row 1 Paeth-filtered —
    the decoder must reverse the filter against the reconstructed prior
    row for bottom_row_sum to come out right."""
    import struct
    import zlib

    import pandas as pd

    import ray

    from dygiepp_ray.textops.multimodal import _paeth, png_features

    top = [1, 2, 3, 4, 5, 6]       # logical row 0 (RGB x2)
    bottom = [10, 20, 30, 40, 50, 60]  # logical row 1
    filt1 = []
    for k in range(6):
        a = bottom[k - 3] if k >= 3 else 0
        b = top[k]
        c = top[k - 3] if k >= 3 else 0
        filt1.append((bottom[k] - _paeth(a, b, c)) % 256)
    stream = bytes([0] + top) + bytes([4] + filt1)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(stream))
               + chunk(b"IEND", b""))
    media = ray.data.from_pandas(
        pd.DataFrame({"media_id": [3], "payload": [payload]})
    )
    r = png_features(media).to_pandas().iloc[0]
    assert (int(r["width"]), int(r["height"])) == (2, 2)
    assert int(r["bottom_row_sum"]) == sum(bottom)
    assert int(r["sum_r"]) == 1 + 4 + 10 + 40
    assert int(r["sum_g"]) == 2 + 5 + 20 + 50
    assert int(r["sum_b"]) == 3 + 6 + 30 + 60


def test_png_corrupt_crc_rejected(ray_session):
    """A flipped bit in the IDAT body must fail the CRC check."""
    import pytest

    from dygiepp_ray.textops.multimodal import _parse_png, synth_png

    payload = bytearray(synth_png(1)["payload"].to_pylist()[0])
    # IDAT body starts after sig(8) + IHDR chunk(12+13) + len/type(8)
    payload[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(payload))


def test_image_dhash_invariances(ray_session):
    """dHash is a function of brightness GRADIENTS: adding a constant
    to every pixel must not change it; mirroring the image must."""
    import pandas as pd

    import ray

    from dygiepp_ray.textops.multimodal import _dhash64

    rng = np.random.RandomState(7)
    px = rng.randint(0, 200, size=(24 * 16, 3)).astype(np.int64)
    d0 = _dhash64(px, 16, 24)
    d_shift = _dhash64(px + 40, 16, 24)
    assert d0 == d_shift
    mirrored = px.reshape(24, 16, 3)[:, ::-1].reshape(-1, 3)
    assert _dhash64(mirrored, 16, 24) != d0
    # hi/lo split is lossless
    from dygiepp_ray.textops.multimodal import image_dhash, synth_bmp
    out = image_dhash(ray.data.from_arrow(synth_bmp(4))).to_pandas()
    assert ((out["dhash_hi"] >= 0) & (out["dhash_lo"] >= 0)).all()
    assert (out["dhash_lo"] < (1 << 32)).all()


def test_containment_dups_asymmetric(ray_session):
    """A short doc fully quoted inside a long one: containment 100 in
    one direction only, while Jaccard is far below the threshold (the
    case the symmetric joins miss)."""
    import pandas as pd

    import ray

    from dygiepp_ray.textops.dedup import containment_dups

    short = "alpha beta gamma delta epsilon"
    long = (
        "zero one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen " + short + " sixteen "
        "seventeen eighteen nineteen twenty twentyone twentytwo"
    )
    other = "completely different words with no overlap at all here now"
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [short, long, other]}
    ))
    out = containment_dups(docs, threshold_num=4, threshold_den=5,
                           num_buckets=4).to_pandas()
    got = {(int(r.id_a), int(r.id_b)): int(r.cont_pct)
           for r in out.itertuples()}
    assert got == {(1, 2): 100}  # short in long only; never reversed


def test_text_index_save_query_roundtrip(ray_session, tmp_path):
    """A persisted inverted index answers Boolean-AND top-k queries
    bit-identically to the streaming term_search scan — re-tokenizing
    the corpus is not needed once the index artifact exists."""
    import ray

    from dygiepp_ray.textops.chunks import (
        SEARCH_TERMS, save_text_index, term_search, term_search_from_index,
    )

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    fresh = term_search(docs, SEARCH_TERMS, k=10).to_pandas()
    save_text_index(docs, str(tmp_path / "tidx"), num_buckets=4)
    loaded = term_search_from_index(
        str(tmp_path / "tidx"), SEARCH_TERMS, k=10
    ).to_pandas()
    pd.testing.assert_frame_equal(
        fresh.reset_index(drop=True), loaded.reset_index(drop=True)
    )
    assert len(fresh) > 0


def test_text_index_missing_term_empty(ray_session, tmp_path):
    import ray

    from dygiepp_ray.textops.chunks import (
        save_text_index, term_search_from_index,
    )

    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "b c"]})
    )
    save_text_index(docs, str(tmp_path / "tidx"), num_buckets=2)
    out = term_search_from_index(
        str(tmp_path / "tidx"), ("a", "zzz"), k=5
    ).to_pandas()
    assert len(out) == 0  # AND with an unseen term matches nothing


def test_quantize_embeddings_error_bound(ray_session):
    """Dequantized values stay within half a quantization step of the
    originals, and the all-zero vector survives (scale guard)."""
    import ray

    from dygiepp_ray.textops.ann import quantize_embeddings

    vecs = [np.array([1.0, -0.5, 0.25, 0.0]),
            np.array([0.0, 0.0, 0.0, 0.0]),
            np.array([-3.5, 2.0, 0.1, 7.0])]
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": np.arange(3, dtype=np.int64),
                      "embedding": vecs})
    )
    out = quantize_embeddings(ds).to_pandas().sort_values(
        "vec_id", ignore_index=True
    )
    for i, v in enumerate(vecs):
        q = np.frombuffer(out.loc[i, "qvec"], dtype=np.int8)
        deq = q.astype(np.float64) * out.loc[i, "scale"]
        assert np.abs(deq - v).max() <= out.loc[i, "scale"] / 2 + 1e-12
        assert np.abs(q).max() <= 127


def test_quantized_topk_recall_vs_float(ray_session):
    """int8 ranking must recover (nearly) the float top-k on the real
    embeddings table — the 8x storage cut cannot cost real recall."""
    import ray

    from dygiepp_ray.textops.ann import (
        brute_force_topk, quantize_embeddings, quantized_topk,
    )

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    ).materialize()
    qids = [0, 3, 17, 42]
    want = brute_force_topk(emb, qids, k=5)
    got = quantized_topk(quantize_embeddings(emb), qids, k=5)
    assert len(got) == len(want)
    overlap = []
    for qid in qids:
        a = set(want.loc[want["query_id"] == qid, "vec_id"])
        b = set(got.loc[got["query_id"] == qid, "vec_id"])
        overlap.append(len(a & b) / len(a))
    assert np.mean(overlap) >= 0.8, overlap


def test_ivf_index_save_load_roundtrip(ray_session, tmp_path):
    """A persisted IVF index answers queries bit-identically to the
    in-session path at equal (nlist, iters, nprobe) — the index is the
    artifact, retraining is not needed."""
    import ray

    from dygiepp_ray.textops.ann import (
        ivf_topk, ivf_topk_from_index, save_ivf_index,
    )

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    qids = [0, 3, 17]
    fresh = ivf_topk(emb, qids, k=5, nlist=4, nprobe=2, iters=2)
    save_ivf_index(emb, str(tmp_path / "ivf"), nlist=4, iters=2)
    loaded = ivf_topk_from_index(str(tmp_path / "ivf"), qids, k=5, nprobe=2)
    a = fresh.sort_values(["query_id", "rank"], ignore_index=True)
    b = loaded.sort_values(["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_avi_synth_is_real_riff_and_sampler_cross_checks(ray_session):
    import hashlib
    import struct

    import pytest as _pytest
    import ray.data as rd

    from dygiepp_ray.textops import multimodal as M

    tbl = M.synth_avi(4)
    p0 = bytes(tbl["payload"][0].as_py())
    # genuine RIFF/AVI framing, declared size covers the payload
    assert p0[:4] == b"RIFF" and p0[8:12] == b"AVI "
    assert struct.unpack("<I", p0[4:8])[0] == len(p0) - 8
    total, frames = M.AviFrameSampler._parse(p0)
    assert total == len(frames) >= 4
    out = M.avi_frames(rd.from_arrow(tbl), sample_every=2).to_pandas()
    # every 2nd frame of every video, md5 matching a direct parse
    assert (out["frame_idx"] % 2 == 0).all()
    row = out[(out["media_id"] == 0) & (out["frame_idx"] == 2)].iloc[0]
    assert row["content_md5"] == hashlib.md5(frames[2]).hexdigest()
    assert row["size"] == len(frames[2])

    # a corrupted idx1 size must RAISE, not pass frames through
    bad = bytearray(p0)
    i = bad.rfind(b"idx1")
    struct_off = i + 8 + 12  # first entry's size field
    bad[struct_off:struct_off + 4] = struct.pack(
        "<I", struct.unpack("<I", bad[struct_off:struct_off + 4])[0] + 1)
    with _pytest.raises(ValueError, match="idx1"):
        M.AviFrameSampler._parse(bytes(bad))


def test_gif_synth_is_real_gif89a_and_reader_cross_checks(ray_session):
    import hashlib
    import struct

    import pytest as _pytest
    import ray.data as rd

    from dygiepp_ray.textops import multimodal as M

    tbl = M.synth_gif(4)
    p0 = bytes(tbl["payload"][0].as_py())
    # genuine GIF89a framing: header, LSD dims, GCT flag, trailer
    assert p0[:6] == b"GIF89a" and p0[-1] == 0x3B
    w, h, packed, _, _ = struct.unpack("<HHBBB", p0[6:13])
    assert packed & 0x80  # global color table present
    pw, ph, delays, frames = M.GifFrameReader._parse(p0)
    assert (pw, ph) == (w, h) and len(delays) == len(frames) >= 2
    out = M.gif_frames(rd.from_arrow(tbl)).to_pandas()
    row = out[(out["media_id"] == 0) & (out["frame_idx"] == 1)].iloc[0]
    assert row["content_md5"] == hashlib.md5(frames[1]).hexdigest()
    assert row["size"] == len(frames[1])
    assert row["delay_cs"] == delays[1]
    assert (out.groupby("media_id")["total_frames"].first()
            == out.groupby("media_id").size()).all()

    # an image descriptor whose dims disagree with the screen must RAISE
    bad = bytearray(p0)
    i = bad.find(b"\x2C", 13)
    bad[i + 5:i + 7] = struct.pack("<H", w + 1)
    with _pytest.raises(ValueError, match="dims"):
        M.GifFrameReader._parse(bytes(bad))

    # truncating the trailer must RAISE, not emit a partial animation
    with _pytest.raises(ValueError):
        M.GifFrameReader._parse(p0[:-1])


def test_edit1_neighbors_indel_substitution_and_false_candidates(ray_session):
    import ray.data as rd

    from dygiepp_ray.textops import dedup as D

    names = ["cat", "cut", "cats", "dog", "dg", "ab", "ba"]
    out = D.edit1_neighbors(
        rd.from_items([{"name": n} for n in names]), "name", num_buckets=4
    ).to_pandas()
    pairs = set(map(tuple, out[["name_a", "name_b"]].to_numpy()))
    assert ("cat", "cut") in pairs    # substitution
    assert ("cat", "cats") in pairs   # insertion at the end
    assert ("dg", "dog") in pairs     # deletion in the middle
    # "ab"/"ba" share the deletion variant "b" but are at distance 2:
    # the verify stage must kill the false candidate
    assert ("ab", "ba") not in pairs
    assert all(a < b for a, b in pairs)


def test_jpeg_synth_is_real_jfif_and_reader_cross_checks(ray_session):
    import hashlib
    import struct

    import pytest as _pytest
    import ray.data as rd

    from dygiepp_ray.textops import multimodal as M

    tbl = M.synth_jpeg(4)
    p0 = bytes(tbl["payload"][0].as_py())
    assert p0[:2] == b"\xff\xd8" and p0[-2:] == b"\xff\xd9"
    w, h, ns, ent = M.JpegHeaderReader._parse(p0)
    # dims live in SOF0 and nowhere else: find the marker and cross-read
    i = p0.find(b"\xff\xc0")
    ph, pw = struct.unpack(">HH", p0[i + 5:i + 9])
    assert (w, h) == (pw, ph) and ns == 6
    out = M.jpeg_dims(rd.from_arrow(tbl)).to_pandas()
    row = out[out["media_id"] == 0].iloc[0]
    assert row["entropy_md5"] == hashlib.md5(ent).hexdigest()
    assert row["entropy_len"] == len(ent)

    # truncating EOI must RAISE (stream without terminator)
    with _pytest.raises(ValueError):
        M.JpegHeaderReader._parse(p0[:-2])
    # appending trailing garbage after EOI must RAISE too
    with _pytest.raises(ValueError, match="trailing"):
        M.JpegHeaderReader._parse(p0 + b"xx")


def test_mp3_synth_is_real_mpeg_and_reader_cross_checks(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from dygiepp_ray.textops import multimodal as M

    tbl = M.synth_mp3(4)
    p0 = bytes(tbl["payload"][0].as_py())
    # every frame starts on a real 11-bit sync + MPEG1 Layer III bits
    assert p0[0] == 0xFF and p0[1] == 0xFB
    nf, tb, sr, sbr, dur, md = M.Mp3FrameReader._parse(p0)
    assert tb == len(p0) and sr in M.MP3_SAMPLERATES and nf >= 3
    # recompute the first frame's length from ITS header and check the
    # next sync lands exactly there
    bidx, sridx, pad = p0[2] >> 4, (p0[2] >> 2) & 3, (p0[2] >> 1) & 1
    flen = (144 * M.MP3_BITRATES[bidx] * 1000) // M.MP3_SAMPLERATES[sridx] + pad
    assert p0[flen] == 0xFF and p0[flen + 1] == 0xFB

    out = M.mp3_frames(rd.from_arrow(tbl)).to_pandas()
    row = out[out["media_id"] == 0].iloc[0]
    assert int(row["n_frames"]) == nf and row["body_md5"] == md

    # truncating the last frame must RAISE (overrun check)
    with _pytest.raises(ValueError, match="overruns|truncated"):
        M.Mp3FrameReader._parse(p0[:-3])
    # corrupting a header's sync byte must RAISE (no silent resync)
    bad = bytearray(p0)
    bad[flen] = 0x00
    with _pytest.raises(ValueError, match="sync"):
        M.Mp3FrameReader._parse(bytes(bad))
