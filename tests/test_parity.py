"""End-to-end parity: Ray Data engine vs the reference-semantics oracle,
scored with ports of the reference's own metrics (f1.py, *_metrics.py).
The north-rule gate is P/R >= 0.95; the deterministic scorers should give
exactly 1.0."""

import pyarrow as pa
import pytest

import ray.data as rd

from dygiepp_ray import oracle
from dygiepp_ray.functions import metrics as M
from dygiepp_ray.pipelines.kg import KGPipeline
from dygiepp_ray.semantics import DEFAULT_CONFIG, ExtractionConfig
from dygiepp_ray.synth import make_transcripts

N_CONVS = 40
SEED = 7


@pytest.fixture(scope="module")
def corpus():
    return make_transcripts(N_CONVS, seed=SEED)


@pytest.fixture(scope="module")
def oracle_docs(corpus):
    return oracle.extract_all(corpus.to_pylist())


@pytest.fixture(scope="module")
def engine(ray_session, corpus):
    pipe = KGPipeline(rd.from_arrow(corpus), num_buckets=8)
    return pipe, pipe.predicted.to_pandas()


def _ora_mentions(docs):
    return [
        (d.doc_key, a, b, lab)
        for d in docs for sent in d.ner for (a, b, lab, _r, _s) in sent
    ]


def _eng_mentions(pdf):
    return [
        (r["doc_key"], m["start"], m["end"], m["label"])
        for _, r in pdf.iterrows() for m in r["ner"]
    ]


def test_ner_parity(engine, oracle_docs):
    _, pdf = engine
    c = M.ner_counts(_eng_mentions(pdf), _ora_mentions(oracle_docs))
    p, r, f1 = c.prf()
    assert c.gold > 100
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert (p, r) == (1.0, 1.0)


def test_relation_parity(engine, oracle_docs):
    _, pdf = engine
    pred = [
        (r["doc_key"], m["s1"], m["e1"], m["s2"], m["e2"], m["label"])
        for _, r in pdf.iterrows() for m in r["relations"]
    ]
    gold = [
        (d.doc_key, s1, e1, s2, e2, lab)
        for d in oracle_docs for sent in d.relations
        for (s1, e1, s2, e2, lab, _r, _s) in sent
    ]
    c = M.relation_counts(pred, gold)
    p, r, _ = c.prf()
    assert c.gold > 50
    assert (p, r) == (1.0, 1.0)


def test_trigger_and_argument_parity(engine, oracle_docs):
    _, pdf = engine
    pred_t = [
        (r["doc_key"], m["tok"], m["label"])
        for _, r in pdf.iterrows() for m in r["triggers"]
    ]
    gold_t = [
        (d.doc_key, ev["trigger"][0], ev["trigger"][1])
        for d in oracle_docs for sent in d.events for ev in sent
    ]
    ct = M.trigger_counts(pred_t, gold_t)
    assert ct.gold > 50 and ct.prf()[:2] == (1.0, 1.0)

    # argument match keys on (span, event_type, role) ignoring the trigger
    # offset (event_metrics.py:58-89)
    pred_a = [
        (r["doc_key"], m["start"], m["end"], m["event_type"], m["role"])
        for _, r in pdf.iterrows() for m in r["event_args"]
    ]
    gold_a = [
        (d.doc_key, a, b, ev["trigger"][1], role)
        for d in oracle_docs for sent in d.events for ev in sent
        for (a, b, role) in ev["args"]
    ]
    ca = M.argument_counts(pred_a, gold_a)
    assert ca.gold > 50 and ca.prf()[:2] == (1.0, 1.0)


def test_coref_cluster_parity(engine, oracle_docs):
    _, pdf = engine
    eng = {}
    for _, r in pdf.iterrows():
        cl = {}
        for m in r["cluster_members"]:
            cl.setdefault(m["cluster_ix"], set()).add((m["start"], m["end"]))
        eng[r["doc_key"]] = frozenset(frozenset(v) for v in cl.values())
    ora = {
        d.doc_key: frozenset(frozenset(c) for c in d.clusters) for d in oracle_docs
    }
    assert set(eng) == set(ora)
    assert all(eng[k] == ora[k] for k in ora)


def test_coref_prop_fixed_point_and_parity(engine, corpus, oracle_docs):
    """Gated coref propagation (reference coref.py:114-157): the loop
    must run and CONVERGE under the deterministic exact-surface scorer
    — emitted representations are the input surfaces for any iteration
    count — and clusters must be unchanged vs coref_prop=0, matching
    the engine's vectorized path."""
    from dygiepp_ray import semantics as S

    # convergence of the propagation operator itself
    surfs = ["spark", "table", "spark", "row", "table", "spark"]
    for iters in (0, 1, 2, 5):
        assert S.coref_propagate(surfs, max_antecedents=100, iterations=iters) == surfs
    # window-limited propagation also converges
    assert S.coref_propagate(surfs, max_antecedents=2, iterations=3) == surfs

    # cluster parity: oracle WITH propagation == oracle without ==
    # engine vectorized path
    cfg = ExtractionConfig(coref_prop=2)
    ora_prop = oracle.extract_all(corpus.to_pylist(), cfg)
    ora = {
        d.doc_key: frozenset(frozenset(c) for c in d.clusters) for d in oracle_docs
    }
    prop = {
        d.doc_key: frozenset(frozenset(c) for c in d.clusters) for d in ora_prop
    }
    assert prop == ora
    _, pdf = engine
    eng = {}
    for _, r in pdf.iterrows():
        cl = {}
        for m in r["cluster_members"]:
            cl.setdefault(m["cluster_ix"], set()).add((m["start"], m["end"]))
        eng[r["doc_key"]] = frozenset(frozenset(v) for v in cl.values())
    assert all(eng[k] == prop[k] for k in prop)


def test_triple_parity(engine, oracle_docs):
    pipe, _ = engine
    etr = pipe.triples().to_pandas()
    pred = list(zip(etr.conv_id, etr.subj, etr.pred, etr.obj))
    gold = [(c, s, p, o) for (c, _si, s, p, _oi, o) in oracle.triples_from_docs(oracle_docs)]
    c = M.triple_counts(pred, gold)
    p, r, _ = c.prf()
    assert c.gold > 100
    assert (p, r) == (1.0, 1.0)
    # entity ids are content-addressed — spot check
    import hashlib
    row = etr.iloc[0]
    assert row.subj_id == hashlib.md5(row.subj.encode()).hexdigest()


def test_scores_rounded_to_4_decimals(engine):
    # format_float parity (document.py:10-11)
    _, pdf = engine
    m = pdf.iloc[0]["ner"]
    if len(m):
        assert round(float(m[0]["softmax"]), 4) == pytest.approx(float(m[0]["softmax"]), abs=1e-4)


def test_reference_mode_topk_pruning(ray_session, corpus, oracle_docs):
    """Top-k pruning config (entity_beam=False) routes through the
    reference-control-flow path and must match the oracle under the same
    config."""
    cfg = ExtractionConfig(entity_beam=False)
    pipe = KGPipeline(rd.from_arrow(corpus), cfg=cfg, num_buckets=4)
    pdf = pipe.predicted.to_pandas()
    ora = oracle.extract_all(corpus.to_pylist(), cfg)
    c = M.ner_counts(_eng_mentions(pdf), _ora_mentions(ora))
    assert c.prf()[:2] == (1.0, 1.0)
    # top-k pruning must be a (possibly strict) restriction of beam mode
    beam_rels = sum(len(s) for d in oracle_docs for s in d.relations)
    topk_rels = sum(len(s) for d in ora for s in d.relations)
    assert topk_rels <= beam_rels


def test_entities_aggregate(engine, oracle_docs):
    pipe, _ = engine
    ents = pipe.entities(num_salts=4).to_pandas()
    # oracle-side surface counts
    from collections import Counter

    cnt = Counter()
    docs_per = {}
    for d in oracle_docs:
        flat = [t for s in d.sentences for t in s]
        for sent in d.ner:
            for (a, b, lab, _r, _s) in sent:
                surf = " ".join(flat[a : b + 1]).lower()
                cnt[surf] += 1
                docs_per.setdefault(surf, set()).add(d.doc_key)
    got = dict(zip(ents.surface, ents.n_mentions))
    assert got == dict(cnt)
    got_docs = dict(zip(ents.surface, ents.n_docs))
    assert got_docs == {s: len(v) for s, v in docs_per.items()}


def test_parity_larger_corpus(ray_session):
    """Wider parity sweep: 150 conversations (~2.2k turns) with hot keys,
    splits, single-token turns — every annotation layer must match the
    exhaustive oracle exactly."""
    corpus = make_transcripts(150, seed=99)
    pipe = KGPipeline(rd.from_arrow(corpus), num_buckets=8)
    pdf = pipe.predicted.to_pandas()
    ora = oracle.extract_all(corpus.to_pylist())
    c = M.ner_counts(_eng_mentions(pdf), _ora_mentions(ora))
    assert c.gold > 3000 and c.prf()[:2] == (1.0, 1.0)
    pred_r = [
        (r["doc_key"], m["s1"], m["e1"], m["s2"], m["e2"], m["label"])
        for _, r in pdf.iterrows() for m in r["relations"]
    ]
    gold_r = [
        (d.doc_key, s1, e1, s2, e2, lab)
        for d in ora for sent in d.relations
        for (s1, e1, s2, e2, lab, _x, _y) in sent
    ]
    cr = M.relation_counts(pred_r, gold_r)
    assert cr.gold > 1000 and cr.prf()[:2] == (1.0, 1.0)
    # triples through the shuffle-free conv-local dedup path
    etr = pipe.triples().to_pandas()
    gold_t = [
        (c_, s, p, o)
        for (c_, _si, s, p, _oi, o) in oracle.triples_from_docs(ora)
    ]
    ct = M.triple_counts(list(zip(etr.conv_id, etr.subj, etr.pred, etr.obj)), gold_t)
    assert ct.gold > 800 and ct.prf()[:2] == (1.0, 1.0)


def test_reference_mode_end_to_end_triples(ray_session, corpus):
    """Top-k pruning config through the whole pipeline (including
    triples): engine's reference-control-flow path vs the oracle under
    the same config."""
    cfg = ExtractionConfig(entity_beam=False)
    pipe = KGPipeline(rd.from_arrow(corpus), cfg=cfg, num_buckets=4)
    etr = pipe.triples().to_pandas()
    ora = oracle.extract_all(corpus.to_pylist(), cfg)
    gold_t = [
        (c_, s, p, o)
        for (c_, _si, s, p, _oi, o) in oracle.triples_from_docs(ora)
    ]
    ct = M.triple_counts(list(zip(etr.conv_id, etr.subj, etr.pred, etr.obj)), gold_t)
    assert ct.gold > 50 and ct.prf()[:2] == (1.0, 1.0)
