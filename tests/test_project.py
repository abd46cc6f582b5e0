"""Prediction projection + pipe API (M15/T9): spacy-interface analogue,
round-tripped through the reference wire format."""

import glob
import json

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from dygiepp_ray.semantics import ENTITY_LEXICON, PRED_WORDS
from dygiepp_ray.sources.jsonl import check_fields, write_reference_jsonl
from dygiepp_ray.stages.project import KGPipe, project_predictions


def test_kgpipe_one_doc_reference_schema():
    pipe = KGPipe(dataset_name="synth")
    ent = next(iter(ENTITY_LEXICON))          # single- or multi-token surface
    one_tok = [s for s in ENTITY_LEXICON if " " not in s][:2]
    pred_word = PRED_WORDS[0]
    sents = [
        [one_tok[0], pred_word, one_tok[1], "trailing"],
        ["plain", "words", "only"],
    ]
    out = pipe(sents, doc_key="docA")
    check_fields(out)                          # reference allowlist passes
    assert out["doc_key"] == "docA"
    assert out["sentences"] == sents
    # wire shapes: predicted ner rows are 5-wide, relations 7-wide
    for sent in out["predicted_ner"]:
        for m in sent:
            assert len(m) == 5 and isinstance(m[3], float)
    for sent in out["predicted_relations"]:
        for r in sent:
            assert len(r) == 7
    for sent in out["predicted_events"]:
        for ev in sent:
            assert len(ev[0]) == 4             # trigger [tok, type, raw, softmax]
            for a in ev[1:]:
                assert len(a) == 5             # arg [s, e, role, raw, softmax]
    # the relation found: subj/obj around the predicate word
    flat_rels = [r for sent in out["predicted_relations"] for r in sent]
    assert any(r[4] == pred_word for r in flat_rels)
    # projection decorations present and _-prefixed (allowlist-safe)
    assert all(len(e) == 3 for e in out["_ents"])
    # ents are non-overlapping
    spans = sorted((e[0], e[1]) for e in out["_ents"])
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2


def test_kgpipe_stateless_repeatable():
    pipe = KGPipe()
    sents = [["alice", "likes", "bob"]]
    assert pipe(sents) == pipe(sents)


def test_project_predictions_dataset(ray_session):
    from dygiepp_ray.pipelines.kg import from_documents_table

    pipe = from_documents_table("/root/testdata/sf0.001")
    projected = project_predictions(pipe.predicted).to_pandas()
    assert {"ents", "rels_proj", "events_proj"} <= set(projected.columns)
    # every projected ent set is overlap-free and a subset of raw mentions
    for _, row in projected.head(50).iterrows():
        raw = {(m["start"], m["end"]) for m in (row["ner"] if row["ner"] is not None else [])}
        spans = sorted((e["start"], e["end"]) for e in row["ents"])
        assert set(spans) <= raw
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2
    # rels_proj mirrors the relations column
    n_rels = sum(len(r) if r is not None else 0 for r in projected["relations"])
    n_proj = sum(len(r) if r is not None else 0 for r in projected["rels_proj"])
    assert n_rels == n_proj


def test_jsonl_roundtrip_reference_validation(ray_session, tmp_path):
    """write_reference_jsonl output passes the reference's own field
    validation and wire shapes (VERDICT r1 #5 round-trip requirement)."""
    from dygiepp_ray.pipelines.kg import from_documents_table

    pipe = from_documents_table("/root/testdata/sf0.001")
    out = str(tmp_path / "preds")
    n = write_reference_jsonl(pipe.predicted, out)
    assert n > 0
    n_docs = 0
    for f in glob.glob(out + "/*.jsonl"):
        for line in open(f):
            doc = json.loads(line)
            check_fields(doc)
            n_docs += 1
            assert len(doc["predicted_ner"]) == len(doc["sentences"])
            for sent in doc["predicted_ner"]:
                for m in sent:
                    assert len(m) == 5
            for sent in doc["predicted_events"]:
                for ev in sent:
                    assert len(ev[0]) == 4
                    for a in ev[1:]:
                        assert len(a) == 5
    assert n_docs == n
