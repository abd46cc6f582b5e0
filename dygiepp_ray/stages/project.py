"""Prediction projection + pipe-style API (SURVEY.md M15 / T9).

The reference's downstream-embedding surface is
``dygie/spacy_interface/spacy_interface.py``: ``prepare_spacy_doc``
(:20-105) decorates a spacy Doc with ``doc.ents`` (overlaps merged to
the longest span, :69-105), ``doc._.rels`` (per-sentence entity-pair
tuples, :44-54) and ``doc._.events`` (per-trigger ARG0 x ARG1 products
with a conservative min confidence, :23-40); ``DygieppPipe``
(:108-149) wraps model loading + one-doc inference as a pipe
component.

There is no spacy in this environment, so the projection targets plain
columns / dicts with the same content:

* ``project_predictions`` — Dataset operator: predicted doc rows gain
  ``ents`` (non-overlapping, longest-wins), ``rels_proj`` and
  ``events_proj`` columns.
* ``KGPipe`` — construct once (stage state built like the reference's
  ``load_archive``), call per tokenized document; returns the
  reference-wire prediction dict (``doc_row_to_reference_json``)
  decorated with the projection fields.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..semantics import DEFAULT_CONFIG, ExtractionConfig
from .extract import ExtractStage
from .postprocess import merge_overlaps_one_sentence

ENT_T = pa.struct(
    [("start", pa.int32()), ("end", pa.int32()), ("label", pa.string())]
)
REL_T = pa.struct(
    [
        ("sent_ix", pa.int32()),
        ("s1", pa.int32()), ("e1", pa.int32()),
        ("s2", pa.int32()), ("e2", pa.int32()),
        ("label", pa.string()), ("conf", pa.float32()),
    ]
)
EVENT_T = pa.struct(
    [
        ("sent_ix", pa.int32()),
        ("trig_tok", pa.int32()), ("event_type", pa.string()),
        ("agent_start", pa.int32()), ("agent_end", pa.int32()),
        ("patient_start", pa.int32()), ("patient_end", pa.int32()),
        ("conf", pa.float32()),
    ]
)


def _project_row(row: dict) -> tuple[list, list, list]:
    """(ents, rels, events) projection of one predicted doc row.

    ents: longest-wins overlap merge over the doc's mentions (doc-level
    offsets never overlap across sentences, so the per-sentence merge
    equals the reference's whole-doc pass, spacy_interface.py:69-105).
    events: AGENT x PATIENT products per trigger with
    conf = min(trigger, agent, patient softmax) — the reference's
    conservative-minimum confidence (spacy_interface.py:30-37).
    """
    ner = row.get("ner") or []
    spans = [(m["start"], m["end"]) for m in ner]
    kept = merge_overlaps_one_sentence(spans)
    ents = [
        {"start": ner[i]["start"], "end": ner[i]["end"], "label": ner[i]["label"]}
        for i in kept
    ]
    rels = [
        {
            "sent_ix": r["sent_ix"],
            "s1": r["s1"], "e1": r["e1"], "s2": r["s2"], "e2": r["e2"],
            "label": r["label"], "conf": r["softmax"],
        }
        for r in (row.get("relations") or [])
    ]
    events = []
    args_by_trig: dict[tuple, dict[str, list]] = {}
    for a in row.get("event_args") or []:
        key = (a["sent_ix"], a["trig_tok"])
        args_by_trig.setdefault(key, {}).setdefault(a["role"], []).append(a)
    for t in row.get("triggers") or []:
        by_role = args_by_trig.get((t["sent_ix"], t["tok"]), {})
        for agent in by_role.get("AGENT", []):
            for patient in by_role.get("PATIENT", []):
                events.append(
                    {
                        "sent_ix": t["sent_ix"],
                        "trig_tok": t["tok"],
                        "event_type": t["label"],
                        "agent_start": agent["start"], "agent_end": agent["end"],
                        "patient_start": patient["start"],
                        "patient_end": patient["end"],
                        "conf": min(
                            t["softmax"], agent["softmax"], patient["softmax"]
                        ),
                    }
                )
    return ents, rels, events


def project_predictions(predicted: ray.data.Dataset) -> ray.data.Dataset:
    """Predicted doc rows -> rows + ``ents`` / ``rels_proj`` /
    ``events_proj`` projection columns (the Dataset form of
    ``prepare_spacy_doc``)."""

    def fn(tbl: pa.Table) -> pa.Table:
        ents_col, rels_col, evs_col = [], [], []
        for row in tbl.to_pylist():
            ents, rels, events = _project_row(row)
            ents_col.append(ents)
            rels_col.append(rels)
            evs_col.append(events)
        out = tbl.append_column("ents", pa.array(ents_col, pa.list_(ENT_T)))
        out = out.append_column("rels_proj", pa.array(rels_col, pa.list_(REL_T)))
        out = out.append_column("events_proj", pa.array(evs_col, pa.list_(EVENT_T)))
        return out

    return predicted.map_batches(fn, batch_format="pyarrow")


class KGPipe:
    """One-doc-at-a-time pipe component (T9 / ``DygieppPipe`` analogue).

    Construction builds the extraction stage once (the reference loads
    the model archive once per pipe, spacy_interface.py:128-141); each
    call runs the full joint extraction on one pre-tokenized document
    in-process — no Ray session required — and returns the
    reference-wire prediction dict plus projection fields.
    """

    def __init__(
        self,
        cfg: ExtractionConfig = DEFAULT_CONFIG,
        dataset_name: str | None = None,
    ):
        if dataset_name is not None:
            from dataclasses import replace

            cfg = replace(cfg, dataset=dataset_name)
        self.cfg = cfg
        self.stage = ExtractStage(cfg)

    def __call__(
        self, sentences: list[list[str]], doc_key: str = "test"
    ) -> dict:
        from ..sources.jsonl import doc_row_to_reference_json

        starts, off = [], 0
        for s in sentences:
            starts.append(off)
            off += len(s)
        tbl = pa.table(
            {
                "doc_key": pa.array([doc_key], pa.string()),
                "dataset": pa.array([self.cfg.dataset], pa.string()),
                "sentences": pa.array([sentences], pa.list_(pa.list_(pa.string()))),
                "sentence_start": pa.array([starts], pa.list_(pa.int32())),
            }
        )
        row = self.stage(tbl).to_pylist()[0]
        pred = doc_row_to_reference_json(row)
        ents, rels, events = _project_row(row)
        # projection decorations ride as `_`-metadata so the dict stays
        # valid under the reference's field allowlist (document.py:160-173;
        # the reference keeps these on spacy extensions, outside the JSON)
        pred["_ents"] = [[e["start"], e["end"], e["label"]] for e in ents]
        pred["_rels"] = [
            [r["s1"], r["e1"], r["s2"], r["e2"], r["label"], round(r["conf"], 4)]
            for r in rels
        ]
        pred["_events_proj"] = [
            [
                ev["trig_tok"], ev["event_type"],
                ev["agent_start"], ev["agent_end"],
                ev["patient_start"], ev["patient_end"], round(ev["conf"], 4),
            ]
            for ev in events
        ]
        return pred
