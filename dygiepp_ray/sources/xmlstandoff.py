"""Generic apf-like XML standoff reader (SURVEY.md S9/S10 pattern).

The reference's ACE/GENIA pipelines parse corpus-specific standoff XML
(``scripts/data/ace-event/parse_ace_event.py:823-844`` walks
entity/relation/event mentions with ``<charseq START END>`` character
extents; entities carry multiple mentions, which become coref
clusters).  Those parsers are corpus-specific; this module implements
the generic shape of that source family — char-extent standoff XML over
a raw text body — sharing the brat reader's char->token alignment and
drop-counter semantics (``sources/brat.py``, M12/A8):

.. code-block:: xml

    <document doc_key="d1">
      <text>raw source text</text>
      <entity id="ent1" type="PER">
        <mention id="m1" start="0" end="5"/>       <!-- end exclusive -->
      </entity>
      <relation type="works_at" arg1="m1" arg2="m2"/>
      <event type="attack">
        <anchor start="10" end="16"/>
        <argument role="AGENT" mention="m1"/>
      </event>
    </document>

* mentions whose char extent does not land on token boundaries are
  DROPPED and counted (the reference warns and drops misaligned ACE
  extents the same way the brat path does, ``annotated_doc.py:201-273``)
* entities with >= 2 surviving mentions become coref clusters (ACE
  entity -> cluster semantics)
* relations/events referencing dropped mentions are dropped and counted

A root element may hold many ``<document>`` elements; ``read_standoff_xml``
is a ``map_batches`` over ``(doc_key, xml)`` rows, one parse per
document string, emitting the same gold-doc row shape as ``read_brat``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd

import ray.data

from .brat import _token_char_spans


def parse_standoff_xml(xml_text: str, default_doc_key: str = "") -> list[dict]:
    """One XML string -> list of gold doc dicts (one per <document>)."""
    root = ET.fromstring(xml_text)
    docs = [root] if root.tag == "document" else list(root.iter("document"))
    out = []
    for doc in docs:
        doc_key = doc.get("doc_key") or doc.get("DOCID") or default_doc_key
        text_el = doc.find("text")
        text = text_el.text or "" if text_el is not None else ""
        tokens, starts, ends = _token_char_spans(text)
        dropped = {"entities": 0, "relations": 0, "events": 0, "corefs": 0}
        mentions: dict[str, tuple[int, int, str]] = {}
        clusters = []
        for ent in doc.iter("entity"):
            label = ent.get("type", "")
            members = []
            for m in ent.iter("mention"):
                s, e = int(m.get("start")), int(m.get("end"))
                if s in starts and e in ends:
                    span = (starts[s], ends[e], label)
                    mentions[m.get("id")] = span
                    members.append(span[:2])
                else:
                    dropped["entities"] += 1  # char->token misalignment (M12)
            if len(members) >= 2:
                clusters.append(members)
        relations = []
        for rel in doc.iter("relation"):
            try:
                s1, e1, _ = mentions[rel.get("arg1")]
                s2, e2, _ = mentions[rel.get("arg2")]
                relations.append((s1, e1, s2, e2, rel.get("type", "")))
            except KeyError:
                dropped["relations"] += 1
        events = []
        for ev in doc.iter("event"):
            anchor = ev.find("anchor")
            try:
                a_s, a_e = int(anchor.get("start")), int(anchor.get("end"))
                trig_tok = starts[a_s]
                if a_e not in ends:
                    raise KeyError(a_e)
                args = []
                for arg in ev.iter("argument"):
                    s, e, _ = mentions[arg.get("mention")]
                    args.append((s, e, arg.get("role", "")))
                events.append(
                    {"trigger_tok": trig_tok, "event_type": ev.get("type", ""),
                     "args": args}
                )
            except (KeyError, AttributeError, TypeError):
                dropped["events"] += 1
        ner = sorted(mentions.values())
        out.append(
            {
                "doc_key": doc_key,
                "tokens": tokens,
                "ner": [{"start": s, "end": e, "label": lab} for (s, e, lab) in ner],
                "relations": [
                    {"s1": s1, "e1": e1, "s2": s2, "e2": e2, "label": lab}
                    for (s1, e1, s2, e2, lab) in sorted(relations)
                ],
                "events": [
                    {
                        "trigger_tok": ev["trigger_tok"],
                        "event_type": ev["event_type"],
                        "args": [
                            {"start": s, "end": e, "role": r}
                            for (s, e, r) in ev["args"]
                        ],
                    }
                    for ev in events
                ],
                "clusters": [
                    [{"start": s, "end": e} for (s, e) in members]
                    for members in clusters
                ],
                **{f"dropped_{k}": v for k, v in dropped.items()},
            }
        )
    return out


def parse_standoff_batch(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for k, x in zip(df["doc_key"], df["xml"]):
        rows.extend(parse_standoff_xml(x, default_doc_key=k))
    return pd.DataFrame(rows)


def read_standoff_xml(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """pairs: (doc_key, xml) rows -> parsed gold docs (same row shape and
    drop counters as ``read_brat``; aggregate with ``brat.drop_counters``)."""
    return pairs.map_batches(parse_standoff_batch, batch_format="pandas")
