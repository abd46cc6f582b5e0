"""ACE APF XML + SGM reader (SURVEY.md S9, corpus-faithful).

Replicates the reference's ACE parser semantics
(``scripts/data/ace-event/parse_ace_event.py``) over the real APF DTD
element names, without its corpus-specific one-off doc_key patches:

* SGM text = raw file with ``<...>`` tags stripped (DOTALL regex —
  ``parse_ace_event.py:391-393``); char offsets index the stripped text.
* ``<charseq START END>`` extents, END **inclusive**
  (``parse_ace_event.py:437-439``).
* entity mentions use the ``<head>`` extent and the parent entity's
  TYPE as label (``parse_ace_event.py:430-439``); mention TYPE ``PRO``
  is flagged pronoun flavor (``:448``).  ``<value>`` mentions collapse
  to label ``VALUE`` and ``<timex2>`` to ``TIMEX2``, both via
  ``<extent>`` (``:456-501``).
* extents not on token boundaries SNAP OUTWARD to the containing
  tokens (``_get_chars``, ``parse_ace_event.py:405-419`` — unlike the
  brat reader, which drops); snaps are counted.
* event label = ``TYPE.SUBTYPE``; a multi-token ``<anchor>`` skips the
  whole event mention (``MultiTokenTrigerException``,
  ``parse_ace_event.py:410-414,524-527``); arguments resolve via
  ``REFID`` to mention heads (``:533-556``).
* relation label = ``TYPE.SUBTYPE``; kept only with both ``Arg-1`` and
  ``Arg-2`` roles resolved (``:565-612``).
* an ``<entity>`` whose mentions survive >= 2 becomes a coref cluster
  (``entity_mention_clusters``, ``parse_ace_event.py:444``).

Output rows share the brat/xmlstandoff gold-doc shape (flat tokens,
doc-level token offsets) plus ``dropped_*`` / ``snapped`` counter
columns for the A8 aggregate.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

import ray.data

_TAG_RE = re.compile(r"<.*?>", re.DOTALL)
_WS_TOKEN = re.compile(r"\S+")


def strip_sgm(sgm_text: str) -> str:
    """Raw .sgm -> annotation text (tags stripped, offsets preserved
    relative to the stripped string)."""
    return _TAG_RE.sub("", sgm_text)


def _tok_spans(text: str):
    tokens, starts, ends = [], [], []
    for m in _WS_TOKEN.finditer(text):
        tokens.append(m.group())
        starts.append(m.start())
        ends.append(m.end())
    return tokens, np.asarray(starts, np.int64), np.asarray(ends, np.int64)


def _snap(starts: np.ndarray, ends: np.ndarray, s_char: int, e_char_incl: int):
    """Char extent -> inclusive token span, snapping outward to the
    containing tokens; returns (tok_s, tok_e, snapped) or None when the
    extent lies wholly outside the text."""
    if len(starts) == 0 or e_char_incl < s_char:
        return None
    i = int(np.searchsorted(starts, s_char, side="right")) - 1
    if i < 0:
        i = 0
    elif ends[i] <= s_char:  # starts in inter-token whitespace
        i += 1
        if i >= len(starts):
            return None
    j = int(np.searchsorted(starts, e_char_incl, side="right")) - 1
    if j < 0 or i > j:  # extent sits wholly in inter-token whitespace
        return None
    snapped = not (starts[i] == s_char and ends[j] == e_char_incl + 1)
    return i, j, snapped


def parse_apf_doc(doc_key: str, apf_xml: str, sgm_text: str) -> dict:
    """One (apf.xml, sgm) pair -> gold doc row."""
    text = strip_sgm(sgm_text)
    tokens, starts, ends = _tok_spans(text)
    root = ET.fromstring(apf_xml)
    doc = root if root.tag == "document" else root.find(".//document")
    if doc is None:
        raise ValueError(f"no <document> element in APF for {doc_key!r}")
    doc_key = doc.get("DOCID") or doc_key

    dropped = {"entities": 0, "relations": 0, "events": 0, "corefs": 0}
    snapped = 0
    # mention id -> (tok_s, tok_e, label)
    lookup: dict[str, tuple[int, int, str]] = {}
    cluster_members: dict[str, list[tuple[int, int]]] = {}

    def charseq_of(el, field):
        holder = el.find(field)
        cs = holder.find("charseq") if holder is not None else None
        if cs is None:
            return None
        return int(cs.get("START")), int(cs.get("END"))

    def add_mention(mid, el, field, label):
        nonlocal snapped
        ext = charseq_of(el, field)
        hit = _snap(starts, ends, *ext) if ext is not None else None
        if hit is None:
            dropped["entities"] += 1
            return
        i, j, sn = hit
        snapped += int(sn)
        lookup[mid] = (i, j, label)

    for entity in doc.findall("entity"):
        eid, label = entity.get("ID"), entity.get("TYPE")
        for em in entity.findall("entity_mention"):
            # heads-only convention: "Others have only looked at the
            # head" (parse_ace_event.py:436); fall back to extent.
            field = "head" if em.find("head") is not None else "extent"
            add_mention(em.get("ID"), em, field, label)
            if em.get("ID") in lookup:
                cluster_members.setdefault(eid, []).append(lookup[em.get("ID")][:2])
    for value in doc.findall("value"):
        for vm in value.findall("value_mention"):
            add_mention(vm.get("ID"), vm, "extent", "VALUE")
    for timex in doc.findall("timex2"):
        for tm in timex.findall("timex2_mention"):
            add_mention(tm.get("ID"), tm, "extent", "TIMEX2")

    relations = []
    for rel in doc.findall("relation"):
        label = f"{rel.get('TYPE')}.{rel.get('SUBTYPE')}"
        for rm in rel.findall("relation_mention"):
            args = {}
            for ra in rm.findall("relation_mention_argument"):
                args[ra.get("ROLE")] = ra.get("REFID")
            a1, a2 = args.get("Arg-1"), args.get("Arg-2")
            if a1 in lookup and a2 in lookup:
                s1, e1, _ = lookup[a1]
                s2, e2, _ = lookup[a2]
                relations.append((s1, e1, s2, e2, label))
            else:
                dropped["relations"] += 1

    events = []
    event_cluster_members: dict[str, list[int]] = {}
    for ev in doc.findall("event"):
        label = f"{ev.get('TYPE')}.{ev.get('SUBTYPE')}"
        for em in ev.findall("event_mention"):
            ext = charseq_of(em, "anchor")
            hit = _snap(starts, ends, *ext) if ext is not None else None
            if hit is None or hit[0] != hit[1]:
                # multi-token trigger skips the event mention
                dropped["events"] += 1
                continue
            args, ok = [], True
            for ea in em.findall("event_mention_argument"):
                ref = ea.get("REFID")
                if ref not in lookup:
                    ok = False
                    break
                s, e, _ = lookup[ref]
                args.append((s, e, ea.get("ROLE")))
            if not ok:
                dropped["events"] += 1
                continue
            events.append(
                {
                    "trigger_tok": hit[0],
                    "event_type": label,
                    "args": [
                        {"start": s, "end": e, "role": r}
                        for (s, e, r) in sorted(args)
                    ],
                }
            )
            event_cluster_members.setdefault(ev.get("ID"), []).append(hit[0])

    clusters = [
        sorted(set(members))
        for eid, members in sorted(cluster_members.items())
        if len(set(members)) >= 2
    ]
    ner = sorted(set(lookup.values()))
    return {
        "doc_key": doc_key,
        "tokens": tokens,
        "ner": [{"start": s, "end": e, "label": lab} for (s, e, lab) in ner],
        "relations": [
            {"s1": s1, "e1": e1, "s2": s2, "e2": e2, "label": lab}
            for (s1, e1, s2, e2, lab) in sorted(set(relations))
        ],
        "events": events,
        "clusters": [
            [{"start": s, "end": e} for (s, e) in members] for members in clusters
        ],
        # ACE event coref: an <event> whose mentions survive >= 2 is an
        # event cluster of its trigger tokens (event_mention_clusters,
        # parse_ace_event.py:562; `event_clusters` field of the
        # reference Document, document.py:95-104)
        "event_clusters": [
            [{"start": t, "end": t} for t in sorted(set(members))]
            for _eid, members in sorted(event_cluster_members.items())
            if len(set(members)) >= 2
        ],
        "snapped": snapped,
        **{f"dropped_{k}": v for k, v in dropped.items()},
    }


def parse_apf_batch(df: pd.DataFrame) -> pd.DataFrame:
    rows = [
        parse_apf_doc(k, a, s)
        for k, a, s in zip(df["doc_key"], df["apf"], df["sgm"])
    ]
    return pd.DataFrame(rows)


def read_apf(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """pairs: (doc_key, apf, sgm) rows -> parsed gold docs (same row
    shape as ``read_brat`` plus a ``snapped`` counter)."""
    return pairs.map_batches(parse_apf_batch, batch_format="pandas")
