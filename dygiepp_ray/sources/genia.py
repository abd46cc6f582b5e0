"""GENIA inline-XML reader (SURVEY.md S10, corpus-faithful).

Parses the GENIA term-annotation XML shape — ``<sentence>`` elements
whose character data is interleaved with nested ``<cons sem=.. lex=..>``
term markup — into the engine's gold-doc rows, following the
reference's SUTD conversion semantics
(``scripts/data/genia/genia_xml_to_inline_sutd.py``):

* sentence text = the concatenated character data with markup removed;
  every ``cons`` contributes the char span its content occupies
  (``Sentence.get_annotations``, ``genia_xml_to_inline_sutd.py:216``).
* nested ``cons`` all emit (GENIA NER is nested).
* coordinated / discontiguous terms — ``sem`` of the form
  ``(AND G#a G#b)`` — distribute the coordinated labels over the
  direct sub-``cons`` when the counts line up (the simple case of
  ``genia_xml_to_inline_sutd.py:237-260``); anything needing the
  reference's lex-pattern back-off search (``find_spans``,
  ``:313-365``) is dropped and counted instead.
* char spans that do not land exactly on token boundaries are dropped
  and counted (brat-style M12 alignment; the SUTD tokenizer realigns,
  we require exact alignment like ``sources/brat.py``).
* article ``doc_key`` comes from ``<bibliomisc>`` (MEDLINE id) when
  present, mirroring ``convert_to_json.py``'s article keys.

Output rows share the brat gold-doc shape: flat doc-level tokens
(sentences joined), ner spans with inclusive token offsets, plus
``sentence_start`` offsets so the assembly stage can re-window.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd

import ray.data

from .brat import _token_char_spans

_AND_SEM = re.compile(r"^\((?:AND|OR|BUT_NOT|AS_WELL_AS|NOT_ONLY_BUT_ALSO|"
                      r"AND_OR|OR_BUT_NOT|NEITHER_NOR|TO|VERSUS)\s+(.*)\)$")


def _walk(el, buf: list[str], all_spans: list) -> list:
    """Depth-first over mixed content; buf accumulates character data,
    all_spans collects every cons as (char_start, char_end_excl, sem,
    direct_children).  Returns the cons that are DIRECT constituents of
    ``el`` (transparent non-cons wrappers like ``<w>`` pass through) —
    coordination must distribute labels over direct children only, not
    all descendants (genia_xml_to_inline_sutd.py:216 walks
    ``find_all('cons', recursive=False)``)."""
    direct = []
    if el.text:
        buf.append(el.text)
    for child in el:
        if child.tag == "cons":
            start = sum(len(s) for s in buf)
            sub = _walk(child, buf, all_spans)
            end = sum(len(s) for s in buf)
            # record even sem-less cons: coordination constituents
            # usually carry only lex (genia_xml_to_inline_sutd.py:246-256)
            tup = (start, end, child.get("sem"), sub)
            all_spans.append(tup)
            direct.append(tup)
        else:  # e.g. <w> POS wrappers: transparent
            direct.extend(_walk(child, buf, all_spans))
        if child.tail:
            buf.append(child.tail)
    return direct


def _resolve_coordination(spans: list, dropped: dict) -> list:
    """Expand ``(AND a b)`` sems over direct sub-cons; plain sems pass
    through; unresolvable coordination is dropped + counted."""
    out = []
    for start, end, sem, sub in spans:
        if sem is None:  # bare constituent of a coordination, not a term
            continue
        m = _AND_SEM.match(sem)
        if not m:
            out.append((start, end, sem))
            continue
        labels = m.group(1).split()
        direct = [s for s in sub if s[2] is None or not _AND_SEM.match(s[2])]
        if len(labels) == len(direct):
            for (ss, se, _sem2, _), lab in zip(direct, labels):
                out.append((ss, se, lab))
        else:
            dropped["entities"] += 1
    return out


def parse_genia_article(xml_text: str, default_doc_key: str = "") -> dict:
    """One GENIA article XML string -> gold doc row."""
    root = ET.fromstring(xml_text)
    biblio = root.find(".//bibliomisc")
    doc_key = (biblio.text.strip() if biblio is not None and biblio.text
               else default_doc_key)

    dropped = {"entities": 0, "relations": 0, "events": 0, "corefs": 0}
    all_tokens: list[str] = []
    sentence_start: list[int] = []
    ner = []
    for sent in root.iter("sentence"):
        buf: list[str] = []
        spans: list = []
        _walk(sent, buf, spans)
        text = "".join(buf)
        tokens, starts, ends = _token_char_spans(text)
        offset = len(all_tokens)
        sentence_start.append(offset)
        for s_char, e_char, sem in _resolve_coordination(spans, dropped):
            if s_char in starts and e_char in ends:
                ner.append(
                    (offset + starts[s_char], offset + ends[e_char], sem)
                )
            else:
                dropped["entities"] += 1
        all_tokens.extend(tokens)

    return {
        "doc_key": doc_key,
        "tokens": all_tokens,
        "sentence_start": sentence_start,
        "ner": [
            {"start": s, "end": e, "label": lab}
            for (s, e, lab) in sorted(set(ner))
        ],
        **{f"dropped_{k}": v for k, v in dropped.items()},
    }


def parse_genia_batch(df: pd.DataFrame) -> pd.DataFrame:
    rows = [
        parse_genia_article(x, default_doc_key=k)
        for k, x in zip(df["doc_key"], df["xml"])
    ]
    return pd.DataFrame(rows)


def read_genia(articles: ray.data.Dataset) -> ray.data.Dataset:
    """articles: (doc_key, xml) rows -> parsed gold docs."""
    return articles.map_batches(parse_genia_batch, batch_format="pandas")
