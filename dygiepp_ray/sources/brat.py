"""brat standoff reader (SURVEY.md S7, M12, A8).

Parses ``.txt`` + ``.ann`` file pairs into gold document rows with
char->token alignment, replicating the reference's semantics
(``scripts/new-dataset/brat_to_input.py:25-157``,
``annotated_doc.py:17-456``):

* ``T<id>\\tLABEL start end\\tsurface``  — entity (char offsets, end exclusive)
* ``R<id>\\tREL Arg1:T<a> Arg2:T<b>``     — binary relation
* ``E<id>\\tTYPE:T<trig> ROLE1:T<x> ...`` — event (trigger + role args)
* ``*\\tCOREF T<a> T<b> ...``             — coreference equivalence

Annotations whose char offsets do not land on token boundaries are
DROPPED and counted (``annotated_doc.py:201-273`` drops misaligned
spans with a warning; the reference accumulates drop Counters,
``brat_to_input.py:120-151``) — here the counters are ordinary columns
summed with a Dataset aggregate.

Parsing is an actor-pool ``map_batches`` over ``(doc_key, txt, ann)``
rows — read the file pairs with ``ray.data.read_binary_files`` /
``from_items`` and feed them through ``parse_brat_batch``.
"""

from __future__ import annotations

import pandas as pd

import ray.data



def _token_char_spans(text: str) -> tuple[list[str], dict[int, int], dict[int, int]]:
    """Tokens + maps char_start->token_ix and char_end(exclusive)->token_ix.

    Splits on ALL whitespace (\\s+): real brat .txt / abstracts are
    multi-line, and a single-space split would merge tokens across
    newlines/tabs — silently dropping every annotation after line 1 as
    'misaligned' and emitting tokens with embedded newlines that the
    engine's own ``semantics.tokenize`` never produces."""
    import re

    tokens, starts, ends = [], {}, {}
    for m in re.finditer(r"\S+", text):
        starts[m.start()] = len(tokens)
        ends[m.end()] = len(tokens)
        tokens.append(m.group())
    return tokens, starts, ends


def parse_brat_doc(doc_key: str, txt: str, ann: str) -> dict:
    """One (txt, ann) pair -> gold doc dict + drop counters."""
    tokens, starts, ends = _token_char_spans(txt)
    entities: dict[str, tuple[int, int, str]] = {}
    dropped = {"entities": 0, "relations": 0, "events": 0, "corefs": 0}
    ner, relations, events, clusters = [], [], [], []
    for line in ann.splitlines():
        line = line.strip()
        if not line or "\t" not in line:
            continue
        tag, body = line.split("\t", 1)
        if tag.startswith("T"):
            head = body.split("\t")[0]
            label, s, e = head.split(" ")[:3]
            s, e = int(s), int(e)
            if s in starts and e in ends:
                entities[tag] = (starts[s], ends[e], label)
            else:
                dropped["entities"] += 1  # char->token misalignment (M12)
    for line in ann.splitlines():
        line = line.strip()
        if not line or "\t" not in line:
            continue
        tag, body = line.split("\t", 1)
        if tag.startswith("R"):
            parts = body.split(" ")
            label = parts[0]
            try:
                a = parts[1].split(":")[1]
                b = parts[2].split(":")[1]
                s1, e1, _ = entities[a]
                s2, e2, _ = entities[b]
                relations.append((s1, e1, s2, e2, label))
            except (KeyError, IndexError):
                dropped["relations"] += 1
        elif tag.startswith("E"):
            parts = body.split(" ")
            try:
                etype, trig = parts[0].split(":")
                ts, te, _ = entities[trig]
                args = []
                for p in parts[1:]:
                    if not p:
                        continue
                    role, ent = p.split(":")
                    s, e, _ = entities[ent]
                    args.append((s, e, role))
                events.append({"trigger_tok": ts, "event_type": etype, "args": args})
            except (KeyError, ValueError, IndexError):
                dropped["events"] += 1
        elif tag.startswith("*"):
            parts = body.split(" ")
            members = []
            ok = True
            for t in parts[1:]:
                if t in entities:
                    members.append(entities[t][:2])
                else:
                    ok = False
            if ok and len(members) >= 2:
                clusters.append(members)
            else:
                dropped["corefs"] += 1
    ner = sorted(entities.values())
    return {
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
                "args": [{"start": s, "end": e, "role": r} for (s, e, r) in ev["args"]],
            }
            for ev in events
        ],
        "clusters": [
            [{"start": s, "end": e} for (s, e) in members] for members in clusters
        ],
        **{f"dropped_{k}": v for k, v in dropped.items()},
    }


def parse_brat_batch(df: pd.DataFrame) -> pd.DataFrame:
    rows = [
        parse_brat_doc(k, t, a)
        for k, t, a in zip(df["doc_key"], df["txt"], df["ann"])
    ]
    return pd.DataFrame(rows)


def read_brat(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """pairs: (doc_key, txt, ann) rows -> parsed gold docs."""
    return pairs.map_batches(parse_brat_batch, batch_format="pandas")


def drop_counters(parsed: ray.data.Dataset) -> dict[str, int]:
    """A8: global dropped-annotation counters via Dataset sum."""
    out = {}
    for k in ("entities", "relations", "events", "corefs"):
        out[k] = int(parsed.sum(f"dropped_{k}") or 0)
    return out


def format_brat_doc(doc: dict) -> tuple[str, str]:
    """One parsed/predicted doc dict -> (txt, ann) brat standoff pair —
    the write side of :func:`parse_brat_doc` (S2 interop: annotations
    round-trip through the exact format the reference's preprocessing
    scripts consume).  Tokens are space-joined, so char offsets are the
    cumulative token lengths; entity T-ids are assigned in the sorted
    (start, end, label) order `parse_brat_doc` re-emits, making
    write->parse the identity on (ner, relations, clusters).  Events
    are NOT written (the brat reader folds trigger Ts into ner, which
    would break the identity)."""
    tokens = list(doc["tokens"])
    txt = " ".join(tokens)
    starts, pos = [], 0
    for t in tokens:
        starts.append(pos)
        pos += len(t) + 1
    tid = {}
    lines = []
    for i, m in enumerate(sorted(
            (m["start"], m["end"], m["label"]) for m in doc.get("ner", []))):
        s_tok, e_tok, label = m
        cs = starts[s_tok]
        ce = starts[e_tok] + len(tokens[e_tok])
        tag = f"T{i + 1}"
        tid[(s_tok, e_tok)] = tag
        lines.append(f"{tag}\t{label} {cs} {ce}\t{txt[cs:ce]}")
    for i, r in enumerate(doc.get("relations", [])):
        a = tid.get((r["s1"], r["e1"]))
        b = tid.get((r["s2"], r["e2"]))
        if a and b:
            lines.append(f"R{i + 1}\t{r['label']} Arg1:{a} Arg2:{b}")
    for members in doc.get("clusters", []):
        tags = [tid.get((m["start"], m["end"])) for m in members]
        if all(tags) and len(tags) >= 2:
            lines.append("*\tCoref " + " ".join(tags))
    return txt, "\n".join(lines)


def write_brat(parsed: ray.data.Dataset) -> ray.data.Dataset:
    """Parsed/predicted docs -> (doc_key, txt, ann) standoff rows, one
    vectorized map pass (pair with ``write_parquet`` or a per-row file
    sink; each doc is independent, so the write streams)."""

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "doc_key" not in df.columns:
            return pd.DataFrame({"doc_key": pd.Series(dtype=object),
                                 "txt": pd.Series(dtype=object),
                                 "ann": pd.Series(dtype=object)})
        rows = []
        for rec in df.to_dict("records"):
            txt, ann = format_brat_doc(rec)
            rows.append((rec["doc_key"], txt, ann))
        return pd.DataFrame(rows, columns=["doc_key", "txt", "ann"])

    return parsed.map_batches(to_pairs, batch_format="pandas")
