"""Single-process reference-semantics oracle.

Pure-Python, document-at-a-time implementation that follows the
reference's control flow (read -> per-sentence span enumeration ->
exhaustive span scoring -> decode -> prune -> pair scoring -> decode ->
per-document coref -> cluster assembly), mirroring
``/root/reference/dygie/models/dygie.py:164-334`` with the
deterministic scorers from ``semantics.py``.  The Ray Data engine is
scored against THIS oracle with ports of the reference's own metrics
(``functions/metrics.py``); P/R >= 0.95 is the parity gate
(BASELINE.json north_rule).

This module is intentionally slow and loopy — it exists to define
correct output, not to run at scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import semantics as S
from .semantics import DEFAULT_CONFIG, ExtractionConfig


@dataclass
class OracleDoc:
    doc_key: str
    conv_id: str
    sentences: list[list[str]]          # tokens per sentence (= turn)
    sentence_start: list[int]           # doc-level token offset per sentence
    turn_idx: list[int]
    roles: list[str]
    # predictions (doc-level token offsets, inclusive ends)
    ner: list[list[tuple]] = field(default_factory=list)        # per sentence: (s,e,label,raw,softmax)
    relations: list[list[tuple]] = field(default_factory=list)  # (s1,e1,s2,e2,label,raw,softmax)
    events: list[list[dict]] = field(default_factory=list)      # {trigger:(tok,type,raw,softmax), args:[(s,e,role)]}
    clusters: list[list[tuple[int, int]]] = field(default_factory=list)


def assemble_documents(
    rows: list[dict], cfg: ExtractionConfig = DEFAULT_CONFIG
) -> list[OracleDoc]:
    """Group transcript rows by conv_id, sort by turn_idx, tokenize,
    window into documents of <= max_tokens_per_doc tokens (greedy
    splitter semantics of ``document.py:197-251``: renumbered
    sentence_start per window, doc_key suffixed ``_SPLIT_{i}``;
    oversized single sentences raise)."""
    convs: dict[str, list[dict]] = {}
    for r in rows:
        convs.setdefault(r["conv_id"], []).append(r)
    docs: list[OracleDoc] = []
    for cid in sorted(convs):
        turns = sorted(convs[cid], key=lambda r: r["turn_idx"])
        sentences = [S.tokenize(t["text"]) for t in turns]
        windows: list[list[int]] = []
        cur: list[int] = []
        cur_tokens = 0
        for i, sent in enumerate(sentences):
            if len(sent) > cfg.max_tokens_per_doc:
                raise ValueError(
                    f"sentence longer than max_tokens_per_doc in {cid}"
                )
            if cur and cur_tokens + len(sent) > cfg.max_tokens_per_doc:
                windows.append(cur)
                cur, cur_tokens = [], 0
            cur.append(i)
            cur_tokens += len(sent)
        if cur:
            windows.append(cur)
        for w, idxs in enumerate(windows):
            key = cid if len(windows) == 1 else f"{cid}_SPLIT_{w}"
            sents = [sentences[i] for i in idxs]
            starts, off = [], 0
            for s in sents:
                starts.append(off)
                off += len(s)
            docs.append(
                OracleDoc(
                    doc_key=key,
                    conv_id=cid,
                    sentences=sents,
                    sentence_start=starts,
                    turn_idx=[turns[i]["turn_idx"] for i in idxs],
                    roles=[turns[i]["role"] for i in idxs],
                )
            )
    return docs


def _score_sentence_ner(tokens: list[str], cfg: ExtractionConfig):
    """Exhaustive span scoring + decode for one sentence.

    Returns (spans, kept_mentions) where kept_mentions are
    (start_sent, end_sent, label, raw, softmax, surface) for argmax != null,
    and spans is the full enumeration (for pruning)."""
    spans = S.enumerate_spans(len(tokens), cfg.max_span_width)
    mentions = []
    best_raw = []
    surfaces = []
    for (a, b) in spans:
        surface = " ".join(tokens[a : b + 1])
        surfaces.append(surface)
        raw = S.ner_raw_scores(surface, cfg.labels)
        best_raw.append(max(raw))
        arg, raw_best, soft = S.softmax_with_dummy(raw)
        if arg > 0:
            mentions.append(
                (a, b, cfg.labels[arg - 1], S.round_score(raw_best), S.round_score(soft), surface)
            )
    return spans, surfaces, best_raw, mentions


def _prune(spans, surfaces, best_raw, n_tokens, spans_per_word, cfg, cap=None):
    if cfg.entity_beam:
        return S.prune_entity_beam(best_raw)
    scores = [S.pruner_score(surf, i) for i, surf in enumerate(surfaces)]
    k = S.dynamic_k(n_tokens, spans_per_word, len(spans), cap)
    return S.prune_topk_resort(scores, k)


def extract_document(doc: OracleDoc, cfg: ExtractionConfig = DEFAULT_CONFIG) -> OracleDoc:
    """Reference forward pass (models/dygie.py:164-274) per document."""
    doc.ner, doc.relations, doc.events = [], [], []
    doc_mentions: list[tuple[int, int, str]] = []  # (start_doc, end_doc, surface) in order
    for sent_ix, tokens in enumerate(doc.sentences):
        off = doc.sentence_start[sent_ix]
        spans, surfaces, best_raw, mentions = _score_sentence_ner(tokens, cfg)
        doc.ner.append(
            [(a + off, b + off, lab, raw, soft) for (a, b, lab, raw, soft, _) in mentions]
        )
        # ---- relations over pruned span pairs (relation.py:115-248) ----
        kept = _prune(spans, surfaces, best_raw, len(tokens), cfg.spans_per_word_relation, cfg)
        rels = []
        for i in kept:
            for j in kept:
                if i == j:
                    continue
                s1, s2 = spans[i], spans[j]
                between = tokens[s1[1] + 1] if s2[0] == s1[1] + 2 else None
                raw = S.relation_raw_scores(s1, s2, surfaces[i], surfaces[j], between, cfg.preds)
                arg, raw_best, soft = S.softmax_with_dummy(raw)
                if arg > 0:
                    rels.append(
                        (
                            s1[0] + off, s1[1] + off, s2[0] + off, s2[1] + off,
                            cfg.preds[arg - 1], S.round_score(raw_best), S.round_score(soft),
                        )
                    )
        doc.relations.append(rels)
        # ---- events: triggers on tokens, args from pruned spans (events.py) ----
        if cfg.entity_beam:
            trig_keep = [
                t for t in range(len(tokens))
                if max(S.trigger_raw_scores(tokens[t], cfg.preds)) > 1e-10
            ]
        else:
            tscores = [
                max(S.trigger_raw_scores(tokens[t], cfg.preds)) - S.PRUNER_IDX_EPS * t
                for t in range(len(tokens))
            ]
            k = S.dynamic_k(len(tokens), cfg.spans_per_word_coref, len(tokens), cfg.trigger_cap)
            trig_keep = S.prune_topk_resort(tscores, k)
        arg_keep = _prune(
            spans, surfaces, best_raw, len(tokens), cfg.spans_per_word_coref, cfg,
            None if cfg.entity_beam else cfg.argument_cap,
        )
        sent_events = []
        for t in trig_keep:
            raw = S.trigger_raw_scores(tokens[t], cfg.preds)
            arg_ix, raw_best, soft = S.softmax_with_dummy(raw)
            if arg_ix == 0:
                continue
            etype = cfg.preds[arg_ix - 1]
            args = []
            for i in arg_keep:
                if surfaces[i] not in S.ENTITY_LEXICON:
                    continue
                role = S.argument_role(spans[i], t)
                if role is not None:
                    args.append((spans[i][0] + off, spans[i][1] + off, role))
            args.sort(key=lambda a: a[0])  # events.py:394 sort by start
            sent_events.append(
                {
                    "trigger": (t + off, etype, S.round_score(raw_best), S.round_score(soft)),
                    "args": args,
                }
            )
        doc.events.append(sent_events)
        # coref candidates: pruned entity spans in order (coref.py:261-268)
        coref_keep = _prune(spans, surfaces, best_raw, len(tokens), cfg.spans_per_word_coref, cfg)
        for i in coref_keep:
            if surfaces[i] in S.ENTITY_LEXICON:
                doc_mentions.append((spans[i][0] + off, spans[i][1] + off, surfaces[i]))
    # ---- coref: antecedent scoring over doc-level mention sequence ----
    # (coref.py:161-330; antecedent window max_antecedents; best antecedent
    # by score; chains unioned into clusters, coref.py:388-459)
    # gated propagation first (coref.py:114-157): cfg.coref_prop
    # iterations refine the mention representations the antecedent
    # scorer consumes — a fixed point under the exact-surface scorer
    # (test-enforced), but the loop defines the semantics a learned
    # scorer inherits
    rep_surfaces = [s for (_, _, s) in doc_mentions]
    if cfg.coref_prop > 0:
        rep_surfaces = S.coref_propagate(
            rep_surfaces, cfg.max_antecedents, cfg.coref_prop
        )
    parent = list(range(len(doc_mentions)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for m in range(len(doc_mentions)):
        surf = rep_surfaces[m]
        lo = max(0, m - cfg.max_antecedents)
        best, best_score = None, 0.0  # dummy antecedent score = 0 (coref.py)
        for a in range(lo, m):
            sc = S.coref_antecedent_score(surf, rep_surfaces[a], m - a)
            if sc > best_score:
                best, best_score = a, sc
        if best is not None:
            ra, rb = find(best), find(m)
            if ra != rb:
                parent[rb] = ra
    groups: dict[int, list[int]] = {}
    for m in range(len(doc_mentions)):
        groups.setdefault(find(m), []).append(m)
    doc.clusters = [
        [(doc_mentions[m][0], doc_mentions[m][1]) for m in ms]
        for ms in groups.values()
        if len(ms) > 1
    ]
    doc.clusters.sort()
    return doc


def extract_all(rows: list[dict], cfg: ExtractionConfig = DEFAULT_CONFIG) -> list[OracleDoc]:
    return [extract_document(d, cfg) for d in assemble_documents(rows, cfg)]


def triples_from_docs(docs: list[OracleDoc]) -> list[tuple]:
    """(conv_id, subj_id, subj, pred, obj_id, obj) deduped per conversation —
    the P/R comparison unit (graph materialization, SURVEY.md §7.2-7)."""
    seen = set()
    out = []
    for d in docs:
        flat_tokens = [t for s in d.sentences for t in s]
        for rels in d.relations:
            for (s1, e1, s2, e2, label, _raw, _soft) in rels:
                subj = S.normalize_surface(" ".join(flat_tokens[s1 : e1 + 1]))
                obj = S.normalize_surface(" ".join(flat_tokens[s2 : e2 + 1]))
                key = (d.conv_id, subj, label, obj)
                if key in seen:
                    continue
                seen.add(key)
                out.append((d.conv_id, S.entity_id(subj), subj, label, S.entity_id(obj), obj))
    return out
