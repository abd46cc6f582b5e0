"""Shared extraction semantics — the single source of truth.

Everything here is used verbatim by BOTH the distributed Ray Data engine
(``dygiepp_ray/stages``) and the single-process reference-semantics
oracle (``dygiepp_ray/oracle.py``).  The reference's neural scorers
(BERT encoder + FFN heads, ``/root/reference/dygie/models/dygie.py:56-138``)
are replaced by deterministic lexicon-featurized scorers; the *decode
conventions* around them are exact re-implementations of the
reference's:

* null class occupies index 0 with a constant 0 raw score (the "dummy"
  column prepended before softmax — ``dygie/models/ner.py:99-104``,
  ``relation.py:154-157``, ``events.py:280-285``);
* predicted label indices are shifted by -1 so null = -1
  (``relation.py:245-247``);
* scores are rounded to 4 decimals on emission (``format_float``,
  ``dygie/data/dataset_readers/document.py:10-11``);
* span enumeration is all (start, end) inclusive intervals of width
  <= max_span_width ordered by (start, end)
  (``dygie/data/dataset_readers/dygie.py:121-126``);
* mention pruning keeps top ``k = ceil(spans_per_word * n_tokens)``
  spans by pruner score and then RE-SORTS the kept spans by original
  span index (``dygie/models/entity_beam_pruner.py:139-192``), with an
  "entity beam" variant that instead keeps every span whose best
  non-null class score exceeds a threshold
  (``entity_beam_pruner.py:14-24,116-136``).

Tokenization is whitespace splitting plus the reference's
``_normalize_word`` (strip leading "/" from "/." and "/?",
``dygie/data/dataset_readers/dygie.py:213-218``).  The DuckDB-oracle
equivalent is ``regexp_split_to_array(trim(text), '\\s+')``.
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# Label namespaces.  Index 0 is the implicit null class in every namespace
# (reference: null label must map to index 0, dygie/models/ner.py:43-51).
# ---------------------------------------------------------------------------

ENTITY_LABELS: tuple[str, ...] = ("TOOL", "DATA", "ORG", "PERSON")

# Predicate words double as relation labels and event types (the synthetic
# grammar's analogue of SciERC relation labels / ACE event types).
PRED_WORDS: tuple[str, ...] = ("join", "merge", "filter", "scan", "sort", "group")

ARG_ROLES: tuple[str, ...] = ("AGENT", "PATIENT")

# Entity lexicon: surface form -> label.  Unigram entries are drawn from the
# driver testdata vocabulary (so the DuckDB oracle can replicate extraction
# over /root/testdata/*/documents.parquet); multi-token entries exercise true
# span scoring (width > 1) and use tokens that never occur in the driver
# vocabulary, keeping the SQL oracle exact.
ENTITY_LEXICON: dict[str, str] = {
    # unigrams (driver vocabulary)
    "spark": "TOOL",
    "hash": "TOOL",
    "vector": "TOOL",
    "table": "DATA",
    "row": "DATA",
    "column": "DATA",
    "batch": "DATA",
    "stream": "DATA",
    "customer": "ORG",
    # multi-token phrases (synthetic transcripts only)
    "apache flink": "TOOL",
    "neural net": "TOOL",
    "feature store": "DATA",
    "ledger shard": "DATA",
    "acme corp": "ORG",
    "globex inc": "ORG",
    "alice liddell": "PERSON",
    "bob cratchit": "PERSON",
    "carol danvers": "PERSON",
    "dan aykroyd": "PERSON",
    "erin brockovich": "PERSON",
}

PRED_SET = frozenset(PRED_WORDS)
_LEX_BY_WIDTH: dict[int, frozenset[str]] = {}
for _s in ENTITY_LEXICON:
    _w = _s.count(" ") + 1
    _LEX_BY_WIDTH.setdefault(_w, set())  # type: ignore[arg-type]
for _s in ENTITY_LEXICON:
    _w = _s.count(" ") + 1
    _LEX_BY_WIDTH[_w] = frozenset(set(_LEX_BY_WIDTH[_w]) | {_s})
LEXICON_WIDTHS: tuple[int, ...] = tuple(sorted(_LEX_BY_WIDTH))
MAX_LEXICON_WIDTH = max(LEXICON_WIDTHS)

# Deterministic scorer constants.
LEX_RAW = 10.0       # raw score of the matching label for a lexicon span
NEG_RAW = -4.0       # raw score of every non-matching (span, label) pair
TRIG_RAW = 10.0      # raw trigger score for a predicate token
ARG_RAW = 10.0       # raw argument score within the distance window
ARG_MAX_DIST = 3     # max token distance trigger<->argument (inclusive)
PRUNER_IDX_EPS = 1e-4   # strict tie-break: score - eps * span_index

ROUND_DIGITS = 4     # format_float, document.py:10-11


@dataclass(frozen=True)
class ExtractionConfig:
    """Pipeline configuration (analogue of training_config/template.libsonnet).

    ``template.libsonnet:32`` max_span_width=8; ``:88-106`` spans_per_word
    (relation 0.5, coref 0.3); ``events.py:143-162`` trigger/arg caps;
    ``coref.py`` max_antecedents=100 (``template.libsonnet:91``);
    ``document.py:197-251`` max_tokens_per_doc windowing.
    """

    max_span_width: int = 8
    max_tokens_per_doc: int = 256        # conversation -> document windows (M8)
    turn_tokens: int = 16                # documents-as-transcripts sentence size
    spans_per_word_relation: float = 0.5
    spans_per_word_coref: float = 0.3
    max_antecedents: int = 1000          # >= window mention bound => exact-match
                                         # coref reduces to same-surface grouping
    entity_beam: bool = True             # O3 pruning variant (flagship config);
                                         # False => top-k + resort (O1/O2)
    trigger_cap: int = 15                # events.py:143-147 (top-k mode only)
    argument_cap: int = 30               # events.py:158-162 (top-k mode only)
    dataset: str = "synth"
    # gated coref propagation iterations (reference coref.py:114-157 /
    # template.libsonnet coref_prop).  Under the deterministic
    # exact-surface scorer the propagation is a fixed point (test-
    # enforced), but the control flow runs so a learned scorer plugged
    # into EncoderExtractStage inherits correct semantics.
    coref_prop: int = 0
    labels: tuple[str, ...] = ENTITY_LABELS
    preds: tuple[str, ...] = PRED_WORDS
    # task toggles — the reference enables modules via loss_weights[task] > 0
    # (models/dygie.py:226-254); disabled tasks are neither computed nor
    # emitted by the extraction stage
    tasks: tuple[str, ...] = ("ner", "relations", "events", "coref")


DEFAULT_CONFIG = ExtractionConfig()

_WS = re.compile(r"\s+")


def normalize_word(tok: str) -> str:
    """Reference ``_normalize_word`` (dygie.py:213-218)."""
    if tok in ("/.", "/?"):
        return tok[1:]
    return tok


def tokenize(text: str) -> list[str]:
    """Whitespace tokenize + normalize. SQL: regexp_split_to_array(trim(text),'\\s+')."""
    if not text:
        return []
    return [normalize_word(t) for t in _WS.split(text.strip()) if t]


def enumerate_spans(n_tokens: int, max_span_width: int) -> list[tuple[int, int]]:
    """All inclusive (start, end) spans of width <= max_span_width.

    Order matches allennlp ``enumerate_spans`` as used at dygie.py:121-126:
    ascending start, then ascending end.
    """
    out = []
    for start in range(n_tokens):
        for end in range(start, min(n_tokens, start + max_span_width)):
            out.append((start, end))
    return out


# ---------------------------------------------------------------------------
# Deterministic scorers (stand-ins for T1-T7).  All raw scores are pure
# functions of surface strings / positions so the distributed engine and the
# oracle agree bit-for-bit.
# ---------------------------------------------------------------------------

def ner_raw_scores(surface: str, labels: tuple[str, ...] = ENTITY_LABELS) -> list[float]:
    """Per-label raw scores for one span (null class NOT included)."""
    match = ENTITY_LEXICON.get(surface)
    return [LEX_RAW if lab == match else NEG_RAW for lab in labels]


def pruner_score(surface: str, span_index: int) -> float:
    """Mention-pruner score (T4).  Strictly ordered via span-index epsilon."""
    base = LEX_RAW if surface in ENTITY_LEXICON else NEG_RAW
    return base - PRUNER_IDX_EPS * span_index


def relation_raw_scores(
    subj: tuple[int, int],
    obj: tuple[int, int],
    subj_surface: str,
    obj_surface: str,
    between_token: str | None,
    preds: tuple[str, ...] = PRED_WORDS,
) -> list[float]:
    """Raw relation scores for an ordered span pair (null NOT included).

    A pair scores LEX_RAW on predicate p iff both spans are lexicon
    entities, obj starts exactly two tokens after subj ends (one token
    in between), and the between token equals p.
    """
    ok = (
        subj_surface in ENTITY_LEXICON
        and obj_surface in ENTITY_LEXICON
        and obj[0] == subj[1] + 2
        and between_token is not None
    )
    return [LEX_RAW if (ok and p == between_token) else NEG_RAW for p in preds]


def trigger_raw_scores(token: str, preds: tuple[str, ...] = PRED_WORDS) -> list[float]:
    """Per-event-type raw trigger scores for one token (null NOT included)."""
    return [TRIG_RAW if token == p else NEG_RAW for p in preds]


def argument_role(span: tuple[int, int], trigger_ix: int) -> str | None:
    """Role of an entity span vs a trigger token, or None if out of window.

    AGENT if the span ends before the trigger, PATIENT if it starts
    after; the distance (tokens between, exclusive) must be
    <= ARG_MAX_DIST.  Spans containing the trigger are impossible
    (entity and predicate lexicons are disjoint).
    """
    if span[1] < trigger_ix:
        dist = trigger_ix - span[1]
        return "AGENT" if dist <= ARG_MAX_DIST else None
    if span[0] > trigger_ix:
        dist = span[0] - trigger_ix
        return "PATIENT" if dist <= ARG_MAX_DIST else None
    return None


def coref_antecedent_score(surface: str, antecedent_surface: str, mention_gap: int) -> float:
    """Antecedent score (T6): exact-surface match, nearer is better."""
    if surface == antecedent_surface:
        return LEX_RAW - 1e-3 * mention_gap
    return NEG_RAW


# Gate value of the propagation mix (the reference's gate is a learned
# sigmoid over [span; entity] features, coref.py:150-155; the
# deterministic stand-in uses a constant mix, which preserves the
# fixed-point property the parity tests pin down).
COREF_PROP_GATE = 0.5


def coref_propagate(
    surfaces: list[str], max_antecedents: int, iterations: int
) -> list[str]:
    """Gated coref propagation (reference ``coref.py:114-157``).

    Each iteration: (1) antecedent scores over the window from the
    CURRENT mention representations, (2) softmax with the dummy null
    column prepended (``coref.py:125-133``), (3) entity representation
    = attention-weighted sum of antecedent representations (the dummy
    keeps the mention's own), (4) gated mix
    ``f·span + (1-f)·entity`` (``coref.py:150-155``).

    Representations here are distributions over surface forms (one-hot
    init — the deterministic analogue of span embeddings); the emitted
    representation is the dominant surface, which downstream antecedent
    scoring consumes.  Under the exact-surface scorer same-surface
    antecedents dominate the attention, so the dominant surface is a
    FIXED POINT of the iteration: any ``iterations >= 0`` emits the
    input surfaces unchanged (test-enforced).  The loop still executes
    so a learned scorer dropped into ``EncoderExtractStage`` inherits
    the reference's propagation control flow."""
    reps: list[dict[str, float]] = [{s: 1.0} for s in surfaces]

    def dominant(d: dict[str, float]) -> str:
        # max weight, ties broken by surface string (deterministic)
        return max(d.items(), key=lambda kv: (kv[1], kv[0]))[0]

    for _ in range(max(0, iterations)):
        doms = [dominant(r) for r in reps]
        new: list[dict[str, float]] = []
        for m in range(len(surfaces)):
            lo = max(0, m - max_antecedents)
            raw = [
                coref_antecedent_score(doms[m], doms[a], m - a)
                for a in range(lo, m)
            ]
            mx = max([0.0] + raw)
            exps = [math.exp(0.0 - mx)] + [math.exp(s - mx) for s in raw]
            z = sum(exps)
            ent: dict[str, float] = {}
            for s, w in reps[m].items():  # dummy column keeps own rep
                ent[s] = ent.get(s, 0.0) + w * exps[0] / z
            for i, a in enumerate(range(lo, m)):
                for s, w in reps[a].items():
                    ent[s] = ent.get(s, 0.0) + w * exps[i + 1] / z
            f = COREF_PROP_GATE
            mixed = {s: f * w for s, w in reps[m].items()}
            for s, w in ent.items():
                mixed[s] = mixed.get(s, 0.0) + (1.0 - f) * w
            new.append(mixed)
        reps = new
    return [dominant(r) for r in reps]


def normalize_surface(surface: str) -> str:
    """Canonicalization key (J8): lowercase."""
    return surface.lower()


def entity_id(surface: str) -> str:
    """Canonical entity id = md5 of the normalized surface.

    Content-addressed ids make entity linking join-free at any scale
    (DuckDB oracle: ``md5(surface)``).
    """
    return hashlib.md5(normalize_surface(surface).encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# Decode conventions (F6/F7/O1/O2/F1) — exact reference semantics.
# ---------------------------------------------------------------------------

def softmax_with_dummy(raw: list[float]) -> tuple[int, float, float]:
    """Prepend the dummy 0-score null column, softmax, argmax.

    Returns (argmax_index_including_null, raw_of_argmax, softmax_of_argmax).
    argmax == 0 means the null class (reference keeps label != 0 only,
    ner.py:125-150).
    """
    scores = [0.0] + list(raw)
    m = max(scores)
    exps = [math.exp(s - m) for s in scores]
    z = sum(exps)
    best = max(range(len(scores)), key=lambda i: (scores[i], -i))
    return best, scores[best], exps[best] / z


def round_score(x: float) -> float:
    """format_float (document.py:10-11)."""
    return round(x, ROUND_DIGITS)


def dynamic_k(n_tokens: int, spans_per_word: float, n_spans: int, cap: int | None = None) -> int:
    """k = ceil(spans_per_word * n_tokens), clamped (O2)."""
    k = math.ceil(spans_per_word * n_tokens)
    if cap is not None:
        k = min(k, cap)
    return max(0, min(k, n_spans))


def prune_topk_resort(scores: list[float], k: int) -> list[int]:
    """Top-k indices by score, re-sorted ascending by original index (O1).

    ``entity_beam_pruner.py:150,166-171``: topk then re-sort so downstream
    antecedent windows stay index-valid.  Scores are strictly ordered by
    construction (PRUNER_IDX_EPS), so ties cannot occur.
    """
    order = sorted(range(len(scores)), key=lambda i: (-scores[i], i))[:k]
    return sorted(order)


def distance_bucket(d: int) -> int:
    """10-bucket distance feature (F5) — the standard allennlp
    ``bucket_values`` scheme used for coref antecedent distance
    (``coref.py:60-66,561-563``) and trigger-argument distance
    (``events.py:92-95,249-266``): identity for 0-4, then log buckets
    5-7 -> 5, 8-15 -> 6, 16-31 -> 7, 32-63 -> 8, 64+ -> 9."""
    if d < 5:
        return max(0, d)
    if d < 8:
        return 5
    if d < 16:
        return 6
    if d < 32:
        return 7
    if d < 64:
        return 8
    return 9


def prune_entity_beam(best_class_raw: list[float], threshold: float = 1e-10) -> list[int]:
    """Entity-beam pruning (O3): keep spans whose best non-null raw score
    exceeds ``threshold`` (entity_beam_pruner.py:14-24,116-136); order
    preserved."""
    return [i for i, s in enumerate(best_class_raw) if s > threshold]
