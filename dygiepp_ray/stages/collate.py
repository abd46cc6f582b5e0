"""Collate / uncollate — GPU batch shaping (SURVEY.md A10 / J5).

The reference manually repartitions sentences for GPU efficiency
(``scripts/data/shared/collate.py:26-66,126-129``): sort all sentences by
length across documents, bin-pack into pseudo-docs under
``max_spans_per_doc ≈ n_sentences * longest_len^2 <= 50k`` and
``max_sentences_per_doc`` budgets, tagging ``_orig_doc_key`` /
``_orig_sent_ix``; ``uncollate.py:53-94`` regroups afterwards and checks
no sentence went missing.

Here: ``collate`` = global ``ds.sort`` on sentence length (a real
all-to-all) + a parallel per-range bin-packer (one Ray task per
contiguous run of sorted blocks — no driver funnel);
``uncollate`` = ``partitioned_map_groups`` on ``_orig_doc_key`` with an
in-group sort on ``_orig_sent_ix`` — exactly the conv_id/turn_idx
regroup pattern.  Round-trip safety is test-enforced like the
reference's ``collate_test.py:82-106``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..core import partitioned_map_groups

SENT_SCHEMA = pa.schema(
    [
        ("_orig_doc_key", pa.string()),
        ("_orig_sent_ix", pa.int32()),
        ("tokens", pa.list_(pa.string())),
        ("n_tokens", pa.int32()),
    ]
)


def explode_sentences(docs: ray.data.Dataset) -> ray.data.Dataset:
    """documents -> one row per sentence with provenance tags."""

    def fn(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sents = tbl["sentences"]
        if isinstance(sents, pa.ChunkedArray):
            sents = sents.combine_chunks()
        parents = pc.list_parent_indices(sents)
        flat = pc.list_flatten(sents)  # list<string> per sentence
        off = np.asarray(sents.offsets)
        off = off - off[0]
        n = len(flat)
        sent_ix = np.arange(n) - off[np.asarray(parents)]
        return pa.table(
            {
                "_orig_doc_key": tbl["doc_key"].take(parents),
                "_orig_sent_ix": pa.array(sent_ix, pa.int32()),
                "tokens": flat,
                "n_tokens": pc.list_value_length(flat).cast(pa.int32()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


PSEUDO_SCHEMA = pa.schema(
    [
        ("doc_key", pa.string()),
        ("dataset", pa.string()),
        ("sentences", pa.list_(pa.list_(pa.string()))),
        ("sentence_start", pa.list_(pa.int32())),
        ("_orig_doc_key", pa.list_(pa.string())),
        ("_orig_sent_ix", pa.list_(pa.int32())),
        ("n_tokens", pa.int32()),
    ]
)


def _pack_table(
    tbl: pa.Table,
    range_ix: int,
    max_spans_per_doc: int,
    max_sentences_per_doc: int,
    dataset: str,
) -> pa.Table:
    """Greedy span-budget packer over ONE contiguous sorted range
    (collate.py:126-129 semantics, exact within the range).  Pseudo-doc
    keys carry the range index, so ids are deterministic and unique
    without cross-range coordination."""
    rows: dict[str, list] = {k: [] for k in PSEUDO_SCHEMA.names}
    cur_toks: list[list[str]] = []
    cur_keys: list[str] = []
    cur_ixs: list[int] = []
    longest = 0
    n_doc = 0

    def flush():
        nonlocal cur_toks, cur_keys, cur_ixs, longest, n_doc
        if not cur_toks:
            return
        starts = np.zeros(len(cur_toks), dtype=np.int32)
        lens = [len(t) for t in cur_toks]
        if len(lens) > 1:
            starts[1:] = np.cumsum(lens[:-1])
        rows["doc_key"].append(f"pseudo_{range_ix:05d}_{n_doc:06d}")
        rows["dataset"].append(dataset)
        rows["sentences"].append(cur_toks)
        rows["sentence_start"].append(starts.tolist())
        rows["_orig_doc_key"].append(cur_keys)
        rows["_orig_sent_ix"].append(cur_ixs)
        rows["n_tokens"].append(int(sum(lens)))
        n_doc += 1
        cur_toks, cur_keys, cur_ixs, longest = [], [], [], 0

    df = tbl.to_pandas()
    for key, ix, toks, n in zip(
        df["_orig_doc_key"], df["_orig_sent_ix"], df["tokens"], df["n_tokens"]
    ):
        new_longest = max(longest, int(n))
        if cur_toks and (
            (len(cur_toks) + 1) * new_longest ** 2 > max_spans_per_doc
            or len(cur_toks) + 1 > max_sentences_per_doc
        ):
            flush()
            new_longest = int(n)
        cur_toks.append(list(toks))
        cur_keys.append(key)
        cur_ixs.append(int(ix))
        longest = new_longest
    flush()
    return pa.Table.from_pydict(rows, schema=PSEUDO_SCHEMA)


@ray.remote
def _pack_range_task(
    range_ix: int, max_spans: int, max_sents: int, dataset: str,
    slices: list, *blocks
) -> pa.Table:
    """``slices[i] = (offset, length)`` into ``blocks[i]`` — ranges cut
    by ROW position, not block boundary, so a skewed sort (few distinct
    n_tokens values -> one giant range-partition block) still fans out."""
    tbls = []
    for (off, ln), b in zip(slices, blocks):
        t = b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
        tbls.append(t.slice(off, ln))
    tbl = pa.concat_tables(tbls, promote_options="default")
    return _pack_table(tbl, range_ix, max_spans, max_sents, dataset)


def collate(
    sentences: ray.data.Dataset,
    max_spans_per_doc: int = 50_000,
    max_sentences_per_doc: int = 16,
    dataset: str = "synth",
    range_rows: int = 4_096,
) -> ray.data.Dataset:
    """Sentence rows -> pseudo-document rows, fully distributed.

    Global sort by length (collate.py:97-105) range-partitions the
    corpus into ordered blocks; consecutive blocks are grouped into
    ranges of ~``range_rows`` sentences and each range is packed by its
    OWN Ray task under the span budget ``n_sents * longest^2``
    (collate.py:126-129) — nothing streams through the driver (the
    pre-round-3 version pulled every sentence through a driver-side
    ``iter_batches`` loop; at 100x scale that was a single-node
    funnel).  The budget is exact within a range; a range boundary can
    only flush a pack early (an extra pseudo-doc), never exceed the
    budget.  Pseudo-doc keys are ``pseudo_{range:05d}_{n:06d}`` —
    deterministic per range, unique globally, and never visible
    downstream (uncollate regroups on ``_orig_doc_key``)."""
    sorted_ds = sentences.sort("n_tokens")
    blocks: list[tuple] = []  # (ref, num_rows)
    for bundle in sorted_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            blocks.append((ref, meta.num_rows or 0))
    # Cut ranges by ROW position across the sorted stream (mid-block
    # slices allowed): sort range-partitions by VALUE, so a skewed
    # n_tokens distribution can put most rows in one block — grouping
    # whole blocks would then collapse to a single pack task and the
    # downstream actor pool would receive one input.
    groups: list[list] = []  # each: [(ref, offset, length), ...]
    cur: list = []
    cur_rows = 0
    for ref, nr in blocks:
        off = 0
        while nr - off > 0:
            take = min(nr - off, range_rows - cur_rows)
            cur.append((ref, off, take))
            cur_rows += take
            off += take
            if cur_rows >= range_rows:
                groups.append(cur)
                cur, cur_rows = [], 0
    if cur:
        groups.append(cur)
    if not groups:
        return ray.data.from_arrow([PSEUDO_SCHEMA.empty_table()])
    refs = [
        _pack_range_task.remote(
            ix, max_spans_per_doc, max_sentences_per_doc, dataset,
            [(off, ln) for (_r, off, ln) in grp],
            *[r for (r, _o, _l) in grp],
        )
        for ix, grp in enumerate(groups)
    ]
    return ray.data.from_arrow_refs(refs)


# doc-level token positions to rebase per annotation type (all spans are
# sentence-internal, so one per-sentence base rebases every field)
_POS_FIELDS = {
    "ner": ("start", "end"),
    "relations": ("s1", "e1", "s2", "e2"),
    "triggers": ("tok",),
    "event_args": ("trig_tok", "start", "end"),
}


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def uncollate_predictions(
    pred_pseudo: ray.data.Dataset,
    docs: ray.data.Dataset,
    num_buckets: int = 32,
) -> dict[str, ray.data.Dataset]:
    """Predicted pseudo-docs -> flat annotation tables keyed by the
    ORIGINAL documents (the prediction half of uncollate,
    ``scripts/data/shared/uncollate.py:53-94`` analogue).

    Stage 1 (vectorized per batch): flatten each annotation list column;
    offset arithmetic maps its pseudo-doc (sent_ix, doc-level token
    positions) to (orig_doc_key, orig_sent_ix, sentence-local
    positions).  Stage 2 (one keyed exchange per type, annotations
    co-partitioned with the original docs on doc_key): rebase the
    sentence-local positions onto the original document's
    ``sentence_start`` and attach ``conv_id``.

    Coref clusters are deliberately absent: clusters are
    document-scoped and pseudo-docs interleave documents, so coref must
    run on original documents (same restriction as the reference's
    collate workflow, which targets sentence-level tasks).

    Returns ``{"ner": ds, "relations": ds, "triggers": ds,
    "event_args": ds}`` with columns matching ``stages.explode``.
    """

    def flat_stage(col, pos_fields):
        def fn(tbl: pa.Table) -> pd.DataFrame:
            ok = _combine(tbl["_orig_doc_key"])
            sent_off = np.asarray(ok.offsets)
            sent_off = sent_off - sent_off[0]
            ok_flat = np.asarray(ok.flatten().to_pandas(), dtype=object)
            oix_flat = np.asarray(_combine(tbl["_orig_sent_ix"]).flatten())
            ss_flat = np.asarray(_combine(tbl["sentence_start"]).flatten())
            ann = _combine(tbl[col])
            import pyarrow.compute as pc

            parents = np.asarray(pc.list_parent_indices(ann))
            flat = ann.flatten()
            if len(flat) == 0:
                out = {"doc_key": pd.Series(dtype=object),
                       "sent_ix": pd.Series(dtype=np.int64)}
                for f in flat.type:
                    if f.name != "sent_ix":
                        out[f.name] = pd.Series(
                            dtype=np.int64 if f.name in pos_fields else object
                        )
                return pd.DataFrame(out)
            sent_ix = np.asarray(flat.field("sent_ix"))
            gsent = sent_off[parents] + sent_ix
            out = {
                "doc_key": ok_flat[gsent],
                "sent_ix": oix_flat[gsent].astype(np.int64),
            }
            for f in flat.type:
                if f.name == "sent_ix":
                    continue
                if f.name in pos_fields:
                    out[f.name] = np.asarray(flat.field(f.name)) - ss_flat[gsent]
                else:
                    out[f.name] = flat.field(f.name).to_pandas()
            return pd.DataFrame(out)

        return fn

    def docs_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_key": df["doc_key"].to_numpy(),
                "conv_id": df["conv_id"].to_numpy(),
                # serialized starts: a scalar binary column concats
                # cleanly across Arrow blocks
                "__ss": [
                    np.asarray(s, dtype=np.int64).tobytes()
                    for s in df["sentence_start"]
                ],
            }
        )

    dside = docs.map_batches(docs_side, batch_format="pandas")

    from ..core import hash_coexchange

    out: dict[str, ray.data.Dataset] = {}
    for col, pos_fields in _POS_FIELDS.items():
        ann = pred_pseudo.map_batches(
            flat_stage(col, pos_fields), batch_format="pyarrow"
        )

        def rebase(a: pd.DataFrame, d: pd.DataFrame, pos=pos_fields) -> pd.DataFrame:
            if (len(a) == 0 or "doc_key" not in a.columns
                    or len(d) == 0 or "doc_key" not in d.columns):
                a = a.head(0).copy()
                if "conv_id" not in a.columns and len(a.columns):
                    a.insert(1, "conv_id", pd.Series(dtype=object))
                return a
            j = a.merge(d[["doc_key", "conv_id", "__ss"]], on="doc_key", how="inner")
            base = np.fromiter(
                (
                    np.frombuffer(s, dtype=np.int64)[ix]
                    for s, ix in zip(j["__ss"], j["sent_ix"])
                ),
                dtype=np.int64,
                count=len(j),
            )
            for f in pos:
                j[f] = (j[f].to_numpy().astype(np.int64) + base).astype(np.int32)
            j["sent_ix"] = j["sent_ix"].astype(np.int32)  # struct-field dtype
            for c in ("raw", "softmax"):
                if c in j.columns:
                    j[c] = j[c].astype(np.float32)
            cols = ["doc_key", "conv_id"] + [
                c for c in a.columns if c != "doc_key"
            ]
            return j[cols]

        out[col] = hash_coexchange(
            ann, dside, "doc_key", "doc_key", rebase, num_buckets
        )
    return out


def uncollate(pseudo_docs: ray.data.Dataset) -> ray.data.Dataset:
    """Pseudo-docs -> original sentence rows, regrouped by origin doc and
    re-sorted by original sentence index; missing-sentence check per doc
    happens naturally downstream (uncollate.py:73-74 analogue is the
    caller comparing counts)."""

    def explode(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = tbl["_orig_doc_key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        parents = pc.list_parent_indices(keys)
        sents = tbl["sentences"]
        if isinstance(sents, pa.ChunkedArray):
            sents = sents.combine_chunks()
        return pa.table(
            {
                "_orig_doc_key": pc.list_flatten(keys),
                "_orig_sent_ix": pc.list_flatten(tbl["_orig_sent_ix"].combine_chunks() if isinstance(tbl["_orig_sent_ix"], pa.ChunkedArray) else tbl["_orig_sent_ix"]),
                "tokens": pc.list_flatten(sents),
            }
        )

    flat = pseudo_docs.map_batches(explode, batch_format="pyarrow")

    def regroup(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["_orig_doc_key", "_orig_sent_ix"], ignore_index=True)

    return partitioned_map_groups(flat, "_orig_doc_key", regroup, num_buckets=16)
