"""Multi-dataset union processing (SURVEY.md T8, D2).

The reference trains one model over a union of corpora, with per-dataset
label namespaces ``{dataset}__{task}_labels`` selecting a submodel per
document (``doc/model.md:55-102``; ``training_config/multi_dataset.jsonnet``)
and task toggles per namespace (``models/dygie.py:226-254``).

Ray-Data-first shape: the ``dataset`` column routes each document
through the config registered for its namespace — a vectorized filter
per namespace feeding an extraction stage with that namespace's labels,
predicates and task toggles, then ``Dataset.union`` of the outputs.
Documents with an unregistered namespace raise (mirroring the
reference's vocabulary KeyError).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..semantics import ExtractionConfig
from .extract import extract


def extract_multi_dataset(
    docs: ray.data.Dataset,
    configs: dict[str, ExtractionConfig],
    **extract_kw,
) -> ray.data.Dataset:
    """documents (with a ``dataset`` column) -> union of per-namespace
    extraction outputs.

    Note: disabled tasks in one namespace produce missing columns in
    that branch; the union keeps each branch's schema (consumers select
    per-namespace outputs by filtering ``dataset``), so enable the same
    task set per namespace when a homogeneous table is needed.
    """
    known = pa.array(sorted(configs), pa.string())

    def check(tbl: pa.Table) -> pa.Table:
        bad = tbl.filter(pc.invert(pc.is_in(tbl["dataset"], value_set=known)))
        if bad.num_rows:
            raise KeyError(
                f"unregistered dataset namespace(s): "
                f"{set(bad['dataset'].to_pylist())}"
            )
        return tbl

    checked = docs.map_batches(check, batch_format="pyarrow", batch_size=None)
    branches = []
    for name, cfg in sorted(configs.items()):
        branch = checked.map_batches(
            lambda t, n=name: t.filter(pc.equal(t["dataset"], n)),
            batch_format="pyarrow",
            batch_size=None,
        )
        branches.append(extract(branch, cfg, **extract_kw))
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out
