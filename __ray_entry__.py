"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in ``dygiepp_ray``) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG pipeline on /root/testdata/sf0.001: documents table ->
    transcripts -> assembled document windows -> joint extraction ->
    canonicalized entities -> deduped (subj, pred, obj) triples."""
    from dygiepp_ray.pipelines.kg import from_documents_table

    pipe = from_documents_table("/root/testdata/sf0.001")
    return pipe.triples()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from dygiepp_ray.pipelines.queries import all_queries

    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL equivalents over the pre-registered views.
    Entries absent here (vs queries()) are non-SQL-expressible ops —
    signatures/fingerprints/LSH/heuristics — checked rows-only."""
    from dygiepp_ray.pipelines.queries import all_queries

    return {name: sql for name, (fn, sql) in all_queries().items() if sql is not None}
