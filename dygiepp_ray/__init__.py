"""dygiepp_ray — a Ray-Data-native knowledge-graph construction engine.

Re-implements the query / data-processing capabilities of DyGIE++
(``dwadden/dygiepp``, survey: SURVEY.md) from scratch on Ray Data:
span-based joint NER / relation / event / coreference extraction over
multi-turn transcript tables, entity canonicalization, and (subj, pred,
obj) triple materialization — expressed as ``ray.data.Dataset``
pipelines of vectorized ``map_batches`` over Arrow batches, with actor
pools for stateful stages and explicit partitioning for the wide steps.

The reference's neural scorers are replaced by deterministic,
lexicon-featurized scorers (see ``semantics.py``) shared verbatim by

* the distributed Ray Data engine (``stages/``, ``pipelines/``), and
* a single-process pure-Python oracle that follows the reference's
  control flow document-at-a-time (``oracle.py``),

so extraction parity (P/R >= 0.95 under ports of the reference's own
scorers, ``functions/metrics.py``) is testable without model weights.
"""

__version__ = "0.1.0"
