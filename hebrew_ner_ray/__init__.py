"""hebrew_ner_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the query/data-processing capabilities of the reference
Hebrew-NER stack (Yu-val-weiss/hebrew-ner, read-only at /root/reference)
as idiomatic Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches``
over zero-copy Arrow batches, actor pools for stateful stages,
groupby/aggregate/sort for the wide steps.

This is a from-scratch build, not a port: the reference tells us WHAT to
compute (BIOSE label algebra, Hebrew tokenization, morphological lattice
pruning, token↔morpheme alignment, span extraction), and we re-express
each piece as a batch transform over Arrow data.
"""

__version__ = "0.1.0"
