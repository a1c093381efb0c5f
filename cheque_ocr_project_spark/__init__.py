"""cheque_ocr_project_spark — a PySpark-native field-extraction engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference pipeline (mjitdevelopers/cheque-ocr-project) over Spark DataFrames:

- ``oracle``     pure-Python reference semantics (single source of truth,
                 imported by the Arrow-batched UDFs AND by the tests)
- ``functions``  native Spark Column/SQL builders (Catalyst-optimizable)
- ``operators``  Arrow-batched pandas-UDF stages (fuzzy match, dedup, ANN, ...)
- ``sources``    transcripts synthesis, IO, keyed merge, checkpoint manifest
- ``plans``      pipeline composition (salting, window ordering, top-1 select)
- ``streaming``  Structured Streaming wrapper for incremental extraction

Design note: the reference is a single-machine row-at-a-time Python dataflow;
this package declares the same logic as DataFrame plans so Catalyst handles
predicate pushdown, column pruning, broadcast joins and AQE skew handling.
"""

__version__ = "0.1.0"
