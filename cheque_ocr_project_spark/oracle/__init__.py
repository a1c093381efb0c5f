"""Pure-Python oracle: exact reference extraction semantics.

Every function here reproduces, bit-for-bit, a deterministic text stage of the
reference pipeline (citations in each module). The Spark pipeline is tested
for per-turn equality against this module; the Arrow-batched UDFs import it
directly so there is exactly one definition of each grammar.
"""

from cheque_ocr_project_spark.oracle import (  # noqa: F401
    cleaning,
    classify,
    fuzzy,
    govrules,
    grammars,
    issuer,
    payee,
    predicates,
    turn,
    vocab,
)
