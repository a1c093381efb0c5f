"""Optional model-backed extraction phase (SURVEY.md §2.11 U2-U5).

The reference's AI path (ai_processor.py / pure_ai_processor.py) runs HF
pipelines per image: NER (dslim/bert-base-NER), zero-shot verification
(bart-large-mnli), QA extraction (distilbert-squad) and T5 spell
correction. Those models are non-deterministic across versions and are NOT
part of the per-turn equality contract (SURVEY.md §3.3) — the deterministic
replacements are the F13 spelling map and the difflib J2 match.

This module ships the *Spark plumbing* for that phase in the shape a
model-holding UDF must have at 100 TB:

- iterator-of-batches pandas UDF (``mapInPandas``) so the model loads ONCE
  per python worker, not per batch (the reference's singleton caches,
  cheque_classifier.py:274-281, become worker-process globals);
- ``transformers`` imported lazily behind a try; absent (this container),
  the stage degrades to a deterministic keyword-NER fake so the pipeline
  stays runnable and testable end-to-end;
- inputs truncated to 512 chars like the reference (ai_processor.py:159).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORKER_STATE: dict = {}

NER_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("entities", T.ArrayType(T.StructType([
        T.StructField("entity", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]))),
    T.StructField("backend", T.StringType()),
])

_FAKE_ORG_HINTS = (
    "LTD", "PVT", "ENTERPRISES", "INDUSTRIES", "TRADERS", "BANK", "CO",
    "STORES", "AGENCIES", "TEXTILES",
)
_CAP_SPAN = re.compile(r"\b([A-Z][A-Z]+(?:\s+[A-Z][A-Z]+){0,3})\b")


def _load_ner():
    """Once per python worker. Real model if transformers is installed,
    else the deterministic keyword fake (clearly labeled in `backend`)."""
    if "ner" in _WORKER_STATE:
        return _WORKER_STATE["ner"]
    try:  # pragma: no cover - transformers not in this container
        from transformers import pipeline

        model = pipeline("ner", model="dslim/bert-base-NER",
                         aggregation_strategy="simple")

        def run(text: str):
            return [
                {"entity": e["word"], "label": e["entity_group"],
                 "score": float(e["score"])}
                for e in model(text[:512])
            ], "hf"
    except ImportError:
        def run(text: str):
            out = []
            for m in _CAP_SPAN.finditer(text[:512].upper()):
                span = m.group(1)
                label = "ORG" if any(h in span.split() for h in _FAKE_ORG_HINTS) else "PER"
                out.append({"entity": span, "label": label,
                            "score": round(min(1.0, len(span) / 30 + 0.5), 4)})
            return out[:10], "fake"
    _WORKER_STATE["ner"] = run
    return run


def ner_entities(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    """Per-turn named entities (U2 shape: lazy per-worker model init)."""

    def batches(pdf_iter):
        run = _load_ner()
        for pdf in pdf_iter:
            ents, backends = [], []
            for text in pdf["text"]:
                e, backend = run(text or "")
                ents.append(e)
                backends.append(backend)
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"].values,
                "turn_idx": pdf["turn_idx"].values,
                "entities": ents,
                "backend": backends,
            })

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        batches, schema=NER_SCHEMA
    )


def ensemble_confidence(ocr_conf, ner_conf, context_conf, spelling_conf):
    """K3 ensemble weights (ai_processor.py:75-80): native column math."""
    return (
        0.3 * ocr_conf + 0.4 * ner_conf + 0.2 * context_conf + 0.1 * spelling_conf
    )
