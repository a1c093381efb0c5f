"""Detail/summary sinks (SURVEY.md §2.1 S9/S10).

- ``write_json_detail``  — full extraction records as JSON lines
  (reference: ai_processor.py:459-466 AIWriter.save_detailed_json)
- ``write_summary_txt``  — run summary rendered from ONE small aggregate
  (reference: csv_handler.py:113-156 create_summary_txt,
  run_production.py:132-148). The only driver-side collect is the
  status-bucket aggregate — a handful of rows by construction, never the
  data.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_json_detail(results: DataFrame, path: str,
                      mode: str = "overwrite") -> None:
    """S9: one JSON object per extraction record (df.write.json — stays
    distributed; no driver materialization)."""
    results.write.mode(mode).json(path)


def summary_stats(results: DataFrame) -> dict:
    """One aggregate pass → a driver-small dict of run counters."""
    by_status = {
        r["status"]: r["n"]
        for r in results.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    agg = results.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("success"), 1).otherwise(0)).alias("succeeded"),
        F.avg("confidence").alias("avg_confidence"),
        F.avg("issuer_conf").alias("avg_issuer_conf"),
        F.sum(F.when(F.col("issuer") == "XXX", 1).otherwise(0)).alias("xxx"),
        F.sum(
            F.when(F.col("payee_cleaned") == "GOVERNMENT", 1).otherwise(0)
        ).alias("government_payees"),
    ).collect()[0]
    return {
        "total": int(agg["total"]),
        "succeeded": int(agg["succeeded"] or 0),
        "xxx": int(agg["xxx"] or 0),
        "government_payees": int(agg["government_payees"] or 0),
        "avg_confidence": float(agg["avg_confidence"] or 0.0),
        "avg_issuer_conf": float(agg["avg_issuer_conf"] or 0.0),
        "by_status": dict(sorted(by_status.items())),
    }


def render_summary(stats: dict, wall_seconds: float | None = None) -> str:
    """Deterministic text block mirroring the reference's summary layout
    (counters, success rate, throughput projection)."""
    total = stats["total"]
    ok = stats["succeeded"]
    lines = [
        "EXTRACTION RUN SUMMARY",
        "=" * 40,
        f"Total turns processed : {total}",
        f"Successful            : {ok}",
        f"Success rate          : {ok / total * 100:.2f}%" if total else
        "Success rate          : n/a",
        f"Issuer = XXX          : {stats['xxx']}",
        f"Government payees     : {stats['government_payees']}",
        f"Avg line confidence   : {stats['avg_confidence']:.4f}",
        f"Avg issuer confidence : {stats['avg_issuer_conf']:.4f}",
        "",
        "Status buckets:",
    ]
    for status, n in stats["by_status"].items():
        lines.append(f"  {status:<20} {n}")
    if wall_seconds is not None and wall_seconds > 0:
        lines += [
            "",
            f"Wall time             : {wall_seconds:.1f}s",
            f"Throughput            : {total / wall_seconds:.1f} turns/sec",
        ]
    return "\n".join(lines) + "\n"


def write_summary_txt(results: DataFrame, path: str,
                      wall_seconds: float | None = None) -> str:
    """S10: aggregate → render → write; returns the rendered text."""
    text = render_summary(summary_stats(results), wall_seconds)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(text)
    return text
