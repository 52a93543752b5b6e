"""Dataset quality checks over the framework's Parquet artifacts.

The reference kept DuckDB query cookbooks for completeness, duplicates,
class balance, and shape/duration distributions
(.charles/urbansound8k_sql.md §12-§15, .charles/music2abc2mid_sql.md:22-101),
plus the queryable ``processing_success`` failure column. This module turns
those ad-hoc queries into callable checks (pandas — duckdb is not in this
image) producing one structured report per dataset.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["urbansound_quality_report", "music_quality_report",
           "format_report"]


def _read(parquet_path: str):
    import pyarrow.parquet as pq
    return pq.read_table(parquet_path).to_pandas()


def urbansound_quality_report(parquet_path: str) -> Dict:
    """Completeness / duplicates / fold & class balance / shape checks for
    the UrbanSound8K feature Parquet."""
    df = _read(parquet_path)
    ok = df[df["processing_success"]]
    shapes = ok["mel_shape"].map(tuple)
    report = {
        "rows": int(len(df)),
        "failed_rows": int((~df["processing_success"]).sum()),
        "duplicate_files": int(df["slice_file_name"].duplicated().sum()),
        "folds": {int(k): int(v) for k, v in
                  ok["fold"].value_counts().sort_index().items()},
        "class_balance": {str(k): int(v) for k, v in
                          ok["class_name"].value_counts().items()},
        "distinct_shapes": sorted({tuple(int(x) for x in s) for s in shapes}),
        "all_shapes_equal": int(shapes.nunique()) <= 1,
        "nan_features": int(sum(
            np.isnan(np.asarray(v, np.float32)).any() for v in ok["log_mel"])),
    }
    counts = list(report["class_balance"].values())
    if counts:
        report["class_imbalance_ratio"] = round(max(counts) / max(min(counts), 1), 2)
    return report


def music_quality_report(parquet_path: str) -> Dict:
    """Completeness / duration & token distributions / metadata coverage for
    the music_dataset Parquet (music2abc2mid_sql.md checks)."""
    df = _read(parquet_path)
    ok = df[df["processing_success"]]
    durations = ok["duration"].to_numpy()
    tokens = ok["abc_tokens"].to_numpy()
    report = {
        "rows": int(len(df)),
        "failed_rows": int((~df["processing_success"]).sum()),
        "duplicate_files": int(df["filename"].duplicated().sum()),
        "duration_s": _dist(durations),
        "abc_tokens": _dist(tokens),
        "empty_abc": int((ok["abc_string"].str.len() == 0).sum()),
        "missing_tempo": int((ok["tempo"] == 0).sum()),
        "missing_key": int((ok["key_signature"] == "").sum()),
        "sample_rates": {int(k): int(v) for k, v in
                         ok["sample_rate"].value_counts().items()},
    }
    return report


def _dist(x: np.ndarray) -> Dict:
    if len(x) == 0:
        return {"n": 0}
    return {"n": int(len(x)), "min": float(np.min(x)),
            "p50": float(np.median(x)), "mean": float(np.mean(x)),
            "max": float(np.max(x))}


def format_report(report: Dict, title: str = "dataset quality") -> str:
    import json
    lines = [f"== {title} =="]
    for k, v in report.items():
        lines.append(f"{k:<24} {json.dumps(v, default=str)}")
    return "\n".join(lines)
