"""Extraction configuration.

Mirrors the knobs of the reference's TATRFormatConfig
(/root/reference/gmft/impl/tatr/config.py:46-180) so that results are
comparable, but is an independent dataclass with no model/torch settings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional


def _default_required_confidence() -> dict:
    # per-label minimum score (>=) for a predicted box to be considered.
    # labels: 0 table, 1 column, 2 row, 3 column header,
    #         4 projected row header, 5 spanning cell, 6 no object
    # (reference: impl/tatr/config.py:77-87)
    return {0: 0.3, 1: 0.3, 2: 0.3, 3: 0.3, 4: 0.5, 5: 0.5, 6: 99.0}


@dataclass
class ExtractConfig:
    """Deterministic-extraction knobs (reference: impl/tatr/config.py)."""

    cell_required_confidence: dict = field(
        default_factory=_default_required_confidence
    )

    remove_null_rows: bool = True
    enable_multi_header: bool = False
    semantic_spanning_cells: bool = False
    semantic_hierarchical_left_fill: Optional[
        Literal["algorithm", "deep"]
    ] = "algorithm"

    # large-table heuristics (config.py:122-149)
    large_table_if_n_rows_removed: int = 8
    large_table_threshold: int = 10
    large_table_row_overlap_threshold: float = 0.2
    large_table_maximum_rows: int = 1000
    force_large_table_assumption: Optional[bool] = None

    # rejection / warning thresholds (config.py:153-166)
    total_overlap_reject_threshold: float = 0.9
    total_overlap_warn_threshold: float = 0.1
    nms_warn_threshold: int = 5
    iob_reject_threshold: float = 0.05
    iob_warn_threshold: float = 0.5

    # technical (config.py:170-180)
    nms_overlap_threshold: float = 0.1
    large_table_merge_distance: float = 0.6
    smallest_supported_text_height: float = 0.1


# integer label ids (reference: formatters/tatr.py:42-50)
LABEL_TABLE = 0
LABEL_COLUMN = 1
LABEL_ROW = 2
LABEL_COLUMN_HEADER = 3
LABEL_PROJECTED_ROW_HEADER = 4
LABEL_SPANNING_CELL = 5
LABEL_NO_OBJECT = 6
