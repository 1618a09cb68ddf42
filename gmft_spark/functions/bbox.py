"""Reusable bbox column expressions (JVM-side, codegen-friendly).

The column-expression form of the kernel's geometry (gmft_spark.kernel.
geometry; reference semantics /root/reference/gmft/base.py:5-67,
gmft/algorithm/structure.py:22-108). Every helper is pure
``greatest``/``least`` arithmetic so Catalyst keeps it inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def overlap_1d(a0: Column, a1: Column, b0: Column, b1: Column) -> Column:
    """Length of the intersection of intervals [a0,a1] and [b0,b1] (>= 0)."""
    return F.greatest(F.least(a1, b1) - F.greatest(a0, b0), F.lit(0.0))


def intersects(
    ax0: Column, ay0: Column, ax1: Column, ay1: Column,
    bx0: Column, by0: Column, bx1: Column, by1: Column,
) -> Column:
    """Strict-inequality 2-D intersection test (shared edges do NOT touch
    — reference base.py:26-33)."""
    return (F.greatest(ax0, bx0) < F.least(ax1, bx1)) & (
        F.greatest(ay0, by0) < F.least(ay1, by1)
    )


def iob_expr(
    ax0: Column, ay0: Column, ax1: Column, ay1: Column,
    bx0: Column, by0: Column, bx1: Column, by1: Column,
) -> Column:
    """Intersection area over the area of box A; 0 for degenerate A
    (reference structure.py:22-34)."""
    inter = overlap_1d(ax0, ax1, bx0, bx1) * overlap_1d(ay0, ay1, by0, by1)
    area = (ax1 - ax0) * (ay1 - ay0)
    return F.when(area > 0, inter / area).otherwise(F.lit(0.0))
