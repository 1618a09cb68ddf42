"""Full-pipeline cross-check: the vectorized kernel must byte-match a
deliberately naive loop-based transcription of the reference semantics
(tests/reference_oracle.py) on hundreds of randomized scenes and config
combinations."""

import numpy as np
import pytest

from gmft_spark.config import ExtractConfig
from gmft_spark.kernel.synth import synth_scene
from gmft_spark.kernel.table import extract_table

from tests.reference_oracle import oracle_extract

CONFIGS = [
    ExtractConfig(),
    ExtractConfig(semantic_spanning_cells=True),
    ExtractConfig(enable_multi_header=True),
    ExtractConfig(
        semantic_spanning_cells=True,
        enable_multi_header=True,
        semantic_hierarchical_left_fill="deep",
    ),
    ExtractConfig(force_large_table_assumption=True),
    ExtractConfig(remove_null_rows=False),
]


def _compare(scene, tbl, cfg):
    res = extract_table(
        tbl.scores,
        tbl.labels,
        tbl.boxes,
        scene.word_boxes,
        scene.word_texts,
        tbl.bbox,
        cfg,
        angle=tbl.angle,
    )
    oracle_means = []
    status, csv, top_header, proj, hier_left, outliers = oracle_extract(
        tbl.scores,
        tbl.labels,
        tbl.boxes,
        scene.word_boxes,
        scene.word_texts,
        tbl.bbox,
        cfg,
        angle=tbl.angle,
        row_means_out=oracle_means,
    )
    assert res.status == status, (scene.conv_id, scene.turn_idx, tbl.table_id)
    # F7b: per-row word-midpoint tracking exists iff large_table_guess
    # fired, with identical per-row sequences (word order preserved)
    if res.row_means is None:
        assert oracle_means == []
    else:
        assert len(res.row_means) == len(oracle_means)
        for got, want in zip(res.row_means, oracle_means):
            assert got == pytest.approx(want)
    if status == "ok":
        assert res.csv == csv, (scene.conv_id, scene.turn_idx, tbl.table_id, cfg)
        assert res.top_header == top_header
        assert res.projecting == proj
        assert res.hier_left == hier_left
    # outliers: same keys, same skipped text, same warn values
    assert set(res.outliers) == set(outliers)
    for k in outliers:
        if isinstance(outliers[k], float):
            assert res.outliers[k] == pytest.approx(outliers[k])
        else:
            assert res.outliers[k] == outliers[k]


@pytest.mark.parametrize("cfg_idx", range(len(CONFIGS)))
def test_kernel_matches_naive_oracle_on_scenes(cfg_idx):
    cfg = CONFIGS[cfg_idx]
    n_scenes = 60
    n_tables = 0
    for i in range(n_scenes):
        scene = synth_scene(f"oracle-{cfg_idx}", i)
        for tbl in scene.tables:
            _compare(scene, tbl, cfg)
            n_tables += 1
    assert n_tables >= n_scenes


def test_kernel_matches_oracle_with_spanning_boxes():
    """Scenes augmented with synthetic spanning-cell predictions so the
    F10/F11 classification paths execute under the oracle comparison."""
    rng = np.random.RandomState(7)
    cfg = ExtractConfig(semantic_spanning_cells=True, enable_multi_header=True)
    checked = 0
    for i in range(40):
        scene = synth_scene("span-oracle", i)
        for tbl in scene.tables:
            h = tbl.bbox[3] - tbl.bbox[1]
            w = tbl.bbox[2] - tbl.bbox[0]
            extra = []
            for _ in range(3):
                y0 = float(rng.uniform(0, h * 0.8))
                x0 = float(rng.uniform(0, w * 0.8))
                extra.append(
                    (
                        float(rng.uniform(0.5, 1.0)),
                        5,
                        [x0, y0, x0 + float(rng.uniform(10, w / 2)),
                         y0 + float(rng.uniform(5, 40))],
                    )
                )
            scores = np.concatenate([tbl.scores, [e[0] for e in extra]])
            labels = np.concatenate([tbl.labels, [e[1] for e in extra]])
            boxes = np.concatenate(
                [tbl.boxes, np.array([e[2] for e in extra])]
            )
            tbl2 = type(tbl)(
                tbl.table_id, tbl.bbox, scores, labels, boxes, tbl.angle
            )
            _compare(scene, tbl2, cfg)
            checked += 1
    assert checked >= 40
