"""Adversarial-shape pins for the r6 additions q215-q218 and s101.

Same contract as test_new_ops.py: each fixture builds the corpus where
the operator's edge branch must fire, runs the driver-style oracle
parity gate on it, and then asserts the interesting row DIRECTLY (so a
bug that drops the edge case on both engines cannot hide behind
parity).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from astarte_data_updater_plant_spark.plans.registry import QUERIES, queries_map

queries_map()  # QUERIES fills lazily on operator-module import

from .oracle_utils import compare
from .test_new_ops import _events_table
from .test_zero_class import _docs_table, _mkdir_with


# -- q215: novelty decay ------------------------------------------------------


@pytest.fixture(scope="module")
def novelty_docs_dir(tmp_path_factory):
    """Batch 0 (doc_id 0-99): unique texts. Batch 1 (100-199): EXACT
    re-crawls of batch 0 — novelty must be exactly 0.0. Batch 2
    (200-204): brand-new vocabulary — novelty 1.0."""
    fresh = [
        f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}" for i in range(100)
    ]
    rows = [(i, fresh[i], "en", "web") for i in range(100)]
    rows += [(100 + i, fresh[i], "en", "recrawl") for i in range(100)]
    rows += [
        (200 + i, f"nova{i} super{i} ultra{i} mega{i} giga{i}", "en", "new")
        for i in range(5)
    ]
    return _mkdir_with(
        str(tmp_path_factory.mktemp("novelty")), {"documents": _docs_table(rows)}
    )


def test_q215_novelty_extremes(spark, novelty_docs_dir):
    spec = QUERIES["q215_novelty_decay"]
    ok, msg = compare(spec.fn(spark, novelty_docs_dir), spec.oracle, novelty_docs_dir)
    assert ok, f"q215: {msg}"
    rows = {r["batch"]: r for r in spec.fn(spark, novelty_docs_dir).collect()}
    assert rows[0]["novelty"] == 1.0  # first batch: everything is new
    assert rows[1]["novelty"] == 0.0 and rows[1]["n_new"] == 0  # pure re-crawl
    assert rows[2]["novelty"] == 1.0  # disjoint vocabulary
    # running distinct total only grows on novel batches
    assert rows[1]["distinct_total"] == rows[0]["distinct_total"]
    assert rows[2]["distinct_total"] == rows[1]["distinct_total"] + rows[2]["n_new"]


# -- q216 / q217: winsorized stats and bootstrap CI ---------------------------


@pytest.fixture(scope="module")
def outlier_events_dir(tmp_path_factory):
    """'flat' is constant-valued (p05 == p95, winsorizing is identity);
    'spiky' is 199 small values plus one enormous outlier that the
    p95 clamp must flatten; 'lone' has a single event (percentile of
    one value, and bootstrap replicates that miss it entirely)."""
    rows = []
    eid = 0
    for i in range(50):
        eid += 1
        rows.append((eid, i * 1_000_000, i % 7, "flat", 42.0))
    for i in range(199):
        eid += 1
        rows.append((eid, i * 1_000_000, i % 11, "spiky", 1.0 + (i % 5) * 0.25))
    eid += 1
    rows.append((eid, 1_000_000, 3, "spiky", 1_000_000.0))
    eid += 1
    rows.append((eid, 2_000_000, 4, "lone", 7.5))
    return _mkdir_with(
        str(tmp_path_factory.mktemp("outlier")), {"events": _events_table(rows)}
    )


def test_q216_winsor_edges(spark, outlier_events_dir):
    spec = QUERIES["q216_winsorized_stats"]
    ok, msg = compare(
        spec.fn(spark, outlier_events_dir), spec.oracle, outlier_events_dir
    )
    assert ok, f"q216: {msg}"
    rows = {r["event_type"]: r for r in spec.fn(spark, outlier_events_dir).collect()}
    flat = rows["flat"]
    assert flat["p05"] == flat["p95"] == 42.0
    assert flat["mean_raw"] == flat["mean_winsor"] == 42.0
    assert flat["n_clip_lo"] == flat["n_clip_hi"] == 0
    spiky = rows["spiky"]
    assert spiky["mean_winsor"] < spiky["mean_raw"]  # outlier flattened
    assert spiky["n_clip_hi"] >= 1
    lone = rows["lone"]
    assert lone["p05"] == lone["p95"] == 7.5 and lone["n"] == 1


def test_q217_bootstrap_edges(spark, outlier_events_dir):
    spec = QUERIES["q217_bootstrap_ci"]
    ok, msg = compare(
        spec.fn(spark, outlier_events_dir), spec.oracle, outlier_events_dir
    )
    assert ok, f"q217: {msg}"
    rows = {r["event_type"]: r for r in spec.fn(spark, outlier_events_dir).collect()}
    flat = rows["flat"]
    # constant values: every replicate mean is the constant, CI is a point
    assert flat["ci_lo"] == flat["ci_hi"] == flat["boot_mean"] == 42.0
    # a single-event group: replicates that miss the event emit NO
    # rep-mean row, so n_reps < BOOT_REPS on both engines (never NaN)
    lone = rows["lone"]
    assert 0 < lone["n_reps"] < 32
    assert lone["ci_lo"] == lone["ci_hi"] == 7.5
    spiky = rows["spiky"]
    assert spiky["ci_lo"] <= spiky["boot_mean"] <= spiky["ci_hi"]
    assert spiky["ci_lo"] < spiky["ci_hi"]  # outlier in/out moves replicates


# -- q218: centroid cosine matrix ---------------------------------------------


def _emb_table_labeled(rows: list[tuple[int, list[float], int]]) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


@pytest.fixture(scope="module")
def centroid_emb_dir(tmp_path_factory):
    """Labels 0 and 1 share one direction (cosine 1.0), label 2 is
    orthogonal to both (cosine 0.0), label 3 is anti-parallel to
    label 0 (cosine -1.0)."""
    e0 = [1.0, 0.0] + [0.0] * 62
    e1 = [0.0, 1.0] + [0.0] * 62
    rows = []
    vid = 0
    for lab, base, scale in ((0, e0, 1.0), (1, e0, 2.0), (2, e1, 1.0), (3, e0, -1.0)):
        for _ in range(3):
            vid += 1
            rows.append((vid, [x * scale for x in base], lab))
    return _mkdir_with(
        str(tmp_path_factory.mktemp("cent")),
        {"embeddings": _emb_table_labeled(rows)},
    )


def test_q218_centroid_geometry(spark, centroid_emb_dir):
    spec = QUERIES["q218_centroid_cosine_matrix"]
    ok, msg = compare(spec.fn(spark, centroid_emb_dir), spec.oracle, centroid_emb_dir)
    assert ok, f"q218: {msg}"
    rows = {
        (r["label_a"], r["label_b"]): r["centroid_cosine"]
        for r in spec.fn(spark, centroid_emb_dir).collect()
    }
    assert rows[(0, 1)] == 1.0  # same direction, different scale
    assert rows[(0, 2)] == 0.0 and rows[(1, 2)] == 0.0  # orthogonal
    assert rows[(0, 3)] == -1.0  # anti-parallel
    assert len(rows) == 6  # all unordered label pairs, no self-pairs


# -- s101: streaming bottom-k sample ------------------------------------------


@pytest.fixture(scope="module")
def bottomk_events_dir(tmp_path_factory):
    """'tiny' has 6 events total (< K=16: the sample must hold ALL of
    them, sample_k == n_seen); 'churn' has 300 events so later batches
    keep tightening the hash threshold (replacements happen)."""
    rows = []
    eid = 0
    for i in range(6):
        eid += 1
        rows.append((eid, i * 40_000_000, i, "tiny", 1.0))
    for i in range(300):
        eid += 1
        rows.append((eid, i * 1_000_000, 50 + i, "churn", 2.0))
    return _mkdir_with(
        str(tmp_path_factory.mktemp("bk")), {"events": _events_table(rows)}
    )


def test_s101_bottomk_sample(spark, bottomk_events_dir):
    spec = QUERIES["s101_stream_bottomk_sample"]
    ok, msg = compare(
        spec.fn(spark, bottomk_events_dir), spec.oracle, bottomk_events_dir
    )
    assert ok, f"s101: {msg}"
    rows = spec.fn(spark, bottomk_events_dir).collect()
    tiny = sorted(
        (r for r in rows if r["event_type"] == "tiny"), key=lambda r: r["seq"]
    )
    # below capacity the reservoir is lossless: occupancy = seen count,
    # every arrival enters the sample
    seen = 0
    for r in tiny:
        seen += r["n_arrived"]
        assert r["sample_k"] == seen
        assert r["n_new_members"] == r["n_arrived"]
    churn = sorted(
        (r for r in rows if r["event_type"] == "churn"), key=lambda r: r["seq"]
    )
    # at capacity: occupancy pinned to K and the KMV threshold is
    # non-increasing batch over batch
    assert churn[-1]["sample_k"] == 16
    full = [r for r in churn if r["sample_k"] == 16]
    for a, b in zip(full, full[1:]):
        assert b["max_h"] <= a["max_h"]
    # at least one later batch actually replaced members
    assert any(r["n_new_members"] > 0 for r in churn[1:])
