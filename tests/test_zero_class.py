"""Zero-member audits for the eval-metric operators (r5 verdict #5).

Each eval operator must treat an empty class / query set / bin
identically on Spark and on the DuckDB oracle — explicit zero row,
NULL metric, or absent row, but the SAME choice on both engines.
The shared-corpus parity gate can't pin this (the synthetic corpus has
no empty classes), so these tests build adversarial corpora where:

- a source's ground truth is single-class (tp+fn = 0 -> recall NULL,
  f1 0 or NULL) .......................................... q146
- labeled languages are missing entirely (absent matrix rows) and
  single-token/empty documents flow through the tokenizer .. q163, q178
- most calibration bins are empty (absent rows, not zeros) .. q186
- the ANN corpus has FEWER vectors than TOP_K (deficit recall
  denominators) or NO query vectors at all (empty result) ... q107, q119

The pin is oracle parity itself: whatever the semantics, both engines
must agree on the adversarial shape.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from astarte_data_updater_plant_spark.plans.registry import QUERIES, queries_map
from astarte_data_updater_plant_spark.sources.tables import TABLES

from .oracle_utils import compare

SRC = "/root/testdata/sf0.001"

LONG = ("quality content paragraph with many diverse words " * 8).strip()


def _mkdir_with(base, overrides: dict[str, pa.Table]) -> str:
    os.makedirs(base, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(base, f"{t}.parquet")
        if t in overrides:
            pq.write_table(overrides[t], dst)
        elif not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    return base


def _docs_table(rows: list[tuple[int, str, str, str]]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )


def _emb_table(vec_ids: list[int]) -> pa.Table:
    # deterministic 64-dim vectors, distinct directions per id
    vecs = [
        [((7 * v + 13 * d) % 29 - 14) / 14.0 for d in range(64)]
        for v in vec_ids
    ]
    return pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([v % 3 for v in vec_ids], pa.int32()),
        }
    )


@pytest.fixture(scope="module")
def adversarial_docs_dir(tmp_path_factory):
    """Only en/fr labels; one all-short source (truth never positive);
    single-token and empty documents."""
    rows = [
        (0, "tok", "en", "s_allshort"),
        (1, "", "en", "s_allshort"),
        (2, "short words only here", "fr", "s_allshort"),
        (3, "tiny", "fr", "s_allshort"),
        (4, LONG, "fr", "s_alllong"),
        (5, LONG + " extra tail tokens", "fr", "s_alllong"),
        (6, LONG + " different ending", "en", "s_alllong"),
        (7, "medium length document with a handful of words", "en", "s_mixed"),
        (8, LONG + " mixed source long doc", "en", "s_mixed"),
        (9, "x", "en", "s_mixed"),
    ]
    return _mkdir_with(
        str(tmp_path_factory.mktemp("zerodocs")), {"documents": _docs_table(rows)}
    )


@pytest.fixture(scope="module")
def deficit_ann_dir(tmp_path_factory):
    """3 vectors total: one query (vec 0), 2 neighbors < TOP_K=3."""
    return _mkdir_with(
        str(tmp_path_factory.mktemp("zeroann")), {"embeddings": _emb_table([0, 1, 2])}
    )


@pytest.fixture(scope="module")
def no_query_ann_dir(tmp_path_factory):
    """No vec_id divisible by QUERY_STRIDE: the query set is EMPTY and
    both engines must return an empty recall report."""
    return _mkdir_with(
        str(tmp_path_factory.mktemp("zeroq")),
        {"embeddings": _emb_table(list(range(1, 21)))},
    )


def _assert_parity(spark, name: str, sf_dir: str):
    df = queries_map()[name](spark, sf_dir)
    ok, msg = compare(df, QUERIES[name].oracle, sf_dir)
    assert ok, f"{name} diverges from oracle on adversarial corpus: {msg}"
    return df


def test_q146_prf_single_class_source(spark, adversarial_docs_dir):
    df = _assert_parity(spark, "q146_classifier_prf", adversarial_docs_dir)
    rows = {r["source"]: r for r in df.collect()}
    r = rows["s_allshort"]
    # truth has zero positives: recall must be NULL (0/0), never 0.0
    assert r["tp"] == 0 and r["fn"] == 0
    assert r["recall"] is None


def test_q163_confusion_missing_languages(spark, adversarial_docs_dir):
    df = _assert_parity(spark, "q163_langid_confusion", adversarial_docs_dir)
    labels = {r["labeled_lang"] for r in df.collect()}
    # absent classes are absent ROWS (both engines), not zero rows
    assert labels <= {"en", "fr"}


def test_q186_calibration_empty_bins_absent(spark, adversarial_docs_dir):
    df = _assert_parity(spark, "q186_calibration_bins", adversarial_docs_dir)
    rows = df.collect()
    assert 0 < len(rows) < 10  # tiny corpus cannot fill all 10 bins
    for r in rows:
        assert r["n_docs"] > 0  # bins present only when populated


def test_q178_bigram_filter_single_token_corpus(spark, adversarial_docs_dir):
    # end-to-end run over a corpus containing 1-token and empty docs:
    # the guarded bigram expression must neither throw nor diverge
    _assert_parity(spark, "q178_bigram_lm_filter", adversarial_docs_dir)


def test_q107_recall_deficit_corpus(spark, deficit_ann_dir):
    df = _assert_parity(spark, "q107_ivf_recall", deficit_ann_dir)
    rows = df.collect()
    # one query, at most 2 exact neighbors; denominator stays TOP_K
    assert [r["query_id"] for r in rows] == [0]
    assert all(r["recall"] <= 2 / 3 + 1e-9 for r in rows)


def test_q119_recall_deficit_corpus(spark, deficit_ann_dir):
    df = _assert_parity(spark, "q119_pq_recall", deficit_ann_dir)
    assert [r["query_id"] for r in df.collect()] == [0]


def test_q107_q119_empty_query_set(spark, no_query_ann_dir):
    for name in ("q107_ivf_recall", "q119_pq_recall"):
        df = _assert_parity(spark, name, no_query_ann_dir)
        assert df.count() == 0
