"""Empty-input robustness: every registry query must execute (not
necessarily return rows) against a dataset where every table has zero
rows — the fresh-deploy / filtered-to-empty / empty-partition case.

Found and fixed in round 4: six numpy training/scoring paths raised
AxisError on empty matrices (kmeans_centroids, pq_train_codebooks,
knn_bruteforce_pandas and their consumers), MLlib LSH fit threw on an
empty corpus, and cdc_incremental_agg dereferenced a missing aggregate
version. Guards now return empty typed frames / zero aggregates.
"""

import os

import pyarrow.parquet as pq
import pytest

from simple_cdc_service_spark.registry import REGISTRY
from simple_cdc_service_spark.sources.tables import TABLES

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        f = pq.ParquetFile(f"{SRC}/{t}.parquet")
        pq.write_table(f.schema_arrow.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_sf):
    failures = {}
    for name, spec in REGISTRY.items():
        try:
            spec.fn(spark, empty_sf).collect()
        except Exception as e:  # noqa: BLE001 - collecting the full report
            failures[name] = f"{type(e).__name__}: {str(e)[:120]}"
    assert not failures, failures


# ---------------------------------------------------------------------------
# dirty-input sweep: nulls and empty strings in nullable columns
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    """sf0.001 with realistic crawl dirt: null text, empty-string text,
    null props, NaN values."""
    import numpy as np
    import pandas as pd

    d = tmp_path_factory.mktemp("sf_dirty")
    for t in TABLES:
        pdf = pd.read_parquet(f"{SRC}/{t}.parquet")
        if t == "documents":
            pdf.loc[pdf.index % 10 == 0, "text"] = None
            pdf.loc[pdf.index % 7 == 0, "text"] = ""
        if t == "events":
            pdf.loc[pdf.index % 11 == 0, "props"] = None
            pdf.loc[pdf.index % 13 == 0, "value"] = np.nan
        pdf.to_parquet(str(d / f"{t}.parquet"))
    return str(d)


def test_every_query_survives_dirty_inputs(spark, dirty_sf):
    """Null/empty text must not blow up any pass (found in round 4: ANSI
    divide-by-zero in quality ratios and jaccard verify on empty token
    sets; HashingTF on null arrays). Empty documents now yield NULL
    ratios / drop out of dedup verification instead of failing the job."""
    failures = {}
    for name, spec in REGISTRY.items():
        try:
            spec.fn(spark, dirty_sf).collect()
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {str(e)[:120]}"
    assert not failures, failures
