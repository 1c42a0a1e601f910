from __future__ import annotations

import pandas as pd
import pytest

from fluent_server_spark.data.synth import synth_turns_pandas
from fluent_server_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fss-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def turns_pdf() -> pd.DataFrame:
    # unit/smoke size per FIXTURES.md: ~1k turns / 100 conversations
    return synth_turns_pandas(2000, n_convs=100)


@pytest.fixture(scope="session")
def turns_sdf(spark, turns_pdf):
    return spark.createDataFrame(turns_pdf)


@pytest.fixture(scope="session")
def vecs():
    """6-cluster synthetic embeddings (dim 16) for ANN/IVF tests."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(6, 16) * 3
    pts = np.vstack([c + rng.randn(20, 16) * 0.4 for c in centers])
    return pts.astype(np.float64)


@pytest.fixture(scope="session")
def vec_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def assert_pdf_equal(a: pd.DataFrame, b: pd.DataFrame, sort_cols: list[str]):
    a = a.sort_values(sort_cols).reset_index(drop=True)
    b = b.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_like=True)
