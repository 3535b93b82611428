"""The committed expected-output parquet (driver oracles for the x_*
extraction/multimodal queries) must match a fresh regeneration from the
single-process kernel — stale files fail here, not in the driver gate."""

import os

import pandas as pd
import pytest

from tools.gen_expected import GENERATORS, expected_dir

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(GENERATORS))
def test_committed_expected_is_fresh(name):
    path = os.path.join(expected_dir(SF_DIR), f"{name}.parquet")
    assert os.path.exists(path), f"run tools/gen_expected.py — missing {path}"
    committed = pd.read_parquet(path)
    fresh = GENERATORS[name](SF_DIR)
    assert list(committed.columns) == list(fresh.columns)
    assert committed.dtypes.equals(fresh.dtypes)
    pd.testing.assert_frame_equal(
        committed.reset_index(drop=True), fresh.reset_index(drop=True)
    )
