from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from etl_extractor_spark.session import get_spark

    s = get_spark(app_name="etl-extractor-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def pinned_driver_checked(max_round: int) -> dict:
    """Latest-checked round per query name computed from ONLY the
    committed CORRECTNESS_r01..r{max_round} files — a truly FROZEN
    snapshot for registry simulations. Filtering the live
    ``_driver_checked()`` map by round instead (the first fix's form)
    DRIFTS: that map collapses to the latest round per name, so a
    name re-checked in a later round silently drops out of the
    'pinned' state as new rounds land (review catch, twice)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        if not m or rnd > max_round:
            continue
        try:
            with open(path) as f:
                for name in json.load(f):
                    latest[name] = max(latest.get(name, 0), rnd)
        except Exception:
            continue
    return latest
