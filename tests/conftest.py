from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"


def _activate_proto_shim() -> None:
    """r10 (verdict #5): unblock the transformWithStateInPandas replay
    test when the host carries a pure-Python protobuf anywhere. The
    container ships no google.protobuf, but this host's google-cloud-sdk
    bundles protobuf 6.32.0 under platform/google_appengine;
    .proto_shim/sitecustomize.py puts it on sys.path and relaxes ONLY
    the gencode-minor-version refusal (6.33 gencode on 6.32 runtime —
    identical wire format). Must run at conftest IMPORT time: PYTHONPATH
    has to be exported before the first SparkSession starts so the
    Python workers Spark spawns (which speak the protobuf state-server
    protocol) inherit it. No-op when real protobuf exists or the SDK
    copy is absent — the test keeps its skip gate either way."""
    try:
        import google.protobuf  # noqa: F401
        return  # a real protobuf is installed; nothing to shim
    except ImportError:
        pass
    import os
    shim = Path(REPO) / ".proto_shim"
    sdk = Path("/usr/lib/google-cloud-sdk/platform/google_appengine")
    if not ((shim / "sitecustomize.py").exists()
            and (sdk / "google/protobuf/descriptor.py").exists()):
        return
    os.environ["PYTHONPATH"] = (
        str(shim) + os.pathsep + os.environ.get("PYTHONPATH", ""))
    sys.path.insert(0, str(shim))
    import sitecustomize  # noqa: F401  (executes the shim in-process)


_activate_proto_shim()


@pytest.fixture(scope="session")
def spark():
    from multiagent_document_etl_system_spark import get_spark

    s = get_spark(app_name="tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from multiagent_document_etl_system_spark.io import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con
