"""Single shared activation for the pure-Python protobuf shim.

transformWithStateInPandas's Python<->JVM state protocol rides the
``protobuf`` package, which this container does not pip-ship — but the
host's google-cloud-sdk bundles protobuf 6.32.0 under
platform/google_appengine. ``.proto_shim/sitecustomize.py`` puts that
copy on sys.path and relaxes ONLY the gencode-minor-version refusal
(6.33 gencode on a 6.32 runtime — identical wire format).

Activation must happen BEFORE the first SparkSession starts: the shim
dir is exported on PYTHONPATH so the Python workers Spark spawns (which
speak the protobuf state-server protocol) inherit it. Call sites:
tests/conftest.py (at import time) and ``tools/check_oracle.py --shim``.
Keeping ONE implementation here is deliberate — the r11 review caught
the two call sites drifting apart as separate near-copies.

No-op (True) when a real protobuf is installed; False when neither the
shim nor the SDK copy exists, in which case env-gated queries stay
unregistered (registry ENV_GATED_REASONS carries the machine-readable
reason)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

#: repo root (this file lives at <repo>/multiagent_document_etl_system_spark/)
_REPO = Path(__file__).resolve().parent.parent
SHIM_DIR = _REPO / ".proto_shim"
SDK_PROTOBUF = Path(
    "/usr/lib/google-cloud-sdk/platform/google_appengine")


def activate_proto_shim() -> bool:
    """Idempotent. True iff protobuf is importable after the call."""
    try:
        import google.protobuf  # noqa: F401
        return True  # a real (or already-shimmed) protobuf exists
    except ImportError:
        pass
    if not ((SHIM_DIR / "sitecustomize.py").exists()
            and (SDK_PROTOBUF / "google/protobuf/descriptor.py").exists()):
        return False
    os.environ["PYTHONPATH"] = (
        str(SHIM_DIR) + os.pathsep + os.environ.get("PYTHONPATH", ""))
    sys.path.insert(0, str(SHIM_DIR))
    import sitecustomize  # noqa: F401  (executes the shim in-process)
    return True
