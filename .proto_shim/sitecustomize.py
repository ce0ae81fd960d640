"""Environment shim: pure-Python protobuf for transformWithStateInPandas.

This container ships no google.protobuf, but the host's google-cloud-sdk
carries a pure-Python protobuf 6.32.0 under platform/google_appengine.
PySpark 4's StateMessage_pb2 gencode is stamped 6.33.0 and its runtime
check refuses an older runtime outright; the wire format and builder API
are identical across that minor bump, so this shim (a) puts the SDK copy
on sys.path and (b) relaxes ONLY the minor-version refusal (major
mismatches still raise). Activated by putting this directory FIRST on
PYTHONPATH (site imports sitecustomize at interpreter start), which also
propagates to the Python workers Spark spawns — they inherit PYTHONPATH
and need protobuf for the state-server protocol. Test-only scaffolding:
tests/test_streaming.py sets it up for the tws replay test; nothing in
the package imports this.
"""
import sys

_SDK = "/usr/lib/google-cloud-sdk/platform/google_appengine"
if _SDK not in sys.path:
    sys.path.append(_SDK)
try:
    from google.protobuf import runtime_version as _rv

    _orig = _rv.ValidateProtobufRuntimeVersion

    def _lenient(domain, major, minor, patch, suffix, location):
        try:
            _orig(domain, major, minor, patch, suffix, location)
        except _rv.VersionError:
            if major != _rv.MAJOR:  # cross-major: genuinely incompatible
                raise
    _rv.ValidateProtobufRuntimeVersion = _lenient
except ImportError:
    pass
