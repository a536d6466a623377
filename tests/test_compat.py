"""Regression tests for the protobuf compat shim (`compat/pbshim.py`).

ADVICE r5 (medium): the shim used to claim the bare ``google`` name
unconditionally with an empty ``__path__``, shadowing every other
``google.*`` namespace distribution (google.auth, google.cloud, …) the
runtime might ship. The fix decides google-ownership before inserting
the finder; these tests pin that behavior. They build their own fake
vendored protobuf dir, so they are green with and without the Google
Cloud SDK present, and they snapshot/restore all import state so the
rest of the suite (streaming uses the real shim) is unaffected.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

from high_energy_gamma_ray_search_in_kascade_array_data_spark.compat import pbshim


@pytest.fixture()
def fake_vendor(tmp_path):
    """A minimal vendored pure-Python protobuf package dir."""
    pb = tmp_path / "vendor" / "cloudsdkish" / "google" / "protobuf"
    pb.mkdir(parents=True)
    (pb / "__init__.py").write_text("__version__ = 'fake-4.23'\n")
    (pb / "descriptor.py").write_text("SENTINEL = 'fake-descriptor'\n")
    return str(pb)


@pytest.fixture()
def google_import_state():
    """Snapshot and restore sys.modules/meta_path/path around the test."""
    saved_modules = {
        k: v for k, v in sys.modules.items() if k == "google" or k.startswith("google.")
    }
    saved_meta = list(sys.meta_path)
    saved_path = list(sys.path)
    for k in saved_modules:
        del sys.modules[k]
    yield
    for k in [k for k in sys.modules if k == "google" or k.startswith("google.")]:
        del sys.modules[k]
    sys.modules.update(saved_modules)
    sys.meta_path[:] = saved_meta
    sys.path[:] = saved_path


def _make_namespace_portion(tmp_path) -> str:
    """A ``google.fakeauth`` namespace portion (no google/__init__.py),
    like what google-auth et al. install."""
    site = tmp_path / "site"
    (site / "google" / "fakeauth").mkdir(parents=True)
    (site / "google" / "fakeauth" / "__init__.py").write_text("VALUE = 42\n")
    return str(site)


def test_shim_preserves_existing_google_namespace_portions(
    tmp_path, fake_vendor, google_import_state
):
    """With another google.* portion present the finder must NOT claim
    the bare ``google`` name — both the portion and the shimmed
    protobuf must import side by side."""
    sys.path.insert(0, _make_namespace_portion(tmp_path))
    # the ownership decision the shim makes in install(): a resolvable
    # ``google`` spec (the namespace portion) means we do not own it
    own_google = importlib.util.find_spec("google") is None
    assert own_google is False
    sys.meta_path.insert(0, pbshim._PbCompatFinder(fake_vendor, own_google))

    import google.fakeauth  # the pre-existing portion still resolves

    assert google.fakeauth.VALUE == 42
    import google.protobuf  # the shim serves protobuf from the vendor dir

    assert google.protobuf.__version__ == "fake-4.23"
    assert list(google.protobuf.__path__) == [fake_vendor]
    import google.protobuf.descriptor as desc

    assert desc.SENTINEL == "fake-descriptor"
    # the namespace package's own portions remain visible alongside
    assert any("site" in p for p in google.__path__), list(google.__path__)


def test_shim_owns_google_when_nothing_else_provides_it(
    fake_vendor, google_import_state
):
    """Without any other provider the finder claims ``google`` so the
    vendored protobuf is importable at all."""
    # ensure no stray portion from the test env
    if importlib.util.find_spec("google") is not None:
        pytest.skip("environment ships a real google package")
    sys.meta_path.insert(0, pbshim._PbCompatFinder(fake_vendor, own_google=True))

    import google.protobuf

    assert google.protobuf.__version__ == "fake-4.23"
    import google.protobuf.runtime_version as rv

    assert rv.ValidateProtobufRuntimeVersion("x", 1) is None  # advisory no-op


def test_install_is_idempotent_and_reports_availability(google_import_state):
    """install() returns a bool and never raises; calling twice adds at
    most one finder (idempotence)."""
    before = sum(isinstance(f, pbshim._PbCompatFinder) for f in sys.meta_path)
    r1 = pbshim.install()
    r2 = pbshim.install()
    assert r1 == r2
    after = sum(isinstance(f, pbshim._PbCompatFinder) for f in sys.meta_path)
    assert after - before <= 1
    if r1:
        spec = importlib.util.find_spec("google.protobuf.descriptor")
        assert spec is not None and spec.loader is not None


def test_worker_site_dir_has_sitecustomize():
    d = pbshim.worker_site_dir()
    assert os.path.isfile(os.path.join(d, "sitecustomize.py"))
