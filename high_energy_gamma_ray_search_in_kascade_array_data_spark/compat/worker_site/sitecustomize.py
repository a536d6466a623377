"""Auto-install the protobuf compat shim in every python process whose
PYTHONPATH includes this directory — pyspark's worker processes inherit
the JVM's environment, which is how the state-protocol client inside
``transformWithStateInPandas`` workers finds ``google.protobuf`` on
runtimes without the real package.

SELF-CONTAINED twin of ``compat/pbshim.py`` (keep in lockstep): this
file must not import the engine package (or anything heavy) — it runs
at interpreter startup in every worker, and pyspark's worker-spawn
protocol has a ~10 s connect-back timeout that a slow sitecustomize
would blow. Installing the meta-path finder costs microseconds; the
vendored modules load only if something actually imports
``google.protobuf``. Guarded: any failure leaves the interpreter
exactly as it was."""

try:
    import importlib
    import importlib.abc
    import importlib.util
    import os
    import sys
    import types

    _THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"
    _PB_DIR = os.path.join(_THIRD_PARTY, "cloudsdk", "google", "protobuf")

    def _protobuf_missing() -> bool:
        # A loader-less spec is a NAMESPACE portion, not a usable
        # runtime: Spark's own jars sit on worker sys.path and their
        # shaded google/protobuf/*.class directories register exactly
        # that, which is how "protobuf looks installed but has no
        # modules" happens inside workers.
        try:
            spec = importlib.util.find_spec("google.protobuf")
        except ModuleNotFoundError:
            return True
        return spec is None or spec.loader is None

    if os.path.isfile(os.path.join(_PB_DIR, "__init__.py")) and _protobuf_missing():
        if _THIRD_PARTY not in sys.path:
            sys.path.insert(0, _THIRD_PARTY)

        class _PbCompatFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
            def find_spec(self, fullname, path=None, target=None):
                if fullname in (
                    "google",
                    "google.protobuf",
                    "google.protobuf.runtime_version",
                ):
                    is_pkg = fullname != "google.protobuf.runtime_version"
                    return importlib.util.spec_from_loader(
                        fullname, self, is_package=is_pkg
                    )
                return None

            def create_module(self, spec):
                m = types.ModuleType(spec.name)
                if spec.name == "google":
                    m.__path__ = []
                elif spec.name == "google.protobuf":
                    m.__path__ = [_PB_DIR]
                return m

            def exec_module(self, module):
                if module.__name__ == "google.protobuf":
                    init = os.path.join(_PB_DIR, "__init__.py")
                    with open(init) as f:
                        exec(compile(f.read(), init, "exec"), module.__dict__)
                elif module.__name__ == "google.protobuf.runtime_version":

                    class Domain:
                        GOOGLE_INTERNAL = 1
                        PUBLIC = 2

                    module.Domain = Domain
                    module.ValidateProtobufRuntimeVersion = lambda *a, **k: None

        sys.meta_path.insert(0, _PbCompatFinder())
except Exception:  # noqa: BLE001 — never break interpreter startup
    pass
