"""See scipy/__init__.py: import-only shim; attribute access must fail loudly."""


def __getattr__(name):  # pragma: no cover - only reached if patching failed
    raise ImportError(
        f"scipy.sparse.{name} requested: the real scipy is not installed; "
        "the drop-in patch should have replaced this code path")
