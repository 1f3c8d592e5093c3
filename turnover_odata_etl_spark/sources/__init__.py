from . import odata_client  # noqa: F401
