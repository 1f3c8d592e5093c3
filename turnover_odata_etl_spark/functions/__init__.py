from . import odata, text, vectors  # noqa: F401
