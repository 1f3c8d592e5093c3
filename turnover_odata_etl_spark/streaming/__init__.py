from . import windows  # noqa: F401
