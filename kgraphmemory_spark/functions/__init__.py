from . import ids, text, vector  # noqa: F401
