from . import edit_distance  # noqa: F401
