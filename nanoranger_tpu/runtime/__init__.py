from . import native_lib  # noqa: F401
