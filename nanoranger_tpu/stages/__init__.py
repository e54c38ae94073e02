from . import barcode  # noqa: F401
