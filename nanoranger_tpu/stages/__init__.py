from . import barcode, decon  # noqa: F401
