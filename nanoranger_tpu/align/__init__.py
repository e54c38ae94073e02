from . import aligner, index, minimizers  # noqa: F401
