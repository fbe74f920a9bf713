from . import encode_stage  # noqa: F401
