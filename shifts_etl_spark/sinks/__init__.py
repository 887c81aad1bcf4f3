from .staged import StagedWriter, clear_outputs  # noqa: F401
