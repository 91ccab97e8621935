from .incremental import append_epoch, stream_refresh  # noqa: F401
