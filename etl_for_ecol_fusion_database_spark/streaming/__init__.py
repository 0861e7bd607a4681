from . import docs_stream, events_stream  # noqa: F401
